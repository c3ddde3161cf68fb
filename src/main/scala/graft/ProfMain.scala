package graft
import org.apache.spark.sql.SparkSession
/** Scratch profiling entry (not part of the driver contract):
  * cold/warm/warm timings of one registered query at sf0.1. */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime
      val n = f
      println(f"TIME $tag ${(System.nanoTime - t0) / 1e9}%8.2f s  rows=$n")
    }
    val name = args(0); val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    time("cold")(SparkEntry.queries(name)(spark, sf).count())
    time("warm")(SparkEntry.queries(name)(spark, sf).count())
    time("warm2")(SparkEntry.queries(name)(spark, sf).count())
    spark.stop()
  }
}

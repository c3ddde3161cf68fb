package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic: wall time for connectedComponents on the p19
  * edge set — separates a convergence-behavior change from machine
  * noise when the bench moves. Not part of any query surface. */
object CcRounds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val docs = graft.Tables.documents(spark, sfDir)
    val pairs = graft.pipeline.Dedup.minhashNearDups(docs, 0.5)
      .select(col("id_a"), col("id_b")).localCheckpoint()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.pipeline.Clusters.connectedComponents(pairs).count()
      println(f"run $i: rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch profiling entry (not part of the driver contract). */
object ProfMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    ev.groupBy(col("event_type")).agg(
      round(expr("percentile(value, 0.25)"), 5).as("p25"),
      round(expr("percentile(value, 0.5)"), 5).as("p50"),
      round(expr("percentile(value, 0.95)"), 5).as("p95"))
      .orderBy(col("event_type")).show(false)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries take `(spark, sfDir)` and read raw parquet from the given
  * scale-factor directory, mirroring how the DuckDB oracle sees the data.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  /** events.parquet's `ts` unit is the driver's choice and has changed
    * across regens (ns ↔ µs) — stay unit-tolerant: read through the
    * scan-configured session clone, where a NANOS-annotated column
    * surfaces as exact long ns (`nanosAsLong`) and a MICROS one is
    * untouched (normal TimestampType). Downstream consumers
    * ([[graft.pipeline.Sessions]]) normalize on the observed dtype, so
    * either unit flows through without loss or 1000× rescale bugs. */
  def events(s: SparkSession, d: String): DataFrame =
    t(SessionConf.scanSession(s), d, "events")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

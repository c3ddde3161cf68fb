package graft

import org.apache.spark.sql.SparkSession

/** Per-scan Spark conf without mutating the caller's session.
  *
  * Scan paths need parquet reader settings (field-id resolution,
  * ns-timestamp-as-long) that Spark only honors through the session conf
  * at execution time — a bare `spark.conf.set` would leak to every
  * concurrent query in the session. Instead, reads are built against a
  * CLONED session (`cloneSession`: shared SparkContext and state, copied
  * conf — timezone and user settings preserved) carrying the overrides;
  * the relation pins its own session, so execution resolves the right
  * conf while the caller's session never observes it.
  */
object SessionConf {

  /** Read-side settings every graft scan wants:
    *   - field-id projection (pipeline.rs:160-168 "projection must be done
    *     using field ids"), tolerating legacy id-less files;
    *   - ns-annotated parquet timestamps surfaced as long (our
    *     TimestampNsT/TimestamptzNsT mapping — exact integer ns, never a
    *     lossy µs truncation). Only affects ns-typed columns.
    */
  val ScanConf: Seq[(String, String)] = Seq(
    "spark.sql.parquet.fieldId.read.enabled" -> "true",
    "spark.sql.parquet.fieldId.read.ignoreMissing" -> "true",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")

  // one clone per parent session (weak: dropped with the parent); the
  // clone snapshots parent conf at first use — acceptable, overrides are
  // static and the parent's load-bearing settings (timezone) are copied
  private val clones =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, SparkSession]())

  /** The scan-configured clone of `spark`. */
  def scanSession(spark: SparkSession): SparkSession =
    clones.synchronized {
      Option(clones.get(spark)).getOrElse {
        val c = org.apache.spark.sql.GraftSessionBridge.cloneSession(spark)
        ScanConf.foreach { case (k, v) => c.conf.set(k, v) }
        clones.put(spark, c)
        c
      }
    }
}

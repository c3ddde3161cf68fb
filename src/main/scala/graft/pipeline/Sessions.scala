package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization — the gap-based session assignment every
  * training-data/behavioral pipeline needs over event logs.
  *
  * Shape at 100 TB: ONE shuffle on user_id (the window partition key);
  * lag + running-sum are in-partition streaming aggregates, and the
  * per-session rollup reuses the same partitioning (no second shuffle —
  * Catalyst folds the groupBy into the windowed exchange). Skewed users
  * can be salted by (user_id, day) when a single user's history exceeds
  * an executor partition.
  *
  * All arithmetic is integer µs → bit-exact against the SQL oracle.
  */
object Sessions {

  /** Assign gap-based sessions and roll them up.
    * Output: (user_id, session_idx, n_events, start_us, end_us,
    * duration_us), one row per session. */
  def sessionize(events: DataFrame, gapUs: Long = 30L * 60 * 1000000): DataFrame = {
    // events.parquet stores TIMESTAMP(NANOS) — read as long ns (the
    // caller sets spark.sql.legacy.parquet.nanosAsLong) or as a
    // timestamp; normalize to integer µs either way
    val ts = (events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }).as("ts_us")
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val newSession = when(
      col("ts_us") - lag(col("ts_us"), 1).over(order) > gapUs ||
        lag(col("ts_us"), 1).over(order).isNull, 1L).otherwise(0L)
    events.select(col("user_id"), col("event_id"), ts)
      .withColumn("session_idx",
        sum(newSession).over(order.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))
  }
}

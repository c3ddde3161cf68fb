package graft.queries

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming operators registered as DRIVER-CHECKED queries: each runs a
  * real Structured Streaming query (MemoryStream source → stateful
  * operator → memory sink) to completion inside the query function and
  * returns the converged result, which the driver compares against the
  * same DuckDB oracle the batch twin uses. The i31-style composition
  * proof for the streaming pillar: streaming ≡ batch ≡ oracle, through
  * the actual flatMapGroupsWithState machinery, not a spec-only replay.
  *
  * The MemoryStream feed is the proof harness (driver-side, sf-bounded);
  * the production source at 100 TB is the Iceberg micro-batch stream
  * (GraftMicroBatchStream) or any streaming source with the same schema —
  * the stateful operator is O(1) state per key either way.
  */
object StreamingQueries {

  /** CDC LWW snapshot via the streaming twin, fed in three arrival
    * chunks: last emission per key must equal the batch operator's row,
    * tombstoned keys retract. Oracle = p71's (identical contract). */
  val p80 = Q.sql(
    "p80_streaming_cdc_snapshot",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type, value
      |  FROM events),
      |n AS (SELECT user_id, count(*) AS n_events FROM e GROUP BY user_id),
      |last AS (SELECT user_id, event_id, ts_us, event_type, value,
      |           row_number() OVER (PARTITION BY user_id
      |             ORDER BY ts_us DESC, event_id DESC) AS rn
      |         FROM e)
      |SELECT l.user_id, n.n_events::BIGINT AS n_events,
      |  l.event_id AS last_event_id, l.ts_us AS last_ts_us,
      |  l.event_type AS last_type,
      |  CAST(round(l.value * 100) AS BIGINT) AS last_value_cents
      |FROM last l JOIN n USING (user_id)
      |WHERE rn = 1 AND l.event_type <> 'error'
      |ORDER BY user_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    implicit val sq = s.sqlContext
    val events = graft.Tables.events(s, d)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[(Long, java.sql.Timestamp, Long, String, Double)].collect().toSeq

    val source = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)]
    val qname = "p80_mem_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = graft.streaming.StreamingCdc.snapshots(
        source.toDF().toDF("event_id", "ts", "user_id", "event_type", "value"))
      .writeStream.format("memory").queryName(qname)
      .outputMode(OutputMode.Update)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      events.grouped(math.max(1, events.size / 3 + 1)).foreach { chunk =>
        source.addData(chunk: _*); q.processAllAvailable()
      }
    } finally q.stop()

    // the memory sink appends Update rows in batch order: per key the
    // LAST emission is the converged snapshot; tombstoned keys drop
    val converged = s.table(qname)
      .as[graft.streaming.StreamingCdc.SnapshotUpdate].collect()
      .zipWithIndex.groupBy(_._1.user_id)
      .map { case (_, v) => v.maxBy(_._2)._1 }
      .filterNot(_.deleted).toSeq
    s.catalog.dropTempView(qname)
    converged.toDF()
      .select(col("user_id"), col("n_events"), col("last_event_id"),
        col("last_ts_us"), col("last_type"),
        round(col("last_value") * lit(100)).cast("bigint").as("last_value_cents"))
      .orderBy(col("user_id"))
  }

  val all: Seq[Q] = Seq(p80)
}

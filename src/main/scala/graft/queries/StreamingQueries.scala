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

  /** Conversion funnel via the streaming twin (flatMapGroupsWithState,
    * event-time timeouts): events feed in TS ORDER in three chunks, then
    * a far-future sentinel advances the watermark past every user's
    * horizon so partial funnels flush through the timeout path. With
    * ordered arrival the greedy per-step advance equals the batch
    * min-based funnel exactly, so the oracle is p47's CTE chain
    * projected to the emitted shape. */
  val p81 = Q.sql(
    "p81_streaming_funnel",
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |t1 AS (SELECT user_id, min(ts_us) AS t1_us
      |       FROM e WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, min(e.ts_us) AS t2_us
      |       FROM e JOIN t1 ON e.user_id = t1.user_id
      |       WHERE e.event_type = 'click' AND e.ts_us >= t1.t1_us
      |         AND e.ts_us - t1.t1_us <= 604800000000
      |       GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, min(e.ts_us) AS t3_us
      |       FROM e JOIN t2 ON e.user_id = t2.user_id
      |            JOIN t1 ON e.user_id = t1.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts_us >= t2.t2_us
      |         AND e.ts_us - t1.t1_us <= 604800000000
      |       GROUP BY e.user_id)
      |SELECT u.user_id,
      |  (CASE WHEN t1.t1_us IS NOT NULL THEN 1 ELSE 0 END +
      |   CASE WHEN t2.t2_us IS NOT NULL THEN 1 ELSE 0 END +
      |   CASE WHEN t3.t3_us IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
      |    AS steps_completed,
      |  coalesce(t1.t1_us, -1) AS t1_us,
      |  coalesce(t3.t3_us, t2.t2_us, t1.t1_us, -1) AS t_last_us
      |FROM (SELECT DISTINCT user_id FROM e) u
      |LEFT JOIN t1 ON u.user_id = t1.user_id
      |LEFT JOIN t2 ON u.user_id = t2.user_id
      |LEFT JOIN t3 ON u.user_id = t3.user_id
      |ORDER BY u.user_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    implicit val sq = s.sqlContext
    val events = graft.Tables.events(s, d)
      .select("user_id", "event_type", "ts")
      .as[(Long, String, java.sql.Timestamp)].collect()
      .sortBy(_._3.getTime).toSeq
    val maxTs = events.map(_._3.getTime).max
    // one sentinel beyond every horizon (t1 + 7 d window + 60 min
    // watermark); a second sentinel batch lets the timeouts fire on the
    // advanced watermark
    def sentinel(k: Long) =
      (-1L, "noise", new java.sql.Timestamp(maxTs + (8L + k) * 86400000L))

    val source = MemoryStream[(Long, String, java.sql.Timestamp)]
    val qname = "p81_mem_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = graft.streaming.StreamingFunnel.funnel(
        source.toDF().toDF("user_id", "event_type", "ts"),
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName(qname)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // ONE event batch: the fixture spans weeks, so a chunked feed
      // would advance the watermark past early users' horizons mid-feed,
      // time their partial funnels out, and let later events RESTART
      // them (the streaming twin's documented reappearance semantics) —
      // batch equality needs every user's events inside one trigger
      source.addData(events: _*); q.processAllAvailable()
      source.addData(sentinel(0)); q.processAllAvailable()
      source.addData(sentinel(1)); q.processAllAvailable()
    } finally q.stop()

    val out = s.table(qname)
      .as[graft.streaming.StreamingFunnel.FunnelResult].collect().toSeq
      .filter(_.user_id >= 0) // drop any sentinel-user emission
    s.catalog.dropTempView(qname)
    out.toDF()
      .select(col("user_id"), col("steps_completed").cast("bigint"),
        col("t1_us"), col("t_last_us"))
      .orderBy(col("user_id"))
  }

  /** Daily anomaly gate via the streaming twin: per-type finalized-day
    * ring judged with the batch op's integer inequality. Events feed in
    * TS ORDER (so cross-chunk days accumulate, never drop as late);
    * one far-future sentinel PER TYPE finalizes each type's last open
    * day inline. Oracle = p59's, verbatim. */
  val p82 = Q.sql(
    "p82_streaming_daily_anomalies",
    """WITH d AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |    count(*)::BIGINT AS n
      |  FROM events GROUP BY event_type, day),
      |w AS (
      |  SELECT event_type, day, n,
      |    count(*) OVER tw AS h,
      |    sum(n) OVER tw AS s7,
      |    sum(n * n) OVER tw AS ss7
      |  FROM d
      |  WINDOW tw AS (PARTITION BY event_type ORDER BY day
      |                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, day, n,
      |  CASE WHEN h = 7 THEN
      |    2 * (7*n - s7) * (7*n - s7) > 21 * (7*ss7 - s7*s7)
      |  END AS anomaly
      |FROM w ORDER BY event_type, day""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    implicit val sq = s.sqlContext
    val events = graft.Tables.events(s, d)
      .select("event_type", "ts")
      .as[(String, java.sql.Timestamp)].collect()
      .sortBy(_._2.getTime).toSeq
    val maxTs = events.map(_._2.getTime).max
    val types = events.map(_._1).distinct
    val sentinels = types.map(t =>
      (t, new java.sql.Timestamp(maxTs + 20L * 86400000L)))

    val source = MemoryStream[(String, java.sql.Timestamp)]
    val qname = "p82_mem_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = graft.streaming.StreamingAnomalies.anomalies(
        source.toDF().toDF("event_type", "ts"))
      .writeStream.format("memory").queryName(qname)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      events.grouped(math.max(1, events.size / 3 + 1)).foreach { chunk =>
        source.addData(chunk: _*); q.processAllAvailable()
      }
      source.addData(sentinels: _*); q.processAllAvailable()
    } finally q.stop()

    val out = s.table(qname)
      .as[graft.streaming.StreamingAnomalies.DayVerdict].collect().toSeq
    s.catalog.dropTempView(qname)
    out.toDF()
      .select(col("event_type"), col("day"), col("n"), col("anomaly"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Gap-sessionization via the streaming twin: ts-ordered chunks (safe
    * here — a global watermark can only time a session out when the
    * user's next event would break the gap anyway), two far-future
    * sentinel batches flush the open sessions through the event-time
    * timeout. session_idx/duration recompute over the converged closed
    * set; oracle = p13's, verbatim. */
  val p83 = Q.sql(
    "p83_streaming_sessionize",
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |           OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1
      |         ELSE 0 END AS new_session
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      |sess AS (
      |  SELECT user_id, ts_us,
      |    (sum(new_session) OVER (PARTITION BY user_id
      |                            ORDER BY ts_us, event_id
      |                            ROWS UNBOUNDED PRECEDING))::BIGINT AS session_idx
      |  FROM flagged)
      |SELECT user_id, session_idx, count(*) AS n_events,
      |  min(ts_us) AS start_us, max(ts_us) AS end_us,
      |  max(ts_us) - min(ts_us) AS duration_us
      |FROM sess
      |GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    implicit val sq = s.sqlContext
    val events = graft.Tables.events(s, d)
      .select("user_id", "ts")
      .as[(Long, java.sql.Timestamp)].collect()
      .sortBy(_._2.getTime).toSeq
    val maxTs = events.map(_._2.getTime).max
    def sentinel(k: Long) =
      (-1L, new java.sql.Timestamp(maxTs + (2L + k) * 86400000L))

    val source = MemoryStream[(Long, java.sql.Timestamp)]
    val qname = "p83_mem_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = graft.streaming.StatefulSessions.sessionize(
        source.toDF().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName(qname)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      events.grouped(math.max(1, events.size / 3 + 1)).foreach { chunk =>
        source.addData(chunk: _*); q.processAllAvailable()
      }
      source.addData(sentinel(0)); q.processAllAvailable()
      source.addData(sentinel(1)); q.processAllAvailable()
    } finally q.stop()

    val closed = s.table(qname)
      .as[graft.streaming.StatefulSessions.UserSession].collect().toSeq
      .filter(_.user_id >= 0)
    s.catalog.dropTempView(qname)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("start_us"))
    closed.toDF()
      .withColumn("session_idx", row_number().over(w).cast("bigint"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Streaming CDC read of a real graft table: `readStream.format("graft")
    * .option("read-changelog", true)` tails the row-level changelog
    * (GraftChangelogSource) — the append+MoR-delete fixture must stream
    * its full history as insert rows for every order plus delete rows for
    * exactly the position-deleted ones, matching the batch changelog
    * (i23) and hence the raw-table oracle. Unlike p80–p83 (MemoryStream
    * feeds), the SOURCE here is the table format itself. */
  val p85 = Q.sql(
    "p85_streaming_changelog_read",
    """SELECT * FROM (
      |  SELECT 'delete' AS change_type, count(*)::BIGINT AS n,
      |    sum(o_orderkey)::BIGINT AS key_sum
      |  FROM orders WHERE o_totalprice > 200000.0
      |  UNION ALL
      |  SELECT 'insert' AS change_type, count(*)::BIGINT AS n,
      |    sum(o_orderkey)::BIGINT AS key_sum
      |  FROM orders
      |) ORDER BY change_type""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    val t = IcebergFixtures.ordersPosDeleted(s, d)
    val warehouse = t.location.stripSuffix(s"/${t.name}")
    val qname = "p85_mem_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = s.readStream.format("graft")
      .option("warehouse", warehouse).option("table", t.name)
      .option("read-changelog", "true").load()
      .writeStream.format("memory").queryName(qname)
      .trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val rows = s.table(qname)
      .groupBy(col("_change_type").as("change_type"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    s.catalog.dropTempView(qname)
    rows.toDF("change_type", "n", "key_sum").orderBy(col("change_type"))
  }

  /** Streaming MinHash-LSH near-dup twin: the document corpus arrives in
    * three chunks through a real MemoryStream run; band buckets live in
    * flatMapGroupsWithState (event-time expiry armed, never fired — all
    * docs share one event time, so the stream sees exactly the batch
    * op's bucket membership). Candidates are verified batch-side against
    * the corpus of record. Oracle = the all-pairs exact-Jaccard scan
    * (p02's): streaming ≡ batch ≡ oracle on the pair set. */
  val p94 = Q.sql(
    "p94_streaming_neardup",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                   for i in range(1, len(w)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
      |FROM sh a, sh b
      |WHERE a.doc_id < b.doc_id
      |  AND len(list_intersect(a.s, b.s)) /
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    implicit val sq = s.sqlContext
    val docs = graft.Tables.documents(s, d)
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val feed = docs.select("doc_id", "text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)

    val source = MemoryStream[(Long, java.sql.Timestamp, String)]
    val qname = "p94_mem_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = graft.streaming.StreamingLsh.candidatePairs(
        source.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName(qname)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      feed.grouped(math.max(1, feed.size / 3 + 1)).foreach { chunk =>
        source.addData(chunk.map(c => (c._1, t0, c._2)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val cands = s.table(qname)
    val out = graft.streaming.StreamingLsh
      .verifyPairs(cands, docs, threshold = 0.5)
      .orderBy(col("id_a"), col("id_b"))
      .collect().toSeq // materialize before the temp view drops
    s.catalog.dropTempView(qname)
    s.createDataFrame(s.sparkContext.parallelize(out, 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id_a",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("id_b",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("jaccard",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Continuous ingestion dedup: the new batch STREAMS in (MemoryStream,
    * three chunks) and probes the PERSISTED band index
    * ([[graft.pipeline.Serving.persistBandIndex]]) through a
    * stream-static join — no stream-side state, no corpus rehash;
    * candidates land in the sink and the verification/report tail runs
    * batch-side ([[graft.pipeline.Dedup.dupReport]]). Ties r10's two
    * pillars together: the serving artifact (w07/p93/p95) IS the static
    * side of the stream. Oracle identical to p53/p93 — arrival-order
    * independence on top of path independence. */
  val p96 = Q.sql(
    "p96_streaming_index_probe",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                   for i in range(1, len(w)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3),
      |m AS (
      |  SELECT n.doc_id AS new_id, count(*)::BIGINT AS n_dups,
      |    min(i.doc_id) AS first_match
      |  FROM sh n JOIN sh i
      |    ON n.doc_id % 10 = 7 AND i.doc_id % 10 <> 7
      |    AND len(list_intersect(n.s, i.s)) /
      |      (len(n.s) + len(i.s) - len(list_intersect(n.s, i.s))) >= 0.5
      |  GROUP BY n.doc_id)
      |SELECT d.doc_id AS new_id, coalesce(m.n_dups, 0)::BIGINT AS n_dups,
      |  m.first_match
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) d
      |LEFT JOIN m ON d.doc_id = m.new_id
      |ORDER BY new_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    implicit val sq = s.sqlContext
    val docs = graft.Tables.documents(s, d)
    val index = docs.filter(col("doc_id") % 10 =!= 7)
    val newDocs = docs.filter(col("doc_id") % 10 === 7)
    val (catalog, _) = Q.freshCatalog(s, "sbp")
    val t = graft.pipeline.Serving.persistBandIndex(index, "wband", catalog)

    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val feed = newDocs.select("doc_id", "text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val source = MemoryStream[(Long, java.sql.Timestamp, String)]
    val qname = "p96_mem_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // table overload: the probe validates the artifact's recorded
    // (bands, rows, maxBucket) layout before the stream-static join
    val q = graft.streaming.StreamingLsh.probeIndexCandidates(
        source.toDF().toDF("doc_id", "ts", "text"), t)
      .writeStream.format("memory").queryName(qname)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      feed.grouped(math.max(1, feed.size / 3 + 1)).foreach { chunk =>
        source.addData(chunk.map(c => (c._1, t0, c._2)): _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val out = graft.pipeline.Dedup.dupReport(
        s.table(qname), index, newDocs, threshold = 0.5)
      .orderBy(col("new_id")).collect().toSeq
    s.catalog.dropTempView(qname)
    s.createDataFrame(s.sparkContext.parallelize(out, 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("new_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_dups",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("first_match",
          org.apache.spark.sql.types.LongType, nullable = true))))
      .orderBy(col("new_id"))
  }

  /** Continuous ingestion dedup with PER-TRIGGER FILE PRUNING: the new
    * batch streams in (MemoryStream, three chunks) and each trigger
    * routes through the batch probe via foreachBatch
    * ([[graft.streaming.StreamingLsh.probeIndexPruned]]) — the trigger's
    * band keys push as an In predicate into the persisted index scan, so
    * every micro-batch PLANS only the key-buckets it touches (the
    * stream-static plan of p96 must stream the full band scan per
    * trigger; see probeIndexCandidates' scaladoc for why no static plan
    * can do this). The table is re-loaded from the catalog per trigger —
    * reload-is-refresh on any backend. Oracle identical to p96/p53:
    * pruning and per-trigger re-planning change nothing about the
    * answer. */
  val p98 = Q.sql(
    "p98_streaming_pruned_probe",
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
      |                   for i in range(1, len(w)-1)]) AS s
      |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w
      |        FROM documents)
      |  WHERE len(w) >= 3),
      |m AS (
      |  SELECT n.doc_id AS new_id, count(*)::BIGINT AS n_dups,
      |    min(i.doc_id) AS first_match
      |  FROM sh n JOIN sh i
      |    ON n.doc_id % 10 = 7 AND i.doc_id % 10 <> 7
      |    AND len(list_intersect(n.s, i.s)) /
      |      (len(n.s) + len(i.s) - len(list_intersect(n.s, i.s))) >= 0.5
      |  GROUP BY n.doc_id)
      |SELECT d.doc_id AS new_id, coalesce(m.n_dups, 0)::BIGINT AS n_dups,
      |  m.first_match
      |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 7) d
      |LEFT JOIN m ON d.doc_id = m.new_id
      |ORDER BY new_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    implicit val sq = s.sqlContext
    val docs = graft.Tables.documents(s, d)
    val index = docs.filter(col("doc_id") % 10 =!= 7)
    val newDocs = docs.filter(col("doc_id") % 10 === 7)
    val (catalog, _) = Q.freshCatalog(s, "fbp")
    graft.pipeline.Serving.persistBandIndex(index, "wbandp", catalog)

    val feed = newDocs.select("doc_id", "text")
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val source = MemoryStream[(Long, String)]
    // per-trigger candidate pairs accumulate driver-side (each trigger's
    // set is batch-bounded; the sink is the exactly-once boundary)
    val cands = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = graft.streaming.StreamingLsh.probeIndexPruned(
        source.toDF().toDF("doc_id", "text"), "wbandp", catalog) {
      (c, _) => cands ++= c.as[(Long, Long)](
        org.apache.spark.sql.Encoders.product[(Long, Long)]).collect()
    }.trigger(Trigger.ProcessingTime(0)).start()
    try {
      feed.grouped(math.max(1, feed.size / 3 + 1)).foreach { chunk =>
        source.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val candDf = cands.toSeq.toDF("new_id", "idx_id")
    graft.pipeline.Dedup.dupReport(candDf, index, newDocs, threshold = 0.5)
      .orderBy(col("new_id"))
  }

  /** Continuous EXACT ingest dedup over the persisted membership
    * artifact — the full admission loop: each trigger probes against the
    * snapshot-attached Bloom filter, admits the first row per key, and
    * FOLDS the admissions into corpus + filter in one atomic commit
    * ([[graft.streaming.StreamingMembership]]), so a key ingested in
    * trigger 1 is rejected in trigger 3 without any stream-side state.
    * The feed plants both corpus duplicates (keys already served —
    * rejected by the probe) and intra-stream duplicates ACROSS triggers
    * (first occurrence admitted and folded; the later copy arrives in a
    * later trigger and is rejected BY THE FOLD, pinning the
    * trigger-to-trigger visibility). Oracle: first occurrence per key,
    * keys not in the standing corpus — exact SQL. */
  val p102 = Q.sql(
    "p102_streaming_membership_ingest",
    """WITH corpus AS (
      |  SELECT md5(text) AS k FROM documents WHERE doc_id % 10 <> 0),
      |b AS (
      |  SELECT doc_id, md5(text) AS text_md5 FROM documents
      |  WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000 AS doc_id, md5(text) AS text_md5
      |  FROM documents WHERE doc_id % 100 = 7
      |  UNION ALL
      |  SELECT doc_id + 4000000 AS doc_id, md5(text) AS text_md5
      |  FROM documents WHERE doc_id % 20 = 0),
      |r AS (
      |  SELECT doc_id, text_md5,
      |    row_number() OVER (PARTITION BY text_md5 ORDER BY doc_id) AS rn
      |  FROM b)
      |SELECT doc_id, text_md5 FROM r
      |WHERE rn = 1 AND text_md5 NOT IN (SELECT k FROM corpus)
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import s.implicits._
    implicit val sq = s.sqlContext
    import graft.pipeline.Membership
    val docs = graft.Tables.documents(s, d)
    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), md5(col("text")).as("text_md5"))
    val (catalog, _) = Q.freshCatalog(s, "smem")
    val t0 = Membership.persistKeyedCorpus(
      keyed(docs.filter(col("doc_id") % 10 =!= 0)), "wsmem", catalog,
      "text_md5")
    Membership.writeMembershipFilter(t0, s, "text_md5")

    val feed = keyed(docs.filter(col("doc_id") % 10 === 0))
      .unionAll(keyed(docs.filter(col("doc_id") % 100 === 7))
        .select((col("doc_id") + 2000000).as("doc_id"), col("text_md5")))
      .unionAll(keyed(docs.filter(col("doc_id") % 20 === 0))
        .select((col("doc_id") + 4000000).as("doc_id"), col("text_md5")))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
    val source = MemoryStream[(Long, String)]
    val admitted = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = graft.streaming.StreamingMembership.dedupIngest(
        source.toDF().toDF("doc_id", "text_md5"), "wsmem", catalog,
        "text_md5", "doc_id") {
      (a, _) => admitted ++= a.as[(Long, String)](
        org.apache.spark.sql.Encoders.product[(Long, String)]).collect()
    }.trigger(Trigger.ProcessingTime(0)).start()
    try {
      feed.grouped(math.max(1, feed.size / 3 + 1)).foreach { chunk =>
        source.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    admitted.toSeq.toDF("doc_id", "text_md5").orderBy(col("doc_id"))
  }

  val all: Seq[Q] = Seq(p80, p81, p82, p83, p85, p94, p96, p98, p102)
}

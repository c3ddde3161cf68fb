package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The event frame's ts as integer µs (nanos-long or timestamp input —
    * same normalization as [[sessionize]]). */
  private def tsUs(events: DataFrame) =
    (events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => unix_micros(col("ts").cast("timestamp"))
    }).as("ts_us")

  /** As-of join: each left event picks the LATEST right event of the
    * same user with `right.ts <= left.ts` — the feature-attribution
    * join (DuckDB/kdb `ASOF JOIN` semantics; Spark has no native
    * operator). Ties: a right row AT the left ts matches; among right
    * rows sharing that ts the highest event_id wins (deterministic).
    *
    * Implemented as union + running `last_value` rather than a range
    * join: right rows tag 0, left rows tag 1, each user's merged stream
    * sorts by (ts, tag, event_id) and carries the last non-null right
    * payload forward. ONE shuffle on the by-key and an in-partition
    * sort — no per-left right-window expansion, so a 100 TB event log
    * joins at the cost of a sort-merge pass. Skewed users salt by
    * (user_id, day) with boundary stitching when one user outgrows an
    * executor partition.
    *
    * Output: left (event_id, user_id, ts_us, value) + nullable
    * (r_event_id, r_ts_us, r_value). */
  def asOfJoin(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.select(col("user_id"), tsUs(left), col("event_id"),
      col("value"), lit(1).as("_tag"),
      lit(null).cast("long").as("_r_id"),
      lit(null).cast("long").as("_r_ts"),
      lit(null).cast("double").as("_r_value"))
    val r = right
      .select(col("user_id"), tsUs(right), col("event_id"), col("value").as("_rv"))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        lit(null).cast("double").as("value"), lit(0).as("_tag"),
        col("event_id").as("_r_id"), col("ts_us").as("_r_ts"),
        col("_rv").as("_r_value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("_tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn("r_event_id", last(col("_r_id"), ignoreNulls = true).over(w))
      .withColumn("r_ts_us", last(col("_r_ts"), ignoreNulls = true).over(w))
      .withColumn("r_value", last(col("_r_value"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
        col("r_event_id"), col("r_ts_us"), col("r_value"))
  }

  /** Floor division of a long µs column by a positive long width.
    * `c - pmod(c, w)` is an exact multiple of w, so the double divide is
    * exact while |c| < 2^53 (µs epochs stay under that until year ~2255)
    * and correct for negative c where SQL `div` (truncate-toward-zero)
    * is not. */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  /** Funnel analysis: per user, the earliest time each ordered step of
    * `steps` is reached, where step k+1 must occur at-or-after step k
    * and the WHOLE funnel must fit inside `windowUs` of step 1 — the
    * standard product-analytics conversion funnel (Amplitude/Mixpanel
    * semantics, "strict order, conversion window" variant).
    *
    * Shape at 100 TB: ONE shuffle on user_id; each step's earliest-time
    * is a whole-partition conditional `min` over the same window
    * partitioning, so Catalyst reuses a single exchange for all steps
    * (steps are sequential selects, not extra shuffles). Per-user state
    * is O(steps). Skewed users cannot arise (a user's events all hash
    * to one partition, and the aggregate is a scalar per step).
    *
    * Output: (user_id, t1_us..tN_us nullable, steps_completed). */
  def funnel(events: DataFrame, steps: Seq[String],
             windowUs: Long = 7L * 24 * 3600 * 1000000): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col("user_id"))
    val base = events.select(col("user_id"), col("event_type"), tsUs(events))
    val withSteps = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col("event_type") === step
        else col("event_type") === step &&
          col(s"t${i}_us").isNotNull &&
          col("ts_us") >= col(s"t${i}_us") &&
          col("ts_us") - col("t1_us") <= windowUs
      df.withColumn(s"t${i + 1}_us", min(when(cond, col("ts_us"))).over(w))
    }
    val stepCols = steps.indices.map(i => col(s"t${i + 1}_us"))
    withSteps
      .groupBy(col("user_id"))
      .agg(first(stepCols.head).as("t1_us"),
        stepCols.tail.zipWithIndex.map { case (c, i) =>
          first(c).as(s"t${i + 2}_us")
        }: _*)
      .withColumn("steps_completed",
        stepCols.indices.map(i => when(col(s"t${i + 1}_us").isNotNull, 1)
          .otherwise(0)).reduce(_ + _).cast("long"))
  }

  /** Cohort retention: users cohorted by the week of their first event
    * (week 0 = epoch-aligned 7-day bins of the first-event µs timestamp);
    * for each (cohort_week, k) count the distinct users with ANY event
    * during week `cohort_week + k`, k = 0..maxWeeks.
    *
    * Shape at 100 TB: first-event per user is one hash aggregate on
    * user_id; events re-join their user's cohort on the same user_id
    * hash partitioning (co-partitioned shuffle, no broadcast needed —
    * the user dimension is corpus-sized); the distinct + rollup is one
    * more bounded shuffle on (cohort, k). No window over raw events, no
    * skew beyond a single user's row count.
    *
    * Output: (cohort_week, week_k, n_users), weeks with zero retained
    * users absent (inner semantics). */
  def cohortRetention(events: DataFrame, maxWeeks: Int = 4): DataFrame = {
    val weekUs = 7L * 24 * 3600 * 1000000
    val e = events.select(col("user_id"), tsUs(events))
    val cohorts = e.groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("first_us"))
      .select(col("user_id"), floorDiv(col("first_us"), weekUs).as("cohort_week"))
    e.join(cohorts, Seq("user_id"))
      .select(col("user_id"), col("cohort_week"),
        (floorDiv(col("ts_us"), weekUs) - col("cohort_week")).as("week_k"))
      .filter(col("week_k") <= maxWeeks)
      .distinct()
      .groupBy(col("cohort_week"), col("week_k"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-type exact value percentiles (linear/type-7 interpolation —
    * Spark `percentile` and DuckDB `quantile_cont` share it, so values
    * crosscheck to 5 dp). Exact percentile buffers each group's value
    * multiset executor-side; that is the oracle-checkable CONTROL — at
    * 100 TB swap in `percentile_approx` (Greenwald-Khanna, bounded
    * memory, same call shape) and keep this as the small-slice verifier. */
  def valuePercentiles(events: DataFrame): DataFrame =
    events.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      round(expr("percentile(value, 0.25)"), 5).as("p25"),
      round(expr("percentile(value, 0.5)"), 5).as("p50"),
      round(expr("percentile(value, 0.75)"), 5).as("p75"),
      round(expr("percentile(value, 0.95)"), 5).as("p95"))

  /** Daily event-count anomaly detection, FULLY integer-exact: per
    * (event_type, day) counts, trailing window of the 7 preceding
    * observed days, and the |z| > 3 gate evaluated as the cross-
    * multiplied integer inequality 2·(7n−S)² > 21·(7·SS−S²) (z² > 9
    * with mean S/7 and variance (7·SS−S²)/42 — no float ever touches
    * the result, so the oracle matches bit-for-bit by construction).
    * Zero-variance history: any deviation flags, equality does not.
    *
    * Shape at 100 TB: one map-side-combined count shuffle to
    * (type, day) — a tiny frame from then on; the trailing window sorts
    * per type only. Days without events are skipped (the window is the
    * 7 preceding OBSERVED days; compose with [[denseHourlySeries]]-style
    * gap fill first when calendar alignment matters). */
  def dailyAnomalies(events: DataFrame): DataFrame = {
    val dayUs = 86400L * 1000000L
    val daily = events.select(col("event_type"), tsUs(events))
      .select(col("event_type"), floorDiv(col("ts_us"), dayUs).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-7, -1)
    daily
      .withColumn("h", count(lit(1)).over(w))
      .withColumn("s7", sum(col("n")).over(w))
      .withColumn("ss7", sum(col("n") * col("n")).over(w))
      .select(col("event_type"), col("day"), col("n"),
        when(col("h") === 7,
          lit(2) * (lit(7) * col("n") - col("s7")) *
            (lit(7) * col("n") - col("s7")) >
          lit(21) * (lit(7) * col("ss7") - col("s7") * col("s7")))
          .as("anomaly"))
  }

  /** Densified hourly time series: the full (event_type × hour) grid
    * over the observed range with zero-filled counts and a trailing
    * 3-hour moving sum — the gap-filling densification every
    * time-series consumer needs before charting/joining (missing hours
    * MUST surface as zeros, not absent rows).
    *
    * Shape at 100 TB: counts are one map-side-combined shuffle; the
    * dense grid is types × hours-in-range rows (bounded by calendar
    * time, not event volume) built with `sequence`, and the left join
    * broadcasts the count side per grid partition via AQE when small —
    * event volume never amplifies. */
  def denseHourlySeries(events: DataFrame): DataFrame = {
    val hourUs = 3600L * 1000000L
    val counts = events.select(col("event_type"), tsUs(events))
      .select(col("event_type"), floorDiv(col("ts_us"), hourUs).as("hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("cnt"))
    val bounds = counts.agg(min(col("hour")), max(col("hour"))).head
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val grid = counts.select(col("event_type")).distinct()
      .select(col("event_type"),
        explode(sequence(lit(lo), lit(hi))).as("hour"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-2, 0)
    grid.join(counts, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("cnt"), lit(0L)).as("n"))
      .withColumn("sum3h", sum(col("n")).over(w))
  }

  /** Range (interval) join: all pairs of same-user events with
    * `r.ts ∈ [l.ts + loUs, l.ts + hiUs]` (both ends inclusive) — the
    * windowed-correlation join (SQL inequality join; Spark would plan a
    * per-key nested loop or, without an equi-key, a cartesian).
    *
    * Implemented by time-bucketing: bucket width = the interval span, so
    * each LEFT row covers at most TWO buckets (explode fan-out ≤ 2) and
    * each RIGHT row lands in exactly ONE — every qualifying (l, r) pair
    * meets in exactly one (user_id, bucket) cell, so the equi-join is
    * duplicate-free by construction and the exact range filter only
    * discards. At 100 TB this is one hash-partitioned shuffle on
    * (user_id, bucket) with ≤2× left amplification — no cartesian, no
    * per-user quadratic blow-up beyond the true output size.
    *
    * Output: left (event_id, user_id, ts_us, value) × matching right
    * (r_event_id, r_ts_us, r_value); inner-join semantics. */
  def rangeJoin(left: DataFrame, right: DataFrame, loUs: Long, hiUs: Long): DataFrame = {
    require(hiUs >= loUs, s"empty interval [$loUs, $hiUs]")
    val width = math.max(hiUs - loUs, 1L)
    val l = left.select(col("event_id"), col("user_id"), tsUs(left), col("value"))
    val r = right.select(col("event_id").as("r_event_id"),
        col("user_id").as("r_user_id"), tsUs(right), col("value").as("r_value"))
      .withColumnRenamed("ts_us", "r_ts_us")
    val lb = l.withColumn("_b",
      explode(sequence(floorDiv(col("ts_us") + loUs, width),
        floorDiv(col("ts_us") + hiUs, width))))
    val rb = r.withColumn("_b", floorDiv(col("r_ts_us"), width))
    lb.join(rb, lb("user_id") === rb("r_user_id") && lb("_b") === rb("_b"))
      .filter(col("r_ts_us") >= col("ts_us") + loUs &&
        col("r_ts_us") <= col("ts_us") + hiUs)
      .select(col("event_id"), col("user_id"), col("ts_us"), col("value"),
        col("r_event_id"), col("r_ts_us"), col("r_value"))
  }

  /** CDC last-writer-wins materialization: collapse an upsert/tombstone
    * event log to its current per-key snapshot. The latest event per
    * `user_id` — (ts, event_id) total order — decides the row; keys whose
    * latest event is a `tombstoneType` are DELETED (no output row). The
    * batch shape of an Iceberg changelog apply (i23) / streaming upsert
    * sink: replaying the full log through this operator reproduces the
    * table state any prefix-consistent reader would see.
    *
    * Scale shape: ONE max_by-style aggregate on the key — no window sort,
    * no shuffle beyond the key exchange; partial aggregation keeps only
    * the current winner per key per task (O(keys) state, spillable). */
  def cdcSnapshot(events: DataFrame, tombstoneType: String = "error"): DataFrame =
    events.select(col("user_id"), col("event_id"), tsUs(events),
        col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("ts_us"), col("event_id"), col("event_type"),
          col("value"))).as("_last"))
      .filter(col("_last.event_type") =!= tombstoneType)
      .select(col("user_id"), col("n_events"),
        col("_last.event_id").as("last_event_id"),
        col("_last.ts_us").as("last_ts_us"),
        col("_last.event_type").as("last_type"),
        round(col("_last.value") * lit(100)).cast("bigint").as("last_value_cents"))
}

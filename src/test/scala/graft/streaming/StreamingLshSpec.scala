package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming MinHash-LSH near-dup: the verified pair set must equal the
  * batch operator's on the same corpus (any chunking), band-bucket state
  * must EXPIRE past the watermark horizon, and viral buckets must
  * saturate at the cap instead of holding unbounded membership. */
class StreamingLshSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("streaming-lsh-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Run candidatePairs over timed feed chunks; return the distinct
    * candidate pair set and the final state-row count. */
  private def run(chunks: Seq[Seq[(Long, Timestamp, String)]],
      horizonMinutes: Int, maxBucket: Int,
      name: String): (Set[(Long, Long)], Long) = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingLsh.candidatePairs(
        source.toDF().toDF("doc_id", "ts", "text"),
        horizonMinutes = horizonMinutes, maxBucket = maxBucket)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    chunks.foreach { c => source.addData(c: _*); q.processAllAvailable() }
    val stateRows = Option(q.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
    q.stop()
    val pairs = spark.table(name).as[StreamingLsh.CandidatePair].collect()
      .map(p => (p.id_a, p.id_b)).toSet
    spark.catalog.dropTempView(name)
    (pairs, stateRows)
  }

  private def ts(minutes: Long) =
    new Timestamp(Timestamp.valueOf("2024-01-01 00:00:00").getTime +
      minutes * 60000L)

  test("stream pair set equals batch minhashNearDups, chunked feed") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val feed = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toSeq.sortBy(_._1).map(c => (c._1, ts(0), c._2))
    val (streamPairs, _) =
      run(feed.grouped(feed.size / 4 + 1).toSeq, 10, 10000, "lsh_agree")

    val batch = graft.pipeline.Dedup
      .minhashNearDups(docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // stream emits CANDIDATES; verify exactly like the batch op does
    val verified = StreamingLsh.verifyPairs(
        streamPairs.toSeq.toDF("id_a", "id_b"), docs, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(verified === batch)
  }

  test("band-bucket state expires past the watermark horizon") {
    val a = (1L, ts(0), "alpha beta gamma delta epsilon zeta")
    val b = (2L, ts(1), "alpha beta gamma delta epsilon zeta")
    // identical doc arrives again FAR past the horizon; by then the
    // bucket state must have expired, so no pair with the late arrival
    val late = (3L, ts(500), "alpha beta gamma delta epsilon zeta")
    // two watermark movers: mover1's batch advances the watermark past
    // the pair bucket's timeout, mover2's batch actually FIRES it (a
    // group only times out in a batch where it receives no data, and
    // timeouts are evaluated against the PREVIOUS batch's watermark)
    val mover1 = (99L, ts(400), "unrelated words only here nothing shared")
    val mover2 = (98L, ts(401), "different filler phrase with no overlap")
    val (pairs, stateRows) = run(
      Seq(Seq(a, b), Seq(mover1), Seq(mover2), Seq(late)),
      horizonMinutes = 10, maxBucket = 10000, name = "lsh_expire")
    assert(pairs === Set((1L, 2L)),
      s"late arrival must open a FRESH bucket, got $pairs")
    // final state: movers' + late doc's buckets (16 bands each) — the
    // original pair's 16 buckets expired; without expiry this is 64
    assert(stateRows < 64, s"expired state still resident: $stateRows rows")
  }

  test("stream-static index probe equals batch incremental dedup; viral index buckets drop") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val index = docs.filter(col("doc_id") % 10 =!= 7)
    val newDocs = docs.filter(col("doc_id") % 10 === 7)
    val indexBands = graft.pipeline.Dedup.minhashBands(
      graft.pipeline.Dedup.shingleSets(index), 16, 4)

    def runProbe(maxBucket: Int, name: String): Set[(Long, Long)] = {
      val source = MemoryStream[(Long, Timestamp, String)]
      val q = StreamingLsh.probeIndexCandidates(
          source.toDF().toDF("doc_id", "ts", "text"), indexBands,
          maxBucket = maxBucket)
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      val feed = newDocs.select("doc_id", "text").as[(Long, String)]
        .collect().toSeq.sortBy(_._1).map(c => (c._1, ts(0), c._2))
      try feed.grouped(feed.size / 3 + 1).foreach { c =>
        source.addData(c: _*); q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(name).as[(Long, Long)].collect().toSet // (new_id, idx_id)
      spark.catalog.dropTempView(name)
      got
    }

    // candidates after verify must equal batch incrementalDedup's report
    val cands = runProbe(10000, "probe_agree")
    val got = graft.pipeline.Dedup.dupReport(
        cands.toSeq.toDF("new_id", "idx_id"), index, newDocs)
      .orderBy(col("new_id")).collect().map(_.toString).toSeq
    val want = graft.pipeline.Dedup.incrementalDedup(index, newDocs)
      .orderBy(col("new_id")).collect().map(_.toString).toSeq
    assert(got === want)

    // with a tiny cap every index bucket is viral → zero candidates
    assert(runProbe(0, "probe_viral").isEmpty)
  }

  test("viral bucket saturates at the cap and stops emitting") {
    val textA = "alpha beta gamma delta epsilon zeta"
    val docs = (1L to 8L).map(i => (i, ts(0), textA))
    val (pairs, stateRows) = run(Seq(docs), horizonMinutes = 10,
      maxBucket = 3, name = "lsh_sat")
    // members 1..3 enter state (3 choose 2 = 3 pairs); member 4 trips
    // saturation (cap reached), members 5..8 emit nothing
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"saturated bucket kept emitting: $pairs")
    // saturated buckets hold one boolean, not membership
    assert(stateRows <= 16, s"saturated state too large: $stateRows rows")
  }
}

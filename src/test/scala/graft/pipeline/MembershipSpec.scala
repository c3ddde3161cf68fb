package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.expr.{In => PIn, SetPred}
import graft.io.FileIO

/** Persisted membership-filter serving: the bloom-prefiltered probe must
  * be EXACT (false positives verified away, false negatives impossible),
  * the fold must equal a rebuild bit-for-bit, append+fold must land in
  * one atomic swap, and racing folds must serialize. */
class MembershipSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("membership-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshCatalog(tag: String): HadoopCatalog = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-mem-$tag-").toString
    new HadoopCatalog(wh, FileIO.fromSpark(spark))
  }

  private def keyed(df: DataFrame): DataFrame =
    df.select(col("doc_id"), md5(col("text")).as("k"))

  private def ids(df: DataFrame): Seq[Long] =
    df.select(col("doc_id")).collect().map(_.getLong(0)).sorted.toSeq

  test("probe is exact: planted dups excluded, new rows kept, FPs verified away") {
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = keyed(docs.filter(col("doc_id") % 10 =!= 0))
    // batch: mostly-new rows plus exact copies of corpus docs under new ids
    val batch = keyed(docs.filter(col("doc_id") % 10 === 0))
      .unionAll(keyed(docs.filter(col("doc_id") % 100 === 7))
        .select((col("doc_id") + 2000000).as("doc_id"), col("k")))
    val oracle = ids(batch.join(corpus.select("k"), Seq("k"), "left_anti"))
    assert(oracle.nonEmpty && oracle.size < ids(batch).size,
      "fixture must yield both new rows and planted duplicates")

    // normal sizing
    val t0 = Membership.persistKeyedCorpus(corpus, "mem", freshCatalog("mem"), "k")
    val t = Membership.writeMembershipFilter(t0, spark, "k")
    assert(ids(Membership.newKeys(t, spark, batch, "k")) === oracle)

    // adversarial sizing: a deliberately saturated filter (2 expected keys
    // per bucket) floods the candidate path with false positives — the
    // verification join must still produce the exact answer
    val s0 = Membership.persistKeyedCorpus(corpus, "sat", freshCatalog("sat"), "k")
    val s = Membership.writeMembershipFilter(s0, spark, "k",
      expectedPerBucket = Some(2L))
    assert(ids(Membership.newKeys(s, spark, batch, "k")) === oracle)
  }

  test("candidate verification plans a strict file subset through bucket(k)") {
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = keyed(docs)
    val t0 = Membership.persistKeyedCorpus(corpus, "pru", freshCatalog("pru"), "k")
    val t = Membership.writeMembershipFilter(t0, spark, "k")
    val someKeys = corpus.select("k").limit(3).collect().map(_.get(0)).toSet[Any]
    val allFiles = t.newScan().planFiles().size
    val probed = t.newScan()
      .withFilter(SetPred(PIn, "k", someKeys)).planFiles().size
    assert(allFiles > 1, s"corpus should span multiple files, got $allFiles")
    assert(probed > 0 && probed < allFiles,
      s"bucket pruning did not engage: $probed of $allFiles files")
  }

  test("fold == rebuild: same probe answer AND bit-identical blobs") {
    val docs = graft.Tables.documents(spark, sfDir)
    val standing = keyed(docs.filter(col("doc_id") % 10 > 1))     // 80%
    val foldBatch = keyed(docs.filter(col("doc_id") % 10 === 1))  // 10%
    val probe = keyed(docs.filter(col("doc_id") % 10 === 0))      // 10%
      .unionAll(foldBatch // copies of FOLDED docs: must probe as duplicates
        .select((col("doc_id") + 3000000).as("doc_id"), col("k")))

    val n = Some(1024L) // pin sizing so fold and rebuild share (n, m)
    var t = Membership.persistKeyedCorpus(standing, "fold",
      freshCatalog("fold"), "k")
    t = Membership.writeMembershipFilter(t, spark, "k", expectedPerBucket = n)
    t = Membership.membershipIndexBatch(t, foldBatch, "k")

    var r = Membership.persistKeyedCorpus(standing.unionAll(foldBatch),
      "full", freshCatalog("full"), "k")
    r = Membership.writeMembershipFilter(r, spark, "k", expectedPerBucket = n)

    val got = ids(Membership.newKeys(t, spark, probe, "k"))
    assert(got === ids(Membership.newKeys(r, spark, probe, "k")))
    // every planted copy of a folded doc must be recognized as a duplicate
    assert(!got.exists(_ >= 3000000),
      "a folded key escaped the filter — the fold lost bits")

    // bloom merge is bitwise OR of per-key bit sets, so fold ≡ rebuild
    // at the artifact level too: decompressed blob bytes identical
    def blobsOf(x: graft.table.GraftTable): Map[Int, Seq[Byte]] = {
      val sf = x.metadata.statisticsFor(x.metadata.currentSnapshotId.get).get
      val (metas, _) = graft.puffin.Puffin.readMetadata(x.io, sf.statisticsPath)
      metas.filter(_.blobType == Membership.BlobType).map { m =>
        m.properties("bucket").toInt ->
          graft.puffin.Puffin.readBlob(x.io, sf.statisticsPath, m).toSeq
      }.toMap
    }
    assert(blobsOf(t) === blobsOf(r))
  }

  test("append+fold is one atomic swap; the invariant holds") {
    val docs = graft.Tables.documents(spark, sfDir)
    var t = Membership.persistKeyedCorpus(
      keyed(docs.filter(col("doc_id") % 10 =!= 0)), "atom",
      freshCatalog("atom"), "k")
    t = Membership.writeMembershipFilter(t, spark, "k")
    val versionsBefore = t.metadata.snapshots.size
    t = Membership.membershipIndexBatch(t,
      keyed(docs.filter(col("doc_id") % 10 === 0)), "k")
    // exactly one new snapshot, already covered by a statistics entry
    assert(t.metadata.snapshots.size === versionsBefore + 1)
    val cur = t.metadata.currentSnapshotId.get
    assert(t.metadata.statisticsFor(cur).isDefined,
      "the fold's snapshot must carry its filter in the same commit")
    // inserted bookkeeping moved by the batch size
    assert(t.metadata.properties(Membership.PropInserted).toLong >
      docs.filter(col("doc_id") % 10 =!= 0).count() - 1)
  }

  test("a bare append breaks the invariant and probe/fold refuse") {
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = keyed(docs.filter(col("doc_id") % 10 =!= 0))
    var t = Membership.persistKeyedCorpus(corpus, "bare",
      freshCatalog("bare"), "k")
    t = Membership.writeMembershipFilter(t, spark, "k")
    t = t.append(keyed(docs.filter(col("doc_id") % 10 === 0))) // outside maintenance
    val batch = keyed(docs.filter(col("doc_id") % 100 === 7))
    val e1 = intercept[IllegalStateException] {
      Membership.newKeys(t, spark, batch, "k")
    }
    assert(e1.getMessage.contains("does not cover"))
    val e2 = intercept[IllegalStateException] {
      Membership.membershipIndexBatch(t, batch, "k")
    }
    assert(e2.getMessage.contains("does not cover"))
    // rebuild restores service
    t = Membership.writeMembershipFilter(t, spark, "k")
    assert(Membership.newKeys(t, spark, batch, "k").count() >= 0)
  }

  test("wrong key column refused") {
    val docs = graft.Tables.documents(spark, sfDir)
    val t0 = Membership.persistKeyedCorpus(keyed(docs), "col",
      freshCatalog("col"), "k")
    val t = Membership.writeMembershipFilter(t0, spark, "k")
    val e = intercept[IllegalArgumentException] {
      Membership.newKeys(t, spark, keyed(docs), "doc_id")
    }
    assert(e.getMessage.contains("keyed by k"))
  }

  test("racing folds serialize: both batches' keys end up covered") {
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = keyed(docs.filter(col("doc_id") % 10 > 3))
    var t = Membership.persistKeyedCorpus(corpus, "race",
      freshCatalog("race"), "k")
    t = Membership.writeMembershipFilter(t, spark, "k")
    val batchA = keyed(docs.filter(col("doc_id") % 10 === 1))
    val batchB = keyed(docs.filter(col("doc_id") % 10 === 2))
    val base = t
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(Membership.membershipIndexBatch(base, batchA, "k"))
    val fb = Future(Membership.membershipIndexBatch(base, batchB, "k"))
    Await.result(fa, 5.minutes); Await.result(fb, 5.minutes)
    val grown = base.refresh()
    // probes of copies of BOTH batches must report zero new rows — had
    // the second fold overwritten the first's bits, its batch's copies
    // would probe definitely-new (bloom false negatives are impossible,
    // so a lost fold is DETECTABLE, not just slow)
    val copies = batchA.unionAll(batchB)
      .select((col("doc_id") + 5000000).as("doc_id"), col("k"))
    assert(Membership.newKeys(grown, spark, copies, "k").count() === 0)
    assert(grown.metadata.properties(Membership.PropInserted).toLong ===
      corpus.count() + batchA.count() + batchB.count())
  }

  test("ingestBatch: first-per-key admission, replay cannot double-ingest") {
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = keyed(docs.filter(col("doc_id") % 10 =!= 0))
    var t = Membership.persistKeyedCorpus(corpus, "ing",
      freshCatalog("ing"), "k")
    t = Membership.writeMembershipFilter(t, spark, "k")
    // batch: new rows, a corpus duplicate, and an INTRA-batch duplicate
    // pair (two ids, same key) — only the lower id may be admitted
    val newRows = keyed(docs.filter(col("doc_id") % 10 === 0))
    val batch = newRows
      .unionAll(keyed(docs.filter(col("doc_id") % 100 === 7))
        .select((col("doc_id") + 2000000).as("doc_id"), col("k")))
      .unionAll(newRows
        .select((col("doc_id") + 4000000).as("doc_id"), col("k")))
    val (admitted, grown) = Membership.ingestBatch(t, batch, "k", "doc_id")
    val got = ids(admitted)
    val oracle = ids(batch
      .withColumn("_rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("k")).orderBy(col("doc_id"))))
      .filter(col("_rn") === 1).drop("_rn")
      .join(corpus.select("k"), Seq("k"), "left_anti"))
    assert(got === oracle)
    assert(!got.exists(_ >= 2000000),
      "corpus duplicates and intra-batch second copies must not admit")

    // REPLAY the same batch (the foreachBatch retry shape): every key is
    // now folded, so zero admits and the table does not move
    val snapBefore = grown.metadata.currentSnapshotId
    val (replayed, after) = Membership.ingestBatch(grown, batch, "k", "doc_id")
    assert(replayed.count() === 0)
    assert(after.metadata.currentSnapshotId === snapBefore,
      "a replayed trigger must not create a snapshot")
  }

  test("ingestBatch releases its probe broadcast per trigger (forced-broadcast path)") {
    // the continuous-ingest loop mints one filter broadcast per trigger;
    // ingestBatch must destroy it once admissions materialize, and the
    // destroy must not break the admitted frame, the fold, or a replay
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = keyed(docs.filter(col("doc_id") % 10 =!= 0))
    var t = Membership.persistKeyedCorpus(corpus, "ingbc",
      freshCatalog("ingbc"), "k")
    t = Membership.writeMembershipFilter(t, spark, "k")
    val batch = keyed(docs.filter(col("doc_id") % 10 === 0))
    System.setProperty("graft.membership.literalBlobBytesMax", "0")
    try {
      val (admitted, grown) = Membership.ingestBatch(t, batch, "k", "doc_id")
      // the broadcast is destroyed by now — the admitted frame must
      // still answer (it was materialized before the release)
      val got = ids(admitted)
      val oracle = ids(batch.join(corpus.select("k"), Seq("k"), "left_anti"))
      assert(got === oracle)
      val (replayed, _) = Membership.ingestBatch(grown, batch, "k", "doc_id")
      assert(replayed.count() === 0)
    } finally System.clearProperty("graft.membership.literalBlobBytesMax")
  }

  test("blob cache is byte-bounded and drops a released trigger's entries") {
    // VERDICT r14 item 2: per-bucket blobs past the 16 MB broadcast
    // switch are tens of MB, so a 64-ENTRY LRU could pin multiple GB
    // per executor; the bound must be accumulated filter BYTES. And a
    // destroyed broadcast's entries (fresh token per trigger) must drop
    // with the broadcast, not linger until eviction.
    def blob(n: Int): Array[Byte] = {
      val f = org.apache.spark.util.sketch.BloomFilter.create(n, 0.03)
      f.putLong(42L)
      val out = new java.io.ByteArrayOutputStream()
      f.writeTo(out); out.toByteArray
    }
    val b = blob(100000) // ~90 KB serialized
    BloomBlobCache.clearAll()
    System.setProperty("graft.membership.blobCacheBytesMax",
      (b.length * 2L + 100L).toString) // fits 2 filters, not 3
    try {
      BloomBlobCache.get("tokA", 0, () => b)
      BloomBlobCache.get("tokA", 1, () => b)
      assert(BloomBlobCache.cachedBytes === 2L * b.length)
      BloomBlobCache.get("tokB", 0, () => b)
      // byte cap enforced: the eldest (tokA, 0) evicted, total back
      // under the cap with the newest entry resident
      assert(BloomBlobCache.cachedBytes <= 2L * b.length + 100L,
        s"cache exceeded its byte cap: ${BloomBlobCache.cachedBytes}")
      assert(BloomBlobCache.cachedTokens === Set("tokA", "tokB"))
      // a single entry larger than the cap is still admitted (it is in
      // active use; re-deserializing per row is the failure the cache
      // exists to prevent) — everything else evicts around it
      val big = blob(400000) // ~4x the cap
      BloomBlobCache.get("tokC", 0, () => big)
      assert(BloomBlobCache.cachedTokens.contains("tokC"))
      BloomBlobCache.invalidateToken("tokC")

      // released trigger: the forced-broadcast ingest destroys its
      // broadcast once admissions materialize — its cache entries must
      // be gone with it (same JVM in local mode)
      BloomBlobCache.clearAll()
      val docs = graft.Tables.documents(spark, sfDir)
      val corpus = keyed(docs.filter(col("doc_id") % 10 =!= 0))
      var t = Membership.persistKeyedCorpus(corpus, "bbcache",
        freshCatalog("bbcache"), "k")
      t = Membership.writeMembershipFilter(t, spark, "k")
      val batch = keyed(docs.filter(col("doc_id") % 10 === 0))
      System.setProperty("graft.membership.literalBlobBytesMax", "0")
      try {
        val (admitted, _) = Membership.ingestBatch(t, batch, "k", "doc_id")
        assert(admitted.count() > 0)
        assert(BloomBlobCache.cachedTokens.isEmpty,
          s"released trigger left cache entries: ${BloomBlobCache.cachedTokens}")
      } finally System.clearProperty("graft.membership.literalBlobBytesMax")
    } finally {
      System.clearProperty("graft.membership.blobCacheBytesMax")
      BloomBlobCache.clearAll()
    }
  }

  test("racing ingesters: overlapping keys land exactly once") {
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = keyed(docs.filter(col("doc_id") % 10 > 4))
    var t = Membership.persistKeyedCorpus(corpus, "raceov",
      freshCatalog("raceov"), "k")
    t = Membership.writeMembershipFilter(t, spark, "k")
    // both ingesters carry the %10=2 KEYS (under different row ids) —
    // whichever fold lands second must re-probe and drop the overlap;
    // committing its stale admitted set would double-ingest every
    // overlapping key
    val batchA = keyed(docs.filter(col("doc_id") % 10 === 1))
      .unionAll(keyed(docs.filter(col("doc_id") % 10 === 2)))
    val batchB = keyed(docs.filter(col("doc_id") % 10 === 2))
      .select((col("doc_id") + 1000000).as("doc_id"), col("k"))
      .unionAll(keyed(docs.filter(col("doc_id") % 10 === 3)))
    val base = t
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fa = Future(Membership.ingestBatch(base, batchA, "k", "doc_id"))
    val fb = Future(Membership.ingestBatch(base, batchB, "k", "doc_id"))
    Await.result(fa, 5.minutes); Await.result(fb, 5.minutes)
    val grown = base.refresh()
    val dupKeys = grown.newScan().toDF(spark)
      .groupBy(col("k")).count().filter(col("count") > 1).count()
    assert(dupKeys === 0,
      "a racing ingester committed a stale admitted set — keys double-ingested")
    // nothing lost either: every non-corpus key of A∪B is present
    val expected = batchA.unionAll(batchB).select("k").distinct()
      .join(corpus.select("k"), Seq("k"), "left_anti").count()
    assert(grown.newScan().toDF(spark).count() === corpus.count() + expected)
  }

  test("compaction round-trip: rewrite breaks coverage, reattach restores it") {
    val docs = graft.Tables.documents(spark, sfDir)
    var t = Membership.persistKeyedCorpus(
      keyed(docs.filter(col("doc_id") % 10 > 3)), "cmp",
      freshCatalog("cmp"), "k")
    t = Membership.writeMembershipFilter(t, spark, "k")
    // three folds stack three small-file appends
    (1 to 3).foreach { i =>
      t = Membership.membershipIndexBatch(t,
        keyed(docs.filter(col("doc_id") % 10 === i)), "k")
    }
    val filesBefore = t.newScan().planFiles().size
    t = graft.table.Maintenance.rewriteDataFiles(t, spark)
    // the replace snapshot has no stats entry: the invariant catches it
    val probe = keyed(docs.filter(col("doc_id") % 10 === 0))
    intercept[IllegalStateException] {
      Membership.newKeys(t, spark, probe, "k")
    }
    // compaction preserved the key multiset, so the parent's filter
    // re-registers for the current snapshot — no rebuild pass
    t = Membership.reattachAfterRewrite(t)
    val got = ids(Membership.newKeys(t, spark, probe, "k"))
    val oracle = ids(probe.join(
      keyed(docs.filter(col("doc_id") % 10 =!= 0)).select("k"),
      Seq("k"), "left_anti"))
    assert(got === oracle)
    assert(t.newScan().planFiles().size < filesBefore,
      "compaction should fold the per-fold small files")
    // the entry MOVED (ancestor's registration dropped, earlier folds'
    // per-snapshot entries stay for time travel): no other entry shares
    // the live entry's path, so expiring every old snapshot must not
    // delete the stats file the live entry uses
    val curSf = t.metadata.statisticsFor(t.metadata.currentSnapshotId.get).get
    assert(t.metadata.statistics
      .count(_.statisticsPath == curSf.statisticsPath) === 1)
    t = graft.table.Maintenance.expireSnapshots(t,
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    assert(ids(Membership.newKeys(t, spark, probe, "k")) === oracle,
      "snapshot expiry deleted the reattached filter's file")

    // an append between filter and reattach is NOT data-preserving
    var t2 = t.append(probe)
    val e = intercept[IllegalArgumentException] {
      Membership.reattachAfterRewrite(t2)
    }
    assert(e.getMessage.contains("not a data-"))
  }

  test("membership filter coexists with NDV sketches in the snapshot's stats slot") {
    val docs = graft.Tables.documents(spark, sfDir)
    var t = Membership.persistKeyedCorpus(keyed(docs), "coex",
      freshCatalog("coex"), "k")
    val (t2, sketches) = graft.puffin.Sketches.writeDistinctStats(
      t, spark, Seq("k"))
    assert(sketches.nonEmpty)
    t = Membership.writeMembershipFilter(t2, spark, "k")
    // the replace carried the KMV blobs forward: NDV still readable
    val after = graft.puffin.Sketches.readCurrentStats(t)
    assert(after.map(_.column) === sketches.map(_.column))
    assert(after.map(_.estimate) === sketches.map(_.estimate))
    // and the membership probe serves from the same statistics file
    val copies = keyed(docs).limit(5)
      .select((col("doc_id") + 7000000).as("doc_id"), col("k"))
    assert(Membership.newKeys(t, spark, copies, "k").count() === 0)

    // the coexistence contract must survive MAINTENANCE too: a fold
    // rewrites the statistics slot, and the foreign blobs (NDV sketches)
    // must ride into the new file, not fall out at the first commit
    val fresh = keyed(docs).limit(8).select(
      (col("doc_id") + 8000000).as("doc_id"),
      md5(concat(col("k"), lit("fold"))).as("k"))
    t = Membership.membershipIndexBatch(t, fresh, "k")
    val afterFold = graft.puffin.Sketches.readCurrentStats(t)
    assert(afterFold.map(_.column) === sketches.map(_.column),
      "the fold dropped the foreign NDV blobs from the stats slot")
    assert(afterFold.map(_.estimate) === sketches.map(_.estimate))
  }

  test("fold IO: untouched buckets' blob bytes carry forward stored, byte-for-byte") {
    val docs = graft.Tables.documents(spark, sfDir)
    var t = Membership.persistKeyedCorpus(keyed(docs), "raw",
      freshCatalog("raw"), "k")
    t = Membership.writeMembershipFilter(t, spark, "k")
    def storedBlobs(x: graft.table.GraftTable): Map[Int, Seq[Byte]] = {
      val sf = x.metadata.statisticsFor(x.metadata.currentSnapshotId.get).get
      val (metas, _) = graft.puffin.Puffin.readMetadata(x.io, sf.statisticsPath)
      metas.filter(_.blobType == Membership.BlobType).map { m =>
        m.properties("bucket").toInt ->
          graft.puffin.Puffin.readBlobStored(x.io, sf.statisticsPath, m).toSeq
      }.toMap
    }
    val before = storedBlobs(t)
    assert(before.size > 1, "fixture must fill more than one key bucket")
    // a single-key batch touches exactly one bucket
    val one = keyed(docs).limit(1).select(
      (col("doc_id") + 9000000).as("doc_id"),
      md5(concat(col("k"), lit("one"))).as("k"))
    t = Membership.membershipIndexBatch(t, one, "k")
    val afterM = storedBlobs(t)
    val changed = before.keySet.filter(b =>
      afterM.get(b).exists(_ != before(b)))
    assert(changed.size <= 1,
      s"a one-key fold rewrote ${changed.size} buckets' bytes — untouched " +
        "blobs must carry forward without a decode/re-encode round trip")
    val untouchedSame = (before.keySet -- changed)
      .forall(b => afterM(b) == before(b))
    assert(untouchedSame, "an untouched bucket's stored bytes drifted")
  }

  test("broadcast probe path (blobs past the literal boundary) is exact too") {
    // force the over-threshold path: the verdicts — and therefore the
    // exact newKeys answer — must be identical to the literal when-chain
    // (BENCH_PLANCOST.json prices WHY the switch exists; this pins THAT
    // it is semantics-free)
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = keyed(docs.filter(col("doc_id") % 10 =!= 0))
    val batch = keyed(docs.filter(col("doc_id") % 10 === 0))
      .unionAll(keyed(docs.filter(col("doc_id") % 100 === 7))
        .select((col("doc_id") + 2000000).as("doc_id"), col("k")))
    val oracle = ids(batch.join(corpus.select("k"), Seq("k"), "left_anti"))
    val t0 = Membership.persistKeyedCorpus(corpus, "bcp", freshCatalog("bcp"), "k")
    val t = Membership.writeMembershipFilter(t0, spark, "k")
    val lit = ids(Membership.newKeys(t, spark, batch, "k"))
    System.setProperty("graft.membership.literalBlobBytesMax", "0")
    try {
      assert(Membership.literalBlobBytesMax === 0L)
      val bcDf = Membership.newKeys(t, spark, batch, "k")
      // plan pin (VERDICT r13 item 3): the over-threshold probe is a
      // codegen expression, not a Scala UDF — no row boundary breaks
      // whole-stage codegen exactly on the biggest corpora
      val planStr = bcDf.queryExecution.executedPlan.toString
      assert(!planStr.contains("ScalaUDF"),
        s"broadcast probe path planned a ScalaUDF row boundary:\n$planStr")
      assert(planStr.contains("bloom_blob_might_contain"),
        s"broadcast probe path did not plan BloomBlobMightContainExpr:\n$planStr")
      val bc = ids(bcDf)
      assert(bc === oracle)
      assert(bc === lit, "broadcast and literal probe paths disagree")
    } finally System.clearProperty("graft.membership.literalBlobBytesMax")
  }

  test("broadcast probe expression stays inside whole-stage codegen") {
    // the filter containing bloom_blob_might_contain must sit under a
    // WholeStageCodegen span — defineCodeGen emits one static call, so
    // a fallback to interpreted eval would be a regression
    val docs = graft.Tables.documents(spark, sfDir)
    val corpus = keyed(docs.filter(col("doc_id") % 10 =!= 0))
    val batch = keyed(docs.filter(col("doc_id") % 10 === 0))
    val t = Membership.writeMembershipFilter(
      Membership.persistKeyedCorpus(corpus, "bcg", freshCatalog("bcg"), "k"),
      spark, "k")
    System.setProperty("graft.membership.literalBlobBytesMax", "0")
    try {
      val df = Membership.newKeys(t, spark, batch, "k")
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // the codegen'd filter region: every operator id under a
      // WholeStageCodegen span is suffixed with its codegen id; the
      // probe's Filter must carry one
      val filterLines = formatted.linesIterator
        .filter(l => l.contains("Filter") && l.contains("codegen id"))
      assert(filterLines.nonEmpty,
        s"no codegen'd Filter in the broadcast probe plan:\n$formatted")
    } finally System.clearProperty("graft.membership.literalBlobBytesMax")
  }

  test("null keys are refused with a clear message, not an executor NPE") {
    val spark2 = spark
    import spark2.implicits._
    val good = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "k")
    val bad = Seq((3L, "cc"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "k")
    val cat = freshCatalog("nullk")
    val e1 = intercept[IllegalArgumentException] {
      Membership.persistKeyedCorpus(bad, "nk1", cat, "k")
    }
    assert(e1.getMessage.contains("NULL k keys"))
    var t = Membership.persistKeyedCorpus(good, "nk2", cat, "k")
    t = Membership.writeMembershipFilter(t, spark, "k")
    val e2 = intercept[IllegalArgumentException] {
      Membership.newKeys(t, spark, bad, "k")
    }
    assert(e2.getMessage.contains("NULL k keys"))
    val e3 = intercept[IllegalArgumentException] {
      Membership.membershipIndexBatch(t, bad, "k")
    }
    assert(e3.getMessage.contains("NULL k keys"))
  }

  test("reattach refuses when expiry raced the walk (stale handle, deleted file)") {
    val docs = graft.Tables.documents(spark, sfDir)
    var t = Membership.persistKeyedCorpus(
      keyed(docs.filter(col("doc_id") % 10 =!= 0)), "race",
      freshCatalog("race"), "k")
    t = Membership.writeMembershipFilter(t, spark, "k")
    t = graft.table.Maintenance.rewriteDataFiles(t, spark)
    // the handle a re-attach would walk: current = replace (uncovered),
    // parent = the covered build snapshot
    val stale = t
    // expiry lands between the walk's metadata read and the commit: the
    // covered ancestor and its stats FILE are gone from the live table
    val coveredSf = stale.metadata.statistics.head
    graft.table.Maintenance.expireSnapshots(t.refresh(),
      olderThanMs = System.currentTimeMillis() + 1000, retainLast = 1)
    assert(!stale.io.exists(coveredSf.statisticsPath),
      "expiry should have deleted the dropped ancestor's stats file")
    // the stale handle still SEES the ancestor + entry; the re-attach
    // must re-walk against the live metadata and refuse — committing
    // the stale walk's entry would register a dangling path
    val e = intercept[IllegalStateException] {
      Membership.reattachAfterRewrite(stale)
    }
    assert(e.getMessage.contains("writeMembershipFilter"),
      s"refusal must direct the caller to rebuild: ${e.getMessage}")
    // and no dangling registration landed
    val live = stale.refresh()
    live.metadata.statistics.foreach(sf =>
      assert(live.io.exists(sf.statisticsPath),
        s"dangling statistics entry committed: ${sf.statisticsPath}"))

    // the delete-files-before-commit ordering: entry still registered in
    // live metadata but the file is already gone — the existence check
    // inside the CAS loop refuses instead of moving a dead pointer
    var t2 = Membership.persistKeyedCorpus(
      keyed(docs.filter(col("doc_id") % 10 === 0)), "race2",
      freshCatalog("race2"), "k")
    t2 = Membership.writeMembershipFilter(t2, spark, "k")
    t2 = graft.table.Maintenance.rewriteDataFiles(t2, spark)
    val sf2 = t2.metadata.statistics.head
    t2.io.delete(sf2.statisticsPath)
    val e2 = intercept[IllegalStateException] {
      Membership.reattachAfterRewrite(t2)
    }
    assert(e2.getMessage.contains("missing"),
      s"expected the existence-check refusal: ${e2.getMessage}")
  }
}

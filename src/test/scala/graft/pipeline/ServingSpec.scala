package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.expr.{In => PIn, SetPred}
import graft.io.FileIO

/** Persisted-index serving: the materialized artifact must answer
  * exactly what the in-memory operator answers, and the probe must PRUNE
  * (bucket-partitioned index + In filter → fewer files planned). */
class ServingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("serving-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshCatalog(tag: String): HadoopCatalog = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-serve-$tag-").toString
    new HadoopCatalog(wh, FileIO.fromSpark(spark))
  }

  test("persisted inverted index answers term lookups exactly, pruned") {
    val docs = graft.Tables.documents(spark, sfDir)
    val t = Serving.persistInvertedIndex(docs, "inv", freshCatalog("inv"))
    val probe = Seq("the", "data", "model", "zebra")

    val got = Serving.lookupTerms(t, spark, probe)
      .orderBy(col("term")).collect().map(_.toString).toSeq
    val want = Search.invertedIndex(docs)
      .filter(col("term").isin(probe: _*))
      .orderBy(col("term")).collect().map(_.toString).toSeq
    assert(got === want)
    assert(got.nonEmpty, "probe terms must exist in the corpus")

    // the In predicate projects through bucket(term, 16): the probe scan
    // must plan strictly fewer files than the full index scan
    val allFiles = t.newScan().planFiles().size
    val probedFiles = t.newScan()
      .withFilter(SetPred(PIn, "term", probe.toSet[Any]))
      .planFiles().size
    assert(allFiles > 1, s"index should span multiple files, got $allFiles")
    assert(probedFiles < allFiles,
      s"bucket pruning did not engage: $probedFiles of $allFiles files")
  }

  test("persisted IVF index reproduces annIvf, probed cells pruned") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val queries = e.filter(col("vec_id") < 10)
    val (t, ct) = Serving.persistIvfIndex(e, "ivf", freshCatalog("ivf"))

    val got = Serving.annFromIvfIndex(t, ct, spark, queries, 3)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toString).toSeq
    val want = Similarity.annIvf(queries, e, 3)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toString).toSeq
    assert(got === want)
    assert(got.nonEmpty)

    // multi-probe parity: the persisted path's nprobe>1 must reproduce
    // annIvf's multi-probe result (same cell ranking and tie-breaks)
    val gotNp = Serving.annFromIvfIndex(t, ct, spark, queries, 3, nprobe = 4)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toString).toSeq
    val wantNp = Similarity.annIvf(queries, e, 3, nprobe = 4)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toString).toSeq
    assert(gotNp === wantNp)

    // identity(cell) partitioning: a one-cell probe (a real cid from the
    // centroid table) plans a non-empty strict subset of the files
    val cid = ct.newScan().toDF(spark).orderBy(col("cid")).limit(1)
      .collect()(0).getLong(0)
    val allFiles = t.newScan().planFiles().size
    val probed = t.newScan()
      .withFilter(SetPred(PIn, "cell", Set[Any](cid)))
      .planFiles().size
    assert(probed > 0 && probed < allFiles,
      s"cell pruning did not engage: $probed of $allFiles files")
  }

  test("index maintenance: an ingested batch is visible to the next probe") {
    val docs = graft.Tables.documents(spark, sfDir)
    val index = docs.filter(col("doc_id") % 10 === 1)
    val batchA = docs.filter(col("doc_id") % 10 === 7)
    val batchB = docs.filter(col("doc_id") % 10 === 3)

    var t = Serving.persistBandIndex(index, "maint", freshCatalog("maint"))
    t = Serving.indexBatch(t, batchA) // admit batch A into the artifact
    // batch B's probe must now see index ∪ A — equal to the
    // recompute-everything dedup over the grown corpus
    val grown = index.unionByName(batchA)
    val got = Serving.dedupAgainstBandIndex(t, spark, grown, batchB)
      .orderBy(col("new_id")).collect().map(_.toString).toSeq
    val want = Dedup.incrementalDedup(grown, batchB)
      .orderBy(col("new_id")).collect().map(_.toString).toSeq
    assert(got === want)
    // the append is snapshot-atomic: the table's history grew by one
    assert(t.metadata.snapshots.size === 2)
  }

  test("band-index probe refuses a (bands, rows) layout mismatch") {
    val docs = graft.Tables.documents(spark, sfDir)
    val index = docs.filter(col("doc_id") % 10 =!= 7).limit(50)
    val t = Serving.persistBandIndex(index, "bmm", freshCatalog("bmm"),
      bands = 16, rows = 4)
    val ex = intercept[IllegalArgumentException] {
      Serving.dedupAgainstBandIndex(t, spark, index,
        docs.filter(col("doc_id") % 10 === 7).limit(10), bands = 32, rows = 2)
    }
    assert(ex.getMessage.contains("bands=16"))
  }

  test("unknown materialize mode is an error, not a silent fallback") {
    val docs = graft.Tables.documents(spark, sfDir)
    spark.conf.set("spark.graft.pipeline.materialize", "persist-disk-only")
    try intercept[IllegalArgumentException] {
      Curation.pretrainPipeline(docs.limit(20)).collect()
    } finally spark.conf.unset("spark.graft.pipeline.materialize")
  }

  test("pretrainPipeline materialize modes agree (local-checkpoint/persist/none)") {
    val docs = graft.Tables.documents(spark, sfDir)
    def run(mode: String): Seq[String] = {
      spark.conf.set("spark.graft.pipeline.materialize", mode)
      try Curation.pretrainPipeline(docs)
        .orderBy(col("source")).collect().map(_.toString).toSeq
      finally {
        spark.conf.unset("spark.graft.pipeline.materialize")
        spark.catalog.clearCache()
      }
    }
    val lc = run("local-checkpoint")
    assert(lc.nonEmpty)
    assert(run("persist") === lc)
    assert(run("none") === lc)
  }

  test("persisted band index reproduces recompute-everything dedup") {
    val docs = graft.Tables.documents(spark, sfDir)
    val index = docs.filter(col("doc_id") % 10 =!= 7)
    val newDocs = docs.filter(col("doc_id") % 10 === 7)

    val t = Serving.persistBandIndex(index, "band", freshCatalog("band"))
    val got = Serving.dedupAgainstBandIndex(t, spark, index, newDocs)
      .orderBy(col("new_id")).collect().map(_.toString).toSeq
    val want = Dedup.incrementalDedup(index, newDocs)
      .orderBy(col("new_id")).collect().map(_.toString).toSeq
    assert(got === want)
    assert(got.nonEmpty)

    // identity band_idx partitioning: a one-band probe plans a strict
    // subset of the files
    val allFiles = t.newScan().planFiles().size
    val oneBand = t.newScan()
      .withFilter(graft.expr.BinaryPred(graft.expr.Eq, "band_idx", 3))
      .planFiles().size
    assert(oneBand < allFiles,
      s"band_idx pruning did not engage: $oneBand of $allFiles files")
  }
}

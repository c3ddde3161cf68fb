package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.expr.Predicate
import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._

/** Copy-on-write OVERWRITE WHERE / UPDATE WHERE. */
class RowOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("rowops-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "v", DoubleT, required = false),
    NestedField(3, "tag", StringT, required = false)))

  private def fresh(name: String) = GraftTable.create(name,
    new HadoopCatalog(java.nio.file.Files.createTempDirectory("graft-row-").toString,
      FileIO.fromSpark(spark)),
    schema, properties = Map("write.spark.max-records-per-file" -> "25"))

  private def seed(t: GraftTable) = {
    import spark.implicits._
    t.append((1L to 100L).map(i => (i, i * 1.0, if (i <= 50) "old" else "keep"))
      .toDF("id", "v", "tag"))
  }

  test("overwriteWhere replaces matching rows atomically") {
    import spark.implicits._
    var t = seed(fresh("ow1"))
    val replacement = (1L to 5L).map(i => (i + 1000L, 0.0, "new")).toDF("id", "v", "tag")
    t = t.overwriteWhere(Predicate.eqTo("tag", "old"), replacement, spark)

    val out = t.newScan().toDF(spark)
    assert(out.count() === 55) // 50 kept + 5 new
    assert(out.filter(col("tag") === "old").count() === 0)
    assert(out.filter(col("tag") === "new").count() === 5)
    assert(t.metadata.currentSnapshot.get.operation === "overwrite")
    // one atomic commit: exactly one new snapshot
    assert(t.metadata.snapshots.size === 2)
  }

  test("updateWhere rewrites only matching rows, preserves others") {
    var t = seed(fresh("up1"))
    val before = t.newScan().planFiles().size
    t = t.updateWhere(Predicate.gt("id", 90L),
      Map("v" -> (col("v") * 100), "tag" -> lit("boosted")), spark)

    val out = t.newScan().toDF(spark)
    assert(out.count() === 100)
    assert(out.filter(col("tag") === "boosted").count() === 10)
    val r95 = out.filter(col("id") === 95L).head
    assert(r95.getDouble(1) === 9500.0)
    val r10 = out.filter(col("id") === 10L).head
    assert(r10.getDouble(1) === 10.0 && r10.getString(2) === "old")
    // untouched files pass through unrewritten (CoW is surgical)
    assert(t.newScan().planFiles().size <= before + 2)
  }

  test("partition evolution: mixed-spec table scans and prunes per spec") {
    import spark.implicits._
    var t = fresh("evospec")
    // generation 1: unpartitioned
    t = t.append((1L to 50L).map(i => (i, i * 1.0, "g1")).toDF("id", "v", "tag"))
    // evolve to bucket(4) on id; generation 2 written under the new spec
    t = t.updateSpec(Seq("id" -> Transform.Bucket(4)))
    assert(t.spec.specId === 1)
    t = t.append((51L to 100L).map(i => (i, i * 1.0, "g2")).toDF("id", "v", "tag"))

    val all = t.newScan().toDF(spark)
    assert(all.count() === 100)
    assert(all.filter(col("tag") === "g2").count() === 50)

    // spec-aware pruning: an id equality prunes gen-2 buckets while gen-1
    // files (unpartitioned, no partition tuple) survive partition pruning
    // and fall through to metrics pruning
    val (planned, total) = t.newScan()
      .withFilter(Predicate.eqTo("id", 60L)).planSummary()
    assert(planned < total)
    val hit = t.newScan().withFilter(Predicate.eqTo("id", 60L)).toDF(spark)
    assert(hit.count() === 1)

    // metadata columns report per-file spec ids across generations
    val specIds = t.newScan().withMetadataColumns().toDF(spark)
      .select("_spec_id").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(specIds.toSeq === Seq(0, 1))
  }

  test("mergeInto upserts: matched rows replaced, new keys inserted") {
    import spark.implicits._
    var t = seed(fresh("merge1"))
    val before = t.newScan().planFiles().size
    // update ids 1..5, insert 201..203
    val source = ((1L to 5L).map(i => (i, -1.0, "merged")) ++
      (201L to 203L).map(i => (i, 9.0, "inserted"))).toDF("id", "v", "tag")
    t = t.mergeInto(source, Seq("id"))

    val out = t.newScan().toDF(spark)
    assert(out.count() === 103)
    assert(out.filter(col("tag") === "merged").count() === 5)
    assert(out.filter(col("tag") === "inserted").count() === 3)
    // replaced, not duplicated
    assert(out.filter(col("id") === 3L).count() === 1)
    assert(out.filter(col("id") === 3L).head.getDouble(1) === -1.0)
    // untouched rows intact
    assert(out.filter(col("id") === 80L).head.getString(2) === "keep")
    assert(t.metadata.currentSnapshot.get.operation === "overwrite")
    // IN-predicate planning kept the rewrite surgical: ids 1..5 live in
    // one 25-row file, so at most that file (+ noise) was dropped
    val dropped = t.metadata.currentSnapshot.get.summary("merged-data-files").toInt
    assert(dropped <= 2, s"merge rewrote $dropped files of $before")
  }

  test("incremental append scan: exactly the rows of in-range snapshots") {
    import spark.implicits._
    var t = fresh("incr")
    t = t.append((1L to 10L).map(i => (i, 1.0, "s1")).toDF("id", "v", "tag"))
    val s1 = t.metadata.currentSnapshotId.get
    t = t.append((11L to 20L).map(i => (i, 2.0, "s2")).toDF("id", "v", "tag"))
    val s2 = t.metadata.currentSnapshotId.get
    t = t.append((21L to 30L).map(i => (i, 3.0, "s3")).toDF("id", "v", "tag"))
    val s3 = t.metadata.currentSnapshotId.get

    def ids(from: Long, to: Long) =
      t.newScan().appendsBetween(from, to).toDF(spark)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(s1, s2) === (11L to 20L))
    assert(ids(s1, s3) === (11L to 30L))
    assert(ids(s2, s3) === (21L to 30L))
    // delete snapshot in range → refused
    t = t.deleteWhere(Predicate.eqTo("id", 1L), spark)
    val s4 = t.metadata.currentSnapshotId.get
    intercept[IllegalArgumentException] { t.newScan().appendsBetween(s2, s4) }
  }

  test("incremental append scan refuses a non-ancestor start snapshot") {
    import spark.implicits._
    var t = fresh("incr_roll")
    t = t.append((1L to 5L).map(i => (i, 1.0, "s1")).toDF("id", "v", "tag"))
    val s1 = t.metadata.currentSnapshotId.get
    t = t.append((6L to 10L).map(i => (i, 2.0, "s2")).toDF("id", "v", "tag"))
    val s2 = t.metadata.currentSnapshotId.get
    // rollback to s1, then commit a new lineage: s2 is now ORPHANED
    t = t.rollbackTo(s1)
    t = t.append((11L to 15L).map(i => (i, 3.0, "s3")).toDF("id", "v", "tag"))
    val s3 = t.metadata.currentSnapshotId.get
    // the window (s2, s3] is undefined — silently walking to the root
    // would serve the FULL table as an "increment"
    val e = intercept[IllegalArgumentException] {
      t.newScan().appendsBetween(s2, s3).toDF(spark).collect()
    }
    assert(e.getMessage.contains("not an ancestor"), e.getMessage)
    // the valid window still works after the rollback
    assert(t.newScan().appendsBetween(s1, s3).toDF(spark)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq === (11L to 15L))
  }

  test("size-targeted rolling writer splits output files") {
    import spark.implicits._
    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-roll-").toString,
      FileIO.fromSpark(spark))
    var t = GraftTable.create("roll", catalog, schema,
      properties = Map("write.target-file-size-bytes" -> "4096"))
    t = t.append((1L to 20000L).map(i => (i, i * 1.0, s"tag$i"))
      .toDF("id", "v", "tag").coalesce(1))
    val files = t.newScan().planFiles()
    assert(files.size > 1, "byte target should split a single input partition")
    // row-width estimate errs small-side: files at or under ~4x target
    assert(files.map(_.file.fileSizeInBytes).max < 4096L * 8)
  }

  test("write.distribution-mode=range: files carry disjoint sort-key ranges") {
    import spark.implicits._
    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-range-").toString,
      FileIO.fromSpark(spark))
    var t = GraftTable.create("rangemode", catalog, schema,
      properties = Map("write.distribution-mode" -> "range",
        "write.spark.max-records-per-file" -> "1000"))
    t = t.replaceSortOrder(Seq(SortField(1, Transform.Identity,
      ascending = true, nullsFirst = true)))
    // shuffled input: range exchange must re-cluster it globally
    t = t.append((1L to 4000L).map(i => ((i * 2654435761L) % 4001L, i * 1.0, s"t$i"))
      .toDF("id", "v", "tag").repartition(4))
    val files = t.newScan().planFiles()
    assert(files.size > 1)
    // per-file [min,max] id bounds must be pairwise disjoint — the global
    // range exchange is exactly what a local sort can't provide
    val bounds = files.map(f =>
      (f.file.lowerBounds(1).asInstanceOf[Long], f.file.upperBounds(1).asInstanceOf[Long]))
      .sortBy(_._1)
    bounds.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) => assert(hi <= lo2, s"overlap: $bounds")
      case _ =>
    }
    assert(t.newScan().toDF(spark).count() === 4000)

    intercept[IllegalArgumentException] {
      GraftTable.create("badmode", catalog, schema,
        properties = Map("write.distribution-mode" -> "zigzag"))
        .append(Seq((1L, 1.0, "x")).toDF("id", "v", "tag"))
    }
  }

  test("many-file append: commit cost is metadata-only per file") {
    import spark.implicits._
    var t = fresh("many")
    val t0 = System.nanoTime()
    t = t.append((1L to 2000L).map(i => (i, i * 1.0, "x")).toDF("id", "v", "tag")
      .repartition(8).sortWithinPartitions("id"),
    )
    // property-driven 25-rows-per-file → ~80 files; with the rename-free
    // write path the whole commit is one Spark write + one harvest job +
    // one manifest append
    val sec = (System.nanoTime() - t0) / 1e9
    val n = t.newScan().planFiles().size
    assert(n >= 50, s"expected many files, got $n")
    assert(sec < 60, s"append of $n files took ${sec}s")
    assert(t.newScan().toDF(spark).count() === 2000)
    // planning with the manifest cache is sub-second
    val p0 = System.nanoTime()
    (1 to 10).foreach(_ => t.newScan().planFiles())
    assert((System.nanoTime() - p0) / 1e9 < 2.0)
  }

  test("utf-8 bound order: supplementary chars don't mis-prune") {
    import spark.implicits._
    var t = fresh("utf8")
    // U+FF21 (FULLWIDTH A, > emoji in UTF-16) and U+1F600 (emoji,
    // supplementary): byte order must govern bounds
    t = t.append(Seq((1L, 1.0, "Ａwide"), (2L, 2.0, "😀emoji"))
      .toDF("id", "v", "tag").coalesce(1))
    val f = t.newScan().planFiles().head.file
    // UTF-8 order: fullwidth A (EF BC A1) < emoji (F0 9F 98 80)
    assert(f.lowerBounds(3).asInstanceOf[String].startsWith("Ａ"))
    assert(f.upperBounds(3).asInstanceOf[String].startsWith("😀"))
    // a filter on the emoji value must NOT be pruned away
    val hits = t.newScan()
      .withFilter(Predicate.eqTo("tag", "😀emoji")).toDF(spark)
    assert(hits.count() === 1)
  }

  test("overwrite composes with MoR deletes: no resurrection") {
    var t = seed(fresh("ow2"))
    // MoR delete ids 1..10, then overwrite tag=old (ids 1..50 minus deleted)
    t = t.deleteWhereDV(Predicate.ltEq("id", 10L), spark)
    assert(t.newScan().toDF(spark).count() === 90)
    t = t.overwriteWhere(Predicate.eqTo("tag", "old"), null, spark)
    val out = t.newScan().toDF(spark)
    // all old rows gone, deleted rows NOT resurrected, keeps intact
    assert(out.count() === 50)
    assert(out.agg(min("id")).head.getLong(0) === 51L)
  }
}

package graft.table

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.{Catalog, HadoopCatalog, MemoryCatalog}
import graft.expr.Predicate
import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._

/** Metadata-only transactions, limit pushdown, bind validation, and the
  * memory catalog. */
class TransactionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("transactions-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "v", DoubleT, required = false),
    NestedField(3, "s", StringT, required = false)))

  private def freshHadoop(): Catalog = new HadoopCatalog(
    java.nio.file.Files.createTempDirectory("graft-tx-").toString,
    FileIO.fromSpark(spark))

  private def sampleDf = {
    import spark.implicits._
    (1L to 100L).map(i => (i, i * 0.5, s"row$i")).toDF("id", "v", "s")
  }

  test("updateProperties: set + remove round-trips; conflicts retried") {
    var t = GraftTable.create("props", freshHadoop(), schema)
    t = t.updateProperties(Map("write.parquet.compression-codec" -> "snappy", "owner" -> "x"))
    assert(t.metadata.properties("owner") === "x")
    t = t.updateProperties(Map("owner" -> "y"), remove = Set("write.parquet.compression-codec"))
    assert(t.metadata.properties("owner") === "y")
    assert(!t.metadata.properties.contains("write.parquet.compression-codec"))
    intercept[IllegalArgumentException] {
      t.updateProperties(Map("a" -> "1"), remove = Set("a"))
    }
    // reserved keys (table_properties.rs RESERVED_PROPERTIES) are control
    // knobs, never plain properties — setting them is refused
    Seq("uuid", "snapshot-count", "current-snapshot-id", "format-version")
      .foreach { k =>
        val e = intercept[IllegalArgumentException] {
          t.updateProperties(Map(k -> "x"))
        }
        assert(e.getMessage.contains("reserved"), s"$k: ${e.getMessage}")
      }
    // removing a reserved key is a no-op, not an error (nothing persisted)
    t = t.updateProperties(Map.empty, remove = Set("uuid"))
  }

  test("replaceSortOrder: new order becomes default; unknown column refused") {
    var t = GraftTable.create("sorts", freshHadoop(), schema)
    t = t.replaceSortOrder(Seq(
      SortField(1, Transform.Identity, ascending = true, nullsFirst = false)))
    assert(t.metadata.defaultSortOrderId === 1)
    assert(t.metadata.sortOrders.map(_.orderId).toSet === Set(0, 1))
    intercept[IllegalArgumentException] {
      t.replaceSortOrder(Seq(SortField(99, Transform.Identity, true, false)))
    }
  }

  test("upgradeFormatVersion: idempotent up, refuses down") {
    val t = GraftTable.create("fv", freshHadoop(), schema)
    assert(t.metadata.formatVersion === 2)
    assert(t.upgradeFormatVersion(2).metadata.formatVersion === 2)
    intercept[IllegalArgumentException] { t.upgradeFormatVersion(1) }
  }

  test("limit pushdown: plans a strict prefix of files and caps rows") {
    var t = GraftTable.create("lim", freshHadoop(), schema,
      properties = Map("write.spark.max-records-per-file" -> "10"))
    t = t.append(sampleDf) // 100 rows → ≥10 files
    val full = t.newScan().planFiles().size
    assert(full >= 10)
    val limited = t.newScan().limit(25)
    val df = limited.toDF(spark)
    assert(df.count() === 25)
    // planning short-circuited: inspect the planned file set via toDF's
    // path (covered rows just over the limit)
    val planned = {
      // re-derive with the same semantics as planWithLimit
      var acc = 0L
      t.newScan().planFiles().takeWhile { task =>
        val need = acc < 25; acc += task.file.recordCount; need
      }
    }
    assert(planned.size < full)
    assert(planned.map(_.file.recordCount).sum >= 25)
  }

  test("bind validates literal types and adapts widths") {
    val s = schema
    // int literal widens against long column
    val p = Predicate.bind(Predicate.eqTo("id", 7), s)
    assert(p === graft.expr.BinaryPred(graft.expr.Eq, "id", 7L))
    intercept[IllegalArgumentException] {
      Predicate.bind(Predicate.eqTo("id", "seven"), s)
    }
    intercept[IllegalArgumentException] {
      Predicate.bind(Predicate.startsWith("v", "x"), s) // non-string column
    }
    intercept[IllegalArgumentException] {
      Predicate.bind(graft.expr.UnaryPred(graft.expr.IsNan, "s"), s)
    }
  }

  test("whole-file delete: strict-covered files drop at manifest level") {
    var t = GraftTable.create("wholedel", freshHadoop(), schema,
      properties = Map("write.spark.max-records-per-file" -> "20",
        "write.spark.sort-order" -> "id"))
    t = t.replaceSortOrder(Seq(
      SortField(1, Transform.Identity, ascending = true, nullsFirst = false)))
    t = t.append(sampleDf) // ids 1..100, sorted files of ≤20 rows
    val before = t.newScan().planFiles().size
    assert(before >= 5)

    // ids > 40: several whole files (41-60, 61-80, 81-100) + none partial
    // if file boundaries align; predicate gt 50 makes 41-60 partial
    t = t.deleteWhere(Predicate.gt("id", 50L), spark)
    assert(t.newScan().toDF(spark).count() === 50)
    // strict fast path dropped at least the fully-covered files
    assert(t.newScan().planFiles().size < before)
    // boundary file (41..60) is served through a position-delete, not lost
    val ids = t.newScan().toDF(spark).select("id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (1L to 50L))

    // clustered write: a point filter on the sort column plans ≤2 files
    val (planned, all) = t.newScan()
      .withFilter(Predicate.eqTo("id", 7L)).planSummary()
    assert(planned <= 2 && planned < all)
  }

  test("byte-range splits land on row-group boundaries and cover files") {
    var t = GraftTable.create("splits", freshHadoop(), schema)
    t = t.append(sampleDf)
    val tasks = t.newScan().planFiles()
    // tiny target → one split per row group where offsets exist
    val splits = t.newScan().planSplits(targetSplitSize = 1L)
    assert(splits.map(_.task.file.filePath).toSet === tasks.map(_.file.filePath).toSet)
    // per file: contiguous, non-overlapping, ending at file size
    splits.groupBy(_.task.file.filePath).foreach { case (_, ss) =>
      val sorted = ss.sortBy(_.start)
      sorted.sliding(2).foreach {
        case Seq(x, y) => assert(x.start + x.length === y.start)
        case _ =>
      }
      assert(sorted.last.start + sorted.last.length ===
        sorted.head.task.file.fileSizeInBytes)
    }
    // large target → one split per file
    assert(t.newScan().planSplits(targetSplitSize = 1L << 40).size === tasks.size)
  }

  test("scan metrics count per-stage pruning") {
    import org.apache.spark.sql.functions.col
    var t = GraftTable.create("metrics", freshHadoop(), schema,
      PartitionSpec.build(schema, Seq("id" -> Transform.Bucket(8))),
      properties = Map("write.spark.max-records-per-file" -> "10"))
    t = t.append(sampleDf)
    val (tasks, m) = t.newScan()
      .withFilter(Predicate.eqTo("id", 7L)).planWithMetrics()
    assert(m.resultFiles === tasks.size)
    assert(m.skippedByPartition > 0) // other buckets pruned
    assert(m.entriesConsidered ===
      m.skippedByPartition + m.skippedByMetrics + m.resultFiles)
    val (all, m2) = t.newScan().planWithMetrics()
    assert(m2.skippedByPartition === 0)
    assert(m2.resultFiles === all.size)
  }

  test("branches and tags: ref-scoped scans, expire keeps ref targets") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    var t = GraftTable.create("refs1", freshHadoop(), schema)
    t = t.append((1L to 10L).map(i => (i, i * 1.0, s"r$i")).toDF("id", "v", "s"))
    t = t.createTag("v1")
    t = t.createBranch("audit")
    t = t.append((11L to 20L).map(i => (i, i * 1.0, s"r$i")).toDF("id", "v", "s"))

    assert(t.newScan().toDF(spark).count() === 20)
    assert(t.newScan().useRef("v1").toDF(spark).count() === 10)
    assert(t.newScan().useRef("audit").toDF(spark).count() === 10)
    assert(t.refsDf(spark).collect().map(r => (r.getString(0), r.getString(1))).toSeq
      === Seq(("audit", "branch"), ("v1", "tag")))
    // metadata round-trips through JSON
    val reloaded = t.refresh()
    assert(reloaded.metadata.refs.keySet === Set("audit", "v1"))

    // expire keeps the tagged snapshot alive even when old enough
    t = t.expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000)
    assert(t.newScan().useRef("v1").toDF(spark).count() === 10)

    t = t.removeRef("audit")
    intercept[IllegalArgumentException] { t.newScan().useRef("audit") }
    intercept[IllegalArgumentException] { t.createTag("x", Some(123456L)) }
  }

  test("nan counts on write drive is_nan pruning; metadata tables roll up") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    var t = GraftTable.create("nans", freshHadoop(), schema,
      properties = Map("write.collect-nan-counts" -> "true"))
    t = t.append(Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("id", "v", "s").coalesce(1))
    t = t.append(Seq((3L, Double.NaN, "c"), (4L, 4.0, "d")).toDF("id", "v", "s").coalesce(1))

    val nanCounts = t.newScan().planFiles()
      .map(_.file.nanValueCounts.getOrElse(2, -1L)).sorted
    assert(nanCounts === Seq(0L, 1L)) // harvested, not defaulted

    // is_nan prunes the clean file
    val (planned, all) = t.newScan()
      .withFilter(graft.expr.UnaryPred(graft.expr.IsNan, "v")).planSummary()
    assert(all === 2 && planned === 1)

    // entries/partitions metadata tables
    assert(t.entriesDf(spark).count() === 2)
    val parts = t.partitionsDf(spark).collect()
    assert(parts.length === 1) // unpartitioned → single rollup row
    assert(parts.head.getAs[Long]("record_count") === 4L)
    assert(parts.head.getAs[Int]("file_count") === 2)
  }

  test("orphan cleanup and rollback") {
    import spark.implicits._
    var t = GraftTable.create("gc", freshHadoop(), schema)
    t = t.append((1L to 10L).map(i => (i, 1.0, "a")).toDF("id", "v", "s"))
    val firstSnap = t.metadata.currentSnapshotId.get
    t = t.append((11L to 20L).map(i => (i, 2.0, "b")).toDF("id", "v", "s"))

    // plant an orphan (failed-job leftover) in the data subtree
    val orphan = s"${t.location}/data/commit-dead/junk.parquet"
    t.io.writeBytes(orphan, Array[Byte](1, 2, 3))

    val deleted = t.removeOrphanFiles(System.currentTimeMillis() + 60000, spark)
    assert(deleted.exists(_.endsWith("junk.parquet")))
    assert(deleted.size === 1, s"must not GC referenced files: $deleted")
    assert(t.newScan().toDF(spark).count() === 20) // table intact

    // rollback: current flips to the first snapshot, data still readable
    t = t.rollbackTo(firstSnap)
    assert(t.newScan().toDF(spark).count() === 10)
    // the abandoned snapshot's files survive orphan GC (still referenced)
    val deleted2 = t.removeOrphanFiles(System.currentTimeMillis() + 60000, spark)
    assert(deleted2.isEmpty)
  }

  test("nested types: struct/list/map round-trip through append + scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, struct, array, map, lit}
    val src = (1L to 20L).map(i => (i, s"n$i", i * 1.5)).toDF("id", "nm", "w")
      .select(col("id"),
        struct(col("nm").as("name"), col("w").as("weight")).as("info"),
        array(col("id") * 10, col("id") * 20).as("xs"),
        map(lit("k"), col("id")).as("m"))
    val schema = IcebergSchema.fromSpark(src.schema)
    // nested ids flattened + unique
    val ids = schema.idToField.keySet
    assert(ids.size === schema.idToField.size && ids.max > 4)

    var t = GraftTable.create("nested", freshHadoop(), schema)
    t = t.append(src)
    val back = t.newScan().toDF(spark).orderBy("id")
    assert(back.count() === 20)
    val r = back.head
    assert(r.getStruct(1).getString(0) === "n1")
    assert(r.getSeq[Long](2) === Seq(10L, 20L))
    assert(r.getMap[String, Long](3)("k") === 1L)
    // nested-field residual filters work through Catalyst
    assert(back.filter(col("info.weight") > 15.0).count() === 10)
    // top-level stats still harvested alongside nested columns
    val f = t.newScan().planFiles().head.file
    assert(f.lowerBounds.contains(1))
  }

  test("row lineage: contiguous first_row_id blocks, dense _row_id, seq column") {
    import spark.implicits._
    var t = GraftTable.create("lineage", freshHadoop(), schema)
    t = t.append((1L to 10L).map(i => (i, 1.0, "a")).toDF("id", "v", "s"))
    t = t.append((11L to 25L).map(i => (i, 2.0, "b")).toDF("id", "v", "s"))

    // next-row-id advanced by exactly the appended rows and round-trips JSON
    assert(t.metadata.nextRowId === 25L)
    assert(graft.spec.TableMetadata.fromJsonString(t.metadata.toJsonString)
      .nextRowId === 25L)

    // per-file blocks are contiguous and disjoint (manifest serde included)
    val files = t.newScan().planFiles().map(_.file)
    assert(files.forall(_.firstRowId.isDefined))
    val blocks = files.map(f => (f.firstRowId.get, f.recordCount)).sortBy(_._1)
    val covered = blocks.foldLeft(0L) { case (next, (first, n)) =>
      assert(first === next, s"gap/overlap at $first, expected $next"); first + n
    }
    assert(covered === 25L)

    // _row_id is dense 0..24; _last_updated_sequence_number tracks the commit
    val meta = t.newScan().withMetadataColumns().toDF(spark)
      .select("_row_id", "_last_updated_sequence_number", "id")
      .collect()
    assert(meta.map(_.getLong(0)).sorted.toSeq === (0L until 25L))
    assert(meta.map(_.getLong(1)).toSet === Set(1L, 2L))
    // second append's rows carry sequence number 2
    assert(meta.filter(_.getLong(2) > 10L).forall(_.getLong(1) === 2L))
  }

  test("unified _partition spans evolved specs; old files keep their fields") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    var t = GraftTable.create("unipart", freshHadoop(), schema,
      PartitionSpec(0, Seq(PartitionField(3, 1000, "s", Transform.Identity))))
    t = t.append(Seq((1L, 1.0, "a"), (2L, 2.0, "b")).toDF("id", "v", "s"))
    // evolve: drop s, partition by bucket(id) — new field id 1001
    t = Transactions.updateSpec(t, Seq("id" -> Transform.Bucket(4)))
    t = t.append(Seq((3L, 3.0, "c"), (4L, 4.0, "d")).toDF("id", "v", "s"))

    // unified type = BOTH generations' fields, sorted by field id
    val uni = PartitionSpec.unifiedPartitionType(
      t.metadata.partitionSpecs, t.schema)
    assert(uni.fields.map(f => (f.id, f.name)) === Seq(
      (1000, "s"), (1001, "id_bucket")))

    val rows = t.newScan().withMetadataColumns().toDF(spark)
      .select(col("id"), col("_spec_id"),
        col("_partition.s").as("ps"), col("_partition.id_bucket").as("pb"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        Option(r.get(2)), Option(r.get(3)))).sortBy(_._1)
    // gen-0 files: s populated, bucket null; gen-1 files: the reverse —
    // before unification gen-0 tuples collapsed to all-null
    assert(rows.filter(_._2 == 0).forall { case (id, _, ps, pb) =>
      ps.contains(if (id == 1L) "a" else "b") && pb.isEmpty })
    assert(rows.filter(_._2 == 1).forall { case (_, _, ps, pb) =>
      ps.isEmpty && pb.isDefined })
    assert(rows.map(_._2).toSet === Set(0, 1))

    // void-override rule: newest spec voids the field but keeps its id —
    // older REAL transform's type survives under the newer name
    val s0 = PartitionSpec(0, Seq(PartitionField(1, 1000, "id_bucket", Transform.Bucket(4))))
    val s1 = PartitionSpec(1, Seq(PartitionField(1, 1000, "id_bucket_v", Transform.Void)))
    val u2 = PartitionSpec.unifiedPartitionType(Seq(s0, s1), schema)
    assert(u2.fields.map(f => (f.id, f.name, f.fieldType)) ===
      Seq((1000, "id_bucket_v", IntT)))
    // incompatible duplicate id (different source) is refused
    val bad = PartitionSpec(2, Seq(PartitionField(2, 1000, "other", Transform.Identity)))
    intercept[IllegalArgumentException] {
      PartitionSpec.unifiedPartitionType(Seq(s0, bad), schema)
    }
  }

  test("variant (v3) column round-trips through a graft table") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, parse_json, variant_get}
    val src = Seq(
      (1L, """{"a": 1, "s": "x"}"""),
      (2L, """{"a": 2, "s": "y", "extra": [1,2]}"""),
      (3L, """{"a": 3}""")).toDF("id", "j")
      .select(col("id"), parse_json(col("j")).as("props"))
    val vschema = IcebergSchema.fromSpark(src.schema)
    assert(vschema.fields(1).fieldType === IcebergType.VariantT)
    // schema JSON round-trips the variant type
    assert(IcebergSchema.schemaFromJson(vschema.toJson) === vschema)

    var t = GraftTable.create("variants", freshHadoop(), vschema)
    t = t.append(src)
    val back = t.newScan().toDF(spark)
      .select(col("id"), variant_get(col("props"), "$.a", "long").as("a"),
        variant_get(col("props"), "$.s", "string").as("s"))
      .orderBy("id").collect()
    assert(back.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
    assert(back.map(_.getString(2)).toSeq === Seq("x", "y", null))
  }

  test("metadata_log_entries: one row per metadata generation with its snapshot") {
    var t = GraftTable.create("mlog", freshHadoop(), schema)
    t = t.append(sampleDf)
    t = t.updateProperties(Map("owner" -> "x"))
    val rows = t.metadataLogEntriesDf(spark)
      .orderBy("timestamp").collect()
    assert(rows.length === 3) // create, append, props — current included
    // generations before the append have no snapshot; later ones do
    assert(rows.head.isNullAt(2))
    assert(rows.last.getLong(2) === t.metadata.currentSnapshotId.get)
    assert(rows.map(_.getString(1)).distinct.length === 3)
  }

  test("updateLocation moves future data placement; old files still read") {
    var t = GraftTable.create("loc", freshHadoop(), schema)
    t = t.append(sampleDf)
    val newRoot = java.nio.file.Files.createTempDirectory("graft-newloc-").toString
    t = t.updateLocation(newRoot)
    assert(t.location === newRoot)
    intercept[IllegalArgumentException] { t.updateLocation(newRoot + "/") }
    t = t.append(sampleDf)
    assert(t.newScan().toDF(spark).count() === 200)
    // the second append landed under the new root, the first did not
    val paths = t.newScan().planFiles().map(_.file.filePath)
    assert(paths.exists(_.contains(newRoot)))
    assert(paths.exists(!_.contains(newRoot)))
  }

  test("updateStatistics: set replaces per snapshot, remove drops") {
    var t = GraftTable.create("ustats", freshHadoop(), schema)
    t = t.append(sampleDf)
    val snap = t.metadata.currentSnapshotId.get
    def sf(path: String) = StatisticsFile(snap, path, 10L, 4L,
      Seq(StatsBlobMetadata("apache-datasketches-theta-v1", snap, 1L, Seq(1), Map.empty)))
    t = t.updateStatistics(set = Seq(sf("s3://stats/a.puffin")))
    t = t.updateStatistics(set = Seq(sf("s3://stats/b.puffin"))) // replace, same snapshot
    assert(t.metadata.statistics.map(_.statisticsPath) === Seq("s3://stats/b.puffin"))
    t = t.updateStatistics(removeSnapshotIds = Set(snap))
    assert(t.metadata.statistics.isEmpty)
  }

  test("format version upgrades 2→3, refuses downgrade and unknown") {
    var t = GraftTable.create("fmtv", freshHadoop(), schema)
    assert(t.metadata.formatVersion === 2)
    t = t.upgradeFormatVersion(3)
    assert(t.metadata.formatVersion === 3)
    intercept[IllegalArgumentException] { t.upgradeFormatVersion(2) }
    intercept[IllegalArgumentException] { t.upgradeFormatVersion(4) }
    // v3 table still reads/writes
    t = t.append(sampleDf)
    assert(t.newScan().toDF(spark).count() === 100)
  }

  test("write-audit-publish: branch-staged appends invisible until fast-forward") {
    import spark.implicits._
    var t = GraftTable.create("wap", freshHadoop(), schema)
    t = t.append(sampleDf)
    val baseCount = t.newScan().toDF(spark).count()
    t = t.createBranch("audit")

    // two staged commits on the branch
    t = t.appendToBranch((101L to 110L).map(i => (i, 0.0, "staged")).toDF("id", "v", "s"), "audit")
    t = t.appendToBranch((111L to 120L).map(i => (i, 0.0, "staged")).toDF("id", "v", "s"), "audit")

    // main line untouched: current scan, snapshot-log, time-travel history
    assert(t.newScan().toDF(spark).count() === baseCount)
    assert(t.metadata.snapshotLog.size === 1, "snapshot-log tracks main only")
    // the branch sees staged data (ref-scoped audit read)
    assert(t.newScan().useRef("audit").toDF(spark).count() === baseCount + 20)
    // branch head's parent chain reaches the staged-from snapshot
    val head = t.metadata.snapshotById(t.metadata.refs("audit").snapshotId).get
    assert(t.metadata.snapshotById(head.parentSnapshotId.get).get
      .parentSnapshotId === t.metadata.currentSnapshotId)

    // publish = fast-forward; afterwards main serves the staged rows
    t = t.publish("audit")
    assert(t.newScan().toDF(spark).count() === baseCount + 20)
    assert(t.metadata.currentSnapshotId === Some(t.metadata.refs("audit").snapshotId))
    // the publish is a change to main's current-snapshot-id, so the spec
    // requires a snapshot-log entry: as-of-timestamp reads AFTER the
    // publish must serve the published state, and history must show it
    assert(t.metadata.snapshotLog.size === 2, "publish must append to snapshot-log")
    assert(t.metadata.snapshotLog.last._1 === t.metadata.currentSnapshotId.get)
    assert(t.asOfTimestamp(System.currentTimeMillis() + 1)
      .newScan().toDF(spark).count() === baseCount + 20)

    // diverged branch refuses to fast-forward
    t = t.createBranch("other", Some(t.metadata.snapshots.head.snapshotId))
    val err = intercept[IllegalArgumentException] {
      t.publish("other")
    }
    assert(err.getMessage.contains("not a fast-forward"))
  }

  test("parquet write knobs: per-column bloom filter from table property") {
    var t = GraftTable.create("bloomy", freshHadoop(), schema,
      properties = Map(
        "write.parquet.bloom-filter-enabled.column.s" -> "true",
        "write.parquet.row-group-size-bytes" -> (1L << 20).toString))
    t = t.append(sampleDf)
    val file = t.newScan().planFiles().head.file.filePath
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        new org.apache.hadoop.conf.Configuration()))
    try {
      import scala.jdk.CollectionConverters._
      val cols = rd.getFooter.getBlocks.get(0).getColumns.asScala
      assert(cols.find(_.getPath.toDotString == "s").get.getBloomFilterOffset > 0,
        "bloom filter written for configured column")
      assert(cols.find(_.getPath.toDotString == "id").get.getBloomFilterOffset <= 0,
        "no bloom filter for unconfigured column")
    } finally rd.close()
  }

  test("register_table adopts an existing metadata file; purge_table deletes files") {
    val catA = freshHadoop()
    var t = GraftTable.create("reg_src", catA, schema)
    t = t.append(sampleDf)
    val metadataLoc = s"${t.location}/metadata/v2.metadata.json"
    assert(t.io.exists(metadataLoc))

    // adopt into a different catalog: same files, independent history
    val catB = new MemoryCatalog(
      java.nio.file.Files.createTempDirectory("graft-reg-b-").toString,
      FileIO.local())
    val adopted = catB.registerTable("adopted", metadataLoc)
    assert(adopted.currentSnapshotId === t.metadata.currentSnapshotId)
    val t2 = GraftTable.load("adopted", catB)
    assert(t2.newScan().toDF(spark).count() === 100)
    // and the adopted table keeps committing in its new catalog
    assert(t2.append(sampleDf).newScan().toDF(spark).count() === 200)
    intercept[IllegalArgumentException] {
      catB.registerTable("adopted", metadataLoc)
    }

    // purge deletes data, manifests, lists and metadata generations
    val dataFiles = t.newScan().planFiles().map(_.file.filePath)
    assert(dataFiles.nonEmpty && dataFiles.forall(t.io.exists))
    assert(catA.purgeTable("reg_src"))
    assert(!catA.tableExists("reg_src"))
    assert(dataFiles.forall(p => !t.io.exists(p)), "purged data files remain")
  }

  test("memory catalog: create/load/commit/conflict semantics") {
    val cat = new MemoryCatalog(
      java.nio.file.Files.createTempDirectory("graft-mem-").toString,
      FileIO.fromSpark(spark))
    var t = GraftTable.create("m1", cat, schema)
    t = t.append(sampleDf)
    assert(t.newScan().toDF(spark).count() === 100)
    assert(cat.listTables() === Seq("m1"))

    // stale-base commit conflicts
    val (md, v) = cat.loadTable("m1")
    cat.commitTable("m1", v, md.copy(lastUpdatedMs = 1L))
    intercept[graft.catalog.CommitConflict] {
      cat.commitTable("m1", v, md.copy(lastUpdatedMs = 2L))
    }
    assert(cat.dropTable("m1"))
    assert(!cat.tableExists("m1"))
  }
}

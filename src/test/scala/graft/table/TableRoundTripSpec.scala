package graft.table

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HadoopCatalog
import graft.expr.Predicate
import graft.io.FileIO
import graft.spec._

/** End-to-end: write driver test data as partitioned Iceberg tables, read
  * back through scan planning, assert pruning effectiveness and row-level
  * equality with the raw parquet. Mirrors the reference's in-code scan
  * fixture strategy (scan/mod.rs pub mod tests, line 636).
  *
  * The whole suite runs against the `memory://` FileIO backend
  * (io/storage/memory.rs parity): catalog commits, manifest Avro AND the
  * parquet data written/read by Spark's own machinery all live in process
  * memory — zero local-FS coupling.
  */
class TableRoundTripSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var wh: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.memory.impl", "graft.io.MemoryFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    wh = "memory://roundtrip/wh"
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    graft.io.MemoryFileSystem.clear()
  }

  private def catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))

  test("day-partitioned lineitem: append, scan, prune, filter parity") {
    // one year's slice: keeps the day-partition fanout to ~360 files
    // (sf0.001 spans 1995-01-02..2001-11-04)
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter("l_shipdate < timestamp'1996-01-01 00:00:00'")
    val schema = IcebergSchema.fromSpark(src.schema)
    val spec = PartitionSpec.build(schema, Seq("l_shipdate" -> Transform.Day))
    var t = GraftTable.create("lineitem_day", catalog, schema, spec)
    t = t.append(src)

    // full-table read equals source, row contents included
    val all = t.newScan().toDF(spark)
    assert(all.count() == src.count())
    assert(all.columns.toSeq == src.columns.toSeq)
    assert(all.exceptAll(src).isEmpty && src.exceptAll(all).isEmpty,
      "round-tripped rows differ from source")

    // filtered scan: predicate prunes files at plan time (cut is mid-range)
    val cut = Predicate.tsMicros("1995-07-01T00:00:00")
    val scan = t.newScan().withFilter(Predicate.gtEq("l_shipdate", cut))
    val (planned, total) = scan.planSummary()
    assert(total > 1, s"expected multiple data files, got $total")
    assert(planned < total / 2 + 20, s"day pruning too weak: $planned of $total files planned")

    val expected = src.filter("l_shipdate >= timestamp'1995-07-01 00:00:00'").count()
    assert(scan.toDF(spark).count() == expected)

    // select projection
    val proj = t.newScan().select("l_orderkey", "l_quantity").toDF(spark)
    assert(proj.columns.toSeq == Seq("l_orderkey", "l_quantity"))
  }

  test("bucket-partitioned orders: exact-partition pruning on key equality") {
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val schema = IcebergSchema.fromSpark(src.schema)
    val spec = PartitionSpec.build(schema, Seq("o_custkey" -> Transform.Bucket(8)))
    var t = GraftTable.create("orders_bucket", catalog, schema, spec)
    t = t.append(src)

    val someKey = src.select("o_custkey").head().getLong(0)
    val scan = t.newScan().withFilter(Predicate.eqTo("o_custkey", someKey))
    val (planned, total) = scan.planSummary()
    assert(total >= 8, s"expected >=8 bucket files, got $total")
    assert(planned <= total / 4, s"bucket pruning too weak: $planned of $total")
    // residual filter makes the scan exact; compare row contents
    val matched = scan.toDF(spark)
    val expectedDf = src.filter(s"o_custkey = $someKey")
    assert(matched.count() == expectedDf.count())
    assert(matched.exceptAll(expectedDf).isEmpty && expectedDf.exceptAll(matched).isEmpty)
  }

  test("unpartitioned + multiple appends accumulate snapshots") {
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val schema = IcebergSchema.fromSpark(src.schema)
    var t = GraftTable.create("nation_plain", catalog, schema)
    t = t.append(src)
    t = t.append(src)
    assert(t.newScan().toDF(spark).count() == 2 * src.count())
    assert(t.metadata.snapshots.size == 2)
    assert(t.metadata.currentSnapshot.get.parentSnapshotId.contains(
      t.metadata.snapshots.head.snapshotId))
    assert(t.metadata.lastSequenceNumber == 2)
    // metadata inspect tables
    assert(t.snapshotsDf(spark).count() == 2)
    assert(t.historyDf(spark).count() == 2)
    assert(t.manifestsDf(spark).count() == 2)
    // time travel to the first snapshot
    val first = t.metadata.snapshots.head.snapshotId
    assert(t.newScan().useSnapshot(first).toDF(spark).count() == src.count())
  }

  test("metrics-based file pruning without partitioning") {
    // unpartitioned but multiple files → only min/max stats can prune
    val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .orderBy("o_orderkey").repartitionByRange(4, org.apache.spark.sql.functions.col("o_orderkey"))
    val schema = IcebergSchema.fromSpark(src.schema)
    var t = GraftTable.create("orders_metrics", catalog, schema)
    t = t.append(src)
    val maxKey = src.agg(org.apache.spark.sql.functions.max("o_orderkey")).head().getLong(0)
    val scan = t.newScan().withFilter(Predicate.gt("o_orderkey", maxKey - 10))
    val (planned, total) = scan.planSummary()
    assert(total == 4, s"expected 4 files, got $total")
    assert(planned == 1, s"metrics pruning failed: planned $planned of $total")
  }

  test("compressed metadata: gzip metadata.json + deflate avro round-trip") {
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val schema = IcebergSchema.fromSpark(src.schema)
    var t = GraftTable.create("nation_gz", catalog, schema,
      properties = Map(
        "write.metadata.compression-codec" -> "gzip",
        "write.avro.compression-codec" -> "deflate"))
    t = t.append(src)
    t = t.append(src)

    // gzip metadata is NAMED `.gz.metadata.json` (foreign engines pick the
    // codec from the filename, reference metadata_location.rs:33) and the
    // bytes on disk ARE gzip — yet the table loads transparently
    val io = t.io
    val v = catalog.currentVersion("nation_gz").get
    val mdPath = s"${t.location}/metadata/v$v.gz.metadata.json"
    assert(io.exists(mdPath), s"expected gz-suffixed metadata at $mdPath")
    assert(!io.exists(s"${t.location}/metadata/v$v.metadata.json"),
      "gzip bytes must not hide under the plain suffix")
    val raw = io.readBytes(mdPath)
    assert((raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b,
      "metadata.json should be gzip-compressed")
    val reloaded = GraftTable.load("nation_gz", catalog)
    assert(reloaded.metadata.snapshots.size === 2)

    // manifests + manifest list carry the deflate codec, and still scan
    val listPath = reloaded.metadata.currentSnapshot.get.manifestList
    def avroCodecOf(p: String): String = {
      val in = new org.apache.avro.file.DataFileStream[Object](io.open(p),
        new org.apache.avro.generic.GenericDatumReader[Object]())
      try in.getMetaString("avro.codec") finally in.close()
    }
    assert(avroCodecOf(listPath) === "deflate")
    val m = graft.meta.ManifestIO.readManifestList(io, listPath,
      Commits.partTypes(reloaded.metadata)).head
    assert(avroCodecOf(m.manifestPath) === "deflate")
    assert(reloaded.newScan().toDF(spark).count() === 2 * src.count())

    // a PLAIN table registered from a gzip metadata file also loads
    // (foreign .gz files are detected by content, not name)
    val gzCopy = s"$wh/nation_gz_copy.metadata.json"
    io.writeBytes(gzCopy, io.gzipBytes(reloaded.metadata.toJsonString))
    val reg = catalog.registerTable("nation_gz_reg", gzCopy)
    assert(reg.snapshots.size === 2)
  }

  test("concurrent commits: one retries and both land") {
    val src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    val schema = IcebergSchema.fromSpark(src.schema)
    val t0 = GraftTable.create("region_conflict", catalog, schema)
    // two writers race from the same base version
    val t1 = GraftTable.load("region_conflict", catalog)
    val t2 = GraftTable.load("region_conflict", catalog)
    t1.append(src)
    val after = t2.append(src) // stale base → CommitConflict → retry → succeed
    assert(after.refresh().metadata.snapshots.size == 2)
    assert(after.refresh().newScan().toDF(spark).count() == 2 * src.count())
  }
}

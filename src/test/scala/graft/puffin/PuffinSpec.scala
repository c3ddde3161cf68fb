package graft.puffin

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.expr.Predicate
import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._
import graft.table.GraftTable

/** Roaring bitmap round-trips, Puffin container round-trips, and the
  * deletion-vector delete → scan path. */
class PuffinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("puffin-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("roaring64: array containers, bitmap containers, high keys") {
    // small container (array), dense container (bitmap), >32-bit positions
    val sparsePart = Seq(1L, 5L, 1000L, 65535L)
    val densePart = (0L until 5000L).map(_ + 131072L) // forces bitmap container
    val highPart = Seq((1L << 33) + 7L, (1L << 40) + 42L)
    val all = sparsePart ++ densePart ++ highPart
    val bm = Roaring64.fromPositions(all)
    assert(bm.cardinality === all.size)
    assert(all.forall(bm.contains))
    assert(!bm.contains(2L) && !bm.contains(1L << 50))

    val round = Roaring64.deserialize(bm.serialize())
    assert(round.cardinality === bm.cardinality)
    assert(round.iterator.toSeq === all.sorted)
  }

  test("roaring64: run containers from other engines deserialize (golden bytes)") {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(cap: Int)(f: ByteBuffer => Unit): Array[Byte] = {
      val b = ByteBuffer.allocate(cap).order(ByteOrder.LITTLE_ENDIAN); f(b); b.array()
    }

    // A: single run container, <4 containers → NO offset header.
    // runs [5..10] and [20..23] → card 10
    val a = le(8 + 4 + 4 + 1 + 4 + 2 + 8) { b =>
      b.putLong(1L); b.putInt(0)                  // one 32-bit map, high=0
      b.putInt(12347 | (0 << 16))                 // run cookie, n-1=0
      b.put(0x01.toByte)                          // container 0 is a run
      b.putShort(0); b.putShort(9)                // key 0, card-1
      b.putShort(2)                               // two runs
      b.putShort(5); b.putShort(5)                // [5, 5+5]
      b.putShort(20); b.putShort(3)               // [20, 20+3]
    }
    val bmA = Roaring64.deserialize(a)
    assert(bmA.iterator.toSeq === ((5L to 10L) ++ (20L to 23L)))

    // B: 4 run containers → offset header present (NO_OFFSET_THRESHOLD)
    val header = 4 + 1 + 4 * 4 + 4 * 4 // cookie + flags + headers + offsets
    val b4 = le(8 + 4 + header + 4 * 6) { b =>
      b.putLong(1L); b.putInt(0)
      b.putInt(12347 | (3 << 16))                 // n-1=3
      b.put(0x0F.toByte)                          // all four are runs
      (0 until 4).foreach { k => b.putShort(k.toShort); b.putShort(2) } // card 3
      (0 until 4).foreach { k => b.putInt(header + k * 6) }
      (0 until 4).foreach { _ => b.putShort(1); b.putShort(1); b.putShort(2) } // [1..3]
    }
    val bmB = Roaring64.deserialize(b4)
    val expB = (0 until 4).flatMap(k => (1L to 3L).map(v => (k.toLong << 16) | v))
    assert(bmB.iterator.toSeq === expB)

    // C: mixed run + array containers in one bitmap, no offsets
    val c = le(8 + 4 + 4 + 1 + 8 + 6 + 4) { b =>
      b.putLong(1L); b.putInt(0)
      b.putInt(12347 | (1 << 16))                 // n-1=1
      b.put(0x01.toByte)                          // only container 0 is a run
      b.putShort(0); b.putShort(4)                // key 0: run [10..14]
      b.putShort(1); b.putShort(1)                // key 1: array {7, 9}
      b.putShort(1); b.putShort(10); b.putShort(4)
      b.putShort(7); b.putShort(9)
    }
    val bmC = Roaring64.deserialize(c)
    assert(bmC.iterator.toSeq ===
      ((10L to 14L) ++ Seq(65536L + 7L, 65536L + 9L)))

    // round-trip through our writer (which may itself run-encode)
    val rt = Roaring64.deserialize(bmC.serialize())
    assert(rt.iterator.toSeq === bmC.iterator.toSeq)
  }

  test("roaring64: writer run-optimizes — golden bytes, size win, interop") {
    import java.nio.{ByteBuffer, ByteOrder}
    // one dense range in one container → exactly one run container
    val dense = Roaring64.fromPositions(0L until 1000L)
    val got = dense.serialize()
    val expected = {
      val b = ByteBuffer.allocate(8 + 4 + 4 + 1 + 4 + 2 + 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.putLong(1L); b.putInt(0)        // one 32-bit map, high=0
      b.putInt(12347 | (0 << 16))       // run cookie, n-1=0
      b.put(0x01.toByte)                // container 0 is a run
      b.putShort(0); b.putShort(999)    // key 0, card-1
      // n=1 < NO_OFFSET_THRESHOLD → no offset header
      b.putShort(1)                     // one run
      b.putShort(0); b.putShort(999)    // [0, 0+999]
      b.array()
    }
    assert(got.toSeq === expected.toSeq)
    assert(Roaring64.deserialize(got).iterator.toSeq === (0L until 1000L))

    // a 100k-position contiguous delete (the compaction/backfill shape):
    // runs beat both the array form (2 B/position) and the bitmap form
    val big = Roaring64.fromPositions(0L until 100000L)
    val bytes = big.serialize()
    assert(bytes.length < 100, s"dense-range DV should be tiny, got ${bytes.length} B")
    assert(bytes.length < 100000 * 2 / 100, "≥100× smaller than the array form")
    assert(Roaring64.deserialize(bytes).cardinality === 100000L)

    // run encoding only wins when it IS smaller: alternating bits keep
    // the array form (8 runs × 4 B + 2 > 8 values × 2 B)
    val alt = Roaring64.fromPositions(Seq(0L, 2L, 4L, 6L, 8L, 10L, 12L, 14L))
    val altBytes = alt.serialize()
    val cookie = ByteBuffer.wrap(altBytes, 12, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
    assert((cookie & 0xFFFF) === 12346, "sparse container must stay array-encoded")
    assert(Roaring64.deserialize(altBytes).iterator.toSeq === alt.iterator.toSeq)

    // mixed bitmap: a run container and an array container in one map,
    // n=2 < 4 → run format without offsets, sequential reads line up
    val mixed = Roaring64.fromPositions((0L until 5000L) ++ Seq(65536L + 7, 65536L + 9))
    assert(Roaring64.deserialize(mixed.serialize()).iterator.toSeq
      === mixed.iterator.toSeq)

    // ≥4 containers with at least one run → offset header present and
    // every offset lands on its container (positional reads line up)
    val wide = Roaring64.fromPositions(
      (0 until 5).flatMap(k => (0L until 300L).map(v => (k.toLong << 16) | v)))
    assert(Roaring64.deserialize(wide.serialize()).cardinality === 1500L)
  }

  test("puffin container: write/readMetadata/readBlob round-trip") {
    val io = FileIO.fromSpark(spark)
    val path = java.nio.file.Files.createTempDirectory("puffin-").toString + "/t.puffin"
    val b1 = Puffin.Blob(Puffin.DeletionVectorV1, Nil, 42L, 3L,
      Puffin.dvSerialize(Roaring64.fromPositions(Seq(1L, 2L, 99L))),
      Map("referenced-data-file" -> "f1.parquet"))
    val b2 = Puffin.Blob(Puffin.KmvDistinctV1, Seq(7), 42L, 3L,
      Array[Byte](1, 2, 3, 4), Map("k" -> "64"))
    val metas = Puffin.write(io, path, Seq(b1, b2), Map("created-by" -> "graft"))

    val (readMetas, props) = Puffin.readMetadata(io, path)
    assert(props("created-by") === "graft")
    assert(readMetas.size === 2)
    assert(readMetas.map(_.blobType) === Seq(Puffin.DeletionVectorV1, Puffin.KmvDistinctV1))
    assert(readMetas(1).fields === Seq(7))
    assert(readMetas(0).properties("referenced-data-file") === "f1.parquet")

    val dv = Puffin.dvDeserialize(Puffin.readBlob(io, path, readMetas.head))
    assert(dv.iterator.toSeq === Seq(1L, 2L, 99L))
    assert(Puffin.readBlob(io, path, readMetas(1)).toSeq === Seq[Byte](1, 2, 3, 4))
  }

  test("puffin blob compression: zstd round-trip, foreign zstd/lz4 read back") {
    val io = FileIO.fromSpark(spark)
    val dir = java.nio.file.Files.createTempDirectory("puffin-z-").toString
    val payload = Array.tabulate(10000)(i => (i % 37).toByte) // compressible

    // our writer: zstd-compressed blob next to an uncompressed one
    val path = s"$dir/z.puffin"
    val metas = Puffin.write(io, path, Seq(
      Puffin.Blob("t1", Nil, 1L, 1L, payload, codec = Some("zstd")),
      Puffin.Blob("t2", Nil, 1L, 1L, payload)))
    assert(metas.head.length < payload.length, "zstd blob stored compressed")
    val (readMetas, _) = Puffin.readMetadata(io, path)
    assert(readMetas.head.codec === Some("zstd"))
    assert(readMetas(1).codec === None)
    assert(Puffin.readBlob(io, path, readMetas.head).toSeq === payload.toSeq)
    assert(Puffin.readBlob(io, path, readMetas(1)).toSeq === payload.toSeq)

    // stored-bytes carry-forward: move the zstd blob to a new file
    // byte-for-byte (no decode/re-encode) and read it back decompressed
    val stored = Puffin.readBlobStored(io, path, readMetas.head)
    assert(stored.length === readMetas.head.length)
    val path2 = s"$dir/z2.puffin"
    Puffin.write(io, path2, Seq(Puffin.Blob("t1", Nil, 2L, 2L,
      Array.emptyByteArray, codec = Some("zstd"), storedData = Some(stored))))
    val (m2, _) = Puffin.readMetadata(io, path2)
    assert(m2.head.length === readMetas.head.length,
      "carried blob must be byte-identical in stored form")
    assert(Puffin.readBlob(io, path2, m2.head).toSeq === payload.toSeq)

    // a FOREIGN lz4-frame blob (the codec the reference refuses to read;
    // Java writers may emit it): decompresses through the same surface
    val lzBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
      out.write(payload); out.close(); bos.toByteArray
    }
    val lz = Puffin.BlobMetadata("t3", Nil, 1L, 1L, 4L, lzBytes.length.toLong,
      Map.empty, Some("lz4"))
    val lzPath = s"$dir/foreign.puffin"
    io.writeBytes(lzPath, "PFA1".getBytes ++ lzBytes, overwrite = true)
    assert(Puffin.readBlob(io, lzPath, lz).toSeq === payload.toSeq)

    // unknown codec refused with a clear message
    val bad = lz.copy(codec = Some("brotli"))
    val e = intercept[IllegalArgumentException] { Puffin.readBlob(io, lzPath, bad) }
    assert(e.getMessage.contains("brotli"))
  }

  test("statistics files register in table metadata and round-trip") {
    import spark.implicits._
    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-stats-").toString,
      FileIO.fromSpark(spark))
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "id", LongT, required = false),
      NestedField(2, "seg", StringT, required = false)))
    var t = GraftTable.create("stats1", catalog, schema)
    t = t.append((1L to 100L).map(i => (i, s"s${i % 5}")).toDF("id", "seg"))

    val (t2, sketches) = Sketches.writeDistinctStats(t, spark, Seq("seg", "id"))
    // registered: discoverable from metadata for the current snapshot
    val snapId = t2.metadata.currentSnapshotId.get
    val sf = t2.metadata.statisticsFor(snapId).get
    // KMV + theta interop blob per column
    assert(sf.blobMetadata.size === 4)
    assert(sf.blobMetadata.count(_.blobType === Puffin.KmvDistinctV1) === 2)
    assert(sf.blobMetadata.count(_.blobType === Puffin.ThetaV1) === 2)
    assert(sf.fileSizeInBytes > 0 && sf.fileFooterSizeInBytes > 0)
    // discovery-based read returns the same sketches
    val read = Sketches.readCurrentStats(t2)
    assert(read.map(s => (s.column, s.estimate)).toSet ===
      sketches.map(s => (s.column, s.estimate)).toSet)
    assert(read.find(_.column == "seg").get.estimate === 5L)
    // metadata JSON round-trips the statistics list
    val round = TableMetadata.fromJsonString(t2.metadata.toJsonString)
    assert(round.statistics === t2.metadata.statistics)
    // re-running for the same snapshot REPLACES the entry, never stacks
    val (t3, _) = Sketches.writeDistinctStats(t2, spark, Seq("seg"))
    assert(t3.metadata.statistics.count(_.snapshotId == snapId) === 1)
    assert(Sketches.readCurrentStats(t3).map(_.column) === Seq("seg"))
  }

  test("deletion-vector delete: scan applies DVs, survives compaction") {
    import spark.implicits._
    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-dv-").toString,
      FileIO.fromSpark(spark))
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "id", LongT, required = false),
      NestedField(2, "v", DoubleT, required = false)))
    var t = GraftTable.create("dv1", catalog, schema,
      properties = Map("write.spark.max-records-per-file" -> "40"))
    t = t.append((1L to 200L).map(i => (i, i * 0.5)).toDF("id", "v"))

    t = t.deleteWhereDV(Predicate.gt("v", 50.0), spark)
    val left = t.newScan().toDF(spark)
    assert(left.count() === 100)
    assert(left.agg(org.apache.spark.sql.functions.max("id")).head.getLong(0) === 100L)

    // delete is idempotent-composable: a second DV delete narrows further
    t = t.deleteWhereDV(Predicate.gt("v", 25.0), spark)
    assert(t.newScan().toDF(spark).count() === 50)

    // v3 invariant: each data file carries at most ONE alive DV — the second
    // delete's vector superseded (OR-merged) the first delete's, and the
    // superseded entries were tombstoned, so a spec-compliant reader that
    // applies only the current DV per file sees the same rows we do
    val dvsByFile = t.newScan().planDeletes()
      .filter(_.file.fileFormat == "PUFFIN")
      .groupBy(_.file.referencedDataFile.get)
    assert(dvsByFile.values.forall(_.size == 1),
      s"files with stacked DVs: ${dvsByFile.view.mapValues(_.size).toMap}")
    // merged cardinalities cover the union of both deletes (ids 51..200)
    assert(dvsByFile.values.flatten.map(_.file.recordCount).sum === 150)

    // filters and the DV anti-join compose
    val filtered = t.newScan().withFilter(Predicate.ltEq("id", 10L)).toDF(spark)
    assert(filtered.count() === 10)

    // compaction folds the DVs in and drops the delete entries
    t = t.rewriteDataFiles(spark)
    assert(t.newScan().planDeletes().isEmpty)
    assert(t.newScan().toDF(spark).count() === 50)
  }

  test("theta sketch: murmur3 x64/128 matches independent golden vectors") {
    import java.nio.charset.StandardCharsets.UTF_8
    // vectors generated by a separate pure-python implementation; the
    // "hello" pair renders to the canonical SMHasher digest
    // cbd8a7b341bd9b025b1e906a48ae1d19
    assert(ThetaSketch.hash128("hello".getBytes(UTF_8), 0L)
      === ((-3758069500696749310L, 6565844092913065241L)))
    assert(ThetaSketch.hash128(Array.empty[Byte], 0L) === ((0L, 0L)))
    assert(ThetaSketch.hash128("The quick brown fox".getBytes(UTF_8), 9001L)._1
      === 6273843067850937134L)
    assert(ThetaSketch.hash128("SEGMENT_A".getBytes(UTF_8), 9001L)._1
      === -219282177657193313L)
    // the DataSketches library constant for the default update seed
    assert((ThetaSketch.seedHash(9001L) & 0xffff) === 0x93cc)
    // entry hashes are h1 >>> 1: always in [0, 2^63)
    assert(ThetaSketch.valueHash("SEGMENT_A") === (-219282177657193313L >>> 1))
    assert(ThetaSketch.valueHash(12345L) === (7473486348955536886L >>> 1))
  }

  test("theta sketch: compact serialization golden bytes + round trip") {
    // exact-mode sketch of three entries
    val t = ThetaSketch.fromHashes(Seq(300L, 100L, 200L, 100L))
    assert(t.thetaLong === Long.MaxValue && t.entries === Seq(100L, 200L, 300L))
    assert(t.estimate === 3L)
    val bytes = ThetaSketch.serialize(t)
    assert(bytes.length === 24 + 3 * 8)
    // preamble a DataSketches reader expects: preLongs=3, serVer=3,
    // family=3(Compact), flags=READ_ONLY|COMPACT|ORDERED, seedHash 0x93CC
    assert(bytes(0) === 3.toByte && bytes(1) === 3.toByte && bytes(2) === 3.toByte)
    assert(bytes(5) === (0x02 | 0x08 | 0x10).toByte)
    assert((bytes(6) & 0xff) === 0xcc && (bytes(7) & 0xff) === 0x93)
    assert(ThetaSketch.deserialize(bytes) === t)

    // estimation mode: k+1 distinct hashes → theta = (k+1)-th smallest
    val many = (1L to 5000L).map(i => ThetaSketch.valueHash(i))
    val est = ThetaSketch.fromHashes(many, lgK = 12)
    assert(est.entries.size === 4096 && est.thetaLong < Long.MaxValue)
    val e = est.estimate.toDouble
    assert(math.abs(e - 5000.0) / 5000.0 < 0.1, s"estimate $e off 5000")
    assert(ThetaSketch.deserialize(ThetaSketch.serialize(est)) === est)
    // foreign short forms parse too: exact-mode preLongs=2 and single-item
    val two = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(2.toByte).put(3.toByte).put(3.toByte).put(12.toByte).put(0.toByte)
      .put((0x02 | 0x08 | 0x10).toByte).putShort(ThetaSketch.seedHash())
      .putInt(2).putInt(0).putLong(7L).putLong(9L).array()
    assert(ThetaSketch.deserialize(two).entries === Seq(7L, 9L))
    val single = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put(1.toByte).put(3.toByte).put(3.toByte).put(12.toByte).put(0.toByte)
      .put((0x02 | 0x08 | 0x10).toByte).putShort(ThetaSketch.seedHash())
      .putLong(42L).array()
    assert(ThetaSketch.deserialize(single).entries === Seq(42L))
  }

  test("stats files carry theta interop blobs; foreign theta-only files read back") {
    import spark.implicits._
    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-theta-").toString,
      FileIO.fromSpark(spark))
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "id", LongT, required = false),
      NestedField(2, "seg", StringT, required = false)))
    var t = GraftTable.create("th1", catalog, schema)
    t = t.append((1L to 500L).map(i => (i, s"seg${i % 7}")).toDF("id", "seg"))

    val (t2, _) = Sketches.writeDistinctStats(t, spark, Seq("id", "seg"))
    val sf = t2.metadata.statisticsFor(t2.metadata.currentSnapshotId.get).get
    // both blob types registered per column, spec'd type name exact
    assert(sf.blobMetadata.count(_.blobType == Puffin.ThetaV1) === 2)
    assert(sf.blobMetadata.count(_.blobType == Puffin.KmvDistinctV1) === 2)
    // the theta blobs' ndv is exact at this scale
    val (metas, _) = Puffin.readMetadata(t2.io, sf.statisticsPath)
    val byCol = metas.filter(_.blobType == Puffin.ThetaV1)
      .map(m => m.properties("column") ->
        ThetaSketch.deserialize(Puffin.readBlob(t2.io, sf.statisticsPath, m)))
      .toMap
    assert(byCol("id").estimate === 500L)
    assert(byCol("seg").estimate === 7L)

    // a theta-ONLY stats file (what a foreign engine writes) serves NDV
    // through the same discovery path
    val foreign = s"${t2.location}/metadata/foreign-theta.puffin"
    Puffin.write(t2.io, foreign, Seq(Puffin.Blob(Puffin.ThetaV1, Seq(2), 0L, 0L,
      ThetaSketch.serialize(byCol("seg")), Map("column" -> "seg"))))
    val read = Sketches.readDistinctStats(t2, foreign)
    assert(read.map(s => (s.column, s.estimate)) === Seq(("seg", 7L)))
  }

  test("DV delete writes per-task puffin files on executors, never one driver blob") {
    import spark.implicits._
    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-dv-many-").toString,
      FileIO.fromSpark(spark))
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "id", LongT, required = false),
      NestedField(2, "v", DoubleT, required = false)))
    // ~150 data files so the delete touches files across every shuffle task
    var t = GraftTable.create("dvmany", catalog, schema,
      properties = Map("write.spark.max-records-per-file" -> "4"))
    t = t.append((1L to 600L).map(i => (i, i * 1.0)).toDF("id", "v"))
    assert(t.newScan().planFiles().size > 100)

    // AQE rightly coalesces this KB-scale shuffle into one task; disable
    // coalescing so the test exercises the many-task container layout a
    // 100 TB delete would produce naturally
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try t = t.deleteWhereDV(Predicate.gt("v", 100.0), spark)
    finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    val dvs = t.newScan().planDeletes().filter(_.file.fileFormat == "PUFFIN")
    // one DV entry per touched file, spread over MULTIPLE puffin
    // containers (one per write task — the executor-side write path; a
    // driver-side collect would have produced exactly one)
    assert(dvs.map(_.file.referencedDataFile.get).distinct.size === dvs.size)
    val containers = dvs.map(_.file.filePath).distinct
    assert(containers.size > 1,
      s"expected per-task puffin files, got ${containers.size} container(s)")
    assert(t.newScan().toDF(spark).count() === 100)

    // supersede-merge across MANY files also stays executor-side and
    // keeps the one-DV-per-file invariant
    t = t.deleteWhereDV(Predicate.gt("v", 50.0), spark)
    val dvs2 = t.newScan().planDeletes().filter(_.file.fileFormat == "PUFFIN")
    val byFile = dvs2.groupBy(_.file.referencedDataFile.get)
    assert(byFile.values.forall(_.size == 1))
    assert(dvs2.map(_.file.recordCount).sum === 550)
    assert(t.newScan().toDF(spark).count() === 50)
    // deletes survive the native DSv2 read path too
    val wh2 = t.location.stripSuffix("/dvmany")
    val df = spark.read.format("graft")
      .option("warehouse", wh2).option("table", "dvmany").load()
    assert(df.count() === 50)
  }
}

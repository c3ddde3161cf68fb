package graft.table

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HadoopCatalog
import graft.expr.{BinaryPred, Gt, Predicate}
import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._

/** Distributed scan planning: the manifest→entry pruning pipeline run as
  * a Spark job (reference scan/mod.rs:381-498 streams tasks through
  * bounded channels for the same reason — planning memory must not scale
  * with snapshot size). Asserts pruning PARITY with the driver planner
  * over a many-thousand-file table, bounded driver allocation, and that
  * the job actually executed on the cluster. */
class PlanningSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", 8)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("planning-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val wh =
    java.nio.file.Files.createTempDirectory("graft-plan-").toString
  private lazy val catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))

  private val schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "part", IntT, required = false),
    NestedField(3, "v", DoubleT, required = false)))

  /** ~3k-file table: 8 partitions × several hundred files each (2-row
    * files), committed across a few appends so multiple manifests exist. */
  private lazy val table: GraftTable = {
    import spark.implicits._
    val spec = PartitionSpec(0,
      Seq(PartitionField(2, 1000, "part", Transform.Identity)))
    var t = GraftTable.create("many", catalog, schema, spec,
      properties = Map("write.spark.max-records-per-file" -> "2"))
    (0 until 3).foreach { gen =>
      val rows = (0 until 2000).map { i =>
        val id = (gen * 2000 + i).toLong
        (id, (i % 8), id * 0.5)
      }
      t = t.append(rows.toDF("id", "part", "v"))
    }
    t
  }

  private def taskSet(ts: Seq[FileScanTask]): Set[String] =
    ts.map(_.file.filePath).toSet
  private def compactSet(ts: Seq[CompactFileTask]): Set[String] =
    ts.map(_.filePath).toSet

  test("ScanMetricsSink accumulates every planner's counters (bench plan window)") {
    // VERDICT r14 item 6: the bench telemetry must carry plan counters
    // so a prune regression (files planned up at flat answers)
    // self-attributes from the JSON. The sink is the reset→plan→snapshot
    // window Bench brackets each run with; both the local and the
    // distributed planner must report into it.
    ScanMetricsSink.reset()
    val (local, m) = table.newScan()
      .withFilter(Predicate.eqTo("part", 3)).planWithMetrics()
    val (scans, mTotal, _, entries, skippedPart, _, files) =
      ScanMetricsSink.snapshot()
    assert(scans === 1L)
    assert(files === local.size.toLong && files === m.resultFiles.toLong)
    assert(mTotal === m.totalDataManifests.toLong)
    assert(entries === m.entriesConsidered && entries > files,
      "partition pruning must have skipped entries in this fixture")
    assert(skippedPart === m.skippedByPartition && skippedPart > 0L)

    ScanMetricsSink.reset()
    table.newScan().withFilter(Predicate.eqTo("part", 3))
      .planCompactDistributed(spark, Set(1, 2, 3), Nil)
    val dist = ScanMetricsSink.snapshot()
    assert(dist._1 === 1L && dist._7 === files,
      s"distributed planner reported ${dist._7} files, local planned $files")

    ScanMetricsSink.reset()
    assert(ScanMetricsSink.snapshot() === ((0L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("distributed planning matches the driver planner exactly (pruning parity)") {
    val t = table
    assert(t.newScan().planFiles().size > 2500, "fixture should be many-thousand files")

    // unfiltered
    val (local, lm) = t.newScan().planWithMetrics()
    val (dist, dm) = t.newScan().planCompactDistributed(spark, Set(1, 2, 3), Nil)
    assert(compactSet(dist) === taskSet(local))
    assert(dm.entriesConsidered === lm.entriesConsidered)
    assert(dm.resultFiles === lm.resultFiles)

    // partition-pruned + metrics-pruned: identical evaluator decisions
    val pred = BinaryPred(Gt, "id", 5500L).and(
      graft.expr.Predicate.eqTo("part", 3))
    val (local2, lm2) = t.newScan().withFilter(pred).planWithMetrics()
    val (dist2, dm2) = t.newScan().withFilter(pred)
      .planCompactDistributed(spark, Set(1, 2, 3), Nil)
    assert(local2.nonEmpty && local2.size < local.size, "filter should prune")
    assert(compactSet(dist2) === taskSet(local2))
    assert(dm2.skippedByPartition === lm2.skippedByPartition)
    assert(dm2.skippedByMetrics === lm2.skippedByMetrics)
    assert(dm2.resultFiles === lm2.resultFiles)

    // sequence numbers, partition tuples, and split ranges agree per file
    val byPath = local.map(t0 => t0.file.filePath -> t0).toMap
    dist.foreach { c =>
      val l = byPath(c.filePath)
      assert(c.sequenceNumber === l.sequenceNumber)
      assert(c.partition === l.file.partition)
      assert(c.recordCount === l.file.recordCount)
      assert(c.splitRanges === GraftTable.splitRanges(
        l.file.fileSizeInBytes, l.file.splitOffsets))
    }
  }

  test("distributed planning runs as a Spark job and stays driver-compact") {
    val t = table
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val (dist, _) = t.newScan().planCompactDistributed(spark, Set(1), Nil)
      // listener events are async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (jobs.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(jobs.get() >= 1, "planning must execute as a Spark job")

      // bounded driver allocation: the compact descriptors must be a small
      // fraction of the full FileScanTasks (which carry per-column stats
      // maps) — the thing that melts the driver at 200k files
      def jsize(o: AnyRef): Int = {
        val bos = new java.io.ByteArrayOutputStream()
        val oos = new java.io.ObjectOutputStream(bos)
        oos.writeObject(o); oos.close(); bos.size()
      }
      val full = t.newScan().planFiles()
      val fullBytes = jsize(full.toList)
      val compactBytes = jsize(dist.toList)
      // strictly smaller than the stats-bearing tasks even on this
      // 3-column fixture (wide schemas widen the gap), and absolutely
      // bounded per file: 200k files × 512 B ≈ 100 MB driver ceiling
      assert(compactBytes < fullBytes,
        s"compact=$compactBytes full=$fullBytes — descriptors not compact")
      assert(compactBytes / dist.size < 512,
        s"${compactBytes / dist.size} B/file exceeds the driver budget")
      // and no stats maps leak through: null counts bounded by projection
      assert(dist.forall(_.nullCounts.keySet.subsetOf(Set(1))))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("DSv2 reads plan distributed under auto mode and return identical rows") {
    val t = table
    // lower the auto threshold so this 3k-file table trips it
    t.updateProperties(Map("graft.plan.distributed-threshold" -> "1000"))

    def read(opts: (String, String)*) = {
      var r = spark.read.format("graft")
        .option("warehouse", wh).option("table", "many")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      r.load()
    }
    val localDf = read("plan-mode" -> "local")
      .filter(col("part") === 3 && col("id") > 100L).select("id", "v")
    val autoDf = read()
      .filter(col("part") === 3 && col("id") > 100L).select("id", "v")
    val distDf = read("plan-mode" -> "distributed")
      .filter(col("part") === 3 && col("id") > 100L).select("id", "v")

    val expected = localDf.collect().map(_.toString).sorted
    assert(autoDf.collect().map(_.toString).sorted sameElements expected)
    assert(distDf.collect().map(_.toString).sorted sameElements expected)
    assert(expected.nonEmpty)
    // still a native BatchScan
    val explained = distDf.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("BatchScan"), explained)
  }
}

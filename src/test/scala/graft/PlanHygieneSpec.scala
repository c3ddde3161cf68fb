package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Systemic plan hygiene: EVERY registered driver query must plan
  * without a cartesian product (the one declared exception is the
  * brute-force kNN control, which broadcasts). Catches the classic
  * scale-killer — an equi-join degrading to CartesianProduct after a
  * refactor — across the whole surface, not just the benched subset. */
class PlanHygieneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("plan-hygiene-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Queries whose PLAN legitimately contains a broadcast nested-loop:
    * the declared brute-force kNN control and ops that score against a
    * broadcast constant-ish side. A real CartesianProduct node is never
    * allowed anywhere. */
  private val BroadcastNljAllowed = Set(
    "p04_knn_bruteforce", "p05_ann_lsh_bucketed",
    "p73_ann_recall_audit", // embeds the brute-force control as ground truth
    "p78_pq_adc_search", // declared linear ADC scan (broadcast query side)
    "p89_rrf_hybrid_search", // semantic branch = the kNN control for ONE broadcast query vector
    // scalar-totals attach: a broadcast ONE-ROW cross join (the r12
    // shape that replaced p51's driver-side .head actions) — 1 x k rows,
    // O(k), the standard Spark idiom for riding corpus totals along
    "p51_pmi_pairs")

  test("no registered query plans a CartesianProduct") {
    spark.sparkContext.setLogLevel("ERROR")
    val offenders = Registry.all.flatMap { q =>
      try {
        val plan = q.fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(q.name -> "CartesianProduct")
        else if (plan.contains("BroadcastNestedLoopJoin") &&
          !BroadcastNljAllowed(q.name)) Some(q.name -> "BroadcastNestedLoopJoin")
        else None
      } catch {
        // write-path queries mutate state when planned via fn; a planning
        // error here is caught by Verify, not this spec
        case _: Throwable => None
      }
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, w) => s"$n: $w" }.mkString("\n"))
  }

  test("library ops on post-join inputs trigger zero jobs at build time") {
    // r9 ADVICE: spreadNarrow's .rdd partition probe under AQE
    // materializes upstream shuffle stages in a throwaway execution.
    // The probe is now gated on a scan-rooted logical plan, so BUILDING
    // any library-op DataFrame over a post-join frame must launch no
    // Spark job. A SparkListener job counter pins the contract.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import org.apache.spark.sql.functions._
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // a post-join, post-agg frame like Curation.decontaminate's inputs
    val joined = docs.as("a")
      .join(docs.select(col("doc_id")).as("b"), Seq("doc_id"))
      .withColumn("text", col("text"))
    val MarkerGroup = "plan-hygiene-marker"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val markerSeen = new java.util.concurrent.atomic.AtomicBoolean(false)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (Option(js.properties)
          .exists(_.getProperty("spark.jobGroup.id") == MarkerGroup))
          markerSeen.set(true)
        else jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val built = Seq(
        graft.pipeline.Dedup.shingleSets(joined),
        graft.pipeline.Dedup.simhash(joined),
        graft.pipeline.TextAnalysis.gopherQuality(joined),
        graft.pipeline.TextAnalysis.dupSpans(joined))
      built.foreach(_.queryExecution.executedPlan) // force full planning
      // the listener bus is async but FIFO: run a tagged marker job and
      // wait for ITS event — once it arrives, every earlier job event
      // has been delivered, so the count is exact (a fixed sleep could
      // read 0 spuriously on a loaded machine)
      spark.sparkContext.setJobGroup(MarkerGroup, "listener drain marker")
      try spark.sparkContext.parallelize(1 to 1, 1).count()
      finally spark.sparkContext.clearJobGroup()
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (!markerSeen.get() && System.nanoTime() < deadline) Thread.sleep(20)
      assert(markerSeen.get(), "marker job event never arrived")
      assert(jobs.get() === 0,
        s"building library ops over a post-join frame ran ${jobs.get()} job(s)")
      // and the scan-rooted path still spreads: a bare narrow scan probe
      // is allowed (may run a zero-shuffle job), output partitions == conf
      val spreadPlan = graft.pipeline.Dedup.shingleSets(docs)
      assert(spreadPlan.rdd.getNumPartitions >=
        spark.sessionState.conf.numShufflePartitions)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}

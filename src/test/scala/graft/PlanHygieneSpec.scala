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
    "p89_rrf_hybrid_search") // semantic branch = the kNN control for ONE broadcast query vector

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
}

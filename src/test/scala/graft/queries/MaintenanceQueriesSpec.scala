package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The maintenance-only bench lines' load-bearing property: every
  * invocation folds a FRESH disjoint batch into the per-JVM artifact and
  * returns an OFFSET-NORMALIZED read-back, so run N's result equals run
  * 1's exactly — that is what lets the driver hash each bench run
  * against a fixed DuckDB oracle while the artifact underneath grows.
  * This pins it explicitly: two invocations (fold #1 and fold #2 into
  * the same per-JVM artifact) must return identical, non-empty rows —
  * the second invocation folds over the first's accumulated state, so
  * any read-back leaking unnormalized ids or prior folds' rows breaks
  * here. (That each fn really folds — commits a snapshot — is pinned by
  * the operator specs; this spec owns the bench-repeatability contract.) */
class MaintenanceQueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("maintenance-queries-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  MaintenanceQueries.all.foreach { q =>
    test(s"${q.name}: repeated folds return identical rows") {
      spark.sparkContext.setLogLevel("ERROR")
      val r1 = q.fn(spark, sfDir).collect().map(_.toString).toSeq
      val r2 = q.fn(spark, sfDir).collect().map(_.toString).toSeq
      assert(r1.nonEmpty, "read-back must surface the folded rows")
      assert(r1 === r2,
        "fold #2's offset-normalized read-back diverged from fold #1's — " +
          "the bench line would hash-mismatch its oracle on later runs")
    }
  }
}

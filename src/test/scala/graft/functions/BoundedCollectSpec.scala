package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.pipeline.Dedup

/** Unit contract of the bounded collect aggregate + the plan shape it
  * exists to buy (no window sort in the dedup candidate pipelines). */
class BoundedCollectSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .appName("bounded-collect-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("collects every item under the cap, saturates exactly at the cap") {
    import spark.implicits._
    // group g has g*10 items (g = 1..5); cap = 25
    val df = (1 to 5).flatMap(g => (0 until g * 10).map(i => (g, g * 1000L + i)))
      .toDF("g", "v")
      .repartition(7) // force partial buffers + merge across partitions
      .groupBy($"g")
      .agg(BoundedCollectStruct.column(struct($"v".as("_gid")), 25).as("la"))
      .select($"g", size($"la").as("n"), $"la")
    val rows = df.collect().map(r => r.getInt(0) -> r).toMap
    // under-cap groups: full, exact item set
    for (g <- 1 to 2) {
      val r = rows(g)
      assert(r.getInt(1) === g * 10, s"group $g must collect all items")
      val got = r.getSeq[org.apache.spark.sql.Row](2).map(_.getLong(0)).toSet
      assert(got === (0 until g * 10).map(i => g * 1000L + i).toSet)
    }
    // over-cap groups: saturate at exactly cap, items a subset of the group
    for (g <- 3 to 5) {
      val r = rows(g)
      assert(r.getInt(1) === 25, s"group $g must saturate at the cap")
      val got = r.getSeq[org.apache.spark.sql.Row](2).map(_.getLong(0)).toSet
      assert(got.size === 25)
      assert(got.subsetOf((0 until g * 10).map(i => g * 1000L + i).toSet))
    }
  }

  test("null struct fields round-trip through the partial-buffer serde") {
    import spark.implicits._
    val df = Seq((1, Some(10L), 7L), (1, None, 8L), (1, Some(12L), 9L))
      .toDF("g", "a", "b")
      .repartition(3)
      .groupBy($"g")
      .agg(BoundedCollectStruct.column(
        struct($"a".as("_gid"), $"b".as("sig")), 10).as("la"))
      .select(explode($"la").as("x"))
      .select($"x._gid", $"x.sig")
    val got = df.collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)), r.getLong(1)))
      .toSet
    assert(got === Set((Some(10L), 7L), (None, 8L), (Some(12L), 9L)))
  }

  test("rejects non-long struct payloads at analysis") {
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1, "x")).toDF("g", "s")
        .groupBy($"g")
        .agg(BoundedCollectStruct.column(struct($"s".as("_gid")), 5))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("long") ||
      e.getMessage.contains("bounded_collect"))
  }

  test("dedup candidate pipelines plan no window sort") {
    import spark.implicits._
    val docs = (1L to 50L).map(i => (i, s"w$i x$i y$i z$i a b c d e f"))
      .toDF("doc_id", "text")
    val candPlan = Dedup.lshCandidates(
      Dedup.minhashBands(Dedup.shingleSets(docs), bands = 4, rows = 2))
      .queryExecution.executedPlan.toString
    assert(!candPlan.contains("Window"),
      "lshCandidates must not plan a window (census was replaced by bounded collect)")
    val hamPlan = Dedup.hammingNearDups(
      docs.select($"doc_id", (($"doc_id" % 8) * 255L).as("sig")),
      "sig", maxHamming = 3, bands = 4, bits = 60)
      .queryExecution.executedPlan.toString
    assert(!hamPlan.contains("Window"),
      "hammingNearDups must not plan a window")
  }
}

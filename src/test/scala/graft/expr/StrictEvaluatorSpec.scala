package graft.expr

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.DataFile
import graft.spec._
import graft.spec.IcebergType._

/** StrictMetricsEvaluator ("rows MUST match") and StrictProjection
  * duals of the inclusive family. */
class StrictEvaluatorSpec extends AnyFunSuite {

  private val schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "v", DoubleT, required = false),
    NestedField(3, "s", StringT, required = false),
    NestedField(4, "ts", TimestampT, required = false)))

  private def file(lower: Map[Int, Any], upper: Map[Int, Any],
      nulls: Map[Int, Long] = Map(1 -> 0L, 2 -> 0L, 3 -> 0L),
      counts: Map[Int, Long] = Map(1 -> 100L, 2 -> 100L, 3 -> 100L)) =
    DataFile(content = 0, filePath = "f", fileFormat = "PARQUET",
      partition = Nil, recordCount = 100, fileSizeInBytes = 1000,
      valueCounts = counts, nullValueCounts = nulls,
      lowerBounds = lower, upperBounds = upper)

  private def must(p: Predicate, f: DataFile): Boolean =
    StrictMetricsEvaluator.fileMustMatch(Predicate.bind(p, schema), f, schema)

  test("bounds prove full-file matches only when airtight") {
    val f = file(lower = Map(1 -> 10L, 2 -> 1.5), upper = Map(1 -> 20L, 2 -> 9.5))
    assert(must(Predicate.gtEq("id", 10L), f))
    assert(must(Predicate.gt("id", 9L), f))
    assert(!must(Predicate.gt("id", 10L), f)) // lower == 10 might not match
    assert(must(Predicate.ltEq("id", 20L), f))
    assert(!must(Predicate.lt("id", 20L), f))
    assert(must(Predicate.lt("id", 21L), f))
    // range predicates combine
    assert(must(Predicate.gtEq("id", 10L).and(Predicate.ltEq("id", 20L)), f))
    // equality needs a single-valued file
    assert(!must(Predicate.eqTo("id", 15L), f))
    val point = file(lower = Map(1 -> 7L), upper = Map(1 -> 7L))
    assert(must(Predicate.eqTo("id", 7L), point))
    assert(must(Predicate.in("id", 7L, 9L), point))
    // not-eq provable when value outside bounds
    assert(must(graft.expr.BinaryPred(NotEq, "id", 5L), f))
    assert(!must(graft.expr.BinaryPred(NotEq, "id", 15L), f))
  }

  test("nulls poison value predicates; IsNull/NotNull use counts") {
    val withNulls = file(lower = Map(1 -> 10L), upper = Map(1 -> 20L),
      nulls = Map(1 -> 5L), counts = Map(1 -> 100L))
    assert(!must(Predicate.gtEq("id", 10L), withNulls))
    assert(must(Predicate.notNullPred("id"), file(Map(1 -> 1L), Map(1 -> 2L))))
    val allNull = file(Map.empty, Map.empty,
      nulls = Map(1 -> 100L), counts = Map(1 -> 100L))
    assert(must(Predicate.isNullPred("id"), allNull))
    assert(!must(Predicate.notNullPred("id"), allNull))
  }

  test("NaN possibility blocks strict proofs on float/double columns") {
    // parquet min/max exclude NaN: without a harvested nan count of 0 a
    // double file can NEVER be proven to fully match a value predicate —
    // otherwise deleteWhere's whole-file fast path would drop NaN rows
    val noNanCounts = file(lower = Map(2 -> 1.5), upper = Map(2 -> 9.5))
    assert(!must(Predicate.lt("v", 10.0), noNanCounts))
    assert(!must(Predicate.gtEq("v", 1.5), noNanCounts))
    assert(!must(Predicate.in("v", 3.0), file(Map(2 -> 3.0), Map(2 -> 3.0))))

    val nanFree = file(lower = Map(2 -> 1.5), upper = Map(2 -> 9.5))
      .copy(nanValueCounts = Map(2 -> 0L))
    assert(must(Predicate.lt("v", 10.0), nanFree))
    assert(must(Predicate.gtEq("v", 1.5), nanFree))
    val single = file(Map(2 -> 3.0), Map(2 -> 3.0)).copy(nanValueCounts = Map(2 -> 0L))
    assert(must(Predicate.in("v", 3.0), single))

    val hasNans = nanFree.copy(nanValueCounts = Map(2 -> 4L))
    assert(!must(Predicate.lt("v", 10.0), hasNans))

    // non-floating columns are unaffected by absent nan counts
    assert(must(Predicate.gtEq("id", 10L),
      file(lower = Map(1 -> 10L), upper = Map(1 -> 20L))))
  }

  test("strict projection: identity exact, temporal order-preserving, eq lossy") {
    val spec = PartitionSpec.build(schema, Seq("ts" -> Transform.Day, "id" -> Transform.Bucket(8)))
    def project(p: Predicate) =
      StrictProjection.project(Predicate.bind(p, schema), schema, spec)

    // Lt through day: f(x) < f(v) ⇒ x < v
    val lt = project(Predicate.lt("ts", Predicate.tsMicros("2021-06-15T12:00:00")))
    assert(lt === BinaryPred(Lt, "ts_day", Transform.Day.applyValue(
      Predicate.tsMicros("2021-06-15T12:00:00"), TimestampT)))
    // Eq through day is lossy → never strict
    assert(project(Predicate.eqTo("ts", Predicate.tsMicros("2021-06-15T12:00:00")))
      === AlwaysFalse)
    // NotEq through bucket: f(x)≠f(v) ⇒ x≠v
    val ne = project(graft.expr.BinaryPred(NotEq, "id", 7L))
    assert(ne === BinaryPred(NotEq, "id_bucket",
      Transform.Bucket(8).applyValue(7L, LongT)))
    // unprojectable ref → AlwaysFalse (never claim a partition-wide match)
    assert(project(Predicate.eqTo("s", "x")) === AlwaysFalse)

    val idSpec = PartitionSpec.build(schema, Seq("id" -> Transform.Identity))
    assert(StrictProjection.project(
      Predicate.bind(Predicate.eqTo("id", 7L), schema), schema, idSpec)
      === BinaryPred(Eq, "id", 7L))
  }
}

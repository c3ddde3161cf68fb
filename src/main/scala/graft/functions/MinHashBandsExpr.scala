package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** MinHash band keys in ONE pass over a document's shingle-hash array:
  * sig_i = min over shingles of (a_i·(h mod P) + b_i) mod P — the exact
  * arithmetic of [[graft.pipeline.Dedup.perm]] (P = 2³¹−1; a_i, b_i < P,
  * h ≥ 0, so every product stays under 2⁶² — no overflow under either
  * ANSI or legacy semantics) — then band j's key is its `rows`
  * signatures underscore-joined (the `concat_ws("_", ...)` rendering,
  * digit for digit).
  *
  * Why ONE expression returning the final key array: the r8 shape
  * exploded per-shingle hash rows and ran a 64-column min-aggregation —
  * a full-corpus explode plus a doc_id exchange for a per-DOC pure
  * function. And a naive per-row form that returns the 64 sigs as an
  * array consumed by 64 `getItem` band projections gets INLINED 64× by
  * CollapseProject (generator inputs defeat codegen subexpression
  * elimination), re-running the pass per band — measured 5× slower than
  * even the aggregate. Emitting the band keys directly gives the
  * generator exactly one evaluation per row: zero extra rows, zero
  * shuffle, one traversal. At 100 TB the removed exchange is the
  * difference between shuffling the shingle multiset of the corpus and
  * shuffling nothing.
  */
case class MinHashBandsExpr(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {

  require(bands > 0 && rows > 0 && bands * rows <= MinHashBandsExpr.MaxPerms,
    s"minhash_bands supports 1..${MinHashBandsExpr.MaxPerms} permutations: " +
      s"$bands × $rows")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> of shingle hashes, got $other")
  }

  // empty shingle set → null; a generator over null emits no rows, the
  // same drop the old aggregate shape applied to shingle-less docs
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinHashBandsExpr.bandKeys(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = "graft.functions.MinHashBandsExpr"
      s"""
         |${ev.value} = $cls.bandKeys($c, $bands, $rows);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
}

object MinHashBandsExpr {

  val MaxPerms = 256

  private val P: Long = 2147483647L // 2^31 - 1 (Dedup.P)

  // Dedup.perm(i) materialized once for the supported range
  private val A: Array[Long] = Array.tabulate(MaxPerms)(i =>
    1L + java.lang.Long.remainderUnsigned((i + 1) * 0x9E3779B97F4A7C15L, P - 1))
  private val B: Array[Long] = Array.tabulate(MaxPerms)(i =>
    java.lang.Long.remainderUnsigned((i + 1) * 0xC2B2AE3D27D4EB4FL, P))

  /** One traversal of the hashes → `bands` underscore-joined keys; null
    * for an empty array. Called from generated code — must stay a simple
    * static method. */
  def bandKeys(hashes: ArrayData, bands: Int, rows: Int): ArrayData = {
    val m = hashes.numElements()
    if (m == 0) return null
    val n = bands * rows
    val mins = new Array[Long](n)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var k = 0
    while (k < m) {
      val x = hashes.getLong(k) % P
      var i = 0
      while (i < n) {
        val v = (A(i) * x + B(i)) % P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      k += 1
    }
    val keys = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(rows * 11)
    var j = 0
    while (j < bands) {
      sb.setLength(0)
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append('_')
        sb.append(mins(j * rows + r))
        r += 1
      }
      keys(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(keys)
  }

  def column(hashes: Column, bands: Int, rows: Int): Column =
    GraftBridge.column(
      MinHashBandsExpr(GraftBridge.expression(hashes), bands, rows))
}

package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}

/** Codegen membership-filter probe over BROADCAST per-bucket Bloom
  * blobs: `mightContain(blobs[bucket], keyHash)` with the blob map
  * riding a broadcast VARIABLE instead of binary literals.
  *
  * Why an expression and not a UDF (VERDICT r13 item 3): the broadcast
  * path exists exactly for the biggest corpora (past
  * `Membership.literalBlobBytesMax` total blob bytes, where literal
  * plans die of per-task deserialization — BENCH_PLANCOST.json), and a
  * Scala UDF there re-introduces a row-boundary that breaks whole-stage
  * codegen on the hot ingest probe. This expression keeps the probe
  * generated at every blob size: `doGenCode` emits one static call into
  * [[graft.pipeline.BloomBlobCache]], which deserializes each bucket's
  * filter ONCE per executor (keyed by an app-unique token, so a
  * restarted SparkContext reusing broadcast ids can never be served a
  * previous filter's bits) and answers each row with k bit tests.
  *
  * Children: `left` = bucket (int, the Iceberg bucket transform of the
  * key), `right` = key hash (long, the same xxhash64 the filter build
  * aggregated). Both are non-null on the probe path (null keys are
  * refused batch-side before any plan runs); standard null-intolerant
  * semantics otherwise.
  *
  * Semantics are bit-identical to the literal when-chain
  * (`BloomFilterMightContain` over the same blob bytes) — pinned by
  * MembershipSpec's forced-broadcast parity test.
  */
case class BloomBlobMightContainExpr(
    left: Expression,
    right: Expression,
    blobs: Broadcast[Map[Int, Array[Byte]]],
    cacheToken: String) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_blob_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_blob_might_contain expects (int bucket, long hash), got ($l, $r)")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomBlobMightContainExpr =
    copy(left = newLeft, right = newRight)

  override protected def nullSafeEval(bucket: Any, hash: Any): Any =
    graft.pipeline.BloomBlobCache.mightContain(cacheToken, blobs,
      bucket.asInstanceOf[Int], hash.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw Broadcast in the generated cast — Janino has no generics; the
    // helper's erased signature accepts it
    val bcRef = ctx.addReferenceObj("bloomBlobs", blobs,
      classOf[Broadcast[_]].getName)
    val tok = ctx.addReferenceObj("bloomCacheToken", cacheToken,
      "java.lang.String")
    defineCodeGen(ctx, ev, (b, h) =>
      s"graft.pipeline.BloomBlobCache.mightContain($tok, $bcRef, $b, $h)")
  }
}

object BloomBlobMightContainExpr {
  def column(bucket: Column, keyHash: Column,
      blobs: Broadcast[Map[Int, Array[Byte]]], cacheToken: String): Column =
    GraftBridge.column(BloomBlobMightContainExpr(
      GraftBridge.expression(bucket), GraftBridge.expression(keyHash),
      blobs, cacheToken))
}

package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Portable deterministic text hashing shared by the dedup / similarity /
  * fingerprint operators.
  *
  * Everything here is built from md5 — the one hash both Spark and the
  * driver's DuckDB oracle compute identically — so every operator in this
  * package can be crosschecked bit-exactly against plain SQL. All hot-path
  * expressions are Catalyst built-ins (codegen'd, no UDFs), so they stay
  * inside whole-stage codegen at 100 TB.
  */
object TextHash {

  /** 60-bit portable hash: first 15 hex chars of md5 as a non-negative
    * long. DuckDB equivalent: `('0x' || substr(md5(s),1,15))::BIGINT`. */
  def hex60(c: Column): Column =
    conv(substring(md5(encode(c, "UTF-8")), 1, 15), 16, 10).cast(LongType)

  /** Same hash, driver-side (for deterministic constants such as LSH
    * hyperplane weights — no RNG, resumable, engine-independent). */
  def hex60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Lower-cased whitespace word split (single-space; the corpus is
    * single-spaced and DuckDB's string_split matches these semantics). */
  def words(text: Column): Column = split(lower(text), " ")

  /** Distinct 3-word shingles of a word array (≥3 words assumed; callers
    * filter). DuckDB: `list_distinct([w[i]||' '||w[i+1]||' '||w[i+2]
    * for i in range(1, len(w)-1)])`. */
  def shingles3(w: Column): Column =
    array_distinct(transform(sequence(lit(0), size(w) - 3),
      i => concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))

  /** Element-wise 60-bit hashes of a string array. */
  def hashAll(arr: Column): Column = transform(arr, s => hex60(s))

  /** Exact Jaccard similarity of two pre-distinct string arrays.
    * int/int division → double, bit-identical across engines. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter / (size(a) + size(b) - inter)
  }

  /** Left-to-right double dot product of two numeric arrays. Each
    * float×float product is exact in double (24+24 ≤ 53 mantissa bits);
    * the sequential fold matches DuckDB's list_sum order, so the result
    * is bit-identical to the SQL oracle. Runs as a native codegen
    * expression (one fused primitive loop per row — the HOF
    * `aggregate(zip_with(...))` form computed the same fold as an
    * interpreted lambda loop with a per-row intermediate array; see
    * [[graft.functions.DotProductExpr]] which preserves its null
    * semantics exactly). */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProductExpr.column(a, b)

  /** The previous higher-order-function form — kept as the semantics
    * oracle for DotProductExpr's equivalence spec. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))
}

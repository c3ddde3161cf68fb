package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator/query: a Spark implementation plus (optionally)
  * an equivalent DuckDB SQL oracle over the same raw parquet tables.
  *
  * Determinism discipline (the driver hash-compares values against DuckDB):
  *   - never emit a raw floating-point SUM/AVG (summation order differs
  *     between engines and across Spark runs) — cast to decimal first;
  *     decimal addition is exact and associative.
  *   - decimal casts from double use scale >= 1 so an exact rounding tie is
  *     unrepresentable in binary (only dyadic rationals are exact doubles).
  *   - keep decimal arithmetic lossless (widen, never down-cast scale).
  *   - emit timestamps as DATE or epoch integers where possible.
  *   - every query ORDER BYs its natural key on both sides.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** include in the per-round benchmark (run at sf0.1) */
    bench: Boolean = false)

object Q {
  def sql(name: String, oracle: String, bench: Boolean = false)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle), bench)

  /** Fresh temp warehouse + Hadoop catalog for queries that build a
    * throwaway Graft table per invocation (the write/serving family).
    * Every warehouse this JVM creates is recursively deleted at JVM
    * exit — a bench/verify process runs the write family dozens of
    * times, and leaked warehouses were accumulating gigabytes of /tmp
    * across fork-protocol runs. */
  private val tempWarehouses =
    java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tempWarehouses.forEach { wh =>
        try {
          import java.nio.file.{Files, Paths}
          import java.util.Comparator
          Files.walk(Paths.get(wh)).sorted(Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
        } catch { case _: Throwable => () } // best-effort; exit anyway
      }))
  }

  private[queries] def freshCatalog(spark: SparkSession,
      tag: String): (graft.catalog.HadoopCatalog, String) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-wb-$tag-").toString
    tempWarehouses.add(wh)
    (new graft.catalog.HadoopCatalog(wh, graft.io.FileIO.fromSpark(spark)), wh)
  }

  /** Operator with no SQL-expressible oracle (driver records rows-only check). */
  def rowsOnly(name: String, bench: Boolean = false)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None, bench)
}

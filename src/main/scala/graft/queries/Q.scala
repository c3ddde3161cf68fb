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
    * Harnesses (Bench / Verify / ScaleProbe) call [[dropTempWarehouses]]
    * after each query's rows are materialized, so a long process doesn't
    * accumulate every serving-table warehouse for its whole lifetime
    * (r10 ADVICE: gigabytes of /tmp across fork runs); the JVM shutdown
    * hook stays as the backstop for paths that never reach a harness
    * cleanup (test JVMs, aborted runs). */
  private val tempWarehouses =
    java.util.Collections.synchronizedList(new java.util.ArrayList[String]())

  private def deleteRecursively(wh: String): Unit =
    try {
      import java.nio.file.{Files, Paths}
      import java.util.Comparator
      Files.walk(Paths.get(wh)).sorted(Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    } catch { case _: Throwable => () } // best-effort

  /** Eagerly delete every temp warehouse created so far. Call only AFTER
    * the current query's result rows are fully materialized (collected /
    * written / hashed) — a lazily-evaluated serving DataFrame still
    * reads from its warehouse. */
  def dropTempWarehouses(): Unit = {
    val drained = tempWarehouses.synchronized {
      val s = new java.util.ArrayList[String](tempWarehouses)
      tempWarehouses.clear(); s
    }
    drained.forEach(wh => deleteRecursively(wh))
  }

  /** Warehouses PINNED for the JVM's lifetime: the maintenance-only
    * bench queries ([[MaintenanceQueries]]) build their artifact once
    * per JVM and fold into it on every timed run, so the per-query
    * harness cleanup must not delete it — reclaimed only by the
    * shutdown hook. */
  private val pinnedWarehouses =
    java.util.Collections.synchronizedList(new java.util.ArrayList[String]())

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dropTempWarehouses()
      pinnedWarehouses.forEach(wh => deleteRecursively(wh))
    }))
  }

  private[queries] def freshCatalog(spark: SparkSession,
      tag: String): (graft.catalog.HadoopCatalog, String) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-wb-$tag-").toString
    tempWarehouses.add(wh)
    (new graft.catalog.HadoopCatalog(wh, graft.io.FileIO.fromSpark(spark)), wh)
  }

  private[queries] def pinnedCatalog(spark: SparkSession,
      tag: String): graft.catalog.HadoopCatalog = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-wp-$tag-").toString
    pinnedWarehouses.add(wh)
    new graft.catalog.HadoopCatalog(wh, graft.io.FileIO.fromSpark(spark))
  }

  /** Operator with no SQL-expressible oracle (driver records rows-only check). */
  def rowsOnly(name: String, bench: Boolean = false)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None, bench)
}

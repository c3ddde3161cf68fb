package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark harness (driver → BENCH_r{N}.json).
  *
  * Discipline (VERDICT r5 item 6): fixed query order, a full warmup pass
  * (JIT, codegen cache, FS metadata, parquet footers), then THREE measured
  * runs per query with the MEDIAN reported — cross-round comparisons were
  * drowning in single-shot variance. Between runs all persistent RDDs
  * (localCheckpoint residue) and the SQL cache are dropped, so no query is
  * taxed by a predecessor's leaked storage. The JSON carries a fixture
  * fingerprint (per-table file size + mtime + row count) so a testdata
  * regen between rounds is visible instead of silently masquerading as a
  * code regression. Materialization is the `noop` sink so every output
  * column is computed (a bare `.count()` lets Catalyst prune the
  * projection and under-measures wide scans). The JSON line is printed
  * last after spark.stop() AND written to BENCH_LOCAL.json so the
  * driver's parse survives log interleaving.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // A/B knob for the ObjectHashAggregate fallback threshold (r9
      // regression analysis); default = Spark's own 128. The dedup
      // queries no longer depend on a session-global raise — see
      // Dedup.blockedPairs.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OBJ_FALLBACK", "128"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Fork-protocol subsetting (VERDICT r8 item 2): SPARK_GRAFT_BENCH_ONLY
    // restricts the measured set for local iteration, but the protocol —
    // fresh JVM per invocation, full warmup pass, median+min of 3, cache
    // cleanup between runs — is identical to the driver's. Numbers quoted
    // in SURVEY/commits MUST come from this entry point run via
    // tools/bench_fork.sh (fresh sbt JVM), never from a warm session.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val queries = Registry.benchQueries.sortBy(_.name)
      .filter(q => only.forall(_.contains(q.name)))

    def cleanup(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      // serving/write queries built throwaway warehouses; their rows are
      // materialized by now (the noop sink ran) — reclaim /tmp eagerly
      graft.queries.Q.dropTempWarehouses()
    }

    def runOnce(q: graft.queries.Q): Double = {
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      cleanup()
      sec
    }

    // warmup: full pass
    queries.foreach { q =>
      try runOnce(q) catch { case e: Throwable =>
        System.err.println(s"[bench warmup] ${q.name}: ${e.getMessage}")
      }
    }
    // measured: median of 3 per query, fixed (alphabetical) order
    val results = queries.map { q =>
      val runs = (1 to 3).map { _ =>
        try runOnce(q) catch { case _: Throwable => -1.0 }
      }.sorted
      q.name -> (runs(1), runs.head)
    }

    // fixture fingerprint: regen detection across rounds
    val fixture = Tables.names.map { t =>
      val f = new java.io.File(s"$sfDir/$t.parquet")
      val rows =
        try spark.read.parquet(f.getPath).count()
        catch { case _: Throwable => -1L }
      s""""$t":{"bytes":${f.length()},"mtime":${f.lastModified()},"rows":$rows}"""
    }.mkString("{", ",", "}")

    val qMedians = results.map { case (k, (med, _)) => "\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val qMins = results.map { case (k, (_, mn)) => "\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qMedians,"queries_min":$qMins,"fixture":$fixture,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("BENCH_LOCAL.json"), json + "\n")
    spark.stop()
    println(json)
  }
}

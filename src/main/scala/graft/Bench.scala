package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark harness (driver → BENCH_r{N}.json).
  *
  * Discipline (VERDICT r1 item 10): fixed query order, a full warmup pass
  * so no query pays JVM/codegen/first-read cost, and materialization via
  * the `noop` sink so every output column is actually computed (a bare
  * `.count()` lets Catalyst prune the projection and under-measures wide
  * scans). The JSON line is printed last after spark.stop() AND written to
  * BENCH_LOCAL.json so the driver's parse survives log interleaving.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val queries = Registry.benchQueries.sortBy(_.name)

    def runOnce(q: graft.queries.Q): Double = {
      val t0 = System.nanoTime()
      q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: full pass (JIT, codegen cache, FS metadata, parquet footers)
    queries.foreach { q =>
      try runOnce(q) catch { case e: Throwable =>
        System.err.println(s"[bench warmup] ${q.name}: ${e.getMessage}")
      }
    }
    // measured pass, fixed (alphabetical) order
    val results = queries.map { q =>
      val sec = try runOnce(q) catch { case _: Throwable => -1.0 }
      q.name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    Files.writeString(Paths.get("BENCH_LOCAL.json"), json + "\n")
    spark.stop()
    println(json)
  }
}

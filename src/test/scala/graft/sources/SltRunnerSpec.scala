package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Sqllogictest-style corpus runner — the engine's analogue of the
  * reference's `crates/sqllogictest` harness (slt files under
  * `testdata/slts/df_test/`, runner in `src/`): each `.slt` script under
  * `src/test/resources/slts/` drives the FULL SQL surface (DDL, DML,
  * row-level ops, metadata tables) through `spark.sql` against the graft
  * catalog plugin and compares rendered results.
  *
  * Directive subset (the public sqllogictest format):
  *   `statement ok`     — SQL must succeed
  *   `statement error`  — SQL must fail
  *   `query <types> [rowsort]` — SQL, then `----`, then expected rows
  *     (one row per line, cells space-separated; `rowsort` sorts both
  *     sides; type string is present for slt compatibility but untyped —
  *     cells compare as rendered text)
  */
class SltRunnerSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.sources.GraftSparkExtensions")
    .config("spark.ui.enabled", "false")
    .appName("graft-slt")
    .getOrCreate()

  private val tempDirs = scala.collection.mutable.ArrayBuffer.empty[String]

  override def afterAll(): Unit = {
    spark.stop()
    tempDirs.foreach { d =>
      try {
        import java.util.Comparator
        Files.walk(Paths.get(d)).sorted(Comparator.reverseOrder())
          .forEach(x => Files.deleteIfExists(x))
      } catch { case _: Throwable => () }
    }
  }

  private lazy val sltDir: Path =
    Paths.get(getClass.getResource("/slts").toURI)

  private def registerCatalog(): Unit = {
    val wh = Files.createTempDirectory("graft-slt").toString
    tempDirs += wh
    spark.conf.set("spark.sql.catalog.slt", "graft.sources.GraftCatalogPlugin")
    spark.conf.set("spark.sql.catalog.slt.warehouse", wh)
  }

  private def render(v: Any): String = v match {
    case null => "NULL"
    case s: String if s.isEmpty => "(empty)"
    case d: java.math.BigDecimal => d.toPlainString
    case b: Array[Byte] => "x" + b.map("%02x".format(_)).mkString
    case other => String.valueOf(other)
  }

  private def runFile(path: Path): Unit = {
    val lines = Files.readAllLines(path).asScala.toVector
    var i = 0
    def collectSql(stop: String => Boolean): String = {
      val sql = new StringBuilder
      while (i < lines.length && !stop(lines(i))) {
        sql.append(lines(i)).append('\n'); i += 1
      }
      sql.toString.trim
    }
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.isEmpty || line.startsWith("#")) { i += 1 }
      else if (line == "statement ok") {
        i += 1
        val sql = collectSql(l => l.trim.isEmpty)
        withClue(s"${path.getFileName}: statement ok\n$sql\n") {
          spark.sql(sql).collect()
        }
      }
      else if (line == "statement error") {
        i += 1
        val sql = collectSql(l => l.trim.isEmpty)
        withClue(s"${path.getFileName}: statement error\n$sql\n") {
          assertThrows[Exception](spark.sql(sql).collect())
        }
      }
      else if (line.startsWith("query plan")) {
        // plan-shape pin (the reference's basic_queries.slt EXPLAIN
        // discipline, adapted to Spark's non-deterministic plan text):
        // SQL must be an EXPLAIN; each expected line is a substring the
        // rendered plan MUST contain — or, prefixed with `!`, must NOT.
        i += 1
        val sql = collectSql(l => l.trim == "----")
        i += 1 // skip ----
        val pins = Vector.newBuilder[String]
        while (i < lines.length && lines(i).trim.nonEmpty) {
          pins += lines(i).trim; i += 1
        }
        withClue(s"${path.getFileName}: query plan\n$sql\n") {
          val plan = spark.sql(sql).collect()
            .map(r => render(r.get(0))).mkString("\n")
          pins.result().foreach { p =>
            if (p.startsWith("!")) {
              val f = p.drop(1).trim
              assert(!plan.contains(f), s"\nforbidden '$f' present in plan:\n$plan")
            } else assert(plan.contains(p), s"\nmissing '$p' in plan:\n$plan")
          }
        }
      }
      else if (line.startsWith("query")) {
        val rowsort = line.split("\\s+").contains("rowsort")
        i += 1
        val sql = collectSql(l => l.trim == "----")
        i += 1 // skip ----
        val expected = Vector.newBuilder[String]
        while (i < lines.length && lines(i).trim.nonEmpty) {
          expected += lines(i).trim.replaceAll("\\s+", " "); i += 1
        }
        withClue(s"${path.getFileName}: query\n$sql\n") {
          val got = spark.sql(sql).collect()
            .map(r => (0 until r.length).map(j => render(r.get(j))).mkString(" "))
            .toVector
          val (g, e) =
            if (rowsort) (got.sorted, expected.result().sorted)
            else (got, expected.result())
          assert(g == e, s"\nexpected:\n${e.mkString("\n")}\ngot:\n${g.mkString("\n")}")
        }
      }
      else fail(s"${path.getFileName}: unrecognized directive at line ${i + 1}: $line")
    }
  }

  /** Temp views over the DataFrame-API dedup pipelines so the SLT corpus
    * can pin their plan shape (slt 21) with the same EXPLAIN discipline
    * the SQL surfaces get — no Window, no CartesianProduct, bounded
    * ObjectHashAggregate present. */
  private def registerDedupViews(): Unit = {
    import spark.implicits._
    val docs = (1L to 40L).map(i =>
      (i, s"the quick brown fox ${i % 4} jumps over the lazy dog ${i % 4}"))
      .toDF("doc_id", "text")
    graft.pipeline.Dedup.lshCandidates(
      graft.pipeline.Dedup.minhashBands(
        graft.pipeline.Dedup.shingleSets(docs), bands = 4, rows = 2))
      .createOrReplaceTempView("slt_lsh_candidates")
    graft.pipeline.Dedup.hammingNearDups(
      graft.pipeline.Dedup.simhash(docs), "simhash",
      maxHamming = 3, bands = 4, bits = 60)
      .createOrReplaceTempView("slt_hamming_neardups")
  }

  /** Serving-path plan pins (round 10): the persisted-index probes are
    * DataFrame-built over REAL Graft tables in temp warehouses; their
    * 100 TB contract is structural — a term lookup never shuffles, the
    * ANN probe broadcasts the query side (the corpus cells never
    * re-exchange for a probe), and nothing degrades to a cartesian. */
  private def registerServingViews(): Unit = {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-slt-serve-").toString
    tempDirs += wh
    val catalog = new graft.catalog.HadoopCatalog(wh, graft.io.FileIO.fromSpark(spark))
    val docs = (1L to 40L).map(i =>
      (i, s"the quick brown fox ${i % 4} jumps over the lazy dog ${i % 4}"))
      .toDF("doc_id", "text")
    // the probe DataFrames are built on the scan-session CLONE
    // (graft.SessionConf.scanSession), whose temp-view catalog is not
    // this session's — GLOBAL temp views are shared across sessions of
    // one context, so the slt file queries global_temp.*
    val inv = graft.pipeline.Serving.persistInvertedIndex(docs, "slt_inv", catalog)
    graft.pipeline.Serving.lookupTerms(inv, spark, Seq("quick", "lazy"))
      .createOrReplaceGlobalTempView("slt_index_lookup")

    val vecs = (1L to 100L).map(i =>
      (i, Array.tabulate(64)(d => ((i * 31 + d * 7) % 97).toFloat / 97f)))
      .toDF("vec_id", "embedding")
    val (ivf, cents) = graft.pipeline.Serving.persistIvfIndex(
      vecs, "slt_ivf", catalog, cells = 8)
    graft.pipeline.Serving.annFromIvfIndex(
        ivf, cents, spark,
        vecs.filter(org.apache.spark.sql.functions.col("vec_id") <= 5), k = 3)
      .createOrReplaceGlobalTempView("slt_ivf_probe")
  }

  registerCatalog()
  registerDedupViews()
  registerServingViews()
  private lazy val files = Files.list(sltDir).iterator().asScala.toSeq
    .filter(_.toString.endsWith(".slt")).sortBy(_.getFileName.toString)

  files.foreach { f =>
    test(s"slt: ${f.getFileName}") { runFile(f) }
  }

  private def withClue[T](clue: String)(body: => T): T =
    try body catch {
      case e: org.scalatest.exceptions.TestFailedException => throw e.modifyMessage(m => Some(clue + m.getOrElse("")))
      case e: Exception => fail(clue + e.getMessage, e)
    }
}

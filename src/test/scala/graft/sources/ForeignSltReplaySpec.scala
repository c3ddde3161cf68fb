package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Replays the REFERENCE's own sqllogictest corpus against this engine:
  * the DataFusion integration scripts under
  * `crates/sqllogictest/testdata/slts/df_test/` (ten .slt files),
  * grouped into the schedules its `testdata/schedules/` tomls define
  * (each schedule = fresh catalog state, steps run in order — the
  * cross-script state like like_predicate_pushdown reading
  * insert_into's rows is intentional there).
  *
  * The scripts are read from the reference checkout at runtime (never
  * copied into this repo); the suite skips itself if the checkout is
  * absent. Fixture tables mirror the reference harness's programmatic
  * setup (`crates/sqllogictest/src/engine/datafusion.rs:108-164`):
  * `test_partitioned_table` (identity-partitioned on category) and
  * `test_binary_table`.
  *
  * Engine-adaptation rules — everything else replays verbatim:
  *   1. `tbl$snapshots` / `$history` / `$manifests` → `tbl.snapshots`
  *      etc. (this engine exposes metadata tables as a trailing
  *      identifier part, not a `$` suffix).
  *   2. DataFusion renders DML as a row-count result (`query I` over an
  *      INSERT). Spark's INSERT returns no rows, so the replay asserts
  *      the same semantic directly: the target table's COUNT(*) delta
  *      must equal the expected count (including the zero-row case,
  *      which also pins that no empty snapshot appears — the script
  *      queries `$snapshots` right after).
  *   3. `EXPLAIN` blocks pin DataFusion plan text (IcebergTableScan
  *      lines); plan TEXT is engine-specific, but the INTENT — the
  *      predicate / limit reached the scan — is asserted against this
  *      engine's plan markers instead (`filter=` / `limit=N` on the
  *      BatchScan, same discipline as slts/20_explain_plans.slt).
  *   4. `TIMESTAMP(6)` → `TIMESTAMP` (Spark SQL has no precision
  *      parameter; its timestamps ARE microsecond, the same physical
  *      type the script creates). `TIMESTAMP(3)` / `TIMESTAMP(0)` stay
  *      verbatim — the script expects those to error, and they do here
  *      too (Spark has no such types either).
  *   5. `SHOW TABLES` output enumerates DataFusion's information_schema
  *      views and `$`-suffixed metadata tables; the replay asserts the
  *      BASE tables the script expects are all listed by this engine's
  *      SHOW TABLES (metadata tables here resolve by name rather than
  *      being enumerated).
  *   6. Value rendering follows the DataFusion slt engine: NULL /
  *      (empty) / bare lowercase hex for binary / floats rounded to 12
  *      decimal places with trailing zeros stripped / timestamps as
  *      `yyyy-MM-ddTHH:mm:ss`.
  */
class ForeignSltReplaySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val refRoot = Paths.get("/root/reference/crates/sqllogictest/testdata")
  private def available: Boolean = Files.isDirectory(refRoot)

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.extensions", "graft.sources.GraftSparkExtensions")
    .config("spark.ui.enabled", "false")
    .appName("graft-foreign-slt")
    .getOrCreate()

  override def afterAll(): Unit = if (available) spark.stop()

  private def registerCatalog(): Unit = {
    val wh = Files.createTempDirectory("graft-fslt").toString
    spark.conf.set("spark.sql.catalog.default", "graft.sources.GraftCatalogPlugin")
    spark.conf.set("spark.sql.catalog.default.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS default.default")
  }

  /** Fresh schedule state: drop every table in the namespace, recreate
    * the two harness fixtures (datafusion.rs:108-164). */
  private def resetSchedule(): Unit = {
    spark.sql("SHOW TABLES IN default.default").collect()
      .map(_.getAs[String]("tableName"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS default.default.`$t`"))
    spark.sql(
      """CREATE TABLE default.default.test_partitioned_table (
        |  id INT NOT NULL, category STRING NOT NULL, value STRING)
        |PARTITIONED BY (category)""".stripMargin)
    spark.sql(
      """CREATE TABLE default.default.test_binary_table (
        |  id INT NOT NULL, data BINARY)""".stripMargin)
  }

  // ---- DataFusion-convention rendering ----------------------------------

  private def numeric(s: String): String = {
    val bd = new java.math.BigDecimal(s)
      .setScale(12, java.math.RoundingMode.HALF_UP).stripTrailingZeros
    bd.toPlainString
  }

  private def isoTs(t: java.sql.Timestamp): String = {
    val ldt = t.toLocalDateTime
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02d" +
      f"T${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    if (ldt.getNano == 0) base
    else base + "." + f"${ldt.getNano}%09d".reverse.dropWhile(_ == '0').reverse
  }

  private def render(v: Any): String = v match {
    case null => "NULL"
    case s: String if s.isEmpty => "(empty)"
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case d: scala.math.BigDecimal => d.bigDecimal.stripTrailingZeros.toPlainString
    case f: java.lang.Float => numeric(f.toString)
    case d: java.lang.Double => numeric(d.toString)
    case t: java.sql.Timestamp => isoTs(t)
    case other => String.valueOf(other)
  }

  // ---- script transforms -------------------------------------------------

  private def adaptSql(sql: String): String = sql
    .replaceAll("\\$(snapshots|history|manifests|entries|files)", ".$1")
    .replace("TIMESTAMP(6)", "TIMESTAMP")

  private val insertTarget = "(?is)^\\s*INSERT\\s+INTO\\s+(\\S+).*".r

  // ---- the replay runner -------------------------------------------------

  private def runScript(path: Path): Unit = {
    val lines = Files.readAllLines(path).asScala.toVector
    var i = 0
    def collectSql(stop: String => Boolean): String = {
      val sql = new StringBuilder
      while (i < lines.length && !stop(lines(i))) {
        sql.append(lines(i)).append('\n'); i += 1
      }
      adaptSql(sql.toString.trim)
    }
    def collectExpected(): Vector[String] = {
      val rows = Vector.newBuilder[String]
      while (i < lines.length && lines(i).trim.nonEmpty) {
        rows += lines(i).trim.replaceAll("\\s+", " "); i += 1
      }
      rows.result()
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
      else if (line.startsWith("statement error")) {
        // expected message text is DataFusion-phrased; the contract
        // replayed here is "this statement must fail"
        i += 1
        val sql = collectSql(l => l.trim.isEmpty)
        withClue(s"${path.getFileName}: statement error\n$sql\n") {
          assertThrows[Exception](spark.sql(sql).collect())
        }
      }
      else if (line.startsWith("query")) {
        val rowsort = line.split("\\s+").contains("rowsort")
        i += 1
        val sql = collectSql(l => l.trim == "----")
        if (i < lines.length && lines(i).trim == "----") i += 1
        val expected = collectExpected()
        val upper = sql.toUpperCase
        if (upper.startsWith("EXPLAIN")) replayExplain(path, sql, expected)
        else if (upper.startsWith("INSERT")) replayDmlCount(path, sql, expected)
        else if (upper == "SHOW TABLES") replayShowTables(path, expected)
        else withClue(s"${path.getFileName}: query\n$sql\n") {
          val got = spark.sql(sql).collect()
            .map(r => (0 until r.length).map(j => render(r.get(j))).mkString(" "))
            .toVector
          val (g, e) = if (rowsort) (got.sorted, expected.sorted) else (got, expected)
          assert(g == e, s"\nexpected:\n${e.mkString("\n")}\ngot:\n${g.mkString("\n")}")
        }
      }
      else fail(s"${path.getFileName}: unrecognized directive at line ${i + 1}: $line")
    }
  }

  /** Rule 3: assert the pushdown the DataFusion plan pins, against this
    * engine's plan markers. */
  private def replayExplain(path: Path, sql: String, expected: Vector[String]): Unit =
    withClue(s"${path.getFileName}: explain\n$sql\n") {
      val plan = spark.sql(sql).collect().map(r => render(r.get(0))).mkString("\n")
      val predicatePin = expected.exists(l =>
        l.contains("predicate:[") && !l.contains("predicate:[]"))
      val limitPin = "limit:\\[(\\d+)\\]".r.findFirstMatchIn(expected.mkString("\n"))
      if (predicatePin)
        assert(plan.contains("filter="),
          s"reference pins a scan predicate; no filter= on this plan:\n$plan")
      limitPin.foreach { m =>
        assert(plan.contains(s"limit=${m.group(1)}"),
          s"reference pins limit:[${m.group(1)}]; no limit= on this plan:\n$plan")
      }
    }

  /** Rule 2: DataFusion's DML row-count result, asserted as the target
    * table's row-count delta. */
  private def replayDmlCount(path: Path, sql: String, expected: Vector[String]): Unit =
    withClue(s"${path.getFileName}: dml count\n$sql\n") {
      val target = sql match {
        case insertTarget(t) => t
        case _ => fail(s"cannot locate INSERT target in\n$sql")
      }
      def count(): Long =
        spark.sql(s"SELECT count(*) FROM $target").head().getLong(0)
      val before = count()
      spark.sql(coerceValuesInsert(sql, target)).collect()
      val delta = count() - before
      val want = expected.headOption.map(_.toLong).getOrElse(0L)
      assert(delta == want, s"expected $want inserted rows, table grew by $delta")
    }

  /** DataFusion coerces string literals to the column's type during
    * INSERT (temporal columns take '2024-01-15'-style strings); Spark's
    * ANSI store assignment rejects the implicit string→DATE/TIMESTAMP
    * cast and the LEGACY policy is disallowed for DSv2 writes. The
    * replay makes the same coercion EXPLICIT: a literal-VALUES insert is
    * rebuilt as a SELECT casting each column to the target type (a
    * no-op for already-typed columns). Non-VALUES inserts pass through. */
  private def coerceValuesInsert(sql: String, target: String): String = {
    val m = "(?is)^\\s*INSERT\\s+INTO\\s+\\S+\\s+(VALUES\\s+.*)$".r
      .findFirstMatchIn(sql)
    m match {
      case None => sql
      case Some(g) =>
        val fields = spark.table(target).schema.fields
        val cols = fields.indices.map(j => s"_c$j")
        val casts = fields.zip(cols)
          .map { case (f, c) => s"CAST($c AS ${f.dataType.sql})" }
        s"INSERT INTO $target SELECT ${casts.mkString(", ")} FROM " +
          s"(${g.group(1)}) AS _v(${cols.mkString(", ")})"
    }
  }

  /** Rule 5: every BASE table the DataFusion listing expects must be
    * listed by this engine too. */
  private def replayShowTables(path: Path, expected: Vector[String]): Unit =
    withClue(s"${path.getFileName}: show tables\n") {
      val wantBase = expected.collect {
        case l if l.startsWith("default default ") && l.endsWith("BASE TABLE")
          && !l.contains("$") => l.split("\\s+")(2)
      }.toSet
      val got = spark.sql("SHOW TABLES IN default.default").collect()
        .map(_.getAs[String]("tableName")).toSet
      assert(wantBase.subsetOf(got),
        s"missing tables: ${(wantBase -- got).mkString(", ")}; got: ${got.mkString(", ")}")
    }

  // ---- schedule discovery ------------------------------------------------

  private lazy val schedules: Seq[(String, Seq[Path])] = {
    val dir = refRoot.resolve("schedules")
    Files.list(dir).iterator().asScala.toSeq
      .filter(_.toString.endsWith(".toml")).sortBy(_.getFileName.toString)
      .map { toml =>
        val steps = Files.readAllLines(toml).asScala
          .collect { case l if l.trim.startsWith("slt") =>
            l.split("=")(1).trim.stripPrefix("\"").stripSuffix("\"")
          }
          .map(rel => refRoot.resolve("slts").resolve(rel)).toSeq
        (toml.getFileName.toString.stripSuffix(".toml"), steps)
      }
  }

  if (available) {
    registerCatalog()
    schedules.foreach { case (name, steps) =>
      test(s"foreign slt schedule: $name") {
        resetSchedule()
        steps.foreach(runScript)
      }
    }
  } else {
    test("foreign slt corpus (reference checkout absent)") {
      cancel("reference sqllogictest testdata not present")
    }
  }

  private def withClue[T](clue: String)(body: => T): T =
    try body catch {
      case e: org.scalatest.exceptions.TestFailedException =>
        throw e.modifyMessage(m => Some(clue + m.getOrElse("")))
      case e: Exception => fail(clue + e.getMessage, e)
    }
}

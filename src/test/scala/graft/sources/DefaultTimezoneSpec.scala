package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Timestamptz field defaults under a NON-UTC session timezone.
  *
  * Two independent zone traps, both fixed at the metadata boundary:
  *   - folding the DDL default text must use the SESSION timezone (the
  *     same zone Spark's analyzer applies to CURRENT_DEFAULT on INSERT),
  *     so the instant stored in Iceberg metadata equals the instant the
  *     analyzer fills (GraftCatalogPlugin.foldDefaultLiteral);
  *   - re-emitting a stored default as SQL text must carry an explicit
  *     +00:00 offset (IcebergType.defaultSqlLiteral), so a different
  *     session zone at read/insert time cannot shift it.
  */
class DefaultTimezoneSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", 2)
    // the whole suite runs OFF-UTC: Los Angeles is UTC-8 in winter
    .config("spark.sql.session.timeZone", "America/Los_Angeles")
    .config("spark.ui.enabled", "false")
    .appName("graft-default-tz-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val wh = Files.createTempDirectory("graft-tzd").toString

  private def register(): Unit = {
    spark.conf.set("spark.sql.catalog.tzc", "graft.sources.GraftCatalogPlugin")
    spark.conf.set("spark.sql.catalog.tzc.warehouse", wh)
  }

  test("CREATE-time timestamptz DEFAULT: analyzer fill == stored instant") {
    register()
    spark.sql("""CREATE TABLE tzc.ev (id BIGINT,
      ts TIMESTAMP DEFAULT TIMESTAMP '2024-01-15 12:00:00') USING graft
      TBLPROPERTIES ('format-version'='3')""")
    spark.sql("INSERT INTO tzc.ev (id) VALUES (1)")
    val filled = spark.sql("SELECT ts FROM tzc.ev").collect().head.getTimestamp(0)
    // noon LA in January is 20:00 UTC — the fill must be that instant
    assert(filled.toInstant == java.time.Instant.parse("2024-01-15T20:00:00Z"),
      s"analyzer filled $filled")
    // the Iceberg metadata stores the same instant (µs since epoch)
    val t = graft.table.GraftTable.load("ev",
      new graft.catalog.HadoopCatalog(wh, graft.io.FileIO.fromSpark(spark)))
    val stored = t.schema.fields.find(_.name == "ts").get.writeDefault.get
    assert(stored == 1705348800000000L, s"metadata stored $stored")
  }

  test("ALTER ADD COLUMN timestamptz DEFAULT: pre-default rows serve the same instant") {
    register()
    spark.sql("""CREATE TABLE tzc.ev2 (id BIGINT) USING graft
      TBLPROPERTIES ('format-version'='3')""")
    spark.sql("INSERT INTO tzc.ev2 VALUES (1)") // written BEFORE the column
    spark.sql("""ALTER TABLE tzc.ev2 ADD COLUMN ts TIMESTAMP
      DEFAULT TIMESTAMP '2024-01-15 12:00:00'""")
    spark.sql("INSERT INTO tzc.ev2 (id) VALUES (2)") // analyzer-filled
    val rows = spark.sql("SELECT id, ts FROM tzc.ev2 ORDER BY id").collect()
    val want = java.time.Instant.parse("2024-01-15T20:00:00Z")
    assert(rows.forall(_.getTimestamp(1).toInstant == want),
      s"initial-default and analyzer fill must agree off-UTC; got ${rows.mkString(",")}")
  }
}

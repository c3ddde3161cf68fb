package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.io.FileIO
import graft.spec.IcebergSchema
import graft.table.GraftTable

/** GraftCatalogPlugin `warehouse-conf` mode (r11 ADVICE item 4): one
  * cached plugin instance under ONE catalog name serves a SEQUENCE of
  * fresh warehouses by re-reading a session-conf key per operation —
  * the shape the write-path bench queries rely on (constant session
  * state instead of a leaked conf pair + plugin instance per
  * invocation). The r11 failure mode this guards: a name-cached plugin
  * frozen on its first warehouse silently no-ops row-level SQL against
  * a stale table. */
class DynamicWarehouseSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("dynamic-warehouse-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshTable(tag: String): (HadoopCatalog, String) = {
    val wh = java.nio.file.Files.createTempDirectory(s"graft-dyn-$tag-").toString
    val cat = new HadoopCatalog(wh, FileIO.fromSpark(spark))
    import spark.implicits._
    val df = Seq((1L, tag), (2L, tag)).toDF("id", "v")
    GraftTable.create("t", cat, IcebergSchema.fromSpark(df.schema)).append(df)
    (cat, wh)
  }

  test("one catalog name follows the warehouse-conf key across warehouses") {
    val key = "spark.graft.test.dynwh"
    spark.conf.set("spark.sql.catalog.dyn", "graft.sources.GraftCatalogPlugin")
    spark.conf.set("spark.sql.catalog.dyn.warehouse-conf", key)

    val (catA, whA) = freshTable("a")
    spark.conf.set(key, whA)
    assert(spark.sql("SELECT v FROM dyn.t ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("a", "a"))

    // re-point the key: the SAME cached plugin must serve warehouse B,
    // and a row-level op must mutate B (not silently no-op against A)
    val (catB, whB) = freshTable("b")
    spark.conf.set(key, whB)
    assert(spark.sql("SELECT v FROM dyn.t ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("b", "b"))
    spark.sql("DELETE FROM dyn.t WHERE id = 1")
    assert(GraftTable.load("t", catB).newScan().toDF(spark).count() === 1,
      "the row-level op must hit warehouse B through the re-pointed key")
    assert(GraftTable.load("t", catA).newScan().toDF(spark).count() === 2,
      "warehouse A must be untouched")

    // and back: the plugin swaps again (no one-way cache)
    spark.conf.set(key, whA)
    assert(spark.sql("SELECT count(*) FROM dyn.t").head.getLong(0) === 2L)

    // an unset key refuses loudly instead of serving a stale backend
    spark.conf.unset(key)
    val ex = intercept[Exception] { spark.sql("SELECT * FROM dyn.t").collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains(key)), s"unhelpful error: $ex")
  }
}

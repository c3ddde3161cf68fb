package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.io.FileIO
import graft.table.GraftTable

/** SQL procedures whose outputs carry nondeterministic ids/paths (the
  * deterministic ones live in slts/08_procedures.slt): cherrypick,
  * set_current_snapshot, ancestors_of, register_table, add_files,
  * compute_table_stats. */
class SqlProceduresSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-sql-procedures-spec")
    .getOrCreate()

  private lazy val wh = Files.createTempDirectory("graft-proc").toString
  private lazy val catalog = new HadoopCatalog(wh, new FileIO(new Configuration()))

  override def afterAll(): Unit = spark.stop()

  private def registerCatalog(name: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalogPlugin")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  test("cherrypick_snapshot + set_current_snapshot through SQL") {
    registerCatalog("pc1")
    spark.sql("CREATE TABLE pc1.cp (id BIGINT, v STRING)")
    spark.sql("INSERT INTO pc1.cp VALUES (1,'base')")
    spark.sql("CALL pc1.system.create_branch('cp', 'audit')")

    // stage on the branch, advance main, publish by cherry-pick
    var t = GraftTable.load("cp", catalog)
    import spark.implicits._
    t = t.appendToBranch(Seq((2L, "staged")).toDF("id", "v"), "audit")
    spark.sql("INSERT INTO pc1.cp VALUES (3,'mainline')")
    val staged = GraftTable.load("cp", catalog).metadata.refs("audit").snapshotId

    val out = spark.sql(
      s"CALL pc1.system.cherrypick_snapshot('cp', ${staged}L)").collect().head
    assert(out.getLong(0) === staged)
    assert(spark.sql("SELECT id FROM pc1.cp ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))

    // set_current_snapshot moves the head anywhere in history — back to
    // the pre-cherrypick snapshot, then forward again
    val prev = out.getLong(1)
    val before = GraftTable.load("cp", catalog).metadata
      .snapshotById(prev).get.parentSnapshotId.get
    spark.sql(s"CALL pc1.system.set_current_snapshot('cp', ${before}L)")
    assert(spark.sql("SELECT count(*) FROM pc1.cp").collect().head.getLong(0) === 2L)
    spark.sql(s"CALL pc1.system.set_current_snapshot('cp', ${prev}L)")
    assert(spark.sql("SELECT count(*) FROM pc1.cp").collect().head.getLong(0) === 3L)
  }

  test("ancestors_of returns the history chain, head first") {
    registerCatalog("pc2")
    spark.sql("CREATE TABLE pc2.anc (id BIGINT)")
    spark.sql("INSERT INTO pc2.anc VALUES (1)")
    spark.sql("INSERT INTO pc2.anc VALUES (2)")
    spark.sql("INSERT INTO pc2.anc VALUES (3)")
    val got = spark.sql("CALL pc2.system.ancestors_of('anc')").collect()
    assert(got.length === 3, "three appends = three ancestors")
    val md = GraftTable.load("anc", catalog).metadata
    assert(got.head.getLong(0) === md.currentSnapshotId.get)
    // timestamps non-increasing walking back
    val ts = got.map(_.getLong(1)).toSeq
    assert(ts === ts.sorted.reverse)
  }

  test("register_table + add_files migration path through SQL") {
    registerCatalog("pc3")
    spark.sql("CREATE TABLE pc3.src (id BIGINT, v STRING)")
    spark.sql("INSERT INTO pc3.src VALUES (1,'a'),(2,'b')")
    val srcMd = catalog.loadTable("src")._1

    // register: adopt src's CURRENT metadata file as a new table name
    val mdFile = s"${srcMd.location}/metadata/v${catalog.currentVersion("src").get}.metadata.json"
    val out = spark.sql(
      s"CALL pc3.system.register_table('src_reg', '$mdFile')").collect().head
    assert(out.getLong(1) === 2L, "total-records from the adopted snapshot")
    assert(spark.sql("SELECT count(*) FROM pc3.src_reg")
      .collect().head.getLong(0) === 2L)

    // add_files: adopt foreign parquet in place
    spark.sql("CREATE TABLE pc3.addf (id BIGINT, v STRING)")
    val dir = s"$wh/foreign-parquet"
    import spark.implicits._
    Seq((10L, "x"), (11L, "y"), (12L, "z")).toDF("id", "v")
      .repartition(2).write.parquet(dir)
    val added = spark.sql(
      s"CALL pc3.system.add_files('addf', '$dir')").collect().head.getInt(0)
    assert(added === 2)
    assert(spark.sql("SELECT id FROM pc3.addf ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(10L, 11L, 12L))
  }

  test("rewrite_position_delete_files reports exact counts under a controlled layout") {
    registerCatalog("pc5")
    spark.sql("CREATE TABLE pc5.pdl (id BIGINT, v STRING)")
    import spark.implicits._
    var t = GraftTable.load("pdl", catalog)
    // ONE data file so each delete is partial (true pos-delete rows)
    t = t.append((1L to 20L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1))
    t = t.deleteWhere(graft.expr.Predicate.eqTo("id", 2L), spark)
    t = t.deleteWhere(graft.expr.Predicate.eqTo("id", 4L), spark)
    val out = spark.sql(
      "CALL pc5.system.rewrite_position_delete_files('pdl')").collect().head
    assert(out.getInt(0) === 2, "two source delete files")
    assert(out.getInt(1) === 1, "one compacted delete file")
    assert(spark.sql("SELECT count(*) FROM pc5.pdl")
      .collect().head.getLong(0) === 18L)
  }

  test("compute_table_stats writes and registers an NDV statistics file") {
    registerCatalog("pc4")
    spark.sql("CREATE TABLE pc4.st (id BIGINT, v STRING)")
    spark.sql("INSERT INTO pc4.st VALUES (1,'a'),(2,'b'),(3,'a')")
    val path = spark.sql("CALL pc4.system.compute_table_stats('st', 'id,v')")
      .collect().head.getString(0)
    assert(path.endsWith(".puffin"))
    val t = GraftTable.load("st", catalog)
    val stats = t.metadata.statistics
    assert(stats.nonEmpty && stats.last.statisticsPath === path)
    val sketches = graft.puffin.Sketches.readCurrentStats(t)
    assert(sketches.find(_.column == "id").exists(_.estimate === 3L))
    assert(sketches.find(_.column == "v").exists(_.estimate === 2L))
  }
}

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

  test("rollback_to_timestamp resolves through the snapshot log") {
    registerCatalog("pc5")
    spark.sql("CREATE TABLE pc5.rbt (id BIGINT)")
    spark.sql("INSERT INTO pc5.rbt VALUES (1)")
    val afterFirst = System.currentTimeMillis()
    Thread.sleep(10)
    spark.sql("INSERT INTO pc5.rbt VALUES (2)")
    assert(spark.sql("SELECT count(*) FROM pc5.rbt").collect().head.getLong(0) === 2)

    val out = spark.sql(
      s"CALL pc5.system.rollback_to_timestamp('rbt', ${afterFirst}L)").collect().head
    assert(out.getLong(0) !== out.getLong(1))
    assert(spark.sql("SELECT count(*) FROM pc5.rbt").collect().head.getLong(0) === 1)
  }

  test("publish_changes lands a staged WAP commit by audit id") {
    registerCatalog("pc6")
    spark.sql("CREATE TABLE pc6.wap (id BIGINT, v STRING)")
    spark.sql("INSERT INTO pc6.wap VALUES (1,'base')")
    spark.sql("CALL pc6.system.create_branch('wap', 'audit')")
    import spark.implicits._
    val t = GraftTable.load("wap", catalog)
    graft.table.AppendWriter.append(t,
      Seq((2L, "staged")).toDF("id", "v"),
      extraSummary = Map("wap.id" -> "job-42"), branch = Some("audit"))
    // main advances → fast-forward impossible; publish cherry-picks
    spark.sql("INSERT INTO pc6.wap VALUES (3,'mainline')")

    val out = spark.sql(
      "CALL pc6.system.publish_changes('wap', 'job-42')").collect().head
    assert(out.getLong(0) > 0)
    assert(spark.sql("SELECT id FROM pc6.wap ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    intercept[Exception](
      spark.sql("CALL pc6.system.publish_changes('wap', 'nope')").collect())
  }

  test("drop_branch / drop_tag validate ref type and protect main") {
    registerCatalog("pc7")
    spark.sql("CREATE TABLE pc7.refs (id BIGINT)")
    spark.sql("INSERT INTO pc7.refs VALUES (1)")
    spark.sql("CALL pc7.system.create_branch('refs', 'b1')")
    spark.sql("CALL pc7.system.create_tag('refs', 't1')")

    intercept[Exception](
      spark.sql("CALL pc7.system.drop_branch('refs', 't1')").collect())
    intercept[Exception](
      spark.sql("CALL pc7.system.drop_branch('refs', 'main')").collect())
    spark.sql("CALL pc7.system.drop_branch('refs', 'b1')").collect()
    spark.sql("CALL pc7.system.drop_tag('refs', 't1')").collect()
    // main may or may not be materialized as a ref; b1/t1 must be gone
    assert((GraftTable.load("refs", catalog).metadata.refs.keySet -- Set("main"))
      === Set.empty)
  }

  test("snapshot: zero-copy table clone, GC fenced, divergent writes") {
    registerCatalog("pc8")
    spark.sql("CREATE TABLE pc8.snapsrc (id BIGINT, v STRING)")
    spark.sql("INSERT INTO pc8.snapsrc VALUES (1,'a'), (2,'b')")

    val out = spark.sql("CALL pc8.system.snapshot('snapsrc', 'clone')").collect().head
    assert(out.getString(0) === "clone")
    assert(spark.sql("SELECT id FROM pc8.clone ORDER BY id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))

    // same physical data files — nothing was copied
    val srcT = GraftTable.load("snapsrc", catalog)
    val cloneT = GraftTable.load("clone", catalog)
    assert(cloneT.newScan().planFiles().map(_.file.filePath).toSet
      === srcT.newScan().planFiles().map(_.file.filePath).toSet)
    assert(cloneT.metadata.properties("gc.enabled") === "false")

    // divergence: writes to the clone don't touch the source
    spark.sql("INSERT INTO pc8.clone VALUES (3,'c')")
    assert(spark.sql("SELECT count(*) FROM pc8.clone").collect().head.getLong(0) === 3)
    assert(spark.sql("SELECT count(*) FROM pc8.snapsrc").collect().head.getLong(0) === 2)

    // GC fences: purge / orphan-GC / expire refuse on the clone
    intercept[Exception](catalog.purgeTable("clone"))
    intercept[Exception](
      cloneT.refresh().removeOrphanFiles(System.currentTimeMillis(), spark))
    intercept[Exception](cloneT.refresh()
      .expireSnapshots(System.currentTimeMillis() + 1000))
    // source still fully readable after all refusals
    assert(spark.sql("SELECT count(*) FROM pc8.snapsrc").collect().head.getLong(0) === 2)
  }

  test("rewrite_small_files: binpack through SQL, counts reported, no-op second call") {
    registerCatalog("pc9")
    spark.sql("CREATE TABLE pc9.bp (id BIGINT, v STRING)")
    spark.sql("INSERT INTO pc9.bp VALUES (1,'a')")
    spark.sql("INSERT INTO pc9.bp VALUES (2,'b')")
    spark.sql("INSERT INTO pc9.bp VALUES (3,'c')")
    val before = GraftTable.load("bp", catalog).newScan().planFiles().size
    assert(before >= 3)
    val row = spark.sql(
      "CALL pc9.system.rewrite_small_files('bp', 536870912L, 2)")
      .collect().head
    assert(row.getInt(0) >= 3, "all small files rewritten")
    assert(row.getInt(1) < row.getInt(0), "merged into fewer files")
    val t = GraftTable.load("bp", catalog)
    assert(t.newScan().planFiles().size < before)
    assert(t.newScan().toDF(spark).orderBy("id")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    // idempotent: nothing fragmented remains
    val again = spark.sql(
      "CALL pc9.system.rewrite_small_files('bp', 536870912L, 2)")
      .collect().head
    assert(again.getInt(0) === 0 && again.getInt(1) === 0)
  }

  test("rewrite_small_files: size args optional; default honors the table property") {
    // VERDICT r14 item 4 (reference table_properties.rs:351): with no
    // explicit target the pass compacts to the table's OWN
    // write.target-file-size-bytes — here tuned so the two files are a
    // non-reducible group (each < 0.75T, sum > T) and the default call
    // must no-op where a hardcoded 512 MB would have merged them.
    registerCatalog("pc10")
    spark.sql("CREATE TABLE pc10.bpd (id BIGINT, v STRING)")
    spark.sql("INSERT INTO pc10.bpd VALUES (1,'a')")
    spark.sql("INSERT INTO pc10.bpd VALUES (2,'b')")
    var t = GraftTable.load("bpd", catalog)
    val sizes = t.newScan().planFiles()
      .groupBy(_.file.filePath).values.map(_.head.file.fileSizeInBytes).toSeq
    assert(sizes.size === 2)
    val tProp = ((sizes.sum * 9) / 10).max(sizes.max * 4 / 3 + 2)
    assert(sizes.max < (tProp * 0.75).toLong && sizes.sum > tProp)
    t.updateProperties(Map("write.target-file-size-bytes" -> tProp.toString))
    val row = spark.sql("CALL pc10.system.rewrite_small_files('bpd')")
      .collect().head
    assert(row.getInt(0) === 0 && row.getInt(1) === 0,
      s"property-tuned target must no-op, rewrote ${row.getInt(0)}")
    // explicit positive target still overrides the property
    val forced = spark.sql(
      s"CALL pc10.system.rewrite_small_files('bpd', ${sizes.sum * 10}L)")
      .collect().head
    assert(forced.getInt(0) === 2 && forced.getInt(1) === 1)
    assert(GraftTable.load("bpd", catalog).newScan().toDF(spark)
      .orderBy("id").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }
}

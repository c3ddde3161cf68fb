package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.io.FileIO
import graft.spec.{IcebergSchema, PartitionSpec, Transform}
import graft.spec.IcebergType._
import graft.spec.NestedField
import graft.table.GraftTable

/** SQL row-level operations through the catalog plugin: DELETE FROM
  * (metadata path AND CoW rewrite path), UPDATE, MERGE INTO — plus the
  * native DSv2 batch write (INSERT INTO / INSERT OVERWRITE without the
  * V1 fallback) they are built on. */
class SqlRowLevelSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("graft-sql-rowlevel-spec")
    .getOrCreate()

  private lazy val wh = Files.createTempDirectory("graft-rowlevel").toString
  private lazy val catalog = new HadoopCatalog(wh, new FileIO(new Configuration()))

  override def afterAll(): Unit = spark.stop()

  private def registerCatalog(name: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.GraftCatalogPlugin")
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  private def rows(sql: String): Seq[String] =
    spark.sql(sql).collect().map(_.toString).sorted.toSeq

  test("native INSERT INTO writes stats-bearing files; DELETE metadata path") {
    registerCatalog("rl1")
    spark.sql("CREATE TABLE rl1.t1 (id BIGINT, category STRING, amount DOUBLE)")
    spark.sql("INSERT INTO rl1.t1 VALUES (1,'a',10.0),(2,'a',20.0),(3,'b',30.0),(4,'b',40.0),(5,'c',50.0)")

    assert(rows("SELECT * FROM rl1.t1").size == 5)

    // native write harvested real footer stats: bounds present → pruning works
    val t = GraftTable.load("t1", catalog)
    val files = t.newScan().planFiles()
    assert(files.nonEmpty)
    assert(files.forall(_.file.lowerBounds.nonEmpty))
    assert(files.forall(_.file.recordCount > 0))
    // no V1 fallback anywhere: reads plan as BatchScan
    assert(spark.sql("SELECT * FROM rl1.t1").queryExecution.executedPlan.toString
      .contains("BatchScan"))

    // translatable DELETE takes the SupportsDelete metadata path: the
    // commit operation is "delete" (MoR), never an overwrite rewrite
    spark.sql("DELETE FROM rl1.t1 WHERE category = 'b'")
    assert(rows("SELECT id FROM rl1.t1") == Seq("[1]", "[2]", "[5]"))
    val ops = GraftTable.load("t1", catalog).metadata.snapshots.map(_.operation)
    assert(ops.last == "delete", s"expected metadata delete, got $ops")
  }

  test("non-translatable DELETE rewrites via group-based CoW") {
    registerCatalog("rl2")
    spark.sql("CREATE TABLE rl2.t2 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rl2.t2 VALUES (1,'x'),(2,'y'),(3,'z'),(4,'w'),(5,'q')")

    // id % 2 = 0 does not translate to the metadata AST → ReplaceData path
    spark.sql("DELETE FROM rl2.t2 WHERE id % 2 = 0")
    assert(rows("SELECT id FROM rl2.t2") == Seq("[1]", "[3]", "[5]"))
    val t = GraftTable.load("t2", catalog)
    assert(t.metadata.snapshots.last.operation == "overwrite")
    // rewrite preserved rows exactly once (no duplicates from re-reads)
    assert(spark.sql("SELECT count(*) c FROM rl2.t2").collect()(0).getLong(0) == 3L)
  }

  test("UPDATE rewrites only the pruned files") {
    registerCatalog("rl3")
    // partitioned by identity(part): condition prunes to one partition
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "id", LongT, required = false),
      NestedField(2, "part", StringT, required = false),
      NestedField(3, "amount", DoubleT, required = false)))
    val spec = PartitionSpec(0, Seq(graft.spec.PartitionField(2, 1000, "part", Transform.Identity)))
    GraftTable.create("t3", catalog, schema, spec)
    spark.sql("INSERT INTO rl3.t3 VALUES (1,'p1',10.0),(2,'p1',20.0),(3,'p2',30.0),(4,'p2',40.0)")

    val before = GraftTable.load("t3", catalog).newScan().planFiles()
      .map(_.file.filePath).toSet
    val p2Before = GraftTable.load("t3", catalog).newScan()
      .withFilter(graft.expr.Predicate.eqTo("part", "p2")).planFiles()
      .map(_.file.filePath).toSet

    spark.sql("UPDATE rl3.t3 SET amount = amount + 100.0 WHERE part = 'p1'")

    assert(rows("SELECT id, amount FROM rl3.t3") ==
      Seq("[1,110.0]", "[2,120.0]", "[3,30.0]", "[4,40.0]"))

    // p2's files survived untouched — the CoW scan pruned to p1 only
    val after = GraftTable.load("t3", catalog).newScan().planFiles()
      .map(_.file.filePath).toSet
    assert(p2Before.subsetOf(after), "unmatched partition was rewritten")
    assert((before -- after).forall(!p2Before.contains(_)))
    // and the fanout writer kept the partition tuples right: pruning works
    val p1Files = GraftTable.load("t3", catalog).newScan()
      .withFilter(graft.expr.Predicate.eqTo("part", "p1")).planFiles()
    assert(p1Files.forall(_.file.partition == Seq("p1")))
  }

  test("MERGE INTO: matched update + not matched insert") {
    registerCatalog("rl4")
    spark.sql("CREATE TABLE rl4.t4 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rl4.t4 VALUES (1,'a'),(2,'b'),(3,'c')")
    spark.sql("CREATE TABLE rl4.s4 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rl4.s4 VALUES (2,'B'),(4,'D')")

    spark.sql("""
      MERGE INTO rl4.t4 t USING rl4.s4 s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
    """)
    assert(rows("SELECT id, v FROM rl4.t4") ==
      Seq("[1,a]", "[2,B]", "[3,c]", "[4,D]"))

    // MERGE with a delete clause
    spark.sql("""
      MERGE INTO rl4.t4 t USING rl4.s4 s ON t.id = s.id
      WHEN MATCHED AND s.id = 2 THEN DELETE
    """)
    assert(rows("SELECT id FROM rl4.t4") == Seq("[1]", "[3]", "[4]"))
  }

  test("row-level ops compose with MoR deletes already on the table") {
    registerCatalog("rl5")
    spark.sql("CREATE TABLE rl5.t5 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rl5.t5 VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d')")
    // MoR position delete first (metadata path)
    spark.sql("DELETE FROM rl5.t5 WHERE id = 2")
    // then a CoW update over files carrying position deletes: the rewrite
    // must NOT resurrect id=2
    spark.sql("UPDATE rl5.t5 SET v = upper(v) WHERE id >= 1")
    assert(rows("SELECT id, v FROM rl5.t5") == Seq("[1,A]", "[3,C]", "[4,D]"))
  }

  test("row-level ops on tables with equality deletes (native reader MoR)") {
    import spark.implicits._
    registerCatalog("rl8")
    spark.sql("CREATE TABLE rl8.teq (id BIGINT, name STRING, v DOUBLE)")
    spark.sql("INSERT INTO rl8.teq VALUES (1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    // stack an equality delete via the table API (same warehouse)
    var t = GraftTable.load("teq", catalog)
    t = t.equalityDelete(Seq("b").toDF("name"), Seq("name"))
    assert(rows("SELECT id FROM rl8.teq") == Seq("[1]", "[3]"))
    // CoW UPDATE over the eq-deleted file: the rewrite must NOT resurrect
    // the deleted "b" row
    spark.sql("UPDATE rl8.teq SET v = v * 10 WHERE id >= 1")
    assert(rows("SELECT id, v FROM rl8.teq") == Seq("[1,10.0]", "[3,30.0]"))
  }

  test("MERGE runtime group filter rewrites only files with matches") {
    registerCatalog("rl7")
    spark.sql("CREATE TABLE rl7.t7 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rl7.t7 VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT INTO rl7.t7 VALUES (100,'x'),(200,'y')")
    spark.sql("CREATE TABLE rl7.s7 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rl7.s7 VALUES (1,'A2')")

    val before = GraftTable.load("t7", catalog).newScan().planFiles()
      .map(_.file.filePath).toSet
    assert(before.size >= 2)

    spark.sql("""MERGE INTO rl7.t7 t USING rl7.s7 s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v""")

    assert(rows("SELECT id, v FROM rl7.t7") ==
      Seq("[1,A2]", "[100,x]", "[2,b]", "[200,y]"))
    val after = GraftTable.load("t7", catalog).newScan().planFiles()
      .map(_.file.filePath).toSet
    // the second insert's files hold no matching id — the runtime group
    // filter (SupportsRuntimeV2Filtering on _file) must keep them out of
    // the rewrite entirely
    assert((before intersect after).nonEmpty,
      s"runtime group filter did not prune: before=$before after=$after")
  }

  test("CREATE TABLE PARTITIONED BY: bucket + days spec, pruning works") {
    registerCatalog("rl8")
    spark.sql("""CREATE TABLE rl8.t8 (id BIGINT, cat STRING, ts TIMESTAMP)
      PARTITIONED BY (bucket(4, id), days(ts))""")
    val t = GraftTable.load("t8", catalog)
    assert(t.spec.fields.map(f => (f.name, f.transform.name)) ==
      Seq(("id_bucket", "bucket[4]"), ("ts_day", "day")))

    spark.sql("""INSERT INTO rl8.t8 VALUES
      (1, 'a', TIMESTAMP '2024-01-01 10:00:00'),
      (2, 'b', TIMESTAMP '2024-01-01 11:00:00'),
      (3, 'c', TIMESTAMP '2024-06-15 10:00:00')""")
    assert(rows("SELECT id FROM rl8.t8") == Seq("[1]", "[2]", "[3]"))

    // the fanout writer recorded real partition tuples: day pruning hits
    val live = GraftTable.load("t8", catalog)
    val juneOnly = live.newScan()
      .withFilter(graft.expr.Predicate.gt("ts",
        java.time.Instant.parse("2024-06-01T00:00:00Z").toEpochMilli * 1000L))
      .planFiles()
    assert(juneOnly.nonEmpty)
    assert(juneOnly.size < live.newScan().planFiles().size,
      "day-transform pruning did not narrow the scan")
    // bucket pruning narrows too (the V2 bucket function path)
    val one = live.newScan()
      .withFilter(graft.expr.Predicate.eqTo("id", 1L)).planFiles()
    assert(one.size < live.newScan().planFiles().size)
    assert(rows("SELECT id FROM rl8.t8 WHERE ts > TIMESTAMP '2024-06-01 00:00:00'")
      == Seq("[3]"))
  }

  test("merge-on-read DML: position deltas, zero data-file rewrites") {
    registerCatalog("rl9")
    spark.sql("""CREATE TABLE rl9.t9 (id BIGINT, v STRING)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read',
        'write.update.mode'='merge-on-read',
        'write.merge.mode'='merge-on-read')""")
    spark.sql("INSERT INTO rl9.t9 VALUES (1,'a'),(2,'b'),(3,'c'),(4,'d'),(5,'e')")
    val before = GraftTable.load("t9", catalog).newScan().planFiles()
      .map(_.file.filePath).toSet

    // non-translatable DELETE → the delta path (translatable ones take
    // the metadata path, which is already MoR)
    spark.sql("DELETE FROM rl9.t9 WHERE id % 2 = 0")
    assert(rows("SELECT id FROM rl9.t9") == Seq("[1]", "[3]", "[5]"))
    var t = GraftTable.load("t9", catalog)
    assert(t.metadata.snapshots.last.operation == "delete")
    // no data file was rewritten or dropped
    assert(before.subsetOf(t.newScan().planFiles().map(_.file.filePath).toSet))
    assert(t.newScan().planDeletes().nonEmpty)

    spark.sql("UPDATE rl9.t9 SET v = upper(v) WHERE id >= 3")
    assert(rows("SELECT id, v FROM rl9.t9") == Seq("[1,a]", "[3,C]", "[5,E]"))
    t = GraftTable.load("t9", catalog)
    assert(t.metadata.snapshots.last.operation == "overwrite")
    assert(before.subsetOf(t.newScan().planFiles().map(_.file.filePath).toSet),
      "update must not rewrite data files in merge-on-read mode")

    spark.sql("CREATE TABLE rl9.s9 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rl9.s9 VALUES (5,'five'), (9,'nine')")
    spark.sql("""MERGE INTO rl9.t9 t USING rl9.s9 s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    assert(rows("SELECT id, v FROM rl9.t9") ==
      Seq("[1,a]", "[3,C]", "[5,five]", "[9,nine]"))

    // compaction folds the accumulated deltas back into clean files
    t = GraftTable.load("t9", catalog).rewriteDataFiles(spark)
    assert(t.newScan().planDeletes().isEmpty)
    assert(rows("SELECT id, v FROM rl9.t9") ==
      Seq("[1,a]", "[3,C]", "[5,five]", "[9,nine]"))
  }

  test("INSERT OVERWRITE through the native truncate write") {
    registerCatalog("rl6")
    spark.sql("CREATE TABLE rl6.t6 (id BIGINT, v STRING)")
    spark.sql("INSERT INTO rl6.t6 VALUES (1,'a'),(2,'b')")
    spark.sql("INSERT OVERWRITE rl6.t6 VALUES (9,'z')")
    assert(rows("SELECT id, v FROM rl6.t6") == Seq("[9,z]"))
    val t = GraftTable.load("t6", catalog)
    assert(t.metadata.snapshots.last.operation == "overwrite")
    // old files tombstoned, exactly the new file alive
    assert(t.newScan().planFiles().size == t.newScan().planFiles()
      .map(_.file.filePath).distinct.size)
    assert(spark.sql("SELECT count(*) c FROM rl6.t6").collect()(0).getLong(0) == 1L)
  }
}

package graft.catalog

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._
import graft.table.GraftTable

/** SQL/JDBC catalog (Derby embedded): CRUD, CAS conflict semantics, and
  * concurrent optimistic commits — the conflict_commit_test.rs discipline
  * against the catalog.rs:1008 conditional-UPDATE swap. */
class JdbcCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("jdbc-catalog-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshCatalog(): JdbcCatalog = {
    val dir = java.nio.file.Files.createTempDirectory("graft-jdbc-").toString
    new JdbcCatalog(s"jdbc:derby:$dir/db;create=true", s"$dir/wh",
      FileIO.fromSpark(spark))
  }

  private val schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "v", DoubleT, required = false)))

  test("create/load/list/drop + duplicate create refused") {
    val cat = freshCatalog()
    GraftTable.create("t1", cat, schema)
    assert(cat.tableExists("t1"))
    assert(cat.listTables() === Seq("t1"))
    val (md, v) = cat.loadTable("t1")
    assert(v === 1)
    assert(md.currentSchema.fields.map(_.name) === Seq("id", "v"))
    intercept[IllegalArgumentException] { GraftTable.create("t1", cat, schema) }
    assert(cat.dropTable("t1"))
    assert(!cat.tableExists("t1"))
    assert(!cat.dropTable("t1"))
  }

  test("stale-base commit conflicts via the conditional UPDATE") {
    val cat = freshCatalog()
    GraftTable.create("t2", cat, schema)
    val (md, v) = cat.loadTable("t2")
    cat.commitTable("t2", v, md.copy(lastUpdatedMs = 1L))
    // the same base version again: 0 rows updated → conflict
    intercept[CommitConflict] {
      cat.commitTable("t2", v, md.copy(lastUpdatedMs = 2L))
    }
    assert(cat.loadTable("t2")._2 === v + 1)
  }

  test("concurrent appends all land through optimistic retry") {
    import spark.implicits._
    val cat = freshCatalog()
    GraftTable.create("t3", cat, schema)

    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val writers = (0 until 4).map { w =>
      Future {
        val rows = (0 until 25).map(i => (w * 100L + i, i * 1.0))
        GraftTable.load("t3", cat).append(rows.toDF("id", "v"))
      }
    }
    Await.result(Future.sequence(writers), 120.seconds)

    val t = GraftTable.load("t3", cat)
    assert(t.metadata.snapshots.size === 4)
    assert(t.metadata.lastSequenceNumber === 4)
    val df = t.newScan().toDF(spark)
    assert(df.count() === 100)
    assert(df.select("id").distinct().count() === 100)
  }

  test("full table lifecycle: append, delete, scan parity with Hadoop catalog") {
    import spark.implicits._
    val cat = freshCatalog()
    var t = GraftTable.create("t4", cat, schema)
    t = t.append((1L to 50L).map(i => (i, i * 0.5)).toDF("id", "v"))
    t = t.deleteWhere(graft.expr.Predicate.gt("v", 20.0), spark)
    assert(t.newScan().toDF(spark).count() === 40)
    // time travel across the JDBC pointer swaps
    val first = t.metadata.snapshots.head.snapshotId
    assert(t.newScan().useSnapshot(first).toDF(spark).count() === 50)
  }
}

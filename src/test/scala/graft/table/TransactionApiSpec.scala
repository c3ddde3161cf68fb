package graft.table

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.{Catalog, HadoopCatalog}
import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._

/** Multi-action Transaction (reference transaction/mod.rs): several
  * actions, ONE catalog swap; conflict re-apply; all-or-nothing abort. */
class TransactionApiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("transaction-api-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "v", DoubleT, required = false)))

  private def freshHadoop(): Catalog = new HadoopCatalog(
    java.nio.file.Files.createTempDirectory("graft-txapi-").toString,
    FileIO.fromSpark(spark))

  private def df(from: Long, to: Long) = {
    import spark.implicits._
    (from to to).map(i => (i, i * 0.5)).toDF("id", "v")
  }

  test("multi-action transaction lands in exactly ONE metadata version") {
    val catalog = freshHadoop()
    val t = GraftTable.create("tx1", catalog, schema)
    val versionBefore = catalog.loadTable("tx1")._2

    val committed = t.newTransaction
      .updateProperties(Map("owner" -> "tx-test"))
      .updateSchema(_.addColumn("tag", StringT))
      .replaceSortOrder(Seq(SortField(1, Transform.Identity,
        ascending = true, nullsFirst = true)))
      .fastAppend(df(1, 50))
      .commit()

    val (md, versionAfter) = catalog.loadTable("tx1")
    assert(versionAfter === versionBefore + 1,
      "four actions must produce exactly one new metadata version")
    assert(md.properties("owner") === "tx-test")
    assert(md.currentSchema.findField("tag").isDefined)
    assert(md.sortOrders.exists(_.orderId == md.defaultSortOrderId)
      && md.defaultSortOrderId > 0)
    assert(md.snapshots.size === 1)
    assert(committed.newScan().toDF(spark).count() === 50)
  }

  test("two fastAppends in one transaction: two snapshots, one version") {
    val catalog = freshHadoop()
    val t = GraftTable.create("tx2", catalog, schema)
    val versionBefore = catalog.loadTable("tx2")._2

    val committed = t.newTransaction
      .fastAppend(df(1, 10))
      .fastAppend(df(11, 30))
      .commit()

    val (md, versionAfter) = catalog.loadTable("tx2")
    assert(versionAfter === versionBefore + 1)
    assert(md.snapshots.size === 2)
    // sequence numbers are consecutive and the second snapshot parents the first
    val bySeq = md.snapshots.sortBy(_.sequenceNumber)
    assert(bySeq.map(_.sequenceNumber) === Seq(1L, 2L))
    assert(bySeq(1).parentSnapshotId === Some(bySeq(0).snapshotId))
    assert(committed.newScan().toDF(spark).count() === 30)
  }

  test("a failing action aborts the WHOLE transaction") {
    val catalog = freshHadoop()
    val t = GraftTable.create("tx3", catalog, schema)
    val versionBefore = catalog.loadTable("tx3")._2

    val tx = t.newTransaction
      .updateProperties(Map("should" -> "not-land"))
      .updateSchema(_.dropColumn("no_such_column"))
    intercept[IllegalArgumentException](tx.commit())

    val (md, versionAfter) = catalog.loadTable("tx3")
    assert(versionAfter === versionBefore, "aborted tx must not bump the version")
    assert(!md.properties.contains("should"))
  }

  test("empty transaction is a no-op") {
    val catalog = freshHadoop()
    val t = GraftTable.create("tx4", catalog, schema)
    val versionBefore = catalog.loadTable("tx4")._2
    t.newTransaction.commit()
    assert(catalog.loadTable("tx4")._2 === versionBefore)
  }

  test("transaction re-applies cleanly over a concurrent commit") {
    val catalog = freshHadoop()
    val t = GraftTable.create("tx5", catalog, schema)

    // stage the transaction off the ORIGINAL handle...
    val tx = t.newTransaction
      .updateProperties(Map("from" -> "tx"))
      .fastAppend(df(1, 20))

    // ...then land a concurrent change the tx never saw
    t.updateProperties(Map("concurrent" -> "yes"))

    tx.commit()
    val (md, _) = catalog.loadTable("tx5")
    assert(md.properties("from") === "tx")
    assert(md.properties("concurrent") === "yes",
      "commit must re-apply against the refreshed base, not clobber it")
    assert(md.snapshots.size === 1)
  }

  test("racing transactions both land exactly once") {
    val catalog = freshHadoop()
    GraftTable.create("tx6", catalog, schema)

    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val fs = (1 to 3).map { i =>
      Future {
        GraftTable.load("tx6", catalog).newTransaction
          .updateProperties(Map(s"writer-$i" -> "done"))
          .fastAppend(df(i * 100L, i * 100L + 9))
          .commit()
      }
    }
    Await.result(Future.sequence(fs), 120.seconds)

    val (md, _) = catalog.loadTable("tx6")
    (1 to 3).foreach(i => assert(md.properties(s"writer-$i") === "done"))
    assert(md.snapshots.size === 3)
    assert(GraftTable.load("tx6", catalog).newScan().toDF(spark).count() === 30)
  }

  test("expireSnapshots composes: trim + property in one version, files GC'd") {
    val catalog = freshHadoop()
    var t = GraftTable.create("tx7", catalog, schema)
    t = t.append(df(1, 10))
    Thread.sleep(5)
    t = t.append(df(11, 20))
    Thread.sleep(5)
    t = t.append(df(21, 30))
    val expiredLists = t.metadata.snapshots.sortBy(_.timestampMs)
      .dropRight(1).map(_.manifestList)
    val versionBefore = catalog.loadTable("tx7")._2

    t.newTransaction
      .expireSnapshots(olderThanMs = System.currentTimeMillis() + 1000,
        retainLast = 1)
      .updateProperties(Map("expired" -> "yes"))
      .commit()

    val (md, versionAfter) = catalog.loadTable("tx7")
    assert(versionAfter === versionBefore + 1)
    assert(md.snapshots.size === 1)
    assert(md.properties("expired") === "yes")
    expiredLists.foreach(p =>
      assert(!t.io.exists(p), s"expired manifest list must be deleted: $p"))
    assert(GraftTable.load("tx7", catalog).newScan().toDF(spark).count() === 30)
  }
}

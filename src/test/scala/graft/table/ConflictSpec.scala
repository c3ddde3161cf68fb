package graft.table

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.catalog.HadoopCatalog
import graft.expr.{BinaryPred, Gt, LtEq}
import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._

/** Commit-time conflict validation (serializable/snapshot isolation):
  * operations whose scan basis was invalidated by a concurrent commit
  * must ABORT, not silently resurrect or duplicate rows. Concurrency is
  * simulated with two table handles — one scans, the other commits in
  * between. */
class ConflictSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("conflict-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshCatalog() = new HadoopCatalog(
    java.nio.file.Files.createTempDirectory("graft-conflict-").toString,
    FileIO.fromSpark(spark))

  private val schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "v", DoubleT, required = false)))

  private def df(r: Range) = {
    import spark.implicits._
    r.map(i => (i.toLong, i * 1.0)).toDF("id", "v")
  }

  test("CoW delete from a stale handle aborts after concurrent compaction") {
    val catalog = freshCatalog()
    var t = GraftTable.create("c1", catalog, schema)
    t = t.append(df(1 to 50)); t = t.append(df(51 to 100))

    val stale = GraftTable.load("c1", catalog) // scans at this snapshot
    Maintenance.rewriteDataFiles(GraftTable.load("c1", catalog), spark) // concurrent

    val err = intercept[Commits.ValidationException] {
      RowOps.overwriteWhere(stale, BinaryPred(Gt, "id", 90L), null, spark)
    }
    assert(err.getMessage.contains("removed/rewrote"))
    // and the table is intact: nothing half-committed
    assert(GraftTable.load("c1", catalog).newScan().toDF(spark).count() === 100)
  }

  test("MoR position delete from a stale handle aborts after concurrent compaction") {
    val catalog = freshCatalog()
    var t = GraftTable.create("c2", catalog, schema)
    t = t.append(df(1 to 50)); t = t.append(df(51 to 100))
    val stale = GraftTable.load("c2", catalog)
    Maintenance.rewriteDataFiles(GraftTable.load("c2", catalog), spark)
    intercept[Commits.ValidationException] {
      stale.deleteWhere(BinaryPred(LtEq, "id", 10L), spark)
    }
    assert(GraftTable.load("c2", catalog).newScan().toDF(spark).count() === 100)
  }

  test("serializable CoW delete aborts on concurrent matching append; snapshot isolation proceeds") {
    val catalog = freshCatalog()
    var t = GraftTable.create("c3", catalog, schema)
    t = t.append(df(1 to 100))

    val stale = GraftTable.load("c3", catalog)
    GraftTable.load("c3", catalog).append(df(101 to 110)) // concurrent append

    intercept[Commits.ValidationException] {
      RowOps.overwriteWhere(stale, BinaryPred(Gt, "id", 90L), null, spark)
    }

    // snapshot isolation: the same race is allowed — the delete applies
    // to the rows it scanned (1..110), the concurrent append's stay
    GraftTable.load("c3", catalog)
      .updateProperties(Map("write.delete.isolation-level" -> "snapshot"))
    val stale2 = GraftTable.load("c3", catalog) // sees 1..110
    GraftTable.load("c3", catalog).append(df(111 to 120))
    RowOps.overwriteWhere(stale2, BinaryPred(Gt, "id", 95L), null, spark)
    // 1..95 survive the delete, 111..120 survive the race
    assert(GraftTable.load("c3", catalog).newScan().toDF(spark).count() === 105)
  }

  test("CoW rewrite aborts when a concurrent MoR delete targets its files") {
    val catalog = freshCatalog()
    var t = GraftTable.create("c6", catalog, schema)
    t = t.append(df(1 to 100))

    // stale handle scans pre-delete rows; a concurrent MoR position
    // delete then removes id<=10. The CoW rewrite adds NO data files and
    // removes none the delete tombstoned — only the Deletes-manifest
    // check can catch it (committing would resurrect ids 1..10).
    val stale = GraftTable.load("c6", catalog)
    GraftTable.load("c6", catalog)
      .deleteWhere(BinaryPred(LtEq, "id", 10L), spark) // concurrent MoR delete
    val err = intercept[Commits.ValidationException] {
      RowOps.updateWhere(stale, BinaryPred(Gt, "id", 0L),
        Map("v" -> (col("v") * 2)), spark)
    }
    assert(err.getMessage.contains("delete files"))
    assert(GraftTable.load("c6", catalog).newScan().toDF(spark).count() === 90)

    // file-PRECISE validation (PosDeleteIndex binding): a concurrent
    // delete whose referenced data file is DISJOINT from the rewritten
    // set does not abort — ids>95 live in the last 25-row file, the
    // rewrite folds only the id<=50 files. The rewrite commits and both
    // effects land exactly: 85 rows minus the 40 still-live ids<=50.
    GraftTable.load("c6", catalog)
      .updateProperties(Map("write.delete.isolation-level" -> "snapshot"))
    val stale2 = GraftTable.load("c6", catalog)
    GraftTable.load("c6", catalog).deleteWhere(BinaryPred(Gt, "id", 95L), spark)
    RowOps.overwriteWhere(stale2, BinaryPred(LtEq, "id", 50L), null, spark)
    assert(GraftTable.load("c6", catalog).newScan().toDF(spark).count() === 45)

    // snapshot isolation does NOT waive the check when the delete DOES
    // bind to a rewritten file: ids>=90 reference the same last file the
    // id>80 rewrite folds — committing would resurrect them
    val stale3 = GraftTable.load("c6", catalog)
    GraftTable.load("c6", catalog)
      .deleteWhere(BinaryPred(Gt, "id", 89L), spark)
    intercept[Commits.ValidationException] {
      RowOps.overwriteWhere(stale3, BinaryPred(Gt, "id", 80L), null, spark)
    }
    assert(GraftTable.load("c6", catalog).newScan().toDF(spark).count() === 39)
  }

  test("mixed concurrent appends + CoW deletes converge exactly (replan on abort)") {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val catalog = freshCatalog()
    GraftTable.create("c5", catalog, schema)
    GraftTable.load("c5", catalog).append(df(1 to 100))

    // writers append disjoint ranges; deleters remove disjoint ranges,
    // replanning from fresh state whenever validation aborts them —
    // the client-side contract the ValidationException is designed for
    def retrying[A](op: => A): A = {
      var out: Option[A] = None
      var attempts = 0
      while (out.isEmpty) {
        attempts += 1
        require(attempts <= 50, "no convergence")
        try out = Some(op)
        catch { case _: Commits.ValidationException => Thread.sleep(10) }
      }
      out.get
    }
    val writers = (1 to 3).map { w =>
      Future {
        val lo = 1000 * w
        GraftTable.load("c5", catalog).append(df(lo to lo + 49))
      }
    }
    val deleters = Seq((1, 20), (41, 60)).map { case (lo, hi) =>
      Future {
        retrying {
          RowOps.overwriteWhere(GraftTable.load("c5", catalog),
            graft.expr.And(
              BinaryPred(graft.expr.GtEq, "id", lo.toLong),
              BinaryPred(LtEq, "id", hi.toLong)),
            null, spark)
        }
      }
    }
    Await.result(Future.sequence(writers ++ deleters), 120.seconds)

    // 100 base + 150 appended − 40 deleted, regardless of interleaving
    val fin = GraftTable.load("c5", catalog)
    assert(fin.newScan().toDF(spark).count() === 210)
    assert(fin.newScan().toDF(spark)
      .filter(col("id") >= 1 && col("id") <= 20).count() === 0)
  }

  test("compaction tolerates a concurrent append but aborts on concurrent deletes") {
    val catalog = freshCatalog()
    var t = GraftTable.create("c4", catalog, schema)
    t = t.append(df(1 to 50)); t = t.append(df(51 to 100))

    // append lands while compaction is underway: both survive
    val compactor = GraftTable.load("c4", catalog)
    GraftTable.load("c4", catalog).append(df(101 to 150))
    val compacted = Maintenance.rewriteDataFiles(compactor, spark)
    assert(GraftTable.load("c4", catalog).newScan().toDF(spark).count() === 150)

    // a delete file committed mid-compaction must abort the rewrite
    val compactor2 = GraftTable.load("c4", catalog)
    GraftTable.load("c4", catalog).deleteWhere(BinaryPred(LtEq, "id", 5L), spark)
    intercept[Commits.ValidationException] {
      Maintenance.rewriteDataFiles(compactor2, spark)
    }
    assert(GraftTable.load("c4", catalog).newScan().toDF(spark).count() === 145)
  }

  test("commit.retry.* table properties tune the retry policy") {
    import graft.catalog.{Catalog => GCatalog, CommitConflict, CommitRetry}
    // wrapper backend: commitTable always conflicts, counting attempts
    class AlwaysConflict(inner: GCatalog) extends GCatalog {
      val attempts = new java.util.concurrent.atomic.AtomicInteger
      override def io = inner.io
      override def createTable(name: String, schema: IcebergSchema,
          spec: PartitionSpec, properties: Map[String, String]) =
        inner.createTable(name, schema, spec, properties)
      override def loadTable(name: String) = inner.loadTable(name)
      override def tableExists(name: String) = inner.tableExists(name)
      override def dropTable(name: String) = inner.dropTable(name)
      override def listTables() = inner.listTables()
      override def commitTable(name: String, baseVersion: Int,
          updated: TableMetadata): Int = {
        attempts.incrementAndGet()
        throw CommitConflict("synthetic")
      }
      override protected def registerParsed(name: String,
          md: TableMetadata): Unit = ()
    }
    val catalog = freshCatalog()
    // num-retries=0: exactly ONE attempt, no sleeps
    GraftTable.create("retry0", catalog, schema,
      properties = Map("commit.retry.num-retries" -> "0",
        "commit.retry.min-wait-ms" -> "1"))
    val c0 = new AlwaysConflict(catalog)
    intercept[CommitConflict] {
      CommitRetry.run(c0, "retry0") { (base, _) =>
        (base.copy(lastUpdatedMs = base.lastUpdatedMs + 1), (_: Int) => ())
      }
    }
    assert(c0.attempts.get() == 1, s"expected 1 attempt, saw ${c0.attempts.get()}")

    // num-retries=2 with ms-scale waits: exactly three attempts
    GraftTable.create("retry2", catalog, schema,
      properties = Map("commit.retry.num-retries" -> "2",
        "commit.retry.min-wait-ms" -> "1", "commit.retry.max-wait-ms" -> "2"))
    val c2 = new AlwaysConflict(catalog)
    intercept[CommitConflict] {
      CommitRetry.run(c2, "retry2") { (base, _) =>
        (base.copy(lastUpdatedMs = base.lastUpdatedMs + 1), (_: Int) => ())
      }
    }
    assert(c2.attempts.get() == 3, s"expected 3 attempts, saw ${c2.attempts.get()}")
  }
}

package graft.io

import org.scalatest.funsuite.AnyFunSuite

/** Regression pin for the ConflictSpec lost-update flake (r15 watch item,
  * root-caused r16): the Hadoop catalog's commit CAS was `exists-check +
  * rename`, but local-FS rename is rename(2) — it silently REPLACES an
  * existing destination. Two committers racing the same version file both
  * passed the pre-check and the second rename erased the first
  * committer's already-acknowledged metadata (the test's "one concurrent
  * deleter's effect lost", 230 vs 210). [[FileIO.renameIfAbsent]] is the
  * atomic primitive commits now use: link(2) fails EEXIST atomically, so
  * a loser can never clobber the winner.
  */
class RenameIfAbsentSpec extends AnyFunSuite {

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft-cas-").toString

  test("renameIfAbsent never replaces an existing destination") {
    val io = FileIO.local()
    val dir = tmpDir()
    io.writeString(s"$dir/a.tmp", "winner")
    io.writeString(s"$dir/b.tmp", "loser")
    assert(io.renameIfAbsent(s"$dir/a.tmp", s"$dir/v2.json"))
    assert(!io.exists(s"$dir/a.tmp"), "winner's source must be consumed")
    // the exact failure shape: destination exists, a second mover races in
    assert(!io.renameIfAbsent(s"$dir/b.tmp", s"$dir/v2.json"))
    assert(io.readString(s"$dir/v2.json") === "winner",
      "a losing CAS must never overwrite the winner's committed bytes")
    // contrast: plain rename(2) semantics DO replace — the behavior the
    // commit path must never sit on (documents why the primitive exists)
    assert(io.rename(s"$dir/b.tmp", s"$dir/v2.json"))
    assert(io.readString(s"$dir/v2.json") === "loser")
  }

  test("catalog commit CAS: concurrent committers from one base never lose an acknowledged commit") {
    import graft.spec.{IcebergSchema, PartitionSpec}
    import org.apache.spark.sql.types._
    val cat = new graft.catalog.HadoopCatalog(tmpDir(), FileIO.local())
    val schema = IcebergSchema.fromSpark(
      StructType(Seq(StructField("id", LongType))))
    cat.createTable("t", schema, PartitionSpec.unpartitioned, Map.empty)
    val (base, v1) = cat.loadTable("t")
    // two committers derived from the SAME base version race: exactly one
    // may win, and the surviving metadata must be the winner's
    val a = base.copy(properties = base.properties + ("who" -> "a"))
    val b = base.copy(properties = base.properties + ("who" -> "b"))
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val results = Await.result(Future.sequence(Seq(a, b).map(md => Future {
      try Right(cat.commitTable("t", v1, md))
      catch { case e: graft.catalog.CommitConflict => Left(e) }
    })), 30.seconds)
    assert(results.count(_.isRight) === 1, s"exactly one winner: $results")
    val winner = Seq(a, b)(results.indexWhere(_.isRight))
    val (cur, _) = cat.loadTable("t")
    assert(cur.properties.get("who") === winner.properties.get("who"),
      "the acknowledged commit's metadata must survive the race")
  }
}

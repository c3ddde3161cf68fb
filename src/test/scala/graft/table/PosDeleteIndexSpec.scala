package graft.table

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.{DataFile, FileContent, ReservedFieldIds}

/** DeleteFileIndex analogue: binding pos-delete files to data files via
  * referenced-data-file, file_path bounds, and the conservative
  * no-metadata fallback. */
class PosDeleteIndexSpec extends AnyFunSuite {

  private def del(path: String, lo: String = null, hi: String = null,
      ref: String = null): DeleteTask = {
    var f = DataFile(
      content = FileContent.PositionDeletes,
      filePath = path,
      fileFormat = "PARQUET",
      partition = Nil,
      recordCount = 1L,
      fileSizeInBytes = 10L)
    if (lo != null) f = f.copy(
      lowerBounds = Map(ReservedFieldIds.FilePath -> lo),
      upperBounds = Map(ReservedFieldIds.FilePath -> hi))
    if (ref != null) f = f.copy(referencedDataFile = Some(ref))
    DeleteTask(f, 1L, 0)
  }

  private val id = (s: String) => s

  test("bounded ranges stab correctly, including overlaps and nesting") {
    val idx = new PosDeleteIndex(Seq(
      del("d1", "data/a", "data/c"),
      del("d2", "data/b", "data/k"),
      del("d3", "data/f", "data/g"),
      del("d4", "data/m", "data/m")), id)
    // d4 has lo == hi so the writer would have set referencedDataFile;
    // built directly here, it still resolves through the ranged path
    assert(idx.candidatesFor("data/b").map(_.file.filePath).toSet === Set("d1", "d2"))
    assert(idx.candidatesFor("data/f").map(_.file.filePath).toSet === Set("d2", "d3"))
    assert(idx.candidatesFor("data/l").isEmpty)
    assert(idx.candidatesFor("data/m").map(_.file.filePath) === Seq("d4"))
    assert(idx.candidatesFor("data/z").isEmpty)
    assert(idx.candidatesFor("data/0").isEmpty)
  }

  test("referenced-data-file binds exactly; metadata-free files bind everywhere") {
    val idx = new PosDeleteIndex(Seq(
      del("dref", ref = "data/x"),
      del("dold")), id)
    assert(idx.candidatesFor("data/x").map(_.file.filePath).toSet === Set("dref", "dold"))
    assert(idx.candidatesFor("data/y").map(_.file.filePath) === Seq("dold"),
      "a delete file with no bounds and no reference must apply to every file")
  }

  test("qualify is applied to referenced paths") {
    val idx = new PosDeleteIndex(Seq(del("d", ref = "/raw/p")),
      p => if (p.startsWith("file:")) p else s"file:$p")
    assert(idx.candidatesFor("file:/raw/p").map(_.file.filePath) === Seq("d"))
    assert(idx.candidatesFor("/raw/p").isEmpty)
  }
}

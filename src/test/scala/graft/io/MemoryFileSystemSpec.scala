package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Direct contract tests for the memory:// FileSystem — the shapes the
  * engine depends on (CAS rename, root listing, recursive delete,
  * positioned reads) without a Spark session. */
class MemoryFileSystemSpec extends AnyFunSuite {

  private def fs(uri: String) = {
    val conf = new Configuration()
    conf.set("fs.memory.impl", classOf[MemoryFileSystem].getName)
    new Path(uri).getFileSystem(conf)
  }

  test("root listing and non-recursive delete of a non-empty root") {
    MemoryFileSystem.clear()
    val f = fs("memory://rootspec/")
    val io = new FileIO(f.getConf)
    io.writeBytes("memory://rootspec/a/one.bin", Array[Byte](1, 2, 3))
    io.writeBytes("memory://rootspec/b/two.bin", Array[Byte](4))
    // root lists its children (the naive k+"/" prefix probed "//")
    val names = f.listStatus(new Path("memory://rootspec/"))
      .map(_.getPath.getName).sorted
    assert(names.toSeq == Seq("a", "b"))
    // non-recursive delete of a non-empty root REFUSES
    intercept[java.io.IOException] {
      f.delete(new Path("memory://rootspec/"), false)
    }
    assert(io.exists("memory://rootspec/a/one.bin"))
    MemoryFileSystem.clear()
  }

  test("rename: CAS contract, directory move, positioned read") {
    MemoryFileSystem.clear()
    val f = fs("memory://r2/")
    val io = new FileIO(f.getConf)
    io.writeBytes("memory://r2/t/v1.json", "one".getBytes)
    io.writeBytes("memory://r2/t/tmp.json", "two".getBytes)
    // rename onto an existing FILE fails (catalog CAS)
    assert(!io.rename("memory://r2/t/tmp.json", "memory://r2/t/v1.json"))
    assert(io.readString("memory://r2/t/v1.json") == "one")
    // rename to a fresh name succeeds
    assert(io.rename("memory://r2/t/tmp.json", "memory://r2/t/v2.json"))
    assert(io.readString("memory://r2/t/v2.json") == "two")
    // directory move carries children
    io.writeBytes("memory://r2/d1/x/deep.bin", Array[Byte](9))
    assert(io.rename("memory://r2/d1", "memory://r2/d2"))
    assert(io.exists("memory://r2/d2/x/deep.bin"))
    assert(!io.exists("memory://r2/d1/x/deep.bin"))
    // positioned read (the parquet reader's access pattern)
    val in = f.open(new Path("memory://r2/t/v2.json"))
    val buf = new Array[Byte](2)
    in.readFully(1L, buf)
    assert(new String(buf) == "wo")
    in.seek(0); assert(in.read() == 't'.toInt)
    in.close()
    MemoryFileSystem.clear()
  }

  test("rename involving the bucket root builds clean keys") {
    MemoryFileSystem.clear()
    val f = fs("memory://r3/")
    val io = new FileIO(f.getConf)
    // move a file INTO the root directory (dest key ends in "/")
    io.writeBytes("memory://r3/sub/f.bin", Array[Byte](7))
    assert(f.rename(new Path("memory://r3/sub/f.bin"), new Path("memory://r3/")))
    assert(io.exists("memory://r3/f.bin"), "file must land directly under root")
    assert(io.readBytes("memory://r3/f.bin").toSeq == Seq[Byte](7))
    // root must list it under its real name (a "b//f" key would list "")
    val names = f.listStatus(new Path("memory://r3/")).map(_.getPath.getName)
    assert(names.contains("f.bin"))
    MemoryFileSystem.clear()
  }
}

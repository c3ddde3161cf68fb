package graft.io

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FileSystem, FSDataInputStream, FSDataOutputStream, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** JVM-wide in-memory Hadoop FileSystem — the `memory://` scheme
  * (reference io/storage/memory.rs: an in-memory FileIO backend for
  * tests). Register with `fs.memory.impl = graft.io.MemoryFileSystem`;
  * then every graft component (catalog commits, manifest Avro, parquet
  * data through Spark's own readers/writers in local mode) runs against
  * process memory with zero local-FS coupling.
  *
  * Semantics match the local FS where the engine depends on them:
  * `rename` is ATOMIC (one store lock) and fails when the destination
  * file exists — the HadoopCatalog CAS commit contract — and moves into
  * an existing destination directory like Hadoop's local FS. Not meant
  * for production data (capacity = heap); the value is hermetic unit
  * suites and catalog-race tests.
  */
class MemoryFileSystem extends FileSystem {
  import MemoryFileSystem._

  private var fsUri: URI = URI.create("memory:///")
  private var workingDir: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(s"memory://${Option(name.getAuthority).getOrElse("")}")
    setConf(conf)
  }

  override def getUri: URI = fsUri
  override def getScheme: String = "memory"
  override def setWorkingDirectory(dir: Path): Unit = workingDir = dir
  override def getWorkingDirectory: Path = workingDir

  /** Store key: authority + normalized absolute path (authorities act as
    * independent buckets). */
  private def key(p: Path): String = {
    val u = makeQualified(p).toUri
    val path = u.getPath
    val norm =
      if (path.length > 1 && path.endsWith("/")) path.dropRight(1) else path
    Option(u.getAuthority).getOrElse("") + norm
  }

  private def isRoot(k: String): Boolean = k.endsWith("/") || !k.contains("/")

  /** Child prefix of a key — root keys already end in "/" (a naive
    * k + "/" would probe "//" and match nothing). */
  private def childPrefix(k: String): String =
    if (k.endsWith("/")) k else k + "/"

  private def hasChildren(k: String): Boolean = {
    val pre = childPrefix(k)
    files.keySet.exists(_.startsWith(pre)) || dirs.keySet.exists(_.startsWith(pre))
  }

  private def isDir(k: String): Boolean =
    isRoot(k) || dirs.contains(k) || hasChildren(k)

  private def existsKey(k: String): Boolean = files.contains(k) || isDir(k)

  private def status(p: Path, k: String): FileStatus =
    files.get(k) match {
      case Some((bytes, mtime)) =>
        new FileStatus(bytes.length.toLong, false, 1, BlockSize, mtime,
          makeQualified(p))
      case None =>
        if (isDir(k)) new FileStatus(0L, true, 1, BlockSize, 0L, makeQualified(p))
        else throw new FileNotFoundException(s"memory://$k")
    }

  override def getFileStatus(p: Path): FileStatus = status(p, key(p))

  override def exists(p: Path): Boolean = existsKey(key(p))

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val (bytes, _) = files.getOrElse(key(p),
      throw new FileNotFoundException(s"memory://${key(p)}"))
    new FSDataInputStream(new SeekableBytes(bytes))
  }

  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(p)
    if (isDir(k)) throw new FileAlreadyExistsException(s"is a directory: $k")
    if (!overwrite && files.contains(k))
      throw new FileAlreadyExistsException(s"exists: $k")
    Option(p.getParent).foreach(mkdirs(_))
    val bos = new ByteArrayOutputStream() {
      override def close(): Unit = {
        super.close()
        files.put(k, (toByteArray, System.currentTimeMillis()))
      }
    }
    new FSDataOutputStream(bos, null)
  }

  override def append(p: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("memory:// append")

  override def rename(src: Path, dst: Path): Boolean = lock.synchronized {
    val sk = key(src)
    if (!existsKey(sk)) return false
    // Hadoop local-FS shape: renaming onto an existing DIRECTORY moves the
    // source under it; onto an existing FILE fails (the CAS contract)
    val dk0 = key(dst)
    // childPrefix on BOTH joins: a root key already ends in "/" — naive
    // "+ \"/\"" built unreachable "b//f" keys, and a root SOURCE key's
    // stripPrefix(sk) ate the separator ("b/f" → "xf" under dst "x")
    val dk = if (isDir(dk0)) childPrefix(dk0) + src.getName else dk0
    if (dk == sk) return true
    if (existsKey(dk)) return false
    files.remove(sk) match {
      case Some(v) => files.put(dk, v); true
      case None =>
        val spre = childPrefix(sk)
        val dpre = childPrefix(dk)
        files.keySet.toSeq.filter(_.startsWith(spre)).foreach { k =>
          files.remove(k).foreach(v => files.put(dpre + k.stripPrefix(spre), v))
        }
        dirs.keySet.toSeq.filter(k => k == sk || k.startsWith(spre)).foreach { k =>
          dirs.remove(k)
          if (k != sk) dirs.put(dpre + k.stripPrefix(spre), ())
        }
        dirs.put(dk, ())
        true
    }
  }

  override def delete(p: Path, recursive: Boolean): Boolean = lock.synchronized {
    val k = key(p)
    if (files.remove(k).isDefined) return true
    if (!isDir(k) || !existsKey(k)) return false
    if (!recursive && hasChildren(k))
      throw new IOException(s"directory not empty: $k")
    val pre = childPrefix(k)
    files.keySet.toSeq.filter(_.startsWith(pre)).foreach(files.remove)
    dirs.keySet.toSeq.filter(d => d == k || d.startsWith(pre)).foreach(dirs.remove)
    true
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val k = key(p)
    if (files.contains(k)) return Array(status(p, k))
    if (!isDir(k)) throw new FileNotFoundException(s"memory://$k")
    val pre = childPrefix(k)
    def child(full: String): String = {
      val rest = full.stripPrefix(pre)
      val i = rest.indexOf('/')
      if (i < 0) rest else rest.substring(0, i)
    }
    val names = (files.keySet.filter(_.startsWith(pre)) ++
      dirs.keySet.filter(_.startsWith(pre))).map(child).toSeq.distinct.sorted
    names.map(n => status(new Path(p, n), key(new Path(p, n)))).toArray
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    var cur = p
    while (cur != null) {
      val k = key(cur)
      if (files.contains(k)) throw new FileAlreadyExistsException(s"file at: $k")
      if (!isRoot(k)) dirs.put(k, ())
      cur = cur.getParent
    }
    true
  }
}

object MemoryFileSystem {
  private val BlockSize: Long = 32L << 20
  /** (bytes, mtime) by authority-qualified path — shared across FS
    * instances so catalog, writers and Spark tasks (local mode: one JVM)
    * see one store. */
  private val files =
    new scala.collection.concurrent.TrieMap[String, (Array[Byte], Long)]()
  private val dirs = new scala.collection.concurrent.TrieMap[String, Unit]()
  private val lock = new Object

  /** Drop every stored object (test isolation). */
  def clear(): Unit = lock.synchronized { files.clear(); dirs.clear() }

  private final class SeekableBytes(data: Array[Byte])
      extends ByteArrayInputStream(data) with Seekable with PositionedReadable {
    override def seek(target: Long): Unit = {
      if (target < 0 || target > data.length)
        throw new java.io.EOFException(s"seek $target of ${data.length}")
      pos = target.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(target: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = {
      if (position >= data.length) return -1
      val n = math.min(length, data.length - position.toInt)
      System.arraycopy(data, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Unit = {
      if (position + length > data.length) throw new java.io.EOFException
      System.arraycopy(data, position.toInt, buffer, offset, length)
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}

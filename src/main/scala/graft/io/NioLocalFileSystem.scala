package graft.io

import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.{FsAction, FsPermission}

/** `file://` FileSystem that never forks a child process.
  *
  * Hadoop's RawLocalFileSystem applies permissions through libhadoop
  * (NativeIO) when present and otherwise EXECS A SHELL per operation —
  * `chmod` from `LocalFSFileOutputStream.<init>` on every file create
  * and from `mkOneDirWithMode` on every mkdir. On a JVM without the
  * native library (this sandbox, and any slim container image) a write
  * of N small files pays N fork+exec round trips of ~5–15 ms each,
  * serialized per task — measured as the hottest executor-side stack of
  * the band-fold bench lines (see OPTIMIZATION_r15.md). Overriding
  * [[setPermission]] with java.nio's native chmod removes every fork
  * while keeping the permission semantics.
  *
  * Extending RawLocalFileSystem (not the Checksum-wrapping
  * LocalFileSystem) also drops the `.crc` sidecar per written file —
  * halving creates — which matches object-store behavior (no client
  * checksum files) and parquet's own page-level integrity checking.
  */
final class NioLocalFileSystem extends RawLocalFileSystem {

  /** The conf's local block size, resolved once: getDefaultBlockSize
    * walks Configuration.get (deprecation handling + overlay) per call,
    * and status construction calls it per file — measured as a hot
    * footer-open frame on census scans (r16). Lazy so it reads the conf
    * after initialize(). */
  private lazy val cachedBlockSize: Long =
    getDefaultBlockSize(new Path("file:///"))

  /** Eager, fork-free FileStatus: RawLocalFileSystem's status class
    * defers permission/owner and loads them by EXEC'ING `ls -ld` per
    * file on first access — and `FileSystem.listFiles` forces that load
    * for every listed file when it wraps statuses as LocatedFileStatus
    * (measured: ~9 ms fork per staged file, serial on the driver, after
    * every fanout write). One java.nio readAttributes call supplies all
    * of it. */
  private def nioStatus(file: java.io.File, qualified: Path)
      : org.apache.hadoop.fs.FileStatus = {
    import java.nio.file.attribute.PosixFileAttributes
    try {
      val attrs = Files.readAttributes(file.toPath, classOf[PosixFileAttributes])
      val perms = attrs.permissions()
      import PosixFilePermission._
      def act(r: PosixFilePermission, w: PosixFilePermission,
          x: PosixFilePermission): FsAction = {
        var a = FsAction.NONE
        if (perms.contains(r)) a = a.or(FsAction.READ)
        if (perms.contains(w)) a = a.or(FsAction.WRITE)
        if (perms.contains(x)) a = a.or(FsAction.EXECUTE)
        a
      }
      new org.apache.hadoop.fs.FileStatus(attrs.size(), attrs.isDirectory,
        1, cachedBlockSize, attrs.lastModifiedTime().toMillis,
        attrs.lastAccessTime().toMillis,
        new FsPermission(act(OWNER_READ, OWNER_WRITE, OWNER_EXECUTE),
          act(GROUP_READ, GROUP_WRITE, GROUP_EXECUTE),
          act(OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)),
        attrs.owner().getName, attrs.group().getName, null, qualified)
    } catch {
      case _: UnsupportedOperationException =>
        // non-POSIX store: basic attributes, default permissions
        new org.apache.hadoop.fs.FileStatus(file.length(), file.isDirectory,
          1, cachedBlockSize, file.lastModified(), qualified)
    }
  }

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus = {
    val file = pathToFile(f)
    if (!file.exists())
      throw new java.io.FileNotFoundException(s"File $f does not exist")
    nioStatus(file, new Path(file.getPath)
      .makeQualified(getUri, getWorkingDirectory))
  }

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    val dir = pathToFile(f)
    if (!dir.exists())
      throw new java.io.FileNotFoundException(s"File $f does not exist")
    if (dir.isFile) return Array(getFileStatus(f))
    val children = dir.listFiles()
    if (children == null)
      throw new java.io.IOException(s"Error accessing $dir")
    children.map { c =>
      nioStatus(c, new Path(new Path(dir.getPath), c.getName)
        .makeQualified(getUri, getWorkingDirectory))
    }
  }

  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    val file = pathToFile(p).toPath
    val perms = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    import PosixFilePermission._
    def add(a: FsAction, r: PosixFilePermission, w: PosixFilePermission,
        x: PosixFilePermission): Unit = {
      if (a.implies(FsAction.READ)) perms.add(r)
      if (a.implies(FsAction.WRITE)) perms.add(w)
      if (a.implies(FsAction.EXECUTE)) perms.add(x)
    }
    add(permission.getUserAction, OWNER_READ, OWNER_WRITE, OWNER_EXECUTE)
    add(permission.getGroupAction, GROUP_READ, GROUP_WRITE, GROUP_EXECUTE)
    add(permission.getOtherAction, OTHERS_READ, OTHERS_WRITE, OTHERS_EXECUTE)
    try Files.setPosixFilePermissions(file, perms)
    catch {
      case _: UnsupportedOperationException =>
        // non-POSIX store: best-effort java.io bits (Hadoop's own
        // Windows fallback shape); never fork
        val f = file.toFile
        f.setReadable(permission.getUserAction.implies(FsAction.READ), true)
        f.setWritable(permission.getUserAction.implies(FsAction.WRITE), true)
        f.setExecutable(permission.getUserAction.implies(FsAction.EXECUTE), true)
    }
  }
}

object NioLocalFileSystem {
  /** Hadoop conf entries that route `file://` through this class for
    * code paths we do not call directly (Spark's parquet read/write).
    * The FileSystem.get cache is keyed by (scheme, authority, ugi) ONLY
    * — not by conf — so the override must disable the cache or it would
    * randomly win/lose against the default LocalFileSystem depending on
    * initialization order; instantiation is a cheap object allocation. */
  val confEntries: Seq[(String, String)] = Seq(
    "fs.file.impl" -> classOf[NioLocalFileSystem].getName,
    "fs.file.impl.disable.cache" -> "true")
}

package graft.catalog

import graft.io.FileIO
import graft.spec.ViewMetadata

/** Versioned view-metadata store (the view side of the catalog trait
  * family — reference view support in catalog/mod.rs + view_metadata.rs).
  * Same layout and atomic-rename CAS as the Hadoop table catalog:
  *
  * {{{
  * warehouse/<view>/metadata/v<N>.view-metadata.json
  * warehouse/<view>/metadata/view-version-hint.text
  * }}}
  *
  * The distinct file suffix keeps views and tables unambiguous inside one
  * warehouse directory tree. */
final class ViewStore(warehouse: String, io: FileIO) {

  private def viewDir(name: String) = s"$warehouse/$name"
  private def metadataDir(name: String) = s"${viewDir(name)}/metadata"
  private def versionFile(name: String, v: Int) =
    s"${metadataDir(name)}/v$v.view-metadata.json"
  private def hintFile(name: String) = s"${metadataDir(name)}/view-version-hint.text"

  def currentVersion(name: String): Option[Int] =
    if (!io.exists(hintFile(name))) None
    else {
      var v = io.readString(hintFile(name)).trim.toInt
      while (io.exists(versionFile(name, v + 1))) v += 1
      Some(v)
    }

  def exists(name: String): Boolean = currentVersion(name).isDefined

  def create(name: String, md: ViewMetadata): ViewMetadata = {
    require(!exists(name), s"view already exists: $name")
    io.writeString(versionFile(name, 1), md.toJsonString, overwrite = false)
    io.writeString(hintFile(name), "1", overwrite = true)
    md
  }

  def load(name: String): (ViewMetadata, Int) = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalArgumentException(s"no such view: $name"))
    (ViewMetadata.fromJsonString(io.readString(versionFile(name, v))), v)
  }

  /** Atomic replace: rename-if-absent CAS on v<base+1>. */
  def update(name: String, baseVersion: Int, md: ViewMetadata): Int = {
    val next = baseVersion + 1
    val tmp = s"${metadataDir(name)}/.tmp-${java.util.UUID.randomUUID()}.json"
    io.writeString(tmp, md.toJsonString, overwrite = true)
    val target = versionFile(name, next)
    if (io.exists(target) || !io.renameIfAbsent(tmp, target)) {
      io.delete(tmp)
      throw CommitConflict(s"concurrent view commit won version $next")
    }
    io.writeString(hintFile(name), next.toString, overwrite = true)
    next
  }

  def drop(name: String): Boolean =
    exists(name) && io.delete(viewDir(name), recursive = true)

  def list(): Seq[String] = {
    val fs = io.fs(warehouse)
    val p = new org.apache.hadoop.fs.Path(warehouse)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(exists).sorted
  }
}

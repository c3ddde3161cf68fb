package graft.catalog

import graft.io.FileIO
import graft.spec.{IcebergSchema, PartitionSpec, TableMetadata}
import graft.spec.Json.NodeOps

final case class CommitConflict(message: String) extends RuntimeException(message)

/** Catalog API (reference: catalog/mod.rs:58-124) — list/create/load/drop
  * plus the CAS commit primitive `commitTable` the transaction layer builds
  * optimistic retry on.
  */
trait Catalog {
  def io: FileIO

  /** metadata.json bytes honoring `write.metadata.compression-codec`
    * (reference compression.rs: gzip or none; reads sniff magic bytes,
    * see FileIO.readString). */
  protected def metadataBytes(md: TableMetadata): Array[Byte] =
    md.properties.getOrElse("write.metadata.compression-codec", "none") match {
      case "gzip" => io.gzipBytes(md.toJsonString)
      case "none" | "" => md.toJsonString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      case other => throw new IllegalArgumentException(
        s"unsupported write.metadata.compression-codec: $other (gzip|none)")
    }

  /** Version-file suffix for the codec the bytes carry: compressed
    * metadata must be NAMED `<v>.gz.metadata.json` (reference
    * catalog/metadata_location.rs:33) — foreign engines select the read
    * codec from the filename, so gzip bytes under a plain name are
    * unreadable to them (this engine's own reads sniff magic bytes). */
  protected def metadataSuffix(md: TableMetadata): String =
    md.properties.getOrElse("write.metadata.compression-codec", "none") match {
      case "gzip" => ".gz.metadata.json"
      case _ => ".metadata.json"
    }
  def createTable(name: String, schema: IcebergSchema,
      spec: PartitionSpec = PartitionSpec.unpartitioned,
      properties: Map[String, String] = Map.empty): TableMetadata
  def loadTable(name: String): (TableMetadata, Int) // (metadata, version)
  def tableExists(name: String): Boolean
  def dropTable(name: String): Boolean
  def listTables(): Seq[String]
  /** Atomic swap: succeeds only if current version == baseVersion. */
  def commitTable(name: String, baseVersion: Int, updated: TableMetadata): Int

  /** The CatalogLoader property map that re-constructs THIS catalog in
    * another planning context (a DSv2 reader option bag, another JVM) —
    * the reference's loader registry keys (catalog/loader/src/lib.rs).
    * None when the catalog is not self-describable from plain
    * properties: in-process state (memory) or credential-bearing
    * configs (REST tokens must not leak into scan options / plan
    * strings). Used by the streaming probe's per-trigger static-side
    * refresh ([[graft.streaming.StreamingLsh.probeIndexCandidates]]). */
  def loaderProps: Option[Map[String, String]] = None

  /** Register an EXISTING table by its metadata file (catalog/mod.rs:121
    * register_table): the metadata JSON is read from `metadataLocation`
    * and becomes the catalog's current version for `name` — data and
    * manifest files stay exactly where they are (manifests address files
    * absolutely). The migration path between catalogs. */
  def registerTable(name: String, metadataLocation: String): TableMetadata = {
    require(!tableExists(name), s"table already exists: $name")
    val md = TableMetadata.fromJsonString(io.readString(metadataLocation))
    registerParsed(name, md)
    md
  }

  /** Catalog-specific "adopt this metadata as v1 of `name`". */
  protected def registerParsed(name: String, md: TableMetadata): Unit

  /** Adopt an in-memory metadata tree as a NEW table (the `snapshot`
    * procedure's registration path — no metadata file exists yet). */
  def adoptTable(name: String, md: TableMetadata): Unit = {
    require(!tableExists(name), s"table already exists: $name")
    registerParsed(name, md)
  }

  /** Catalog-pointer rename (catalog/mod.rs rename_table): only the
    * name→table binding moves; metadata location, data and history stay
    * put. Unsupported where the layout couples name to path (the Hadoop
    * catalog — same refusal as the reference and Java). */
  def renameTable(src: String, dst: String): Unit =
    throw new UnsupportedOperationException(
      s"rename is not supported by ${getClass.getSimpleName}")

  // ---- namespaces (catalog/mod.rs list/create/get/exists/update/drop;
  //      dotted-string form of the reference's NamespaceIdent) ----

  /** Namespaces visible to this catalog: those DERIVED from dotted table
    * names (EVERY prefix: table a.b.t implies namespaces a and a.b, so
    * root listings can discover nested implicit namespaces) plus any
    * explicitly created (backend-specific storage — the default
    * implementation derives only). */
  def listNamespaces(): Seq[String] =
    listTables().filter(_.contains('.'))
      .flatMap { t =>
        val parts = t.split('.').dropRight(1)
        (1 to parts.length).map(k => parts.take(k).mkString("."))
      }.distinct.sorted

  /** Listing contract: every ancestor of a listed namespace is listed
    * too — a nested-only explicit namespace ('a.b' created without 'a')
    * must surface 'a', or no listing level can reach it. Backends with
    * explicit namespace storage run their names through this. */
  protected def withAncestors(ns: Seq[String]): Seq[String] =
    ns.flatMap { n =>
      val parts = n.split('.')
      (1 to parts.length).map(k => parts.take(k).mkString("."))
    }.distinct

  def namespaceExists(ns: String): Boolean =
    listNamespaces().exists(n => n == ns || n.startsWith(ns + "."))

  /** Properties of `ns`; empty map for a derived (implicit) namespace.
    * Throws NoSuchElementException when the namespace is unknown. */
  def namespaceProperties(ns: String): Map[String, String] =
    if (namespaceExists(ns)) Map.empty
    else throw new NoSuchElementException(s"no such namespace: $ns")

  def createNamespace(ns: String, properties: Map[String, String] = Map.empty): Unit =
    throw new UnsupportedOperationException(
      s"explicit namespaces are not supported by ${getClass.getSimpleName}")

  def updateNamespaceProperties(ns: String, sets: Map[String, String],
      removes: Set[String]): Unit =
    throw new UnsupportedOperationException(
      s"namespace properties are not supported by ${getClass.getSimpleName}")

  /** Drop an EMPTY namespace; refuses when tables still live under it.
    * Returns false when the namespace did not exist. */
  def dropNamespace(ns: String): Boolean =
    throw new UnsupportedOperationException(
      s"explicit namespaces are not supported by ${getClass.getSimpleName}")

  /** Drop the table AND delete its files (catalog/mod.rs:112 purge_table):
    * every data/delete file reachable from any snapshot, every manifest +
    * manifest list, statistics files, and the metadata generations.
    * dropTable alone leaves files for an external GC. */
  def purgeTable(name: String): Boolean = {
    if (!tableExists(name)) return false
    val (md, _) = loadTable(name)
    // snapshot tables share files with their source (Maintenance
    // .snapshotTable stamps gc.enabled=false, like Iceberg): purging
    // them would delete data the source still owns
    require(!md.properties.get("gc.enabled").contains("false"),
      s"cannot purge $name: gc.enabled=false (files may be shared); " +
        "use dropTable to remove only the catalog entry")
    md.snapshots.foreach { s =>
      graft.meta.ManifestIO.readManifestList(io, s.manifestList,
        md.partitionSpecs.map(sp => sp.specId -> sp.partitionType(md.currentSchema)).toMap,
        graft.crypto.MetadataEncryption.listKeyFor(md, s))
        .foreach { m =>
          val spec = md.partitionSpecs.find(_.specId == m.partitionSpecId)
            .getOrElse(md.defaultSpec)
          graft.meta.ManifestIO.readManifest(io, m.manifestPath, md.currentSchema, spec,
              m.keyMetadata)
            .foreach(e => quietDelete(e.dataFile.filePath))
          quietDelete(m.manifestPath)
        }
      quietDelete(s.manifestList)
    }
    (md.statistics.map(_.statisticsPath) ++
      md.partitionStatistics.map(_.statisticsPath)).foreach(quietDelete)
    md.metadataLog.map(_._1).foreach(quietDelete)
    dropTable(name)
  }

  private def quietDelete(path: String): Unit =
    try { io.delete(path); () } catch { case _: Throwable => () }
}

/** Directory-layout catalog with atomic-rename commits (the reference's
  * SQL/file catalogs' role; conflict behavior per
  * crates/integration_tests/tests/conflict_commit_test.rs):
  *
  * {{{
  * warehouse/<table>/metadata/v<N>.metadata.json
  * warehouse/<table>/metadata/version-hint.text   (contains N)
  * warehouse/<table>/data/...
  * }}}
  *
  * Commit = write temp json, rename to v<N+1> (rename-if-absent is the CAS;
  * atomic on HDFS/local — object stores should front this with a REST
  * catalog, SURVEY.md §7 hard part 4), then advance the hint.
  */
final class HadoopCatalog(val warehouse: String, val io: FileIO) extends Catalog {

  override def loaderProps: Option[Map[String, String]] =
    Some(Map("type" -> "hadoop", "warehouse" -> warehouse))

  private def tableDir(name: String) = s"$warehouse/$name"
  private def metadataDir(name: String) = s"${tableDir(name)}/metadata"
  private def versionFile(name: String, v: Int, suffix: String = ".metadata.json") =
    s"${metadataDir(name)}/v$v$suffix"
  /** A version may exist under either codec suffix. */
  private def existingVersionFile(name: String, v: Int): Option[String] =
    Seq(".metadata.json", ".gz.metadata.json")
      .map(versionFile(name, v, _)).find(io.exists)
  private def hintFile(name: String) = s"${metadataDir(name)}/version-hint.text"

  override def createTable(name: String, schema: IcebergSchema, spec: PartitionSpec,
      properties: Map[String, String]): TableMetadata = {
    require(!tableExists(name), s"table already exists: $name")
    val md = TableMetadata.newTable(tableDir(name), schema, spec, properties)
    writeVersion(name, 1, md)
    md
  }

  override protected def registerParsed(name: String, md: TableMetadata): Unit =
    writeVersion(name, 1, md)

  override def loadTable(name: String): (TableMetadata, Int) = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    val loc = existingVersionFile(name, v).getOrElse(versionFile(name, v))
    (TableMetadata.fromJsonString(io.readString(loc)), v)
  }

  def currentVersion(name: String): Option[Int] = {
    // hint is ADVISORY twice over: a commit may have advanced the version
    // without updating it yet, and a concurrent overwrite of the hint can
    // expose a transient empty/partial read (truncate-then-write is not
    // atomic on most filesystems) — fall back to listing in both cases
    val hinted =
      if (!io.exists(hintFile(name))) None
      else scala.util.Try(io.readString(hintFile(name)).trim.toInt).toOption
    hinted match {
      case Some(h) =>
        var v = h
        while (existingVersionFile(name, v + 1).isDefined) v += 1
        Some(v)
      case None =>
        val vs = io.listFiles(metadataDir(name), recursive = false)
          .map(_._1).flatMap { p =>
            val n = p.substring(p.lastIndexOf('/') + 1)
            if (n.startsWith("v") && n.endsWith(".metadata.json"))
              n.stripPrefix("v").stripSuffix(".metadata.json")
                .stripSuffix(".gz").toIntOption
            else None
          }
        if (vs.isEmpty) None else Some(vs.max)
    }
  }

  override def tableExists(name: String): Boolean = currentVersion(name).isDefined

  override def dropTable(name: String): Boolean =
    io.delete(tableDir(name), recursive = true)

  override def listTables(): Seq[String] = {
    val fs = io.fs(warehouse)
    val p = new org.apache.hadoop.fs.Path(warehouse)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
      .filter(tableExists)
  }

  override def commitTable(name: String, baseVersion: Int, updated: TableMetadata): Int = {
    val cur = currentVersion(name).getOrElse(0)
    if (cur != baseVersion)
      throw CommitConflict(s"base version $baseVersion is stale (current: $cur)")
    val next = baseVersion + 1
    val tmp = s"${metadataDir(name)}/.tmp-${java.util.UUID.randomUUID()}.json"
    io.writeBytes(tmp, metadataBytes(updated), overwrite = true)
    val target = versionFile(name, next, metadataSuffix(updated))
    // renameIfAbsent IS the CAS: a plain rename(2) replaces an existing
    // destination, so two committers racing the same version both
    // "succeeded" and the first one's metadata was silently erased (the
    // ConflictSpec lost-update flake — r16 root cause)
    if (existingVersionFile(name, next).isDefined ||
        !io.renameIfAbsent(tmp, target)) {
      io.delete(tmp)
      throw CommitConflict(s"concurrent commit won version $next")
    }
    writeHint(name, next)
    next
  }

  /** Hint updates go through temp + rename: a truncate-then-write overwrite
    * exposes concurrent readers to an empty hint (currentVersion tolerates
    * that too, but atomically swapping keeps the fast path fast). */
  private def writeHint(name: String, v: Int): Unit = {
    val tmp = s"${metadataDir(name)}/.hint-${java.util.UUID.randomUUID()}.tmp"
    io.writeString(tmp, v.toString, overwrite = true)
    io.delete(hintFile(name))
    if (!io.rename(tmp, hintFile(name))) io.delete(tmp) // loser of a hint race
  }

  private def writeVersion(name: String, v: Int, md: TableMetadata): Unit = {
    io.writeBytes(versionFile(name, v, metadataSuffix(md)), metadataBytes(md),
      overwrite = false)
    writeHint(name, v)
  }

  // ---- explicit namespaces: a marker file `warehouse/<ns>/.namespace.json`
  //      holding the properties (tables stay flat-dotted: `warehouse/a.b.t`,
  //      so the marker dir never collides with a table dir) ----

  private def nsFile(ns: String) = s"$warehouse/$ns/.namespace.json"

  private def readNsProps(ns: String): Option[Map[String, String]] =
    if (!io.exists(nsFile(ns))) None
    else Some(graft.spec.Json.parse(io.readString(nsFile(ns)))
      .fieldsMap.map { case (k, v) => k -> v.asText() })

  override def createNamespace(ns: String, properties: Map[String, String]): Unit = {
    require(!io.exists(nsFile(ns)), s"namespace already exists: $ns")
    // the marker dir is warehouse/<ns>; a TABLE of that exact name owns
    // that directory — writing a marker inside it would let dropNamespace
    // delete table data
    require(!tableExists(ns), s"a table named '$ns' already exists")
    io.writeString(nsFile(ns), graft.spec.Json.objString(properties), overwrite = false)
  }

  override def namespaceExists(ns: String): Boolean =
    io.exists(nsFile(ns)) || super.namespaceExists(ns)

  override def listNamespaces(): Seq[String] = {
    val fs = io.fs(warehouse)
    val p = new org.apache.hadoop.fs.Path(warehouse)
    val explicit =
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
        .filter(d => io.exists(nsFile(d)))
    (withAncestors(explicit) ++ super.listNamespaces()).distinct.sorted
  }

  override def namespaceProperties(ns: String): Map[String, String] =
    readNsProps(ns).getOrElse(super.namespaceProperties(ns))

  override def updateNamespaceProperties(ns: String, sets: Map[String, String],
      removes: Set[String]): Unit = {
    require(namespaceExists(ns), s"no such namespace: $ns")
    val cur = readNsProps(ns).getOrElse(Map.empty)
    io.writeString(nsFile(ns),
      graft.spec.Json.objString(cur ++ sets -- removes), overwrite = true)
  }

  override def dropNamespace(ns: String): Boolean = {
    val existed = namespaceExists(ns)
    if (!existed) return false
    require(!listTables().exists(_.startsWith(ns + ".")),
      s"namespace is not empty: $ns")
    require(!listNamespaces().exists(_.startsWith(ns + ".")),
      s"namespace has child namespaces: $ns")
    // delete ONLY the marker (never a recursive directory delete — a
    // same-named table directory must be unreachable from here)
    io.delete(nsFile(ns))
    io.delete(s"$warehouse/$ns", recursive = false) // empty marker dir; no-op if not
    true
  }
}

/** Commit retry with exponential backoff (transaction/mod.rs:175-252;
  * defaults 4 retries / 100ms→60s / 30min cap, table_properties.rs:324-339).
  * Each attempt refreshes the base metadata and re-applies the action —
  * optimistic concurrency.
  */
/** In-memory catalog (reference catalog/memory/catalog.rs): metadata
  * versions held in a process-local map with CAS semantics; data/manifest
  * files still go through FileIO under `warehouse`. For tests and
  * ephemeral pipelines — same Catalog contract as Hadoop/REST.
  */
final class MemoryCatalog(warehouse: String, val io: FileIO) extends Catalog {
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[TableMetadata]]()

  override def createTable(name: String, schema: IcebergSchema, spec: PartitionSpec,
      properties: Map[String, String]): TableMetadata = {
    val md = TableMetadata.newTable(s"$warehouse/$name", schema, spec, properties)
    val prev = tables.putIfAbsent(name, Vector(md))
    require(prev == null, s"table already exists: $name")
    md
  }

  override protected def registerParsed(name: String, md: TableMetadata): Unit = {
    val prev = tables.putIfAbsent(name, Vector(md))
    require(prev == null, s"table already exists: $name")
  }

  override def loadTable(name: String): (TableMetadata, Int) = {
    val versions = Option(tables.get(name)).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    (versions.last, versions.size)
  }

  override def tableExists(name: String): Boolean = tables.containsKey(name)

  override def dropTable(name: String): Boolean = tables.remove(name) != null

  override def renameTable(src: String, dst: String): Unit =
    tables.synchronized {
      val versions = Option(tables.get(src)).getOrElse(
        throw new IllegalArgumentException(s"no such table: $src"))
      require(tables.putIfAbsent(dst, versions) == null,
        s"destination exists: $dst")
      tables.remove(src)
    }

  override def listTables(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    tables.keySet.asScala.toSeq.sorted
  }

  override def commitTable(name: String, baseVersion: Int, updated: TableMetadata): Int = {
    val committed = tables.computeIfPresent(name, (_, versions) =>
      if (versions.size == baseVersion) versions :+ updated else versions)
    if (committed == null)
      throw new IllegalArgumentException(s"no such table: $name")
    // identity check: a racing commit at the same base version also
    // yields size == base+1, but with ITS metadata at the head
    if (!committed.last.eq(updated))
      throw CommitConflict(s"stale base version $baseVersion for $name")
    committed.size
  }

  private val namespaces =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  override def createNamespace(ns: String, properties: Map[String, String]): Unit =
    require(namespaces.putIfAbsent(ns, properties) == null,
      s"namespace already exists: $ns")

  override def namespaceExists(ns: String): Boolean =
    namespaces.containsKey(ns) || super.namespaceExists(ns)

  override def listNamespaces(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    (withAncestors(namespaces.keySet.asScala.toSeq) ++
      super.listNamespaces()).distinct.sorted
  }

  override def namespaceProperties(ns: String): Map[String, String] =
    Option(namespaces.get(ns)).getOrElse(super.namespaceProperties(ns))

  override def updateNamespaceProperties(ns: String, sets: Map[String, String],
      removes: Set[String]): Unit = {
    require(namespaceExists(ns), s"no such namespace: $ns")
    namespaces.compute(ns, (_, cur) =>
      (Option(cur).getOrElse(Map.empty) ++ sets) -- removes)
    ()
  }

  override def dropNamespace(ns: String): Boolean = {
    val existed = namespaceExists(ns)
    if (!existed) return false
    require(!listTables().exists(_.startsWith(ns + ".")),
      s"namespace is not empty: $ns")
    require(!listNamespaces().exists(_.startsWith(ns + ".")),
      s"namespace has child namespaces: $ns")
    namespaces.remove(ns)
    true
  }
}

object CommitRetry {
  def run[T](catalog: Catalog, name: String,
      retries: Int = 4, minWaitMs: Long = 100, maxWaitMs: Long = 60000)(
      action: (TableMetadata, Int) => (TableMetadata, Int => T)): T = {
    var attempt = 0
    var waitMs = minWaitMs
    val startMs = System.currentTimeMillis()
    // table-tunable retry policy (table_properties.rs:322-339 —
    // commit.retry.{num-retries,min-wait-ms,max-wait-ms,total-timeout-ms});
    // the caller's arguments are the defaults, matching the reference's
    var maxRetries = retries
    var maxWait = maxWaitMs
    var totalTimeoutMs = 30L * 60 * 1000
    var tuned = false
    while (true) {
      val (base, version) = catalog.loadTable(name)
      if (!tuned) {
        tuned = true
        def prop(k: String) = base.properties.get(k).flatMap(_.toLongOption)
        maxRetries = prop("commit.retry.num-retries").map(_.toInt).getOrElse(retries)
        waitMs = prop("commit.retry.min-wait-ms").getOrElse(minWaitMs)
        maxWait = prop("commit.retry.max-wait-ms").getOrElse(maxWaitMs)
        totalTimeoutMs = prop("commit.retry.total-timeout-ms").getOrElse(totalTimeoutMs)
      }
      val (updated0, onSuccess) = action(base, version)
      // Every real metadata change records its predecessor in the
      // metadata log (table_metadata.rs metadata_log), capped by
      // write.metadata.previous-versions-max — centralized here so
      // metadata-only transactions and snapshot commits log alike.
      val updated =
        if (updated0 eq base) updated0
        else {
          val cap = updated0.properties.get("write.metadata.previous-versions-max")
            .flatMap(s => scala.util.Try(s.toInt).toOption).getOrElse(100)
          val prevSuffix = base.properties
            .getOrElse("write.metadata.compression-codec", "none") match {
              case "gzip" => ".gz.metadata.json"
              case _ => ".metadata.json"
            }
          val entry = (s"${base.location}/metadata/v$version$prevSuffix",
            base.lastUpdatedMs)
          val log =
            if (updated0.metadataLog.lastOption.contains(entry)) updated0.metadataLog
            else updated0.metadataLog :+ entry
          updated0.copy(metadataLog = log.takeRight(cap))
        }
      try {
        val newVersion = catalog.commitTable(name, version, updated)
        return onSuccess(newVersion)
      } catch {
        case c: CommitConflict =>
          attempt += 1
          if (attempt > maxRetries ||
              System.currentTimeMillis() - startMs > totalTimeoutMs) throw c
          Thread.sleep(waitMs + scala.util.Random.nextLong(waitMs / 2 + 1))
          waitMs = math.min(waitMs * 2, maxWait)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

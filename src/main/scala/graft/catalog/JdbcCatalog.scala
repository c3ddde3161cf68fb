package graft.catalog

import java.sql.{Connection, DriverManager}

import graft.io.FileIO
import graft.spec.{IcebergSchema, PartitionSpec, TableMetadata}

/** SQL/JDBC catalog — tables as rows, CAS via conditional UPDATE
  * (reference: crates/catalog/sql/src/catalog.rs; the update_table commit
  * at catalog.rs:1008-1056 swaps `metadata_location` only WHERE the
  * current location still matches, and 0 rows affected = retryable
  * conflict — the exact semantic ported here over plain JDBC).
  *
  * Row schema mirrors the reference's `iceberg_tables`:
  * (catalog_name, table_namespace, table_name, metadata_location,
  * previous_metadata_location). Metadata JSON lives in the warehouse as
  * `<table>/metadata/v<N>.metadata.json`; the row points at the current
  * version and the CAS makes the pointer swap atomic, so this works on
  * object stores with no atomic rename (the gap the Hadoop catalog has).
  *
  * Tested against embedded Derby (`jdbc:derby:<dir>;create=true` — the
  * driver Spark already ships); any JDBC url with the same DDL works.
  */
final class JdbcCatalog(jdbcUrl: String, warehouse: String, val io: FileIO,
    catalogName: String = "graft", namespace: String = "default") extends Catalog {

  /** Self-describing WHEN the url carries no credentials: the JDBC url
    * is the shared source of truth (any instance constructed from these
    * props sees the same rows), so a per-trigger re-load in another
    * planning context is exact; embedded Derby allows any number of
    * in-JVM connections to one database. A url embedding secrets
    * (`user=`/`password=`/`token=`-style query params) returns None —
    * loaderProps round-trips into DSv2 reader options, which surface in
    * EXPLAIN output, the Spark UI and event logs, exactly the leak the
    * [[Catalog.loaderProps]] contract excludes (same policy as REST). */
  override def loaderProps: Option[Map[String, String]] =
    if (JdbcCatalog.CredentialParam.findFirstIn(jdbcUrl).isDefined) None
    else Some(Map("type" -> "jdbc", "uri" -> jdbcUrl,
      "warehouse" -> warehouse, "name" -> catalogName,
      "namespace" -> namespace))

  private val TableName = "iceberg_tables"

  locally { // one-time DDL (idempotent)
    withConn { c =>
      val meta = c.getMetaData.getTables(null, null, TableName.toUpperCase, null)
      val exists = meta.next()
      meta.close()
      if (!exists) {
        val st = c.createStatement()
        try st.executeUpdate(
          s"""CREATE TABLE $TableName (
             |  catalog_name VARCHAR(255) NOT NULL,
             |  table_namespace VARCHAR(255) NOT NULL,
             |  table_name VARCHAR(255) NOT NULL,
             |  metadata_location VARCHAR(1000),
             |  previous_metadata_location VARCHAR(1000),
             |  PRIMARY KEY (catalog_name, table_namespace, table_name))""".stripMargin)
        catch { case _: java.sql.SQLException => /* lost a create race: fine */ }
        finally st.close()
      }
    }
  }

  private def withConn[T](f: Connection => T): T = {
    val c = DriverManager.getConnection(jdbcUrl)
    try f(c) finally c.close()
  }

  private def tableDir(name: String) = s"$warehouse/$name"
  // UUID-suffixed like the reference's MetadataLocation: every commit
  // attempt writes a DISTINCT file, so a losing racer can clean up its own
  // file without ever touching the winner's
  private def versionFile(name: String, v: Int,
      suffix: String = ".metadata.json") =
    s"${tableDir(name)}/metadata/v$v-${java.util.UUID.randomUUID()}$suffix"
  private def versionOf(location: String): Int = {
    val tail = location.substring(location.lastIndexOf("/v") + 2)
    tail.substring(0, tail.indexOf('-')).toInt
  }

  private def currentLocation(c: Connection, name: String): Option[String] = {
    val ps = c.prepareStatement(
      s"""SELECT metadata_location FROM $TableName
         | WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?""".stripMargin)
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace); ps.setString(3, name)
      val rs = ps.executeQuery()
      val r = if (rs.next()) Option(rs.getString(1)) else None
      rs.close()
      r
    } finally ps.close()
  }

  override protected def registerParsed(name: String, md: TableMetadata): Unit = {
    val loc = versionFile(name, 1, metadataSuffix(md))
    io.writeBytes(loc, metadataBytes(md), overwrite = false)
    registerRow(name, loc)
  }

  override def createTable(name: String, schema: IcebergSchema, spec: PartitionSpec,
      properties: Map[String, String]): TableMetadata = {
    val md = TableMetadata.newTable(tableDir(name), schema, spec, properties)
    val loc = versionFile(name, 1, metadataSuffix(md))
    io.writeBytes(loc, metadataBytes(md), overwrite = false)
    registerRow(name, loc)
    md
  }

  private def registerRow(name: String, loc: String): Unit = withConn { c =>
    val ps = c.prepareStatement(
      s"""INSERT INTO $TableName (catalog_name, table_namespace, table_name,
         |  metadata_location, previous_metadata_location)
         |  VALUES (?, ?, ?, ?, NULL)""".stripMargin)
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace)
      ps.setString(3, name); ps.setString(4, loc)
      ps.executeUpdate()
      ()
    } catch {
      case e: java.sql.SQLIntegrityConstraintViolationException =>
        io.delete(loc)
        throw new IllegalArgumentException(s"table already exists: $name", e)
    } finally ps.close()
  }

  override def loadTable(name: String): (TableMetadata, Int) = withConn { c =>
    val loc = currentLocation(c, name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    (TableMetadata.fromJsonString(io.readString(loc)), versionOf(loc))
  }

  override def tableExists(name: String): Boolean =
    withConn(c => currentLocation(c, name).isDefined)

  override def dropTable(name: String): Boolean = withConn { c =>
    val ps = c.prepareStatement(
      s"""DELETE FROM $TableName
         | WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?""".stripMargin)
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace); ps.setString(3, name)
      val dropped = ps.executeUpdate() > 0
      if (dropped) io.delete(tableDir(name), recursive = true)
      dropped
    } finally ps.close()
  }

  /** Atomic one-row UPDATE of the name binding (the reference sql
    * catalog's rename — metadata files never move); the primary key
    * makes a taken destination fail the statement. */
  override def renameTable(src: String, dst: String): Unit = withConn { c =>
    val ps = c.prepareStatement(
      s"""UPDATE $TableName SET table_name = ?
         | WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?""".stripMargin)
    try {
      ps.setString(1, dst)
      ps.setString(2, catalogName); ps.setString(3, namespace); ps.setString(4, src)
      val n =
        try ps.executeUpdate()
        catch { case e: java.sql.SQLException =>
          // only a duplicate-key violation means "destination exists"
          // (SQLState class 23 / the JDBC subclass); a transient
          // connection or lock failure must surface unchanged so the
          // caller can retry instead of seeing a phantom name conflict
          if (e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
              Option(e.getSQLState).exists(_.startsWith("23")))
            throw new IllegalArgumentException(s"destination exists: $dst", e)
          else throw e }
      if (n == 0) throw new IllegalArgumentException(s"no such table: $src")
    } finally ps.close()
  }

  override def listTables(): Seq[String] = withConn { c =>
    val ps = c.prepareStatement(
      s"""SELECT table_name FROM $TableName
         | WHERE catalog_name = ? AND table_namespace = ? ORDER BY table_name""".stripMargin)
    try {
      ps.setString(1, catalogName); ps.setString(2, namespace)
      val rs = ps.executeQuery()
      val out = Seq.newBuilder[String]
      while (rs.next()) out += rs.getString(1)
      rs.close()
      out.result()
    } finally ps.close()
  }

  /** CAS commit: write a fresh v<N+1> file, then swap the row's pointer
    * ONLY WHERE it still names the exact current location — 0 rows updated
    * means a racer won (catalog.rs:1049 rows_affected() == 0 → retryable
    * CatalogCommitConflicts), and we delete only our own staged file. */
  override def commitTable(name: String, baseVersion: Int, updated: TableMetadata): Int = {
    val prevLoc = withConn(c => currentLocation(c, name)).getOrElse(
      throw new IllegalArgumentException(s"no such table: $name"))
    if (versionOf(prevLoc) != baseVersion)
      throw CommitConflict(
        s"base version $baseVersion is stale for $name (current: ${versionOf(prevLoc)})")
    val nextLoc = versionFile(name, baseVersion + 1, metadataSuffix(updated))
    io.writeBytes(nextLoc, metadataBytes(updated), overwrite = false)
    val swapped = withConn { c =>
      val ps = c.prepareStatement(
        s"""UPDATE $TableName
           |  SET metadata_location = ?, previous_metadata_location = ?
           | WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?
           |   AND metadata_location = ?""".stripMargin)
      try {
        ps.setString(1, nextLoc); ps.setString(2, prevLoc)
        ps.setString(3, catalogName); ps.setString(4, namespace)
        ps.setString(5, name); ps.setString(6, prevLoc)
        ps.executeUpdate()
      } finally ps.close()
    }
    if (swapped == 0) {
      io.delete(nextLoc)
      throw CommitConflict(s"base version $baseVersion is stale for $name")
    }
    baseVersion + 1
  }

  // ---- explicit namespaces: the reference SQL catalog's
  //      `iceberg_namespace_properties` table (catalog/sql/src/catalog.rs;
  //      one row per property, an `exists` marker row for empty ones) ----

  private val NsTable = "iceberg_namespace_properties"
  private val NsMarker = "exists"

  locally {
    withConn { c =>
      val meta = c.getMetaData.getTables(null, null, NsTable.toUpperCase, null)
      val exists = meta.next()
      meta.close()
      if (!exists) {
        val st = c.createStatement()
        try st.executeUpdate(
          s"""CREATE TABLE $NsTable (
             |  catalog_name VARCHAR(255) NOT NULL,
             |  namespace VARCHAR(255) NOT NULL,
             |  property_key VARCHAR(255) NOT NULL,
             |  property_value VARCHAR(1000),
             |  PRIMARY KEY (catalog_name, namespace, property_key))""".stripMargin)
        catch { case _: java.sql.SQLException => () }
        finally st.close()
      }
    }
  }

  private def nsRows(c: Connection, ns: String): Map[String, String] = {
    val ps = c.prepareStatement(
      s"SELECT property_key, property_value FROM $NsTable WHERE catalog_name = ? AND namespace = ?")
    try {
      ps.setString(1, catalogName); ps.setString(2, ns)
      val rs = ps.executeQuery()
      val b = Map.newBuilder[String, String]
      while (rs.next()) b += rs.getString(1) -> rs.getString(2)
      b.result()
    } finally ps.close()
  }

  private def putNsRow(c: Connection, ns: String, k: String, v: String): Unit = {
    val ps = c.prepareStatement(
      s"INSERT INTO $NsTable (catalog_name, namespace, property_key, property_value) VALUES (?, ?, ?, ?)")
    try { ps.setString(1, catalogName); ps.setString(2, ns)
      ps.setString(3, k); ps.setString(4, v); ps.executeUpdate(); ()
    } finally ps.close()
  }

  override def createNamespace(ns: String, properties: Map[String, String]): Unit =
    withConn { c =>
      require(nsRows(c, ns).isEmpty, s"namespace already exists: $ns")
      require(!properties.contains(NsMarker),
        s"'$NsMarker' is a reserved namespace property key")
      (properties + (NsMarker -> "true")).foreach { case (k, v) => putNsRow(c, ns, k, v) }
    }

  override def namespaceExists(ns: String): Boolean =
    withConn(c => nsRows(c, ns).nonEmpty) || super.namespaceExists(ns)

  override def listNamespaces(): Seq[String] = {
    val explicit = withConn { c =>
      val ps = c.prepareStatement(
        s"SELECT DISTINCT namespace FROM $NsTable WHERE catalog_name = ?")
      try { ps.setString(1, catalogName)
        val rs = ps.executeQuery()
        val b = Seq.newBuilder[String]
        while (rs.next()) b += rs.getString(1)
        b.result()
      } finally ps.close()
    }
    (withAncestors(explicit) ++ super.listNamespaces()).distinct.sorted
  }

  override def namespaceProperties(ns: String): Map[String, String] = {
    val rows = withConn(c => nsRows(c, ns))
    if (rows.nonEmpty) rows - NsMarker else super.namespaceProperties(ns)
  }

  override def updateNamespaceProperties(ns: String, sets: Map[String, String],
      removes: Set[String]): Unit = withConn { c =>
    require(nsRows(c, ns).nonEmpty || super.namespaceExists(ns),
      s"no such namespace: $ns")
    require(!sets.contains(NsMarker) && !removes.contains(NsMarker),
      s"'$NsMarker' is a reserved namespace property key")
    val del = c.prepareStatement(
      s"DELETE FROM $NsTable WHERE catalog_name = ? AND namespace = ? AND property_key = ?")
    try (sets.keySet ++ removes).foreach { k =>
      del.setString(1, catalogName); del.setString(2, ns); del.setString(3, k)
      del.executeUpdate()
    } finally del.close()
    sets.foreach { case (k, v) =>
      if (!removes.contains(k) && k != NsMarker) putNsRow(c, ns, k, v)
    }
  }

  override def dropNamespace(ns: String): Boolean = {
    val existed = namespaceExists(ns)
    if (!existed) return false
    require(!listTables().exists(_.startsWith(ns + ".")),
      s"namespace is not empty: $ns")
    require(!listNamespaces().exists(_.startsWith(ns + ".")),
      s"namespace has child namespaces: $ns")
    withConn { c =>
      val ps = c.prepareStatement(
        s"DELETE FROM $NsTable WHERE catalog_name = ? AND namespace = ?")
      try { ps.setString(1, catalogName); ps.setString(2, ns); ps.executeUpdate() }
      finally ps.close()
    }
    true
  }
}

object JdbcCatalog {
  /** Credential-bearing query/properties in a JDBC url — conservative:
    * any of these disqualifies the url from riding in plan-visible
    * reader options ([[JdbcCatalog.loaderProps]]). */
  private[catalog] val CredentialParam =
    "(?i)[?;&](user|username|password|pwd|secret|token|credential)\\s*=".r
}

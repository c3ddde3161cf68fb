package graft.catalog

import scala.jdk.CollectionConverters._

import org.apache.hadoop.hive.metastore.api._

import graft.io.FileIO
import graft.spec.{IcebergSchema, IcebergType, PartitionSpec, TableMetadata}

/** Hive-Metastore catalog — the semantics of the reference's HMS catalog
  * (crates/catalog/hms/src/catalog.rs + schema.rs), talking the REAL
  * thrift surface (`ThriftHiveMetastore.Iface` from hive-metastore):
  *
  *   - an Iceberg table is an EXTERNAL HMS table whose parameters carry
  *     the pointer: `table_type=ICEBERG`, `metadata_location`,
  *     `previous_metadata_location`, plus `EXTERNAL=TRUE`; the storage
  *     descriptor records the table location and a Hive-typed column list
  *     (schema.rs HiveSchemaBuilder) so plain Hive tooling can introspect;
  *   - load = `get_table` → parse the metadata JSON at metadata_location;
  *   - commit = the Iceberg-on-Hive protocol: acquire the HMS table LOCK,
  *     re-read, verify metadata_location still matches the base (the CAS),
  *     `alter_table` swapping the pointer, unlock. The lock makes
  *     check-then-alter atomic across engines sharing the metastore.
  *
  * Metadata files live under `<warehouse>/<table>/metadata/vN.metadata
  * .json` like the Hadoop catalog; the HMS parameter is the source of
  * truth for WHICH version is current.
  */
final class HmsCatalog(client: ThriftHiveMetastore.Iface, db: String,
    warehouse: String, val io: FileIO) extends Catalog {

  ensureDatabase()

  private def ensureDatabase(): Unit =
    try { client.get_database(db); () }
    catch {
      case _: NoSuchObjectException =>
        val d = new Database()
        d.setName(db)
        d.setLocationUri(warehouse)
        client.create_database(d)
    }

  private def tableDir(name: String) = s"$warehouse/$name"
  private def versionPath(name: String, v: Int,
      suffix: String = ".metadata.json") =
    s"${tableDir(name)}/metadata/v$v$suffix"
  private def versionOf(location: String): Int = {
    val file = location.substring(location.lastIndexOf('/') + 1)
    file.stripPrefix("v").stripSuffix(".metadata.json").stripSuffix(".gz").toInt
  }

  /** Iceberg → Hive column type string (hms schema.rs HiveSchemaBuilder). */
  private def hiveType(t: IcebergType): String = {
    import IcebergType._
    t match {
      case BooleanT => "boolean"
      case IntT => "int"
      case LongT => "bigint"
      case FloatT => "float"
      case DoubleT => "double"
      case DecimalT(p, s) => s"decimal($p,$s)"
      case DateT => "date"
      case TimestampT | TimestamptzT => "timestamp"
      case TimeT | TimestampNsT | TimestamptzNsT => "bigint"
      case StringT | UuidT | VariantT => "string"
      case BinaryT | FixedT(_) => "binary"
      case StructT(fs) =>
        fs.map(f => s"${f.name}:${hiveType(f.fieldType)}").mkString("struct<", ",", ">")
      case ListT(_, e, _) => s"array<${hiveType(e)}>"
      case MapT(_, k, _, v, _) => s"map<${hiveType(k)},${hiveType(v)}>"
    }
  }

  private def hmsTable(name: String, md: TableMetadata,
      metadataLocation: String, previous: Option[String]): Table = {
    val sd = new StorageDescriptor()
    sd.setCols(md.currentSchema.fields.map { f =>
      new FieldSchema(f.name, hiveType(f.fieldType), f.doc.orNull)
    }.asJava)
    sd.setLocation(md.location)
    sd.setInputFormat("org.apache.hadoop.mapred.FileInputFormat")
    sd.setOutputFormat("org.apache.hadoop.mapred.FileOutputFormat")
    val serde = new SerDeInfo()
    serde.setName(name)
    serde.setSerializationLib("org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe")
    sd.setSerdeInfo(serde)
    val t = new Table()
    t.setTableName(name)
    t.setDbName(db)
    t.setOwner("graft")
    t.setCreateTime((System.currentTimeMillis() / 1000).toInt)
    t.setSd(sd)
    t.setTableType("EXTERNAL_TABLE")
    val params = scala.collection.mutable.Map(
      "EXTERNAL" -> "TRUE",
      "table_type" -> "ICEBERG",
      "metadata_location" -> metadataLocation)
    previous.foreach(p => params += ("previous_metadata_location" -> p))
    t.setParameters(params.asJava)
    t
  }

  override def createTable(name: String, schema: IcebergSchema,
      spec: PartitionSpec, properties: Map[String, String]): TableMetadata = {
    val md = TableMetadata.newTable(tableDir(name), schema, spec, properties)
    val loc = versionPath(name, 1, metadataSuffix(md))
    io.writeBytes(loc, metadataBytes(md), overwrite = false)
    client.create_table(hmsTable(name, md, loc, None))
    md
  }

  override protected def registerParsed(name: String, md: TableMetadata): Unit = {
    val loc = versionPath(name, 1, metadataSuffix(md))
    io.writeBytes(loc, metadataBytes(md), overwrite = false)
    client.create_table(hmsTable(name, md, loc, None))
  }

  private def getTable(name: String): Option[Table] =
    try Some(client.get_table(db, name))
    catch { case _: NoSuchObjectException => None }

  override def loadTable(name: String): (TableMetadata, Int) = {
    val t = getTable(name).getOrElse(
      throw new IllegalArgumentException(s"no such table: $db.$name"))
    val loc = Option(t.getParameters.get("metadata_location")).getOrElse(
      throw new IllegalArgumentException(s"$db.$name is not an Iceberg table"))
    (TableMetadata.fromJsonString(io.readString(loc)), versionOf(loc))
  }

  override def tableExists(name: String): Boolean = getTable(name).isDefined

  override def dropTable(name: String): Boolean =
    getTable(name) match {
      case None => false
      case Some(_) => client.drop_table(db, name, false); true
    }

  override def listTables(): Seq[String] =
    client.get_all_tables(db).asScala.toSeq

  override def commitTable(name: String, baseVersion: Int,
      updated: TableMetadata): Int = {
    // the Iceberg-on-Hive commit protocol: HMS table lock brackets the
    // check-then-alter so concurrent engines serialize on the metastore
    val lockId = acquireLock(name)
    try {
      val t = getTable(name).getOrElse(
        throw new IllegalArgumentException(s"no such table: $db.$name"))
      val currentLoc = t.getParameters.get("metadata_location")
      val cur = versionOf(currentLoc)
      if (cur != baseVersion)
        throw CommitConflict(s"base version $baseVersion is stale (current: $cur)")
      val next = baseVersion + 1
      val nextLoc = versionPath(name, next, metadataSuffix(updated))
      io.writeBytes(nextLoc, metadataBytes(updated), overwrite = true)
      val newT = hmsTable(name, updated, nextLoc, Some(currentLoc))
      client.alter_table(db, name, newT)
      next
    } finally releaseLock(lockId)
  }

  /** HMS rename = alter_table carrying the new name under the table lock
    * (Iceberg-on-Hive semantics; the metadata pointer rides along
    * unchanged, data never moves). */
  override def renameTable(src: String, dst: String): Unit = {
    val lockId = acquireLock(src)
    try {
      val t = getTable(src).getOrElse(
        throw new IllegalArgumentException(s"no such table: $db.$src"))
      t.setTableName(dst)
      try client.alter_table(db, src, t)
      catch { case e: InvalidOperationException =>
        throw new IllegalArgumentException(s"rename refused: ${e.getMessage}") }
    } finally releaseLock(lockId)
  }

  private def acquireLock(name: String): Long = {
    val comp = new LockComponent(LockType.EXCLUSIVE, LockLevel.TABLE, db)
    comp.setTablename(name)
    val req = new LockRequest(java.util.Collections.singletonList(comp),
      "graft", "localhost")
    val res = client.lock(req)
    var state = res.getState
    val deadline = System.currentTimeMillis() + 60000
    while (state == LockState.WAITING && System.currentTimeMillis() < deadline) {
      Thread.sleep(20)
      state = client.check_lock(new CheckLockRequest(res.getLockid)).getState
    }
    if (state != LockState.ACQUIRED) {
      try releaseLock(res.getLockid) catch { case _: Throwable => () }
      throw CommitConflict(s"could not acquire HMS lock on $db.$name ($state)")
    }
    res.getLockid
  }

  private def releaseLock(lockId: Long): Unit =
    client.unlock(new UnlockRequest(lockId))
}

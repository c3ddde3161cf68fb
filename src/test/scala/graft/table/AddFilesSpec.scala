package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.catalog.HadoopCatalog
import graft.expr.Predicate
import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._

/** Migration path: addFiles registers foreign parquet (no field ids)
  * without rewriting; name mapping keeps the scan id-addressed across
  * renames. */
class AddFilesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("addfiles-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("name mapping JSON round-trips") {
    val nm = NameMapping(Seq(MappedField(1, Seq("id")), MappedField(2, Seq("v", "value"))))
    val round = NameMapping.fromJsonString(nm.toJsonString)
    assert(round === nm)
    assert(round.byName("value") === 2)
    assert(round.namesOf(2) === Seq("v", "value"))
  }

  test("addFiles registers foreign parquet; scan + stats pruning work") {
    import spark.implicits._
    // plain Spark write: NO field ids in the footers
    val dir = java.nio.file.Files.createTempDirectory("foreign-").toString
    (1L to 50L).map(i => (i, i * 2.0)).toDF("id", "v")
      .repartition(2).write.parquet(s"$dir/raw")
    val files = FileIO.fromSpark(spark).listFiles(s"$dir/raw")
      .map(_._1).filter(_.endsWith(".parquet"))

    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-add-").toString,
      FileIO.fromSpark(spark))
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "id", LongT, required = false),
      NestedField(2, "v", DoubleT, required = false)))
    var t = GraftTable.create("migrated", catalog, schema)
    t = t.addFiles(spark, files)

    assert(t.metadata.properties.contains(NameMapping.PropertyKey))
    val df = t.newScan().toDF(spark)
    assert(df.count() === 50)
    assert(df.agg(sum("id")).head.getLong(0) === (1L to 50L).sum)

    // harvested stats drive metrics pruning on the foreign files
    val (planned, all) = t.newScan()
      .withFilter(Predicate.eqTo("id", 1L)).planSummary()
    assert(all === files.size)
    assert(planned <= all)
  }

  /** TIMESTAMP(NANOS)-annotated parquet written directly (Spark's own
    * writer tops out at µs, so the ns fixture is self-made — never
    * assume the driver's testdata unit, it has changed under us). */
  private def writeNsParquet(path: String, rows: Seq[(Long, Long)]): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    val schema = Types.buildMessage()
      .optional(INT64).named("event_id")
      .optional(INT64)
      .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
      .named("ts")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(org.apache.parquet.hadoop.util.HadoopOutputFile.fromPath(
        new org.apache.hadoop.fs.Path(path), new org.apache.hadoop.conf.Configuration()))
      .withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    try rows.foreach { case (id, ns) =>
      val g = gf.newGroup(); g.add("event_id", id); g.add("ts", ns); writer.write(g)
    } finally writer.close()
  }

  test("v3 ns timestamps: ns-annotated parquet registers schema-native, no conf leak") {
    // a TIMESTAMP(NANOS) column under TimestampNsT reads as exact long ns
    // through the scan session clone, with the caller's conf untouched
    val dir = java.nio.file.Files.createTempDirectory("foreign-ns-").toString
    val rows = Seq( // sub-µs precision: exactness is visible in the low digits
      (1L, 1700000000123456789L),
      (2L, 1700000000123456790L),
      (3L, -42L)) // pre-epoch ns
    writeNsParquet(s"$dir/events-ns.parquet", rows)

    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-ns-").toString,
      FileIO.fromSpark(spark))
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "event_id", LongT, required = false),
      NestedField(2, "ts", TimestampNsT, required = false)))
    // conf snapshot: the scan clone must never write through to this session
    val confBefore = graft.SessionConf.ScanConf.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    var t = GraftTable.create("events_ns", catalog, schema)
    t = t.addFiles(spark, Seq(s"$dir/events-ns.parquet"))

    val df = t.newScan().select("event_id", "ts").toDF(spark)
    assert(df.schema("ts").dataType === org.apache.spark.sql.types.LongType)
    assert(df.count() === rows.size)
    // ns values are EXACT longs — no µs truncation anywhere in the path
    assert(df.orderBy("event_id").collect().map(_.getLong(1)).toSeq ===
      rows.map(_._2))

    // hygiene: no scan path mutated the caller's session conf (the clone
    // carries "true"; the parent must still report its pre-scan values)
    confBefore.foreach { case (k, v) =>
      assert(spark.conf.getOption(k) === v, s"session conf leaked: $k")
      assert(!spark.conf.getOption(k).contains("true"), s"session conf leaked: $k")
    }
  }

  test("addFiles refuses a time-unit mismatch instead of mis-scaling") {
    import spark.implicits._
    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-unit-").toString,
      FileIO.fromSpark(spark))

    // µs-annotated file (plain Spark write) under a declared timestamp_ns:
    // serving those integers as ns would be 1000× off — must refuse
    val usDir = java.nio.file.Files.createTempDirectory("foreign-us-").toString
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 03:04:05.123456")))
      .toDF("event_id", "ts").repartition(1).write.parquet(s"$usDir/raw")
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
    val usFiles = FileIO.fromSpark(spark).listFiles(s"$usDir/raw")
      .map(_._1).filter(_.endsWith(".parquet"))
    val nsSchema = IcebergSchema(0, Seq(
      NestedField(1, "event_id", LongT, required = false),
      NestedField(2, "ts", TimestampNsT, required = false)))
    val tNs = GraftTable.create("unit_ns", catalog, nsSchema)
    val e1 = intercept[Exception] { tNs.addFiles(spark, usFiles) }
    assert(causeChain(e1).exists(_.getMessage != null) &&
      causeChain(e1).flatMap(c => Option(c.getMessage)).exists(m =>
        m.contains("time unit") && m.contains("MICROS")), s"got: $e1")

    // and the mirror image: ns-annotated file under a declared µs timestamp
    val nsDir = java.nio.file.Files.createTempDirectory("foreign-ns2-").toString
    writeNsParquet(s"$nsDir/ns.parquet", Seq((1L, 123456789L)))
    val usSchema = IcebergSchema(0, Seq(
      NestedField(1, "event_id", LongT, required = false),
      NestedField(2, "ts", TimestamptzT, required = false)))
    val tUs = GraftTable.create("unit_us", catalog, usSchema)
    val e2 = intercept[Exception] { tUs.addFiles(spark, Seq(s"$nsDir/ns.parquet")) }
    assert(causeChain(e2).flatMap(c => Option(c.getMessage)).exists(m =>
      m.contains("time unit") && m.contains("NANOS")), s"got: $e2")
  }

  private def causeChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq

  test("INT96 timestamps: Hive-style legacy parquet imports with exact values") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("foreign-int96-").toString
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2001-03-04 05:06:07.123456")),
      (2L, java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5")), // pre-epoch
      (3L, java.sql.Timestamp.valueOf("2024-06-15 00:00:00")))
    // the Hive/Impala migration shape: INT96 physical timestamps, no ids
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try rows.toDF("id", "ts").repartition(1).write.parquet(s"$dir/raw")
    finally spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val files = new java.io.File(s"$dir/raw").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq

    // the footer really is INT96-physical
    val pq = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(files.head),
        new org.apache.hadoop.conf.Configuration()))
    val physical = try {
      val fields = pq.getFooter.getFileMetaData.getSchema.getFields
      (0 until fields.size()).map(fields.get)
        .find(_.getName == "ts").get
        .asPrimitiveType().getPrimitiveTypeName.name()
    } finally pq.close()
    assert(physical === "INT96")

    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-int96-").toString,
      FileIO.fromSpark(spark))
    val schema = IcebergSchema.fromSpark(rows.toDF("id", "ts").schema)
    var t = GraftTable.create("int96t", catalog, schema)
    t = AddFiles.addFiles(t, spark, files)

    // timestamps read back EXACTLY (µs precision survives the import)
    val got = t.newScan().toDF(spark).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    assert(got === rows)
    // filters over the imported timestamp column evaluate correctly
    assert(t.newScan().toDF(spark)
      .filter(col("ts") > java.sql.Timestamp.valueOf("2000-01-01 00:00:00"))
      .count() === 2)
  }

  test("rename after migration: mapping alias keeps old files readable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("foreign2-").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "old_name").write.parquet(s"$dir/raw")
    val files = FileIO.fromSpark(spark).listFiles(s"$dir/raw")
      .map(_._1).filter(_.endsWith(".parquet"))

    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-add2-").toString,
      FileIO.fromSpark(spark))
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "id", LongT, required = false),
      NestedField(2, "old_name", StringT, required = false)))
    var t = GraftTable.create("migrated2", catalog, schema)
    t = t.addFiles(spark, files)
    // rename: canonical name changes, mapping still lists the physical one
    t = t.updateSchema().renameColumn("old_name", "new_name").commit()

    val rows = t.newScan().toDF(spark).orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("a", "b"))
    assert(t.newScan().toDF(spark).columns.toSeq === Seq("id", "new_name"))
  }

  test("nested name mapping: renamed struct/list fields in foreign files resolve") {
    import spark.implicits._
    // foreign file with nested physical names the canonical schema renames
    val dir = java.nio.file.Files.createTempDirectory("foreign3-").toString
    Seq((1L, ("x", 10L), Seq(1.5, 2.5)), (2L, ("y", 20L), Seq(3.5)))
      .toDF("id", "s", "vals")
      .select(col("id"),
        col("s._1").as("old_inner").cast("string").as("old_inner"),
        col("s._2").as("old_n"), col("vals"))
      .select(col("id"),
        struct(col("old_inner"), col("old_n")).as("s"), col("vals"))
      .write.parquet(s"$dir/raw")
    val files = FileIO.fromSpark(spark).listFiles(s"$dir/raw")
      .map(_._1).filter(_.endsWith(".parquet"))

    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-add3-").toString,
      FileIO.fromSpark(spark))
    // canonical schema uses NEW nested names; the mapping carries the
    // physical aliases at every level (spec/name_mapping recursion)
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "id", LongT, required = false),
      NestedField(2, "s", StructT(Seq(
        NestedField(4, "new_inner", StringT, required = false),
        NestedField(5, "new_n", LongT, required = false))), required = false),
      NestedField(3, "vals", ListT(6, DoubleT, elementRequired = false),
        required = false)))
    var t = GraftTable.create("migrated3", catalog, schema)
    t = t.addFiles(spark, files)
    val nm = NameMapping(Seq(
      MappedField(1, Seq("id")),
      MappedField(2, Seq("s"), Seq(
        MappedField(4, Seq("old_inner")),
        MappedField(5, Seq("old_n")))),
      MappedField(3, Seq("vals"), Seq(MappedField(6, Seq("element"))))))
    t = t.updateProperties(Map(NameMapping.PropertyKey -> nm.toJsonString), Set.empty)

    // mapping JSON round-trips the nested tree
    assert(NameMapping.fromJsonString(nm.toJsonString) === nm)

    val df = t.newScan().toDF(spark).orderBy("id")
    assert(df.schema("s").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq === Seq("new_inner", "new_n"))
    val rows = df.collect()
    assert(rows.map(_.getStruct(1).getString(0)).toSeq === Seq("x", "y"))
    assert(rows.map(_.getStruct(1).getLong(1)).toSeq === Seq(10L, 20L))
    assert(rows.map(_.getSeq[Double](2).sum).toSeq === Seq(4.0, 3.5))
  }
}

package graft.crypto

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.HadoopCatalog
import graft.expr.Predicate
import graft.io.FileIO
import graft.spec._
import graft.spec.IcebergType._
import graft.table.GraftTable

/** Parquet Modular Encryption over graft tables: write + scan round-trip,
  * keyless reads refused, MoR deletes on encrypted data, DSv2 path. */
class EncryptionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .appName("encryption-spec")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // deterministic 256-bit master key (test keyring only)
  private val masterKey = java.util.Base64.getEncoder.encodeToString(
    Array.tabulate[Byte](32)(_.toByte))
  private val encProps = Map(Encryption.MasterKeysProp -> s"mk1:$masterKey")

  private val schema = IcebergSchema(0, Seq(
    NestedField(1, "id", LongT, required = false),
    NestedField(2, "v", DoubleT, required = false),
    NestedField(3, "s", StringT, required = false)))

  test("encrypted table: append + scan round-trip; raw keyless read refused") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-enc-").toString
    val catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))
    var t = GraftTable.create("enc1", catalog, schema, properties = encProps)
    t = t.append((1L to 100L).map(i => (i, i * 0.5, s"s$i")).toDF("id", "v", "s"))

    val df = t.newScan().toDF(spark)
    assert(df.count() === 100)
    assert(df.agg(sum("id")).head.getLong(0) === (1L to 100L).sum)
    // stats harvested through the encrypted footers still drive pruning
    val (planned, all) = t.newScan().withFilter(Predicate.eqTo("id", 1L)).planSummary()
    assert(planned <= all && all > 0)

    // a reader WITHOUT the keyring cannot open the data files
    val aFile = t.newScan().planFiles().head.file.filePath
    val err = intercept[Exception] {
      spark.read.parquet(aFile).collect()
    }
    def messages(e: Throwable): Seq[String] =
      if (e == null) Nil else Option(e.getMessage).toSeq ++ messages(e.getCause)
    assert(messages(err).exists(m =>
      m.contains("encrypt") || m.contains("crypto") || m.contains("footer key")),
      s"expected a crypto failure, got: ${messages(err).mkString(" | ")}")
  }

  test("MoR position deletes and compaction work on encrypted data") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-enc2-").toString
    val catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))
    var t = GraftTable.create("enc2", catalog, schema,
      properties = encProps + ("write.spark.max-records-per-file" -> "40"))
    t = t.append((1L to 200L).map(i => (i, i * 0.5, s"s$i")).toDF("id", "v", "s"))
    t = t.deleteWhere(Predicate.gt("v", 50.0), spark)
    assert(t.newScan().toDF(spark).count() === 100)

    t = t.rewriteDataFiles(spark)
    assert(t.newScan().planDeletes().isEmpty)
    assert(t.newScan().toDF(spark).count() === 100)
  }

  test("DSv2 BatchScan reads encrypted tables with pushdown") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-enc3-").toString
    val catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))
    var t = GraftTable.create("enc3", catalog, schema, properties = encProps)
    t = t.append((1L to 50L).map(i => (i, i * 1.0, s"s$i")).toDF("id", "v", "s"))

    val df = spark.read.format("graft")
      .option("warehouse", wh).option("table", "enc3").load()
      .filter(col("id") <= 10)
    assert(df.count() === 10)
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(explained.contains("BatchScan"), explained)
  }

  test("column-keys and plaintext-footer modes produce readable tables") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-enc4-").toString
    val catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))
    val props = encProps ++ Map(
      Encryption.ColumnKeysProp -> "mk1:s,v",
      Encryption.PlaintextFooterProp -> "true")
    var t = GraftTable.create("enc4", catalog, schema, properties = props)
    t = t.append((1L to 30L).map(i => (i, i * 0.5, s"s$i")).toDF("id", "v", "s"))
    val back = t.newScan().toDF(spark)
    assert(back.count() === 30)
    assert(back.agg(sum("v")).head.getDouble(0) === (1 to 30).map(_ * 0.5).sum)
  }

  test("v3 encryption-key registry: register, rotate, JSON round-trip, guards") {
    val catalog = new HadoopCatalog(
      java.nio.file.Files.createTempDirectory("graft-enc-keys-").toString,
      FileIO.fromSpark(spark))
    var t = GraftTable.create("enc5", catalog, schema, properties = encProps)

    val k1 = EncryptedKey("k-2024", Array[Byte](1, 2, 3, 4),
      Some("kms://root-a"), Map("algorithm" -> "AES_GCM_256"))
    // v3-only surface
    intercept[IllegalArgumentException] {
      graft.table.Transactions.addEncryptionKey(t, k1)
    }
    t = graft.table.Transactions.upgradeFormatVersion(t, 3)
    t = graft.table.Transactions.addEncryptionKey(t, k1)
    t = graft.table.Transactions.addEncryptionKey(t,
      EncryptedKey("k-2025", Array[Byte](9, 8, 7), Some("kms://root-a")))
    assert(t.metadata.encryptionKeys.map(_.keyId) === Seq("k-2024", "k-2025"))

    // serde: base64 key material survives metadata.json + catalog reload
    val round = TableMetadata.fromJsonString(t.metadata.toJsonString)
    assert(round.encryptionKeys === t.metadata.encryptionKeys)
    assert(GraftTable.load("enc5", catalog).metadata
      .encryptionKeyById("k-2024").get.encryptedKeyMetadata.toSeq === Seq[Byte](1, 2, 3, 4))

    // re-registering an id REPLACES (key rewrap), never duplicates
    t = graft.table.Transactions.addEncryptionKey(t,
      EncryptedKey("k-2024", Array[Byte](42), Some("kms://root-b")))
    assert(t.metadata.encryptionKeys.count(_.keyId == "k-2024") === 1)
    assert(t.metadata.encryptionKeyById("k-2024").get.encryptedById
      === Some("kms://root-b"))

    // rotation guard: the ACTIVE footer key cannot be removed
    t = t.updateProperties(Map(Encryption.FooterKeyProp -> "k-2025"))
    intercept[IllegalArgumentException] {
      graft.table.Transactions.removeEncryptionKey(t, "k-2025")
    }
    t = t.updateProperties(Map(Encryption.FooterKeyProp -> "k-2024"))
    t = graft.table.Transactions.removeEncryptionKey(t, "k-2025")
    assert(t.metadata.encryptionKeys.map(_.keyId) === Seq("k-2024"))
    intercept[IllegalArgumentException] {
      graft.table.Transactions.removeEncryptionKey(t, "k-2025")
    }
  }
}

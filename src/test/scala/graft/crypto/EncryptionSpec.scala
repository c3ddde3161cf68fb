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

  // ---------- AGS1 stream format (encryption/stream.rs) ----------

  private def rnd(n: Int, seed: Long): Array[Byte] = {
    val r = new java.util.Random(seed)
    val a = new Array[Byte](n); r.nextBytes(a); a
  }

  test("AGS1: header layout, single/multi-block/empty round-trips") {
    val key = rnd(16, 1)
    val aad = rnd(16, 2)
    for (n <- Seq(0, 1, 100, AgsStream.PlainBlockSize,
        AgsStream.PlainBlockSize + 1, (2.5 * AgsStream.PlainBlockSize).toInt)) {
      val plain = rnd(n, n)
      val cipher = AgsStream.encrypt(plain, key, aad)
      // header: "AGS1" magic + 1 MiB plain block size, little-endian
      assert(cipher.take(4).toSeq === "AGS1".getBytes("UTF-8").toSeq)
      assert(java.nio.ByteBuffer.wrap(cipher, 4, 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt === 1024 * 1024)
      val blocks = math.max(1, (n + AgsStream.PlainBlockSize - 1) / AgsStream.PlainBlockSize)
      assert(cipher.length === 8 + n + blocks * 28, s"n=$n") // 12B nonce + 16B tag per block
      assert(AgsStream.decrypt(cipher, key, aad).toSeq === plain.toSeq, s"n=$n")
    }
  }

  test("AGS1: wrong key, wrong AAD prefix, tampering, and block reorder all fail") {
    val key = rnd(16, 3)
    val aad = rnd(16, 4)
    val plain = rnd((2.2 * AgsStream.PlainBlockSize).toInt, 5)
    val cipher = AgsStream.encrypt(plain, key, aad)

    intercept[Exception](AgsStream.decrypt(cipher, rnd(16, 99), aad))
    intercept[Exception](AgsStream.decrypt(cipher, key, rnd(16, 98)))

    val tampered = cipher.clone(); tampered(8 + 12 + 5) = (tampered(8 + 12 + 5) ^ 1).toByte
    intercept[Exception](AgsStream.decrypt(tampered, key, aad))

    // swapping two full cipher blocks breaks the per-block index AAD
    val swapped = cipher.clone()
    val b = AgsStream.CipherBlockSize
    System.arraycopy(cipher, 8, swapped, 8 + b, b)
    System.arraycopy(cipher, 8 + b, swapped, 8, b)
    intercept[Exception](AgsStream.decrypt(swapped, key, aad))
  }

  test("StandardKeyMetadata: golden bytes + round-trips") {
    // version byte 1, then one Avro datum: required bytes + two
    // null-union optionals (branch 0 = null, 1 = value)
    val key16 = Array.tabulate[Byte](16)(_.toByte)
    val minimal = StandardKeyMetadata(key16).encode
    assert(minimal.toSeq ===
      (Seq[Byte](1, 0x20) ++ key16 ++ Seq[Byte](0, 0)), "minimal golden")

    val full = StandardKeyMetadata(key16,
      aadPrefix = Some(Array[Byte](10, 20, 30, 40)),
      fileLength = Some(100L)).encode
    assert(full.toSeq === (Seq[Byte](1, 0x20) ++ key16 ++
      Seq[Byte](2, 8, 10, 20, 30, 40) ++      // union branch 1, 4 bytes
      Seq[Byte](2, -56, 1)), "full golden")   // zigzag(100) = 200 = 0xC8 0x01

    for (m <- Seq(
        StandardKeyMetadata(rnd(32, 7)),
        StandardKeyMetadata(rnd(24, 8), Some(rnd(16, 9))),
        StandardKeyMetadata(rnd(16, 10), Some(rnd(16, 11)), Some(Long.MaxValue)))) {
      val back = StandardKeyMetadata.decode(m.encode)
      assert(back.encryptionKey.toSeq === m.encryptionKey.toSeq)
      assert(back.aadPrefix.map(_.toSeq) === m.aadPrefix.map(_.toSeq))
      assert(back.fileLength === m.fileLength)
    }
    intercept[IllegalArgumentException](StandardKeyMetadata.decode(Array[Byte](2, 0)))
    intercept[IllegalArgumentException](StandardKeyMetadata(rnd(15, 12)))
  }

  // ---------- encrypted metadata end-to-end ----------

  private val metaEncProps = encProps ++ Map(
    MetadataEncryption.KeyIdProp -> "mk1",
    "format-version" -> "3")

  test("AGS1 metadata e2e: manifests + list encrypted on disk, scans/DML/time-travel work") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-enc-meta-").toString
    val catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))
    var t = GraftTable.create("encm", catalog, schema, properties = metaEncProps)
    assert(t.metadata.formatVersion === 3)
    t = t.append((1L to 100L).map(i => (i, i * 0.5, s"s$i")).toDF("id", "v", "s"))

    // on disk: manifest list and manifests are AGS1, NOT plain avro
    val snap = t.metadata.currentSnapshot.get
    val io = t.io
    def head4(p: String) = io.readBytes(p).take(4).toSeq
    assert(head4(snap.manifestList) === "AGS1".getBytes("UTF-8").toSeq)
    for (m <- t.currentManifests)
      assert(head4(m.manifestPath) === "AGS1".getBytes("UTF-8").toSeq)

    // snapshot carries key-id; registry holds the KEK + one wrapped entry
    assert(snap.keyId.isDefined)
    assert(t.metadata.encryptionKeys.size === 2)
    val kek = t.metadata.encryptionKeys.find(_.encryptedById.contains("mk1"))
    assert(kek.isDefined, "KEK wrapped by the master key")
    assert(kek.get.properties.contains(MetadataEncryption.KekTimestampProp))
    assert(t.metadata.encryptionKeyById(snap.keyId.get).get
      .encryptedById === Some(kek.get.keyId))

    // scans, pruning, metadata tables all pass through decryption
    assert(t.newScan().toDF(spark).count() === 100)
    val (planned, all) = t.newScan()
      .withFilter(Predicate.eqTo("id", 1L)).planSummary()
    assert(planned <= all && all > 0)
    assert(t.filesDf(spark).count() > 0)

    // second commit REUSES the active KEK: +1 wrapped entry, not +2
    t = t.append(Seq((101L, 1.0, "x")).toDF("id", "v", "s"))
    assert(t.metadata.encryptionKeys.size === 3)
    assert(t.metadata.encryptionKeys.count(_.encryptedById.contains("mk1")) === 1)

    // MoR delete + compaction on encrypted metadata: ids 51..100 have
    // v in (25, 50], so 50 of the 101 rows fall
    t = t.deleteWhere(Predicate.gt("v", 25.0), spark)
    assert(t.newScan().toDF(spark).count() === 51)
    t = t.rewriteDataFiles(spark)
    assert(t.newScan().toDF(spark).count() === 51)

    // time travel through an encrypted older snapshot
    assert(t.newScan().useSnapshot(snap.snapshotId).toDF(spark).count() === 100)

    // without the master keyring the registry chain cannot be unwrapped
    val stripped = t.metadata.copy(
      properties = t.metadata.properties - Encryption.MasterKeysProp)
    intercept[Exception](
      MetadataEncryption.listKeyFor(stripped, t.metadata.currentSnapshot.get))
  }

  test("AGS1 metadata: distributed planning decrypts manifests executor-side") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-enc-dist-").toString
    val catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))
    var t = GraftTable.create("encd", catalog, schema,
      properties = metaEncProps + ("write.spark.max-records-per-file" -> "10"))
    t = t.append((1L to 200L).map(i => (i, i * 0.5, s"s$i")).toDF("id", "v", "s"))
    val local = t.newScan().planFiles()
    val (dist, _) = t.newScan().planCompactDistributed(spark, Set(1, 2, 3), Nil)
    assert(dist.map(_.filePath).toSet === local.map(_.file.filePath).toSet)
    assert(local.size > 1)
  }

  test("encryption.key-id on a v2 table is refused, not silently unencrypted") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-enc-v2-").toString
    val catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))
    val t = GraftTable.create("encv2", catalog, schema,
      properties = encProps + (MetadataEncryption.KeyIdProp -> "mk1"))
    intercept[IllegalArgumentException] {
      t.append(Seq((1L, 1.0, "a")).toDF("id", "v", "s"))
    }
  }

  // ---------- pluggable KMS factory (kms/factory.rs seam) ----------

  test("custom KMS factory via encryption.kms-impl serves data AND metadata wraps") {
    import spark.implicits._
    TestKms.wraps.set(0); TestKms.unwraps.set(0)
    val wh = java.nio.file.Files.createTempDirectory("graft-enc-kms-").toString
    val catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))
    // master-keys names the key ids + turns encryption on; the MATERIAL
    // is deliberately garbage — only the custom KMS can wrap/unwrap
    val junkKey = java.util.Base64.getEncoder.encodeToString(new Array[Byte](32))
    val props = Map(
      Encryption.MasterKeysProp -> s"mk1:$junkKey",
      graft.crypto.Kms.KmsImplProp -> classOf[TestKmsFactory].getName,
      MetadataEncryption.KeyIdProp -> "mk1",
      "format-version" -> "3")
    var t = GraftTable.create("enckms", catalog, schema, properties = props)
    t = t.append((1L to 60L).map(i => (i, i * 0.5, s"s$i")).toDF("id", "v", "s"))

    // the custom client did the wrapping (metadata KEK + parquet keys)
    assert(TestKms.wraps.get() > 0, "custom KMS wrapKey never called")

    // manifests are AGS1; scan round-trips through custom-KMS unwraps
    val snap = t.metadata.currentSnapshot.get
    assert(t.io.readBytes(snap.manifestList).take(4).toSeq
      === "AGS1".getBytes("UTF-8").toSeq)
    assert(t.newScan().toDF(spark).count() === 60)
    assert(TestKms.unwraps.get() > 0, "custom KMS unwrapKey never called")

    // KEK registry entry exists and unwraps ONLY through the custom
    // client — the junk keyring cannot decrypt it
    val kek = t.metadata.encryptionKeys.find(_.encryptedById.contains("mk1")).get
    intercept[Exception] {
      AesGcmWrap.decrypt(new Array[Byte](32), kek.encryptedKeyMetadata)
    }

    // a broken factory class is refused with a clear error
    val bad = Map(graft.crypto.Kms.KmsImplProp -> "not.a.RealClass")
    val e = intercept[IllegalArgumentException] { graft.crypto.Kms.clientFor(bad) }
    assert(e.getMessage.contains("not.a.RealClass"))
  }

  test("unwrapped-KEK cache: one KMS unwrap per KEK, invalidate re-unwraps") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("graft-enc-ttl-").toString
    val catalog = new HadoopCatalog(wh, FileIO.fromSpark(spark))
    val junkKey = java.util.Base64.getEncoder.encodeToString(new Array[Byte](32))
    val props = Map(
      Encryption.MasterKeysProp -> s"mk1:$junkKey",
      graft.crypto.Kms.KmsImplProp -> classOf[TestKmsFactory].getName,
      MetadataEncryption.KeyIdProp -> "mk1",
      "format-version" -> "3")
    var t = GraftTable.create("encttl", catalog, schema, properties = props)
    t = t.append(Seq((1L, 0.5, "a")).toDF("id", "v", "s"))

    // manager.rs kek_cache contract: repeated snapshot-key resolutions
    // cost ONE KMS round-trip per KEK until the cache is invalidated
    MetadataEncryption.invalidateKekCache()
    TestKms.unwraps.set(0)
    val snap = t.metadata.currentSnapshot.get
    assert(MetadataEncryption.listKeyFor(t.metadata, snap).isDefined)
    val first = TestKms.unwraps.get()
    assert(first == 1, s"first resolution must unwrap once, did $first")
    (1 to 3).foreach(_ =>
      assert(MetadataEncryption.listKeyFor(t.metadata, snap).isDefined))
    assert(TestKms.unwraps.get() == first, "later resolutions must hit the cache")
    MetadataEncryption.invalidateKekCache()
    assert(MetadataEncryption.listKeyFor(t.metadata, snap).isDefined)
    assert(TestKms.unwraps.get() == first + 1, "invalidate forces a re-unwrap")
  }
}

/** Deterministic test KMS: XOR "encryption" with a per-key-id pad and
  * call counters — enough to prove the wrap path goes through the
  * factory seam and nothing else can undo it. */
object TestKms {
  val wraps = new java.util.concurrent.atomic.AtomicInteger
  val unwraps = new java.util.concurrent.atomic.AtomicInteger
}

class TestKmsFactory extends graft.crypto.KmsClientFactory {
  override def createKmsClient(properties: Map[String, String]): graft.crypto.KmsClient =
    new graft.crypto.KmsClient {
      private def pad(id: String): Byte =
        (id.getBytes("UTF-8").foldLeft(0)(_ + _) ^ 0x5A).toByte
      override def wrapKey(key: Array[Byte], id: String): Array[Byte] = {
        TestKms.wraps.incrementAndGet()
        key.map(b => (b ^ pad(id)).toByte)
      }
      override def unwrapKey(wrapped: Array[Byte], id: String): Array[Byte] = {
        TestKms.unwraps.incrementAndGet()
        wrapped.map(b => (b ^ pad(id)).toByte)
      }
    }
}

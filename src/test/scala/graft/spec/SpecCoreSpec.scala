package graft.spec

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDate

/** Spec-core unit tests. Murmur3/bucket golden vectors match the public
  * Iceberg spec (Appendix B) — same vectors the reference asserts in
  * transform/bucket.rs:730 (test_hash).
  */
class SpecCoreSpec extends AnyFunSuite {

  test("murmur3 bucket hash golden vectors") {
    assert(Murmur3.hashInt(34) == 2017239379)
    assert(Murmur3.hashLong(34L) == 2017239379)
    assert(Murmur3.hashUnscaled(java.math.BigInteger.valueOf(1420)) == -500754589)
    val days = LocalDate.of(2017, 11, 16).toEpochDay.toInt
    assert(Murmur3.hashInt(days) == -653330422)
    val timeMicros = ((22L * 3600 + 31 * 60 + 8) * 1000000L)
    assert(Murmur3.hashLong(timeMicros) == -662762989)
    val tsMicros = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(Murmur3.hashLong(tsMicros) == -2047944441)
    assert(Murmur3.hashString("iceberg") == 1210000089)
    assert(Murmur3.hashBytes(Array[Byte](0x00, 0x01, 0x02, 0x03)) == -188683207)
    val uuidBytes = Array(0xF7, 0x9C, 0x3E, 0x09, 0x67, 0x7C, 0x4B, 0xBD, 0xA4,
      0x79, 0x3F, 0x34, 0x9C, 0xB7, 0x85, 0xE7).map(_.toByte)
    assert(Murmur3.hashBytes(uuidBytes) == 1488055340)
  }

  test("murmur3 decimal minimal-bytes representation (issue #1981 vectors)") {
    assert(Murmur3.hashUnscaled(java.math.BigInteger.valueOf(1)) == -463810133)
    assert(Murmur3.hashUnscaled(java.math.BigInteger.valueOf(-1)) == -43192051)
    // -1 hashes as [0xFF], 128 as [0x00, 0x80]
    assert(Murmur3.hashUnscaled(java.math.BigInteger.valueOf(128)) ==
      Murmur3.hashBytes(Array[Byte](0x00, 0x80.toByte)))
  }

  test("bucket transform applyValue") {
    import IcebergType._
    val b = Transform.Bucket(10)
    // spark + rust agree: bucket[10] of "abcdefg" == 4 (bucket.rs:473 fixture)
    assert(b.applyValue("abcdefg", StringT) == 4)
    assert(b.applyValue(null, StringT) == null)
    assert(b.applyValue(34, IntT) == 2017239379 % 10)
  }

  test("truncate transform applyValue") {
    import IcebergType._
    val t = Transform.Truncate(10)
    assert(t.applyValue(17, IntT) == 10)
    assert(t.applyValue(-3, IntT) == -10) // floored, not toward zero
    assert(t.applyValue(-3L, LongT) == -10L)
    val ts = Transform.Truncate(3)
    assert(ts.applyValue("iceberg", StringT) == "ice")
    assert(ts.applyValue("ab", StringT) == "ab")
    // code-point (not char) truncation: astral plane chars count once
    assert(ts.applyValue("😀bcd", StringT) == "😀bc")
    val td = Transform.Truncate(50)
    assert(td.applyValue(new java.math.BigDecimal("10.65"), DecimalT(9, 2)) ==
      new java.math.BigDecimal("10.50"))
  }

  test("temporal transforms applyValue") {
    import IcebergType._
    val day20171116 = LocalDate.of(2017, 11, 16).toEpochDay.toInt
    assert(Transform.Year.applyValue(day20171116, DateT) == 47)
    assert(Transform.Month.applyValue(day20171116, DateT) == 47 * 12 + 10)
    assert(Transform.Day.applyValue(day20171116, DateT) == day20171116)
    val tsMicros = java.time.LocalDateTime.of(2017, 11, 16, 22, 31, 8)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(Transform.Year.applyValue(tsMicros, TimestampT) == 47)
    assert(Transform.Day.applyValue(tsMicros, TimestampT) == day20171116)
    assert(Transform.Hour.applyValue(tsMicros, TimestampT) == day20171116 * 24 + 22)
    // pre-epoch floors (not truncates)
    val pre = java.time.LocalDateTime.of(1969, 12, 31, 23, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    assert(Transform.Day.applyValue(pre, TimestampT) == -1)
    assert(Transform.Hour.applyValue(pre, TimestampT) == -1)
    // human strings
    assert(Transform.Day.toHumanString(day20171116) == "2017-11-16")
    assert(Transform.Month.toHumanString(47 * 12 + 10) == "2017-11")
    assert(Transform.Hour.toHumanString(day20171116 * 24 + 22) == "2017-11-16-22")
    assert(Transform.Year.toHumanString(47) == "2017")
  }

  test("transform parse round-trip") {
    for (s <- Seq("identity", "void", "year", "month", "day", "hour",
        "bucket[16]", "truncate[4]"))
      assert(Transform.parse(s).name == s)
  }

  test("table metadata golden JSON round-trip (reference example_table_metadata_v2.json)") {
    val raw = scala.io.Source.fromFile(
      "/root/reference/crates/iceberg/testdata/example_table_metadata_v2.json").mkString
      .replace("{{ table_location }}", "s3://b/wh/t")
      .replace("{{ manifest_list_1_location }}", "s3://b/wh/t/ml1.avro")
      .replace("{{ manifest_list_2_location }}", "s3://b/wh/t/ml2.avro")
      .replace("{{ table_metadata_1_location }}", "s3://b/wh/t/m1.json")
    val md = TableMetadata.fromJsonString(raw)
    assert(md.formatVersion == 2)
    assert(md.tableUuid == "9c12d441-03fe-4693-9a96-a0705ddf69c1")
    assert(md.lastSequenceNumber == 34)
    assert(md.currentSchemaId == 1)
    assert(md.schemas.size == 2)
    assert(md.currentSchema.fields.size == 8)
    assert(md.currentSchema.identifierFieldIds == Seq(1, 2))
    assert(md.defaultSpec.fields.head.transform == Transform.Identity)
    assert(md.defaultSpec.fields.head.fieldId == 1000)
    assert(md.currentSnapshotId.contains(3055729675574597004L))
    assert(md.currentSnapshot.get.sequenceNumber == 1)
    assert(md.currentSnapshot.get.schemaId.contains(1))
    assert(md.snapshotLog.size == 2)
    assert(md.sortOrders.head.orderId == 3)
    assert(md.sortOrders.head.fields(1).transform == Transform.Bucket(4))
    // round-trip through our writer and back
    val md2 = TableMetadata.fromJsonString(md.toJsonString)
    assert(md2 == md)
  }

  test("schema spark conversion carries field ids") {
    val s = IcebergSchema(0, Seq(
      NestedField(1, "id", IcebergType.LongT, required = true),
      NestedField(2, "name", IcebergType.StringT, required = false)))
    val st = s.toSpark
    assert(st.fields(0).metadata.getLong(IcebergSchema.FieldIdKey) == 1L)
    assert(!st.fields(0).nullable)
    assert(st.fields(1).nullable)
    val back = IcebergSchema.fromSpark(st)
    assert(back.fields.map(_.name) == Seq("id", "name"))
  }

  test("v3 nanosecond timestamp types: serde round-trip + long mapping") {
    // datatypes.rs:260-268 — TimestampNs / TimestamptzNs
    assert(IcebergType.parsePrimitive("timestamp_ns") == IcebergType.TimestampNsT)
    assert(IcebergType.parsePrimitive("timestamptz_ns") == IcebergType.TimestamptzNsT)
    assert(IcebergType.TimestampNsT.jsonName == "timestamp_ns")
    // Spark has no ns timestamp: both map to long (exact integer ns)
    assert(IcebergType.toSpark(IcebergType.TimestampNsT) ==
      org.apache.spark.sql.types.LongType)
    assert(IcebergType.toSpark(IcebergType.TimestamptzNsT) ==
      org.apache.spark.sql.types.LongType)
    // schema JSON round-trip preserves the ns types
    val s = IcebergSchema(0, Seq(
      NestedField(1, "ts", IcebergType.TimestampNsT, required = false),
      NestedField(2, "tstz", IcebergType.TimestamptzNsT, required = false)))
    val back = IcebergSchema.schemaFromJson(s.toJson)
    assert(back == s)
  }

  test("v3 field defaults: JSON single-value serde round-trip per type") {
    import graft.meta.SingleValue.{toJsonValue, fromJsonValue}
    import IcebergType._
    // spec Appendix D JSON single-value forms (values/ser.rs try_into_json)
    val cases: Seq[(IcebergType, Any, String)] = Seq(
      (BooleanT, true, "true"),
      (IntT, 42, "42"),
      (LongT, 9007199254740993L, "9007199254740993"), // > 2^53: must not go through double
      (DoubleT, 2.5d, "2.5"),
      (StringT, "dflt", "\"dflt\""),
      (DateT, 19723, "\"2024-01-01\""), // epoch-day → ISO date string
      (TimestampT, 1700000000000000L, "\"2023-11-14T22:13:20\""),
      (DecimalT(9, 2), new java.math.BigDecimal("12.34"), "\"12.34\""))
    cases.foreach { case (t, v, json) =>
      assert(toJsonValue(t, v).toString === json, s"serialize $t")
      assert(fromJsonValue(t, toJsonValue(t, v)) === v, s"round-trip $t")
    }
    // defaults embed in field JSON and survive the schema round trip
    val s = IcebergSchema(0, Seq(
      NestedField(1, "d", DateT, required = false,
        initialDefault = Some(19723), writeDefault = Some(19724)),
      NestedField(2, "n", LongT, required = false)))
    val back = IcebergSchema.schemaFromJson(s.toJson)
    assert(back === s)
    assert(s.toJson.toString.contains("\"initial-default\":\"2024-01-01\""))
  }

  test("partition spec build + path rendering") {
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "l_orderkey", IcebergType.LongT, required = true),
      NestedField(2, "l_shipdate", IcebergType.TimestamptzT, required = false)))
    val spec = PartitionSpec.build(schema,
      Seq("l_shipdate" -> Transform.Day, "l_orderkey" -> Transform.Bucket(8)))
    assert(spec.fields.map(_.fieldId) == Seq(1000, 1001))
    assert(spec.fields.map(_.name) == Seq("l_shipdate_day", "l_orderkey_bucket"))
    val pt = spec.partitionType(schema)
    assert(pt.fields.map(_.fieldType) == Seq(IcebergType.DateT, IcebergType.IntT))
    val days = LocalDate.of(1995, 3, 15).toEpochDay.toInt
    assert(spec.partitionPath(Seq(days, 3)) == "l_shipdate_day=1995-03-15/l_orderkey_bucket=3")
  }
}

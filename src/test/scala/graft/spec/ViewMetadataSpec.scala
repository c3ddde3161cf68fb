package graft.spec

import org.scalatest.funsuite.AnyFunSuite

/** ViewMetadata serde against the reference's golden v1 JSON
  * (view_metadata.rs:438-478 test_view_data_v1). */
class ViewMetadataSpec extends AnyFunSuite {

  private val golden =
    """{
      |  "view-uuid": "fa6506c3-7681-40c8-86dc-e36561f83385",
      |  "format-version" : 1,
      |  "location" : "s3://bucket/warehouse/default.db/event_agg",
      |  "current-version-id" : 1,
      |  "properties" : { "comment" : "Daily event counts" },
      |  "versions" : [ {
      |    "version-id" : 1,
      |    "timestamp-ms" : 1573518431292,
      |    "schema-id" : 1,
      |    "default-catalog" : "prod",
      |    "default-namespace" : [ "default" ],
      |    "summary" : { "engine-name" : "Spark", "engineVersion" : "3.3.2" },
      |    "representations" : [ {
      |      "type" : "sql",
      |      "sql" : "SELECT\n    COUNT(1), CAST(event_ts AS DATE)\nFROM events\nGROUP BY 2",
      |      "dialect" : "spark"
      |    } ]
      |  } ],
      |  "schemas": [ {
      |    "schema-id": 1,
      |    "type" : "struct",
      |    "fields" : [ {
      |      "id" : 1, "name" : "event_count", "required" : false,
      |      "type" : "int", "doc" : "Count of events"
      |    } ]
      |  } ],
      |  "version-log" : [ { "timestamp-ms" : 1573518431292, "version-id" : 1 } ]
      |}""".stripMargin

  test("golden v1 view metadata parses and round-trips") {
    val md = ViewMetadata.fromJsonString(golden)
    assert(md.viewUuid === "fa6506c3-7681-40c8-86dc-e36561f83385")
    assert(md.formatVersion === 1)
    assert(md.currentVersionId === 1)
    assert(md.properties === Map("comment" -> "Daily event counts"))
    val v = md.currentVersion
    assert(v.schemaId === 1)
    assert(v.timestampMs === 1573518431292L)
    assert(v.defaultCatalog === Some("prod"))
    assert(v.defaultNamespace === Seq("default"))
    assert(v.summary("engine-name") === "Spark")
    assert(v.sqlFor("spark").get.startsWith("SELECT"))
    assert(v.sqlFor("trino") === None)
    assert(md.schemaById(1).get.fields.map(_.name) === Seq("event_count"))
    assert(md.versionLog === Seq((1573518431292L, 1)))
    // round-trip through our writer
    val round = ViewMetadata.fromJsonString(md.toJsonString)
    assert(round === md)
  }

  test("newView builds a coherent single-version v1 tree") {
    val schema = IcebergSchema(0, Seq(
      NestedField(1, "n", IcebergType.LongT, required = false)))
    val md = ViewMetadata.newView("/wh/v1", "SELECT count(*) AS n FROM t",
      "spark", schema, Some("graft"), Seq("default"))
    assert(md.currentVersion.sqlFor("spark").get.contains("count"))
    assert(md.versionLog.map(_._2) === Seq(1))
    assert(ViewMetadata.fromJsonString(md.toJsonString) === md)
  }
}

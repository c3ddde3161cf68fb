package graft.catalog

import org.scalatest.funsuite.AnyFunSuite

import graft.spec.{IcebergSchema, IcebergType, NestedField}

/** Session-scoped catalog surface (reference catalog/session.rs):
  * context-carrying operations, per-session binding isolation, and the
  * redacting Credential wrapper. */
class SessionCatalogSpec extends AnyFunSuite {

  private def schema = IcebergSchema(0, Seq(
    NestedField(1, "id", IcebergType.LongT, required = false)))

  test("credentials redact in toString, compare constant-time by value") {
    val c = Credential("hunter2")
    assert(!c.toString.contains("hunter2"))
    assert(c.expose == "hunter2")
    assert(c == Credential("hunter2"))
    assert(c != Credential("other"))
  }

  test("bound sessions operate on the shared backend; context props flow") {
    val wh = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val base = Map("warehouse" -> wh)
    val sc = SessionCatalog.over("hadoop", base)

    val alice = SessionContext.empty().copy(identity = Some("alice"),
      credentials = Map("token" -> Credential("secret-a")))
    val bob = SessionContext.empty().copy(identity = Some("bob"))

    sc.createNamespace(alice, "teama", Map("owner" -> "alice"))
    assert(sc.namespaceExists(bob, "teama"),
      "both sessions see the shared backend state")
    assert(sc.listNamespaces(bob, parent = None) == Seq("teama"))

    // table lifecycle through the session surface
    val cat = SessionCatalog.bind("hadoop", base, alice)
    cat.createTable("teama.t", schema)
    assert(sc.tableExists(bob, "teama.t"))
    assert(sc.listTables(bob, ns = Some("teama")) == Seq("teama.t"))
    assert(sc.loadTable(bob, "teama.t")._1.currentSchema.fields.map(_.name)
      == Seq("id"))
    assert(sc.dropTable(alice, "teama.t"))
    assert(!sc.tableExists(bob, "teama.t"))
    assert(sc.dropNamespace(alice, "teama"))
  }

  test("same session id with refreshed credentials REBINDS; same context reuses") {
    val wh = java.nio.file.Files.createTempDirectory("graft-sess3").toString
    // bindings are observable through state isolation: each bind
    // constructs a FRESH memory catalog, so namespace state created
    // through one binding is invisible through a new one
    val sc = SessionCatalog.over("memory", Map("warehouse" -> wh))
    val ctxA = SessionContext("s1", Some("alice"),
      credentials = Map("token" -> Credential("expired")))
    val ctxA2 = SessionContext("s1", Some("alice"),
      credentials = Map("token" -> Credential("refreshed")))

    sc.createNamespace(ctxA, "na", Map.empty)
    assert(sc.namespaceExists(ctxA, "na"), "same context reuses its binding")
    // refreshed credential under the SAME session id must rebind: the
    // fresh memory backend has no namespace state
    assert(!sc.namespaceExists(ctxA2, "na"),
      "refreshed credentials must bind a fresh backend, not reuse stale")
    // and the original context still resolves its own binding
    assert(sc.namespaceExists(ctxA, "na"))
  }

  test("manifest cache size flows from the session conf key") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false")
      .appName("sess-cache-conf").getOrCreate()
    try {
      val wh = java.nio.file.Files.createTempDirectory("graft-sess4").toString
      graft.meta.ManifestCache.configure(graft.meta.ManifestCache.DefaultCapacityBytes)
      spark.conf.set("spark.graft.manifest-cache-size-bytes", "12345")
      spark.conf.set("spark.sql.catalog.scfg", "graft.sources.GraftCatalogPlugin")
      spark.conf.set("spark.sql.catalog.scfg.warehouse", wh)
      spark.sql("SHOW NAMESPACES IN scfg").collect() // forces initialize
      assert(graft.meta.ManifestCache.capacity == 12345L)
      // malformed value surfaces a clear error naming the key
      spark.conf.set("spark.graft.manifest-cache-size-bytes", "32m")
      spark.conf.set("spark.sql.catalog.scfg2", "graft.sources.GraftCatalogPlugin")
      spark.conf.set("spark.sql.catalog.scfg2.warehouse", wh)
      val e = intercept[Exception] {
        spark.sql("SHOW NAMESPACES IN scfg2").collect()
      }
      assert(e.getMessage.contains("manifest-cache-size-bytes") ||
        Option(e.getCause).exists(_.getMessage.contains("manifest-cache-size-bytes")))
    } finally {
      graft.meta.ManifestCache.configure(graft.meta.ManifestCache.DefaultCapacityBytes)
      spark.stop()
    }
  }

  test("bind overlays session properties and credentials onto the base") {
    val wh = java.nio.file.Files.createTempDirectory("graft-sess2").toString
    val ctx = SessionContext("s-1", Some("carol"),
      properties = Map("client.region" -> "eu"),
      credentials = Map("token" -> Credential("t0k")))
    // memory catalog ignores the extras — the contract here is that bind
    // constructs successfully with the overlay applied (REST/JDBC
    // backends consume credential.*/session.* through normal plumbing)
    val cat = SessionCatalog.bind("memory", Map("warehouse" -> wh), ctx)
    cat.createTable("t", schema)
    assert(cat.tableExists("t"))
  }
}

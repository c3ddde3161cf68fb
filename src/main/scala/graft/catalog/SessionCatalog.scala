package graft.catalog

/** Session-scoped catalog access — the reference's `SessionCatalog`
  * surface (catalog/session.rs:47-135): every operation carries a
  * [[SessionContext]] (session id, caller identity, per-session
  * properties, credentials) so a multi-tenant gateway can route one
  * physical catalog to many principals. The reference ships the trait
  * with no implementation; this engine additionally provides
  * [[SessionCatalog.bind]], which materializes a plain [[Catalog]] for
  * one context via [[CatalogLoader]] — session properties overlay the
  * base configuration and credentials arrive as `credential.<name>`
  * entries, so REST/JDBC backends pick them up through their normal
  * property plumbing.
  */
final case class SessionContext(
    sessionId: String,
    identity: Option[String] = None,
    properties: Map[String, String] = Map.empty,
    credentials: Map[String, Credential] = Map.empty)

object SessionContext {
  /** An empty context with a fresh random session id (session.rs:69). */
  def empty(): SessionContext =
    SessionContext(java.util.UUID.randomUUID().toString)
}

/** A secret that never prints (session.rs:111 `Credential`: zeroizing,
  * redacted Debug). JVM strings cannot be zeroized reliably, so the
  * guarantee here is redaction: toString never reveals the value and
  * only [[expose]] returns it. */
final class Credential(private val value: String) {
  def expose: String = value
  override def toString: String = "Credential(***)"
  override def equals(o: Any): Boolean = o match {
    case c: Credential => java.security.MessageDigest.isEqual(
      value.getBytes("UTF-8"), c.value.getBytes("UTF-8"))
    case _ => false
  }
  override def hashCode(): Int = value.hashCode
}

object Credential {
  def apply(v: String): Credential = new Credential(v)
}

/** Context-carrying catalog operations (catalog/session.rs:135 — the
  * same namespace/table surface as [[Catalog]], each method scoped by a
  * [[SessionContext]]). */
trait SessionCatalog {
  def listNamespaces(ctx: SessionContext, parent: Option[String]): Seq[String]
  def createNamespace(ctx: SessionContext, ns: String,
      properties: Map[String, String]): Unit
  def namespaceExists(ctx: SessionContext, ns: String): Boolean
  def dropNamespace(ctx: SessionContext, ns: String): Boolean
  def listTables(ctx: SessionContext, ns: Option[String]): Seq[String]
  def tableExists(ctx: SessionContext, name: String): Boolean
  def loadTable(ctx: SessionContext, name: String): (graft.spec.TableMetadata, Int)
  def dropTable(ctx: SessionContext, name: String): Boolean
}

object SessionCatalog {

  /** Materialize a context-bound [[Catalog]]: base loader properties,
    * overlaid with the session's properties, plus credentials as
    * `credential.<name>`. Each distinct context binds its own backend
    * instance, so per-principal credentials never bleed across
    * sessions. */
  def bind(catalogType: String, baseProperties: Map[String, String],
      ctx: SessionContext): Catalog = {
    val credProps = ctx.credentials.map { case (k, c) =>
      s"credential.$k" -> c.expose
    }
    CatalogLoader.load(catalogType,
      baseProperties ++ ctx.properties ++ credProps ++
        ctx.identity.map("session.identity" -> _).toMap +
        ("session.id" -> ctx.sessionId))
  }

  /** Adapt any property-configured backend into the session surface:
    * every call binds (or reuses) the context's catalog. Bindings are
    * keyed by the FULL context (id, identity, properties, credential
    * values) — a refreshed credential under the same session id rebinds
    * instead of silently reusing the stale backend — and the binding
    * cache is LRU-capped so a long-lived gateway cannot accrete one
    * backend per historical session. */
  def over(catalogType: String, baseProperties: Map[String, String]): SessionCatalog =
    new SessionCatalog {
      private val MaxBindings = 64
      // keyed by the CONTEXT itself: SessionContext equality goes through
      // Credential's constant-time compare and no secret is ever copied
      // into a plain string key
      private val bound =
        new java.util.LinkedHashMap[SessionContext, Catalog](16, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[SessionContext, Catalog]): Boolean =
            size() > MaxBindings
        }
      private def cat(ctx: SessionContext): Catalog = {
        // bind OUTSIDE the lock — a backend bind does network/DDL work
        // (REST handshake, JDBC connect) and must not stall every other
        // session's operations; a racing duplicate bind is idempotent
        // and the first insert wins (the WeighedLru pattern)
        bound.synchronized {
          val hit = bound.get(ctx)
          if (hit != null) return hit
        }
        val fresh = bind(catalogType, baseProperties, ctx)
        bound.synchronized {
          val prior = bound.get(ctx)
          if (prior != null) prior
          else { bound.put(ctx, fresh); fresh }
        }
      }

      override def listNamespaces(ctx: SessionContext,
          parent: Option[String]): Seq[String] = {
        // backends list every ancestor (Catalog.withAncestors), so
        // level-scoping is a plain segment filter
        val all = cat(ctx).listNamespaces()
        parent match {
          case None => all.filterNot(_.contains('.'))
          case Some(p) => all.filter(n =>
            n.startsWith(p + ".") && !n.stripPrefix(p + ".").contains('.'))
        }
      }
      override def createNamespace(ctx: SessionContext, ns: String,
          properties: Map[String, String]): Unit =
        cat(ctx).createNamespace(ns, properties)
      override def namespaceExists(ctx: SessionContext, ns: String): Boolean =
        cat(ctx).namespaceExists(ns)
      override def dropNamespace(ctx: SessionContext, ns: String): Boolean =
        cat(ctx).dropNamespace(ns)
      override def listTables(ctx: SessionContext, ns: Option[String]): Seq[String] = {
        val all = cat(ctx).listTables()
        ns match {
          case None => all
          case Some(p) => all.filter(t =>
            t.startsWith(p + ".") && !t.stripPrefix(p + ".").contains('.'))
        }
      }
      override def tableExists(ctx: SessionContext, name: String): Boolean =
        cat(ctx).tableExists(name)
      override def loadTable(ctx: SessionContext,
          name: String): (graft.spec.TableMetadata, Int) =
        cat(ctx).loadTable(name)
      override def dropTable(ctx: SessionContext, name: String): Boolean =
        cat(ctx).dropTable(name)
    }
}

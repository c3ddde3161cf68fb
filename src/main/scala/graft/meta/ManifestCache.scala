package graft.meta

/** Driver-side cache of parsed manifest / manifest-list Avro.
  *
  * Manifest files are immutable once written (a new commit writes new
  * paths), so caching by path is always sound; the schema/spec version is
  * folded into the key because bound values are decoded through the
  * current schema's types (int→long promotion changes parsed values).
  *
  * Bound + eviction mirror the reference's ObjectCache
  * (io/object_cache.rs:28-80 + cache.rs trait): SIZE-WEIGHTED in
  * approximate in-memory bytes (their moka weigher), LRU eviction down to
  * the configured capacity, default 32 MiB, and capacity 0 = cache
  * disabled (load-through, nothing retained). Capacity is tunable via
  * the session conf `spark.graft.manifest-cache-size-bytes` (read by the
  * catalog plugin at initialize — ONE key, order-independent across
  * catalogs), or call [[configure]] directly. The cache is process-wide
  * (the reference's is per-Table) because Verify/Bench plan the same
  * snapshot many times
  * across table handles; at 100 TB repeated planning hits the same few
  * thousand KB-scale manifests, so 32 MiB of parsed entries is the
  * steady state, never data.
  */
object ManifestCache {

  /** Reference default: 32 MiB (io/object_cache.rs:28). */
  val DefaultCapacityBytes: Long = 32L * 1024 * 1024

  @volatile private var capacityBytes: Long = DefaultCapacityBytes

  /** Set the capacity in approximate bytes; 0 disables caching entirely
    * (the reference's `with_disabled_cache`). Shrinking evicts LRU-first
    * on the next insert. */
  def configure(sizeBytes: Long): Unit = {
    require(sizeBytes >= 0, s"cache size must be >= 0: $sizeBytes")
    capacityBytes = sizeBytes
    if (sizeBytes == 0) invalidateAll()
  }

  def capacity: Long = capacityBytes

  private final case class Weighted[V](value: V, weight: Long)

  /** Access-ordered LRU with a byte-weight bound (the moka weigher
    * analogue). All access under the map's own lock — driver-side
    * planning touches this a few thousand times per query, never per
    * row. */
  private final class WeighedLru[V] {
    private var total = 0L
    private val map = new java.util.LinkedHashMap[String, Weighted[V]](64, 0.75f, true)

    def getOrLoad(key: String, weigh: V => Long)(load: => V): V = {
      val cap = capacityBytes
      if (cap <= 0L) return load // disabled: pure load-through
      synchronized {
        val hit = map.get(key)
        if (hit != null) return hit.value
      }
      // load OUTSIDE the lock (Avro IO) — a racing duplicate is
      // idempotent and the first insert wins
      val loaded = load
      val w = math.max(1L, weigh(loaded))
      synchronized {
        val prior = map.get(key)
        if (prior != null) return prior.value
        map.put(key, Weighted(loaded, w))
        total += w
        val it = map.entrySet().iterator()
        while (total > cap && it.hasNext) {
          val eldest = it.next()
          if (eldest.getKey != key) { // never evict the row just inserted
            total -= eldest.getValue.weight
            it.remove()
          }
        }
      }
      loaded
    }

    def clear(): Unit = synchronized { map.clear(); total = 0L }
    def weight: Long = synchronized(total)
    def size: Int = synchronized(map.size())
  }

  // ONE shared weighed store for both kinds (the reference keeps
  // manifests and manifest lists in a single weighed cache,
  // io/object_cache.rs CachedItem) — two independent stores would let
  // the process hold 2× the configured budget
  private val store = new WeighedLru[AnyRef]
  private object manifests {
    def getOrLoad(key: String, weigh: Seq[ManifestEntry] => Long)(
        load: => Seq[ManifestEntry]): Seq[ManifestEntry] =
      store.getOrLoad("m:" + key,
        (v: AnyRef) => weigh(v.asInstanceOf[Seq[ManifestEntry]]))(load)
        .asInstanceOf[Seq[ManifestEntry]]
  }
  private object lists {
    def getOrLoad(key: String, weigh: Seq[ManifestFile] => Long)(
        load: => Seq[ManifestFile]): Seq[ManifestFile] =
      store.getOrLoad("l:" + key,
        (v: AnyRef) => weigh(v.asInstanceOf[Seq[ManifestFile]]))(load)
        .asInstanceOf[Seq[ManifestFile]]
  }

  // Approximate in-memory bytes (size_of_val analogue): a fixed struct
  // overhead per entry plus its variable-size payloads. Exactness doesn't
  // matter — the bound just has to scale with what's actually held.
  private def entryWeight(es: Seq[ManifestEntry]): Long =
    es.foldLeft(64L) { (acc, e) =>
      acc + 256L + e.dataFile.filePath.length +
        16L * (e.dataFile.columnSizes.size + e.dataFile.valueCounts.size +
          e.dataFile.nullValueCounts.size + e.dataFile.lowerBounds.size +
          e.dataFile.upperBounds.size)
    }

  private def listWeight(ms: Seq[ManifestFile]): Long =
    ms.foldLeft(64L) { (acc, m) =>
      acc + 192L + m.manifestPath.length + 48L * m.partitions.size
    }

  def manifest(key: String)(load: => Seq[ManifestEntry]): Seq[ManifestEntry] =
    manifests.getOrLoad(key, entryWeight)(load)

  def manifestList(key: String)(load: => Seq[ManifestFile]): Seq[ManifestFile] =
    lists.getOrLoad(key, listWeight)(load)

  def invalidateAll(): Unit = store.clear()

  /** Introspection for specs: (entry count, held weight) of the shared
    * store (both kinds live in the one weighed cache). */
  def stats: (Int, Long) = (store.size, store.weight)
}

package graft.spec

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterEach

import graft.meta.{DataFile, ManifestCache, ManifestEntry, ManifestFile}

/** Size-weighted cache bound + disabled mode — the reference ObjectCache
  * contract (io/object_cache.rs:28-80): byte-weighted capacity, LRU
  * eviction down to the bound, capacity 0 = pure load-through. */
class ManifestCacheSpec extends AnyFunSuite with BeforeAndAfterEach {

  override def beforeEach(): Unit = {
    ManifestCache.invalidateAll()
    ManifestCache.configure(ManifestCache.DefaultCapacityBytes)
  }
  override def afterEach(): Unit = beforeEach()

  private def entries(tag: String, n: Int): Seq[ManifestEntry] =
    (1 to n).map(i => ManifestEntry(1, Some(1L), Some(1L), Some(1L),
      DataFile(content = 0, filePath = s"/w/$tag/f$i.parquet",
        fileFormat = "PARQUET", partition = Nil, recordCount = 10L,
        fileSizeInBytes = 1024L)))

  test("eviction honors the configured byte bound, LRU first") {
    // each 10-entry value weighs ~64 + 10*(256+path+0) ≈ 2.8 KB; a 6 KB
    // bound holds two values, never three
    ManifestCache.configure(6 * 1024)
    var loads = 0
    def load(k: String): Seq[ManifestEntry] =
      ManifestCache.manifest(k) { loads += 1; entries(k, 10) }

    load("a"); load("b")
    assert(loads == 2)
    load("a") // hit — and refreshes a's recency
    assert(loads == 2)
    val (n2, w2) = ManifestCache.stats
    assert(n2 == 2 && w2 <= 6 * 1024, s"held $n2 entries / $w2 bytes")

    load("c") // evicts the LRU entry — "b", since "a" was just touched
    val (n3, w3) = ManifestCache.stats
    assert(w3 <= 6 * 1024, s"bound violated: $w3")
    assert(n3 == 2)
    load("a")
    assert(loads == 3, "'a' must still be cached after b's eviction")
    load("b")
    assert(loads == 4, "'b' must have been evicted")
  }

  test("an oversized single value is admitted then evicted on next insert") {
    ManifestCache.configure(1024) // smaller than one 10-entry value
    ManifestCache.manifest("big") { entries("big", 10) }
    // the just-inserted key survives its own insert (never self-evict)...
    assert(ManifestCache.stats._1 == 1)
    // ...but the next insert pushes the cache back under the bound
    ManifestCache.manifest("next") { entries("next", 1) }
    val (_, w) = ManifestCache.stats
    assert(w <= 1024, s"bound violated after follow-up insert: $w")
  }

  test("capacity 0 disables caching: every access loads") {
    ManifestCache.configure(0)
    var loads = 0
    def load(): Seq[ManifestFile] = ManifestCache.manifestList("x") {
      loads += 1
      Seq(ManifestFile("/w/m1.avro", 100L, 0, 0, 1L, 1L, 1L, 1, 0, 0,
        10L, 0L, 0L, Nil))
    }
    load(); load(); load()
    assert(loads == 3, "disabled cache must load through every time")
    assert(ManifestCache.stats._1 == 0, "nothing retained when disabled")
  }

  test("reconfiguring to 0 clears retained state") {
    ManifestCache.manifest("k") { entries("k", 3) }
    assert(ManifestCache.stats._1 == 1)
    ManifestCache.configure(0)
    assert(ManifestCache.stats._1 == 0)
  }
}

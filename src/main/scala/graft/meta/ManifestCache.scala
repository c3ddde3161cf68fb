package graft.meta

import java.util.concurrent.ConcurrentHashMap

/** Driver-side cache of parsed manifest / manifest-list Avro.
  *
  * Manifest files are immutable once written (a new commit writes new
  * paths), so caching by path is always sound; the schema/spec version is
  * folded into the key because bound values are decoded through the
  * current schema's types (int→long promotion changes parsed values).
  *
  * The reference keeps the analogous per-scan object cache in
  * `scan/cache.rs`; here the cache is process-wide because Verify/Bench
  * plan the same snapshot many times. Bounded: full clear past `MaxEntries`
  * (manifest KB-scale; at the default 512 this is a few hundred MB worst
  * case — far below driver heap, and repeated planning of a 100 TB
  * snapshot hits the same few thousand manifests).
  */
object ManifestCache {
  private val MaxEntries = 512
  private val manifests = new ConcurrentHashMap[String, Seq[ManifestEntry]]()
  private val lists = new ConcurrentHashMap[String, Seq[ManifestFile]]()

  def manifest(key: String)(load: => Seq[ManifestEntry]): Seq[ManifestEntry] = {
    if (manifests.size > MaxEntries) manifests.clear()
    manifests.computeIfAbsent(key, _ => load)
  }

  def manifestList(key: String)(load: => Seq[ManifestFile]): Seq[ManifestFile] = {
    if (lists.size > MaxEntries) lists.clear()
    lists.computeIfAbsent(key, _ => load)
  }

  def invalidateAll(): Unit = { manifests.clear(); lists.clear() }
}

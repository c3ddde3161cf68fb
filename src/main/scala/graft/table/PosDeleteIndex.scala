package graft.table

import graft.meta.ReservedFieldIds

/** Binds position-delete files to the data files they can touch, from
  * manifest metadata alone (the reference's DeleteFileIndex role,
  * `delete_file_index.rs`): without this every scan task opens EVERY
  * pos-delete parquet file — O(tasks × delete files) footer reads at
  * 100 TB. Binding uses, in order:
  *
  *  - `referenced_data_file` (exact: the whole delete file targets one
  *    data file — DV convention, also set when file_path min == max);
  *  - `file_path` lower/upper bounds harvested at delete-write time
  *    under the reserved delete-schema ids (interval stabbing over the
  *    sorted ranges with a prefix-max cutoff — delete files are written
  *    path-sorted, so ranges rarely overlap and lookups stay near
  *    O(log n));
  *  - no metadata at all (foreign/old writers) → conservatively applies
  *    to every data file.
  *
  * Bounds comparisons are java.lang.String order; delete-row paths are
  * `_metadata.file_path` renderings (ASCII URIs), where it coincides
  * with the UTF-8 byte order parquet stats use.
  */
final class PosDeleteIndex(deletes: Seq[DeleteTask], qualify: String => String) {

  private val (withRef, rest) =
    deletes.partition(_.file.referencedDataFile.isDefined)

  private val byRef: Map[String, Seq[DeleteTask]] =
    withRef.groupBy(d => qualify(d.file.referencedDataFile.get))

  private val (bounded, unboundedSeq) = rest.partition(d =>
    d.file.lowerBounds.contains(ReservedFieldIds.FilePath) &&
      d.file.upperBounds.contains(ReservedFieldIds.FilePath))

  /** Delete files with no binding metadata: apply everywhere. */
  val unbounded: Seq[DeleteTask] = unboundedSeq

  private val ranged: Array[(String, String, DeleteTask)] = bounded
    .map(d => (d.file.lowerBounds(ReservedFieldIds.FilePath).toString,
      d.file.upperBounds(ReservedFieldIds.FilePath).toString, d))
    .sortBy(_._1)
    .toArray

  // prefMaxHi(i) = max upper bound over ranged[0..i] — the leftward walk
  // in candidatesFor stops as soon as no earlier interval can reach path
  private val prefMaxHi: Array[String] = {
    val a = new Array[String](ranged.length)
    var m: String = null
    var i = 0
    while (i < ranged.length) {
      if (m == null || ranged(i)._2 > m) m = ranged(i)._2
      a(i) = m
      i += 1
    }
    a
  }

  def isEmpty: Boolean = deletes.isEmpty

  /** Every delete task that can contain positions for `path` (a
    * qualified data-file path). */
  def candidatesFor(path: String): Seq[DeleteTask] = {
    val hits = scala.collection.mutable.ArrayBuffer.empty[DeleteTask]
    byRef.get(path).foreach(hits ++= _)
    // rightmost interval with lo <= path, then walk left while some
    // earlier interval's max-upper still reaches path
    var lo = 0
    var hi = ranged.length - 1
    var last = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (ranged(mid)._1 <= path) { last = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    var i = last
    while (i >= 0 && prefMaxHi(i) >= path) {
      if (ranged(i)._2 >= path) hits += ranged(i)._3
      i -= 1
    }
    hits ++= unbounded
    hits.toSeq
  }
}

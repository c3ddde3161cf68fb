package graft.table

import graft.spec.Murmur3

/** Commit-subtree location generation (reference
  * writer/file_writer/location_generator.rs:107-185 +
  * table_properties.rs:452-457).
  *
  * Object stores shard request throughput by key prefix; writing every
  * file under one `.../data/` prefix hot-spots it. With
  * `write.object-storage.enabled` each commit's subtree is prefixed with
  * deterministic hash-entropy directories — the reference's scheme
  * (murmur3_32, trailing 20 bits rendered as binary, 3 dirs of 4 bits +
  * one of 8) keyed by the commit uuid. Spark's writer owns per-file
  * placement inside the subtree, so entropy applies per commit rather
  * than per file: at steady state (many commits) prefixes spread the same
  * way, and manifests address files absolutely so layout never affects
  * reads.
  */
object Locations {

  val ObjectStorageProp = "write.object-storage.enabled"

  /** Root for a new commit's files: `data/<entropy>/<kind>-<uuid>` when
    * object-storage layout is on, `data/<kind>-<uuid>` otherwise. */
  def commitDir(table: GraftTable, kind: String, commitUuid: String): String = {
    val base = s"${table.location}/data"
    if (!table.metadata.properties.get(ObjectStorageProp).contains("true"))
      s"$base/$kind-$commitUuid"
    else {
      val h = Murmur3.hashString(commitUuid)
      // trailing 20 bits as binary, split 4/4/4/8 (location_generator.rs:47-52,180-185)
      val bits = String.format("%32s", Integer.toBinaryString(h))
        .replace(' ', '0').takeRight(20)
      val dirs = Seq(bits.substring(0, 4), bits.substring(4, 8),
        bits.substring(8, 12), bits.substring(12, 20))
      s"$base/${dirs.mkString("/")}/$kind-$commitUuid"
    }
  }
}

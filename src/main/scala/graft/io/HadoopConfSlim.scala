package graft.io

import org.apache.hadoop.conf.Configuration

/** Strip per-property PROVENANCE from a Configuration.
  *
  * Hadoop's `Configuration.write` serializes, for EVERY property, the
  * list of resources that set it ("core-default.xml", …) through
  * `WritableUtils.writeCompressedStringArray` — a fresh GZIP deflater
  * per property — and `readFields` inflates them back. Spark wraps the
  * session Hadoop conf in `SerializableConfiguration` for every scan
  * broadcast and embeds it in every FileFormatWriter task closure, so a
  * ~1,200-property conf costs ~0.3–0.7 s of pure gzip per write job
  * (driver serialize + task deserialize) and per scan-broadcast build —
  * measured as the single-task write jobs' entire run time in the fold
  * bench lines (OPTIMIZATION_r16.md; VERDICT r15 item 7).
  *
  * Provenance is debugging metadata (`getPropertySources`); no value
  * resolution reads it. With the map cleared, `write` emits a vint -1
  * per property and the gzip round-trip disappears. The Configuration
  * copy constructor copies the (now empty) map, so every conf derived
  * from a stripped base — each `SessionState.newHadoopConf` copy — stays
  * lean; only properties set AFTER the strip regain (one-string)
  * provenance.
  *
  * Reflection on a private field, so best-effort: a Hadoop release that
  * renames it degrades to the old cost, never to an error.
  */
object HadoopConfSlim {
  private lazy val updatingResourceField: Option[java.lang.reflect.Field] =
    try {
      val f = classOf[Configuration].getDeclaredField("updatingResource")
      f.setAccessible(true)
      Some(f)
    } catch { case _: Throwable => None }

  def stripProvenance(conf: Configuration): Unit =
    updatingResourceField.foreach { f =>
      try {
        f.get(conf) match {
          case m: java.util.Map[_, _] => m.clear()
          case _ => ()
        }
      } catch { case _: Throwable => () }
    }
}

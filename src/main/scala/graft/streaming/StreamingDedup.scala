package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-time twin of
  * [[graft.pipeline.Dedup.exact]]: crawl batches arrive continuously and
  * re-fetches must not enter the corpus twice.
  *
  * Two shapes, by state-retention contract:
  *   - [[dedupExact]]: `dropDuplicates` on the content hash. State is one
  *     32-byte key per distinct document, FOREVER — correct whenever the
  *     distinct-key space is bounded (a backfill, a bounded id space).
  *     At an unbounded 100 TB/day ingest this state grows without limit;
  *     that regime belongs to the watermarked shape below.
  *   - [[dedupWithinWatermark]]: `dropDuplicatesWithinWatermark` — drops
  *     any duplicate whose FIRST sighting is within the watermark
  *     horizon, and expires state once the watermark passes. State holds
  *     O(docs per horizon), the production crawl-ingest shape: re-fetch
  *     storms are horizon-local, while long-range duplicates fall through
  *     to the batch MinHash/exact passes that run over the landed table
  *     anyway.
  *
  * Both are pure plan transforms over any streaming source — including a
  * `spark.readStream.format("graft")` table scan — and feed the
  * exactly-once graft streaming sink unchanged.
  */
object StreamingDedup {

  /** Keep the first occurrence of each distinct `textCol` (md5 keyed,
    * exact). Unbounded state — see class doc for when that is safe. */
  def dedupExact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("text_md5", md5(encode(col(textCol), "UTF-8")))
      .dropDuplicates("text_md5")

  /** Keep the first occurrence of each distinct `textCol` within the
    * event-time watermark horizon; state for keys older than the horizon
    * is dropped (bounded state, late re-fetches beyond the horizon pass
    * through to the batch dedup). */
  def dedupWithinWatermark(docs: DataFrame, tsCol: String = "ts",
      horizon: String = "10 minutes", textCol: String = "text"): DataFrame =
    docs.withColumn("text_md5", md5(encode(col(textCol), "UTF-8")))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("text_md5")
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads ride through the pipeline
  * as opaque `binary` columns with a typed metadata struct, exactly how a
  * 100 TB image/audio corpus is stored (parquet binary + sidecar fields).
  *
  * The decode step is STUBBED (no image/audio codecs in this container):
  * `decodeFeatures` derives a deterministic fixed-shape feature vector
  * from the payload bytes via md5. Everything around the stub — schema,
  * encoders, mapPartitions batch shape, partitioning — is real and
  * tested, so swapping the stub for a JNI/codec call changes no plumbing.
  *
  * Scale notes: payload bytes never hit the driver; `mapPartitions`
  * processes executor-local batches (the Spark analogue of the
  * reference's per-batch Arrow pipeline); feature extraction is a pure
  * map stage — the only shuffle is whatever the caller aggregates after.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("duration_ms", LongType, nullable = false))), nullable = false)))

  /** Wrap the documents table as a media table: text bytes stand in for
    * an encoded media payload; metadata is derived deterministically. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("text/plain").as("format"),
        col("n_chars").cast(IntegerType).as("width"),
        lit(1).as("height"),
        (col("n_chars") * 10L).as("duration_ms")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("byte_len", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** STUB decoder: a real implementation would decode the payload with an
    * image/audio codec here. The stand-in maps the md5 digest of the
    * payload to 8 doubles in [0,1) — deterministic, fixed shape, zero
    * I/O — preserving the exact batch/encoder contract a codec needs. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    Array.tabulate(8)(i => ((d(2 * i) & 0xFF) * 256 + (d(2 * i + 1) & 0xFF)) / 65536.0)
  }

  /** Per-partition feature extraction over the media table (the
    * mapPartitions shape a native decoder plugs into). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.row(featureSchema)
    media.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) Array.emptyByteArray else r.getAs[Array[Byte]](1)
          Row(id, payload.length, decodeStub(payload))
        }
      }(enc)
  }

  /** Audio-shaped pipeline: the payload windows into fixed-size chunks
    * ("samples per window"), each window gets a deterministic stub energy
    * (md5-derived double in [0,1) — standing in for RMS over decoded
    * PCM), and per-doc stats aggregate over windows. This is the
    * explode→aggregate plan an audio feature extractor runs at 100 TB:
    * windows materialize executor-side only, and the sole shuffle is the
    * per-doc aggregation (map-side combined). Only order-independent
    * aggregates (count/max/max_by) keep the SQL oracle bit-exact. */
  def waveformStats(media: DataFrame, windowChars: Int = 32): DataFrame = {
    val nWin = ceil(length(decode(col("payload"), "UTF-8")) /
      lit(windowChars.toDouble)).cast(IntegerType)
    val windows = media
      .select(col("doc_id"), decode(col("payload"), "UTF-8").as("t"),
        explode(sequence(lit(0), nWin - 1)).as("w"))
      .select(col("doc_id"), col("w"),
        (TextHash.hex60(expr(s"substring(t, w * $windowChars + 1, $windowChars)"))
          .cast(DoubleType) / lit((1L << 60).toDouble)).as("energy"))
    windows.groupBy("doc_id").agg(
      count(lit(1)).as("n_windows"),
      round(max(col("energy")), 5).as("peak_energy"),
      expr("max_by(w, energy)").cast(LongType).as("peak_w"))
  }

  /** Perceptual-hash-style media fingerprint: 60 one-bit block features
    * over the decoded payload (bit b = low bit of the 60-bit hash of the
    * b-th fixed-width block — standing in for "block-mean > global
    * median" over decoded pixels, which a real pHash computes after a
    * DCT). Identical payloads collide exactly; payloads differing in a
    * few localized blocks land within a small hamming distance. Pure
    * map stage — one signature long per row. */
  def phash(media: DataFrame, blockChars: Int = 8, bits: Int = 60): DataFrame = {
    val t = decode(col("payload"), "UTF-8")
    val sig = (0 until bits).map { b =>
      TextHash.hex60(substring(t, b * blockChars + 1, blockChars))
        .bitwiseAND(lit(1L)) * lit(1L << b)
    }.reduce(_ + _)
    media.select(col("doc_id"), sig.as("phash"))
  }

  /** Media near-duplicate pairs by fingerprint hamming distance: the
    * image/video dedup pass of a multimodal pipeline, sharing the exact
    * banded pigeonhole join of the text simhash path
    * ([[Dedup.hammingNearDups]] — exact recall for
    * maxHamming < bands, census-capped viral buckets, no all-pairs). */
  def phashNearDups(media: DataFrame, maxHamming: Int = 5,
      bands: Int = 6): DataFrame =
    Dedup.hammingNearDups(phash(media), "phash", maxHamming, bands, 60)

  /** Frame sampling: fixed-width character frames of the decoded payload
    * with per-frame md5 — the "extract frames + per-frame features"
    * pipeline shape, fully crosscheckable in SQL. */
  def frameFeatures(media: DataFrame, frameChars: Int = 64): DataFrame = {
    val text = decode(col("payload"), "UTF-8")
    media.select(col("doc_id"),
      length(col("payload")).cast("long").as("byte_len"),
      col("meta").getField("width").as("width"),
      ceil(length(text) / lit(frameChars.toDouble)).as("n_frames"),
      md5(encode(substring(text, 1, frameChars), "UTF-8")).as("frame0_md5"),
      md5(encode(substring(text, frameChars + 1, frameChars), "UTF-8")).as("frame1_md5"))
  }
}

package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media payloads ride through the pipeline
  * as opaque `binary` columns with a typed metadata struct, exactly how a
  * 100 TB image/audio corpus is stored (parquet binary + sidecar fields).
  *
  * Two decode paths share the seam:
  *   - REAL: `bmpMediaTable`/`bmpPixelStats`/`bmpPhashDecoded` and
  *     `wavMediaTable`/`wavWaveformStats` encode and decode genuine
  *     24-bit BMP and PCM16 WAV binaries through [[MediaCodec]] —
  *     pure-JVM parsers for two public formats, oracle-checked from the
  *     closed-form pixel/sample functions.
  *   - STUB (heavier codecs absent from this container): `decodeFeatures`
  *     derives a deterministic md5 feature vector from the payload bytes;
  *     schema, encoders and the mapPartitions batch shape are identical,
  *     so swapping in a JNI/codec call changes no plumbing.
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

  // --- REAL decode path (MediaCodec): genuine BMP / WAV binaries -------
  //
  // The corpora are deterministic functions of doc_id (closed-form pixel
  // and sample values), ENCODED to real format bytes executor-side and
  // DECODED back through the real parsers — so a SQL oracle can recompute
  // every downstream stat from the closed form, and hash equality proves
  // the full encode→decode round trip (row padding, bottom-up rows, BGR,
  // RIFF chunk walk) is lossless.

  /** Packed 0xRRGGBB for the deterministic BMP corpus (top-left origin). */
  private def bmpPixel(docId: Long, x: Int, y: Int): Int = {
    val r = ((docId * 31 + x * 7 + y * 13) % 256).toInt
    val g = ((docId * 17 + x * 11 + y * 5) % 256).toInt
    val b = ((docId * 29 + x * 3 + y * 19) % 256).toInt
    (r << 16) | (g << 8) | b
  }
  private def bmpDims(docId: Long): (Int, Int) =
    (5 + (docId % 4).toInt, 4 + (docId % 3).toInt) // odd widths hit padding

  /** Real 24-bit BMP per doc: (doc_id, payload) with payload a genuine
    * BMP binary. Pure map stage (mapPartitions — the decode seam's
    * batch shape); bytes never hit the driver. */
  def bmpMediaTable(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = bmpDims(id)
        Row(id, MediaCodec.encodeBmp(w, h, (x, y) => bmpPixel(id, x, y)))
      }
    }(Encoders.row(schema))
  }

  /** Decode each BMP payload and aggregate per-channel pixel sums —
    * integer-exact, so the DuckDB oracle reproduces them from the
    * closed-form pixel function alone. */
  def bmpPixelStats(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("sum_r", LongType, nullable = false),
      StructField("sum_g", LongType, nullable = false),
      StructField("sum_b", LongType, nullable = false)))
    media.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val bmp = MediaCodec.decodeBmp(r.getAs[Array[Byte]](1))
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < bmp.pixels.length) {
          val p = bmp.pixels(i)
          sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
          i += 1
        }
        Row(r.getLong(0), bmp.width, bmp.height, sr, sg, sb)
      }
    }(Encoders.row(schema))
  }

  /** Perceptual hash over DECODED pixels: bit b set when block b's
    * integer gray sum (r+g+b) exceeds the global mean, compared by
    * cross-multiplication (blockSum·nTotal > totalSum·nBlock — no
    * division, bit-exact in SQL). Pixel i (row-major) belongs to block
    * (i·bits) / nPixels. */
  def bmpPhashDecoded(media: DataFrame, bits: Int = 60): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("phash", LongType, nullable = false)))
    media.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val bmp = MediaCodec.decodeBmp(r.getAs[Array[Byte]](1))
        val n = bmp.pixels.length
        val blockSum = new Array[Long](bits)
        val blockN = new Array[Long](bits)
        var total = 0L
        var i = 0
        while (i < n) {
          val p = bmp.pixels(i)
          val gray = ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
          val b = ((i.toLong * bits) / n).toInt
          blockSum(b) += gray; blockN(b) += 1; total += gray
          i += 1
        }
        var sig = 0L
        var b = 0
        while (b < bits) {
          if (blockSum(b) * n > total * blockN(b)) sig |= 1L << b
          b += 1
        }
        Row(r.getLong(0), sig)
      }
    }(Encoders.row(schema))
  }

  /** 16-bit PCM sample for the deterministic WAV corpus. */
  private def wavSample(docId: Long, i: Int): Short =
    (((docId * 7919 + i.toLong * 104729) % 65536) - 32768).toShort
  private def wavLen(docId: Long): Int = 64 + (docId % 32).toInt

  /** Real RIFF/PCM16 WAV per doc. */
  def wavMediaTable(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    docs.select(col("doc_id")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, MediaCodec.encodeWavPcm16(
          Array.tabulate(wavLen(id))(i => wavSample(id, i)), 16000))
      }
    }(Encoders.row(schema))
  }

  /** Waveform stats over DECODED PCM: fixed-size sample windows, integer
    * energy Σs² per window, per-doc window count / peak energy / peak
    * window (ties break to the LARGEST window index via struct max_by —
    * deterministic on both engines). The explode→aggregate plan a real
    * audio featurizer runs: windows materialize executor-side, the only
    * shuffles are the two map-side-combined aggregations. */
  def wavWaveformStats(media: DataFrame, window: Int = 16): DataFrame = {
    val decSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("samples", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    media.select(col("doc_id"), col("payload")).mapPartitions { rows =>
      rows.map { r =>
        val wav = MediaCodec.decodeWavPcm16(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), wav.samples.map(_.toInt).toSeq)
      }
    }(Encoders.row(decSchema))
      .select(col("doc_id"), posexplode(col("samples")).as(Seq("i", "v")))
      .groupBy(col("doc_id"), expr(s"i div $window").cast(IntegerType).as("w"))
      .agg(sum(col("v").cast(LongType) * col("v")).as("energy"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_windows"),
        max(col("energy")).as("peak_energy"),
        expr("max_by(w, named_struct('e', energy, 'w', w))")
          .cast(LongType).as("peak_w"))
  }

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

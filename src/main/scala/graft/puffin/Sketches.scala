package graft.puffin

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.TextHash
import graft.table.GraftTable

/** KMV (k-minimum-values) distinct-count sketches — the role the
  * reference fills with Apache DataSketches theta blobs in Puffin
  * (puffin/blob.rs:23, APACHE_DATASKETCHES_THETA_V1): mergeable per-column
  * NDV estimates computed in one distributed pass and persisted as table
  * stats. The sketch body here is the portable md5-based KMV formulation
  * (blob type graft-kmv-distinct-v1) so estimates are deterministic and
  * reproducible in plain SQL — the DataSketches binary format needs their
  * library, which is out of deps.
  *
  * Estimator: with h = 60-bit uniform hash normalized to (0,1], the k-th
  * smallest distinct hash r_k gives NDV ≈ (k-1)/r_k; exact count is used
  * when fewer than k distinct values exist.
  *
  * Scale: per column one hash-distinct top-k — a partial top-k per
  * partition then a k-row merge; no full shuffle of values, driver sees
  * only k longs per column.
  */
object Sketches {

  val DefaultK = 64

  final case class ColumnSketch(fieldId: Int, column: String, k: Int,
      minHashes: Seq[Long],
      /** Set when the sketch was read from a foreign theta blob — the
        * estimate then comes from the theta math, not KMV. */
      thetaEstimate: Option[Long] = None) {
    /** NDV estimate (exact when under-filled). */
    def estimate: Long = thetaEstimate.getOrElse {
      if (minHashes.size < k) minHashes.size.toLong
      else math.floor((k - 1).toDouble * math.pow(2.0, 60) / minHashes.last.toDouble).toLong
    }

    def serialize(): Array[Byte] = {
      val buf = ByteBuffer.allocate(8 + minHashes.size * 8).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(k)
      buf.putInt(minHashes.size)
      minHashes.foreach(buf.putLong)
      buf.array()
    }
  }

  def deserialize(fieldId: Int, column: String, bytes: Array[Byte]): ColumnSketch = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val k = buf.getInt
    val n = buf.getInt
    ColumnSketch(fieldId, column, k, Seq.fill(n)(buf.getLong))
  }

  /** One distributed pass: k smallest distinct hashes per column. */
  def sketchColumns(df: DataFrame, cols: Seq[String], k: Int = DefaultK): Seq[ColumnSketch] =
    cols.map { c =>
      val hashes = df.select(TextHash.hex60(col(c).cast("string")).as("x"))
        .where(col(c).isNotNull)
        .distinct()
        .orderBy(col("x"))
        .limit(k)
        .collect().map(_.getLong(0)).toSeq
      ColumnSketch(-1, c, k, hashes)
    }

  /** Theta sketch per column, the same distributed top-k shape: distinct
    * entry hashes ascending, first 2^lgK + 1 collected (the +1 supplies
    * theta past the nominal count). Keys hash per-type the DataSketches
    * way, so a foreign engine updating the same values lands on the same
    * entries. The hash is a native codegen expression
    * (functions.ThetaHashExpr) — the whole stats scan stays inside
    * whole-stage codegen; nulls hash to SQL null and the `!= 0` filter
    * drops them exactly like the 0 sentinel. */
  def thetaColumns(df: DataFrame, cols: Seq[String],
      lgK: Int = ThetaSketch.DefaultLgK): Seq[ThetaSketch.Theta] = {
    import org.apache.spark.sql.types._
    cols.map { c =>
      val in: org.apache.spark.sql.Column = df.schema(c).dataType match {
        case LongType | IntegerType | ShortType | ByteType => col(c).cast("long")
        case DoubleType | FloatType => col(c).cast("double")
        case _ => col(c).cast("string")
      }
      val h = graft.functions.ThetaHashExpr.column(in)
      val k = 1 << lgK
      val hashes = df.select(h.as("x"))
        .where(col("x") =!= 0L)
        .distinct()
        .orderBy(col("x"))
        .limit(k + 1)
        .collect().map(_.getLong(0)).toSeq
      if (hashes.size <= k) ThetaSketch.Theta(lgK, Long.MaxValue, hashes)
      else ThetaSketch.Theta(lgK, hashes(k), hashes.take(k))
    }
  }

  /** Compute sketches for `cols` of the table's current snapshot, persist
    * them as a Puffin stats file AND register it in table metadata
    * (`statistics`, statistic_file.rs:27 / table_metadata.rs statistics
    * list) — discoverable per snapshot with no hand-carried path. A
    * re-run for the same snapshot replaces its entry (set_statistics
    * semantics). Returns the updated table and the sketches. */
  def writeDistinctStats(table: GraftTable, spark: SparkSession,
      cols: Seq[String], k: Int = DefaultK): (GraftTable, Seq[ColumnSketch]) = {
    val snapshotId = table.metadata.currentSnapshotId.getOrElse(0L)
    val seq = table.metadata.lastSequenceNumber
    val df = table.newScan().toDF(spark)
    val sketches = sketchColumns(df, cols, k).map { s =>
      s.copy(fieldId = table.schema.findField(s.column).map(_.id).getOrElse(-1))
    }
    val thetas = thetaColumns(df, cols)
    val path = s"${table.location}/metadata/stats-$snapshotId-${java.util.UUID.randomUUID()}.puffin"
    val metas = Puffin.write(table.io, path,
      sketches.map { s =>
        Puffin.Blob(Puffin.KmvDistinctV1, Seq(s.fieldId), snapshotId, seq,
          s.serialize(), Map("column" -> s.column, "ndv" -> s.estimate.toString))
      } ++ sketches.zip(thetas).map { case (s, t) =>
        // the spec'd interop blob: DataSketches CompactSketch bytes a
        // foreign engine heapifies directly — zstd-compressed like the
        // Java writer's default (readers get the codec from the footer)
        Puffin.Blob(Puffin.ThetaV1, Seq(s.fieldId), snapshotId, seq,
          ThetaSketch.serialize(t),
          Map("column" -> s.column, "ndv" -> t.estimate.toString),
          codec = Some("zstd"))
      }, Map("created-by" -> "graft"))
    val fileSize = table.io.size(path)
    val statsFile = graft.spec.StatisticsFile(
      snapshotId = snapshotId,
      statisticsPath = path,
      fileSizeInBytes = fileSize,
      fileFooterSizeInBytes = fileSize - metas.map(m => m.offset + m.length).max,
      blobMetadata = metas.map(m => graft.spec.StatsBlobMetadata(
        m.blobType, snapshotId, seq, m.fields, m.properties)))
    val updated = graft.catalog.CommitRetry.run(table.catalog, table.name) { (base, _) =>
      val kept = base.statistics.filterNot(_.snapshotId == snapshotId)
      (base.copy(statistics = kept :+ statsFile,
        lastUpdatedMs = System.currentTimeMillis()),
        (_: Int) => table.refresh())
    }
    (updated, sketches)
  }

  /** Load the sketches registered for the table's current snapshot —
    * discovery goes through `metadata.statistics`, not a carried path. */
  def readCurrentStats(table: GraftTable): Seq[ColumnSketch] = {
    val snapshotId = table.metadata.currentSnapshotId.getOrElse(0L)
    table.metadata.statisticsFor(snapshotId)
      .map(sf => readDistinctStats(table, sf.statisticsPath))
      .getOrElse(Nil)
  }

  /** Load sketches back from a stats file. Our own files carry both blob
    * types and the KMV wins (bit-reproducible in SQL); a FOREIGN stats
    * file (theta-only — e.g. written by the reference or Trino) serves
    * its NDV through the theta estimate. */
  def readDistinctStats(table: GraftTable, path: String): Seq[ColumnSketch] = {
    val (metas, _) = Puffin.readMetadata(table.io, path)
    val kmv = metas.filter(_.blobType == Puffin.KmvDistinctV1).map { m =>
      deserialize(m.fields.headOption.getOrElse(-1),
        m.properties.getOrElse("column", ""),
        Puffin.readBlob(table.io, path, m))
    }
    if (kmv.nonEmpty) kmv
    else metas.filter(_.blobType == Puffin.ThetaV1).map { m =>
      val t = ThetaSketch.deserialize(Puffin.readBlob(table.io, path, m))
      ColumnSketch(m.fields.headOption.getOrElse(-1),
        m.properties.getOrElse("column", ""), 0, Nil, Some(t.estimate))
    }
  }
}

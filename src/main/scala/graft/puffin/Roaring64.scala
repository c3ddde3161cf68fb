package graft.puffin

import java.nio.{ByteBuffer, ByteOrder}

import scala.collection.immutable.SortedMap

/** Minimal 64-bit roaring bitmap ("portable" serialization), the format
  * the Iceberg v3 deletion-vector blob stores (reference delete_vector.rs
  * wraps the roaring crate's RoaringTreemap; this is an independent
  * implementation of the published format, not a port).
  *
  * Layout (portable spec):
  *   u64 LE  number of 32-bit bitmaps
  *   per bitmap: u32 LE high key, then the standard 32-bit roaring
  *   serialization: cookie 12346 (no run containers) u32 LE, u32 LE
  *   container count, descriptive header (u16 key, u16 cardinality-1)
  *   per container, u32 LE offset header per container, then containers —
  *   array (sorted u16 values, card ≤ 4096) or bitmap (8 KiB, 1024×u64 LE).
  *
  * Run containers (cookie 12347: container count embedded in the cookie
  * high bits, run-flag bitset after it, per container u16 run count +
  * (start, length-1) u16 pairs, offset header only when ≥4 containers)
  * are both read AND written: `serialize` run-optimizes each container
  * exactly like the roaring crate the reference wraps
  * (delete_vector.rs:27) — a container is run-encoded when
  * 2 + 4·runs < min(2·cardinality, 8192), so dense delete ranges (the
  * common compaction/backfill shape) serialize near-minimal instead of
  * as 8 KiB bitmaps, and our bytes stay readable by every spec reader.
  */
final class Roaring64 private (
    private val containers: SortedMap[Long, Array[Long]]) { // key=(high32<<16|key16), value=bitset words

  import Roaring64._

  def contains(pos: Long): Boolean = {
    val k = containerKey(pos)
    containers.get(k).exists(words => {
      val low = (pos & 0xFFFF).toInt
      (words(low >>> 6) & (1L << (low & 63))) != 0
    })
  }

  def cardinality: Long =
    containers.valuesIterator.map(ws => ws.map(java.lang.Long.bitCount(_).toLong).sum).sum

  /** Ascending positions. */
  def iterator: Iterator[Long] =
    containers.iterator.flatMap { case (key, words) =>
      val base = key << 16
      Iterator.range(0, 65536).filter(i => (words(i >>> 6) & (1L << (i & 63))) != 0)
        .map(i => base | i)
    }

  /** Bitwise union, container-wise (no position expansion). Used to fold a
    * data file's existing deletion vector into a newly-built one so the
    * file keeps a single superseding DV (Iceberg v3 invariant). */
  def or(other: Roaring64): Roaring64 = {
    val keys = containers.keySet ++ other.containers.keySet
    val merged = keys.iterator.map { k =>
      val words = new Array[Long](1024)
      containers.get(k).foreach { w =>
        var i = 0; while (i < 1024) { words(i) |= w(i); i += 1 }
      }
      other.containers.get(k).foreach { w =>
        var i = 0; while (i < 1024) { words(i) |= w(i); i += 1 }
      }
      k -> words
    }
    new Roaring64(SortedMap.from(merged))
  }

  def serialize(): Array[Byte] = {
    // group containers by high 32 bits
    val byHigh = containers.groupBy { case (key, _) => key >>> 16 }
    val out = new java.io.ByteArrayOutputStream()
    val n = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(byHigh.size.toLong)
    out.write(n.array())
    byHigh.toSeq.sortBy(_._1).foreach { case (high, conts) =>
      val hb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(high.toInt)
      out.write(hb.array())
      out.write(serialize32(conts.map { case (k, w) => ((k & 0xFFFF).toInt, w) }))
    }
    out.toByteArray
  }

  /** Runs of consecutive set bits as (start, length-1) pairs. */
  private def runsOf(words: Array[Long]): IndexedSeq[(Int, Int)] = {
    val runs = IndexedSeq.newBuilder[(Int, Int)]
    var i = 0
    var runStart = -1
    while (i < 65536) {
      val set = (words(i >>> 6) & (1L << (i & 63))) != 0
      if (set && runStart < 0) runStart = i
      else if (!set && runStart >= 0) { runs += ((runStart, i - 1 - runStart)); runStart = -1 }
      i += 1
    }
    if (runStart >= 0) runs += ((runStart, 65535 - runStart))
    runs.result()
  }

  private def serialize32(conts: SortedMap[Int, Array[Long]]): Array[Byte] = {
    val entries = conts.toSeq
    val n = entries.size
    val cards = entries.map { case (_, w) => w.map(java.lang.Long.bitCount).sum }
    val runs = entries.map { case (_, w) => runsOf(w) }
    // roaring runOptimize rule: run-encode when strictly smaller than
    // both alternatives; otherwise array (card ≤ 4096) or bitmap
    val asRun = cards.zip(runs).map { case (card, rs) =>
      2 + 4 * rs.size < math.min(if (card <= ArrayMax) 2 * card else Int.MaxValue, BitmapBytes)
    }
    val sizes = cards.indices.map { i =>
      if (asRun(i)) 2 + 4 * runs(i).size
      else if (cards(i) <= ArrayMax) cards(i) * 2
      else BitmapBytes
    }
    val hasRun = asRun.contains(true)
    val hasOffsets = !hasRun || n >= NoOffsetThreshold
    val headerLen =
      (if (hasRun) 4 + (n + 7) / 8 else 8) + n * 4 + (if (hasOffsets) n * 4 else 0)
    val buf = ByteBuffer.allocate(headerLen + sizes.sum).order(ByteOrder.LITTLE_ENDIAN)
    if (hasRun) {
      buf.putInt(CookieRun | ((n - 1) << 16))
      val flags = new Array[Byte]((n + 7) / 8)
      asRun.zipWithIndex.foreach { case (r, i) =>
        if (r) flags(i / 8) = (flags(i / 8) | (1 << (i % 8))).toByte
      }
      buf.put(flags)
    } else {
      buf.putInt(CookieNoRun)
      buf.putInt(n)
    }
    entries.zip(cards).foreach { case ((key, _), card) =>
      buf.putShort(key.toShort); buf.putShort((card - 1).toShort)
    }
    if (hasOffsets) {
      var off = headerLen
      sizes.foreach { s => buf.putInt(off); off += s }
    }
    entries.indices.foreach { i =>
      val (_, words) = entries(i)
      if (asRun(i)) {
        buf.putShort(runs(i).size.toShort)
        runs(i).foreach { case (start, lenM1) =>
          buf.putShort(start.toShort); buf.putShort(lenM1.toShort)
        }
      } else if (cards(i) <= ArrayMax) {
        var v = 0
        while (v < 65536) {
          if ((words(v >>> 6) & (1L << (v & 63))) != 0) buf.putShort(v.toShort)
          v += 1
        }
      } else words.foreach(buf.putLong)
    }
    buf.array()
  }
}

object Roaring64 {
  private val CookieNoRun = 12346
  private val CookieRun = 12347
  private val ArrayMax = 4096
  private val BitmapBytes = 8192

  private def containerKey(pos: Long): Long = pos >>> 16

  def fromPositions(positions: Iterable[Long]): Roaring64 = {
    val m = scala.collection.mutable.Map[Long, Array[Long]]()
    positions.foreach { pos =>
      require(pos >= 0, s"negative position $pos")
      val words = m.getOrElseUpdate(containerKey(pos), new Array[Long](1024))
      val low = (pos & 0xFFFF).toInt
      words(low >>> 6) |= (1L << (low & 63))
    }
    new Roaring64(SortedMap.from(m))
  }

  def deserialize(bytes: Array[Byte]): Roaring64 = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val nMaps = buf.getLong
    val m = scala.collection.mutable.Map[Long, Array[Long]]()
    var i = 0L
    while (i < nMaps) {
      val high = buf.getInt.toLong & 0xFFFFFFFFL
      readBitmap32(buf, high, m)
      i += 1
    }
    new Roaring64(SortedMap.from(m))
  }

  /** Offset header is omitted for run-flagged bitmaps with fewer
    * containers than this (RoaringFormatSpec NO_OFFSET_THRESHOLD). */
  private val NoOffsetThreshold = 4

  private def readBitmap32(buf: ByteBuffer, high: Long,
      m: scala.collection.mutable.Map[Long, Array[Long]]): Unit = {
    val start = buf.position()
    val rawCookie = buf.getInt
    val cookie = rawCookie & 0xFFFF
    require(cookie == CookieNoRun || cookie == CookieRun,
      s"bad roaring cookie $cookie")
    val hasRun = cookie == CookieRun
    val n = if (hasRun) ((rawCookie >>> 16) & 0xFFFF) + 1 else buf.getInt
    val runFlags = new Array[Boolean](n)
    if (hasRun) {
      val bits = new Array[Byte]((n + 7) / 8)
      buf.get(bits)
      var i = 0
      while (i < n) { runFlags(i) = (bits(i / 8) & (1 << (i % 8))) != 0; i += 1 }
    }
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    var i = 0
    while (i < n) {
      keys(i) = buf.getShort & 0xFFFF
      cards(i) = (buf.getShort & 0xFFFF) + 1
      i += 1
    }
    val hasOffsets = !hasRun || n >= NoOffsetThreshold
    val offsets = new Array[Int](n)
    if (hasOffsets) {
      i = 0
      while (i < n) { offsets(i) = buf.getInt; i += 1 }
    }
    i = 0
    while (i < n) {
      if (hasOffsets) buf.position(start + offsets(i))
      val words = new Array[Long](1024)
      if (runFlags(i)) {
        val nRuns = buf.getShort & 0xFFFF
        var r = 0
        while (r < nRuns) {
          val first = buf.getShort & 0xFFFF
          val len = buf.getShort & 0xFFFF // run covers [first, first+len]
          var v = first
          val last = first + len
          while (v <= last) { words(v >>> 6) |= (1L << (v & 63)); v += 1 }
          r += 1
        }
      } else if (cards(i) <= ArrayMax) {
        var j = 0
        while (j < cards(i)) {
          val v = buf.getShort & 0xFFFF
          words(v >>> 6) |= (1L << (v & 63))
          j += 1
        }
      } else {
        var j = 0
        while (j < 1024) { words(j) = buf.getLong; j += 1 }
      }
      m((high << 16) | keys(i)) = words
      i += 1
    }
    // leave buf positioned after the last container of this bitmap
  }
}

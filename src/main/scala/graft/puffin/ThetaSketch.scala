package graft.puffin

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** `apache-datasketches-theta-v1` Puffin blob interop (puffin/blob.rs:23
  * APACHE_DATASKETCHES_THETA_V1; Puffin spec "statistics blob types").
  *
  * Implements the PUBLIC DataSketches theta wire contract from scratch:
  *   - MurmurHash3 x64/128 (Austin Appleby's public-domain algorithm) —
  *     the entry hash is `hash(key, seed=9001)[0] >>> 1`, keys serialized
  *     the DataSketches way (longs little-endian, strings UTF-8, doubles
  *     via doubleToLongBits with -0.0 canonicalized);
  *   - the CompactSketch SerVer-3 binary layout (ordered, read-only):
  *     preamble [preLongs, serVer=3, family=3, lgK, 0, flags, seedHash]
  *     + retained count + thetaLong + ascending entry longs.
  * A foreign engine using the DataSketches library reads these NDV blobs
  * directly, and we read theirs — the stats-file interop the format is
  * spec'd for. Verified against independently generated MurmurHash3
  * vectors (incl. the canonical "hello" digest and the library's
  * seed-hash constant 0x93CC for the default seed 9001) in PuffinSpec.
  */
object ThetaSketch {

  /** DataSketches DEFAULT_UPDATE_SEED. */
  val DefaultSeed: Long = 9001L
  /** Default nominal entries (lgK = 12 — the library default). */
  val DefaultLgK: Int = 12

  // ---- MurmurHash3 x64/128 -------------------------------------------

  private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  private def fmix(kIn: Long): Long = {
    var k = kIn
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  /** MurmurHash3 x64/128 → (h1, h2). */
  def hash128(data: Array[Byte], seed: Long): (Long, Long) = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = seed
    var h2 = seed
    val nblocks = data.length / 16
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nblocks) {
      var k1 = bb.getLong(i * 16)
      var k2 = bb.getLong(i * 16 + 8)
      k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = rotl(k2, 33); k2 *= c1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    val tail = nblocks * 16
    val rem = data.length & 15
    var k1 = 0L
    var k2 = 0L
    var j = rem - 1
    while (j >= 8) { k2 ^= (data(tail + j) & 0xffL) << ((j - 8) * 8); j -= 1 }
    if (rem > 8) { k2 *= c2; k2 = rotl(k2, 33); k2 *= c1; h2 ^= k2 }
    j = math.min(rem, 8) - 1
    while (j >= 0) { k1 ^= (data(tail + j) & 0xffL) << (j * 8); j -= 1 }
    if (rem > 0) { k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1 }
    h1 ^= data.length.toLong; h2 ^= data.length.toLong
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  private def leLong(v: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array()

  /** ThetaUtil.computeSeedHash: low 16 bits of hash(long[]{seed}, 0). */
  def seedHash(seed: Long = DefaultSeed): Short = {
    val sh = (hash128(leLong(seed), 0L)._1 & 0xffffL).toShort
    require(sh != 0, s"seed $seed hashes to 0 — pick another (library rule)")
    sh
  }

  /** Theta entry hash of a pre-serialized key: hash[0] >>> 1 ∈ [0, 2⁶³). */
  def entryHash(key: Array[Byte], seed: Long = DefaultSeed): Long =
    hash128(key, seed)._1 >>> 1

  // Typed helpers for codegen call sites (ThetaHashExpr emits direct
  // static-forwarder calls — no boxing, no UDF): same keying as valueHash.
  def hashLong(v: Long): Long = entryHash(leLong(v))
  def hashDouble(v: Double): Long = {
    val canon = if (v == 0.0) 0.0 else v // -0.0 → 0.0 (library rule)
    entryHash(leLong(java.lang.Double.doubleToLongBits(canon)))
  }
  def hashUtf8(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val b = s.getBytes
    if (b.isEmpty) 0L else entryHash(b)
  }

  /** Entry hash of a value, keyed the DataSketches way per type. Returns
    * 0 for null/empty (the library ignores those updates; 0 is never a
    * valid entry, so callers filter it). */
  def valueHash(v: Any): Long = v match {
    case null => 0L
    case s: String => if (s.isEmpty) 0L else entryHash(s.getBytes(StandardCharsets.UTF_8))
    case l: Long => entryHash(leLong(l))
    case i: Int => entryHash(leLong(i.toLong))
    case sh: Short => entryHash(leLong(sh.toLong))
    case b: Byte => entryHash(leLong(b.toLong))
    case d: Double =>
      val canon = if (d == 0.0) 0.0 else d // -0.0 → 0.0 (library rule)
      entryHash(leLong(java.lang.Double.doubleToLongBits(canon)))
    case f: Float => valueHash(f.toDouble)
    case other => valueHash(String.valueOf(other))
  }

  // ---- compact-ordered sketch ----------------------------------------

  /** An ordered compact theta sketch: `entries` ascending, all < theta. */
  final case class Theta(lgK: Int, thetaLong: Long, entries: Seq[Long]) {
    def estimate: Long =
      if (entries.isEmpty) 0L
      else if (thetaLong == Long.MaxValue) entries.size.toLong
      else math.floor(entries.size.toDouble *
        (Long.MaxValue.toDouble / thetaLong.toDouble)).toLong
  }

  /** Build from value hashes: retain the 2^lgK smallest distinct entries;
    * past the nominal count, theta becomes the (k+1)-th smallest (a valid
    * theta — every retained entry is < theta, estimate = k/θ). */
  def fromHashes(hashes: Iterable[Long], lgK: Int = DefaultLgK): Theta = {
    val k = 1 << lgK
    val distinct = hashes.filter(_ != 0L).toSeq.distinct.sorted
    if (distinct.size <= k) Theta(lgK, Long.MaxValue, distinct)
    else Theta(lgK, distinct(k), distinct.take(k))
  }

  private val FlagReadOnly = 0x02
  private val FlagEmpty = 0x04
  private val FlagCompact = 0x08
  private val FlagOrdered = 0x10

  /** CompactSketch SerVer-3 bytes (preLongs=3 layout, the general form
    * every reader accepts; 8-byte empty form for the empty sketch). */
  def serialize(t: Theta, seed: Long = DefaultSeed): Array[Byte] = {
    val sh = seedHash(seed)
    if (t.entries.isEmpty) {
      val buf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      buf.put(1.toByte).put(3.toByte).put(3.toByte)
        .put(t.lgK.toByte).put(0.toByte)
        .put((FlagReadOnly | FlagEmpty | FlagCompact | FlagOrdered).toByte)
        .putShort(sh)
      buf.array()
    } else {
      val buf = ByteBuffer.allocate(24 + 8 * t.entries.size)
        .order(ByteOrder.LITTLE_ENDIAN)
      buf.put(3.toByte).put(3.toByte).put(3.toByte)
        .put(t.lgK.toByte).put(0.toByte)
        .put((FlagReadOnly | FlagCompact | FlagOrdered).toByte)
        .putShort(sh)
      buf.putInt(t.entries.size).putInt(0)
      buf.putLong(t.thetaLong)
      t.entries.foreach(buf.putLong)
      buf.array()
    }
  }

  /** Parse SerVer-3 compact bytes (preLongs 1/2/3, incl. the single-item
    * and exact-mode short forms foreign writers emit). */
  def deserialize(bytes: Array[Byte]): Theta = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val preLongs = buf.get(0) & 0x3f
    val serVer = buf.get(1) & 0xff
    require(serVer == 3, s"unsupported theta sketch SerVer $serVer")
    val lgK = buf.get(3) & 0xff
    val flags = buf.get(5) & 0xff
    if ((flags & FlagEmpty) != 0) return Theta(lgK, Long.MaxValue, Nil)
    preLongs match {
      case 1 =>
        // single-item short form: one entry right after the preamble
        Theta(lgK, Long.MaxValue, Seq(buf.getLong(8)))
      case 2 =>
        val n = buf.getInt(8)
        Theta(lgK, Long.MaxValue, (0 until n).map(i => buf.getLong(16 + i * 8)))
      case 3 =>
        val n = buf.getInt(8)
        val theta = buf.getLong(16)
        Theta(lgK, theta, (0 until n).map(i => buf.getLong(24 + i * 8)))
      case other =>
        throw new IllegalArgumentException(s"unsupported theta preLongs $other")
    }
  }
}

package graft.spec

/** Spec-exact 32-bit Murmur3 (x86 variant, seed 0) used by the Iceberg
  * `bucket[N]` partition transform.
  *
  * The Iceberg spec hashes each type's canonical byte representation:
  * int/long/date/time/timestamp as an 8-byte little-endian long, strings as
  * UTF-8 bytes, decimals as the minimal big-endian two's-complement of the
  * unscaled value, uuid as 16 big-endian bytes. (Behavior mirrored from
  * /root/reference/crates/iceberg/src/transform/bucket.rs:27-120; test
  * vectors from its test_hash at bucket.rs:730.)
  *
  * NOTE: Spark's built-in `hash()`/Murmur3Hash uses seed 42 and different
  * byte widths — intentionally NOT compatible.
  *
  * All methods are on a top-level object so Scala emits static forwarders —
  * whole-stage codegen can call `graft.spec.Murmur3.bucketLong(...)` from
  * generated Java.
  */
object Murmur3 {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  def hashBytes(data: Array[Byte]): Int = {
    val len = data.length
    var h = 0
    val nBlocks = len / 4
    var i = 0
    while (i < nBlocks) {
      val base = i * 4
      var k = (data(base) & 0xff) |
        ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) |
        ((data(base + 3) & 0xff) << 24)
      k *= C1
      k = Integer.rotateLeft(k, 15)
      k *= C2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 1
    }
    // tail
    var k1 = 0
    val tailStart = nBlocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (data(tailStart + 2) & 0xff) << 16
        k1 ^= (data(tailStart + 1) & 0xff) << 8
        k1 ^= data(tailStart) & 0xff
      case 2 =>
        k1 ^= (data(tailStart + 1) & 0xff) << 8
        k1 ^= data(tailStart) & 0xff
      case 1 =>
        k1 ^= data(tailStart) & 0xff
      case _ =>
    }
    if (k1 != 0) {
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h ^= k1
    }
    // finalization
    h ^= len
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  /** long → 8-byte little-endian → hash (ints/dates/times/timestamps are
    * widened to long first, per spec). */
  def hashLong(v: Long): Int = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    hashBytes(b)
  }

  def hashInt(v: Int): Int = hashLong(v.toLong)

  def hashString(s: String): Int =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** Decimal: minimal big-endian two's-complement of the unscaled value
    * (exactly BigInteger.toByteArray). */
  def hashUnscaled(unscaled: java.math.BigInteger): Int =
    hashBytes(unscaled.toByteArray)

  private def positiveMod(h: Int, n: Int): Int = (h & Integer.MAX_VALUE) % n

  // bucket_N(x) = (murmur3(x) & Int.MaxValue) % N  [bucket.rs:103]
  def bucketLong(v: Long, n: Int): Int = positiveMod(hashLong(v), n)
  def bucketInt(v: Int, n: Int): Int = positiveMod(hashInt(v), n)
  def bucketBytes(v: Array[Byte], n: Int): Int = positiveMod(hashBytes(v), n)
  /** For codegen over UTF8String: callers pass .getBytes (already UTF-8). */
  def bucketUtf8(v: org.apache.spark.unsafe.types.UTF8String, n: Int): Int =
    positiveMod(hashBytes(v.getBytes), n)
  def bucketDecimal(v: org.apache.spark.sql.types.Decimal, n: Int): Int =
    positiveMod(hashUnscaled(v.toJavaBigDecimal.unscaledValue()), n)
}

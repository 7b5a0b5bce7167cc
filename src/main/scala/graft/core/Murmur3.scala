package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Murmur3 x86 32-bit, seed 0 — the hash mandated by the Iceberg spec for
  * the bucket transform (reference `transforms.go:228-283` uses
  * twmb/murmur3 Sum32; this must byte-match it, verified against the spec's
  * Appendix B golden vectors in TransformsSpec).
  */
object Murmur3 {
  private final val C1 = 0xcc9e2d51
  private final val C2 = 0x1b873593

  def hash(data: Array[Byte]): Int = hash(data, 0, data.length, 0)

  def hash(data: Array[Byte], offset: Int, len: Int, seed: Int): Int = {
    var h1 = seed
    val nblocks = len / 4
    var i = 0
    while (i < nblocks) {
      val base = offset + i * 4
      var k1 = (data(base) & 0xff) | ((data(base + 1) & 0xff) << 8) |
        ((data(base + 2) & 0xff) << 16) | ((data(base + 3) & 0xff) << 24)
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 1
    }
    var k1 = 0
    val tail = offset + nblocks * 4
    (len & 3) match {
      case 3 =>
        k1 ^= (data(tail + 2) & 0xff) << 16
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 2 =>
        k1 ^= (data(tail + 1) & 0xff) << 8
        k1 ^= data(tail) & 0xff
      case 1 =>
        k1 ^= data(tail) & 0xff
      case _ =>
    }
    if ((len & 3) != 0) {
      k1 *= C1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= C2
      h1 ^= k1
    }
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  /** Iceberg hashes every integral/temporal value as a little-endian 8-byte
    * long (int32/date promoted to int64 first, `transforms.go:266-274`).
    * Inlined two-block mix — this runs per row from bucket-transform
    * generated code, and the little-endian blocks of a long are just its
    * low and high ints, so the byte-buffer round-trip would be two heap
    * allocations per row for a byte reorder (byte-parity with the array
    * path is pinned by TransformsSpec's golden vectors).
    */
  def hashLong(v: Long): Int = {
    var h1 = 0
    var k1 = v.toInt // first 4 LE bytes
    k1 *= C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 *= C2
    h1 ^= k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 = h1 * 5 + 0xe6546b64
    k1 = (v >>> 32).toInt // last 4 LE bytes
    k1 *= C1
    k1 = Integer.rotateLeft(k1, 15)
    k1 *= C2
    h1 ^= k1
    h1 = Integer.rotateLeft(h1, 13)
    h1 = h1 * 5 + 0xe6546b64
    h1 ^= 8 // len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  def hashString(s: String): Int = hash(s.getBytes(StandardCharsets.UTF_8))

  /** Decimal: minimal two's-complement big-endian of the unscaled value. */
  def hashDecimal(unscaled: java.math.BigInteger): Int = hash(unscaled.toByteArray)

  def hashUUID(u: java.util.UUID): Int = {
    val b = ByteBuffer.allocate(16)
      .putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits).array()
    hash(b)
  }

  // ---- static entry points used from generated code (IceBucketExpr) ----
  def bucketLong(v: Long, n: Int): Int = (hashLong(v) & Int.MaxValue) % n
  def bucketInt(v: Int, n: Int): Int = bucketLong(v.toLong, n)
  def bucketBytes(v: Array[Byte], n: Int): Int = (hash(v) & Int.MaxValue) % n
  def bucketUTF8(v: org.apache.spark.unsafe.types.UTF8String, n: Int): Int =
    (hash(v.getBytes) & Int.MaxValue) % n
  def bucketDecimal(v: org.apache.spark.sql.types.Decimal, n: Int): Int =
    (hashDecimal(v.toJavaBigDecimal.unscaledValue()) & Int.MaxValue) % n
}

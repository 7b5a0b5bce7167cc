package graft.core

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.UUID

/** Iceberg single-value binary serialization (spec Appendix D) used for
  * manifest lower/upper bounds, plus typed comparators.
  *
  * JVM value representation per Iceberg type:
  * boolean→Boolean, int/date→Int, long/time/timestamp(tz)→Long,
  * float→Float, double→Double, decimal→java.math.BigDecimal,
  * string→String, uuid→String (canonical), binary/fixed→Array[Byte].
  *
  * Mirrors reference `literals.go:127-215` (LiteralFromBytes) and the
  * per-literal Marshal/Unmarshal implementations.
  */
object Bounds {

  def encode(t: IceType, v: Any): Array[Byte] = t match {
    case IceBoolean => Array(if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
    case IceInt | IceDate =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(v.asInstanceOf[Number].intValue()).array()
    case IceLong | IceTime | IceTimestamp | IceTimestampTz | IceTimestampNs | IceTimestampTzNs =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putLong(v.asInstanceOf[Number].longValue()).array()
    case IceFloat =>
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        .putFloat(v.asInstanceOf[Float]).array()
    case IceDouble =>
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        .putDouble(v.asInstanceOf[Double]).array()
    case IceDecimal(_, scale) =>
      val bd = v match {
        case b: JBigDecimal => b.setScale(scale)
        case b: BigDecimal => b.underlying.setScale(scale)
        case other => new JBigDecimal(other.toString).setScale(scale)
      }
      bd.unscaledValue.toByteArray // minimal two's-complement big-endian
    case IceString => v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8)
    case IceUUID =>
      val u = UUID.fromString(v.asInstanceOf[String])
      ByteBuffer.allocate(16).putLong(u.getMostSignificantBits)
        .putLong(u.getLeastSignificantBits).array()
    case IceBinary | IceFixed(_) => v.asInstanceOf[Array[Byte]]
    case other => throw new IllegalArgumentException(s"cannot encode bound of $other")
  }

  def decode(t: IceType, bytes: Array[Byte]): Any = t match {
    case IceBoolean => bytes(0) != 0
    case IceInt | IceDate =>
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getInt
    case IceLong | IceTime | IceTimestamp | IceTimestampTz | IceTimestampNs | IceTimestampTzNs =>
      ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getLong
    case IceFloat => ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getFloat
    case IceDouble => ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).getDouble
    case IceDecimal(_, scale) => new JBigDecimal(new BigInteger(bytes), scale)
    case IceString => new String(bytes, StandardCharsets.UTF_8)
    case IceUUID =>
      val bb = ByteBuffer.wrap(bytes)
      new UUID(bb.getLong, bb.getLong).toString
    case IceBinary | IceFixed(_) => bytes
    case other => throw new IllegalArgumentException(s"cannot decode bound of $other")
  }

  /** Total order per type (nulls are handled by callers). */
  def compare(t: IceType, a: Any, b: Any): Int = t match {
    case IceBoolean => java.lang.Boolean.compare(a.asInstanceOf[Boolean], b.asInstanceOf[Boolean])
    case IceInt | IceDate =>
      Integer.compare(a.asInstanceOf[Number].intValue(), b.asInstanceOf[Number].intValue())
    case IceLong | IceTime | IceTimestamp | IceTimestampTz | IceTimestampNs | IceTimestampTzNs =>
      java.lang.Long.compare(a.asInstanceOf[Number].longValue(), b.asInstanceOf[Number].longValue())
    case IceFloat => java.lang.Float.compare(a.asInstanceOf[Float], b.asInstanceOf[Float])
    case IceDouble => java.lang.Double.compare(a.asInstanceOf[Double], b.asInstanceOf[Double])
    case IceDecimal(_, _) => toJBD(a).compareTo(toJBD(b))
    // code-point order, NOT String.compareTo: UTF-16 code-unit order ranks
    // BMP chars >= U+E000 above supplementary-plane chars (whose surrogates
    // sort at 0xD800-0xDFFF), while Parquet's per-row-group string min/max,
    // Spark's UTF8String, and DuckDB all compare UTF-8 BYTES — which is
    // code-point order. Merging parquet row-group stats or pruning with the
    // UTF-16 order would record an upper bound BELOW the real max and
    // silently drop matching files from scans.
    case IceString | IceUUID =>
      compareCodePoints(a.asInstanceOf[String], b.asInstanceOf[String])
    case IceBinary | IceFixed(_) =>
      java.util.Arrays.compareUnsigned(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(s"cannot compare $other")
  }

  private def compareCodePoints(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  private def toJBD(v: Any): JBigDecimal = v match {
    case b: JBigDecimal => b
    case b: BigDecimal => b.underlying
    case other => new JBigDecimal(other.toString)
  }

  def isNaN(v: Any): Boolean = v match {
    case f: Float => f.isNaN
    case d: Double => d.isNaN
    case _ => false
  }

  /** Truncate a lower-bound value to `width` (strings/binary), identity for
    * other types — reference metrics mode `truncate(16)`.
    */
  def truncateLower(t: IceType, v: Any, width: Int): Any = t match {
    case IceString =>
      val s = v.asInstanceOf[String]
      if (s.codePointCount(0, s.length) <= width) s
      else s.substring(0, s.offsetByCodePoints(0, width))
    case IceBinary | IceFixed(_) =>
      val b = v.asInstanceOf[Array[Byte]]
      if (b.length <= width) b else b.take(width)
    case _ => v
  }

  /** Truncate an upper-bound value to `width`, incrementing the last unit so
    * the result is still an upper bound; None when no valid bound exists.
    */
  def truncateUpper(t: IceType, v: Any, width: Int): Option[Any] = t match {
    case IceString =>
      val s = v.asInstanceOf[String]
      if (s.codePointCount(0, s.length) <= width) Some(s)
      else {
        val cps = s.codePoints().toArray.take(width)
        // increment the last incrementable code point
        var i = cps.length - 1
        while (i >= 0 && cps(i) == Character.MAX_CODE_POINT) i -= 1
        if (i < 0) None
        else {
          val out = cps.take(i + 1)
          out(i) += 1
          // U+D7FF + 1 lands in the surrogate block [U+D800, U+DFFF], which
          // never occurs as a scalar value in a valid string — an unpaired
          // surrogate UTF-8-encodes as '?' (0x3F), collapsing the bound far
          // BELOW the data it must cover. The next valid scalar is U+E000,
          // and every string code point above U+D7FF is >= U+E000, so it is
          // still a tight upper bound.
          if (out(i) >= Character.MIN_SURROGATE.toInt &&
              out(i) <= Character.MAX_SURROGATE.toInt)
            out(i) = 0xE000
          Some(new String(out, 0, out.length))
        }
      }
    case IceBinary | IceFixed(_) =>
      val b = v.asInstanceOf[Array[Byte]]
      if (b.length <= width) Some(b)
      else {
        val out = b.take(width)
        var i = out.length - 1
        while (i >= 0 && out(i) == -1) i -= 1
        if (i < 0) None
        else { out(i) = (out(i) + 1).toByte; Some(out.take(i + 1)) }
      }
    case _ => Some(v)
  }
}

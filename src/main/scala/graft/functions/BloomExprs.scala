package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** A PORTABLE Bloom filter with fully-specified hashing, replacing Spark's
  * `util.sketch.BloomFilter` (whose murmur-based probe positions are
  * engine-private, so its false-positive pattern could never face a SQL
  * oracle).
  *
  * Spec — restatable verbatim in any engine with md5():
  *   - key hashes: h1 = first  MD5 word (bytes 0-3, big-endian) & 0x7fffffff,
  *                 h2 = second MD5 word (bytes 4-7, big-endian) & 0x7fffffff
  *     (the same two 31-bit words [[TokenHash.hash62]] packs);
  *   - probe i (Kirsch-Mitzenmacher double hashing): (h1 + i*h2) mod m,
  *     i < k — max value < 2^31 + 13·2^31, no int64 overflow anywhere;
  *   - sizing avoids transcendentals so both engines derive m from the key
  *     count EXACTLY: m = max(64, 20·n) bits, k = 13 — within a few percent
  *     of the ln-optimal pair for fpp = 1e-4 (19.17 bits/key, k = 13.3).
  *
  * Membership of key g is then "all k probe positions of g are set", and a
  * SQL oracle states the identical predicate as a probes-against-set join —
  * the false positives REPRODUCE, they're part of the spec.
  */
final class GraftBloom(val numBits: Long, val bits: Array[Long])
    extends Serializable {

  def mightContain(bytes: Array[Byte]): Boolean = {
    val h = GraftBloom.hashPair(bytes)
    val h1 = (h >>> 31) & 0x7fffffffL
    val h2 = h & 0x7fffffffL
    var i = 0
    while (i < GraftBloom.NumHashes) {
      val pos = (h1 + i * h2) % numBits
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}

object GraftBloom {
  /** Bits per distinct key (m = BitsPerKey·n) — integer so m needs no ln. */
  val BitsPerKey = 20L
  /** Probe count k. */
  val NumHashes = 13

  /** Packed (h1 << 31) | h2 — identical derivation to [[TokenHash.hash62]]. */
  def hashPair(bytes: Array[Byte]): Long = TokenHash.hash62(bytes)

  def numBitsFor(expectedKeys: Long): Long = math.max(64L, BitsPerKey * expectedKeys)

  /** Build the filter from a string keyset DataFrame column, DISTRIBUTED:
    * each partition ors its keys' probe bits into a local bitmap, the
    * bitmaps reduce pairwise — the driver never sees the keys, only
    * (m/8)-byte bitmaps (2.5 MB per million keys at 20 bits/key).
    */
  def build(keys: DataFrame, column: String, expectedKeys: Long): GraftBloom = {
    val m = numBitsFor(expectedKeys)
    val words = ((m + 63) / 64).toInt
    val bits = keys.select(column).as(Encoders.STRING).rdd
      .treeAggregate(new Array[Long](words))(
        (acc, key) => {
          // null-skip, symmetric with the probe side (BloomMightContainExpr
          // nullSafeEval): a null key must not NPE the whole build job
          if (key != null) {
            val h = hashPair(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val h1 = (h >>> 31) & 0x7fffffffL
            val h2 = h & 0x7fffffffL
            var i = 0
            while (i < NumHashes) {
              val pos = (h1 + i * h2) % m
              acc((pos >>> 6).toInt) |= (1L << (pos & 63))
              i += 1
            }
          }
          acc
        },
        (a, b) => { var i = 0; while (i < a.length) { a(i) |= b(i); i += 1 }; a })
    new GraftBloom(m, bits)
  }
}

/** Bloom-filter membership as a native codegen expression: the sketch rides
  * along as a referenced object in the generated class (same pattern as
  * [[IvfAssignExpr]]'s codebook), so a corpus-wide probe pass stays inside
  * whole-stage codegen and probes UTF-8 BYTES directly — no per-row String
  * materialization.
  */
final case class BloomMightContainExpr(child: Expression, filter: GraftBloom)
  extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContain(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter, "graft.functions.GraftBloom")
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomExprs {
  /** Column form: does the Bloom sketch (maybe) contain this string? */
  def mightContain(c: Column, filter: GraftBloom): Column =
    GraftShim.column(BloomMightContainExpr(GraftShim.expression(c), filter))
}

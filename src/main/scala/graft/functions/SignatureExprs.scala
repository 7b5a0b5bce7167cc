package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  LongType, StringType}

/** Static entry points the codegen expressions below call — one fused loop
  * per row, replacing the Scala UDFs that previously computed dedup
  * signatures (a UDF deserializes the token array into a `Seq[String]` per
  * row and blocks whole-stage codegen around it).
  *
  * CROSS-ENGINE DETERMINISM (round 12): token hashes derive from MD5 —
  * a bit-identical primitive in every engine — and every downstream step
  * (affine permutations, band folds, bit votes) is overflow-free int64
  * arithmetic, so a DuckDB oracle can restate the ENTIRE signature → band →
  * candidate → verify pipeline and hash-match it. The previous murmur3
  * derivation was JVM-only (and its `coeffA * x` silently wrapped Long,
  * which a checked-arithmetic engine cannot reproduce at all); swapping the
  * hash family changes candidate sets only statistically — the recall specs
  * in DedupSpec still gate them.
  */
object TokenHash {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private def digest(bytes: Array[Byte]): Array[Byte] = {
    val d = md.get(); d.reset(); d.digest(bytes)
  }

  /** First 4 MD5 bytes, big-endian, as an unsigned 32-bit value — what the
    * oracle states as `CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)`.
    */
  def hash32(bytes: Array[Byte]): Long = {
    val h = digest(bytes)
    ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
  }

  /** 62-bit nonnegative hash from the first 8 MD5 bytes: two big-endian
    * 32-bit words, each masked to 31 bits, packed — `hi31 * 2^31 + lo31`
    * in the oracle. Staying under 63 bits keeps every downstream shift/xor
    * free of sign-extension differences between engines.
    */
  def hash62(bytes: Array[Byte]): Long = {
    val h = digest(bytes)
    val hi = (((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)) & 0x7fffffffL
    val lo = (((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)) & 0x7fffffffL
    (hi << 31) | lo
  }
}

object MinHashSig {
  val NumHashes = 64
  /** 2^31 - 1 (Mersenne). The modulus must sit WELL BELOW the `a*x + b`
    * range so the affine map wraps many times — with a modulus above the
    * product range the map is monotone in x and every permutation picks the
    * SAME min token (observed: est_jaccard collapsing to a shared-min-token
    * indicator). Here a*x reaches 2^62 (no int64 overflow, so a
    * checked-arithmetic oracle can restate it) while the modulus is 2^31 —
    * a proper universal-hash wrap.
    */
  val Prime = 2147483647L

  /** Per-permutation coefficients: a deterministic multiplicative scramble
    * of the permutation index, a odd < 2^30 (so `a * hash32` stays < 2^62),
    * b < Prime. The SAME arrays are embedded as literals into the oracle
    * SQL ([[graft.ops.Dedup.minhashCandCtes]]), so the two engines cannot
    * drift.
    */
  val coeffA: Array[Long] =
    Array.tabulate(NumHashes)(i => ((i.toLong * 2654435761L + 0x9E3779B9L) % (1L << 30)) | 1L)
  val coeffB: Array[Long] =
    Array.tabulate(NumHashes)(i => (i.toLong * 40503L + 0x7F4A7C15L) % Prime)

  def compute(tokens: ArrayData): ArrayData = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      val x = TokenHash.hash32(tokens.getUTF8String(t).getBytes)
      var i = 0
      while (i < NumHashes) {
        val h = (coeffA(i) * x + coeffB(i)) % Prime
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      t += 1
    }
    new GenericArrayData(sig)
  }
}

object SimHashSig {
  /** Effective bit width: [[TokenHash.hash62]] leaves bits 62-63 always
    * clear, so votes there are always negative and the simhash is a
    * nonnegative 62-bit value (bands 0-2 carry 16 bits, band 3 carries 14).
    */
  val Bits = 62

  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      val h = TokenHash.hash62(tokens.getUTF8String(t).getBytes)
      var i = 0
      while (i < Bits) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var acc = 0L
    var i = 0
    while (i < Bits) { if (votes(i) > 0) acc |= (1L << i); i += 1 }
    acc
  }
}

object LshBuckets {
  val Tables = 4
  val PlanesPerTable = 4

  /** Deterministic integer hyperplane component in [-8, 7]: an LCG scramble
    * of the flattened (table, plane, dim) index — pure int64 arithmetic a
    * SQL oracle can restate verbatim (`((1103515245*idx + 12345) % 2^31)
    * % 16 - 8`). Projections run over the per-vector int8 QUANTIZATION
    * codes ([[graft.ops.Similarity]]), so every dot product is an exact
    * small-integer sum (|Σ r·code| ≤ 64·8·127 < 2^17) — sign decisions are
    * bit-identical across engines, unlike the float hyperplanes this
    * replaces (whose accumulation order no SQL engine can promise).
    */
  def plane(table: Int, p: Int, d: Int): Long =
    ((1103515245L * (table.toLong * 1024 + p.toLong * 64 + d) + 12345L) %
      2147483648L) % 16L - 8L

  // plane() is a pure constant of (t,h,d): precompute all 4x4x64 = 1024
  // coefficients once — compute() runs per corpus row from generated code,
  // and re-deriving them cost ~4k multiply/mod ops per row
  private val planeTab: Array[Long] = {
    val a = new Array[Long](Tables * PlanesPerTable * 64)
    var t = 0
    while (t < Tables) {
      var h = 0
      while (h < PlanesPerTable) {
        var d = 0
        while (d < 64) {
          a((t * PlanesPerTable + h) * 64 + d) = plane(t, h, d)
          d += 1
        }
        h += 1
      }
      t += 1
    }
    a
  }

  /** Bucket per table from a vector's int8 codes (array<long>). */
  def compute(codes: ArrayData): ArrayData = {
    val out = new Array[Int](Tables)
    val n = math.min(codes.numElements(), 64)
    var t = 0
    while (t < Tables) {
      var bucket = 0
      var h = 0
      while (h < PlanesPerTable) {
        val base = (t * PlanesPerTable + h) * 64
        var proj = 0L
        var d = 0
        while (d < n) { proj += planeTab(base + d) * codes.getLong(d); d += 1 }
        if (proj >= 0) bucket |= (1 << h)
        h += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** 64-permutation MinHash signature of a token array (dedup LSH). */
final case class MinHashSigExpr(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs an array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** Multi-table hyperplane LSH buckets of a vector's int8 quantization
  * codes (one signed-projection bucket per table).
  */
final case class LshBucketsExpr(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets needs an array<bigint> of quantization codes, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LshBuckets.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketsExpr =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array (sign-aggregated bit votes). */
final case class SimHashExpr(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash needs an array<string>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType,
  LongType, StringType}

import graft.core.Murmur3

/** Static entry points the codegen expressions below call — one fused loop
  * per row, replacing the Scala UDFs that previously computed dedup
  * signatures (a UDF deserializes the token array into a `Seq[String]` per
  * row and blocks whole-stage codegen around it). Hash derivations are
  * BIT-IDENTICAL to the UDFs they replace, so signatures, band buckets, and
  * candidate sets are unchanged.
  */
object MinHashSig {
  val NumHashes = 64
  private val Prime = 2305843009213693951L // 2^61 - 1

  // deterministic per-permutation coefficients, derived once from the spec hash
  private val coeffA: Array[Long] =
    Array.tabulate(NumHashes)(i => 2L * (Murmur3.hashLong(i.toLong * 2 + 1).toLong & 0xffffffffL) + 1)
  private val coeffB: Array[Long] =
    Array.tabulate(NumHashes)(i => Murmur3.hashLong(i.toLong * 2 + 2).toLong & 0xffffffffL)

  def compute(tokens: ArrayData): ArrayData = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      val x = Murmur3.hashString(tokens.getUTF8String(t).toString).toLong & 0xffffffffL
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
  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      val tok = tokens.getUTF8String(t).toString
      val h = (Murmur3.hashString(tok).toLong << 32) |
        (Murmur3.hashString(tok.reverse).toLong & 0xffffffffL)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var acc = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) acc |= (1L << i); i += 1 }
    acc
  }
}

object LshBuckets {
  val Tables = 4
  val PlanesPerTable = 4
  // deterministic random hyperplanes from the spec murmur3 (identical
  // derivation to the UDF this replaces)
  private val planeVals: Array[Array[Double]] =
    Array.tabulate(Tables * PlanesPerTable, 64) { (h, d) =>
      Murmur3.hashLong(h.toLong * 64 + d).toDouble / Int.MaxValue
    }

  def compute(vec: ArrayData): ArrayData = {
    val out = new Array[Int](Tables)
    var t = 0
    while (t < Tables) {
      var bucket = 0
      var h = 0
      while (h < PlanesPerTable) {
        val plane = planeVals(t * PlanesPerTable + h)
        var dotv = 0.0
        var d = 0
        val n = math.min(vec.numElements(), 64)
        while (d < n) { dotv += vec.getFloat(d) * plane(d); d += 1 }
        if (dotv >= 0) bucket |= (1 << h)
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

/** Multi-table random-hyperplane LSH buckets of a float-vector column (one
  * signed-projection bucket per table).
  */
final case class LshBucketsExpr(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets needs an array<float>, got $other")
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

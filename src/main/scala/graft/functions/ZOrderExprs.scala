package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Bit-interleaving for z-order clustering, called per row from generated
  * code. Each long maps through `v ^ Long.MinValue` first — the standard
  * order-preserving cast to unsigned space, so the byte-lexicographic
  * order of the output agrees with SIGNED numeric order of the inputs —
  * then the two 64-bit values interleave MSB-first into 16 bytes: output
  * bit 2i is input A's bit i-from-the-top, bit 2i+1 is B's. No range
  * assumption: every long value keeps full fidelity.
  */
object ZOrderOps {
  /** N-column generalization: bit i of column c lands at output position
    * N·i + c (MSB first), so byte-lexicographic order walks the N-dim
    * z-curve. 8·N bytes out; for N = 2 this is bit-identical to
    * [[interleave2]].
    */
  def interleave(vals: org.apache.spark.sql.catalyst.util.ArrayData): Array[Byte] = {
    val n = vals.numElements()
    val out = new Array[Byte](8 * n)
    var c = 0
    while (c < n) {
      val v = vals.getLong(c) ^ Long.MinValue
      var i = 0
      while (i < 64) {
        val bit = (v >>> (63 - i)) & 1L
        val p = n * i + c
        out(p >> 3) = (out(p >> 3) | (bit << (7 - (p & 7)))).toByte
        i += 1
      }
      c += 1
    }
    out
  }

  def interleave2(a: Long, b: Long): Array[Byte] = {
    val au = a ^ Long.MinValue
    val bu = b ^ Long.MinValue
    val out = new Array[Byte](16)
    var i = 0
    while (i < 64) {
      val bitA = (au >>> (63 - i)) & 1L
      val bitB = (bu >>> (63 - i)) & 1L
      val pA = 2 * i
      val pB = 2 * i + 1
      out(pA >> 3) = (out(pA >> 3) | (bitA << (7 - (pA & 7)))).toByte
      out(pB >> 3) = (out(pB >> 3) | (bitB << (7 - (pB & 7)))).toByte
      i += 1
    }
    out
  }
}

/** Two-column z-value as a native codegen expression: BINARY(16) whose
  * byte-lexicographic order walks the z-curve over the two (sign-flipped)
  * long inputs. Sorting a rewrite by this column gives every output file a
  * contiguous z-range — tight min/max bounds on BOTH columns at once,
  * which is what makes 2-D box predicates prune files
  * ([[graft.table.IceTable.rewriteZOrdered]]).
  */
final case class ZOrder2Expr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "zorder2"

  private def ok(t: DataType): Boolean = t == LongType || t == IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 needs int/long columns, got ${left.dataType}, ${right.dataType}")

  private def asLong(v: Any): Long = v match {
    case i: Integer => i.longValue()
    case l: java.lang.Long => l.longValue()
    case other => other.asInstanceOf[Long]
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderOps.interleave2(asLong(a), asLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderOps.interleave2((long)($a), (long)($b))")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ZOrder2Expr = copy(left = newLeft, right = newRight)
}

/** N-column z-value over a pre-assembled long array (the Column builder
  * packs the input columns with `array(...)`, itself codegen'd): BINARY of
  * 8·N bytes walking the N-dim z-curve. Null inputs are mapped to
  * Long.MinValue by the builder — for a clustering REWRITE that is the
  * right semantics: nulls sort first and cluster together.
  */
final case class ZOrderArrayExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "zorder"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zorder needs an array<bigint>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    ZOrderOps.interleave(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ZOrderOps.interleave($c)")

  override protected def withNewChildInternal(newChild: Expression): ZOrderArrayExpr =
    copy(child = newChild)
}

/** Analysis-time-checked promotion for [[ZOrderExprs.zorder]]: accepts
  * ONLY integral/date columns (the silent `cast(LongType)` it replaces
  * truncated doubles/decimals/strings toward zero -- order-breaking --
  * with no error) and saturates a genuine Long.MinValue value to
  * MinValue+1 so the builder's NULL sentinel (MinValue) never collides
  * with a real value: the adjacent-value merge is clustering-harmless;
  * null/value confusion is not.
  */
final case class ZOrderNormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_norm"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.DateType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"zorder needs int/long/date columns, got $other (cast explicitly if " +
        "truncation is intended)")
  }

  override protected def nullSafeEval(v: Any): Any =
    math.max(v.asInstanceOf[Number].longValue(), Long.MinValue + 1L)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"Math.max((long)($c), ${Long.MinValue + 1L}L)")

  override protected def withNewChildInternal(newChild: Expression): ZOrderNormExpr =
    copy(child = newChild)
}

object ZOrderExprs {
  /** Column form: the 16-byte z-value of two int/long columns. */
  def zorder2(a: Column, b: Column): Column =
    GraftShim.column(ZOrder2Expr(GraftShim.expression(a), GraftShim.expression(b)))

  /** N-column z-value (N ≥ 2): int/long/date columns (analysis-time type
    * check — no silent value-mangling casts), nulls clustered first.
    */
  def zorder(cols: Column*): Column = {
    require(cols.length >= 2, "zorder needs at least two columns")
    import org.apache.spark.sql.functions.{array, coalesce, lit}
    val longs = cols.map(c =>
      coalesce(GraftShim.column(ZOrderNormExpr(GraftShim.expression(c))),
        lit(Long.MinValue)))
    GraftShim.column(ZOrderArrayExpr(GraftShim.expression(array(longs: _*))))
  }
}

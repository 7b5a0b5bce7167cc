package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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

object ZOrderExprs {
  /** Column form: the 16-byte z-value of two int/long columns. */
  def zorder2(a: Column, b: Column): Column =
    GraftShim.column(ZOrder2Expr(GraftShim.expression(a), GraftShim.expression(b)))
}

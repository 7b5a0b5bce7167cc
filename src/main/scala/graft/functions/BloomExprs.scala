package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen expression: the sketch rides
  * along as a referenced object in the generated class (same pattern as
  * [[IvfAssignExpr]]'s codebook), so a corpus-wide probe pass stays inside
  * whole-stage codegen and probes UTF-8 BYTES directly — no per-row String
  * materialization. `BloomFilter.putString` hashes the string's UTF-8
  * bytes, so probing with `mightContainBinary(utf8.getBytes)` sees exactly
  * the inserted keys.
  */
final case class BloomMightContainExpr(child: Expression, filter: BloomFilter)
  extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c => s"$ref.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

object BloomExprs {
  /** Column form: does the Bloom sketch (maybe) contain this string? */
  def mightContain(c: Column, filter: BloomFilter): Column =
    GraftShim.column(BloomMightContainExpr(GraftShim.expression(c), filter))
}

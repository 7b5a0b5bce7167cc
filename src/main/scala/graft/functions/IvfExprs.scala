package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Static entry points for the IVF codegen expressions below — one call per
  * row from generated code, delegating to [[IvfCodebook]]'s array math so
  * cell assignments are BIT-IDENTICAL to the Scala UDFs they replace (the
  * UDFs deserialized the embedding into a `Seq[Float]` per row and broke
  * whole-stage codegen around the corpus-wide assignment pass).
  */
object IvfOps {
  private def toDoubles(vec: ArrayData): Array[Double] = {
    val n = vec.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = vec.getFloat(i).toDouble; i += 1 }
    out
  }

  /** Euclidean-nearest cell of a float-vector row. */
  def assign(centers: Array[Array[Double]], vec: ArrayData): Int =
    IvfCodebook.nearest(centers, toDoubles(vec))

  /** The `nProbe` cosine-nearest cells of a query row. */
  def probe(centers: Array[Array[Double]], vec: ArrayData, nProbe: Int): ArrayData =
    new GenericArrayData(IvfCodebook.probeCells(centers, toDoubles(vec), nProbe))
}

/** IVF cell assignment as a native codegen expression: the (tiny) codebook
  * rides along as a referenced object in the generated class, so the
  * corpus-wide assignment pass stays inside whole-stage codegen with zero
  * per-row boxing. Replaces `assignUdf` (per-row `Seq[Float]`
  * deserialization) on the hot path of `sim_ann_ivf`.
  */
final case class IvfAssignExpr(child: Expression, centers: Array[Array[Double]])
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_assign"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_assign needs an array<float>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    IvfOps.assign(centers, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCenters", centers, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.IvfOps.assign($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfAssignExpr =
    copy(child = newChild)
}

/** Query-side IVF probing (the `nProbe` cosine-nearest cells) as a codegen
  * expression — same referenced-codebook pattern as [[IvfAssignExpr]].
  */
final case class IvfProbeExpr(child: Expression, centers: Array[Array[Double]],
    nProbe: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ivf_probe needs an array<float>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    IvfOps.probe(centers, input.asInstanceOf[ArrayData], nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCenters", centers, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.IvfOps.probe($ref, $c, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfProbeExpr =
    copy(child = newChild)
}

object IvfExprs {
  /** Column form: euclidean-nearest IVF cell id of a float-vector column. */
  def ivfAssign(vec: Column, centers: Array[Array[Double]]): Column =
    GraftShim.column(IvfAssignExpr(GraftShim.expression(vec), centers))

  /** Column form: the `nProbe` cosine-nearest cell ids of a query column. */
  def ivfProbe(vec: Column, centers: Array[Array[Double]], nProbe: Int): Column =
    GraftShim.column(IvfProbeExpr(GraftShim.expression(vec), centers, nProbe))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Cosine similarity over embedding arrays as a NATIVE codegen expression.
  *
  * The `transform`/`zip_with`/`aggregate` formulation is a chain of
  * interpreted higher-order functions (CodegenFallback, no common-
  * subexpression elimination), which dominates the embedding operators'
  * runtime. This expression evaluates one fused loop inside whole-stage
  * codegen, accumulating in double in ascending index order — bit-identical
  * to the sequential HOF fold it replaces, so oracle hashes are unchanged.
  * Assumes non-null elements (the embeddings data contract).
  */
final case class CosineSimExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(s"cosine_sim over $other")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs float/double arrays, got ${left.dataType} and ${right.dataType}")
  }

  // fixed per expression instance — don't re-derive via dataType pattern
  // match on every interpreted-path row
  @transient private lazy val leftIsFloat = elemIsFloat(left)
  @transient private lazy val rightIsFloat = elemIsFloat(right)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (fx, fy) = (leftIsFloat, rightIsFloat)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getX = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getY = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        for (int $i = 0; $i < $n; $i++) {
          double $xv = (double) $a.$getX($i);
          double $yv = (double) $b.$getY($i);
          $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Fraction of pairwise-equal components of two long arrays (the MinHash
  * signature-agreement estimator) — replaces an interpreted
  * `zip_with`/`filter`/`size` chain with one codegen loop.
  */
final case class EqualFracExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "equal_frac"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"equal_frac needs long arrays, got ${left.dataType} and ${right.dataType}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var eq = 0; var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) eq += 1; i += 1 }
    if (n == 0) 0.0 else eq.toDouble / n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val eq = ctx.freshName("eq"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        int $eq = 0;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.getLong($i) == $b.getLong($i)) $eq++;
        }
        ${ev.value} = $n == 0 ? 0.0 : ((double) $eq) / $n;
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Per-vector symmetric int8 quantization codes as ONE fused loop:
  * `code_i = round(x_i / scale)`, `scale = max(max_i |x_i|, 1e-12) / 127`.
  * The `transform(...)/array_max(...)` formulation it replaces is a chain
  * of interpreted higher-order functions whose scale sub-expression gets
  * INLINED PER ELEMENT under projection collapse (64×64 ops/row); this
  * expression computes maxabs once and rounds with the same
  * half-away-from-zero semantics as Spark's `round` (BigDecimal HALF_UP on
  * nonnegative-scaled magnitudes ≡ floor(|x|/scale + 0.5) with the sign
  * restored), so codes are bit-identical to the SQL-stated oracle rule.
  */
object Int8Codes {
  def compute(vec: ArrayData): ArrayData = {
    val n = vec.numElements()
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(vec.getFloat(i).toDouble)
      if (a > maxabs) maxabs = a
      i += 1
    }
    val scale = math.max(maxabs, 1e-12) / 127.0
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      val x = vec.getFloat(i).toDouble / scale
      out(i) = if (x >= 0) math.floor(x + 0.5).toLong else -math.floor(-x + 0.5).toLong
      i += 1
    }
    new GenericArrayData(out)
  }
}

final case class Int8CodesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "int8_codes"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"int8_codes needs an array<float>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    Int8Codes.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Int8Codes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Int8CodesExpr =
    copy(child = newChild)
}

object VectorExprs {
  /** Column form: cosine similarity of two float/double array columns. */
  def cosineSim(a: Column, b: Column): Column =
    GraftShim.column(CosineSimExpr(GraftShim.expression(a), GraftShim.expression(b)))

  /** Column form: fraction of equal components of two long-array columns. */
  def equalFrac(a: Column, b: Column): Column =
    GraftShim.column(EqualFracExpr(GraftShim.expression(a), GraftShim.expression(b)))

  /** Column form: per-vector symmetric int8 quantization codes. */
  def int8Codes(c: Column): Column =
    GraftShim.column(Int8CodesExpr(GraftShim.expression(c)))
}

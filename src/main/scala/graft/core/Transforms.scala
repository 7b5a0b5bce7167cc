package graft.core

import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Iceberg partition transforms: pure functions value → partition value,
  * with three faces each:
  *   - `apply`: driver-side evaluation on JVM literal values (used by the
  *     planner's partition-tuple evaluator and path rendering);
  *   - `toColumn`: a Catalyst expression for executor-side evaluation in the
  *     write path (codegen-friendly — bucket is a custom UnaryExpression
  *     with doGenCode, everything else composes built-ins);
  *   - `project`: inclusive predicate projection row-filter → partition-space
  *     filter (the part Catalyst has no equivalent for; reference
  *     `transforms.go:145-160,349-373,505-553,571-595,989-1048`).
  *
  * Mirrors reference `transforms.go:85-919`.
  */
sealed trait Transform {
  def name: String
  def resultType(source: IceType): IceType
  def apply(source: IceType, v: Any): Any
  def toColumn(c: Column, source: IceType): Column

  /** Monotone transforms (reference `transforms.go` PreservesOrder):
    * source order implies transformed order, so footer min/max bracketing
    * a single transformed value proves the whole file shares that
    * partition value — the property `addFiles` partition inference needs.
    */
  def preservesOrder: Boolean = false

  /** Project a bound predicate on the source column to a predicate on the
    * transformed partition value; None = cannot project (partition pruning
    * falls back to "keep").
    */
  def project(partName: String, p: BoundPred): Option[Pred]

  def toHumanString(source: IceType, v: Any): String =
    if (v == null) "null" else v.toString
}

case object IdentityTransform extends Transform {
  val name = "identity"
  override def preservesOrder: Boolean = true
  def resultType(source: IceType): IceType = source
  def apply(source: IceType, v: Any): Any = v
  def toColumn(c: Column, source: IceType): Column = c
  def project(partName: String, p: BoundPred): Option[Pred] =
    Some(Pred(p.op, partName, p.literals))
  override def toHumanString(source: IceType, v: Any): String =
    if (v == null) "null"
    else source match {
      case IceDate => LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue()).toString
      case IceTimestamp | IceTimestampTz =>
        val micros = v.asInstanceOf[Number].longValue()
        Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L).toString
      case IceTimestampNs | IceTimestampTzNs =>
        val nanos = v.asInstanceOf[Number].longValue()
        Instant.ofEpochSecond(Math.floorDiv(nanos, 1000000000L),
          Math.floorMod(nanos, 1000000000L)).toString
      case IceBinary | IceFixed(_) =>
        java.util.Base64.getEncoder.encodeToString(v.asInstanceOf[Array[Byte]])
      case _ => v.toString
    }
}

case object VoidTransform extends Transform {
  val name = "void"
  def resultType(source: IceType): IceType = source
  def apply(source: IceType, v: Any): Any = null
  def toColumn(c: Column, source: IceType): Column = lit(null).cast(IceType.toSpark(source))
  def project(partName: String, p: BoundPred): Option[Pred] = None
}

final case class BucketTransform(n: Int) extends Transform {
  val name = s"bucket[$n]"
  def resultType(source: IceType): IceType = IceInt

  def apply(source: IceType, v: Any): Any =
    if (v == null) null
    else {
      val h = source match {
        case IceInt | IceDate => Murmur3.hashLong(v.asInstanceOf[Number].longValue())
        case IceLong | IceTime | IceTimestamp | IceTimestampTz =>
          Murmur3.hashLong(v.asInstanceOf[Number].longValue())
        case IceTimestampNs | IceTimestampTzNs =>
          // spec appendix B: ns timestamps hash their µs value, so the same
          // instant buckets identically across timestamp precisions
          Murmur3.hashLong(Math.floorDiv(v.asInstanceOf[Number].longValue(), 1000L))
        case IceString => Murmur3.hashString(v.asInstanceOf[String])
        case IceDecimal(_, _) => v match {
          case b: java.math.BigDecimal => Murmur3.hashDecimal(b.unscaledValue())
          case b: BigDecimal => Murmur3.hashDecimal(b.underlying.unscaledValue())
        }
        case IceUUID => Murmur3.hashUUID(java.util.UUID.fromString(v.toString))
        case IceBinary | IceFixed(_) => Murmur3.hash(v.asInstanceOf[Array[Byte]])
        case other => throw new IllegalArgumentException(s"cannot bucket $other")
      }
      (h & Int.MaxValue) % n
    }

  def toColumn(c: Column, source: IceType): Column = source match {
    case IceTimestampNs | IceTimestampTzNs =>
      // floor-divide the nanos long to µs before hashing (spec appendix B);
      // exact long arithmetic — a double division would lose sub-µs bits
      import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal => CLit, Pmod, Subtract}
      val ns = GraftShim.expression(c)
      val micros = IntegralDivide(Subtract(ns, Pmod(ns, CLit(1000L))), CLit(1000L))
      GraftShim.column(IceBucketExpr(micros, n))
    case _ => GraftShim.column(IceBucketExpr(GraftShim.expression(c), n))
  }

  /** Bucket is not order-preserving: only Eq/In (and null checks) project
    * (reference `transforms.go:349-373`).
    */
  def project(partName: String, p: BoundPred): Option[Pred] = p.op match {
    case Op.IsNull | Op.NotNull => Some(Pred(p.op, partName))
    case Op.Eq => Some(Pred(Op.Eq, partName, Seq(apply(p.tpe, p.literal))))
    case Op.In => Some(Pred(Op.In, partName, p.literals.map(apply(p.tpe, _)).distinct))
    case _ => None
  }
}

final case class TruncateTransform(w: Int) extends Transform {
  require(w > 0, "truncate width must be > 0")
  val name = s"truncate[$w]"
  override def preservesOrder: Boolean = true
  def resultType(source: IceType): IceType = source

  def apply(source: IceType, v: Any): Any =
    if (v == null) null
    else source match {
      case IceInt =>
        val x = v.asInstanceOf[Number].intValue(); x - Math.floorMod(x, w)
      case IceLong =>
        val x = v.asInstanceOf[Number].longValue(); x - Math.floorMod(x, w.toLong)
      case IceDecimal(_, scale) =>
        val bd = v match {
          case b: java.math.BigDecimal => b
          case b: BigDecimal => b.underlying
        }
        val unscaled = bd.unscaledValue()
        val wBig = java.math.BigInteger.valueOf(w.toLong)
        val mod = unscaled.mod(wBig) // BigInteger.mod is always non-negative
        new java.math.BigDecimal(unscaled.subtract(mod), scale)
      case IceString => Bounds.truncateLower(IceString, v, w)
      case IceBinary | IceFixed(_) => Bounds.truncateLower(IceBinary, v, w)
      case other => throw new IllegalArgumentException(s"cannot truncate $other")
    }

  def toColumn(c: Column, source: IceType): Column = source match {
    case IceInt | IceLong => c - pmod(c, lit(w))
    case IceString => substring(c, 1, w)
    case IceBinary | IceFixed(_) =>
      GraftShim.column(IceTruncateBinaryExpr(GraftShim.expression(c), w))
    case IceDecimal(p, s) =>
      // unscaled - (unscaled mod w): exact decimal arithmetic in Catalyst
      val step = java.math.BigDecimal.valueOf(w.toLong, s)
      c - pmod(c, lit(step))
    case other => throw new IllegalArgumentException(s"cannot truncate $other")
  }

  /** Truncate is order-preserving → range predicates project with boundary
    * adjustment (reference `truncateNumber`/`truncateArray`
    * `transforms.go:989-1048`).
    */
  def project(partName: String, p: BoundPred): Option[Pred] = {
    def t(v: Any): Any = apply(p.tpe, v)
    val isIntegral = p.tpe == IceInt || p.tpe == IceLong
    def minus1(v: Any): Any = p.tpe match {
      case IceInt => v.asInstanceOf[Number].intValue() - 1
      case IceLong => v.asInstanceOf[Number].longValue() - 1
      case _ => v
    }
    def plus1(v: Any): Any = p.tpe match {
      case IceInt => v.asInstanceOf[Number].intValue() + 1
      case IceLong => v.asInstanceOf[Number].longValue() + 1
      case _ => v
    }
    p.op match {
      case Op.IsNull | Op.NotNull => Some(Pred(p.op, partName))
      case Op.Eq => Some(Pred(Op.Eq, partName, Seq(t(p.literal))))
      case Op.In => Some(Pred(Op.In, partName, p.literals.map(t).distinct))
      case Op.Lt if isIntegral => Some(Pred(Op.LtEq, partName, Seq(t(minus1(p.literal)))))
      case Op.LtEq if isIntegral => Some(Pred(Op.LtEq, partName, Seq(t(p.literal))))
      case Op.Gt if isIntegral => Some(Pred(Op.GtEq, partName, Seq(t(plus1(p.literal)))))
      case Op.GtEq if isIntegral => Some(Pred(Op.GtEq, partName, Seq(t(p.literal))))
      case Op.Lt | Op.LtEq if p.tpe == IceString =>
        Some(Pred(Op.LtEq, partName, Seq(t(p.literal))))
      case Op.Gt | Op.GtEq if p.tpe == IceString =>
        Some(Pred(Op.GtEq, partName, Seq(t(p.literal))))
      case Op.StartsWith if p.tpe == IceString =>
        // CODE-POINT lengths, matching apply()'s truncateLower: a UTF-16
        // char count would project a prefix containing astral characters
        // to the wrong Eq cut and prune partitions holding matching rows
        val s = p.literal.asInstanceOf[String]
        if (s.codePointCount(0, s.length) < w)
          Some(Pred(Op.StartsWith, partName, Seq(s)))
        else Some(Pred(Op.Eq, partName,
          Seq(s.substring(0, s.offsetByCodePoints(0, w)))))
      case _ => None
    }
  }
}

/** Shared machinery of the four time transforms (all monotonic in the
  * source value, so range predicates project directly with ±1-unit boundary
  * adjustment — reference `projectTimeTransform` `transforms.go:571-595`).
  */
sealed abstract class TimeTransform extends Transform {
  override def preservesOrder: Boolean = true
  def resultType(source: IceType): IceType = IceInt
  protected def fromDays(days: Int): Int
  protected def fromMicros(micros: Long): Int

  def apply(source: IceType, v: Any): Any =
    if (v == null) null
    else source match {
      case IceDate => fromDays(v.asInstanceOf[Number].intValue())
      case IceTimestamp | IceTimestampTz => fromMicros(v.asInstanceOf[Number].longValue())
      case IceTimestampNs | IceTimestampTzNs =>
        fromMicros(Math.floorDiv(v.asInstanceOf[Number].longValue(), 1000L))
      case other => throw new IllegalArgumentException(s"cannot apply $name to $other")
    }

  def project(partName: String, p: BoundPred): Option[Pred] = {
    def t(v: Any): Any = apply(p.tpe, v)
    def minus1(v: Any): Any = p.tpe match {
      case IceDate => v.asInstanceOf[Number].intValue() - 1
      case _ => v.asInstanceOf[Number].longValue() - 1L
    }
    def plus1(v: Any): Any = p.tpe match {
      case IceDate => v.asInstanceOf[Number].intValue() + 1
      case _ => v.asInstanceOf[Number].longValue() + 1L
    }
    p.op match {
      case Op.IsNull | Op.NotNull => Some(Pred(p.op, partName))
      case Op.Eq => Some(Pred(Op.Eq, partName, Seq(t(p.literal))))
      case Op.In => Some(Pred(Op.In, partName, p.literals.map(t).distinct))
      case Op.Lt => Some(Pred(Op.LtEq, partName, Seq(t(minus1(p.literal)))))
      case Op.LtEq => Some(Pred(Op.LtEq, partName, Seq(t(p.literal))))
      case Op.Gt => Some(Pred(Op.GtEq, partName, Seq(t(plus1(p.literal)))))
      case Op.GtEq => Some(Pred(Op.GtEq, partName, Seq(t(p.literal))))
      case _ => None
    }
  }

  /** floorDiv on the µs value, exact in Catalyst long arithmetic.
    * `unix_micros` accepts only TIMESTAMP, so a TIMESTAMP_NTZ source first
    * goes through a Cast with an EXPLICIT UTC zone — wall-clock-preserving
    * (micros unchanged) and independent of the session time zone.
    */
  protected def microsFloorDiv(c: Column, source: IceType, unitMicros: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, IntegralDivide, Literal => CLit, Pmod, Subtract}
    import org.apache.spark.sql.types.TimestampType
    val micros = source match {
      case IceTimestampNs | IceTimestampTzNs =>
        // ns columns are LongType (nanos); exact long floor-div to µs
        val ns = GraftShim.expression(c)
        IntegralDivide(Subtract(ns, Pmod(ns, CLit(1000L))), CLit(1000L))
      case IceTimestamp =>
        GraftShim.expression(unix_micros(
          GraftShim.column(Cast(GraftShim.expression(c), TimestampType, Some("UTC")))))
      case _ => GraftShim.expression(unix_micros(c))
    }
    val unit = CLit(unitMicros)
    val floored = IntegralDivide(Subtract(micros, Pmod(micros, unit)), unit)
    GraftShim.column(Cast(floored, IntegerType))
  }
}

case object YearTransform extends TimeTransform {
  val name = "year"
  protected def fromDays(days: Int): Int =
    LocalDate.ofEpochDay(days.toLong).getYear - 1970
  protected def fromMicros(micros: Long): Int =
    Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L)).atZone(ZoneOffset.UTC).getYear - 1970
  def toColumn(c: Column, source: IceType): Column = source match {
    case IceDate => (year(c) - lit(1970)).cast(IntegerType)
    case _ => // via the UTC epoch day: year() on a timestamp would apply the
      // SESSION time zone and disagree with apply()/project() near boundaries
      (year(date_from_unix_date(microsFloorDiv(c, source, 86400000000L))) - lit(1970))
        .cast(IntegerType)
  }
  override def toHumanString(source: IceType, v: Any): String =
    if (v == null) "null" else (v.asInstanceOf[Number].intValue() + 1970).toString
}

case object MonthTransform extends TimeTransform {
  val name = "month"
  protected def fromDays(days: Int): Int = {
    val d = LocalDate.ofEpochDay(days.toLong)
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }
  protected def fromMicros(micros: Long): Int = {
    val d = Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L)).atZone(ZoneOffset.UTC)
    (d.getYear - 1970) * 12 + (d.getMonthValue - 1)
  }
  def toColumn(c: Column, source: IceType): Column = {
    // timestamps go through the UTC epoch day (session-tz independent)
    val d = source match {
      case IceDate => c
      case _ => date_from_unix_date(microsFloorDiv(c, source, 86400000000L))
    }
    ((year(d) - lit(1970)) * lit(12) + month(d) - lit(1)).cast(IntegerType)
  }
  override def toHumanString(source: IceType, v: Any): String =
    if (v == null) "null"
    else {
      val m = v.asInstanceOf[Number].intValue()
      f"${1970 + Math.floorDiv(m, 12)}%04d-${Math.floorMod(m, 12) + 1}%02d"
    }
}

case object DayTransform extends TimeTransform {
  val name = "day"
  override def resultType(source: IceType): IceType = IceDate
  protected def fromDays(days: Int): Int = days
  protected def fromMicros(micros: Long): Int =
    Math.floorDiv(micros, 86400000000L).toInt
  def toColumn(c: Column, source: IceType): Column = source match {
    case IceDate => datediff(c, lit(java.sql.Date.valueOf("1970-01-01")))
    case _ => microsFloorDiv(c, source, 86400000000L)
  }
  override def toHumanString(source: IceType, v: Any): String =
    if (v == null) "null"
    else LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue()).toString
}

case object HourTransform extends TimeTransform {
  val name = "hour"
  protected def fromDays(days: Int): Int =
    throw new IllegalArgumentException("hour transform does not accept date")
  protected def fromMicros(micros: Long): Int =
    Math.floorDiv(micros, 3600000000L).toInt
  def toColumn(c: Column, source: IceType): Column = microsFloorDiv(c, source, 3600000000L)
  override def toHumanString(source: IceType, v: Any): String =
    if (v == null) "null"
    else {
      val h = v.asInstanceOf[Number].longValue()
      val i = Instant.ofEpochSecond(h * 3600L).atZone(ZoneOffset.UTC)
      f"${i.getYear}%04d-${i.getMonthValue}%02d-${i.getDayOfMonth}%02d-${i.getHour}%02d"
    }
}

object Transform {
  private val BucketRe = """bucket\[(\d+)\]""".r
  private val TruncateRe = """truncate\[(\d+)\]""".r

  def fromString(s: String): Transform = s match {
    case "identity" => IdentityTransform
    case "void" => VoidTransform
    case "year" => YearTransform
    case "month" => MonthTransform
    case "day" => DayTransform
    case "hour" => HourTransform
    case BucketRe(n) => BucketTransform(n.toInt)
    case TruncateRe(w) => TruncateTransform(w.toInt)
    case other => throw new IllegalArgumentException(s"unknown transform: $other")
  }
}

/** Codegen-friendly Iceberg bucket: dispatches on the child's Catalyst type
  * to a static Murmur3 entry point, so it stays inside whole-stage codegen.
  */
final case class IceBucketExpr(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ice_bucket"

  private def helper: String = "graft.core.Murmur3"

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType | DateType => Murmur3.bucketInt(input.asInstanceOf[Int], n)
    case LongType | TimestampType | TimestampNTZType =>
      Murmur3.bucketLong(input.asInstanceOf[Long], n)
    case StringType =>
      Murmur3.bucketUTF8(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
    case _: DecimalType =>
      Murmur3.bucketDecimal(input.asInstanceOf[org.apache.spark.sql.types.Decimal], n)
    case BinaryType => Murmur3.bucketBytes(input.asInstanceOf[Array[Byte]], n)
    case other => throw new IllegalArgumentException(s"cannot bucket $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = child.dataType match {
      case IntegerType | DateType => "bucketInt"
      case LongType | TimestampType | TimestampNTZType => "bucketLong"
      case StringType => "bucketUTF8"
      case _: DecimalType => "bucketDecimal"
      case BinaryType => "bucketBytes"
      case other => throw new IllegalArgumentException(s"cannot bucket $other")
    }
    defineCodeGen(ctx, ev, c => s"$helper.$fn($c, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): IceBucketExpr =
    copy(child = newChild)
}

/** Binary truncate[W]: byte prefix. */
final case class IceTruncateBinaryExpr(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "ice_truncate_binary"

  override protected def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Array[Byte]]
    if (b.length <= w) b else java.util.Arrays.copyOf(b, w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"($c.length <= $w ? $c : java.util.Arrays.copyOf($c, $w))")

  override protected def withNewChildInternal(newChild: Expression): IceTruncateBinaryExpr =
    copy(child = newChild)
}

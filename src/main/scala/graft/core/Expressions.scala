package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, not => snot}

/** Unbound boolean predicate algebra over named columns, bindable against any
  * versioned schema (Catalyst cannot bind to a historical schema-id, so the
  * public filter form must be ours; execution converts to a Catalyst Column).
  *
  * Mirrors reference `exprs.go:31-1053` + `predicates.go` (DSL) +
  * `visitors.go:150-184` (binding with bind-time constant folding).
  */
sealed trait IcePredicate {
  def and(other: IcePredicate): IcePredicate = Predicates.and(this, other)
  def or(other: IcePredicate): IcePredicate = Predicates.or(this, other)
  def negate: IcePredicate = Predicates.negate(this)
}

case object AlwaysTrue extends IcePredicate
case object AlwaysFalse extends IcePredicate
final case class And(left: IcePredicate, right: IcePredicate) extends IcePredicate
final case class Or(left: IcePredicate, right: IcePredicate) extends IcePredicate
final case class Not(child: IcePredicate) extends IcePredicate

sealed trait Op
object Op {
  case object IsNull extends Op
  case object NotNull extends Op
  case object IsNan extends Op
  case object NotNan extends Op
  case object Lt extends Op
  case object LtEq extends Op
  case object Gt extends Op
  case object GtEq extends Op
  case object Eq extends Op
  case object NotEq extends Op
  case object StartsWith extends Op
  case object NotStartsWith extends Op
  case object In extends Op
  case object NotIn extends Op

  def negate(op: Op): Op = op match {
    case IsNull => NotNull
    case NotNull => IsNull
    case IsNan => NotNan
    case NotNan => IsNan
    case Lt => GtEq
    case LtEq => Gt
    case Gt => LtEq
    case GtEq => Lt
    case Eq => NotEq
    case NotEq => Eq
    case StartsWith => NotStartsWith
    case NotStartsWith => StartsWith
    case In => NotIn
    case NotIn => In
  }
}

/** name op [literals] — unary (no literal), literal (one), or set (many). */
final case class Pred(op: Op, name: String, literals: Seq[Any] = Nil) extends IcePredicate

/** A predicate bound to a schema field: carries the field ID, its type, and
  * literals cast to that type.
  */
final case class BoundPred(op: Op, fieldId: Int, fieldName: String, tpe: IceType,
    required: Boolean, literals: Seq[Any] = Nil) extends IcePredicate {
  def literal: Any = literals.head
}

object Predicates {
  // ---------------------------------------------------------------- DSL
  def isNull(name: String): IcePredicate = Pred(Op.IsNull, name)
  def notNull(name: String): IcePredicate = Pred(Op.NotNull, name)
  def isNaN(name: String): IcePredicate = Pred(Op.IsNan, name)
  def notNaN(name: String): IcePredicate = Pred(Op.NotNan, name)
  def lt(name: String, v: Any): IcePredicate = Pred(Op.Lt, name, Seq(v))
  def ltEq(name: String, v: Any): IcePredicate = Pred(Op.LtEq, name, Seq(v))
  def gt(name: String, v: Any): IcePredicate = Pred(Op.Gt, name, Seq(v))
  def gtEq(name: String, v: Any): IcePredicate = Pred(Op.GtEq, name, Seq(v))
  def equalTo(name: String, v: Any): IcePredicate = Pred(Op.Eq, name, Seq(v))
  def notEqualTo(name: String, v: Any): IcePredicate = Pred(Op.NotEq, name, Seq(v))
  def startsWith(name: String, v: String): IcePredicate = Pred(Op.StartsWith, name, Seq(v))
  def notStartsWith(name: String, v: String): IcePredicate = Pred(Op.NotStartsWith, name, Seq(v))
  def in(name: String, vs: Seq[Any]): IcePredicate = Pred(Op.In, name, vs)
  def notIn(name: String, vs: Seq[Any]): IcePredicate = Pred(Op.NotIn, name, vs)

  /** Constructor-time simplification (reference `exprs.go:197-232`). */
  def and(l: IcePredicate, r: IcePredicate): IcePredicate = (l, r) match {
    case (AlwaysFalse, _) | (_, AlwaysFalse) => AlwaysFalse
    case (AlwaysTrue, x) => x
    case (x, AlwaysTrue) => x
    case _ => And(l, r)
  }

  def or(l: IcePredicate, r: IcePredicate): IcePredicate = (l, r) match {
    case (AlwaysTrue, _) | (_, AlwaysTrue) => AlwaysTrue
    case (AlwaysFalse, x) => x
    case (x, AlwaysFalse) => x
    case _ => Or(l, r)
  }

  /** De Morgan negation (reference `exprs.go:250-312`). */
  def negate(p: IcePredicate): IcePredicate = p match {
    case AlwaysTrue => AlwaysFalse
    case AlwaysFalse => AlwaysTrue
    case And(l, r) => or(negate(l), negate(r))
    case Or(l, r) => and(negate(l), negate(r))
    case Not(c) => c
    case Pred(op, n, ls) => Pred(Op.negate(op), n, ls)
    case BoundPred(op, id, n, t, req, ls) => BoundPred(Op.negate(op), id, n, t, req, ls)
  }

  /** Push Not down to leaves (reference `visitors.go:384-410`); projections
    * require Not-free trees.
    */
  def rewriteNot(p: IcePredicate): IcePredicate = p match {
    case Not(c) => rewriteNot(negate(c))
    case And(l, r) => and(rewriteNot(l), rewriteNot(r))
    case Or(l, r) => or(rewriteNot(l), rewriteNot(r))
    case other => other
  }

  /** Field IDs referenced by a bound expression (reference `visitors.go:415-460`). */
  def extractFieldIds(p: IcePredicate): Set[Int] = p match {
    case And(l, r) => extractFieldIds(l) ++ extractFieldIds(r)
    case Or(l, r) => extractFieldIds(l) ++ extractFieldIds(r)
    case Not(c) => extractFieldIds(c)
    case b: BoundPred => Set(b.fieldId)
    case _ => Set.empty
  }

  /** Referenced column names of an unbound expression. */
  def referencedNames(p: IcePredicate): Set[String] = p match {
    case And(l, r) => referencedNames(l) ++ referencedNames(r)
    case Or(l, r) => referencedNames(l) ++ referencedNames(r)
    case Not(c) => referencedNames(c)
    case Pred(_, n, _) => Set(n)
    case b: BoundPred => Set(b.fieldName)
    case _ => Set.empty
  }

  // ---------------------------------------------------------------- bind
  /** Cast a literal to the column type; None when the value can never equal
    * any column value (caller folds per-op).
    */
  private[core] def castLiteral(t: IceType, v: Any): Option[Any] = try {
    t match {
      case IceBoolean => Some(v.asInstanceOf[Boolean])
      case IceInt | IceDate => v match {
        case i: Int => Some(i)
        case l: Long =>
          if (l > Int.MaxValue) None else if (l < Int.MinValue) None else Some(l.toInt)
        case s: String if t == IceDate => Some(java.time.LocalDate.parse(s).toEpochDay.toInt)
        // EXACT or nothing: intValueExact throws (→ None via the outer
        // catch) on fractional or out-of-range values — a truncating
        // intValue() would bind equalTo(intCol, 1.5) as equalTo(intCol, 1)
        // and match rows the predicate excludes
        case n: Number => Some(new java.math.BigDecimal(n.toString).intValueExact())
        case _ => Some(v.asInstanceOf[Int])
      }
      case IceLong | IceTime => v match {
        case l: Long => Some(l)
        case i: Int => Some(i.toLong)
        case n: Number => Some(new java.math.BigDecimal(n.toString).longValueExact())
        case _ => Some(v.asInstanceOf[Number].longValue())
      }
      case IceTimestamp | IceTimestampTz => v match {
        case l: Long => Some(l)
        case s: String => // ISO date or date-time → epoch micros (UTC)
          val micros =
            if (s.length <= 10) java.time.LocalDate.parse(s).toEpochDay * 86400000000L
            else { // full-fraction epoch micros: toEpochMilli would truncate
              val i = java.time.Instant.parse(if (s.endsWith("Z")) s else s + "Z")
              i.getEpochSecond * 1000000L + i.getNano / 1000L
            }
          Some(micros)
        case _ => Some(v.asInstanceOf[Number].longValue())
      }
      case IceTimestampNs | IceTimestampTzNs => v match {
        case l: Long => Some(l)
        case s: String => // ISO date or date-time → epoch NANOS (UTC, v3 type)
          val nanos =
            if (s.length <= 10) java.time.LocalDate.parse(s).toEpochDay * 86400000000000L
            else {
              val i = java.time.Instant.parse(if (s.endsWith("Z")) s else s + "Z")
              i.getEpochSecond * 1000000000L + i.getNano
            }
          Some(nanos)
        case _ => Some(v.asInstanceOf[Number].longValue())
      }
      case IceFloat => Some(v.asInstanceOf[Number].floatValue())
      case IceDouble => Some(v.asInstanceOf[Number].doubleValue())
      case IceDecimal(_, s) => v match {
        case b: java.math.BigDecimal => Some(b.setScale(s))
        case b: BigDecimal => Some(b.underlying.setScale(s))
        case n => Some(new java.math.BigDecimal(n.toString).setScale(s, java.math.RoundingMode.UNNECESSARY))
      }
      case IceString | IceUUID => Some(v.toString)
      case IceBinary | IceFixed(_) => Some(v.asInstanceOf[Array[Byte]])
      case other => throw new IllegalArgumentException(s"cannot bind literal to $other")
    }
  } catch {
    case _: ArithmeticException => None // decimal scale mismatch → never equal
    // NaN/Infinity literal bound to an integral/decimal column:
    // `new BigDecimal("NaN")` throws THIS, not ArithmeticException — the
    // value can never equal any column value, so fold instead of crashing
    case _: NumberFormatException => None
  }

  /** Bind an unbound predicate to a schema: resolve names (case-sensitively
    * or not), cast literals, and constant-fold what binding decides
    * (reference `exprs.go:575-593,736-751,854-869,927-940`):
    *   - IsNull/NotNull on a required column → False/True
    *   - IsNaN/NotNaN on non-floating column → False/True
    *   - literal overflow above/below the column type's range → fold
    *   - In/NotIn: empty → False/True, singleton → Eq/NotEq
    */
  def bind(p: IcePredicate, schema: IceSchema, caseSensitive: Boolean = true): IcePredicate =
    rewriteNot(p) match {
      case And(l, r) => and(bind(l, schema, caseSensitive), bind(r, schema, caseSensitive))
      case Or(l, r) => or(bind(l, schema, caseSensitive), bind(r, schema, caseSensitive))
      case AlwaysTrue => AlwaysTrue
      case AlwaysFalse => AlwaysFalse
      case Pred(op, name, lits) =>
        val f = schema.findByName(name, caseSensitive).getOrElse(
          throw new IllegalArgumentException(s"cannot bind: no field $name in schema ${schema.schemaId}"))
        bindPred(op, name, f, lits)
      case b: BoundPred => b
      case Not(_) => throw new IllegalStateException("rewriteNot left a Not")
    }

  /** `name` is the reference as queried (dotted for nested fields) so the
    * Catalyst conversion resolves the full path, not just the leaf.
    */
  private def bindPred(op: Op, name: String, f: NestedField, lits: Seq[Any]): IcePredicate = {
    val isFloating = f.tpe == IceFloat || f.tpe == IceDouble
    op match {
      case Op.IsNull => if (f.required) AlwaysFalse else BoundPred(op, f.id, name, f.tpe, f.required)
      case Op.NotNull => if (f.required) AlwaysTrue else BoundPred(op, f.id, name, f.tpe, f.required)
      case Op.IsNan =>
        if (!isFloating) AlwaysFalse else BoundPred(op, f.id, name, f.tpe, f.required)
      case Op.NotNan =>
        if (!isFloating) AlwaysTrue else BoundPred(op, f.id, name, f.tpe, f.required)
      case Op.In | Op.NotIn =>
        val cast = lits.flatMap(v => castLiteral(f.tpe, v)).distinct
        (op, cast) match {
          case (Op.In, Nil) => AlwaysFalse
          case (Op.NotIn, Nil) => AlwaysTrue
          case (Op.In, Seq(one)) => BoundPred(Op.Eq, f.id, name, f.tpe, f.required, Seq(one))
          case (Op.NotIn, Seq(one)) => BoundPred(Op.NotEq, f.id, name, f.tpe, f.required, Seq(one))
          case _ => BoundPred(op, f.id, name, f.tpe, f.required, cast)
        }
      case _ =>
        castLiteral(f.tpe, lits.head) match {
          case Some(v) => BoundPred(op, f.id, name, f.tpe, f.required, Seq(v))
          case None =>
            // literal does not fit the column type (e.g. long > int range,
            // fractional value on an integer column, decimal scale
            // mismatch): comparison folds by op
            op match {
              case Op.Eq | Op.StartsWith => AlwaysFalse
              case Op.NotEq | Op.NotStartsWith => AlwaysTrue
              case Op.Lt | Op.LtEq | Op.Gt | Op.GtEq =>
                foldNonRepresentable(op, f, name, lits.head)
              case _ => AlwaysFalse
            }
        }
    }
  }

  /** Fold a range predicate whose NUMERIC literal is not representable in
    * the column type — fractional on an integer column, finer-scaled on a
    * decimal, or out of the type's range. The predicate is REWRITTEN, not
    * just truthified: with v strictly between representable values,
    * `col < v  ⟺  col <= floor_repr(v)` and `col > v  ⟺  col >= ceil_repr(v)`
    * (reference folds the same way per-op; the old int-only above-max check
    * folded lt(decimalCol, 10.005) to AlwaysFalse — and AlwaysTrue feeding
    * deleteWhere would mark every row deleted).
    */
  private def foldNonRepresentable(op: Op, f: NestedField, name: String,
      v: Any): IcePredicate = {
    val bd = v match {
      case n: Number =>
        // non-finite literals never reach BigDecimal (it throws
        // NumberFormatException, not ArithmeticException): they fold
        // semantically — every finite column value is < +Inf and > -Inf,
        // and nothing compares true against NaN
        val d = n.doubleValue()
        if (java.lang.Double.isNaN(d)) return AlwaysFalse
        if (java.lang.Double.isInfinite(d))
          return op match {
            case Op.Lt | Op.LtEq => if (d > 0) AlwaysTrue else AlwaysFalse
            case Op.Gt | Op.GtEq => if (d < 0) AlwaysTrue else AlwaysFalse
            case _ => AlwaysFalse
          }
        new java.math.BigDecimal(n.toString)
      case _ => return AlwaysFalse // non-numeric unbindable literal
    }
    import java.math.RoundingMode
    // the type's representable range (None = unbounded for this purpose)
    val range: Option[(java.math.BigDecimal, java.math.BigDecimal)] = f.tpe match {
      case IceInt | IceDate => Some((java.math.BigDecimal.valueOf(Int.MinValue),
        java.math.BigDecimal.valueOf(Int.MaxValue)))
      case IceLong | IceTime => Some((java.math.BigDecimal.valueOf(Long.MinValue),
        java.math.BigDecimal.valueOf(Long.MaxValue)))
      case IceDecimal(_, _) => None
      case _ => return AlwaysFalse // non-numeric column with numeric literal
    }
    // AboveMax / BelowMin fold exactly as the reference (exprs.go:736-751)
    range.foreach { case (min, max) =>
      if (bd.compareTo(max) > 0)
        return op match {
          case Op.Lt | Op.LtEq => AlwaysTrue
          case _ => AlwaysFalse // Gt | GtEq
        }
      if (bd.compareTo(min) < 0)
        return op match {
          case Op.Gt | Op.GtEq => AlwaysTrue
          case _ => AlwaysFalse // Lt | LtEq
        }
    }
    // in-range but between representable values (fractional / finer scale):
    // rewrite against the nearest representable bound
    def repr(mode: RoundingMode): Any = f.tpe match {
      case IceInt | IceDate => bd.setScale(0, mode).intValueExact()
      case IceLong | IceTime => bd.setScale(0, mode).longValueExact()
      case IceDecimal(_, s) => bd.setScale(s, mode)
      case other => throw new IllegalStateException(s"unexpected $other")
    }
    def bound(adjOp: Op, value: Any) =
      BoundPred(adjOp, f.id, name, f.tpe, f.required, Seq(value))
    op match {
      case Op.Lt | Op.LtEq => bound(Op.LtEq, repr(RoundingMode.FLOOR))
      case Op.Gt | Op.GtEq => bound(Op.GtEq, repr(RoundingMode.CEILING))
      case _ => AlwaysFalse
    }
  }

  // ------------------------------------------------------------ catalyst
  /** Convert to a Catalyst Column for executor-side evaluation. Works on both
    * bound and unbound trees (bound preferred: literals already cast).
    */
  def toColumn(p: IcePredicate): Column = p match {
    case AlwaysTrue => lit(true)
    case AlwaysFalse => lit(false)
    case And(l, r) => toColumn(l) && toColumn(r)
    case Or(l, r) => toColumn(l) || toColumn(r)
    case Not(c) => snot(toColumn(c))
    case Pred(op, name, lits) => opToColumn(op, col(name), lits, None)
    case BoundPred(op, _, name, t, _, lits) => opToColumn(op, col(name), lits, Some(t))
  }

  /** Bound literal → the JVM object Spark's lit()/isin() expect.
    *
    * IceTimestamp (no tz) surfaces as TimestampNTZType, so its literal must
    * be a LocalDateTime — an Instant would make a TimestampType literal and
    * Spark coerces the NTZ column through the SESSION time zone to compare
    * them, shifting every comparison by the session offset. Only
    * IceTimestampTz (a real instant) renders as Instant.
    */
  private def litValue(t: Option[IceType], v: Any): Any = (t, v) match {
    case (Some(IceDate), i: Int) => java.time.LocalDate.ofEpochDay(i.toLong)
    case (Some(IceTimestamp), l: Long) => microsToLocal(l)
    case (Some(IceTimestampTz), l: Long) =>
      java.time.Instant.ofEpochSecond(l / 1000000L, (l % 1000000L) * 1000L)
    case _ => v
  }

  private def microsToLocal(l: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(l, 1000000L),
      (Math.floorMod(l, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)

  private def litCol(t: Option[IceType], v: Any): Column = (t, v) match {
    case (Some(IceDate), i: Int) => lit(java.time.LocalDate.ofEpochDay(i.toLong))
    case (Some(IceTimestamp), l: Long) => lit(microsToLocal(l))
    case (Some(IceTimestampTz), l: Long) =>
      lit(java.time.Instant.ofEpochSecond(l / 1000000L, (l % 1000000L) * 1000L))
    case (_, bd: java.math.BigDecimal) => lit(bd)
    case _ => lit(v)
  }

  private def opToColumn(op: Op, c: Column, lits: Seq[Any], t: Option[IceType]): Column = {
    def l0 = litCol(t, lits.head)
    op match {
      case Op.IsNull => c.isNull
      case Op.NotNull => c.isNotNull
      case Op.IsNan => org.apache.spark.sql.functions.isnan(c)
      case Op.NotNan => !org.apache.spark.sql.functions.isnan(c)
      case Op.Lt => c < l0
      case Op.LtEq => c <= l0
      case Op.Gt => c > l0
      case Op.GtEq => c >= l0
      case Op.Eq => c === l0
      case Op.NotEq => c =!= l0
      case Op.StartsWith => c.startsWith(lits.head.toString)
      case Op.NotStartsWith => !c.startsWith(lits.head.toString)
      case Op.In => c.isin(lits.map(v => litValue(t, v)): _*)
      case Op.NotIn => !c.isin(lits.map(v => litValue(t, v)): _*)
    }
  }

  // ------------------------------------------------------------ evaluate
  /** Row-level evaluation of a bound predicate against a value lookup by
    * field ID (used driver-side on partition tuples; reference
    * `visitors.go:189-378`). Absent key = null.
    */
  def evaluate(p: IcePredicate, valueById: Int => Option[Any]): Boolean = p match {
    case AlwaysTrue => true
    case AlwaysFalse => false
    case And(l, r) => evaluate(l, valueById) && evaluate(r, valueById)
    case Or(l, r) => evaluate(l, valueById) || evaluate(r, valueById)
    case Not(c) => !evaluate(c, valueById)
    case BoundPred(op, id, _, t, _, lits) =>
      val v = valueById(id).filter(_ != null)
      op match {
        case Op.IsNull => v.isEmpty
        case Op.NotNull => v.nonEmpty
        case Op.IsNan => v.exists(Bounds.isNaN)
        case Op.NotNan => v.exists(x => !Bounds.isNaN(x))
        case Op.In => v.exists(x => lits.exists(l => Bounds.compare(t, x, l) == 0))
        case Op.NotIn => v.exists(x => !lits.exists(l => Bounds.compare(t, x, l) == 0))
        case Op.StartsWith => v.exists(_.toString.startsWith(lits.head.toString))
        case Op.NotStartsWith => v.exists(!_.toString.startsWith(lits.head.toString))
        case _ =>
          v.exists { x =>
            val cmp = Bounds.compare(t, x, lits.head)
            op match {
              case Op.Lt => cmp < 0
              case Op.LtEq => cmp <= 0
              case Op.Gt => cmp > 0
              case Op.GtEq => cmp >= 0
              case Op.Eq => cmp == 0
              case Op.NotEq => cmp != 0
              case _ => false
            }
          }
      }
    case Pred(_, n, _) =>
      throw new IllegalStateException(s"cannot evaluate unbound predicate on $n")
  }
}

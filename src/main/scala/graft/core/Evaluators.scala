package graft.core

import graft.meta.{DataFile, FieldSummary, ManifestFile, PartitionSpec}

/** The reference's "optimizer": metadata-driven pruning evaluators, all
  * driver-side and conservative (true = the manifest/file MIGHT contain
  * matching rows; pruning only when provably impossible).
  *
  * Mirrors reference `table/evaluators.go:39-1198`:
  *   - inclusive projection (row filter → partition-space filter);
  *   - manifest evaluator over partition FieldSummary bounds;
  *   - partition-tuple evaluator per manifest entry;
  *   - inclusive metrics evaluator over DataFile column stats.
  */
object Evaluators {

  /** A schema describing a spec's partition tuple, used to bind projected
    * partition predicates.
    */
  def partitionSchema(spec: PartitionSpec, schema: IceSchema): IceSchema =
    IceSchema(-1, spec.partitionType(schema).fields)

  /** Project a bound row filter into the partition space of `spec`
    * (reference `inclusiveProjection` `table/evaluators.go:561-609`):
    * non-projectable leaves become AlwaysTrue (inclusive), and multiple
    * transforms of the same source field AND together.
    */
  def inclusiveProjection(filter: IcePredicate, spec: PartitionSpec): IcePredicate =
    filter match {
      case And(l, r) =>
        Predicates.and(inclusiveProjection(l, spec), inclusiveProjection(r, spec))
      case Or(l, r) =>
        Predicates.or(inclusiveProjection(l, spec), inclusiveProjection(r, spec))
      case AlwaysTrue | AlwaysFalse => filter
      case b: BoundPred =>
        val projected = spec.fields.filter(_.sourceId == b.fieldId).flatMap { pf =>
          pf.transform.project(pf.name, b)
        }
        projected.foldLeft(AlwaysTrue: IcePredicate)((acc, p) => Predicates.and(acc, p))
      case other =>
        throw new IllegalStateException(s"inclusiveProjection needs a bound filter, got $other")
    }

  /** Manifest-level pruning: evaluate the (bound) partition filter against
    * per-field summaries (reference `manifestEvalVisitor`
    * `table/evaluators.go:39-534`). Returns true when the manifest may
    * contain matching entries.
    */
  def manifestMayMatch(partFilter: IcePredicate, partSchema: IceSchema,
      m: ManifestFile): Boolean = {
    if (m.partitions.isEmpty) return true
    // position of each partition field in the summary list = field order
    val posById = partSchema.fields.map(_.id).zipWithIndex.toMap
    def eval(p: IcePredicate): Boolean = p match {
      case AlwaysTrue => true
      case AlwaysFalse => false
      case And(l, r) => eval(l) && eval(r)
      case Or(l, r) => eval(l) || eval(r)
      case Not(c) => !eval(c)
      case BoundPred(op, id, _, t, _, lits) =>
        posById.get(id).flatMap(m.partitions.lift) match {
          case None => true
          case Some(s) => summaryMayMatch(op, t, lits, s)
        }
      case _: Pred => true
    }
    eval(partFilter)
  }

  private def summaryMayMatch(op: Op, t: IceType, lits: Seq[Any], s: FieldSummary): Boolean = {
    lazy val lower = s.lowerBound.map(Bounds.decode(t, _))
    lazy val upper = s.upperBound.map(Bounds.decode(t, _))
    def allNull = s.containsNull && s.lowerBound.isEmpty && s.upperBound.isEmpty
    op match {
      case Op.IsNull => s.containsNull
      case Op.NotNull => !allNull
      case Op.IsNan => s.containsNan.getOrElse(true)
      case Op.NotNan => true
      case Op.Lt => lower.exists(lo => Bounds.compare(t, lo, lits.head) < 0)
      case Op.LtEq => lower.exists(lo => Bounds.compare(t, lo, lits.head) <= 0)
      case Op.Gt => upper.exists(up => Bounds.compare(t, up, lits.head) > 0)
      case Op.GtEq => upper.exists(up => Bounds.compare(t, up, lits.head) >= 0)
      case Op.Eq =>
        lower.exists(lo => Bounds.compare(t, lo, lits.head) <= 0) &&
          upper.exists(up => Bounds.compare(t, up, lits.head) >= 0)
      case Op.NotEq =>
        // prunable only when every row equals the literal
        !(lower.isDefined && upper.isDefined && !s.containsNull &&
          Bounds.compare(t, lower.get, upper.get) == 0 &&
          Bounds.compare(t, lower.get, lits.head) == 0)
      case Op.In =>
        lits.exists(v => lower.exists(lo => Bounds.compare(t, lo, v) <= 0) &&
          upper.exists(up => Bounds.compare(t, up, v) >= 0))
      case Op.NotIn => true
      case Op.StartsWith => (t, lower, upper) match {
        case (IceString, Some(lo: String), Some(up: String)) =>
          startsWithMayMatch(lits.head.toString, lo, up)
        case _ => true
      }
      case Op.NotStartsWith => true
    }
  }

  /** May any string in [lo, up] start with `pfx`? Compared over UTF-8 BYTES
    * truncated to the prefix's byte length — the order and truncation
    * parquet stats use. A UTF-16 `<=` here disagrees for supplementary
    * prefixes (surrogate units 0xD800-0xDFFF sort below U+E000, so a file
    * whose lower bound sits in the private-use area would be WRONGLY PRUNED
    * for an emoji prefix — silent data loss), and a char-count substring can
    * split a surrogate pair; byte-wise both issues vanish. Truncation is
    * monotone in byte-lexicographic order, so the bracket test is sound.
    */
  private def startsWithMayMatch(pfx: String, lo: String, up: String): Boolean = {
    val p = pfx.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val lob = lo.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val upb = up.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val loT = java.util.Arrays.copyOfRange(lob, 0, math.min(lob.length, p.length))
    val upT = java.util.Arrays.copyOfRange(upb, 0, math.min(upb.length, p.length))
    java.util.Arrays.compareUnsigned(loT, p) <= 0 &&
      java.util.Arrays.compareUnsigned(p, upT) <= 0
  }

  /** Per-entry partition-tuple evaluation (reference
    * `Scan.buildPartitionEvaluator` `table/scanner.go:252-266`).
    */
  def partitionMayMatch(partFilterBound: IcePredicate, partSchema: IceSchema,
      tuple: Seq[Any]): Boolean = {
    val byPos = partSchema.fields.map(_.id).zip(tuple).toMap
    Predicates.evaluate(partFilterBound, id => byPos.get(id))
  }

  /** File-level pruning from column stats (reference `inclusiveMetricsEval`
    * `table/evaluators.go:666-1198`). True = the file may contain matches.
    */
  def fileMayMatch(filter: IcePredicate, f: DataFile): Boolean = filter match {
    case AlwaysTrue => true
    case AlwaysFalse => false
    case And(l, r) => fileMayMatch(l, f) && fileMayMatch(r, f)
    case Or(l, r) => fileMayMatch(l, f) || fileMayMatch(r, f)
    case Not(c) => !fileMayMatch(c, f)
    case BoundPred(op, id, _, t, _, lits) => statsMayMatch(op, id, t, lits, f)
    case _: Pred => true
  }

  /** Strict metrics evaluator (reference `strictMetricsEval`
    * `table/evaluators.go:1200-1565`): true only when EVERY row of the file
    * provably matches — used for metadata-only deletes/overwrites.
    */
  def fileMustMatch(filter: IcePredicate, f: DataFile): Boolean = filter match {
    case AlwaysTrue => true
    case AlwaysFalse => false
    case And(l, r) => fileMustMatch(l, f) && fileMustMatch(r, f)
    case Or(l, r) => fileMustMatch(l, f) || fileMustMatch(r, f)
    case Not(c) => !fileMayMatch(c, f)
    case BoundPred(op, id, _, t, _, lits) => statsMustMatch(op, id, t, lits, f)
    case _: Pred => false
  }

  private def statsMustMatch(op: Op, id: Int, t: IceType, lits: Seq[Any], f: DataFile): Boolean = {
    val valueCount = f.valueCounts.get(id)
    val nullCount = f.nullValueCounts.get(id)
    val nanCount = f.nanValueCounts.get(id)
    def noNulls = nullCount.contains(0L)
    def allNull = (valueCount, nullCount) match {
      case (Some(v), Some(n)) => v == n
      case _ => false
    }
    lazy val lower = f.lowerBounds.get(id).map(Bounds.decode(t, _)).filterNot(Bounds.isNaN)
    lazy val upper = f.upperBounds.get(id).map(Bounds.decode(t, _)).filterNot(Bounds.isNaN)
    op match {
      case Op.IsNull => allNull
      case Op.NotNull => noNulls
      // reference strictMetricsEval.VisitIsNan (`evaluators.go:1273-1279`):
      // every value NaN ⇔ nanCount == valueCount (value counts include
      // nulls, so equality also implies no nulls)
      case Op.IsNan => (nanCount, valueCount) match {
        case (Some(nan), Some(v)) => nan == v
        case _ => false
      }
      // reference `evaluators.go:1282-1294` additionally must-matches a
      // nulls-only file (Iceberg's notNaN is 2-valued); OUR row/Catalyst
      // semantics are SQL 3-valued — `!isnan(NULL)` is NULL, which does
      // not match — so a file with nulls can never strictly match
      case Op.NotNan => nanCount.contains(0L) && noNulls
      // value-comparison claims on float/double columns additionally need
      // PROOF of no NaNs: parquet min/max bounds exclude NaN, so bounds
      // alone can declare all-rows-match over a file whose NaN rows fail
      // the comparison — and the caller deletes whole files on this claim.
      // NaN counts are opt-in here (write.metadata.nan-counts.enabled);
      // without them a floating column conservatively never must-matches
      // (Java Iceberg's StrictMetricsEvaluator refuses the same way).
      case Op.Lt | Op.LtEq | Op.Gt | Op.GtEq | Op.Eq | Op.NotEq |
           Op.In | Op.NotIn
          if (t == IceFloat || t == IceDouble) && !nanCount.contains(0L) =>
        false
      case Op.Lt => noNulls && upper.exists(up => Bounds.compare(t, up, lits.head) < 0)
      case Op.LtEq => noNulls && upper.exists(up => Bounds.compare(t, up, lits.head) <= 0)
      case Op.Gt => noNulls && lower.exists(lo => Bounds.compare(t, lo, lits.head) > 0)
      case Op.GtEq => noNulls && lower.exists(lo => Bounds.compare(t, lo, lits.head) >= 0)
      case Op.Eq => noNulls && lower.isDefined && upper.isDefined &&
        Bounds.compare(t, lower.get, lits.head) == 0 &&
        Bounds.compare(t, upper.get, lits.head) == 0
      case Op.NotEq => noNulls && (
        lower.exists(lo => Bounds.compare(t, lo, lits.head) > 0) ||
          upper.exists(up => Bounds.compare(t, up, lits.head) < 0))
      case Op.In => noNulls && lower.isDefined && upper.isDefined &&
        Bounds.compare(t, lower.get, upper.get) == 0 &&
        lits.exists(v => Bounds.compare(t, lower.get, v) == 0)
      case Op.NotIn => noNulls && lits.forall(v =>
        lower.exists(lo => Bounds.compare(t, lo, v) > 0) ||
          upper.exists(up => Bounds.compare(t, up, v) < 0))
      case Op.StartsWith | Op.NotStartsWith => false
    }
  }

  private def statsMayMatch(op: Op, id: Int, t: IceType, lits: Seq[Any], f: DataFile): Boolean = {
    val valueCount = f.valueCounts.get(id)
    val nullCount = f.nullValueCounts.get(id)
    val nanCount = f.nanValueCounts.get(id)
    def allNull = (valueCount, nullCount) match {
      case (Some(v), Some(n)) => v == n && v > 0
      case _ => false
    }
    def allNaN = (valueCount, nanCount, nullCount) match {
      case (Some(v), Some(nan), nc) => nan + nc.getOrElse(0L) == v && nan > 0
      case _ => false
    }
    lazy val lower = f.lowerBounds.get(id).map(Bounds.decode(t, _)).filterNot(Bounds.isNaN)
    lazy val upper = f.upperBounds.get(id).map(Bounds.decode(t, _)).filterNot(Bounds.isNaN)
    op match {
      case Op.IsNull => nullCount.forall(_ > 0)
      case Op.NotNull => !allNull
      case Op.IsNan => nanCount.forall(_ > 0) && !allNull
      case Op.NotNan => !allNaN
      case _ if allNull => false // value comparisons never match all-null files
      case Op.Lt => lower.forall(lo => Bounds.compare(t, lo, lits.head) < 0)
      case Op.LtEq => lower.forall(lo => Bounds.compare(t, lo, lits.head) <= 0)
      case Op.Gt => upper.forall(up => Bounds.compare(t, up, lits.head) > 0)
      case Op.GtEq => upper.forall(up => Bounds.compare(t, up, lits.head) >= 0)
      case Op.Eq =>
        lower.forall(lo => Bounds.compare(t, lo, lits.head) <= 0) &&
          upper.forall(up => Bounds.compare(t, up, lits.head) >= 0)
      case Op.NotEq => true
      case Op.In =>
        lits.exists(v => lower.forall(lo => Bounds.compare(t, lo, v) <= 0) &&
          upper.forall(up => Bounds.compare(t, up, v) >= 0))
      case Op.NotIn => true
      case Op.StartsWith => (t, lower, upper) match {
        case (IceString, Some(lo: String), Some(up: String)) =>
          startsWithMayMatch(lits.head.toString, lo, up)
        case _ => true
      }
      case Op.NotStartsWith => true
    }
  }
}

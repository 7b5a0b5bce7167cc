package graft.core

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests (SURVEY §5: transform/literal round-trip
  * invariants) over seeded random samples: codec round-trips, truncate
  * laws, bucket range/promotion stability, time-transform floor alignment,
  * and NOT-rewrite semantic preservation.
  */
class PropertySpec extends AnyFunSuite {

  private val N = 500

  test("bounds codec round-trips arbitrary ints/longs/doubles/strings") {
    val rnd = new Random(42)
    (1 to N).foreach { _ =>
      val i = rnd.nextInt()
      assert(Bounds.decode(IceInt, Bounds.encode(IceInt, i)) == i)
      val l = rnd.nextLong()
      assert(Bounds.decode(IceLong, Bounds.encode(IceLong, l)) == l)
      val d = java.lang.Double.longBitsToDouble(rnd.nextLong())
      if (!d.isNaN)
        assert(Bounds.decode(IceDouble, Bounds.encode(IceDouble, d)) == d)
      val s = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
      assert(Bounds.decode(IceString, Bounds.encode(IceString, s)) == s)
      val bd = java.math.BigDecimal.valueOf(rnd.nextLong() % 1000000000L, 2)
      assert(Bounds.decode(IceDecimal(18, 2), Bounds.encode(IceDecimal(18, 2), bd)) == bd)
    }
  }

  test("truncate law: result <= value, value - result < width, idempotent") {
    val rnd = new Random(43)
    (1 to N).foreach { _ =>
      val w = 1 + rnd.nextInt(1000)
      val v = rnd.nextInt(Int.MaxValue - 2000) - (Int.MaxValue / 2)
      val t = TruncateTransform(w)
      val r = t.apply(IceInt, v).asInstanceOf[Int]
      assert(r <= v && v.toLong - r < w)
      assert(Math.floorMod(r, w) == 0)
      assert(t.apply(IceInt, r) == r)
    }
  }

  test("bucket stays in [0, N) and is stable across int/long promotion") {
    val rnd = new Random(44)
    (1 to N).foreach { _ =>
      val n = 1 + rnd.nextInt(512)
      val v = rnd.nextInt()
      val b = BucketTransform(n)
      val r = b.apply(IceInt, v).asInstanceOf[Int]
      assert(r >= 0 && r < n)
      assert(b.apply(IceLong, v.toLong) == r) // spec: int hashes as int64
      // date buckets identically to its int day count
      assert(b.apply(IceDate, v) == r)
    }
  }

  test("hour/day floor alignment across ±130 years") {
    val rnd = new Random(45)
    (1 to N).foreach { _ =>
      val micros = rnd.nextLong() % 4102444800000000L
      val h = HourTransform.apply(IceTimestamp, micros).asInstanceOf[Int]
      val d = DayTransform.apply(IceTimestamp, micros).asInstanceOf[Int]
      assert(h.toLong * 3600000000L <= micros && micros < (h + 1).toLong * 3600000000L)
      assert(d.toLong * 86400000000L <= micros && micros < (d + 1).toLong * 86400000000L)
      assert(Math.floorDiv(h.toLong, 24L) == d.toLong)
      // year/month agree with java.time on the same instant
      val ld = java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L))
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      assert(YearTransform.apply(IceTimestamp, micros) == ld.getYear - 1970)
      assert(MonthTransform.apply(IceTimestamp, micros) ==
        (ld.getYear - 1970) * 12 + ld.getMonthValue - 1)
    }
  }

  test("rewriteNot preserves semantics under evaluation") {
    val schema = IceSchema(0, Seq(NestedField(1, "x", IceInt)))
    val rnd = new Random(46)
    val ops = Seq(Op.Lt, Op.LtEq, Op.Gt, Op.GtEq, Op.Eq, Op.NotEq)
    def randPred(): IcePredicate = Pred(ops(rnd.nextInt(ops.size)), "x",
      Seq(rnd.nextInt(21) - 10))
    def randTree(depth: Int): IcePredicate =
      if (depth == 0) randPred()
      else rnd.nextInt(4) match {
        case 0 => And(randTree(depth - 1), randTree(depth - 1))
        case 1 => Or(randTree(depth - 1), randTree(depth - 1))
        case 2 => Not(randTree(depth - 1))
        case _ => randPred()
      }
    def naive(q: IcePredicate, x: Int): Boolean = q match {
      case Not(c) => !naive(c, x)
      case And(l, r) => naive(l, x) && naive(r, x)
      case Or(l, r) => naive(l, x) || naive(r, x)
      case AlwaysTrue => true
      case AlwaysFalse => false
      case Pred(op, _, lits) =>
        val v = lits.head.asInstanceOf[Int]
        op match {
          case Op.Lt => x < v
          case Op.LtEq => x <= v
          case Op.Gt => x > v
          case Op.GtEq => x >= v
          case Op.Eq => x == v
          case Op.NotEq => x != v
          case _ => false
        }
      case other => throw new IllegalStateException(other.toString)
    }
    def hasNot(q: IcePredicate): Boolean = q match {
      case Not(_) => true
      case And(l, r) => hasNot(l) || hasNot(r)
      case Or(l, r) => hasNot(l) || hasNot(r)
      case _ => false
    }
    (1 to N).foreach { _ =>
      val p = randTree(3)
      val x = rnd.nextInt(25) - 12
      assert(!hasNot(Predicates.rewriteNot(p)))
      val bound = Predicates.bind(p, schema)
      assert(Predicates.evaluate(bound, id => if (id == 1) Some(x) else None) ==
        naive(p, x), s"$p at x=$x")
    }
  }

  test("manifest summary bounds agree with row-level evaluation decisions") {
    // inclusive evaluator soundness: if a value matches the predicate and
    // lies within [lower, upper], the summary evaluator must keep the file
    val rnd = new Random(47)
    val pSchema = IceSchema(-1, Seq(NestedField(1000, "p", IceInt)))
    (1 to N).foreach { _ =>
      val lo = rnd.nextInt(1000) - 500
      val hi = lo + rnd.nextInt(100)
      val v = lo + rnd.nextInt(hi - lo + 1) // inside the range
      val summary = graft.meta.FieldSummary(containsNull = false, Some(false),
        Some(Bounds.encode(IceInt, lo)), Some(Bounds.encode(IceInt, hi)))
      val m = graft.meta.ManifestFile("m", 1, 0, 0, 1, 1, 1, 1, 0, 0, 1, 0, 0,
        Seq(summary))
      val ops = Seq(P.ltEq("p", v), P.gtEq("p", v), P.equalTo("p", v),
        P.in("p", Seq(v, v + 5000)))
      ops.foreach { pred =>
        assert(Evaluators.manifestMayMatch(P.bind(pred, pSchema), pSchema, m),
          s"$pred vs [$lo,$hi] v=$v")
      }
    }
  }

  test("makeCompatibleName produces valid names, is idempotent, keeps valid ones") {
    val rnd = new Random(46)
    def valid(n: String): Boolean = n.nonEmpty &&
      (n.head == '_' || Character.isLetter(n.head)) &&
      n.tail.forall(c => c == '_' || Character.isLetterOrDigit(c))
    (1 to N).foreach { _ =>
      val raw = (1 to 1 + rnd.nextInt(12))
        .map(_ => "ab1_/ -%.:#漢".charAt(rnd.nextInt(12))).mkString
      val fixed = SchemaConv.makeCompatibleName(raw)
      assert(valid(fixed), s"'$raw' -> '$fixed'")
      assert(SchemaConv.makeCompatibleName(fixed) == fixed, s"not idempotent: '$fixed'")
      if (valid(raw)) assert(fixed == raw, s"valid name changed: '$raw'")
    }
  }

  test("name mapping JSON round-trips arbitrary alias trees") {
    import graft.meta.{MappedField, NameMapping}
    val rnd = new Random(47)
    def randField(depth: Int): MappedField = MappedField(
      fieldId = if (rnd.nextBoolean()) Some(rnd.nextInt(10000)) else None,
      names = (1 to 1 + rnd.nextInt(3)).map(_ => rnd.alphanumeric.take(5).mkString),
      fields = if (depth <= 0 || rnd.nextInt(3) > 0) Nil
        else (1 to rnd.nextInt(3)).map(_ => randField(depth - 1)))
    (1 to 100).foreach { _ =>
      val mapping = (1 to 1 + rnd.nextInt(5)).map(_ => randField(2))
      val back = NameMapping.parse(NameMapping.toJson(mapping))
      assert(back == mapping)
      // every (alias path -> id) in the index resolves consistently
      NameMapping.index(back).foreach { case (path, id) =>
        assert(path.nonEmpty && id >= 0)
      }
    }
  }

  test("file metrics evaluators: inclusive keeps any-match files, strict implies all-match") {
    // the two pruning laws as a randomized pair over real row evaluation:
    // if ANY row (incl. null rows) matches, the inclusive evaluator must
    // keep the file; if the strict evaluator claims a whole-file match,
    // EVERY row must actually match (overwriteWhere deletes whole files on
    // that claim — the dual violation is silent data loss on write).
    val rnd = new Random(49)
    val s1 = IceSchema(0, Seq(NestedField(1, "x", IceInt)))
    (1 to 1500).foreach { _ =>
      val values = Seq.fill(1 + rnd.nextInt(40))(rnd.nextInt(400) - 200)
      val nulls = rnd.nextInt(3)
      val f = graft.meta.DataFile(
        content = 0, filePath = "/f", fileFormat = "PARQUET",
        partition = Nil, recordCount = values.size + nulls, fileSizeInBytes = 1,
        valueCounts = Map(1 -> (values.size + nulls).toLong),
        nullValueCounts = Map(1 -> nulls.toLong),
        lowerBounds = Map(1 -> Bounds.encode(IceInt, values.min)),
        upperBounds = Map(1 -> Bounds.encode(IceInt, values.max)))
      val anchor = values(rnd.nextInt(values.size))
      val lit = if (rnd.nextBoolean()) anchor else anchor + rnd.nextInt(21) - 10
      val preds = Seq(P.lt("x", lit), P.ltEq("x", lit), P.gt("x", lit),
        P.gtEq("x", lit), P.equalTo("x", lit), P.notEqualTo("x", lit),
        P.in("x", Seq(lit, lit + 37)), P.isNull("x"), P.notNull("x"))
      preds.foreach { p =>
        val bound = P.bind(p, s1)
        val rows: Seq[Int => Option[Any]] =
          values.map(v => (_: Int) => Some(v)) ++
            Seq.fill(nulls)((_: Int) => None)
        val matches = rows.map(r => Predicates.evaluate(bound, r))
        if (matches.exists(identity))
          assert(Evaluators.fileMayMatch(bound, f),
            s"$p pruned a file containing a matching row (values=$values, nulls=$nulls)")
        if (Evaluators.fileMustMatch(bound, f))
          assert(matches.forall(identity),
            s"$p claimed whole-file match over a non-matching row (values=$values, nulls=$nulls)")
      }
    }
  }

  test("strict evaluator refuses value claims on float columns without NaN proof") {
    // parquet min/max bounds EXCLUDE NaN, so bounds alone can declare an
    // all-rows-match over a file whose NaN rows fail the comparison — and
    // overwriteWhere deletes whole files on that claim. Without a recorded
    // zero NaN count the strict evaluator must refuse; with one it may
    // claim again; inclusive keeps the file throughout.
    val s1 = IceSchema(0, Seq(NestedField(1, "x", IceFloat)))
    val f = graft.meta.DataFile(
      content = 0, filePath = "/f", fileFormat = "PARQUET",
      partition = Nil, recordCount = 2, fileSizeInBytes = 1,
      valueCounts = Map(1 -> 2L), nullValueCounts = Map(1 -> 0L),
      lowerBounds = Map(1 -> Bounds.encode(IceFloat, 5.0f)),
      upperBounds = Map(1 -> Bounds.encode(IceFloat, 5.0f)))
    val gt = P.bind(P.gt("x", 1.0f), s1)
    assert(!Evaluators.fileMustMatch(gt, f),
      "bounds-only float file must not strictly match (may hold NaN rows)")
    assert(Evaluators.fileMustMatch(gt, f.copy(nanValueCounts = Map(1 -> 0L))))
    assert(!Evaluators.fileMustMatch(gt, f.copy(nanValueCounts = Map(1 -> 1L))))
    assert(Evaluators.fileMayMatch(gt, f))
  }

  test("projection inclusiveness: a row-matching predicate never prunes its partition") {
    // THE pruning-soundness law: for any value v and predicate P with
    // P(v) true, the projected partition predicate must accept
    // transform(v) — a violation is silent data loss at scale. Randomized
    // across every projectable transform and comparison op, with literals
    // clustered near the value so boundary arithmetic (truncate floors,
    // pre-epoch time floors, IEEE-safe ceils) is exercised, not dodged.
    val rnd = new Random(48)
    def asLong(a: Any): Long = a match {
      case i: Int => i.toLong
      case l: Long => l
      case other => fail(s"unexpected projected value type: $other")
    }
    def partHolds(p: Pred, pv: Any): Boolean = {
      val v = asLong(pv)
      val ls = p.literals.map(asLong)
      p.op match {
        case Op.Eq => v == ls.head
        case Op.NotEq => v != ls.head
        case Op.Lt => v < ls.head
        case Op.LtEq => v <= ls.head
        case Op.Gt => v > ls.head
        case Op.GtEq => v >= ls.head
        case Op.In => ls.contains(v)
        case Op.NotIn => !ls.contains(v)
        case other => fail(s"unexpected projected op: $other")
      }
    }
    val ops = Seq(Op.Eq, Op.Lt, Op.LtEq, Op.Gt, Op.GtEq, Op.In)
    val intSchema = IceSchema(0, Seq(NestedField(1, "c", IceInt, required = true)))
    val tsSchema = IceSchema(0, Seq(NestedField(1, "c", IceTimestamp, required = true)))
    val dayUs = 86400000000L
    (1 to 4000).foreach { _ =>
      val op = ops(rnd.nextInt(ops.size))
      val (schema, tpe, t, v0, lits0): (IceSchema, IceType, Transform, Any, Seq[Any]) =
        if (rnd.nextBoolean()) {
          val t = Seq(YearTransform, MonthTransform, DayTransform,
            HourTransform)(rnd.nextInt(4))
          // ±100 years of µs timestamps, literals within ±30 days of v
          val v = rnd.nextLong() % (100L * 365 * dayUs)
          def near = v + rnd.nextLong() % (30L * dayUs)
          (tsSchema, IceTimestamp, t, v,
            if (op == Op.In) Seq(near, near, v) else Seq(near))
        } else {
          val t = Seq(IdentityTransform, BucketTransform(1 + rnd.nextInt(64)),
            TruncateTransform(1 + rnd.nextInt(100)))(rnd.nextInt(3))
          val v = rnd.nextInt()
          def near = (v.toLong + rnd.nextInt(201) - 100).toInt
          (intSchema, IceInt, t, v,
            if (op == Op.In) Seq(near, near, v) else Seq(near))
        }
      Predicates.bind(Pred(op, "c", lits0), schema) match {
        case bp: BoundPred =>
          val rowMatches = Predicates.evaluate(bp, _ => Some(v0))
          if (rowMatches) t.project("p", bp).foreach { pp =>
            val pv = t.apply(tpe, v0)
            assert(partHolds(pp, pv),
              s"$t projected $bp to $pp which PRUNES transform($v0)=$pv")
            // and the PRODUCTION partition evaluator agrees end-to-end:
            // bind the projected predicate against the partition schema and
            // drive the same partitionMayMatch the planner uses
            val partSchema = IceSchema(-1, Seq(NestedField(1000, "p", IceInt)))
            assert(Evaluators.partitionMayMatch(
              Predicates.bind(pp, partSchema), partSchema, Seq(pv)),
              s"partitionMayMatch pruned $pp over transform($v0)=$pv")
          }
        case _ => () // bind-time fold (e.g. dedup'd In) — nothing to project
      }
    }
  }

  test("signature laws: simhash order-invariant; minhash is elementwise-min under union") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new Random(47)
    def arr(tokens: Seq[String]) =
      new GenericArrayData(tokens.map(UTF8String.fromString).toArray[Any])
    (1 to 200).foreach { _ =>
      val tokens = Seq.fill(1 + rnd.nextInt(20))(
        rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString).distinct
      // simhash: a bag-of-tokens signature must not depend on token order
      val sh = graft.functions.SimHashSig.compute(arr(tokens))
      assert(graft.functions.SimHashSig.compute(arr(rnd.shuffle(tokens))) == sh)
      // minhash: sig(A ∪ B) = elementwise min(sig(A), sig(B)) — the identity
      // that makes signatures mergeable across partitions
      val split = rnd.nextInt(tokens.size + 1)
      val (a, b) = tokens.splitAt(split)
      val sigU = graft.functions.MinHashSig.compute(arr(tokens)).toLongArray()
      val sigA = graft.functions.MinHashSig.compute(arr(a)).toLongArray()
      val sigB = graft.functions.MinHashSig.compute(arr(b)).toLongArray()
      sigU.indices.foreach(i => assert(sigU(i) == math.min(sigA(i), sigB(i))))
      // lsh buckets (over int8 quantization codes): 4 per vector, each
      // within 4 plane bits
      val codes = new GenericArrayData(
        Array.fill(64)((rnd.nextInt(255) - 127).toLong).map(Long.box(_): Any))
      val buckets = graft.functions.LshBuckets.compute(codes).toIntArray()
      assert(buckets.length == 4 && buckets.forall(v => v >= 0 && v < 16))
    }
  }

  private val P = Predicates
}

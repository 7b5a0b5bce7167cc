package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Predicates => P}

/** Bounds codec round-trips (reference `literals_test.go` conversions) and
  * bind-time folding cases (reference `exprs_test.go:575-940`).
  */
class CoreSpec extends AnyFunSuite {

  private val schema = IceSchema(0, Seq(
    NestedField(1, "id", IceLong, required = true),
    NestedField(2, "name", IceString),
    NestedField(3, "score", IceDouble),
    NestedField(4, "qty", IceInt),
    NestedField(5, "ts", IceTimestampTz),
    NestedField(6, "price", IceDecimal(9, 2)),
    NestedField(7, "day", IceDate)))

  test("bounds codec round-trips every primitive") {
    val cases: Seq[(IceType, Any)] = Seq(
      (IceBoolean, true), (IceBoolean, false),
      (IceInt, 42), (IceInt, -1), (IceDate, 17486),
      (IceLong, 1510871468000000L), (IceTimestamp, -1L),
      (IceFloat, 1.5f), (IceDouble, -0.25),
      (IceDecimal(9, 2), new java.math.BigDecimal("14.20")),
      (IceString, "iceberg"), (IceUUID, "f79c3e09-677c-4bbd-a479-3f349cb785e7"))
    for ((t, v) <- cases) {
      val decoded = Bounds.decode(t, Bounds.encode(t, v))
      assert(decoded == v, s"$t: $v")
    }
    val b = Array[Byte](1, 2, 3)
    assert(Bounds.decode(IceBinary, Bounds.encode(IceBinary, b))
      .asInstanceOf[Array[Byte]].sameElements(b))
  }

  test("bounds codec byte layouts match the spec") {
    assert(Bounds.encode(IceInt, 1).sameElements(Array[Byte](1, 0, 0, 0)))
    assert(Bounds.encode(IceLong, 1L).sameElements(Array[Byte](1, 0, 0, 0, 0, 0, 0, 0)))
    assert(Bounds.encode(IceBoolean, true).sameElements(Array[Byte](1)))
    // decimal 14.20 → unscaled 1420 → big-endian minimal 0x05 0x8C
    assert(Bounds.encode(IceDecimal(9, 2), new java.math.BigDecimal("14.20"))
      .sameElements(Array[Byte](0x05, 0x8C.toByte)))
  }

  test("string compare is code-point order, not UTF-16 code-unit order") {
    // U+E000 (BMP private-use) vs U+1F600 (supplementary, surrogate pair
    // 0xD83D 0xDE00): UTF-16 code-unit order ranks E000 ABOVE the emoji;
    // code-point / UTF-8-byte order (what Parquet stats, Spark's
    // UTF8String, and DuckDB use) ranks it BELOW
    val bmp = "x"
    val emoji = new String(Character.toChars(0x1F600))
    assert(bmp.compareTo(emoji) > 0) // the UTF-16 trap this guards against
    assert(Bounds.compare(IceString, bmp, emoji) < 0)
    assert(Bounds.compare(IceString, emoji, bmp) > 0)
    // consistency with the UTF-8 byte comparison used for binary bounds
    import java.nio.charset.StandardCharsets.UTF_8
    assert(java.util.Arrays.compareUnsigned(
      bmp.getBytes(UTF_8), emoji.getBytes(UTF_8)) < 0)
    // prefix/equality still behave
    assert(Bounds.compare(IceString, "abc", "abc") == 0)
    assert(Bounds.compare(IceString, "ab", "abc") < 0)
  }

  test("truncateUpper skips the surrogate block when incrementing U+D7FF") {
    val s = "p" * 15 + "퟿" + "suffix-beyond-width"
    val up = Bounds.truncateUpper(IceString, s, 16).get.asInstanceOf[String]
    assert(up.codePointCount(0, up.length) == 16)
    assert(up.codePointAt(up.offsetByCodePoints(0, 15)) == 0xE000)
    // the bound must actually bound the original value in code-point order
    assert(Bounds.compare(IceString, up, s) > 0)
    // and survive a UTF-8 encode/decode round-trip (an unpaired surrogate
    // would collapse to '?')
    val rt = Bounds.decode(IceString, Bounds.encode(IceString, up))
    assert(rt == up)
  }

  test("bind folds IsNull/NotNull on required columns") {
    assert(P.bind(P.isNull("id"), schema) == AlwaysFalse)
    assert(P.bind(P.notNull("id"), schema) == AlwaysTrue)
    val b = P.bind(P.isNull("name"), schema)
    assert(b == BoundPred(Op.IsNull, 2, "name", IceString, required = false))
  }

  test("bind folds NaN checks on non-floating columns") {
    assert(P.bind(P.isNaN("qty"), schema) == AlwaysFalse)
    assert(P.bind(P.notNaN("qty"), schema) == AlwaysTrue)
    assert(P.bind(P.isNaN("score"), schema).isInstanceOf[BoundPred])
  }

  test("bind reduces In/NotIn: empty, singleton, dedup") {
    assert(P.bind(P.in("qty", Nil), schema) == AlwaysFalse)
    assert(P.bind(P.notIn("qty", Nil), schema) == AlwaysTrue)
    assert(P.bind(P.in("qty", Seq(5)), schema) ==
      BoundPred(Op.Eq, 4, "qty", IceInt, required = false, Seq(5)))
    val b = P.bind(P.in("qty", Seq(5, 5, 6)), schema).asInstanceOf[BoundPred]
    assert(b.op == Op.In && b.literals.toSet == Set(5, 6))
  }

  test("bind folds out-of-range int literals (AboveMax/BelowMin)") {
    assert(P.bind(P.lt("qty", Long.MaxValue), schema) == AlwaysTrue)
    assert(P.bind(P.gt("qty", Long.MaxValue), schema) == AlwaysFalse)
    assert(P.bind(P.equalTo("qty", Long.MaxValue), schema) == AlwaysFalse)
    assert(P.bind(P.notEqualTo("qty", Long.MaxValue), schema) == AlwaysTrue)
  }

  test("bind folds non-finite literals on non-floating columns instead of crashing") {
    // NaN: no value compares true — every op folds (BigDecimal("NaN")
    // throws NumberFormatException, which used to escape bind())
    for (nan <- Seq(Double.NaN, Float.NaN: Any)) {
      assert(P.bind(P.equalTo("qty", nan), schema) == AlwaysFalse)
      assert(P.bind(P.notEqualTo("qty", nan), schema) == AlwaysTrue)
      assert(P.bind(P.lt("qty", nan), schema) == AlwaysFalse)
      assert(P.bind(P.gtEq("id", nan), schema) == AlwaysFalse)
      assert(P.bind(P.lt("price", nan), schema) == AlwaysFalse)
    }
    // ±Infinity: bounds everything finite
    assert(P.bind(P.lt("qty", Double.PositiveInfinity), schema) == AlwaysTrue)
    assert(P.bind(P.gt("qty", Double.PositiveInfinity), schema) == AlwaysFalse)
    assert(P.bind(P.gt("id", Double.NegativeInfinity), schema) == AlwaysTrue)
    assert(P.bind(P.ltEq("price", Double.NegativeInfinity), schema) == AlwaysFalse)
    assert(P.bind(P.equalTo("qty", Double.PositiveInfinity), schema) == AlwaysFalse)
    // In-lists containing a non-finite member drop it, keep the rest
    assert(P.bind(P.in("qty", Seq(5, Double.NaN)), schema) ==
      BoundPred(Op.Eq, 4, "qty", IceInt, required = false, Seq(5)))
    // floating columns still bind NaN literally (IsNaN territory, not ours)
    assert(P.bind(P.equalTo("score", Double.NaN), schema).isInstanceOf[BoundPred])
  }

  test("bind rewrites non-representable numeric literals per-op, never truncates") {
    // fractional on an int column: equalTo must NOT truncate 1.5 to 1
    assert(P.bind(P.equalTo("qty", 1.5), schema) == AlwaysFalse)
    assert(P.bind(P.notEqualTo("qty", 1.5), schema) == AlwaysTrue)
    // col < 2.5 ⟺ col <= 2; col > 2.5 ⟺ col >= 3
    val lt = P.bind(P.lt("qty", 2.5), schema).asInstanceOf[BoundPred]
    assert(lt.op == Op.LtEq && lt.literal == 2)
    val gte = P.bind(P.gtEq("qty", 2.5), schema).asInstanceOf[BoundPred]
    assert(gte.op == Op.GtEq && gte.literal == 3)
    // finer-scaled literal on a decimal(9,2): lt(10.005) ⟺ ltEq(10.00) —
    // the old int-only fold collapsed this to AlwaysFalse (and its dual to
    // AlwaysTrue, which feeding deleteWhere marks EVERY row deleted)
    val dlt = P.bind(P.lt("price", new java.math.BigDecimal("10.005")), schema)
      .asInstanceOf[BoundPred]
    assert(dlt.op == Op.LtEq &&
      dlt.literal == new java.math.BigDecimal("10.00"))
    val dgt = P.bind(P.gt("price", new java.math.BigDecimal("10.005")), schema)
      .asInstanceOf[BoundPred]
    assert(dgt.op == Op.GtEq &&
      dgt.literal == new java.math.BigDecimal("10.01"))
    // fractional on a long column folds the same way
    val llt = P.bind(P.lt("id", 7.5), schema).asInstanceOf[BoundPred]
    assert(llt.op == Op.LtEq && llt.literal == 7L)
  }

  test("bind casts date/timestamp string literals") {
    val d = P.bind(P.gtEq("day", "2017-11-16"), schema).asInstanceOf[BoundPred]
    assert(d.literal == 17486)
    val ts = P.bind(P.lt("ts", "2017-11-16T22:31:08"), schema).asInstanceOf[BoundPred]
    assert(ts.literal == 1510871468000000L)
  }

  test("rewriteNot pushes negation to leaves (De Morgan)") {
    val p = Not(And(P.lt("qty", 5), Or(P.isNull("name"), P.gt("qty", 10))))
    val r = P.rewriteNot(p)
    assert(r == Or(Pred(Op.GtEq, "qty", Seq(5)),
      And(Pred(Op.NotNull, "name"), Pred(Op.LtEq, "qty", Seq(10)))))
  }

  test("constructor simplification: And/Or with True/False") {
    assert(P.and(AlwaysFalse, P.lt("qty", 5)) == AlwaysFalse)
    assert(P.and(AlwaysTrue, P.lt("qty", 5)) == Pred(Op.Lt, "qty", Seq(5)))
    assert(P.or(AlwaysTrue, P.lt("qty", 5)) == AlwaysTrue)
    assert(P.or(AlwaysFalse, P.lt("qty", 5)) == Pred(Op.Lt, "qty", Seq(5)))
  }

  test("row evaluation on bound predicates") {
    val bound = P.bind(P.and(P.gtEq("qty", 5), P.lt("qty", 10)), schema)
    def row(v: Any): Int => Option[Any] = id => if (id == 4) Option(v) else None
    assert(P.evaluate(bound, row(7)))
    assert(!P.evaluate(bound, row(4)))
    assert(!P.evaluate(bound, row(10)))
    assert(!P.evaluate(bound, row(null)))
    val inPred = P.bind(P.in("name", Seq("a", "b")), schema)
    def nrow(v: Any): Int => Option[Any] = id => if (id == 2) Option(v) else None
    assert(P.evaluate(inPred, nrow("a")))
    assert(!P.evaluate(inPred, nrow("c")))
  }

  test("schema indexes: byId, byName, nested, highestFieldId") {
    val nested = IceSchema(0, Seq(
      NestedField(1, "id", IceLong, required = true),
      NestedField(2, "loc", IceStructType(Seq(
        NestedField(3, "lat", IceDouble), NestedField(4, "lon", IceDouble))))))
    assert(nested.findByName("loc.lat").map(_.id).contains(3))
    assert(nested.findByName("LOC.LAT", caseSensitive = false).map(_.id).contains(3))
    assert(nested.highestFieldId == 4)
    assert(nested.findById(4).map(_.name).contains("lon"))
  }

  test("spark schema conversion round-trips field ids") {
    val st = schema.toSpark
    assert(st.fields.forall(_.metadata.contains(SchemaConv.FieldIdKey)))
    assert(st("qty").metadata.getLong(SchemaConv.FieldIdKey) == 4L)
    val back = SchemaConv.fromSpark(st)
    assert(back.fields.map(_.name) == schema.fields.map(_.name))
  }

  test("type promotion rules") {
    assert(IceType.canPromote(IceInt, IceLong))
    assert(IceType.canPromote(IceFloat, IceDouble))
    assert(IceType.canPromote(IceDecimal(9, 2), IceDecimal(18, 2)))
    assert(!IceType.canPromote(IceDecimal(9, 2), IceDecimal(18, 3)))
    assert(!IceType.canPromote(IceLong, IceInt))
    assert(IceType.canPromote(IceFixed(16), IceUUID))
  }

  test("nested list/map types: JSON and Spark conversion round-trip") {
    import graft.meta.TableMetadataJson
    val nested = IceSchema(3, Seq(
      NestedField(1, "id", IceLong, required = true),
      NestedField(2, "tags", IceListType(5, IceString, elementRequired = false)),
      NestedField(3, "attrs", IceMapType(6, IceString, 7, IceDouble, valueRequired = true)),
      NestedField(4, "loc", IceStructType(Seq(
        NestedField(8, "lat", IceDouble), NestedField(9, "lon", IceDouble))))))
    val json = TableMetadataJson.schemaToJson(nested).toString
    val back = TableMetadataJson.schemaFromJson(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(json))
    assert(back == nested)
    // Spark StructType shape (containsNull/valueContainsNull honored)
    val st = nested.toSpark
    assert(st("tags").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, true))
    assert(st("attrs").dataType == org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.DoubleType, false))
    // nested IDs indexed
    assert(nested.findById(9).map(_.name).contains("lon"))
    assert(nested.findByName("loc.lat").map(_.id).contains(8))
  }

  test("type spec-string round-trip") {
    for (t <- Seq(IceBoolean, IceInt, IceLong, IceFloat, IceDouble, IceDate, IceTime,
        IceTimestamp, IceTimestampTz, IceString, IceUUID, IceBinary,
        IceDecimal(18, 2), IceFixed(16))) {
      assert(IceType.fromSpecString(IceType.toSpecString(t)) == t)
    }
  }
}

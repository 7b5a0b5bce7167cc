package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors from the Iceberg table spec (Appendix B) — the same values
  * the reference verifies in `transforms_test.go`; bucket hashes must
  * byte-match murmur3_x86_32(seed=0) over the spec's byte layouts.
  */
class TransformsSpec extends AnyFunSuite {

  test("murmur3 spec vectors: integral types hash as little-endian int64") {
    assert(Murmur3.hashLong(34L) == 2017239379)
    // int is promoted to long before hashing → same hash
    assert(Murmur3.hashLong(34) == 2017239379)
    // date 2017-11-16 = 17486 days
    assert(Murmur3.hashLong(17486L) == -653330422)
    // time 22:31:08 = 81068000000 µs
    assert(Murmur3.hashLong(81068000000L) == -662762989)
    // timestamp 2017-11-16T22:31:08 = 1510871468000000 µs
    assert(Murmur3.hashLong(1510871468000000L) == -2047944441)
  }

  test("murmur3 spec vectors: string, uuid, binary, decimal") {
    assert(Murmur3.hashString("iceberg") == 1210000089)
    assert(Murmur3.hashUUID(
      java.util.UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7")) == 1488055340)
    assert(Murmur3.hash(Array[Byte](0, 1, 2, 3)) == -188683207)
    // decimal 14.20 hashes its unscaled 1420 as minimal big-endian bytes
    assert(Murmur3.hashDecimal(java.math.BigInteger.valueOf(1420)) == -500754589)
  }

  test("bucket transform applies (hash & MaxInt) % N") {
    val b = BucketTransform(16)
    assert(b.apply(IceInt, 34) == (2017239379 & Int.MaxValue) % 16)
    assert(b.apply(IceString, "iceberg") == (1210000089 & Int.MaxValue) % 16)
    assert(b.apply(IceInt, null) == null)
  }

  test("truncate transform: ints use floor-mod, strings prefix, decimal unscaled-mod") {
    val t10 = TruncateTransform(10)
    assert(t10.apply(IceInt, 1) == 0)
    assert(t10.apply(IceInt, -1) == -10)
    assert(t10.apply(IceLong, 1234L) == 1230L)
    assert(TruncateTransform(3).apply(IceString, "iceberg") == "ice")
    assert(TruncateTransform(50).apply(IceString, "ice") == "ice")
    // spec: truncate(10, 12.34) = 12.30 (scale 2, width on unscaled)
    assert(TruncateTransform(10).apply(IceDecimal(9, 2),
      new java.math.BigDecimal("12.34")) == new java.math.BigDecimal("12.30"))
    assert(TruncateTransform(10).apply(IceDecimal(9, 2),
      new java.math.BigDecimal("-0.05")) == new java.math.BigDecimal("-0.10"))
  }

  test("time transforms: spec vectors") {
    // 2017-11-16 = 17486 days
    assert(YearTransform.apply(IceDate, 17486) == 47)
    assert(MonthTransform.apply(IceDate, 17486) == 574)
    assert(DayTransform.apply(IceDate, 17486) == 17486)
    // 2017-11-16T22:31:08 µs
    val ts = 1510871468000000L
    assert(YearTransform.apply(IceTimestamp, ts) == 47)
    assert(MonthTransform.apply(IceTimestamp, ts) == 574)
    assert(DayTransform.apply(IceTimestamp, ts) == 17486)
    assert(HourTransform.apply(IceTimestamp, ts) == 419686)
    // pre-epoch: 1969-12-31T23:59:59 floors to -1 day / month -1 / hour -1
    val pre = -1000000L
    assert(DayTransform.apply(IceTimestamp, pre) == -1)
    assert(MonthTransform.apply(IceTimestamp, pre) == -1)
    assert(HourTransform.apply(IceTimestamp, pre) == -1)
    assert(YearTransform.apply(IceTimestamp, pre) == -1)
  }

  test("time transform human strings") {
    assert(YearTransform.toHumanString(IceDate, 47) == "2017")
    assert(MonthTransform.toHumanString(IceDate, 574) == "2017-11")
    assert(DayTransform.toHumanString(IceDate, 17486) == "2017-11-16")
    assert(HourTransform.toHumanString(IceTimestamp, 419686) == "2017-11-16-22")
  }

  test("inlined hashLong byte-matches the array murmur path for random longs") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val v = rnd.nextLong()
      val b = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()
      assert(Murmur3.hashLong(v) == Murmur3.hash(b), s"mismatch for $v")
    }
    for (v <- Seq(0L, -1L, 1L, Long.MinValue, Long.MaxValue))
      assert(Murmur3.hashLong(v) == Murmur3.hash(java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putLong(v).array()))
  }

  test("partition paths escape per UTF-8 byte: multi-byte chars cannot collide with byte pairs") {
    val schema = IceSchema(0, Seq(NestedField(1, "name", IceString)))
    val spec = graft.meta.PartitionSpec.of(0,
      ("name", IdentityTransform, "name"))(schema)
    def path(v: String): String = spec.partitionToPath(Seq(v), schema)
    // "%02X" over the raw code unit would render € (U+20AC) as "%20AC" —
    // exactly the escape of " AC" (space + 'A' + 'C' kept verbatim? no:
    // space escapes to %20) — byte-wise escaping keeps them distinct
    assert(path("€") != path(" AC"))
    assert(path("€").contains("%E2%82%AC")) // UTF-8 bytes of U+20AC
    assert(path(" AC") == "name=%20AC")
    assert(path("a-b_c.9") == "name=a-b_c.9") // safe chars pass through
  }

  test("transform round-trips through spec names") {
    for (t <- Seq(IdentityTransform, VoidTransform, YearTransform, MonthTransform,
        DayTransform, HourTransform, BucketTransform(16), TruncateTransform(4))) {
      assert(Transform.fromString(t.name) == t)
    }
  }

  test("bucket projection: only Eq/In project; range does not") {
    val b = BucketTransform(8)
    val eq = BoundPred(Op.Eq, 1, "c", IceInt, required = false, Seq(34))
    assert(b.project("c_bucket", eq).contains(
      Pred(Op.Eq, "c_bucket", Seq((2017239379 & Int.MaxValue) % 8))))
    val lt = BoundPred(Op.Lt, 1, "c", IceInt, required = false, Seq(34))
    assert(b.project("c_bucket", lt).isEmpty)
  }

  test("truncate projection adjusts boundaries") {
    val t = TruncateTransform(10)
    def bp(op: Op, v: Int) = BoundPred(op, 1, "c", IceInt, required = false, Seq(v))
    // c < 15 → part <= truncate(14) = 10
    assert(t.project("p", bp(Op.Lt, 15)).contains(Pred(Op.LtEq, "p", Seq(10))))
    // c < 10 → part <= truncate(9) = 0
    assert(t.project("p", bp(Op.Lt, 10)).contains(Pred(Op.LtEq, "p", Seq(0))))
    // c > 19 → part >= truncate(20) = 20
    assert(t.project("p", bp(Op.Gt, 19)).contains(Pred(Op.GtEq, "p", Seq(20))))
    assert(t.project("p", bp(Op.GtEq, 20)).contains(Pred(Op.GtEq, "p", Seq(20))))
  }

  test("day/hour projection boundary: ts < midnight excludes the day") {
    val dayMicros = 86400000000L
    def bp(op: Op, v: Long) = BoundPred(op, 1, "ts", IceTimestamp, required = false, Seq(v))
    // ts < day-17486 start → day <= 17485
    assert(DayTransform.project("p", bp(Op.Lt, 17486L * dayMicros))
      .contains(Pred(Op.LtEq, "p", Seq(17485))))
    // ts >= day-17486 start → day >= 17486
    assert(DayTransform.project("p", bp(Op.GtEq, 17486L * dayMicros))
      .contains(Pred(Op.GtEq, "p", Seq(17486))))
  }

  test("timestamp_ns (v3): transforms agree with the µs value of the same instant") {
    // 2017-11-16T22:31:08 = 1510871468 s; ns value carries sub-µs digits
    val micros = 1510871468000000L
    val nanos = micros * 1000L + 987L
    // bucket hashes the µs value (spec appendix B) → identical buckets
    val b = BucketTransform(16)
    assert(b.apply(IceTimestampNs, nanos) == b.apply(IceTimestamp, micros))
    assert(b.apply(IceTimestampTzNs, nanos) == Murmur3.hashLong(micros).&(Int.MaxValue) % 16)
    // time transforms floor to the same periods
    Seq(YearTransform, MonthTransform, DayTransform, HourTransform).foreach { t =>
      assert(t.apply(IceTimestampNs, nanos) == t.apply(IceTimestamp, micros), t.name)
    }
    // pre-epoch floor division (not truncation toward zero)
    val preEpochNs = -1L // 1969-12-31T23:59:59.999999999
    assert(DayTransform.apply(IceTimestampNs, preEpochNs) == -1)
    assert(HourTransform.apply(IceTimestampTzNs, preEpochNs) == -1)
    // identity human string renders the full nano precision
    assert(IdentityTransform.toHumanString(IceTimestampNs, nanos) ==
      "2017-11-16T22:31:08.000000987Z")
    // spec string + literal codec round-trips
    assert(IceType.fromSpecString("timestamp_ns") == IceTimestampNs)
    assert(IceType.fromSpecString("timestamptz_ns") == IceTimestampTzNs)
    assert(Bounds.decode(IceTimestampNs, Bounds.encode(IceTimestampNs, nanos)) == nanos)
    assert(Bounds.compare(IceTimestampTzNs, nanos, micros * 1000L) > 0)
  }
}

package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Predicates => P}
import graft.meta.{DataFile, FieldSummary, ManifestFile, PartitionField, PartitionSpec}

/** Truth tables for the pruning evaluators, ported in spirit from the
  * reference's `table/evaluators_test.go` (TestManifestEvaluator /
  * TestEvaluators): operator × bounds × null permutations, checking both
  * "may match" (inclusive) and "must match" (strict) decisions.
  */
class EvaluatorsSpec extends AnyFunSuite {

  private val schema = IceSchema(0, Seq(
    NestedField(1, "x", IceInt),
    NestedField(2, "s", IceString),
    NestedField(3, "f", IceDouble),
    NestedField(4, "all_null", IceString)))

  /** A data file with x ∈ [30, 79], s ∈ ["a", "z"], f ∈ [1.5, 9.5],
    * all_null entirely null; 100 rows, x has 0 nulls, f has 20.
    */
  private val file = DataFile(
    content = 0, filePath = "/data/f1.parquet", fileFormat = "PARQUET",
    partition = Nil, recordCount = 100, fileSizeInBytes = 1000,
    valueCounts = Map(1 -> 100L, 2 -> 100L, 3 -> 100L, 4 -> 100L),
    nullValueCounts = Map(1 -> 0L, 2 -> 0L, 3 -> 20L, 4 -> 100L),
    lowerBounds = Map(
      1 -> Bounds.encode(IceInt, 30),
      2 -> Bounds.encode(IceString, "a"),
      3 -> Bounds.encode(IceDouble, 1.5)),
    upperBounds = Map(
      1 -> Bounds.encode(IceInt, 79),
      2 -> Bounds.encode(IceString, "z"),
      3 -> Bounds.encode(IceDouble, 9.5)))

  private def may(p: IcePredicate): Boolean =
    Evaluators.fileMayMatch(P.bind(p, schema), file)
  private def must(p: IcePredicate): Boolean =
    Evaluators.fileMustMatch(P.bind(p, schema), file)

  test("inclusive metrics: range operators against [30, 79]") {
    // Lt
    assert(!may(P.lt("x", 30)))
    assert(may(P.lt("x", 31)))
    assert(may(P.lt("x", 79)))
    // LtEq
    assert(!may(P.ltEq("x", 29)))
    assert(may(P.ltEq("x", 30)))
    // Gt
    assert(!may(P.gt("x", 79)))
    assert(may(P.gt("x", 78)))
    // GtEq
    assert(!may(P.gtEq("x", 80)))
    assert(may(P.gtEq("x", 79)))
    // Eq inside/outside
    assert(may(P.equalTo("x", 30)) && may(P.equalTo("x", 79)) && may(P.equalTo("x", 50)))
    assert(!may(P.equalTo("x", 29)) && !may(P.equalTo("x", 80)))
    // NotEq never prunes a range
    assert(may(P.notEqualTo("x", 50)))
    // In prunes only when every literal misses the range
    assert(may(P.in("x", Seq(25, 30))))
    assert(!may(P.in("x", Seq(25, 29))))
    assert(may(P.notIn("x", Seq(30, 79))))
  }

  test("inclusive metrics: null semantics") {
    // x has zero nulls → IsNull cannot match
    assert(!may(P.isNull("x")))
    assert(may(P.notNull("x")))
    // all_null column: NotNull cannot match, value preds cannot match
    assert(may(P.isNull("all_null")))
    assert(!may(P.notNull("all_null")))
    assert(!may(P.equalTo("all_null", "v")))
    assert(!may(P.lt("all_null", "v")))
    // f has some nulls → both match
    assert(may(P.isNull("f")) && may(P.notNull("f")))
  }

  test("inclusive metrics: startsWith against string bounds") {
    assert(may(P.startsWith("s", "m")))
    assert(may(P.startsWith("s", "a")))
    assert(!may(P.startsWith("s", "{"))) // '{' > 'z'
    assert(may(P.notStartsWith("s", "m")))
  }

  test("startsWith compares bounds in UTF-8 byte order (supplementary prefix)") {
    // File strings span [U+E000, U+1F600 + 'z'] — valid bounds in the UTF-8
    // order stats are written in. The file holds "😀z", which starts with
    // "😀"; a UTF-16 compare ranks the surrogate unit 0xD83D BELOW 0xE000
    // and wrongly pruned this file (silent data loss).
    val f2 = file.copy(
      lowerBounds = file.lowerBounds + (2 -> Bounds.encode(IceString, "")),
      upperBounds = file.upperBounds + (2 -> Bounds.encode(IceString, "😀z")))
    def may2(p: IcePredicate): Boolean =
      Evaluators.fileMayMatch(P.bind(p, schema), f2)
    assert(may2(P.startsWith("s", "😀")))
    // pruning still fires for prefixes provably outside the range
    assert(!may2(P.startsWith("s", "a"))) // below U+E000
    assert(!may2(P.startsWith("s", "􏿿"))) // U+10FFFF, above the max
    // and the manifest-summary path shares the same byte-order compare
    val pSchema = IceSchema(-1, Seq(NestedField(1000, "s_t", IceString)))
    val m = ManifestFile(
      path = "/m/m1.avro", length = 1, specId = 0, content = 0,
      sequenceNumber = 1, minSequenceNumber = 1, addedSnapshotId = 1,
      addedFilesCount = 1, existingFilesCount = 0, deletedFilesCount = 0,
      addedRowsCount = 10, existingRowsCount = 0, deletedRowsCount = 0,
      partitions = Seq(FieldSummary(
        containsNull = false, None,
        Some(Bounds.encode(IceString, "")),
        Some(Bounds.encode(IceString, "😀z")))))
    assert(Evaluators.manifestMayMatch(
      P.bind(P.startsWith("s_t", "😀"), pSchema), pSchema, m))
    assert(!Evaluators.manifestMayMatch(
      P.bind(P.startsWith("s_t", "a"), pSchema), pSchema, m))
  }

  test("strict metrics: must-match decisions") {
    // whole range below the literal
    assert(must(P.lt("x", 80)))
    assert(!must(P.lt("x", 79)))
    assert(must(P.ltEq("x", 79)))
    assert(must(P.gt("x", 29)))
    assert(must(P.gtEq("x", 30)))
    assert(!must(P.gt("x", 30)))
    // NotEq: literal outside the range → all rows differ
    assert(must(P.notEqualTo("x", 100)))
    assert(!must(P.notEqualTo("x", 50)))
    // f has nulls → strict value predicates fail (null rows don't match)
    assert(!must(P.lt("f", 100.0)))
    // all-null column: IsNull holds for every row
    assert(must(P.isNull("all_null")))
    assert(!must(P.isNull("x")))
    assert(must(P.notNull("x")))
  }

  test("manifest evaluator: FieldSummary bounds over a partition field") {
    val pSchema = IceSchema(-1, Seq(NestedField(1000, "bucket_x", IceInt)))
    def mf(lower: Int, upper: Int, containsNull: Boolean) = ManifestFile(
      path = "m.avro", length = 1, specId = 0, content = 0,
      sequenceNumber = 1, minSequenceNumber = 1, addedSnapshotId = 1,
      addedFilesCount = 1, existingFilesCount = 0, deletedFilesCount = 0,
      addedRowsCount = 10, existingRowsCount = 0, deletedRowsCount = 0,
      partitions = Seq(FieldSummary(containsNull, Some(false),
        Some(Bounds.encode(IceInt, lower)), Some(Bounds.encode(IceInt, upper)))))
    def evalOn(p: IcePredicate, m: ManifestFile): Boolean =
      Evaluators.manifestMayMatch(P.bind(p, pSchema), pSchema, m)

    assert(evalOn(P.equalTo("bucket_x", 5), mf(0, 9, containsNull = false)))
    assert(!evalOn(P.equalTo("bucket_x", 15), mf(0, 9, containsNull = false)))
    assert(!evalOn(P.lt("bucket_x", 0), mf(0, 9, containsNull = false)))
    assert(evalOn(P.gtEq("bucket_x", 9), mf(0, 9, containsNull = false)))
    assert(!evalOn(P.gtEq("bucket_x", 10), mf(0, 9, containsNull = false)))
    assert(!evalOn(P.isNull("bucket_x"), mf(0, 9, containsNull = false)))
    assert(evalOn(P.isNull("bucket_x"), mf(0, 9, containsNull = true)))
    assert(evalOn(P.in("bucket_x", Seq(9, 20)), mf(0, 9, containsNull = false)))
    assert(!evalOn(P.in("bucket_x", Seq(10, 20)), mf(0, 9, containsNull = false)))
    // no summaries at all → cannot prune
    assert(Evaluators.manifestMayMatch(P.bind(P.equalTo("bucket_x", 99), pSchema),
      pSchema, mf(0, 9, containsNull = false).copy(partitions = Nil)))
  }

  test("inclusive projection routes predicates through spec transforms") {
    val s = IceSchema(0, Seq(NestedField(1, "ts", IceTimestamp),
      NestedField(2, "id", IceLong)))
    val spec = PartitionSpec(0, Seq(
      PartitionField(1, 1000, "ts_day", DayTransform),
      PartitionField(2, 1001, "id_bucket", BucketTransform(16))))
    val dayMicros = 86400000000L
    val bound = P.bind(P.and(P.gtEq("ts", 100L * dayMicros), P.equalTo("id", 7L)), s)
    val projected = Evaluators.inclusiveProjection(bound, spec)
    val pSchema = Evaluators.partitionSchema(spec, s)
    val pBound = P.bind(projected, pSchema)
    // tuple (day=100, bucket(7)) matches; (day=99, ...) does not
    val b7 = BucketTransform(16).apply(IceLong, 7L)
    assert(Evaluators.partitionMayMatch(pBound, pSchema, Seq(100, b7)))
    assert(!Evaluators.partitionMayMatch(pBound, pSchema, Seq(99, b7)))
    assert(!Evaluators.partitionMayMatch(pBound, pSchema,
      Seq(100, (b7.asInstanceOf[Int] + 1) % 16)))
    // a range predicate on the bucketed column cannot project → stays true
    val rangeBound = P.bind(P.lt("id", 5L), s)
    val rangeProjected = Evaluators.inclusiveProjection(rangeBound, spec)
    assert(rangeProjected == AlwaysTrue)
  }

  test("missing stats are conservative: file without bounds never prunes") {
    val bare = file.copy(valueCounts = Map.empty, nullValueCounts = Map.empty,
      lowerBounds = Map.empty, upperBounds = Map.empty)
    assert(Evaluators.fileMayMatch(P.bind(P.equalTo("x", -999), schema), bare))
    assert(Evaluators.fileMayMatch(P.bind(P.isNull("x"), schema), bare))
    assert(!Evaluators.fileMustMatch(P.bind(P.lt("x", 1000), schema), bare))
  }
}

package graft.table

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Predicates => P, _}
import graft.meta._

/** The reference's partition-pruning fixture matrix re-created with OUR
  * writer: one table per transform over the same 12 rows (4 in 2022-03,
  * 8 in 2023-03), with the EXACT planned-task counts of
  * `table/scanner_test.go:74-113` (fixtures provisioned by
  * `internal/recipe/provision.py:210-248`). Counts combine partition-tuple
  * pruning (identity/time/truncate project; bucket only for Eq/In) with
  * footer-stats pruning — e.g. `years` with `dt < 2023-03-05` passes both
  * year files through the projection but stats drop the 2023 file.
  */
class PruningMatrixSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var catalog: FileCatalog = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("pruning-matrix-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = new FileCatalog(Files.createTempDirectory("graft-prune").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The reference's 12-row fixture: (dt date, ts timestamp, number int,
    * letter string); rows 1-4 in March 2022, rows 5-12 in March 2023.
    */
  private def fixtureDF: DataFrame = {
    val rows = (1 to 12).map { i =>
      val (y, d) = if (i <= 4) ("2022", i) else ("2023", i)
      (f"$y-03-$d%02d", f"$y-03-$d%02d ${i}%02d:22:00", i, ('a' + i - 1).toChar.toString)
    }
    val s = spark
    import s.implicits._
    rows.toDF("dt_s", "ts_s", "number", "letter")
      .selectExpr("CAST(dt_s AS DATE) AS dt", "CAST(ts_s AS TIMESTAMP) AS ts",
        "number", "letter")
  }

  private def buildTable(name: String, field: (String, Transform, String)): IceTable = {
    val df = fixtureDF
    val schema = SchemaConv.fromSpark(df.schema)
    val t = IceTable.create(catalog, name, schema,
      PartitionSpec.of(0, field)(schema))
    t.append(df)
    t
  }

  private def assertTasks(t: IceTable, filter: IcePredicate, expected: Int): Unit = {
    val planned = t.newScan(filter).planFiles().size
    assert(planned == expected,
      s"${t.name} ${filter}: planned $planned files, reference expects $expected")
  }

  test("partitioned_by_identity: timestamp partition tuples prune exactly") {
    val t = buildTable("pm_identity", ("ts", IdentityTransform, "ts"))
    assert(t.newScan().planFiles().size == 12)
    assertTasks(t, P.gtEq("ts", "2023-03-05T00:00:00"), 8)
    assertTasks(t, P.lt("ts", "2023-03-05T00:00:00"), 4)
  }

  test("partitioned_by_years: projection + stats combine") {
    val t = buildTable("pm_years", ("dt", YearTransform, "dt_year"))
    assertTasks(t, AlwaysTrue, 2)
    assertTasks(t, P.lt("dt", "2023-03-05"), 1)
    assertTasks(t, P.gtEq("dt", "2023-03-05"), 1)
  }

  test("partitioned_by_months") {
    val t = buildTable("pm_months", ("dt", MonthTransform, "dt_month"))
    assertTasks(t, P.gtEq("dt", "2023-03-05"), 1)
  }

  test("partitioned_by_days") {
    val t = buildTable("pm_days", ("ts", DayTransform, "ts_day"))
    assertTasks(t, P.gtEq("ts", "2023-03-05T00:00:00"), 8)
  }

  test("partitioned_by_hours") {
    val t = buildTable("pm_hours", ("ts", HourTransform, "ts_hour"))
    assertTasks(t, P.gtEq("ts", "2023-03-05T00:00:00"), 8)
  }

  test("partitioned_by_truncate: string prefix partitions") {
    val t = buildTable("pm_truncate", ("letter", TruncateTransform(1), "letter_trunc"))
    assertTasks(t, P.gtEq("letter", "e"), 8)
  }

  test("partitioned_by_bucket: ranges skip the transform, stats still prune") {
    val t = buildTable("pm_bucket", ("number", BucketTransform(16), "number_bucket"))
    // range predicates cannot project through bucket; the 6 comes from
    // footer stats over the spec-exact murmur3 bucket file grouping
    assertTasks(t, P.gtEq("number", 5), 6)
  }

  test("time transforms agree with driver-side apply() under a non-UTC session zone") {
    // year()/month() on timestamps evaluate in the SESSION zone; the write
    // path must keep UTC semantics or partition tuples disagree with
    // apply()/project() near year boundaries
    val old = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      // 1999-12-31T23:30:00 UTC = 1999 in UTC but already 2000-? no — NY is
      // behind UTC, so pick 2000-01-01T01:00:00 UTC (= 1999-12-31 20:00 NY)
      val microsBoundary = 946688400000000L // 2000-01-01T01:00:00Z
      val df = spark.sql(s"SELECT timestamp_micros(${microsBoundary}L) AS ts")
      val sparkYear = df.select(
        YearTransform.toColumn(org.apache.spark.sql.functions.col("ts"), IceTimestampTz))
        .collect().head.getInt(0)
      val sparkMonth = df.select(
        MonthTransform.toColumn(org.apache.spark.sql.functions.col("ts"), IceTimestampTz))
        .collect().head.getInt(0)
      assert(sparkYear == YearTransform.apply(IceTimestampTz, microsBoundary))
      assert(sparkMonth == MonthTransform.apply(IceTimestampTz, microsBoundary))
      assert(sparkYear == 30) // 2000 - 1970: the UTC year, not New York's 1999
    } finally spark.conf.set("spark.sql.session.timeZone", old)
  }

  test("unpartitioned int identity: all-types-style counts") {
    // mirrors test_all_types (5 single-value files partitioned by intCol)
    val df = spark.range(0, 5).selectExpr("CAST(id AS INT) AS intCol",
      "CAST(id AS DOUBLE) AS doubleCol")
    val schema = SchemaConv.fromSpark(df.schema)
    val t = IceTable.create(catalog, "pm_all_types", schema,
      PartitionSpec.of(0, ("intCol", IdentityTransform, "intCol"))(schema))
    t.append(df)
    assertTasks(t, AlwaysTrue, 5)
    assertTasks(t, P.lt("intCol", 3), 3)
    assertTasks(t, P.gtEq("intCol", 3), 2)
  }

  test("sort-order write prunes a range predicate the unsorted twin cannot") {
    val s = spark
    import s.implicits._
    // same shuffled rows into both twins; the ONLY difference is the
    // table-level sort order, so any planned-file-count gap is the
    // write-time range clustering tightening per-file bounds
    val rows = new scala.util.Random(7).shuffle((0L until 400L).toList)
      .map(k => (k, k * 2))
    val df = rows.toDF("k", "v")
    val schema = SchemaConv.fromSpark(df.schema)
    val order = SortOrder(1, Seq(SortField(schema.idByName("k"), IdentityTransform)))
    // file-size cap, not partition count, decides file boundaries — AQE
    // coalesces the tiny range shuffle to one partition otherwise
    val props = Map("write.max-records-per-file" -> "100")
    val sorted = IceTable.create(catalog, "pm_sorted_twin", schema,
      sortOrder = order, properties = props)
    sorted.append(df)
    val unsorted = IceTable.create(catalog, "pm_unsorted_twin", schema,
      properties = props)
    unsorted.append(df.repartition(4))
    val nS = sorted.newScan().planFiles().size
    val nU = unsorted.newScan().planFiles().size
    assert(nS >= 4 && nU >= 4, s"twins too small to prove pruning: $nS/$nU")
    val pS = sorted.newScan(P.lt("k", 100L)).planFiles().size
    val pU = unsorted.newScan(P.lt("k", 100L)).planFiles().size
    // round-robin files all span [0,400) — stats prune nothing
    assert(pU == nU, s"unsorted twin pruned $pU/$nU — fixture assumption broke")
    // range-clustered files hold disjoint key ranges — most files drop
    assert(pS < pU && pS <= math.max(1, nS / 2),
      s"sorted twin planned $pS of $nS files vs unsorted $pU of $nU")
    // and the pruned scan stays value-exact
    assert(sorted.scan(spark, P.lt("k", 100L)).collect().map(_.getLong(0)).sorted
      .toSeq == (0L until 100L))
  }
}

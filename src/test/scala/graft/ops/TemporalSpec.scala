package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Planted-scenario semantics for the temporal joins (as-of, range) and
  * BM25, plus physical-plan audits of the scale properties they were
  * designed around: the as-of join must be a single-shuffle union+window
  * (never a join operator), the range join must stay equi-keyed (never a
  * nested-loop), and BM25's top-k must be a TakeOrdered, not a global
  * window over the corpus.
  */
class TemporalSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("temporal-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Write an events-shaped fixture table; returns the sf-dir path. */
  private def eventsDir(
      rows: Seq[(Long, String, Long, String, Double, String)]): String = {
    val dir = Files.createTempDirectory("graft-temporal").toString
    val sq = spark
    import sq.implicits._
    rows.map { case (id, t, u, typ, v, p) => (id, ts(t), u, typ, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("as-of join: latest at-or-before click, ties to max event_id, unmatched dropped") {
    val dir = eventsDir(Seq(
      // user 1: two clicks at the SAME instant (tie → max id 11), one later
      (10L, "2024-01-01 10:00:00", 1L, "click", 0.0, "{}"),
      (11L, "2024-01-01 10:00:00", 1L, "click", 0.0, "{}"),
      (12L, "2024-01-01 12:00:00", 1L, "click", 0.0, "{}"),
      (100L, "2024-01-01 09:00:00", 1L, "purchase", 0.0, "{}"), // before any click
      (101L, "2024-01-01 10:00:00", 1L, "purchase", 0.0, "{}"), // same-instant tie
      (102L, "2024-01-01 11:00:00", 1L, "purchase", 0.0, "{}"),
      (103L, "2024-01-01 12:30:00", 1L, "purchase", 0.0, "{}"),
      // user 2: isolation across keys
      (20L, "2024-01-01 10:00:00", 2L, "click", 0.0, "{}"),
      (200L, "2024-01-01 10:30:00", 2L, "purchase", 0.0, "{}"),
      // user 3: purchase with no click at all → dropped
      (300L, "2024-01-01 10:00:00", 3L, "purchase", 0.0, "{}")))
    val got = Temporal.asofJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val h = 3600L * 1000000L
    assert(got.toSeq === Seq(
      (101L, 1L, 11L, 0L),
      (102L, 1L, 11L, h),
      (103L, 1L, 12L, h / 2),
      (200L, 2L, 20L, h / 2)))
  }

  test("as-of join plan: one shuffle on the key, window over a union — no join operator") {
    val p = Temporal.asofJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(user_id".r.findAllIn(p).size >= 1, s"no key shuffle:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"as-of join must cost exactly ONE shuffle:\n$p")
    assert(!p.contains("Join"), s"as-of must not materialize a join:\n$p")
    assert(p.contains("Window"), s"running-last window missing:\n$p")
  }

  test("range join: banded window (p.ts-1h, p.ts], bucket-crossing views, zero-view rows kept") {
    val dir = eventsDir(Seq(
      (100L, "2024-01-01 12:00:00", 1L, "purchase", 0.0, "{}"),
      // boundary exactly p_ts-1h: EXCLUDED (strict >)
      (1L, "2024-01-01 11:00:00", 1L, "view", 100.0, "{}"),
      // 1s inside the window, in the PREVIOUS hour bucket (banding must probe it)
      (2L, "2024-01-01 11:00:01", 1L, "view", 1.5, "{}"),
      (3L, "2024-01-01 11:59:00", 1L, "view", 2.25, "{}"),
      // boundary exactly p_ts: INCLUDED (<=)
      (4L, "2024-01-01 12:00:00", 1L, "view", 3.0, "{}"),
      (5L, "2024-01-01 13:00:00", 1L, "view", 100.0, "{}"), // after → excluded
      (6L, "2024-01-01 11:30:00", 9L, "view", 100.0, "{}"), // other user → excluded
      // user 2: purchase with zero views stays with (0, 0.0)
      (200L, "2024-01-01 12:00:00", 2L, "purchase", 0.0, "{}")))
    val got = Temporal.rangeJoin(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq((100L, 1L, 3L, 6.75), (200L, 2L, 0L, 0.0)))
  }

  test("range join plan: equi-keyed joins only — no nested-loop, no cartesian") {
    val p = Temporal.rangeJoin(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian product:\n$p")
  }

  test("json extract: per-type sums over the props blob") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click", 0.0, """{"k": 3}"""),
      (2L, "2024-01-01 10:00:01", 1L, "click", 0.0, """{"k": 4}"""),
      (3L, "2024-01-01 10:00:02", 1L, "view", 0.0, """{"k": 10}""")))
    val got = SparkEntry.queries("q_events_json_extract")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.toSeq === Seq(("click", 2L, 7L, 3.5), ("view", 1L, 10L, 10.0)))
  }

  test("streaming as-of join: multi-batch state continuity, equality with the batch operator") {
    val sfDir = "/root/testdata/sf0.001"
    val (res, emitted) = StreamingOps.streamedAsofJoin(spark, sfDir)
    assert(emitted.count(_ > 0) >= 2,
      s"state continuity unproven — matches must emit across >=2 micro-batches, got $emitted")
    val got = res.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = Temporal.asofJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want, "streamed as-of diverged from the batch as-of join")
    assert(emitted.sum === want.size.toLong,
      "each purchase must emit exactly once across the stream")
  }

  test("stream-stream range join: watermark evicts state, pairs equal the batch join") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val (res, stateRows, streamedRows) = StreamingOps.streamedRangeJoin(spark, sfDir)
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = QueryDef.t(spark, sfDir, "events")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("u"), col("ts").as("pts"))
    val v = ev.where(col("event_type") === "view")
      .select(col("event_id").as("vid"), col("user_id").as("u2"), col("ts").as("vts"))
    val want = p.join(v, col("u") === col("u2") &&
        col("vts") > col("pts") - expr("INTERVAL 1 HOUR") && col("vts") <= col("pts"))
      .select("pid", "vid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "fixture should contain in-window (purchase, view) pairs")
    assert(got === want, "streamed range join diverged from the batch inequality join")
    // the non-vacuous watermark claim: the final join state holds only the
    // matching horizon, not the stream — a stateless-eviction bug would
    // retain every buffered row
    assert(stateRows >= 0 && stateRows < streamedRows / 4,
      s"join state ($stateRows rows) should be far below the streamed volume ($streamedRows)")
  }

  test("cube: all four grouping sets with sentinel subtotal keys") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0, "{}"),
      (2L, "2024-01-01 10:30:00", 1L, "click", 2.0, "{}"),
      (3L, "2024-01-01 11:00:00", 1L, "view", 4.0, "{}")))
    val got = SparkEntry.queries("q_cube_events")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got === Set(
      ("click", 10, 2L, 3.0), ("view", 11, 1L, 4.0),   // detail
      ("click", -1, 2L, 3.0), ("view", -1, 1L, 4.0),   // by type
      ("ALL", 10, 2L, 3.0), ("ALL", 11, 1L, 4.0),      // by hour
      ("ALL", -1, 3L, 7.0)))                           // grand total
  }

  test("pivot: per-user event-type matrix with zeros for absent combos") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click", 0.0, "{}"),
      (2L, "2024-01-01 10:01:00", 1L, "click", 0.0, "{}"),
      (3L, "2024-01-01 10:02:00", 1L, "view", 0.0, "{}"),
      (4L, "2024-01-01 10:03:00", 2L, "purchase", 0.0, "{}")))
    val got = SparkEntry.queries("q_pivot_events")(spark, dir)
      .collect().map(r => (r.getLong(0),
        (1 to 5).map(r.getLong).toSeq)).sortBy(_._1)
    // columns: click, error, purchase, signup, view
    assert(got.toSeq === Seq(
      (1L, Seq(2L, 0L, 0L, 0L, 1L)),
      (2L, Seq(0L, 0L, 1L, 0L, 0L))))
  }

  test("gap fill: missing hours appear with zero counts across the full span") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:05:00", 1L, "click", 0.0, "{}"),
      // hour 11 has NO events — must still appear with n=0
      (2L, "2024-01-01 12:10:00", 1L, "click", 0.0, "{}"),
      (3L, "2024-01-01 12:20:00", 1L, "view", 0.0, "{}")))
    val got = SparkEntry.queries("q_events_gapfill")(spark, dir)
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    assert(got === Set(
      ("2024-01-01 10:00:00.0", "click", 1L), ("2024-01-01 10:00:00.0", "view", 0L),
      ("2024-01-01 11:00:00.0", "click", 0L), ("2024-01-01 11:00:00.0", "view", 0L),
      ("2024-01-01 12:00:00.0", "click", 1L), ("2024-01-01 12:00:00.0", "view", 1L)))
  }

  test("moving sum: 3-row frame in event-time order per user") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "view", 1.0, "{}"),
      (2L, "2024-01-01 10:01:00", 1L, "view", 2.0, "{}"),
      (3L, "2024-01-01 10:02:00", 1L, "view", 4.0, "{}"),
      (4L, "2024-01-01 10:03:00", 1L, "view", 8.0, "{}"),
      (5L, "2024-01-01 10:00:00", 2L, "view", 16.0, "{}")))
    val got = SparkEntry.queries("q_events_moving_sum")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got === Map(1L -> 1.0, 2L -> 3.0, 3L -> 7.0, 4L -> 14.0, 5L -> 16.0))
  }

  test("set ops: except/intersect cohorts partition the click users") {
    val dir = eventsDir(Seq(
      (1L, "2024-01-01 10:00:00", 1L, "click", 0.0, "{}"),
      (2L, "2024-01-01 10:01:00", 2L, "click", 0.0, "{}"),
      (3L, "2024-01-01 10:02:00", 2L, "purchase", 0.0, "{}"),
      (4L, "2024-01-01 10:03:00", 3L, "purchase", 0.0, "{}")))
    val got = SparkEntry.queries("q_set_ops")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "click_only"), (2L, "both")))
  }

  test("bm25: length normalization, multi-term accumulation, non-matching docs absent") {
    val dir = Files.createTempDirectory("graft-bm25").toString
    val sq = spark
    import sq.implicits._
    Seq(
      (1L, "hash hash hash"),             // tf=3, dl=3
      (2L, "hash hash hash the the the"), // same tf, dl=6 → must score LOWER
      (3L, "hash join"),                  // two distinct query terms
      (4L, "the cat sat"))                // no query term → absent
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("text_bm25_topk")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byDoc = rows.map(r => r._2 -> r).toMap
    assert(!byDoc.contains(4L), "doc without query terms must not appear")
    assert(byDoc(3L)._3 === 2L, "n_terms must count distinct matched query terms")
    assert(byDoc(1L)._4 > byDoc(2L)._4,
      s"longer doc with equal tf must score lower: ${byDoc(1L)} vs ${byDoc(2L)}")
    assert(rows.forall(_._4 > 0.0), "Lucene idf variant keeps scores positive")
    // ranks are dense, ordered by (score desc, doc_id)
    val sorted = rows.sortBy(r => (-r._4, r._2)).map(_._1).toSeq
    assert(sorted === (1 to rows.length).toSeq)
  }

  test("bm25 plan: top-k is a TakeOrdered, not a global corpus window") {
    val p = SparkEntry.queries("text_bm25_topk")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"top-k not TakeOrdered:\n$p")
  }
}

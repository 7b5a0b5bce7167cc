package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal join operators over the events stream — the two classic shapes
  * a time-series analytics engine needs that plain equi-joins can't
  * express, plus the JSON property-extraction scan every event pipeline
  * starts with.
  *
  * Both joins are planned Spark-first for the 100 TB case:
  *
  *   - The AS-OF join never materializes the (probe × build) candidate
  *     set at all: both sides union into ONE stream, shuffle ONCE on the
  *     join key, and a running `last(..., ignoreNulls)` window carries the
  *     most recent build-side row forward in timestamp order. Cost is a
  *     single sort-shuffle of |probe| + |build| rows — the same shape
  *     Structured Streaming's state store would give, and strictly better
  *     than the inequality-join + max-reduction a naive plan (and the SQL
  *     oracle, which exists for correctness not speed) pays.
  *
  *   - The RANGE (interval) join bands the time axis: views are bucketed
  *     to the hour, each purchase probes exactly the two buckets its
  *     1-hour lookback can touch, and the residual range predicate runs
  *     AFTER the (user, bucket) equi-join has bounded the candidates. The
  *     shuffle key is (user_id, bucket) — candidate volume is
  *     per-user-per-hour density, never |purchases| × |views|.
  */
object Temporal {
  import QueryDef.t

  private def events(s: SparkSession, dir: String, typ: String): DataFrame =
    t(s, dir, "events").where(col("event_type") === typ)

  /** AS-OF join: each purchase matched to the SAME USER's latest click at
    * or before the purchase timestamp (ties on ts resolved to the highest
    * click event_id — both engines state the same rule). Unmatched
    * purchases (no prior click) are dropped: inner as-of, so no nullable
    * output column's rendering can diverge between the compare engines.
    */
  private[ops] def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val clicks = events(s, dir, "click").select(
      col("user_id"), col("ts"), lit(0).as("side"), col("event_id"),
      col("event_id").as("c_id"), col("ts").as("c_ts"))
    val purchases = events(s, dir, "purchase").select(
      col("user_id"), col("ts"), lit(1).as("side"), col("event_id"),
      lit(null).cast(LongType).as("c_id"),
      lit(null).cast(TimestampType).as("c_ts"))
    // build rows sort BEFORE probe rows at an equal ts (side 0 < 1), so
    // "at or before" includes same-instant clicks; among equal-ts clicks
    // the running last is the max event_id — the oracle's two-stage max
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("click_id", last(col("c_id"), ignoreNulls = true).over(w))
      .withColumn("click_ts", last(col("c_ts"), ignoreNulls = true).over(w))
      .where(col("side") === 1 && col("click_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts")))
          .cast(LongType).as("lag_us"))
  }

  /** RANGE join: per purchase, the count and value-sum of the same user's
    * views inside the lookback window (p.ts − 1h, p.ts]. Zero-view
    * purchases stay in the output with (0, 0.0) — coalesced, so again no
    * nullable column reaches the compare. `value` sums in exact integer
    * 1e-4 units (the established cross-engine rounding contract) and the
    * final score is one IEEE division.
    */
  private[ops] def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val p = events(s, dir, "purchase").select(
      col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val v = events(s, dir, "view").select(
      col("user_id"), col("ts").as("v_ts"),
      round(col("value") * lit(1e4)).cast(LongType).as("v_micro"))
      .withColumn("bkt", expr(s"unix_micros(v_ts) div $hourUs"))
    // a 1-hour lookback spans at most 2 hour-buckets of the view side
    val probes = p.withColumn("bkt", explode(array(
      expr(s"unix_micros(p_ts) div $hourUs - 1"),
      expr(s"unix_micros(p_ts) div $hourUs"))))
    val matched = probes.join(v, Seq("user_id", "bkt"))
      .where(col("v_ts") > col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("v_ts") <= col("p_ts"))
      .groupBy("purchase_id")
      .agg(count(lit(1)).as("n_views"), sum(col("v_micro")).as("s_micro"))
    p.join(matched, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"),
        coalesce(col("n_views"), lit(0L)).cast(LongType).as("n_views"),
        (coalesce(col("s_micro"), lit(0L)).cast(DoubleType) / lit(10000.0))
          .cast(DoubleType).as("view_value"))
  }

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------ as-of join
    QueryDef(
      "rel_asof_join",
      (s, dir) => asofJoin(s, dir),
      Some("""
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
        c AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'),
        m AS (SELECT p.event_id AS purchase_id, p.user_id, p.ts AS p_ts,
                max(c.ts) AS c_ts
              FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
              GROUP BY 1, 2, 3)
        SELECT m.purchase_id, m.user_id, max(c.event_id) AS click_id,
          CAST(epoch_us(m.p_ts) - epoch_us(m.c_ts) AS BIGINT) AS lag_us
        FROM m JOIN c ON c.user_id = m.user_id AND c.ts = m.c_ts
        GROUP BY m.purchase_id, m.user_id, m.p_ts, m.c_ts""")),

    // ------------------------------------------------------ range join
    QueryDef(
      "rel_range_join",
      (s, dir) => rangeJoin(s, dir),
      Some("""
        WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts
                   FROM events WHERE event_type = 'purchase'),
        v AS (SELECT user_id, ts AS v_ts,
                CAST(round(value * 10000) AS BIGINT) AS v_micro
              FROM events WHERE event_type = 'view'),
        j AS (SELECT p.purchase_id, COUNT(*) AS n_views,
                SUM(v.v_micro) AS s_micro
              FROM p JOIN v ON v.user_id = p.user_id
                AND v.v_ts > p.p_ts - INTERVAL 1 HOUR AND v.v_ts <= p.p_ts
              GROUP BY 1)
        SELECT p.purchase_id, p.user_id,
          CAST(coalesce(j.n_views, 0) AS BIGINT) AS n_views,
          CAST(CAST(coalesce(j.s_micro, 0) AS DOUBLE) / 10000.0 AS DOUBLE)
            AS view_value
        FROM p LEFT JOIN j ON j.purchase_id = p.purchase_id""")),

    // ------------------------------------ JSON property extraction scan
    // events.props is a JSON blob; extract its numeric field and reduce
    // per event_type. The extraction is row-local (codegen'd
    // GetJsonObject — no UDF), the aggregate map-side-combinable; at
    // 100 TB this is a pure scan-shaped pass. avg is one IEEE division
    // of two exact integers.
    QueryDef(
      "q_events_json_extract",
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(LongType).as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"))
        .select(col("event_type"), col("n").cast(LongType).as("n"),
          col("sum_k").cast(LongType).as("sum_k"),
          (col("sum_k").cast(DoubleType) / col("n").cast(DoubleType))
            .as("avg_k")),
      Some("""
        SELECT event_type,
          CAST(COUNT(k) AS BIGINT) AS n,
          CAST(SUM(k) AS BIGINT) AS sum_k,
          CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k
        FROM (SELECT event_type,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY event_type""")),

    // -------------------------------------------------------- CUBE agg
    // Full grouping-sets lattice over (event_type, hour) — the OLAP
    // subtotal shape q_rollup_returns covers only the prefix-hierarchy
    // of. Subtotal rows surface as sentinel values ('ALL' / -1), not
    // nulls, so no engine's null rendering reaches the compare; value
    // sums in exact 1e-4 integer units. One shuffle; Spark expands the
    // 4 grouping sets map-side.
    QueryDef(
      "q_cube_events",
      (s, dir) => t(s, dir, "events")
        .select(col("event_type"), hour(col("ts")).as("hr"),
          round(col("value") * lit(1e4)).cast(LongType).as("v_micro"))
        .cube(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"), sum(col("v_micro")).as("s_micro"))
        .select(
          coalesce(col("event_type"), lit("ALL")).as("event_type"),
          coalesce(col("hr"), lit(-1)).cast(IntegerType).as("hr"),
          col("n").cast(LongType).as("n"),
          (col("s_micro").cast(DoubleType) / lit(10000.0)).as("total_value")),
      Some("""
        SELECT coalesce(event_type, 'ALL') AS event_type,
          CAST(coalesce(hr, -1) AS INTEGER) AS hr,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(v_micro) AS DOUBLE) / 10000.0 AS total_value
        FROM (SELECT event_type, CAST(hour(ts) AS INTEGER) AS hr,
                CAST(round(value * 10000) AS BIGINT) AS v_micro
              FROM events)
        GROUP BY CUBE (event_type, hr)""")),

    // ------------------------------------------------------- PIVOT agg
    // Per-user event-type matrix — the wide-format reshape every
    // feature-engineering pass ships. Spark's relational pivot with the
    // value list PINNED (no dictionary-discovery scan) compiles to one
    // groupBy(user_id) with 5 conditional aggregates — single shuffle,
    // map-side combinable, exactly the oracle's CASE restatement.
    QueryDef(
      "q_pivot_events",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val pivoted = t(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", types)
          .agg(count(lit(1)))
        pivoted.select(col("user_id") +:
          types.map(tp => coalesce(col(tp), lit(0L)).cast(LongType).as(tp)): _*)
      },
      Some("""
        SELECT user_id,
          CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
          CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
          CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
          CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
        FROM events GROUP BY user_id""")),

    // -------------------------------------------------- gap-filled series
    // Hourly event counts with MISSING HOURS FILLED with zeros over the
    // corpus's [min, max] hour span — the densification every monitoring /
    // time-series consumer needs before windowed math. The hour spine is
    // generated from the 1-row min/max aggregate (sequence + explode —
    // driver never loops), cross-joined with the 5 event types, and the
    // real counts LEFT-join onto it: the spine is |hours|x|types| rows
    // (tiny), the only corpus-keyed work is the count aggregate itself.
    QueryDef(
      "q_events_gapfill",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .select(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        val counts = ev.groupBy("hour", "event_type").agg(count(lit(1)).as("n"))
        val span = ev.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        val hours = span.select(explode(
          expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
        val types = ev.select("event_type").distinct()
        hours.crossJoin(broadcast(types))
          .join(counts, Seq("hour", "event_type"), "left")
          .select(col("hour"), col("event_type"),
            coalesce(col("n"), lit(0L)).cast(LongType).as("n"))
      },
      Some("""
        WITH e AS (SELECT date_trunc('hour', ts) AS hour, event_type FROM events),
        counts AS (SELECT hour, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2),
        spine AS (SELECT unnest(generate_series(
            (SELECT min(hour) FROM e), (SELECT max(hour) FROM e),
            INTERVAL 1 HOUR)) AS hour),
        types AS (SELECT DISTINCT event_type FROM e)
        SELECT s.hour, t.event_type,
          CAST(coalesce(c.n, 0) AS BIGINT) AS n
        FROM spine s CROSS JOIN types t
        LEFT JOIN counts c ON c.hour = s.hour AND c.event_type = t.event_type""")),

    // ------------------------------------------------ sliding-frame agg
    // Per-user 3-event moving sum of value in event-time order — the
    // rows-frame window family (sliding aggregates) no other query
    // exercises. Values sum in exact 1e-4 integer units inside the frame,
    // so the frame reduction is order-free and cross-engine exact; one
    // shuffle on user_id, frames evaluated in the per-key sort.
    QueryDef(
      "q_events_moving_sum",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
        t(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("ts"),
            round(col("value") * lit(1e4)).cast(LongType).as("v_micro"))
          .withColumn("mv", sum(col("v_micro")).over(w))
          .select(col("event_id"), col("user_id"),
            (col("mv").cast(DoubleType) / lit(10000.0)).as("moving_value"))
      },
      Some("""
        SELECT event_id, user_id,
          CAST(SUM(v_micro) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 10000.0
            AS moving_value
        FROM (SELECT event_id, user_id, ts,
                CAST(round(value * 10000) AS BIGINT) AS v_micro
              FROM events)""")),

    // --------------------------------------------------- set operations
    // EXCEPT / INTERSECT cohort analysis — the set-operator family no
    // other registered query exercises. Both compile to distinct +
    // left-anti / left-semi hash joins on the (small, post-distinct) key
    // sets; at 100 TB the distincts are the only corpus-keyed shuffles.
    QueryDef(
      "q_set_ops",
      (s, dir) => {
        def users(typ: String) = t(s, dir, "events")
          .where(col("event_type") === typ).select("user_id").distinct()
        val clicks = users("click"); val buys = users("purchase")
        clicks.except(buys).withColumn("cohort", lit("click_only"))
          .unionByName(clicks.intersect(buys).withColumn("cohort", lit("both")))
          .select(col("user_id"), col("cohort"))
      },
      Some("""
        SELECT user_id, 'click_only' AS cohort FROM (
          SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
          EXCEPT
          SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        UNION ALL
        SELECT user_id, 'both' AS cohort FROM (
          SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
          INTERSECT
          SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')"""))
  )
}

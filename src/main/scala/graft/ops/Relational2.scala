package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second batch of relational operators: conditional aggregation,
  * disjunctive predicate pushdown, HAVING over join, the SQL-text surface,
  * and an explicitly salted two-stage aggregation (the skew pattern).
  */
object Relational2 {
  import QueryDef.t

  private val d38_6 = DecimalType(38, 6)

  private def discPrice =
    col("l_extendedprice").cast(DecimalType(14, 2)) *
      (lit(1.0) - col("l_discount")).cast(DecimalType(8, 4))

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------- q12: CASE aggregation
    QueryDef(
      "q12_shipmode_priority",
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .where(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
          .groupBy("l_linestatus")
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_line_count"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("low_line_count"))
          .select("l_linestatus", "high_line_count", "low_line_count"),
      Some("""
        SELECT l_linestatus,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem, orders
        WHERE l_orderkey = o_orderkey
          AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus""")),

    // ------------------------------------------- q14: conditional ratio
    QueryDef(
      "q14_promo_revenue",
      (s, dir) => {
        val part = t(s, dir, "part")
        t(s, dir, "lineitem")
          .where(col("l_shipdate") >= lit("1997-06-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1997-07-01").cast(TimestampType))
          .join(part, col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type").startsWith("PROMO"), discPrice)
              .otherwise(lit(0).cast(DecimalType(14, 2)))).cast(d38_6)
              .cast(DoubleType).as("promo_revenue"),
            sum(discPrice).cast(d38_6).cast(DoubleType).as("total_revenue"))
          .select("promo_revenue", "total_revenue")
      },
      Some("""
        SELECT
          CAST(CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
            THEN CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(8,4))
            ELSE CAST(0 AS DECIMAL(14,2)) END) AS DECIMAL(38,6)) AS DOUBLE) AS promo_revenue,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01'""")),

    // ------------------------------- q18: HAVING + semi join on aggregate
    QueryDef(
      "q18_large_orders",
      (s, dir) => {
        val big = t(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).as("sum_qty"))
          .where(col("sum_qty") > 150)
        t(s, dir, "orders")
          .join(big, col("o_orderkey") === big("l_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"),
            col("sum_qty").cast(DecimalType(38, 2)).cast(DoubleType).as("total_qty"))
      },
      Some("""
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
          CAST(CAST(sub.sum_qty AS DECIMAL(38,2)) AS DOUBLE) AS total_qty
        FROM orders, customer,
          (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
           FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150) sub
        WHERE o_orderkey = sub.l_orderkey AND o_custkey = c_custkey""")),

    // --------------------- q19: disjunctive predicates (OR-of-AND pushdown)
    QueryDef(
      "q19_disjunctive",
      (s, dir) => {
        val part = t(s, dir, "part")
        t(s, dir, "lineitem")
          .join(part, col("l_partkey") === col("p_partkey"))
          .where(
            (col("p_brand") === "Brand#1" && col("l_quantity").between(1, 11) &&
              col("p_size").between(1, 5)) ||
            (col("p_brand") === "Brand#2" && col("l_quantity").between(10, 20) &&
              col("p_size").between(1, 10)) ||
            (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30) &&
              col("p_size").between(1, 15)))
          .agg(sum(discPrice).cast(d38_6).cast(DoubleType).as("revenue"))
      },
      Some("""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey AND (
          (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5) OR
          (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10) OR
          (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15))""")),

    // ---------------------- q17: decorrelated scalar-subquery aggregate
    QueryDef(
      "q17_small_quantity",
      (s, dir) => {
        // per-part threshold = 0.5 * avg(quantity), computed as exact
        // decimal sum → one IEEE division → deterministic across engines
        val li = t(s, dir, "lineitem")
        val thresholds = li.groupBy(col("l_partkey").as("t_partkey"))
          .agg(((sum(col("l_quantity").cast(DecimalType(12, 2))).cast(DoubleType) /
            count(lit(1))) * 0.5).as("threshold"))
        li.join(t(s, dir, "part").where(col("p_brand") === "Brand#5"),
            col("l_partkey") === col("p_partkey"))
          .join(thresholds, col("l_partkey") === col("t_partkey"))
          .where(col("l_quantity") < col("threshold"))
          .agg(
            sum(col("l_extendedprice").cast(DecimalType(14, 2)))
              .cast(DecimalType(38, 2)).cast(DoubleType).as("total_price"),
            count(lit(1)).as("n_rows"))
      },
      Some("""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_price,
          CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem, part,
          (SELECT l_partkey AS t_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) * 0.5 AS threshold
           FROM lineitem GROUP BY l_partkey) th
        WHERE l_partkey = p_partkey AND p_brand = 'Brand#5'
          AND l_partkey = th.t_partkey AND l_quantity < th.threshold""")),

    // -------------------------------------------- ROLLUP / grouping sets
    QueryDef(
      "q_rollup_returns",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_quantity").cast(DecimalType(12, 2)))
              .cast(DecimalType(38, 2)).cast(DoubleType).as("sum_qty"))
          .select("l_returnflag", "l_linestatus", "n_rows", "sum_qty"),
      Some("""
        SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    // --------------------------------------------------- SQL-text surface
    QueryDef(
      "q_sql_interface",
      (s, dir) => {
        t(s, dir, "nation").createOrReplaceTempView("v_nation")
        t(s, dir, "region").createOrReplaceTempView("v_region")
        s.sql("""
          SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations
          FROM v_nation JOIN v_region ON n_regionkey = r_regionkey
          GROUP BY r_name""")
      },
      Some("""
        SELECT r_name, CAST(COUNT(*) AS BIGINT) AS n_nations
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name""")),

    // ---------------------- sessionization (gap-based, window functions)
    QueryDef(
      "q_sessionize",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        // a 30-minute silence starts a new session; session index is the
        // running count of boundaries — one shuffle on user_id, all window
        val events = t(s, dir, "events")
        events
          .withColumn("prev_ts", lag("ts", 1).over(byUser))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("session_idx", sum("new_session").over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            min("ts").as("session_start"),
            max("ts").as("session_end"))
          .select("user_id", "session_idx", "n_events", "session_start", "session_end")
      },
      Some("""
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(MIN(ts) AS TIMESTAMP) AS session_start,
          CAST(MAX(ts) AS TIMESTAMP) AS session_end
        FROM (
          SELECT user_id, ts,
            SUM(CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
              THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
          FROM (
            SELECT user_id, event_id, ts,
              lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events) t1) t2
        GROUP BY user_id, session_idx""")),

    // ------------------------- salted two-stage aggregation (skew pattern)
    QueryDef(
      "q_salted_user_totals",
      (s, dir) => {
        // stage 1: aggregate on (user_id, salt) — a skewed user's rows
        // spread over 8 reducers; stage 2: fold the partials. The result
        // is identical to a direct groupBy, which the oracle checks.
        val salted = t(s, dir, "events")
          .withColumn("salt", pmod(hash(col("event_id")), lit(8)))
          .groupBy("user_id", "salt")
          .agg(count(lit(1)).as("pn"),
            sum(col("value").cast(DecimalType(18, 4))).as("pv"))
        salted.groupBy("user_id")
          .agg(sum(col("pn")).as("n_events"),
            sum(col("pv")).cast(DecimalType(38, 4)).cast(DoubleType).as("total_value"))
          .select("user_id", "n_events", "total_value")
      },
      Some("""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total_value
        FROM events GROUP BY user_id"""))
  )
}

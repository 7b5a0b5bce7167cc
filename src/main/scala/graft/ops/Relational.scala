package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator surface: scan+filter+project, aggregation, inner /
  * semi / anti joins, multi-way star joins (dimensions broadcast), window
  * functions, top-n, set ops — all declared with the DataFrame API so
  * Catalyst handles pushdown, pruning, and join planning.
  *
  * Scale notes (100 TB design):
  *   - only genuinely fixed-size inputs (region/nation, single-row
  *     aggregates) carry explicit broadcast() hints. SF-scaling tables
  *     (customer/supplier/part and their filtered slices) are left
  *     unhinted so AQE size-gates broadcast vs shuffled-hash at runtime —
  *     an explicit hint on a scaling table is honored regardless of size
  *     and becomes a driver-OOM at 100×;
  *   - fact-fact joins (orders⋈lineitem) shuffle on the join key, which is
  *     the natural co-partitioning key at scale (bucketing both tables on
  *     orderkey removes even that);
  *   - aggregations are partial (map-side combine) by construction, since
  *     groupBy on a DataFrame plans HashAggregate(partial) → exchange →
  *     HashAggregate(final);
  *   - no collect()/driver loops anywhere.
  */
object Relational {
  import QueryDef.t

  private val d38_2 = DecimalType(38, 2)
  private val d38_6 = DecimalType(38, 6)

  /** l_extendedprice * (1 - l_discount) with decimal-exact arithmetic. */
  private def discPrice: Column =
    col("l_extendedprice").cast(DecimalType(14, 2)) *
      (lit(1.0) - col("l_discount")).cast(DecimalType(8, 4))

  val defs: Seq[QueryDef] = Seq(
    // ---------------------------------------------------------------- q1
    QueryDef(
      "q1_pricing_summary",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast(DecimalType(12, 2))).cast(d38_2)
              .cast(DoubleType).as("sum_qty"),
            sum(col("l_extendedprice").cast(DecimalType(14, 2))).cast(d38_2)
              .cast(DoubleType).as("sum_base_price"),
            sum(discPrice).cast(d38_6).cast(DoubleType).as("sum_disc_price"),
            count(lit(1)).as("count_order"),
            (sum(col("l_quantity").cast(DecimalType(12, 2))).cast(DoubleType) /
              count(lit(1))).cast(DoubleType).as("avg_qty"))
          .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
            "sum_disc_price", "count_order", "avg_qty"),
      Some("""
        SELECT l_returnflag, l_linestatus,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_base_price,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
          CAST(COUNT(*) AS BIGINT) AS count_order,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty
        FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    // ---------------------------------------------------------------- q6
    QueryDef(
      "q6_revenue_forecast",
      (s, dir) =>
        t(s, dir, "lineitem")
          .where(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
            col("l_discount").between(0.04, 0.08) && col("l_quantity") < 24)
          .agg(sum(col("l_extendedprice").cast(DecimalType(14, 2)) *
            col("l_discount").cast(DecimalType(8, 4))).cast(d38_6)
            .cast(DoubleType).as("revenue")),
      Some("""
        SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(l_discount AS DECIMAL(8,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 24""")),

    // ---------------------------------------------------------------- q3
    QueryDef(
      "q3_shipping_priority",
      (s, dir) => {
        val cust = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        val ord = t(s, dir, "orders")
          .where(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
        val li = t(s, dir, "lineitem")
          .where(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
          .agg(sum(discPrice).cast(d38_6).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
          .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      },
      Some("""
        SELECT l_orderkey,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
          o_orderdate, o_orderpriority
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ---------------------------------------------------------------- q5
    QueryDef(
      "q5_region_revenue",
      (s, dir) => {
        val region = t(s, dir, "region").where(col("r_name") === "ASIA")
        val nation = t(s, dir, "nation")
        val supplier = t(s, dir, "supplier")
        val ord = t(s, dir, "orders")
          .where(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
        t(s, dir, "lineitem")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(supplier,
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .groupBy("n_name")
          .agg(sum(discPrice).cast(d38_6).cast(DoubleType).as("revenue"))
      },
      Some("""
        SELECT n_name,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name""")),

    // ---------------------------------------------------------------- q4 (semi join)
    QueryDef(
      "q4_order_priority",
      (s, dir) => {
        val ord = t(s, dir, "orders")
          .where(col("o_orderdate") >= lit("1996-07-01").cast(TimestampType) &&
            col("o_orderdate") < lit("1996-10-01").cast(TimestampType))
        ord.join(t(s, dir, "lineitem"),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY o_orderpriority""")),

    // ---------------------------------------------------------------- q10 (top-n over join)
    QueryDef(
      "q10_returned_items",
      (s, dir) => {
        val nation = t(s, dir, "nation")
        t(s, dir, "lineitem").where(col("l_returnflag") === "R")
          .join(t(s, dir, "orders")
              .where(col("o_orderdate") >= lit("1997-01-01").cast(TimestampType) &&
                col("o_orderdate") < lit("1997-04-01").cast(TimestampType)),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
          .agg(sum(discPrice).cast(d38_6).cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
          .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
      },
      Some("""
        SELECT c_custkey, c_name,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue,
          c_acctbal, n_name
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // --------------- q9-ish (star join; AQE size-gates the dim joins)
    QueryDef(
      "q9_brand_nation_revenue",
      (s, dir) => {
        val part = t(s, dir, "part").where(col("p_size") <= 10)
        val supplier = t(s, dir, "supplier")
        val nation = t(s, dir, "nation")
        t(s, dir, "lineitem")
          .join(part, col("l_partkey") === col("p_partkey"))
          .join(supplier, col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .groupBy("n_name", "p_brand")
          .agg(sum(discPrice).cast(d38_6).cast(DoubleType).as("revenue"))
      },
      Some("""
        SELECT n_name, p_brand,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM lineitem, part, supplier, nation
        WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND p_size <= 10
        GROUP BY n_name, p_brand""")),

    // ---------------------------------------------------------------- window / rank
    QueryDef(
      "q_window_top_customers",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(col("c_acctbal").desc, col("c_custkey"))
        t(s, dir, "customer")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal", "rn")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment, c_acctbal, rn FROM (
          SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
            CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn
          FROM customer) sub
        WHERE rn <= 3""")),

    // ---------------------------------------------------------------- anti join
    QueryDef(
      "q_customers_without_orders",
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders")
              .where(col("o_orderdate") >= lit("1995-01-01").cast(TimestampType) &&
                col("o_orderdate") < lit("1996-01-01").cast(TimestampType)),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name"),
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01')""")),

    // ---------------------------------------------------------------- scan + filter + project (pushdown showcase)
    QueryDef(
      "q_scan_filter_project",
      (s, dir) =>
        t(s, dir, "lineitem")
          .where(col("l_shipdate") >= lit("2001-01-01").cast(TimestampType))
          .select("l_orderkey", "l_linenumber", "l_extendedprice"),
      Some("""
        SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '2001-01-01'""")),

    // ---------------------------------------------------------------- events: time-bucketed aggregation
    QueryDef(
      "q_events_hourly",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 4))).cast(DecimalType(38, 4))
              .cast(DoubleType).as("total_value"))
          .select("hour", "event_type", "n_events", "total_value"),
      Some("""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
          CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2""")),

    // ---------------------------------------------------------------- events: sessionless per-user stats
    QueryDef(
      "q_events_user_stats",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy("user_id")
          .agg(
            count(lit(1)).as("n_events"),
            countDistinct(col("event_type")).as("n_types"),
            max(col("ts")).as("last_ts"))
          .where(col("n_events") >= 5)
          .select("user_id", "n_events", "n_types", "last_ts"),
      Some("""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
          CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
          CAST(MAX(ts) AS TIMESTAMP) AS last_ts
        FROM events GROUP BY user_id HAVING COUNT(*) >= 5"""))
  )
}

package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Third relational batch — the TPC-H shapes the first two batches don't
  * cover: outer-join distributions (q13), NOT-IN anti semantics (q16),
  * bi-directional multi-dimension join conditions (q7), and a scalar
  * subquery threshold combined with an anti join (q22). All follow the
  * QueryDef determinism contract (no DECIMAL outputs, BIGINT counts,
  * decimal-exact sums cast to DOUBLE).
  */
object Relational3 {
  import QueryDef.t

  private val d38_6 = DecimalType(38, 6)

  private def discPrice =
    col("l_extendedprice").cast(DecimalType(14, 2)) *
      (lit(1.0) - col("l_discount")).cast(DecimalType(8, 4))

  val defs: Seq[QueryDef] = Seq(
    // ------------------- q13: LEFT OUTER JOIN + two-level aggregation
    QueryDef(
      "q13_customer_distribution",
      (s, dir) => {
        val perCustomer = t(s, dir, "customer")
          .join(t(s, dir, "orders")
              .where(col("o_orderpriority") =!= "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count")) // count() skips nulls
        perCustomer.groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .select("c_count", "custdist")
      },
      Some("""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
          SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) per_cust
        GROUP BY c_count""")),

    // ---------------------- q16-ish: NOT IN subquery (anti join) +
    // count-distinct per group (no partsupp table; lineitem links them)
    QueryDef(
      "q16_supplier_variety",
      (s, dir) => {
        val badSuppliers = t(s, dir, "supplier")
          .where(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        t(s, dir, "lineitem")
          .join(t(s, dir, "part").where(col("p_brand") =!= "Brand#1"),
            col("l_partkey") === col("p_partkey"))
          .join(badSuppliers,
            col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy("p_brand", "p_size")
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .select("p_brand", "p_size", "supplier_cnt")
      },
      Some("""
        SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem, part
        WHERE l_partkey = p_partkey AND p_brand <> 'Brand#1'
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size""")),

    // -------------- q7: volume shipping between two nations, either way
    QueryDef(
      "q7_volume_shipping",
      (s, dir) => {
        val sn = t(s, dir, "nation")
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val cn = t(s, dir, "nation")
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        t(s, dir, "lineitem")
          .where(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
          .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
          .where((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
            (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(sum(discPrice).cast(d38_6).cast(DoubleType).as("revenue"))
          .select("supp_nation", "cust_nation", "l_year", "revenue")
      },
      Some("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS INTEGER) AS l_year,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
        FROM lineitem, orders, customer, supplier, nation n1, nation n2
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') OR
               (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        GROUP BY 1, 2, 3""")),

    // ------- q22-ish: scalar-subquery threshold + anti join (no orders)
    QueryDef(
      "q22_idle_balances",
      (s, dir) => {
        val cust = t(s, dir, "customer")
        // exact decimal sum → one IEEE division = deterministic threshold
        val threshold = cust.where(col("c_acctbal") > 0)
          .agg((sum(col("c_acctbal").cast(DecimalType(14, 2))).cast(DoubleType) /
            count(lit(1))).as("thr"))
        cust.crossJoin(broadcast(threshold))
          .where(col("c_acctbal") > col("thr"))
          .join(t(s, dir, "orders")
              .where(col("o_orderdate") >= lit("1998-09-01").cast(TimestampType)),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("numcust"),
            sum(col("c_acctbal").cast(DecimalType(14, 2)))
              .cast(DecimalType(38, 2)).cast(DoubleType).as("totacctbal"))
          .select("c_mktsegment", "numcust", "totacctbal")
      },
      Some("""
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
          CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DECIMAL(38,2)) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1998-09-01')
        GROUP BY c_mktsegment""")),

    // ------------ q8: national market share — a ratio of conditional sums
    // over a five-table join; both sums decimal-exact then ONE IEEE division
    QueryDef(
      "q8_market_share",
      (s, dir) => {
        val asiaNations = t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").where(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as("c_nk"))
        t(s, dir, "lineitem")
          .join(t(s, dir, "part").where(col("p_type") === "STANDARD"),
            col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders")
              .where(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
                col("o_orderdate") < lit("1998-01-01").cast(TimestampType)),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(asiaNations), col("c_nationkey") === col("c_nk"), "left_semi")
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            sum(when(col("s_nationkey") === 5, discPrice)
              .otherwise(lit(0).cast(DecimalType(14, 2)))).cast(d38_6)
              .cast(DoubleType).as("nation_volume"),
            sum(discPrice).cast(d38_6).cast(DoubleType).as("total_volume"))
          .select(col("o_year"),
            (col("nation_volume") / col("total_volume")).as("mkt_share"))
      },
      Some("""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
          CAST(CAST(SUM(CASE WHEN s_nationkey = 5
              THEN CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(8,4))
              ELSE CAST(0 AS DECIMAL(14,2)) END) AS DECIMAL(38,6)) AS DOUBLE) /
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * CAST(1 - l_discount AS DECIMAL(8,4)))
            AS DECIMAL(38,6)) AS DOUBLE) AS mkt_share
        FROM lineitem, part, orders, customer, supplier, nation, region
        WHERE l_partkey = p_partkey AND p_type = 'STANDARD'
          AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
          AND o_custkey = c_custkey AND c_nationkey = n_nationkey
          AND n_regionkey = r_regionkey AND r_name = 'ASIA'
          AND l_suppkey = s_suppkey
        GROUP BY 1""")),

    // -------- q15: top supplier by revenue — the view + scalar-max shape.
    // The max is matched on DOUBLE values computed identically on both
    // engines (decimal-exact sum cast once), so the equality is exact
    QueryDef(
      "q15_top_supplier",
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .where(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
          .groupBy("l_suppkey")
          .agg(sum(discPrice).cast(d38_6).cast(DoubleType).as("total_revenue"))
        val mx = rev.agg(max(col("total_revenue")).as("mx"))
        rev.crossJoin(broadcast(mx))
          .where(col("total_revenue") === col("mx"))
          .join(t(s, dir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      },
      Some("""
        WITH rev AS (
          SELECT l_suppkey,
            CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2)) *
              CAST(1 - l_discount AS DECIMAL(8,4))) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier, rev
        WHERE s_suppkey = l_suppkey
          AND total_revenue = (SELECT MAX(total_revenue) FROM rev)""")),

    // -------- q21-ish: correlated EXISTS + NOT EXISTS self-joins (the data
    // has no l_receiptdate/l_commitdate, so "kept waiting" is re-expressed
    // with l_returnflag: suppliers who were the ONLY supplier with returned
    // items in a multi-supplier finalized order). Top-n has a unique
    // tiebreak (s_name)
    QueryDef(
      "q21_sole_blame",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val l1 = li.where(col("l_returnflag") === "R")
          .select("l_orderkey", "l_suppkey")
        val others = li.select(col("l_orderkey").as("lo2"), col("l_suppkey").as("ls2"))
        val othersR = li.where(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("lo3"), col("l_suppkey").as("ls3"))
        l1
          .join(others,
            col("l_orderkey") === col("lo2") && col("l_suppkey") =!= col("ls2"),
            "left_semi")
          .join(othersR,
            col("l_orderkey") === col("lo3") && col("l_suppkey") =!= col("ls3"),
            "left_anti")
          .join(t(s, dir, "orders").where(col("o_orderstatus") === "F")
              .select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_semi")
          .join(t(s, dir, "supplier").where(col("s_nationkey") === 3),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      },
      Some("""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F' AND l1.l_returnflag = 'R' AND s_nationkey = 3
          AND EXISTS (SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
              AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20"""))
  )
}

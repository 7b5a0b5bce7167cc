package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The partsupp-shaped TPC-H queries (q2 / q11 / q20) — the last classic
  * relational shapes absent from the board: a correlated scalar-subquery
  * minimum, group-by-having against a global aggregate, and exists-with-
  * nested-aggregate.
  *
  * The driver testdata carries no partsupp table, so BOTH engines derive
  * the identical relation from part × supplier with pure integer
  * arithmetic ([[partsupp]] here, the `ps` CTE in each oracle): 4
  * suppliers per part via the TPC-H stride formula adapted to 0-based
  * keys, integer availqty, and supply cost in integer CENTS so every
  * aggregate below stays exact (no decimal/double drift can exist).
  *
  * Scale notes: partsupp derives from part (a dimension) — at 100 TB it
  * would be a real table bucketed by ps_partkey; every plan below keeps
  * the fact-side work shuffled on (partkey[, suppkey]). Only fixed-size
  * inputs (nation/region, one-row totals) carry explicit broadcast()
  * hints; supplier/part-derived frames scale with SF and are left
  * unhinted so AQE size-gates the join strategy.
  */
object Relational4 {
  import QueryDef.t

  /** Deterministic partsupp: (ps_partkey, ps_suppkey, ps_availqty,
    * ps_supplycost_cents), 4 rows per part. Stride suppkey assignment
    * (TPC-H 4.2.3 shape, 0-based) with the stride folded into
    * [1, (S-1) div 3]: with i in 0..3, i·stride then stays strictly below
    * S and strictly increasing, so the 4 suppkeys are distinct for EVERY
    * part — the raw TPC-H stride (S div 4 + p div S) only guarantees that
    * when P/S stays in TPC-H's own regime, and at the testdata's S=10 it
    * reaches multiples of S, collapsing all 4 rows onto one supplier.
    * Requires S ≥ 4 (testdata minimum is 10).
    */
  private[ops] def partsupp(s: SparkSession, dir: String): DataFrame = {
    val part = t(s, dir, "part").select(col("p_partkey"))
    val sCnt = t(s, dir, "supplier").agg(count(lit(1)).as("s_cnt"))
    part.crossJoin(broadcast(sCnt))
      .select(col("p_partkey").as("ps_partkey"), col("s_cnt"),
        explode(sequence(lit(0L), lit(3L))).as("i"))
      .select(
        col("ps_partkey"),
        ((col("ps_partkey") + col("i") *
          ((expr("s_cnt div 4") + expr("ps_partkey div s_cnt"))
            % expr("(s_cnt - 1) div 3") + 1)) % col("s_cnt"))
          .as("ps_suppkey"),
        ((col("ps_partkey") * 7 + col("i") * 13) % 9999 + 1)
          .cast(LongType).as("ps_availqty"),
        ((col("ps_partkey") * 31 + col("i") * 17) % 100000 + 100)
          .cast(LongType).as("ps_supplycost_cents"))
  }

  /** The identical derivation as a DuckDB CTE (shared by all three oracles). */
  private val psCte: String = """
ps AS (
  SELECT p_partkey AS ps_partkey,
    (p_partkey + u.i * ((sc.s_cnt // 4 + p_partkey // sc.s_cnt)
        % ((sc.s_cnt - 1) // 3) + 1)) % sc.s_cnt
      AS ps_suppkey,
    CAST((p_partkey * 7 + u.i * 13) % 9999 + 1 AS BIGINT) AS ps_availqty,
    CAST((p_partkey * 31 + u.i * 17) % 100000 + 100 AS BIGINT)
      AS ps_supplycost_cents
  FROM part, (SELECT COUNT(*) AS s_cnt FROM supplier) sc,
    unnest([0,1,2,3]) AS u(i))"""

  val defs: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------- q2
    // Minimum-cost supplier per part within a region — the correlated
    // scalar-subquery MIN, planned Spark-first as a per-part min aggregate
    // joined back (no correlated re-execution; one partkey-keyed shuffle).
    // The supplier→nation→region dimension chain broadcasts.
    QueryDef(
      "q2_min_cost_supplier",
      (s, dir) => {
        val ps = partsupp(s, dir)
        val regionSupp = t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation")
            .join(broadcast(t(s, dir, "region").where(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_acctbal"), col("n_name"))
        val psReg = ps.join(regionSupp,
          col("ps_suppkey") === col("s_suppkey"))
        val minCost = psReg.groupBy("ps_partkey")
          .agg(min("ps_supplycost_cents").as("min_cost"))
        psReg
          .join(t(s, dir, "part").where(col("p_type") === "STANDARD")
            .select(col("p_partkey")),
            col("ps_partkey") === col("p_partkey"))
          .join(minCost, "ps_partkey")
          .where(col("ps_supplycost_cents") === col("min_cost"))
          .select(col("p_partkey"), col("s_suppkey"), col("n_name"),
            col("s_acctbal"), col("ps_supplycost_cents"))
      },
      Some(s"""
        WITH $psCte
        SELECT p.p_partkey, s.s_suppkey, n.n_name, s.s_acctbal,
          ps.ps_supplycost_cents
        FROM part p, supplier s, nation n, region r, ps
        WHERE p.p_partkey = ps.ps_partkey AND s.s_suppkey = ps.ps_suppkey
          AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
          AND r.r_name = 'EUROPE' AND p.p_type = 'STANDARD'
          AND ps.ps_supplycost_cents = (
            SELECT MIN(ps2.ps_supplycost_cents)
            FROM ps ps2, supplier s2, nation n2, region r2
            WHERE ps2.ps_partkey = p.p_partkey
              AND s2.s_suppkey = ps2.ps_suppkey
              AND s2.s_nationkey = n2.n_nationkey
              AND n2.n_regionkey = r2.r_regionkey
              AND r2.r_name = 'EUROPE')""")),

    // ------------------------------------------------------------- q11
    // Important-stock identification: per-part inventory value over one
    // nation's suppliers, kept where the part's share exceeds 1/400 of the
    // total — group-by-having against a GLOBAL aggregate. The comparison is
    // scaled-integer (value·400 > total), so no fraction ever exists as a
    // float; the one-row total broadcasts back over the per-part frame.
    QueryDef(
      "q11_important_stock",
      (s, dir) => {
        val natSupp = t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation").where(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        val perPart = partsupp(s, dir)
          .join(natSupp, col("ps_suppkey") === col("s_suppkey"))
          .groupBy("ps_partkey")
          .agg(sum(col("ps_supplycost_cents") * col("ps_availqty"))
            .as("value_cents"))
        val total = perPart.agg(sum("value_cents").as("total_cents"))
        perPart.crossJoin(broadcast(total))
          .where(col("value_cents") * 400 > col("total_cents"))
          .select(col("ps_partkey"), col("value_cents"))
      },
      Some(s"""
        WITH $psCte,
        pp AS (
          SELECT ps_partkey,
            CAST(SUM(ps_supplycost_cents * ps_availqty) AS BIGINT) AS value_cents
          FROM ps, supplier s, nation n
          WHERE ps.ps_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
            AND n.n_name = 'NATION_3'
          GROUP BY ps_partkey)
        SELECT ps_partkey, value_cents FROM pp
        WHERE value_cents * 400 > (SELECT SUM(value_cents) FROM pp)""")),

    // ------------------------------------------------------------- q20
    // Excess-stock suppliers: a nation's suppliers holding partsupp rows
    // (over 'small%' parts) whose availqty exceeds half the 1997 shipped
    // quantity — EXISTS with a nested aggregate. Spark-first: the nested
    // per-(part,supp) shipped sum is one decimal-exact aggregate of the
    // fact table; the 2·availqty > qty comparison stays decimal; the final
    // supplier projection is a semi-join against the distinct suppkeys.
    QueryDef(
      "q20_excess_stock_suppliers",
      (s, dir) => {
        val smallParts = t(s, dir, "part").where(col("p_name").like("small%"))
          .select(col("p_partkey"))
        val shipped = t(s, dir, "lineitem")
          .where(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
            col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity").cast(DecimalType(12, 2))).as("qty"))
        val excessSupp = partsupp(s, dir)
          .join(smallParts, col("ps_partkey") === col("p_partkey"))
          .join(shipped, col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"))
          .where((col("ps_availqty") * 2).cast(DecimalType(20, 2)) > col("qty"))
          .select(col("ps_suppkey")).distinct()
        t(s, dir, "supplier")
          .join(broadcast(t(s, dir, "nation").where(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .join(excessSupp, col("s_suppkey") === col("ps_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
      },
      Some(s"""
        WITH $psCte
        SELECT s.s_suppkey, s.s_name
        FROM supplier s, nation n
        WHERE s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
          AND s.s_suppkey IN (
            SELECT ps.ps_suppkey FROM ps
            WHERE ps.ps_partkey IN
                (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
              AND 2 * ps.ps_availqty > (
                SELECT SUM(CAST(l_quantity AS DECIMAL(12,2)))
                FROM lineitem l
                WHERE l.l_partkey = ps.ps_partkey
                  AND l.l_suppkey = ps.ps_suppkey
                  AND l.l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l.l_shipdate < TIMESTAMP '1998-01-01'))"""))
  )
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine operation: a Spark DataFrame program plus (when
  * SQL-expressible) an equivalent ANSI SQL oracle the driver runs in DuckDB
  * over the same parquet tables.
  *
  * Determinism contract for oracles (the driver hash-compares values):
  *   - sums over doubles are computed over values first cast to DECIMAL, so
  *     the aggregate is exact and independent of addition order;
  *   - averages/ratios are a single IEEE double division of two exact values;
  *   - top-n queries always carry a unique tiebreak key in the ORDER BY;
  *   - every aggregate/computed column is cast to an identical type and
  *     aliased to an identical name on both sides;
  *   - NO final output column may be DECIMAL (or DuckDB HUGEINT): the
  *     driver renders Spark parquet decimals as python Decimal ('253942.00')
  *     but DuckDB results as float64 ('253942.0'), so trailing-zero scale
  *     hash-mismatches even when values are bit-exact. Keep the internal
  *     math decimal-exact, then CAST the final column to DOUBLE (or BIGINT
  *     for integral window/count results) on BOTH engines.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Read one driver-generated table (TESTDATA.md) from the given sf dir.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * read it as long nanos (legacy conf) and convert to a microsecond
    * timestamp (the testdata carries whole-microsecond values, so the
    * conversion is lossless and matches DuckDB's ns→µs cast).
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}

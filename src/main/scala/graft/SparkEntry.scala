package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a `QueryDef` in one of the ops
  * modules; this object only assembles the registry the driver consumes.
  */
object SparkEntry {

  private def all: Seq[QueryDef] =
    Relational.defs ++ Relational2.defs ++ Relational3.defs ++
      Relational4.defs ++ Temporal.defs ++ Analytics.defs ++ TextOps.defs ++
      PipelineOps.defs ++ IceQueries.defs ++ Dedup.defs ++
      IncrementalDedup.defs ++ Similarity.defs ++
      Multimodal.defs ++ StreamingOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}

package graft

import org.apache.spark.sql.SparkSession

/** Session-level SQL configuration the engine's parquet reads rely on —
  * applied ONCE per session, not per scan.
  *
  * Files the engine writes carry parquet field IDs, and schema-evolution
  * reads resolve columns BY ID (`spark.sql.parquet.fieldId.read.enabled`);
  * `ignoreMissing` lets a post-evolution schema project files written
  * before a column existed. These are read-path semantics, not tuning —
  * scans are wrong without them — so table scans call [[ensurePrepared]],
  * which applies the conf the first time it sees a session and is a pure
  * map lookup afterwards. Sessions the engine's own mains build pass
  * through [[prepare]] at construction, so their scan paths never touch
  * the conf at all.
  */
object GraftSession {
  /** The engine's required read confs. `nanosAsLong` is here rather than
    * set inside query functions (it has no per-reader option — schema
    * inference reads it from the session SQLConf): driver testdata has
    * shipped `events.ts` as parquet TIMESTAMP(NANOS), which Spark rejects
    * outright without the legacy conf. Reading nanos as long is stable
    * read-path semantics applied once at preparation, never flipped
    * mid-session, so concurrent callers on a prepared session see one
    * consistent schema. [[graft.ops.QueryDef.t]] branches on the ACTUAL
    * read type, so micros files are unaffected.
    */
  // r21 note: an AQE coalesce floor of 64k
  // (`coalescePartitions.minPartitionSize`) was trialled here to
  // parallelize the 1-4-task post-shuffle stages AQE produces on tiny
  // inputs; an A/B over a warm query list measured it NEUTRAL-TO-WORSE
  // board-wide (per-task scheduling overhead across every stage of ~90
  // queries outweighed the few serial mid-stages it widened), so the
  // default 1m floor stands.
  val ReadConfs: Seq[(String, String)] = Seq(
    "spark.sql.parquet.fieldId.read.enabled" -> "true",
    "spark.sql.parquet.fieldId.read.ignoreMissing" -> "true",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Apply the engine's read confs to a session (idempotent — sets only
    * keys whose current value differs).
    */
  def prepare(spark: SparkSession): SparkSession = {
    ReadConfs.foreach { case (k, v) =>
      if (!spark.conf.getOption(k).contains(v)) spark.conf.set(k, v)
    }
    spark
  }

  /** Scan-path guard: verifies the confs hold (two map lookups) and repairs
    * them only when something else changed them — self-healing against a
    * later `withSQLConf`-style restore, without the per-scan unconditional
    * mutation this replaced.
    */
  def ensurePrepared(spark: SparkSession): Unit = { prepare(spark); () }
}

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
  val ReadConfs: Seq[(String, String)] = Seq(
    "spark.sql.parquet.fieldId.read.enabled" -> "true",
    "spark.sql.parquet.fieldId.read.ignoreMissing" -> "true",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true") ++ PerfConfs

  /** Engine performance confs, applied with the read confs (r21).
    *
    * AQE coalesce floor: Spark's default
    * `coalescePartitions.minPartitionSize` of 1 MB merges every small
    * post-shuffle stage down to 1-4 partitions, so mid-plan work over
    * modest exchanges (candidate joins, window ranks, verify joins) runs
    * serially while the rest of the machine idles — measured r21:
    * dedup_containment's verify join ran 598k candidate rows in 1-4 tasks.
    * The floor is a SMALL-SCALE knob only: at deployment scale partitions
    * are sized by `advisoryPartitionSizeInBytes` (64 MB default), which a
    * 64 KB floor never reaches, so production plans are unchanged.
    * Parameterised via SPARK_GRAFT_AQE_MIN_PARTITION for cluster profiles
    * that do want a higher floor.
    */
  def PerfConfs: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" ->
      sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION", "64k"))

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

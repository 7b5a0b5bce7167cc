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
  /** The engine's required read confs. */
  val ReadConfs: Seq[(String, String)] = Seq(
    "spark.sql.parquet.fieldId.read.enabled" -> "true",
    "spark.sql.parquet.fieldId.read.ignoreMissing" -> "true")

  private val prepared = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Apply the engine's read confs to a session (idempotent). */
  def prepare(spark: SparkSession): SparkSession = {
    ReadConfs.foreach { case (k, v) =>
      if (!spark.conf.getOption(k).contains(v)) spark.conf.set(k, v)
    }
    prepared.put(spark, java.lang.Boolean.TRUE)
    spark
  }

  /** One-time-per-session guard used by scan paths: first call prepares the
    * session, every later call is a weak-map hit with no conf access.
    */
  def ensurePrepared(spark: SparkSession): Unit =
    if (!prepared.containsKey(spark)) prepare(spark)
}

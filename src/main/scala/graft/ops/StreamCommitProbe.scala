package graft.ops

import org.apache.spark.sql.SparkSession

/** Attribution probe for `stream_minhash_lsh`, the bench board's most
  * expensive query: splits its wall time into micro-batch STAGING
  * (persist + count of the stateful LSH output), Iceberg UPSERT COMMITS
  * (two write jobs + manifests + manifest list + metadata CAS per
  * trigger), and the remainder (stream compute: minhash signatures,
  * shuffle to state, state-store maintenance). Decides whether commit
  * amortization or state/compute is the floor.
  *
  * Run: java -cp "target/scala-2.13/classes:SPARK_JARS_DIR/&#42;"
  *   graft.ops.StreamCommitProbe [sfDir] [runs]
  */
object StreamCommitProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.GraftSession.prepare(SparkSession.builder()
      .master("local[32]")
      .appName("stream-commit-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    (0 until runs).foreach { r =>
      StreamingOps.resetSinkTelemetry()
      val t0 = System.nanoTime()
      val (df, _) = StreamingOps.streamedMinhashLsh(spark, dir)
      val n = df.count()
      val total = (System.nanoTime() - t0) / 1e9
      val stage = StreamingOps.sinkStageNanos.get / 1e9
      val upsert = StreamingOps.sinkUpsertNanos.get / 1e9
      println(s"""{"probe":"stream_minhash_lsh","run":$r,"rows":$n,""" +
        s""""total_sec":${f(total)},"stage_sec":${f(stage)},""" +
        s""""upsert_sec":${f(upsert)},""" +
        s""""other_sec":${f(total - stage - upsert)},""" +
        s""""batches":${StreamingOps.sinkBatches.get}}""")
      CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}

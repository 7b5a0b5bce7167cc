package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crossover probe for the CONTAINMENT cost chooser (r21).
  *
  * The chooser's high-threshold early flip (est > ContainmentPrefixFloor &&
  * t >= ContainmentPrefixMinThreshold → prefix-probe plan) was tuned before
  * the r21 map-side parallelism fix; with the count-join's tokenize/join
  * stages no longer serialized on one core the balance may have moved. This
  * probe runs BOTH exact plans (DedupSpec proves identical outputs) at t=0.9
  * over doc_id-shifted replicated corpora — token document frequencies scale
  * with the replica count, so Σ C(df,2) sweeps the window between
  * ContainmentPrefixFloor and CountJoinMaxPairs where the early flip is the
  * ONLY thing separating the plans — and reports min-of-2 walls, shuffle
  * records, and the ANALYZE-equivalent moment estimate.
  *
  * Usage: runMain graft.ops.ContainmentPlanProbe [baseDir] [replicasCsv]
  */
object ContainmentPlanProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicasList = args.lift(1).getOrElse("1,3,6").split(",").map(_.trim.toInt)
    val spark = graft.GraftSession.prepare(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    replicasList.foreach { replicas =>
      val dir = java.nio.file.Files.createTempDirectory(s"cont-probe-${replicas}x")
      try {
        val docs0 = spark.read.parquet(s"$base/documents.parquet")
          .select("doc_id", "source", "text")
        val shift = docs0.agg(max(col("doc_id"))).first().getLong(0) + 1L
        (0 until replicas)
          .map(i => docs0.withColumn("doc_id", col("doc_id") + lit(i.toLong * shift)))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val raw = spark.read.parquet(s"$dir/documents.parquet")
        val est = Dedup.sampleJoinedRows(raw.select(col("doc_id"), col("source"),
          col("text")))
        def docsTokens(): DataFrame = Dedup.tokensPersisted(
          QueryDef.spread(raw)
            .select(col("doc_id"), col("source"),
              Dedup.wordSet(col("text")).as("ws")))
        Seq(
          ("count-join", () => Dedup.containmentCountJoinOver(docsTokens(), 0.9)),
          ("prefix-probe", () => Dedup.containmentPairsPrefixOver(docsTokens(), 0.9))
        ).foreach { case (plan, build) =>
          val walls = (1 to 2).map { _ =>
            val (rows, recs, wall) =
              graft.tools.ProbeMetrics.measure(spark)(build().count())
            CacheRegistry.releaseAll()
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = false))
            (rows, recs, wall)
          }
          val best = walls.minBy(_._3)
          println(s"""{"probe":"containment_plan","replicas":$replicas,""" +
            s""""est_moment":${f(est)},"plan":"$plan","rows":${best._1},""" +
            s""""shuffle_records":${best._2},"wall_sec":${f(best._3)},""" +
            s""""walls":[${walls.map(w => f(w._3)).mkString(",")}]}""")
        }
      } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
    spark.stop()
  }
}

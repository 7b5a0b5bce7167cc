package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.{CacheRegistry, Dedup, TextOps}

/** One-off 10x scale probe for the text/dedup pipeline — the pipeline
  * counterpart of [[ScaleProbe]]'s relational join-strategy probe and
  * [[DedupScaleProbe]]'s hot-bucket probe.
  *
  * Builds a 10x corpus (10 doc_id-shifted replicas of the sf0.1 documents
  * table — token document frequencies scale 10x, the exact shape a bigger
  * crawl has) and, at 1x and 10x, runs:
  *
  *   - adaptive exact JACCARD ([[Dedup.jaccardPairsAdaptive]]) — the
  *     interesting observable is the COST-BASED CHOOSER: Σ C(df,2) grows
  *     ~100x under 10x dfs, so the count-join that wins at 1x must flip to
  *     the prefix-probe plan at 10x, exactly like AQE flips broadcast to
  *     shuffled joins in the relational probe;
  *   - adaptive CONTAINMENT ([[Dedup.containmentPairs]]) — same chooser
  *     discipline, its own thresholds;
  *   - TF-IDF top-k and BM25 top-k (corpus-linear aggregations — their
  *     shuffle volume must grow ~10x, not ~100x).
  *
  * Plan choices are read from the chooser's own counters
  * ([[Dedup.jaccardCountJoinPlans]] etc.), shuffle volume from task
  * metrics ([[ProbeMetrics]]). Results are recorded in BENCH_NOTES.md.
  *
  * Usage: `runMain graft.tools.PipelineScaleProbe [baseDir]`
  */
object PipelineScaleProbe {

  private def replicatedCorpus(spark: SparkSession, base: String, out: String,
      replicas: Int): Unit = {
    val docs = spark.read.parquet(s"$base/documents.parquet")
      .select("doc_id", "source", "text")
    val shift = docs.agg(max(col("doc_id"))).first().getLong(0) + 1L
    (0 until replicas)
      .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * shift)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.prepare(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    val ops: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      ("jaccard(adaptive)", (s, d) => Dedup.jaccardPairsAdaptive(s, d, 0.5)),
      ("containment(adaptive)", (s, d) => Dedup.containmentPairs(s, d, 0.9)),
      ("tfidf_topk", (s, d) => TextOps.defs.find(_.name == "text_tfidf_topk").get.fn(s, d)),
      ("bm25_topk", (s, d) => TextOps.defs.find(_.name == "text_bm25_topk").get.fn(s, d)))

    def planTag(): String = {
      val j =
        if (Dedup.jaccardPrefixPlans.get > 0) "jaccard=prefix"
        else if (Dedup.jaccardCountJoinPlans.get > 0) "jaccard=count-join"
        else ""
      val c =
        if (Dedup.containmentPrefixPlans.get > 0) "containment=prefix"
        else if (Dedup.containmentCountJoinPlans.get > 0) "containment=count-join"
        else ""
      Seq(j, c).filter(_.nonEmpty).mkString(" ")
    }
    def resetPlanCounters(): Unit = {
      Dedup.jaccardPrefixPlans.set(0); Dedup.jaccardCountJoinPlans.set(0)
      Dedup.containmentPrefixPlans.set(0); Dedup.containmentCountJoinPlans.set(0)
    }

    println(f"${"scale"}%-6s ${"op"}%-22s ${"rows out"}%-10s " +
      f"${"shuffle recs"}%-14s ${"wall s"}%-8s plan")
    Seq(("1x", 1), ("10x", 10)).foreach { case (label, replicas) =>
      val dir = java.nio.file.Files.createTempDirectory(s"pipe-probe-$label")
      try {
        replicatedCorpus(spark, base, dir.toString, replicas)
        // warmup so the first op at each scale isn't IO-cache-inflated
        spark.read.parquet(s"$dir/documents.parquet").count(): Unit
        ops.foreach { case (name, fn) =>
          resetPlanCounters()
          try {
            val (rows, recs, wall) =
              ProbeMetrics.measure(spark)(fn(spark, dir.toString).count())
            println(f"$label%-6s $name%-22s $rows%-10d $recs%-14d $wall%-8.1f ${planTag()}")
          } finally CacheRegistry.releaseAll()
        }
      } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.ops.{CacheRegistry, Dedup}

/** One-off scale probe for the hot-bucket-gated MinHash-LSH path — the
  * dedup counterpart of [[ScaleProbe]]'s relational join-strategy probe.
  *
  * Builds a 10x corpus (10 doc_id-shifted replicas of the sf0.1 documents
  * table, ~50k docs) and plants a mass-duplicate group of D copies of one
  * boilerplate page — the web-crawl degenerate case the sub-bucketing gate
  * ([[Dedup.saltBands]]) exists for — at D ∈ {5k, 10k, 20k}. For each D it
  * runs the gated CANDIDATE stage ([[Dedup.minhashCandidateStage]] — the
  * salted band self-join the gate bounds; the downstream verify join is
  * candidate-linear either way) with a probe cap and reports the executed
  * plan's total shuffle-record count and wall time, next to the analytic
  * UNGATED bucket cost 16·C(D,2). Corpus-linearity shows up as the
  * measured totals growing ~linearly in D (slope ≈ 16·cap/2 per planted
  * doc) while the ungated column grows quadratically; SkewStressSpec pins
  * the same law as a unit test at 25k rows, this probe is the off-paper
  * 10x-scale evidence recorded in BENCH_NOTES.md.
  *
  * Usage: `runMain graft.tools.DedupScaleProbe [baseDir] [cap]`
  * (defaults /root/testdata/sf0.1 and cap=512 — a deliberately small probe
  * cap so three runs stay snappy; the production default is
  * [[Dedup.BandBucketCap]] and scales the same way, linearly in cap).
  */
object DedupScaleProbe {

  /** 10 doc_id-shifted replicas of base documents + D boilerplate copies. */
  private def plantedCorpus(spark: SparkSession, base: String, out: String,
      dupCopies: Int, replicas: Int = 10): Unit = {
    val docs = spark.read.parquet(s"$base/documents.parquet")
      .select("doc_id", "source", "text")
    val shift = docs.agg(max(col("doc_id"))).first().getLong(0) + 1L
    val tenx = (0 until replicas)
      .map(i => docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * shift)))
      .reduce(_ unionByName _)
    val boiler = "cookie consent privacy policy terms of service all rights " +
      "reserved subscribe to our newsletter follow us on social media"
    val planted = spark.range(dupCopies.toLong).select(
      (col("id") + lit(replicas.toLong * shift)).as("doc_id"),
      lit("web").as("source"), lit(boiler).as("text"))
    tenx.unionByName(planted)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = args.drop(1).headOption.map(_.toInt).getOrElse(512)
    val spark = GraftSession.prepare(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"dup copies"}%-12s ${"pairs out"}%-12s ${"shuffle recs"}%-14s " +
      f"${"wall s"}%-8s ungated 16*C(D,2)")
    // warmup pass (JVM/codegen/IO caches) so the D=5000 row isn't inflated
    locally {
      val dir = java.nio.file.Files.createTempDirectory("dedup-probe-warm")
      try {
        plantedCorpus(spark, base, dir.toString, 1000)
        Dedup.minhashCandidateStage(spark, dir.toString, cap)._2.count(): Unit
      } finally {
        CacheRegistry.releaseAll()
        org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
      }
    }
    Seq(5000, 10000, 20000).foreach { d =>
      val dir = java.nio.file.Files.createTempDirectory(s"dedup-probe-$d")
      try {
        plantedCorpus(spark, base, dir.toString, d)
        val (pairs, recs, wall) = ProbeMetrics.measure(spark)(
          Dedup.minhashCandidateStage(spark, dir.toString, cap)._2.count())
        val ungated = 16L * d.toLong * (d - 1L) / 2L
        println(f"$d%-12d $pairs%-12d $recs%-14d $wall%-8.1f $ungated%d")
      } finally {
        CacheRegistry.releaseAll()
        org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
      }
    }
    spark.stop()
  }
}

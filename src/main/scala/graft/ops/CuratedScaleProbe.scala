package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage scale audit of `pipeline_curated_corpus` (the worst
  * non-inherent sf1 wall-clock ratio, 11.7x for 10x data in the r17 board):
  * the query chains jaccard pair generation → union-find clustering →
  * exact-hash verdict → keep-set semi-join. Wall time under a shared VM
  * can't attribute the ratio, but per-stage RECORD COUNTS are
  * deterministic — if any stage's records grow super-linearly at 10x the
  * corpus, that stage is the scale bug; if all grow ~linearly the ratio is
  * fixed-cost amortization + CPU, not a shuffle explosion.
  *
  * Lives in `graft.ops` (not `graft.tools`) for access to the
  * `private[ops]` stage internals (prefix candidates, the shared tokenized
  * frame).
  *
  * Run: java -cp "target/scala-2.13/classes:SPARK_JARS_DIR/&#42;"
  *   graft.ops.CuratedScaleProbe /root/testdata/sf0.1 /tmp/sf1-probe
  */
object CuratedScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1-probe")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("curated-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val docs = QueryDef.t(spark, dir, "documents")
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val a = f
        (a, (System.nanoTime() - t0) / 1e9)
      }
      val toks = Dedup.tokensPersisted(docs.select(col("doc_id"), col("source"),
        Dedup.wordSet(col("text")).as("ws")))
      val (nDocs, tDocs) = timed(toks.count())
      val (nTokens, tTok) = timed(toks.select(explode(col("ws"))).count())
      // the candidate stage: the only stage whose record count CAN go
      // quadratic (pairs per shared prefix token)
      val (nCand, tCand) = timed(Dedup.prefixCandidates(toks, 0.5).count())
      val pairs = Dedup.jaccardPairsAdaptive(spark, dir, 0.5)
        .transform(CacheRegistry.persist(_))
      val (nPairs, tPairs) = timed(pairs.count())
      val clusters = Dedup.duplicateClusters(
        pairs.select(col("doc_a"), col("doc_b")))
        .transform(CacheRegistry.persist(_))
      val (nClusterRows, tClust) = timed(clusters.count())
      val verdict = Dedup.dedupVerdict(docs, clusters)
        .transform(CacheRegistry.persist(_))
      val (nKeep, tVerd) = timed(verdict.where(col("keep") === 1L).count())
      val (nCurated, tApply) = timed(Dedup.applyVerdict(docs, verdict).count())
      def f(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
      println(s"""{"probe":"curated_corpus","dir":"$dir","n_docs":$nDocs,""" +
        s""""total_tokens":$nTokens,"prefix_candidates":$nCand,""" +
        s""""jaccard_pairs":$nPairs,"cluster_rows":$nClusterRows,""" +
        s""""keep_rows":$nKeep,"curated_rows":$nCurated,""" +
        s""""sec":{"tokenize":${f(tDocs)},"token_count":${f(tTok)},""" +
        s""""candidates":${f(tCand)},"pairs":${f(tPairs)},""" +
        s""""clusters":${f(tClust)},"verdict":${f(tVerd)},""" +
        s""""apply":${f(tApply)}}}""")
      CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}

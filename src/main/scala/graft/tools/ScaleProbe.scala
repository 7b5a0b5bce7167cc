package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.{GraftSession, SparkEntry}

/** One-off scale probe for the de-hinted relational batch: synthesizes an
  * sf1-shaped dataset (10 key-shifted replicas of sf0.1 — same value
  * distributions, 10x the rows, foreign keys kept consistent), runs every
  * TPC-H-style query at both scales, and reports the JOIN STRATEGIES the
  * post-AQE executed plans actually chose. This is the cheapest evidence
  * that the "AQE size-gates joins" design holds off-paper: joins that stay
  * broadcast at sf0.1 should flip to shuffled joins at sf1 exactly when
  * the build side scales with SF, and never for the fixed-size dims
  * (nation/region).
  *
  * Usage: `runMain graft.tools.ScaleProbe [baseDir] [sf1Dir]`
  * (defaults /root/testdata/sf0.1 → /tmp/sf1-probe). Findings are recorded
  * in BENCH_NOTES.md.
  */
object ScaleProbe {

  private val ScaledTables =
    Seq("customer", "supplier", "part", "orders", "lineitem")
  private val CopiedTables = Seq("nation", "region")

  /** Ten vowel permutations (replica 0 = identity): a translate() over the
    * text per replica makes cross-replica documents textually DISTINCT —
    * bare replication would hand every doc 9 exact copies and blow the
    * dedup pair count up quadratically BY CONSTRUCTION, which measures the
    * synthetic corpus, not the plan. Within-replica duplicate structure is
    * preserved exactly, so dedup output scales ~linearly like a real
    * 10×-bigger crawl.
    */
  private val VowelPerms = Seq(
    "aeiou", "eioua", "iouae", "ouaei", "uaeio",
    "aeuoi", "eiaou", "iouea", "oueia", "uaoei")

  /** Key-shift offsets per table key column so 10 replicas stay FK-consistent. */
  private def shifts(spark: SparkSession, base: String): Map[String, Long] = {
    def maxOf(table: String, col0: String): Long =
      spark.read.parquet(s"$base/$table.parquet")
        .agg(max(col(col0))).first().getLong(0) + 1L
    Map(
      "orderkey" -> maxOf("orders", "o_orderkey"),
      "custkey" -> maxOf("customer", "c_custkey"),
      "suppkey" -> maxOf("supplier", "s_suppkey"),
      "partkey" -> maxOf("part", "p_partkey"))
  }

  private def shiftCols(table: String, sh: Map[String, Long], i: Int)(
      df: DataFrame): DataFrame = {
    val byTable: Map[String, Seq[(String, String)]] = Map(
      "orders" -> Seq("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"),
      "lineitem" -> Seq("l_orderkey" -> "orderkey", "l_partkey" -> "partkey",
        "l_suppkey" -> "suppkey"),
      "customer" -> Seq("c_custkey" -> "custkey"),
      "supplier" -> Seq("s_suppkey" -> "suppkey"),
      "part" -> Seq("p_partkey" -> "partkey"))
    byTable.getOrElse(table, Nil).foldLeft(df) { case (d, (c, k)) =>
      d.withColumn(c, col(c) + lit(i.toLong * sh(k)))
    }
  }

  def synthesizeSf1(spark: SparkSession, base: String, out: String,
      replicas: Int = 10): Unit = {
    // replica 10 would wrap i % VowelPerms.size back to the identity
    // permutation and hand every doc an EXACT cross-replica twin —
    // reintroducing the quadratic dedup-pair blow-up the permutations
    // exist to prevent. Scaling past 10x needs more perms, not a wrap.
    require(replicas <= VowelPerms.size,
      s"synthesizeSf1 supports at most ${VowelPerms.size} replicas " +
        s"(got $replicas): vowel permutations must stay distinct per replica")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(out), graft.meta.FileIO.conf)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$out/_READY"))) return
    val sh = shifts(spark, base)
    ScaledTables.foreach { t =>
      val src = spark.read.parquet(s"$base/$t.parquet")
      (0 until replicas).map(i => shiftCols(t, sh, i)(src))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    CopiedTables.foreach { t =>
      spark.read.parquet(s"$base/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    // pipeline tables scale too (the full-board probe needs them):
    // ids shift per replica; content perturbs deterministically so
    // cross-replica rows are neither exact nor near duplicates
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val docShift = docs.agg(max(col("doc_id"))).first().getLong(0) + 1L
    (0 until replicas).map { i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * docShift))
        .withColumn("text",
          if (i == 0) col("text")
          else translate(col("text"), "aeiou", VowelPerms(i)))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val vecShift = emb.agg(max(col("vec_id"))).first().getLong(0) + 1L
    (0 until replicas).map { i =>
      // deterministic per-replica displacement keeps replica vectors
      // distinct (bare copies would make every kNN hit a distance-0 twin)
      emb.withColumn("vec_id", col("vec_id") + lit(i * vecShift))
        .withColumn("embedding",
          if (i == 0) col("embedding")
          else transform(col("embedding"),
            (x, j) => (x + cos(j.cast("double") * 0.7 + lit(i.toDouble)) * lit(0.05))
              .cast("float")))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    val ev = spark.read.parquet(s"$base/events.parquet")
    val evShift = ev.agg(max(col("event_id"))).first().getLong(0) + 1L
    val userShift = ev.agg(max(col("user_id"))).first().getLong(0) + 1L
    (0 until replicas).map { i =>
      // user ids shift so per-user state (sessionize, as-of) grows in
      // USERS, not in per-key depth; event time stays — 10× density per
      // window is what a bigger deployment's stream looks like
      ev.withColumn("event_id", col("event_id") + lit(i * evShift))
        .withColumn("user_id", col("user_id") + lit(i * userShift))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    fs.create(new org.apache.hadoop.fs.Path(s"$out/_READY")).close()
  }

  /** (BroadcastHashJoin, ShuffledHashJoin, SortMergeJoin, BroadcastNLJ)
    * counts in the EXECUTED (post-AQE) plan.
    */
  private def joinMix(df: DataFrame): (Int, Int, Int, Int) = {
    def expand(p: SparkPlan): Seq[SparkPlan] = {
      val nested = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Seq.empty
      }
      p +: (p.children ++ nested ++ p.subqueries).flatMap(expand)
    }
    val names = expand(df.queryExecution.executedPlan).map(_.nodeName)
    (names.count(_.contains("BroadcastHashJoin")),
      names.count(_.contains("ShuffledHashJoin")),
      names.count(_.contains("SortMergeJoin")),
      names.count(_.contains("BroadcastNestedLoopJoin")))
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf1 = args.drop(1).headOption.getOrElse("/tmp/sf1-probe")
    val spark = GraftSession.prepare(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    synthesizeSf1(spark, base, sf1)
    val qs = SparkEntry.queries.keys.filter(_.matches("q\\d+_.*")).toSeq.sorted
    println(f"${"query"}%-28s ${"sf0.1 B/SH/SM/NL"}%-18s ${"sf1 B/SH/SM/NL"}%-18s flips")
    qs.foreach { name =>
      def mixAt(dir: String): (Int, Int, Int, Int) = {
        val df = SparkEntry.queries(name)(spark, dir)
        df.collect() // AQE finalizes the plan only on execution
        joinMix(df)
      }
      val (a, b) = (mixAt(base), mixAt(sf1))
      val flip = if (a == b) "" else "<== strategy change"
      println(f"$name%-28s ${s"${a._1}/${a._2}/${a._3}/${a._4}"}%-18s " +
        f"${s"${b._1}/${b._2}/${b._3}/${b._4}"}%-18s $flip")
    }
    spark.stop()
  }
}

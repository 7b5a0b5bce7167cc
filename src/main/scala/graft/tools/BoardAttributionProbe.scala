package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-over-round attribution for single board queries (r18 verdict
  * finding #1: `dedup_jaccard_pairs` read 3.0→6.0 s on the official board
  * after the PPJoin filter change, `dedup_minhash_lsh` +65% on UNCHANGED
  * code — is the move the widened prefix shuffle or ambient drift?).
  *
  * Runs the REGISTERED plan of each named query (same entry point the bench
  * times) min-of-N in a bench-shaped session, reporting per-run wall next
  * to task-measured shuffle write records+bytes — the records number is
  * deterministic for a fixed plan, so comparing it across two checkouts
  * separates "the plan moves more data" (records differ) from "the same
  * work ran slower" (records equal, wall differs). A fixed-work
  * [[Calibration]] before and after the queries pins the window's ambient
  * multiplier, making the probe's own two runs comparable.
  *
  * Self-contained on purpose: drop this file into any past checkout (plus
  * Calibration.scala) and run
  *   sbt "runMain graft.tools.BoardAttributionProbe q1 q2 ..."
  * with SPARK_GRAFT_SF_DIR set.
  */
object BoardAttributionProbe {

  private final class ShuffleCounter extends SparkListener {
    val records = new AtomicLong(0L)
    val bytes = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      Option(t.taskMetrics).foreach { m =>
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
      }
  }

  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_jaccard_pairs", "dedup_minhash_lsh", "dedup_containment")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.prepare(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    // same untimed fixture warm-up as Bench.main
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    try { graft.ops.IceQueries.curation(spark, sfDir); () } catch { case _: Throwable => }
    try { graft.ops.IceQueries.pairGraph(spark, sfDir); () } catch { case _: Throwable => }
    try { graft.ops.IceQueries.lshCandidates(spark, sfDir); () } catch { case _: Throwable => }
    try { graft.ops.IceQueries.incremental(spark, sfDir); () } catch { case _: Throwable => }
    graft.ops.CacheRegistry.releaseAll()

    val calBefore = Calibration.run(spark)
    println(f"[cal] before: cpu=${calBefore.cpuMs}%.0fms ${calBefore.cpuRuns.map(r => f"$r%.0f").mkString("[", ",", "]")} " +
      f"spark=${calBefore.sparkMs}%.0fms ${calBefore.sparkRuns.map(r => f"$r%.0f").mkString("[", ",", "]")}")

    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      val runs = (1 to reps).map { _ =>
        val counter = new ShuffleCounter
        spark.sparkContext.addSparkListener(counter)
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(1500) // async listener bus drain
        spark.sparkContext.removeSparkListener(counter)
        graft.ops.CacheRegistry.releaseAll()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        System.gc()
        (wall, rows, counter.records.get, counter.bytes.get)
      }
      val best = runs.minBy(_._1)
      println(f"[probe] $name rows=${best._2} minWall=${best._1}%.2fs " +
        s"walls=${runs.map(r => f"${r._1}%.2f").mkString("[", ",", "]")} " +
        s"shufRecs=${runs.map(_._3).mkString("[", ",", "]")} " +
        s"shufMB=${runs.map(r => r._4 / 1000000).mkString("[", ",", "]")}")
    }
    // which exact-jaccard plan the chooser ran (counters exist since r17)
    println(s"[probe] jaccard plans: prefix=${graft.ops.Dedup.jaccardPrefixPlans.get} " +
      s"countJoin=${graft.ops.Dedup.jaccardCountJoinPlans.get}")

    val calAfter = Calibration.run(spark)
    println(f"[cal] after: cpu=${calAfter.cpuMs}%.0fms spark=${calAfter.sparkMs}%.0fms")
    spark.stop()
  }
}

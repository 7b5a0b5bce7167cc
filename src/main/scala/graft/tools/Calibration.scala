package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixed-work ambient-load calibration, reported next to bench timings so
  * round-over-round comparisons can tell VM drift from plan regressions
  * (r18 post-mortem: the official board ran +16% on a loaded window while
  * builder re-runs on a quiet window read +1.6% — the artifact itself
  * carried no way to show that). Two constant-size measurements:
  *
  *  - `cpuMs`: a single-threaded deterministic integer-mix loop — pure CPU,
  *    no allocation, no Spark; scales only with host contention/frequency.
  *  - `sparkMs`: one tiny fixed Spark job (range → modulo groupBy → count),
  *    32 partitions and one shuffle; scales with scheduler + shuffle-path
  *    ambient cost in the SAME session the queries run in.
  *
  * Both min-of-3: the min is the calibration number, matching the board's
  * own min-of-N policy. Work sizes are fixed constants — the point is that
  * the ratio of two rounds' calibrations estimates the ambient multiplier
  * between their windows.
  */
object Calibration {
  final case class Result(cpuMs: Double, cpuRuns: Seq[Double],
      sparkMs: Double, sparkRuns: Seq[Double])

  /** xorshift64* mix over a fixed iteration count; the running fold keeps
    * the JIT from eliding the loop. ~0.4 s on an idle core.
    */
  private def cpuLoop(): Long = {
    var x = 0x9e3779b97f4a7c15L
    var acc = 0L
    var i = 0
    while (i < 200000000) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      acc += x * 0x2545f4914f6cdd1dL
      i += 1
    }
    acc
  }

  private def timedMs(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
  }

  def run(spark: SparkSession, reps: Int = 3): Result = {
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val cpuRuns = (1 to reps).map(_ => timedMs(sink.addAndGet(cpuLoop()): Unit))
    val sparkRuns = (1 to reps).map { _ =>
      timedMs {
        spark.range(0, 20000000L, 1, 32)
          .groupBy((col("id") % 997).as("k")).agg(count(lit(1)).as("c"))
          .agg(sum(col("c"))).collect(): Unit
      }
    }
    Result(cpuRuns.min, cpuRuns, sparkRuns.min, sparkRuns)
  }
}

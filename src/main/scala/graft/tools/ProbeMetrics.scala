package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shared measurement plumbing for the one-off scale probes
  * ([[ScaleProbe]], [[DedupScaleProbe]], [[PipelineScaleProbe]]).
  *
  * Task-level shuffle-write record counter: an action like count() runs its
  * own QueryExecution, so plan-node SQL metrics on the probed DataFrame
  * stay zero — a listener summing what the tasks actually wrote measures
  * the real exchange volume regardless of which QueryExecution ran.
  */
object ProbeMetrics {

  final class ShuffleWriteCounter extends SparkListener {
    val records = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      Option(t.taskMetrics).foreach(m =>
        records.addAndGet(m.shuffleWriteMetrics.recordsWritten): Unit)
  }

  /** Run `body`, returning (result, shuffleRecordsWritten, wallSeconds).
    * Sleeps briefly after the action so the async listener bus drains.
    */
  def measure[A](spark: SparkSession)(body: => A): (A, Long, Double) = {
    val counter = new ShuffleWriteCounter
    spark.sparkContext.addSparkListener(counter)
    try {
      val t0 = System.nanoTime()
      val out = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000) // listener bus is async; let task-end events drain
      (out, counter.records.get, wall)
    } finally spark.sparkContext.removeSparkListener(counter)
  }
}

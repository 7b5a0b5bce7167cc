package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-stage wall attribution for one registered query — the empirical half
  * of guide §1.1: where inside the query does the wall go (which stage, how
  * much is driver gap between jobs = planning/codegen/commit, how much is
  * task compute vs shuffle)?
  *
  * usage: runMain graft.tools.StageProfile <sfDir> <queryName> [reps]
  * Prints, for the FASTEST rep, the chronological job/stage timeline with
  * per-stage wall, summed task time, shuffle read/write records, and the
  * driver-side gaps between consecutive jobs.
  */
object StageProfile {
  final case class StageRow(jobId: Int, stageId: Int, name: String,
      submitted: Long, completed: Long, taskMs: Long, tasks: Int,
      shufReadRecs: Long, shufWriteRecs: Long, inputRecs: Long,
      gcMs: Long, spillBytes: Long)

  final class Recorder extends SparkListener {
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    private val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    private val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val desc = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
      jobStart.put(j.jobId, (j.time, desc))
      j.stageIds.foreach(sid => stageToJob.put(sid, j.jobId))
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      Option(jobStart.get(j.jobId)).foreach { case (t0, desc) =>
        jobs.add((j.jobId, t0, j.time, desc))
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val si = s.stageInfo
      val m = si.taskMetrics
      stages.add(StageRow(
        Option(stageToJob.get(si.stageId)).getOrElse(-1),
        si.stageId, si.name.takeWhile(_ != '\n'),
        si.submissionTime.getOrElse(0L), si.completionTime.getOrElse(0L),
        if (m == null) 0L else m.executorRunTime, si.numTasks,
        if (m == null) 0L else m.shuffleReadMetrics.recordsRead,
        if (m == null) 0L else m.shuffleWriteMetrics.recordsWritten,
        if (m == null) 0L else m.inputMetrics.recordsRead,
        if (m == null) 0L else m.jvmGCTime,
        if (m == null) 0L else m.memoryBytesSpilled + m.diskBytesSpilled))
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.prepare(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    def warm(label: String)(body: => Unit): Unit =
      try body catch { case e: Throwable =>
        println(s"[profile] warm-up failed ($label): $e")
      }
    warm("curation") { graft.ops.IceQueries.curation(spark, sfDir); () }
    warm("pair graph") { graft.ops.IceQueries.pairGraph(spark, sfDir); () }
    warm("lsh candidates") { graft.ops.IceQueries.lshCandidates(spark, sfDir); () }
    warm("incremental") { graft.ops.IceQueries.incremental(spark, sfDir); () }
    warm("ice fixtures") { graft.SparkEntry.queries.get("ice_time_travel")
      .foreach(_.apply(spark, sfDir).count()) }
    warm("ivf") { graft.SparkEntry.queries.get("sim_ann_ivf")
      .foreach(_.apply(spark, sfDir).count()) }
    val fn = graft.SparkEntry.queries(name)
    var best: (Double, Recorder, Long, Long) = null
    (1 to reps).foreach { i =>
      ProbeMetrics.drainListenerBus(spark)
      val rec = new Recorder
      spark.sparkContext.addSparkListener(rec)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val t1 = System.nanoTime()
      val wall = (t1 - t0) / 1e9
      ProbeMetrics.drainListenerBus(spark)
      spark.sparkContext.removeSparkListener(rec)
      println(f"[profile] $name rep=$i rows=$n wall=$wall%.2f s")
      if (best == null || wall < best._1) best = (wall, rec, t0 / 1000000L, t1 / 1000000L)
      graft.ops.CacheRegistry.releaseAll()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    val (wall, rec, _, _) = best
    import scala.jdk.CollectionConverters._
    val jobs = rec.jobs.asScala.toSeq.sortBy(_._2)
    val stages = rec.stages.asScala.toSeq.sortBy(_.submitted)
    println(f"\n[profile] FASTEST rep wall=$wall%.2f s, jobs=${jobs.size}, stages=${stages.size}")
    // driver gaps: time between a job's end and the next job's start
    var prevEnd = 0L
    var gapTotal = 0L
    jobs.foreach { case (jid, t0j, t1j, desc) =>
      val gap = if (prevEnd == 0L) 0L else math.max(0L, t0j - prevEnd)
      gapTotal += gap
      val jStages = stages.filter(_.jobId == jid)
      println(f"[job $jid%3d] wall=${(t1j - t0j) / 1000.0}%6.2f s gapBefore=${gap / 1000.0}%5.2f s stages=${jStages.size} ${desc.take(60)}")
      jStages.foreach { s =>
        println(f"    [stage ${s.stageId}%4d] wall=${(s.completed - s.submitted) / 1000.0}%6.2f s taskSum=${s.taskMs / 1000.0}%7.2f s gc=${s.gcMs / 1000.0}%5.2f s spill=${s.spillBytes}%9d tasks=${s.tasks}%4d in=${s.inputRecs}%9d sr=${s.shufReadRecs}%9d sw=${s.shufWriteRecs}%9d  ${s.name.take(50)}")
      }
      prevEnd = math.max(prevEnd, t1j)
    }
    val jobWall = jobs.map { case (_, a, b, _) => b - a }.sum / 1000.0
    println(f"\n[profile] sum(job walls)=$jobWall%.2f s, sum(inter-job gaps)=${gapTotal / 1000.0}%.2f s, query wall=$wall%.2f s")
    spark.stop()
  }
}

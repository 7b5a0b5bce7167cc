package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` (initial plan) and, after one execution, the
  * final adaptive executed plan for registered queries — the evidence files
  * committed under plans/<round>/.
  *
  * usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <query...>
  * Writes <outDir>/<query>_<suffix>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSeq
    java.nio.file.Files.createDirectories(outDir)
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
        println(s"[plandump] warm-up failed ($label): $e")
      }
    warm("curation") { graft.ops.IceQueries.curation(spark, sfDir); () }
    warm("pair graph") { graft.ops.IceQueries.pairGraph(spark, sfDir); () }
    warm("lsh candidates") { graft.ops.IceQueries.lshCandidates(spark, sfDir); () }
    warm("incremental") { graft.ops.IceQueries.incremental(spark, sfDir); () }
    warm("ice fixtures") { graft.SparkEntry.queries.get("ice_time_travel")
      .foreach(_.apply(spark, sfDir).count()) }
    warm("ivf") { graft.SparkEntry.queries.get("sim_ann_ivf")
      .foreach(_.apply(spark, sfDir).count()) }
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[plandump] unknown query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val initial = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            val n = df.count()
            // after execution the adaptive plan is final: show it with the
            // runtime join strategies / AQEShuffleRead nodes
            val finalPlan = df.queryExecution.executedPlan.toString
            java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"),
              s"== $name ($suffix) rows=$n sfDir=$sfDir ==\n\n" +
                "---- explain(formatted), initial plan ----\n" + initial +
                "\n---- executed plan after run (AQE final where adaptive) ----\n" +
                finalPlan + "\n")
            println(s"[plandump] wrote $name rows=$n")
          } catch { case e: Throwable =>
            println(s"[plandump] $name FAILED: $e")
          }
          graft.ops.CacheRegistry.releaseAll()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}

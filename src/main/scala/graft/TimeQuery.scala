package graft

import org.apache.spark.sql.SparkSession

/** Times one registered query in a warm session: builds the shared fixtures
  * untimed (exactly like Bench's warm-up), then runs the query `reps` times
  * and prints each wall time. For isolating whether a bench swing is the
  * PLAN or the machine — run it twice an hour apart and compare.
  *
  * Usage: runMain graft.TimeQuery <sfDir> <queryName> [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.prepare(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // a failed warm-up would silently shift the fixture (re)build into the
    // first timed rep — corrupting exactly the comparison this tool makes —
    // so report it loudly instead of swallowing
    def warm(label: String)(body: => Unit): Unit =
      try body catch { case e: Throwable =>
        println(s"[time] WARM-UP FAILED ($label): $e — rep 1 will include fixture builds")
      }
    warm("curation") { graft.ops.IceQueries.curation(spark, sfDir); () }
    warm("pair graph") { graft.ops.IceQueries.pairGraph(spark, sfDir); () }
    warm("lsh candidates") { graft.ops.IceQueries.lshCandidates(spark, sfDir); () }
    warm("incremental") { graft.ops.IceQueries.incremental(spark, sfDir); () }
    warm("ice fixtures") { SparkEntry.queries.get("ice_time_travel")
      .foreach(_.apply(spark, sfDir).count()) }
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[time] $name rep=$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.ops.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}

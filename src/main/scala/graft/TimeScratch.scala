package graft

import org.apache.spark.sql.SparkSession

/** Timing harness for individual registered queries:
  * `runMain graft.TimeScratch <query-name>...` (SF via SPARK_GRAFT_SF_DIR).
  */
object TimeScratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.prepare(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=$n")
      graft.ops.CacheRegistry.releaseAll()
    }
    time("warmup")(spark.read.parquet(s"$sfDir/documents.parquet").count())
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) => time(name)(fn(spark, sfDir).count())
        case None => println(s"[scratch] unknown query: $name")
      }
    }
    spark.stop()
  }
}

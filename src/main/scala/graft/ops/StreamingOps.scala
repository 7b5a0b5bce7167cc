package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming operators registered in the correctness gate: the
  * query fn runs a REAL streaming job (file source → watermark → windowed
  * aggregation → memory sink) to completion and returns the sink table, so
  * the DuckDB oracle checks the streaming semantics against batch SQL.
  */
object StreamingOps {

  /** Hourly tumbling-window event counts computed by a streaming job with a
    * 1-hour watermark (complete mode: all windows surface at end of input).
    */
  def streamedHourlyCounts(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet") // batch read for the schema
    // the streaming file source monitors a DIRECTORY; stage the table file
    // into one (symlink — no data copy)
    val srcDir = java.nio.file.Files.createTempDirectory("stream-events")
    java.nio.file.Files.createSymbolicLink(
      srcDir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val stream = spark.readStream.schema(raw.schema).parquet(srcDir.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val sinkName = s"stream_hourly_${math.abs(dir.hashCode)}"
    val q = stream.writeStream
      .format("memory")
      .queryName(sinkName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(sinkName)
      .select(col("window.start").as("hour"), col("event_type"), col("n_events"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "stream_events_hourly",
      (s, dir) => streamedHourlyCounts(s, dir),
      Some("""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
          CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2"""))
  )
}

package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession

/** Test-owned TIMESTAMP(NANOS) events fixture.
  *
  * The v3 `timestamp_ns` specs (reference `types.go:704-716`) need a parquet
  * file whose `ts` column is physically annotated TIMESTAMP(NANOS) — the
  * type Spark's vectorized reader surfaces as LongType under
  * `spark.sql.legacy.parquet.nanosAsLong`. The driver's `events.parquet` has
  * shipped both as nanos and as plain µs across testdata regenerations, so
  * tests of the NANOS path must not depend on it; this helper rewrites the
  * driver events (whatever unit they arrive in, normalized via `QueryDef.t`)
  * into a self-generated NANOS file using the parquet-hadoop example writer
  * (Spark itself cannot write TIMESTAMP(NANOS)).
  */
object NanosEventsFixture {

  private val cache = new ConcurrentHashMap[String, String]()

  /** Path of a single-file TIMESTAMP(NANOS) copy of `$sfDir/events.parquet`
    * (same columns/values; `ts` carries the identical instant in ns). Built
    * once per JVM per sfDir.
    */
  def path(spark: SparkSession, sfDir: String): String =
    cache.computeIfAbsent(sfDir, _ => write(spark, sfDir))

  private def write(spark: SparkSession, sfDir: String): String = {
    // normalize to a µs timestamp regardless of the source file's unit, then
    // pull plain JVM values (session tz is UTC in every suite, so the
    // ntz→timestamp cast inside unix_micros is lossless)
    val rows = graft.ops.QueryDef.t(spark, sfDir, "events")
      .selectExpr("event_id", "unix_micros(cast(ts as timestamp)) AS ts_us",
        "user_id", "event_type", "value", "props")
      .collect()

    val schema: MessageType = Types.buildMessage()
      .optional(INT64).named("event_id")
      .optional(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, LogicalTypeAnnotation.TimeUnit.NANOS))
      .named("ts")
      .optional(INT64).named("user_id")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .optional(DOUBLE).named("value")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")

    val dir = java.nio.file.Files.createTempDirectory("graft-events-ns")
    val file = dir.resolve("events.parquet").toString
    val conf = new Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter.builder(new HPath(file))
      .withConf(conf).withType(schema).build()
    val factory = new SimpleGroupFactory(schema)
    try rows.foreach { r =>
      val g = factory.newGroup()
      if (!r.isNullAt(0)) g.append("event_id", r.getLong(0))
      if (!r.isNullAt(1)) g.append("ts", r.getLong(1) * 1000L)
      if (!r.isNullAt(2)) g.append("user_id", r.getLong(2))
      if (!r.isNullAt(3)) g.append("event_type", r.getString(3))
      if (!r.isNullAt(4)) g.append("value", r.getDouble(4))
      if (!r.isNullAt(5)) g.append("props", r.getString(5))
      writer.write(g)
    } finally writer.close()
    file
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.meta.FileCatalog
import graft.table.IceTable

/** Streaming SOURCE over an IceTable: each committed snapshot becomes
  * micro-batch input, offsets are table sequence numbers, and a batch plans
  * the appended files of `(start, end]` through the incremental scan —
  * making the table both a streaming sink (foreachBatch `Ingest.appendStream`)
  * and a streaming source.
  *
  *   spark.readStream.format("graft.streaming.IceTableSourceProvider")
  *     .option("warehouse", wh).option("table", name).load()
  *
  * The checkpoint persists the last committed sequence number, so a
  * restarted query resumes exactly after the snapshots it already consumed.
  */
final class IceTableSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-iceberg"

  private def load(parameters: Map[String, String]): IceTable = {
    def req(k: String) = parameters.getOrElse(k,
      throw new IllegalArgumentException(s"option '$k' is required"))
    IceTable.load(new FileCatalog(req("warehouse")), req("table"))
  }

  override def sourceSchema(sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), load(parameters).schema.toSpark)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new IceTableSource(sqlContext, load(parameters))
}

final class IceTableSource(sqlContext: SQLContext, table: IceTable) extends Source {

  override def schema: StructType = table.schema.toSpark

  /** Latest committed sequence number (None until the first snapshot). */
  override def getOffset: Option[Offset] = {
    table.refresh()
    table.metadata.snapshots.map(_.sequenceNumber).maxOption.map(LongOffset(_))
  }

  private def seqOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json().trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    table.refresh()
    org.apache.spark.sql.graftshim.GraftShim.asStreaming(
      Ingest.changesBetween(sqlContext.sparkSession, table,
        start.map(seqOf).getOrElse(0L), seqOf(end)))
  }

  override def stop(): Unit = ()
}

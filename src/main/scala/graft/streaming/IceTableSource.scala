package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxFiles,
  SupportsAdmissionControl, SupportsTriggerAvailableNow, Offset => OffsetV2}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.meta.{FileCatalog, FileIO}
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
  *
  * `max-snapshots-per-trigger` paces catch-up: without it a consumer that
  * falls behind (or a fresh one over a long-lived table) gets EVERY pending
  * snapshot as one giant batch — at scale that batch is the whole backlog.
  * With it, the offered offset advances at most N committed sequence
  * numbers past the last batch this source handed out, so the engine drains
  * the backlog as bounded micro-batches. The source implements the
  * admission-control surface (`SupportsAdmissionControl` +
  * `SupportsTriggerAvailableNow`, the FileStreamSource pattern), so
  * `Trigger.AvailableNow` freezes the offset range at query start, drains
  * it — in paced batches when a limit is set — and terminates.
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
    new IceTableSource(sqlContext, load(parameters),
      parameters.get("max-snapshots-per-trigger").map(_.toInt), metadataPath)
}

final class IceTableSource(sqlContext: SQLContext, table: IceTable,
    maxSnapshotsPerTrigger: Option[Int] = None, metadataPath: String = "")
  extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  override def schema: StructType = table.schema.toSpark

  /** AvailableNow freezes the range at query start: snapshots committed
    * after `prepareForTriggerAvailableNow` wait for the next run.
    */
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    table.refresh()
    availableNowCap = mainSeqs().maxOption
  }

  override def getDefaultReadLimit: ReadLimit =
    maxSnapshotsPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** Sequence numbers on MAIN's ancestry only. Enumerating ALL snapshots
    * would advance the pacing floor past a WAP/branch-only snapshot's
    * sequence number while getBatch (main-ancestry diff) delivers nothing
    * for it — and when fastForwardMain later publishes that snapshot
    * KEEPING its sequence number, the floor already sits past it and its
    * rows are silently never delivered.
    */
  private def mainSeqs(): Seq[Long] =
    Ingest.mainAncestry(table.metadata).map(_.sequenceNumber).distinct.sorted

  private def committedSeqs(): Seq[Long] = {
    table.refresh()
    val all = mainSeqs()
    availableNowCap.fold(all)(cap => all.filter(_ <= cap))
  }

  /** Admission-control offer: at most `limit` sequence numbers past the
    * pacing floor (a ReadMaxFiles limit counts SNAPSHOTS here). Null means
    * nothing to offer, which under AvailableNow terminates the query.
    */
  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val seqs = committedSeqs()
    if (seqs.isEmpty) return null
    val pending = seqs.filter(_ > pacedFloor)
    val end = limit match {
      case rl: ReadMaxFiles if pending.nonEmpty => pending.take(rl.maxFiles).last
      case _ => seqs.last
    }
    val resolved = math.max(end, pacedFloor)
    if (resolved <= 0L) null else LongOffset(resolved)
  }

  override def reportLatestOffset(): OffsetV2 =
    committedSeqs().lastOption.map(LongOffset(_)).orNull

  /** Pacing floor: the highest sequence number a batch has been PLANNED for.
    * Advanced (and persisted under the source's checkpoint metadata dir) only
    * in `getBatch` — after the engine has WAL-logged the batch — so a crash
    * between offer and plan replays rather than skips. A fresh source starts
    * at 0; a restarted one reads the floor back and keeps pacing, never
    * re-offering sequence numbers at or below what the engine already ran.
    */
  @volatile private var pacedFloor: Long = readFloor()

  /** Next offset: the newest committed sequence number, clamped to at most
    * `max-snapshots-per-trigger` distinct sequence numbers past the floor.
    */
  override def getOffset: Option[Offset] = {
    table.refresh()
    val seqs = mainSeqs()
    if (seqs.isEmpty) None
    else {
      val pending = seqs.filter(_ > pacedFloor)
      val end = maxSnapshotsPerTrigger match {
        case Some(n) if pending.nonEmpty => pending.take(n).last
        case _ => seqs.last
      }
      Some(LongOffset(math.max(end, pacedFloor)))
    }
  }

  private def seqOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json().trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    table.refresh()
    val endSeq = seqOf(end)
    if (endSeq > pacedFloor) { pacedFloor = endSeq; writeFloor(endSeq) }
    org.apache.spark.sql.graftshim.GraftShim.asStreaming(
      Ingest.changesBetween(sqlContext.sparkSession, table,
        start.map(seqOf).getOrElse(0L), endSeq))
  }

  override def stop(): Unit = ()

  private def floorFile: Option[Path] =
    if (metadataPath.isEmpty) None
    else Some(new Path(metadataPath, "graft-last-batch-end"))

  /** Tolerant read: a crash mid-write must not wedge every restart with a
    * parse error. An empty/garbled floor degrades to 0 — the floor is a
    * pacing optimization layered UNDER the engine's own offset WAL, so a
    * too-low floor only re-offers a range the engine dedupes, never skips.
    */
  private def readFloor(): Long = floorFile.fold(0L) { p =>
    val fs = p.getFileSystem(FileIO.conf)
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        .trim.toLongOption.getOrElse(0L)
      finally in.close()
    }
  }

  /** Atomic: write a temp sibling, then rename over the floor file — a JVM
    * kill between create-with-truncate and write left a 0-byte file.
    */
  private def writeFloor(v: Long): Unit = floorFile.foreach { p =>
    val fs = p.getFileSystem(FileIO.conf)
    val tmp = new Path(p.getParent, s"${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"cannot persist pacing floor to $p")
  }
}

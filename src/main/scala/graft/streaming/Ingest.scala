package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.meta.ManifestIO
import graft.table.IceTable

/** Streaming surface (reference §2.9: append-stream ingest +
  * incremental snapshot consumption).
  *
  * Ingest is Structured Streaming's micro-batch model composed with the
  * table's transactional append: each micro-batch commits one snapshot
  * (exactly-once per batch via the checkpoint + idempotent CAS commit).
  * The read side exposes "changes since snapshot S" by planning only
  * manifests with a later sequence number — no data rewrite, no full scan.
  */
object Ingest {

  /** foreachBatch append: every micro-batch becomes one table snapshot. */
  def appendStream(stream: DataFrame, table: IceTable, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) { table.append(batch); () }
      }
      .start()

  /** Rows appended after `sinceSnapshotId` (exclusive) — the reference's
    * incremental APPEND scan semantics. Three guards keep this exact:
    * entries must have status Added (a merge-append or compaction writes a
    * NEW-sequence manifest full of Existing entries for old rows, which a
    * manifest-level filter alone would re-emit); the entry-level sequence
    * number must be past `sinceSeq`; and the snapshot that added the entry
    * must be an `append` (compaction re-Adds old rows under a `replace`
    * snapshot). Snapshots that logically changed rows (`overwrite`/`delete`)
    * cannot be represented as appends → abort.
    */
  def changesSince(spark: SparkSession, table: IceTable, sinceSnapshotId: Long): DataFrame = {
    val sinceSeq = table.metadata.snapshotById(sinceSnapshotId)
      .map(_.sequenceNumber)
      .getOrElse(throw new IllegalArgumentException(s"no snapshot $sinceSnapshotId"))
    changesBetween(spark, table, sinceSeq, Long.MaxValue)
  }

  /** Rows appended by snapshots with sequence number in (sinceSeq, untilSeq]
    * — the offset-range form consumed by the streaming source, planned
    * against the manifest list of the snapshot AT `untilSeq` so a batch is
    * stable even when later commits land mid-read.
    *
    * `sinceSeq <= 0` means "from before the first snapshot" (a fresh
    * consumer, streaming offset None): that batch is a FULL REPLAY — the
    * complete `until` snapshot through the normal scan — not a manifest
    * diff. A diff would lose compacted history: a `replace` snapshot
    * rewrites prior appends into files it marks Existing / owns itself, so
    * the Added-by-an-append filter below can never reconstruct the table
    * from sequence 0. For the same reason a `replace` INSIDE a genuine
    * incremental range aborts like overwrite/delete: rows appended after
    * `sinceSeq` and then compacted vanish from the until-snapshot's
    * manifest list, so the diff cannot be represented as pure appends.
    */
  def changesBetween(spark: SparkSession, table: IceTable,
      sinceSeq: Long, untilSeq: Long): DataFrame = {
    val meta = table.metadata
    val until = meta.snapshots.filter(_.sequenceNumber <= untilSeq)
      .maxByOption(_.sequenceNumber)
      .getOrElse(return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), table.schema.toSpark))
    if (sinceSeq <= 0L)
      return table.newScan(snapshotId = Some(until.snapshotId)).toDF(spark)
    val opOf: Map[Long, String] =
      meta.snapshots.map(s => s.snapshotId -> s.summary.getOrElse("operation", "append")).toMap
    val rowChanging = meta.snapshots.filter(s => s.sequenceNumber > sinceSeq &&
      s.sequenceNumber <= until.sequenceNumber &&
      Set("overwrite", "delete", "replace").contains(opOf(s.snapshotId)))
    if (rowChanging.nonEmpty)
      throw new IllegalStateException(
        s"cannot read incrementally across row-changing snapshots: " +
          rowChanging.map(s => s"${s.snapshotId}(${opOf(s.snapshotId)})").mkString(", "))
    val newFiles = ManifestIO.readManifestList(until.manifestList)
      .filter(m => m.content == 0 && m.sequenceNumber > sinceSeq)
      .flatMap { m =>
        ManifestIO.readManifest(m.path, meta.specs, table.schema)._2
          .filter { e =>
            val seq = e.sequenceNumber.getOrElse(m.sequenceNumber)
            e.status == graft.meta.ManifestEntryStatus.Added &&
              seq > sinceSeq && seq <= until.sequenceNumber &&
              opOf.get(e.snapshotId).forall(_ == "append")
          }
          .map(_.dataFile.filePath)
      }
    if (newFiles.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        table.schema.toSpark)
    else {
      graft.GraftSession.ensurePrepared(spark)
      spark.read.schema(table.schema.toSpark).parquet(newFiles: _*)
    }
  }
}

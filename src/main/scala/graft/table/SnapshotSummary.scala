package graft.table

import scala.collection.mutable

import graft.core.IceSchema
import graft.meta.{DataFile, PartitionSpec}

/** Snapshot-summary metrics (reference `table/snapshots.go:60-500`):
  * the per-commit added/removed breakdown by file content kind, optional
  * per-partition change summaries capped by `write.summary.partition-limit`,
  * and the running totals carried forward from the parent snapshot.
  *
  * Key discipline mirrors the reference exactly: per-commit deltas are
  * written only when positive (`setWhenPositive`, snapshots.go:151-155);
  * the six running totals are always written (updateSnapshotSummaries,
  * snapshots.go:445-495) so downstream stats readers never probe for them.
  */
object SnapshotSummary {

  /** `write.summary.partition-limit` (reference `properties.go:67-68`):
    * per-partition summaries are emitted only when the commit touched at
    * most this many partitions. Default 0 = count only, no per-partition
    * rows — at 100 TB a commit can touch millions of partitions and the
    * summary must stay metadata-sized.
    */
  val PartitionLimitKey = "write.summary.partition-limit"
  val PartitionLimitDefault = 0

  private val ChangedPartitionCount = "changed-partition-count"
  private val ChangedPartitionPrefix = "partitions."

  /** One side's counters (reference `updateMetrics`, snapshots.go:89-150). */
  private final class Metrics {
    var addedFileSize, removedFileSize = 0L
    var addedDataFiles, removedDataFiles = 0L
    var addedEqDeleteFiles, removedEqDeleteFiles = 0L
    var addedPosDeleteFiles, removedPosDeleteFiles = 0L
    var addedDeleteFiles, removedDeleteFiles = 0L
    var addedRecords, deletedRecords = 0L
    var addedPosDeletes, removedPosDeletes = 0L
    var addedEqDeletes, removedEqDeletes = 0L

    def add(df: DataFile): Unit = {
      addedFileSize += df.fileSizeInBytes
      df.content match {
        case 0 => addedDataFiles += 1; addedRecords += df.recordCount
        case 1 =>
          addedDeleteFiles += 1; addedPosDeleteFiles += 1
          addedPosDeletes += df.recordCount
        case 2 =>
          addedDeleteFiles += 1; addedEqDeleteFiles += 1
          addedEqDeletes += df.recordCount
        case other => throw new IllegalArgumentException(s"unknown content: $other")
      }
    }

    def remove(df: DataFile): Unit = {
      removedFileSize += df.fileSizeInBytes
      df.content match {
        case 0 => removedDataFiles += 1; deletedRecords += df.recordCount
        case 1 =>
          removedDeleteFiles += 1; removedPosDeleteFiles += 1
          removedPosDeletes += df.recordCount
        case 2 =>
          removedDeleteFiles += 1; removedEqDeleteFiles += 1
          removedEqDeletes += df.recordCount
        case other => throw new IllegalArgumentException(s"unknown content: $other")
      }
    }

    def toProps: Map[String, String] = {
      val b = Map.newBuilder[String, String]
      def set(key: String, v: Long): Unit = if (v > 0) b += key -> v.toString
      set("added-files-size", addedFileSize)
      set("removed-files-size", removedFileSize)
      set("added-data-files", addedDataFiles)
      set("deleted-data-files", removedDataFiles)
      set("added-delete-files", addedDeleteFiles)
      set("added-position-delete-files", addedPosDeleteFiles)
      set("added-equality-delete-files", addedEqDeleteFiles)
      set("removed-delete-files", removedDeleteFiles)
      set("removed-position-delete-files", removedPosDeleteFiles)
      set("removed-equality-delete-files", removedEqDeleteFiles)
      set("added-records", addedRecords)
      set("deleted-records", deletedRecords)
      set("added-position-deletes", addedPosDeletes)
      set("removed-position-deletes", removedPosDeletes)
      set("added-equality-deletes", addedEqDeletes)
      set("removed-equality-deletes", removedEqDeletes)
      b.result()
    }
  }

  /** Accumulates one commit's file changes (reference
    * `SnapshotSummaryCollector`, snapshots.go:358-443). Partition metrics
    * key on the human partition path of the file's OWN spec — a commit can
    * legally mix specs after partition evolution.
    */
  final class Collector(partitionLimit: Int) {
    private val metrics = new Metrics
    private val partitionMetrics = mutable.LinkedHashMap.empty[String, Metrics]
    var addedDataRecords: Long = 0L // drives v3 row-lineage advance

    private def partMetrics(df: DataFile, spec: PartitionSpec, schema: IceSchema) =
      if (df.partition.isEmpty) None
      else Some(partitionMetrics.getOrElseUpdate(
        spec.partitionToPath(df.partition, schema), new Metrics))

    def addFile(df: DataFile, spec: PartitionSpec, schema: IceSchema): Unit = {
      metrics.add(df)
      if (df.content == 0) addedDataRecords += df.recordCount
      partMetrics(df, spec, schema).foreach(_.add(df))
    }

    def removeFile(df: DataFile, spec: PartitionSpec, schema: IceSchema): Unit = {
      metrics.remove(df)
      partMetrics(df, spec, schema).foreach(_.remove(df))
    }

    /** Per-commit delta props: the positive counters, plus
      * `changed-partition-count` and — only when the count stays within
      * the limit — one `partitions.<path>` row per touched partition with
      * its own sorted `k=v` mini-summary (snapshots.go:419-443).
      */
    def build(): Map[String, String] = {
      val b = Map.newBuilder[String, String]
      b ++= metrics.toProps
      if (partitionMetrics.nonEmpty) {
        b += ChangedPartitionCount -> partitionMetrics.size.toString
        if (partitionMetrics.size <= partitionLimit)
          partitionMetrics.foreach { case (path, m) =>
            val summary = m.toProps.toSeq.map { case (k, v) => s"$k=$v" }.sorted
            if (summary.nonEmpty)
              b += s"$ChangedPartitionPrefix$path" -> summary.mkString(",")
          }
      }
      b.result()
    }
  }

  private val totals = Seq(
    ("total-data-files", "added-data-files", "deleted-data-files"),
    ("total-delete-files", "added-delete-files", "removed-delete-files"),
    ("total-records", "added-records", "deleted-records"),
    ("total-files-size", "added-files-size", "removed-files-size"),
    ("total-position-deletes", "added-position-deletes", "removed-position-deletes"),
    ("total-equality-deletes", "added-equality-deletes", "removed-equality-deletes"))

  /** Fold the commit deltas into the parent's running totals (reference
    * `updateSnapshotSummaries`, snapshots.go:445-495): each total = parent
    * total + added - removed, floored at stay-unwritten when negative
    * (the reference skips the write; we inherit the parent value then,
    * which the reference's GetInt default also resolves to).
    */
  def withTotals(deltas: Map[String, String],
      parent: Map[String, String]): Map[String, String] = {
    def get(m: Map[String, String], k: String) =
      m.get(k).flatMap(_.toLongOption).getOrElse(0L)
    val b = Map.newBuilder[String, String]
    b ++= deltas
    totals.foreach { case (total, added, removed) =>
      val v = get(parent, total) + get(deltas, added) - get(deltas, removed)
      b += total -> math.max(v, 0L).toString
    }
    b.result()
  }
}

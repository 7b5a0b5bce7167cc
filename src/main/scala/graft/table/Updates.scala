package graft.table

import graft.core.IceSchema
import graft.meta._

/** Typed metadata updates (reference `table/updates.go:130-560`): each is a
  * pure `TableMetadata => TableMetadata` step; a commit folds its update
  * list over the (possibly refreshed) current metadata, which is what lets
  * [[IceTable.commitUpdates]] rebase over non-conflicting concurrent
  * commits — the updates re-apply cleanly to the winner's metadata.
  */
sealed trait TableUpdate {
  def apply(m: TableMetadata): TableMetadata
}

final case class AssignUUID(uuid: String) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata = m.copy(tableUuid = uuid)
}

final case class UpgradeFormatVersion(version: Int) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata = {
    require(version >= m.formatVersion, s"cannot downgrade v${m.formatVersion} to v$version")
    require(version <= 3, s"unsupported format version $version")
    // entering v3 starts the row-lineage counter (next-row-id is required)
    m.copy(formatVersion = version,
      nextRowId = if (version >= 3) m.nextRowId.orElse(Some(0L)) else m.nextRowId)
  }
}

final case class AddSchema(schema: IceSchema, newLastColumnId: Int) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata = {
    require(!m.schemas.exists(_.schemaId == schema.schemaId),
      s"schema ${schema.schemaId} already exists")
    m.copy(schemas = m.schemas :+ schema,
      lastColumnId = math.max(m.lastColumnId, newLastColumnId))
  }
}

/** schemaId -1 selects the highest (= most recently added) schema. */
final case class SetCurrentSchema(schemaId: Int) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata = {
    val id = if (schemaId == -1) m.schemas.map(_.schemaId).max else schemaId
    require(m.schemas.exists(_.schemaId == id), s"no schema $id")
    m.copy(currentSchemaId = id)
  }
}

final case class AddPartitionSpec(spec: PartitionSpec) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata = {
    require(!m.specs.exists(_.specId == spec.specId), s"spec ${spec.specId} already exists")
    m.copy(specs = m.specs :+ spec,
      lastPartitionId = math.max(m.lastPartitionId, spec.lastAssignedFieldId))
  }
}

/** specId -1 selects the highest (= most recently added) spec. */
final case class SetDefaultSpec(specId: Int) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata = {
    val id = if (specId == -1) m.specs.map(_.specId).max else specId
    require(m.specs.exists(_.specId == id), s"no spec $id")
    m.copy(defaultSpecId = id)
  }
}

final case class AddSortOrder(order: SortOrder) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata = {
    require(!m.sortOrders.exists(_.orderId == order.orderId),
      s"sort order ${order.orderId} already exists")
    m.copy(sortOrders = m.sortOrders :+ order)
  }
}

/** orderId -1 selects the highest (= most recently added) order. */
final case class SetDefaultSortOrder(orderId: Int) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata = {
    val id = if (orderId == -1) m.sortOrders.map(_.orderId).max else orderId
    require(m.sortOrders.exists(_.orderId == id), s"no sort order $id")
    m.copy(defaultSortOrderId = id)
  }
}

final case class AddSnapshotUpdate(snapshot: Snapshot) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata = {
    require(!m.snapshots.exists(_.snapshotId == snapshot.snapshotId),
      s"snapshot ${snapshot.snapshotId} already exists")
    require(snapshot.sequenceNumber > m.lastSequenceNumber,
      s"sequence number ${snapshot.sequenceNumber} not after ${m.lastSequenceNumber}")
    m.copy(snapshots = m.snapshots :+ snapshot,
      lastSequenceNumber = snapshot.sequenceNumber,
      snapshotLog = m.snapshotLog :+
        SnapshotLogEntry(snapshot.timestampMs, snapshot.snapshotId))
  }
}

final case class SetSnapshotRefUpdate(name: String, snapshotId: Long,
    refType: String) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata = {
    require(m.snapshots.exists(_.snapshotId == snapshotId), s"no snapshot $snapshotId")
    val base = m.copy(refs = m.refs + (name -> SnapshotRef(snapshotId, refType)))
    if (name == "main" && !m.currentSnapshotId.contains(snapshotId))
      // moving main IS a current-state change: without a snapshot-log entry
      // a subsequent as-of-timestamp scan resolves to the pre-move snapshot
      // and time travel "sees through" the rollback
      base.copy(currentSnapshotId = Some(snapshotId),
        snapshotLog = m.snapshotLog :+
          SnapshotLogEntry(System.currentTimeMillis(), snapshotId))
    else if (name == "main") base.copy(currentSnapshotId = Some(snapshotId))
    else base
  }
}

final case class RemoveSnapshotRefUpdate(name: String) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata = {
    require(name != "main", "cannot remove main")
    m.copy(refs = m.refs - name)
  }
}

final case class RemoveSnapshots(snapshotIds: Set[Long]) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata = {
    require(!m.currentSnapshotId.exists(snapshotIds.contains), "cannot remove current snapshot")
    require(!m.refs.values.exists(r => snapshotIds.contains(r.snapshotId)),
      "cannot remove a referenced snapshot")
    m.copy(snapshots = m.snapshots.filterNot(s => snapshotIds.contains(s.snapshotId)),
      snapshotLog = m.snapshotLog.filterNot(e => snapshotIds.contains(e.snapshotId)),
      // statistics must reference live snapshots (expireSnapshots keeps the
      // same invariant); dangling entries are spec-invalid and pin the
      // stats files away from orphan cleanup forever
      statistics = m.statistics.filterNot(s => snapshotIds.contains(s.snapshotId)),
      partitionStatistics =
        m.partitionStatistics.filterNot(s => snapshotIds.contains(s.snapshotId)))
  }
}

final case class SetLocation(location: String) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata = m.copy(location = location)
}

final case class SetProperties(props: Map[String, String]) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata =
    m.copy(properties = m.properties ++ props)
}

final case class RemoveProperties(keys: Seq[String]) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata =
    m.copy(properties = m.properties -- keys)
}

/** `set-statistics` (Iceberg REST update type; at most one file per
  * snapshot, replace-on-set).
  */
final case class SetStatisticsUpdate(file: StatisticsFile) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata =
    m.copy(statistics =
      m.statistics.filterNot(_.snapshotId == file.snapshotId) :+ file)
}

final case class RemoveStatisticsUpdate(snapshotId: Long) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata =
    m.copy(statistics = m.statistics.filterNot(_.snapshotId == snapshotId))
}

final case class SetPartitionStatisticsUpdate(file: PartitionStatisticsFile)
    extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata =
    m.copy(partitionStatistics =
      m.partitionStatistics.filterNot(_.snapshotId == file.snapshotId) :+ file)
}

final case class RemovePartitionStatisticsUpdate(snapshotId: Long) extends TableUpdate {
  def apply(m: TableMetadata): TableMetadata =
    m.copy(partitionStatistics =
      m.partitionStatistics.filterNot(_.snapshotId == snapshotId))
}

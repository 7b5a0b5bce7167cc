package graft.table

import graft.meta.TableMetadata

/** Typed commit preconditions (reference `table/requirements.go:106-317`):
  * each asserts one aspect of the table state a commit depends on. Validated
  * against the CURRENT metadata before every CAS attempt — including after a
  * conflict-triggered refresh — so commits whose preconditions still hold
  * compose with concurrent changes (a schema change rebases over an append)
  * while semantic conflicts (two schema changes) fail explicitly instead of
  * racing the whole-version CAS.
  */
sealed trait TableRequirement {
  /** An error message when the requirement is violated by `m`, else None. */
  def validate(m: TableMetadata): Option[String]
}

/** The table must not exist yet (reference `table/requirements.go:108-127`):
  * the guard on the commit that materializes a staged create-table. There
  * is only current metadata to validate against when the table DOES exist,
  * so validation of this requirement always fails — exactly one of two
  * racing creates ever reaches a state with no metadata to validate.
  */
case object AssertCreate extends TableRequirement {
  def validate(m: TableMetadata): Option[String] =
    Some("requirement assert-create failed: table already exists")
}

final case class AssertTableUUID(uuid: String) extends TableRequirement {
  def validate(m: TableMetadata): Option[String] =
    if (m.tableUuid == uuid) None
    else Some(s"table UUID changed: expected $uuid, found ${m.tableUuid}")
}

/** The named ref must point at the given snapshot (None = must not exist). */
final case class AssertRefSnapshotID(ref: String, snapshotId: Option[Long])
    extends TableRequirement {
  def validate(m: TableMetadata): Option[String] = {
    val actual =
      if (ref == "main") m.currentSnapshotId else m.refs.get(ref).map(_.snapshotId)
    if (actual == snapshotId) None
    else Some(s"ref $ref moved: expected $snapshotId, found $actual")
  }
}

final case class AssertCurrentSchemaID(schemaId: Int) extends TableRequirement {
  def validate(m: TableMetadata): Option[String] =
    if (m.currentSchemaId == schemaId) None
    else Some(s"current schema changed: expected $schemaId, found ${m.currentSchemaId}")
}

final case class AssertDefaultSpecID(specId: Int) extends TableRequirement {
  def validate(m: TableMetadata): Option[String] =
    if (m.defaultSpecId == specId) None
    else Some(s"default spec changed: expected $specId, found ${m.defaultSpecId}")
}

final case class AssertLastAssignedFieldID(fieldId: Int) extends TableRequirement {
  def validate(m: TableMetadata): Option[String] =
    if (m.lastColumnId == fieldId) None
    else Some(s"last column id moved: expected $fieldId, found ${m.lastColumnId}")
}

final case class AssertLastAssignedPartitionID(partitionId: Int) extends TableRequirement {
  def validate(m: TableMetadata): Option[String] =
    if (m.lastPartitionId == partitionId) None
    else Some(s"last partition id moved: expected $partitionId, found ${m.lastPartitionId}")
}

final case class AssertDefaultSortOrderID(orderId: Int) extends TableRequirement {
  def validate(m: TableMetadata): Option[String] =
    if (m.defaultSortOrderId == orderId) None
    else Some(s"default sort order changed: expected $orderId, found ${m.defaultSortOrderId}")
}

/** Raised when a commit's requirements are violated by the current table
  * state — a SEMANTIC conflict, as opposed to the catalog's version CAS
  * (which a rebase can win when requirements still hold).
  */
final class RequirementFailedException(msg: String)
  extends RuntimeException(msg)

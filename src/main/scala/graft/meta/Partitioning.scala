package graft.meta

import graft.core._

/** Partition spec + sort order metadata (reference `partitions.go:44-229`,
  * `table/sorting.go:53-141`). Partition field IDs are assigned from 1000.
  */
final case class PartitionField(sourceId: Int, fieldId: Int, name: String, transform: Transform)

final case class PartitionSpec(specId: Int, fields: Seq[PartitionField]) {
  def isUnpartitioned: Boolean = fields.isEmpty

  /** The partition-tuple struct for this spec against a schema
    * (reference `partitions.go:421`).
    */
  def partitionType(schema: IceSchema): IceStructType =
    IceStructType(fields.map { pf =>
      val src = schema.findById(pf.sourceId).getOrElse(
        throw new IllegalArgumentException(s"spec $specId: no source field ${pf.sourceId}"))
      NestedField(pf.fieldId, pf.name, pf.transform.resultType(src.tpe))
    })

  /** Hive-style partition path, e.g. `l_shipdate_day=2017-11-16/part=3`
    * (reference `partitions.go:447` PartitionToPath).
    */
  def partitionToPath(values: Seq[Any], schema: IceSchema): String =
    fields.zip(values).map { case (pf, v) =>
      val src = schema.findById(pf.sourceId).get
      val human = pf.transform.toHumanString(src.tpe, v)
      s"${sanitize(pf.name)}=${sanitize(human)}"
    }.mkString("/")

  private def sanitize(s: String): String =
    s.flatMap {
      case c if (c.isLetterOrDigit && c < 0x80) || c == '-' || c == '_' || c == '.' =>
        c.toString
      case c =>
        // escape each UTF-8 BYTE (Hive convention): "%02X" over a raw code
        // unit emits 3-4 hex digits for chars > 0xFF, which both collides
        // distinct values ("€" and " AC" -> "%20AC") and cannot be
        // decoded unambiguously
        c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          .map(b => "%%%02X".format(b & 0xFF)).mkString
    }

  def lastAssignedFieldId: Int = if (fields.isEmpty) 999 else fields.map(_.fieldId).max
}

object PartitionSpec {
  val Unpartitioned: PartitionSpec = PartitionSpec(0, Nil)

  /** Spec stamped on GLOBAL (cross-partition) delete manifests — positional
    * deletes, deletion vectors, and equality deletes that apply across the
    * whole table. On a PARTITIONED table spec id 0 is the partitioned spec,
    * so writing these as `Unpartitioned` (id 0) made the reader zip the
    * partitioned spec's fields against an EMPTY partition record and crash.
    * The sentinel id is never assigned by partition evolution (ids grow
    * incrementally from 0), so readers always fall back to the empty
    * partition type.
    */
  val GlobalDeletes: PartitionSpec = PartitionSpec(Int.MaxValue, Nil)

  val PartitionDataIdStart = 1000

  /** Build a spec with field IDs assigned from 1000 in order. */
  def of(specId: Int, fields: (String, Transform, String)*)(schema: IceSchema): PartitionSpec =
    PartitionSpec(specId, fields.zipWithIndex.map { case ((srcName, t, name), i) =>
      val src = schema.findByName(srcName).getOrElse(
        throw new IllegalArgumentException(s"no column $srcName"))
      PartitionField(src.id, PartitionDataIdStart + i, name, t)
    })
}

final case class SortField(sourceId: Int, transform: Transform,
    ascending: Boolean = true, nullsFirst: Boolean = true)

final case class SortOrder(orderId: Int, fields: Seq[SortField]) {
  def isUnsorted: Boolean = fields.isEmpty
}

object SortOrder {
  val Unsorted: SortOrder = SortOrder(0, Nil)
}

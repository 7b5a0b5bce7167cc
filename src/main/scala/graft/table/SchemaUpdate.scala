package graft.table

import graft.core._

/** Fluent schema-evolution builder (reference `table/update_schema.go`):
  * accumulates adds/renames/drops/promotions against the current schema and
  * commits them as one new schema version.
  */
final class SchemaUpdate private[table] (table: IceTable) {
  private var fields: Seq[NestedField] = table.schema.fields
  private var lastColumnId: Int = table.metadata.lastColumnId
  private var identifierIds: Option[Seq[Int]] = None

  def addColumn(name: String, tpe: IceType, doc: Option[String] = None): SchemaUpdate = {
    require(!fields.exists(_.name == name), s"column $name already exists")
    lastColumnId += 1
    val id = lastColumnId
    fields = fields :+ NestedField(id, name, reassignNestedIds(tpe),
      required = false, doc)
    this
  }

  /** Mint fresh IDs for every nested field of an incoming type (reference
    * `update_schema.go` assigns new IDs on add). Installing an incoming
    * struct/list/map verbatim would keep ITS field IDs, which can collide
    * with existing table column IDs — `IceSchema.byId` silently overwrites
    * on collision, so ID-based Parquet resolution would read the wrong
    * column.
    */
  private def reassignNestedIds(tpe: IceType): IceType = tpe match {
    case IceStructType(fs) =>
      IceStructType(fs.map { f =>
        lastColumnId += 1
        val id = lastColumnId
        f.copy(id = id, tpe = reassignNestedIds(f.tpe))
      })
    case IceListType(_, element, req) =>
      lastColumnId += 1
      val id = lastColumnId
      IceListType(id, reassignNestedIds(element), req)
    case IceMapType(_, key, _, value, req) =>
      lastColumnId += 1
      val kid = lastColumnId
      val k = reassignNestedIds(key)
      lastColumnId += 1
      val vid = lastColumnId
      IceMapType(kid, k, vid, reassignNestedIds(value), req)
    case primitive => primitive
  }

  /** Add an optional column with a default: files written before this
    * column return `default` (initial-default), and writers that omit the
    * column fill it with `default` (write-default). Reference
    * `update_schema.go` AddColumn + `types.go:182-191`.
    */
  def addColumnWithDefault(name: String, tpe: IceType, default: Any): SchemaUpdate = {
    require(!fields.exists(_.name == name), s"column $name already exists")
    lastColumnId += 1
    val id = lastColumnId
    fields = fields :+ NestedField(id, name, reassignNestedIds(tpe), required = false,
      doc = None, initialDefault = Some(default), writeDefault = Some(default))
    this
  }

  /** Reorder `name` to sit immediately before `anchor`. */
  def moveBefore(name: String, anchor: String): SchemaUpdate = move(name, anchor, after = false)

  /** Reorder `name` to sit immediately after `anchor`. */
  def moveAfter(name: String, anchor: String): SchemaUpdate = move(name, anchor, after = true)

  private def move(name: String, anchor: String, after: Boolean): SchemaUpdate = {
    require(name != anchor, "cannot move a column relative to itself")
    val moving = fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no column $name"))
    val rest = fields.filterNot(_.name == name)
    val i = rest.indexWhere(_.name == anchor)
    require(i >= 0, s"no column $anchor")
    val at = if (after) i + 1 else i
    fields = (rest.take(at) :+ moving) ++ rest.drop(at)
    this
  }

  /** Declare the row-identifier columns (reference SetIdentifierFields):
    * each must exist and be required.
    */
  def setIdentifierFields(names: String*): SchemaUpdate = {
    val ids = names.map { n =>
      val f = fields.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n"))
      require(f.required, s"identifier field $n must be required")
      f.id
    }
    identifierIds = Some(ids)
    this
  }

  def renameColumn(from: String, to: String): SchemaUpdate = {
    require(fields.exists(_.name == from), s"no column $from")
    require(!fields.exists(_.name == to), s"column $to already exists")
    fields = fields.map(f => if (f.name == from) f.copy(name = to) else f)
    this
  }

  def dropColumn(name: String): SchemaUpdate = {
    require(fields.exists(_.name == name), s"no column $name")
    fields = fields.filterNot(_.name == name)
    this
  }

  /** Widen a column's type; only spec-legal promotions are allowed. */
  def updateColumnType(name: String, to: IceType): SchemaUpdate = {
    val f = fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no column $name"))
    require(IceType.canPromote(f.tpe, to), s"cannot promote ${f.tpe} to $to")
    fields = fields.map(x => if (x.name == name) x.copy(tpe = to) else x)
    this
  }

  def makeOptional(name: String): SchemaUpdate = {
    require(fields.exists(_.name == name), s"no column $name")
    fields = fields.map(f => if (f.name == name) f.copy(required = false) else f)
    this
  }

  def moveFirst(name: String): SchemaUpdate = {
    val (m, rest) = fields.partition(_.name == name)
    require(m.nonEmpty, s"no column $name")
    fields = m ++ rest
    this
  }

  /** Merge another schema's fields by name (reference union-by-name,
    * `update_schema.go`): unknown names are added as optional columns with
    * fresh IDs, known names whose incoming type is a legal widening are
    * promoted, identical fields are left alone. Incompatible type changes
    * fail rather than silently narrowing.
    */
  def unionByName(incoming: IceSchema): SchemaUpdate = {
    incoming.fields.foreach { in =>
      fields.find(_.name == in.name) match {
        case None =>
          lastColumnId += 1
          val id = lastColumnId
          fields = fields :+ NestedField(id, in.name, reassignNestedIds(in.tpe),
            required = false)
        case Some(existing) if existing.tpe == in.tpe => ()
        case Some(existing) if IceType.canPromote(existing.tpe, in.tpe) =>
          fields = fields.map(f => if (f.name == in.name) f.copy(tpe = in.tpe) else f)
        case Some(existing) =>
          throw new IllegalArgumentException(
            s"cannot union ${in.name}: ${existing.tpe} is not promotable to ${in.tpe}")
      }
    }
    this
  }

  def commit(): Unit = table.commitNewSchema(fields, lastColumnId, identifierIds)
}

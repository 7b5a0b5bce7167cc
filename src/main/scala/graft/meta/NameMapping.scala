package graft.meta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.core._

/** One name-mapping rule: the field ID assigned to any column whose name (or
  * dotted path) matches one of `names`. Reference `name_mapping.go:30-80`;
  * serialized under the table property `schema.name-mapping.default`.
  */
final case class MappedField(fieldId: Option[Int], names: Seq[String],
    fields: Seq[MappedField] = Nil)

/** Name mapping assigns field IDs to columns of files written WITHOUT
  * parquet field IDs (foreign files registered via `IceTable.addFiles`):
  * footer stats key to the table's IDs through the mapping, and the scan
  * builds its Spark read schema with the mapped names so by-name resolution
  * lands on the right columns even when the file's names differ from the
  * canonical schema. Struct nesting is mapped by dotted path; list/map
  * element mapping is not implemented (matches our stats collector, which
  * only tracks primitive leaf paths of top-level/struct fields).
  */
object NameMapping {
  val PropertyKey = "schema.name-mapping.default"

  /** The identity mapping of a schema: every field maps its own name. */
  def default(schema: IceSchema): Seq[MappedField] = fromFields(schema.fields)

  private def fromFields(fs: Seq[NestedField]): Seq[MappedField] =
    fs.map { f =>
      val nested = f.tpe match {
        case IceStructType(children) => fromFields(children)
        case _ => Nil
      }
      MappedField(Some(f.id), Seq(f.name), nested)
    }

  /** Flat dotted-path alias index: every listed name of every rule → ID. */
  def index(mapping: Seq[MappedField]): Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    def walk(prefix: String, fields: Seq[MappedField]): Unit =
      fields.foreach { mf =>
        mf.names.foreach { n =>
          val path = if (prefix.isEmpty) n else s"$prefix.$n"
          mf.fieldId.foreach(id => b += path -> id)
          walk(path, mf.fields)
        }
      }
    walk("", mapping)
    b.result()
  }

  /** First alias per field ID (top level only) — what the scan renames by. */
  def aliasById(mapping: Seq[MappedField]): Map[Int, String] =
    mapping.flatMap(mf => mf.fieldId.flatMap(id => mf.names.headOption.map(id -> _))).toMap

  private val mapper = new ObjectMapper()

  def toJson(mapping: Seq[MappedField]): String = {
    def node(mf: MappedField): ObjectNode = {
      val o = mapper.createObjectNode()
      mf.fieldId.foreach(o.put("field-id", _))
      val names = mapper.createArrayNode()
      mf.names.foreach(names.add)
      o.set[JsonNode]("names", names)
      if (mf.fields.nonEmpty) {
        val arr = mapper.createArrayNode()
        mf.fields.foreach(f => arr.add(node(f)))
        o.set[JsonNode]("fields", arr)
      }
      o
    }
    val root = mapper.createArrayNode()
    mapping.foreach(mf => root.add(node(mf)))
    mapper.writeValueAsString(root)
  }

  def parse(json: String): Seq[MappedField] = {
    def field(n: JsonNode): MappedField = MappedField(
      fieldId = Option(n.get("field-id")).map(_.asInt()),
      names = arr(n.get("names")).map(_.asText()),
      fields = Option(n.get("fields")).map(arr(_).map(field)).getOrElse(Nil))
    arr(mapper.readTree(json)).map(field)
  }

  private def arr(n: JsonNode): Seq[JsonNode] = {
    if (n == null) return Nil
    val b = Seq.newBuilder[JsonNode]
    n.asInstanceOf[ArrayNode].forEach(e => b += e)
    b.result()
  }
}

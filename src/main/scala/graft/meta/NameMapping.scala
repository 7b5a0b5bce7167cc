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
  * canonical schema. The full field tree is mapped (reference
  * `name_mapping.go:440-492` createMapping): struct children by dotted
  * path, list elements as `element`, map entries as `key`/`value`.
  */
object NameMapping {
  val PropertyKey = "schema.name-mapping.default"

  /** The identity mapping of a schema: every field maps its own name —
    * including list `element` and map `key`/`value` rules, mirroring the
    * reference's createMappingFromSchema (`name_mapping.go:461-492`).
    */
  def default(schema: IceSchema): Seq[MappedField] = fromFields(schema.fields)

  private def fromFields(fs: Seq[NestedField]): Seq[MappedField] =
    fs.map(f => MappedField(Some(f.id), Seq(f.name), childFields(f.tpe)))

  private def childFields(t: IceType): Seq[MappedField] = t match {
    case IceStructType(children) => fromFields(children)
    case IceListType(eid, elem, _) =>
      Seq(MappedField(Some(eid), Seq("element"), childFields(elem)))
    case IceMapType(kid, k, vid, v, _) =>
      Seq(MappedField(Some(kid), Seq("key"), childFields(k)),
        MappedField(Some(vid), Seq("value"), childFields(v)))
    case _ => Nil
  }

  /** Flat dotted-path alias index: every listed name of every rule → ID.
    * List/map rules additionally register the PARQUET flavor of their
    * path (`p.list.element`, `p.key_value.key`) — footer column chunks of
    * a 3-level list/map print those dotted paths, so foreign-file stats
    * resolve without special-casing in the collector.
    */
  def index(mapping: Seq[MappedField]): Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    // ONE walk carrying both path flavors: the plain dotted path and the
    // full parquet-footer flavor (`p.list.element`, `p.key_value.key` at
    // EVERY list/map level). Recursing into both flavors separately would
    // expand the subtree 2^depth times and register mixed-flavor paths
    // (`a.element.list.element`) no parquet footer ever prints.
    def walk(plain: String, pq: String, fields: Seq[MappedField]): Unit =
      fields.foreach { mf =>
        mf.names.foreach { n =>
          val path = if (plain.isEmpty) n else s"$plain.$n"
          val pqSeg = n match {
            case "element" => "list.element"
            case "key" => "key_value.key"
            case "value" => "key_value.value"
            case _ => n
          }
          val pqPath = if (pq.isEmpty) n else s"$pq.$pqSeg"
          mf.fieldId.foreach { id =>
            b += path -> id
            if (pqPath != path) b += pqPath -> id
          }
          walk(path, pqPath, mf.fields)
        }
      }
    walk("", "", mapping)
    b.result()
  }

  /** First alias per field ID, ALL levels — the scan renames top-level
    * columns by it and builds aliased nested read types from it.
    */
  def aliasById(mapping: Seq[MappedField]): Map[Int, String] = {
    val b = Map.newBuilder[Int, String]
    def walk(fields: Seq[MappedField]): Unit = fields.foreach { mf =>
      mf.fieldId.foreach(id => mf.names.headOption.foreach(n => b += id -> n))
      walk(mf.fields)
    }
    walk(mapping)
    b.result()
  }

  /** Spark read type for an Iceberg type with every nested field renamed
    * to its mapped alias — what by-name parquet resolution needs to land
    * on a foreign file's own nested names. The reader casts the result
    * back to the canonical type (struct casts rename positionally), so
    * aliased names never escape the scan.
    */
  def aliasedSparkType(t: IceType, alias: Int => Option[String])
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    t match {
      case IceStructType(children) => StructType(children.map(c =>
        StructField(alias(c.id).getOrElse(c.name),
          aliasedSparkType(c.tpe, alias), nullable = !c.required)))
      case IceListType(_, elem, elemRequired) =>
        ArrayType(aliasedSparkType(elem, alias), containsNull = !elemRequired)
      case IceMapType(_, k, _, v, valueRequired) =>
        MapType(aliasedSparkType(k, alias), aliasedSparkType(v, alias),
          valueContainsNull = !valueRequired)
      case p => IceType.toSpark(p)
    }
  }

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
      // filter NullNode: a spec-legal explicit `"field-id": null` (unassigned
      // mapping) must parse as None — NullNode.asInt() is 0, which would
      // bind the rule's paths to field ID 0
      fieldId = Option(n.get("field-id")).filter(!_.isNull).map(_.asInt()),
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

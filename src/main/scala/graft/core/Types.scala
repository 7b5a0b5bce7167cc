package graft.core

import org.apache.spark.sql.types._

/** Iceberg-style type system: a small ADT whose backbone is the spec-assigned
  * field ID carried on every nested field. Column resolution, pruning, stats
  * and schema evolution all key on IDs, never names.
  *
  * Mirrors the reference's `types.go:101-805` and `schema.go:103-199`
  * (iceberg-go-distributed), re-expressed as Scala case objects/classes with
  * Spark `StructType` converters that carry `parquet.field.id` metadata so
  * Spark's Parquet writer emits field IDs natively.
  */
sealed trait IceType {
  def isPrimitive: Boolean = this match {
    case _: IceStructType | _: IceListType | _: IceMapType => false
    case _ => true
  }
}

case object IceBoolean extends IceType
case object IceInt extends IceType
case object IceLong extends IceType
case object IceFloat extends IceType
case object IceDouble extends IceType
final case class IceDecimal(precision: Int, scale: Int) extends IceType {
  require(precision <= 38, s"decimal precision $precision > 38")
}
case object IceDate extends IceType
/** µs since midnight; Spark has no TIME type → surfaced as LongType. */
case object IceTime extends IceType
case object IceTimestamp extends IceType // µs, no tz → TimestampNTZType
case object IceTimestampTz extends IceType // µs UTC → TimestampType
/** ns since epoch, no tz (v3+, reference `types.go:704-716`). Spark
  * timestamps are µs, so ns values surface as LongType (SURVEY §1.2).
  */
case object IceTimestampNs extends IceType
case object IceTimestampTzNs extends IceType // ns UTC (v3+) → LongType
case object IceString extends IceType
case object IceUUID extends IceType
final case class IceFixed(length: Int) extends IceType
case object IceBinary extends IceType

/** `initialDefault` is returned for this field by files written BEFORE the
  * field existed; `writeDefault` fills the field when a writer omits the
  * column (reference `types.go:182-191`, spec v3 column defaults).
  */
final case class NestedField(
    id: Int,
    name: String,
    tpe: IceType,
    required: Boolean = false,
    doc: Option[String] = None,
    initialDefault: Option[Any] = None,
    writeDefault: Option[Any] = None)

final case class IceStructType(fields: Seq[NestedField]) extends IceType
final case class IceListType(elementId: Int, element: IceType, elementRequired: Boolean)
    extends IceType
final case class IceMapType(keyId: Int, key: IceType, valueId: Int, value: IceType,
    valueRequired: Boolean) extends IceType

object IceType {
  /** Spec string form, e.g. "long", "decimal(18, 2)", "fixed[16]". */
  def toSpecString(t: IceType): String = t match {
    case IceBoolean => "boolean"
    case IceInt => "int"
    case IceLong => "long"
    case IceFloat => "float"
    case IceDouble => "double"
    case IceDecimal(p, s) => s"decimal($p, $s)"
    case IceDate => "date"
    case IceTime => "time"
    case IceTimestamp => "timestamp"
    case IceTimestampTz => "timestamptz"
    case IceTimestampNs => "timestamp_ns"
    case IceTimestampTzNs => "timestamptz_ns"
    case IceString => "string"
    case IceUUID => "uuid"
    case IceFixed(n) => s"fixed[$n]"
    case IceBinary => "binary"
    case _: IceStructType | _: IceListType | _: IceMapType =>
      throw new IllegalArgumentException(s"not a primitive: $t")
  }

  private val DecimalRe = """decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r
  private val FixedRe = """fixed\[(\d+)\]""".r

  def fromSpecString(s: String): IceType = s match {
    case "boolean" => IceBoolean
    case "int" => IceInt
    case "long" => IceLong
    case "float" => IceFloat
    case "double" => IceDouble
    case DecimalRe(p, sc) => IceDecimal(p.toInt, sc.toInt)
    case "date" => IceDate
    case "time" => IceTime
    case "timestamp" => IceTimestamp
    case "timestamptz" => IceTimestampTz
    case "timestamp_ns" => IceTimestampNs
    case "timestamptz_ns" => IceTimestampTzNs
    case "string" => IceString
    case "uuid" => IceUUID
    case FixedRe(n) => IceFixed(n.toInt)
    case "binary" => IceBinary
    case other => throw new IllegalArgumentException(s"unknown type: $other")
  }

  /** Read-time type promotion (reference `types.go:767-805`): the file type
    * may be promoted to the requested (newer) type.
    */
  def canPromote(from: IceType, to: IceType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (IceInt, IceLong) => true
    case (IceFloat, IceDouble) => true
    case (IceDecimal(p1, s1), IceDecimal(p2, s2)) => s1 == s2 && p2 >= p1
    case (IceFixed(16), IceUUID) => true
    case _ => false
  }

  /** Spark SQL type for an Iceberg type (see SURVEY.md §1.2 table). */
  def toSpark(t: IceType): DataType = t match {
    case IceBoolean => BooleanType
    case IceInt => IntegerType
    case IceLong => LongType
    case IceFloat => FloatType
    case IceDouble => DoubleType
    case IceDecimal(p, s) => DecimalType(p, s)
    case IceDate => DateType
    case IceTime => LongType
    case IceTimestamp => TimestampNTZType
    case IceTimestampTz => TimestampType
    case IceTimestampNs | IceTimestampTzNs => LongType // ns exceed µs timestamps
    case IceString => StringType
    case IceUUID => StringType
    case IceFixed(_) => BinaryType
    case IceBinary => BinaryType
    case IceStructType(fields) =>
      StructType(fields.map(f => SchemaConv.toSparkField(f)))
    case IceListType(_, elem, elemRequired) =>
      ArrayType(toSpark(elem), containsNull = !elemRequired)
    case IceMapType(_, k, _, v, valueRequired) =>
      MapType(toSpark(k), toSpark(v), valueContainsNull = !valueRequired)
  }
}

/** A versioned Iceberg schema: a struct of fields plus lazy ID/name indexes. */
final case class IceSchema(
    schemaId: Int,
    fields: Seq[NestedField],
    identifierFieldIds: Seq[Int] = Nil) {

  lazy val asStruct: IceStructType = IceStructType(fields)

  /** ID → field for every field at every nesting level. */
  lazy val byId: Map[Int, NestedField] = {
    val b = Map.newBuilder[Int, NestedField]
    def walk(fs: Seq[NestedField]): Unit = fs.foreach { f =>
      b += f.id -> f
      f.tpe match {
        case IceStructType(nested) => walk(nested)
        case IceListType(eid, e, req) => walk(Seq(NestedField(eid, "element", e, req)))
        case IceMapType(kid, k, vid, v, vreq) =>
          walk(Seq(NestedField(kid, "key", k, required = true),
            NestedField(vid, "value", v, vreq)))
        case _ =>
      }
    }
    walk(fields)
    b.result()
  }

  /** Dotted name → field ID (top-level and nested struct fields). */
  lazy val idByName: Map[String, Int] = {
    val b = Map.newBuilder[String, Int]
    def walk(prefix: String, fs: Seq[NestedField]): Unit = fs.foreach { f =>
      val full = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      b += full -> f.id
      f.tpe match {
        case IceStructType(nested) => walk(full, nested)
        case _ =>
      }
    }
    walk("", fields)
    b.result()
  }

  lazy val idByLowerName: Map[String, Int] =
    idByName.map { case (k, v) => k.toLowerCase -> v }

  def findByName(name: String, caseSensitive: Boolean = true): Option[NestedField] =
    (if (caseSensitive) idByName.get(name) else idByLowerName.get(name.toLowerCase))
      .flatMap(byId.get)

  def findById(id: Int): Option[NestedField] = byId.get(id)

  def nameById(id: Int): Option[String] =
    idByName.collectFirst { case (n, i) if i == id => n }

  lazy val highestFieldId: Int = if (byId.isEmpty) 0 else byId.keys.max

  /** Projection of the schema to the named top-level columns. */
  def select(names: Seq[String], caseSensitive: Boolean = true): IceSchema = {
    val picked = names.map { n =>
      findByName(n, caseSensitive).getOrElse(
        throw new IllegalArgumentException(s"no such column: $n"))
    }
    IceSchema(schemaId, picked, Nil)
  }

  def toSpark: StructType = StructType(fields.map(SchemaConv.toSparkField))
}

/** Iceberg ↔ Spark StructType conversion, carrying field IDs in metadata
  * (key `parquet.field.id`, which Spark's Parquet writer emits natively).
  * Mirrors reference `table/arrow_utils.go:364-700`.
  */
object SchemaConv {
  val FieldIdKey = "parquet.field.id"

  def toSparkField(f: NestedField): StructField = {
    val mb = new MetadataBuilder().putLong(FieldIdKey, f.id.toLong)
    f.doc.foreach(d => mb.putString("doc", d))
    StructField(f.name, IceType.toSpark(f.tpe), nullable = !f.required, mb.build())
  }

  /** Derive an IceSchema from a Spark StructType, ALWAYS assigning fresh
    * field IDs depth-first from 1. Existing `parquet.field.id` metadata is
    * deliberately ignored: Spark's ArrayType/MapType carry no element/key/
    * value IDs, so an evolved schema (ID gaps) cannot round-trip faithfully
    * anyway — honoring only the struct-level IDs would mint a MIXED
    * numbering worse than a clean reassignment. Intended for table
    * creation from a plain DataFrame schema, not for resolving existing
    * ID-stamped files (use the table's own IceSchema for that).
    */
  def fromSpark(st: StructType, schemaId: Int = 0): IceSchema = {
    var nextId = 0
    def fresh(): Int = { nextId += 1; nextId }
    def conv(dt: DataType): IceType = dt match {
      case BooleanType => IceBoolean
      case ByteType | ShortType | IntegerType => IceInt
      case LongType => IceLong
      case FloatType => IceFloat
      case DoubleType => IceDouble
      case d: DecimalType => IceDecimal(d.precision, d.scale)
      case DateType => IceDate
      case TimestampNTZType => IceTimestamp
      case TimestampType => IceTimestampTz
      case StringType => IceString
      case BinaryType => IceBinary
      case s: StructType => IceStructType(s.fields.toSeq.map(convField))
      case ArrayType(elem, containsNull) =>
        IceListType(fresh(), conv(elem), elementRequired = !containsNull)
      case MapType(k, v, valueContainsNull) => {
        val kid = fresh(); val kt = conv(k); val vid = fresh()
        IceMapType(kid, kt, vid, conv(v), valueRequired = !valueContainsNull)
      }
      case other => throw new IllegalArgumentException(s"unsupported Spark type: $other")
    }
    def convField(sf: StructField): NestedField = {
      val id = fresh()
      NestedField(id, sf.name, conv(sf.dataType), required = !sf.nullable,
        doc = if (sf.metadata.contains("doc")) Some(sf.metadata.getString("doc")) else None)
    }
    IceSchema(schemaId, st.fields.toSeq.map(convField))
  }

  /** Avro-compatible column name (reference `schema.go:1466-1520`): keep
    * letters/digits/underscore, prefix a leading digit with `_`, replace any
    * other character with `_x` + uppercase hex of its code point.
    */
  def makeCompatibleName(n: String): String = {
    def ok(c: Char, first: Boolean): Boolean =
      c == '_' || Character.isLetter(c) || (!first && Character.isDigit(c))
    if (n.nonEmpty && n.zipWithIndex.forall { case (c, i) => ok(c, i == 0) }) n
    else {
      val b = new StringBuilder
      n.zipWithIndex.foreach { case (c, i) =>
        if (ok(c, i == 0)) b.append(c)
        else if (i == 0 && Character.isDigit(c)) b.append('_').append(c)
        else b.append("_x").append(Integer.toHexString(c.toInt).toUpperCase)
      }
      b.toString
    }
  }

  /** File-side schema with every (nested) field name made Avro/Parquet
    * compatible; field IDs unchanged, so ID-based reads still resolve
    * (reference `SanitizeColumnNames` via `table/writer.go:106`).
    */
  def sanitizeColumnNames(s: IceSchema): IceSchema = {
    def fix(fs: Seq[NestedField]): Seq[NestedField] = fs.map { f =>
      val t = f.tpe match {
        case IceStructType(children) => IceStructType(fix(children))
        case o => o
      }
      f.copy(name = makeCompatibleName(f.name), tpe = t)
    }
    IceSchema(s.schemaId, fix(s.fields), s.identifierFieldIds)
  }
}

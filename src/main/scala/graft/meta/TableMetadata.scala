package graft.meta

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import graft.core._

/** Iceberg table-metadata tree + JSON v1/v2 serialization (reference
  * `table/metadata.go:65-156`, format per the Iceberg table spec).
  */
/** `firstRowId` is v3 row lineage (reference `table/snapshots.go:249-258`):
  * the first row ID assigned to rows added by this snapshot.
  */
final case class Snapshot(
    snapshotId: Long,
    parentSnapshotId: Option[Long],
    sequenceNumber: Long,
    timestampMs: Long,
    manifestList: String,
    summary: Map[String, String],
    schemaId: Int,
    firstRowId: Option[Long] = None)

final case class SnapshotLogEntry(timestampMs: Long, snapshotId: Long)
final case class MetadataLogEntry(timestampMs: Long, metadataFile: String)
/** Branch/tag pointer with the spec's optional retention policy (reference
  * `table/refs.go:40-45`): absent fields mean "retain forever" /
  * "inherit the expire call's arguments", matching Iceberg's defaults.
  */
final case class SnapshotRef(snapshotId: Long, refType: String, // "branch" | "tag"
    minSnapshotsToKeep: Option[Int] = None,
    maxSnapshotAgeMs: Option[Long] = None,
    maxRefAgeMs: Option[Long] = None)

/** Metadata of one blob inside a statistics file (reference
  * `table/statistics.go:71-78`). Statistics are informational — readers may
  * ignore them; they are never required for correct reads.
  */
final case class BlobMetadata(
    blobType: String,
    snapshotId: Long,
    sequenceNumber: Long,
    fields: Seq[Int],
    properties: Map[String, String] = Map.empty)

/** A per-snapshot table statistics file (reference
  * `table/statistics.go:56-68`; metadata JSON `statistics` array).
  */
final case class StatisticsFile(
    snapshotId: Long,
    statisticsPath: String,
    fileSizeInBytes: Long,
    fileFooterSizeInBytes: Long,
    blobMetadata: Seq[BlobMetadata])

/** A per-snapshot partition statistics file (reference
  * `table/statistics.go:79-85`; metadata JSON `partition-statistics`).
  */
final case class PartitionStatisticsFile(
    snapshotId: Long,
    statisticsPath: String,
    fileSizeInBytes: Long)

final case class TableMetadata(
    formatVersion: Int,
    tableUuid: String,
    location: String,
    lastSequenceNumber: Long,
    lastUpdatedMs: Long,
    lastColumnId: Int,
    currentSchemaId: Int,
    schemas: Seq[IceSchema],
    defaultSpecId: Int,
    specs: Seq[PartitionSpec],
    lastPartitionId: Int,
    defaultSortOrderId: Int,
    sortOrders: Seq[SortOrder],
    properties: Map[String, String],
    currentSnapshotId: Option[Long],
    snapshots: Seq[Snapshot],
    snapshotLog: Seq[SnapshotLogEntry],
    metadataLog: Seq[MetadataLogEntry],
    refs: Map[String, SnapshotRef],
    nextRowId: Option[Long] = None, // v3 row-lineage counter
    statistics: Seq[StatisticsFile] = Nil,
    partitionStatistics: Seq[PartitionStatisticsFile] = Nil) {

  def currentSchema: IceSchema = schemas.find(_.schemaId == currentSchemaId).get
  def defaultSpec: PartitionSpec = specs.find(_.specId == defaultSpecId).get
  def currentSnapshot: Option[Snapshot] =
    currentSnapshotId.flatMap(id => snapshots.find(_.snapshotId == id))
  def snapshotById(id: Long): Option[Snapshot] = snapshots.find(_.snapshotId == id)
  def schemaById(id: Int): Option[IceSchema] = schemas.find(_.schemaId == id)
  def specById(id: Int): Option[PartitionSpec] = specs.find(_.specId == id)

  /** Monotonic snapshot-ID reservation (reference `metadata.go:296-298`). */
  def reserveSnapshotId(): Long =
    math.max(snapshots.map(_.snapshotId).maxOption.getOrElse(0L) + 1L,
      System.currentTimeMillis())

  /** Snapshot current at a timestamp (reference `table/table.go:235-245`). */
  def snapshotAsOf(timestampMs: Long, inclusive: Boolean = true): Option[Snapshot] =
    snapshotLog.filter(e => if (inclusive) e.timestampMs <= timestampMs
      else e.timestampMs < timestampMs)
      .sortBy(_.timestampMs).lastOption
      .flatMap(e => snapshotById(e.snapshotId))
}

object TableMetadataJson {
  private val mapper = new ObjectMapper()

  // ----------------------------------------------------------------- write
  /** Serialize per `format-version` (reference `table/metadata.go:1611-1832`:
    * `metadataV1` adds flat `schema`/`partition-spec` and has no sequence
    * numbers; `metadataV2` adds required `last-sequence-number`;
    * `metadataV3` additionally requires `next-row-id`).
    */
  def write(m: TableMetadata): String = {
    require(m.formatVersion >= 1 && m.formatVersion <= 3,
      s"unsupported format-version ${m.formatVersion}")
    if (m.formatVersion == 1)
      m.defaultSpec.fields.zipWithIndex.foreach { case (f, i) =>
        require(f.fieldId == 1000 + i,
          s"v1 constraint: partition field IDs are not sequential: " +
            s"expected ${1000 + i}, got ${f.fieldId}")
      }
    if (m.formatVersion < 3)
      m.schemas.foreach(_.byId.values.foreach { f =>
        require(f.tpe != IceTimestampNs && f.tpe != IceTimestampTzNs,
          s"field '${f.name}': ${IceType.toSpecString(f.tpe)} requires format-version 3+")
        // column defaults are a v3 feature (reference checkSchemaCompatibility,
        // metadata_schema_comptability.go:73-113: defaultValuesMinFormatVersion)
        require(f.initialDefault.isEmpty && f.writeDefault.isEmpty,
          s"field '${f.name}': default values require format-version 3+")
      })
    val root = mapper.createObjectNode()
    root.put("format-version", m.formatVersion)
    root.put("table-uuid", m.tableUuid)
    root.put("location", m.location)
    if (m.formatVersion >= 2) root.put("last-sequence-number", m.lastSequenceNumber)
    root.put("last-updated-ms", m.lastUpdatedMs)
    root.put("last-column-id", m.lastColumnId)
    if (m.formatVersion == 1) {
      // v1 readers predate `schemas`/`partition-specs`; write the flat forms
      // alongside the modern lists so both generations can read the file.
      root.set[JsonNode]("schema", schemaToJson(m.currentSchema))
      root.set[JsonNode]("partition-spec",
        specToJson(m.defaultSpec).get("fields"))
    }
    root.put("current-schema-id", m.currentSchemaId)
    root.set[JsonNode]("schemas", arr(m.schemas.map(schemaToJson)))
    root.put("default-spec-id", m.defaultSpecId)
    root.set[JsonNode]("partition-specs", arr(m.specs.map(specToJson)))
    root.put("last-partition-id", m.lastPartitionId)
    root.put("default-sort-order-id", m.defaultSortOrderId)
    root.set[JsonNode]("sort-orders", arr(m.sortOrders.map(sortOrderToJson)))
    val props = mapper.createObjectNode()
    m.properties.foreach { case (k, v) => props.put(k, v) }
    root.set[JsonNode]("properties", props)
    m.currentSnapshotId.foreach(root.put("current-snapshot-id", _))
    root.set[JsonNode]("snapshots", arr(m.snapshots.map(snapshotToJson)))
    root.set[JsonNode]("snapshot-log", arr(m.snapshotLog.map { e =>
      val o = mapper.createObjectNode()
      o.put("timestamp-ms", e.timestampMs); o.put("snapshot-id", e.snapshotId); o
    }))
    root.set[JsonNode]("metadata-log", arr(m.metadataLog.map { e =>
      val o = mapper.createObjectNode()
      o.put("timestamp-ms", e.timestampMs); o.put("metadata-file", e.metadataFile); o
    }))
    val refs = mapper.createObjectNode()
    m.refs.foreach { case (name, r) =>
      val o = mapper.createObjectNode()
      o.put("snapshot-id", r.snapshotId); o.put("type", r.refType)
      r.minSnapshotsToKeep.foreach(o.put("min-snapshots-to-keep", _))
      r.maxSnapshotAgeMs.foreach(o.put("max-snapshot-age-ms", _))
      r.maxRefAgeMs.foreach(o.put("max-ref-age-ms", _))
      refs.set[JsonNode](name, o)
    }
    root.set[JsonNode]("refs", refs)
    // next-row-id is required in v3 (row lineage) and unknown to v1/v2 readers
    if (m.formatVersion >= 3) root.put("next-row-id", m.nextRowId.getOrElse(0L))
    if (m.statistics.nonEmpty)
      root.set[JsonNode]("statistics", arr(m.statistics.map { sf =>
        val o = mapper.createObjectNode()
        o.put("snapshot-id", sf.snapshotId)
        o.put("statistics-path", sf.statisticsPath)
        o.put("file-size-in-bytes", sf.fileSizeInBytes)
        o.put("file-footer-size-in-bytes", sf.fileFooterSizeInBytes)
        o.set[JsonNode]("blob-metadata", arr(sf.blobMetadata.map { b =>
          val bo = mapper.createObjectNode()
          bo.put("type", b.blobType)
          bo.put("snapshot-id", b.snapshotId)
          bo.put("sequence-number", b.sequenceNumber)
          bo.set[JsonNode]("fields",
            arr(b.fields.map(i => mapper.getNodeFactory.numberNode(i))))
          if (b.properties.nonEmpty) {
            val po = mapper.createObjectNode()
            b.properties.foreach { case (k, v) => po.put(k, v) }
            bo.set[JsonNode]("properties", po)
          }
          bo
        }))
        o
      }))
    if (m.partitionStatistics.nonEmpty)
      root.set[JsonNode]("partition-statistics", arr(m.partitionStatistics.map { pf =>
        val o = mapper.createObjectNode()
        o.put("snapshot-id", pf.snapshotId)
        o.put("statistics-path", pf.statisticsPath)
        o.put("file-size-in-bytes", pf.fileSizeInBytes)
        o
      }))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private def arr(nodes: Seq[JsonNode]): ArrayNode = {
    val a = mapper.createArrayNode()
    nodes.foreach(a.add)
    a
  }

  def schemaToJson(s: IceSchema): ObjectNode = {
    val o = typeToJson(IceStructType(s.fields)).asInstanceOf[ObjectNode]
    o.put("schema-id", s.schemaId)
    if (s.identifierFieldIds.nonEmpty)
      o.set[JsonNode]("identifier-field-ids",
        arr(s.identifierFieldIds.map(i => mapper.getNodeFactory.numberNode(i))))
    o
  }

  def typeToJson(t: IceType): JsonNode = t match {
    case IceStructType(fields) =>
      val o = mapper.createObjectNode()
      o.put("type", "struct")
      o.set[JsonNode]("fields", arr(fields.map { f =>
        val fo = mapper.createObjectNode()
        fo.put("id", f.id)
        fo.put("name", f.name)
        fo.put("required", f.required)
        fo.set[JsonNode]("type", typeToJson(f.tpe))
        f.doc.foreach(fo.put("doc", _))
        f.initialDefault.foreach(v =>
          fo.set[JsonNode]("initial-default", literalToJson(f.tpe, v)))
        f.writeDefault.foreach(v =>
          fo.set[JsonNode]("write-default", literalToJson(f.tpe, v)))
        fo
      }))
      o
    case IceListType(eid, elem, req) =>
      val o = mapper.createObjectNode()
      o.put("type", "list")
      o.put("element-id", eid)
      o.set[JsonNode]("element", typeToJson(elem))
      o.put("element-required", req)
      o
    case IceMapType(kid, k, vid, v, vreq) =>
      val o = mapper.createObjectNode()
      o.put("type", "map")
      o.put("key-id", kid)
      o.set[JsonNode]("key", typeToJson(k))
      o.put("value-id", vid)
      o.set[JsonNode]("value", typeToJson(v))
      o.put("value-required", vreq)
      o
    case prim => mapper.getNodeFactory.textNode(IceType.toSpecString(prim))
  }

  /** Single-value JSON for column defaults (spec v3 defaults encoding).
    * Date/time/timestamp values serialize as the spec's ISO-8601 STRINGS —
    * writing the raw epoch ints made graft defaults unreadable by
    * spec-compliant readers (and vice versa, see literalFromJson).
    */
  private def literalToJson(t: graft.core.IceType, v: Any): JsonNode = {
    val nf = mapper.getNodeFactory
    def micros(x: Any) = x.asInstanceOf[Number].longValue()
    val microFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    val nanoFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS")
    t match {
      case graft.core.IceDate => nf.textNode(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Number].longValue()).toString)
      case graft.core.IceTime => nf.textNode(
        java.time.LocalTime.ofNanoOfDay(micros(v) * 1000L)
          .format(java.time.format.DateTimeFormatter.ofPattern("HH:mm:ss.SSSSSS")))
      case graft.core.IceTimestamp => nf.textNode(
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(micros(v), 1000000L),
          (Math.floorMod(micros(v), 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC).format(microFmt))
      case graft.core.IceTimestampTz => nf.textNode(
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(micros(v), 1000000L),
          (Math.floorMod(micros(v), 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC).format(microFmt) + "+00:00")
      // v3 ns-timestamps are ISO-8601 strings on the wire like every other
      // temporal type — emitting the raw epoch-nanos number wrote defaults
      // the spec reader (and this engine's own parser) takes as strings
      case graft.core.IceTimestampNs => nf.textNode(
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(micros(v), 1000000000L),
          Math.floorMod(micros(v), 1000000000L).toInt,
          java.time.ZoneOffset.UTC).format(nanoFmt))
      case graft.core.IceTimestampTzNs => nf.textNode(
        java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(micros(v), 1000000000L),
          Math.floorMod(micros(v), 1000000000L).toInt,
          java.time.ZoneOffset.UTC).format(nanoFmt) + "+00:00")
      case _ => v match {
        case b: Boolean => nf.booleanNode(b)
        case i: Int => nf.numberNode(i)
        case l: Long => nf.numberNode(l)
        case f: Float => nf.numberNode(f)
        case d: Double => nf.numberNode(d)
        case d: java.math.BigDecimal => nf.textNode(d.toPlainString)
        case s: String => nf.textNode(s)
        case other => nf.textNode(other.toString)
      }
    }
  }

  /** Single-value JSON deserialization (spec "JSON single-value
    * serialization"): date/time/timestamp values are ISO-8601 STRINGS on
    * the wire — Jackson's asInt()/asLong() on a textual node silently
    * returns 0, which turned every spec-written date default into
    * 1970-01-01. Numeric forms are still accepted for files this engine
    * wrote before it emitted the spec strings.
    */
  private def literalFromJson(t: graft.core.IceType, n: JsonNode): Any = t match {
    case graft.core.IceBoolean => n.asBoolean()
    case graft.core.IceDate =>
      if (n.isTextual) java.time.LocalDate.parse(n.asText()).toEpochDay.toInt
      else n.asInt()
    case graft.core.IceTime =>
      if (n.isTextual) java.time.LocalTime.parse(n.asText()).toNanoOfDay / 1000L
      else n.asLong()
    case graft.core.IceTimestamp =>
      if (n.isTextual) localToMicros(java.time.LocalDateTime.parse(n.asText()))
      else n.asLong()
    case graft.core.IceTimestampTz =>
      if (n.isTextual) {
        val odt = java.time.OffsetDateTime.parse(n.asText())
        odt.toEpochSecond * 1000000L + odt.getNano / 1000L
      } else n.asLong()
    case graft.core.IceTimestampNs =>
      if (n.isTextual) {
        val ldt = java.time.LocalDateTime.parse(n.asText())
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + ldt.getNano
      } else n.asLong()
    case graft.core.IceTimestampTzNs =>
      if (n.isTextual) {
        val odt = java.time.OffsetDateTime.parse(n.asText())
        odt.toEpochSecond * 1000000000L + odt.getNano
      } else n.asLong()
    case graft.core.IceInt => n.asInt()
    case graft.core.IceLong => n.asLong()
    case graft.core.IceFloat => n.asDouble().toFloat
    case graft.core.IceDouble => n.asDouble()
    case graft.core.IceDecimal(_, s) => new java.math.BigDecimal(n.asText()).setScale(s)
    case _ => n.asText()
  }

  private def localToMicros(ldt: java.time.LocalDateTime): Long =
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L

  def specToJson(s: PartitionSpec): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("spec-id", s.specId)
    o.set[JsonNode]("fields", arr(s.fields.map { f =>
      val fo = mapper.createObjectNode()
      fo.put("source-id", f.sourceId)
      fo.put("field-id", f.fieldId)
      fo.put("name", f.name)
      fo.put("transform", f.transform.name)
      fo
    }))
    o
  }

  def sortOrderToJson(s: SortOrder): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("order-id", s.orderId)
    o.set[JsonNode]("fields", arr(s.fields.map { f =>
      val fo = mapper.createObjectNode()
      fo.put("transform", f.transform.name)
      fo.put("source-id", f.sourceId)
      fo.put("direction", if (f.ascending) "asc" else "desc")
      fo.put("null-order", if (f.nullsFirst) "nulls-first" else "nulls-last")
      fo
    }))
    o
  }

  private def snapshotToJson(s: Snapshot): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("snapshot-id", s.snapshotId)
    s.parentSnapshotId.foreach(o.put("parent-snapshot-id", _))
    o.put("sequence-number", s.sequenceNumber)
    o.put("timestamp-ms", s.timestampMs)
    o.put("manifest-list", s.manifestList)
    val sum = mapper.createObjectNode()
    s.summary.foreach { case (k, v) => sum.put(k, v) }
    o.set[JsonNode]("summary", sum)
    o.put("schema-id", s.schemaId)
    s.firstRowId.foreach(o.put("first-row-id", _)) // v3 row lineage
    o
  }

  // ------------------------------------------------------------------ read
  /** Parse metadata JSON: v2 is the native form; v1 single-`schema` and
    * flat `partition-spec` are upgraded on read (reference
    * `table/metadata.go` v1/v2 parsing + the invalid-metadata test matrix in
    * `table/metadata_internal_test.go`).
    */
  def read(json: String): TableMetadata = {
    val n = mapper.readTree(json)
    def fail(msg: String) = throw new IllegalArgumentException(s"invalid metadata: $msg")
    if (!n.has("format-version")) fail("missing format-version")
    val formatVersion = n.get("format-version").asInt()
    if (formatVersion < 1 || formatVersion > 3)
      fail(s"unsupported format-version $formatVersion")
    if (!n.has("location") || n.get("location").asText().isEmpty) fail("missing location")
    if (!n.has("schemas") && !n.has("schema")) fail("missing schema")
    if (formatVersion >= 2) {
      if (!n.has("schemas") || !n.has("current-schema-id"))
        fail("v2 metadata requires schemas + current-schema-id")
      if (!n.has("last-sequence-number")) fail("v2 metadata requires last-sequence-number")
      if (!n.has("table-uuid")) fail("v2 metadata requires table-uuid")
      // the reference's golden invalid variants pin these two as hard
      // requirements too (TableMetadataV2MissingPartitionSpecs / -LastPartitionId)
      if (!n.has("partition-specs")) fail("v2 metadata requires partition-specs")
      if (!n.has("last-partition-id")) fail("v2 metadata requires last-partition-id")
      if (!n.has("sort-orders")) fail("v2 metadata requires sort-orders")
    } else {
      // v1 may use the MODERN list keys, but then their pointers are
      // required — a schemas list without current-schema-id (or
      // partition-specs without default-spec-id) has no unambiguous
      // current configuration (reference golden variants
      // TableMetadataV1SchemasWithoutCurrentId / -NoValidSchema /
      // -PartitionSpecsWithoutDefaultId)
      if (n.has("schemas") && !n.has("current-schema-id"))
        fail("v1 metadata with a schemas list requires current-schema-id")
      if (n.has("partition-specs") && !n.has("default-spec-id"))
        fail("v1 metadata with partition-specs requires default-spec-id")
    }
    val schemas =
      if (n.has("schemas")) iter(n.get("schemas")).map(schemaFromJson)
      else Seq(schemaFromJson(n.get("schema"))) // v1 single-schema form
    val csId = opt(n, "current-schema-id").map(_.asInt()).getOrElse(schemas.head.schemaId)
    if (!schemas.exists(_.schemaId == csId)) fail(s"current-schema-id $csId not in schemas")
    val specs =
      if (n.has("partition-specs")) iter(n.get("partition-specs")).map(specFromJson)
      else if (n.has("partition-spec")) // v1 flat field list, ids assigned from 1000
        Seq(PartitionSpec(0, iter(n.get("partition-spec")).zipWithIndex.map { case (f, i) =>
          PartitionField(f.get("source-id").asInt(),
            opt(f, "field-id").map(_.asInt()).getOrElse(1000 + i),
            f.get("name").asText(), Transform.fromString(f.get("transform").asText()))
        }))
      else Seq(PartitionSpec.Unpartitioned)
    val sortOrders =
      if (n.has("sort-orders")) iter(n.get("sort-orders")).map(sortOrderFromJson)
      else Seq(SortOrder.Unsorted)
    TableMetadata(
      formatVersion = formatVersion,
      tableUuid = opt(n, "table-uuid").map(_.asText()).getOrElse(""),
      location = n.get("location").asText(),
      lastSequenceNumber = opt(n, "last-sequence-number").map(_.asLong()).getOrElse(0L),
      lastUpdatedMs = opt(n, "last-updated-ms").map(_.asLong()).getOrElse(0L),
      lastColumnId = opt(n, "last-column-id").map(_.asInt()).getOrElse(
        schemas.map(_.highestFieldId).maxOption.getOrElse(0)),
      currentSchemaId = csId,
      schemas = schemas,
      defaultSpecId = opt(n, "default-spec-id").map(_.asInt()).getOrElse(0),
      specs = specs,
      lastPartitionId = opt(n, "last-partition-id").map(_.asInt())
        .getOrElse(specs.map(_.lastAssignedFieldId).maxOption.getOrElse(999)),
      defaultSortOrderId = opt(n, "default-sort-order-id").map(_.asInt()).getOrElse(0),
      sortOrders = sortOrders,
      properties = opt(n, "properties").map(p =>
        iterFields(p).map { case (k, v) => k -> v.asText() }.toMap).getOrElse(Map.empty),
      currentSnapshotId = opt(n, "current-snapshot-id").map(_.asLong()).filter(_ != -1L),
      snapshots = opt(n, "snapshots").map(s => iter(s).map(snapshotFromJson)).getOrElse(Nil),
      snapshotLog = opt(n, "snapshot-log").map(s => iter(s).map(e =>
        SnapshotLogEntry(e.get("timestamp-ms").asLong(), e.get("snapshot-id").asLong())))
        .getOrElse(Nil),
      metadataLog = opt(n, "metadata-log").map(s => iter(s).map(e =>
        MetadataLogEntry(e.get("timestamp-ms").asLong(), e.get("metadata-file").asText())))
        .getOrElse(Nil),
      refs = opt(n, "refs").map(r => iterFields(r).map { case (name, v) =>
        name -> SnapshotRef(v.get("snapshot-id").asLong(), v.get("type").asText(),
          minSnapshotsToKeep = opt(v, "min-snapshots-to-keep").map(_.asInt()),
          maxSnapshotAgeMs = opt(v, "max-snapshot-age-ms").map(_.asLong()),
          maxRefAgeMs = opt(v, "max-ref-age-ms").map(_.asLong()))
      }.toMap).getOrElse(Map.empty),
      nextRowId = opt(n, "next-row-id").map(_.asLong()),
      statistics = opt(n, "statistics").map(s => iter(s).map { sf =>
        StatisticsFile(
          sf.get("snapshot-id").asLong(),
          sf.get("statistics-path").asText(),
          sf.get("file-size-in-bytes").asLong(),
          sf.get("file-footer-size-in-bytes").asLong(),
          opt(sf, "blob-metadata").map(bs => iter(bs).map { b =>
            BlobMetadata(
              b.get("type").asText(),
              b.get("snapshot-id").asLong(),
              b.get("sequence-number").asLong(),
              opt(b, "fields").map(f => iter(f).map(_.asInt())).getOrElse(Nil),
              opt(b, "properties").map(p =>
                iterFields(p).map { case (k, v) => k -> v.asText() }.toMap)
                .getOrElse(Map.empty))
          }).getOrElse(Nil))
      }).getOrElse(Nil),
      partitionStatistics = opt(n, "partition-statistics").map(s => iter(s).map { pf =>
        PartitionStatisticsFile(
          pf.get("snapshot-id").asLong(),
          pf.get("statistics-path").asText(),
          pf.get("file-size-in-bytes").asLong())
      }).getOrElse(Nil))
  }

  private def opt(n: JsonNode, field: String): Option[JsonNode] =
    Option(n.get(field)).filterNot(_.isNull)

  private def iter(n: JsonNode): Seq[JsonNode] = {
    val b = Seq.newBuilder[JsonNode]
    n.elements().forEachRemaining(e => b += e)
    b.result()
  }

  private def iterFields(n: JsonNode): Seq[(String, JsonNode)] = {
    val b = Seq.newBuilder[(String, JsonNode)]
    n.fields().forEachRemaining(e => b += e.getKey -> e.getValue)
    b.result()
  }

  def schemaFromJson(n: JsonNode): IceSchema = {
    val struct = typeFromJson(n).asInstanceOf[IceStructType]
    val ids = opt(n, "identifier-field-ids")
      .map(a => iter(a).map(_.asInt())).getOrElse(Nil)
    IceSchema(opt(n, "schema-id").map(_.asInt()).getOrElse(0), struct.fields, ids)
  }

  def typeFromJson(n: JsonNode): IceType =
    if (n.isTextual) IceType.fromSpecString(n.asText())
    else n.get("type").asText() match {
      case "struct" =>
        IceStructType(iter(n.get("fields")).map { f =>
          val tpe = typeFromJson(f.get("type"))
          NestedField(
            f.get("id").asInt(),
            f.get("name").asText(),
            tpe,
            f.get("required").asBoolean(),
            opt(f, "doc").map(_.asText()),
            opt(f, "initial-default").map(literalFromJson(tpe, _)),
            opt(f, "write-default").map(literalFromJson(tpe, _)))
        })
      case "list" =>
        IceListType(n.get("element-id").asInt(), typeFromJson(n.get("element")),
          n.get("element-required").asBoolean())
      case "map" =>
        IceMapType(n.get("key-id").asInt(), typeFromJson(n.get("key")),
          n.get("value-id").asInt(), typeFromJson(n.get("value")),
          n.get("value-required").asBoolean())
    }

  def specFromJson(n: JsonNode): PartitionSpec =
    PartitionSpec(n.get("spec-id").asInt(), iter(n.get("fields")).map { f =>
      PartitionField(f.get("source-id").asInt(), f.get("field-id").asInt(),
        f.get("name").asText(), Transform.fromString(f.get("transform").asText()))
    })

  def sortOrderFromJson(n: JsonNode): SortOrder =
    SortOrder(n.get("order-id").asInt(), iter(n.get("fields")).map { f =>
      SortField(f.get("source-id").asInt(),
        Transform.fromString(f.get("transform").asText()),
        f.get("direction").asText() == "asc",
        f.get("null-order").asText() == "nulls-first")
    })

  private def snapshotFromJson(n: JsonNode): Snapshot =
    Snapshot(
      n.get("snapshot-id").asLong(),
      opt(n, "parent-snapshot-id").map(_.asLong()),
      opt(n, "sequence-number").map(_.asLong()).getOrElse(0L),
      n.get("timestamp-ms").asLong(),
      // spec v1 allows snapshots carrying the legacy inline `manifests`
      // array instead of manifest-list; empty location = empty snapshot
      // (reference snapshots.go:304), never an NPE on a genuine v1 file
      opt(n, "manifest-list").map(_.asText()).getOrElse(""),
      opt(n, "summary").map(s => iterFields(s).map { case (k, v) => k -> v.asText() }.toMap)
        .getOrElse(Map.empty),
      opt(n, "schema-id").map(_.asInt()).getOrElse(0),
      opt(n, "first-row-id").map(_.asLong()))
}

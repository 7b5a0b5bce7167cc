package graft.meta

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.DatumReader
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.core._

/** Manifest + manifest-list Avro serialization following the Iceberg spec's
  * v2 field names and field-ids (reference `manifest.go:474-539,798,834+`,
  * Avro schemas `internal/avro_schemas.go:1-571`).
  *
  * Column-level stats maps (sizes/counts/bounds) are serialized as the
  * spec's array-of-{key,value}-records encoding (Avro maps require string
  * keys; Iceberg keys by field ID).
  */
final case class DataFile(
    content: Int, // 0=data, 1=position deletes, 2=equality deletes
    filePath: String,
    fileFormat: String,
    partition: Seq[Any], // aligned with the spec's fields; JVM literal reps
    recordCount: Long,
    fileSizeInBytes: Long,
    columnSizes: Map[Int, Long] = Map.empty,
    valueCounts: Map[Int, Long] = Map.empty,
    nullValueCounts: Map[Int, Long] = Map.empty,
    nanValueCounts: Map[Int, Long] = Map.empty,
    lowerBounds: Map[Int, Array[Byte]] = Map.empty,
    upperBounds: Map[Int, Array[Byte]] = Map.empty,
    splitOffsets: Seq[Long] = Nil,
    sortOrderId: Option[Int] = None,
    equalityIds: Seq[Int] = Nil, // field IDs an equality-delete file matches on (content=2)
    // v3 deletion-vector pointer (reference `internal/avro_schemas.go:501-512`,
    // field ids 143/144/145): the Puffin file holds one bitmap per data file
    referencedDataFile: Option[String] = None,
    contentOffset: Option[Long] = None,
    contentSizeInBytes: Option[Long] = None,
    // extension field (optional in Avro, ignored by spec readers): whether
    // every top-level parquet column carries a field ID, stamped at
    // write/addFiles time from the footer already open for stats — so scan
    // planning routes ID-based vs name-mapped reads from manifest metadata
    // alone instead of re-opening one footer per planned file on the driver.
    // None = written before this field existed → caller sniffs.
    hasFieldIds: Option[Boolean] = None) {
  def isDeletionVector: Boolean = referencedDataFile.isDefined
}

object ManifestEntryStatus {
  val Existing = 0
  val Added = 1
  val Deleted = 2
}

final case class ManifestEntry(
    status: Int,
    snapshotId: Long,
    sequenceNumber: Option[Long], // None = inherit (added in this commit)
    fileSequenceNumber: Option[Long],
    dataFile: DataFile)

final case class FieldSummary(
    containsNull: Boolean,
    containsNan: Option[Boolean],
    lowerBound: Option[Array[Byte]],
    upperBound: Option[Array[Byte]])

final case class ManifestFile(
    path: String,
    length: Long,
    specId: Int,
    content: Int, // 0=data, 1=deletes
    sequenceNumber: Long,
    minSequenceNumber: Long,
    addedSnapshotId: Long,
    addedFilesCount: Int,
    existingFilesCount: Int,
    deletedFilesCount: Int,
    addedRowsCount: Long,
    existingRowsCount: Long,
    deletedRowsCount: Long,
    partitions: Seq[FieldSummary])

object ManifestIO {
  private val conf = new Configuration()

  // ------------------------------------------------------------- schemas
  private def avroPrimitive(t: IceType): String = t match {
    case IceBoolean => "\"boolean\""
    case IceInt => "\"int\""
    case IceDate => """{"type":"int","logicalType":"date"}"""
    case IceLong | IceTime => "\"long\""
    case IceTimestamp | IceTimestampTz =>
      """{"type":"long","logicalType":"timestamp-micros","adjust-to-utc":true}"""
    case IceFloat => "\"float\""
    case IceDouble => "\"double\""
    case IceString | IceUUID => "\"string\""
    case IceBinary | IceFixed(_) => "\"bytes\""
    case IceDecimal(p, s) =>
      s"""{"type":"bytes","logicalType":"decimal","precision":$p,"scale":$s}"""
    case other => throw new IllegalArgumentException(s"no avro mapping for $other")
  }

  /** r102: the per-spec partition tuple record. */
  private def partitionSchemaJson(partType: IceStructType): String = {
    val fields = partType.fields.map { f =>
      s"""{"name":"${f.name}","type":["null",${avroPrimitive(f.tpe)}],"default":null,"field-id":${f.id}}"""
    }.mkString(",")
    s"""{"type":"record","name":"r102","fields":[$fields]}"""
  }

  private def kvArray(name: String, kId: Int, vId: Int, vType: String): String =
    s"""["null",{"type":"array","items":{"type":"record","name":"$name","fields":[
       {"name":"key","type":"int","field-id":$kId},
       {"name":"value","type":"$vType","field-id":$vId}]},"logicalType":"map"}]"""

  /** manifest_entry schema (v2) for a given partition struct. */
  def entrySchema(partType: IceStructType): Schema = {
    val json = s"""
    {"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int","field-id":0},
      {"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
      {"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
      {"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
      {"name":"data_file","field-id":2,"type":{"type":"record","name":"r2","fields":[
        {"name":"content","type":"int","field-id":134},
        {"name":"file_path","type":"string","field-id":100},
        {"name":"file_format","type":"string","field-id":101},
        {"name":"partition","type":${partitionSchemaJson(partType)},"field-id":102},
        {"name":"record_count","type":"long","field-id":103},
        {"name":"file_size_in_bytes","type":"long","field-id":104},
        {"name":"column_sizes","type":${kvArray("k117_v118", 117, 118, "long")},"default":null,"field-id":108},
        {"name":"value_counts","type":${kvArray("k119_v120", 119, 120, "long")},"default":null,"field-id":109},
        {"name":"null_value_counts","type":${kvArray("k121_v122", 121, 122, "long")},"default":null,"field-id":110},
        {"name":"nan_value_counts","type":${kvArray("k138_v139", 138, 139, "long")},"default":null,"field-id":137},
        {"name":"lower_bounds","type":${kvArray("k126_v127", 126, 127, "bytes")},"default":null,"field-id":125},
        {"name":"upper_bounds","type":${kvArray("k129_v130", 129, 130, "bytes")},"default":null,"field-id":128},
        {"name":"key_metadata","type":["null","bytes"],"default":null,"field-id":131},
        {"name":"split_offsets","type":["null",{"type":"array","items":"long","element-id":133}],"default":null,"field-id":132},
        {"name":"equality_ids","type":["null",{"type":"array","items":"int","element-id":136}],"default":null,"field-id":135},
        {"name":"sort_order_id","type":["null","int"],"default":null,"field-id":140},
        {"name":"referenced_data_file","type":["null","string"],"default":null,"field-id":143},
        {"name":"content_offset","type":["null","long"],"default":null,"field-id":144},
        {"name":"content_size_in_bytes","type":["null","long"],"default":null,"field-id":145},
        {"name":"graft_has_field_ids","type":["null","boolean"],"default":null,"field-id":1000}
      ]}}
    ]}"""
    new Schema.Parser().parse(json)
  }

  /** manifest_file schema (v2) for manifest lists. */
  lazy val manifestListSchema: Schema = {
    val json = s"""
    {"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string","field-id":500},
      {"name":"manifest_length","type":"long","field-id":501},
      {"name":"partition_spec_id","type":"int","field-id":502},
      {"name":"content","type":"int","field-id":517},
      {"name":"sequence_number","type":"long","field-id":515},
      {"name":"min_sequence_number","type":"long","field-id":516},
      {"name":"added_snapshot_id","type":"long","field-id":503},
      {"name":"added_files_count","type":"int","field-id":504},
      {"name":"existing_files_count","type":"int","field-id":505},
      {"name":"deleted_files_count","type":"int","field-id":506},
      {"name":"added_rows_count","type":"long","field-id":512},
      {"name":"existing_rows_count","type":"long","field-id":513},
      {"name":"deleted_rows_count","type":"long","field-id":514},
      {"name":"partitions","type":["null",{"type":"array","items":
        {"type":"record","name":"r508","fields":[
          {"name":"contains_null","type":"boolean","field-id":509},
          {"name":"contains_nan","type":["null","boolean"],"default":null,"field-id":518},
          {"name":"lower_bound","type":["null","bytes"],"default":null,"field-id":510},
          {"name":"upper_bound","type":["null","bytes"],"default":null,"field-id":511}
        ]},"element-id":508}],"default":null,"field-id":507}
    ]}"""
    new Schema.Parser().parse(json)
  }

  // ------------------------------------------------------------- helpers
  private def partValueToAvro(t: IceType, v: Any): Any = (t, v) match {
    case (_, null) => null
    case (IceDecimal(_, _), _) => ByteBuffer.wrap(Bounds.encode(t, v))
    case (IceBinary | IceFixed(_), b: Array[Byte]) => ByteBuffer.wrap(b)
    case _ => v
  }

  private def partValueFromAvro(t: IceType, v: Any): Any = (t, v) match {
    case (_, null) => null
    case (IceDecimal(_, _), bb: ByteBuffer) => Bounds.decode(t, bytes(bb))
    case (IceBinary | IceFixed(_), bb: ByteBuffer) => bytes(bb)
    case (IceString | IceUUID, u) => u.toString
    case _ => v
  }

  private def bytes(bb: ByteBuffer): Array[Byte] = {
    val d = bb.duplicate()
    val out = new Array[Byte](d.remaining())
    d.get(out)
    out
  }

  private def kvToAvro(schema: Schema, m: Map[Int, _]): Any =
    if (m.isEmpty) null
    else {
      val arrSchema = schema.getTypes.asScala.find(_.getType == Schema.Type.ARRAY).get
      val itemSchema = arrSchema.getElementType
      val list = new java.util.ArrayList[GenericRecord](m.size)
      m.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val r = new GenericData.Record(itemSchema)
        r.put("key", k)
        r.put("value", v match {
          case b: Array[Byte] => ByteBuffer.wrap(b)
          case other => other
        })
        list.add(r)
      }
      new GenericData.Array(arrSchema, list)
    }

  private def kvFromAvro[T](v: Any)(conv: Any => T): Map[Int, T] = v match {
    case null => Map.empty
    case arr: java.util.Collection[_] =>
      arr.asScala.map { case r: GenericRecord =>
        r.get("key").asInstanceOf[Int] -> conv(r.get("value"))
      }.toMap
    case other => throw new IllegalArgumentException(s"unexpected kv encoding: $other")
  }

  // -------------------------------------------------------------- write
  /** Write a manifest; returns the ManifestFile entry (with field summaries
    * aggregated from the entries' partition tuples) for the manifest list.
    */
  def writeManifest(
      path: String,
      entries: Seq[ManifestEntry],
      spec: PartitionSpec,
      schema: IceSchema,
      formatVersion: Int = 2,
      content: Int = 0): ManifestFile = {
    val partType = spec.partitionType(schema)
    val avroSchema = entrySchema(partType)
    val fs = FileSystem.get(new java.net.URI(path), conf)
    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
    writer.setMeta("schema", TableMetadataJson.schemaToJson(schema).toString)
    writer.setMeta("schema-id", schema.schemaId.toString)
    writer.setMeta("partition-spec", TableMetadataJson.specToJson(spec).get("fields").toString)
    writer.setMeta("partition-spec-id", spec.specId.toString)
    writer.setMeta("format-version", formatVersion.toString)
    writer.setMeta("content", if (content == 0) "data" else "deletes")
    val out = fs.create(new Path(path), true)
    writer.create(avroSchema, out)
    val dfSchema = avroSchema.getField("data_file").schema()
    val partSchema = dfSchema.getField("partition").schema()
    entries.foreach { e =>
      val rec = new GenericData.Record(avroSchema)
      rec.put("status", e.status)
      rec.put("snapshot_id", e.snapshotId)
      rec.put("sequence_number", e.sequenceNumber.map(Long.box).orNull)
      rec.put("file_sequence_number", e.fileSequenceNumber.map(Long.box).orNull)
      val df = new GenericData.Record(dfSchema)
      val f = e.dataFile
      df.put("content", f.content)
      df.put("file_path", f.filePath)
      df.put("file_format", f.fileFormat)
      val part = new GenericData.Record(partSchema)
      partType.fields.zip(f.partition).foreach { case (pf, v) =>
        part.put(pf.name, partValueToAvro(pf.tpe, v))
      }
      df.put("partition", part)
      df.put("record_count", f.recordCount)
      df.put("file_size_in_bytes", f.fileSizeInBytes)
      df.put("column_sizes", kvToAvro(dfSchema.getField("column_sizes").schema(), f.columnSizes))
      df.put("value_counts", kvToAvro(dfSchema.getField("value_counts").schema(), f.valueCounts))
      df.put("null_value_counts",
        kvToAvro(dfSchema.getField("null_value_counts").schema(), f.nullValueCounts))
      df.put("nan_value_counts",
        kvToAvro(dfSchema.getField("nan_value_counts").schema(), f.nanValueCounts))
      df.put("lower_bounds", kvToAvro(dfSchema.getField("lower_bounds").schema(), f.lowerBounds))
      df.put("upper_bounds", kvToAvro(dfSchema.getField("upper_bounds").schema(), f.upperBounds))
      df.put("split_offsets",
        if (f.splitOffsets.isEmpty) null else f.splitOffsets.map(Long.box).asJava)
      df.put("equality_ids",
        if (f.equalityIds.isEmpty) null else f.equalityIds.map(Int.box).asJava)
      df.put("sort_order_id", f.sortOrderId.map(Int.box).orNull)
      df.put("referenced_data_file", f.referencedDataFile.orNull)
      df.put("content_offset", f.contentOffset.map(Long.box).orNull)
      df.put("content_size_in_bytes", f.contentSizeInBytes.map(Long.box).orNull)
      df.put("graft_has_field_ids", f.hasFieldIds.map(Boolean.box).orNull)
      rec.put("data_file", df)
      writer.append(rec)
    }
    writer.close()
    val length = fs.getFileStatus(new Path(path)).getLen
    val added = entries.filter(_.status == ManifestEntryStatus.Added)
    val existing = entries.filter(_.status == ManifestEntryStatus.Existing)
    val deleted = entries.filter(_.status == ManifestEntryStatus.Deleted)
    ManifestFile(
      path = path, length = length, specId = spec.specId, content = content,
      sequenceNumber = 0L, minSequenceNumber = 0L, addedSnapshotId = 0L,
      addedFilesCount = added.size, existingFilesCount = existing.size,
      deletedFilesCount = deleted.size,
      addedRowsCount = added.map(_.dataFile.recordCount).sum,
      existingRowsCount = existing.map(_.dataFile.recordCount).sum,
      deletedRowsCount = deleted.map(_.dataFile.recordCount).sum,
      partitions = fieldSummaries(partType, entries.map(_.dataFile.partition)))
  }

  /** Per-partition-field null flags + bounds (reference `manifest.go:65-70`). */
  private def fieldSummaries(partType: IceStructType, tuples: Seq[Seq[Any]]): Seq[FieldSummary] =
    partType.fields.zipWithIndex.map { case (pf, i) =>
      val values = tuples.map(t => if (i < t.size) t(i) else null)
      val nonNull = values.filter(_ != null)
      val hasNaN = nonNull.exists(Bounds.isNaN)
      val comparable = nonNull.filterNot(Bounds.isNaN)
      val lower = comparable.reduceOption((a, b) => if (Bounds.compare(pf.tpe, a, b) <= 0) a else b)
      val upper = comparable.reduceOption((a, b) => if (Bounds.compare(pf.tpe, a, b) >= 0) a else b)
      FieldSummary(
        containsNull = values.exists(_ == null),
        containsNan = Some(hasNaN),
        lowerBound = lower.map(Bounds.encode(pf.tpe, _)),
        upperBound = upper.map(Bounds.encode(pf.tpe, _)))
    }

  def writeManifestList(path: String, manifests: Seq[ManifestFile]): Unit = {
    val fs = FileSystem.get(new java.net.URI(path), conf)
    val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](manifestListSchema))
    val out = fs.create(new Path(path), true)
    writer.create(manifestListSchema, out)
    val partArrayField = manifestListSchema.getField("partitions").schema()
    val partArrSchema = partArrayField.getTypes.asScala.find(_.getType == Schema.Type.ARRAY).get
    val summarySchema = partArrSchema.getElementType
    manifests.foreach { m =>
      val rec = new GenericData.Record(manifestListSchema)
      rec.put("manifest_path", m.path)
      rec.put("manifest_length", m.length)
      rec.put("partition_spec_id", m.specId)
      rec.put("content", m.content)
      rec.put("sequence_number", m.sequenceNumber)
      rec.put("min_sequence_number", m.minSequenceNumber)
      rec.put("added_snapshot_id", m.addedSnapshotId)
      rec.put("added_files_count", m.addedFilesCount)
      rec.put("existing_files_count", m.existingFilesCount)
      rec.put("deleted_files_count", m.deletedFilesCount)
      rec.put("added_rows_count", m.addedRowsCount)
      rec.put("existing_rows_count", m.existingRowsCount)
      rec.put("deleted_rows_count", m.deletedRowsCount)
      if (m.partitions.nonEmpty) {
        val list = new java.util.ArrayList[GenericRecord](m.partitions.size)
        m.partitions.foreach { s =>
          val r = new GenericData.Record(summarySchema)
          r.put("contains_null", s.containsNull)
          r.put("contains_nan", s.containsNan.map(Boolean.box).orNull)
          r.put("lower_bound", s.lowerBound.map(ByteBuffer.wrap).orNull)
          r.put("upper_bound", s.upperBound.map(ByteBuffer.wrap).orNull)
          list.add(r)
        }
        rec.put("partitions", new GenericData.Array(partArrSchema, list))
      }
      writer.append(rec)
    }
    writer.close()
  }

  // --------------------------------------------------------------- read
  private def openReader(path: String): DataFileReader[GenericRecord] = {
    val fs = FileSystem.get(new java.net.URI(path), conf)
    val in = fs.open(new Path(path))
    val len = fs.getFileStatus(new Path(path)).getLen
    // buffer fully: manifests are small and SeekableInput over HDFS streams is fiddly
    val buf = new ByteArrayOutputStream(len.toInt)
    val tmp = new Array[Byte](64 * 1024)
    var n = in.read(tmp)
    while (n > 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
    in.close()
    val reader: DatumReader[GenericRecord] = new GenericDatumReader[GenericRecord]()
    new DataFileReader[GenericRecord](
      new org.apache.avro.file.SeekableByteArrayInput(buf.toByteArray), reader)
  }

  /** Read manifest entries plus the spec-id and partition type they were
    * written with (from the writer metadata).
    */
  def readManifest(path: String, specs: Seq[PartitionSpec], schema: IceSchema)
      : (Int, Seq[ManifestEntry]) = {
    val reader = openReader(path)
    val specId = Option(reader.getMetaString("partition-spec-id")).map(_.toInt).getOrElse(0)
    val spec = specs.find(_.specId == specId).getOrElse(PartitionSpec.Unpartitioned)
    val partType = spec.partitionType(schema)
    val entries = Seq.newBuilder[ManifestEntry]
    while (reader.hasNext) {
      val rec = reader.next()
      val df = rec.get("data_file").asInstanceOf[GenericRecord]
      val part = df.get("partition").asInstanceOf[GenericRecord]
      val partValues = partType.fields.map(pf => partValueFromAvro(pf.tpe, part.get(pf.name)))
      entries += ManifestEntry(
        status = rec.get("status").asInstanceOf[Int],
        snapshotId = Option(rec.get("snapshot_id")).map(_.asInstanceOf[Long]).getOrElse(0L),
        sequenceNumber = Option(rec.get("sequence_number")).map(_.asInstanceOf[Long]),
        fileSequenceNumber = Option(rec.get("file_sequence_number")).map(_.asInstanceOf[Long]),
        dataFile = DataFile(
          content = df.get("content").asInstanceOf[Int],
          filePath = df.get("file_path").toString,
          fileFormat = df.get("file_format").toString,
          partition = partValues,
          recordCount = df.get("record_count").asInstanceOf[Long],
          fileSizeInBytes = df.get("file_size_in_bytes").asInstanceOf[Long],
          columnSizes = kvFromAvro(df.get("column_sizes"))(_.asInstanceOf[Long]),
          valueCounts = kvFromAvro(df.get("value_counts"))(_.asInstanceOf[Long]),
          nullValueCounts = kvFromAvro(df.get("null_value_counts"))(_.asInstanceOf[Long]),
          nanValueCounts = kvFromAvro(df.get("nan_value_counts"))(_.asInstanceOf[Long]),
          lowerBounds = kvFromAvro(df.get("lower_bounds"))(v => bytes(v.asInstanceOf[ByteBuffer])),
          upperBounds = kvFromAvro(df.get("upper_bounds"))(v => bytes(v.asInstanceOf[ByteBuffer])),
          splitOffsets = Option(df.get("split_offsets"))
            .map(_.asInstanceOf[java.util.Collection[Long]].asScala.toSeq).getOrElse(Nil),
          sortOrderId = Option(df.get("sort_order_id")).map(_.asInstanceOf[Int]),
          equalityIds = Option(df.get("equality_ids"))
            .map(_.asInstanceOf[java.util.Collection[Int]].asScala.toSeq).getOrElse(Nil),
          referencedDataFile = Option(df.get("referenced_data_file")).map(_.toString),
          contentOffset = Option(df.get("content_offset")).map(_.asInstanceOf[Long]),
          contentSizeInBytes =
            Option(df.get("content_size_in_bytes")).map(_.asInstanceOf[Long]),
          // records from pre-extension manifests have no such field → None
          hasFieldIds = Option(df.getSchema.getField("graft_has_field_ids"))
            .flatMap(_ => Option(df.get("graft_has_field_ids")))
            .map(_.asInstanceOf[Boolean])))
    }
    reader.close()
    (specId, entries.result())
  }

  def readManifestList(path: String): Seq[ManifestFile] = {
    val reader = openReader(path)
    val out = Seq.newBuilder[ManifestFile]
    while (reader.hasNext) {
      val rec = reader.next()
      val partitions = Option(rec.get("partitions")).map { arr =>
        arr.asInstanceOf[java.util.Collection[_]].asScala.map { case r: GenericRecord =>
          FieldSummary(
            containsNull = r.get("contains_null").asInstanceOf[Boolean],
            containsNan = Option(r.get("contains_nan")).map(_.asInstanceOf[Boolean]),
            lowerBound = Option(r.get("lower_bound")).map(v => bytes(v.asInstanceOf[ByteBuffer])),
            upperBound = Option(r.get("upper_bound")).map(v => bytes(v.asInstanceOf[ByteBuffer])))
        }.toSeq
      }.getOrElse(Nil)
      out += ManifestFile(
        path = rec.get("manifest_path").toString,
        length = rec.get("manifest_length").asInstanceOf[Long],
        specId = rec.get("partition_spec_id").asInstanceOf[Int],
        content = rec.get("content").asInstanceOf[Int],
        sequenceNumber = rec.get("sequence_number").asInstanceOf[Long],
        minSequenceNumber = rec.get("min_sequence_number").asInstanceOf[Long],
        addedSnapshotId = rec.get("added_snapshot_id").asInstanceOf[Long],
        addedFilesCount = rec.get("added_files_count").asInstanceOf[Int],
        existingFilesCount = rec.get("existing_files_count").asInstanceOf[Int],
        deletedFilesCount = rec.get("deleted_files_count").asInstanceOf[Int],
        addedRowsCount = rec.get("added_rows_count").asInstanceOf[Long],
        existingRowsCount = rec.get("existing_rows_count").asInstanceOf[Long],
        deletedRowsCount = rec.get("deleted_rows_count").asInstanceOf[Long],
        partitions = partitions)
    }
    reader.close()
    out.result()
  }
}

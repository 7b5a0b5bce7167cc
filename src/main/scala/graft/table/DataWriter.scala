package graft.table

import java.util.UUID
import scala.collection.parallel.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path, RemoteIterator}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

import graft.core._
import graft.meta.{DataFile, PartitionSpec, SortOrder}

/** The append data plane: write a DataFrame as Parquet data files and derive
  * `DataFile` entries (stats from footers).
  *
  * Partitioned writes compute the transform columns with Catalyst
  * expressions (codegen), shuffle once on the partition tuple
  * (`repartition`, the fanout of reference
  * `partitioned_fanout_writer.go:38-229`), and use `partitionBy` on derived
  * `_p_*` columns so every data column — including partition sources — stays
  * in the file, as Iceberg requires. Partition values are recovered from the
  * staged directory names.
  *
  * 100 TB notes: one shuffle on the partition tuple; file sizing via
  * `maxRecordsPerFile` session conf; footer-stat collection is metadata-only
  * and parallelized driver-side.
  */
object DataWriter {
  private def conf = graft.meta.FileIO.conf
  private val PartPrefix = "_p_"
  private val HiveNull = "__HIVE_DEFAULT_PARTITION__"

  def write(df: DataFrame, location: String, schema: IceSchema,
      spec: PartitionSpec, sortOrder: SortOrder = SortOrder.Unsorted,
      properties: Map[String, String] = Map.empty): Seq[DataFile] = {
    val staging = s"$location/data/${UUID.randomUUID()}"
    // reference write defaults (`parquet_files.go:46-64`): zstd compression,
    // bounded rows per file (the rolling-writer equivalent)
    val compression = properties.getOrElse("write.parquet.compression-codec", "zstd")
    val maxRecords = properties.getOrElse("write.max-records-per-file", "1048576").toLong
    // attach parquet.field.id metadata so Spark's writer stamps Iceberg
    // field IDs into the files (ID-based column resolution on read); the
    // cast to the Iceberg-derived Spark type carries NESTED field IDs too
    // (they live on the StructFields inside the DataType tree)
    // the FILE schema uses Avro-compatible names (reference sanitizes at
    // write, `table/writer.go:106`); reads resolve by field ID, so the
    // table-visible names are untouched
    val writeSchema = SchemaConv.sanitizeColumnNames(schema)
    val dfCols = df.columns.toSet
    val withIds = df.select(schema.fields.zip(writeSchema.fields).map { case (f, wf) =>
      val sf = SchemaConv.toSparkField(wf)
      val value =
        if (dfCols.contains(f.name))
          if (f.tpe.isPrimitive) col(f.name) else col(f.name).cast(sf.dataType)
        else {
          // writer omitted the column → its write-default (null if optional)
          require(!f.required || f.writeDefault.isDefined,
            s"missing required column ${f.name}")
          lit(f.writeDefault.orNull).cast(sf.dataType)
        }
      value.as(wf.name, sf.metadata)
    }: _*)
    // honor the table sort order at write (reference applies SortOrder at
    // write, `table/sorting.go` + writer): range-partition on the sort key
    // so files hold disjoint ranges, then sort within each — that is what
    // tightens per-file min/max bounds and makes stats pruning bite
    val sortCols = sortOrder.fields.map { sf =>
      val src = writeSchema.findById(sf.sourceId).get
      val c = sf.transform.toColumn(col(src.name), src.tpe)
      (sf.ascending, sf.nullsFirst) match {
        case (true, true) => c.asc_nulls_first
        case (true, false) => c.asc_nulls_last
        case (false, true) => c.desc_nulls_first
        case (false, false) => c.desc_nulls_last
      }
    }
    val aligned =
      if (sortOrder.isUnsorted) withIds
      else withIds.repartitionByRange(sortCols: _*).sortWithinPartitions(sortCols: _*)
    if (spec.isUnpartitioned) {
      aligned.write
        .option("compression", compression)
        .option("maxRecordsPerFile", maxRecords)
        .parquet(staging)
      renameToIceberg(listParquet(staging)).par.map { case (p, len) =>
        ParquetStats.toDataFile(p, len, schema, Nil,
          nameToId = Some(writeSchema.idByName))
      }.seq.toSeq
    } else {
      val partCols = spec.fields.map { pf =>
        val src = writeSchema.findById(pf.sourceId).get
        pf.transform.toColumn(col(src.name), src.tpe).as(PartPrefix + pf.name)
      }
      val partNames = spec.fields.map(PartPrefix + _.name)
      // fanout shuffle on the partition tuple; tasks-per-partition > 1
      // salts the shuffle so one giant partition value cannot pin a single
      // reducer (the skew escape hatch at 100 TB)
      val fanout = properties.getOrElse("write.fanout.tasks-per-partition", "1").toInt
      val shuffleKeys =
        if (fanout <= 1) partNames.map(col)
        else partNames.map(col) :+ pmod(hash(schema.fields.map(f => col(f.name)): _*),
          lit(fanout))
      aligned.select(writeSchema.fields.map(f => col(f.name)) ++ partCols: _*)
        .repartition(shuffleKeys: _*)
        .write
        .option("compression", compression)
        .option("maxRecordsPerFile", maxRecords)
        .partitionBy(partNames: _*).parquet(staging)
      val partType = spec.partitionType(schema)
      renameToIceberg(listParquet(staging)).par.map { case (p, len) =>
        val tuple = parsePartitionPath(p, staging, partType)
        ParquetStats.toDataFile(p, len, schema, tuple,
          nameToId = Some(writeSchema.idByName))
      }.seq.toSeq
    }
  }

  /** Rename staged part-files to the reference's data-file convention
    * `%05d-{task}-{uuid}.parquet` (reference `table/writer.go:41-45`),
    * keeping partition directories intact. Metadata-only (FS rename).
    */
  private def renameToIceberg(files: Seq[(String, Long)]): Seq[(String, Long)] = {
    // Path.toUri escapes characters a raw URI constructor rejects (identity
    // timestamp partition dirs contain spaces)
    val fs = FileSystem.get(
      new Path(files.headOption.map(_._1).getOrElse("/")).toUri, conf)
    files.zipWithIndex.map { case ((p, len), i) =>
      val dir = p.substring(0, p.lastIndexOf('/'))
      val target = f"$dir/$i%05d-$i-${UUID.randomUUID()}.parquet"
      if (fs.rename(new Path(p), new Path(target))) (target, len) else (p, len)
    }
  }

  /** Recursively list data parquet files under a staging dir. */
  def listParquet(dir: String): Seq[(String, Long)] = {
    val fs = FileSystem.get(new java.net.URI(dir), conf)
    val out = Seq.newBuilder[(String, Long)]
    val it: RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] =
      fs.listFiles(new Path(dir), true)
    while (it.hasNext) {
      val st = it.next()
      val p = st.getPath.toUri.getPath
      if (p.endsWith(".parquet") && !p.contains("_temporary")) out += p -> st.getLen
    }
    out.result()
  }

  /** Parse `_p_name=value/...` segments back into a typed partition tuple. */
  private[table] def parsePartitionPath(file: String, staging: String,
      partType: IceStructType): Seq[Any] = {
    val rel = file.stripPrefix(staging).stripPrefix("/")
    val kv = rel.split('/').dropRight(1).iterator.map { seg =>
      val i = seg.indexOf('=')
      seg.substring(0, i).stripPrefix(PartPrefix) -> unescape(seg.substring(i + 1))
    }.toMap
    partType.fields.map { f =>
      kv.get(f.name) match {
        case None | Some(HiveNull) => null
        case Some(s) => parseValue(f.tpe, s)
      }
    }
  }

  private def parseValue(t: IceType, s: String): Any = t match {
    case IceInt => s.toInt
    case IceLong => s.toLong
    case IceDate =>
      if (s.matches("-?\\d+")) s.toInt // day-transform output: raw epoch days
      else java.time.LocalDate.parse(s).toEpochDay.toInt
    case IceTimestamp | IceTimestampTz =>
      val norm = s.replace(' ', 'T')
      // full-fraction epoch micros: toEpochMilli would truncate sub-ms values
      // and the manifest partition tuple would disagree with the true value
      val i = java.time.Instant.parse(if (norm.endsWith("Z")) norm else norm + "Z")
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case IceTimestampNs | IceTimestampTzNs =>
      if (s.matches("-?\\d+")) s.toLong // LongType surrogate writes raw nanos
      else {
        val norm = s.replace(' ', 'T')
        val i = java.time.Instant.parse(if (norm.endsWith("Z")) norm else norm + "Z")
        i.getEpochSecond * 1000000000L + i.getNano
      }
    case IceString | IceUUID => s
    case IceDouble => s.toDouble
    case IceFloat => s.toFloat
    case IceBoolean => s.toBoolean
    case IceDecimal(_, sc) => new java.math.BigDecimal(s).setScale(sc)
    case other => throw new IllegalArgumentException(s"cannot parse partition value of $other")
  }

  /** Undo Hive path escaping (%xx sequences). */
  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length + 1 && i + 3 <= s.length) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}

package graft.table

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.meta._

/** Format-version matrix: v1 write compatibility (flat `schema` /
  * `partition-spec` JSON, sequence-number-free Avro manifests with the
  * deprecated `block_size_in_bytes` — reference `table/metadata.go:1611-1713`
  * `metadataV1`, `internal/avro_schemas.go:231-353` `data_file_v1` /
  * `manifest_entry_v1` / `manifest_list_file_v1`) and v3 write (required
  * `next-row-id`, snapshot `first-row-id` row lineage, `first_row_id`
  * manifest fields — `table/metadata.go:1772-1832` `metadataV3`).
  */
class FormatVersionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var catalog: FileCatalog = _
  private val sfDir = "/root/testdata/sf0.001"
  private val mapper = new ObjectMapper()

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("format-versions-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = new FileCatalog(Files.createTempDirectory("graft-fv-wh").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def region = spark.read.parquet(s"$sfDir/region.parquet")

  private def avroSchemaOf(path: String): org.apache.avro.Schema = {
    val r = new DataFileReader[GenericRecord](
      new java.io.File(new java.net.URI(path).getPath),
      new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  test("v1 table: create via format-version property, append, scan, v1 file shapes") {
    val t = IceTable.create(catalog, "r_v1", SchemaConv.fromSpark(region.schema),
      properties = Map("format-version" -> "1"))
    assert(t.metadata.formatVersion == 1)
    assert(!t.metadata.properties.contains("format-version")) // consumed, not stored
    t.append(region)

    // scan still works end-to-end through v1 manifests
    val mine = t.scan(spark)
    assert(mine.count() == region.count())
    assert(mine.exceptAll(region).isEmpty)

    // metadata JSON carries the v1-only flat forms and no v2+ fields
    val json = TableMetadataJson.write(IceTable.load(catalog, "r_v1").metadata)
    val n = mapper.readTree(json)
    assert(n.get("format-version").asInt() == 1)
    assert(n.has("schema") &&
      n.get("schema").get("fields").size() == region.schema.size)
    assert(n.has("partition-spec") && n.get("partition-spec").isArray)
    assert(!n.has("last-sequence-number"))
    assert(!n.has("next-row-id"))
    // and the modern lists ride alongside for v2-era readers
    assert(n.has("schemas") && n.has("partition-specs"))

    // the manifest's writer schema is the v1 shape: required snapshot_id,
    // no sequence numbers, deprecated block_size_in_bytes present
    val snap = t.metadata.currentSnapshot.get
    val manifest = ManifestIO.readManifestList(snap.manifestList).head
    val entrySchema = avroSchemaOf(manifest.path)
    assert(entrySchema.getField("sequence_number") == null)
    assert(entrySchema.getField("snapshot_id").schema().getType ==
      org.apache.avro.Schema.Type.LONG)
    val dfSchema = entrySchema.getField("data_file").schema()
    assert(dfSchema.getField("block_size_in_bytes") != null)
    assert(dfSchema.getField("content") == null)
    assert(dfSchema.getField("referenced_data_file") == null)
    // the manifest list predates content/sequence-number fields
    val listSchema = avroSchemaOf(snap.manifestList)
    assert(listSchema.getField("content") == null)
    assert(listSchema.getField("sequence_number") == null)
  }

  test("v1 JSON write round-trips through the reader") {
    val m = IceTable.load(catalog, "r_v1").metadata
    val back = TableMetadataJson.read(TableMetadataJson.write(m))
    assert(back.formatVersion == 1)
    assert(back.currentSchema.fields.map(_.name) == m.currentSchema.fields.map(_.name))
    assert(back.currentSnapshotId == m.currentSnapshotId)
    assert(back.snapshots.map(_.snapshotId) == m.snapshots.map(_.snapshotId))
  }

  test("v1 write rejects non-sequential partition field IDs") {
    val schema = IceSchema(0, Seq(NestedField(1, "x", IceLong, required = true)))
    val badSpec = PartitionSpec(0, Seq(
      PartitionField(1, 1001, "x", IdentityTransform))) // must start at 1000
    val m = TableMetadata(
      formatVersion = 1, tableUuid = "u", location = "/wh/x",
      lastSequenceNumber = 0L, lastUpdatedMs = 0L, lastColumnId = 1,
      currentSchemaId = 0, schemas = Seq(schema),
      defaultSpecId = 0, specs = Seq(badSpec), lastPartitionId = 1001,
      defaultSortOrderId = 0, sortOrders = Seq(SortOrder.Unsorted),
      properties = Map.empty, currentSnapshotId = None,
      snapshots = Nil, snapshotLog = Nil, metadataLog = Nil, refs = Map.empty)
    val ex = intercept[IllegalArgumentException](TableMetadataJson.write(m))
    assert(ex.getMessage.contains("not sequential"))
  }

  test("v1 manifests cannot carry delete files") {
    val t = IceTable.load(catalog, "r_v1")
    val ex = intercept[IllegalArgumentException] {
      ManifestIO.writeManifest("/tmp/never-written.avro", Nil,
        PartitionSpec.Unpartitioned, t.schema, formatVersion = 1, content = 1)
    }
    assert(ex.getMessage.contains("delete"))
  }

  test("v2 write omits next-row-id even when the counter is set") {
    val m = IceTable.load(catalog, "r_v1").metadata
      .copy(formatVersion = 2, nextRowId = Some(9L))
    val n = mapper.readTree(TableMetadataJson.write(m))
    assert(!n.has("next-row-id"))
    assert(n.has("last-sequence-number"))
    assert(!n.has("schema") && !n.has("partition-spec")) // v1-only forms gone
  }

  test("v3 table: row lineage advances across commits and survives reload") {
    val t = IceTable.create(catalog, "r_v3", SchemaConv.fromSpark(region.schema),
      properties = Map("format-version" -> "3"))
    assert(t.metadata.formatVersion == 3)
    assert(t.metadata.nextRowId.contains(0L))
    val rows = region.count()
    t.append(region)
    val s1 = t.metadata.currentSnapshot.get
    assert(s1.firstRowId.contains(0L))
    assert(t.metadata.nextRowId.contains(rows))
    t.append(region)
    val s2 = t.metadata.currentSnapshot.get
    assert(s2.firstRowId.contains(rows))
    assert(t.metadata.nextRowId.contains(2 * rows))
    // required v3 field serialized + read back through the catalog
    val reloaded = IceTable.load(catalog, "r_v3").metadata
    assert(reloaded.nextRowId.contains(2 * rows))
    assert(reloaded.currentSnapshot.get.firstRowId.contains(rows))
    val n = mapper.readTree(TableMetadataJson.write(reloaded))
    assert(n.get("next-row-id").asLong() == 2 * rows)
  }

  test("v3 manifest + list round-trip first_row_id and DV pointer fields") {
    val t = IceTable.load(catalog, "r_v3")
    val dir = Files.createTempDirectory("graft-v3-man").toString
    val df = DataFile(
      content = 0, filePath = "/wh/d1.parquet", fileFormat = "parquet",
      partition = Nil, recordCount = 10L, fileSizeInBytes = 100L,
      lowerBounds = Map(1 -> Array[Byte](1)), upperBounds = Map(1 -> Array[Byte](9)),
      firstRowId = Some(40L))
    val entries = Seq(ManifestEntry(ManifestEntryStatus.Added, 5L, Some(2L), Some(2L), df))
    val mf = ManifestIO.writeManifest(s"$dir/m3.avro", entries,
      PartitionSpec.Unpartitioned, t.schema, formatVersion = 3)
      .copy(sequenceNumber = 2L, minSequenceNumber = 2L, addedSnapshotId = 5L,
        firstRowId = Some(40L))
    val (_, back) = ManifestIO.readManifest(s"$dir/m3.avro", t.metadata.specs, t.schema)
    assert(back.head.dataFile.firstRowId.contains(40L))
    assert(back.head.sequenceNumber.contains(2L))
    ManifestIO.writeManifestList(s"$dir/list3.avro", Seq(mf), formatVersion = 3)
    val lback = ManifestIO.readManifestList(s"$dir/list3.avro")
    assert(lback.head.firstRowId.contains(40L))
    assert(lback.head.sequenceNumber == 2L)
    val listSchema = avroSchemaOf(s"$dir/list3.avro")
    assert(listSchema.getField("first_row_id") != null)
  }

  test("timestamp_ns column: v3 table over nanosecond events, day-partitioned") {
    // A self-generated TIMESTAMP(NANOS) fixture (the driver's events.parquet
    // unit varies across regenerations); Spark surfaces NANOS as LongType
    // under nanosAsLong — exactly our LongType surrogate for the v3
    // timestamp_ns type (reference `types.go:704-716`)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(graft.NanosEventsFixture.path(spark, sfDir))
      .select("event_id", "ts", "user_id")
    val base = SchemaConv.fromSpark(events.schema)
    val schema = IceSchema(base.schemaId, base.fields.map(f =>
      if (f.name == "ts") f.copy(tpe = IceTimestampNs) else f))
    val tsId = schema.findByName("ts").get.id
    val spec = PartitionSpec(0, Seq(PartitionField(tsId, 1000, "ts_day", DayTransform)))
    val t = IceTable.create(catalog, "ev_ns", schema, spec,
      properties = Map("format-version" -> "3"))
    t.append(events)

    // full scan matches the direct read
    assert(t.scan(spark).count() == events.count())
    // a ns-typed predicate plans + executes; result matches the long filter
    val cut = events.selectExpr("percentile_approx(ts, 0.5)").first().getLong(0)
    val mine = t.scan(spark, graft.core.Predicates.gtEq("ts", cut))
    assert(mine.count() == events.where(s"ts >= ${cut}L").count())
    // day-transform partition pruning: a far-future cut plans zero files
    val futureNs = 4102444800L * 1000000000L // 2100-01-01
    assert(t.scan(spark, graft.core.Predicates.gtEq("ts", futureNs)).count() == 0)
  }

  test("timestamp_ns requires format-version 3 at metadata write") {
    val schema = IceSchema(0, Seq(NestedField(1, "ts", IceTimestampNs, required = true)))
    val ex = intercept[IllegalArgumentException] {
      IceTable.create(catalog, "ev_ns_v2", schema,
        properties = Map("format-version" -> "2"))
    }
    assert(ex.getMessage.contains("requires format-version 3"))
  }

  test("v2->v3 upgrade: legacy manifests consume row-id ranges exactly once") {
    val t = IceTable.create(catalog, "r_up23", SchemaConv.fromSpark(region.schema),
      properties = Map("format-version" -> "2"))
    t.append(region)
    t.append(region) // two lineage-less manifests predating v3
    t.commitUpdates(Nil, Seq(UpgradeFormatVersion(3)))
    assert(IceTable.load(catalog, "r_up23").metadata.formatVersion == 3)
    // The first v3 commit assigns ranges to BOTH legacy carried-forward
    // manifests in addition to its own; the persisted next-row-id must
    // clear ALL assignments (not just this commit's added rows), or the
    // second commit reissues the legacy ranges as duplicate _row_id values
    t.append(region)
    t.append(region)
    val ids = t.newScan(withRowId = true).toDF(spark).select("_row_id")
    val n = ids.count()
    assert(n == 4 * region.count())
    assert(ids.distinct().count() == n,
      "duplicate _row_id after v2->v3 upgrade: legacy ranges reissued")
    assert(t.metadata.nextRowId.exists(_ >= n))
  }

  test("upgrading a v2 table to v3 seeds the row-lineage counter") {
    val m2 = IceTable.load(catalog, "r_v1").metadata.copy(formatVersion = 2)
    val m3 = UpgradeFormatVersion(3).apply(m2)
    assert(m3.nextRowId.contains(0L))
    // and the upgrade is one-way
    intercept[IllegalArgumentException](UpgradeFormatVersion(1).apply(m3))
  }
}

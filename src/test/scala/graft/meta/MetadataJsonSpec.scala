package graft.meta

import org.scalatest.funsuite.AnyFunSuite

import graft.core._

/** Metadata JSON parse matrix re-derived from the reference's golden-file
  * tests (`table/metadata_internal_test.go`, fixtures
  * `table/testdata/TableMetadataV2Valid.json` + invalid variants): a valid
  * v1 document (single `schema`, flat `partition-spec`) upgrades on read,
  * and each structurally-invalid variant fails with a diagnostic instead of
  * a null-pointer surprise.
  */
class MetadataJsonSpec extends AnyFunSuite {

  private val v1Json = """{
    "format-version": 1,
    "table-uuid": "9c12d441-03fe-4693-9a96-a0705ddf69c1",
    "location": "/wh/t1",
    "last-updated-ms": 1602638573874,
    "last-column-id": 3,
    "schema": {"type": "struct", "fields": [
      {"id": 1, "name": "x", "required": true, "type": "long"},
      {"id": 2, "name": "y", "required": true, "type": "long", "doc": "comment"},
      {"id": 3, "name": "z", "required": false, "type": "string"}]},
    "partition-spec": [{"name": "x", "transform": "identity", "source-id": 1, "field-id": 1000}],
    "properties": {},
    "current-snapshot-id": -1,
    "snapshots": []
  }"""

  test("v1 metadata: single schema and flat partition-spec upgrade on read") {
    val m = TableMetadataJson.read(v1Json)
    assert(m.formatVersion == 1)
    assert(m.currentSchema.fields.map(_.name) == Seq("x", "y", "z"))
    assert(m.currentSchema.findByName("y").flatMap(_.doc).contains("comment"))
    assert(m.defaultSpec.fields == Seq(
      PartitionField(1, 1000, "x", IdentityTransform)))
    assert(m.currentSnapshotId.isEmpty) // -1 sentinel means no snapshot
    assert(m.lastColumnId == 3)
  }

  test("v1 flat partition-spec without field-ids assigns from 1000") {
    val m = TableMetadataJson.read(v1Json.replace(""", "field-id": 1000""", ""))
    assert(m.defaultSpec.fields.head.fieldId == 1000)
  }

  private def invalid(mutate: String => String): String = mutate(v1Json)

  test("invalid variants fail with diagnostics") {
    val cases: Seq[(String, String => String)] = Seq(
      ("missing format-version", _.replace("\"format-version\": 1,", "")),
      ("unsupported format-version", _.replace("\"format-version\": 1", "\"format-version\": 9")),
      ("missing location", _.replace(""""location": "/wh/t1",""", "")),
      ("missing schema", _.replace("\"schema\":", "\"not-schema\":")))
    cases.foreach { case (tag, mutate) =>
      val ex = intercept[IllegalArgumentException](TableMetadataJson.read(invalid(mutate)))
      assert(ex.getMessage.startsWith("invalid metadata"), s"$tag: ${ex.getMessage}")
    }
  }

  test("v2 metadata requires schemas, current-schema-id, last-sequence-number, uuid") {
    val v2Base = v1Json.replace("\"format-version\": 1", "\"format-version\": 2")
    // still v1-shaped → every v2 requirement trips
    val ex = intercept[IllegalArgumentException](TableMetadataJson.read(v2Base))
    assert(ex.getMessage.contains("v2 metadata requires"))
  }

  test("the reference's golden files: V2Valid parses field-for-field, every invalid variant fails") {
    val dir = java.nio.file.Paths.get("/root/reference/table/testdata")
    assume(java.nio.file.Files.isDirectory(dir), s"reference golden dir not present: $dir")
    def slurp(f: String) = new String(java.nio.file.Files.readAllBytes(
      dir.resolve(f)), java.nio.charset.StandardCharsets.UTF_8)
    val m = TableMetadataJson.read(slurp("TableMetadataV2Valid.json"))
    assert(m.formatVersion == 2)
    assert(m.tableUuid == "9c12d441-03fe-4693-9a96-a0705ddf69c1")
    assert(m.location == "s3://bucket/test/location")
    assert(m.lastSequenceNumber == 34L)
    assert(m.lastColumnId == 3)
    assert(m.schemas.map(_.schemaId) == Seq(0, 1))
    assert(m.currentSchema.schemaId == 1)
    assert(m.currentSchema.identifierFieldIds == Seq(1, 2))
    assert(m.currentSchema.fields.map(_.name) == Seq("x", "y", "z"))
    assert(m.currentSchema.findByName("y").flatMap(_.doc).contains("comment"))
    assert(m.defaultSpec.fields == Seq(PartitionField(1, 1000, "x", IdentityTransform)))
    assert(m.lastPartitionId == 1000)
    assert(m.defaultSortOrderId == 3)
    assert(m.sortOrders.map(_.orderId) == Seq(3))
    assert(m.sortOrders.head.fields == Seq(
      SortField(2, IdentityTransform, ascending = true, nullsFirst = true),
      SortField(3, BucketTransform(4), ascending = false, nullsFirst = false)))
    assert(m.currentSnapshotId.contains(3055729675574597004L))
    assert(m.snapshots.map(_.snapshotId) ==
      Seq(3051729675574597004L, 3055729675574597004L))
    val cur = m.snapshots.last
    assert(cur.parentSnapshotId.contains(3051729675574597004L))
    assert(cur.sequenceNumber == 1L)
    assert(cur.manifestList == "s3://a/b/2.avro")
    assert(cur.summary.get("operation").contains("append"))
    assert(cur.schemaId == 1)
    assert(m.snapshotLog.map(_.snapshotId) ==
      Seq(3051729675574597004L, 3055729675574597004L))
    // our writer round-trips the reference's document
    assert(TableMetadataJson.read(TableMetadataJson.write(m)) == m)
    // every invalid golden variant must fail with a diagnostic, never parse
    val invalids = java.nio.file.Files.list(dir).iterator()
    var checked = 0
    invalids.forEachRemaining { p =>
      val name = p.getFileName.toString
      if (name.endsWith(".json") && name != "TableMetadataV2Valid.json") {
        checked += 1
        val ex = intercept[IllegalArgumentException](
          TableMetadataJson.read(slurp(name)))
        assert(ex.getMessage.nonEmpty, s"$name: empty diagnostic")
      }
    }
    assert(checked == 8, s"expected the 8 invalid golden variants, saw $checked")
  }

  test("current-schema-id must resolve into the schema list") {
    val bad = v1Json
      .replace("\"format-version\": 1,", "\"format-version\": 1, \"current-schema-id\": 42,")
    val ex = intercept[IllegalArgumentException](TableMetadataJson.read(bad))
    assert(ex.getMessage.contains("current-schema-id 42"))
  }

  test("v3 row-lineage fields (next-row-id / first-row-id) round-trip") {
    val schema = IceSchema(0, Seq(NestedField(1, "x", IceLong, required = true)))
    val m = TableMetadata(
      formatVersion = 3, tableUuid = "u-1", location = "/wh/t3",
      lastSequenceNumber = 1L, lastUpdatedMs = 1L, lastColumnId = 1,
      currentSchemaId = 0, schemas = Seq(schema),
      defaultSpecId = 0, specs = Seq(PartitionSpec.Unpartitioned),
      lastPartitionId = 999, defaultSortOrderId = 0,
      sortOrders = Seq(SortOrder.Unsorted), properties = Map.empty,
      currentSnapshotId = Some(7L),
      snapshots = Seq(Snapshot(7L, None, 1L, 1L, "/wh/t3/metadata/snap.avro",
        Map("operation" -> "append"), 0, firstRowId = Some(100L))),
      snapshotLog = Nil, metadataLog = Nil, refs = Map.empty,
      nextRowId = Some(250L))
    val back = TableMetadataJson.read(TableMetadataJson.write(m))
    assert(back.formatVersion == 3)
    assert(back.nextRowId.contains(250L))
    assert(back.snapshots.head.firstRowId.contains(100L))
  }

  test("gzip metadata round-trips through the catalog reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gz")
    val plain = dir.resolve("v7.metadata.json")
    val gz = java.nio.file.Files.newOutputStream(dir.resolve("v8.metadata.json.gz"))
    val zipped = new java.util.zip.GZIPOutputStream(gz)
    zipped.write(v1Json.getBytes("UTF-8")); zipped.close()
    java.nio.file.Files.write(plain, v1Json.getBytes("UTF-8"))
    val cat = new FileCatalog(dir.toString)
    // plain path, and the .gz fallback when the plain file is absent
    assert(TableMetadataJson.read(cat.readMetadataFile(plain.toString)).formatVersion == 1)
    assert(TableMetadataJson.read(
      cat.readMetadataFile(dir.resolve("v8.metadata.json").toString)).formatVersion == 1)
  }

  test("v3 ns-timestamp defaults round-trip as ISO-8601 strings, not raw nanos") {
    val nanos = 1700000000123456789L // 2023-11-14T22:13:20.123456789Z
    val schema = IceSchema(0, Seq(
      NestedField(1, "id", IceLong, required = true),
      NestedField(2, "ts9", IceTimestampNs, required = false,
        initialDefault = Some(nanos), writeDefault = Some(nanos)),
      NestedField(3, "tz9", IceTimestampTzNs, required = false,
        initialDefault = Some(nanos), writeDefault = Some(nanos))))
    val meta = TableMetadata(
      formatVersion = 3, tableUuid = java.util.UUID.randomUUID().toString,
      location = "file:///tmp/t", lastSequenceNumber = 0L,
      lastUpdatedMs = 1L, lastColumnId = 3, currentSchemaId = 0,
      schemas = Seq(schema), defaultSpecId = 0,
      specs = Seq(PartitionSpec.Unpartitioned), lastPartitionId = 999,
      defaultSortOrderId = 0, sortOrders = Seq(SortOrder.Unsorted),
      properties = Map.empty, currentSnapshotId = None,
      snapshots = Nil, snapshotLog = Nil, metadataLog = Nil, refs = Map.empty,
      nextRowId = Some(0L))
    val json = TableMetadataJson.write(meta)
    // spec single-value serialization: temporal defaults are STRINGS on
    // the wire — a numeric default read by a spec reader as a string (or
    // Jackson's asLong() on text silently returning 0) corrupts the value
    assert(json.contains("2023-11-14T22:13:20.123456789"),
      "ns default not serialized as ISO-8601")
    assert(json.contains("2023-11-14T22:13:20.123456789+00:00"),
      "tz ns default missing UTC offset")
    val back = TableMetadataJson.read(json).schemas.head
    assert(back.findByName("ts9").exists(_.initialDefault.contains(nanos)))
    assert(back.findByName("ts9").exists(_.writeDefault.contains(nanos)))
    assert(back.findByName("tz9").exists(_.initialDefault.contains(nanos)))
  }

  test("column defaults require format-version 3 (checkSchemaCompatibility parity)") {
    val schema = IceSchema(0, Seq(
      NestedField(1, "id", IceLong, required = true),
      NestedField(2, "q", IceDouble, required = false,
        initialDefault = Some(0.5), writeDefault = Some(0.5))))
    def meta(v: Int) = TableMetadata(
      formatVersion = v, tableUuid = java.util.UUID.randomUUID().toString,
      location = "file:///tmp/t", lastSequenceNumber = 0L,
      lastUpdatedMs = 1L, lastColumnId = 2, currentSchemaId = 0,
      schemas = Seq(schema), defaultSpecId = 0,
      specs = Seq(PartitionSpec.Unpartitioned), lastPartitionId = 999,
      defaultSortOrderId = 0, sortOrders = Seq(SortOrder.Unsorted),
      properties = Map.empty, currentSnapshotId = None,
      snapshots = Nil, snapshotLog = Nil, metadataLog = Nil, refs = Map.empty,
      nextRowId = if (v >= 3) Some(0L) else None)
    val e = intercept[IllegalArgumentException](TableMetadataJson.write(meta(2)))
    assert(e.getMessage.contains("default values require format-version 3+"))
    assert(TableMetadataJson.read(TableMetadataJson.write(meta(3)))
      .schemas.head.findByName("q").exists(_.initialDefault.contains(0.5)))
  }

  test("write.metadata.compression-codec=gzip writes the reference's .gz flavor; commits and reloads work") {
    import java.nio.file.{Files, Paths}
    val wh = Files.createTempDirectory("graft-gzw").toString
    val cat = new FileCatalog(wh)
    val schema = IceSchema(0, Seq(NestedField(1, "id", IceLong, required = true)))
    graft.table.IceTable.create(cat, "t_gz", schema,
      properties = Map("write.metadata.compression-codec" -> "gzip"))
    // commit a second version through the normal CAS
    cat.commit("t_gz", 1, cat.load("t_gz").copy(lastUpdatedMs = 42L))
    assert(cat.currentVersion("t_gz") === 2)
    assert(cat.load("t_gz").lastUpdatedMs === 42L, "gzip versions must reload")
    // reference naming flavor exists and carries gzip magic
    val gzPath = Paths.get(s"$wh/t_gz/metadata/v2.gz.metadata.json")
    assert(Files.exists(gzPath), "reference .gz.metadata.json flavor missing")
    val raw = Files.readAllBytes(gzPath)
    assert(raw(0) == 0x1f.toByte && raw(1) == 0x8b.toByte, "not gzip bytes")
    // every name's bytes match its extension: the plain CAS-lock name must
    // hold PLAIN json (external readers dispatch decompression by file
    // name — reference table.go isGzippedMetadataJson, Java Iceberg
    // Codec.fromFileName), and resolved locations prefer the gzip flavor
    val plain = Files.readAllBytes(Paths.get(s"$wh/t_gz/metadata/v2.metadata.json"))
    assert(plain(0) == '{'.toByte, "plain .metadata.json name must hold plain JSON")
    assert(cat.metadataLocation("t_gz", 2).endsWith("v2.gz.metadata.json"),
      "gzip-committed versions should resolve to the extension-accurate .gz name")
    // metadata-log location resolves, and delete-after-commit removes both names
    assert(Files.exists(Paths.get(cat.metadataLocation("t_gz", 1))))
    cat.deleteMetadataBefore("t_gz", 2)
    assert(!Files.exists(Paths.get(s"$wh/t_gz/metadata/v1.metadata.json")))
    assert(!Files.exists(Paths.get(s"$wh/t_gz/metadata/v1.gz.metadata.json")))
    assert(cat.load("t_gz").lastUpdatedMs === 42L)
  }

  test("write.metadata.file-naming=spec writes %05d-{uuid} names and resolves through them") {
    import java.nio.file.{Files, Paths}
    val wh = Files.createTempDirectory("graft-specname").toString
    val cat = new FileCatalog(wh)
    val schema = IceSchema(0, Seq(NestedField(1, "id", IceLong, required = true)))
    graft.table.IceTable.create(cat, "t_spec", schema,
      properties = Map(FileCatalog.FileNamingKey -> "spec"))
    cat.commit("t_spec", 1, cat.load("t_spec").copy(lastUpdatedMs = 7L))
    assert(cat.currentVersion("t_spec") === 2)
    assert(cat.load("t_spec").lastUpdatedMs === 7L)
    // both versions exist under the reference naming flavor
    def specNames(v: Int) = {
      val s = Files.list(Paths.get(s"$wh/t_spec/metadata"))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.startsWith(f"$v%05d-") && n.endsWith(".metadata.json")).toList
      } finally s.close()
    }
    assert(specNames(1).size === 1 && specNames(2).size === 1)
    assert(specNames(2).head.matches(
      "00002-[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}\\.metadata\\.json"))
    // metadataLocation prefers the spec-style name (what metadata-log records)
    assert(cat.metadataLocation("t_spec", 2).contains("00002-"))
    // spec naming composes with gzip: the flavor carries the .gz extension
    cat.commit("t_spec", 2, cat.load("t_spec").copy(properties =
      cat.load("t_spec").properties + ("write.metadata.compression-codec" -> "gzip")))
    assert(specNames(3).head.endsWith(".gz.metadata.json"))
    val raw = Files.readAllBytes(Paths.get(s"$wh/t_spec/metadata/${specNames(3).head}"))
    assert(raw(0) == 0x1f.toByte && raw(1) == 0x8b.toByte, "spec .gz name must hold gzip bytes")
    assert(cat.load("t_spec").lastUpdatedMs === 7L, "gzip spec-name version must reload")
    // delete-after-commit removes the spec-style names too
    cat.deleteMetadataBefore("t_spec", 3)
    assert(specNames(1).isEmpty && specNames(2).isEmpty && specNames(3).size === 1)
  }

  test("spec naming keeps the CAS race safe: exactly one winner per version") {
    import java.nio.file.Files
    val wh = Files.createTempDirectory("graft-specrace").toString
    val cat = new FileCatalog(wh)
    val schema = IceSchema(0, Seq(NestedField(1, "id", IceLong, required = true)))
    graft.table.IceTable.create(cat, "t_race", schema,
      properties = Map(FileCatalog.FileNamingKey -> "spec"))
    val base = cat.load("t_race")
    import scala.collection.parallel.CollectionConverters._
    val results = (1 to 8).par.map { i =>
      try Right(cat.commit("t_race", 1, base.copy(lastUpdatedMs = i.toLong)))
      catch { case e: CommitConflictException => Left(e) }
    }.toList
    assert(results.count(_.isRight) === 1, "exactly one racer must win the CAS")
    assert(cat.currentVersion("t_race") === 2)
  }
}

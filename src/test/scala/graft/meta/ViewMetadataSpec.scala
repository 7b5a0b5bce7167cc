package graft.meta

import org.scalatest.funsuite.AnyFunSuite

/** Cross-implementation conformance for SPEC-format view metadata: parses
  * the reference's OWN golden file (`view/testdata/view-metadata.json`,
  * the fixture `view/metadata_test.go` asserts against) through our codec
  * — real interop evidence that needs no engine jar — plus a write→parse
  * round trip and the validation error paths.
  */
class ViewMetadataSpec extends AnyFunSuite {

  private val goldenPath = "/root/reference/view/testdata/view-metadata.json"

  private def golden: String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(goldenPath)), java.nio.charset.StandardCharsets.UTF_8)

  test("the reference's golden view metadata parses field-for-field") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(goldenPath)),
      s"reference golden file not present: $goldenPath")
    val m = ViewMetadataJson.parse(golden)
    assert(m.viewUuid == "fa6506c3-7681-40c8-86dc-e36561f83385")
    assert(m.formatVersion == 1)
    assert(m.location == "s3://bucket/warehouse/default.db/event_agg")
    assert(m.currentVersionId == 2)
    assert(m.properties == Map("comment" -> "Daily event counts"))
    assert(m.versions.map(_.versionId) == Seq(1, 2))
    val v2 = m.currentVersion
    assert(v2.timestampMs == 1573518981593L)
    assert(v2.schemaId == 1)
    assert(v2.defaultCatalog.contains("prod"))
    assert(v2.defaultNamespace == Seq("default"))
    assert(v2.summary == Map("engine-name" -> "Spark", "engine-version" -> "3.3.2"))
    assert(m.currentSql("spark").exists(_.contains("FROM prod.default.events")))
    // version 1's representation is the unqualified form
    assert(m.versions.head.representations.head.sql.contains("FROM events"))
    // the spec schema: event_count int (optional, documented), event_date date
    assert(m.schemas.map(_.schemaId) == Seq(1))
    val fields = m.schemas.head.fields
    assert(fields.map(_.name) == Seq("event_count", "event_date"))
    assert(fields.forall(!_.required))
    assert(fields.map(_.id) == Seq(1, 2))
    assert(m.versionLog == Seq((1573518431292L, 1), (1573518981593L, 2)))
  }

  test("write → parse round-trips the golden metadata exactly") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(goldenPath)))
    val m = ViewMetadataJson.parse(golden)
    val again = ViewMetadataJson.parse(ViewMetadataJson.write(m))
    assert(again == m)
  }

  test("validation: dangling current-version-id and missing schema-id fail loudly") {
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(goldenPath)))
    val badCurrent = golden.replace("\"current-version-id\" : 2",
      "\"current-version-id\" : 99")
    intercept[IllegalArgumentException](ViewMetadataJson.parse(badCurrent))
    val badSchema = golden.replace("\"schema-id\": 1", "\"schema-id\": 7")
    intercept[IllegalArgumentException](ViewMetadataJson.parse(badSchema))
  }
}

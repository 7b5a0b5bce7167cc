package graft.meta

import org.scalatest.funsuite.AnyFunSuite

/** Name-mapping JSON conformance: the reference's `TestNameMappingFromJson`
  * fixture (`name_mapping_test.go:84-108`) parsed verbatim — including the
  * id-less rule and multi-alias nested fields — plus a write→parse round
  * trip and the alias-index laws the scan relies on.
  */
class NameMappingSpec extends AnyFunSuite {

  private val referenceFixture = """[
    {"names": ["foo", "bar"]},
    {"field-id": 1, "names": ["id", "record_id"]},
    {"field-id": 2, "names": ["data"]},
    {"field-id": 3, "names": ["location"], "fields": [
      {"field-id": 4, "names": ["latitude", "lat"]},
      {"field-id": 5, "names": ["longitude", "long"]}
    ]}
  ]"""

  test("the reference's FromJson fixture parses structure-for-structure") {
    val m = NameMapping.parse(referenceFixture)
    assert(m == Seq(
      MappedField(None, Seq("foo", "bar")),
      MappedField(Some(1), Seq("id", "record_id")),
      MappedField(Some(2), Seq("data")),
      MappedField(Some(3), Seq("location"), Seq(
        MappedField(Some(4), Seq("latitude", "lat")),
        MappedField(Some(5), Seq("longitude", "long"))))))
    // write → parse round-trips the same structure
    assert(NameMapping.parse(NameMapping.toJson(m)) == m)
  }

  test("alias index: every alias of every rule resolves; id-less rules resolve nothing") {
    val idx = NameMapping.index(NameMapping.parse(referenceFixture))
    assert(idx.get("id").contains(1) && idx.get("record_id").contains(1))
    assert(idx.get("data").contains(2))
    assert(idx.get("location").contains(3))
    // nested fields resolve by dotted path under EVERY parent alias
    assert(idx.get("location.latitude").contains(4))
    assert(idx.get("location.lat").contains(4))
    assert(idx.get("location.longitude").contains(5))
    assert(idx.get("location.long").contains(5))
    // the id-less rule maps no path
    assert(!idx.contains("foo") && !idx.contains("bar"))
  }

  test("default mapping covers the full field tree: list element and map key/value rules") {
    import graft.core._
    // id long, tags list<string>, props map<string, struct<lat,lon>>
    val schema = IceSchema(0, Seq(
      NestedField(1, "id", IceLong, required = true),
      NestedField(2, "tags", IceListType(4, IceString, elementRequired = false),
        required = false),
      NestedField(3, "props", IceMapType(5, IceString, 6,
        IceStructType(Seq(
          NestedField(7, "lat", IceDouble, required = false),
          NestedField(8, "lon", IceDouble, required = false))),
        valueRequired = false), required = false)))
    val m = NameMapping.default(schema)
    // reference createMappingFromSchema shape (name_mapping.go:461-492)
    assert(m(1) === MappedField(Some(2), Seq("tags"),
      Seq(MappedField(Some(4), Seq("element")))))
    assert(m(2) === MappedField(Some(3), Seq("props"), Seq(
      MappedField(Some(5), Seq("key")),
      MappedField(Some(6), Seq("value"), Seq(
        MappedField(Some(7), Seq("lat")),
        MappedField(Some(8), Seq("lon")))))))
    // JSON round-trip preserves the nested rules
    assert(NameMapping.parse(NameMapping.toJson(m)) === m)
    // the index exposes both the Iceberg paths and the parquet-footer
    // flavors (3-level list/map dotted paths) for stats resolution
    val idx = NameMapping.index(m)
    assert(idx.get("tags.element").contains(4))
    assert(idx.get("tags.list.element").contains(4))
    assert(idx.get("props.key").contains(5))
    assert(idx.get("props.key_value.key").contains(5))
    assert(idx.get("props.value").contains(6))
    assert(idx.get("props.key_value.value").contains(6))
    assert(idx.get("props.value.lat").contains(7))
    assert(idx.get("props.key_value.value.lat").contains(7))
    // aliasById now walks all levels
    val alias = NameMapping.aliasById(m)
    assert(alias(4) === "element" && alias(7) === "lat")
  }

  test("explicit null field-id parses as unassigned, never as field 0") {
    // spec-legal foreign metadata: a rule with "field-id": null is an
    // unassigned mapping — NullNode.asInt() is 0, which would bind the
    // rule's paths to field ID 0
    val m = NameMapping.parse(
      """[{"field-id": null, "names": ["ghost"]},
         |{"field-id": 1, "names": ["id"]}]""".stripMargin)
    assert(m.head.fieldId.isEmpty)
    val idx = NameMapping.index(m)
    assert(!idx.contains("ghost"))
    assert(idx.get("id").contains(1))
  }

  test("nested list-of-struct-of-list registers full parquet flavors, no mixed ones") {
    import graft.core._
    // docs list<struct<words: list<string>>>
    val schema = IceSchema(0, Seq(
      NestedField(1, "docs", IceListType(2,
        IceStructType(Seq(
          NestedField(3, "words", IceListType(4, IceString,
            elementRequired = false), required = false))),
        elementRequired = false), required = false)))
    val idx = NameMapping.index(NameMapping.default(schema))
    // plain Iceberg paths
    assert(idx.get("docs.element").contains(2))
    assert(idx.get("docs.element.words").contains(3))
    assert(idx.get("docs.element.words.element").contains(4))
    // full parquet-footer flavor at EVERY list level
    assert(idx.get("docs.list.element").contains(2))
    assert(idx.get("docs.list.element.words").contains(3))
    assert(idx.get("docs.list.element.words.list.element").contains(4))
    // mixed flavors (plain then parquet) are not real footer paths
    assert(!idx.contains("docs.element.words.list.element"))
  }
}

package graft.cli

import org.scalatest.funsuite.AnyFunSuite

/** The CLI config file (reference `config/config.go` + `config_test.go`):
  * lookup-table semantics replayed verbatim, plus an end-to-end proof that
  * a config-resolved catalog carries a real table lifecycle and that the
  * `config.yaml#name` CLI form dispatches through the factory registry.
  */
class CliConfigSpec extends AnyFunSuite {

  private def tempYaml(content: String): java.nio.file.Path = {
    val f = java.nio.file.Files.createTempFile("graft-cli", ".yaml")
    f.toFile.deleteOnExit()
    java.nio.file.Files.write(f,
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f
  }

  test("lookup mirrors config_test.go: missing file, missing name, default and named hits") {
    // config file does not exist → None
    assert(CliConfig.lookup(
      java.nio.file.Paths.get("/nonexistent/.graft.yaml"), "default").isEmpty)
    val f = tempYaml("""
catalog:
  custom-catalog:
    type: rest
    uri: http://localhost:8181/
    output: text
    credential: client-id:client-secret
    warehouse: catalog_name
""")
    // config does not have the requested (default) catalog → None
    assert(CliConfig.lookup(f, "default").isEmpty)
    // named hit carries every property verbatim
    val cc = CliConfig.lookup(f, "custom-catalog").get
    assert(cc.catalogType.contains("rest"))
    assert(cc.uri.contains("http://localhost:8181/"))
    assert(cc.props("credential") == "client-id:client-secret")
    assert(cc.props("output") == "text")
    assert(cc.warehouse.contains("catalog_name"))
    // absent max-workers → the reference's default of 5
    assert(CliConfig.load(f).get.maxWorkers == CliConfig.DefaultMaxWorkers)
    val cfg2 = CliConfig.parse(
      "default-catalog: main\nmax-workers: 9\ncatalog:\n  main:\n    type: file\n    warehouse: /tmp/x\n")
    assert(cfg2.defaultCatalog.contains("main"))
    assert(cfg2.maxWorkers == 9)
    // empty document parses to an empty config, not a crash
    val empty = CliConfig.parse("")
    assert(empty.catalogs.isEmpty && empty.defaultCatalog.isEmpty)
  }

  test("a config-resolved catalog carries a table lifecycle; #name and errors dispatch") {
    val wh = java.nio.file.Files.createTempDirectory("graft-cli-wh")
    val f = tempYaml(
      s"default-catalog: local\ncatalog:\n  local:\n    type: file\n    warehouse: $wh\n")
    // default-catalog path
    val cat = Main.resolveCatalog(f.toString)
    val schema = graft.core.IceSchema(0, Seq(
      graft.core.NestedField(1, "id", graft.core.IceLong, required = true)))
    graft.table.IceTable.create(cat, "cfg_t", schema)
    assert(cat.listTables().contains("cfg_t"))
    // the #name suffix selects explicitly and sees the same warehouse
    val cat2 = Main.resolveCatalog(s"$f#local")
    assert(cat2.listTables().contains("cfg_t"))
    // unknown catalog name and unreadable config fail with diagnostics
    intercept[IllegalArgumentException](Main.resolveCatalog(s"$f#nope"))
    intercept[IllegalArgumentException](
      Main.resolveCatalog("/nonexistent/cfg.yaml"))
    // a non-yaml spec remains the historical warehouse-directory form
    val direct = Main.resolveCatalog(wh.toString)
    assert(direct.listTables().contains("cfg_t"))
  }
}

package graft.cli

import org.apache.spark.sql.SparkSession

import graft.core.SchemaConv
import graft.meta.{FileCatalog, TableMetadataJson}
import graft.table.IceTable

/** CLI verb surface (reference `cmd/iceberg/main.go:39-93`):
  *
  *   graft.cli.Main <warehouse> list
  *   graft.cli.Main <warehouse> describe|schema|spec|uuid|location|properties <table>
  *   graft.cli.Main <warehouse> files|snapshots <table>
  *   graft.cli.Main <warehouse> create <table> <parquetPath>
  *   graft.cli.Main <warehouse> drop <table>
  */
object Main {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) { println(usage); sys.exit(2) }
    // args(0) is either a warehouse directory (FileCatalog, the historical
    // form) or a config YAML — `cfg.yaml` (default-catalog entry) or
    // `cfg.yaml#name` — resolved through the same CatalogRegistry the API
    // uses (reference config.go + cmd/iceberg: the CLI's named catalogs)
    val catalog: graft.meta.Catalog = resolveCatalog(args(0))
    def table = IceTable.load(catalog, args(2))

    args(1) match {
      case "list" => catalog.listTables().foreach(println)
      case "describe" =>
        val m = table.metadata
        println(s"table:    ${args(2)}")
        println(s"uuid:     ${m.tableUuid}")
        println(s"location: ${m.location}")
        println(s"format:   v${m.formatVersion}")
        println(s"schema:   ${m.currentSchema.fields.map(f => s"${f.name}:${graft.core.IceType.toSpecString(f.tpe)}").mkString(", ")}")
        println(s"spec:     ${m.defaultSpec.fields.map(f => s"${f.name}=${f.transform.name}").mkString(", ")}")
        println(s"snapshot: ${m.currentSnapshotId.getOrElse("none")}")
      case "schema" =>
        println(TableMetadataJson.schemaToJson(table.schema).toPrettyString)
      case "spec" =>
        println(TableMetadataJson.specToJson(table.spec).toPrettyString)
      case "uuid" => println(table.metadata.tableUuid)
      case "location" => println(table.location)
      case "properties" =>
        table.metadata.properties.foreach { case (k, v) => println(s"$k=$v") }
      case "files" =>
        table.newScan().planFiles().foreach(t =>
          println(s"${t.file.filePath}\t${t.file.recordCount} rows\t${t.file.fileSizeInBytes} bytes\t${t.deletes.size} deletes"))
      case "snapshots" =>
        table.metadata.snapshots.foreach(s =>
          println(s"${s.snapshotId}\tseq=${s.sequenceNumber}\t${new java.sql.Timestamp(s.timestampMs)}\t${s.summary.getOrElse("operation", "")}"))
      case "create" =>
        val spark = SparkSession.builder().master("local[4]")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false").getOrCreate()
        try {
          val df = spark.read.parquet(args(3))
          val t = IceTable.create(catalog, args(2), SchemaConv.fromSpark(df.schema))
          t.append(df)
          println(s"created ${args(2)} with ${t.currentSnapshot.flatMap(_.summary.get("added-records")).getOrElse("0")} rows")
        } finally spark.stop()
      case "rename" =>
        catalog.renameTable(args(2), args(3))
        println(s"renamed ${args(2)} -> ${args(3)}")
      case "drop" =>
        catalog.dropTable(args(2))
        println(s"dropped ${args(2)}")
      case "register" =>
        // adopt an existing table by its current metadata-JSON location
        val m = catalog.registerTable(args(2), args(3))
        println(s"registered ${args(2)} at ${m.location} (uuid ${m.tableUuid})")
      case "refs" =>
        table.metadata.refs.toSeq.sortBy(_._1).foreach { case (name, r) =>
          val retention = Seq(
            r.minSnapshotsToKeep.map(v => s"min-snapshots-to-keep=$v"),
            r.maxSnapshotAgeMs.map(v => s"max-snapshot-age-ms=$v"),
            r.maxRefAgeMs.map(v => s"max-ref-age-ms=$v")).flatten.mkString(" ")
          println(s"$name\t${r.refType}\t${r.snapshotId}\t$retention".stripTrailing())
        }
      case "rewrite-manifests" =>
        val snap = table.rewriteManifests()
        println(s"rewrote manifests of ${args(2)} at snapshot ${snap.snapshotId}")
      case other =>
        println(s"unknown verb: $other\n$usage"); sys.exit(2)
    }
  }

  private[cli] def resolveCatalog(spec: String): graft.meta.Catalog =
    if (spec.matches(".*\\.ya?ml(#.+)?")) {
      val (path, name) = spec.split("#", 2) match {
        case Array(p, n) => (p, Some(n))
        case other => (other(0), None)
      }
      val cfg = CliConfig.load(java.nio.file.Paths.get(path)).getOrElse(
        throw new IllegalArgumentException(s"config file not readable: $path"))
      val catName = name.orElse(cfg.defaultCatalog).getOrElse(
        throw new IllegalArgumentException(
          s"$path: no default-catalog and no #name suffix given"))
      val cc = cfg.catalogs.getOrElse(catName,
        throw new IllegalArgumentException(
          s"$path: catalog '$catName' not configured " +
            s"(configured: ${cfg.catalogs.keys.toSeq.sorted.mkString(", ")})"))
      graft.meta.CatalogRegistry.load(catName, cc.props)
    } else new FileCatalog(spec)

  private val usage =
    """usage: graft.cli.Main <warehouse-dir | config.yaml[#catalog]> <verb> [args]
      |  list | describe <t> | schema <t> | spec <t> | uuid <t> | location <t>
      |  properties <t> | files <t> | snapshots <t> | refs <t> | create <t> <parquet>
      |  rename <t> <newName> | drop <t> | register <t> <metadataJsonPath>
      |  rewrite-manifests <t>""".stripMargin
}

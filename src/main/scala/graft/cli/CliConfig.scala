package graft.cli

/** CLI configuration file (reference `config/config.go:27-66`: the
  * `.iceberg-go.yaml` shape — `default-catalog`, a named `catalog:` map
  * with type/uri/output/credential/warehouse, `max-workers`), parsed with
  * the snakeyaml shipped on the Spark classpath.
  *
  * Lookup semantics mirror `config/config_test.go`: a missing file or a
  * name absent from the map resolves to None — never an error — and a
  * resolved entry's properties feed [[graft.meta.CatalogRegistry.load]]
  * verbatim (`type`/`uri`/`credential`/`warehouse`), so the config file is
  * just a named front door onto the same factory registry the API uses.
  */
final case class CliCatalogConfig(props: Map[String, String]) {
  def catalogType: Option[String] = props.get("type")
  def uri: Option[String] = props.get("uri")
  def warehouse: Option[String] = props.get("warehouse")
}

final case class CliConfig(defaultCatalog: Option[String],
    catalogs: Map[String, CliCatalogConfig], maxWorkers: Int)

object CliConfig {
  /** Reference `defaultMaxWorkers` (config.go:29). */
  val DefaultMaxWorkers = 5

  def parse(yamlText: String): CliConfig = {
    import scala.jdk.CollectionConverters._
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = Option(yaml.load[java.util.Map[String, Object]](yamlText))
      .map(_.asScala).getOrElse(scala.collection.mutable.Map.empty[String, Object])
    val catalogs = root.get("catalog") match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.collect { case (name: String, entry: java.util.Map[_, _]) =>
          name -> CliCatalogConfig(entry.asScala.collect {
            case (k: String, v) if v != null => k -> v.toString
          }.toMap)
        }.toMap
      case _ => Map.empty[String, CliCatalogConfig]
    }
    CliConfig(
      root.get("default-catalog").map(_.toString),
      catalogs,
      root.get("max-workers").map(_.toString.toInt).getOrElse(DefaultMaxWorkers))
  }

  /** None when the file is missing or unreadable (config.go returns nil). */
  def load(path: java.nio.file.Path): Option[CliConfig] =
    if (!java.nio.file.Files.isReadable(path)) None
    else Some(parse(new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)))

  /** The config_test.go lookup table: file absent → None; name absent from
    * the catalog map → None; else the entry.
    */
  def lookup(path: java.nio.file.Path, name: String): Option[CliCatalogConfig] =
    load(path).flatMap(_.catalogs.get(name))
}

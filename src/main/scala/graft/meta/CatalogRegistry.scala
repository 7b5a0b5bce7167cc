package graft.meta

import java.net.URI

import scala.collection.concurrent.TrieMap

/** Pluggable catalog factory registry (reference `catalog/registry.go:80-160`
  * `Register`/`Unregister`/`GetRegisteredCatalogs`/`Load`): resolve a catalog
  * implementation from a `type` property, or — when absent — from the `uri`
  * property's scheme, exactly like the reference's `Load`. Third-party
  * implementations register their own type under the same seam.
  *
  * Default registrations mirror the reference's `init()` blocks:
  * `rest`/`http`/`https` → [[RestCatalog]] (`rest.go:89-97`; `credential`
  * becomes the bearer token), `sql`/`jdbc` → [[SqlCatalog]] (`sql.go:70-96`),
  * plus this library's `file` ([[FileCatalog]]) and `memory`
  * ([[InMemoryCatalog]]) warehouses, and `glue` → [[GlueCatalog]] over the
  * in-process [[GlueStubService]] (the real AWS client would implement the
  * same [[GlueApi]] seam — the SDK itself is out of scope in this
  * zero-egress environment).
  */
object CatalogRegistry {

  /** (catalogName, properties) → catalog. Property keys follow the
    * reference: `uri`, `warehouse`, `credential`, `namespace`.
    */
  type Factory = (String, Map[String, String]) => Catalog

  private val registry = TrieMap[String, Factory]()

  def register(catalogType: String, factory: Factory): Unit =
    registry(catalogType.toLowerCase(java.util.Locale.ROOT)) = factory

  def unregister(catalogType: String): Unit =
    registry.remove(catalogType.toLowerCase(java.util.Locale.ROOT))

  def registeredCatalogs: Seq[String] = registry.keys.toSeq.sorted

  /** Resolve and construct: explicit `type` wins; else the `uri` scheme
    * (`scheme://...`), with `jdbc:...` URIs mapping to the sql catalog the
    * way `http(s)://` maps to REST.
    */
  def load(name: String, props: Map[String, String]): Catalog = {
    val catalogType = props.get("type")
      .orElse(props.get("uri").collect {
        case u if u.contains("://") => URI.create(u).getScheme
        case u if u.startsWith("jdbc:") => "sql"
      })
      .getOrElse(throw new IllegalArgumentException(
        s"catalog $name: no 'type' property and no scheme-bearing 'uri'"))
    val factory = registry.getOrElse(catalogType.toLowerCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(
        s"catalog $name: unregistered catalog type '$catalogType' " +
          s"(registered: ${registeredCatalogs.mkString(", ")})"))
    factory(name, props)
  }

  private def required(props: Map[String, String], key: String, tpe: String): String =
    props.getOrElse(key,
      throw new IllegalArgumentException(s"$tpe catalog requires a '$key' property"))

  // ---------------------------------------------------- default registrations
  private val restFactory: Factory = (_, p) =>
    new RestCatalog(required(p, "uri", "rest"),
      namespace = p.getOrElse("namespace", "graft"),
      token = p.get("credential"))
  register("rest", restFactory)
  register("http", restFactory)
  register("https", restFactory)

  private val sqlFactory: Factory = (name, p) =>
    new SqlCatalog(required(p, "uri", "sql").stripPrefix("sql://"),
      required(p, "warehouse", "sql"), catalogName = name)
  register("sql", sqlFactory)
  register("jdbc", sqlFactory)

  register("file", (_, p) =>
    new FileCatalog(MetadataFiles.stripScheme(
      p.getOrElse("warehouse", required(p, "uri", "file")))))

  register("memory", (_, p) =>
    new InMemoryCatalog(required(p, "warehouse", "memory")))

  // Glue-SHAPED catalog (the reference's `catalog/glue` surface behind its
  // own mocked-API seam): the registry default binds the in-process
  // conformance stub, which is as far as a no-cloud-SDK environment can go;
  // a deployment implements [[GlueApi]] with the real AWS client and
  // constructs [[GlueCatalog]] directly.
  register("glue", (_, p) =>
    new GlueCatalog(new GlueStubService, required(p, "warehouse", "glue"),
      database = p.getOrElse("namespace", "default")))
}

package graft.meta

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import graft.table.{AssertCreate, AssertCurrentSchemaID, AssertDefaultSortOrderID,
  AssertDefaultSpecID, AssertLastAssignedFieldID, AssertLastAssignedPartitionID,
  AssertRefSnapshotID, AssertTableUUID, TableRequirement}

/** REST catalog client (reference `catalog/rest/rest.go:1-1213`): the
  * Iceberg REST catalog protocol over JDK HttpClient — config fetch at
  * construction, table CRUD under `/v1/namespaces/{ns}/tables`, commits as
  * requirement-guarded POSTs that surface `409` as
  * [[CommitConflictException]] (the signal the table layer's retry loop
  * rebases on), identifier rename via `/v1/tables/rename`.
  *
  * Metadata files live on the FILESYSTEM (as with a real REST catalog,
  * where the catalog stores pointers and object storage stores metadata):
  * the server returns `metadata-location` and the client reads it through
  * Hadoop FS, so time travel over `metadata-log` works identically to
  * [[FileCatalog]].
  *
  * Two SPI-shaped deviations from the OpenAPI spec, both documented where
  * they bite: our [[Catalog]] SPI commits WHOLE metadata (the transaction
  * layer composes typed updates client-side and hands the result down), so
  * create/commit requests carry the full metadata JSON rather than a
  * granular update list; and the SPI's integer CAS rides along as
  * `expected-version`, which the server enforces exactly like
  * `assert-ref-snapshot-id` — stricter, never looser.
  */
/** @param token static bearer token — wins over `credential` when both are
  *   set (reference `createSession`, `rest.go:578-585`)
  * @param credential OAuth2 client-credentials pair `"clientId:clientSecret"`
  *   (or bare secret, reference `fetchAccessToken` `rest.go:514-566`): the
  *   client POSTs a `grant_type=client_credentials` form to
  *   `{authUri | baseUri/v1/oauth/tokens}`, injects the returned
  *   `access_token` as the Bearer header, proactively re-fetches before
  *   the advertised `expires_in` elapses, and on a 401 (server-side
  *   revocation) re-fetches once and retries the request
  * @param scope OAuth scope, the spec's default `catalog`
  */
final class RestCatalog(baseUri: String, namespace: String = "graft",
    token: Option[String] = None,
    credential: Option[String] = None,
    scope: String = "catalog",
    authUri: Option[String] = None) extends Catalog {
  private val mapper = new ObjectMapper()
  private val http = HttpClient.newHttpClient()

  /** OAuth2 client-credentials token state. `current()` is what request
    * assembly reads: static token verbatim, else a cached fetched token
    * refreshed proactively 30 s before expiry.
    */
  private object auth {
    @volatile private var bearer: Option[String] = token
    @volatile private var expiresAtMs: Long = Long.MaxValue
    private val RefreshMarginMs = 30000L

    def current(): Option[String] = {
      if (token.isEmpty && credential.nonEmpty &&
          (bearer.isEmpty || System.currentTimeMillis() >= expiresAtMs))
        refresh()
      bearer
    }

    /** Drop the cached token (after a 401) so the next `current()` fetches. */
    def invalidate(): Unit =
      if (token.isEmpty && credential.nonEmpty) { bearer = None }

    private def refresh(): Unit = synchronized {
      if (bearer.nonEmpty && System.currentTimeMillis() < expiresAtMs) return
      val (cid, csec) = credential.get.split(":", 2) match {
        case Array(id, sec) => (id, sec)
        case Array(sec) => ("", sec) // bare secret (reference strings.Cut fallback)
      }
      def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8")
      val form = Seq("grant_type" -> "client_credentials", "client_id" -> cid,
          "client_secret" -> csec, "scope" -> scope)
        .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
      val req = HttpRequest.newBuilder(
          URI.create(authUri.getOrElse(s"$baseUri/v1/oauth/tokens")))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(form, StandardCharsets.UTF_8))
        .build()
      val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200) {
        // RFC 6749 §5.2 / reference oauthErrorResponse
        val node = try mapper.readTree(resp.body()) catch {
          case _: Exception => mapper.createObjectNode()
        }
        throw new java.io.IOException(s"oauth error: HTTP ${resp.statusCode()}: " +
          s"${node.path("error").asText("?")}: ${node.path("error_description").asText("")}")
      }
      val node = mapper.readTree(resp.body())
      bearer = Some(node.path("access_token").asText())
      expiresAtMs =
        if (node.has("expires_in"))
          System.currentTimeMillis() +
            math.max(0L, node.path("expires_in").asLong() * 1000L - RefreshMarginMs)
        else Long.MaxValue
    }
  }

  /** Server-advertised config: `defaults` under, `overrides` over ours
    * (reference `rest.go` config fetch at catalog construction).
    */
  val config: Map[String, String] = {
    val node = parse(send(get(s"$baseUri/v1/config"), expect = 200))
    def kv(field: String): Map[String, String] = {
      val n = node.path(field)
      if (n.isMissingNode || n.isNull) Map.empty
      else {
        val b = Map.newBuilder[String, String]
        n.properties().forEach(e => b += e.getKey -> e.getValue.asText())
        b.result()
      }
    }
    kv("defaults") ++ kv("overrides")
  }
  private val warehouse: String = config.getOrElse("warehouse",
    throw new IllegalStateException("REST catalog config advertises no warehouse"))

  /** RFC 3986 path-segment encoding: URLEncoder is FORM encoding ('+'
    * for space), which spec-compliant servers decode as a literal plus —
    * and raw names with spaces/reserved characters make URI.create throw.
    */
  private def seg(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  private def tablesUri = s"$baseUri/v1/namespaces/${seg(namespace)}/tables"
  private def tableUri(name: String) = s"$tablesUri/${seg(name)}"

  def tableLocation(name: String): String =
    if (tableExists(name)) load(name).location else s"$warehouse/$name"

  def tableExists(name: String): Boolean =
    send(request(tableUri(name)).method("HEAD",
      HttpRequest.BodyPublishers.noBody()), expectAny = true)._1 == 204

  /** Follow a paginated list route until the server stops returning
    * `next-page-token` (spec pagination; reference `catalog/rest/rest.go`
    * ListTables/ListNamespaces). The token is opaque — it goes back verbatim
    * as `pageToken`. A server that never paginates returns no token and the
    * loop runs once; a server may also paginate UNPROMPTED, so the client
    * must follow tokens even when it never sent a pageSize.
    */
  private def pagedList(uri: String, arrayField: String)
      (item: JsonNode => String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val seen = scala.collection.mutable.Set.empty[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val u = token.fold(uri)(t =>
        s"$uri${if (uri.contains('?')) "&" else "?"}pageToken=${seg(t)}")
      val node = parse(send(get(u), expect = 200))
      node.path(arrayField).forEach(n => out += item(n))
      val next = node.path("next-page-token")
      token = if (next.isTextual && next.asText().nonEmpty) Some(next.asText()) else None
      // a server that re-issues a token it already served would loop this
      // client forever — and silently truncating instead would hand callers
      // an incomplete listing that can feed existence checks or cleanup
      // decisions. A broken server is a loud failure, not a short list.
      token.foreach { t =>
        if (!seen.add(t))
          throw new IllegalStateException(
            s"REST list at $uri re-issued page token '$t' — " +
              "refusing to return a truncated listing")
      }
      more = token.isDefined
    }
    out.result()
  }

  def listTables(): Seq[String] =
    pagedList(tablesUri, "identifiers")(_.path("name").asText()).sorted

  def create(name: String, metadata: TableMetadata): TableMetadata = {
    val body = mapper.createObjectNode()
    body.put("name", name)
    body.put("location", metadata.location)
    body.put("stage-create", false)
    body.set[JsonNode]("metadata", parse(TableMetadataJson.write(metadata)))
    val (status, resp) = send(post(tablesUri, body.toString), expectAny = true)
    if (status == 409)
      throw new IllegalStateException(s"table $name already exists")
    if (status != 200) throw fail("create", name, status, resp)
    TableMetadataJson.read(parse(resp).path("metadata").toString)
  }

  def load(name: String): TableMetadata = {
    val m = TableMetadataJson.read(parse(loadResult(name)).path("metadata").toString)
    knownUuid.put(name, m.tableUuid)
    m
  }

  def currentVersion(name: String): Int =
    parse(loadResult(name)).path("version").asInt()

  def loadVersioned(name: String): (Int, TableMetadata) = {
    // ONE LoadTable response feeds both values — see the trait contract
    val node = parse(loadResult(name))
    val m = TableMetadataJson.read(node.path("metadata").toString)
    knownUuid.put(name, m.tableUuid)
    (node.path("version").asInt(), m)
  }

  private def loadResult(name: String): String = {
    val (status, resp) = send(get(tableUri(name)), expectAny = true)
    if (status == 404)
      throw new java.io.FileNotFoundException(s"no such table: $name")
    if (status != 200) throw fail("load", name, status, resp)
    resp
  }

  /** CAS commit with requirements: [[AssertTableUUID]] always rides along
    * (reference commits always carry it); 409 maps to the conflict type the
    * table layer's refresh-and-retry loop expects.
    */
  /** uuid the server is known to hold, memoized per table from every
    * load/commit through this catalog — the assert must name the CURRENT
    * uuid, not the new metadata's, or a commit applying AssignUUID can
    * never succeed (the server validates against ITS state).
    */
  private val knownUuid =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def commit(name: String, expectedVersion: Int, metadata: TableMetadata): Int = {
    val current = Option(knownUuid.get(name)).getOrElse(metadata.tableUuid)
    val v = commitWith(name, expectedVersion, metadata,
      Seq(AssertTableUUID(current)))
    knownUuid.put(name, metadata.tableUuid)
    v
  }

  /** Commit with explicit requirements, serialized per the REST spec's
    * requirement JSON (`assert-create`, `assert-table-uuid`,
    * `assert-ref-snapshot-id`); the server validates them against ITS
    * current metadata before applying (reference
    * `rest.go` commit → 409 CommitFailedException on violation).
    */
  def commitWith(name: String, expectedVersion: Int, metadata: TableMetadata,
      requirements: Seq[TableRequirement]): Int = {
    val body = mapper.createObjectNode()
    val ident = mapper.createObjectNode()
    ident.set[JsonNode]("namespace", mapper.createArrayNode().add(namespace))
    ident.put("name", name)
    body.set[JsonNode]("identifier", ident)
    val reqs = mapper.createArrayNode()
    requirements.foreach(r => reqs.add(requirementJson(r)))
    body.set[JsonNode]("requirements", reqs)
    body.put("expected-version", expectedVersion)
    body.set[JsonNode]("metadata", parse(TableMetadataJson.write(metadata)))
    val (status, resp) = send(post(tableUri(name), body.toString), expectAny = true)
    if (status == 404)
      throw new java.io.FileNotFoundException(s"no such table: $name")
    if (status == 409)
      throw new CommitConflictException(errorMessage(resp))
    if (status != 200) throw fail("commit", name, status, resp)
    parse(resp).path("version").asInt()
  }

  private def requirementJson(r: TableRequirement): JsonNode = {
    val o = mapper.createObjectNode()
    r match {
      case AssertCreate =>
        o.put("type", "assert-create")
      case AssertTableUUID(uuid) =>
        o.put("type", "assert-table-uuid"); o.put("uuid", uuid)
      case AssertRefSnapshotID(ref, snap) =>
        o.put("type", "assert-ref-snapshot-id"); o.put("ref", ref)
        snap.fold[Unit] { o.putNull("snapshot-id"); () } { s => o.put("snapshot-id", s); () }
      case AssertCurrentSchemaID(id) =>
        o.put("type", "assert-current-schema-id"); o.put("current-schema-id", id)
      case AssertDefaultSpecID(id) =>
        o.put("type", "assert-default-spec-id"); o.put("default-spec-id", id)
      case AssertDefaultSortOrderID(id) =>
        o.put("type", "assert-default-sort-order-id")
        o.put("default-sort-order-id", id)
      case AssertLastAssignedFieldID(id) =>
        o.put("type", "assert-last-assigned-field-id")
        o.put("last-assigned-field-id", id)
      case AssertLastAssignedPartitionID(id) =>
        o.put("type", "assert-last-assigned-partition-id")
        o.put("last-assigned-partition-id", id)
    }
    o
  }

  /** Staged create materialization: a commit against a not-yet-existing
    * table carrying `assert-create` — the server registers version 1 iff
    * the identifier is still free, else 409 → [[CommitConflictException]].
    */
  override def commitCreate(name: String, metadata: TableMetadata): Unit = {
    commitWith(name, 0, metadata, Seq(AssertCreate))
    ()
  }

  // ----------------------------------------------------------------- views
  // The spec's view routes (reference README catalog matrix: Create/Load/
  // List/Drop/Check View Exists for REST); payload is the same versioned
  // SQL-representation JSON [[ViewCatalog]] persists.

  /** Create-or-replace: a replace appends the next view version server-side. */
  def createOrReplaceView(name: String, sql: String): ViewVersion = {
    val body = mapper.createObjectNode()
    body.put("name", name)
    body.put("sql", sql)
    body.put("dialect", "spark")
    val (status, resp) = send(
      post(s"$baseUri/v1/namespaces/${seg(namespace)}/views", body.toString), expectAny = true)
    if (status != 200) throw fail("createView", name, status, resp)
    val v = parse(resp).path("current")
    ViewVersion(v.path("version-id").asInt(), v.path("timestamp-ms").asLong(),
      v.path("sql").asText(), v.path("dialect").asText())
  }

  def listViews(): Seq[String] =
    pagedList(s"$baseUri/v1/namespaces/${seg(namespace)}/views", "views")(
      _.path("name").asText()).sorted

  def viewExists(name: String): Boolean =
    send(request(s"$baseUri/v1/namespaces/${seg(namespace)}/views/${seg(name)}")
      .method("HEAD", HttpRequest.BodyPublishers.noBody()), expectAny = true)._1 == 204

  /** All versions, oldest first; the current version is the last. */
  def loadView(name: String): Seq[ViewVersion] = {
    val (status, resp) = send(
      get(s"$baseUri/v1/namespaces/${seg(namespace)}/views/${seg(name)}"), expectAny = true)
    if (status == 404)
      throw new java.util.NoSuchElementException(s"no such view: $name")
    if (status != 200) throw fail("loadView", name, status, resp)
    val out = Seq.newBuilder[ViewVersion]
    parse(resp).path("versions").forEach(v =>
      out += ViewVersion(v.path("version-id").asInt(), v.path("timestamp-ms").asLong(),
        v.path("sql").asText(), v.path("dialect").asText()))
    out.result()
  }

  def dropView(name: String): Unit = {
    val (status, resp) = send(
      request(s"$baseUri/v1/namespaces/${seg(namespace)}/views/${seg(name)}").DELETE(), expectAny = true)
    if (status == 404)
      throw new java.util.NoSuchElementException(s"no such view: $name")
    if (status != 204 && status != 200) throw fail("dropView", name, status, resp)
  }

  // ------------------------------------------------------------ namespaces
  // The spec's namespace CRUD (reference `rest.go` CreateNamespace/
  // ListNamespaces/LoadNamespaceProperties/UpdateNamespaceProperties/
  // DropNamespace/CheckNamespaceExists).

  def listNamespaces(): Seq[String] =
    pagedList(s"$baseUri/v1/namespaces", "namespaces") { ns =>
      val segs = Seq.newBuilder[String]
      ns.forEach(s => segs += s.asText())
      segs.result().mkString(".")
    }.sorted

  def createNamespace(ns: String, props: Map[String, String] = Map.empty): Unit = {
    val body = mapper.createObjectNode()
    val arr = mapper.createArrayNode()
    ns.split('.').foreach(arr.add)
    body.set[JsonNode]("namespace", arr)
    val p = mapper.createObjectNode()
    props.foreach { case (k, v) => p.put(k, v) }
    body.set[JsonNode]("properties", p)
    val (status, resp) = send(post(s"$baseUri/v1/namespaces", body.toString),
      expectAny = true)
    if (status == 409)
      throw new IllegalStateException(s"namespace $ns already exists")
    if (status != 200) throw fail("createNamespace", ns, status, resp)
  }

  def namespaceExists(ns: String): Boolean = {
    val (status, _) = send(request(s"$baseUri/v1/namespaces/${seg(ns)}")
      .method("HEAD", HttpRequest.BodyPublishers.noBody()), expectAny = true)
    status == 204 || status == 200
  }

  def namespaceProperties(ns: String): Map[String, String] = {
    val (status, resp) = send(get(s"$baseUri/v1/namespaces/${seg(ns)}"), expectAny = true)
    if (status == 404)
      throw new java.util.NoSuchElementException(s"no such namespace: $ns")
    if (status != 200) throw fail("namespaceProperties", ns, status, resp)
    val props = parse(resp).path("properties")
    val out = Map.newBuilder[String, String]
    props.fields().forEachRemaining(e => out += e.getKey -> e.getValue.asText())
    out.result()
  }

  /** Returns (updated, removed, missing) — the reference's
    * `PropertiesUpdateSummary`.
    */
  def updateNamespaceProperties(ns: String, removals: Seq[String],
      updates: Map[String, String]): (Seq[String], Seq[String], Seq[String]) = {
    val body = mapper.createObjectNode()
    val rem = mapper.createArrayNode()
    removals.foreach(rem.add)
    body.set[JsonNode]("removals", rem)
    val upd = mapper.createObjectNode()
    updates.foreach { case (k, v) => upd.put(k, v) }
    body.set[JsonNode]("updates", upd)
    val (status, resp) = send(
      post(s"$baseUri/v1/namespaces/${seg(ns)}/properties", body.toString), expectAny = true)
    if (status == 404)
      throw new java.util.NoSuchElementException(s"no such namespace: $ns")
    if (status != 200) throw fail("updateNamespaceProperties", ns, status, resp)
    def arr(field: String): Seq[String] = {
      val b = Seq.newBuilder[String]
      parse(resp).path(field).forEach(v => b += v.asText())
      b.result()
    }
    (arr("updated"), arr("removed"), arr("missing"))
  }

  def dropNamespace(ns: String): Unit = {
    val (status, resp) = send(request(s"$baseUri/v1/namespaces/${seg(ns)}").DELETE(),
      expectAny = true)
    if (status == 404)
      throw new java.util.NoSuchElementException(s"no such namespace: $ns")
    if (status == 409)
      throw new IllegalStateException(s"namespace $ns is not empty")
    if (status != 204 && status != 200)
      throw fail("dropNamespace", ns, status, resp)
  }

  /** Register via the spec's dedicated route (`POST /v1/namespaces/{ns}/
    * register`, reference `rest.go:811`): the server reads the metadata at
    * the given location and adopts it as the table's current version —
    * nothing is rewritten, so historic version files keep their numbering.
    */
  override def registerTable(name: String, metadataLocation: String): TableMetadata = {
    val body = mapper.createObjectNode()
    body.put("name", name)
    body.put("metadata-location", metadataLocation)
    val (status, resp) = send(
      post(s"$baseUri/v1/namespaces/$namespace/register", body.toString),
      expectAny = true)
    if (status == 409)
      throw new IllegalStateException(s"table $name already exists")
    if (status == 404)
      throw new java.io.FileNotFoundException(errorMessage(resp))
    if (status != 200) throw fail("register", name, status, resp)
    TableMetadataJson.read(parse(resp).path("metadata").toString)
  }

  def dropTable(name: String): Unit = {
    val (status, resp) =
      send(request(s"${tableUri(name)}?purgeRequested=true").DELETE(), expectAny = true)
    if (status != 204 && status != 404) throw fail("drop", name, status, resp)
  }

  def renameTable(from: String, to: String): Unit = {
    val body = mapper.createObjectNode()
    def ident(n: String) = {
      val o = mapper.createObjectNode()
      o.set[JsonNode]("namespace", mapper.createArrayNode().add(namespace))
      o.put("name", n)
      o
    }
    body.set[JsonNode]("source", ident(from))
    body.set[JsonNode]("destination", ident(to))
    val (status, resp) =
      send(post(s"$baseUri/v1/tables/rename", body.toString), expectAny = true)
    if (status == 404) throw new IllegalArgumentException(s"no such table: $from")
    if (status == 409) throw new CommitConflictException(errorMessage(resp))
    if (status != 204 && status != 200) throw fail("rename", from, status, resp)
  }

  def readMetadataFile(path: String): String = MetadataFiles.read(path)

  def deleteMetadataBefore(name: String, beforeVersion: Int): Unit = {
    val dir = s"${load(name).location}/metadata"
    (1 until beforeVersion).foreach { v =>
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(MetadataFiles.stripScheme(s"$dir/v$v.metadata.json")))
    }
  }

  // ------------------------------------------------------------- plumbing
  private def request(uri: String): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(URI.create(uri))
      .header("Content-Type", "application/json")
    auth.current().fold(b)(t => b.header("Authorization", s"Bearer $t"))
  }
  private def get(uri: String): HttpRequest.Builder = request(uri).GET()
  private def post(uri: String, body: String): HttpRequest.Builder =
    request(uri).POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))

  private def send(b: HttpRequest.Builder, expect: Int): String = {
    val (status, body) = send(b, expectAny = true)
    if (status != expect)
      throw new java.io.IOException(
        s"REST catalog: HTTP $status: ${errorMessage(body)}")
    body
  }
  private def send(b: HttpRequest.Builder, expectAny: Boolean): (Int, String) = {
    val resp = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    // a 401 under client-credentials auth means the server no longer
    // honors the cached token (revocation/restart): fetch a fresh one and
    // retry ONCE — `setHeader` replaces the stale Authorization value
    if (resp.statusCode() == 401 && token.isEmpty && credential.nonEmpty) {
      auth.invalidate()
      auth.current().foreach(t => b.setHeader("Authorization", s"Bearer $t"))
      val retry = http.send(b.build(), HttpResponse.BodyHandlers.ofString())
      (retry.statusCode(), retry.body())
    } else (resp.statusCode(), resp.body())
  }

  private def parse(s: String): JsonNode = mapper.readTree(s)
  /** Spec `ErrorModel` rendering: message first, then the type and code a
    * conformant server pairs with it — the type is what an operator greps
    * for (NoSuchTableException vs CommitFailedException decides retry
    * semantics), so swallowing it loses the signal.
    */
  private def errorMessage(body: String): String =
    try {
      val e = parse(body).path("error")
      if (!e.has("message")) body
      else {
        val tpe = e.path("type").asText("")
        val code = e.path("code").asInt(0)
        val suffix = (if (tpe.nonEmpty) Seq(tpe) else Nil) ++
          (if (code != 0) Seq(s"code $code") else Nil)
        e.path("message").asText(body) +
          (if (suffix.nonEmpty) suffix.mkString(" [", ", ", "]") else "")
      }
    } catch { case _: Exception => body }
  private def fail(op: String, name: String, status: Int, body: String) =
    new java.io.IOException(s"REST catalog $op($name): HTTP $status: ${errorMessage(body)}")
}

/** Filesystem metadata-JSON reads shared by catalogs whose metadata files
  * live on a real FS (plain or gzip, reference `table/table.go:391-452`).
  */
object MetadataFiles {
  def read(path: String): String = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(stripScheme(path))
    val real =
      if (Files.exists(p)) p
      else {
        val gz = Paths.get(stripScheme(path) + ".gz")
        if (Files.exists(gz)) gz
        else throw new java.io.FileNotFoundException(path)
      }
    val raw = Files.readAllBytes(real)
    if (real.toString.endsWith(".gz") ||
        (raw.length > 2 && raw(0) == 0x1f.toByte && raw(1) == 0x8b.toByte)) {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(raw))
      new String(in.readAllBytes(), StandardCharsets.UTF_8)
    } else new String(raw, StandardCharsets.UTF_8)
  }

  /** Local-path view of a metadata URI: strip ANY scheme, not just `file:`
    * — a foreign scheme left in place resolves as a relative directory named
    * `scheme:` under the working directory.
    */
  def stripScheme(p: String): String = {
    val m = "^[A-Za-z][A-Za-z0-9+.-]*:(//)?".r.findFirstIn(p)
    m.map(p.stripPrefix).getOrElse(p)
  }
}

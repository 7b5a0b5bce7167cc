package graft.meta

import java.net.{InetAddress, InetSocketAddress}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.collection.mutable

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.table.{AssertCreate, AssertRefSnapshotID, AssertTableUUID,
  TableRequirement}

/** In-process Iceberg-REST catalog stub serving [[RestCatalog]] — used by
  * CatalogSpec and by the `ice_rest_catalog_scan` correctness fixture: the
  * routes the reference client exercises (`catalog/rest/rest_test.go`) —
  * config, list, create (incl. stage-create), load, HEAD, commit with
  * requirement validation (409 on violation), drop, rename. The catalog
  * state (pointer + version per table) lives on the heap; metadata JSON
  * files are written to the warehouse directory like a real REST catalog
  * persisting to object storage, so FS reads (time travel, gzip) work
  * against it unchanged. Zero egress: binds the loopback interface on an
  * ephemeral port.
  */
final class RestStubServer(val warehouse: String,
    requiredToken: Option[String] = None,
    oauthCredential: Option[(String, String)] = None,
    tokenTtlMs: Long = 3600000L,
    listPageSize: Option[Int] = None,
    repeatPageToken: Boolean = false) {

  private final case class Entry(var versions: Vector[TableMetadata],
      location: String, var metadataLocs: Vector[String])
  private val tables = mutable.Map[String, Entry]()
  // dot-joined namespace → properties; the default namespace every table
  // route uses exists from the start
  private val namespaces =
    mutable.Map[String, mutable.Map[String, String]]("graft" -> mutable.Map())
  private val views = mutable.Map[String, Vector[ViewVersion]]()
  private val mapper = new ObjectMapper()

  private val server =
    HttpServer.create(new InetSocketAddress(InetAddress.getLoopbackAddress, 0), 0)
  server.createContext("/v1/", (ex: HttpExchange) => handle(ex))
  server.start()

  def uri: String =
    s"http://${server.getAddress.getHostString}:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)

  /** Commits that reached requirement validation — test hook. */
  val commitAttempts = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Tokens issued through `/v1/oauth/tokens` — test hook. */
  val tokenIssues = new java.util.concurrent.atomic.AtomicLong(0L)

  // issued bearer token → wall-clock expiry
  private val issuedTokens = mutable.Map[String, Long]()

  /** Invalidate every outstanding OAuth token (simulates server-side
    * revocation/restart — the client must re-fetch and retry).
    */
  def revokeTokens(): Unit = synchronized { issuedTokens.clear() }

  private def oauthToken(ex: HttpExchange): Unit = {
    val form = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      .split("&").toSeq.filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        java.net.URLDecoder.decode(k, "UTF-8") -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap
    val ok = oauthCredential.exists { case (id, secret) =>
      form.get("grant_type").contains("client_credentials") &&
        form.get("client_id").contains(id) && form.get("client_secret").contains(secret)
    }
    if (!ok) {
      // RFC 6749 §5.2 error shape (reference rest.go oauthErrorResponse)
      val o = mapper.createObjectNode()
      o.put("error", "invalid_client")
      o.put("error_description", "bad client credentials or grant type")
      respond(ex, 400, o.toString)
      return
    }
    val tok = java.util.UUID.randomUUID().toString
    synchronized { issuedTokens(tok) = System.currentTimeMillis() + tokenTtlMs }
    tokenIssues.incrementAndGet()
    val o = mapper.createObjectNode()
    o.put("access_token", tok)
    o.put("token_type", "bearer")
    o.put("expires_in", tokenTtlMs / 1000L)
    respond(ex, 200, o.toString)
  }

  private def authorized(ex: HttpExchange): Boolean = {
    if (requiredToken.exists(t =>
        ex.getRequestHeaders.getFirst("Authorization") != s"Bearer $t")) return false
    oauthCredential.isEmpty || {
      Option(ex.getRequestHeaders.getFirst("Authorization"))
        .filter(_.startsWith("Bearer "))
        .map(_.stripPrefix("Bearer "))
        .exists(t => synchronized {
          issuedTokens.get(t).exists(_ > System.currentTimeMillis())
        })
    }
  }

  private def handle(ex: HttpExchange): Unit = {
    try {
      val path = ex.getRequestURI.getPath
      val method = ex.getRequestMethod
      val segs = path.stripPrefix("/v1/").split("/").toSeq
      // the token endpoint is the only unauthenticated route
      if ((method, segs) == (("POST", Seq("oauth", "tokens")))) {
        oauthToken(ex)
        return
      }
      if (!authorized(ex)) {
        respond(ex, 401, error("NotAuthorizedException", "missing or bad token"))
        return
      }
      (method, segs) match {
        case ("GET", Seq("config")) =>
          val o = mapper.createObjectNode()
          val defaults = mapper.createObjectNode()
          defaults.put("warehouse", warehouse)
          o.set[JsonNode]("defaults", defaults)
          o.set[JsonNode]("overrides", mapper.createObjectNode())
          respond(ex, 200, o.toString)
        case ("GET", Seq("namespaces", _, "tables")) => synchronized {
          val o = mapper.createObjectNode()
          val arr = mapper.createArrayNode()
          val (names, next) = page(ex, tables.keys.toSeq.sorted)
          names.foreach { n =>
            val id = mapper.createObjectNode()
            id.set[JsonNode]("namespace", mapper.createArrayNode().add("graft"))
            id.put("name", n)
            arr.add(id)
          }
          o.set[JsonNode]("identifiers", arr)
          next.foreach(t => o.put("next-page-token", t))
          respond(ex, 200, o.toString)
        }
        case ("POST", Seq("namespaces", _, "tables")) => create(ex)
        case ("POST", Seq("namespaces", _, "register")) => register(ex)
        case ("POST", Seq("namespaces", _, "views")) => synchronized {
          val body = mapper.readTree(new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8))
          val name = body.path("name").asText()
          val prior = views.getOrElse(name, Vector.empty)
          val next = ViewVersion(prior.map(_.versionId).maxOption.getOrElse(0) + 1,
            System.currentTimeMillis(), body.path("sql").asText(),
            body.path("dialect").asText("spark"))
          views(name) = prior :+ next
          val o = mapper.createObjectNode()
          o.set[JsonNode]("current", viewJson(next))
          respond(ex, 200, o.toString)
        }
        case ("GET", Seq("namespaces", _, "views")) => synchronized {
          val o = mapper.createObjectNode()
          val arr = mapper.createArrayNode()
          val (names, next) = page(ex, views.keys.toSeq.sorted)
          names.foreach { n =>
            val v = mapper.createObjectNode(); v.put("name", n); arr.add(v)
          }
          o.set[JsonNode]("views", arr)
          next.foreach(t => o.put("next-page-token", t))
          respond(ex, 200, o.toString)
        }
        case ("HEAD", Seq("namespaces", _, "views", name)) => synchronized {
          respond(ex, if (views.contains(dec(name))) 204 else 404, "")
        }
        case ("GET", Seq("namespaces", _, "views", name)) => synchronized {
          views.get(dec(name)) match {
            case None => respond(ex, 404,
              error("NoSuchViewException", s"no such view: $name"))
            case Some(vs) =>
              val o = mapper.createObjectNode()
              o.put("view-name", dec(name))
              o.put("current-version-id", vs.last.versionId)
              val arr = mapper.createArrayNode()
              vs.foreach(v => arr.add(viewJson(v)))
              o.set[JsonNode]("versions", arr)
              respond(ex, 200, o.toString)
          }
        }
        case ("DELETE", Seq("namespaces", _, "views", name)) => synchronized {
          if (views.remove(dec(name)).isDefined) respond(ex, 204, "")
          else respond(ex, 404, error("NoSuchViewException", s"no such view: $name"))
        }
        case ("GET", Seq("namespaces")) => synchronized {
          val o = mapper.createObjectNode()
          val arr = mapper.createArrayNode()
          val (names, next) = page(ex, namespaces.keys.toSeq.sorted)
          names.foreach { ns =>
            val a = mapper.createArrayNode()
            ns.split('.').foreach(a.add)
            arr.add(a)
          }
          o.set[JsonNode]("namespaces", arr)
          next.foreach(t => o.put("next-page-token", t))
          respond(ex, 200, o.toString)
        }
        case ("POST", Seq("namespaces")) => synchronized {
          val body = mapper.readTree(new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8))
          val segs = Seq.newBuilder[String]
          body.path("namespace").forEach(s => segs += s.asText())
          val ns = segs.result().mkString(".")
          if (namespaces.contains(ns))
            respond(ex, 409,
              error("AlreadyExistsException", s"namespace $ns already exists"))
          else {
            val props = mutable.Map[String, String]()
            body.path("properties").fields().forEachRemaining(e =>
              props(e.getKey) = e.getValue.asText())
            namespaces(ns) = props
            respond(ex, 200, "{}")
          }
        }
        case ("HEAD", Seq("namespaces", ns)) => synchronized {
          respond(ex, if (namespaces.contains(dec(ns))) 204 else 404, "")
        }
        case ("GET", Seq("namespaces", ns)) => synchronized {
          namespaces.get(dec(ns)) match {
            case None => respond(ex, 404,
              error("NoSuchNamespaceException", s"no such namespace: $ns"))
            case Some(props) =>
              val o = mapper.createObjectNode()
              val a = mapper.createArrayNode()
              dec(ns).split('.').foreach(a.add)
              o.set[JsonNode]("namespace", a)
              val p = mapper.createObjectNode()
              props.foreach { case (k, v) => p.put(k, v) }
              o.set[JsonNode]("properties", p)
              respond(ex, 200, o.toString)
          }
        }
        case ("DELETE", Seq("namespaces", ns)) => synchronized {
          val name = dec(ns)
          if (!namespaces.contains(name))
            respond(ex, 404,
              error("NoSuchNamespaceException", s"no such namespace: $name"))
          else if (name == "graft" && tables.nonEmpty)
            respond(ex, 409,
              error("NamespaceNotEmptyException", s"namespace $name is not empty"))
          else { namespaces.remove(name); respond(ex, 204, "") }
        }
        case ("POST", Seq("namespaces", ns, "properties")) => synchronized {
          namespaces.get(dec(ns)) match {
            case None => respond(ex, 404,
              error("NoSuchNamespaceException", s"no such namespace: $ns"))
            case Some(props) =>
              val body = mapper.readTree(new String(
                ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
              val removed = Seq.newBuilder[String]
              val missing = Seq.newBuilder[String]
              body.path("removals").forEach { r =>
                val k = r.asText()
                if (props.remove(k).isDefined) removed += k else missing += k
              }
              val updated = Seq.newBuilder[String]
              body.path("updates").fields().forEachRemaining { e =>
                props(e.getKey) = e.getValue.asText(); updated += e.getKey
              }
              val o = mapper.createObjectNode()
              def arr(vals: Seq[String]): JsonNode = {
                val a = mapper.createArrayNode(); vals.foreach(a.add); a
              }
              o.set[JsonNode]("updated", arr(updated.result()))
              o.set[JsonNode]("removed", arr(removed.result()))
              o.set[JsonNode]("missing", arr(missing.result()))
              respond(ex, 200, o.toString)
          }
        }
        case ("HEAD", Seq("namespaces", _, "tables", name)) => synchronized {
          respond(ex, if (tables.contains(dec(name))) 204 else 404, "")
        }
        case ("GET", Seq("namespaces", _, "tables", name)) => synchronized {
          tables.get(dec(name)) match {
            case None =>
              respond(ex, 404, error("NoSuchTableException", s"no such table: $name"))
            case Some(e) => respond(ex, 200, loadResult(dec(name), e))
          }
        }
        case ("POST", Seq("namespaces", _, "tables", name)) => commit(ex, dec(name))
        case ("DELETE", Seq("namespaces", _, "tables", name)) => synchronized {
          tables.remove(dec(name)) match {
            case None =>
              respond(ex, 404, error("NoSuchTableException", s"no such table: $name"))
            case Some(e) =>
              if (ex.getRequestURI.getQuery != null &&
                  ex.getRequestURI.getQuery.contains("purgeRequested=true"))
                deleteRecursively(e.location)
              respond(ex, 204, "")
          }
        }
        case ("POST", Seq("tables", "rename")) => rename(ex)
        case _ =>
          respond(ex, 404, error("NotFoundException", s"$method $path"))
      }
    } catch {
      case e: Exception =>
        respond(ex, 500, error("InternalServerError", String.valueOf(e.getMessage)))
    } finally ex.close()
  }

  private def create(ex: HttpExchange): Unit = {
    val body = mapper.readTree(new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8))
    val name = body.path("name").asText()
    val meta = TableMetadataJson.read(body.path("metadata").toString)
    if (body.path("stage-create").asBoolean(false)) {
      // staged: nothing registered; the client materializes via a commit
      // carrying assert-create
      respond(ex, 200, stagedResult(meta))
      return
    }
    synchronized {
      if (tables.contains(name)) {
        respond(ex, 409,
          error("AlreadyExistsException", s"table $name already exists"))
        return
      }
      val e = Entry(Vector(meta), meta.location, Vector.empty)
      tables(name) = e
      writeNewVersion(e)
      respond(ex, 200, loadResult(name, e))
    }
  }

  /** Register route (`rest.go:811`): adopt an existing metadata file as the
    * table's current version — the file is read, never rewritten, so a
    * registered table's historic version files keep their numbering.
    */
  private def register(ex: HttpExchange): Unit = {
    val body = mapper.readTree(new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8))
    val name = body.path("name").asText()
    val loc = body.path("metadata-location").asText()
    synchronized {
      if (tables.contains(name)) {
        respond(ex, 409,
          error("AlreadyExistsException", s"table $name already exists"))
        return
      }
      val meta =
        try TableMetadataJson.read(MetadataFiles.read(loc))
        catch {
          case _: Exception =>
            respond(ex, 404,
              error("NoSuchTableException", s"unreadable metadata at $loc"))
            return
        }
      tables(name) = Entry(Vector(meta), meta.location, Vector(loc))
      respond(ex, 200, loadResult(name, tables(name)))
    }
  }

  private def commit(ex: HttpExchange, name: String): Unit = {
    val body = mapper.readTree(new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8))
    val meta = TableMetadataJson.read(body.path("metadata").toString)
    val reqs = parseRequirements(body.path("requirements"))
    commitAttempts.incrementAndGet()
    synchronized {
      tables.get(name) match {
        case None if reqs.contains(AssertCreate) =>
          // materializing a staged create: table must not exist — it doesn't
          val e = Entry(Vector(meta), meta.location, Vector.empty)
          tables(name) = e
          writeNewVersion(e)
          respond(ex, 200, loadResult(name, e))
        case None =>
          respond(ex, 404,
            error("NoSuchTableException", s"no such table: $name"))
        case Some(e) =>
          val current = e.versions.last
          val violation = reqs.iterator.flatMap {
            case AssertCreate => Some(s"table $name already exists")
            case r => r.validate(current)
          }.nextOption()
          val expected = body.path("expected-version").asInt(-1)
          if (violation.isDefined)
            respond(ex, 409, error("CommitFailedException", violation.get))
          else if (expected != e.versions.size)
            respond(ex, 409, error("CommitFailedException",
              s"table $name at version ${e.versions.size}, expected $expected"))
          else {
            e.versions :+= meta
            writeNewVersion(e)
            respond(ex, 200, loadResult(name, e))
          }
      }
    }
  }

  private def rename(ex: HttpExchange): Unit = {
    val body = mapper.readTree(new String(ex.getRequestBody.readAllBytes(),
      StandardCharsets.UTF_8))
    val from = body.path("source").path("name").asText()
    val to = body.path("destination").path("name").asText()
    synchronized {
      if (!tables.contains(from))
        respond(ex, 404, error("NoSuchTableException", s"no such table: $from"))
      else if (tables.contains(to))
        respond(ex, 409, error("AlreadyExistsException", s"table $to already exists"))
      else {
        tables(to) = tables.remove(from).get // identifier only; location stays
        respond(ex, 204, "")
      }
    }
  }

  private def parseRequirements(node: JsonNode): Seq[TableRequirement] = {
    val out = Seq.newBuilder[TableRequirement]
    node.forEach { r =>
      r.path("type").asText() match {
        case "assert-create" => out += AssertCreate
        case "assert-table-uuid" => out += AssertTableUUID(r.path("uuid").asText())
        case "assert-ref-snapshot-id" =>
          val snap = r.path("snapshot-id")
          out += AssertRefSnapshotID(r.path("ref").asText(),
            if (snap.isNull || snap.isMissingNode) None else Some(snap.asLong()))
        case _ => // unvalidated assert types: accept (stub covers the three used)
      }
    }
    out.result()
  }

  /** Write the latest version to the next `v{N}` slot — N follows the LAST
    * recorded metadata file's number, so commits on top of a registered
    * table continue its numbering instead of clobbering history.
    */
  private def writeNewVersion(e: Entry): Unit = {
    val vPat = ".*v(\\d+)\\.metadata\\.json$".r
    val next = e.metadataLocs.lastOption match {
      case Some(vPat(n)) => n.toInt + 1
      case _ => e.versions.size // fresh create, or foreign naming: best effort
    }
    val path = s"${e.location}/metadata/v$next.metadata.json"
    val dir = Paths.get(MetadataFiles.stripScheme(s"${e.location}/metadata"))
    Files.createDirectories(dir)
    Files.write(Paths.get(MetadataFiles.stripScheme(path)),
      TableMetadataJson.write(e.versions.last).getBytes(StandardCharsets.UTF_8))
    e.metadataLocs :+= path
  }

  private def loadResult(name: String, e: Entry): String = {
    val o = mapper.createObjectNode()
    o.put("metadata-location", e.metadataLocs.last)
    o.put("version", e.versions.size)
    o.set[JsonNode]("metadata",
      mapper.readTree(TableMetadataJson.write(e.versions.last)))
    o.toString
  }

  private def stagedResult(meta: TableMetadata): String = {
    val o = mapper.createObjectNode()
    o.put("version", 0)
    o.set[JsonNode]("metadata", mapper.readTree(TableMetadataJson.write(meta)))
    o.toString
  }

  private def deleteRecursively(location: String): Unit = {
    val root = Paths.get(MetadataFiles.stripScheme(location))
    if (Files.exists(root)) {
      Files.walk(root).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  private def viewJson(v: ViewVersion): JsonNode = {
    val o = mapper.createObjectNode()
    o.put("version-id", v.versionId)
    o.put("timestamp-ms", v.timestampMs)
    o.put("sql", v.sql)
    o.put("dialect", v.dialect)
    o
  }

  private def dec(s: String): String = java.net.URLDecoder.decode(s, "UTF-8")

  /** Spec list pagination (opaque `pageToken` in, `next-page-token` out;
    * reference `catalog/rest/rest.go` ListTables/ListNamespaces follow the
    * token until absent). The stub's token is the next start offset.
    * Paging engages when the client sends `pageSize` or the server was
    * constructed with a forced [[listPageSize]] — the latter is how specs
    * prove the CLIENT keeps following tokens it never asked for, which the
    * spec allows a server to emit unprompted.
    */
  private def page(ex: HttpExchange, all: Seq[String]): (Seq[String], Option[String]) = {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    val params = q.split('&').filter(_.contains('=')).map(_.split("=", 2))
      .map(a => dec(a(0)) -> dec(a(1))).toMap
    val start = params.get("pageToken").flatMap(_.toIntOption).getOrElse(0)
    params.get("pageSize").flatMap(_.toIntOption).orElse(listPageSize) match {
      case Some(s) =>
        // a BROKEN-server mode for specs: re-issue the same token forever —
        // a conformant client must fail loudly rather than loop or truncate
        (all.slice(start, start + s),
          if (repeatPageToken) Some("0")
          else if (start + s < all.size) Some((start + s).toString) else None)
      case None => (all.drop(start), None)
    }
  }

  /** Spec `ErrorModel` requires message, type AND code; the code mirrors
    * the HTTP status a conformant server pairs with the exception type.
    */
  private val errorCodes = Map(
    "NotAuthorizedException" -> 401,
    "NoSuchViewException" -> 404, "NoSuchNamespaceException" -> 404,
    "NoSuchTableException" -> 404, "NotFoundException" -> 404,
    "AlreadyExistsException" -> 409, "NamespaceNotEmptyException" -> 409,
    "CommitFailedException" -> 409, "InternalServerError" -> 500)

  private def error(tpe: String, msg: String): String = {
    val o = mapper.createObjectNode()
    val e = mapper.createObjectNode()
    e.put("message", msg)
    e.put("type", tpe)
    e.put("code", errorCodes.getOrElse(tpe, 400))
    o.set[JsonNode]("error", e)
    o.toString
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    if (ex.getRequestMethod == "HEAD" || bytes.isEmpty)
      ex.sendResponseHeaders(status, -1)
    else {
      ex.sendResponseHeaders(status, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
    }
  }
}

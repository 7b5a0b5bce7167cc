package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-view-style metadata (reference `view/view.go`,
  * `view/metadata.go:68-237`): versioned SQL representations persisted as
  * JSON under the warehouse; execution registers the current version as a
  * Spark temp view, so Catalyst plans straight through it.
  */
final case class ViewVersion(versionId: Int, timestampMs: Long, sql: String, dialect: String)

final class ViewCatalog(warehouse: String) {
  private val mapper = new ObjectMapper()
  private def viewFile(name: String) =
    Paths.get(warehouse.stripPrefix("file:"), name, "view.metadata.json")

  def createOrReplace(name: String, sql: String): ViewVersion = {
    val existing = if (Files.exists(viewFile(name))) load(name) else Nil
    val next = ViewVersion(existing.map(_.versionId).maxOption.getOrElse(0) + 1,
      System.currentTimeMillis(), sql, "spark")
    val all = existing :+ next
    val root = mapper.createObjectNode()
    root.put("view-name", name)
    root.put("current-version-id", next.versionId)
    val arr = mapper.createArrayNode()
    all.foreach { v =>
      val o = mapper.createObjectNode()
      o.put("version-id", v.versionId)
      o.put("timestamp-ms", v.timestampMs)
      o.put("sql", v.sql)
      o.put("dialect", v.dialect)
      arr.add(o)
    }
    root.set[com.fasterxml.jackson.databind.JsonNode]("versions", arr)
    Files.createDirectories(viewFile(name).getParent)
    // write-temp-then-rename: an in-place rewrite torn by a crash leaves a
    // truncated view.metadata.json that every later load() fails to parse,
    // losing the whole version history
    val tmp = viewFile(name).resolveSibling(
      s"view.metadata.${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, root.toPrettyString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, viewFile(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  private def readRoot(name: String) =
    mapper.readTree(new String(Files.readAllBytes(viewFile(name)),
      StandardCharsets.UTF_8))

  private def versionsOf(n: com.fasterxml.jackson.databind.JsonNode): Seq[ViewVersion] = {
    val out = Seq.newBuilder[ViewVersion]
    n.get("versions").elements().forEachRemaining { v =>
      out += ViewVersion(v.get("version-id").asInt(), v.get("timestamp-ms").asLong(),
        v.get("sql").asText(), v.get("dialect").asText())
    }
    out.result()
  }

  def load(name: String): Seq[ViewVersion] = versionsOf(readRoot(name))

  def currentSql(name: String): String = {
    val n = readRoot(name) // one read+parse serves both the pointer and the list
    val cur = n.get("current-version-id").asInt()
    versionsOf(n).find(_.versionId == cur).get.sql
  }

  /** Materialize the view's current version as a Spark temp view + frame. */
  def run(spark: SparkSession, name: String): DataFrame = {
    val df = spark.sql(currentSql(name))
    df.createOrReplaceTempView(name.replaceAll("[^A-Za-z0-9_]", "_"))
    df
  }
}

/** SPEC-format Iceberg view metadata (reference `view/metadata.go:68-237`;
  * golden file `view/testdata/view-metadata.json`): view-uuid,
  * format-version, versioned SQL REPRESENTATIONS with dialects, spec
  * schemas (the same type JSON as table metadata), and the version-log.
  * [[ViewCatalog]] above is the engine's lightweight operational store;
  * this codec is the interop surface — ViewMetadataSpec parses the
  * reference's own golden bytes through it.
  */
final case class ViewRepresentation(repType: String, sql: String, dialect: String)

final case class SpecViewVersion(versionId: Int, timestampMs: Long,
    schemaId: Int, defaultCatalog: Option[String],
    defaultNamespace: Seq[String], summary: Map[String, String],
    representations: Seq[ViewRepresentation])

final case class ViewMetadata(viewUuid: String, formatVersion: Int,
    location: String, currentVersionId: Int, properties: Map[String, String],
    versions: Seq[SpecViewVersion], schemas: Seq[graft.core.IceSchema],
    versionLog: Seq[(Long, Int)]) {
  def currentVersion: SpecViewVersion =
    versions.find(_.versionId == currentVersionId).getOrElse(
      throw new IllegalArgumentException(
        s"current-version-id $currentVersionId not in versions"))
  /** The current version's SQL for a dialect (the text an engine executes). */
  def currentSql(dialect: String): Option[String] =
    currentVersion.representations
      .find(r => r.repType == "sql" && r.dialect == dialect).map(_.sql)
}

object ViewMetadataJson {
  private val mapper = new ObjectMapper()

  private def iter(n: com.fasterxml.jackson.databind.JsonNode) = {
    val b = Seq.newBuilder[com.fasterxml.jackson.databind.JsonNode]
    n.elements().forEachRemaining(b += _)
    b.result()
  }

  def parse(json: String): ViewMetadata = {
    val n = mapper.readTree(json)
    def strMap(field: String): Map[String, String] =
      Option(n.get(field)).map { o =>
        val b = Map.newBuilder[String, String]
        o.fields().forEachRemaining(e => b += e.getKey -> e.getValue.asText())
        b.result()
      }.getOrElse(Map.empty)
    val versions = iter(n.get("versions")).map { v =>
      val summary = {
        val b = Map.newBuilder[String, String]
        Option(v.get("summary")).foreach(_.fields().forEachRemaining(e =>
          b += e.getKey -> e.getValue.asText()))
        b.result()
      }
      SpecViewVersion(
        v.get("version-id").asInt(),
        v.get("timestamp-ms").asLong(),
        v.get("schema-id").asInt(),
        Option(v.get("default-catalog")).map(_.asText()),
        Option(v.get("default-namespace")).map(iter(_).map(_.asText()))
          .getOrElse(Nil),
        summary,
        iter(v.get("representations")).map(r => ViewRepresentation(
          r.get("type").asText(), r.get("sql").asText(),
          r.get("dialect").asText())))
    }
    val m = ViewMetadata(
      n.get("view-uuid").asText(),
      n.get("format-version").asInt(),
      n.get("location").asText(),
      n.get("current-version-id").asInt(),
      strMap("properties"),
      versions,
      iter(n.get("schemas")).map(TableMetadataJson.schemaFromJson),
      iter(n.get("version-log")).map(e =>
        (e.get("timestamp-ms").asLong(), e.get("version-id").asInt())))
    m.currentVersion // validate the pointer resolves
    versions.foreach { v =>
      if (!m.schemas.exists(_.schemaId == v.schemaId))
        throw new IllegalArgumentException(
          s"version ${v.versionId} references missing schema-id ${v.schemaId}")
    }
    m
  }

  def write(m: ViewMetadata): String = {
    val root = mapper.createObjectNode()
    root.put("view-uuid", m.viewUuid)
    root.put("format-version", m.formatVersion)
    root.put("location", m.location)
    root.put("current-version-id", m.currentVersionId)
    val props = mapper.createObjectNode()
    m.properties.foreach { case (k, v) => props.put(k, v) }
    root.set[com.fasterxml.jackson.databind.JsonNode]("properties", props)
    val vs = mapper.createArrayNode()
    m.versions.foreach { v =>
      val o = mapper.createObjectNode()
      o.put("version-id", v.versionId)
      o.put("timestamp-ms", v.timestampMs)
      o.put("schema-id", v.schemaId)
      v.defaultCatalog.foreach(o.put("default-catalog", _))
      val ns = mapper.createArrayNode()
      v.defaultNamespace.foreach(ns.add)
      o.set[com.fasterxml.jackson.databind.JsonNode]("default-namespace", ns)
      val sm = mapper.createObjectNode()
      v.summary.foreach { case (k, s) => sm.put(k, s) }
      o.set[com.fasterxml.jackson.databind.JsonNode]("summary", sm)
      val reps = mapper.createArrayNode()
      v.representations.foreach { r =>
        val ro = mapper.createObjectNode()
        ro.put("type", r.repType)
        ro.put("sql", r.sql)
        ro.put("dialect", r.dialect)
        reps.add(ro)
      }
      o.set[com.fasterxml.jackson.databind.JsonNode]("representations", reps)
      vs.add(o)
    }
    root.set[com.fasterxml.jackson.databind.JsonNode]("versions", vs)
    val sch = mapper.createArrayNode()
    m.schemas.foreach(s => sch.add(TableMetadataJson.schemaToJson(s)))
    root.set[com.fasterxml.jackson.databind.JsonNode]("schemas", sch)
    val log = mapper.createArrayNode()
    m.versionLog.foreach { case (ts, id) =>
      val e = mapper.createObjectNode()
      e.put("timestamp-ms", ts)
      e.put("version-id", id)
      log.add(e)
    }
    root.set[com.fasterxml.jackson.databind.JsonNode]("version-log", log)
    root.toPrettyString
  }
}

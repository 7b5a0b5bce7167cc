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
    Files.write(viewFile(name), root.toPrettyString.getBytes(StandardCharsets.UTF_8))
    next
  }

  def load(name: String): Seq[ViewVersion] = {
    val n = mapper.readTree(new String(Files.readAllBytes(viewFile(name)),
      StandardCharsets.UTF_8))
    val out = Seq.newBuilder[ViewVersion]
    n.get("versions").elements().forEachRemaining { v =>
      out += ViewVersion(v.get("version-id").asInt(), v.get("timestamp-ms").asLong(),
        v.get("sql").asText(), v.get("dialect").asText())
    }
    out.result()
  }

  def currentSql(name: String): String = {
    val n = mapper.readTree(new String(Files.readAllBytes(viewFile(name)),
      StandardCharsets.UTF_8))
    val cur = n.get("current-version-id").asInt()
    load(name).find(_.versionId == cur).get.sql
  }

  /** Materialize the view's current version as a Spark temp view + frame. */
  def run(spark: SparkSession, name: String): DataFrame = {
    val df = spark.sql(currentSql(name))
    df.createOrReplaceTempView(name.replaceAll("[^A-Za-z0-9_]", "_"))
    df
  }
}

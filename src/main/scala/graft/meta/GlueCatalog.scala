package graft.meta

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

/** Glue-shaped catalog: the [[Catalog]] SPI implemented over the AWS Glue
  * Data Catalog PROTOCOL (reference `catalog/glue/glue.go:1-802`), with the
  * service behind the same seam the reference tests against — its
  * `glueAPI` interface (`glue.go:127-139`) is mocked in `glue_test.go`
  * (1437 lines) because real Glue needs cloud credentials; [[GlueApi]] here
  * is that seam, [[GlueStubService]] the in-process conformance stub. A
  * deployment with the AWS SDK on the classpath implements [[GlueApi]] with
  * the real client and changes nothing else.
  *
  * Protocol facts mirrored from the reference:
  *   - a table is Iceberg iff `Parameters["table_type"] = "ICEBERG"`, and
  *     the commit pointer is `Parameters["metadata_location"]` with the
  *     previous pointer retained under `previous_metadata_location`
  *     (`glue.go:54-57`, `constructParameters` `glue.go:747-762`);
  *   - commits are optimistic-locked on the Glue table `VersionId`
  *     (`glue.go:335-346`): UpdateTable succeeds only when the version the
  *     writer read is still current — that CAS is the commit point;
  *   - metadata JSON lives on storage, the service stores pointers only;
  *   - rename is CreateTable(to, copied input) then DeleteTable(from), with
  *     the new table dropped again if the delete fails
  *     (`glue.go:390-448`);
  *   - Glue identifiers are case-insensitive and stored lowercased (the
  *     reference's `TestGlueGetTableCaseInsensitive`).
  */
trait GlueApi {
  import GlueApi._
  def createDatabase(name: String, parameters: Map[String, String]): Unit
  def getDatabase(name: String): GlueDatabase
  def getDatabases(): Seq[GlueDatabase]
  def deleteDatabase(name: String): Unit
  def createTable(database: String, input: GlueTableInput): Unit
  def getTable(database: String, name: String): GlueTable
  def getTables(database: String): Seq[GlueTable]
  def updateTable(database: String, input: GlueTableInput, versionId: String): Unit
  def deleteTable(database: String, name: String): Unit
}

object GlueApi {
  final case class GlueDatabase(name: String, parameters: Map[String, String])
  final case class GlueTableInput(name: String, tableType: String,
      parameters: Map[String, String], location: String)
  final case class GlueTable(name: String, tableType: String,
      parameters: Map[String, String], location: String, versionId: String)

  /** The AWS error shapes the reference branches on (`glue.go:632,698`). */
  final class EntityNotFoundException(msg: String) extends RuntimeException(msg)
  final class AlreadyExistsException(msg: String) extends RuntimeException(msg)
  final class ConcurrentModificationException(msg: String)
    extends RuntimeException(msg)

  val TableTypeIceberg = "ICEBERG"
  val ParamTableType = "table_type"
  val ParamMetadataLocation = "metadata_location"
  val ParamPreviousMetadataLocation = "previous_metadata_location"
}

/** In-process Glue Data Catalog conformance stub: lowercased identifiers,
  * AlreadyExists/EntityNotFound error shapes, and UpdateTable's VersionId
  * optimistic lock — the semantics `glue_test.go` mocks, runnable without a
  * cloud SDK.
  */
final class GlueStubService extends GlueApi {
  import GlueApi._

  private val databases = TrieMap[String, GlueDatabase]()
  private val tables = TrieMap[(String, String), GlueTable]()
  private val versionCounter = new AtomicLong(0L)
  private def lc(s: String) = s.toLowerCase(java.util.Locale.ROOT)

  def createDatabase(name: String, parameters: Map[String, String]): Unit =
    if (databases.putIfAbsent(lc(name), GlueDatabase(lc(name), parameters)).isDefined)
      throw new AlreadyExistsException(s"Database $name already exists.")

  def getDatabase(name: String): GlueDatabase =
    databases.getOrElse(lc(name),
      throw new EntityNotFoundException(s"Database $name not found."))

  def getDatabases(): Seq[GlueDatabase] = databases.values.toSeq.sortBy(_.name)

  def deleteDatabase(name: String): Unit = {
    getDatabase(name)
    if (tables.keys.exists(_._1 == lc(name)))
      throw new ConcurrentModificationException(s"Database $name is not empty.")
    databases.remove(lc(name)); ()
  }

  def createTable(database: String, input: GlueTableInput): Unit = {
    getDatabase(database)
    val key = (lc(database), lc(input.name))
    val t = GlueTable(lc(input.name), input.tableType, input.parameters,
      input.location, versionCounter.incrementAndGet().toString)
    if (tables.putIfAbsent(key, t).isDefined)
      throw new AlreadyExistsException(
        s"Table ${input.name} already exists in database $database.")
  }

  def getTable(database: String, name: String): GlueTable =
    tables.getOrElse((lc(database), lc(name)),
      throw new EntityNotFoundException(s"Table $database.$name not found."))

  def getTables(database: String): Seq[GlueTable] = {
    getDatabase(database)
    tables.collect { case ((db, _), t) if db == lc(database) => t }
      .toSeq.sortBy(_.name)
  }

  /** The CAS: replace atomically iff the caller's VersionId is current. */
  def updateTable(database: String, input: GlueTableInput,
      versionId: String): Unit = {
    val key = (lc(database), lc(input.name))
    val cur = getTable(database, input.name)
    if (cur.versionId != versionId)
      throw new ConcurrentModificationException(
        s"Table $database.${input.name} was modified (version ${cur.versionId}, " +
          s"expected $versionId).")
    val next = GlueTable(lc(input.name), input.tableType, input.parameters,
      input.location, versionCounter.incrementAndGet().toString)
    if (!tables.replace(key, cur, next))
      throw new ConcurrentModificationException(
        s"Table $database.${input.name} was modified concurrently.")
  }

  def deleteTable(database: String, name: String): Unit = {
    if (tables.remove((lc(database), lc(name))).isEmpty)
      throw new EntityNotFoundException(s"Table $database.$name not found.")
  }
}

/** [[Catalog]] over [[GlueApi]]. Flat SPI names live in one Glue database
  * (`database`, created on first use); metadata JSON follows the
  * `v{N}.metadata.json` warehouse convention, so the SPI's integer version
  * is parsed straight from the pointer.
  */
final class GlueCatalog(service: GlueApi, val warehouse: String,
    database: String = "default") extends Catalog {
  import GlueApi._

  try service.createDatabase(database, Map.empty)
  catch { case _: AlreadyExistsException => () }

  def tableLocation(name: String): String =
    try service.getTable(database, name).location
    catch { case _: EntityNotFoundException => s"$warehouse/$name" }

  def tableExists(name: String): Boolean =
    try {
      val t = service.getTable(database, name)
      t.parameters.get(ParamTableType).exists(_.equalsIgnoreCase(TableTypeIceberg))
    } catch { case _: EntityNotFoundException => false }

  def listTables(): Seq[String] =
    service.getTables(database)
      .filter(_.parameters.get(ParamTableType)
        .exists(_.equalsIgnoreCase(TableTypeIceberg)))
      .map(_.name)

  private def pointer(name: String): String =
    service.getTable(database, name).parameters.getOrElse(ParamMetadataLocation,
      throw new IllegalStateException(s"table $name has no metadata_location"))

  private def writeMetadata(name: String, metadata: TableMetadata, v: Int): String = {
    val loc = s"${metadata.location}/metadata/v$v.metadata.json"
    val p = Paths.get(MetadataFiles.stripScheme(loc))
    Files.createDirectories(p.getParent)
    Files.write(p, TableMetadataJson.write(metadata)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    loc
  }

  private def input(name: String, metadata: TableMetadata, pointer: String,
      previous: Option[GlueTable]): GlueTableInput = {
    val base = previous.map(_.parameters).getOrElse(Map.empty)
    val withPrev = base.get(ParamMetadataLocation) match {
      case Some(p) => base + (ParamPreviousMetadataLocation -> p)
      case None => base
    }
    GlueTableInput(name, "EXTERNAL_TABLE",
      withPrev + (ParamTableType -> TableTypeIceberg)
        + (ParamMetadataLocation -> pointer)
        ++ metadata.properties,
      metadata.location)
  }

  def create(name: String, metadata: TableMetadata): TableMetadata = {
    val loc = writeMetadata(name, metadata, 1)
    try service.createTable(database, input(name, metadata, loc, None))
    catch {
      case e: AlreadyExistsException =>
        Files.deleteIfExists(Paths.get(MetadataFiles.stripScheme(loc)))
        throw new IllegalStateException(e.getMessage)
    }
    metadata
  }

  def load(name: String): TableMetadata =
    TableMetadataJson.read(readMetadataFile(pointer(name)))

  def currentVersion(name: String): Int = GlueCatalog.versionOf(pointer(name))

  def loadVersioned(name: String): (Int, TableMetadata) = {
    // ONE pointer read feeds both values — see the trait contract
    val ptr = pointer(name)
    (GlueCatalog.versionOf(ptr), TableMetadataJson.read(readMetadataFile(ptr)))
  }

  def commit(name: String, expectedVersion: Int, metadata: TableMetadata): Int = {
    val cur = service.getTable(database, name)
    val held = GlueCatalog.versionOf(
      cur.parameters.getOrElse(ParamMetadataLocation,
        throw new IllegalStateException(s"table $name has no metadata_location")))
    if (held != expectedVersion)
      throw new CommitConflictException(
        s"table $name at version $held, expected $expectedVersion")
    val next = expectedVersion + 1
    val loc = writeMetadata(name, metadata, next)
    try service.updateTable(database, input(name, metadata, loc, Some(cur)),
      cur.versionId)
    catch {
      case e: ConcurrentModificationException =>
        Files.deleteIfExists(Paths.get(MetadataFiles.stripScheme(loc)))
        throw new CommitConflictException(e.getMessage)
    }
    next
  }

  def dropTable(name: String): Unit = {
    val location = tableLocation(name)
    service.deleteTable(database, name)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(new java.net.URI(location), FileIO.conf)
    fs.delete(new org.apache.hadoop.fs.Path(location), true)
    ()
  }

  /** Reference rename (`glue.go:390-448`): copy the Glue entry under the
    * new identifier, then delete the old one — rolling the copy back if the
    * delete fails. Files never move; the pointer travels in Parameters.
    */
  def renameTable(from: String, to: String): Unit = {
    val cur = service.getTable(database, from)
    try service.createTable(database,
      GlueTableInput(to, cur.tableType, cur.parameters, cur.location))
    catch {
      case e: AlreadyExistsException => throw new CommitConflictException(e.getMessage)
    }
    try service.deleteTable(database, from)
    catch {
      case e: EntityNotFoundException =>
        service.deleteTable(database, to) // reference's rollback branch
        throw new IllegalArgumentException(e.getMessage)
    }
  }

  def readMetadataFile(path: String): String = MetadataFiles.read(path)

  def deleteMetadataBefore(name: String, beforeVersion: Int): Unit = {
    val dir = Paths.get(MetadataFiles.stripScheme(s"${tableLocation(name)}/metadata"))
    if (Files.isDirectory(dir)) Files.list(dir).forEach { p =>
      val m = GlueCatalog.versionPattern.findFirstMatchIn(p.getFileName.toString)
      if (m.exists(_.group(1).toInt < beforeVersion)) Files.deleteIfExists(p)
    }
  }
}

object GlueCatalog {
  private[meta] val versionPattern = "v(\\d+)\\.metadata\\.json".r

  private[meta] def versionOf(pointer: String): Int =
    versionPattern.findFirstMatchIn(pointer).map(_.group(1).toInt)
      .getOrElse(throw new IllegalStateException(
        s"cannot parse version from metadata location: $pointer"))
}

package graft.meta

import java.io.{FileNotFoundException, IOException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.GZIPInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The catalog service-provider interface (reference
  * `catalog/catalog.go:89-126`): identifier → table-metadata mapping with a
  * compare-and-swap commit. `FileCatalog` is the warehouse-directory
  * implementation; a REST/JDBC catalog slots in behind the same trait.
  */
trait Catalog {
  def tableLocation(name: String): String
  def tableExists(name: String): Boolean
  def listTables(): Seq[String]
  def create(name: String, metadata: TableMetadata): TableMetadata
  def load(name: String): TableMetadata
  def currentVersion(name: String): Int

  /** ATOMICALLY consistent (version, metadata) snapshot of the table
    * pointer. Callers that will later CAS with the returned version MUST
    * use this, never `load` + `currentVersion` separately: a commit landing
    * between the two reads pairs version n+1 with metadata of version n,
    * and the caller's next CAS then links n+2 CONTENT BUILT FROM n —
    * silently erasing commit n+1 from history (a real lost-update race the
    * concurrency fuzz caught in round 18). Each catalog reads its pointer
    * ONCE and derives both values from that single read; implementations
    * may also return metadata NEWER than a racing reader's view, which is
    * safe (the CAS merely conflicts and retries).
    */
  def loadVersioned(name: String): (Int, TableMetadata)

  /** CAS commit: succeeds only if `expectedVersion` is still current. */
  def commit(name: String, expectedVersion: Int, metadata: TableMetadata): Int
  def dropTable(name: String): Unit

  /** Materialize a STAGED create (reference `StagedTable`,
    * `table/requirements.go:108-127` AssertCreate): register version 1 iff
    * the table does not exist, losing as [[CommitConflictException]] so a
    * racing staged create retries or surrenders like any other commit. The
    * default rides `create`'s own exactly-one-winner guarantee; REST sends
    * an `assert-create` requirement instead.
    */
  def commitCreate(name: String, metadata: TableMetadata): Unit =
    try { create(name, metadata); () }
    catch {
      case e: IllegalStateException => throw new CommitConflictException(e.getMessage)
      case e: IllegalArgumentException => throw new CommitConflictException(e.getMessage)
    }

  /** Location of the metadata JSON backing `version` — the `v{N}` warehouse
    * convention by default; catalogs with other naming override. Feeds the
    * spec's `metadata-log`, which records each superseded metadata file.
    */
  def metadataLocation(name: String, version: Int): String =
    s"${tableLocation(name)}/metadata/v$version.metadata.json"

  /** Register an EXISTING table under this catalog by its current
    * metadata-JSON location (reference REST `RegisterTable`,
    * `catalog/rest/rest.go:811` — the migration verb for adopting a table
    * another catalog wrote). Data, manifest, and historic metadata files
    * are shared, never copied: the entry carries the same table UUID,
    * location, and snapshot history the metadata file describes. Throws
    * `IllegalStateException` if the identifier is taken.
    */
  def registerTable(name: String, metadataLocation: String): TableMetadata =
    create(name, TableMetadataJson.read(readMetadataFile(metadataLocation)))

  /** Rename the catalog identifier; the table location and its files do not
    * move (REST-catalog rename semantics).
    */
  def renameTable(from: String, to: String): Unit
  def readMetadataFile(path: String): String
  def deleteMetadataBefore(name: String, beforeVersion: Int): Unit
}

/** Warehouse-directory catalog with optimistic-CAS commits (reference
  * `catalog/catalog.go:89-126` interface, local `version-hint.text`
  * convention). Metadata files are `metadata/v{N}.metadata.json`; a commit
  * at version N+1 succeeds for exactly one writer (atomic hard-link create
  * on the local FS — POSIX link(2) fails with EEXIST), which is the CAS.
  * Renames are identifier-level: a `{name}.ptr` file redirects to the
  * original location and a `renamed-away.text` tombstone retires the old
  * identifier, so absolute file paths in manifests stay valid.
  */
final class FileCatalog(val warehouse: String) extends Catalog {
  private def conf = FileIO.conf

  private def ptrFile(name: String) = s"$warehouse/$name.ptr"
  private def tombstone(location: String) = s"$location/metadata/renamed-away.text"

  def tableLocation(name: String): String = {
    val ptr = Paths.get(stripScheme(ptrFile(name)))
    if (Files.exists(ptr))
      new String(Files.readAllBytes(ptr), StandardCharsets.UTF_8).trim
    else s"$warehouse/$name"
  }
  private def metadataDir(name: String) = s"${tableLocation(name)}/metadata"
  private def versionFile(name: String, v: Int) = s"${metadataDir(name)}/v$v.metadata.json"
  private def gzVersionFile(name: String, v: Int) =
    s"${metadataDir(name)}/v$v.gz.metadata.json"
  private def hintFile(name: String) = s"${metadataDir(name)}/version-hint.text"

  /** The spec-style metadata file for `v` — `%05d-{uuid}[.gz].metadata.json`
    * (reference `locations.go:55-78` NewTableMetadataFileLocation) — if one
    * was written (`write.metadata.file-naming=spec`). The uuid is random
    * per commit, so readers find the file by its deterministic `%05d-`
    * version prefix.
    */
  private def specVersionFile(name: String, v: Int): Option[String] = {
    val dir = Paths.get(stripScheme(metadataDir(name)))
    if (!Files.exists(dir)) return None
    val prefix = f"$v%05d-"
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .map(_.getFileName.toString)
        .find(n => n.startsWith(prefix) && n.endsWith(".metadata.json"))
        .map(n => s"${metadataDir(name)}/$n")
    } finally s.close()
  }

  /** Per-table memo of "does this table use spec-style names at all" so
    * resolveVersionFile — on the hot path of every load — pays the
    * directory listing only for the rare spec-named tables (and exactly
    * once for everyone else). Seeded by one listing, kept current by
    * writeVersion. A stale `false` from another process enabling spec
    * naming mid-flight only costs cosmetics: the plain CAS lock is always
    * valid JSON, so resolution stays correct, just not extension-preferred.
    */
  private val specNamingMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def tableUsesSpecNaming(name: String): Boolean =
    specNamingMemo.computeIfAbsent(name, _ => {
      val dir = Paths.get(stripScheme(metadataDir(name)))
      if (!Files.exists(dir)) java.lang.Boolean.FALSE
      else {
        val s = Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.exists { p =>
            val n = p.getFileName.toString
            n.length > 6 && n.take(5).forall(_.isDigit) && n(5) == '-' &&
              n.endsWith(".metadata.json")
          }
        } finally s.close()
      }
    })

  /** The on-disk metadata file for `version` — the reference's
    * `.gz.metadata.json` flavor (`locations.go:65-78`) when the table was
    * committed with gzip metadata, else the plain name. The gzip flavor is
    * PREFERRED when present so every recorded/returned location is
    * extension-accurate for readers that dispatch decompression by file
    * name (reference `table.go` isGzippedMetadataJson, Java Iceberg
    * Codec.fromFileName); the plain CAS-lock name always holds plain JSON
    * and remains a valid fallback.
    */
  private def resolveVersionFile(name: String, v: Int): String = {
    val spec = if (tableUsesSpecNaming(name)) specVersionFile(name, v) else None
    spec.getOrElse {
      val gz = gzVersionFile(name, v)
      if (Files.exists(Paths.get(stripScheme(gz)))) gz
      else versionFile(name, v)
    }
  }

  override def metadataLocation(name: String, version: Int): String =
    resolveVersionFile(name, version)

  def tableExists(name: String): Boolean =
    Files.exists(Paths.get(stripScheme(hintFile(name)))) &&
      (Files.exists(Paths.get(stripScheme(ptrFile(name)))) ||
        !Files.exists(Paths.get(stripScheme(tombstone(s"$warehouse/$name")))))

  def listTables(): Seq[String] = {
    val w = Paths.get(stripScheme(warehouse))
    if (!Files.exists(w)) Nil
    else {
      val out = Seq.newBuilder[String]
      Files.list(w).forEach { p =>
        val n = p.getFileName.toString
        val name = if (n.endsWith(".ptr")) n.stripSuffix(".ptr") else n
        if (tableExists(name)) out += name
      }
      out.result().distinct.sorted
    }
  }

  private def renameIntent(from: String) = s"$warehouse/rename-$from.intent"

  /** The COMMIT POINT is a per-`from` intent file in the warehouse root,
    * created atomically-exclusive (`CREATE_NEW`): exactly one concurrent
    * rename of `from` ever wins, and a rename to a different target finds
    * the winner's intent and conflicts. The intent records both the target
    * name and the table location, so a crashed rename is resumable without
    * consulting `from`'s (possibly already-deleted) pointer. Step order
    * after the intent — retire the original identifier (tombstone), delete
    * `from.ptr`, write `to.ptr` — means a crash leaves either `from` alive
    * (before the tombstone/ptr-delete) or NEITHER name alive (resumable via
    * the intent); no window has both identifiers resolving. Re-running
    * `renameTable(from, to)` for the recorded pair completes idempotently.
    * The intent is deleted as the FINAL step after `to.ptr` is written, so a
    * completed rename leaves no residue and `from` is immediately reusable;
    * the resume path re-validates that the recorded location still hosts the
    * renamed table before touching any pointer, so a stale intent can never
    * clobber a live `to` table.
    */
  def renameTable(from: String, to: String): Unit = {
    val intent = Paths.get(stripScheme(renameIntent(from)))
    val recorded: Option[Array[String]] =
      if (Files.exists(intent))
        Some(new String(Files.readAllBytes(intent), StandardCharsets.UTF_8).split('\n'))
      else None
    if (recorded.exists(_.headOption.contains(to))) {
      // resume: only if the recorded location still hosts the half-renamed
      // table (metadata present; tombstone absent or already naming `to`)
      // and `to` has not since come to mean a different table.
      val location = recorded.get(1)
      val hintOk =
        Files.exists(Paths.get(stripScheme(s"$location/metadata/version-hint.text")))
      val tombP = Paths.get(stripScheme(tombstone(location)))
      val tombOk = !Files.exists(tombP) ||
        new String(Files.readAllBytes(tombP), StandardCharsets.UTF_8).trim == to
      val toPtrP = Paths.get(stripScheme(ptrFile(to)))
      val toOk =
        if (Files.exists(toPtrP))
          new String(Files.readAllBytes(toPtrP), StandardCharsets.UTF_8).trim == location
        else {
          val directLoc = s"$warehouse/$to"
          !(Files.exists(Paths.get(stripScheme(s"$directLoc/metadata/version-hint.text"))) &&
            !Files.exists(Paths.get(stripScheme(tombstone(directLoc)))))
        }
      if (!(hintOk && tombOk && toOk)) {
        Files.deleteIfExists(intent) // stale residue; clear and refuse
        throw new CommitConflictException(
          s"stale rename intent $from -> $to: recorded location no longer matches")
      }
      finishRename(intent, from, to, location)
      return
    }
    if (recorded.isDefined)
      throw new CommitConflictException(
        s"table $from was already renamed to ${recorded.get.headOption.getOrElse("?")}")
    // a completed rename leaves no intent: re-running it is an idempotent no-op
    if (!tableExists(from) && tableExists(to)) return
    require(tableExists(from), s"no such table: $from")
    require(!tableExists(to), s"table $to already exists")
    val location = tableLocation(from)
    try Files.write(intent, s"$to\n$location".getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(s"concurrent rename of table $from")
    }
    finishRename(intent, from, to, location)
  }

  /** Steps after the intent commit point; crash before the final intent
    * delete resumes via the surviving intent file.
    */
  private def finishRename(intent: java.nio.file.Path, from: String, to: String,
      location: String): Unit = {
    Files.write(Paths.get(stripScheme(tombstone(location))),
      to.getBytes(StandardCharsets.UTF_8))
    Files.deleteIfExists(Paths.get(stripScheme(ptrFile(from))))
    Files.write(Paths.get(stripScheme(ptrFile(to))),
      location.getBytes(StandardCharsets.UTF_8))
    Files.deleteIfExists(intent)
  }

  def dropTable(name: String): Unit = {
    val fs = FileSystem.get(new java.net.URI(tableLocation(name)), conf)
    fs.delete(new Path(tableLocation(name)), true)
  }

  def currentVersion(name: String): Int = {
    val hint = Paths.get(stripScheme(hintFile(name)))
    if (!Files.exists(hint))
      throw new FileNotFoundException(s"no such table: $name under $warehouse")
    // the hint is ADVISORY (last-writer-wins, so two racing winners can
    // leave it pointing one version BACK); the plain v{N} lock files are
    // the truth — probe forward from the hint so a regressed hint can
    // never strand every writer in a conflict livelock
    var v = new String(Files.readAllBytes(hint), StandardCharsets.UTF_8).trim.toInt
    while (Files.exists(Paths.get(stripScheme(versionFile(name, v + 1))))) v += 1
    v
  }

  def load(name: String): TableMetadata = loadVersioned(name)._2

  def loadVersioned(name: String): (Int, TableMetadata) = {
    // resolve the version FIRST, then read THAT version's file: the pair
    // stays consistent no matter how many commits land in between
    val v = currentVersion(name)
    (v, TableMetadataJson.read(readMetadataFile(resolveVersionFile(name, v))))
  }

  /** Reads plain or gzip metadata JSON (reference `table/table.go:391-452`). */
  def readMetadataFile(path: String): String = MetadataFiles.read(path)

  /** Create a table at version 1; fails if it already exists. */
  def create(name: String, metadata: TableMetadata): TableMetadata = {
    if (tableExists(name))
      throw new IllegalStateException(s"table $name already exists")
    Files.createDirectories(Paths.get(stripScheme(metadataDir(name))))
    writeVersion(name, 1, metadata)
    metadata
  }

  /** CAS commit: succeed only if `expectedVersion` is still current. */
  def commit(name: String, expectedVersion: Int, metadata: TableMetadata): Int = {
    val current = currentVersion(name)
    if (current != expectedVersion)
      throw new CommitConflictException(
        s"table $name at version $current, expected $expectedVersion")
    val next = expectedVersion + 1
    writeVersion(name, next, metadata)
    next
  }

  private def writeVersion(name: String, v: Int, metadata: TableMetadata): Unit = {
    val json = TableMetadataJson.write(metadata)
    // write.metadata.compression-codec=gzip writes the reference's
    // `.gz.metadata.json` flavor (locations.go:65-78). The PLAIN name is
    // always the CAS lock AND always holds PLAIN JSON: external readers
    // (reference `table.go` isGzippedMetadataJson, Java Iceberg
    // Codec.fromFileName) dispatch decompression by file EXTENSION, so a
    // `.metadata.json` name must never hold gzip bytes. The gzip flavor is
    // a sibling file written by the CAS winner only, so both names always
    // carry byte-content matching their extension.
    val gzip = metadata.properties
      .get("write.metadata.compression-codec").contains("gzip")
    val lock = Paths.get(stripScheme(versionFile(name, v)))
    val tmp = Files.createTempFile(lock.getParent, s".v$v-", ".tmp")
    try {
      Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
      try Files.createLink(lock, tmp) // atomic: exactly one writer wins v
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new CommitConflictException(s"lost CAS race for $name v$v")
      }
      // only the CAS winner reaches past the link, so the non-atomic
      // sibling writes below are single-writer; readers prefer these names
      // (see resolveVersionFile) once they exist and fall back to the
      // plain lock bytes until then. BEST-EFFORT: past the link the commit
      // is durable and readable via the plain lock, so a sibling failure
      // (disk full, permissions) must NOT surface as a failed commit — a
      // caller retrying "the failed commit" would hit its own version's
      // lock and misread a successful commit as a lost CAS race.
      def writeSibling(target: String, bytes: Array[Byte]): Unit =
        try {
          val tgt = Paths.get(stripScheme(target))
          val t2 = Files.createTempFile(lock.getParent, s".v$v-sib-", ".tmp")
          Files.write(t2, bytes)
          Files.move(t2, tgt,
            StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
        } catch {
          case e: java.io.IOException =>
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"committed $name v$v but could not write sibling $target " +
                s"(readers fall back to the plain lock): $e")
        }
      def gzipBytes: Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(bos)
        gz.write(json.getBytes(StandardCharsets.UTF_8)); gz.close()
        bos.toByteArray
      }
      if (gzip) writeSibling(gzVersionFile(name, v), gzipBytes)
      // write.metadata.file-naming=spec additionally writes the
      // reference's `%05d-{uuid}[.gz].metadata.json` flavor
      // (locations.go:55-78) — the name interop-readers expect — with the
      // CAS still anchored on the deterministic v{N} lock (a random-uuid
      // name can't arbitrate racing writers); resolveVersionFile prefers
      // the spec name so metadata-log entries record it
      if (metadata.properties.get(FileCatalog.FileNamingKey).contains("spec")) {
        val uuid = java.util.UUID.randomUUID()
        val ext = if (gzip) ".gz.metadata.json" else ".metadata.json"
        writeSibling(s"${metadataDir(name)}/${f"$v%05d"}-$uuid$ext",
          if (gzip) gzipBytes else json.getBytes(StandardCharsets.UTF_8))
        specNamingMemo.put(name, java.lang.Boolean.TRUE)
      }
    } finally Files.deleteIfExists(tmp)
    // hint is advisory; last-writer-wins is fine because versions only grow
    val hintTmp = Files.createTempFile(lock.getParent, ".hint-", ".tmp")
    Files.write(hintTmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(hintTmp, Paths.get(stripScheme(hintFile(name))),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Remove metadata JSON versions strictly below `beforeVersion` (the
    * delete-after-commit maintenance hook).
    */
  def deleteMetadataBefore(name: String, beforeVersion: Int): Unit =
    (1 until beforeVersion).foreach { v =>
      specVersionFile(name, v)
        .foreach(p => Files.deleteIfExists(Paths.get(stripScheme(p))))
      Files.deleteIfExists(Paths.get(stripScheme(versionFile(name, v))))
      Files.deleteIfExists(Paths.get(stripScheme(gzVersionFile(name, v))))
    }

  /** Local-path view of a warehouse URI. The control plane (pointer files,
    * version JSONs, the hard-link CAS) is java.nio over POSIX paths — that
    * is what makes link(2) an atomic commit point — so any scheme must
    * reduce to its path part here.
    */
  private def stripScheme(p: String): String = MetadataFiles.stripScheme(p)
}

object FileCatalog {
  /** `versioned` (default): the local `v{N}.metadata.json` +
    * `version-hint.text` convention. `spec`: ALSO write each version as
    * the reference's `%05d-{uuid}[.gz].metadata.json`
    * (`locations.go:55-78`) for interop with readers expecting spec-style
    * names; the v{N} name stays as the CAS anchor. Documented divergence:
    * the reference has no versioned flavor at all — its catalogs hold the
    * pointer — so `spec` is the parity mode and `versioned` the
    * self-contained-warehouse mode.
    */
  val FileNamingKey = "write.metadata.file-naming"
}

final class CommitConflictException(msg: String) extends IOException(msg)

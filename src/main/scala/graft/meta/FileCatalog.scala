package graft.meta

import java.io.{FileNotFoundException, IOException}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.zip.GZIPInputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Warehouse-directory catalog with optimistic-CAS commits (reference
  * `catalog/catalog.go:89-126` interface, local `version-hint.text`
  * convention). Metadata files are `metadata/v{N}.metadata.json`; a commit
  * at version N+1 succeeds for exactly one writer (atomic hard-link create
  * on the local FS — POSIX link(2) fails with EEXIST), which is the CAS.
  */
final class FileCatalog(val warehouse: String) {
  private val conf = new Configuration()

  def tableLocation(name: String): String = s"$warehouse/$name"
  private def metadataDir(name: String) = s"${tableLocation(name)}/metadata"
  private def versionFile(name: String, v: Int) = s"${metadataDir(name)}/v$v.metadata.json"
  private def hintFile(name: String) = s"${metadataDir(name)}/version-hint.text"

  def tableExists(name: String): Boolean =
    Files.exists(Paths.get(stripScheme(hintFile(name))))

  def listTables(): Seq[String] = {
    val w = Paths.get(stripScheme(warehouse))
    if (!Files.exists(w)) Nil
    else {
      val out = Seq.newBuilder[String]
      Files.list(w).forEach(p => if (tableExists(p.getFileName.toString))
        out += p.getFileName.toString)
      out.result()
    }
  }

  def dropTable(name: String): Unit = {
    val fs = FileSystem.get(new java.net.URI(tableLocation(name)), conf)
    fs.delete(new Path(tableLocation(name)), true)
  }

  def currentVersion(name: String): Int = {
    val hint = Paths.get(stripScheme(hintFile(name)))
    if (!Files.exists(hint))
      throw new FileNotFoundException(s"no such table: $name under $warehouse")
    new String(Files.readAllBytes(hint), StandardCharsets.UTF_8).trim.toInt
  }

  def load(name: String): TableMetadata = {
    val v = currentVersion(name)
    TableMetadataJson.read(readMetadataFile(versionFile(name, v)))
  }

  /** Reads plain or gzip metadata JSON (reference `table/table.go:391-452`). */
  def readMetadataFile(path: String): String = {
    val p = Paths.get(stripScheme(path))
    val real =
      if (Files.exists(p)) p
      else {
        val gz = Paths.get(stripScheme(path) + ".gz")
        if (Files.exists(gz)) gz else throw new FileNotFoundException(path)
      }
    val raw = Files.readAllBytes(real)
    if (real.toString.endsWith(".gz") ||
        (raw.length > 2 && raw(0) == 0x1f.toByte && raw(1) == 0x8b.toByte)) {
      val in = new GZIPInputStream(new java.io.ByteArrayInputStream(raw))
      new String(in.readAllBytes(), StandardCharsets.UTF_8)
    } else new String(raw, StandardCharsets.UTF_8)
  }

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
    val target = Paths.get(stripScheme(versionFile(name, v)))
    val tmp = Files.createTempFile(target.getParent, s".v$v-", ".tmp")
    try {
      Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
      try Files.createLink(target, tmp) // atomic: exactly one writer wins v
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new CommitConflictException(s"lost CAS race for $name v$v")
      }
    } finally Files.deleteIfExists(tmp)
    // hint is advisory; last-writer-wins is fine because versions only grow
    val hintTmp = Files.createTempFile(target.getParent, ".hint-", ".tmp")
    Files.write(hintTmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(hintTmp, Paths.get(stripScheme(hintFile(name))),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Remove metadata JSON versions strictly below `beforeVersion` (the
    * delete-after-commit maintenance hook).
    */
  def deleteMetadataBefore(name: String, beforeVersion: Int): Unit =
    (1 until beforeVersion).foreach { v =>
      Files.deleteIfExists(Paths.get(stripScheme(versionFile(name, v))))
    }

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) p.stripPrefix("file:") else p
}

final class CommitConflictException(msg: String) extends IOException(msg)

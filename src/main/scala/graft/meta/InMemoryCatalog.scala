package graft.meta

import scala.collection.mutable

/** In-memory catalog (reference `catalog/registry.go`): the identifier →
  * metadata mapping and its CAS live on the heap, while table locations
  * still point at a real warehouse directory for the data/manifest files.
  * A second implementation of [[Catalog]], proving the trait carries the
  * full commit protocol — used for tests and ephemeral tables.
  */
final class InMemoryCatalog(val warehouse: String) extends Catalog {

  private final case class Entry(versions: mutable.ArrayBuffer[TableMetadata],
      var location: String)

  private val tables = mutable.Map[String, Entry]()

  def tableLocation(name: String): String = synchronized {
    tables.get(name).map(_.location).getOrElse(s"$warehouse/$name")
  }

  def tableExists(name: String): Boolean = synchronized(tables.contains(name))

  def listTables(): Seq[String] = synchronized(tables.keys.toSeq.sorted)

  def create(name: String, metadata: TableMetadata): TableMetadata = synchronized {
    require(!tables.contains(name), s"table $name already exists")
    tables(name) = Entry(mutable.ArrayBuffer(metadata), metadata.location)
    metadata
  }

  def load(name: String): TableMetadata = synchronized {
    tables.getOrElse(name,
      throw new java.io.FileNotFoundException(s"no such table: $name")).versions.last
  }

  def currentVersion(name: String): Int = synchronized {
    tables.getOrElse(name,
      throw new java.io.FileNotFoundException(s"no such table: $name")).versions.size
  }

  def loadVersioned(name: String): (Int, TableMetadata) = synchronized {
    val e = tables.getOrElse(name,
      throw new java.io.FileNotFoundException(s"no such table: $name"))
    (e.versions.size, e.versions.last)
  }

  def commit(name: String, expectedVersion: Int, metadata: TableMetadata): Int =
    synchronized {
      val e = tables.getOrElse(name,
        throw new java.io.FileNotFoundException(s"no such table: $name"))
      if (e.versions.size != expectedVersion)
        throw new CommitConflictException(
          s"table $name at version ${e.versions.size}, expected $expectedVersion")
      e.versions += metadata
      e.versions.size
    }

  def dropTable(name: String): Unit = synchronized { tables.remove(name); () }

  def renameTable(from: String, to: String): Unit = synchronized {
    require(tables.contains(from), s"no such table: $from")
    require(!tables.contains(to), s"table $to already exists")
    tables(to) = tables.remove(from).get // location (and files) unchanged
  }

  def readMetadataFile(path: String): String =
    throw new UnsupportedOperationException("in-memory catalog holds no metadata files")

  def deleteMetadataBefore(name: String, beforeVersion: Int): Unit = () // nothing on disk
}

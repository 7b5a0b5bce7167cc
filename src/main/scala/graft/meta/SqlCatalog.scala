package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.sql.{Connection, DriverManager, SQLException}

/** JDBC-backed catalog (reference `catalog/sql/sql.go:136-153`): two ANSI-SQL
  * tables, `iceberg_tables(catalog_name, table_namespace, table_name,
  * iceberg_type, metadata_location, previous_metadata_location)` keyed on the
  * identifier triple, and `iceberg_namespace_properties(catalog_name,
  * namespace, property_key, property_value)`. The commit point is the
  * reference's CAS UPDATE (`sql.go:352-375`): `SET metadata_location = new
  * WHERE metadata_location = current` — zero rows affected means another
  * writer moved the pointer first and the commit conflicts.
  *
  * Metadata JSON lives on the filesystem as with every catalog here (the
  * database stores pointers, storage stores metadata). Each attempt writes a
  * uniquely-suffixed `v{N}-{uuid}.metadata.json`, so a LOSING racer's file is
  * a harmless orphan and the DB row is the only commit point; the version
  * integer the [[Catalog]] SPI carries is parsed back out of the current
  * pointer's file name.
  *
  * Tested against embedded Derby (`jdbc:derby:...;create=true`, on the Spark
  * classpath); the SQL is deliberately dialect-neutral, mirroring the
  * reference's stance that any database speaking a supported dialect works
  * (`sql.go:180-186`).
  */
final class SqlCatalog(jdbcUrl: String, warehouse: String,
    catalogName: String = "graft",
    dialectOverride: Option[SqlDialect] = None) extends Catalog {
  private val dialect: SqlDialect =
    dialectOverride.getOrElse(SqlDialect.fromUrl(jdbcUrl))
  SqlCatalog.ensureDriver(jdbcUrl)
  ensureCatalogTables()

  /** Names are `namespace.table`; a bare name lives in the `default`
    * namespace (created with the catalog tables, so the SPI's flat names
    * work without a createNamespace preamble).
    */
  private def split(name: String): (String, String) = {
    val i = name.lastIndexOf('.')
    if (i < 0) ("default", name) else (name.take(i), name.drop(i + 1))
  }
  private def joined(ns: String, table: String): String =
    if (ns == "default") table else s"$ns.$table"

  def tableLocation(name: String): String =
    currentPointer(name) match {
      case Some(loc) => loc.substring(0, loc.lastIndexOf("/metadata/"))
      case None =>
        val (ns, t) = split(name)
        s"$warehouse/${ns.replace('.', '/')}/$t"
    }

  def tableExists(name: String): Boolean = currentPointer(name).isDefined

  def listTables(): Seq[String] = withConn { c =>
    val st = c.prepareStatement(
      "SELECT table_namespace, table_name FROM iceberg_tables " +
        "WHERE catalog_name = ? AND iceberg_type = 'TABLE'")
    st.setString(1, catalogName)
    val rs = st.executeQuery()
    val out = Seq.newBuilder[String]
    while (rs.next()) out += joined(rs.getString(1), rs.getString(2))
    out.result().sorted
  }

  /** Create at version 1: INSERT wins exactly once (primary-key constraint);
    * the metadata file is written first so the row never points at nothing.
    */
  def create(name: String, metadata: TableMetadata): TableMetadata = {
    val (ns, t) = split(name)
    requireNamespace(ns)
    val loc = writeMetadataFile(metadata, 1)
    val inserted =
      try withConn { c =>
        val st = c.prepareStatement(
          "INSERT INTO iceberg_tables (catalog_name, table_namespace, " +
            "table_name, iceberg_type, metadata_location, " +
            "previous_metadata_location) VALUES (?, ?, ?, 'TABLE', ?, NULL)")
        st.setString(1, catalogName); st.setString(2, ns)
        st.setString(3, t); st.setString(4, loc)
        st.executeUpdate() == 1
      } catch { case e: SQLException if isDuplicateKey(e) => false }
    if (!inserted) {
      Files.deleteIfExists(Paths.get(MetadataFiles.stripScheme(loc)))
      throw new IllegalStateException(s"table $name already exists")
    }
    metadata
  }

  def load(name: String): TableMetadata =
    TableMetadataJson.read(readMetadataFile(pointerOrFail(name)))

  def currentVersion(name: String): Int =
    SqlCatalog.versionOf(pointerOrFail(name))

  def loadVersioned(name: String): (Int, TableMetadata) = {
    // ONE pointer read feeds both values — see the trait contract
    val ptr = pointerOrFail(name)
    (SqlCatalog.versionOf(ptr), TableMetadataJson.read(readMetadataFile(ptr)))
  }

  /** The reference's optimistic commit (`sql.go:352-375`): point the row at
    * the new metadata iff it still points at the metadata this writer loaded.
    */
  def commit(name: String, expectedVersion: Int, metadata: TableMetadata): Int = {
    val (ns, t) = split(name)
    val current = pointerOrFail(name)
    val held = SqlCatalog.versionOf(current)
    if (held != expectedVersion)
      throw new CommitConflictException(
        s"table $name at version $held, expected $expectedVersion")
    val next = expectedVersion + 1
    val loc = writeMetadataFile(metadata, next, Some(current))
    val swapped = withConn { c =>
      val st = c.prepareStatement(
        "UPDATE iceberg_tables SET metadata_location = ?, " +
          "previous_metadata_location = ? WHERE catalog_name = ? AND " +
          "table_namespace = ? AND table_name = ? AND metadata_location = ? " +
          "AND iceberg_type = 'TABLE'")
      st.setString(1, loc); st.setString(2, current)
      st.setString(3, catalogName); st.setString(4, ns)
      st.setString(5, t); st.setString(6, current)
      st.executeUpdate() == 1
    }
    if (!swapped) {
      Files.deleteIfExists(Paths.get(MetadataFiles.stripScheme(loc)))
      throw new CommitConflictException(
        s"table $name has been updated by another process")
    }
    next
  }

  def dropTable(name: String): Unit = {
    val location = tableLocation(name)
    val (ns, t) = split(name)
    withConn { c =>
      val st = c.prepareStatement(
        "DELETE FROM iceberg_tables WHERE catalog_name = ? AND " +
          "table_namespace = ? AND table_name = ?")
      st.setString(1, catalogName); st.setString(2, ns); st.setString(3, t)
      st.executeUpdate()
    }
    val fs = org.apache.hadoop.fs.FileSystem
      .get(new java.net.URI(location), FileIO.conf)
    fs.delete(new org.apache.hadoop.fs.Path(location), true)
    ()
  }

  /** Identifier-level rename (`sql.go:464-521`): one UPDATE of the key
    * columns; the destination's primary key makes a taken name a conflict,
    * and the files never move.
    */
  def renameTable(from: String, to: String): Unit = {
    val (fns, ft) = split(from)
    val (tns, tt) = split(to)
    requireNamespace(tns)
    val moved =
      try withConn { c =>
        val st = c.prepareStatement(
          "UPDATE iceberg_tables SET table_namespace = ?, table_name = ? " +
            "WHERE catalog_name = ? AND table_namespace = ? AND table_name = ?")
        st.setString(1, tns); st.setString(2, tt)
        st.setString(3, catalogName); st.setString(4, fns); st.setString(5, ft)
        st.executeUpdate() == 1
      } catch {
        case e: SQLException if isDuplicateKey(e) =>
          throw new CommitConflictException(s"table $to already exists")
      }
    if (!moved) throw new IllegalArgumentException(s"no such table: $from")
  }

  /** Attempt-unique names mean older versions must be found by listing; the
    * current one is just the row's pointer.
    */
  override def metadataLocation(name: String, version: Int): String = {
    val current = pointerOrFail(name)
    if (SqlCatalog.versionOf(current) == version) current
    else {
      val dir = current.substring(0, current.lastIndexOf('/'))
      val p = Paths.get(MetadataFiles.stripScheme(dir))
      var found: Option[String] = None
      if (Files.isDirectory(p)) {
        val st = Files.list(p)
        try st.forEach { f =>
          val n = f.getFileName.toString
          if (SqlCatalog.versionPattern.findFirstMatchIn(n).exists(_.group(1).toInt == version))
            found = Some(s"$dir/$n")
        } finally st.close() // Files.list leaks a directory fd if unclosed
      }
      found.getOrElse(s"$dir/v$version.metadata.json")
    }
  }

  def readMetadataFile(path: String): String = MetadataFiles.read(path)

  def deleteMetadataBefore(name: String, beforeVersion: Int): Unit = {
    val dir = Paths.get(MetadataFiles.stripScheme(s"${tableLocation(name)}/metadata"))
    if (Files.isDirectory(dir)) {
      val st = Files.list(dir)
      try st.forEach { p =>
        val v = SqlCatalog.versionPattern.findFirstMatchIn(p.getFileName.toString)
        if (v.exists(_.group(1).toInt < beforeVersion)) Files.deleteIfExists(p)
      } finally st.close() // runs after every commit — must not leak fds
    }
  }

  // ------------------------------------------------------- namespace surface
  /** Namespace CRUD over `iceberg_namespace_properties` (reference
    * `sql.go:536-823`): a namespace exists while it has at least one
    * property row; empty creates record the reference's `exists` marker.
    */
  def createNamespace(ns: String, props: Map[String, String] = Map.empty): Unit = {
    if (namespaceExists(ns))
      throw new IllegalStateException(s"namespace $ns already exists")
    val all = if (props.isEmpty) Map("exists" -> "true") else props
    withConn { c => insertProps(c, ns, all) }
  }

  def namespaceExists(ns: String): Boolean = withConn { c =>
    val st = c.prepareStatement(
      "SELECT 1 FROM iceberg_namespace_properties WHERE catalog_name = ? " +
        "AND namespace = ? FETCH FIRST 1 ROWS ONLY")
    st.setString(1, catalogName); st.setString(2, ns)
    st.executeQuery().next()
  }

  def listNamespaces(): Seq[String] = withConn { c =>
    val st = c.prepareStatement(
      "SELECT DISTINCT namespace FROM iceberg_namespace_properties " +
        "WHERE catalog_name = ?")
    st.setString(1, catalogName)
    val rs = st.executeQuery()
    val out = Seq.newBuilder[String]
    while (rs.next()) out += rs.getString(1)
    out.result().sorted
  }

  def namespaceProperties(ns: String): Map[String, String] = withConn { c =>
    val st = c.prepareStatement(
      "SELECT property_key, property_value FROM iceberg_namespace_properties " +
        "WHERE catalog_name = ? AND namespace = ?")
    st.setString(1, catalogName); st.setString(2, ns)
    val rs = st.executeQuery()
    val out = Map.newBuilder[String, String]
    while (rs.next()) out += rs.getString(1) -> rs.getString(2)
    out.result()
  }

  /** Reference `UpdateNamespaceProperties` (`sql.go:755-818`): removals
    * delete rows, updates upsert rows, in one transaction.
    */
  def updateNamespaceProperties(ns: String, removals: Seq[String],
      updates: Map[String, String]): Unit = withConn { c =>
    // reject unknown namespaces instead of materializing a typo as a new
    // namespace (property rows imply existence in this layout; REST and
    // the reference both 404 here)
    require(namespaceExists(ns), s"no such namespace: $ns")
    c.setAutoCommit(false)
    try {
      val del = c.prepareStatement(
        "DELETE FROM iceberg_namespace_properties WHERE catalog_name = ? " +
          "AND namespace = ? AND property_key = ?")
      (removals ++ updates.keys).foreach { k =>
        del.setString(1, catalogName); del.setString(2, ns); del.setString(3, k)
        del.executeUpdate()
      }
      insertProps(c, ns, updates)
      c.commit()
    } catch { case e: Throwable => c.rollback(); throw e }
    finally c.setAutoCommit(true)
  }

  /** Refuses while tables remain, like the reference (`sql.go:576-618`). */
  def dropNamespace(ns: String): Unit = {
    val hasTables = withConn { c =>
      val st = c.prepareStatement(
        "SELECT 1 FROM iceberg_tables WHERE catalog_name = ? AND " +
          "table_namespace = ? FETCH FIRST 1 ROWS ONLY")
      st.setString(1, catalogName); st.setString(2, ns)
      st.executeQuery().next()
    }
    if (hasTables)
      throw new IllegalStateException(s"namespace $ns is not empty")
    withConn { c =>
      val st = c.prepareStatement(
        "DELETE FROM iceberg_namespace_properties WHERE catalog_name = ? " +
          "AND namespace = ?")
      st.setString(1, catalogName); st.setString(2, ns)
      st.executeUpdate()
    }
    ()
  }

  // --------------------------------------------------------------- plumbing
  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(jdbcUrl)
    try f(c) finally c.close()
  }

  private def insertProps(c: Connection, ns: String,
      props: Map[String, String]): Unit = {
    val ins = c.prepareStatement(
      "INSERT INTO iceberg_namespace_properties (catalog_name, namespace, " +
        "property_key, property_value) VALUES (?, ?, ?, ?)")
    props.foreach { case (k, v) =>
      ins.setString(1, catalogName); ins.setString(2, ns)
      ins.setString(3, k); ins.setString(4, v)
      ins.executeUpdate()
    }
  }

  private def requireNamespace(ns: String): Unit =
    if (ns != "default" && !namespaceExists(ns))
      throw new IllegalArgumentException(s"no such namespace: $ns")

  private def currentPointer(name: String): Option[String] = {
    val (ns, t) = split(name)
    withConn { c =>
      val st = c.prepareStatement(
        "SELECT metadata_location FROM iceberg_tables WHERE catalog_name = ? " +
          "AND table_namespace = ? AND table_name = ? AND iceberg_type = 'TABLE'")
      st.setString(1, catalogName); st.setString(2, ns); st.setString(3, t)
      val rs = st.executeQuery()
      if (rs.next()) Option(rs.getString(1)) else None
    }
  }

  private def pointerOrFail(name: String): String =
    currentPointer(name).getOrElse(
      throw new java.io.FileNotFoundException(s"no such table: $name"))

  /** Attempt-unique metadata file: racers never contend on the filesystem,
    * only on the DB row, and a loser's file is an orphan for maintenance.
    */
  private def writeMetadataFile(metadata: TableMetadata, version: Int,
      current: Option[String] = None): String = {
    val dir = current match {
      case Some(loc) => loc.substring(0, loc.lastIndexOf('/'))
      case None => s"${metadata.location}/metadata"
    }
    Files.createDirectories(Paths.get(MetadataFiles.stripScheme(dir)))
    val file = f"$dir/v$version%d-${java.util.UUID.randomUUID().toString.take(8)}.metadata.json"
    Files.write(Paths.get(MetadataFiles.stripScheme(file)),
      TableMetadataJson.write(metadata).getBytes(StandardCharsets.UTF_8))
    file
  }

  private def ensureCatalogTables(): Unit = withConn { c =>
    def createIfAbsent(ddl: String): Unit =
      try { c.createStatement().executeUpdate(ddl); () }
      catch { case e: SQLException if isTableExists(e) => }
    dialect.catalogDdl.foreach(createIfAbsent)
  }

  private def isDuplicateKey(e: SQLException): Boolean = dialect.isDuplicateKey(e)
  private def isTableExists(e: SQLException): Boolean = dialect.isTableExists(e)
}

/** Per-database DDL + error-classification seam (reference `sql.go:34-60`
  * targets postgres/mysql/mssql/oracle through its bun dialects). The DML —
  * INSERT-wins create and CAS UPDATE commit — is identical ANSI across
  * dialects; only table bootstrap and SQLSTATE mapping vary, so a
  * production deployment differs from the Derby suite by a JDBC URL (plus
  * driver jar) only.
  */
sealed trait SqlDialect {
  def name: String
  /** Bootstrap DDL for the two catalog tables. */
  def catalogDdl: Seq[String]
  /** Unique-constraint violation (the create/commit race loser). */
  def isDuplicateKey(e: SQLException): Boolean
  /** "Table already exists" during bootstrap DDL. */
  def isTableExists(e: SQLException): Boolean
}

object SqlDialect {
  private val TablesColumns =
    "catalog_name VARCHAR(255) NOT NULL, " +
      "table_namespace VARCHAR(255) NOT NULL, " +
      "table_name VARCHAR(255) NOT NULL, " +
      "iceberg_type VARCHAR(8), " +
      "metadata_location VARCHAR(1000), " +
      "previous_metadata_location VARCHAR(1000), " +
      "PRIMARY KEY (catalog_name, table_namespace, table_name)"
  private val NsPropsColumns =
    "catalog_name VARCHAR(255) NOT NULL, " +
      "namespace VARCHAR(255) NOT NULL, " +
      "property_key VARCHAR(255) NOT NULL, " +
      "property_value VARCHAR(1000), " +
      "PRIMARY KEY (catalog_name, namespace, property_key)"

  /** Plain ANSI (Derby and anything else without a specific dialect):
    * bare CREATE TABLE, existence surfacing as an exception the classifier
    * absorbs (Derby X0Y32; ANSI 42xxx covers other databases).
    */
  case object Ansi extends SqlDialect {
    val name = "ansi"
    val catalogDdl: Seq[String] = Seq(
      s"CREATE TABLE iceberg_tables ($TablesColumns)",
      s"CREATE TABLE iceberg_namespace_properties ($NsPropsColumns)")
    def isDuplicateKey(e: SQLException): Boolean =
      e.getSQLState == "23505" ||
        e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException]
    def isTableExists(e: SQLException): Boolean =
      e.getSQLState == "X0Y32" || Option(e.getSQLState).exists(_.startsWith("42"))
  }

  /** PostgreSQL — the reference's primary production target: idempotent
    * IF NOT EXISTS bootstrap, 23505 duplicate key, 42P07 duplicate table.
    */
  case object Postgres extends SqlDialect {
    val name = "postgres"
    val catalogDdl: Seq[String] = Seq(
      s"CREATE TABLE IF NOT EXISTS iceberg_tables ($TablesColumns)",
      s"CREATE TABLE IF NOT EXISTS iceberg_namespace_properties ($NsPropsColumns)")
    def isDuplicateKey(e: SQLException): Boolean = e.getSQLState == "23505"
    // 42P07 = duplicate_table; 23505 also appears when two sessions race
    // the same CREATE TABLE IF NOT EXISTS (the unique violation surfaces on
    // the pg_class/pg_type catalog index) — both are benign bootstrap races
    def isTableExists(e: SQLException): Boolean =
      e.getSQLState == "42P07" || e.getSQLState == "23505"
  }

  /** Dialect from the JDBC URL scheme (reference `sql.go:34-60`). */
  def fromUrl(jdbcUrl: String): SqlDialect =
    if (jdbcUrl.startsWith("jdbc:postgresql:")) Postgres else Ansi

  /** A dialect's ERROR CLASSIFICATION grafted onto plain-ANSI bootstrap
    * DDL. This is how the Postgres SQLSTATE table is proven against a real
    * database without a pg server in the container: embedded Derby parses
    * the ANSI DDL and raises the same 23505 duplicate-key state Postgres
    * does, so the pg classifiers drive a full catalog lifecycle for real
    * (SqlCatalogSpec) — only the `IF NOT EXISTS` bootstrap, which Derby
    * cannot parse, is substituted.
    */
  def withAnsiBootstrap(d: SqlDialect): SqlDialect = new SqlDialect {
    val name = s"${d.name}+ansi-ddl"
    val catalogDdl: Seq[String] = Ansi.catalogDdl
    def isDuplicateKey(e: SQLException): Boolean = d.isDuplicateKey(e)
    // ANSI bootstrap DDL raises ANSI existence errors (Derby X0Y32) on
    // re-open, which the grafted dialect's own table may not classify —
    // absorbing either set keeps reopening an existing database working
    def isTableExists(e: SQLException): Boolean =
      d.isTableExists(e) || Ansi.isTableExists(e)
  }
}

object SqlCatalog {
  private[meta] val versionPattern = """v(\d+)-[0-9a-f]+\.metadata\.json""".r

  private[meta] def versionOf(metadataLocation: String): Int =
    versionPattern.findFirstMatchIn(metadataLocation)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"unversioned metadata location: $metadataLocation"))

  @volatile private var driverLoaded = false
  private[meta] def ensureDriver(jdbcUrl: String): Unit =
    // Derby's embedded driver needs an explicit load (and its log routed out
    // of the working tree); other databases' drivers register through the
    // JDBC SPI when their jar is on the classpath
    if (jdbcUrl.startsWith("jdbc:derby:") && !driverLoaded) synchronized {
      if (!driverLoaded) {
        if (System.getProperty("derby.stream.error.file") == null)
          System.setProperty("derby.stream.error.file",
            s"${System.getProperty("java.io.tmpdir")}/graft-derby.log")
        Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        driverLoaded = true
      }
    }
}

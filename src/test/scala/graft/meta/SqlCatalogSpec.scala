package graft.meta

import java.nio.file.Files
import java.util.concurrent.CountDownLatch

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.table.IceTable

/** The JDBC catalog (reference `catalog/sql/sql.go`) against embedded Derby:
  * the same create/append/scan/CAS/rename lifecycle as every other Catalog,
  * plus the row-level CAS race and the namespace-properties surface.
  */
class SqlCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  private def newCatalog(): SqlCatalog = {
    val dir = Files.createTempDirectory("graft-sql").toString
    new SqlCatalog(s"jdbc:derby:$dir/db;create=true", s"$dir/warehouse")
  }

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("sql-catalog-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("SQL catalog: create/append/scan/CAS/rename/drop over JDBC") {
    val cat = newCatalog()
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val t = IceTable.create(cat, "sql_region", SchemaConv.fromSpark(region.schema))
    t.append(region)
    assert(t.scan(spark).count() == region.count())
    assert(cat.listTables() == Seq("sql_region"))
    assert(cat.tableExists("sql_region") && !cat.tableExists("nope"))
    assertThrows[IllegalStateException](
      IceTable.create(cat, "sql_region", SchemaConv.fromSpark(region.schema)))

    // reload round-trips through the DB pointer and the FS metadata file
    val reloaded = IceTable.load(cat, "sql_region")
    assert(reloaded.metadata.currentSnapshotId == t.metadata.currentSnapshotId)

    // stale handle: CAS update misses → conflict → refresh → retry
    val t2 = IceTable.load(cat, "sql_region")
    t.append(region.limit(2))
    t2.append(region.limit(1))
    assert(IceTable.load(cat, "sql_region").scan(spark).count() == region.count() + 3)
    // a raw stale commit (no retry loop) surfaces the conflict
    assertThrows[CommitConflictException](cat.commit("sql_region", 1, t.metadata))

    // rename moves the identifier row; location and files stay
    cat.renameTable("sql_region", "sql_region2")
    assert(!cat.tableExists("sql_region") && cat.tableExists("sql_region2"))
    assert(IceTable.load(cat, "sql_region2").scan(spark).count() == region.count() + 3)
    assertThrows[IllegalArgumentException](cat.renameTable("sql_region", "x"))
    IceTable.create(cat, "other", SchemaConv.fromSpark(region.schema))
    assertThrows[CommitConflictException](cat.renameTable("sql_region2", "other"))

    // delete-after-commit maintenance: old versions reclaimed, current kept
    val keepFrom = cat.currentVersion("sql_region2")
    cat.deleteMetadataBefore("sql_region2", keepFrom)
    assert(IceTable.load(cat, "sql_region2").scan(spark).count() == region.count() + 3)

    cat.dropTable("sql_region2")
    cat.dropTable("other")
    assert(cat.listTables().isEmpty)
  }

  test("SQL catalog: two concurrent CAS commits — the UPDATE admits exactly one") {
    val cat = newCatalog()
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val t = IceTable.create(cat, "race", SchemaConv.fromSpark(region.schema))
    t.append(region)
    val base = cat.load("race")
    val v = cat.currentVersion("race")

    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        start.await()
        try { cat.commit("race", v, base); results.add(true) }
        catch { case _: CommitConflictException => results.add(false) }
      })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join())
    assert(results.size() == 2)
    assert(results.toArray.count(_ == true.asInstanceOf[AnyRef]) == 1)
    assert(cat.currentVersion("race") == v + 1)
  }

  test("SQL catalog: staged create commits via the insert race; one of two wins") {
    val cat = newCatalog()
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val schema = SchemaConv.fromSpark(region.schema)
    val a = IceTable.stageCreate(cat, "staged", schema)
    val b = IceTable.stageCreate(cat, "staged", schema)
    assert(!cat.tableExists("staged"))
    val winner = a.commit()
    assertThrows[CommitConflictException](b.commit())
    assert(cat.load("staged").tableUuid == winner.metadata.tableUuid)
    winner.append(region)
    assert(winner.scan(spark).count() == region.count())
  }

  test("SQL catalog: namespaces — create/list/properties/update/drop") {
    val cat = newCatalog()
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    cat.createNamespace("raw", Map("owner" -> "graft"))
    assertThrows[IllegalStateException](cat.createNamespace("raw"))
    assert(cat.listNamespaces() == Seq("raw"))
    assert(cat.namespaceProperties("raw") == Map("owner" -> "graft"))
    cat.updateNamespaceProperties("raw", removals = Seq("owner"),
      updates = Map("retention" -> "30d"))
    assert(cat.namespaceProperties("raw") == Map("retention" -> "30d"))

    // tables are namespaced; creating into a missing namespace is rejected
    assertThrows[IllegalArgumentException](
      IceTable.create(cat, "nope.t", SchemaConv.fromSpark(region.schema)))
    val t = IceTable.create(cat, "raw.region", SchemaConv.fromSpark(region.schema))
    t.append(region)
    assert(cat.listTables() == Seq("raw.region"))
    assert(IceTable.load(cat, "raw.region").scan(spark).count() == region.count())

    // a namespace with tables refuses to drop; emptied, it drops
    assertThrows[IllegalStateException](cat.dropNamespace("raw"))
    cat.dropTable("raw.region")
    cat.dropNamespace("raw")
    assert(cat.listNamespaces().isEmpty)
  }

  test("SQL dialect seam: URL picks the dialect, postgres differs only in bootstrap + SQLSTATEs") {
    import java.sql.SQLException
    assert(SqlDialect.fromUrl("jdbc:postgresql://db:5432/ice") == SqlDialect.Postgres)
    assert(SqlDialect.fromUrl("jdbc:derby:/tmp/x;create=true") == SqlDialect.Ansi)
    assert(SqlDialect.fromUrl("jdbc:h2:mem:x") == SqlDialect.Ansi)
    // the DML (INSERT-wins create, CAS UPDATE) is shared; the dialects may
    // differ only in bootstrap DDL and error classification. Postgres
    // bootstraps idempotently and classifies its specific SQLSTATEs
    assert(SqlDialect.Postgres.catalogDdl.forall(_.contains("IF NOT EXISTS")))
    assert(SqlDialect.Ansi.catalogDdl.forall(!_.contains("IF NOT EXISTS")))
    // column definitions are identical — same ANSI schema either way
    def cols(ddl: String) = ddl.dropWhile(_ != '(')
    assert(SqlDialect.Postgres.catalogDdl.map(cols) == SqlDialect.Ansi.catalogDdl.map(cols))
    assert(SqlDialect.Postgres.isDuplicateKey(new SQLException("dup", "23505")))
    assert(SqlDialect.Postgres.isTableExists(new SQLException("exists", "42P07")))
    // 23505 during bootstrap = two sessions racing the same IF NOT EXISTS
    // (pg catalog-index unique violation) — absorbed like 42P07
    assert(SqlDialect.Postgres.isTableExists(new SQLException("dup", "23505")))
    assert(!SqlDialect.Postgres.isTableExists(new SQLException("other", "55000")))
    // a Derby-backed catalog built with an explicit dialect override still
    // bootstraps and serves the full SPI (the seam changes nothing on ANSI)
    val cat = new SqlCatalog(
      s"jdbc:derby:${java.nio.file.Files.createTempDirectory("graft-dialect")}/db;create=true",
      java.nio.file.Files.createTempDirectory("graft-dialect-wh").toString,
      dialectOverride = Some(SqlDialect.Ansi))
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val t = IceTable.create(cat, "region", SchemaConv.fromSpark(region.schema))
    t.append(region)
    assert(IceTable.load(cat, "region").scan(spark).count() == region.count())
  }

  test("postgres dialect classification drives the full lifecycle on Derby") {
    // Postgres minus its IF NOT EXISTS bootstrap (Derby can't parse it):
    // every error-classification decision below is the PG table judging a
    // real database's SQLSTATEs — Derby raises the same 23505 on duplicate
    // keys — so the seam's behavior, not just its existence, is pinned
    val pg = SqlDialect.withAnsiBootstrap(SqlDialect.Postgres)
    assert(pg.catalogDdl == SqlDialect.Ansi.catalogDdl)
    assert(pg.isDuplicateKey(new java.sql.SQLException("dup", "23505")))
    assert(!pg.isDuplicateKey(new java.sql.SQLException("x", "X0Y32")))
    val dir = Files.createTempDirectory("graft-pg-derby").toString
    val cat = new SqlCatalog(s"jdbc:derby:$dir/db;create=true",
      s"$dir/warehouse", dialectOverride = Some(pg))
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val schema = SchemaConv.fromSpark(region.schema)

    // create + duplicate create: the loser is classified via pg 23505
    val t = IceTable.create(cat, "pg_region", schema)
    t.append(region)
    assertThrows[IllegalStateException](IceTable.create(cat, "pg_region", schema))

    // staged-create insert race: one commit wins, the other's duplicate-key
    // SQLException is classified into a CommitConflictException
    val a = IceTable.stageCreate(cat, "pg_staged", schema)
    val b = IceTable.stageCreate(cat, "pg_staged", schema)
    a.commit()
    assertThrows[CommitConflictException](b.commit())

    // CAS commit race: two writers from the same version, one advances
    val base = cat.load("pg_region")
    val v = cat.currentVersion("pg_region")
    cat.commit("pg_region", v, base)
    assertThrows[CommitConflictException](cat.commit("pg_region", v, base))
    assert(cat.currentVersion("pg_region") == v + 1)

    // namespaces: duplicate create is the same classified insert race
    cat.createNamespace("raw", Map("owner" -> "graft"))
    assertThrows[IllegalStateException](cat.createNamespace("raw"))
    cat.dropNamespace("raw")

    // the table read back through the catalog is intact
    assert(IceTable.load(cat, "pg_region").scan(spark).count() == region.count())

    // REOPEN the same database: bootstrap hits Derby's X0Y32 existing-table
    // errors, which the grafted classifier must absorb alongside pg's own
    // states — a production catalog is reopened far more often than created
    val reopened = new SqlCatalog(s"jdbc:derby:$dir/db",
      s"$dir/warehouse", dialectOverride = Some(pg))
    assert(reopened.listTables().sorted == Seq("pg_region", "pg_staged"))

    cat.dropTable("pg_region")
    cat.dropTable("pg_staged")
    assert(cat.listTables().isEmpty)
  }
}

package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.table.IceTable

/** The Catalog trait carries the full commit protocol through a SECOND
  * implementation: the in-memory registry (reference `catalog/registry.go`)
  * drives the same create/append/scan/CAS/rename lifecycle as FileCatalog.
  */
class CatalogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("catalog-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("in-memory catalog: create/append/scan/CAS/rename/drop") {
    val cat = new InMemoryCatalog(Files.createTempDirectory("graft-mem").toString)
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val t = IceTable.create(cat, "mem_region", SchemaConv.fromSpark(region.schema))
    t.append(region)
    assert(t.scan(spark).count() == region.count())
    assert(cat.listTables() == Seq("mem_region"))

    // stale handle loses the CAS, then rebases like FileCatalog
    val t2 = IceTable.load(cat, "mem_region")
    t.append(region.limit(2))
    t2.append(region.limit(1)) // conflict → refresh → retry
    assert(IceTable.load(cat, "mem_region").scan(spark).count() == region.count() + 3)

    cat.renameTable("mem_region", "mem_region2")
    assert(!cat.tableExists("mem_region") && cat.tableExists("mem_region2"))
    assert(IceTable.load(cat, "mem_region2").scan(spark).count() == region.count() + 3)
    cat.dropTable("mem_region2")
    assert(cat.listTables().isEmpty)
  }

  test("REST catalog: config/create/load/append/CAS-conflict/rename/drop over HTTP") {
    val wh = Files.createTempDirectory("graft-rest").toString
    val server = new RestStubServer(wh)
    try {
      val cat = new RestCatalog(server.uri)
      // config advertised by the server at construction
      assert(cat.config.get("warehouse").contains(wh))
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      val t = IceTable.create(cat, "rest_region", SchemaConv.fromSpark(region.schema))
      t.append(region)
      assert(t.scan(spark).count() == region.count())
      assert(cat.listTables() == Seq("rest_region"))
      assert(cat.tableExists("rest_region") && !cat.tableExists("nope"))
      // duplicate create → 409 AlreadyExists
      assertThrows[IllegalStateException](
        IceTable.create(cat, "rest_region", SchemaConv.fromSpark(region.schema)))
      // load round-trips server JSON + the FS metadata file it persisted
      val reloaded = IceTable.load(cat, "rest_region")
      assert(reloaded.metadata.currentSnapshotId == t.metadata.currentSnapshotId)
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
        s"$wh/rest_region/metadata/v2.metadata.json")))
      // stale handle: 409 from the server → conflict → refresh → retry
      val t2 = IceTable.load(cat, "rest_region")
      t.append(region.limit(2))
      t2.append(region.limit(1))
      assert(IceTable.load(cat, "rest_region").scan(spark).count() == region.count() + 3)
      // a raw stale commit (no retry loop) surfaces the 409 as a conflict
      assertThrows[CommitConflictException](
        cat.commit("rest_region", 1, t.metadata))
      // a violated requirement rejects server-side before any version moves
      val vBefore = cat.currentVersion("rest_region")
      assertThrows[CommitConflictException](
        cat.commitWith("rest_region", vBefore, cat.load("rest_region"),
          Seq(graft.table.AssertTableUUID("not-the-uuid"))))
      assert(cat.currentVersion("rest_region") == vBefore)
      // rename moves the identifier; location and files stay
      cat.renameTable("rest_region", "rest_region2")
      assert(!cat.tableExists("rest_region") && cat.tableExists("rest_region2"))
      assert(IceTable.load(cat, "rest_region2").scan(spark).count() == region.count() + 3)
      // rename conflicts mirror rest_test.go: missing source / existing destination
      assertThrows[IllegalArgumentException](cat.renameTable("rest_region", "x"))
      IceTable.create(cat, "other", SchemaConv.fromSpark(region.schema))
      assertThrows[CommitConflictException](cat.renameTable("rest_region2", "other"))
      cat.dropTable("rest_region2")
      cat.dropTable("other")
      assert(cat.listTables().isEmpty)
    } finally server.stop()
  }

  test("REST catalog: staged create commits via assert-create; one of two racers wins") {
    val wh = Files.createTempDirectory("graft-rest-staged").toString
    val server = new RestStubServer(wh)
    try {
      val cat = new RestCatalog(server.uri)
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      val schema = SchemaConv.fromSpark(region.schema)
      val a = IceTable.stageCreate(cat, "staged", schema)
      val b = IceTable.stageCreate(cat, "staged", schema)
      assert(!cat.tableExists("staged")) // nothing visible before commit
      val winner = a.commit()
      assertThrows[CommitConflictException](b.commit())
      assert(cat.load("staged").tableUuid == winner.metadata.tableUuid)
      winner.append(region)
      assert(winner.scan(spark).count() == region.count())
    } finally server.stop()
  }

  test("REST catalog: bearer-token auth is sent and enforced") {
    val wh = Files.createTempDirectory("graft-rest-auth").toString
    val server = new RestStubServer(wh, requiredToken = Some("sesame"))
    try {
      // missing token: the construction-time config fetch is rejected
      assertThrows[java.io.IOException](new RestCatalog(server.uri))
      val cat = new RestCatalog(server.uri, token = Some("sesame"))
      assert(cat.config.get("warehouse").contains(wh))
      assert(cat.listTables().isEmpty)
    } finally server.stop()
  }

  test("REST catalog: OAuth2 client-credentials flow fetches, refreshes, and survives revocation") {
    val wh = Files.createTempDirectory("graft-rest-oauth").toString
    val server = new RestStubServer(wh,
      oauthCredential = Some(("cid", "shhh")), tokenTtlMs = 3600000L)
    try {
      // wrong secret: token endpoint answers the RFC 6749 error shape and
      // construction fails loudly
      val bad = intercept[java.io.IOException](
        new RestCatalog(server.uri, credential = Some("cid:wrong")))
      assert(bad.getMessage.contains("invalid_client"))
      // no token at all: the API itself is 401-guarded
      assertThrows[java.io.IOException](new RestCatalog(server.uri))

      val cat = new RestCatalog(server.uri, credential = Some("cid:shhh"))
      assert(cat.config.get("warehouse").contains(wh))
      assert(cat.listTables().isEmpty)
      assert(server.tokenIssues.get() === 1L,
        "exactly one token issued for the successful session")
      // the token is cached across calls — no refetch per request
      cat.listTables(); cat.listTables()
      assert(server.tokenIssues.get() === 1L)

      // server-side revocation: next call sees 401, refetches ONCE, retries
      server.revokeTokens()
      assert(cat.listTables().isEmpty)
      assert(server.tokenIssues.get() === 2L, "revocation must trigger exactly one refetch")

      // full table lifecycle through the oauth-authenticated session
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      val t = IceTable.create(cat, "oauth_region", SchemaConv.fromSpark(region.schema))
      t.append(region)
      assert(t.scan(spark).count() === region.count())
    } finally server.stop()
  }

  test("REST catalog: short-lived tokens are proactively refreshed before expiry") {
    val wh = Files.createTempDirectory("graft-rest-ttl").toString
    // TTL below the client's 30 s refresh margin → every request window is
    // already past (expiry - margin), so the client refetches per call
    // instead of ever sending a stale token
    val server = new RestStubServer(wh,
      oauthCredential = Some(("cid", "shhh")), tokenTtlMs = 1000L)
    try {
      val cat = new RestCatalog(server.uri, credential = Some("cid:shhh"))
      val after = server.tokenIssues.get()
      cat.listTables()
      assert(server.tokenIssues.get() > after,
        "a token inside the refresh margin must be refetched proactively")
      assert(cat.listTables().isEmpty, "requests keep succeeding across refreshes")
    } finally server.stop()
  }

  test("register adopts an existing table without rewriting its files (rest_test.go:1324+)") {
    val whA = Files.createTempDirectory("graft-reg-src").toString
    val srcCat = new FileCatalog(whA)
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val src = IceTable.create(srcCat, "source_region", SchemaConv.fromSpark(region.schema))
    src.append(region)
    val srcMetaLoc = srcCat.metadataLocation("source_region",
      srcCat.currentVersion("source_region"))

    // REST register: the dedicated route adopts the metadata file as-is
    val server = new RestStubServer(Files.createTempDirectory("graft-reg-rest").toString)
    try {
      val rest = new RestCatalog(server.uri)
      val adopted = rest.registerTable("adopted", srcMetaLoc)
      assert(adopted.tableUuid == src.metadata.tableUuid)
      assert(IceTable.load(rest, "adopted").scan(spark).count() == region.count())
      // 409: identifier taken
      assertThrows[IllegalStateException](rest.registerTable("adopted", srcMetaLoc))
      // 404: unreadable metadata location
      assertThrows[java.io.FileNotFoundException](
        rest.registerTable("adopted2", s"$whA/nope/metadata/v1.metadata.json"))
      // committing on top continues the shared table's version numbering
      // instead of clobbering v1/v2 history written by the source catalog
      IceTable.load(rest, "adopted").append(region.limit(1))
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
        s"$whA/source_region/metadata/v3.metadata.json")))
      assert(TableMetadataJson.read(srcCat.readMetadataFile(srcMetaLoc))
        .currentSnapshotId == src.metadata.currentSnapshotId) // v2 untouched
      assert(IceTable.load(rest, "adopted").scan(spark).count() == region.count() + 1)
    } finally server.stop()

    // default (trait) register: a second FileCatalog adopts the same table
    val dstCat = new FileCatalog(Files.createTempDirectory("graft-reg-dst").toString)
    dstCat.registerTable("mirrored", srcMetaLoc)
    assert(IceTable.load(dstCat, "mirrored").scan(spark).count() == region.count())
    assertThrows[IllegalStateException](dstCat.registerTable("mirrored", srcMetaLoc))
  }

  test("REST namespaces: CRUD + properties update summary (catalog.go:111-125)") {
    val server = new RestStubServer(Files.createTempDirectory("graft-rest-ns").toString)
    try {
      val cat = new RestCatalog(server.uri)
      assert(cat.listNamespaces() == Seq("graft")) // the default table namespace
      cat.createNamespace("prod.raw", Map("owner" -> "pipeline"))
      assert(cat.namespaceExists("prod.raw") && !cat.namespaceExists("nope"))
      assert(cat.listNamespaces() == Seq("graft", "prod.raw"))
      assertThrows[IllegalStateException](cat.createNamespace("prod.raw"))
      assert(cat.namespaceProperties("prod.raw") == Map("owner" -> "pipeline"))
      // update summary buckets: updated / removed / missing
      val (updated, removed, missing) = cat.updateNamespaceProperties("prod.raw",
        removals = Seq("owner", "ghost"), updates = Map("retention" -> "90d"))
      assert(updated == Seq("retention") && removed == Seq("owner")
        && missing == Seq("ghost"))
      assert(cat.namespaceProperties("prod.raw") == Map("retention" -> "90d"))
      cat.dropNamespace("prod.raw")
      assert(!cat.namespaceExists("prod.raw"))
      assertThrows[java.util.NoSuchElementException](cat.dropNamespace("prod.raw"))
      // a non-empty namespace refuses to drop
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      IceTable.create(cat, "t", SchemaConv.fromSpark(region.schema))
      assertThrows[IllegalStateException](cat.dropNamespace("graft"))
    } finally server.stop()
  }

  test("REST pagination: client follows unprompted next-page-token across all list routes") {
    // page size 2 forces the server to paginate every list response even
    // though the client never sends pageSize — the spec allows that, and a
    // client that ignores the token silently truncates the listing
    val server = new RestStubServer(
      Files.createTempDirectory("graft-rest-paged").toString, listPageSize = Some(2))
    try {
      val cat = new RestCatalog(server.uri)
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      val names = Seq("t_a", "t_b", "t_c", "t_d", "t_e")
      names.foreach(n => IceTable.create(cat, n, SchemaConv.fromSpark(region.schema)))
      assert(cat.listTables() == names, "paged table listing lost a page")
      (1 to 5).foreach(i => cat.createNamespace(s"ns$i"))
      assert(cat.listNamespaces() ==
        ("graft" +: (1 to 5).map(i => s"ns$i")).sorted,
        "paged namespace listing lost a page")
      region.createOrReplaceTempView("region_paged_src")
      (1 to 5).foreach(i => cat.createOrReplaceView(s"v$i",
        "SELECT r_regionkey FROM region_paged_src"))
      assert(cat.listViews() == (1 to 5).map(i => s"v$i"),
        "paged view listing lost a page")
    } finally server.stop()
  }

  test("REST pagination: a server that re-issues a page token fails loudly, not truncated") {
    val server = new RestStubServer(
      Files.createTempDirectory("graft-rest-loop").toString,
      listPageSize = Some(2), repeatPageToken = true)
    try {
      val cat = new RestCatalog(server.uri)
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      Seq("l_a", "l_b", "l_c").foreach(n =>
        IceTable.create(cat, n, SchemaConv.fromSpark(region.schema)))
      val e = intercept[IllegalStateException](cat.listTables())
      assert(e.getMessage.contains("re-issued page token"),
        s"expected loud pagination failure, got: ${e.getMessage}")
    } finally server.stop()
  }

  test("REST error bodies: spec ErrorModel type and code surface in client failures") {
    val server = new RestStubServer(Files.createTempDirectory("graft-rest-err").toString)
    try {
      val cat = new RestCatalog(server.uri)
      // stale expected-version commit → 409 whose CommitFailedException
      // type and code ride the conflict exception's message
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      val t = IceTable.create(cat, "conflict_t", SchemaConv.fromSpark(region.schema))
      val stale = cat.load("conflict_t")
      t.append(region.limit(1))
      val e409 = intercept[Exception](cat.commit("conflict_t", 1, stale))
      assert(e409.getMessage.contains("CommitFailedException")
        && e409.getMessage.contains("code 409"),
        s"commit conflict type/code swallowed: ${e409.getMessage}")
    } finally server.stop()
    // 401 with NotAuthorizedException body rides the generic-send failure
    val authed = new RestStubServer(
      Files.createTempDirectory("graft-rest-err2").toString,
      requiredToken = Some("sesame"))
    try {
      val e401 = intercept[java.io.IOException](
        new RestCatalog(authed.uri, token = Some("wrong")))
      assert(e401.getMessage.contains("NotAuthorizedException")
        && e401.getMessage.contains("code 401"),
        s"auth error type/code swallowed: ${e401.getMessage}")
    } finally authed.stop()
  }

  test("REST views: create/replace/list/load/drop, executed through Spark") {
    val server = new RestStubServer(Files.createTempDirectory("graft-rest-views").toString)
    try {
      val cat = new RestCatalog(server.uri)
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      region.createOrReplaceTempView("region_src")
      assert(cat.listViews().isEmpty && !cat.viewExists("top_regions"))
      val v1 = cat.createOrReplaceView("top_regions",
        "SELECT r_regionkey, r_name FROM region_src WHERE r_regionkey >= 2")
      assert(v1.versionId == 1)
      // replace appends a version; load returns the history, last = current
      val v2 = cat.createOrReplaceView("top_regions",
        "SELECT r_regionkey, r_name FROM region_src WHERE r_regionkey >= 3")
      assert(v2.versionId == 2)
      assert(cat.listViews() == Seq("top_regions") && cat.viewExists("top_regions"))
      val versions = cat.loadView("top_regions")
      assert(versions.map(_.versionId) == Seq(1, 2))
      // the current version's SQL runs through Catalyst like any view
      assert(spark.sql(versions.last.sql).count() ==
        region.where("r_regionkey >= 3").count())
      cat.dropView("top_regions")
      assert(!cat.viewExists("top_regions"))
      assertThrows[java.util.NoSuchElementException](cat.loadView("top_regions"))
      assertThrows[java.util.NoSuchElementException](cat.dropView("top_regions"))
    } finally server.stop()
  }

  test("catalog registry dispatches on type property and uri scheme (registry.go Load)") {
    assert(Seq("file", "http", "https", "jdbc", "memory", "rest", "sql")
      .forall(CatalogRegistry.registeredCatalogs.contains))
    // scheme dispatch: an http:// uri loads the REST catalog (rest.go:95)
    val server = new RestStubServer(Files.createTempDirectory("graft-regy").toString)
    try {
      val cat = CatalogRegistry.load("c1", Map("uri" -> server.uri))
      assert(cat.isInstanceOf[RestCatalog])
      val region = spark.read.parquet(s"$sfDir/region.parquet")
      val t = IceTable.create(cat, "r", SchemaConv.fromSpark(region.schema))
      t.append(region)
      assert(t.scan(spark).count() == region.count())
    } finally server.stop()
    // a jdbc: uri maps to the sql catalog like http maps to REST
    val root = Files.createTempDirectory("graft-regy-sql")
    val sqlCat = CatalogRegistry.load("c2", Map(
      "uri" -> s"jdbc:derby:$root/db;create=true", "warehouse" -> s"$root/wh"))
    assert(sqlCat.isInstanceOf[SqlCatalog])
    assert(sqlCat.listTables().isEmpty)
    // an explicit type property wins over the uri scheme
    val mem = CatalogRegistry.load("c3", Map("type" -> "memory",
      "warehouse" -> Files.createTempDirectory("graft-regy-mem").toString,
      "uri" -> "http://ignored"))
    assert(mem.isInstanceOf[InMemoryCatalog])
    // unregistered type (glue has no SDK here) and missing uri/type both fail
    assertThrows[IllegalArgumentException](
      CatalogRegistry.load("x", Map("type" -> "glue")))
    assertThrows[IllegalArgumentException](CatalogRegistry.load("x", Map.empty))
    // third-party registration round-trip (Register/Unregister)
    CatalogRegistry.register("custom",
      (_, p) => new InMemoryCatalog(p("warehouse")))
    assert(CatalogRegistry.load("x", Map("type" -> "custom", "warehouse" -> "/tmp/w"))
      .isInstanceOf[InMemoryCatalog])
    CatalogRegistry.unregister("custom")
    assertThrows[IllegalArgumentException](
      CatalogRegistry.load("x", Map("type" -> "custom", "warehouse" -> "/tmp/w")))
  }
}

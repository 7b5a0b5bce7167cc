package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.table.IceTable

/** Glue-protocol conformance over the in-process stub — the shape of the
  * reference's mocked `glue_test.go` surface: Parameters-based pointers
  * (`table_type`/`metadata_location`/`previous_metadata_location`),
  * VersionId optimistic locking, lowercased identifiers, copy-then-delete
  * rename with rollback, and the full IceTable lifecycle end-to-end.
  */
class GlueCatalogSpec extends AnyFunSuite with BeforeAndAfterAll {
  import GlueApi._

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("glue-catalog-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def freshCatalog(): (GlueStubService, GlueCatalog) = {
    val svc = new GlueStubService
    (svc, new GlueCatalog(svc, Files.createTempDirectory("graft-glue").toString))
  }

  test("glue catalog: create/append/scan/CAS-conflict/rename/drop lifecycle") {
    val (_, cat) = freshCatalog()
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val t = IceTable.create(cat, "glue_region", SchemaConv.fromSpark(region.schema))
    t.append(region)
    assert(t.scan(spark).count() == region.count())
    assert(cat.listTables() == Seq("glue_region"))

    // stale handle loses the VersionId CAS, then rebases and retries
    val t2 = IceTable.load(cat, "glue_region")
    t.append(region.limit(2))
    t2.append(region.limit(1))
    assert(IceTable.load(cat, "glue_region").scan(spark).count() == region.count() + 3)

    cat.renameTable("glue_region", "glue_region2")
    assert(!cat.tableExists("glue_region") && cat.tableExists("glue_region2"))
    assert(IceTable.load(cat, "glue_region2").scan(spark).count() == region.count() + 3)
    cat.dropTable("glue_region2")
    assert(cat.listTables().isEmpty)
  }

  test("pointers travel in Parameters with the previous location retained (glue.go:747-762)") {
    val (svc, cat) = freshCatalog()
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val t = IceTable.create(cat, "params_t", SchemaConv.fromSpark(region.schema))
    val p1 = svc.getTable("default", "params_t").parameters
    assert(p1(ParamTableType) == TableTypeIceberg)
    assert(p1(ParamMetadataLocation).endsWith("v1.metadata.json"))
    assert(!p1.contains(ParamPreviousMetadataLocation))
    t.append(region)
    val p2 = svc.getTable("default", "params_t").parameters
    assert(p2(ParamMetadataLocation).endsWith("v2.metadata.json"))
    assert(p2(ParamPreviousMetadataLocation) == p1(ParamMetadataLocation))
    assert(cat.currentVersion("params_t") == 2)
  }

  test("UpdateTable enforces the VersionId lock; stale writers conflict (glue.go:335-346)") {
    val (svc, cat) = freshCatalog()
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    IceTable.create(cat, "lock_t", SchemaConv.fromSpark(region.schema))
    val staleVersion = svc.getTable("default", "lock_t").versionId
    val meta = cat.load("lock_t")
    assert(cat.commit("lock_t", 1, meta) == 2)
    // direct stale UpdateTable → the AWS error shape
    intercept[ConcurrentModificationException] {
      svc.updateTable("default",
        GlueTableInput("lock_t", "EXTERNAL_TABLE", Map.empty, meta.location),
        staleVersion)
    }
    // SPI-level stale commit → CommitConflictException, pointer unmoved
    intercept[CommitConflictException] { cat.commit("lock_t", 1, meta) }
    assert(cat.currentVersion("lock_t") == 2)
  }

  test("identifiers are case-insensitive and stored lowercased (TestGlueGetTableCaseInsensitive)") {
    val (svc, cat) = freshCatalog()
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    IceTable.create(cat, "mixedcase", SchemaConv.fromSpark(region.schema))
    assert(svc.getTable("DEFAULT", "MixedCase").name == "mixedcase")
    assert(cat.tableExists("MIXEDCASE"))
    assert(cat.listTables() == Seq("mixedcase"))
  }

  test("rename copies then deletes, conflicts on a taken target, rolls back a failed delete (glue.go:390-448)") {
    val (svc, cat) = freshCatalog()
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    IceTable.create(cat, "src_t", SchemaConv.fromSpark(region.schema))
    IceTable.create(cat, "taken_t", SchemaConv.fromSpark(region.schema))
    intercept[CommitConflictException] { cat.renameTable("src_t", "taken_t") }
    assert(cat.tableExists("src_t"), "failed rename must leave the source intact")
    // rollback branch: the source vanishing mid-rename (delete fails) must
    // remove the half-created target (TestGlueRenameTable_DeleteTableFailureRollback)
    val racingDelete = new GlueApi {
      def createDatabase(n: String, p: Map[String, String]): Unit = svc.createDatabase(n, p)
      def getDatabase(n: String): GlueDatabase = svc.getDatabase(n)
      def getDatabases(): Seq[GlueDatabase] = svc.getDatabases()
      def deleteDatabase(n: String): Unit = svc.deleteDatabase(n)
      def createTable(db: String, in: GlueTableInput): Unit = svc.createTable(db, in)
      def getTable(db: String, n: String): GlueTable = svc.getTable(db, n)
      def getTables(db: String): Seq[GlueTable] = svc.getTables(db)
      def updateTable(db: String, in: GlueTableInput, v: String): Unit =
        svc.updateTable(db, in, v)
      def deleteTable(db: String, n: String): Unit =
        if (n == "src_t") throw new EntityNotFoundException("races away")
        else svc.deleteTable(db, n)
    }
    val racing = new GlueCatalog(racingDelete, cat.warehouse)
    intercept[IllegalArgumentException] { racing.renameTable("src_t", "dest_t") }
    assert(!cat.tableExists("dest_t"), "rolled-back rename must not leave the target")
  }

  test("registry resolves type=glue to the stub-backed catalog (registry seam)") {
    val wh = Files.createTempDirectory("graft-glue-reg").toString
    val cat = CatalogRegistry.load("g", Map("type" -> "glue", "warehouse" -> wh))
    assert(cat.isInstanceOf[GlueCatalog])
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val t = IceTable.create(cat, "reg_t", SchemaConv.fromSpark(region.schema))
    t.append(region)
    assert(t.scan(spark).count() == region.count())
  }
}

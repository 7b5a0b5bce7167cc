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
}

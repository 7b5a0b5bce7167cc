package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Predicates => P, _}
import graft.meta._

/** Manifest-stats aggregates ([[IceTable.statsAggregate]]): the answer
  * must come from metadata alone (proved by deleting the data files and
  * asking again), match a real scan while the data exists, and refuse
  * every case where file stats can't vouch for exactness — delete
  * content, missing bounds, non-primitive columns.
  */
class StatsAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var catalog: FileCatalog = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("stats-agg-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = new FileCatalog(Files.createTempDirectory("graft-statsagg").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")

  test("count/min/max match a real scan, then survive data-file removal") {
    val t = IceTable.create(catalog, "sa_basic", SchemaConv.fromSpark(lineitem.schema))
    t.append(lineitem.where("l_orderkey % 2 = 0"))
    t.append(lineitem.where("l_orderkey % 2 = 1"))
    val expect = lineitem.selectExpr("count(*)", "min(l_quantity)", "max(l_quantity)")
      .collect().head
    val (rows, mm) = t.statsAggregate(Seq("l_quantity"))
    assert(rows === expect.getLong(0))
    assert(mm("l_quantity") === ((expect.getDouble(1), expect.getDouble(2))))

    // the proof of metadata-only: remove every data file and ask again
    val dataDir = new java.io.File(
      s"${t.location.stripPrefix("file:")}/data")
    assert(dataDir.exists)
    org.apache.commons.io.FileUtils.deleteDirectory(dataDir)
    val (rows2, mm2) = t.statsAggregate(Seq("l_quantity"))
    assert(rows2 === rows && mm2 === mm)
  }

  test("timestamp bounds decode exactly") {
    val t = IceTable.create(catalog, "sa_ts", SchemaConv.fromSpark(lineitem.schema))
    t.append(lineitem)
    val expect = lineitem.selectExpr(
      "unix_micros(cast(min(l_shipdate) as timestamp))",
      "unix_micros(cast(max(l_shipdate) as timestamp))").collect().head
    val (_, mm) = t.statsAggregate(Seq("l_shipdate"))
    assert(mm("l_shipdate") === ((expect.getLong(0), expect.getLong(1))))
  }

  test("refused on delete content — counts would over-count") {
    val t = IceTable.create(catalog, "sa_mor", SchemaConv.fromSpark(lineitem.schema))
    t.append(lineitem)
    t.deleteWhere(spark, P.equalTo("l_returnflag", "R"))
    t.refresh()
    val e = intercept[IllegalStateException](t.statsAggregate(Seq("l_quantity")))
    assert(e.getMessage.contains("delete files"))
  }

  test("refused on string columns — truncated bounds are not exact extremes") {
    val t = IceTable.create(catalog, "sa_str", SchemaConv.fromSpark(lineitem.schema))
    t.append(lineitem)
    val e = intercept[IllegalStateException](t.statsAggregate(Seq("l_returnflag")))
    assert(e.getMessage.contains("exact-bounded primitives"))
  }
}

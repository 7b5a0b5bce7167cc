package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Predicates => P, _}
import graft.meta._
import graft.streaming.Ingest

/** Schema evolution (ID-based resolution over old files), partition
  * evolution (mixed-spec planning), and streaming ingest/incremental read.
  */
class EvolutionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var catalog: FileCatalog = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("evolution-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = new FileCatalog(Files.createTempDirectory("graft-evo").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("schema evolution: add + rename resolve by field ID over old files") {
    val t = IceTable.create(catalog, "nation_evo",
      SchemaConv.fromSpark(nation.schema))
    t.append(nation)
    // add a column, then append data that has it
    t.updateSchema().addColumn("population", IceLong).commit()
    assert(t.schema.findByName("population").exists(_.id == 4))
    val withPop = nation.withColumn("population",
      org.apache.spark.sql.functions.col("n_nationkey").cast("long") * 1000)
    t.append(withPop)
    val all = t.scan(spark)
    assert(all.count() == nation.count() * 2)
    // old files surface null for the added column
    assert(all.where("population IS NULL").count() == nation.count())
    assert(all.where("population IS NOT NULL").count() == nation.count())

    // rename keeps the field ID → old files still serve the column
    t.updateSchema().renameColumn("n_name", "nation_name").commit()
    val renamed = t.scan(spark, selected = Some(Seq("n_nationkey", "nation_name")))
    assert(renamed.where("nation_name IS NOT NULL").count() == nation.count() * 2)

    // old snapshots still read with their pinned schema
    val firstSnap = t.metadata.snapshots.minBy(_.sequenceNumber)
    val old = t.newScan(snapshotId = Some(firstSnap.snapshotId)).toDF(spark)
    assert(old.columns.contains("n_name") && !old.columns.contains("population"))

    // drop hides the column going forward
    t.updateSchema().dropColumn("population").commit()
    assert(!t.scan(spark).columns.contains("population"))
  }

  test("partition evolution: old and new spec manifests plan together") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val t = IceTable.create(catalog, "li_specevo", SchemaConv.fromSpark(li.schema))
    t.append(li.where("l_quantity <= 25"))
    t.updateSpec(("l_shipdate", YearTransform, "ship_year"))
    assert(t.spec.specId == 1 && t.spec.fields.head.fieldId == 1000)
    t.append(li.where("l_quantity > 25"))
    assert(t.scan(spark).count() == li.count())
    // the year filter prunes within new-spec files and keeps all old-spec files
    val all = t.newScan().planFiles().size
    val pruned = t.newScan(P.gtEq("l_shipdate", "2001-01-01")).planFiles().size
    assert(pruned < all)
    val cnt = t.scan(spark, P.gtEq("l_shipdate", "2001-01-01")).count()
    assert(cnt == li.where("l_shipdate >= TIMESTAMP '2001-01-01'").count())
  }

  test("streaming ingest commits one snapshot per micro-batch; incremental read sees only new rows") {
    val src = Files.createTempDirectory("stream-src").toString
    val ckpt = Files.createTempDirectory("stream-ckpt").toString
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    val t = IceTable.create(catalog, "region_stream",
      SchemaConv.fromSpark(region.schema))

    region.where("r_regionkey < 2").write.mode("append").parquet(src)
    val stream1 = spark.readStream.schema(region.schema).parquet(src)
    val q1 = Ingest.appendStream(stream1, t, ckpt, Trigger.AvailableNow())
    q1.awaitTermination(60000)
    t.refresh()
    val snap1 = t.currentSnapshot.get
    assert(t.scan(spark).count() == region.where("r_regionkey < 2").count())

    region.where("r_regionkey >= 2").write.mode("append").parquet(src)
    val stream2 = spark.readStream.schema(region.schema).parquet(src)
    val q2 = Ingest.appendStream(stream2, t, ckpt, Trigger.AvailableNow())
    q2.awaitTermination(60000)
    t.refresh()
    assert(t.scan(spark).count() == region.count())
    assert(t.metadata.snapshots.size >= 2)

    val changes = Ingest.changesSince(spark, t, snap1.snapshotId)
    assert(changes.count() == region.where("r_regionkey >= 2").count())
  }
}

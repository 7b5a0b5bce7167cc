package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Predicates => P, _}
import graft.meta._
import graft.table._

/** CDC changelog ([[Ingest.changelogBetween]]): inserts and deletes in a
  * snapshot range reconstruct exactly, deletion-vector deletes surface the
  * same as parquet positional deletes, and unrepresentable ranges
  * (equality-delete overwrite, compaction) abort instead of lying.
  */
class ChangelogSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var catalog: FileCatalog = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("changelog-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = new FileCatalog(Files.createTempDirectory("graft-cdc-spec").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  private def changes(t: IceTable, since: Long) =
    Ingest.changelogSince(spark, t, since)
      .select("n_nationkey", "change_type", "change_seq")
      .collect().map(r => (r.getAs[Number](0).longValue(), r.getString(1),
        r.getAs[Number](2).longValue())).toSet

  test("append + positional delete reconstruct as I and D rows") {
    val t = IceTable.create(catalog, "cdc_basic", SchemaConv.fromSpark(nation.schema))
    val s1 = t.append(nation.where("n_nationkey < 10"))
    t.append(nation.where("n_nationkey >= 10"))          // seq 2 → I
    t.deleteWhere(spark, P.lt("n_nationkey", 3L))  // seq 3 → D
    t.refresh()
    val expect =
      (10L until 25L).map(k => (k, "I", 2L)).toSet ++
        (0L until 3L).map(k => (k, "D", 3L)).toSet
    assert(changes(t, s1.snapshotId) === expect)
  }

  test("deletion-vector deletes surface identically to parquet deletes") {
    val t = IceTable.create(catalog, "cdc_dv", SchemaConv.fromSpark(nation.schema),
      properties = Map("format-version" -> "3"))
    val s1 = t.append(nation.where("n_nationkey < 10"))
    t.deleteWhereDV(spark, P.lt("n_nationkey", 4L)) // seq 2 → D via DV
    t.refresh()
    assert(changes(t, s1.snapshotId) === (0L until 4L).map(k => (k, "D", 2L)).toSet)
  }

  test("equality-delete upsert in range aborts — no pre-image to emit") {
    val t = IceTable.create(catalog, "cdc_upsert", SchemaConv.fromSpark(nation.schema))
    val s1 = t.append(nation)
    t.upsert(spark, nation.where("n_nationkey = 0"), Seq("n_nationkey"))
    t.refresh()
    val e = intercept[IllegalStateException](
      Ingest.changelogSince(spark, t, s1.snapshotId).collect())
    assert(e.getMessage.contains("changelog cannot represent"))
  }

  test("compaction in range aborts — append diff is unreconstructable") {
    val t = IceTable.create(catalog, "cdc_compact", SchemaConv.fromSpark(nation.schema))
    val s1 = t.append(nation.where("n_nationkey < 5"))
    t.append(nation.where("n_nationkey >= 5"))
    t.compact(spark, targetFileCount = 1)
    t.refresh()
    val e = intercept[IllegalStateException](
      Ingest.changelogSince(spark, t, s1.snapshotId).collect())
    assert(e.getMessage.contains("changelog cannot represent"))
  }

  test("empty range yields an empty, correctly-shaped frame") {
    val t = IceTable.create(catalog, "cdc_empty", SchemaConv.fromSpark(nation.schema))
    val s1 = t.append(nation)
    val df = Ingest.changelogSince(spark, t, s1.snapshotId)
    assert(df.count() === 0)
    assert(df.columns.takeRight(2) === Array("change_type", "change_seq"))
  }
}

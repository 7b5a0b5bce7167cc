package graft.streaming

import java.nio.file.Files

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SchemaConv
import graft.meta.FileCatalog
import graft.table.IceTable

/** The appendStream replay guard's scoping contract
  * ([[Ingest.appendStream]]): replays of the SAME checkpoint lifetime are
  * suppressed exactly once, while a deleted-and-recreated checkpoint
  * directory — whose batch ids restart at 0 — is a NEW lifetime whose
  * batches must land. The second case was the r15 silent-data-loss hazard:
  * a path-only guard kept suppressing forever after a routine checkpoint
  * reset.
  */
class ReplayGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var catalog: FileCatalog = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("replay-guard-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = new FileCatalog(Files.createTempDirectory("replay-guard-spec").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def region = spark.read.parquet(s"$sfDir/region.parquet")

  test("recreated checkpoint directory starts a new guard scope: batches land again") {
    val ckpt = Files.createTempDirectory("replay-ckpt").toString
    val t = IceTable.create(catalog, "region_replay",
      SchemaConv.fromSpark(region.schema))

    // lifetime 1: two rows through batch 0 of checkpoint lifetime A
    val src1 = Files.createTempDirectory("replay-src1").toString
    region.where("r_regionkey < 2").write.mode("append").parquet(src1)
    val q1 = Ingest.appendStream(
      spark.readStream.schema(region.schema).parquet(src1), t, ckpt,
      Trigger.AvailableNow())
    assert(q1.awaitTermination(60000))
    t.refresh()
    assert(t.scan(spark).count() == 2)
    val qidA = t.currentSnapshot.get.summary(Ingest.StreamQueryIdKey)

    // operational reset: delete and recreate the SAME checkpoint path —
    // Spark assigns a fresh query id and restarts batch ids at 0
    FileUtils.deleteDirectory(new java.io.File(ckpt))
    Files.createDirectories(java.nio.file.Paths.get(ckpt))

    // lifetime 2: a fresh source dir (a reset checkpoint re-reads its
    // source from scratch; a new dir keeps the expectation additive)
    val src2 = Files.createTempDirectory("replay-src2").toString
    region.where("r_regionkey >= 2").write.mode("append").parquet(src2)
    val q2 = Ingest.appendStream(
      spark.readStream.schema(region.schema).parquet(src2), t, ckpt,
      Trigger.AvailableNow())
    assert(q2.awaitTermination(60000))
    t.refresh()

    // the path-only guard dropped these rows (batch 0 <= stamped epoch 0);
    // the lifetime-scoped guard commits them under a NEW query id
    assert(t.scan(spark).count() == region.count(),
      "batches of the recreated checkpoint lifetime were silently dropped")
    val qidB = t.currentSnapshot.get.summary(Ingest.StreamQueryIdKey)
    assert(qidA != qidB, "recreated checkpoint should carry a fresh query id")
  }

  test("same-lifetime restart still suppresses the replayed epoch exactly once") {
    val ckpt = Files.createTempDirectory("replay-same-ckpt").toString
    val src = Files.createTempDirectory("replay-same-src").toString
    val t = IceTable.create(catalog, "region_replay_same",
      SchemaConv.fromSpark(region.schema))

    region.where("r_regionkey < 3").write.mode("append").parquet(src)
    val q1 = Ingest.appendStream(
      spark.readStream.schema(region.schema).parquet(src), t, ckpt,
      Trigger.AvailableNow())
    assert(q1.awaitTermination(60000))

    // same checkpoint, new files: batch ids continue (1, 2, ...) under the
    // SAME query id, so prior epochs are visible to the guard but only
    // strictly-replayed ids are suppressed
    region.where("r_regionkey >= 3").write.mode("append").parquet(src)
    val q2 = Ingest.appendStream(
      spark.readStream.schema(region.schema).parquet(src), t, ckpt,
      Trigger.AvailableNow())
    assert(q2.awaitTermination(60000))
    t.refresh()
    assert(t.scan(spark).count() == region.count())
    assert(t.scan(spark).select("r_regionkey").distinct().count() == region.count(),
      "a replayed batch was committed twice")
  }
}

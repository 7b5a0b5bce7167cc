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

  test("checkpoint query id is read from the FS once per sink lifetime, not per micro-batch") {
    val ckpt = Files.createTempDirectory("replay-qid-ckpt").toString
    val src = Files.createTempDirectory("replay-qid-src").toString
    val t = IceTable.create(catalog, "region_qid_reads",
      SchemaConv.fromSpark(region.schema))
    // three source files + maxFilesPerTrigger=1 → three non-empty
    // micro-batches within ONE query
    (0 until 3).foreach(i =>
      region.where(s"r_regionkey % 3 = $i").coalesce(1)
        .write.mode("append").parquet(src))
    val before = Ingest.queryIdReads.get()
    val q = Ingest.appendStream(
      spark.readStream.schema(region.schema)
        .option("maxFilesPerTrigger", "1").parquet(src),
      t, ckpt, Trigger.AvailableNow())
    assert(q.awaitTermination(60000))
    t.refresh()
    assert(t.scan(spark).count() == region.count())
    val batches = Ingest.mainAncestry(t.metadata)
      .count(_.summary.contains(Ingest.StreamBatchIdKey))
    assert(batches >= 2, s"expected multiple micro-batches, got $batches")
    // the id is immutable for the checkpoint's lifetime: one FS read for
    // the whole query, however many triggers ran (each re-read is a
    // metered GET per trigger on object storage)
    assert(Ingest.queryIdReads.get() - before == 1,
      s"checkpoint metadata read ${Ingest.queryIdReads.get() - before} times for $batches batches")
  }

  test("legacy qid-less stamps retire once any qid-stamped commit exists") {
    val ckpt = Files.createTempDirectory("replay-legacy-ckpt").toString
    val t = IceTable.create(catalog, "region_legacy",
      SchemaConv.fromSpark(region.schema))

    // a pre-upgrade engine committed batch 0 of this checkpoint with no
    // query id; the checkpoint itself recorded batch 0 via a scratch sink
    // (legacy data + legacy stamp, checkpoint genuinely at batch 0)
    val tScratch = IceTable.create(catalog, "region_legacy_scratch",
      SchemaConv.fromSpark(region.schema))
    val src = Files.createTempDirectory("replay-legacy-src").toString
    region.where("r_regionkey < 2").coalesce(1).write.mode("append").parquet(src)
    val q0 = Ingest.appendStream(
      spark.readStream.schema(region.schema).parquet(src), tScratch, ckpt,
      Trigger.AvailableNow())
    assert(q0.awaitTermination(60000))
    t.append(region.where("r_regionkey < 2"), extraSummary = Map(
      Ingest.StreamBatchIdKey -> "0", Ingest.StreamCheckpointKey -> ckpt))

    // post-upgrade continuation on the SAME live checkpoint: batch 1 must
    // land (the legacy stamp still participates — no qid stamp exists yet)
    region.where("r_regionkey >= 2").coalesce(1).write.mode("append").parquet(src)
    val q1 = Ingest.appendStream(
      spark.readStream.schema(region.schema).parquet(src), t, ckpt,
      Trigger.AvailableNow())
    assert(q1.awaitTermination(60000))
    t.refresh()
    assert(t.scan(spark).count() == region.count(),
      "post-upgrade continuation batch did not land")
    assert(t.currentSnapshot.get.summary.contains(Ingest.StreamQueryIdKey))

    // routine checkpoint delete-and-recreate: batch ids restart at 0,
    // which is below the legacy stamp's epoch — but a qid-stamped commit
    // now exists, so the legacy stamps are retired and the new lifetime's
    // batches land instead of wedging on IllegalStateException forever
    FileUtils.deleteDirectory(new java.io.File(ckpt))
    Files.createDirectories(java.nio.file.Paths.get(ckpt))
    val src2 = Files.createTempDirectory("replay-legacy-src2").toString
    region.limit(1).coalesce(1).write.mode("append").parquet(src2)
    val q2 = Ingest.appendStream(
      spark.readStream.schema(region.schema).parquet(src2), t, ckpt,
      Trigger.AvailableNow())
    assert(q2.awaitTermination(60000))
    t.refresh()
    assert(t.scan(spark).count() == region.count() + 1,
      "recreated-checkpoint batch was suppressed by a retired legacy stamp")
  }

  test("legacy-only history + recreated checkpoint fails loudly naming the workaround") {
    val ckpt = Files.createTempDirectory("replay-wedge-ckpt").toString
    val t = IceTable.create(catalog, "region_legacy_wedge",
      SchemaConv.fromSpark(region.schema))
    // only legacy stamps exist, with an epoch ahead of a fresh lifetime's
    // batch 0: indistinguishable from checkpoint data loss, so the guard
    // must refuse — and tell the operator what to do about it
    t.append(region.limit(1), extraSummary = Map(
      Ingest.StreamBatchIdKey -> "5", Ingest.StreamCheckpointKey -> ckpt))
    val src = Files.createTempDirectory("replay-wedge-src").toString
    region.limit(2).coalesce(1).write.mode("append").parquet(src)
    val q = Ingest.appendStream(
      spark.readStream.schema(region.schema).parquet(src), t, ckpt,
      Trigger.AvailableNow())
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def messages(x: Throwable): Seq[String] =
      if (x == null) Nil else Option(x.getMessage).toSeq ++ messages(x.getCause)
    val all = messages(e).mkString("\n")
    assert(all.contains("below the last committed epoch"), s"wrong failure:\n$all")
    assert(all.contains("fresh checkpoint path"),
      s"error does not name the operator workaround:\n$all")
  }
}

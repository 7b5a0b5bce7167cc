package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SchemaConv
import graft.meta.FileCatalog
import graft.table.IceTable

/** Randomized ranges over a merge-append history: the incremental read's
  * entry-sequence selection is the subtlest logic in Ingest — merged
  * manifests demote in-range appends to Existing entries that must stay
  * visible, while carried-forward old entries must not re-emit. The
  * designed cases live in ChangelogSpec; this sweeps random (since, until)
  * pairs over a 10-append history with manifest merging enabled, checking
  * every range against the set algebra of the batches, plus time travel at
  * every snapshot and the abort contract after a compaction.
  */
class IncrementalFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  // default seed 9090 keeps CI deterministic; GRAFT_FUZZ_SEED sweeps
  // fresh input space (failures print the seed via the env, reproducible)
  private val rnd = new scala.util.Random(
    sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(9090L))

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("incremental-fuzz-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def keysOf(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("k").collect().map(_.getLong(0)).toSet

  test("random incremental ranges equal batch set algebra under manifest merging") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("graft-incfuzz").toString
    val catalog = new FileCatalog(wh)
    val df0 = Seq.empty[(Long, Int)].toDF("k", "batch")
    val t = IceTable.create(catalog, "incfuzz", SchemaConv.fromSpark(df0.schema))
    t.updateProperties(set = Map(
      "commit.manifest-merge.enabled" -> "true",
      "commit.manifest.min-count-to-merge" -> "3"))

    val nBatches = 10
    val batchKeys = (0 until nBatches).map(b =>
      (b * 100L until b * 100L + 30L).toSet)
    val seqs = new Array[Long](nBatches)
    val snapIds = new Array[Long](nBatches)
    (0 until nBatches).foreach { b =>
      t.append(batchKeys(b).toSeq.sorted.map(k => (k, b)).toDF("k", "batch"))
      seqs(b) = t.currentSnapshot.get.sequenceNumber
      snapIds(b) = t.currentSnapshot.get.snapshotId
    }
    // merging must actually have fired, or this fuzz tests nothing new
    assert(graft.meta.ManifestIO.readManifestList(
      t.currentSnapshot.get.manifestList).size < nBatches,
      "manifest merging never triggered — raise min-count-to-merge pressure")

    (0 until 40).foreach { r =>
      val b = 1 + rnd.nextInt(nBatches - 1)
      val a = rnd.nextInt(b + 1) // 0 = full replay (sinceSeq 0), else from batch a
      val sinceSeq = if (a == 0) 0L else seqs(a - 1)
      val expected =
        if (sinceSeq == 0L) batchKeys.take(b + 1).reduce(_ ++ _)
        else (a to b).map(batchKeys).reduce(_ ++ _)
      val got = keysOf(Ingest.changesBetween(spark, t, sinceSeq, seqs(b)))
      assert(got == expected,
        s"round $r: range (since=$sinceSeq, until=${seqs(b)}] diverged — " +
          s"missing=${(expected -- got).toSeq.sorted.take(5)} extra=${(got -- expected).toSeq.sorted.take(5)}")
    }

    // time travel at every snapshot is the cumulative set
    (0 until nBatches).foreach { b =>
      assert(keysOf(t.newScan(snapshotId = Some(snapIds(b))).toDF(spark)) ==
        batchKeys.take(b + 1).reduce(_ ++ _), s"time travel at batch $b diverged")
    }

    // changelog 'I' rows agree with the incremental read on a few ranges
    (0 until 8).foreach { _ =>
      val b = 1 + rnd.nextInt(nBatches - 1)
      val a = 1 + rnd.nextInt(b)
      val cl = Ingest.changelogBetween(spark, t, seqs(a - 1), seqs(b))
      assert(keysOf(cl.where("change_type = 'I'")) ==
        (a to b).map(batchKeys).reduce(_ ++ _))
    }

    // compaction: in-range reads crossing it abort loudly; full replay and
    // post-compaction increments still work
    t.compact(spark, targetFileCount = 2)
    val compactSeq = t.currentSnapshot.get.sequenceNumber
    intercept[IllegalStateException](
      Ingest.changesBetween(spark, t, seqs(4), compactSeq).count())
    assert(keysOf(Ingest.changesBetween(spark, t, 0L, Long.MaxValue)) ==
      batchKeys.reduce(_ ++ _), "full replay after compaction diverged")
    t.append(Seq((9999L, 99)).toDF("k", "batch"))
    assert(keysOf(Ingest.changesBetween(spark, t, compactSeq, Long.MaxValue)) ==
      Set(9999L), "post-compaction increment diverged")
  }
}

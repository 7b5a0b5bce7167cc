package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{BucketTransform, SchemaConv}
import graft.meta.{FileCatalog, PartitionSpec}

/** Randomized upsert sequences: every round equality-deletes a random key
  * set and re-inserts fresh values in one commit, and the scan must equal
  * a driver-maintained map after each round — the strictly-older scoping
  * rule (an equality delete kills only rows from strictly earlier
  * sequences) has to hold across arbitrarily overlapping key histories,
  * through a mid-sequence compaction, and after snapshot expiry plus
  * orphan cleanup. Designed cases live in IceTableSpec; this sweeps the
  * composition space. Seeded, so failures reproduce.
  */
class UpsertFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  // default seed 555 keeps CI deterministic; GRAFT_FUZZ_SEED sweeps
  // fresh input space (failures print the seed via the env, reproducible)
  private val rnd = new scala.util.Random(
    sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(555L))

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("upsert-fuzz-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("random upsert rounds keep the table equal to the reference map") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("graft-upfuzz").toString
    val catalog = new FileCatalog(wh)
    val df0 = Seq.empty[(Long, Long, String)].toDF("k", "v", "txt")
    val t = IceTable.create(catalog, "upfuzz", SchemaConv.fromSpark(df0.schema))
    t.updateProperties(set = Map("write.max-records-per-file" -> "16"))
    val ref = scala.collection.mutable.Map.empty[Long, (Long, String)]

    def checkAfter(round: String): Unit = {
      val got = t.scan(spark).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got == ref.toMap,
        s"after $round: ${(ref.keySet -- got.keySet).toSeq.sorted.take(5)} missing, " +
          s"${(got.keySet -- ref.keySet).toSeq.sorted.take(5)} extra, " +
          s"changed=${got.collect { case (k, v) if ref.get(k).exists(_ != v) => k }.toSeq.sorted.take(5)}")
    }

    (0 until 12).foreach { round =>
      val keys = Seq.fill(30)(rnd.nextInt(200).toLong).distinct
      val rows = keys.map(k => (k, round.toLong * 1000 + k, s"r$round-$k"))
      t.upsert(spark, rows.toDF("k", "v", "txt"), Seq("k"))
      keys.zip(rows).foreach { case (k, (_, v, txt)) => ref(k) = (v, txt) }
      checkAfter(s"upsert round $round")
      if (round == 3) {
        // convert the accumulated equality debt to deletion vectors
        // mid-sequence: scans must be unchanged, and LATER upserts' new
        // equality deletes must compose with the converted DVs
        assert(t.refresh().newScan().planFiles().exists(_.eqDeletes.nonEmpty))
        assert(t.rewritePositionDeletes(spark).isDefined)
        t.refresh()
        assert(t.newScan().planFiles().forall(_.eqDeletes.isEmpty),
          "conversion must spend the equality debt")
        checkAfter("mid-sequence eq->DV conversion")
      }
      if (round == 6) {
        t.compact(spark, targetFileCount = 3)
        checkAfter("mid-sequence compaction")
      }
      if (round == 9) {
        // a second conversion over MIXED debt (post-compaction upserts'
        // fresh eq deletes + any DVs from round 3 surviving compaction)
        t.refresh()
        t.rewritePositionDeletes(spark)
        t.refresh()
        checkAfter("second eq->DV conversion")
      }
      if (round == 10) {
        // SIZE-FILTERED incremental compaction mid-sequence: the tiny
        // rolling limit makes every file qualify, so the new-path rewrite
        // must bake all accumulated MOR debt in — and round 11's upsert
        // must compose its fresh equality deletes on top
        assert(t.refresh().compactSmallFiles(spark,
          smallerThanBytes = Long.MaxValue).isDefined)
        t.refresh()
        checkAfter("mid-sequence small-file compaction")
      }
    }
    // maintenance must not disturb the converged state
    t.expireSnapshots(System.currentTimeMillis() + 3600000L, retainLast = 2)
    t.deleteOrphanFiles(System.currentTimeMillis() + 3600000L)
    t.refresh()
    checkAfter("expiry + orphan cleanup")
    assert(ref.nonEmpty)
  }

  test("partitioned sink: scoped equality deletes stay exact and prune by partition") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("graft-upfuzz-part").toString
    val catalog = new FileCatalog(wh)
    val df0 = Seq.empty[(Long, Long, String)].toDF("k", "v", "txt")
    val schema = SchemaConv.fromSpark(df0.schema)
    // partition derives from the KEY (bucket(k, 4)), so the upsert path's
    // safety gate engages and deletes are written partition-scoped
    val spec = PartitionSpec.of(0, ("k", BucketTransform(4), "kb"))(schema)
    val t = IceTable.create(catalog, "upfuzz_part", schema, spec)
    t.updateProperties(set = Map("write.max-records-per-file" -> "16"))
    val ref = scala.collection.mutable.Map.empty[Long, (Long, String)]

    def checkAfter(round: String): Unit = {
      val got = t.scan(spark).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got == ref.toMap,
        s"after $round: ${(ref.keySet -- got.keySet).toSeq.sorted.take(5)} missing, " +
          s"${(got.keySet -- ref.keySet).toSeq.sorted.take(5)} extra, " +
          s"changed=${got.collect { case (k, v) if ref.get(k).exists(_ != v) => k }.toSeq.sorted.take(5)}")
    }

    (0 until 8).foreach { round =>
      val keys = Seq.fill(30)(rnd.nextInt(200).toLong).distinct
      val rows = keys.map(k => (k, round.toLong * 1000 + k, s"p$round-$k"))
      t.upsert(spark, rows.toDF("k", "v", "txt"), Seq("k"))
      keys.zip(rows).foreach { case (k, (_, v, txt)) => ref(k) = (v, txt) }
      checkAfter(s"partitioned upsert round $round")
      if (round == 4) {
        assert(t.refresh().rewritePositionDeletes(spark).isDefined)
        t.refresh()
        assert(t.newScan().planFiles().forall(_.eqDeletes.isEmpty),
          "conversion must spend the scoped equality debt")
        checkAfter("scoped eq->DV conversion")
      }
    }
    // the scoping must be OBSERVABLE in the plan: with 4 buckets and 3
    // post-conversion upsert rounds, each data file anti-joins only its own
    // bucket's delete files — strictly fewer than the table-wide total a
    // global-scope writer would attach to every file
    t.refresh()
    val tasks = t.newScan().planFiles()
    val allEqFiles = tasks.flatMap(_.eqDeletes.map(_._1.filePath)).distinct.size
    assert(allEqFiles > 0, "rounds 5-7 must leave live equality debt")
    val maxPerTask = tasks.map(_.eqDeletes.size).max
    assert(maxPerTask < allEqFiles,
      s"every task sees all $allEqFiles delete files — scoping did not engage")
    checkAfter("final plan inspection")
  }

  test("partition evolution disables scoped deletes until compaction rewrites the live set") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("graft-upfuzz-evo").toString
    val catalog = new FileCatalog(wh)
    val df0 = Seq.empty[(Long, Long, String)].toDF("k", "v", "txt")
    val schema = SchemaConv.fromSpark(df0.schema)
    val t = IceTable.create(catalog, "upfuzz_evo", schema,
      PartitionSpec.of(0, ("k", BucketTransform(4), "kb"))(schema))
    t.updateProperties(set = Map("write.max-records-per-file" -> "16"))
    val ref = scala.collection.mutable.Map.empty[Long, (Long, String)]

    def checkAfter(round: String): Unit = {
      val got = t.scan(spark).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got == ref.toMap,
        s"after $round: ${(ref.keySet -- got.keySet).toSeq.sorted.take(5)} missing, " +
          s"${(got.keySet -- ref.keySet).toSeq.sorted.take(5)} extra")
    }
    def upsertRound(round: Int): Unit = {
      val keys = Seq.fill(30)(rnd.nextInt(200).toLong).distinct
      val rows = keys.map(k => (k, round.toLong * 1000 + k, s"e$round-$k"))
      t.upsert(spark, rows.toDF("k", "v", "txt"), Seq("k"))
      keys.zip(rows).foreach { case (k, (_, v, txt)) => ref(k) = (v, txt) }
      checkAfter(s"evolution-sequence upsert round $round")
    }
    // the gate's direct observable: the spec id of the NEWEST delete
    // manifest in the current list (GlobalDeletes.specId == Int.MaxValue)
    def newestDeleteSpecId: Int = {
      val snap = t.refresh().metadata.currentSnapshot.get
      graft.meta.ManifestIO.readManifestList(snap.manifestList)
        .filter(_.content == 1).maxBy(_.sequenceNumber).specId
    }

    (0 until 3).foreach(upsertRound) // single spec epoch: scoped
    assert(newestDeleteSpecId == 0, "key-derived single-spec sink must scope")

    // evolve the spec: spec-0 files are still LIVE, so a scoped delete
    // under spec 1 would never reach a key's spec-0 versions — the gate
    // must fall back to GLOBAL deletes (over-matching is safe, the
    // strictly-older rule still scopes sequences)
    t.updateSpec(("k", BucketTransform(8), "kb8"))
    (3 until 5).foreach(upsertRound)
    assert(newestDeleteSpecId == Int.MaxValue,
      "live spec-0 files present: upsert deletes must be global")

    // full compaction rewrites every live file under spec 1 — the LIVE-
    // STATE gate re-engages scoping (the old spec-HISTORY gate stayed
    // off forever after one updateSpec)
    t.compact(spark, targetFileCount = 4)
    checkAfter("post-evolution compaction")
    (5 until 8).foreach(upsertRound)
    assert(newestDeleteSpecId == 1,
      "all live files on spec 1 after compaction: scoping must re-engage")

    // and the re-engaged scoping is visible in the plan: post-compaction
    // deletes attach per bucket, not table-wide
    t.refresh()
    val tasks = t.newScan().planFiles()
    val allEqFiles = tasks.flatMap(_.eqDeletes.map(_._1.filePath)).distinct.size
    assert(allEqFiles > 0, "rounds 5-7 must leave live equality debt")
    assert(tasks.map(_.eqDeletes.size).max < allEqFiles,
      s"every task sees all $allEqFiles delete files — scoping did not re-engage")
    checkAfter("final evolved-sink state")
  }
}

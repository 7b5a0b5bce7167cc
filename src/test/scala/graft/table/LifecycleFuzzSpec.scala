package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{BucketTransform, Predicates => P, SchemaConv}
import graft.meta.{FileCatalog, PartitionSpec}

/** The FULL maintenance lifecycle fuzzed as one sequence (r18 verdict
  * item 5): random interleavings of upsert / deleteWhere / deleteWhereDV /
  * compactSmallFiles / full compact / rewritePositionDeletes / expiry +
  * orphan cleanup against a driver-maintained reference map — the pieces
  * are individually fuzzed (UpsertFuzzSpec, IceTableSpec, MaintenanceSpec);
  * their INTERLEAVINGS are where refresh()-class races and sequencing bugs
  * hide. The table is deliberately the hardest composition the engine
  * supports: format-version 3 (row lineage materializes through every
  * rewrite), bucket(k)-partitioned (upsert deletes are partition-SCOPED),
  * with accumulated DV + equality debt crossing every maintenance op.
  *
  * Besides value-equality after every op, the fuzz pins the v3 LINEAGE
  * INVARIANTS on the full pair: a row's _row_id never changes until an
  * upsert replaces that key, and its _last_updated_sequence_number STRICTLY
  * INCREASES exactly when an upsert touches the key (compaction,
  * conversion, deletes of other rows, and expiry must all preserve both).
  * Seeded; GRAFT_FUZZ_SEED sweeps fresh sequences.
  */
class LifecycleFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(555L)
  private val rnd = new scala.util.Random(seed)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("lifecycle-fuzz-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("random maintenance interleavings keep values AND row lineage exact") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("graft-lifecycle").toString
    val catalog = new FileCatalog(wh)
    val df0 = Seq.empty[(Long, Long, String)].toDF("k", "v", "txt")
    val schema = SchemaConv.fromSpark(df0.schema)
    val spec = PartitionSpec.of(0, ("k", BucketTransform(4), "kb"))(schema)
    val t = IceTable.create(catalog, "lifecycle", schema, spec,
      properties = Map("format-version" -> "3"))
    t.updateProperties(set = Map("write.max-records-per-file" -> "16"))

    val ref = scala.collection.mutable.Map.empty[Long, (Long, String)]
    val refRid = scala.collection.mutable.Map.empty[Long, Long]
    val refSeq = scala.collection.mutable.Map.empty[Long, Long]

    def observe(): Map[Long, (Long, String, Long, Long)] =
      t.newScan(withRowId = true).toDF(spark).collect()
        .map(r => r.getLong(0) ->
          (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
        .toMap

    def checkAfter(op: String, ridsMayChange: Set[Long]): Unit = {
      val got = observe()
      assert(got.view.mapValues(x => (x._1, x._2)).toMap == ref.toMap,
        s"seed=$seed after $op: " +
          s"${(ref.keySet -- got.keySet).toSeq.sorted.take(5)} missing, " +
          s"${(got.keySet -- ref.keySet).toSeq.sorted.take(5)} extra")
      got.foreach { case (k, (_, _, rid, lusn)) =>
        if (!ridsMayChange.contains(k)) {
          assert(refRid.get(k).forall(_ == rid),
            s"seed=$seed after $op: key $k lineage ${refRid.get(k)} -> $rid")
          assert(refSeq.get(k).forall(_ == lusn),
            s"seed=$seed after $op: key $k last-updated-seq " +
              s"${refSeq.get(k)} -> $lusn (must be preserved)")
        } else
          // an upsert of the key is the ONE event that moves the pair —
          // and it must move the sequence FORWARD
          assert(refSeq.get(k).forall(_ < lusn),
            s"seed=$seed after $op: key $k last-updated-seq " +
              s"${refSeq.get(k)} -> $lusn (upsert must advance it)")
        refRid(k) = rid
        refSeq(k) = lusn
      }
      refRid.keySet.diff(got.keySet).toSeq.foreach(refRid.remove)
      refSeq.keySet.diff(got.keySet).toSeq.foreach(refSeq.remove)
    }

    // seed rows so the first maintenance ops have something to chew on
    val init = (0L until 60L).map(k => (k, k, s"init-$k"))
    t.upsert(spark, init.toDF("k", "v", "txt"), Seq("k"))
    init.foreach { case (k, v, txt) => ref(k) = (v, txt) }
    checkAfter("initial load", ridsMayChange = init.map(_._1).toSet)

    (0 until 18).foreach { round =>
      t.refresh()
      val op = rnd.nextInt(8)
      op match {
        case 0 | 1 | 2 => // upsert dominates, like a real CDC sink
          val keys = Seq.fill(25)(rnd.nextInt(120).toLong).distinct
          val rows = keys.map(k => (k, round.toLong * 1000 + k, s"r$round-$k"))
          t.upsert(spark, rows.toDF("k", "v", "txt"), Seq("k"))
          rows.foreach { case (k, v, txt) => ref(k) = (v, txt) }
          checkAfter(s"round $round upsert", ridsMayChange = keys.toSet)
        case 3 => // positional delete of a key range
          val a = rnd.nextInt(120).toLong
          val b = a + 1 + rnd.nextInt(20)
          t.deleteWhere(spark, P.gtEq("k", a).and(P.lt("k", b)))
          ref.keySet.filter(k => k >= a && k < b).toSeq.foreach(ref.remove)
          checkAfter(s"round $round deleteWhere [$a,$b)", Set.empty)
        case 4 => // deletion-vector delete of a key range
          val a = rnd.nextInt(120).toLong
          val b = a + 1 + rnd.nextInt(20)
          t.deleteWhereDV(spark, P.gtEq("k", a).and(P.lt("k", b)))
          ref.keySet.filter(k => k >= a && k < b).toSeq.foreach(ref.remove)
          checkAfter(s"round $round deleteWhereDV [$a,$b)", Set.empty)
        case 5 => // size-filtered compaction (everything qualifies)
          t.compactSmallFiles(spark, smallerThanBytes = Long.MaxValue)
          checkAfter(s"round $round compactSmallFiles", Set.empty)
        case 6 => // collapse all accumulated MOR debt into DVs
          t.rewritePositionDeletes(spark)
          checkAfter(s"round $round rewritePositionDeletes", Set.empty)
        case 7 => // history maintenance must never touch live data
          t.expireSnapshots(System.currentTimeMillis() + 3600000L, retainLast = 2)
          t.deleteOrphanFiles(System.currentTimeMillis() + 3600000L)
          checkAfter(s"round $round expire+orphan", Set.empty)
      }
      if (round == 9) { // one full rewrite mid-sequence
        t.refresh()
        t.compact(spark, targetFileCount = 3)
        checkAfter("mid-sequence full compact", Set.empty)
      }
    }
    // closing sweep: convert, compact, expire, clean — then one last audit
    t.refresh()
    t.rewritePositionDeletes(spark)
    t.refresh()
    t.compactSmallFiles(spark, smallerThanBytes = Long.MaxValue)
    t.refresh()
    t.expireSnapshots(System.currentTimeMillis() + 3600000L, retainLast = 1)
    t.deleteOrphanFiles(System.currentTimeMillis() + 3600000L)
    t.refresh()
    checkAfter("closing maintenance sweep", Set.empty)
    assert(ref.nonEmpty, s"seed=$seed drove the table empty — weak sequence")
  }
}

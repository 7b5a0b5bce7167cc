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

  test("WAP branch stage never surfaces as a changelog insert — main ancestry only") {
    // the branch-staged snapshot lands in meta.snapshots with the HIGHEST
    // sequence number but never moves main; resolving `until` over all
    // snapshots (pre-fix) emitted its rows as phantom 'I's that main never
    // published (ADVICE r12 high)
    val t = IceTable.create(catalog, "cdc_wap", SchemaConv.fromSpark(nation.schema))
    val s1 = t.append(nation.where("n_nationkey < 10"))
    t.append(nation.where("n_nationkey >= 10 AND n_nationkey < 20"))
    t.appendToBranch(nation.where("n_nationkey >= 20"), "audit")
    t.refresh()
    val expect = (10L until 20L).map(k => (k, "I", 2L)).toSet
    assert(changes(t, s1.snapshotId) === expect,
      "branch-staged rows must not appear until published")
    // incremental append read honors the same ancestry bound
    val inc = Ingest.changesSince(spark, t, s1.snapshotId)
      .select("n_nationkey").collect().map(_.getAs[Number](0).longValue()).toSet
    assert(inc === (10L until 20L).toSet)
    // publishing the branch then surfaces the rows
    t.fastForwardMain("audit")
    t.refresh()
    assert(changes(t, s1.snapshotId) ===
      expect ++ (20L until 25L).map(k => (k, "I", 3L)).toSet)
  }

  test("overlapping delete predicates emit each position once, at first deletion") {
    // deleteWhere matches raw parquet without subtracting prior deletes, so
    // keys 0-2 appear in BOTH delete snapshots' files — the changelog must
    // emit them only at seq 2 (ADVICE r12 medium)
    val t = IceTable.create(catalog, "cdc_overlap", SchemaConv.fromSpark(nation.schema))
    val s1 = t.append(nation.where("n_nationkey < 10"))
    t.deleteWhere(spark, P.lt("n_nationkey", 3L)) // seq 2: kills 0-2
    t.deleteWhere(spark, P.lt("n_nationkey", 5L)) // seq 3: 0-2 again + 3-4
    t.refresh()
    val expect =
      (0L until 3L).map(k => (k, "D", 2L)).toSet ++
        (3L until 5L).map(k => (k, "D", 3L)).toSet
    assert(changes(t, s1.snapshotId) === expect)
  }

  test("whole-file drops surface as D rows, skipping positions already dead") {
    // strict-metrics deleteWhere drops fully-matched files as Deleted
    // manifest entries with NO delete rows to invert — the changelog must
    // reconstruct their live rows, and only their live rows, as D
    val schema = SchemaConv.fromSpark(nation.schema)
    val t = IceTable.create(catalog, "cdc_drop", schema,
      PartitionSpec.of(0, ("n_regionkey", IdentityTransform, "region"))(schema))
    val s1 = t.append(nation)
    def keysOf(region: Int) = nation.where(s"n_regionkey = $region")
      .select("n_nationkey").collect().map(_.getAs[Number](0).longValue()).toSet
    val r0 = keysOf(0)
    val first = r0.min
    val k1 = keysOf(1).min
    // seq 2: partial positional kill inside partition 0
    t.deleteWhere(spark,
      P.and(P.equalTo("n_regionkey", 0L), P.equalTo("n_nationkey", first)))
    // seq 3: MIXED — drops partition 0's file whole + position-deletes one
    // row of partition 1, in ONE snapshot
    t.deleteWhere(spark, P.or(P.equalTo("n_regionkey", 0L),
      P.and(P.equalTo("n_regionkey", 1L), P.equalTo("n_nationkey", k1))))
    t.refresh()
    val s3 = t.metadata.currentSnapshot.get
    val list = ManifestIO.readManifestList(s3.manifestList)
    // the drop really was metadata-only for partition 0 (a Deleted entry
    // exists) while partition 1 got a positional-delete file
    assert(list.filter(_.content == 0).exists(m =>
      ManifestIO.readManifest(m.path, t.metadata.specs, t.schema)._2
        .exists(e => e.status == ManifestEntryStatus.Deleted &&
          e.snapshotId == s3.snapshotId)))
    assert(list.exists(m => m.content == 1 && m.sequenceNumber == s3.sequenceNumber))
    val expect = Set((first, "D", 2L)) ++
      (r0 - first).map(k => (k, "D", 3L)) + ((k1, "D", 3L))
    assert(changes(t, s1.snapshotId) === expect)
  }

  test("a position dead before the range start is not re-emitted") {
    // the second predicate's delete file re-records 0-2, but they died at
    // seq 2 — before this consumer's start — so only 3-4 are news
    val t = IceTable.create(catalog, "cdc_predead", SchemaConv.fromSpark(nation.schema))
    t.append(nation.where("n_nationkey < 10"))
    t.deleteWhere(spark, P.lt("n_nationkey", 3L)) // seq 2, pre-range
    t.refresh()
    val s2 = t.metadata.currentSnapshot.get
    t.deleteWhere(spark, P.lt("n_nationkey", 5L)) // seq 3, in range
    t.refresh()
    assert(changes(t, s2.snapshotId) === (3L until 5L).map(k => (k, "D", 3L)).toSet)
  }

  test("merge-append inside the range keeps merged-away appends visible") {
    // a merge-append commit demotes prior Added entries to Existing in the
    // merged manifest; entry-level seq/snapshotId survive, and both the
    // incremental read and the changelog must select by THOSE, not by
    // Added status (ADVICE r13)
    val t = IceTable.create(catalog, "cdc_merge", SchemaConv.fromSpark(nation.schema),
      properties = Map(
        "commit.manifest-merge.enabled" -> "true",
        "commit.manifest.min-count-to-merge" -> "3"))
    val s1 = t.append(nation.where("n_nationkey < 5").coalesce(1))   // seq 1
    t.append(nation.where("n_nationkey >= 5 and n_nationkey < 10").coalesce(1)) // seq 2
    t.append(nation.where("n_nationkey >= 10").coalesce(1))          // seq 3 → merge fires
    t.refresh()
    assert(t.manifestsDF(spark).count() == 1, "merge-append should have packed to one manifest")
    // incremental read over (s1, head] sees seq-2 and seq-3 rows even
    // though their entries are now Existing in the merged manifest
    val inc = Ingest.changesSince(spark, t, s1.snapshotId)
      .select("n_nationkey").collect().map(_.getAs[Number](0).longValue()).toSet
    assert(inc === (5L until 25L).toSet)
    // and NOT the seq-1 rows (entry seq still bounds the range)
    assert(changes(t, s1.snapshotId) ===
      (5L until 10L).map(k => (k, "I", 2L)).toSet ++
        (10L until 25L).map(k => (k, "I", 3L)).toSet)
  }

  test("empty range yields an empty, correctly-shaped frame") {
    val t = IceTable.create(catalog, "cdc_empty", SchemaConv.fromSpark(nation.schema))
    val s1 = t.append(nation)
    val df = Ingest.changelogSince(spark, t, s1.snapshotId)
    assert(df.count() === 0)
    assert(df.columns.takeRight(2) === Array("change_type", "change_seq"))
  }
}

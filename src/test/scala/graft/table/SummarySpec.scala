package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Predicates => P, _}
import graft.meta._

/** Snapshot-summary metrics parity (reference `table/snapshots.go:60-500`)
  * and the merge-append manifest manager (reference `manifestMergeManager`,
  * `snapshot_producers.go:245-418`): enable-flag gating, target-size
  * bin-packing, and status preservation through a merge.
  */
class SummarySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var catalog: FileCatalog = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("summary-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = new FileCatalog(Files.createTempDirectory("graft-summary-spec").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def lineitem = spark.read.parquet(s"$sfDir/lineitem.parquet")
  private def nation = spark.read.parquet(s"$sfDir/nation.parquet")

  test("append summary: added breakdown, file sizes, and the six running totals") {
    val t = IceTable.create(catalog, "sum_append",
      SchemaConv.fromSpark(lineitem.schema))
    val s1 = t.append(lineitem.coalesce(2))
    val rows = lineitem.count()
    assert(s1.summary("operation") == "append")
    assert(s1.summary("added-records").toLong == rows)
    val files = t.newScan().planFiles().map(_.file)
    assert(s1.summary("added-data-files").toInt == files.size)
    assert(s1.summary("added-files-size").toLong == files.map(_.fileSizeInBytes).sum)
    // totals are ALWAYS written (stats readers probe them unconditionally)
    assert(s1.summary("total-records").toLong == rows)
    assert(s1.summary("total-data-files").toInt == files.size)
    assert(s1.summary("total-files-size").toLong == files.map(_.fileSizeInBytes).sum)
    assert(s1.summary("total-delete-files") == "0"
      && s1.summary("total-position-deletes") == "0"
      && s1.summary("total-equality-deletes") == "0")
    // zero deltas stay unwritten (reference setWhenPositive)
    assert(!s1.summary.contains("deleted-records")
      && !s1.summary.contains("removed-files-size"))
    // second append accumulates the totals
    val s2 = t.append(lineitem.coalesce(1))
    assert(s2.summary("total-records").toLong == 2 * rows)
  }

  test("MOR and equality deletes land in the delete-file breakdown") {
    val t = IceTable.create(catalog, "sum_deletes",
      SchemaConv.fromSpark(lineitem.schema))
    t.append(lineitem)
    val del = t.deleteWhere(spark, P.equalTo("l_returnflag", "R")).get
    val posDeleted = lineitem.where("l_returnflag = 'R'").count()
    assert(del.summary("added-delete-files").toInt >= 1)
    assert(del.summary("added-position-delete-files").toInt >= 1)
    assert(del.summary("added-position-deletes").toLong == posDeleted)
    // positional deletes do NOT retire data files: data totals unchanged
    assert(del.summary("total-records").toLong == lineitem.count())
    assert(del.summary("total-position-deletes").toLong == posDeleted)
    assert(del.summary("total-delete-files").toInt >= 1)
    // upsert commits an equality-delete + data files in one snapshot
    val up = t.upsert(spark, lineitem.limit(100), Seq("l_orderkey", "l_linenumber"))
    assert(up.summary("added-equality-delete-files").toInt >= 1)
    assert(up.summary("added-equality-deletes").toLong == 100)
    assert(up.summary("added-records").toLong == 100)
    assert(up.summary("total-equality-deletes").toLong == 100)
  }

  test("rewrite accounting: compaction swaps files at constant record totals") {
    val t = IceTable.create(catalog, "sum_compact",
      SchemaConv.fromSpark(lineitem.schema))
    (0 until 3).foreach(i => t.append(lineitem.where(s"pmod(l_orderkey, 3) = $i")))
    val before = t.currentSnapshot.get.summary
    val snap = t.compact(spark, targetFileCount = 1)
    assert(snap.summary("deleted-records").toLong == lineitem.count())
    assert(snap.summary("added-records").toLong == lineitem.count())
    assert(snap.summary("total-records") == before("total-records"))
    assert(snap.summary("total-data-files") == "1")
  }

  test("per-partition change summaries honor write.summary.partition-limit") {
    val schema = SchemaConv.fromSpark(nation.schema)
    val spec = PartitionSpec.of(0, ("n_regionkey", IdentityTransform, "region"))(schema)
    // default limit 0: count only — a 100-TB commit can touch millions of
    // partitions and the summary must stay metadata-sized
    val t0 = IceTable.create(catalog, "sum_part_default", schema, spec)
    val s0 = t0.append(nation)
    assert(s0.summary("changed-partition-count").toInt == 5)
    assert(!s0.summary.keys.exists(_.startsWith("partitions.")))
    // explicit limit >= touched partitions: per-partition rows appear
    val t1 = IceTable.create(catalog, "sum_part_limited", schema, spec,
      properties = Map(SnapshotSummary.PartitionLimitKey -> "10"))
    val s1 = t1.append(nation)
    assert(s1.summary("changed-partition-count").toInt == 5)
    val partRows = s1.summary.filter(_._1.startsWith("partitions."))
    assert(partRows.size == 5, s"expected 5 partition rows: ${s1.summary.keys}")
    val r0 = s1.summary("partitions.region=0")
    assert(r0.contains("added-data-files=") && r0.contains("added-records="),
      s"partition mini-summary malformed: $r0")
    assert(r0.split(",").map(_.takeWhile(_ != '=')).toSeq.sorted ==
      r0.split(",").map(_.takeWhile(_ != '=')).toSeq, "k=v rows must be sorted")
  }

  test("merge-append: disabled by default; size-gated bins never merge alone") {
    // no flag → manifests accrete even past min-count (reference default)
    val off = IceTable.create(catalog, "sum_merge_off",
      SchemaConv.fromSpark(nation.schema),
      properties = Map("commit.manifest.min-count-to-merge" -> "2"))
    (1 to 3).foreach(_ => off.append(nation.coalesce(1)))
    assert(ManifestIO.readManifestList(off.currentSnapshot.get.manifestList).size == 3)
    // flag on but target-size 1 byte: every manifest overflows its own bin,
    // single-manifest bins stay as-is → still no merging
    val tiny = IceTable.create(catalog, "sum_merge_tiny",
      SchemaConv.fromSpark(nation.schema),
      properties = Map(
        "commit.manifest-merge.enabled" -> "true",
        "commit.manifest.min-count-to-merge" -> "2",
        "commit.manifest.target-size-bytes" -> "1"))
    (1 to 3).foreach(_ => tiny.append(nation.coalesce(1)))
    assert(ManifestIO.readManifestList(tiny.currentSnapshot.get.manifestList).size == 3)
  }

  test("merge-append preserves this snapshot's Added status through the rewrite") {
    val t = IceTable.create(catalog, "sum_merge_status",
      SchemaConv.fromSpark(nation.schema),
      properties = Map(
        "commit.manifest-merge.enabled" -> "true",
        "commit.manifest.min-count-to-merge" -> "2"))
    t.append(nation.coalesce(1))
    val snap = t.append(nation.coalesce(1))
    val manifests = ManifestIO.readManifestList(snap.manifestList)
    assert(manifests.size == 1, s"expected one merged manifest: $manifests")
    val entries = ManifestIO.readManifest(manifests.head.path,
      t.metadata.specs, t.schema)._2
    // the merging commit's own file stays Added; the carried file is Existing
    assert(entries.count(e =>
      e.status == ManifestEntryStatus.Added && e.snapshotId == snap.snapshotId) == 1)
    assert(entries.count(_.status == ManifestEntryStatus.Existing) == 1)
    // prior sequence numbers survive (time travel stays exact)
    assert(entries.flatMap(_.sequenceNumber).distinct.sorted == Seq(1L, 2L))
    assert(t.scan(spark).count() == 2 * nation.count())
    // and the summary still reports only THIS commit's delta
    assert(snap.summary("added-data-files") == "1")
  }
}

package graft.tools

import java.nio.file.Files

import graft.core.{IceLong, IceSchema, NestedField}
import graft.meta.{DataFile, FileCatalog, ManifestEntry, ManifestEntryStatus, ManifestIO}
import graft.table.IceTable

/** Snapshot-count scale probe (metadata plane only, no Spark session):
  * commit thousands of tiny snapshots through the REAL distributed-commit
  * protocol — real Avro manifests, real manifest lists, real CAS metadata
  * versions — and time the operations a long-lived table exercises at
  * every history size: load, scan planning, incremental planning, snapshot
  * expiry, and the orphan-walk's referenced-set build. Timings are taken
  * at n/4 and n so super-linear growth shows up as a ratio, not a feeling:
  * with 4× the snapshots, load/plan should grow ≈4× (metadata JSON and the
  * manifest list are O(snapshots)) and NOT ≈16×.
  *
  * Usage: `runMain graft.tools.SnapshotScaleProbe [n]` (default 1000).
  * Findings go to BENCH_NOTES.md.
  */
object SnapshotScaleProbe {

  final case class Point(
      snapshots: Int,
      commitAvgMs: Double,
      loadMs: Double,
      planMs: Double,
      plannedTasks: Int,
      incrementalPlanMs: Double,
      referencedSetMs: Double,
      orphanWalkMs: Double)

  private def dataFile(path: String): DataFile =
    DataFile(content = 0, filePath = path, fileFormat = "PARQUET",
      partition = Nil, recordCount = 1L, fileSizeInBytes = 1L)

  private def timedMs[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e6)
  }

  /** Commit `upTo - from` one-file snapshots onto `t`. Returns avg ms. */
  private def commitRange(t: IceTable, from: Int, upTo: Int): Double = {
    val t0 = System.nanoTime()
    (from until upTo).foreach { i =>
      val ds = t.beginDistributedSnapshot()
      val entry = ManifestEntry(ManifestEntryStatus.Added, ds.snapshotId,
        None, None, dataFile(f"${t.location}/data/d$i%06d.parquet"))
      val m = ManifestIO.writeManifest(
        s"${t.location}/metadata/${ds.commitUuid}-m0.avro",
        Seq(entry), t.spec, t.schema)
      t.commitDistributedSnapshot(ds, Seq(m))
      t.refresh()
    }
    (System.nanoTime() - t0) / 1e6 / math.max(1, upTo - from)
  }

  private def measure(catalog: FileCatalog, t: IceTable, n: Int,
      commitAvgMs: Double): Point = {
    val (loaded, loadMs) = timedMs(IceTable.load(catalog, "snaps"))
    val (tasks, planMs) = timedMs(loaded.newScan().planFiles())
    // incremental read over the most recent 10 snapshots — the streaming
    // source's per-trigger cost shape
    val anchors = loaded.metadata.snapshots.sortBy(_.sequenceNumber)
    val since = anchors(math.max(0, anchors.size - 11)).sequenceNumber
    val (_, incMs) = timedMs {
      // plan-only equivalent: manifests of the until snapshot newer than since
      val until = anchors.last
      ManifestIO.readManifestList(until.manifestList)
        .filter(_.sequenceNumber > since)
        .foreach(m => ManifestIO.readManifest(m.path, loaded.metadata.specs,
          loaded.schema))
    }
    // referenced-set + walk via the orphan dry-run (deletes nothing)
    val (_, orphanMs) = timedMs(
      loaded.deleteOrphanFiles(System.currentTimeMillis() + 3600000L, dryRun = true))
    // referenced-set alone: re-run is cache-warm, so the delta vs the full
    // dry run approximates the filesystem walk
    val (_, refMs) = timedMs {
      loaded.metadata.snapshots.map(_.manifestList).distinct
        .foreach(ManifestIO.readManifestList)
    }
    Point(n, commitAvgMs, loadMs, planMs, tasks.size, incMs, refMs, orphanMs)
  }

  def run(n: Int, mergeAppend: Boolean = false): (Point, Point, Double) = {
    val wh = Files.createTempDirectory("snap-scale").toString
    val catalog = new FileCatalog(wh)
    val schema = IceSchema(0, Seq(NestedField(1, "id", IceLong, required = true)))
    val t = IceTable.create(catalog, "snaps", schema)
    // merge-append mode: the real-ingest posture — manifests bin-pack, so
    // the manifest LIST stays bounded instead of growing one entry per
    // commit, and the probe shows what that buys at history scale
    if (mergeAppend) t.updateProperties(set = Map(
      "commit.manifest-merge.enabled" -> "true",
      "commit.manifest.min-count-to-merge" -> "8"))
    val q = n / 4
    val avgQ = commitRange(t, 0, q)
    val p1 = measure(catalog, t, q, avgQ)
    val avgN = commitRange(t, q, n)
    val p2 = measure(catalog, t, n, avgN)
    // expiry of the full history down to the last 10 — timed once at n
    val (_, expireMs) = timedMs {
      t.expireSnapshots(System.currentTimeMillis() + 3600000L, retainLast = 10)
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    (p1, p2, expireMs)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val mergeAppend = args.contains("merge")
    val (p1, p2, expireMs) = run(n, mergeAppend)
    def ratio(a: Double, b: Double): String = f"${b / math.max(a, 0.001)}%.1fx"
    println(s"""{"probe":"snapshot-scale","n":$n,"merge_append":$mergeAppend,
      |"at_quarter":{"snapshots":${p1.snapshots},"commit_avg_ms":${f"${p1.commitAvgMs}%.2f"},"load_ms":${f"${p1.loadMs}%.1f"},"plan_ms":${f"${p1.planMs}%.1f"},"tasks":${p1.plannedTasks},"incremental_ms":${f"${p1.incrementalPlanMs}%.1f"},"referenced_ms":${f"${p1.referencedSetMs}%.1f"},"orphan_dryrun_ms":${f"${p1.orphanWalkMs}%.1f"}},
      |"at_full":{"snapshots":${p2.snapshots},"commit_avg_ms":${f"${p2.commitAvgMs}%.2f"},"load_ms":${f"${p2.loadMs}%.1f"},"plan_ms":${f"${p2.planMs}%.1f"},"tasks":${p2.plannedTasks},"incremental_ms":${f"${p2.incrementalPlanMs}%.1f"},"referenced_ms":${f"${p2.referencedSetMs}%.1f"},"orphan_dryrun_ms":${f"${p2.orphanWalkMs}%.1f"}},
      |"expire_to_10_ms":${f"$expireMs%.1f"},
      |"growth_4x_data":{"load":"${ratio(p1.loadMs, p2.loadMs)}","plan":"${ratio(p1.planMs, p2.planMs)}","commit":"${ratio(p1.commitAvgMs, p2.commitAvgMs)}","orphan":"${ratio(p1.orphanWalkMs, p2.orphanWalkMs)}"}}""".stripMargin.replaceAll("\n", ""))
  }
}

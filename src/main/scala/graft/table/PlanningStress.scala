package graft.table

import java.nio.file.Files

import graft.core.{IceLong, IceSchema, NestedField}
import graft.meta.{DataFile, ManifestEntry, ManifestEntryStatus, ManifestIO, FileCatalog}

/** Adversarial metadata-planning stress, shared by DeleteIndexSpec (the
  * correctness gate) and Bench (the round-over-round `planning` metrics):
  * synthetic manifests through the REAL planning path — no data files on
  * disk, but real Avro manifest write/read, manifest-list commits via the
  * distributed-snapshot protocol, and DeleteIndex-backed matching. The
  * delete mix is dominated by pointer-matched entries (file-scoped
  * positionals + DVs) with a thin ranged stripe keeping the suffix-scan
  * path honest, so `rangedBoundsChecks` stays bounded by the stripe — the
  * planner's sub-quadratic 100× claim as a number, not a pass/fail.
  */
object PlanningStress {

  /** Standalone runner for plan-time attribution (no Spark session —
    * metadata plane only): prints each plan run plus cache hit/miss deltas.
    */
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(2)
    (0 until reps).foreach { i =>
      val (h0, m0) = ManifestIO.manifestCacheStats
      val r = run()
      val (h1, m1) = ManifestIO.manifestCacheStats
      println(s"""{"probe":"planning","rep":$i,"plan_ms":${r.planMs.round},""" +
        s""""runs_ms":[${r.planMsRuns.map(_.round).mkString(",")}],""" +
        s""""ranged_checks":${r.rangedBoundsChecks},"tasks":${r.plannedTasks},""" +
        s""""cache_hits":${h1 - h0},"cache_misses":${m1 - m0}}""")
    }
  }

  final case class Result(
      nData: Int,
      nDeletes: Int,
      nRanged: Int,
      planMs: Double,
      rangedBoundsChecks: Long,
      plannedTasks: Int,
      dvAttached: Int,
      minDeletesPerTask: Int,
      planMsRuns: Seq[Double] = Nil)

  private def dataFile(path: String, content: Int = 0,
      lo: Option[String] = None, hi: Option[String] = None,
      refPath: Option[String] = None): DataFile =
    DataFile(
      content = content,
      filePath = path,
      fileFormat = "PARQUET",
      partition = Nil,
      recordCount = 1L,
      fileSizeInBytes = 1L,
      lowerBounds = lo.map(s => DeleteIndex.PathFieldId -> s.getBytes("UTF-8")).toMap,
      upperBounds = hi.map(s => DeleteIndex.PathFieldId -> s.getBytes("UTF-8")).toMap,
      referencedDataFile = refPath)

  def run(nData: Int = 100000, nDeletes: Int = 10000, nRanged: Int = 50): Result = {
    val wh = Files.createTempDirectory("graft-stress").toString
    try {
      val catalog = new FileCatalog(wh)
      val schema = IceSchema(0, Seq(NestedField(1, "id", IceLong, required = true)))
      val t = IceTable.create(catalog, "stress", schema)

      val dataPaths = (0 until nData).map(i => f"$wh/stress/data/d$i%06d.parquet")
      val ds1 = t.beginDistributedSnapshot()
      val dataEntries = dataPaths.map(p => ManifestEntry(
        ManifestEntryStatus.Added, ds1.snapshotId, None, None, dataFile(p)))
      val m1 = ManifestIO.writeManifest(
        s"${t.location}/metadata/${ds1.commitUuid}-m0.avro", dataEntries, t.spec, schema)
      t.commitDistributedSnapshot(ds1, Seq(m1))
      t.refresh()

      val ds2 = t.beginDistributedSnapshot()
      val delEntries = (0 until nDeletes).map { i =>
        val f =
          if (i < nRanged)
            dataFile(s"$wh/stress/data/rd$i.parquet", content = 1,
              lo = Some(dataPaths.head), hi = Some(dataPaths.last))
          else if (i % 2 == 0)
            dataFile(s"$wh/stress/data/pd$i.parquet", content = 1,
              lo = Some(dataPaths(i * 7 % nData)), hi = Some(dataPaths(i * 7 % nData)))
          else
            dataFile(s"$wh/stress/data/dv$i.puffin", content = 1,
              refPath = Some(dataPaths(i * 13 % nData)))
        ManifestEntry(ManifestEntryStatus.Added, ds2.snapshotId, None, None, f)
      }
      val m2 = ManifestIO.writeManifest(
        s"${t.location}/metadata/${ds2.commitUuid}-m0.avro", delEntries, t.spec,
        schema, content = 1)
      t.commitDistributedSnapshot(ds2, Seq(m2))
      t.refresh()

      // min-of-3, like the query board: a single sample per board cannot
      // distinguish a shared-VM load spike from a real planning regression
      // (plan_sec swung 0.31→1.66 s across r17 boards on identical code).
      // Manifest PARSING warms after run 1; the delete-index build and the
      // ranged bounds matching — the stress target — re-run every plan.
      val runs = (0 until 3).map { _ =>
        val scan = t.newScan()
        val t0 = System.nanoTime()
        val tasks = scan.planFiles()
        ((System.nanoTime() - t0) / 1e6, scan.lastPlanRangedChecks, tasks)
      }
      val (planMs, checks, tasks) = runs.minBy(_._1)
      Result(nData, nDeletes, nRanged, planMs, checks,
        tasks.size, tasks.map(_.dvDeletes.size).sum,
        if (tasks.isEmpty) 0 else tasks.map(_.deletes.size).min,
        planMsRuns = runs.map(_._1))
    } finally {
      // the synthetic warehouse is a few MB of Avro — reclaim it
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(wh))
    }
  }
}

package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{BucketTransform, SchemaConv}
import graft.meta.{CommitConflictException, FileCatalog, PartitionSpec}
import graft.table.IceTable

/** Streaming ingest fuzzed AGAINST CONCURRENT MAINTENANCE (r19 verdict
  * item 4): LifecycleFuzzSpec interleaves the same ops sequentially on one
  * handle; here a real Structured Streaming upsert sink commits micro-
  * batches on the stream's thread WHILE an independent table handle runs
  * seeded-random compactSmallFiles / rewritePositionDeletes / full compact
  * / expiry + orphan cleanup — every commit racing through the catalog's
  * version-CAS, losers refreshing and re-deriving from fresh metadata.
  * This is the seam where lost updates hide: a maintenance commit built
  * from a stale view must CONFLICT (and retry), never silently clobber a
  * stream batch that landed in between.
  *
  * Orphan cleanup runs with a PAST cutoff (now − 1 h), the posture a live
  * deployment must use: a future-dated cutoff under concurrent writers
  * would reap the other writer's staged-but-uncommitted files (the same
  * reason Iceberg's remove_orphan_files defaults to a 3-day horizon).
  *
  * Invariants at the end: exactly-once values (the table equals the
  * last-writer-wins map over the batch sequence), v3 `_row_id` uniqueness
  * (a lineage-range reissue under contention would collide ids), and a
  * non-trivial amount of actual maintenance work. Seeded;
  * GRAFT_FUZZ_SEED sweeps fresh interleavings.
  */
class StreamMaintenanceFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val seed = sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(555L)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("stream-maintenance-fuzz-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Stage each batch as ONE parquet file with strictly increasing mtimes
    * so the file stream source processes them in batch order (the same
    * replay-order trick StreamingOps.stagedDocuments uses).
    */
  private def stageBatches(batches: Seq[Seq[(Long, Long, String)]]): Path = {
    val s = spark
    import s.implicits._
    val srcDir = Files.createTempDirectory("graft-smfuzz-src")
    val base = System.currentTimeMillis() - 3600000L
    batches.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory("graft-smfuzz-stage")
      rows.toDF("k", "v", "txt").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(fail(s"batch $i staged no parquet part"))
      val dst = srcDir.resolve(f"b$i%02d.parquet")
      Files.move(part.toPath, dst)
      assert(dst.toFile.setLastModified(base + i * 60000L))
    }
    srcDir
  }

  test("streamed upserts stay exactly-once and lineage-unique under contending maintenance") {
    val rnd = new scala.util.Random(seed)
    val wh = Files.createTempDirectory("graft-smfuzz-wh").toString
    val catalog = new FileCatalog(wh)
    val s = spark
    import s.implicits._
    val df0 = Seq.empty[(Long, Long, String)].toDF("k", "v", "txt")
    val schema = SchemaConv.fromSpark(df0.schema)
    val spec = PartitionSpec.of(0, ("k", BucketTransform(4), "kb"))(schema)
    IceTable.create(catalog, "smfuzz", schema, spec,
      properties = Map("format-version" -> "3",
        "write.max-records-per-file" -> "16"))

    // seeded batch sequence; the reference map is last-writer-wins in
    // batch order (the staged mtimes pin the processing order)
    val nBatches = 28
    val batches = (0 until nBatches).map { b =>
      Seq.fill(25)(rnd.nextInt(120).toLong).distinct
        .map(k => (k, b.toLong * 1000 + k, s"b$b-$k"))
    }
    val ref = scala.collection.mutable.Map.empty[Long, (Long, String)]
    batches.foreach(_.foreach { case (k, v, txt) => ref(k) = (v, txt) })
    val srcDir = stageBatches(batches)

    val conflicts = new java.util.concurrent.atomic.AtomicInteger
    def withConflictRetry[A](handle: IceTable, what: String, retries: Int = 30)(
        body: => A): A = {
      var left = retries
      while (true) {
        try return body
        catch {
          case _: CommitConflictException if left > 0 =>
            conflicts.incrementAndGet()
            left -= 1
            handle.refresh()
        }
      }
      throw new IllegalStateException(s"$what exhausted $retries CAS retries")
    }

    // the SINK's handle: micro-batches upsert on the streaming thread
    val sink = IceTable.load(catalog, "smfuzz")
    val query = spark.readStream.schema(df0.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.toString)
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-smfuzz-ckpt").toString)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          withConflictRetry(sink, "stream upsert") {
            sink.refresh()
            sink.upsert(batch.sparkSession, batch, Seq("k")); ()
          }
      }
      .start()

    // the MAINTENANCE handle contends from this thread's child: an
    // independent view of the same table, racing the sink through the CAS
    val maint = IceTable.load(catalog, "smfuzz")
    @volatile var streaming = true
    val opsDone = new java.util.concurrent.atomic.AtomicInteger
    val maintErrors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val maintRnd = new scala.util.Random(seed * 31 + 7)
    val maintThread = new Thread(() => {
      try {
        while (streaming) {
          maint.refresh()
          if (maint.metadata.currentSnapshot.isDefined) {
            maintRnd.nextInt(4) match {
              case 0 => withConflictRetry(maint, "compactSmallFiles") {
                maint.compactSmallFiles(spark, smallerThanBytes = Long.MaxValue); () }
              case 1 => withConflictRetry(maint, "rewritePositionDeletes") {
                maint.rewritePositionDeletes(spark); () }
              case 2 => withConflictRetry(maint, "expire") {
                maint.expireSnapshots(System.currentTimeMillis() + 3600000L,
                  retainLast = 3) }
                maint.deleteOrphanFiles(System.currentTimeMillis() - 3600000L)
              case 3 => withConflictRetry(maint, "compact") {
                maint.compact(spark, targetFileCount = 3); () }
            }
            opsDone.incrementAndGet()
          }
          Thread.sleep(20 + maintRnd.nextInt(60).toLong)
        }
      } catch { case t: Throwable => maintErrors.add(t); () }
    }, "smfuzz-maintenance")
    maintThread.start()

    try {
      assert(query.awaitTermination(300000), s"seed=$seed stream timed out")
      // the in-stream racing already happened; a short grace lets a heavy
      // op mid-flight finish and the loop reach a minimum total so fresh
      // seeds never flake on op-duration variance (each compact can take
      // ~20 s while 8 cores also run micro-batches)
      val grace = System.currentTimeMillis() + 45000
      while (opsDone.get < 3 && System.currentTimeMillis() < grace &&
        maintErrors.isEmpty) Thread.sleep(200)
    } finally { streaming = false; maintThread.join(120000) }
    assert(maintErrors.isEmpty,
      s"seed=$seed maintenance died: ${Option(maintErrors.peek).map(_.toString)}")
    assert(opsDone.get >= 2,
      s"seed=$seed only ${opsDone.get} maintenance ops ran — no real contention")
    info(s"seed=$seed maintenance ops=${opsDone.get} CAS conflicts=${conflicts.get}")

    // exactly-once: the table equals the last-writer-wins reference
    val t = IceTable.load(catalog, "smfuzz")
    val got = t.newScan(withRowId = true).toDF(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val gotMap = got.map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.length == gotMap.size, s"seed=$seed duplicate keys in the scan")
    assert(gotMap == ref.toMap,
      s"seed=$seed: ${(ref.keySet -- gotMap.keySet).toSeq.sorted.take(5)} missing, " +
        s"${(gotMap.keySet -- ref.keySet).toSeq.sorted.take(5)} extra, " +
        s"changed=${gotMap.collect { case (k, v) if ref.get(k).exists(_ != v) => k }.toSeq.sorted.take(5)}")
    // v3 lineage under contention: a stale-counter commit would reissue
    // row-id ranges and collide
    val rids = got.map(_._4)
    assert(rids.distinct.length == rids.length,
      s"seed=$seed duplicate _row_id values under concurrent commits")
  }
}

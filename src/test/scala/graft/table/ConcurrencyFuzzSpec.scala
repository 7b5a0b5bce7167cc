package graft.table

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.SchemaConv
import graft.meta.{CommitConflictException, FileCatalog}

/** Real CAS contention: six writers with INDEPENDENT table handles append
  * concurrently to one table, each retrying on commit conflicts (the
  * built-in 3 retries may legitimately exhaust under 6-way pressure).
  * Exactly-once is the whole contract: every appended row must land once —
  * a lost rebase drops rows, a replayed commit duplicates them — and the
  * final metadata must chain parent pointers through all 36 commits.
  */
class ConcurrencyFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[8]")
      .appName("concurrency-fuzz-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("contending distributed coordinators: losers observably re-begin, rows land exactly once") {
    // the explicit 3-call protocol under contention (reference
    // `table/distributed_snapshot_test.go`
    // `TestCommitDistributedSnapshotFailsOnConcurrentCommit`): coordinators
    // Begin from the same parent (a barrier forces it), workers write
    // manifests against the reserved snapshot id, Commit fails WITHOUT
    // retry when the parent moved, and the coordinator re-begins — new
    // reserved id, new commit uuid, rewritten worker manifests. Losing
    // attempts' manifests become orphan files, never table state.
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("graft-dsfuzz").toString
    val catalog = new FileCatalog(wh)
    val df0 = Seq.empty[(Long, Int)].toDF("k", "coord")
    IceTable.create(catalog, "dsfuzz", SchemaConv.fromSpark(df0.schema))
    val nCoord = 5
    val nCommits = 3
    val rowsPer = 8
    val nWorkers = 2
    val rebegins = new java.util.concurrent.atomic.AtomicInteger
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(nCoord)
    val threads = (0 until nCoord).map { w =>
      new Thread(() => {
        try {
          val handle = IceTable.load(catalog, "dsfuzz")
          (0 until nCommits).foreach { c =>
            val base = (w * nCommits + c) * rowsPer.toLong
            // all coordinators begin round c from the same observed parent:
            // every round all-but-one MUST lose and re-begin
            barrier.await(120, java.util.concurrent.TimeUnit.SECONDS)
            handle.refresh()
            var committed = false
            while (!committed) {
              val ds = handle.beginDistributedSnapshot()
              val manifests = (0 until nWorkers).map { wk =>
                val slice = rowsPer / nWorkers
                val lo = base + wk * slice
                val df = (lo until lo + slice).map(k => (k, w)).toDF("k", "coord")
                val files = graft.table.DataWriter.write(
                  df, handle.location, handle.schema, handle.spec)
                val entries = files.map(f => graft.meta.ManifestEntry(
                  graft.meta.ManifestEntryStatus.Added, ds.snapshotId, None, None, f))
                graft.meta.ManifestIO.writeManifest(
                  s"${handle.location}/metadata/${ds.commitUuid}-m$wk.avro",
                  entries, handle.spec, handle.schema)
              }
              try { handle.commitDistributedSnapshot(ds, manifests); committed = true }
              catch {
                case _: CommitConflictException =>
                  rebegins.incrementAndGet(); handle.refresh()
              }
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      }, s"coordinator-$w")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(240000))
    assert(errors.isEmpty, s"coordinator failed: ${Option(errors.peek()).map(_.toString)}")
    assert(rebegins.get >= nCommits * (nCoord - 1) / 2,
      s"barrier-aligned begins should force re-begins, saw ${rebegins.get}")

    val t = IceTable.load(catalog, "dsfuzz")
    val keys = t.scan(spark).select("k").as[Long].collect().sorted.toSeq
    val expected = (0L until (nCoord * nCommits * rowsPer).toLong).toSeq
    assert(keys == expected,
      s"exactly-once violated: ${expected.size} expected, ${keys.size} scanned")
    val nSnaps = nCoord * nCommits
    assert(t.metadata.snapshots.size == nSnaps)
    // dense sequence numbers and distinct reserved snapshot ids — a loser
    // replaying its stale reserved id would collide or leave gaps
    assert(t.metadata.snapshots.map(_.sequenceNumber).sorted == (1L to nSnaps.toLong))
    assert(t.metadata.snapshots.map(_.snapshotId).distinct.size == nSnaps)
    val byId = t.metadata.snapshots.map(s0 => s0.snapshotId -> s0).toMap
    var cur = t.currentSnapshot
    var depth = 0
    while (cur.isDefined) { depth += 1; cur = cur.get.parentSnapshotId.flatMap(byId.get) }
    assert(depth == nSnaps, s"ancestry chain length $depth")
  }

  test("six contending writers land every row exactly once") {
    val s = spark
    import s.implicits._
    val wh = Files.createTempDirectory("graft-ccfuzz").toString
    val catalog = new FileCatalog(wh)
    val df0 = Seq.empty[(Long, Int)].toDF("k", "writer")
    IceTable.create(catalog, "ccfuzz", SchemaConv.fromSpark(df0.schema))
    val nWriters = 6
    val nCommits = 6
    val rowsPer = 10
    val errors = new ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until nWriters).map { w =>
      new Thread(() => {
        try {
          val handle = IceTable.load(catalog, "ccfuzz")
          (0 until nCommits).foreach { c =>
            val base = (w * nCommits + c) * rowsPer.toLong
            val df = (base until base + rowsPer).map(k => (k, w)).toDF("k", "writer")
            var committed = false
            while (!committed) {
              try { handle.append(df); committed = true }
              catch { case _: CommitConflictException => handle.refresh() }
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      }, s"writer-$w")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(180000))
    assert(errors.isEmpty, s"writer failed: ${Option(errors.peek()).map(_.toString)}")

    val t = IceTable.load(catalog, "ccfuzz")
    val keys = t.scan(spark).select("k").as[Long].collect().sorted.toSeq
    val expected = (0L until (nWriters * nCommits * rowsPer).toLong).toSeq
    assert(keys == expected,
      s"exactly-once violated: ${expected.size} expected, ${keys.size} scanned, " +
        s"dupes=${keys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }.take(5).toSeq}")
    // the snapshot chain must be a single line through every commit
    assert(t.metadata.snapshots.size == nWriters * nCommits)
    val byId = t.metadata.snapshots.map(s0 => s0.snapshotId -> s0).toMap
    var cur = t.currentSnapshot
    var depth = 0
    while (cur.isDefined) { depth += 1; cur = cur.get.parentSnapshotId.flatMap(byId.get) }
    assert(depth == nWriters * nCommits, s"ancestry chain length $depth")
    // sequence numbers are dense 1..N — a skipped or duplicated sequence
    // breaks incremental reads
    assert(t.metadata.snapshots.map(_.sequenceNumber).sorted ==
      (1L to (nWriters * nCommits).toLong))
  }
}

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

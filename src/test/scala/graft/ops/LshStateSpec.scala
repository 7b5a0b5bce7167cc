package graft.ops

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.StreamingOps.{BandDoc, LshBucket, LshBucketW, NearDupPair, TsBandDoc}

/** State laws of the streaming LSH index, driven directly through Spark's
  * [[TestGroupState]] (no streaming query): the membership cap bounds both
  * state size and per-arrival work under a mass-duplicate key, and the
  * windowed variant evicts members past the window while keeping the
  * candidate set over the retained window exact.
  */
final class LshStateSpec extends AnyFunSuite {

  private val sig = Array.fill(64)(7L) // identical docs: est_jaccard = 1.0
  private val key = ("s", 0, 42L)

  private def runCapped(cap: Int, batches: Seq[Seq[Long]])
      : (Set[(Long, Long)], Seq[Long]) = {
    val fn = StreamingOps.lshBucketFn(cap)
    var st: Option[LshBucket] = None
    val out = Set.newBuilder[(Long, Long)]
    batches.foreach { ids =>
      val state = TestGroupState.create[LshBucket](
        st.map(Optional.of[LshBucket]).getOrElse(Optional.empty[LshBucket]),
        GroupStateTimeout.NoTimeout, 0L, Optional.empty[Long], false)
      fn(key, ids.iterator.map(id => BandDoc("s", 0, 42L, id, sig)), state)
        .foreach { case NearDupPair(a, b, est) => assert(est == 1.0); out += ((a, b)) }
      st = if (state.exists) Some(state.get) else None
    }
    (out.result(), st.map(_.ids).getOrElse(Nil))
  }

  test("membership cap bounds state and emits exactly the rank<=cap pairs") {
    // the mass-duplicate hot key: 10 identical docs, cap 4. Every arrival
    // is verified against the retained first-4 members (dup DETECTION for
    // arrivals beyond the cap still works — each pairs with the capped
    // members), but only the first 4 are indexed.
    val expected = (for {
      b <- 0L until 10L
      a <- 0L until math.min(b, 4L)
    } yield (a, b)).toSet
    val (oneBatch, st1) = runCapped(4, Seq(0L until 10L))
    assert(oneBatch === expected)
    assert(st1 === Seq(0L, 1L, 2L, 3L), "state must hold exactly the first cap members")
    // identical emission when the same arrivals split across micro-batches
    val (threeBatches, st3) = runCapped(4, Seq(0L until 3L, 3L until 7L, 7L until 10L))
    assert(threeBatches === expected)
    assert(st3 === Seq(0L, 1L, 2L, 3L))
  }

  test("capped replay of an already-indexed doc does not duplicate state") {
    val (_, st) = runCapped(4, Seq(Seq(0L, 1L), Seq(1L, 2L)))
    assert(st === Seq(0L, 1L, 2L))
  }

  /** Windowed runs use EventTimeTimeout state (watermark 0) — the fn arms
    * the quiescent-bucket GC timeout unconditionally, which NoTimeout
    * TestGroupState would reject.
    */
  private def windowedState(prev: Option[LshBucketW],
      timedOut: Boolean = false): TestGroupState[LshBucketW] =
    TestGroupState.create[LshBucketW](
      prev.map(Optional.of[LshBucketW]).getOrElse(Optional.empty[LshBucketW]),
      GroupStateTimeout.EventTimeTimeout, 0L, Optional.of(0L), timedOut)

  private def runWindowed(cap: Int, windowUs: Long,
      batches: Seq[Seq[(Long, Long)]]): (Set[(Long, Long)], Seq[Long]) = {
    val fn = StreamingOps.lshBucketFnWindowed(cap, windowUs)
    var st: Option[LshBucketW] = None
    val out = Set.newBuilder[(Long, Long)]
    batches.foreach { docs =>
      val state = windowedState(st)
      fn(key, docs.iterator.map { case (id, ts) => TsBandDoc("s", 0, 42L, id, ts, sig) },
          state)
        .foreach { case NearDupPair(a, b, _) => out += ((a, b)) }
      st = if (state.exists) Some(state.get) else None
    }
    (out.result(), st.map(_.ids).getOrElse(Nil))
  }

  test("windowed eviction bounds state; retained-window candidate set is exact") {
    // arrivals (id, ts): dups recur within the 100 us window or not at all
    val arrivals = Seq(
      (1L, 0L), (2L, 50L),   // (1,2): 50 <= 100 → pair
      (3L, 120L),            // (2,3): 70 <= 100 → pair; (1,3): 120 > 100 → NO
      (4L, 400L))            // all prior members evicted → no pairs
    val expected = Set((1L, 2L), (2L, 3L))
    val (oneBatch, st1) = runWindowed(100, 100L, Seq(arrivals))
    assert(oneBatch === expected)
    assert(st1 === Seq(4L), "members older than the window must be evicted")
    // same contract across micro-batch boundaries
    val (split, st2) = runWindowed(100, 100L,
      Seq(arrivals.take(2), arrivals.slice(2, 3), arrivals.drop(3)))
    assert(split === expected)
    assert(st2 === Seq(4L))
  }

  test("windowed state removes itself when every member ages out") {
    val fn = StreamingOps.lshBucketFnWindowed(100, 10L)
    val s0 = windowedState(None)
    fn(key, Iterator(TsBandDoc("s", 0, 42L, 1L, 0L, sig)), s0).toList
    assert(s0.exists)
    // an arrival far past the window evicts the old member but indexes
    // itself — state stays, holding only the newcomer
    val s1 = windowedState(Some(s0.get))
    fn(key, Iterator(TsBandDoc("s", 0, 42L, 2L, 1000L, sig)), s1).toList
    assert(s1.exists && s1.get.ids === Seq(2L))
  }

  test("quiescent-bucket GC: timeout armed at newest+window, fires to remove") {
    val fn = StreamingOps.lshBucketFnWindowed(100, 100L)
    val s0 = windowedState(None)
    fn(key, Iterator(TsBandDoc("s", 0, 42L, 1L, 5000L, sig)), s0).toList
    assert(s0.exists)
    // stamp = ms-truncated (newest ts_us + window_us) + 1 — strictly past
    // the last instant a non-late arrival could still pair with a member
    assert(s0.getTimeoutTimestampMs.get === (5000L + 100L) / 1000L + 1L)
    // the timeout invocation (empty arrivals, hasTimedOut) drops the bucket
    // and emits nothing
    val s1 = windowedState(Some(s0.get), timedOut = true)
    val out = fn(key, Iterator.empty, s1).toList
    assert(out.isEmpty && !s1.exists)
  }
}

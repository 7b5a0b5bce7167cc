package graft.ops

/** Minimal open-addressing long→long hash map: linear probing, power-of-two
  * capacity, presence tracked in a parallel flag array so EVERY long key —
  * including 0 and Long.MinValue — is a valid key. ~17 bytes per slot at
  * ≤50% load versus ~48-80 per entry for a boxed
  * `java.util.HashMap[Long,Long]`, which is what lets the single-task
  * union-find solve actually fit the memory budget its pair-count
  * threshold is sized by ([[Dedup.duplicateClusters]]).
  */
final class LongLongMap(initialCapacity: Int = 16) {
  // 2^30 is the largest power-of-two Int array size: past it the doubling
  // in pow2 wraps negative (infinite loop) and grow() would allocate a
  // negative size. At ≤50% load that bounds the map at ~536M entries —
  // fail loudly at the boundary instead
  require(initialCapacity <= LongLongMap.MaxCapacity,
    s"initialCapacity $initialCapacity exceeds max ${LongLongMap.MaxCapacity}")
  private def pow2(n: Int): Int = { var c = 16; while (c < n) c <<= 1; c }
  private var cap = pow2(math.max(initialCapacity, 16))
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var n = 0

  private def slot(k: Long): Int = {
    // 64-bit avalanche (splitmix64 finalizer) folded to the table mask
    var h = k + -7046029254386353131L
    h = (h ^ (h >>> 30)) * -4658895280553007687L
    h = (h ^ (h >>> 27)) * -7723592293110705685L
    h ^= h >>> 31
    var i = (h & (cap - 1)).toInt
    while (used(i) && keys(i) != k) i = (i + 1) & (cap - 1)
    i
  }

  private def grow(): Unit = {
    if (cap == LongLongMap.MaxCapacity)
      throw new IllegalStateException(
        s"LongLongMap full: cannot grow past ${LongLongMap.MaxCapacity} slots ($n entries)")
    val ok = keys; val ov = vals; val ou = used
    cap <<= 1
    keys = new Array[Long](cap)
    vals = new Array[Long](cap)
    used = new Array[Boolean](cap)
    n = 0
    var i = 0
    while (i < ok.length) {
      if (ou(i)) put(ok(i), ov(i))
      i += 1
    }
  }

  def put(k: Long, v: Long): Unit = {
    if (2 * (n + 1) > cap) grow()
    val i = slot(k)
    if (!used(i)) { used(i) = true; keys(i) = k; n += 1 }
    vals(i) = v
  }

  def putIfAbsent(k: Long, v: Long): Unit = {
    if (2 * (n + 1) > cap) grow()
    val i = slot(k)
    if (!used(i)) { used(i) = true; keys(i) = k; vals(i) = v; n += 1 }
  }

  def getOrDefault(k: Long, default: Long): Long = {
    val i = slot(k)
    if (used(i)) vals(i) else default
  }

  def size: Int = n

  def keysIterator: Iterator[Long] = {
    // snapshot the arrays: a concurrent put on an EXISTING key can still
    // trigger a resize (the load check runs before the slot lookup), and
    // the key SET is unchanged by updates, so iterating the snapshot stays
    // correct while reads through the map see the live state
    val ks = keys
    val us = used
    ks.indices.iterator.filter(us(_)).map(ks(_))
  }
}

object LongLongMap {
  /** Largest power-of-two Int array size (2^30). */
  final val MaxCapacity: Int = 1 << 30
}

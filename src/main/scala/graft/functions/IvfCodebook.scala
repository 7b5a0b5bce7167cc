package graft.functions

/** IVF codebook fitting and serialization — pure array math, shared by the
  * query-side fit (over a row-capped sample) and the table-side persistence
  * (centroids as a Puffin statistics blob, so a 100 TB table fits its
  * codebook ONCE and every subsequent ANN invocation loads tiny metadata
  * instead of re-running KMeans over the corpus).
  *
  * The fit is deterministic: callers hand it a deterministically-ordered
  * sample, centers initialize at evenly-spaced sample indexes, and Lloyd's
  * iterations are pure. Empty clusters keep their previous center.
  */
object IvfCodebook {

  /** Lloyd's k-means over an in-memory sample (euclidean assignment, the
    * classic IVF cell metric). The sample is expected to be row-capped by
    * the caller — at 100 TB the codebook is fit from ~10⁴ vectors, never
    * the corpus.
    */
  def fit(points: Array[Array[Double]], k: Int, iters: Int = 10): Array[Array[Double]] = {
    if (points.isEmpty) return Array.empty
    val kk = math.min(k, points.length)
    val dim = points(0).length
    var centers = Array.tabulate(kk)(i =>
      points(((i.toLong * points.length) / kk).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      points.foreach { p =>
        val c = nearest(centers, p)
        val s = sums(c)
        var d = 0
        while (d < dim) { s(d) += p(d); d += 1 }
        counts(c) += 1
      }
      centers = Array.tabulate(kk) { c =>
        if (counts(c) == 0L) centers(c)
        else {
          val s = sums(c)
          val n = counts(c).toDouble
          Array.tabulate(dim)(d => s(d) / n)
        }
      }
      it += 1
    }
    centers
  }

  /** Round half away from zero — the semantics BOTH Spark SQL's and
    * DuckDB's `round()` implement (scala's `math.round` rounds half toward
    * +∞, which disagrees on negative half-integers — a real hash-mismatch
    * vector for quantized embeddings).
    */
  def halfAwayRound(v: Double): Long =
    if (v >= 0) math.floor(v + 0.5).toLong else math.ceil(v - 0.5).toLong

  /** Lloyd's k-means in PURE INTEGER arithmetic over micro-quantized points
    * (each coordinate pre-rounded to an integer, e.g. 1e-4 units): integer
    * squared distances, ties to the lowest cell, centroid update by floor
    * division, empty cells keep their previous center, a FIXED iteration
    * count. Every step is order-independent or explicitly sequenced, so a
    * SQL engine restates the whole fit bit-for-bit — this is what converts
    * the IVF/semantic-dedup family from rows-only checks to hash-exact
    * oracle rows. Seeds are the same evenly-spaced sample indexes as
    * [[fit]].
    *
    * `floorDiv` here ≡ `floor(CAST(sum AS DOUBLE)/n)` in SQL: with |sum| ≤
    * sampleCap·|micro| ≪ 2^53 the double quotient is correctly rounded, and
    * a non-integer rational with denominator ≤ sampleCap sits ≥ 1/sampleCap
    * from any integer — far beyond one ulp — so the floors agree exactly.
    */
  def fitPortable(points: Array[Array[Long]], k: Int,
      iters: Int = 2): Array[Array[Long]] = {
    if (points.isEmpty) return Array.empty
    val kk = math.min(k, points.length)
    val dim = points(0).length
    var centers = Array.tabulate(kk)(i =>
      points(((i.toLong * points.length) / kk).toInt).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(kk)(new Array[Long](dim))
      val counts = new Array[Long](kk)
      points.foreach { p =>
        val c = nearestPortable(centers, p)
        val s = sums(c)
        var d = 0
        while (d < dim) { s(d) += p(d); d += 1 }
        counts(c) += 1
      }
      centers = Array.tabulate(kk) { c =>
        if (counts(c) == 0L) centers(c)
        else Array.tabulate(dim)(d => Math.floorDiv(sums(c)(d), counts(c)))
      }
      it += 1
    }
    centers
  }

  /** Integer-distance nearest center (ties to the lowest index). */
  def nearestPortable(centers: Array[Array[Long]], p: Array[Long]): Int = {
    var best = 0
    var bestDist = Long.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      var dist = 0L
      var d = 0
      while (d < p.length && d < ctr.length) {
        val diff = p(d) - ctr(d)
        dist += diff * diff
        d += 1
      }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }

  /** Index of the euclidean-nearest center (ties to the lowest index). */
  def nearest(centers: Array[Array[Double]], p: Array[Double]): Int = {
    var best = 0
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      var dist = 0.0
      var d = 0
      while (d < p.length && d < ctr.length) {
        val diff = p(d) - ctr(d)
        dist += diff * diff
        d += 1
      }
      if (dist < bestDist) { bestDist = dist; best = c }
      c += 1
    }
    best
  }

  /** The `nProbe` centers nearest to `q` by cosine (query-side probing uses
    * the ranking metric, not the assignment metric), ties to lowest index.
    */
  def probeCells(centers: Array[Array[Double]], q: Array[Double], nProbe: Int): Array[Int] = {
    def cos(c: Array[Double]): Double = {
      var dot = 0.0; var nq = 0.0; var nc = 0.0; var i = 0
      while (i < q.length && i < c.length) {
        dot += q(i) * c(i); nq += q(i) * q(i); nc += c(i) * c(i); i += 1
      }
      dot / (math.sqrt(nq) * math.sqrt(nc) + 1e-12)
    }
    centers.zipWithIndex.sortBy { case (c, i) => (-cos(c), i) }
      .take(nProbe).map(_._2)
  }

  /** Big-endian doubles, row-major — the Puffin blob payload. */
  def serialize(centers: Array[Array[Double]]): Array[Byte] = {
    val dim = if (centers.isEmpty) 0 else centers(0).length
    val buf = java.nio.ByteBuffer.allocate(centers.length * dim * 8)
    centers.foreach(_.foreach(buf.putDouble))
    buf.array()
  }

  def deserialize(bytes: Array[Byte], dim: Int): Array[Array[Double]] = {
    if (dim == 0) return Array.empty
    val buf = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / (dim * 8))(Array.fill(dim)(buf.getDouble))
  }
}

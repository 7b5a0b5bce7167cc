package graft.table

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.DataFrame

/** Distributed per-column NDV sketching with Apache DataSketches theta
  * sketches — the blob type the public Iceberg Puffin spec standardizes for
  * table statistics (`apache-datasketches-theta-v1`). The reference models
  * only the statistics-file METADATA (`table/statistics.go:56-85`) and never
  * computes contents; this is the compute side.
  *
  * Scale shape: one `mapPartitions` pass builds an UpdateSketch per column
  * per partition, then `treeReduce` unions them — only compact sketch bytes
  * (≤ ~32 KB per column at the default 4096 nominal entries) ever cross the
  * wire or reach the driver. A 100 TB scan ships KBs per task, and sketches
  * from DIFFERENT scans union losslessly, which is what makes incremental
  * ANALYZE (only-new-files) possible.
  */
object ThetaStats {

  /** Per-column results of one sketching pass. */
  final case class ColumnStats(sketch: Array[Byte], nullCount: Long) {
    def ndv: Long = math.round(estimate(sketch))
  }

  def estimate(sketchBytes: Array[Byte]): Double =
    Sketches.wrapCompactSketch(Memory.wrap(sketchBytes)).getEstimate

  def unionBytes(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val u: Union = SetOperation.builder().buildUnion()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(a)))
    u.union(Sketches.wrapCompactSketch(Memory.wrap(b)))
    u.getResult.toByteArrayCompressed
  }

  /** Theta update keyed by the column value. The mapping is deterministic
    * per type (and stable across runs), which keeps incremental unions
    * consistent with full recomputes. Dates/timestamps arrive from Spark
    * rows as java.sql/java.time values depending on session config — both
    * forms map to the same epoch-based long.
    */
  private def update(sk: UpdateSketch, v: Any): Unit = v match {
    case b: java.lang.Boolean => sk.update(if (b) 1L else 0L)
    case i: java.lang.Integer => sk.update(i.longValue())
    case l: java.lang.Long => sk.update(l.longValue())
    case s: java.lang.Short => sk.update(s.longValue())
    case b: java.lang.Byte => sk.update(b.longValue())
    case f: java.lang.Float => sk.update(f.doubleValue())
    case d: java.lang.Double => sk.update(d.doubleValue())
    case s: String => sk.update(s)
    case b: Array[Byte] => sk.update(b)
    case d: java.math.BigDecimal => sk.update(d.stripTrailingZeros.toPlainString)
    case d: BigDecimal => sk.update(d.underlying.stripTrailingZeros.toPlainString)
    case d: java.sql.Date => sk.update(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => sk.update(d.toEpochDay)
    case t: java.sql.Timestamp =>
      // floorDiv, not /: truncation-toward-zero maps pre-epoch fractional
      // seconds onto their positive mirror (-0.5s -> +500000us), colliding
      // with distinct values and diverging from the Instant branch below
      sk.update(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000)
    case t: java.time.Instant =>
      sk.update(t.getEpochSecond * 1000000L + t.getNano / 1000)
    case t: java.time.LocalDateTime =>
      val i = t.toInstant(java.time.ZoneOffset.UTC)
      sk.update(i.getEpochSecond * 1000000L + i.getNano / 1000)
    case other => sk.update(other.toString)
  }

  /** One distributed pass over `df` sketching every column. Returns one
    * ColumnStats per df column, in column order, plus the scanned row count.
    */
  def sketchColumns(df: DataFrame): (Seq[ColumnStats], Long) = {
    val n = df.schema.size
    require(n > 0, "no columns to sketch")
    val rdd = df.rdd
    if (rdd.getNumPartitions == 0)
      // empty table (e.g. ANALYZE after delete-all): record empty sketches
      // rather than letting treeReduce throw on an empty collection
      return (Seq.fill(n)(ColumnStats(
        UpdateSketch.builder().build().compact().toByteArrayCompressed, 0L)), 0L)
    val reduced = rdd
      .mapPartitions { rows =>
        val sks = Array.fill(n)(UpdateSketch.builder().build(): UpdateSketch)
        val nulls = new Array[Long](n)
        var count = 0L
        rows.foreach { row =>
          count += 1
          var i = 0
          while (i < n) {
            val v = row.get(i)
            if (v == null) nulls(i) += 1 else update(sks(i), v)
            i += 1
          }
        }
        Iterator.single((sks.map(s => s.compact().toByteArrayCompressed), nulls, count))
      }
      .treeReduce { case ((s1, n1, c1), (s2, n2, c2)) =>
        (s1.zip(s2).map { case (a, b) => unionBytes(a, b) },
          n1.zip(n2).map { case (a, b) => a + b }, c1 + c2)
      }
    val (sketches, nulls, count) = reduced
    (sketches.zip(nulls).map { case (s, nc) => ColumnStats(s, nc) }.toSeq, count)
  }
}

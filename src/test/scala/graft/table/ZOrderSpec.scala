package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Predicates => P, _}
import graft.functions.ZOrderOps.interleave2
import graft.meta._

/** The z-order clustering rewrite: bit-level properties of the interleaved
  * z-value, and the file-pruning advantage the rewrite buys — the layout
  * question that decides whether a 2-D box predicate reads 1/k of a 100 TB
  * table or all of it.
  */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("zorder-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def cmp(x: Array[Byte], y: Array[Byte]): Int = {
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  test("z-value is byte-lexicographically monotonic along each axis, signs included") {
    val probes = Seq(Long.MinValue, -100000L, -1L, 0L, 1L, 7L, 1000L,
      1L << 33, Long.MaxValue)
    for (fixed <- probes) {
      probes.sliding(2).foreach { case Seq(lo, hi) =>
        assert(cmp(interleave2(lo, fixed), interleave2(hi, fixed)) < 0,
          s"not monotone in a: a=$lo vs $hi at b=$fixed")
        assert(cmp(interleave2(fixed, lo), interleave2(fixed, hi)) < 0,
          s"not monotone in b: b=$lo vs $hi at a=$fixed")
      }
    }
    // exact interleaving: bits of a land on even positions (from the top).
    // a=0 (unsigned 0x80...) and b=-1 (unsigned 0x7f...f): the first byte
    // interleaves a's bits 10000000… with b's 01111111… → 10 01 01 01 …
    val z = interleave2(0L, -1L)
    assert((z(0) & 0xff) == 0x95, f"unexpected leading byte 0x${z(0) & 0xff}%02x")
    assert((z(1) & 0xff) == 0x55)
  }

  test("N-column interleave matches the 2-column form and stays monotonic at N=3") {
    import graft.functions.ZOrderOps.interleave
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val probes = Seq(Long.MinValue, -100000L, -1L, 0L, 1L, 7L, 1000L,
      1L << 33, Long.MaxValue)
    // N=2 of the general form is bit-identical to interleave2
    for (a <- probes; b <- probes)
      assert(java.util.Arrays.equals(
        interleave(new GenericArrayData(Array(a, b))), interleave2(a, b)),
        s"general N=2 diverges from interleave2 at ($a, $b)")
    // N=3: byte-lexicographic monotonicity along each axis
    for (axis <- 0 until 3; fixed <- Seq(-5L, 0L, 1L << 40)) {
      probes.sliding(2).foreach { case Seq(lo, hi) =>
        def vec(v: Long) = {
          val arr = Array.fill(3)(fixed); arr(axis) = v
          new GenericArrayData(arr)
        }
        assert(cmp(interleave(vec(lo)), interleave(vec(hi))) < 0,
          s"N=3 not monotone on axis $axis: $lo vs $hi at fixed=$fixed")
      }
    }
  }

  test("zorder() rejects non-integral columns at analysis and keeps nulls distinct from Long.MinValue") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(4).selectExpr(
      "id", "cast(id as double) d", "cast(null as bigint) nl",
      s"cast(${Long.MinValue}L as bigint) mn")
    // double would silently truncate toward zero — must fail analysis,
    // not mangle the clustering order
    val ex = intercept[Exception] {
      df.select(graft.functions.ZOrderExprs.zorder(col("id"), col("d"))).collect()
    }
    assert(ex.getMessage.contains("zorder needs int/long/date"))
    // NULL clusters at the bottom but does NOT collide with a genuine
    // Long.MinValue value (which saturates to MinValue+1)
    val rows = df.select(
      graft.functions.ZOrderExprs.zorder(col("nl"), col("id")).as("znull"),
      graft.functions.ZOrderExprs.zorder(col("mn"), col("id")).as("zmin")).head()
    assert(!java.util.Arrays.equals(
      rows.getAs[Array[Byte]]("znull"), rows.getAs[Array[Byte]]("zmin")))
    assert(cmp(rows.getAs[Array[Byte]]("znull"), rows.getAs[Array[Byte]]("zmin")) < 0)
  }

  test("z-order rewrite prunes second-dimension predicates a linear layout cannot") {
    val s = spark
    import s.implicits._
    val rows = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val df = rows.toDF("x", "y")
    val schema = SchemaConv.fromSpark(df.schema)
    val wh = Files.createTempDirectory("graft-zwh").toString
    val catalog = new FileCatalog(wh)
    // linear layout: 16 files, each a contiguous x-range (all y values)
    val linear = IceTable.create(catalog, "grid_linear", schema)
    linear.append(df.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    linear.refresh()
    // z layout: same data, clustered by the rewrite under test
    val zt = IceTable.create(catalog, "grid_z", schema)
    zt.append(df.repartitionByRange(16, col("x")))
    zt.refresh()
    zt.rewriteZOrdered(spark, "x", "y", targetFileCount = 16)
    zt.refresh()
    assert(zt.newScan().planFiles().size == 16)
    // rows must be exactly preserved by the rewrite
    assert(zt.newScan().toDF(spark).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet == rows.toSet)
    // a predicate on the SECOND dimension only: the linear layout cannot
    // prune a single file (every x-range file holds all y), while z-curve
    // footer bounds confine y<8 to the quarter of z-space where the two
    // leading y-bits are 0
    val yOnly = P.ltEq("y", 7L)
    val linPlanned = linear.newScan(yOnly).planFiles().size
    val zPlanned = zt.newScan(yOnly).planFiles().size
    assert(linPlanned == 16, s"expected no pruning on linear layout, got $linPlanned")
    assert(zPlanned <= 8, s"z layout should prune y-only boxes, planned $zPlanned")
    // and a genuine 2-D box prunes deeper still
    val box = P.ltEq("y", 7L).and(P.ltEq("x", 7L))
    assert(zt.newScan(box).planFiles().size <= 4)
    // correctness of the pruned scan itself
    assert(zt.newScan(yOnly).toDF(spark).where(col("y") <= 7).count() == 64L * 8)
  }
}

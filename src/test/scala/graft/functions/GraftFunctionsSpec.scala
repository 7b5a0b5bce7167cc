package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{BucketTransform, Murmur3}

/** The SQL function surface: expressions injected via the
  * SparkSessionExtensions seam (this suite's session is BUILT with
  * `GraftExtensions`) and via imperative registration, both resolving to
  * the same native codegen expressions the DataFrame API uses.
  */
class GraftFunctionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-functions-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the builder may have returned a pre-existing session (suites share the
    // JVM) where the extension never ran — imperative registration covers it
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("graft_bucket matches the spec transform over SQL") {
    val s = spark
    import s.implicits._
    Seq(34L, 0L, -1L, 1234567890L).toDF("v").createOrReplaceTempView("bucket_in")
    val viaSql = spark.sql("SELECT v, graft_bucket(v, 16) AS b FROM bucket_in")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    viaSql.foreach { case (v, b) => assert(b == Murmur3.bucketLong(v, 16)) }
    // and the DataFrame-side transform produces the same buckets
    val viaTransform = BucketTransform(16)
    val col = viaTransform.toColumn(org.apache.spark.sql.functions.col("v"),
      graft.core.IceLong)
    val dfSide = Seq(34L, 0L, -1L, 1234567890L).toDF("v")
      .select($"v", col.as("b")).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql == dfSide)
  }

  test("graft_cosine_sim and graft_equal_frac evaluate in SQL") {
    val sim = spark.sql(
      "SELECT graft_cosine_sim(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c").head.getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-9)
    val ortho = spark.sql(
      "SELECT graft_cosine_sim(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS c").head.getDouble(0)
    assert(math.abs(ortho) < 1e-9)
    val frac = spark.sql(
      "SELECT graft_equal_frac(array(1L, 2L, 3L, 4L), array(1L, 9L, 3L, 8L)) AS f")
      .head.getDouble(0)
    assert(math.abs(frac - 0.5) < 1e-9)
  }

  test("graft_top_k_by_score aggregates per group, ranked (score desc, id asc)") {
    val rows = spark.sql("""
      SELECT g, graft_top_k_by_score(s, i, 2) AS top FROM VALUES
        (1, 0.5D, 10L), (1, 0.9D, 11L), (1, 0.9D, 7L), (1, 0.1D, 12L),
        (2, 0.3D, 20L)
      AS t(g, s, i) GROUP BY g ORDER BY g""").collect()
    val g1 = rows(0).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getDouble(1)))
    // ties on score break by SMALLER id first; k=2 bounds the group
    assert(g1 == Seq((7L, 0.9), (11L, 0.9)))
    val g2 = rows(1).getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(g2 == Seq((20L, 0.3)))
  }

  test("top-k aggregate buffer survives the shuffle serialize/deserialize round-trip") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val agg = graft.functions.TopKByScore(
      Literal.default(DoubleType), Literal.default(LongType), 3)
    val buf = agg.createAggregationBuffer()
    Seq((0.5, 10L), (0.9, 11L), (0.9, 7L), (0.1, 12L), (Double.NaN, 5L))
      .foreach { case (s, i) => buf.offer(s, i) }
    val restored = agg.deserialize(agg.serialize(buf))
    // compare through doubleToLongBits: a tuple == on (NaN, id) is always
    // false under IEEE NaN semantics even for identical entries
    def bits(e: (Double, Long)) = (java.lang.Double.doubleToLongBits(e._1), e._2)
    assert(restored.sortedBestFirst.map(bits).toSeq ==
      buf.sortedBestFirst.map(bits).toSeq)
    // NaN ranks LARGEST (the SQL descending-sort contract), ties by id
    assert(buf.sortedBestFirst.map(_._2).toSeq == Seq(5L, 7L, 11L))
    // merging two buffers equals offering the union
    val other = agg.createAggregationBuffer()
    Seq((0.95, 2L), (0.2, 3L)).foreach { case (s, i) => other.offer(s, i) }
    val merged = agg.merge(buf, other)
    assert(merged.sortedBestFirst.map(_._2).toSeq == Seq(5L, 2L, 7L))
  }

  test("graft_zorder2 and graft_zorder evaluate in SQL and agree") {
    val z2 = spark.sql("SELECT graft_zorder2(0L, -1L) AS z").head.getAs[Array[Byte]](0)
    assert((z2(0) & 0xff) == 0x95 && (z2(1) & 0xff) == 0x55,
      "SQL zorder2 diverges from the pinned bit layout")
    val zn = spark.sql("SELECT graft_zorder(array(0L, -1L)) AS z").head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(z2, zn), "array form diverges from pairwise form")
    // 3-col form produces 24 bytes
    val z3 = spark.sql("SELECT graft_zorder(array(1L, 2L, 3L)) AS z").head.getAs[Array[Byte]](0)
    assert(z3.length == 24)
  }

  test("IVF assign/probe expressions agree with the driver-side codebook math") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centers = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0 until 200).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat).toSeq))
    val df = vecs.toDF("id", "v")
      .select(col("id"),
        IvfExprs.ivfAssign(col("v"), centers).as("cell"),
        IvfExprs.ivfProbe(col("v"), centers, 3).as("probes"))
    val rows = df.collect().map(r =>
      r.getLong(0) -> (r.getInt(1), r.getSeq[Int](2))).toMap
    vecs.foreach { case (id, v) =>
      val d = v.map(_.toDouble).toArray
      assert(rows(id)._1 == IvfCodebook.nearest(centers, d), s"assign mismatch id=$id")
      assert(rows(id)._2 == IvfCodebook.probeCells(centers, d, 3).toSeq,
        s"probe mismatch id=$id")
    }
  }

  test("graft_truncate_binary prefixes bytes; literal arity is validated") {
    val out = spark.sql(
      "SELECT graft_truncate_binary(CAST('abcdef' AS BINARY), 3) AS t")
      .head.getAs[Array[Byte]](0)
    assert(new String(out, "UTF-8") == "abc")
    val e = intercept[Exception](spark.sql("SELECT graft_bucket(1L, 1 + 1)").collect())
    assert(e.getMessage.contains("literal"))
  }
}

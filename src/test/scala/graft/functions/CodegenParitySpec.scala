package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Codegen vs interpreted parity for every custom Catalyst expression: the
  * generated code (`doGenCode`) and the interpreted path (`nullSafeEval`)
  * are separate implementations of the same function, and a divergence is
  * silent wrong answers whenever Spark falls back to interpretation
  * (codegen compile failures, >64KB methods, expression-tree limits). Run
  * one adversarial frame through every expression under the default
  * codegen mode and under NO_CODEGEN + wholeStage off, and require
  * byte-identical results.
  */
class CodegenParitySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val rnd = new scala.util.Random(31337)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("codegen-parity-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def randomWord(): String = {
    val sb = new java.lang.StringBuilder
    (0 until 1 + rnd.nextInt(5)).foreach(_ => sb.appendCodePoint(
      if (rnd.nextInt(5) == 0) 0x1F600 + rnd.nextInt(32) else 'a' + rnd.nextInt(26)))
    sb.toString
  }

  private def fixture: DataFrame = {
    val rows = (0 until 200).map { n =>
      val i: Integer = if (rnd.nextInt(10) == 0) null else Int.box(rnd.nextInt())
      val l: java.lang.Long =
        if (rnd.nextInt(10) == 0) null else Long.box(rnd.nextLong())
      val s: String = rnd.nextInt(10) match {
        case 0 => null
        case 1 => ""
        case _ => randomWord()
      }
      val ws: Seq[String] =
        if (rnd.nextInt(12) == 0) Seq.empty
        else Seq.fill(1 + rnd.nextInt(8))(randomWord())
      val ws2: Seq[String] = Seq.fill(1 + rnd.nextInt(8))(randomWord())
      val bin: Array[Byte] = {
        val b = new Array[Byte](rnd.nextInt(8)); rnd.nextBytes(b); b
      }
      val va: Seq[Float] = Seq.fill(8)(rnd.nextFloat() * 2 - 1)
      val vb: Seq[Float] = Seq.fill(8)(rnd.nextFloat() * 2 - 1)
      val codes: Seq[Long] = Seq.fill(64)((rnd.nextInt(255) - 127).toLong)
      val score: Double =
        if (rnd.nextInt(15) == 0) Double.NaN else rnd.nextDouble() * 100
      Row(n.toLong, n % 7, i, l, s, ws, ws2, bin, va, vb, codes, score)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("g", IntegerType, nullable = false),
        StructField("i", IntegerType),
        StructField("l", LongType),
        StructField("s", StringType),
        StructField("ws", ArrayType(StringType, containsNull = false)),
        StructField("ws2", ArrayType(StringType, containsNull = false)),
        StructField("bin", BinaryType),
        StructField("va", ArrayType(FloatType, containsNull = false)),
        StructField("vb", ArrayType(FloatType, containsNull = false)),
        StructField("codes", ArrayType(LongType, containsNull = false)),
        StructField("score", DoubleType, nullable = false))))
  }

  private def canonRow(r: Row): String =
    (0 until r.length).map { j =>
      r.get(j) match {
        case null => "∅"
        case b: Array[Byte] => b.mkString("[", ",", "]")
        case other => other.toString
      }
    }.mkString("|")

  private def withInterpreter[A](body: => A): A = {
    val ws0 = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try body
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", ws0)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("every custom expression returns identical results codegen vs interpreted") {
    import org.apache.spark.sql.graftshim.GraftShim.{column, expression}
    val df = fixture.cache()
    df.count()
    def projected: DataFrame = df.selectExpr(
      "id", "codes",
      "graft_bucket(i, 16) AS b_i",
      "graft_bucket(l, 16) AS b_l",
      "graft_bucket(s, 16) AS b_s",
      "graft_truncate_binary(bin, 3) AS tb",
      "graft_cosine_sim(va, vb) AS cs",
      "graft_minhash_sig(ws) AS sig",
      "graft_minhash_sig(ws2) AS sig2",
      "graft_simhash(ws) AS sh",
      "graft_equal_frac(graft_minhash_sig(ws), graft_minhash_sig(ws2)) AS ef",
      "graft_zorder2(i, l) AS z2",
      "graft_zorder(array(l, id)) AS zn")
      .withColumn("buckets", column(LshBucketsExpr(expression(
        org.apache.spark.sql.functions.col("codes")))))
      .drop("codes")
    def topk: DataFrame = df.groupBy("g")
      .agg(org.apache.spark.sql.functions.expr(
        "graft_top_k_by_score(score, id, 3)").as("top"))
    def canon(d: DataFrame): Seq[String] = d.collect().map(canonRow).toSeq.sorted

    val (projGen, topGen) = (canon(projected), canon(topk))
    val (projInt, topInt) = withInterpreter((canon(projected), canon(topk)))
    assert(projGen.size == 200)
    projGen.zip(projInt).zipWithIndex.foreach { case ((a, b), n) =>
      assert(a == b, s"scalar expression row $n diverges:\n codegen=$a\n interp=$b")
    }
    topGen.zip(topInt).foreach { case (a, b) =>
      assert(a == b, s"top-k aggregate diverges:\n codegen=$a\n interp=$b")
    }
    df.unpersist()
  }
}

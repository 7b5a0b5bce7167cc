package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The driver REGENERATES /root/testdata between rounds, and physical
  * schemas have drifted before (events.ts shipped as TIMESTAMP(NANOS) one
  * round and TIMESTAMP(MICROS) the next, silently breaking six queries for
  * a whole round). This suite pins the READ-NORMALIZED schema of every
  * driver table — the contract all queries and green oracle compares were
  * built against — so any regeneration that shifts what [[QueryDef.t]]
  * yields fails HERE, loudly and attributably, instead of surfacing as
  * cryptic per-query breakage.
  *
  * Pinning the normalized (not physical) schema is deliberate: a physical
  * change the reader absorbs (nanos vs micros events) stays green, which is
  * exactly the absorb-or-alarm boundary the engine promises.
  */
final class TestdataDriftSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("testdata-drift-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // events.ts is the one column QueryDef.t actively normalizes: whatever
    // physical unit the driver generated, the read side must yield a plain
    // session-tz TIMESTAMP (EventsSchemaSpec proves both units map here)
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
      "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>",
      "label" -> "int"))

  expected.foreach { case (table, cols) =>
    test(s"driver table '$table' reads with the pinned normalized schema") {
      val got = QueryDef.t(spark, sfDir, table).schema.fields
        .map(f => f.name -> f.dataType.simpleString).toSeq
      assert(got == cols,
        s"\nTESTDATA DRIFT on '$table' — the driver regenerated the file " +
          s"with a different shape.\n  expected: $cols\n  read:     $got\n" +
          "Audit every reader of this table before re-pinning (see " +
          "graft-bench-hazards: round 9 lost six queries to exactly this).")
    }
  }

  test("no driver table appeared or vanished") {
    val present = new java.io.File(sfDir).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet")).toSet
    assert(present == expected.keySet,
      s"table set drifted: new=${present -- expected.keySet} " +
        s"missing=${expected.keySet -- present}")
  }
}

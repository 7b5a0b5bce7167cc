package graft.ops

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Randomized cross-check laws for the analytics operators: on seeded
  * random inputs, each distributed plan must equal an independent
  * brute-force Scala reimplementation of its contract. The fixed oracles
  * pin the registered queries on the driver testdata; these laws pin the
  * SEMANTICS on adversarially-shaped random data (duplicate timestamps,
  * tie values, dominance chains) where a plan bug could hide between the
  * testdata's regularities.
  */
class AnalyticsLawSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("analytics-law-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("skyline law: window plan equals brute-force dominance on random orders") {
    val rnd = new scala.util.Random(0xA11C)
    // coarse grids force duplicate dates, duplicate prices, and exact
    // duplicate points — every tie case the window plan must keep right
    val rows = (1 to 400).map { i =>
      (i.toLong, 86400L * rnd.nextInt(12), (rnd.nextInt(40) + 1) * 100L)
    }
    val dir = Files.createTempDirectory("graft-law-sky").toString
    val sq = spark
    import sq.implicits._
    rows.map { case (k, daySec, cents) =>
      (k, new Timestamp(daySec * 1000L), cents / 100.0)
    }.toDF("o_orderkey", "o_orderdate", "o_totalprice")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    val got = Analytics.orderSkyline(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val expect = rows.filter { case (_, d, p) =>
      !rows.exists { case (_, d2, p2) =>
        d2 <= d && p2 <= p && (d2 < d || p2 < p)
      }
    }.map(_._1).toSet
    assert(got === expect)
    assert(got.nonEmpty && got.size < rows.size)
  }

  test("retention law: cohort matrix equals brute force on random activity") {
    val rnd = new scala.util.Random(0xBEEF)
    val rows = (1 to 600).map { i =>
      (i.toLong, rnd.nextInt(40).toLong, 86400L * rnd.nextInt(35) + rnd.nextInt(86400))
    }
    val dir = Files.createTempDirectory("graft-law-ret").toString
    val sq = spark
    import sq.implicits._
    rows.map { case (id, u, sec) =>
      (id, new Timestamp(sec * 1000L), u, "view", 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val got = Analytics.retention(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // brute force: cohort = first active week, activity counted distinct
    val wk = rows.map { case (_, u, sec) => (u, sec * 1000000L / 604800000000L) }.distinct
    val cohort = wk.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val expect = wk.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .map { case (k, us) => k -> us.map(_._1).distinct.size.toLong }
    assert(got === expect)
  }

  test("k-means law: distributed integer Lloyd's equals a sequential reimplementation") {
    val rnd = new scala.util.Random(0xD00D)
    // clumpy random vectors (4 loose blobs) with exact duplicates planted
    val base = Array.fill(4)(Array.fill(64)(rnd.nextInt(9000) - 4500))
    val vecs: Seq[(Long, Array[Float])] = (0 until 120).map { i =>
      val b = base(rnd.nextInt(4))
      val v = b.map(x => (x + rnd.nextInt(400) - 200) / 10000.0f)
      (i.toLong, v)
    }
    val dir = Files.createTempDirectory("graft-law-km").toString
    val sq = spark
    import sq.implicits._
    vecs.map { case (id, v) => (id, v.toSeq, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    val got = Analytics.kmeansCorpus(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)

    // sequential reimplementation of the exact stated contract
    val m = vecs.map { case (id, v) =>
      id -> v.map(x => math.round(x.toDouble * 10000))
    }.sortBy(_._1)
    var centers: Array[Array[Long]] = m.take(8).map(_._2.clone()).toArray
    def d2(a: Array[Long], c: Array[Long]): Long =
      a.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(v: Array[Long]): Int =
      centers.zipWithIndex.map { case (c, j) => (d2(v, c), j) }.min._2
    for (_ <- 1 to 2) {
      val groups = m.groupBy { case (_, v) => assign(v) }
      centers = centers.zipWithIndex.map { case (c, j) =>
        groups.get(j) match {
          case None => c
          case Some(members) =>
            (0 until 64).map { d =>
              math.floor(members.map(_._2(d)).sum.toDouble / members.size).toLong
            }.toArray
        }
      }
    }
    val expect = m.groupBy { case (_, v) => assign(v) }.toSeq
      .map { case (j, members) =>
        (j.toLong, members.size.toLong,
          members.map { case (_, v) => d2(v, centers(j)) }.sum)
      }.sortBy(_._1)
    assert(got.toSeq === expect)
  }

  test("pagerank law: distributed fixed-point iteration equals a sequential one") {
    val rnd = new scala.util.Random(0xFACE)
    val rows = (1 to 300).map { i =>
      (i.toLong, i.toLong * 60, rnd.nextInt(4).toLong, rnd.nextInt(12))
    }
    val dir = Files.createTempDirectory("graft-law-pr").toString
    val sq = spark
    import sq.implicits._
    rows.map { case (id, sec, u, k) =>
      (id, new Timestamp(sec * 1000L), u, "view", 0.0, s"""{"k": $k}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val got = Analytics.itemPagerank(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)

    // sequential restatement of the exact integer update rule
    val ordered = rows.sortBy(r => (r._3, r._2, r._1)) // (user, ts, id)
    val edges = scala.collection.mutable.Map.empty[(Long, Long), Long]
    ordered.groupBy(_._3).foreach { case (_, evs) =>
      evs.map(_._4.toLong).sliding(2).foreach {
        case Seq(a, b) if a != b => edges((a, b)) = edges.getOrElse((a, b), 0L) + 1
        case _ => ()
      }
    }
    val nodes = rows.map(_._4.toLong).distinct.sorted
    val n = nodes.size.toLong
    val ow = edges.toSeq.groupBy(_._1._1).map { case (s, es) => s -> es.map(_._2).sum }
    var rank = nodes.map(_ -> 1000000000000L / n).toMap
    for (_ <- 1 to 3) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case ((s, d), w) =>
        contrib(d) = contrib.getOrElse(d, 0L) + rank(s) * w / ow(s)
      }
      rank = nodes.map(v =>
        v -> (3L * 1000000000000L / (20L * n) + 17L * contrib.getOrElse(v, 0L) / 20L)).toMap
    }
    assert(got.toSeq === nodes.map(v => (v, rank(v))))
  }

  test("triangles law: oriented 3-join count equals brute-force enumeration") {
    val rnd = new scala.util.Random(0x7121)
    // one long random walk → dense-ish small graph with many triangles
    val walk = (1 to 400).map(_ => rnd.nextInt(10).toLong)
    val dir = Files.createTempDirectory("graft-law-tri").toString
    val sq = spark
    import sq.implicits._
    walk.zipWithIndex.map { case (k, i) =>
      (i.toLong + 1, new Timestamp(60000L * i), 1L, "view", 0.0, s"""{"k": $k}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val got = Analytics.itemTriangles(spark, dir).collect().head
    val edges = walk.sliding(2).collect {
      case Seq(a, b) if a != b => (a min b, a max b)
    }.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tri = (for {
      i <- nodes.indices; j <- i + 1 until nodes.size; k <- j + 1 until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if edges((a, b)) && edges((b, c)) && edges((a, c))
    } yield 1).size.toLong
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ===
      ((tri, edges.size.toLong, nodes.size.toLong)))
    assert(tri > 0, "fixture should contain triangles")
  }

  test("frequent-pairs law: session co-occurrence equals brute force with ties") {
    val rnd = new scala.util.Random(0xCAFE)
    // a few users, bursty timestamps with >30-minute gaps planted
    val rows = (1 to 500).map { i =>
      val u = rnd.nextInt(6).toLong
      val sec = rnd.nextInt(5) * 3600L + rnd.nextInt(300) // 5 bursts per user
      (i.toLong, sec, u, rnd.nextInt(8).toLong)
    }
    val dir = Files.createTempDirectory("graft-law-fp").toString
    val sq = spark
    import sq.implicits._
    rows.map { case (id, sec, u, k) =>
      (id, new Timestamp(sec * 1000L), u, "view", 0.0, s"""{"k": $k}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    val got = Analytics.frequentPairs(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    // brute force: sessionize per user on the (ts, event_id) order with the
    // 30-minute gap rule, then count distinct per-session pairs
    val support = rows.groupBy(_._3).toSeq.flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._1))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer.empty[Long])
      var prev = Long.MinValue
      ordered.foreach { case (_, sec, _, k) =>
        if (prev != Long.MinValue && sec - prev > 1800) sessions +=
          scala.collection.mutable.ArrayBuffer.empty[Long]
        sessions.last += k
        prev = sec
      }
      sessions.flatMap { items =>
        val d = items.distinct.sorted
        for (i <- d.indices; j <- i + 1 until d.size) yield (d(i), d(j))
      }
    }.groupBy(identity).map { case (p, occ) => p -> occ.size.toLong }
    val expectTop = support.toSeq
      .sortBy { case ((a, b), s) => (-s, a, b) }.take(20)
      .map { case (p, s) => (p, s) }
    assert(got.toSeq === expectTop)
  }
}

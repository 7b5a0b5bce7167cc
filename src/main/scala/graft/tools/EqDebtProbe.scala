package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum, xxhash64}

import graft.core.SchemaConv
import graft.meta.FileCatalog
import graft.table.IceTable

/** Equality-delete debt probe: quantify what the eq→DV conversion
  * ([[IceTable.rewritePositionDeletes]]) buys a long-running upsert/CDC
  * stream. A table accumulating R upsert rounds carries R equality-delete
  * sets, and EVERY subsequent scan pays one anti-join per set; converting
  * the debt to deletion vectors makes later scans pay one bitmap per file
  * instead. The probe measures scan wall time (min-of-3) and planFiles
  * time before and after the conversion, and asserts the scanned rows are
  * identical (count + order-free checksum).
  *
  * Usage: `runMain graft.tools.EqDebtProbe [rows] [rounds]`
  * (default 200000 rows, 32 rounds). Findings go to BENCH_NOTES.md.
  */
object EqDebtProbe {

  private def timedMinMs[A](reps: Int)(body: => A): (A, Double) = {
    var best = Double.MaxValue
    var last: A = null.asInstanceOf[A]
    (0 until reps).foreach { _ =>
      val t0 = System.nanoTime()
      last = body
      best = math.min(best, (System.nanoTime() - t0) / 1e6)
    }
    (last, best)
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(200000)
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = graft.GraftSession.prepare(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // fixed-work ambient anchor (r19 nit 3): conversion-cost drift across
    // rounds is only attributable next to the same window's calibration
    val cal = Calibration.run(spark)
    println(f"""{"probe":"eq-debt-cal","cpu_ms":${cal.cpuMs}%.1f,"spark_ms":${cal.sparkMs}%.1f}""")

    val wh = Files.createTempDirectory("graft-eqdebt").toString
    val t = {
      val seed = spark.range(rows.toLong)
        .select(col("id").as("k"), (col("id") * 7L).as("v"),
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit("row-"), col("id")).as("txt"))
        .repartition(8)
      val tbl = IceTable.create(new FileCatalog(wh), "eqdebt",
        SchemaConv.fromSpark(seed.schema))
      tbl.append(seed)
      tbl.refresh()
      tbl
    }

    // R upsert rounds over a shared key space: each accumulates one
    // equality-delete set the next scan must anti-join against
    val rnd = new scala.util.Random(42)
    (0 until rounds).foreach { r =>
      val keys = Seq.fill(rows / 40)(rnd.nextInt(rows).toLong).distinct
      t.upsert(spark,
        keys.map(k => (k, r.toLong * 1000000L + k, s"r$r-$k")).toDF("k", "v", "txt"),
        Seq("k"))
      t.refresh()
    }

    def checksum(): (Long, Long) = {
      val r = t.scan(spark)
        .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
          // bounded per-row term so the ANSI sum cannot overflow a long
          sum(org.apache.spark.sql.functions.pmod(
            xxhash64(col("k"), col("v"), col("txt")),
            org.apache.spark.sql.functions.lit(1000000007L))))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    val eqSetsBefore = t.newScan().planFiles()
      .flatMap(_.eqDeletes.map(_._1.filePath)).distinct.size
    val (_, planBeforeMs) = timedMinMs(3)(t.newScan().planFiles())
    val (before, scanBeforeMs) = timedMinMs(3)(checksum())

    // single-shot timer, NOT timedMinMs: the body COMMITS a snapshot, so a
    // repeat would re-run the maintenance against an already-converted
    // table (the require would fail on the second, no-op pass)
    val convertT0 = System.nanoTime()
    require(t.rewritePositionDeletes(spark).isDefined, "conversion was a no-op")
    t.refresh()
    val convertMs = (System.nanoTime() - convertT0) / 1e6
    require(t.newScan().planFiles().forall(_.eqDeletes.isEmpty),
      "equality debt survived the conversion")

    val (_, planAfterMs) = timedMinMs(3)(t.newScan().planFiles())
    val (after, scanAfterMs) = timedMinMs(3)(checksum())
    require(before == after, s"conversion changed the scan: $before vs $after")

    println(s"""{"probe":"eq-debt","rows":$rows,"rounds":$rounds,""" +
      s""""eq_delete_files":$eqSetsBefore,""" +
      s""""scan_before_ms":${f"$scanBeforeMs%.0f"},"scan_after_ms":${f"$scanAfterMs%.0f"},""" +
      s""""plan_before_ms":${f"$planBeforeMs%.1f"},"plan_after_ms":${f"$planAfterMs%.1f"},""" +
      s""""convert_ms":${f"$convertMs%.0f"},""" +
      s""""live_rows":${before._1},""" +
      s""""scan_speedup":"${f"${scanBeforeMs / math.max(scanAfterMs, 0.001)}%.1fx"}"}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    spark.stop()
  }
}

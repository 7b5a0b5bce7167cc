package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.{BucketTransform, SchemaConv}
import graft.meta.{FileCatalog, PartitionSpec}
import graft.table.IceTable

/** Quantifies what partition-SCOPED upsert equality deletes (r19) buy a
  * partitioned CDC sink over the global-scope posture: two tables with
  * IDENTICAL rows and upsert history — one bucket(k, B)-partitioned (the
  * write-side gate engages, deletes scope to their bucket), one
  * unpartitioned (every delete is global) — then the read-side cost after
  * R rounds, both as deterministic plan metadata (how many delete files
  * each data file anti-joins, the number that grows O(R) per scan under
  * global scope regardless of partition) and as measured scan wall.
  *
  * At 100 TB the metadata number IS the claim: under global scope every
  * partition's scan pays every accumulated delete file table-wide until
  * maintenance runs; under scoping each pays only its own partition's.
  *
  * Run: sbt "runMain graft.tools.ScopedDeleteProbe [rows] [rounds] [buckets]"
  * (defaults 200000, 16, 16). Findings go to BENCH_NOTES.md.
  */
object ScopedDeleteProbe {

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
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val buckets = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    val spark = graft.GraftSession.prepare(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    val wh = Files.createTempDirectory("graft-scoped-probe").toString
    val catalog = new FileCatalog(wh)
    val base = spark.range(0, rows.toLong, 1, 32)
      .select(col("id").as("k"), (col("id") * 7L).as("v"),
        concat(lit("txt-"), col("id")).as("txt"))
    val schema = SchemaConv.fromSpark(base.schema)
    val spec = PartitionSpec.of(0, ("k", BucketTransform(buckets), "kb"))(schema)
    val scoped = IceTable.create(catalog, "sink_scoped", schema, spec)
    val global = IceTable.create(catalog, "sink_global", schema)

    def driveRange(t: IceTable, from: Int, until: Int): Unit =
      (from until until).foreach { r =>
        // each round updates a deterministic 1/rounds slice of the keys —
        // the steady-state CDC shape (every partition touched every round)
        val delta = base.where(col("k") % rounds === r)
          .withColumn("v", col("v") + lit(1000000L * (r + 1)))
        t.upsert(spark, delta, Seq("k"))
        t.refresh()
      }
    def drive(t: IceTable): Unit = {
      t.upsert(spark, base, Seq("k"))
      t.refresh()
      driveRange(t, 0, rounds)
    }
    drive(scoped)
    drive(global)

    // the EVOLVED sink (r20): same history length, but the spec evolves
    // mid-stream and a full compaction rewrites the live set under the new
    // spec — the live-state gate must fall back to global for the rounds
    // while old-spec files are live, then RE-ENGAGE scoping afterwards
    // (the old spec-history gate stayed global forever)
    val evolved = IceTable.create(catalog, "sink_evolved", schema,
      PartitionSpec.of(0,
        ("k", BucketTransform(math.max(2, buckets / 2)), "kb"))(schema))
    evolved.upsert(spark, base, Seq("k"))
    evolved.refresh()
    driveRange(evolved, 0, rounds / 2)
    evolved.updateSpec(("k", BucketTransform(buckets), "kb2"))
    evolved.refresh()
    driveRange(evolved, rounds / 2, rounds / 2 + 2) // global while spec-0 files live
    evolved.compact(spark, targetFileCount = buckets)
    evolved.refresh()
    driveRange(evolved, rounds / 2 + 2, rounds) // scoped again

    def audit(name: String, t: IceTable): (Long, Int, Long, Double) = {
      val tasks = t.newScan().planFiles()
      val sumEq = tasks.map(_.eqDeletes.size.toLong).sum
      val maxEq = tasks.map(_.eqDeletes.size).max
      val (cnt, wallMs) = timedMinMs(3) {
        val df = t.scan(spark)
        df.agg(count(lit(1)), sum(col("v"))).collect()(0).getLong(0)
      }
      println(f"""[scoped-probe] {"table":"$name","tasks":${tasks.size},""" +
        f""""eq_files":${tasks.flatMap(_.eqDeletes.map(_._1.filePath)).distinct.size},""" +
        f""""sum_antijoin_inputs":$sumEq,"max_per_task":$maxEq,""" +
        f""""live_rows":$cnt,"scan_ms":$wallMs%.0f}""")
      (sumEq, maxEq, cnt, wallMs)
    }
    val (sumS, _, cntS, wallS) = audit("scoped", scoped)
    val (sumG, _, cntG, wallG) = audit("global", global)
    val (sumE, maxE, cntE, _) = audit("evolved", evolved)
    require(cntS == cntG && cntS == rows.toLong,
      s"row mismatch: scoped=$cntS global=$cntG expected=$rows")
    require(cntE == rows.toLong, s"evolved row mismatch: $cntE expected=$rows")
    // identical values on every sink — scope choices must be invisible
    val chkS = scoped.scan(spark).agg(sum(col("v"))).collect()(0).getLong(0)
    val chkG = global.scan(spark).agg(sum(col("v"))).collect()(0).getLong(0)
    val chkE = evolved.scan(spark).agg(sum(col("v"))).collect()(0).getLong(0)
    require(chkS == chkG && chkS == chkE,
      s"value checksum mismatch: $chkS vs $chkG vs $chkE")
    // post-compaction scoping is VISIBLE in the evolved sink's plan: no
    // task anti-joins the full delete-file set
    val eqFilesE = evolved.newScan().planFiles()
      .flatMap(_.eqDeletes.map(_._1.filePath)).distinct.size
    require(eqFilesE > 0 && maxE < eqFilesE,
      s"evolved sink did not re-engage scoping: max_per_task=$maxE of $eqFilesE files")
    println(f"""[scoped-probe] {"antijoin_input_ratio":"${sumG.toDouble / math.max(1L, sumS)}%.1fx",""" +
      f""""scan_speedup":"${wallG / wallS}%.2fx"}""")
    spark.stop()
  }
}

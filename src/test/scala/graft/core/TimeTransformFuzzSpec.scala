package graft.core

import java.time.{Instant, LocalDate, ZoneOffset}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Tri-modal differential for the time transforms over random values: the
  * JVM `apply` path (pruning, partition projection, addFiles inference),
  * the Catalyst `toColumn` path (the write-side partition tuple), and an
  * independent java.time recomputation must agree on every value — a
  * JVM/Catalyst disagreement silently corrupts pruning, because files are
  * placed by one implementation and pruned by the other. Random values
  * span ±270 years around the epoch, where floor-vs-truncate division
  * disagrees for every negative value. Bucket parity rides along for
  * int/long/string. Seeded, so failures reproduce.
  */
class TimeTransformFuzzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  // default seed 271828 keeps CI deterministic; GRAFT_FUZZ_SEED sweeps
  // fresh input space (failures print the seed via the env, reproducible)
  private val rnd = new scala.util.Random(
    sys.env.get("GRAFT_FUZZ_SEED").map(_.toLong).getOrElse(271828L))

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("time-transform-fuzz")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "America/New_York") // NOT UTC: toColumn must not leak the session zone
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val N = 2000

  // independent recomputations (java.time only — no shared helpers)
  private def refYearDays(d: Int): Int = LocalDate.ofEpochDay(d.toLong).getYear - 1970
  private def refMonthDays(d: Int): Int = {
    val ld = LocalDate.ofEpochDay(d.toLong)
    (ld.getYear - 1970) * 12 + ld.getMonthValue - 1
  }
  private def refDayDays(d: Int): Int = d
  private def ts(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L)
  private def refYearMicros(us: Long): Int = ts(us).atZone(ZoneOffset.UTC).getYear - 1970
  private def refMonthMicros(us: Long): Int = {
    val z = ts(us).atZone(ZoneOffset.UTC)
    (z.getYear - 1970) * 12 + z.getMonthValue - 1
  }
  private def refDayMicros(us: Long): Int =
    Math.floorDiv(us, 86400000000L).toInt
  private def refHourMicros(us: Long): Int =
    Math.floorDiv(us, 3600000000L).toInt

  test("date transforms: apply == toColumn == java.time on random ±270y days") {
    val days = Seq.fill(N)(rnd.nextInt(200001) - 100000) ++
      Seq(0, -1, 1, -719162, 100000) // epoch, adjacent, year 1
    val rows = days.map(d => Row(Int.box(d)))
    // date_from_unix_date is pure proleptic epoch-day arithmetic — building
    // java.sql.Date from epoch millis would rebase across the Julian/
    // Gregorian cutover and shift pre-1582 fixtures by up to 2 days
    val df = spark.createDataFrame(
        new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
        StructType(Seq(StructField("d", IntegerType))))
      .withColumn("dt", org.apache.spark.sql.functions.expr("date_from_unix_date(d)"))
    val out = df.select(col("d"),
        YearTransform.toColumn(col("dt"), IceDate).as("y"),
        MonthTransform.toColumn(col("dt"), IceDate).as("m"),
        DayTransform.toColumn(col("dt"), IceDate).as("dd"))
      .collect()
    out.foreach { r =>
      val d = r.getInt(0)
      assert(r.getInt(1) == refYearDays(d), s"year(toColumn) at day $d")
      assert(r.getInt(2) == refMonthDays(d), s"month(toColumn) at day $d")
      assert(r.getInt(3) == refDayDays(d), s"day(toColumn) at day $d")
      assert(YearTransform.apply(IceDate, d) == refYearDays(d), s"year(apply) at day $d")
      assert(MonthTransform.apply(IceDate, d) == refMonthDays(d), s"month(apply) at day $d")
      assert(DayTransform.apply(IceDate, d) == refDayDays(d), s"day(apply) at day $d")
    }
  }

  test("timestamp transforms: apply == toColumn == java.time on random ±270y micros") {
    val micros = Seq.fill(N)((rnd.nextLong() % 8640000000000000L)) ++
      Seq(0L, -1L, 1L, -86400000000L, 86400000000L, -3600000000L, 999999L, -999999L)
    val rows = micros.map { us =>
      Row(Long.box(us), java.sql.Timestamp.from(ts(us)))
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("us", LongType), StructField("t", TimestampType))))
    val out = df.select(col("us"),
        YearTransform.toColumn(col("t"), IceTimestampTz).as("y"),
        MonthTransform.toColumn(col("t"), IceTimestampTz).as("m"),
        DayTransform.toColumn(col("t"), IceTimestampTz).as("dd"),
        HourTransform.toColumn(col("t"), IceTimestampTz).as("h"))
      .collect()
    out.foreach { r =>
      val us = r.getLong(0)
      assert(r.getInt(1) == refYearMicros(us), s"year(toColumn) at $us")
      assert(r.getInt(2) == refMonthMicros(us), s"month(toColumn) at $us")
      assert(r.getInt(3) == refDayMicros(us), s"day(toColumn) at $us")
      assert(r.getInt(4) == refHourMicros(us), s"hour(toColumn) at $us")
      assert(YearTransform.apply(IceTimestampTz, us) == refYearMicros(us), s"year(apply) at $us")
      assert(MonthTransform.apply(IceTimestampTz, us) == refMonthMicros(us), s"month(apply) at $us")
      assert(DayTransform.apply(IceTimestampTz, us) == refDayMicros(us), s"day(apply) at $us")
      assert(HourTransform.apply(IceTimestampTz, us) == refHourMicros(us), s"hour(apply) at $us")
    }
  }

  test("bucket transform: apply == toColumn on random int/long/string") {
    val rows = (0 until N).map { _ =>
      Row(Int.box(rnd.nextInt()), Long.box(rnd.nextLong()),
        if (rnd.nextInt(10) == 0) "" else {
          val sb = new java.lang.StringBuilder
          (0 until rnd.nextInt(6)).foreach(_ => sb.appendCodePoint(
            if (rnd.nextInt(4) == 0) 0x1F600 + rnd.nextInt(32) else 'a' + rnd.nextInt(26)))
          sb.toString
        })
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("i", IntegerType), StructField("l", LongType),
        StructField("s", StringType))))
    val b = BucketTransform(32)
    val out = df.select(col("i"), col("l"), col("s"),
        b.toColumn(col("i"), IceInt).as("bi"),
        b.toColumn(col("l"), IceLong).as("bl"),
        b.toColumn(col("s"), IceString).as("bs"))
      .collect()
    out.foreach { r =>
      assert(r.getInt(3) == b.apply(IceInt, r.getInt(0)), s"bucket(int) at ${r.getInt(0)}")
      assert(r.getInt(4) == b.apply(IceLong, r.getLong(1)), s"bucket(long) at ${r.getLong(1)}")
      assert(r.getInt(5) == b.apply(IceString, r.getString(2)), s"bucket(string) at '${r.getString(2)}'")
    }
  }
}

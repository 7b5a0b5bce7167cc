package graft.table

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Predicates => P, _}
import graft.meta._

/** Per-column metrics modes (reference `computeStatsPlan`
  * `table/arrow_utils.go:1130-1188` + `MatchMetricsMode`
  * `internal/utils.go:315-359`) and the opt-in NaN-count collection that
  * unlocks `IsNaN`/`NotNaN` file pruning (reference evaluator semantics
  * `evaluators.go:810-832,1273-1294`).
  */
class MetricsModeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var catalog: FileCatalog = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("metrics-mode-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = new FileCatalog(Files.createTempDirectory("graft-metrics-spec").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def firstFile(t: IceTable) = t.newScan().planFiles().head.file

  test("mode parsing mirrors the reference: none/counts/full/truncate(W), malformed rejected") {
    assert(ParquetStats.parseMode("none") === ParquetStats.MetricsMode("none"))
    assert(ParquetStats.parseMode(" Counts ") === ParquetStats.MetricsMode("counts"))
    assert(ParquetStats.parseMode("full") === ParquetStats.MetricsMode("full"))
    assert(ParquetStats.parseMode("truncate(8)") === ParquetStats.MetricsMode("truncate", 8))
    intercept[IllegalArgumentException](ParquetStats.parseMode("truncate()"))
    intercept[IllegalArgumentException](ParquetStats.parseMode("truncate(0)"))
    intercept[IllegalArgumentException](ParquetStats.parseMode("bogus"))
  }

  test("resolution: default + column override, truncate upgrades to full off strings") {
    val df = spark.range(1).select(col("id"), lit("s").as("name"))
    val schema = SchemaConv.fromSpark(df.schema)
    val modes = ParquetStats.modesFor(schema, Map(
      ParquetStats.DefaultModeKey -> "truncate(4)",
      ParquetStats.ColumnModeKeyPrefix + "name" -> "counts"))
    // id is numeric: truncate(4) upgrades to full (fixed-width values)
    assert(modes(schema.idByName("id")) === ParquetStats.MetricsMode("full"))
    assert(modes(schema.idByName("name")) === ParquetStats.MetricsMode("counts"))
  }

  test("counts mode keeps counts, drops bounds — scans stay correct, just unpruned") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val t = IceTable.create(catalog, "m_counts", SchemaConv.fromSpark(li.schema),
      properties = Map(ParquetStats.DefaultModeKey -> "counts"))
    t.append(li.limit(500).coalesce(1))
    t.refresh()
    val f = firstFile(t)
    assert(f.lowerBounds.isEmpty && f.upperBounds.isEmpty,
      s"counts mode must not record bounds: ${f.lowerBounds.keySet}")
    assert(f.valueCounts.nonEmpty && f.nullValueCounts.nonEmpty && f.columnSizes.nonEmpty)
    // no bounds → the metrics evaluator cannot prune, but results stay exact
    val want = t.scan(spark).where("l_quantity > 40").count()
    assert(t.scan(spark, P.gt("l_quantity", 40.0)).count() === want)
    assert(t.newScan(P.gt("l_quantity", 1e9)).planFiles().nonEmpty,
      "without bounds the file must conservatively stay planned")
  }

  test("none mode for one column drops ALL its stats; other columns unaffected") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val t = IceTable.create(catalog, "m_none", SchemaConv.fromSpark(li.schema),
      properties = Map(ParquetStats.ColumnModeKeyPrefix + "l_returnflag" -> "none"))
    t.append(li.limit(500).coalesce(1))
    t.refresh()
    val f = firstFile(t)
    val noneId = t.schema.idByName("l_returnflag")
    val qtyId = t.schema.idByName("l_quantity")
    for (m <- Seq(f.columnSizes, f.valueCounts, f.nullValueCounts, f.lowerBounds, f.upperBounds))
      assert(!m.contains(noneId), "none-mode column must record no stats at all")
    assert(f.columnSizes.contains(qtyId) && f.lowerBounds.contains(qtyId))
    // pruning on OTHER columns still bites
    assert(t.newScan(P.gt("l_quantity", 1e9)).planFiles().isEmpty)
  }

  test("truncate width is honored per column; full records untruncated bounds") {
    val df = spark.range(1).select(
      lit("abcdefghijklmnopqrstuvwxyz").as("s_trunc"),
      lit("abcdefghijklmnopqrstuvwxyz").as("s_full"))
    val schema = SchemaConv.fromSpark(df.schema)
    val t = IceTable.create(catalog, "m_trunc", schema,
      properties = Map(
        ParquetStats.ColumnModeKeyPrefix + "s_trunc" -> "truncate(4)",
        ParquetStats.ColumnModeKeyPrefix + "s_full" -> "full"))
    t.append(df.coalesce(1))
    t.refresh()
    val f = firstFile(t)
    val truncId = t.schema.idByName("s_trunc")
    val fullId = t.schema.idByName("s_full")
    assert(Bounds.decode(IceString, f.lowerBounds(truncId)) === "abcd")
    assert(Bounds.decode(IceString, f.lowerBounds(fullId))
      === "abcdefghijklmnopqrstuvwxyz")
    // sound upper truncation: bound >= real max
    val up = Bounds.decode(IceString, f.upperBounds(truncId)).asInstanceOf[String]
    assert(up.length <= 4 && up >= "abcd" && "abcdefghijklmnopqrstuvwxyz" <= up + "￿")
  }

  test("NaN counts (opt-in) collect per file and drive IsNaN/NotNaN file skipping") {
    val nanBatch = spark.range(10)
      .select(col("id"), lit(Double.NaN).as("v"))
    val numBatch = spark.range(10, 30)
      .select(col("id"), col("id").cast("double").as("v"))
    val t = IceTable.create(catalog, "m_nan", SchemaConv.fromSpark(nanBatch.schema),
      properties = Map(DataWriter.NanCountsEnabledKey -> "true"))
    t.append(nanBatch.coalesce(1))
    t.append(numBatch.coalesce(1))
    t.refresh()
    val vId = t.schema.idByName("v")
    val files = t.newScan().planFiles().map(_.file)
    assert(files.size === 2)
    val nanCounts = files.map(f => f.recordCount -> f.nanValueCounts.get(vId)).toMap
    assert(nanCounts(10L) === Some(10L), "all-NaN file must count 10 NaNs")
    assert(nanCounts(20L) === Some(0L), "NaN-free file must record 0")
    // inclusive evaluator: IsNaN skips the NaN-free file, NotNaN the all-NaN one
    val isNanFiles = t.newScan(P.isNaN("v")).planFiles()
    assert(isNanFiles.map(_.file.recordCount) === Seq(10L),
      "IsNaN must plan only the file that can contain NaNs")
    val notNanFiles = t.newScan(P.notNaN("v")).planFiles()
    assert(notNanFiles.map(_.file.recordCount) === Seq(20L),
      "NotNaN must skip the all-NaN file")
    // row results agree
    assert(t.scan(spark, P.isNaN("v")).count() === 10)
    assert(t.scan(spark, P.notNaN("v")).count() === 20)
  }

  test("strict evaluator NaN decisions: overwriteWhere drops an all-NaN file metadata-only") {
    val nanBatch = spark.range(10).select(col("id"), lit(Double.NaN).as("v"))
    val numBatch = spark.range(10, 30).select(col("id"), col("id").cast("double").as("v"))
    val t = IceTable.create(catalog, "m_nan_strict", SchemaConv.fromSpark(nanBatch.schema),
      properties = Map(DataWriter.NanCountsEnabledKey -> "true"))
    t.append(nanBatch.coalesce(1))
    t.append(numBatch.coalesce(1))
    t.refresh()
    // strict IsNaN: nanCount == valueCount ⇒ whole file drops without a rewrite
    t.overwriteWhere(spark, P.isNaN("v"), replacement = numBatch.limit(0))
    t.refresh()
    assert(t.scan(spark).count() === 20)
    assert(t.scan(spark, P.isNaN("v")).count() === 0)
  }
}

package graft.table

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.meta.FileCatalog

/** Parquet write properties (reference `parquet_files.go:46-64`):
  * row-group/page/dictionary sizing, compression codec, and per-column
  * bloom filters, observed in the actual file footers.
  */
class WritePropsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var catalog: FileCatalog = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("write-props-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    catalog = new FileCatalog(Files.createTempDirectory("graft-wprops-spec").toString)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def footer(path: String) =
    ParquetFileReader.open(HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(path), graft.meta.FileIO.conf))

  test("property translation covers the reference's write surface") {
    val opts = DataWriter.parquetWriteOptions(Map(
      "write.parquet.compression-codec" -> "gzip",
      "write.parquet.row-group-size-bytes" -> "1048576",
      "write.parquet.page-size-bytes" -> "65536",
      "write.parquet.page-row-limit" -> "5000",
      "write.parquet.dict-size-bytes" -> "131072",
      "write.parquet.bloom-filter-max-bytes" -> "524288",
      "write.parquet.bloom-filter-enabled.column.user id" -> "true"))
    assert(opts("compression") === "gzip")
    assert(opts("parquet.block.size") === "1048576")
    assert(opts("parquet.page.size") === "65536")
    assert(opts("parquet.page.row.count.limit") === "5000")
    assert(opts("parquet.dictionary.page.size") === "131072")
    assert(opts("parquet.bloom.filter.max.bytes") === "524288")
    // bloom column names translate to the sanitized FILE schema name
    assert(opts.keys.exists(_.startsWith("parquet.bloom.filter.enabled#user")))
    // default codec is the reference's zstd
    assert(DataWriter.parquetWriteOptions(Map.empty)("compression") === "zstd")
  }

  test("compression-level key is scoped to the resolved codec (ADVICE r13)") {
    // zstd (and the default codec = zstd): level maps to the zstd-scoped key
    val zstd = DataWriter.parquetWriteOptions(Map(
      "write.parquet.compression-level" -> "7"))
    assert(zstd("parquet.compression.codec.zstd.level") === "7")
    // non-zstd codec: the zstd key must NOT be emitted (parquet-hadoop
    // would silently ignore the level under the wrong codec's key)
    val gz = DataWriter.parquetWriteOptions(Map(
      "write.parquet.compression-codec" -> "gzip",
      "write.parquet.compression-level" -> "7"))
    assert(!gz.contains("parquet.compression.codec.zstd.level"))
    assert(gz("compression") === "gzip")
  }

  test("row-group size property produces multiple row groups; codec lands in the footer") {
    val df = spark.range(200000).select(col("id"),
      concat(lit("payload-payload-payload-"), col("id")).as("s"))
    val t = IceTable.create(catalog, "wp_rg", SchemaConv.fromSpark(df.schema),
      properties = Map(
        "write.parquet.compression-codec" -> "gzip",
        "write.parquet.row-group-size-bytes" -> "65536"))
    t.append(df.coalesce(1))
    t.refresh()
    val file = t.newScan().planFiles().head.file
    assert(file.splitOffsets.size > 1,
      s"expected several row groups under a 64 KiB block size, got ${file.splitOffsets}")
    val r = footer(file.filePath)
    try {
      val codecs = r.getFooter.getBlocks.asScala
        .flatMap(_.getColumns.asScala.map(_.getCodec.toString)).toSet
      assert(codecs === Set("GZIP"), s"codec property ignored: $codecs")
    } finally r.close()
  }

  test("write.target-file-size-bytes sizes files through the table's observed bytes/row") {
    val df = spark.range(100000).select(col("id"),
      concat(lit("payload-payload-payload-payload-"), col("id")).as("s"))
    val t = IceTable.create(catalog, "wp_target", SchemaConv.fromSpark(df.schema),
      properties = Map("write.target-file-size-bytes" -> "65536"))
    // first append: no history → no bytes/row estimate → single-cap fallback
    t.append(df.coalesce(1))
    t.refresh()
    assert(t.newScan().planFiles().size == 1)
    // second append: totals from commit 1 give bytes/row; files roll at ~64 KiB
    t.append(df.coalesce(1))
    t.refresh()
    val files = t.newScan().planFiles().map(_.file)
      .filter(_.fileSizeInBytes < 10 * 65536) // the commit-2 rolled files
    assert(files.size > 2, s"expected several rolled files, got ${files.size}")
    // each rolled file lands within a small factor of the byte target
    // (compressed estimate vs actual drift)
    assert(files.forall(_.fileSizeInBytes < 4L * 65536),
      s"oversized: ${files.map(_.fileSizeInBytes)}")
    // an explicit record cap always wins over the byte target
    val t2 = IceTable.create(catalog, "wp_target_cap", SchemaConv.fromSpark(df.schema),
      properties = Map(
        "write.target-file-size-bytes" -> "65536",
        "write.max-records-per-file" -> "1000000"))
    t2.append(df.coalesce(1)); t2.refresh(); t2.append(df.coalesce(1)); t2.refresh()
    assert(t2.newScan().planFiles().size == 2, "record cap must override byte target")
  }

  test("per-column bloom filter writes a bloom offset for that column only") {
    // high-cardinality column: parquet-mr omits the bloom filter when a
    // dictionary already covers every value, so a low-NDV column would
    // (correctly) skip it
    val df = spark.range(50000).select(col("id"),
      concat(lit("user-"), col("id") * 2654435761L).as("k"))
    val t = IceTable.create(catalog, "wp_bloom", SchemaConv.fromSpark(df.schema),
      properties = Map("write.parquet.bloom-filter-enabled.column.k" -> "true"))
    t.append(df.coalesce(1))
    t.refresh()
    val file = t.newScan().planFiles().head.file
    val r = footer(file.filePath)
    try {
      val cols = r.getFooter.getBlocks.asScala.head.getColumns.asScala
      val byName = cols.map(c => c.getPath.toDotString -> c.getBloomFilterOffset).toMap
      assert(byName("k") >= 0, s"bloom filter missing on k: $byName")
      assert(byName("id") < 0, s"bloom filter unexpectedly on id: $byName")
    } finally r.close()
  }
}

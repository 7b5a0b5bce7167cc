package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, processed batch-wise with `mapPartitions`.
  *
  * PNG/JPEG decoding is REAL — `javax.imageio` ships in every JDK, so
  * image payloads are decoded to pixels and featurized as a luminance
  * histogram (see `multimodal_decode`, whose PNGs round-trip through an
  * actual ImageIO encode + decode against an analytic oracle). Audio/video
  * codecs genuinely aren't in the container, so those formats — and bytes
  * that aren't a decodable image — take the deterministic byte-histogram
  * fallback. The Spark-side plumbing is identical either way: schema
  * (binary + struct), typed Dataset boundary, per-partition batching,
  * fixed-size feature vectors. At 100 TB this shape holds: payloads stay
  * columnar-compressed at rest, the decode is a narrow map (no shuffle),
  * and features feed the Similarity operators downstream.
  */
object Multimodal {
  import QueryDef.t

  val FeatureDim = 16

  final case class MediaRow(doc_id: Long, payload: Array[Byte], format: String,
      width: Int, height: Int, n_frames: Int)
  final case class FeatureRow(doc_id: Long, format: String, n_bytes: Long,
      features: Array[Float])

  /** Synthesize a media table from `documents`: payload = UTF-8 bytes of the
    * text (deterministic fake for a real image/audio blob), metadata derived
    * from doc_id.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    // spread: every downstream consumer decodes payload bytes per row
    // (ImageIO / histogram kernels) — the dominant cost, which a
    // single-split input would serialize on one core (QueryDef.spread)
    QueryDef.spread(t(spark, dir, "documents")).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        element_at(typedLit(Seq("jpeg", "png", "wav", "mp4")),
          (pmod(col("doc_id"), lit(4)) + 1).cast(IntegerType)).as("format"),
        (lit(64) + pmod(col("doc_id"), lit(8)) * 32).cast(IntegerType).as("width"),
        (lit(64) + pmod(col("doc_id") * 7, lit(8)) * 32).cast(IntegerType).as("height"),
        when(pmod(col("doc_id"), lit(4)) === 3, pmod(col("doc_id"), lit(100)) + 1)
          .otherwise(1).cast(IntegerType).as("n_frames")).as("media_meta"))

  /** Fallback featurizer for formats without an in-JVM codec (wav/mp4) and
    * for payloads that aren't decodable images: a deterministic byte
    * histogram keeping the batch shape and signature honest.
    */
  private[ops] def byteHistogram(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    payload.foreach(b => hist((b & 0xff) % FeatureDim) += 1f)
    val n = math.max(1, payload.length)
    hist.map(_ / n)
  }

  /** Real image decode via the JDK's ImageIO; None when the bytes aren't a
    * decodable image. ImageIO returns null for unrecognized content, but it
    * sniffs EVERY registered reader (BMP/GIF/TIFF too), and those readers
    * throw RuntimeExceptions — not IOException — on garbage that happens to
    * match their magic bytes; NonFatal keeps any such payload on the
    * documented fallback path instead of failing the task.
    */
  private[ops] def decodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Integer luminance histogram over decoded pixels: lum = (r+g+b)/3
    * (integer division), binned into FeatureDim equal slices. All-integer →
    * bit-exact across JVMs and against an analytic oracle.
    */
  private[ops] def lumaHistogram(img: java.awt.image.BufferedImage): Array[Long] = {
    val hist = new Array[Long](FeatureDim)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        hist(lum * FeatureDim / 256) += 1L
        x += 1
      }
      y += 1
    }
    hist
  }

  /** Format-aware decode: real pixels for image formats that decode,
    * byte-histogram fallback otherwise.
    */
  private[ops] def decodeToFeatures(payload: Array[Byte], format: String): Array[Float] =
    format match {
      case "png" | "jpeg" =>
        decodeImage(payload) match {
          case Some(img) =>
            val n = math.max(1, img.getWidth * img.getHeight)
            lumaHistogram(img).map(_.toFloat / n)
          case None => byteHistogram(payload)
        }
      case _ => byteHistogram(payload)
    }

  /** Batch feature extraction over the binary column: typed mapPartitions
    * (one decoder init per partition, rows streamed through it).
    */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[FeatureRow] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select(col("doc_id"), col("payload"), col("media_meta.format").as("format"),
        col("media_meta.width").as("width"), col("media_meta.height").as("height"),
        col("media_meta.n_frames").as("n_frames"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (model load, codec init)
        rows.map(r => FeatureRow(r.doc_id, r.format, r.payload.length.toLong,
          decodeToFeatures(r.payload, r.format)))
      }
  }

  // ------------------------------------------------------- real PNG decode
  /** Deterministic synthetic PNG for `multimodal_decode`: a 16×16 RGB image
    * whose pixel channels are pure integer formulas of (doc_id, x, y), so
    * an oracle can reproduce the decoded statistics WITHOUT a decoder. PNG
    * is lossless — the decoded pixels are bit-identical to the formula.
    */
  private[ops] val ImgSide = 16

  private[ops] def syntheticPng(docId: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      ImgSide, ImgSide, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ImgSide) {
      var x = 0
      while (x < ImgSide) {
        val r = ((docId * 31 + x * 7 + y * 13) % 256).toInt
        val g = ((docId * 17 + x * 3 + y * 5) % 256).toInt
        val b = ((docId * 29 + x * 11 + y * 3) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** End-to-end REAL image decode: encode the synthetic image to actual PNG
    * bytes, decode them back through ImageIO, and emit the integer
    * luminance histogram of the DECODED pixels. The oracle computes the
    * same histogram analytically from the generation formula — any encode
    * or decode defect breaks the match. Narrow map, no shuffle; the
    * histogram is CSV-rendered (exact integers) for the checker.
    */
  def decodedPixelStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .where(pmod(col("doc_id"), lit(4)) < 2) // the fixture's "image" docs
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { d =>
          val img = decodeImage(syntheticPng(d)).getOrElse(
            throw new IllegalStateException(s"generated PNG for doc $d did not decode"))
          (d, img.getWidth, img.getHeight, lumaHistogram(img).mkString(","))
        }
      }
      .toDF("doc_id", "width", "height", "luma_hist")
  }

  /** Aspect-fit resize planning for image rows: target dims + output byte
    * size are pure integer arithmetic over the metadata (the pixel resample
    * itself would live in the decode stub); fully oracle-checkable.
    */
  def resizePlan(spark: SparkSession, dir: String, target: Int): DataFrame = {
    val w = col("media_meta.width")
    val h = col("media_meta.height")
    val outW = when(w >= h, lit(target))
      .otherwise(expr(s"(media_meta.width * $target) div media_meta.height"))
    val outH = when(w >= h, expr(s"(media_meta.height * $target) div media_meta.width"))
      .otherwise(lit(target))
    mediaTable(spark, dir)
      .where(col("media_meta.format").isin("jpeg", "png"))
      .select(col("doc_id"), w.as("width"), h.as("height"),
        outW.cast(IntegerType).as("out_w"), outH.cast(IntegerType).as("out_h"),
        (outW * outH * 3).cast(LongType).as("resized_n_bytes"))
  }

  /** Deterministic frame sampling for "video" rows: evenly-spaced frame
    * indices, capped at `maxFrames` — metadata-only arithmetic.
    */
  def sampleFrames(spark: SparkSession, dir: String, maxFrames: Int): DataFrame =
    mediaTable(spark, dir)
      .where(col("media_meta.format") === "mp4")
      .select(col("doc_id"), col("media_meta.n_frames").as("n_frames"),
        sequence(lit(0), col("media_meta.n_frames") - 1,
          greatest(lit(1), ((col("media_meta.n_frames") + maxFrames - 1) / maxFrames)
            .cast(IntegerType))).as("frame_indices"))

  val defs: Seq[QueryDef] = Seq(
    // metadata + payload size round-trip — fully oracle-checkable
    QueryDef(
      "multimodal_meta",
      (s, dir) =>
        mediaTable(s, dir).select(
          col("doc_id"),
          length(col("payload")).cast(LongType).as("n_bytes"),
          col("media_meta.format").as("format"),
          col("media_meta.width").as("width"),
          col("media_meta.height").as("height")),
      Some("""
        SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
            WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
          CAST(64 + (doc_id % 8) * 32 AS INTEGER) AS width,
          CAST(64 + ((doc_id * 7) % 8) * 32 AS INTEGER) AS height
        FROM documents""")),

    // stubbed decode → fixed-size features (rows-only: decode is a fake).
    // The feature vector is emitted as a CSV of FLOOR(f*1e6) integers: the
    // checker sorts rows by every column (raw array cells are unhashable on
    // the pandas side), and integer rendering is identical across engines
    // where float-to-string notation is not. The float32 division itself is
    // IEEE-exact on both sides, so the oracle is exact, not approximate.
    QueryDef(
      "multimodal_features",
      (s, dir) =>
        extractFeatures(s, dir).toDF()
          .withColumn("features",
            concat_ws(",", transform(col("features"),
              x => floor(x.cast(DoubleType) * 1000000).cast(StringType)))),
      Some("""
        WITH chars AS (
          SELECT doc_id, ascii(text[i]) % 16 AS bin
          FROM documents, UNNEST(range(1, length(text) + 1)) AS u(i)
        ),
        counts AS (SELECT doc_id, bin, COUNT(*) AS c FROM chars GROUP BY doc_id, bin),
        dims AS (SELECT d.doc_id, GREATEST(1, length(d.text)) AS n, b.bin
                 FROM documents d, UNNEST(range(16)) AS b(bin)),
        feats AS (
          SELECT dims.doc_id,
            CAST(FLOOR(CAST(CAST(COALESCE(counts.c, 0) AS REAL) / CAST(dims.n AS REAL)
              AS DOUBLE) * 1000000) AS BIGINT) AS fv, dims.bin
          FROM dims LEFT JOIN counts
            ON dims.doc_id = counts.doc_id AND dims.bin = counts.bin)
        SELECT f.doc_id,
          CASE CAST(f.doc_id % 4 AS INTEGER) WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png'
            WHEN 2 THEN 'wav' ELSE 'mp4' END AS format,
          CAST(length(d.text) AS BIGINT) AS n_bytes,
          string_agg(f.fv, ',' ORDER BY f.bin) AS features
        FROM feats f JOIN documents d ON f.doc_id = d.doc_id
        GROUP BY f.doc_id, d.text""")),

    // REAL ImageIO round-trip: synthetic formula pixels → PNG encode →
    // PNG decode → luminance histogram of the DECODED pixels; the oracle
    // reproduces the histogram analytically from the formula (PNG is
    // lossless), so the decoder itself faces the correctness gate
    QueryDef(
      "multimodal_decode",
      (s, dir) => decodedPixelStats(s, dir),
      Some("""
        WITH img AS (SELECT doc_id FROM documents WHERE doc_id % 4 IN (0, 1)),
        px AS (
          SELECT i.doc_id,
            (((i.doc_id * 31 + x.x * 7 + y.y * 13) % 256 +
              (i.doc_id * 17 + x.x * 3 + y.y * 5) % 256 +
              (i.doc_id * 29 + x.x * 11 + y.y * 3) % 256) // 3) AS lum
          FROM img i, UNNEST(range(16)) AS x(x), UNNEST(range(16)) AS y(y)),
        c AS (SELECT doc_id, lum * 16 // 256 AS bin, COUNT(*) AS n
              FROM px GROUP BY doc_id, lum * 16 // 256),
        g AS (SELECT i.doc_id, b.bin FROM img i, UNNEST(range(16)) AS b(bin))
        SELECT g.doc_id, CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
          string_agg(COALESCE(c.n, 0), ',' ORDER BY g.bin) AS luma_hist
        FROM g LEFT JOIN c ON g.doc_id = c.doc_id AND g.bin = c.bin
        GROUP BY g.doc_id""")),

    // aspect-fit resize planning over image rows — integer math, exact oracle
    QueryDef(
      "multimodal_resize",
      (s, dir) => resizePlan(s, dir, 224),
      Some("""
        SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
          CAST(CASE WHEN w >= h THEN 224 ELSE (w * 224) // h END AS INTEGER) AS out_w,
          CAST(CASE WHEN w >= h THEN (h * 224) // w ELSE 224 END AS INTEGER) AS out_h,
          CAST(CASE WHEN w >= h THEN 224 ELSE (w * 224) // h END *
               CASE WHEN w >= h THEN (h * 224) // w ELSE 224 END * 3 AS BIGINT)
            AS resized_n_bytes
        FROM (SELECT doc_id, 64 + (doc_id % 8) * 32 AS w,
                64 + ((doc_id * 7) % 8) * 32 AS h
              FROM documents WHERE doc_id % 4 IN (0, 1)) dims""")),

    // frame sampling is metadata-only integer arithmetic → fully
    // SQL-expressible; indices emitted as CSV for the same sortability reason
    QueryDef(
      "multimodal_frame_sample",
      (s, dir) =>
        sampleFrames(s, dir, 8)
          .withColumn("frame_indices",
            concat_ws(",", col("frame_indices").cast(ArrayType(StringType)))),
      Some("""
        SELECT doc_id, CAST(doc_id % 100 + 1 AS INTEGER) AS n_frames,
          array_to_string(range(0, CAST(doc_id % 100 + 1 AS BIGINT),
            GREATEST(1, (CAST(doc_id % 100 + 1 AS BIGINT) + 7) // 8)), ',') AS frame_indices
        FROM documents WHERE doc_id % 4 = 3"""))
  )
}

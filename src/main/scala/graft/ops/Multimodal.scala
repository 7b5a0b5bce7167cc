package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` payloads with a
  * typed metadata struct, processed batch-wise with `mapPartitions`.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A STUB —
  * a deterministic fake (byte histogram) stands in for pixel decoding. The
  * Spark-side plumbing is real and tested: schema (binary + struct), typed
  * Dataset boundary, per-partition batching, fixed-size feature vectors.
  * At 100 TB this shape holds: payloads stay columnar-compressed at rest,
  * the decode UDF is a narrow map (no shuffle), and features feed the
  * Similarity operators downstream.
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
    t(spark, dir, "documents").select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        element_at(typedLit(Seq("jpeg", "png", "wav", "mp4")),
          (pmod(col("doc_id"), lit(4)) + 1).cast(IntegerType)).as("format"),
        (lit(64) + pmod(col("doc_id"), lit(8)) * 32).cast(IntegerType).as("width"),
        (lit(64) + pmod(col("doc_id") * 7, lit(8)) * 32).cast(IntegerType).as("height"),
        when(pmod(col("doc_id"), lit(4)) === 3, pmod(col("doc_id"), lit(100)) + 1)
          .otherwise(1).cast(IntegerType).as("n_frames")).as("media_meta"))

  /** STUB decoder: a real deployment would decode pixels/samples here; this
    * deterministic byte histogram keeps the batch shape and signature honest.
    */
  private def decodeToFeatures(payload: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](FeatureDim)
    payload.foreach(b => hist((b & 0xff) % FeatureDim) += 1f)
    val n = math.max(1, payload.length)
    hist.map(_ / n)
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
          decodeToFeatures(r.payload)))
      }
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

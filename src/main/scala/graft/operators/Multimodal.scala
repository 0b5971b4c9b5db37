package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing — extension tier. Media (image/audio/video)
  * is modeled as an opaque BINARY column plus a typed metadata struct;
  * decode / feature-extract / resize / frame-sample are per-partition
  * batch operators over `Dataset[MediaRow]`.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB (`fakeDecode`) — but everything
  * Spark-side is real and tested: the binary schema, the typed Encoder
  * pipeline, the mapPartitions batch shape (one decoder init per
  * partition, streamed rows), and the downstream feature columns.
  *
  * Scale notes: media bytes stay in executor space end-to-end (no
  * collect); mapPartitions amortizes per-batch decoder setup exactly like
  * a vectorized/pandas-batch UDF would; binary columns ride Parquet's
  * byte-array encoding, and at 100 TB the media table would be bucketed
  * by content-hash so dedup/feature joins co-locate without shuffling
  * payload bytes.
  */
object Multimodal extends QueryModule {

  case class MediaRow(doc_id: Long, media: Array[Byte], mime: String,
                      width: Int, height: Int)
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                           histogram: Array[Double], n_frames: Int)

  /** Synthesize the media table from documents: text bytes stand in for
    * media payloads; metadata is derived deterministically. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("mime"),
        ((col("n_chars") % 64) * 16 + 16).cast("int").as("width"),
        ((col("n_chars") % 48) * 16 + 16).cast("int").as("height"))
      .as[MediaRow]
  }

  /** STUB decode kernel: stands in for a codec. Deterministic 16-bin byte
    * histogram (normalized) + fake frame count from payload length. A real
    * deployment replaces ONLY this function with an image/audio decoder;
    * the partition-batch shape around it is production-real. */
  def fakeDecode(bytes: Array[Byte]): (Array[Double], Int) = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) { hist((bytes(i) & 0xFF) / 16) += 1.0; i += 1 }
    val n = math.max(bytes.length, 1)
    (hist.map(_ / n), 1 + bytes.length / 256)
  }

  /** Decode/feature-extract: one "decoder" per partition, rows streamed
    * through it (the Spark-idiomatic batch-UDF shape). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (codec handles, model…)
      rows.map { r =>
        val (hist, frames) = fakeDecode(r.media)
        MediaFeatures(r.doc_id, r.mime, r.media.length.toLong, hist, frames)
      }
    }
  }

  /** Frame sampling stub: every `stride`-th 16-byte block as a "frame". */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      r.media.grouped(16).zipWithIndex
        .collect { case (blk, i) if i % stride == 0 => (r.doc_id, i, blk) }
    }.toDF("doc_id", "frame_idx", "frame_bytes")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary column + typed metadata (oracle-verified: byte-exactness is
    // proven via md5 of the payload — raw bytes are unhashable downstream)
    "mm_meta" -> ((s, d) =>
      mediaTable(s, d).toDF()
        .select(col("doc_id"), md5(col("media")).as("media_md5"),
          octet_length(col("media")).cast("long").as("n_bytes"),
          col("mime"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
        .orderBy("doc_id")),

    // decode + feature-extract through the partition-batch stub pipeline
    "mm_features_stub" -> ((s, d) =>
      extractFeatures(mediaTable(s, d)).toDF()
        .select(col("doc_id"), col("mime"), col("n_bytes"),
          round(element_at(col("histogram"), 7), 6).as("hist_bin6"),
          col("n_frames").cast("long").as("n_frames"))
        .orderBy("doc_id")),

    // frame sampling: count + first-frame digest per doc
    "mm_frames_stub" -> ((s, d) =>
      sampleFrames(mediaTable(s, d))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sampled"),
          min(when(col("frame_idx") === 0, md5(col("frame_bytes")))).as("frame0_md5"))
        .orderBy("doc_id")))

  def oracles: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id, md5(text) AS media_md5,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
        |    WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
        |  CAST((n_chars % 64) * 16 + 16 AS BIGINT) AS width,
        |  CAST((n_chars % 48) * 16 + 16 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin)
}

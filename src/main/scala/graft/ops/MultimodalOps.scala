package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.5): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, decoded batch-wise on
  * executors. No media libraries exist in this container, so the decoder is
  * a CLEARLY-MARKED deterministic stub ([[FakeDecoder]]) — the Spark-side
  * contract (schema, partition-wise batching, feature shape) is real and
  * tested; swapping in a real JNI/JavaCV decoder changes only the stub body.
  *
  * The test stand-in payload derives from `documents.text` bytes; in
  * production payloads arrive via `spark.read.format("binaryFile")` or
  * parquet binary columns.
  *
  * Scale: decode is a narrow mapPartitions — no shuffle, linear scan,
  * executor-local CPU; exactly the shape a 100 TB media crawl needs.
  * Metadata-only passes ([[multimodalMeta]]) stay whole-stage-codegen'd and
  * never touch the decoder.
  */
object MultimodalOps {

  final case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Int, sha256: String,
      width: Int, height: Int, n_frames: Int, features: Array[Float])

  /** STUB decoder — deterministic fake. A real build replaces this body
    * with an actual image/audio decode; everything else is production
    * plumbing. Dimensions derive from content length, "features" are a
    * 16-dim byte-histogram-ish projection of the payload.
    */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val w = 16 + (payload.length % 640)
      val h = 16 + ((payload.length * 7) % 480)
      val feats = new Array[Float](16)
      var i = 0
      while (i < payload.length) {
        feats(i % 16) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      (w, h, feats)
    }
    /** video-ish frame count for a fixed-size frame stride. */
    def frameCount(payloadLen: Int, frameBytes: Int): Int =
      math.max(1, (payloadLen + frameBytes - 1) / frameBytes)
  }

  /** documents → (doc_id, media_type, payload binary): the opaque-binary
    * modeling step (text bytes stand in for media payloads in the sandbox).
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("image"))
          .when(col("doc_id") % 3 === 1, lit("audio"))
          .otherwise(lit("video")).as("media_type"),
        col("text").cast("binary").as("payload"))

  /** Metadata-only pass: pure built-ins over the binary column (codegen'd,
    * no decode). Oracle-backed.
    */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .select(
        col("doc_id"), col("media_type"),
        octet_length(col("payload")).as("byte_len"),
        md5(col("payload")).as("digest"))
      .orderBy("doc_id")

  val multimodalMetaOracle: String =
    """SELECT doc_id,
      |       CASE WHEN doc_id % 3 = 0 THEN 'image'
      |            WHEN doc_id % 3 = 1 THEN 'audio'
      |            ELSE 'video' END AS media_type,
      |       octet_length(encode(text)) AS byte_len,
      |       md5(text) AS digest
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Decode/feature-extract over partition-wise batches (the Scala analog of
    * mapInPandas: one iterator per partition, vectorizable inside). Typed
    * output via the MediaFeatures encoder. Rows-only (stub-dependent).
    */
  def extractFeatures(media: DataFrame, frameBytes: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, mtype, payload) =>
          val (w, h, feats) = FakeDecoder.decode(payload)
          MediaFeatures(id, mtype, payload.length,
            java.security.MessageDigest.getInstance("SHA-256")
              .digest(payload).map("%02x".format(_)).mkString,
            w, h,
            if (mtype == "video") FakeDecoder.frameCount(payload.length, frameBytes)
            else 1,
            feats)
        }
      }
  }

  def multimodalDecode(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(s, dir)).toDF()
      .select(col("doc_id"), col("media_type"), col("byte_len"),
        col("sha256"), col("width"), col("height"), col("n_frames"),
        round(element_at(col("features"), 1).cast("double"), 4).as("f0"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_decode" -> (multimodalDecode _))

  val oracles: Map[String, String] = Map(
    "multimodal_meta" -> multimodalMetaOracle)
}

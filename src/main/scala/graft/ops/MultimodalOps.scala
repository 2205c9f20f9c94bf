package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §7.5): image/audio/video payloads
  * as opaque `binary` columns with typed metadata, decoded batch-wise on
  * executors.
  *
  * IMAGE decode is REAL as of r8: [[graft.functions.ImageCodec]] drives the
  * JDK's built-in `javax.imageio` PNG codec (no external libraries needed),
  * and `multimodal_decode` round-trips actual PNG bytes — synthesized from
  * closed-form pixel arithmetic so a DuckDB oracle can value-check the
  * decode (PNG is lossless, so decoded pixels ≡ the formula). Audio/video
  * decode remains a CLEARLY-MARKED deterministic stub ([[FakeDecoder]]) —
  * no audio/video codec ships with the JDK; the Spark-side contract
  * (schema, partition-wise batching, feature shape) is real and tested, and
  * swapping in a JavaCV/ffmpeg decoder changes only the stub body.
  *
  * The stand-in audio/video payload derives from `documents.text` bytes; in
  * production payloads arrive via `spark.read.format("binaryFile")` or
  * parquet binary columns.
  *
  * Scale: decode is a narrow mapPartitions — no shuffle, linear scan,
  * executor-local CPU; exactly the shape a 100 TB media crawl needs.
  * Metadata-only passes ([[multimodalMeta]]) stay whole-stage-codegen'd and
  * never touch the decoder.
  */
object MultimodalOps {
  import graft.functions.ImageCodec

  final case class MediaFeatures(
      doc_id: Long, media_type: String, byte_len: Int, sha256: String,
      width: Int, height: Int, resized_w: Int, resized_h: Int,
      n_frames: Int, features: Array[Float])

  /** STUB decoder for AUDIO/VIDEO payloads (images use the real
    * [[graft.functions.ImageCodec]]) — deterministic fake. A real build
    * replaces this body with an actual audio/video decode; everything else
    * is production plumbing. Dimensions derive from content length,
    * "features" are a 16-dim byte-histogram-ish projection of the payload.
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

    /** STUB resize: aspect-preserving fit into maxDim×maxDim (a real build
      * calls the image library's resampler; the contract — pure function of
      * source dims — is what the pipeline depends on).
      */
    def resizeFit(w: Int, h: Int, maxDim: Int): (Int, Int) = {
      val longSide = math.max(w, h)
      if (longSide <= maxDim) (w, h)
      else (math.max(1, w * maxDim / longSide), math.max(1, h * maxDim / longSide))
    }
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
    * output via the MediaFeatures encoder. Image payloads that decode as a
    * real ImageIO format take the REAL codec path (true dims + luminance
    * histogram); everything else (audio/video, non-image bytes) falls back
    * to the documented stub.
    */
  def extractFeatures(media: DataFrame, frameBytes: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // one digest instance per partition — digest() resets the instance,
        // so sequential reuse is safe and avoids a per-row allocation
        val md = java.security.MessageDigest.getInstance("SHA-256")
        batch.map { case (id, mtype, payload) =>
          val real =
            if (mtype == "image") ImageCodec.decode(payload) else None
          val (w, h, feats) = real match {
            case Some(d) => (d.width, d.height, d.lumaHist)
            case None    => FakeDecoder.decode(payload)
          }
          val (rw, rh) = FakeDecoder.resizeFit(w, h, 224)
          MediaFeatures(id, mtype, payload.length,
            md.digest(payload).map("%02x".format(_)).mkString,
            w, h, rw, rh,
            if (mtype == "video") FakeDecoder.frameCount(payload.length, frameBytes)
            else 1,
            feats)
        }
      }
  }

  /** Deterministic synthetic image corpus: pixel (x,y) of doc d is the
    * closed-form [[graft.functions.ImageCodec.synthRgb]] arithmetic,
    * ENCODED to real PNG bytes executor-side. Narrow mapPartitions — the
    * image build parallelizes like any media ingest.
    */
  def syntheticImages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .filter(col("doc_id") % 3 === 0) // the mediaTable "image" stratum
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val (w, h) = ImageCodec.synthDims(id)
          (id, ImageCodec.encodePng(w, h, (x, y) => ImageCodec.synthRgb(id, x, y)))
        }
      }.toDF("doc_id", "payload")
  }

  /** REAL image decode, value-oracle-backed: encode the synthetic corpus to
    * PNG, decode it back through `javax.imageio`, and emit integer-exact
    * per-channel pixel sums. PNG is lossless, so the decoded sums equal the
    * pixel formula's — which the oracle computes in closed form (per-pixel
    * unnest over the ≤16×14 grids) WITHOUT any codec. A broken decode
    * (wrong dims, channel swap, stride bug, color-space drift) breaks the
    * hash match; a payload that fails to decode throws rather than
    * degrading to the stub.
    */
  def multimodalDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    syntheticImages(s, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, png) =>
          val d = ImageCodec.decode(png).getOrElse(
            throw new IllegalStateException(s"doc $id: payload is not a decodable image"))
          (id, d.width, d.height, d.width.toLong * d.height,
            d.sumR, d.sumG, d.sumB)
        }
      }
      .toDF("doc_id", "width", "height", "n_px", "sum_r", "sum_g", "sum_b")
      .orderBy("doc_id")
  }

  /** Closed-form transliteration of [[graft.functions.ImageCodec.synthRgb]]
    * + [[graft.functions.ImageCodec.synthDims]] — no codec on the oracle
    * side, which is the point: two independent routes to the same pixels.
    */
  val multimodalDecodeOracle: String =
    """WITH imgs AS (
      |  SELECT doc_id,
      |         CAST(8 + doc_id % 9 AS INT) AS width,
      |         CAST(8 + (doc_id * 3) % 7 AS INT) AS height
      |  FROM documents WHERE doc_id % 3 = 0),
      |px AS (
      |  SELECT i.doc_id, i.width, i.height, gx.x, gy.y
      |  FROM imgs i
      |  JOIN (SELECT unnest(generate_series(0, 15)) AS x) gx ON gx.x < i.width
      |  JOIN (SELECT unnest(generate_series(0, 13)) AS y) gy ON gy.y < i.height)
      |SELECT doc_id, width, height,
      |       CAST(count(*) AS BIGINT) AS n_px,
      |       CAST(sum((doc_id * 7 + x * 13 + y * 31) % 256) AS BIGINT) AS sum_r,
      |       CAST(sum((doc_id * 11 + x * 17 + y * 23) % 256) AS BIGINT) AS sum_g,
      |       CAST(sum((doc_id * 5 + x * 29 + y * 19) % 256) AS BIGINT) AS sum_b
      |FROM px
      |GROUP BY doc_id, width, height
      |ORDER BY doc_id""".stripMargin

  /** Frame sampling over video payloads: fixed 64-byte "frames" via binary
    * substring + sequence/posexplode, keeping every 4th frame — the Spark
    * plumbing (slicing, explosion, per-frame rows) is exactly what a real
    * video sampler produces; frame arithmetic is oracle-checked (lengths +
    * offsets; the bytes themselves need no decoding to verify shape).
    */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame = {
    val frameBytes = 64
    mediaTable(s, dir)
      .filter(col("media_type") === "video")
      // empty payloads must not reach sequence(): sequence(0, -1) yields
      // [0, -1] (Spark defaults to step -1 when start > stop), which would
      // fabricate a phantom zero-length frame
      .filter(octet_length(col("payload")) > 0)
      .withColumn("n_frames",
        ceil(octet_length(col("payload")).cast("double") / frameBytes).cast("int"))
      .select(col("doc_id"), col("payload"),
        posexplode(sequence(lit(0), col("n_frames") - 1)).as(Seq("pos", "frame_idx")))
      .filter(col("frame_idx") % 4 === 0) // sample every 4th frame
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("payload").substr(
          col("frame_idx") * frameBytes + 1, lit(frameBytes))).as("frame_len"))
      .orderBy("doc_id", "frame_idx")
  }

  val multimodalFramesOracle: String =
    """WITH media AS (
      |  SELECT doc_id, encode(text) AS payload
      |  FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0),
      |frames AS (
      |  SELECT doc_id,
      |         unnest(generate_series(0, CAST(ceil(CAST(octet_length(payload) AS DOUBLE) / 64) AS INTEGER) - 1)) AS frame_idx,
      |         payload
      |  FROM media)
      |SELECT doc_id, frame_idx,
      |       least(64, octet_length(payload) - frame_idx * 64) AS frame_len
      |FROM frames WHERE frame_idx % 4 = 0
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Resize PLANNING as a metadata-only pass: the stub decoder's source
    * dimensions are pure functions of payload length, so the
    * aspect-preserving fit into 224×224 — the exact [[FakeDecoder
    * .resizeFit]] arithmetic — runs as codegen'd Column arithmetic with
    * NO decode and no mapPartitions. This is the shape of a real
    * pipeline's resize scheduler (decide scale factors and output sizes
    * from header metadata, decode only what actually needs resampling);
    * `MultimodalOpsSpec` pins this plan-level arithmetic row-identical to
    * the typed decoder path's resized dims. Oracle-backed (integer
    * division floors identically in both engines for positive operands).
    */
  def multimodalResize(s: SparkSession, dir: String): DataFrame = {
    val maxDim = 224
    val base = mediaTable(s, dir)
      .withColumn("len", octet_length(col("payload")))
      .withColumn("width", (lit(16) + col("len") % 640).cast("int"))
      .withColumn("height", (lit(16) + (col("len") * 7) % 480).cast("int"))
      .withColumn("long_side", greatest(col("width"), col("height")))
    base
      .withColumn("resized_w",
        when(col("long_side") <= maxDim, col("width"))
          .otherwise(greatest(lit(1),
            floor(col("width") * maxDim / col("long_side")).cast("int"))))
      .withColumn("resized_h",
        when(col("long_side") <= maxDim, col("height"))
          .otherwise(greatest(lit(1),
            floor(col("height") * maxDim / col("long_side")).cast("int"))))
      .withColumn("needs_resize", col("long_side") > maxDim)
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("resized_w"), col("resized_h"), col("needs_resize"))
      .orderBy("doc_id")
  }

  val multimodalResizeOracle: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 3 = 0 THEN 'image'
      |              WHEN doc_id % 3 = 1 THEN 'audio'
      |              ELSE 'video' END AS media_type,
      |         octet_length(encode(text)) AS len
      |  FROM documents),
      |d AS (
      |  SELECT doc_id, media_type,
      |         CAST(16 + len % 640 AS INT) AS width,
      |         CAST(16 + (len * 7) % 480 AS INT) AS height
      |  FROM m),
      |g AS (SELECT *, greatest(width, height) AS long_side FROM d)
      |SELECT doc_id, media_type, width, height,
      |       CASE WHEN long_side <= 224 THEN width
      |            ELSE greatest(1, CAST(floor(width * 224 / long_side) AS INT))
      |       END AS resized_w,
      |       CASE WHEN long_side <= 224 THEN height
      |            ELSE greatest(1, CAST(floor(height * 224 / long_side) AS INT))
      |       END AS resized_h,
      |       long_side > 224 AS needs_resize
      |FROM g ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_decode" -> (multimodalDecode _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_resize" -> (multimodalResize _))

  val oracles: Map[String, String] = Map(
    "multimodal_meta" -> multimodalMetaOracle,
    "multimodal_decode" -> multimodalDecodeOracle,
    "multimodal_frames" -> multimodalFramesOracle,
    "multimodal_resize" -> multimodalResizeOracle)
}

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

  /** ViT patch-grid extraction (Dosovitskiy et al. ICLR'21 — an image is
    * a grid of patch tokens): each decoded image splits into a 4×4 patch
    * grid by integer coordinate bucketing (pixel x lands in patch column
    * ⌊x·4/width⌋), and each patch emits its pixel count and mean red
    * intensity — the embedding-model STUB feature riding REAL plumbing:
    * real PNG decode (`javax.imageio`), per-partition batch iteration
    * (the mapInPandas shape), typed patch-token schema, and a
    * value-level oracle that recomputes every patch sum from the
    * closed-form pixel formula without any codec. Swapping the mean for
    * a learned patch embedding changes one function, not the pipeline.
    *
    * Scale shape: narrow mapPartitions (decode is per-row CPU work that
    * parallelizes like any media ingest); output is images × 16 rows; no
    * shuffle until the deterministic orderBy.
    */
  def multimodalPatches(s: SparkSession, dir: String, grid: Int = 4): DataFrame = {
    import s.implicits._
    syntheticImages(s, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, png) =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(png))
          require(img != null, s"doc $id: payload is not a decodable image")
          val w = img.getWidth; val h = img.getHeight
          val sums = Array.ofDim[Long](grid, grid)
          val cnts = Array.ofDim[Long](grid, grid)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val pc = (x * grid) / w; val pr = (y * grid) / h
              sums(pr)(pc) += (img.getRGB(x, y) >> 16) & 0xff
              cnts(pr)(pc) += 1
              x += 1
            }
            y += 1
          }
          for (pr <- 0 until grid; pc <- 0 until grid if cnts(pr)(pc) > 0)
            yield (id, pr, pc, cnts(pr)(pc), sums(pr)(pc))
        }
      }
      .toDF("doc_id", "patch_row", "patch_col", "n_px", "sum_r")
      .withColumn("mean_r",
        round(col("sum_r").cast("double") / col("n_px"), 4))
      .orderBy("doc_id", "patch_row", "patch_col")
  }

  val multimodalPatchesOracle: String =
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
      |SELECT doc_id,
      |       CAST((y * 4) // height AS INT) AS patch_row,
      |       CAST((x * 4) // width AS INT) AS patch_col,
      |       count(*) AS n_px,
      |       CAST(sum((doc_id * 7 + x * 13 + y * 31) % 256) AS BIGINT)
      |         AS sum_r,
      |       round(CAST(sum((doc_id * 7 + x * 13 + y * 31) % 256) AS DOUBLE)
      |         / count(*), 4) AS mean_r
      |FROM px
      |GROUP BY doc_id, patch_row, patch_col
      |ORDER BY doc_id, patch_row, patch_col""".stripMargin

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

  /** Near-duplicate image corpus for perceptual-hash dedup: the image
    * stratum (doc_id % 3 = 0) paired into GROUPS of two — doc_id ≡ 0
    * (mod 6) is the original, doc_id ≡ 3 (mod 6) renders the SAME group
    * image with ONE perturbed pixel (r channel of (0,0) shifted +16 mod
    * 256) — the 1-pixel near-duplicate the dedup query must catch. Dims
    * are 16–32 × 16–30 (≥ the 9×7 dHash grid, so every pooled cell is
    * non-empty) and pixels are the closed-form [[ImageCodec.synthRgb]]
    * arithmetic of the GROUP id, encoded to real PNG bytes executor-side
    * (narrow mapPartitions, like [[syntheticImages]]).
    */
  def phashImages(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val grp = id - id % 6
          val w = (16 + grp % 17).toInt
          val h = (16 + (grp * 3) % 15).toInt
          val png = ImageCodec.encodePng(w, h, { (x, y) =>
            val p = ImageCodec.synthRgb(grp, x, y)
            if (id != grp && x == 0 && y == 0) {
              val r = ((p >> 16) & 0xff); (((r + 16) % 256) << 16) | (p & 0xffff)
            } else p
          })
          (id, png)
        }
      }.toDF("doc_id", "payload")
  }

  /** Image perceptual-hash near-dup (VERDICT r8 #3 — the multimodal analog
    * of `dedup_simhash`): REAL PNG decode → 56-bit dHash
    * ([[ImageCodec.dHash56]] — integer box-average luma comparisons on a
    * 9×7 grid) → 4×14-bit Hamming multi-index banding (any pair within
    * Hamming ≤ 3 agrees on ≥1 band by pigeonhole — COMPLETE for the ≤3
    * predicate, no all-pairs join) → `bit_count(xor)` verify. VALUE-pinned:
    * PNG is lossless and the corpus pixels are closed-form, so the oracle
    * recomputes the identical hash from the pixel FORMULA with no codec —
    * two independent routes to the same 56 bits (the `multimodal_decode`
    * trick applied to the hash). The 1-pixel perturbation lands in pooled
    * cell (0,0), which participates in dHash bit 0 only, so every
    * original/perturbed group pair is within Hamming ≤ 1 — guaranteed
    * caught (spec-pinned), which is the recall story a 100 TB image-text
    * pipeline needs from its near-dup stage.
    *
    * Scale shape: decode+hash is a narrow mapPartitions (executor-local
    * CPU, no shuffle); the only shuffles are the band-key self-join
    * (exchange-reused across both sides) and the final sort. The signature
    * (one long) rides through the band join — no re-attach join.
    */
  def multimodalPhashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sig = phashImages(s, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, png) =>
          val (_, _, hash) = ImageCodec.decodeDHash(png).getOrElse(
            throw new IllegalStateException(
              s"doc $id: payload is not a decodable image"))
          (id, hash)
        }
      }.toDF("doc_id", "dhash")
    val banded = sig.select(col("doc_id"), col("dhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("dhash"), b * 14).bitwiseAND(lit(0x3FFFL))): _*)))
      .select(col("doc_id"), col("dhash"),
        col("pos").as("band"), col("col").as("bval"))
    val a = banded.as("a"); val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.bval") === col("b.bval") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** Codec-free transliteration of [[multimodalPhashDedup]]: group/dims/
    * perturbation arithmetic, integer luma pooling onto the 9×7 grid,
    * cross-multiplied cell comparisons, 4×14-bit banding, Hamming verify.
    * An a-cell missing its right neighbor contributes no bit on either
    * engine (inner join here; zero-count cross-multiply there) — and with
    * w,h ≥ 16 every cell is non-empty anyway.
    */
  val multimodalPhashDedupOracle: String =
    """WITH imgs AS (
      |  SELECT doc_id, doc_id - doc_id % 6 AS grp
      |  FROM documents WHERE doc_id % 3 = 0),
      |dims AS (
      |  SELECT doc_id, grp,
      |         CAST(16 + grp % 17 AS INT) AS w,
      |         CAST(16 + (grp * 3) % 15 AS INT) AS h
      |  FROM imgs),
      |px AS (
      |  SELECT d.doc_id, d.w, d.h, gx.x, gy.y,
      |         CASE WHEN d.doc_id <> d.grp AND gx.x = 0 AND gy.y = 0
      |              THEN ((d.grp * 7 + gx.x * 13 + gy.y * 31) % 256 + 16) % 256
      |              ELSE (d.grp * 7 + gx.x * 13 + gy.y * 31) % 256 END AS r,
      |         (d.grp * 11 + gx.x * 17 + gy.y * 23) % 256 AS g,
      |         (d.grp * 5 + gx.x * 29 + gy.y * 19) % 256 AS b
      |  FROM dims d
      |  JOIN (SELECT unnest(generate_series(0, 31)) AS x) gx ON gx.x < d.w
      |  JOIN (SELECT unnest(generate_series(0, 29)) AS y) gy ON gy.y < d.h),
      |cells AS (
      |  SELECT doc_id, (y * 7) // h AS cj, (x * 9) // w AS ci,
      |         sum(r * 299 + g * 587 + b * 114) AS s, count(*) AS n
      |  FROM px GROUP BY doc_id, (y * 7) // h, (x * 9) // w),
      |bits AS (
      |  SELECT a.doc_id, a.cj * 8 + a.ci AS k
      |  FROM cells a JOIN cells b
      |    ON b.doc_id = a.doc_id AND b.cj = a.cj AND b.ci = a.ci + 1
      |  WHERE a.ci < 8 AND a.s * b.n > b.s * a.n),
      |sig AS (
      |  SELECT i.doc_id, coalesce(sum(1::BIGINT << bits.k), 0) AS dhash
      |  FROM imgs i LEFT JOIN bits ON bits.doc_id = i.doc_id
      |  GROUP BY i.doc_id),
      |banded AS (
      |  SELECT doc_id, dhash, bd.band AS band,
      |         (dhash >> (bd.band * 14)) & 16383 AS bval
      |  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) bd)
      |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
      |FROM banded a JOIN banded b
      |  ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

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

  /** Audio energy profiling — the voice-activity-detection (VAD) shape
    * every speech-data pipeline runs before transcription: per fixed-size
    * frame, RMS energy of the 8-bit-PCM-interpreted payload bytes
    * (sample = byte − 128); per clip, the energy contour summary (mean /
    * max frame RMS) and the silence profile — frames whose RMS falls
    * under 0.8× the clip's own mean (ADAPTIVE threshold, the standard
    * energy-gate VAD; an absolute threshold would be meaningless across
    * clips with different gain). High silence_ratio marks clips to trim
    * or drop before feature extraction.
    *
    * Like [[multimodalResize]] this runs as pure codegen'd Column
    * arithmetic with NO decoder in the loop — the sandbox payload is
    * ASCII text bytes, so the sample array is a narrow per-row transform;
    * a real build swaps ONLY the `samples` derivation for the
    * [[FakeDecoder]]/codec seam (mapPartitions PCM decode) and keeps the
    * whole frame/RMS/silence pipeline identical. Scale shape: one
    * per-frame explode (n_bytes/64 rows per clip), one doc-keyed mean,
    * one doc-keyed rollup — no corpus-wide exchange at all beyond the
    * doc key.
    */
  def multimodalAudioEnergy(s: SparkSession, dir: String): DataFrame = {
    val frameBytes = 64
    val audio = Tables(s, dir, "documents")
      .filter(col("doc_id") % 3 === 1 && length(col("text")) > 0)
      .select(col("doc_id"), length(col("text")).as("n"),
        transform(split(col("text"), ""), c => ascii(c) - 128).as("samples"))
    val frames = audio
      .withColumn("n_frames",
        ceil(col("n").cast("double") / frameBytes).cast("int"))
      .select(col("doc_id"), col("samples"),
        posexplode(sequence(lit(0), col("n_frames") - 1))
          .as(Seq("pos", "frame_idx")))
      .select(col("doc_id"), col("frame_idx"),
        expr(s"slice(samples, frame_idx * $frameBytes + 1, $frameBytes)")
          .as("fr"))
      // rms stays UNROUNDED: integer square sums and the /size division
      // are exact, IEEE sqrt is correctly rounded, so both engines hold
      // bit-identical values — rounding per frame would park averages on
      // the .00005 lattice where HALF_UP (Spark) and HALF_EVEN (DuckDB)
      // round() split; round only at the output columns
      .select(col("doc_id"), col("frame_idx"),
        sqrt(expr(
          "aggregate(fr, 0.0D, (acc, x) -> acc + CAST(x * x AS DOUBLE))" +
            " / size(fr)")).as("rms"))
    val means = frames.groupBy(col("doc_id"))
      .agg(avg(col("rms")).as("mean_rms"))
    frames.join(means, "doc_id")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        round(first(col("mean_rms")), 4).as("mean_rms"),
        round(max(col("rms")), 4).as("max_rms"),
        sum(when(col("rms") < lit(0.8) * col("mean_rms"), 1L)
          .otherwise(0L)).as("n_silent"))
      .withColumn("silence_ratio",
        round(col("n_silent") / col("n_frames"), 4))
      .orderBy("doc_id")
  }

  val multimodalAudioEnergyOracle: String =
    """WITH a AS (
      |  SELECT doc_id, text, length(text) AS n
      |  FROM documents WHERE doc_id % 3 = 1 AND length(text) > 0),
      |frames AS (
      |  SELECT doc_id, f.i AS frame_idx, text, n
      |  FROM a, LATERAL unnest(generate_series(0,
      |    CAST(ceil(n / 64.0) AS INT) - 1)) f(i)),
      |samples AS (
      |  SELECT doc_id, frame_idx,
      |         ascii(substr(text, frame_idx * 64 + s.j, 1)) - 128 AS v
      |  FROM frames, LATERAL unnest(generate_series(1,
      |    least(64, n - frame_idx * 64))) s(j)),
      |fr AS (
      |  SELECT doc_id, frame_idx,
      |         sqrt(avg(CAST(v * v AS DOUBLE))) AS rms
      |  FROM samples GROUP BY doc_id, frame_idx),
      |m AS (SELECT doc_id, avg(rms) AS mean_rms FROM fr
      |      GROUP BY doc_id)
      |SELECT fr.doc_id, count(*) AS n_frames,
      |       round(any_value(m.mean_rms), 4) AS mean_rms,
      |       round(max(rms), 4) AS max_rms,
      |       CAST(count(*) FILTER (rms < 0.8 * m.mean_rms) AS BIGINT)
      |         AS n_silent,
      |       round(CAST(count(*) FILTER (rms < 0.8 * m.mean_rms) AS DOUBLE)
      |         / count(*), 4) AS silence_ratio
      |FROM fr JOIN m ON m.doc_id = fr.doc_id
      |GROUP BY fr.doc_id ORDER BY fr.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_audio_energy" -> (multimodalAudioEnergy _),
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_decode" -> (multimodalDecode _),
    "multimodal_patches" -> ((s: SparkSession, dir: String) =>
      multimodalPatches(s, dir)),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_resize" -> (multimodalResize _),
    "multimodal_phash_dedup" -> (multimodalPhashDedup _))

  val oracles: Map[String, String] = Map(
    "multimodal_audio_energy" -> multimodalAudioEnergyOracle,
    "multimodal_meta" -> multimodalMetaOracle,
    "multimodal_decode" -> multimodalDecodeOracle,
    "multimodal_patches" -> multimodalPatchesOracle,
    "multimodal_frames" -> multimodalFramesOracle,
    "multimodal_resize" -> multimodalResizeOracle,
    "multimodal_phash_dedup" -> multimodalPhashDedupOracle)
}

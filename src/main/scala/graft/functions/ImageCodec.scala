package graft.functions

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** REAL image codec on the JDK's built-in `javax.imageio` (PNG/BMP/GIF/
  * JPEG readers ship with every JRE — no external libraries, which is the
  * container constraint that kept this a stub through r7). Used by
  * [[graft.ops.MultimodalOps]] for the image half of the multimodal
  * surface; audio/video remain documented stubs.
  *
  * Executor-side contract: every method is a pure function of its byte/
  * pixel inputs (no statics mutated, no files), so `mapPartitions` batches
  * parallelize with zero coordination — the same shape as a production
  * decode over a 100 TB media crawl.
  *
  * Verifiability: PNG is LOSSLESS 8-bit RGB, so an image synthesized from
  * closed-form pixel arithmetic, encoded, and re-decoded returns exactly
  * the formula's values — which is what lets a SQL oracle value-check a
  * real codec round-trip (see `multimodal_decode`).
  */
object ImageCodec {

  /** Decoded image summary: dimensions, exact per-channel pixel sums
    * (integer arithmetic — oracle-comparable), and a 16-bin luminance
    * histogram (the downstream feature vector).
    */
  final case class Decoded(
      width: Int, height: Int,
      sumR: Long, sumG: Long, sumB: Long,
      lumaHist: Array[Float])

  /** The synthetic corpus' pixel formula — packed 0xRRGGBB. One definition
    * generates the Spark-side images AND (transliterated) the DuckDB
    * oracle, the [[graft.ops.LayoutOps.lanes]] single-source discipline.
    */
  def synthRgb(id: Long, x: Int, y: Int): Int = {
    val r = ((id * 7 + x * 13 + y * 31) % 256).toInt
    val g = ((id * 11 + x * 17 + y * 23) % 256).toInt
    val b = ((id * 5 + x * 29 + y * 19) % 256).toInt
    (r << 16) | (g << 8) | b
  }

  /** Synthetic image dims for doc `id` (8–16 × 8–14 — small enough that
    * the oracle's per-pixel unnest stays trivial at every SF).
    */
  def synthDims(id: Long): (Int, Int) =
    ((8 + id % 9).toInt, (8 + (id * 3) % 7).toInt)

  /** Encode a w×h RGB image to real PNG bytes via ImageIO. */
  def encodePng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 56-bit difference hash (dHash) of a decoded image: box-average the
    * integer luma (r·299 + g·587 + b·114, UNSCALED — comparisons are
    * division-free) onto a 9×7 grid with the standard pooling assignment
    * `cell_i = x·9/w, cell_j = y·7/h`, then bit `k = j·8 + i` (i in 0..7,
    * j in 0..6) is set iff cell (i,j)'s mean luma strictly exceeds cell
    * (i+1,j)'s — compared exactly via cross-multiplication
    * `s_i·n_{i+1} > s_{i+1}·n_i`, so the whole hash is INTEGER arithmetic
    * and transliterates to SQL verbatim (the value-pinning requirement).
    * 56 bits (not the classic 64) keeps every partial `1::BIGINT << k`
    * positive on both engines — no sign-bit special cases. Scale/crop
    * robustness is the usual dHash story: the pooled grid is resolution-
    * independent, so near-identical images at different sizes hash near-
    * identically. Pure function of the pixels — the mapPartitions decode
    * stays coordination-free.
    */
  def dHash56(img: BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val sums = Array.ofDim[Long](7, 9)
    val cnts = Array.ofDim[Long](7, 9)
    var y = 0
    while (y < h) {
      val cj = y * 7 / h
      var x = 0
      while (x < w) {
        val ci = x * 9 / w
        val p = img.getRGB(x, y)
        val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
        sums(cj)(ci) += r * 299L + g * 587L + b * 114L
        cnts(cj)(ci) += 1L
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var j = 0
    while (j < 7) {
      var i = 0
      while (i < 8) {
        if (sums(j)(i) * cnts(j)(i + 1) > sums(j)(i + 1) * cnts(j)(i))
          hash |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    hash
  }

  /** Decode + dHash in one pass; None when the bytes aren't a readable
    * image.
    */
  def decodeDHash(payload: Array[Byte]): Option[(Int, Int, Long)] = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null) None
    else Some((img.getWidth, img.getHeight, dHash56(img)))
  }

  /** Decode any ImageIO-supported payload (PNG/BMP/GIF/JPEG); None when
    * the bytes aren't a readable image (the caller's fallback seam).
    */
  def decode(payload: Array[Byte]): Option[Decoded] = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      val hist = new Array[Float](16)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          sr += r; sg += g; sb += b
          // integer Rec.601-ish luma; /16 buckets into 16 bins
          hist(((r * 299 + g * 587 + b * 114) / 1000) / 16) += 1f
          x += 1
        }
        y += 1
      }
      Some(Decoded(w, h, sr, sg, sb, hist))
    }
  }
}

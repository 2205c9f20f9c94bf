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

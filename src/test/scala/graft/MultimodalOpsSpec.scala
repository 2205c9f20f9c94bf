package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.MultimodalOps

/** The resize PLAN (pure Column arithmetic, no decode) must agree
  * row-for-row with the typed decoder path (mapPartitions stub) — the
  * contract that lets a real pipeline schedule resizes from header
  * metadata and decode only what needs resampling.
  */
class MultimodalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("plan-level resize arithmetic matches the typed decoder path") {
    val planned = MultimodalOps.multimodalResize(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toMap
    val decoded = MultimodalOps
      .extractFeatures(MultimodalOps.mediaTable(spark, dir))
      .collect()
      .map(f => f.doc_id -> (f.width, f.height, f.resized_w, f.resized_h))
      .toMap
    assert(planned.nonEmpty)
    assert(planned.keySet == decoded.keySet)
    planned.foreach { case (id, p) =>
      assert(decoded(id) == p, s"doc $id: planned=$p decoded=${decoded(id)}")
    }
  }

  test("ImageCodec round-trips real PNG bytes losslessly") {
    import graft.functions.ImageCodec
    for (id <- Seq(0L, 3L, 42L, 999L)) {
      val (w, h) = ImageCodec.synthDims(id)
      val png = ImageCodec.encodePng(w, h, (x, y) => ImageCodec.synthRgb(id, x, y))
      // a real PNG container, not a fake: 8-byte magic per the PNG spec
      assert((png.take(8).map(_ & 0xff) sameElements
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)), s"doc $id: not a PNG")
      val d = ImageCodec.decode(png).getOrElse(fail(s"doc $id: decode failed"))
      assert(d.width == w && d.height == h)
      // closed-form channel sums — what the multimodal_decode oracle pins
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val p = ImageCodec.synthRgb(id, x, y)
        er += (p >> 16) & 0xff; eg += (p >> 8) & 0xff; eb += p & 0xff
      }
      assert((d.sumR, d.sumG, d.sumB) == ((er, eg, eb)), s"doc $id: channel sums")
      assert(d.lumaHist.sum.toLong == w.toLong * h, s"doc $id: histogram mass")
    }
  }

  test("ImageCodec rejects non-image bytes (the stub-fallback seam)") {
    import graft.functions.ImageCodec
    assert(ImageCodec.decode("not an image at all".getBytes).isEmpty)
    assert(ImageCodec.decode(Array.emptyByteArray).isEmpty)
  }

  test("image media rows take the real-codec path when payloads are PNGs") {
    import graft.functions.ImageCodec
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    // a media table whose image payloads ARE real PNGs: decode must report
    // the true raster dims, not the stub's length-derived fake dims
    val media = MultimodalOps.syntheticImages(spark, dir)
      .withColumn("media_type", lit("image"))
      .select(col("doc_id"), col("media_type"), col("payload"))
    val feats = MultimodalOps.extractFeatures(media).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      val (w, h) = ImageCodec.synthDims(f.doc_id)
      assert((f.width, f.height) == ((w, h)),
        s"doc ${f.doc_id}: real decode expected ${(w, h)}, got ${(f.width, f.height)}")
      assert(f.features.sum.toLong == w.toLong * h, "luma histogram mass")
    }
  }

  test("phash dedup: every 1-pixel-perturbed group pair is caught within Hamming ≤ 1") {
    // the corpus construction guarantee: doc g (≡0 mod 6) and its perturbed
    // twin g+3 differ in ONE pixel, which lands in pooled cell (0,0) and so
    // can flip dHash bit 0 only — the pair MUST survive banding (≥3 of 4
    // bands identical) and the Hamming ≤ 3 verify
    val ids = graft.ops.Tables(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expectedPairs = ids.filter(g => g % 6 == 0 && ids.contains(g + 3))
      .map(g => (g, g + 3))
    assert(expectedPairs.nonEmpty, "fixture has no perturbed group pairs — vacuous")
    val got = MultimodalOps.multimodalPhashDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    expectedPairs.foreach { p =>
      assert(got.contains(p), s"near-dup pair $p missed by banding")
      assert(got(p) <= 1, s"pair $p hamming ${got(p)} > 1 — perturbation leaked past cell (0,0)")
    }
  }

  test("dHash56 is identical across a lossless re-encode and flips ≤1 bit on a 1-pixel change") {
    import graft.functions.ImageCodec
    val (w, h) = (24, 20)
    def png(perturb: Boolean) = ImageCodec.encodePng(w, h, { (x, y) =>
      val p = ImageCodec.synthRgb(42L, x, y)
      if (perturb && x == 0 && y == 0)
        ((((p >> 16) & 0xff) + 16) % 256 << 16) | (p & 0xffff)
      else p
    })
    val Some((_, _, a)) = ImageCodec.decodeDHash(png(perturb = false))
    val Some((_, _, a2)) = ImageCodec.decodeDHash(png(perturb = false))
    val Some((_, _, b)) = ImageCodec.decodeDHash(png(perturb = true))
    assert(a == a2, "dHash not deterministic across encodes")
    assert(java.lang.Long.bitCount(a ^ b) <= 1,
      s"1-pixel perturbation flipped ${java.lang.Long.bitCount(a ^ b)} bits")
    assert((a >>> 56) == 0L && (b >>> 56) == 0L, "dHash56 must leave bits 56..63 clear")
  }
}

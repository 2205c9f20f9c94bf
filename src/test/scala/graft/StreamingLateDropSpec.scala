package graft

import java.nio.file.{Files, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingLateDrop

/** The watermark drop RULE pinned against the real engine: crafted
  * micro-batches with late-but-admitted, late-and-dropped, and
  * exact-boundary rows must produce, window for window, exactly what
  * [[StreamingLateDrop.predictClosedWindows]] replays from the
  * documented semantics. This is the rule `watermark_drop_audit`'s
  * capacity numbers rest on.
  */
class StreamingLateDropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def writeBatch(dir: Path, name: String, mtime: Long,
      tsSecs: Seq[Long]): Unit = {
    val lines = tsSecs.zipWithIndex.map { case (ts, i) =>
      val iso = java.time.Instant.ofEpochSecond(ts).toString
      s"""{"id":${name.hashCode.abs * 1000 + i},"ts":"$iso","value":1.0}"""
    }
    val f = dir.resolve(name)
    Files.writeString(f, lines.mkString("\n") + "\n")
    f.toFile.setLastModified(mtime)
  }

  test("engine drops exactly what the two-watermark replay predicts (10-min windows, 10-min delay)") {
    val dir = Files.createTempDirectory("graft-latedrop")
    val base = 1700000000L - math.floorMod(1700000000L, 600L) // window-aligned
    def t(min: Long, sec: Long = 0): Long = base + min * 60 + sec
    // Batch indices below are 0-based; lateWm(i) = stats through batch
    // i−2 minus delay (the SPARK-24634 one-batch filter lag, probed via
    // tools/LateDropProbe). Boundaries deliberately avoided.
    // batch 0: W0{t2,t5} W1{t12} W2{t21}; stats max 21:00
    val b1 = Seq(t(2), t(5), t(12), t(21))
    // batch 1: lateWm = none → t(14) admitted into W1 despite the
    // frontier sitting at 21:00; t(33) advances stats to 33:00
    val b2 = Seq(t(14), t(33))
    // batch 2: lateWm = 21:00 − 10:00 = 11:00 → t(3) (W0 end 10:00 <
    // 11:00) DROPPED — the real late-drop; t(13) (W1 end 20:00 > 11:00)
    // ADMITTED; t(45) pushes the final frontier to 45:00 → final wm
    // 35:00 closes W0/W1/W2; W3 [30,40) and t(45)'s W4 stay open
    val b3 = Seq(t(3), t(13), t(45))
    writeBatch(dir, "b1.json", 1000000L, b1)
    writeBatch(dir, "b2.json", 2000000L, b2)
    writeBatch(dir, "b3.json", 3000000L, b3)

    val (out, nBatches) = StreamingLateDrop.runOnDir(
      spark, dir.toString, "10 minutes", "latedrop_test")
    assert(nBatches == 3,
      s"drain ran $nBatches data batches, not one per file — ordering " +
        "precondition broken")
    val got = out.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val predicted = StreamingLateDrop.predictClosedWindows(
      Seq(b1, b2, b3), delaySec = 600L)
    assert(got == predicted,
      s"engine $got != replay $predicted — the drop rule diverges")
    // window-by-window, so the fixture provably exercised BOTH arms:
    // W0 keeps its 2 on-time rows (the b3 straggler dropped), W1 =
    // t(12) + late-admitted t(14) + late-admitted t(13), W2 = t(21)
    assert(got == Map(t(0) -> 2L, t(10) -> 3L, t(20) -> 1L),
      s"unexpected window counts: $got")
  }
}

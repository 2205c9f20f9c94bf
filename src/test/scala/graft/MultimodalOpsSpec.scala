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
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("zValue matches the definitional bit interleave") {
    import spark.implicits._
    def ref(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 678L), (200L, 10L), (70000L, 3L)) // >2^16 truncates
    val got = cases.toDF("a", "b")
      .select(graft.ops.LayoutOps.zValue(col("a"), col("b")))
      .as[Long].collect().toSeq
    assert(got == cases.map { case (a, b) => ref(a, b) })
  }

  test("zorder_stats: 16 complete runs with narrow part ranges") {
    val rows = graft.ops.LayoutOps.zorderStats(spark, dir).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 16))
    val total = graft.ops.Tables(spark, dir, "lineitem").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3)) // part_min <= part_max
      assert(r.getLong(4) <= r.getLong(5)) // supp_min <= supp_max
    }
    // the layout's point: an average z-run covers a small slice of the
    // partkey domain, not the whole of it (a random cut would cover ~all)
    val domain = rows.map(_.getLong(3)).max - rows.map(_.getLong(2)).min
    val avgSpan = rows.map(r => r.getLong(3) - r.getLong(2)).sum.toDouble / 16
    assert(avgSpan <= domain / 2.0,
      s"avg part span $avgSpan vs domain $domain — z runs not clustered")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.LayoutOps

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

  test("compaction_plan: greedy packing invariants (contiguity, conservation, boundary fill)") {
    val target = 2048L
    val rows = LayoutOps.compactionPlan(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val docs = graft.ops.Tables(spark, dir, "documents")
      .selectExpr("source", "cast(n_chars as long)").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // conservation: every file is planned exactly once
    assert(rows.map(_._3).sum == docs.length)
    assert(rows.map(_._4).sum == docs.map(_._2).sum)
    rows.groupBy(_._1).foreach { case (src, bs) =>
      val sorted = bs.sortBy(_._2)
      // buckets are contiguous from 0 within each source dir
      assert(sorted.map(_._2).toSeq == (0L until bs.length).toSeq,
        s"$src: bucket ids not contiguous")
      // greedy boundary: a bucket only closes once the cumulative total
      // has reached its boundary — so through every non-final bucket b,
      // Σ bytes ≥ (b+1)·target
      sorted.dropRight(1).foldLeft(0L) { case (cum, (_, b, _, total, _, _)) =>
        val through = cum + total
        assert(through >= (b + 1) * target,
          s"$src bucket $b closed at $through < ${(b + 1) * target}")
        through
      }
      // file runs are contiguous: doc ranges never interleave
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x._6 < y._5,
          s"$src: bucket ${x._2} doc range overlaps ${y._2}")
        case _ =>
      }
    }
  }
}

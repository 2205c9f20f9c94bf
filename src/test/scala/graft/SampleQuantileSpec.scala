package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{HashSampleValues, HashedValue}
import graft.ops.{AnalyticsOps, Tables}

/** Hash-sample quantile sketch invariants: the kept sample must be a pure
  * function of the data (identical under ANY partitioning / merge order —
  * the property that makes `quantile_sketch` oracle-checkable where
  * KLL/GK are not), local reduce/merge must maintain the k-smallest-hash
  * set exactly, and the shipped query's estimates must sit within the
  * sample-quantile rank-error bound of the exact quantiles.
  */
class SampleQuantileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("local reduce/merge keep exactly the k smallest-hash values, any order") {
    val agg = new HashSampleValues(5)
    val xs = (1 to 40).map(i => HashedValue(f"h$i%03d", i.toDouble))
    val want = xs.sortBy(_.h).take(5).map(_.v).sorted
    for (seed <- 1 to 5) {
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      val (l, r) = shuffled.splitAt(seed * 3)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == want, s"seed=$seed")
      assert(merged.length == 5)
    }
    // duplicate hashes collapse (the sample is a set over the hash tape)
    val dup = agg.reduce(agg.reduce(agg.zero, xs.head), xs.head)
    assert(dup.length == 1)
  }

  test("sample is identical under several partitionings (merge-order independence)") {
    val ev = Tables(spark, dir, "events")
      .select(col("event_type"),
        md5(col("event_id").cast("string")).as("h"), col("value"))
    val samples = Seq(1, 7, 32).map { parts =>
      ev.repartition(parts)
        .groupBy("event_type")
        .agg(graft.functions.SampleQuantile.hashSample(col("h"), col("value"), 64)
          .as("smp"))
        .orderBy("event_type")
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toSeq
    }
    assert(samples.head.nonEmpty)
    assert(samples.tail.forall(_ == samples.head))
  }

  test("quantile_sketch estimates respect the rank-error bound vs exact") {
    val rows = AnalyticsOps.quantileSketch(spark, dir).collect()
    assert(rows.nonEmpty)
    val ev = Tables(spark, dir, "events").filter(col("value").isNotNull)
    rows.foreach { r =>
      val (tpe, nRows) = (r.getString(0), r.getLong(1))
      val nSample = r.getLong(2)
      assert(nSample == math.min(512L, nRows))
      // each estimate's EXACT rank must be within 5/sqrt(k) of its target
      // quantile (the 1-sigma sample bound is 1/2sqrt(k); 10x margin makes
      // the test deterministic-in-practice while still failing on any
      // real sampling bug)
      val tol = 5.0 / math.sqrt(nSample.toDouble)
      Seq(3 -> 0.25, 4 -> 0.5, 5 -> 0.75, 6 -> 0.9).foreach { case (i, q) =>
        val est = r.getDouble(i)
        val rank = ev.filter(col("event_type") === tpe &&
          col("value") <= est).count().toDouble / nRows
        assert(math.abs(rank - q) <= tol,
          s"$tpe q=$q: est=$est exact-rank=$rank tol=$tol")
      }
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTopK

/** The sharded streaming Misra-Gries contract: candidate sets are bounded
  * and a SUPERSET of the true heavy hitters, with counts never exceeding
  * the truth — the invariants that survive any batch split, which is why
  * they (and not one emission trajectory) are what gets pinned.
  */
class StreamingTopKSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val shards = 4
  private val k = 16

  private lazy val drained = StreamingTopK.runOnce(spark, dir, "topk_test", shards, k)

  private lazy val finalCandidates: Map[Long, Long] = {
    // union of emissions per (shard, user), max mg_count per user: counts
    // only grow within a shard across batches until evicted, and an
    // evicted-then-readmitted user's count only UNDERcounts, which the
    // assertions allow. Bounds that depend on the emission COUNT scale by
    // drained.nBatches instead of assuming a single AvailableNow batch.
    drained.table.groupBy(col("user_id")).agg(max(col("mg_count")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private lazy val exact: Map[Long, Long] =
    graft.ops.Tables(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("state is bounded: at most shards*k candidates per emission round") {
    // live state is ≤ shards*k at every instant; the sink accumulates one
    // emission per batch, so the union across a multi-batch drain is
    // bounded by shards*k*nBatches (review r6: the unscaled bound broke
    // the moment the source split the drain)
    val rounds = math.max(1, drained.nBatches)
    assert(finalCandidates.size <= shards * k * rounds,
      s"${finalCandidates.size} candidates > ${shards * k} * $rounds")
  }

  test("superset guarantee: every user with count > N/k is a candidate") {
    val n = exact.values.sum
    val mustAppear = exact.filter(_._2 > n.toDouble / k).keySet
    val missing = mustAppear -- finalCandidates.keySet
    assert(missing.isEmpty,
      s"heavy hitters lost by the sketch: $missing (N=$n, k=$k)")
  }

  test("MG counts never exceed exact counts") {
    val over = finalCandidates.filter { case (u, c) => c > exact(u) }
    assert(over.isEmpty, s"overcounted: $over")
  }

  test("exact recount of the candidate set yields the true top users") {
    // the batch heavy_hitters discipline applied to the streaming sketch:
    // recount candidates exactly, then any user whose true count exceeds
    // the MG support threshold must rank identically to the ground truth
    val n = exact.values.sum
    val recounted = finalCandidates.keySet.map(u => u -> exact(u)).toMap
    val trueTop = exact.filter(_._2 > n.toDouble / k)
    assert(trueTop.forall { case (u, c) => recounted.get(u).contains(c) })
  }
}

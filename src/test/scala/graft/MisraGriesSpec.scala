package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{DedupOps, Tables, TextOps}

/** Misra–Gries invariants: the candidate set must contain every true
  * heavy hitter under ANY partitioning (the superset guarantee the
  * two-pass `heavy_hitters` query depends on), stay ≤ k, and the shipped
  * query must equal a plain exact groupBy-HAVING computed in Spark.
  */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def words = Tables(spark, dir, "documents")
    .select(explode(split(DedupOps.normText(col("text")), " ")).as("w"))
    .filter(col("w") =!= "")

  test("MG candidates ⊇ exact heavy hitters under several partitionings; |candidates| ≤ k") {
    val k = 256
    val n = words.count()
    val exact = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n.toDouble / (k + 1))
      .collect().map(_.getString(0)).toSet
    assert(exact.nonEmpty, "fixture has no items above n/(k+1) — test vacuous")
    for (parts <- Seq(1, 7, 32)) {
      val cands = words.repartition(parts)
        .agg(graft.functions.MisraGries.candidates(col("w"), k))
        .head().getSeq[String](0).toSet
      assert(cands.size <= k, s"parts=$parts: ${cands.size} > k")
      val missing = exact -- cands
      assert(missing.isEmpty,
        s"parts=$parts: true heavy hitters missing from candidates: $missing")
    }
  }

  test("heavy_hitters_by_source equals the exact per-source answer") {
    val got = TextOps.heavyHittersBySource(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val bySource = Tables(spark, dir, "documents")
      .select(col("source"), explode(split(DedupOps.normText(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
    val totals = bySource.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = bySource.groupBy("source", "w").agg(count(lit(1)).as("cnt"))
      .collect()
      .filter(r => r.getLong(2) > totals(r.getString(0)) / 100.0)
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy { case (s, w, c) => (s, -c, w) }.toSeq
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("heavy_hitters equals the exact groupBy-HAVING answer") {
    val got = TextOps.heavyHitters(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val n = words.count()
    val want = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n.toDouble / 200.0)
      .orderBy(col("cnt").desc, col("w"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(want.nonEmpty)
    assert(got == want)
  }
}

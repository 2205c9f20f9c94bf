package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps

/** The MMR Aggregator's contract: partitioning-invariant (the bounded
  * shortlist buffer must merge associatively), pick 1 is the pure
  * relevance argmax, and the selection actually diversifies (differs from
  * plain top-k on this corpus — otherwise the operator is vacuous here).
  */
class MmrSelectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val base: Seq[(Long, Int, Long)] =
    SimilarityOps.mmrRerank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("closed-form greedy on a hand corpus: diversity beats redundancy") {
    import spark.implicits._
    // query q = (1,0); candidates: two near-identical high-rel vectors and
    // one orthogonal lower-rel vector. Pure top-2 = {1,2}; MMR(λ=0.7)
    // picks 1 then prefers 3 (sim to 1 ≈ 0, score 0.7·0.6 = 0.42) over 2
    // (0.7·0.99 − 0.3·(≈1.0) ≈ 0.39)
    val rows = Seq(
      (0L, 1L, 1.00, Seq(1.0, 0.0)),
      (0L, 2L, 0.99, Seq(0.9999500037496876, 0.009999500037496875)),
      (0L, 3L, 0.60, Seq(0.0, 1.0)))
      .toDF("query_id", "cand_id", "rel", "v")
    val got = rows.groupBy(col("query_id"))
      .agg(graft.functions.MmrSelect.mmrPicks(
        col("cand_id"), col("rel"), col("v"),
        k = 3, lambda = 0.7, penalty = 0.3, shortlist = 50).as("picks"))
      .select(explode(col("picks")).as("p"))
      .select(col("p.rank"), col("p.id")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(1 -> 1L, 2 -> 3L, 3 -> 2L), s"got $got")
  }

  test("pick 1 per query is the pure-relevance top-1 of the exact search") {
    val top1 = SimilarityOps.annCosineTopk(spark, dir).collect()
      .filter(_.getInt(1) == 1).map(r => r.getLong(0) -> r.getLong(2)).toMap
    val mmr1 = base.filter(_._2 == 1).map(t => t._1 -> t._3).toMap
    assert(mmr1 == top1)
  }

  test("selection diversifies: some query's pick set differs from plain top-10") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rel").desc, col("cand_id"))
    val emb = graft.ops.Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.normalize(
          graft.functions.VectorFunctions.toDoubleArray(col("embedding"))).as("v"))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val top10 = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        graft.functions.VectorFunctions.dot(col("qv"), col("v")).as("rel"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mmrSets = base.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(mmrSets.keySet == top10.keySet)
    assert(mmrSets.exists { case (q0, s) => s != top10(q0) },
      "MMR degenerated to plain top-k on every query — vacuous here")
  }

  test("result is invariant under 1/7/32-way repartitioning") {
    val emb = graft.ops.Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.normalize(
          graft.functions.VectorFunctions.toDoubleArray(col("embedding"))).as("v"))
    // (rebuild inline to control partitioning of the scored stream)
    val qv = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    for (n <- Seq(1, 7, 32)) {
      val scored = emb.crossJoin(broadcast(qv))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("cand_id"),
          graft.functions.VectorFunctions.dot(col("qv"), col("v")).as("rel"),
          col("v"))
        .repartition(n)
      val got = scored.groupBy(col("query_id"))
        .agg(graft.functions.MmrSelect.mmrPicks(
          col("cand_id"), col("rel"), col("v"),
          k = 10, lambda = 0.7, penalty = 0.3, shortlist = 50).as("picks"))
        .select(col("query_id"), explode(col("picks")).as("p"))
        .select(col("query_id"), col("p.rank"), col("p.id")).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(got == base.toSet, s"mismatch at $n-way partitioning")
    }
  }

  test("shortlist-source parity: ANN-fed picks overlap the exact-fed picks") {
    // mmr_rerank_ann swaps the exact full-corpus shortlist for the HNSW
    // beam; the greedy selection over the two shortlists must mostly
    // agree. Greedy selection amplifies shortlist divergence, so the
    // floor sits just under the 0.96 sf0.001 HNSW beam-recall gate —
    // measured mean overlap: 0.94 at sf0.001, 0.99 at the sf0.01 gate.
    val annPicks = SimilarityOps.mmrRerankAnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exactPicks = base.map(t => (t._1, t._3)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(annPicks.keySet == exactPicks.keySet)
    val overlaps = exactPicks.map { case (q, ex) =>
      annPicks(q).intersect(ex).size.toDouble / ex.size }
    val mean = overlaps.sum / overlaps.size
    assert(mean >= 0.9, s"mean ANN-vs-exact pick overlap $mean < 0.9")
  }
}

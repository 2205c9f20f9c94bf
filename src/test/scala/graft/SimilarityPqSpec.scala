package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.SimilarityOps
import graft.functions.VectorFunctions._

/** PQ recall contract. The oracle pins the ADC values exactly; what it
  * cannot express is WHY the index is usable — the recall curve: ADC codes
  * alone find a usable fraction of the true neighbors, and the production
  * composition (ADC shortlist → exact re-rank) recovers most of the rest.
  * Measured (500 normalized 64-d vectors, top-neighbor cos ≈ 0.4 — a
  * hard, near-isotropic instance): ADC-only 0.20 at sf0.001 / 0.34 at
  * sf0.01; re-rank@100 0.82, re-rank@150 0.90 (sf0.01).
  */
class SimilarityPqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private val K = 5

  private lazy val exactTop: Set[(Long, Long)] =
    SimilarityOps.annCosineTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallOf(pairs: Set[(Long, Long)]): Double =
    (pairs & exactTop).size.toDouble / exactTop.size

  test("pure-ADC top-k finds a usable fraction of true neighbors") {
    val adc = SimilarityOps.annPqTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r = recallOf(adc)
    assert(r >= 0.15, s"ADC-only recall $r < 0.15")
  }

  test("shortlist re-rank recovers most true neighbors (recall >= 0.7)") {
    val approx = SimilarityOps.pqApproxDistances(spark, dir)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("approx_dist"), col("vec_id"))
    val short = approx.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 100).select("query_id", "vec_id")
    val emb = graft.ops.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), normalize(toDoubleArray(col("embedding"))).as("v"))
    val reranked = short
      .join(emb.select(col("vec_id").as("query_id"), col("v").as("qv")), "query_id")
      .join(emb, "vec_id")
      .select(col("query_id"), col("vec_id"), dot(col("qv"), col("v")).as("cos"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    val top = reranked.withColumn("rn", row_number().over(w2))
      .filter(col("rn") <= K)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r = recallOf(top)
    assert(r >= 0.7, s"re-rank@100 recall $r < 0.7")
    // and the re-rank must strictly beat raw ADC on this corpus
    val adcOnly = SimilarityOps.annPqTopk(spark, dir)
      .select("query_id", "neighbor_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r > recallOf(adcOnly), "re-rank did not improve on pure ADC")
  }

  test("ivf_pq: pruning reuses ADC scores verbatim and keeps usable recall") {
    val ivf = SimilarityOps.annIvfPq(spark, dir)
      .select("query_id", "neighbor_id", "approx_dist").collect()
    assert(ivf.nonEmpty)
    // composition contract: the coarse quantizer only PRUNES candidates --
    // every surviving (query, neighbor) must carry exactly the score the
    // flat ADC table assigns it (4-decimal surface, same as the queries)
    val adc = SimilarityOps.pqApproxDistances(spark, dir)
      .select(col("query_id"), col("vec_id"),
        round(col("approx_dist"), 4).as("d")).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    ivf.foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      assert(adc.get(k).contains(r.getDouble(2)),
        s"ivf_pq score for $k diverges from flat ADC: ${r.getDouble(2)} vs ${adc.get(k)}")
    }
    val rec = recallOf(ivf.map(r => (r.getLong(0), r.getLong(1))).toSet)
    info(s"ivf_pq recall vs exact: $rec")
    assert(rec >= 0.1, s"ivf_pq recall $rec collapsed (measured 0.14)")
  }


  test("embedding_outliers: ~5% tail flagged above one shared cutoff") {
    val rows = SimilarityOps.embeddingOutliers(spark, dir).collect()
    assert(rows.nonEmpty)
    val n = graft.ops.Tables(spark, dir, "embeddings").count()
    assert(rows.length <= math.ceil(0.06 * n),
      s"${rows.length} flagged of $n — p95 cutoff should flag ~5%")
    val cuts = rows.map(_.getDouble(3)).distinct
    assert(cuts.length == 1, s"cutoff must be corpus-global: ${cuts.toSeq}")
    rows.foreach(r => assert(r.getDouble(2) > cuts.head))
  }

}

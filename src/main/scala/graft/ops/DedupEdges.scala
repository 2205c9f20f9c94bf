package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Session-scoped materialization seam for the verified near-dup PAIR list
  * (r10 — the [[GraphEdges]] pattern applied to the text-dedup family):
  * `dedup_clusters` and `corpus_curation` both consume the exact-Jaccard
  * near-dup pairs that `dedup_ngram_jaccard` computes, and each re-ran the
  * full prefix-filter + verify edge build per query (~4.4 s each at sf0.1
  * — the top of the bench's heavy tail). At 100 TB a production pipeline
  * materializes the verified pair table ONCE per corpus snapshot (it IS
  * the dedup audit artifact reviewers sign off on) and clustering /
  * curation read it; the session analog is a one-time parquet
  * materialization, seeded OUTSIDE query construction (builders stay
  * pure), temp storage reclaimed by [[clear]] / the JVM shutdown hook.
  *
  * `dedup_ngram_jaccard` itself ALWAYS builds inline — the edge build is
  * that query's own claim — and unseeded sessions (Verify, tests, library
  * callers) build inline everywhere, so the correctness gate pins both
  * paths' semantics (DedupEdgesSpec: seeded ≡ unseeded row identity for
  * the pair table and both consumers).
  */
object DedupEdges {

  private val seam = new SessionSeam("graft_neardup_")

  /** The verified pair list (doc_a, doc_b, jaccard), built inline — the
    * exact output of [[DedupOps.dedupNgramJaccard]].
    */
  def build(s: SparkSession, dir: String): DataFrame =
    DedupOps.dedupNgramJaccard(s, dir)

  /** The shingle-LSH pair list — the exact output of
    * [[DedupOps.dedupMinhashShingle]] (`dedup_clusters_lsh`'s edge set).
    */
  def buildShingle(s: SparkSession, dir: String): DataFrame =
    DedupOps.dedupMinhashShingle(s, dir)

  /** Materialize both pair lists + the CC label table for `dir` once per
    * session (idempotent, orphan-reclaiming — [[SessionSeam]]).
    */
  def seed(s: SparkSession, dir: String): Unit =
    seam.seed(dir) { root =>
      build(s, dir).write.mode("overwrite").parquet(s"$root/pairs")
      buildShingle(s, dir).write.mode("overwrite")
        .parquet(s"$root/shingle_pairs")
      // the CC label table is the second derived artifact the session
      // materializes (r13 — five curation/lineage queries re-ran the
      // Borůvka closure per execution): derive it from the parquet
      // just written, NOT via pairs() — the seam registers `dir` only
      // after this lambda returns, so pairs() here would rebuild the
      // whole edge list inline
      ClusterOps.clustersOver(
          s.read.parquet(s"$root/pairs").select(col("doc_a"), col("doc_b")))
        .write.mode("overwrite").parquet(s"$root/labels")
    }

  /** Drop all seeded materializations and delete their parquet. */
  def clear(): Unit = seam.clear()

  /** (doc_a, doc_b, jaccard) pairs: the materialized table when seeded,
    * else the inline build.
    */
  def pairs(s: SparkSession, dir: String): DataFrame =
    seam.lookup(dir) match {
      case None => build(s, dir)
      case Some(root) => s.read.parquet(s"$root/pairs")
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    }

  /** (doc_a, doc_b, jaccard) shingle-LSH pairs: materialized when seeded,
    * else the inline build.
    */
  def shinglePairs(s: SparkSession, dir: String): DataFrame =
    seam.lookup(dir) match {
      case None => buildShingle(s, dir)
      case Some(root) => s.read.parquet(s"$root/shingle_pairs")
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    }

  /** (doc_id, cluster_rep, keep) CC labels over [[pairs]]: materialized
    * when seeded, else the inline [[ClusterOps.dedupClusters]] closure.
    * `dedup_clusters` itself (and the delete/keep-policy queries that
    * argue about the closure) always run the CC inline — the closure is
    * their claim; this serves the five curation/lineage consumers that
    * only need the labels.
    */
  def clusterLabels(s: SparkSession, dir: String): DataFrame =
    seam.lookup(dir) match {
      case None => ClusterOps.dedupClusters(s, dir)
      case Some(root) => s.read.parquet(s"$root/labels")
        .select(col("doc_id"), col("cluster_rep"), col("keep"))
    }
}

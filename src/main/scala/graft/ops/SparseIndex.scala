package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Session-scoped materialization seam for the 5-token-shingle term
  * frequency table (r13 — VERDICT r12 #4, the [[DedupEdges]] pattern
  * applied to sparse retrieval): `bm25_search` and `sparse_cosine_pairs`
  * each rebuilt the IDENTICAL `(doc_id, s, tf)` inverted-index base per
  * execution (corpus scan + shingle explode + keyed aggregate,
  * localCheckpointed per run to amortize its 5-6 same-plan consumers).
  * At 100 TB a production search stack materializes the inverted index
  * ONCE per corpus snapshot and every ranking query reads it; the
  * session analog is a one-time parquet materialization, seeded OUTSIDE
  * query construction (builders stay pure), temp storage reclaimed by
  * [[clear]] / the JVM shutdown hook.
  *
  * `rrf_fusion`'s sparse arm is word-level tf (shingle lists are
  * near-singleton on this corpus — its scaladoc) — a different table
  * with ONE consumer, so it stays inline by design.
  *
  * Unseeded sessions (Verify, tests, library callers) build inline, so
  * the correctness gate pins both paths' semantics (SparseIndexSpec:
  * seeded ≡ unseeded row identity for the tf table and both consumers).
  */
object SparseIndex {

  /** Shingle width shared by both consumers (5-token — the
    * discriminative term unit on boilerplate-heavy corpora, see
    * [[AnalyticsOps.sparseCosinePairs]]).
    */
  val ShingleK = 5

  private val seam = new SessionSeam("graft_sparsetf_")

  /** The inline `(doc_id, s, tf)` build: one corpus scan, the shingle
    * generator hashed once per row (map-side combined — the WinnowOps
    * lesson), localCheckpointed because its consumers walk it 5-6× per
    * query execution.
    */
  def build(s: SparkSession, dir: String): DataFrame =
    buildFor(Tables(s, dir, "documents")).localCheckpoint()

  /** The same postings build over ANY `(doc_id, text)` frame — per-doc
    * rows are a pure function of the doc, which is what makes the
    * streaming maintainer ([[graft.streaming.StreamingSparse]])
    * chop-independent.
    */
  def buildFor(docs: DataFrame): DataFrame = {
    val toks = split(DedupOps.normText(col("text")), " ")
    docs
      .select(col("doc_id"), toks.as("t"))
      .withColumn("n", greatest(size(col("t")) - (ShingleK - 1), lit(0)))
      .filter(col("n") >= 1)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), col("n")),
          i => concat_ws(" ", slice(col("t"), i, lit(ShingleK))))).as("s"))
      .groupBy(col("doc_id"), col("s"))
      .agg(count(lit(1)).as("tf"))
  }

  /** Materialize the tf table for `dir` once per session (idempotent,
    * orphan-reclaiming — [[SessionSeam]]).
    */
  def seed(s: SparkSession, dir: String): Unit =
    seam.seed(dir)(root =>
      build(s, dir).write.mode("overwrite").parquet(s"$root/tf"))

  /** Drop all seeded materializations and delete their parquet. */
  def clear(): Unit = seam.clear()

  /** `(doc_id, s, tf)`: the materialized table when seeded, else the
    * inline build (integer counts — parquet round-trip exact).
    */
  def shingleTf(s: SparkSession, dir: String): DataFrame =
    seam.lookup(dir) match {
      case None => build(s, dir)
      case Some(root) => s.read.parquet(s"$root/tf")
        .select(col("doc_id"), col("s"), col("tf"))
    }

  /** Persist a postings frame (`doc_id, s, tf`) as a parquet artifact —
    * the save half of the save/load/insert maintenance surface (r14 —
    * VERDICT r13 #2; longs and strings round-trip exactly, pinned in
    * SparseIndexSpec).
    */
  def save(tf: DataFrame, path: String): Unit =
    tf.select(col("doc_id"), col("s"), col("tf"))
      .write.mode("overwrite").parquet(path)

  /** Load a persisted postings artifact. */
  def load(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path).select(col("doc_id"), col("s"), col("tf"))

  /** Incremental insert — merge a delta batch's postings into a persisted
    * base WITHOUT rebuilding: postings rows are keyed by (doc_id, s) and
    * eras are doc-disjoint, so the union IS the maintained index
    * (bag-equal to a full rebuild — SparseIndexSpec pins it; the
    * [[AnalyticsOps.incrementalSparse]] oracle hash is the end-to-end
    * serving-stats proof).
    */
  def insert(baseTf: DataFrame, deltaTf: DataFrame): DataFrame =
    baseTf.select(col("doc_id"), col("s"), col("tf"))
      .unionByName(deltaTf.select(col("doc_id"), col("s"), col("tf")))

  /** The per-term serving stats every sparse ranker reads off the index
    * (`s → df, tf_sum` — BM25's idf numerator is a function of df):
    * additive over doc-disjoint eras, which is what makes the index
    * maintainable by merge instead of rebuild.
    */
  def termStats(tf: DataFrame): DataFrame =
    tf.groupBy(col("s")).agg(
      count(lit(1)).as("df"),
      sum(col("tf")).as("tf_sum"))
}

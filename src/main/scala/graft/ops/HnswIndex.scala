package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Session-scoped materialization seam for the HNSW layer-0 adjacency
  * (r13 — the [[SparseIndex]]/[[DedupEdges]] pattern applied to graph
  * ANN): `ann_hnsw_topk` and `mmr_rerank_ann` both search the SAME
  * deterministic bounded-degree proximity graph, and each rebuilt it per
  * execution (LSH banding + bucket self-join + per-node top-degree
  * window — the dominant cost of both queries). A production HNSW
  * deployment builds the graph once per corpus snapshot and serves
  * queries against it — exactly what [[SimilarityOps.hnswAdjacencyInline]]'s
  * scaladoc promises ("production keeps it as a maintained table") and
  * this seam delivers for the session: one parquet materialization at the
  * SHIPPED build config, seeded outside query construction, temp storage
  * reclaimed by [[clear]] / the JVM shutdown hook.
  *
  * Experimental configs (HnswProbe's parameter sweeps, the narrow-beam
  * recall spec) pass non-default build parameters and always build
  * inline. Unseeded sessions (Verify, tests, library callers) build
  * inline everywhere, so the correctness gate pins both paths
  * (HnswIndexSpec: seeded ≡ unseeded row identity for the adjacency and
  * both consumers).
  */
object HnswIndex {

  /** The shipped build config ([[SimilarityOps.annHnswTopk]] defaults). */
  val BitsPerBand = 8
  val Bands = 10
  val Degree = 20

  private val seeded = new java.util.concurrent.ConcurrentHashMap[String, String]()

  sys.addShutdownHook(clear())

  /** The inline adjacency build at the shipped config. */
  def build(s: SparkSession, dir: String): DataFrame =
    SimilarityOps.hnswAdjacencyInline(s, dir, BitsPerBand, Bands, Degree)

  /** Materialize the adjacency for `dir` once per session (idempotent).
    * A failed write deletes its temp dir before rethrowing (the
    * [[DedupEdges.seed]] orphan-reclamation discipline).
    */
  def seed(s: SparkSession, dir: String): Unit =
    seeded.computeIfAbsent(dir, { _ =>
      val out = java.nio.file.Files.createTempDirectory("graft_hnsw_")
      try build(s, dir).write.mode("overwrite").parquet(s"$out/nbrs")
      catch { case e: Throwable =>
        try deleteRecursively(out) catch { case _: Throwable => () }
        throw e
      }
      out.toString
    })

  private def deleteRecursively(root: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(root)) {
      val stream = java.nio.file.Files.walk(root)
      try {
        val walk = stream
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .iterator()
        while (walk.hasNext) java.nio.file.Files.deleteIfExists(walk.next())
      } finally stream.close()
    }

  /** Drop all seeded materializations and delete their parquet. */
  def clear(): Unit = {
    val it = seeded.values().iterator()
    while (it.hasNext) {
      try deleteRecursively(java.nio.file.Paths.get(it.next()))
      catch { case _: Throwable => () } // best-effort teardown
    }
    seeded.clear()
  }

  /** `(node, nbr)` symmetrized layer-0 adjacency at the shipped config:
    * the materialized table when seeded, else the inline build (long ids
    * — parquet round-trip exact).
    */
  def adjacency(s: SparkSession, dir: String): DataFrame =
    seeded.get(dir) match {
      case null => build(s, dir)
      case path => s.read.parquet(s"$path/nbrs")
        .select(col("node"), col("nbr"))
    }
}

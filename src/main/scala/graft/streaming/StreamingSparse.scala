package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.ops.SparseIndex

/** Streaming inverted-index maintenance (r14 — the third index family's
  * always-on form, making the [[StreamingIvf]] / [[StreamingHnsw]] story
  * symmetric across IVF, graph, and sparse): documents arriving as files
  * in a monitored folder have their 5-shingle postings built per batch
  * ([[SparseIndex.buildFor]] — the identical kernel the batch seam runs)
  * and appended to the persisted postings store, which IS the index
  * ([[SparseIndex.termStats]] serves BM25's df/tf mass off it).
  *
  * Stream ≡ batch: a doc's postings rows are a pure function of the doc
  * and eras are doc-disjoint ([[SparseIndex.insert]]'s union algebra),
  * so the drained store equals the one-shot batch build REGARDLESS of
  * how arrivals were chopped — StreamingSparseSpec pins exact row
  * equality, term stats included.
  *
  * Implemented as the [[DocKeyedStoreMaintainer]] kernel at the postings
  * config (r15 s3 — the exactly-once discipline, tombstone-delete
  * semantics, and crash-safe compaction live in the kernel once, shared
  * with [[StreamingDsir]]).
  */
object StreamingSparse extends DocKeyedFacade(new DocKeyedStoreMaintainer(
  "postings",
  StructType.fromDDL("doc_id BIGINT, s STRING, tf BIGINT, batch STRING"),
  Seq("doc_id", "text"),
  SparseIndex.buildFor,
  "graft-ssparse-lineage", "sparse-maintain")) {

  /** The maintained postings: every live `(doc_id, s, tf)` row. */
  def postings(spark: SparkSession, storePath: String): DataFrame =
    rows(spark, storePath)
}

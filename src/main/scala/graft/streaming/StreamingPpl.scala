package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.ops.CurationOps

/** Streaming maintenance of the CCNet perplexity-filter artifact (r16 —
  * the always-on form of [[CurationOps.perplexityFilter]], completing
  * the selection-family symmetry the same way [[StreamingDsir]] did
  * for DSIR): documents arriving as files in a monitored folder have
  * their hashed-BIGRAM bags built per batch ([[CurationOps.pplBagsFor]]
  * — the identical kernel the batch query runs) and appended to the
  * persisted store; [[perplexity]] serves scores and tertile labels
  * off the live store through the SAME model → score → tertile chain
  * ([[CurationOps.perplexityFrom]]), so the store and the gate query
  * cannot drift.
  *
  * Stream ≡ batch: a doc's bigram bag is a pure function of the doc
  * and eras are doc-disjoint, so the drained store equals the one-shot
  * batch bag table regardless of how arrivals were chopped, and the
  * served scores equal [[CurationOps.perplexityFilter]] over
  * everything seen — StreamingPplSpec pins row equality. The serving
  * subtlety is DSIR's doubled: both the LM (trained on the live `en`
  * slice) and the tertile cutpoints are GLOBAL, so every admission or
  * delete stales every stored score AND can move the head/middle/tail
  * boundaries — which is why the artifact persisted here is the
  * additive BAG table (always exact under arrival and deletion) and
  * scores/labels are derived at read time.
  *
  * Implemented as the [[DocKeyedStoreMaintainer]] kernel at the bigram
  * config — the exactly-once discipline, deterministic intra-batch
  * conflict pick, tombstone deletes, and crash-safe compaction live in
  * the kernel once, shared with [[StreamingSparse]]/[[StreamingDsir]];
  * deletes are EXACT by the same doc-keyed argument.
  */
object StreamingPpl extends DocKeyedFacade(new DocKeyedStoreMaintainer(
  "bags",
  StructType.fromDDL(
    "doc_id BIGINT, lang STRING, u BIGINT, v BIGINT, cnt BIGINT, " +
      "batch STRING"),
  Seq("doc_id", "lang", "text"),
  CurationOps.pplBagsFor,
  "graft-sppl-lineage", "ppl-maintain")) {

  /** The maintained bigram-bag table: every live
    * `(doc_id, lang, u, v, cnt)` row.
    */
  def bags(spark: SparkSession, storePath: String): DataFrame =
    rows(spark, storePath)

  /** Perplexity scores + tertile labels served off the live store —
    * the exact [[CurationOps.perplexityFilter]] output over everything
    * seen and not deleted (one shared chain,
    * [[CurationOps.perplexityFrom]]).
    */
  def perplexity(spark: SparkSession, storePath: String): DataFrame =
    CurationOps.perplexityFrom(bags(spark, storePath))
}

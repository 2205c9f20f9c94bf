package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.ops.CurationOps

/** Streaming maintenance of the DSIR selection artifact (r15 third
  * session — the always-on form of [[CurationOps.dsirWeights]],
  * extending the index-family symmetry to DATA SELECTION: the
  * doc×bucket feature-bag store is to DSIR what postings are to BM25):
  * documents arriving as files in a monitored folder have their
  * hashed-unigram bags built per batch ([[CurationOps.dsirBucketsFor]]
  * — the identical kernel the batch query runs) and appended to the
  * persisted store; [[weights]] serves importance log-ratios off the
  * live store through the SAME estimate → score chain
  * ([[CurationOps.dsirWeightsFrom]]), so the store and the gate query
  * cannot drift.
  *
  * Stream ≡ batch: a doc's bag is a pure function of the doc and eras
  * are doc-disjoint, so the drained store equals the one-shot batch
  * bag table REGARDLESS of how arrivals were chopped, and the served
  * weights equal [[CurationOps.dsirWeights]] over everything seen —
  * StreamingDsirSpec pins row equality. Note the SERVING subtlety this
  * family adds: weights are GLOBAL (every admission shifts both
  * distributions and stales every stored score), which is why the
  * artifact persisted here is the additive BAG table — always exact
  * under arrival and deletion — and scores are derived at read time;
  * [[CurationOps.dsirDrift]]'s `lr_shift` is the measure that says
  * when a consumer caching derived scores must refresh.
  *
  * Implemented as the [[DocKeyedStoreMaintainer]] kernel at the bag
  * config (r15 s3 review — the exactly-once discipline, tombstone
  * deletes, and crash-safe compaction live in the kernel once, shared
  * with [[StreamingSparse]]); deletes are EXACT here by the same
  * doc-keyed argument: the live-subset distributions are the rebuild's.
  */
object StreamingDsir extends DocKeyedFacade(new DocKeyedStoreMaintainer(
  "bags",
  StructType.fromDDL(
    "doc_id BIGINT, lang STRING, bucket BIGINT, cnt BIGINT, batch STRING"),
  Seq("doc_id", "lang", "text"),
  CurationOps.dsirBucketsFor,
  "graft-sdsir-lineage", "dsir-maintain")) {

  /** The maintained feature-bag table: every live
    * `(doc_id, lang, bucket, cnt)` row.
    */
  def bags(spark: SparkSession, storePath: String): DataFrame =
    rows(spark, storePath)

  /** Importance log-ratios served off the live store — the exact
    * [[CurationOps.dsirWeights]] output over everything seen and
    * not deleted (one shared chain, [[CurationOps.dsirWeightsFrom]]).
    */
  def weights(spark: SparkSession, storePath: String): DataFrame =
    CurationOps.dsirWeightsFrom(bags(spark, storePath))
}

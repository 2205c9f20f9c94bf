package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** VERDICT r2 "What's wrong" #1: dedup queries used to `.cache()` their
  * tokenized/banded corpora with no unpersist point, pinning storage memory
  * for the session's lifetime. The fix replaces every cache with exchange
  * reuse (self-join sides share one computed exchange). These tests pin the
  * contract: running a dedup query leaves NOTHING in the cache manager, and
  * the self-join plans actually contain a ReusedExchange (so dropping the
  * caches didn't silently double the signature computation).
  */
class CacheHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  // dedup_minhash_lsh left the driver registry in r10 but keeps these
  // hygiene contracts as public API
  private def query(name: String) = name match {
    case "dedup_minhash_lsh" =>
      (s: org.apache.spark.sql.SparkSession, d: String) =>
        graft.ops.DedupOps.dedupMinhashLsh(s, d)
    case n => SparkEntry.queries(n)
  }

  private def run(name: String): org.apache.spark.sql.DataFrame = {
    val df = query(name)(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    df
  }

  /** Count ReusedExchange nodes, descending through the AQE wrappers that
    * are leaves to a plain collect (AdaptiveSparkPlanExec, QueryStageExec).
    */
  private def countReused(p: SparkPlan): Int = {
    val self = p match { case _: ReusedExchangeExec => 1; case _ => 0 }
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    self + children.map(countReused).sum + p.subqueries.map(countReused).sum
  }

  test("no query leaves cached relations behind after its action") {
    // start from a clean slate — another suite's scoped cache may still be
    // registered on the shared session
    spark.catalog.clearCache()
    for (name <- Seq("dedup_ngram_jaccard", "dedup_simhash",
        "dedup_minhash_lsh", "dedup_minhash_shingle", "dedup_exact")) {
      run(name)
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name left entries in the cache manager")
    }
  }

  test("self-join subtrees are shared via exchange reuse, not recomputed") {
    // at sf0.001 the self-join is statically planned as broadcast (tiny
    // side, duplicate narrow compute — cheap and correct); disable
    // broadcast to emulate the at-scale shuffle-join path, where reuse is
    // what keeps the signature map from running once per join side
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (name <- Seq("dedup_simhash", "dedup_minhash_lsh",
          "dedup_ngram_jaccard", "dedup_minhash_shingle")) {
        // drive THIS df's QueryExecution (a .write would spawn its own) so
        // executedPlan is the final adaptive plan with materialized stages
        val df = query(name)(spark, dir)
        df.collect()
        val reused = countReused(df.queryExecution.executedPlan)
        assert(reused >= 1,
          s"$name: expected the banded self-join to reuse its exchange, " +
            s"found none — the signature map would compute once per join side")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
  }

  test("iterative queries pin only bounded checkpoint blocks, all droppable") {
    // the iterative drivers (graph loops, curation) mint localCheckpoints
    // at plan CONSTRUCTION; Bench drops them between reps via
    // getPersistentRDDs ++ unpersist. Pin both halves of that contract:
    // (a) one construction pins a BOUNDED number of RDDs (a leak here
    // compounds across bench reps — the bfs_2step rep-drift suspicion,
    // VERDICT r7 #7), and (b) the bench-style unpersist empties the map.
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    for (name <- Seq("bfs_2step", "pagerank_step", "dedup_clusters",
        "corpus_curation")) {
      run(name)
      val pinned = spark.sparkContext.getPersistentRDDs
      assert(pinned.size <= 24,
        s"$name pinned ${pinned.size} RDDs in one construction — unbounded " +
          "checkpoint retention compounds across bench reps")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      assert(spark.sparkContext.getPersistentRDDs.isEmpty,
        s"$name left undroppable persistent RDDs")
    }
  }
}

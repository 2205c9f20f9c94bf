package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.{AnalyticsOps, ClusterOps, CurationOps, DedupOps, EventOps, GraphOps, IncrementalDedup, LayoutOps, ModelOps, MultimodalOps, RefPipelines, RelationalOps, SimilarityOps, SketchOps, Tables, TextOps, WinnowOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Shape: semi-join-gated orders joined to lineitem, grouped revenue
    * (exercises the reference's J1 semi-join + grouped agg at once).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val keys = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val orders = Tables(spark, dir, "orders")
      .join(broadcast(keys), col("o_custkey") === col("c_custkey"), "left_semi")
    Tables(spark, dir, "lineitem")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"))
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ §7.5 LLM-data
    * extensions: dedup, similarity search, text analysis, event analytics).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefPipelines.queries ++ DedupOps.queries ++ IncrementalDedup.queries ++
      ClusterOps.queries ++ CurationOps.queries ++ SimilarityOps.queries ++
      TextOps.queries ++ EventOps.queries ++ AnalyticsOps.queries ++
      RelationalOps.queries ++ MultimodalOps.queries ++ GraphOps.queries ++
      LayoutOps.queries ++ ModelOps.queries ++ WinnowOps.queries ++
      SketchOps.queries ++ graft.plans.AsOfJoinOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (the
    * hash-dependent LSH/SimHash variants — rows-only checked + unit-tested).
    */
  def oracleSql: Map[String, String] =
    RefPipelines.oracles ++ DedupOps.oracles ++ IncrementalDedup.oracles ++
      ClusterOps.oracles ++ CurationOps.oracles ++ SimilarityOps.oracles ++
      TextOps.oracles ++ EventOps.oracles ++ AnalyticsOps.oracles ++
      RelationalOps.oracles ++ MultimodalOps.oracles ++ GraphOps.oracles ++
      LayoutOps.oracles ++ ModelOps.oracles ++ WinnowOps.oracles ++
      SketchOps.oracles ++ graft.plans.AsOfJoinOps.oracles
}

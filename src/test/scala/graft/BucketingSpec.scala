package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** 100 TB posture, demonstrated not asserted (README "Partitioning &
  * shuffle"): bucketing both sides of a recurring join on the join key makes
  * the join shuffle-FREE — the bucketed scans already satisfy the required
  * hash distribution. This is the design a 1000-executor lineitem ⋈ orders
  * runs with; the test pins that the plan truly has zero join exchanges
  * (AQE is disabled for the inspection — AdaptiveSparkPlanExec hides its
  * inner plan from collect, which would make the assertion vacuous).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bucketed lineitem ⋈ orders plans with no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }.length
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      graft.ops.Tables(spark, dir, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      graft.ops.Tables(spark, dir, "orders")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      // exactly ONE exchange: the final groupBy on a different key; the
      // join itself contributes none (bucketed scans align)
      assert(exchanges(joined) == 1,
        s"expected only the groupBy exchange:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() > 0)

      // control: the same join over raw parquet shuffles both join sides
      val raw = graft.ops.Tables(spark, dir, "lineitem")
        .join(graft.ops.Tables(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("qty"))
      assert(exchanges(raw) == 3) // two join inputs + the groupBy
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.CurationOps

/** The bounded-k Aggregator's contract: bit-identical to the window-rank
  * form under ANY physical partitioning — the merge must be associative
  * and order-insensitive, which is what lets partial aggregation ship ≤k
  * rows per (partition, group) at 100 TB (the [[MisraGriesSpec]] /
  * SampleQuantileSpec discipline applied to top-k selection).
  */
class TopKRowsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val windowForm: Seq[(String, Int, Long)] =
    CurationOps.corpusReservoir(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq

  test("aggregator form equals the window form exactly") {
    val aggForm = CurationOps.corpusReservoirAgg(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(aggForm == windowForm)
  }

  test("result is invariant under 1/7/32-way repartitioning") {
    val k = 20
    val base = graft.ops.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        md5(concat(lit("rsv"), col("doc_id").cast("string"))).as("draw"))
    for (n <- Seq(1, 7, 32)) {
      val got = base.repartition(n)
        .groupBy(col("source"))
        .agg(graft.functions.TopKRows.topKIds(col("draw"), col("doc_id"), k)
          .as("ids"))
        .select(col("source"), posexplode(col("ids")))
        .select(col("source"), (col("pos") + 1).cast("int").as("rank"),
          col("col").as("doc_id"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
        .toSet
      assert(got == windowForm.toSet, s"mismatch at $n-way partitioning")
    }
  }
}

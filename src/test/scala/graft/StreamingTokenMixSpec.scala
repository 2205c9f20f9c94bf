package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingTokenMix

/** Stream/batch parity for the source-mixture monitor: the streaming
  * ValueState fold must land on EXACTLY the per-source (n_docs,
  * ws_tokens) the batch tokenCount rollup (oracle-verified) computes.
  * The fold is a commutative counter, so the equality is invariant to
  * micro-batch splits; running totals only grow, so the final emission
  * per source is the max.
  */
class StreamingTokenMixSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming token-mix state matches the batch per-source rollup") {
    val streamed = StreamingTokenMix.runOnce(spark, dir, "token_mix_test")
    val finalRows = streamed
      .groupBy(col("source"))
      .agg(max(struct(col("n_docs"), col("ws_tokens"))).as("m"))
      .select(col("source"), col("m.n_docs"), col("m.ws_tokens"))
      .collect().map(_.toSeq).toSet

    val batch = graft.ops.TextOps.tokenCount(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).cast("long").as("ws_tokens"))
      .collect().map(_.toSeq).toSet

    assert(finalRows == batch,
      s"stream-only: ${(finalRows -- batch).take(3)}; " +
        s"batch-only: ${(batch -- finalRows).take(3)}")
    // state cardinality = the source key space, not the corpus
    assert(streamed.select("source").distinct().count() == batch.size)
  }
}

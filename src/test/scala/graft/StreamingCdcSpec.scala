package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamingCdc

/** Stream/batch parity for CDC materialization: the streaming ValueState
  * fold must land on EXACTLY the rows the batch `cdc_compaction` query
  * (oracle-verified) computes — same last op, value, and audit counts per
  * key, with tombstoned keys excluded. Because last-writer-wins is decided
  * by the stored (ts, event_id) sequence rather than arrival order, this
  * equality is invariant to how the source splits micro-batches.
  */
class StreamingCdcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming CDC state matches the batch compaction exactly") {
    val streamed = StreamingCdc.runOnce(spark, dir, "cdc_stream_test")
    // last emission per user = final state; one AvailableNow drain may
    // still split batches, so take the row with the max audit total
    // (counts only grow across emissions)
    val finalRows = streamed
      .withColumn("total",
        col("n_inserts") + col("n_updates") + col("n_deletes"))
      .groupBy(col("user_id"))
      .agg(max(struct(col("total"), col("last_op"), col("last_value"),
        col("n_inserts"), col("n_updates"), col("n_deletes"))).as("m"))
      .select(col("user_id"), col("m.last_op"), col("m.last_value"),
        col("m.n_inserts"), col("m.n_updates"), col("m.n_deletes"))
      .filter(col("last_op") =!= "D")
      .withColumn("last_value", round(col("last_value"), 4))
      .collect().map(_.toSeq).toSet

    val batch = graft.ops.EventOps.cdcCompaction(spark, dir)
      .select(col("user_id"), col("last_op"), col("last_value"),
        col("n_inserts"), col("n_updates"), col("n_deletes"))
      .collect().map(_.toSeq).toSet

    assert(finalRows == batch,
      s"stream-only: ${(finalRows -- batch).take(3)}; " +
        s"batch-only: ${(batch -- finalRows).take(3)}")
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Watermarked stream-stream interval join — the canonical hard streaming
  * operator (two unbounded sides, matches arrive out of order on both):
  * each purchase is attributed to every click by the same user in the
  * preceding hour, the streaming form of the as-of/range-join family
  * ([[graft.ops.EventOps]] asof/range joins are the batch shape).
  *
  * State bounds at scale: BOTH sides carry a 30-minute watermark and the
  * join condition pins `purchase_ts` to [click_ts, click_ts + 1h], so the
  * state store evicts clicks older than watermark − 1h and purchases older
  * than the watermark — state is O(events per 1.5h of event time per
  * user-hash partition), independent of stream length. Without the time
  * conjunct Spark would buffer BOTH streams forever; that shape is the
  * streaming scale-killer the interval condition exists to prevent.
  *
  * Inner join + append mode: a joined row emits once both sides have
  * arrived; watermark-late rows on either side are dropped (the documented
  * late-data contract, same as [[StreamingDedup]]).
  */
object StreamingJoin {

  /** Clicks joined to same-user purchases within the following hour. */
  def attributedPurchases(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "30 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", "30 minutes")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Drain the events table as a bounded stream through the join into an
    * in-memory sink; returns the completed query — the joined rows live in
    * `spark.table(queryName)`, batch accounting in `q.recentProgress` (the
    * test pins its single-batch exactness precondition on it).
    */
  def runOnce(spark: SparkSession, dir: String, queryName: String): StreamingQuery = {
    val events = StreamingEvents.readEventStream(spark, dir)
    val q: StreamingQuery = attributedPurchases(events)
      .writeStream
      .queryName(queryName)
      .outputMode("append")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}

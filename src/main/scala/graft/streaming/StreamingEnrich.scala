package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Stream-STATIC dimension enrichment — the stateless member of the
  * streaming-join family ([[StreamingJoin]] is the stateful stream-stream
  * form). Each event is joined to the customer→nation dimension at
  * processing time; Spark re-plans the static side every micro-batch, so
  * a slowly-changing dimension refreshes without restarting the query.
  *
  * Scale shape: the dimension is broadcast (customer × nation is dim-
  * sized), so the join is a per-batch BroadcastHashJoin — NO stream-side
  * shuffle, NO state store, no watermark needed. This is the right tool
  * whenever one side is bounded; reaching for the stateful stream-stream
  * join here would buffer the event stream for nothing. Left join keeps
  * events whose user has no dimension row (dim lag is normal in a live
  * pipeline) with null attributes rather than dropping them.
  */
object StreamingEnrich {

  /** The customer→nation dimension, pre-joined once (static-static). */
  def dimension(spark: SparkSession, dir: String): DataFrame = {
    val cust = graft.ops.Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))
    val nation = graft.ops.Tables(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    cust.join(nation, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("n_name"))
  }

  /** Events enriched with market segment + nation name. */
  def enriched(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("c_mktsegment"), col("n_name"))

  /** Drain the events table as a bounded stream through the enrichment
    * into an in-memory sink; returns the completed query (rows in
    * `spark.table(queryName)`).
    */
  def runOnce(spark: SparkSession, dir: String, queryName: String): StreamingQuery = {
    val events = StreamingEvents.readEventStream(spark, dir)
    val q: StreamingQuery = enriched(events, dimension(spark, dir))
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

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Event-time streaming analytics (SURVEY.md §7.5): watermarked tumbling
  * windows over the events table consumed as a parquet file stream — the
  * streaming form of EventOps.eventsTumbling. At scale this is the shape of
  * a live clickstream: event-time windows tolerate lateness up to the
  * watermark, state is bounded, output appends closed windows only.
  */
object StreamingEvents {

  /** events.parquet physical schema minus `ts`, whose encoding varies by
    * testdata generation (TIMESTAMP(NANOS) → LongType under the nanosAsLong
    * conf, or TIMESTAMP(MICROS) → TIMESTAMP_NTZ) — see Tables. The file
    * source needs a user-supplied schema, so probe the batch footer once and
    * splice the actual `ts` type in, then normalize in-stream exactly as the
    * batch loader does.
    */
  def eventsRawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", tsType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType =
      spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    // the streaming file source accepts a directory or a glob, not a bare
    // file path — the character class makes this a glob anchored at `dir`
    val raw = spark.readStream
      .schema(eventsRawSchema(tsType))
      .parquet(s"$dir/[e]vents.parquet")
    tsType match {
      case LongType =>
        // integral div — see Tables: double division loses ns precision
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Tumbling 1-hour windows × event_type with a 30-minute watermark. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Drain the table as a bounded stream into an in-memory sink; returns the
    * completed result. Append mode emits only watermark-closed windows —
    * callers asserting against batch results must account for the final
    * (still-open) hour (see StreamingSpec).
    */
  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q: StreamingQuery = windowedCounts(readEventStream(spark, dir))
      .writeStream
      .queryName(queryName)
      .outputMode("append")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Watermark late-drop semantics, pinned against the REAL engine — the
  * streaming counterpart of [[graft.ops.EventOps.watermarkDropAudit]]
  * (which predicts drop RATES from data; this component pins the drop
  * RULE): a file-per-micro-batch windowed count under
  * `withWatermark(delay)`, plus [[predictClosedWindows]] — a pure
  * per-batch replay of Spark's TWO-watermark semantics (SPARK-24634,
  * probed empirically on this engine build via tools/LateDropProbe —
  * the naive one-watermark model mispredicts):
  *
  *   - the watermark REPORTED for batch i = max(event time through
  *     batch i−1) − delay (monotone; what `progress.eventTime` shows),
  *   - the LATE-EVENTS filter of batch i uses the PREVIOUS batch's
  *     reported watermark (so the filter lags event-time stats by two
  *     batches): a row is dropped iff its window end ≤ that value,
  *   - EVICTION/emission uses batch i's own reported watermark: append
  *     mode emits a window once it passes the window end (AvailableNow
  *     runs a trailing empty batch, so the final frontier flushes).
  *
  * StreamingLateDropSpec feeds both the engine and the predictor the
  * same crafted batches (late-but-admitted and cleanly-dropped rows,
  * boundaries avoided) and asserts window-for-window equality — so the
  * capacity numbers `watermark_drop_audit` plans with rest on the rule
  * the engine actually applies.
  */
object StreamingLateDrop {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  /** Drain `inDir` (one json file per micro-batch, oldest mod-time
    * first) through a 10-minute tumbling count under `delay`; returns
    * the append-mode output (window_start_sec, n_events) and the number
    * of non-empty micro-batches.
    */
  def runOnDir(spark: SparkSession, inDir: String, delay: String,
      queryName: String): (DataFrame, Int) = {
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("latestFirst", "false")
      .json(inDir)
    val agg = src.withWatermark("ts", delay)
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("window.start")).as("window_start_sec"),
        col("n_events"))
    val q = agg.writeStream
      .queryName(queryName)
      .outputMode("append")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    (spark.table(queryName), q.recentProgress.count(_.numInputRows > 0))
  }

  /** Pure replay of the engine's rule over `batches` of event-time
    * seconds: returns the closed-and-emitted windows
    * (window_start_sec → surviving count). `windowSec` = 600 matches
    * [[runOnDir]]'s 10-minute tumble.
    */
  def predictClosedWindows(batches: Seq[Seq[Long]], delaySec: Long,
      windowSec: Long = 600L): Map[Long, Long] = {
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    var maxSeen: Option[Long] = None   // event-time stats through prior batches
    var lateWm: Option[Long] = None    // late filter for the CURRENT batch
                                       //   = watermark reported one batch ago
    var reportedWm: Option[Long] = None
    batches.foreach { b =>
      // batch start: the reported watermark advances to stats-through-
      // previous − delay; the late filter still uses last batch's value
      lateWm = reportedWm
      reportedWm = maxSeen.map(_ - delaySec).orElse(reportedWm)
      b.foreach { tsSec =>
        val wStart = tsSec - math.floorMod(tsSec, windowSec)
        val wEnd = wStart + windowSec
        if (!lateWm.exists(wEnd <= _))
          counts(wStart) = counts.getOrElse(wStart, 0L) + 1L
      }
      if (b.nonEmpty && maxSeen.forall(_ < b.max)) maxSeen = Some(b.max)
    }
    // the trailing empty AvailableNow batch advances eviction to the
    // final frontier; append emits every window it passes
    val finalWm = maxSeen.map(_ - delaySec)
    counts.filter { case (wStart, _) =>
      finalWm.exists(wStart + windowSec <= _)
    }.toMap
  }
}

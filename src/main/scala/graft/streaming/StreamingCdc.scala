package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming CDC materialization — the always-on form of the batch
  * [[graft.ops.EventOps.cdcCompaction]] query: the event stream read as a
  * change log (signup → INSERT, error → DELETE tombstone, else → UPDATE),
  * folded per key into the CURRENT row via `transformWithState`
  * ValueState. Each micro-batch emits the keys it touched with their net
  * state (Update mode) — exactly what a materialized view sink upserts.
  *
  * Late/out-of-order arrivals: last-writer-wins is decided by the
  * (ts, event_id) sequence number kept IN the state, not by arrival
  * order — a row older than the stored state is ignored, so the fold is
  * order-insensitive within and across batches (the property
  * StreamingCdcSpec pins by checking stream == batch on the same data).
  *
  * Scale: state is one small row per LIVE key (tombstoned keys keep a
  * marker so a late stale update cannot resurrect them — at production
  * scale give deletes a TTL instead of unbounded markers); the only
  * shuffle is the groupByKey hash partitioning.
  */
object StreamingCdc {

  final case class Chg(user_id: Long, ts_us: Long, event_id: Long,
    op: String, value: Double)
  final case class CdcState(ts_us: Long, event_id: Long, op: String,
    value: Double, n_i: Long, n_u: Long, n_d: Long)
  final case class CdcOut(user_id: Long, last_op: String, last_value: Double,
    n_inserts: Long, n_updates: Long, n_deletes: Long)

  class CdcProcessor extends StatefulProcessor[Long, Chg, CdcOut] {
    @transient private var st: ValueState[CdcState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CdcState]("cdc",
        Encoders.product[CdcState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Chg],
        timerValues: TimerValues): Iterator[CdcOut] = {
      var s = if (st.exists) st.get()
        else CdcState(Long.MinValue, Long.MinValue, "", 0.0, 0L, 0L, 0L)
      rows.foreach { c =>
        val counted = c.op match {
          case "I" => s.copy(n_i = s.n_i + 1)
          case "D" => s.copy(n_d = s.n_d + 1)
          case _   => s.copy(n_u = s.n_u + 1)
        }
        // last-writer-wins on the (ts, event_id) sequence, not arrival order
        s = if (c.ts_us > s.ts_us ||
            (c.ts_us == s.ts_us && c.event_id > s.event_id))
          counted.copy(ts_us = c.ts_us, event_id = c.event_id,
            op = c.op, value = c.value)
        else counted
      }
      st.update(s)
      Iterator.single(CdcOut(userId, s.op, s.value, s.n_i, s.n_u, s.n_d))
    }
  }

  def cdcState(events: DataFrame): Dataset[CdcOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "error", "D")
          .otherwise("U").as("op"),
        col("value"))
      .as[Chg]
      .groupByKey(_.user_id)
      .transformWithState(new CdcProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Bounded drain into a memory sink (RocksDB provider, as
    * transformWithState requires). The LAST emission per user is the
    * materialized current row; tombstoned users are filtered by the
    * consumer (`last_op = 'D'`), mirroring the batch query's post-filter.
    */
  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame =
    MemoryDrain.drain(spark,
      cdcState(StreamingEvents.readEventStream(spark, dir)), queryName).table
}

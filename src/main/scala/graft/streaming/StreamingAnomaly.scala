package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Always-on anomaly detection — the streaming form of the batch
  * [[graft.ops.EventOps.eventsAnomaly]] query, made PREQUENTIAL: each
  * event is scored against its user's running mean/σ as of BEFORE that
  * event (the online-learning evaluation order), then folded into the
  * state. The batch query scores against the full-history σ — fine for
  * offline sweeps, impossible online; this component is what actually
  * pages an on-call.
  *
  * State per user is three doubles (n, Σv, Σv²) in a `transformWithState`
  * ValueState — O(users) bytes total, the moments merge that every
  * running-stats sketch uses. Warm-up gate: no score until MIN_N prior
  * events (a z against 3 samples is noise); σ==0 histories score nothing.
  *
  * Ordering: within a micro-batch each user's rows are sorted by
  * (ts, event_id) before the fold, so the prequential order is the event
  * order, not arrival order. ACROSS batches the state is necessarily
  * fold-order-dependent — that is inherent to any online detector (the
  * score at time t uses what the detector had SEEN by t); the spec pins
  * stream ≡ the sorted-order reference fold on a single-batch drain and
  * asserts the precondition loudly, the [[StreamingJoin]] discipline.
  */
object StreamingAnomaly {

  final case class Ev(user_id: Long, ts_us: Long, event_id: Long, value: Double)
  final case class Moments(n: Long, sum: Double, sumsq: Double)
  final case class AnomalyOut(user_id: Long, event_id: Long, value: Double,
    z: Double, n_seen: Long)

  val MinN = 20
  val Threshold = 3.0

  class AnomalyProcessor extends StatefulProcessor[Long, Ev, AnomalyOut] {
    @transient private var st: ValueState[Moments] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[Moments]("moments",
        Encoders.product[Moments], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[AnomalyOut] = {
      var s = if (st.exists) st.get() else Moments(0L, 0.0, 0.0)
      val out = Vector.newBuilder[AnomalyOut]
      // event order, not arrival order (see scaladoc)
      rows.toVector.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        if (s.n >= MinN) {
          val mean = s.sum / s.n
          val variance = math.max(s.sumsq / s.n - mean * mean, 0.0)
          val sigma = math.sqrt(variance)
          if (sigma > 0) {
            val z = (e.value - mean) / sigma
            if (math.abs(z) > Threshold)
              out += AnomalyOut(userId, e.event_id, e.value, z, s.n)
          }
        }
        s = Moments(s.n + 1, s.sum + e.value, s.sumsq + e.value * e.value)
      }
      st.update(s)
      out.result().iterator
    }
  }

  def anomalies(events: DataFrame): Dataset[AnomalyOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value").cast("double"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new AnomalyProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Bounded drain into a memory sink; returns the drain so callers can
    * assert the single-batch precondition.
    */
  def runOnce(spark: SparkSession, dir: String,
      queryName: String): MemoryDrain.Drained =
    MemoryDrain.drain(spark,
      anomalies(StreamingEvents.readEventStream(spark, dir)), queryName)
}

package graft.streaming

import java.time.Duration

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user running stats on the `transformWithState` arbitrary-state API
  * (Spark 4's successor to `mapGroupsWithState`): each user's cumulative
  * event count / value total lives in a typed `ValueState`, updated per
  * micro-batch and re-emitted in Update mode. Complements
  * [[StreamingSessionize]] (which uses the classic
  * `flatMapGroupsWithState`) so both stateful APIs are exercised.
  *
  * What the new API buys at scale, used here deliberately:
  *  - **State TTL** (`TTLConfig`): idle users' state is evicted by the
  *    store itself after `ttl` — on an unbounded user population the state
  *    size becomes O(users active within TTL), the knob
  *    `mapGroupsWithState` only approximates with manual timeout
  *    plumbing. `TTLConfig.NONE` keeps everything (test mode).
  *  - **RocksDB state store**: transformWithState requires the RocksDB
  *    provider, i.e. state spills to local disk instead of living on the
  *    executor heap — the store that survives multi-GB per-executor state.
  *
  * State is keyed by user_id, so the only shuffle is the groupByKey hash
  * partitioning; within a batch each key folds its rows in one pass.
  */
object StreamingUserStats {

  final case class Ev(user_id: Long, value: Double)
  final case class UserAgg(n_events: Long, total_value: Double)
  final case class UserStatsOut(user_id: Long, n_events: Long, total_value: Double)

  /** Folds each batch's rows for one user into the running aggregate. */
  class UserStatsProcessor(ttl: Option[Duration])
      extends StatefulProcessor[Long, Ev, UserStatsOut] {
    @transient private var agg: ValueState[UserAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[UserAgg]("agg", Encoders.product[UserAgg],
        ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

    override def handleInputRows(userId: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[UserStatsOut] = {
      var state = if (agg.exists) agg.get() else UserAgg(0L, 0.0)
      rows.foreach { e =>
        state = UserAgg(state.n_events + 1, state.total_value + e.value)
      }
      agg.update(state)
      Iterator.single(UserStatsOut(userId, state.n_events, state.total_value))
    }
  }

  def userStats(events: DataFrame, ttl: Option[Duration]): Dataset[UserStatsOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new UserStatsProcessor(ttl),
        TimeMode.None(), OutputMode.Update())
  }

  /** Bounded drain into a memory sink (via [[MemoryDrain]]). Returns
    * every per-batch update row; the LAST row per user is the final total.
    */
  def runOnce(spark: SparkSession, dir: String, queryName: String,
      ttl: Option[Duration] = None): DataFrame =
    MemoryDrain.drain(spark,
      userStats(StreamingEvents.readEventStream(spark, dir), ttl),
      queryName).table
}

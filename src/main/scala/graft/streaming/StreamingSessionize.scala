package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Stateful streaming sessionization (SURVEY.md §7.5 / builder brief:
  * `flatMapGroupsWithState` for custom state): the streaming counterpart of
  * EventOps.eventsSessionize with identical session semantics (30-minute
  * inactivity gap over second-granularity timestamps).
  *
  * State per user = the currently-open session; a closed session is emitted
  * as soon as a later event proves the gap. The final open session stays in
  * state (append-mode contract — the bounded-drain test accounts for it).
  * At scale this is the canonical unbounded-clickstream shape: state size is
  * O(active users), not O(events).
  */
object StreamingSessionize {

  final case class Ev(user_id: Long, event_id: Long, sec: Long)
  final case class OpenSession(sessionSeq: Long, startSec: Long, lastSec: Long,
      nEvents: Long)
  final case class SessionOut(user_id: Long, session_seq: Long, n_events: Long,
      duration_sec: Long)

  val GapSec = 1800L

  /** Pure fold shared by the group function and its unit tests: events MUST
    * be pre-sorted (ts, event_id) within the batch.
    */
  def foldEvents(events: Seq[Ev], state: Option[OpenSession], userId: Long)
      : (Seq[SessionOut], Option[OpenSession]) = {
    var open = state
    val closed = Seq.newBuilder[SessionOut]
    events.foreach { e =>
      open match {
        case Some(s) if e.sec - s.lastSec <= GapSec =>
          open = Some(s.copy(lastSec = e.sec, nEvents = s.nEvents + 1))
        case Some(s) =>
          closed += SessionOut(userId, s.sessionSeq, s.nEvents, s.lastSec - s.startSec)
          open = Some(OpenSession(s.sessionSeq + 1, e.sec, e.sec, 1))
        case None =>
          open = Some(OpenSession(1, e.sec, e.sec, 1))
      }
    }
    (closed.result(), open)
  }

  def sessionize(events: DataFrame): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Ev], state: GroupState[OpenSession]) =>
          val sorted = batch.toSeq.sortBy(e => (e.sec, e.event_id))
          val (closed, open) = foldEvents(sorted, state.getOption, userId)
          open match {
            case Some(s) => state.update(s)
            case None => if (state.exists) state.remove()
          }
          closed.iterator
      }
  }

  /** Bounded drain into a memory sink; returns closed sessions. */
  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q: StreamingQuery = sessionize(StreamingEvents.readEventStream(spark, dir))
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

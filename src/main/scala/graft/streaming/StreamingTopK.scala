package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Streaming heavy hitters: sharded Misra-Gries sketches as
  * `transformWithState` MapState — the always-on form of the batch
  * [[graft.functions.MisraGriesCandidates]] aggregation.
  *
  * Sharding does the distribution: events group by `hash(user_id) % shards`,
  * so each shard task maintains ONE O(k) counter map in a typed `MapState`
  * (the third arbitrary-state primitive after StreamingUserStats' ValueState
  * and StreamingSessionize's flatMapGroups state — completing the surface).
  * Because a user's entire stream hashes to exactly one shard, the classic
  * MG guarantee survives sharding: any user with global count > N/k has
  * shard count > N_shard/k and therefore sits in that shard's candidate set
  * — the union of shard candidates is a SUPERSET of the true heavy hitters
  * (StreamingTopKSpec pins this against the exact batch counts).
  *
  * Scale posture: state is O(shards · k) TOTAL regardless of stream length
  * or user cardinality — no per-user state, no TTL needed; the only shuffle
  * is the groupByKey on the shard id; per batch each shard folds its rows
  * in one pass and re-emits its ≤k candidates (Update mode). A driver-side
  * exact recount of the ≤ shards·k candidates (the batch `heavy_hitters`
  * discipline) turns the superset into the exact top-k when needed.
  */
object StreamingTopK {

  final case class ShardedEv(shard: Int, user_id: Long)
  final case class Candidate(shard: Int, user_id: Long, mg_count: Long)

  /** One Misra-Gries(k) counter map per shard key. The decrement step is
    * the textbook one: an unmatched arrival with a full map decrements
    * every counter, evicting zeros — each arrival touches at most k
    * entries, so a batch of B rows costs O(B·k) worst case with k small
    * and constant (k=16 default).
    */
  class MgProcessor(k: Int)
      extends StatefulProcessor[Int, ShardedEv, Candidate] {
    @transient private var counters: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counters = getHandle.getMapState[Long, Long]("mg",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(shard: Int, rows: Iterator[ShardedEv],
        timerValues: TimerValues): Iterator[Candidate] = {
      // fold the batch through a local copy (state-store round trips per
      // row would dominate); write back once at the end
      val m = scala.collection.mutable.Map.empty[Long, Long]
      counters.iterator().foreach(p => m(p._1) = p._2)
      rows.foreach { e =>
        m.get(e.user_id) match {
          case Some(c) => m(e.user_id) = c + 1
          case None if m.size < k => m(e.user_id) = 1L
          case None => // decrement-all, drop zeros (no insert)
            m.mapValuesInPlace((_, c) => c - 1)
            m.filterInPlace((_, c) => c > 0)
        }
      }
      val stale = counters.keys().filterNot(m.contains).toSeq
      stale.foreach(counters.removeKey)
      m.foreach { case (u, c) => counters.updateValue(u, c) }
      m.iterator.map { case (u, c) => Candidate(shard, u, c) }
    }
  }

  def topKCandidates(events: DataFrame, shards: Int, k: Int): Dataset[Candidate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(pmod(hash(col("user_id")), lit(shards)).cast("int").as("shard"),
        col("user_id"))
      .as[ShardedEv]
      .groupByKey(_.shard)
      .transformWithState(new MgProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  /** Bounded drain into a memory sink (RocksDB provider, as
    * transformWithState requires). The LAST emission per (shard, user) is
    * that shard's final candidate set; `nBatches` lets callers scale
    * across-emission bounds when the source splits the drain.
    */
  def runOnce(spark: SparkSession, dir: String, queryName: String,
      shards: Int = 4, k: Int = 16): MemoryDrain.Drained =
    MemoryDrain.drain(spark,
      topKCandidates(StreamingEvents.readEventStream(spark, dir), shards, k),
      queryName)
}

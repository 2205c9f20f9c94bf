package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Shared bounded-drain harness for the `transformWithState` components
  * (extracted from three verbatim copies — review r6 finding): forces the
  * RocksDB state-store provider (transformWithState refuses the default
  * HDFS-backed store), drains the stream into a memory sink with
  * `AvailableNow`, restores the prior provider even when `start()` itself
  * throws, and reports how many non-empty micro-batches ran so callers'
  * assertions can be batch-split-robust.
  */
object MemoryDrain {

  final case class Drained(table: DataFrame, nBatches: Int)

  def drain[T](spark: SparkSession, ds: Dataset[T], queryName: String): Drained = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = ds.writeStream
        .queryName(queryName)
        .outputMode("update")
        .format("memory")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      Drained(spark.table(queryName),
        q.recentProgress.count(_.numInputRows > 0))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}

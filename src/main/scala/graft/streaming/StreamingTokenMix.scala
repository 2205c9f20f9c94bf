package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming source-mixture monitor — the always-on form of the batch
  * [[graft.ops.TextOps.tokenStats]] rollup: documents arriving as files
  * in a monitored folder are tokenized per micro-batch (the SAME
  * normText + whitespace-token rule the batch query and its oracle use)
  * and folded per source into running (n_docs, ws_tokens) totals via
  * `transformWithState` ValueState. Each batch emits the sources it
  * touched with their running totals (Update mode) — exactly what a live
  * data-mixing dashboard upserts, and the number [[graft.ops.CurationOps
  * .sourceMixture]]'s weights are recomputed from as a corpus grows.
  *
  * The fold is a commutative counter, so the drained stream's final
  * per-source row equals the batch rollup REGARDLESS of how arrivals
  * were chopped into micro-batches or ordered within one — the
  * [[StreamingCdc]] stream ≡ batch discipline, pinned in
  * StreamingDedupSpec's style against the oracle-verified batch query.
  *
  * Scale: state is ONE small row per source (the mixing key space —
  * thousands at worst), not per document; the only shuffle is the
  * groupByKey hash partitioning, and the per-batch tokenize is the batch
  * query's narrow codegen'd regexp pass.
  */
object StreamingTokenMix {

  final case class DocTok(source: String, ws_tokens: Long)
  final case class MixState(n_docs: Long, ws_tokens: Long)
  final case class MixOut(source: String, n_docs: Long, ws_tokens: Long)

  class MixProcessor extends StatefulProcessor[String, DocTok, MixOut] {
    @transient private var st: ValueState[MixState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MixState]("mix",
        Encoders.product[MixState], TTLConfig.NONE)

    override def handleInputRows(source: String, rows: Iterator[DocTok],
        timerValues: TimerValues): Iterator[MixOut] = {
      var s = if (st.exists) st.get() else MixState(0L, 0L)
      rows.foreach { d =>
        s = MixState(s.n_docs + 1, s.ws_tokens + d.ws_tokens)
      }
      st.update(s)
      Iterator.single(MixOut(source, s.n_docs, s.ws_tokens))
    }
  }

  /** Documents file stream (schema probed from the batch footer, the
    * [[StreamingEvents.readEventStream]] glob discipline).
    */
  def readDocStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema).parquet(s"$dir/[d]ocuments.parquet")
  }

  def tokenMixState(docs: DataFrame): Dataset[MixOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source"),
        regexp_count(graft.ops.DedupOps.normText(col("text")),
          lit("\\S+")).cast("long").as("ws_tokens"))
      .as[DocTok]
      .groupByKey(_.source)
      .transformWithState(new MixProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame =
    MemoryDrain.drain(spark,
      tokenMixState(readDocStream(spark, dir)), queryName).table
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingAnomaly

/** Stream/reference parity for the prequential anomaly detector: on a
  * single-batch drain the streaming fold must emit exactly the anomalies
  * an independent Scala fold over the (ts, event_id)-sorted history
  * computes — same events, same z to double precision, same warm-up gate.
  */
class StreamingAnomalySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("streaming prequential anomalies = sorted-order reference fold (single batch)") {
    val drained = StreamingAnomaly.runOnce(spark, dir, "anom_stream_test")
    // prequential state across batches depends on fold order; the exact
    // equality below is only sound single-batch — pin it loudly
    assert(drained.nBatches == 1,
      s"drain split into ${drained.nBatches} batches; reference fold " +
        "equality requires one (multi-file fixture or maxFilesPerTrigger?)")
    val got = drained.table.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(3), r.getLong(4)))
      .toMap

    val events = graft.ops.Tables(spark, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) as ts_us", "event_id",
        "cast(value as double) as value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = scala.collection.mutable.Map.empty[(Long, Long), (Double, Long)]
    events.groupBy(_._1).foreach { case (user, evs) =>
      var n = 0L; var sum = 0.0; var sumsq = 0.0
      evs.sortBy(e => (e._2, e._3)).foreach { case (_, _, id, v) =>
        if (n >= StreamingAnomaly.MinN) {
          val mean = sum / n
          val sigma = math.sqrt(math.max(sumsq / n - mean * mean, 0.0))
          if (sigma > 0) {
            val z = (v - mean) / sigma
            if (math.abs(z) > StreamingAnomaly.Threshold)
              expected((user, id)) = (z, n)
          }
        }
        n += 1; sum += v; sumsq += v * v
      }
    }
    assert(got.keySet == expected.keySet,
      s"stream-only=${(got.keySet -- expected.keySet).take(3)} " +
        s"ref-only=${(expected.keySet -- got.keySet).take(3)}")
    got.foreach { case (k, (z, n)) =>
      val (ez, en) = expected(k)
      assert(n == en, s"$k: n_seen $n vs $en")
      assert(math.abs(z - ez) < 1e-9, s"$k: z $z vs $ez")
    }
    assert(got.nonEmpty, "fixture produced no anomalies — vacuous")
    // warm-up gate: nothing scored before MinN prior events
    got.foreach { case (_, (_, n)) => assert(n >= StreamingAnomaly.MinN) }
  }
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items sketch as a typed `Aggregator` — the
  * frequent-items member of the sketch family ([[KmvSmallest]] = distinct,
  * HLL/KLL in `cardinality_sketches` = cardinality/quantiles).
  *
  * Guarantee (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): after any sequence of reduces and
  * merges with k counters, every item with true frequency > n/(k+1)
  * survives as a candidate, and each surviving counter undercounts its
  * item by at most n/(k+1). The CANDIDATE SET may vary with partition
  * order (counter subtraction is order-sensitive) — so the shipped query
  * uses the classic two-pass form: MG proposes ≤ k candidates in one
  * O(k)-buffer pass, an exact recount over the tiny candidate list makes
  * the final answer deterministic and ORACLE-CHECKABLE (the superset
  * guarantee makes the recount complete, whatever order the merge took).
  *
  * The buffer is a Map[item → counter], capped at k entries; decrement
  * happens lazily on overflow (subtract the (k+1)-th largest counter
  * value from all, drop non-positive) — the standard mergeable-summaries
  * form of the algorithm.
  */
class MisraGriesCandidates(k: Int)
  extends Aggregator[String, Map[String, Long], Array[String]] {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest counter from every counter; at most
      // k survive (those strictly above it). On the reduce path the map
      // is exactly k+1 entries, where the (k+1)-th largest IS the minimum
      // — O(k) instead of the O(k log k) sort, and reduce overflow is the
      // hot loop (most incoming items are absent from a full buffer).
      val cut =
        if (m.size == k + 1) m.values.min
        else m.values.toSeq.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (i, c) =>
        if (c - cut > 0) Some(i -> (c - cut)) else None
      }
    }

  override def reduce(buf: Map[String, Long], v: String): Map[String, Long] =
    if (v == null) buf
    else shrink(buf.updated(v, buf.getOrElse(v, 0L) + 1L))

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    shrink(b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    })

  override def finish(buf: Map[String, Long]): Array[String] =
    buf.keys.toArray.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}

object MisraGries {
  /** Column form for untyped `groupBy(...).agg(...)`. */
  def candidates(c: Column, k: Int): Column =
    udaf(new MisraGriesCandidates(k)).apply(c)
}

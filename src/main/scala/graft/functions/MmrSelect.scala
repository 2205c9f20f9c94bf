package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98) top-k
  * selection as a typed `Aggregator` — the diversity rerank a retrieval
  * stack runs AFTER candidate scoring (`rrf_fusion` fuses arms,
  * `mmr_rerank` de-redundifies the winner): greedily pick k candidates
  * maximizing `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`, so every
  * pick trades relevance against similarity to what's already shown.
  *
  * Why an Aggregator: the greedy loop is inherently sequential in k, but
  * its INPUT is only each query's shortlist — so the scale shape is "one
  * bounded buffer per query", exactly the [[TopKRows]] discipline. The
  * buffer ingests the full scored candidate stream but keeps only the
  * top-`shortlist` by (rel desc, id asc) — merge-associative, ≤ shortlist
  * rows per (partition, query) reach the shuffle — and `finish` runs the
  * O(shortlist·k) greedy selection with the vectors it already holds. No
  * per-step joins, no k-round shuffle chain: ONE keyed aggregation.
  *
  * Determinism (oracle validity): buffer membership is a pure function of
  * the data (ordered insert, ties to min id); the greedy argmax breaks
  * score ties by min id; dot products accumulate left-to-right exactly
  * like the `dot` Column expression, so DuckDB's `list_dot_product`
  * reproduces every score bit-for-bit and the unrolled-k SQL oracle stays
  * exact. The penalty weight is an EXPLICIT parameter rather than derived
  * as `1 − λ` inside the loop (ADVICE r10): `1 − 0.7` evaluates to
  * 0.30000000000000004 while an oracle writing the conventional literal
  * `0.3` holds ~0.2999999999999999889 — a ~6e-17 divergence that could
  * flip a greedy-argmax tie or a rounding boundary between engines. Both
  * sides now use the SAME double (the caller passes the literal the
  * oracle prints). With an empty selected set the penalty term is 0 —
  * pick 1 is the pure-relevance argmax, the standard MMR convention.
  */
class MmrSelect(k: Int, lambda: Double, penalty: Double, shortlist: Int)
    extends Aggregator[MmrSelect.In, Vector[MmrSelect.In], Seq[MmrSelect.Pick]] {
  require(k > 0 && shortlist >= k && lambda >= 0 && lambda <= 1 && penalty >= 0)
  // penalty is passed separately from lambda ONLY so both engines evaluate
  // the same double (1-0.7 vs the literal 0.3 differ by ~4e-17); it must
  // still BE (1-lambda) or the score is no longer MMR — reject mistakes
  // while admitting the intended fp-literal difference (ADVICE r11)
  require(math.abs((1 - lambda) - penalty) < 1e-9,
    s"penalty must equal 1-lambda up to fp-literal error: lambda=$lambda penalty=$penalty")

  override def zero: Vector[MmrSelect.In] = Vector.empty

  // "better-than" for shortlist membership: higher rel first, ties to min id
  private def better(a: MmrSelect.In, b: MmrSelect.In): Boolean =
    a.rel > b.rel || (a.rel == b.rel && a.id < b.id)

  private def insert(buf: Vector[MmrSelect.In], v: MmrSelect.In): Vector[MmrSelect.In] =
    if (buf.length == shortlist && !better(v, buf.last)) buf
    else {
      val i = buf.indexWhere(better(v, _))
      val ins = if (i < 0) buf :+ v else (buf.take(i) :+ v) ++ buf.drop(i)
      if (ins.length > shortlist) ins.take(shortlist) else ins
    }

  override def reduce(buf: Vector[MmrSelect.In], v: MmrSelect.In): Vector[MmrSelect.In] =
    if (v == null || v.vec == null) buf else insert(buf, v)

  override def merge(a: Vector[MmrSelect.In], b: Vector[MmrSelect.In]): Vector[MmrSelect.In] =
    b.foldLeft(a)(insert)

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0; val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  override def finish(buf: Vector[MmrSelect.In]): Seq[MmrSelect.Pick] = {
    val selected = scala.collection.mutable.ArrayBuffer.empty[MmrSelect.In]
    val remaining = scala.collection.mutable.ArrayBuffer(buf: _*)
    val out = Seq.newBuilder[MmrSelect.Pick]
    var rank = 1
    while (rank <= k && remaining.nonEmpty) {
      var bestIdx = -1; var bestScore = 0.0; var bestId = 0L
      var i = 0
      while (i < remaining.length) {
        val c = remaining(i)
        var maxSim = 0.0
        var first = true
        selected.foreach { s =>
          val d = dot(c.vec, s.vec)
          if (first || d > maxSim) { maxSim = d; first = false }
        }
        val score = lambda * c.rel - penalty * (if (selected.isEmpty) 0.0 else maxSim)
        if (bestIdx < 0 || score > bestScore ||
            (score == bestScore && c.id < bestId)) {
          bestIdx = i; bestScore = score; bestId = c.id
        }
        i += 1
      }
      val picked = remaining.remove(bestIdx)
      selected += picked
      out += MmrSelect.Pick(rank, picked.id, bestScore)
      rank += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[Vector[MmrSelect.In]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[MmrSelect.In]]()
  override def outputEncoder: Encoder[Seq[MmrSelect.Pick]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MmrSelect.Pick]]()
}

object MmrSelect {
  final case class In(id: Long, rel: Double, vec: Seq[Double])
  final case class Pick(rank: Int, id: Long, score: Double)

  /** Column form: array of (rank, id, score) structs, rank order.
    * `penalty` is the explicit (1−λ) coefficient — pass the SAME literal
    * the oracle SQL prints (see class doc).
    */
  def mmrPicks(id: Column, rel: Column, vec: Column,
      k: Int, lambda: Double, penalty: Double, shortlist: Int): Column =
    udaf(new MmrSelect(k, lambda, penalty, shortlist), Encoders.product[In])
      .apply(id, rel, vec)
}

package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One sampled observation: the deterministic hash tape + the measured
  * value it carries.
  */
case class HashedValue(h: String, v: Double)

/** Quantile sketch via deterministic hash sampling — the quantile member
  * of the sketch family ([[KmvSmallest]] = distinct,
  * [[MisraGriesCandidates]] = frequent items). Keeps the k value-carrying
  * rows with the SMALLEST md5 hashes per group: because the hash is a
  * uniform "random tape" over row ids, the kept set is a uniform random
  * sample of the group, and its order statistics estimate the group's
  * quantiles with rank error O(1/√k) w.h.p. (sample-quantile bound; k=512
  * ⇒ ~4.4% at 1σ).
  *
  * Why THIS sketch and not KLL/GK: those carry tighter guarantees per
  * byte, but their buffer contents depend on reduce/merge order, which a
  * distributed aggregation cannot pin — their output is only
  * bound-checkable, never value-reproducible. The k-smallest-hash set is
  * a pure FUNCTION OF THE DATA (same rows ⇒ same sample, any order), so
  * the estimates are deterministic and a SQL oracle replicates them
  * bit-for-bit with a rank-over-hash window. Same O(k) mergeable-buffer
  * scale shape: partial aggregation map-side, k pairs per partition per
  * group on the wire, no shuffle of the full value space (the oracle's
  * window form shuffles EVERY row to rank it — that contrast is the
  * point).
  *
  * finish() returns the sample's values sorted ASCENDING, so
  * `element_at(sample, ceil(q·n))` reads the q-quantile estimate — a raw
  * data value (selection, not interpolation), hence engine-exact.
  */
class HashSampleValues(k: Int)
  extends Aggregator[HashedValue, Vector[HashedValue], Seq[Double]] {
  require(k > 0)

  override def zero: Vector[HashedValue] = Vector.empty

  override def reduce(buf: Vector[HashedValue], x: HashedValue): Vector[HashedValue] =
    if (x == null || x.h == null || (buf.length == k && buf.last.h <= x.h)) buf
    else if (buf.exists(_.h == x.h)) buf
    else {
      val i = buf.indexWhere(_.h > x.h)
      val ins = if (i < 0) buf :+ x else (buf.take(i) :+ x) ++ buf.drop(i)
      if (ins.length > k) ins.take(k) else ins
    }

  override def merge(a: Vector[HashedValue], b: Vector[HashedValue]): Vector[HashedValue] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Vector[HashedValue]): Seq[Double] =
    buf.map(_.v).sorted

  override def bufferEncoder: Encoder[Vector[HashedValue]] =
    ExpressionEncoder[Vector[HashedValue]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object SampleQuantile {
  /** Column form for untyped `groupBy(...).agg(...)`: `h` is the hash
    * tape (md5 of a unique row id), `v` the measured value.
    */
  def hashSample(h: Column, v: Column, k: Int): Column =
    udaf(new HashSampleValues(k), ExpressionEncoder[HashedValue]())
      .apply(h, v)
}

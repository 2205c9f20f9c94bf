package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct sketch as a typed
  * `Aggregator[IN, BUF, OUT]` — the custom-aggregation rung of the
  * SURVEY §7.4 extension ladder (Expression ✓, Rule ✓, DSv2 ✓, and now
  * Aggregator). Keeps the k lexicographically-smallest DISTINCT md5
  * hashes per group; because fixed-width lowercase hex sorts identically
  * to its numeric value, the k-th smallest hash doubles as the KMV
  * cardinality estimator (E = (k−1)/frac(h_k)).
  *
  * Why an Aggregator and not a window rank: the window form shuffles
  * EVERY (group, hash) row to rank it; this buffer is O(k) per group,
  * merges associatively on the map side (partial aggregation), and ships
  * only k hashes per partition per group — the mergeable-sketch shape
  * that survives 100 TB groupBys. Deterministic (md5, no seeds), so the
  * DuckDB oracle can reproduce it exactly — unlike HLL whose register
  * layout is engine-private.
  *
  * The buffer is a sorted, distinct, ≤k Vector; reduce/merge maintain the
  * invariant. JVM-typed aggregation (no codegen) is the documented cost
  * of this rung — acceptable for sketch aggregates whose input is already
  * a narrow hashed column.
  */
class KmvSmallest(k: Int) extends Aggregator[String, Vector[String], String] {
  require(k > 0)

  override def zero: Vector[String] = Vector.empty

  override def reduce(buf: Vector[String], v: String): Vector[String] =
    if (v == null || (buf.length == k && buf.last <= v)) buf
    else if (buf.contains(v)) buf
    else {
      val i = buf.indexWhere(_ > v)
      val inserted = if (i < 0) buf :+ v else (buf.take(i) :+ v) ++ buf.drop(i)
      if (inserted.length > k) inserted.take(k) else inserted
    }

  override def merge(a: Vector[String], b: Vector[String]): Vector[String] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Vector[String]): String = buf.mkString(",")

  override def bufferEncoder: Encoder[Vector[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[String]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object KmvSketch {
  /** Column form for untyped `groupBy(...).agg(...)`. */
  def kmvSmallest(c: Column, k: Int): Column = udaf(new KmvSmallest(k)).apply(c)

  /** (first-8-hex-nibbles + ½) / 2³² — uniform in (0,1) from an md5 hex
    * string. ONE definition shared by A-ES weighted sampling
    * (`corpus_weighted_sample`) and the KMV union estimator
    * (`kmv_overlap`); [[hexPrefixUniformSql]] is the DuckDB mirror of the
    * same arithmetic, so engine/oracle parity is definitional rather than
    * maintained by hand at each call site. (The 13-hex variant in
    * [[kmvEstimate]] trades range for the full 52 bits a double holds —
    * widen here the same way if 32 bits ever bites.)
    */
  def hexPrefixUniform(h: Column): Column = {
    import org.apache.spark.sql.functions._
    (conv(substring(h, 1, 8), 16, 10).cast("double") + 0.5) / 4294967296.0
  }

  def hexPrefixUniformSql(expr: String): String =
    s"(CAST(('0x' || substr($expr, 1, 8)) AS BIGINT) + 0.5) / 4294967296.0"

  /** KMV cardinality estimate from the k-th (last) hash of [[kmvSmallest]]'s
    * output: (k−1) / fraction, where the fraction is the first 13 hex
    * chars (52 bits — exact in a double) scaled to [0, 1). Returns null
    * for groups with fewer than k distinct values (use the exact count
    * there — the sketch only matters when distincts exceed k).
    */
  def kmvEstimate(kmv: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    val hashes = split(kmv, ",")
    val kth = element_at(hashes, k)
    val frac = conv(substring(kth, 1, 13), 16, 10).cast("double") /
      math.pow(16.0, 13)
    when(size(hashes) >= k, lit(k - 1).cast("double") / frac)
  }
}

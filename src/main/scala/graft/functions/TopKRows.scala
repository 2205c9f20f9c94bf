package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k row selection as a typed `Aggregator` — the map-combining
  * form of `row_number() OVER (PARTITION BY g ORDER BY key) <= k`.
  *
  * Why this exists (the `corpus_reservoir` 100 TB path, promised in
  * COVERAGE.md and implemented here): the window form shuffles EVERY row
  * of the corpus to rank it, then discards all but k per group; this
  * buffer keeps the k smallest (key, id) pairs per group and merges
  * associatively, so partial aggregation ships AT MOST k rows per
  * (partition, group) — the same O(k)-buffer discipline as
  * [[KmvSmallest]] / [[MisraGriesCandidates]]. Ties break by id, making
  * the result a pure function of the data; `TopKRowsSpec` pins identity
  * with the window form under 1/7/32-way partitionings.
  */
class TopKRows(k: Int)
    extends Aggregator[TopKRows.In, Vector[(String, Long)], Seq[Long]] {
  require(k > 0)

  override def zero: Vector[(String, Long)] = Vector.empty

  private def lt(a: (String, Long), b: (String, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: Vector[(String, Long)], p: (String, Long)): Vector[(String, Long)] =
    if (buf.length == k && !lt(p, buf.last)) buf
    else {
      val i = buf.indexWhere(lt(p, _))
      val inserted = if (i < 0) buf :+ p else (buf.take(i) :+ p) ++ buf.drop(i)
      if (inserted.length > k) inserted.take(k) else inserted
    }

  override def reduce(buf: Vector[(String, Long)], v: TopKRows.In): Vector[(String, Long)] =
    if (v == null || v.key == null) buf else insert(buf, (v.key, v.id))

  override def merge(a: Vector[(String, Long)], b: Vector[(String, Long)]): Vector[(String, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: Vector[(String, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[Vector[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Vector[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object TopKRows {
  final case class In(key: String, id: Long)

  /** Column form: `topKIds(keyCol, idCol, k)` → array of the k ids with
    * the smallest (key, id), in rank order.
    */
  def topKIds(key: Column, id: Column, k: Int): Column =
    udaf(new TopKRows(k), Encoders.product[In]).apply(key, id)
}

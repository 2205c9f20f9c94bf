package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.expressions.DotProduct

/** Vector math over `ArrayType` embedding columns, built from higher-order
  * functions (`zip_with`/`aggregate`) so everything stays inside Catalyst —
  * no UDFs, no driver round trips (SURVEY.md §7.5).
  *
  * Inputs are cast to array<double> before arithmetic: the test embeddings
  * are float32 (FIXTURES.md) and float accumulation would diverge from the
  * DuckDB oracles' double math.
  */
object VectorFunctions {

  def toDoubleArray(c: Column): Column = c.cast("array<double>")

  /** Σ aᵢ·bᵢ — the native codegen'd [[DotProduct]] expression (sequential
    * left fold, bit-identical to [[dotComposed]] and to DuckDB's
    * list_dot_product order for oracle parity).
    */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** The built-in composition equivalent of [[dot]] — kept as the
    * cross-check reference (VectorExpressionsSpec pins bit equality).
    */
  def dotComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Σ (aᵢ−bᵢ)² — the native codegen'd [[SquaredDistance]] expression
    * (sequential left fold, bit-identical to [[squaredDistanceComposed]];
    * keeps Σ(x−y)² rather than the catastrophically-cancelling
    * |a|²+|b|²−2ab identity).
    */
  def squaredDistance(a: Column, b: Column): Column =
    ColumnBridge.column(graft.functions.expressions.SquaredDistance(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** The built-in composition equivalent of [[squaredDistance]] — kept as
    * the cross-check reference (VectorExpressionsSpec pins bit equality).
    */
  def squaredDistanceComposed(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, d) => acc + d)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Unit-normalize so each candidate pair costs ONE dot product instead of
    * dot + two norms. Evaluate this BELOW a join/exchange boundary (the
    * shuffle or broadcast build materializes it once per vector); at real
    * scale, normalized vectors would be materialized to storage up front.
    * Native codegen'd [[graft.functions.expressions.UnitNormalize]] — the
    * composed form ([[normalizeComposed]]) re-runs the interpreted
    * `dot(a, a)` fold per ELEMENT inside the `transform` lambda, O(d²)
    * boxed work per row (r18 JobProbe; bit identity pinned in
    * VectorExpressionsSpec).
    */
  def normalize(a: Column): Column =
    ColumnBridge.column(graft.functions.expressions.UnitNormalize(
      ColumnBridge.expression(a)))

  /** The `transform` composition equivalent of [[normalize]] — kept as the
    * cross-check reference (VectorExpressionsSpec pins bit equality).
    */
  def normalizeComposed(a: Column): Column =
    transform(a, x => x / sqrt(dot(a, a)))

  /** All sign-LSH band buckets in one narrow pass — the native
    * [[graft.functions.expressions.SignLshBuckets]] expression; see
    * [[signLshBucketsComposed]] for the built-in composition it replaces
    * (bit-identity pinned in VectorExpressionsSpec).
    */
  def signLshBuckets(v: Column, bitsPerBand: Int, bands: Int): Column =
    ColumnBridge.column(graft.functions.expressions.SignLshBuckets(
      ColumnBridge.expression(v), bitsPerBand, bands))

  /** Projection of `v` onto the deterministic md5-derived hyperplane `h`:
    * weight for dimension i is `(md5id60("i_h") mod 1e6)/1e6 − 0.5`,
    * uniform in [−0.5, 0.5) — md5id60 = first 15 hex chars of the digest
    * as a BIGINT (the Md5ShingleId convention, always ≥ 0), so the SAME
    * weight is computable in DuckDB:
    * `(('0x' || substr(md5(i || '_' || h), 1, 15))::BIGINT % 1000000)/1e6 − 0.5`.
    * Composed-form reference for [[signLshBuckets]].
    */
  def planeDot(v: Column, h: Int): Column =
    aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
        x * (((conv(substring(md5(
            concat(i.cast("string"), lit("_"), lit(h.toString))), 1, 15),
            16, 10).cast("long") % lit(1000000L)).cast("double") /
          lit(1000000.0)) - lit(0.5))),
      lit(0.0), (acc, x) => acc + x)

  /** The H-separate-folds composition equivalent of [[signLshBuckets]] —
    * kept as the cross-check reference.
    */
  def signLshBucketsComposed(v: Column, bitsPerBand: Int, bands: Int): Column =
    array((0 until bands).map(b =>
      (0 until bitsPerBand).map(r =>
        when(planeDot(v, b * bitsPerBand + r) > 0, lit(1L << r))
          .otherwise(lit(0L)))
        .reduce(_ + _)): _*)

  /** DuckDB oracle fragments (same double-cast + normalize-then-dot op
    * order as the Spark side, so values agree to float ulps).
    */
  def normalizeOracle(x: String): String =
    s"list_transform(CAST($x AS DOUBLE[]), v -> v / sqrt(list_dot_product(CAST($x AS DOUBLE[]), CAST($x AS DOUBLE[]))))"

  def cosineOracle(a: String, b: String): String =
    s"list_dot_product(${normalizeOracle(a)}, ${normalizeOracle(b)})"

  /** DuckDB transliteration of [[signLshBuckets]] over the `embeddings`
    * table, as a WITH-clause fragment defining `e(vec_id, label, v)` and
    * `bb(vec_id, band, bucket)`. The weight CTE states the SAME md5
    * formula as [[graft.functions.expressions.SignLshBuckets.weight]];
    * the plane sums differ from the Spark fold only in fp addition order
    * (sign decisions are ~0.1-magnitude sums — a flip needs |Σ| ≲ 1e-15,
    * negligible at any realistic corpus size and absent on this one).
    */
  def signLshBucketsOracleCte(bitsPerBand: Int, bands: Int): String = {
    val planes = bitsPerBand * bands
    s"""e AS (SELECT vec_id, label, ${normalizeOracle("embedding")} AS v
       |      FROM embeddings),
       |w AS (SELECT i.i AS dim, p.p AS plane,
       |             (('0x' || substr(md5(i.i || '_' || p.p), 1, 15))::BIGINT
       |               % 1000000) / 1000000.0 - 0.5 AS w
       |      FROM (SELECT max(len(v)) AS d FROM e) dims,
       |           LATERAL unnest(generate_series(0, d - 1)) i(i),
       |           LATERAL unnest(generate_series(0, ${planes - 1})) p(p)),
       |ps AS (SELECT e.vec_id, w.plane, sum(e.v[w.dim + 1] * w.w) AS s
       |       FROM e, w WHERE w.dim < len(e.v)
       |       GROUP BY e.vec_id, w.plane),
       |bb AS (SELECT vec_id, plane // $bitsPerBand AS band,
       |              sum(CASE WHEN s > 0 THEN 1 << (plane % $bitsPerBand)
       |                  ELSE 0 END) AS bucket
       |       FROM ps GROUP BY vec_id, plane // $bitsPerBand)""".stripMargin
  }
}

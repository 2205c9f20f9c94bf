package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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

  /** Σ aᵢ·bᵢ via zip_with + aggregate (sequential left fold, matching
    * DuckDB's list_dot_product order for oracle parity).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** DuckDB oracle fragments (same double-cast discipline). */
  def cosineOracle(a: String, b: String): String =
    s"list_dot_product(CAST($a AS DOUBLE[]), CAST($b AS DOUBLE[])) / " +
      s"(sqrt(list_dot_product(CAST($a AS DOUBLE[]), CAST($a AS DOUBLE[]))) * " +
      s"sqrt(list_dot_product(CAST($b AS DOUBLE[]), CAST($b AS DOUBLE[]))))"
}

package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{col, xxhash64}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Explicit Bloom-filter semi-join pruning — the runtime-filter pattern
  * Spark's own `InjectRuntimeFilter` rule builds internally, exposed as a
  * library surface so a pipeline can apply it deliberately (the optimizer
  * rule only fires when its selectivity/size heuristics line up; a curated
  * 100 TB pipeline knows its dimensions and wants the prune guaranteed).
  *
  * Wiring reuses Spark's OWN catalyst nodes ([[BloomFilterAggregate]] /
  * [[BloomFilterMightContain]], both codegen'd) rather than reimplementing
  * a sketch: the build side aggregates xxhash64(key) into a Bloom filter,
  * delivered to the probe side as a SCALAR SUBQUERY (the only non-foldable
  * shape `might_contain` accepts — same as the injection rule; a
  * broadcast-join column would fail its type check).
  *
  * The filter is a superset gate (false positives, no false negatives), so
  * callers follow it with the exact join — the point at 100 TB is that the
  * probe-side SHUFFLE carries only surviving rows, and the parquet scan
  * gets the hashed gate evaluated before the exchange.
  */
object BloomFunctions {

  /** `might_contain(<scalar subquery over keys.agg(bloom_agg)>, xxhash64(value))`.
    *
    * @param keys single-column DataFrame of build-side join keys
    * @param expectedItems sizing for the filter (build-side cardinality
    *                      estimate; ~1.2 bytes/item at the default FPP)
    */
  def bloomMightContain(keys: DataFrame, expectedItems: Long, value: Column): Column = {
    val keyCol = keys.columns match {
      case Array(c) => c
      case cs => throw new IllegalArgumentException(
        s"bloomMightContain expects a single-column keys frame, got ${cs.mkString(",")}")
    }
    val hashedKeys = keys.select(xxhash64(keys(keyCol)).as("h"))
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(col("h")), expectedItems)
    val bloomDf = hashedKeys.agg(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
    ColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      ColumnBridge.expression(xxhash64(value))))
  }
}

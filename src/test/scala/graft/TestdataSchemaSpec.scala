package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Loud guard against driver-side testdata regeneration drift. Round 6
  * shipped a silent catastrophe: `events.ts` switched encodings
  * (TIMESTAMP(NANOS)-as-int64 → TIMESTAMP(MICROS)) and all 31
  * events-dependent queries failed at read time with nothing pointing at
  * the cause. This spec pins the COLUMN CONTRACT every query and oracle
  * assumes; when the driver regenerates testdata differently, the failure
  * names the table, the column, and the file to fix (`ops.Tables`, which
  * owns encoding normalization) instead of scattering -1s through the
  * bench.
  */
class TestdataSchemaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def cols(name: String): Map[String, DataType] =
    graft.ops.Tables(spark, dir, name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  test("events: normalized ts is a session-TZ timestamp; columns stable") {
    val c = cols("events")
    assert(c.keySet == Set("event_id", "ts", "user_id", "event_type",
      "value", "props"), s"events columns drifted: ${c.keySet} — update " +
      "ops.Tables and the events oracles together")
    assert(c("ts") == TimestampType,
      s"events.ts normalized to ${c("ts")}, expected TimestampType — " +
        "Tables.apply must convert whatever encoding the driver generated")
    assert(c("value") == DoubleType && c("user_id") == LongType)
  }

  test("core tables keep the column contract the oracles assume") {
    val expect = Map(
      "lineitem" -> Set("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
      "orders" -> Set("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"),
      "documents" -> Set("doc_id", "text", "lang", "source", "n_chars"),
      "embeddings" -> Set("vec_id", "embedding", "label"))
    expect.foreach { case (t, want) =>
      val got = cols(t).keySet
      assert(got == want, s"$t columns drifted: $got — audit every oracle " +
        s"referencing $t before trusting CORRECTNESS output")
    }
    // temporal columns must stay timestamp-family: date arithmetic and
    // string formatting in ~100 queries assume it
    assert(Set[DataType](TimestampType, TimestampNTZType)
      .contains(cols("lineitem")("l_shipdate")),
      s"l_shipdate type drifted to ${cols("lineitem")("l_shipdate")}")
    assert(Set[DataType](TimestampType, TimestampNTZType)
      .contains(cols("orders")("o_orderdate")),
      s"o_orderdate type drifted to ${cols("orders")("o_orderdate")}")
    assert(cols("embeddings")("embedding") == ArrayType(FloatType),
      "embedding vector type drifted")
  }
}

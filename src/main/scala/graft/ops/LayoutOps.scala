package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-side clustering a 100 TB lakehouse
  * lives on. Min/max file statistics only skip scans when the layout
  * makes them tight — Z-ORDER interleaving is the standard way to keep
  * per-file ranges narrow on TWO dimensions at once (a plain sort makes
  * one dimension tight and the other span the full domain).
  */
object LayoutOps {

  /** The interleave schedule — (source lane, input bit, output position)
    * for all 32 bits: key A's bit i lands at even position 2i, key B's at
    * odd 2i+1. This ONE list generates both the Column tree and the
    * oracle's SQL below, so the interleave is definitionally identical on
    * both engines — an edit here (wider bits, swapped lanes) changes both
    * in lockstep.
    */
  private val lanes: Seq[(Int, Int, Int)] =
    (0 until 16).flatMap(i => Seq((0, i, 2 * i), (1, i, 2 * i + 1)))

  /** 32-bit Z-value: bit-interleave of the low 16 bits of two keys per
    * [[lanes]]. Built from plain shift/mask built-ins — codegen'd, no
    * UDF. Keys above 2^16 would truncate identically on both sides (the
    * testdata's keys are far below it).
    */
  def zValue(a: Column, b: Column): Column =
    lanes.foldLeft(lit(0L)) { case (acc, (src, bit, pos)) =>
      val in = if (src == 0) a else b
      acc.bitwiseOR(shiftleft(shiftright(in, bit).bitwiseAND(lit(1L)), pos))
    }

  private def zValueSql(a: String, b: String): String =
    lanes.map { case (src, bit, pos) =>
      val in = if (src == 0) a else b
      s"((($in >> $bit) & 1) << $pos)"
    }.mkString(" | ")

  /** Z-order layout quality report: lineitem keyed by
    * z(l_partkey, l_suppkey), cut into 16 equal z-runs (what 16 output
    * files would hold), then per-run min/max of BOTH dimensions — the
    * exact statistics a format like Parquet footer/Iceberg manifest would
    * expose to a scan planner, showing every run covers only a narrow
    * rectangle of the key plane. In the real writer the ntile becomes
    * `repartitionByRange(zCol)` + `sortWithinPartitions(zCol)` (no global
    * window); the query form exists so DuckDB can replicate the cuts
    * bit-for-bit (ntile over a deterministic total order).
    */
  def zorderStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
      .withColumn("z", zValue(col("l_partkey"), col("l_suppkey")))
    li.withColumn("file_id", ntile(16).over(
        Window.orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("part_min"),
        max(col("l_partkey")).as("part_max"),
        min(col("l_suppkey")).as("supp_min"),
        max(col("l_suppkey")).as("supp_max"))
      .orderBy("file_id")
  }

  val zorderStatsOracle: String =
    s"""WITH z AS (
       |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       |         ${zValueSql("l_partkey", "l_suppkey")} AS z
       |  FROM lineitem),
       |cut AS (
       |  SELECT l_partkey, l_suppkey,
       |         ntile(16) OVER (ORDER BY z, l_orderkey, l_linenumber)
       |           AS file_id
       |  FROM z)
       |SELECT file_id, count(*) AS n_rows,
       |       min(l_partkey) AS part_min, max(l_partkey) AS part_max,
       |       min(l_suppkey) AS supp_min, max(l_suppkey) AS supp_max
       |FROM cut GROUP BY file_id ORDER BY file_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "zorder_stats" -> (zorderStats _))

  val oracles: Map[String, String] = Map(
    "zorder_stats" -> zorderStatsOracle)
}

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
    * rectangle of the key plane.
    *
    * Scale shape: NO single-partition window. The definitional form is
    * `ntile(16) OVER (ORDER BY z, …)` — a global total order that would
    * funnel every row through one task at 100×. Instead this computes the
    * exact global rank with the [[AnalyticsOps.globalRank]] technique
    * (32 z cutpoints → bucket-partitioned local `row_number` → broadcast
    * bucket offsets; ties on z can't straddle a bucket boundary because
    * bucketing is by z value), then derives the ntile id ARITHMETICALLY
    * from (rank, n): the first `n % 16` tiles hold `n DIV 16 + 1` rows,
    * the rest `n DIV 16` — the shared Spark/DuckDB ntile definition, so
    * the oracle can stay the definitional window while the plan shards.
    *
    * Two deliberate differences from globalRank's documents-sized shape
    * (review r8 — applying it verbatim to the 100×-bigger lineitem ran
    * 12s warm at sf0.1 vs ~2s): cutpoints come from exact `percentile`
    * over a DETERMINISTIC 1-in-64 xxhash64 row sample (the full-table
    * percentile builds a value-count map over ~|table| distinct z — the
    * sample bounds the state, cut ERROR only skews bucket parallelism,
    * never rank correctness, and determinism keeps the two `bucketed`
    * consumers consistent without materialization), and NO localCheckpoint
    * (blockmanager-writing every corpus row cost 6× the recompute; the
    * two consumers re-derive the narrow bucketed map for ~0.3s each).
    * The heaviest op left is the bucket-keyed sort, exactly
    * `repartitionByRange + local sort` of the real Z-order writer.
    */
  def zorderStats(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
      .withColumn("z", zValue(col("l_partkey"), col("l_suppkey")))
    val nBuckets = 32
    val ps = (1 until nBuckets).map(_.toDouble / nBuckets)
    val cuts = li
      .filter(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
        lit(64)) === 0)
      .agg(percentile(col("z"), array(ps.map(lit): _*)).as("cuts"))
    val totals = li.agg(count(lit(1)).as("n_total"))
    // binary-search bucket assignment: percentile output is sorted, so the
    // largest idx with z > cuts[idx] (idx 0 = none) equals the linear
    // |{i : z > cuts_i}| count — 5 comparisons/row instead of 31, which
    // matters because this expression runs in BOTH bucketed consumers
    // (measured 6× on the per-pass projection at sf0.1)
    val bucket = Seq(16, 8, 4, 2, 1).foldLeft(lit(0)) { (idx, step) =>
      idx + when(col("z") > element_at(col("cuts"), idx + lit(step)), step)
        .otherwise(0)
    } + lit(1)
    val bucketed = li.crossJoin(broadcast(cuts)).crossJoin(broadcast(totals))
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"), col("z"), col("n_total"),
        bucket.as("bucket"))
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .withColumn("offset",
        coalesce(sum(col("n")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("offset"))
    val localW = Window.partitionBy(col("bucket"))
      .orderBy(col("z"), col("l_orderkey"), col("l_linenumber"))
    bucketed
      .withColumn("local_rank", row_number().over(localW))
      .join(broadcast(offsets), "bucket")
      .withColumn("rk", col("offset") + col("local_rank"))
      .withColumn("base", expr("n_total DIV 16"))
      .withColumn("rem", expr("n_total % 16"))
      .withColumn("file_id",
        when(col("rk") <= (col("base") + 1) * col("rem"),
          expr("(rk - 1) DIV (base + 1) + 1"))
          .otherwise(expr("rem + (rk - 1 - (base + 1) * rem) DIV base + 1"))
          .cast("int"))
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

  /** Small-file compaction planning — the table-maintenance pass every
    * lakehouse runs (each ingested document modeled as one file of
    * `n_chars` bytes; a doc-per-file landing zone is exactly the
    * small-file problem). Greedy bin packing in deterministic (doc_id)
    * order: a file lands in bucket `⌊cum_before / target⌋`, so output
    * groups are contiguous runs that fill to ≥ the target before
    * spilling to the next — one pass, no pair-wise fitting, and the
    * assignment is a pure function of the manifest (idempotent across
    * retries, same argument as [[CurationOps.corpusSample]]).
    *
    * Scale shape: the running sum is a SOURCE-partitioned window — the
    * planner works per partition directory like real compaction jobs, so
    * no global single-partition window exists; output is bucket-sized,
    * input manifest-sized (file listings, not data). Integer `DIV` keeps
    * bucket ids exact on both engines (no double rounding).
    */
  def compactionPlan(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val target = 2048L
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("long").as("bytes"))
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("bucket", expr(s"(cum - bytes) DIV $target"))
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("bytes")).as("total_bytes"),
        min(col("doc_id")).as("doc_first"),
        max(col("doc_id")).as("doc_last"))
      .withColumn("fill",
        round(col("total_bytes").cast("double") / target, 4))
      .orderBy("source", "bucket")
  }

  val compactionPlanOracle: String =
    """WITH files AS (
      |  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS bytes
      |  FROM documents),
      |planned AS (
      |  SELECT doc_id, source, bytes,
      |         CAST(sum(bytes) OVER (PARTITION BY source ORDER BY doc_id
      |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |  FROM files)
      |SELECT source, (cum - bytes) // 2048 AS bucket,
      |       count(*) AS n_files,
      |       CAST(sum(bytes) AS BIGINT) AS total_bytes,
      |       min(doc_id) AS doc_first,
      |       max(doc_id) AS doc_last,
      |       round(CAST(sum(bytes) AS DOUBLE) / 2048, 4) AS fill
      |FROM planned
      |GROUP BY source, (cum - bytes) // 2048
      |ORDER BY source, bucket""".stripMargin

  /** Zone-map (min/max statistics) scan-pruning report — the read-side
    * payoff of layout work and THE mechanism that turns a 100 TB table
    * into a 2 TB scan: files are the monthly ship-date partitions
    * (`yyyyMM`, the standard time-partitioned ingest layout — orderkey
    * runs would NOT prune, since TPC-H dates are uniform within any key
    * range), each file's footer stats are its min/max `l_shipdate`, and a
    * mid-month Q6-style date-range predicate classifies every file as
    * `skip` (range disjoint — never opened), `full` (contained — no
    * row-level filtering needed), or `partial` (boundary months). The
    * deliberately month-unaligned predicate makes all three classes
    * non-empty. `selectivity` is the true matching fraction per class,
    * making the report self-auditing: skip rows must show 0.0 and full
    * rows 1.0, or the pruning logic is wrong. Manifest-sized keyed
    * aggregates only — the per-file stats agg is exactly what a real
    * planner reads from Parquet footers / Iceberg manifests without
    * touching data.
    */
  def zonemapPrune(s: SparkSession, dir: String): DataFrame = {
    val lo = lit(java.sql.Date.valueOf("1995-03-15"))
    val hi = lit(java.sql.Date.valueOf("1995-05-15"))
    val zm = Tables(s, dir, "lineitem")
      .select((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast("int").as("file_id"),
        col("l_shipdate").cast("date").as("d"))
      .groupBy(col("file_id"))
      .agg(min(col("d")).as("d_min"), max(col("d")).as("d_max"),
        count(lit(1)).as("n_rows"),
        sum(when(col("d").between(lo, hi), 1).otherwise(0)).as("matched"))
    zm.select(
        when(col("d_max") < lo || col("d_min") > hi, "skip")
          .when(col("d_min") >= lo && col("d_max") <= hi, "full")
          .otherwise("partial").as("decision"),
        col("n_rows"), col("matched"))
      .groupBy(col("decision"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_rows")).as("n_rows"),
        round(sum(col("matched")).cast("double") / sum(col("n_rows")), 4)
          .as("selectivity"))
      .orderBy("decision")
  }

  val zonemapPruneOracle: String =
    """WITH f AS (
      |  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS INTEGER)
      |           AS file_id,
      |         CAST(l_shipdate AS DATE) AS d
      |  FROM lineitem),
      |zm AS (
      |  SELECT file_id, min(d) AS d_min, max(d) AS d_max, count(*) AS n_rows,
      |         sum(CASE WHEN d BETWEEN DATE '1995-03-15' AND DATE '1995-05-15'
      |             THEN 1 ELSE 0 END) AS matched
      |  FROM f GROUP BY 1)
      |SELECT CASE WHEN d_max < DATE '1995-03-15' OR d_min > DATE '1995-05-15'
      |              THEN 'skip'
      |            WHEN d_min >= DATE '1995-03-15' AND d_max <= DATE '1995-05-15'
      |              THEN 'full'
      |            ELSE 'partial' END AS decision,
      |       count(*) AS n_files, CAST(sum(n_rows) AS BIGINT) AS n_rows,
      |       round(CAST(sum(matched) AS DOUBLE) / sum(n_rows), 4) AS selectivity
      |FROM zm GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "compaction_plan" -> (compactionPlan _),
    "zonemap_prune" -> (zonemapPrune _),
    "zorder_stats" -> (zorderStats _))

  val oracles: Map[String, String] = Map(
    "compaction_plan" -> compactionPlanOracle,
    "zonemap_prune" -> zonemapPruneOracle,
    "zorder_stats" -> zorderStatsOracle)
}

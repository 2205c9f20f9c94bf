package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}
import graft.ops.Tables

/** DataFrame-facing builder for the native [[AsOfJoin]] operator, plus the
  * gate query proving it end-to-end: `asof_join_native` re-runs the
  * view→purchase attribution of `asof_join_attribution` through the custom
  * operator and is held to the SAME DuckDB oracle — the green pair is the
  * proof that the O(n+m) merge operator and the interval-join + window
  * composition are semantically identical.
  */
object AsOfJoinOps {

  /** Inner as-of join: latest `right` row per `left` row with equal key,
    * `rightTime ∈ (leftTime − tolerance, leftTime]`, ties on rightTime
    * broken by max `rightTieBreak`. Expressions are resolved against the
    * ANALYZED children, so the assembled [[AsOfJoin]] node enters planning
    * fully resolved.
    */
  def asOf(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      rightTieBreak: Column, toleranceMicros: Long,
      isOuter: Boolean = false, nearest: Boolean = false,
      forward: Boolean = false, allowExactMatches: Boolean = true): DataFrame = {
    val spark = left.sparkSession
    // the DataFrame-facing API owns its planning needs: without the
    // strategy the node is unplannable ("No plan for AsOfJoin"), so
    // self-register (idempotent) instead of depending on install order
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val plan = AsOfJoin(
      DatasetBridge.analyzedPlan(left), DatasetBridge.analyzedPlan(right),
      ColumnBridge.expression(leftKey), ColumnBridge.expression(rightKey),
      ColumnBridge.expression(leftTime), ColumnBridge.expression(rightTime),
      ColumnBridge.expression(rightTieBreak), toleranceMicros, isOuter,
      nearest, forward, allowExactMatches)
    DatasetBridge.ofRows(spark, plan)
  }

  /** The attribution query on the native operator. Times ride as
    * `unix_micros` of the second-truncated timestamps (the operator's
    * LongType contract); `gap_sec` divides exactly because both stamps are
    * whole seconds. Output and oracle are identical to
    * `asof_join_attribution`.
    */
  def asofJoinNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts_s"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_s").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts_s").as("v_ts"))
    val joined = asOf(purchases, views,
      leftKey = col("user_id"), rightKey = col("v_user"),
      leftTime = unix_micros(col("p_ts")), rightTime = unix_micros(col("v_ts")),
      rightTieBreak = col("view_id"),
      toleranceMicros = 7L * 24 * 3600 * 1000000L)
    joined
      .select(col("purchase_id"), col("user_id"),
        col("view_id").as("attributed_view_id"),
        ((unix_micros(col("p_ts")) - unix_micros(col("v_ts"))) / 1000000L)
          .cast("long").as("gap_sec"))
      .orderBy("purchase_id")
  }

  /** LEFT-OUTER variant: every purchase appears; the ~11% with no view in
    * the 7-day lookback carry NULL attribution — the report shape
    * marketing actually wants ("what fraction of purchases are organic").
    */
  def asofJoinOuter(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts_s"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_s").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts_s").as("v_ts"))
    asOf(purchases, views,
        col("user_id"), col("v_user"),
        unix_micros(col("p_ts")), unix_micros(col("v_ts")),
        col("view_id"), 7L * 24 * 3600 * 1000000L, isOuter = true)
      .select(col("purchase_id"), col("user_id"),
        col("view_id").as("attributed_view_id"),
        ((unix_micros(col("p_ts")) - unix_micros(col("v_ts"))) / 1000000L)
          .cast("long").as("gap_sec"))
      .orderBy("purchase_id")
  }

  /** NEAREST-direction variant (pandas `merge_asof direction='nearest'`,
    * VERDICT r8 #6): each purchase attributes to the view minimizing
    * |Δt| within a 2-day INCLUSIVE tolerance either side — the
    * "closest touchpoint" attribution shape. `gap_sec` is SIGNED
    * (negative = the attributed view came after the purchase). Equal
    * distance resolves backward, equal times resolve to max view_id —
    * the operator contract, independently stated by the oracle's
    * `row_number` ordering.
    */
  def asofJoinNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts_s"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_s").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts_s").as("v_ts"))
    asOf(purchases, views,
        col("user_id"), col("v_user"),
        unix_micros(col("p_ts")), unix_micros(col("v_ts")),
        col("view_id"), 2L * 24 * 3600 * 1000000L, nearest = true)
      .select(col("purchase_id"), col("user_id"),
        col("view_id").as("attributed_view_id"),
        ((unix_micros(col("p_ts")) - unix_micros(col("v_ts"))) / 1000000L)
          .cast("long").as("gap_sec"))
      .orderBy("purchase_id")
  }

  /** FORWARD-direction variant (pandas `merge_asof direction='forward'`,
    * VERDICT r9 #6): each purchase matches the EARLIEST view at-or-after
    * it within a 2-day inclusive tolerance — the post-purchase
    * re-engagement shape ("how quickly does a buyer come back to look").
    * `gap_sec` = view − purchase is ≥ 0 by construction. Equal times are
    * a valid match (allowExactMatches default) and resolve to max
    * view_id; the `allowExactMatches = false` boundary is spec-pinned in
    * `AsOfJoinSpec` rather than oracled (the corpus has few same-second
    * collisions, a spec makes the boundary explicit on adversarial data).
    */
  def asofJoinForward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts_s"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_s").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts_s").as("v_ts"))
    asOf(purchases, views,
        col("user_id"), col("v_user"),
        unix_micros(col("p_ts")), unix_micros(col("v_ts")),
        col("view_id"), 2L * 24 * 3600 * 1000000L, forward = true)
      .select(col("purchase_id"), col("user_id"),
        col("view_id").as("next_view_id"),
        ((unix_micros(col("v_ts")) - unix_micros(col("p_ts"))) / 1000000L)
          .cast("long").as("gap_sec"))
      .orderBy("purchase_id")
  }

  /** min-by-(t_r − t_l) DuckDB formulation of the forward pick: first
    * at-or-after view within tolerance, ties at the chosen time to max
    * view_id — independently states the operator's contract.
    */
  val asofJoinForwardOracle: String =
    """WITH ev AS (SELECT event_id, user_id, event_type,
      |                   date_trunc('second', ts) AS ts_s FROM events),
      |p AS (SELECT event_id AS purchase_id, user_id, ts_s AS p_ts
      |      FROM ev WHERE event_type = 'purchase'),
      |v AS (SELECT event_id AS view_id, user_id, ts_s AS v_ts
      |      FROM ev WHERE event_type = 'view'),
      |cand AS (
      |  SELECT p.purchase_id, p.user_id, v.view_id,
      |         CAST(floor(epoch(v.v_ts)) AS BIGINT)
      |           - CAST(floor(epoch(p.p_ts)) AS BIGINT) AS gap_sec,
      |         row_number() OVER (PARTITION BY p.purchase_id
      |           ORDER BY v.v_ts ASC, v.view_id DESC) AS rn
      |  FROM p JOIN v ON v.user_id = p.user_id
      |   AND v.v_ts >= p.p_ts
      |   AND epoch(v.v_ts) - epoch(p.p_ts) <= 2 * 24 * 3600)
      |SELECT purchase_id, user_id, view_id AS next_view_id, gap_sec
      |FROM cand WHERE rn = 1 ORDER BY purchase_id""".stripMargin

  /** min-by-|Δt| DuckDB formulation: same-|Δt| prefers the backward row,
    * same time prefers max view_id — exactly the operator's pick order.
    */
  val asofJoinNearestOracle: String =
    """WITH ev AS (SELECT event_id, user_id, event_type,
      |                   date_trunc('second', ts) AS ts_s FROM events),
      |p AS (SELECT event_id AS purchase_id, user_id, ts_s AS p_ts
      |      FROM ev WHERE event_type = 'purchase'),
      |v AS (SELECT event_id AS view_id, user_id, ts_s AS v_ts
      |      FROM ev WHERE event_type = 'view'),
      |cand AS (
      |  SELECT p.purchase_id, p.user_id, v.view_id,
      |         CAST(floor(epoch(p.p_ts)) AS BIGINT)
      |           - CAST(floor(epoch(v.v_ts)) AS BIGINT) AS gap_sec,
      |         row_number() OVER (PARTITION BY p.purchase_id
      |           ORDER BY abs(epoch(p.p_ts) - epoch(v.v_ts)),
      |                    CASE WHEN v.v_ts <= p.p_ts THEN 0 ELSE 1 END,
      |                    v.view_id DESC) AS rn
      |  FROM p JOIN v ON v.user_id = p.user_id
      |   AND abs(epoch(p.p_ts) - epoch(v.v_ts)) <= 2 * 24 * 3600)
      |SELECT purchase_id, user_id, view_id AS attributed_view_id, gap_sec
      |FROM cand WHERE rn = 1 ORDER BY purchase_id""".stripMargin

  val asofJoinOuterOracle: String =
    """WITH ev AS (SELECT event_id, user_id, event_type,
      |                   date_trunc('second', ts) AS ts_s FROM events),
      |best AS (
      |  SELECT purchase_id, attributed_view_id, gap_sec FROM (
      |    SELECT p.event_id AS purchase_id,
      |           v.event_id AS attributed_view_id,
      |           CAST(floor(epoch(p.ts_s)) AS BIGINT)
      |             - CAST(floor(epoch(v.ts_s)) AS BIGINT) AS gap_sec,
      |           row_number() OVER (PARTITION BY p.event_id
      |             ORDER BY v.ts_s DESC, v.event_id DESC) AS rn
      |    FROM ev p JOIN ev v
      |      ON p.event_type = 'purchase' AND v.event_type = 'view'
      |     AND p.user_id = v.user_id
      |     AND v.ts_s <= p.ts_s
      |     AND v.ts_s > p.ts_s - INTERVAL 7 DAY)
      |  WHERE rn = 1)
      |SELECT p.event_id AS purchase_id, p.user_id,
      |       b.attributed_view_id, b.gap_sec
      |FROM ev p LEFT JOIN best b ON b.purchase_id = p.event_id
      |WHERE p.event_type = 'purchase'
      |ORDER BY purchase_id""".stripMargin

  /** SCD2 point-in-time join — the canonical warehouse read of a
    * slowly-changing dimension (Kimball type 2: the fact row joins the
    * dimension version IN EFFECT at fact time), run through the native
    * as-of operator: a PIT join IS an as-of join on (key, valid_from ≤
    * fact_time, latest wins), which is why the operator earns a second,
    * structurally different gate query. The dimension here is the
    * customer table with per-key version boundaries that the DATA
    * decides (v2 — a 10% acctbal revision — becomes effective at each
    * customer's MEDIAN order date; v1 from epoch), so roughly half of
    * every customer's orders resolve to each version and the as-of
    * search genuinely varies per key — no constant-date degenerate CASE.
    *
    * Scale shape: the dimension build is one customer-keyed window
    * (median pick) + two narrow projections; the PIT join is the
    * operator's one O(n+m) merge pass per (key-clustered, time-sorted)
    * partition — EnsureRequirements owns the exchanges. Output is the
    * (version × segment) revenue rollup.
    */
  def scd2PitJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
    val wC = Window.partitionBy(col("o_custkey"))
    val med = ord
      .withColumn("rn", row_number().over(
        wC.orderBy(col("o_orderdate"), col("o_orderkey"))))
      .withColumn("cnt", count(lit(1)).over(wC))
      .filter(col("rn") ===
        floor((col("cnt") + lit(1)) / lit(2.0)).cast("int"))
      .select(col("o_custkey").as("key"), col("o_orderdate").as("eff_date"))
    val cust = Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    val v1 = cust.select(col("c_custkey").as("key"),
      lit(0L).as("valid_from"), lit(1).as("version"),
      col("c_mktsegment").as("segment"))
    val v2 = cust.join(med, col("c_custkey") === col("key"))
      .select(col("key"),
        unix_micros(to_timestamp(col("eff_date"))).as("valid_from"),
        lit(2).as("version"), col("c_mktsegment").as("segment"))
    val dim = v1.unionByName(v2)
    val fact = ord.select(col("o_orderkey"), col("o_custkey"),
      unix_micros(to_timestamp(col("o_orderdate"))).as("o_micros"),
      col("o_totalprice"))
    // backward as-of, exact matches allowed (valid_from ≤ order date,
    // latest version wins — inclusive-start PIT semantics); tolerance
    // far past the epoch so v1 always qualifies
    asOf(fact, dim,
      leftKey = col("o_custkey"), rightKey = col("key"),
      leftTime = col("o_micros"), rightTime = col("valid_from"),
      rightTieBreak = col("version"),
      toleranceMicros = 4000000000000000L)
      .groupBy(col("version"), col("segment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("version", "segment")
  }

  val scd2PitJoinOracle: String =
    """WITH med AS (
      |  SELECT o_custkey AS key, o_orderdate AS eff_date FROM (
      |    SELECT o_custkey, o_orderdate,
      |           row_number() OVER (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey) AS rn,
      |           count(*) OVER (PARTITION BY o_custkey) AS cnt
      |    FROM orders)
      |  WHERE rn = (cnt + 1) // 2),
      |dim AS (
      |  SELECT c_custkey AS key, 0 AS valid_from, 1 AS version,
      |         c_mktsegment AS segment
      |  FROM customer
      |  UNION ALL
      |  SELECT m.key, epoch_us(CAST(m.eff_date AS TIMESTAMP)) AS valid_from,
      |         2 AS version, c.c_mktsegment AS segment
      |  FROM customer c JOIN med m ON m.key = c.c_custkey),
      |pit AS (
      |  SELECT o.o_orderkey, o.o_totalprice, d.version, d.segment,
      |         row_number() OVER (PARTITION BY o.o_orderkey
      |           ORDER BY d.valid_from DESC, d.version DESC) AS rk
      |  FROM orders o JOIN dim d
      |    ON d.key = o.o_custkey
      |   AND d.valid_from <= epoch_us(CAST(o.o_orderdate AS TIMESTAMP)))
      |SELECT version, segment, count(*) AS n_orders,
      |       round(sum(o_totalprice), 2) AS revenue
      |FROM pit WHERE rk = 1
      |GROUP BY version, segment ORDER BY version, segment""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scd2_pit_join" -> (scd2PitJoin _),
    "asof_join_native" -> (asofJoinNative _),
    "asof_join_outer" -> (asofJoinOuter _),
    "asof_join_nearest" -> (asofJoinNearest _),
    "asof_join_forward" -> (asofJoinForward _))

  /** Deliberately the SAME oracle text as `asof_join_attribution` — one
    * definitional SQL checking both the composed and the native plan.
    */
  val oracles: Map[String, String] = Map(
    "scd2_pit_join" -> scd2PitJoinOracle,
    "asof_join_native" -> graft.ops.AnalyticsOps.asofJoinOracle,
    "asof_join_outer" -> asofJoinOuterOracle,
    "asof_join_nearest" -> asofJoinNearestOracle,
    "asof_join_forward" -> asofJoinForwardOracle)
}

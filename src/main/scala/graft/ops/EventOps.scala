package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` stream table (SURVEY.md §7.5):
  * tumbling windows, gap-based sessionization, JSON prop extraction, top-k —
  * the §2.11-empty categories (grouped agg, window functions, sorts/top-k)
  * exercised through Spark built-ins. Batch forms here; the streaming
  * equivalents live in graft.streaming.
  *
  * Scale: every query shuffles once on its natural key (hour bucket,
  * user_id); sessionization's window functions partition by user — skew-safe
  * for web-scale user distributions under AQE.
  */
object EventOps {

  /** Tumbling 1-hour windows × event_type: count + value aggregates.
    * Timestamps are emitted as formatted strings — events.ts is
    * nanosecond-precision parquet and raw timestamp hashing would compare
    * ns-vs-µs across engines (Tables scaladoc).
    */
  def eventsTumbling(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        round(avg(col("value")), 4).as("avg_value"))
      .orderBy("hour", "event_type")

  val eventsTumblingOracle: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |       event_type, count(*) AS n_events,
      |       round(sum(value), 4) AS sum_value,
      |       round(avg(value), 4) AS avg_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Gap-based sessionization (30-min inactivity): lag → new-session flag →
    * running sum as session id → per-session aggregates. Two window passes
    * over the same (user_id, ts) partitioning — one shuffle, reused.
    */
  def eventsSessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val flagged = Tables(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_sec"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"))
      .orderBy("user_id", "session_seq")
  }

  val eventsSessionizeOracle: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessioned AS (
      |  SELECT user_id, ts,
      |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM flagged)
      |SELECT user_id, session_seq, count(*) AS n_events,
      |       CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_sec,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
      |FROM sessioned GROUP BY user_id, session_seq
      |ORDER BY user_id, session_seq""".stripMargin

  /** JSON prop extraction (`props` is a JSON string, FIXTURES.md):
    * `from_json` with an explicit partial schema → typed aggregation per
    * event_type. One Jackson parse per row into a struct (vs
    * `get_json_object`, which re-walks the JSON text through the
    * interpreted path per extracted field — 38s → single digits at sf0.1).
    */
  def eventsJson(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high_k"))
      .orderBy("event_type")

  val eventsJsonOracle: String =
    """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
      |       CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_k
      |FROM (SELECT event_type,
      |             CAST(props ->> '$.k' AS BIGINT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Gap-based sessionization through Spark's NATIVE `session_window`
    * operator (SessionWindowing + MergingSessionsExec — the engine merges
    * overlapping [ts, ts+gap) intervals itself) rather than the
    * lag/flag/cumsum window composition of [[eventsSessionize]]. Same
    * 30-minute gap; the two differ only at an exact-gap boundary
    * (session_window starts a NEW session at diff == gap; the lag form
    * keeps it — microsecond-exact data makes that measure-zero, and the
    * oracle encodes session_window's `>=` rule precisely at µs
    * resolution). One user-keyed shuffle, state merges map-side.
    */
  /** Session-gap tuning table — the `dedup_threshold_sweep` genre
    * applied to sessionization: the 30-minute gap every analytics stack
    * hardcodes is a tunable, and this is the table it's tuned FROM. For
    * each candidate gap (5 min / 15 min / 30 min / 60 min): session
    * count, mean events and mean duration per session, and the share of
    * single-event sessions (the "gap too small" symptom; "gap too
    * large" shows as mean duration exploding).
    *
    * The trick that keeps it ONE pass: candidate gaps are nested, so
    * every per-gap number derives from the per-event gap column alone —
    * a session boundary at gap g is `prev_gap IS NULL OR prev_gap > g`
    * (count = session count), intra-session gap mass Σ(gap ≤ g) is the
    * total session duration, and a single-event session is a boundary
    * whose FOLLOWING gap also breaks (lead column). No per-threshold
    * re-sessionization, no per-threshold window.
    *
    * Scale shape: ONE user-keyed window (lag + lead ride the same sort),
    * then a 4× candidate fan-out into a map-side-combined keyed
    * aggregate (the `wau_rolling` bounded-fan-out convention). Means
    * round before emission.
    */
  def sessionGapSweep(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val gapped = Tables(s, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("gap",
        unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")))
      .withColumn("next_gap", lead(col("gap"), 1).over(byUser))
      .select(col("gap"), col("next_gap"))
    val isBreak = (g: org.apache.spark.sql.Column) =>
      col("gap").isNull || (col("gap") > g)
    val nextBreaks = (g: org.apache.spark.sql.Column) =>
      col("next_gap").isNull || (col("next_gap") > g)
    gapped
      .crossJoin(broadcast(s.range(0, 1)
        .select(explode(array(lit(300), lit(900), lit(1800), lit(3600)))
          .as("gap_sec"))))
      .groupBy(col("gap_sec"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(isBreak(col("gap_sec")), 1L).otherwise(0L)).as("n_sessions"),
        sum(when(!isBreak(col("gap_sec")), col("gap")).otherwise(lit(0L)))
          .as("total_duration_sec"),
        sum(when(isBreak(col("gap_sec")) && nextBreaks(col("gap_sec")), 1L)
          .otherwise(0L)).as("n_single"))
      .select(col("gap_sec"), col("n_events"), col("n_sessions"),
        round(col("n_events").cast("double") / col("n_sessions"), 4)
          .as("mean_events"),
        round(col("total_duration_sec").cast("double") / col("n_sessions"), 4)
          .as("mean_duration_sec"),
        round(col("n_single").cast("double") / col("n_sessions"), 6)
          .as("single_event_share"))
      .orderBy("gap_sec")
  }

  val sessionGapSweepOracle: String =
    """WITH g1 AS (
      |  SELECT user_id, ts, event_id,
      |         floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) AS gap
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |gapped AS (
      |  SELECT gap, lead(gap, 1) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) AS next_gap
      |  FROM g1),
      |cands AS (SELECT unnest([300, 900, 1800, 3600]) AS gap_sec),
      |agg AS (
      |  SELECT c.gap_sec,
      |         count(*) AS n_events,
      |         CAST(sum(CASE WHEN gap IS NULL OR gap > c.gap_sec
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
      |         CAST(sum(CASE WHEN NOT (gap IS NULL OR gap > c.gap_sec)
      |                       THEN gap ELSE 0 END) AS BIGINT)
      |           AS total_duration_sec,
      |         CAST(sum(CASE WHEN (gap IS NULL OR gap > c.gap_sec)
      |                        AND (next_gap IS NULL OR next_gap > c.gap_sec)
      |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_single
      |  FROM gapped, cands c GROUP BY c.gap_sec)
      |SELECT gap_sec, n_events, n_sessions,
      |       round(CAST(n_events AS DOUBLE) / n_sessions, 4) AS mean_events,
      |       round(CAST(total_duration_sec AS DOUBLE) / n_sessions, 4)
      |         AS mean_duration_sec,
      |       round(CAST(n_single AS DOUBLE) / n_sessions, 6)
      |         AS single_event_share
      |FROM agg ORDER BY gap_sec""".stripMargin

  /** Watermark-delay capacity planning — the Structured-Streaming sizing
    * table ([[sessionGapSweep]]'s genre for the OTHER streaming knob):
    * how many events would a `withWatermark(delay)` drop at candidate
    * delays 1/5/15 min? The corpus carries no processing-time column, so
    * arrival is simulated with an md5-deterministic per-event delay
    * (0–30 min, the repo's derandomization convention) — an event is
    * dropped iff its event time is older than (max event time among
    * earlier ARRIVALS) − delay, Spark's watermark rule verbatim.
    *
    * Scale shape: the definitional form is a GLOBAL running max over
    * arrival order — one task at 100 TB. Sharded instead (the
    * [[AnalyticsOps.globalRank]] technique on the time axis): an
    * arrival-DAY-keyed running max carries the corpus-sized work, and
    * the cross-day carry is a prefix max over the ≤|days| per-day
    * aggregate (bounded unpartitioned window, whitelisted); the
    * per-event watermark basis is greatest(intra-day, prior-day carry).
    * Delays fan out 3× into one keyed aggregate. The oracle states the
    * single definitional window — same values, different plan, which is
    * the point (the global_rank convention).
    */
  def watermarkDropAudit(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "events")
      .select(col("event_id"),
        unix_timestamp(col("ts")).as("es"))
      .withColumn("arr", col("es") +
        conv(substring(md5(concat(lit("arr_"),
          col("event_id").cast("string")).cast("binary")), 1, 15), 16, 10)
          .cast("long") % 1800)
      .withColumn("day", floor(col("arr") / 86400L).cast("long"))
    val wIntra = Window.partitionBy(col("day"))
      .orderBy(col("arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val intra = e.withColumn("intra_max", max(col("es")).over(wIntra))
    val dayMax = e.groupBy(col("day")).agg(max(col("es")).as("dmax"))
      .withColumn("prior_max", max(col("dmax")).over(
        // ≤ |days in the corpus| rows (30 here), on an aggregate —
        // the global_rank bounded-carry shape
        Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("day"), col("prior_max"))
    val based = intra.join(broadcast(dayMax), "day")
      .withColumn("wmb", greatest(col("intra_max"), col("prior_max")))
    val delays = s.range(0, 1)
      .select(explode(array(lit(60), lit(300), lit(900))).as("delay_sec"))
    based.crossJoin(broadcast(delays))
      .groupBy(col("delay_sec"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("wmb").isNotNull &&
          col("es") < col("wmb") - col("delay_sec"), 1L).otherwise(0L))
          .as("n_dropped"),
        round(avg(when(col("wmb") > col("es"),
          (col("wmb") - col("es")).cast("double"))), 4)
          .as("mean_lateness_sec"))
      .select(col("delay_sec"), col("n_events"), col("n_dropped"),
        round(col("n_dropped").cast("double") / col("n_events"), 6)
          .as("drop_share"),
        col("mean_lateness_sec"))
      .orderBy("delay_sec")
  }

  val watermarkDropAuditOracle: String =
    """WITH e AS (
      |  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
      |         CAST(floor(epoch(ts)) AS BIGINT)
      |           + ('0x' || substr(md5('arr_' || CAST(event_id AS VARCHAR)),
      |               1, 15))::BIGINT % 1800 AS arr
      |  FROM events),
      |w AS (
      |  SELECT event_id, es,
      |         max(es) OVER (ORDER BY arr, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wmb
      |  FROM e),
      |d AS (SELECT unnest([60, 300, 900]) AS delay_sec)
      |SELECT d.delay_sec, count(*) AS n_events,
      |       CAST(sum(CASE WHEN w.wmb IS NOT NULL
      |                      AND w.es < w.wmb - d.delay_sec
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
      |       round(CAST(sum(CASE WHEN w.wmb IS NOT NULL
      |                            AND w.es < w.wmb - d.delay_sec
      |                           THEN 1 ELSE 0 END) AS DOUBLE)
      |         / count(*), 6) AS drop_share,
      |       round(avg(CASE WHEN w.wmb > w.es
      |                      THEN CAST(w.wmb - w.es AS DOUBLE) END), 4)
      |         AS mean_lateness_sec
      |FROM w, d GROUP BY d.delay_sec ORDER BY d.delay_sec""".stripMargin

  def eventsSessionWindow(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"),
        date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start")

  /** µs-exact: DuckDB truncates the parquet ns timestamps to µs exactly
    * like Tables' `ts div 1000`, so `us - lag(us) >= 1800e6` reproduces
    * session_window's boundary rule bit-for-bit.
    */
  val eventsSessionWindowOracle: String =
    """WITH e AS (
      |  SELECT user_id, value, event_id, CAST(ts AS TIMESTAMP) AS ts,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, value, ts, us, event_id,
      |         CASE WHEN lag(us) OVER w IS NULL
      |                OR us - lag(us) OVER w >= 1800000000 THEN 1
      |              ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
      |ses AS (
      |  SELECT user_id, value, ts,
      |         sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |       count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM ses GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** The same per-type props aggregation as [[eventsJson]] through Spark
    * 4's VariantType path — `parse_json` → `variant_get` instead of
    * `from_json` → struct field. Variant keeps the document open-schema
    * (no DDL up front) while still binary-encoded and predicate-friendly;
    * this query exists to keep THAT expression tree (VariantGet over
    * VariantType) on the tested surface. Same oracle semantics as the
    * struct path.
    */
  def eventsVariant(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high_k"))
      .orderBy("event_type")

  val eventsVariantOracle: String =
    """SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
      |       CAST(sum(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_k
      |FROM (SELECT event_type,
      |             CAST(props ->> '$.k' AS BIGINT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Exact interpolated percentiles per event type — the `percentile`
    * (PERCENTILE_CONT) aggregate itself, complementing the rank-based
    * `events_value_quartiles` (ntile buckets) and `events_value_stats`
    * (median): Spark's linear interpolation at rank p·(n−1) matches
    * DuckDB's `quantile_cont` definition, so the values oracle-match at
    * 4 decimals. One keyed aggregation; at real scale swap in
    * `approx_percentile` (KLL) — `cardinality_sketches` pins that
    * sketch's error against this exact form.
    */
  def valuePercentiles(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(
        round(percentile(col("value"), lit(0.25)), 4).as("p25"),
        round(percentile(col("value"), lit(0.5)), 4).as("p50"),
        round(percentile(col("value"), lit(0.75)), 4).as("p75"),
        round(percentile(col("value"), lit(0.95)), 4).as("p95"))
      .orderBy("event_type")

  val valuePercentilesOracle: String =
    """SELECT event_type,
      |       round(quantile_cont(value, 0.25), 4) AS p25,
      |       round(quantile_cont(value, 0.5), 4) AS p50,
      |       round(quantile_cont(value, 0.75), 4) AS p75,
      |       round(quantile_cont(value, 0.95), 4) AS p95
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Top-k users by total event value (sort + limit with deterministic
    * tie-break). `orderBy + limit` compiles to TakeOrderedAndProject —
    * partial top-10 on EVERY partition, then a 10-row merge — so no global
    * sort and no single-partition window over the full user set (at 100×
    * users an unpartitioned `Window.orderBy` funnels everything through one
    * task). Rank is derived afterwards over the 10 surviving rows. The
    * `lit(0)` partition key is folded away by Spark 4's
    * `EliminateWindowPartitions`, so WindowExec still logs its no-partition
    * warning — harmless here (the window input IS the 10-row limit result;
    * Bench sets that logger to ERROR to keep driver-scraped stdout clean).
    */
  def eventsTopkUsers(s: SparkSession, dir: String): DataFrame = {
    val totals = Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(round(sum(col("value")), 4).as("total_value"),
        count(lit(1)).as("n_events"))
    val top10 = totals
      .orderBy(col("total_value").desc, col("user_id"))
      .limit(10)
    top10
      .withColumn("rank", row_number().over(
        // input is 10 rows — a no-partition window is deliberate here
        Window.orderBy(col("total_value").desc, col("user_id"))))
      .select(col("rank"), col("user_id"), col("total_value"), col("n_events"))
      .orderBy("rank")
  }

  val eventsTopkUsersOracle: String =
    """SELECT rank, user_id, total_value, n_events FROM (
      |  SELECT user_id, total_value, n_events,
      |         row_number() OVER (ORDER BY total_value DESC, user_id) AS rank
      |  FROM (SELECT user_id, round(sum(value), 4) AS total_value,
      |               count(*) AS n_events FROM events GROUP BY user_id))
      |WHERE rank <= 10 ORDER BY rank""".stripMargin

  /** Per-user 3σ outlier detection over event values — the telemetry
    * anomaly sweep (fraud/abuse/sensor-fault triage): each user's value
    * distribution is summarized (mean, population stddev) in ONE window
    * pass partitioned by user_id, and events further than 3σ from their
    * user's mean are emitted with their z-score. One shuffle on user_id;
    * constant-σ users are excluded (z undefined). The membership cut is on
    * the ROUNDED z (the emitted column), not raw doubles: mu/σ summation
    * order differs between engines at ~1e-12, and a raw-double cut would
    * let a boundary event be emitted by one engine and not the other — a
    * row-SET mismatch nothing damps. Cutting on the value both engines
    * round keeps membership and output consistent.
    */
  def eventsAnomaly(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Tables(s, dir, "events")
      .withColumn("mu", avg(col("value")).over(w))
      .withColumn("sigma", stddev_pop(col("value")).over(w))
      .filter(col("sigma") > 0)
      .withColumn("z",
        round((col("value") - col("mu")) / col("sigma"), 3))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value"), 4).as("value"), col("z"))
      .orderBy("event_id")
  }

  val eventsAnomalyOracle: String =
    """SELECT event_id, user_id, event_type, round(value, 4) AS value, z
      |FROM (SELECT *, round((value - mu) / sigma, 3) AS z
      |      FROM (SELECT *, avg(value) OVER (PARTITION BY user_id) AS mu,
      |                   stddev_pop(value) OVER (PARTITION BY user_id) AS sigma
      |            FROM events)
      |      WHERE sigma > 0)
      |WHERE abs(z) > 3.0
      |ORDER BY event_id""".stripMargin

  /** Range (interval) join, binned — each event type's "campaign window"
    * is the 2 hours from its first event; the query counts ALL events (and
    * distinct users) landing inside each window. A naive `ts BETWEEN start
    * AND end` theta join plans as BroadcastNestedLoopJoin — every event
    * row evaluated against every window, the join shape that dies first at
    * scale. The standard fix, implemented here: quantize time into 1-hour
    * bins, explode each window to the bins it overlaps (≤ 3 rows per
    * window), equi-join on the bin, and re-check the exact range on the
    * matches — a hash join Catalyst/AQE handle like any other, with
    * per-bin fanout bounded by window length. An event's single bin lies
    * in the window's bin set iff they can overlap, so no pair is matched
    * twice and none is missed (RangeJoinSpec pins set-equality against
    * the naive theta join).
    *
    * Engine parity: boundaries and event times are compared at whole-second
    * truncation — events.parquet carries nanosecond timestamps, Spark
    * truncates to micros on read (Tables), and a sub-microsecond window
    * edge would otherwise admit a row in one engine and not the other.
    */
  def eventsRangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("event_type"), col("user_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
    val camp = ev.groupBy(col("event_type").as("campaign"))
      .agg(min(col("sec")).as("ws"))
      .withColumn("we", col("ws") + 2L * 3600L)
    val campBins = camp.select(col("campaign"), col("ws"), col("we"),
      explode(sequence(floor(col("ws") / 3600),
        floor((col("we") - 1) / 3600))).as("bin"))
    ev.withColumn("bin", floor(col("sec") / 3600))
      .join(broadcast(campBins), Seq("bin"))
      .filter(col("sec") >= col("ws") && col("sec") < col("we"))
      .groupBy(col("campaign"), col("ws"), col("we"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("campaign"),
        date_format(to_timestamp(col("ws")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(to_timestamp(col("we")), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("n_events"), col("n_users"))
      .orderBy("campaign")
  }

  val eventsRangeJoinOracle: String =
    """WITH ev AS (
      |  SELECT event_type, user_id, date_trunc('second', ts) AS tss
      |  FROM events),
      |camp AS (
      |  SELECT event_type AS campaign, min(tss) AS ws,
      |         min(tss) + INTERVAL 2 HOUR AS we
      |  FROM ev GROUP BY 1)
      |SELECT campaign,
      |       strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
      |       strftime(we, '%Y-%m-%d %H:%M:%S') AS window_end,
      |       count(*) AS n_events, count(DISTINCT user_id) AS n_users
      |FROM camp JOIN ev ON ev.tss >= ws AND ev.tss < we
      |GROUP BY campaign, ws, we ORDER BY campaign""".stripMargin

  /** Ordered conversion funnel (view → click → purchase): each stage keeps
    * users whose first qualifying event occurs AT/AFTER their previous
    * stage's first event — the product-analytics query every event store
    * runs. Every stage is a user-keyed aggregate followed by a user-keyed
    * join, so the whole funnel co-partitions on user_id (one shuffle,
    * reused); stage cardinalities only shrink. Timestamps compare at
    * second granularity (ns-vs-µs parity, Tables scaladoc).
    */
  def eventsFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts_s"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("view_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, "user_id").filter(col("ts_s") >= col("view_ts"))
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(clicks, "user_id").filter(col("ts_s") >= col("click_ts"))
      .groupBy(col("user_id")).agg(min(col("ts_s")).as("purchase_ts"))
    val mk = (stage: String, df: DataFrame) =>
      df.agg(count(lit(1)).as("n_users")).select(lit(stage).as("stage"), col("n_users"))
    mk("1_view", views)
      .unionAll(mk("2_click", clicks))
      .unionAll(mk("3_purchase", purchases))
      .orderBy("stage")
  }

  val eventsFunnelOracle: String =
    """WITH ev AS (SELECT user_id, event_type,
      |                   date_trunc('second', ts) AS ts_s FROM events),
      |v AS (SELECT user_id, min(ts_s) AS view_ts FROM ev
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(ts_s) AS click_ts
      |      FROM ev e JOIN v USING (user_id)
      |      WHERE event_type = 'click' AND ts_s >= view_ts GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(ts_s) AS purchase_ts
      |      FROM ev e JOIN c USING (user_id)
      |      WHERE event_type = 'purchase' AND ts_s >= click_ts GROUP BY e.user_id)
      |SELECT stage, n_users FROM (
      |  SELECT '1_view' AS stage, count(*) AS n_users FROM v
      |  UNION ALL SELECT '2_click', count(*) FROM c
      |  UNION ALL SELECT '3_purchase', count(*) FROM p)
      |ORDER BY stage""".stripMargin

  /** Event-type transition matrix (`lead` over each user's timeline): the
    * Markov-chain view of user behavior. One shuffle on user_id for the
    * lead window, then a keyed aggregation on the (from, to) pair — 25
    * result rows regardless of corpus size; the per-from row percentage is
    * a window over that tiny aggregate.
    */
  def eventsTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables(s, dir, "events")
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    pairs
      .withColumn("pct", round(lit(100.0) * col("n") /
        sum(col("n")).over(Window.partitionBy(col("from_type"))), 4))
      .orderBy("from_type", "to_type")
  }

  val eventsTransitionsOracle: String =
    """WITH pairs AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |agg AS (
      |  SELECT from_type, to_type, count(*) AS n FROM pairs
      |  WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
      |SELECT from_type, to_type, n,
      |       round(100.0 * n / sum(n) OVER (PARTITION BY from_type), 4) AS pct
      |FROM agg ORDER BY from_type, to_type""".stripMargin

  /** NTILE quartile banding of event values WITHIN each event type — the
    * "which quartile is this reading in" enrichment. The window partitions
    * by event_type (never a global sort); ordering ties are broken by
    * event_id so ntile assignment is engine-deterministic; the summary is
    * a 20-row keyed aggregate.
    */
  def eventsValueQuartiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    Tables(s, dir, "events")
      .withColumn("quartile", ntile(4).over(w))
      .groupBy(col("event_type"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 4).as("min_v"),
        round(max(col("value")), 4).as("max_v"),
        round(avg(col("value")), 4).as("avg_v"))
      .orderBy("event_type", "quartile")
  }

  val eventsValueQuartilesOracle: String =
    """SELECT event_type, quartile, count(*) AS n,
      |       round(min(value), 4) AS min_v,
      |       round(max(value), 4) AS max_v,
      |       round(avg(value), 4) AS avg_v
      |FROM (SELECT event_type, value,
      |             CAST(ntile(4) OVER (PARTITION BY event_type
      |               ORDER BY value, event_id) AS INT) AS quartile
      |      FROM events)
      |GROUP BY event_type, quartile ORDER BY event_type, quartile""".stripMargin

  /** Forward-fill imputation (`last ... IGNORE NULLS` frame window): a
    * deterministic mask nulls out every 7th event's value, and each gap is
    * filled with the user's most recent observed value — the telemetry
    * repair every downstream aggregate needs. One user-keyed window
    * shuffle; the fill never crosses user partitions.
    */
  def eventsGapFill(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "events")
      .withColumn("masked",
        when(col("event_id") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("value")))
      .withColumn("filled", last(col("masked"), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"),
        round(col("masked"), 4).as("masked"),
        round(col("filled"), 4).as("filled"))
      .orderBy("event_id")
  }

  val eventsGapFillOracle: String =
    """SELECT event_id, user_id, round(masked, 4) AS masked,
      |       round(last_value(masked IGNORE NULLS) OVER (
      |         PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS filled
      |FROM (SELECT event_id, user_id, ts,
      |             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS masked
      |      FROM events)
      |ORDER BY event_id""".stripMargin

  /** Sliding (hopping) windows — 2-hour windows every hour, so each event
    * lands in exactly two: Spark's `window()` plans one Expand (2 rows per
    * event) + a keyed aggregation, the same shape the streaming engine
    * uses. The oracle reproduces the expansion with a 2-bucket
    * generate_series. Sparse hours differ from [[eventsTumbling]]: a
    * window appears iff ANY event falls in it.
    */
  def eventsSliding(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("win_start", "event_type")

  val eventsSlidingOracle: String =
    """SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
      |       event_type, count(*) AS n_events,
      |       round(sum(value), 4) AS sum_value
      |FROM (
      |  SELECT event_type, value,
      |         date_trunc('hour', ts) - to_hours(off) AS win_start
      |  FROM events, LATERAL unnest(generate_series(0, 1)) u(off))
      |GROUP BY win_start, event_type
      |ORDER BY win_start, event_type""".stripMargin

  /** Robust outlier detection via Median Absolute Deviation — the
    * median-based alternative to [[eventsAnomaly]]'s z-score (robust to
    * the very outliers it hunts). Per type: median(value), then
    * MAD = median(|value − median|), then the count beyond 3·MAD.
    * Exact `percentile` keyed aggregates (typed-median per group), a
    * broadcast-sized per-type join back (5 rows), and one counting pass —
    * the events table is scanned twice (the second median depends on the
    * first), never collected: `dev` is localCheckpointed because BOTH the
    * MAD build and the final count read it — without the cut Catalyst
    * plans the scan+broadcast-join subtree twice and the corpus is read
    * three times (the [[graft.ops.GraphOps]] lineage discipline). The
    * 3·MAD comparison runs on UNROUNDED doubles: both engines derive
    * med/adev through identical IEEE ops, so the boundary is
    * deterministic.
    */
  def eventsMad(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events").select(col("event_type"), col("value"))
    val med = ev.groupBy(col("event_type"))
      .agg(percentile(col("value"), lit(0.5)).as("med"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
      .localCheckpoint()
    val mad = dev.groupBy(col("event_type"))
      .agg(first(col("med")).as("med"),
        percentile(col("adev"), lit(0.5)).as("mad"))
    dev.drop("med").join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(first(col("med")), 4).as("med"),
        round(first(col("mad")), 4).as("mad"),
        count(when(col("adev") > lit(3) * col("mad"), 1)).as("n_outliers"))
      .orderBy("event_type")
  }

  val eventsMadOracle: String =
    """WITH med AS (
      |  SELECT event_type, median(value) AS med FROM events GROUP BY 1),
      |dev AS (
      |  SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
      |  FROM events e JOIN med m USING (event_type)),
      |mad AS (
      |  SELECT event_type, any_value(med) AS med, median(adev) AS mad
      |  FROM dev GROUP BY event_type)
      |SELECT d.event_type, count(*) AS n,
      |       round(any_value(m.med), 4) AS med,
      |       round(any_value(m.mad), 4) AS mad,
      |       count(*) FILTER (d.adev > 3 * m.mad) AS n_outliers
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY d.event_type ORDER BY event_type""".stripMargin

  /** Interval coalescing (gaps-and-islands over VARIABLE-length intervals):
    * each event opens an interval [ts, ts + (round(value)+60) sec]; per user,
    * overlapping/touching intervals merge into islands. Unlike gap
    * sessionization (fixed inactivity threshold), a long interval can
    * swallow many later short ones, so island membership needs the running
    * MAX of all previous interval ENDS — `max(end) over (rows unbounded
    * preceding to 1 preceding)` — not just the previous row's end. Both
    * window passes and the island aggregate reuse the ONE user_id shuffle;
    * per-user state is a single running max, skew-safe under AQE.
    */
  def eventsIslands(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("start_s"), col("event_id"))
    val iv = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("start_s"),
        (unix_timestamp(col("ts")) +
          round(col("value"), 0).cast("long") + 60L).as("end_s"))
    iv
      .withColumn("prev_max_end",
        max(col("end_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_end").isNull ||
          col("start_s") > col("prev_max_end"), 1L).otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(
        count(lit(1)).as("n_intervals"),
        min(col("start_s")).as("island_start_s"),
        max(col("end_s")).as("island_end_s"),
        (max(col("end_s")) - min(col("start_s"))).as("span_sec"))
      .orderBy("user_id", "island")
  }

  val eventsIslandsOracle: String =
    """WITH iv AS (
      |  SELECT user_id, event_id,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS start_s,
      |         CAST(floor(epoch(ts)) AS BIGINT)
      |           + CAST(round(value, 0) AS BIGINT) + 60 AS end_s
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, start_s, end_s,
      |         CASE WHEN max(end_s) OVER (PARTITION BY user_id
      |                ORDER BY start_s, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |                IS NULL
      |              OR start_s > max(end_s) OVER (PARTITION BY user_id
      |                ORDER BY start_s, event_id
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |              THEN 1 ELSE 0 END AS new_island,
      |         event_id
      |  FROM iv),
      |islanded AS (
      |  SELECT user_id, start_s, end_s,
      |         CAST(sum(new_island) OVER (PARTITION BY user_id
      |           ORDER BY start_s, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS BIGINT) AS island
      |  FROM flagged)
      |SELECT user_id, island, count(*) AS n_intervals,
      |       min(start_s) AS island_start_s,
      |       max(end_s) AS island_end_s,
      |       max(end_s) - min(start_s) AS span_sec
      |FROM islanded GROUP BY user_id, island
      |ORDER BY user_id, island""".stripMargin

  /** CDC change-log compaction: the events stream read as a change log
    * (signup → INSERT, error → DELETE tombstone, anything else → UPDATE),
    * compacted to the net final state per key — the batch form of what a
    * streaming materialized view maintains. Last-writer-wins is ONE
    * `max_by(payload, (ts, event_id))` keyed aggregate — no per-key window
    * sort, no row_number: partial aggregation keeps a single candidate row
    * per key per partition, so the shuffle carries one row per (partition,
    * key) instead of the full history. Tombstone filtering (last op = D)
    * happens AFTER compaction, and the per-op audit counts ride the same
    * aggregate for free.
    */
  def cdcCompaction(s: SparkSession, dir: String): DataFrame = {
    val op = when(col("event_type") === "signup", "I")
      .when(col("event_type") === "error", "D")
      .otherwise("U")
    Tables(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value"), op.as("op"))
      .groupBy(col("user_id"))
      .agg(
        max_by(col("op"), struct(col("ts"), col("event_id"))).as("last_op"),
        round(max_by(col("value"), struct(col("ts"), col("event_id"))), 4)
          .as("last_value"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
        count(when(col("op") === "I", 1)).as("n_inserts"),
        count(when(col("op") === "U", 1)).as("n_updates"),
        count(when(col("op") === "D", 1)).as("n_deletes"))
      .filter(col("last_op") =!= "D")
      .orderBy("user_id")
  }

  val cdcCompactionOracle: String =
    """WITH log AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN event_type = 'signup' THEN 'I'
      |              WHEN event_type = 'error' THEN 'D'
      |              ELSE 'U' END AS op
      |  FROM events),
      |last AS (
      |  SELECT user_id, op AS last_op, round(value, 4) AS last_value
      |  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts DESC, event_id DESC) AS rn FROM log)
      |  WHERE rn = 1),
      |audit AS (
      |  SELECT user_id,
      |         strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts,
      |         count(*) FILTER (op = 'I') AS n_inserts,
      |         count(*) FILTER (op = 'U') AS n_updates,
      |         count(*) FILTER (op = 'D') AS n_deletes
      |  FROM log GROUP BY user_id)
      |SELECT user_id, last_op, last_value, last_ts,
      |       n_inserts, n_updates, n_deletes
      |FROM last JOIN audit USING (user_id)
      |WHERE last_op <> 'D'
      |ORDER BY user_id""".stripMargin

  /** Exponentially-weighted trailing average per user over the hourly
    * value series — the time-series smoother behind rate limiting, trend
    * lines, and alert baselines (the static complement of the streaming
    * anomaly state fold). Observation-indexed: weights decay per PRIOR
    * BUCKET (lag over existing hourly rows), renormalized over the
    * buckets actually present, so series heads and gaps stay unbiased.
    *
    * Implemented with SIX EXPLICIT LAG COLUMNS, not a recursive state or
    * a collect+HOF fold: lag() is codegen'd, the fixed j=0..5 summation
    * order is reproduced verbatim in the oracle SQL (identical IEEE
    * operation order ⇒ bit-identical doubles before the final round),
    * and the EWMA consumes the ROUNDED bucket means — the
    * [[eventsAnomaly]] discipline, so engine-side 1e-12 aggregation
    * drift can't move the output. One user-keyed window over
    * hourly-bucket-sized data (already reduced by the aggregate).
    */
  def eventsEwma(s: SparkSession, dir: String): DataFrame = {
    val decay = 0.5
    val depth = 5
    val hourly = Tables(s, dir, "events")
      .groupBy(col("user_id"),
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour"))
      .agg(round(avg(col("value")), 4).as("v"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("hour"))
    val lagged = (1 to depth).foldLeft(hourly) { (df, j) =>
      df.withColumn(s"l$j", lag(col("v"), j).over(byUser))
    }
    // fixed-order weighted fold: j = 0, 1, …, 5 — same order in the oracle
    val num = (1 to depth).foldLeft(col("v")) { (acc, j) =>
      acc + coalesce(col(s"l$j") * lit(math.pow(decay, j)), lit(0.0))
    }
    val den = (1 to depth).foldLeft(lit(1.0)) { (acc, j) =>
      acc + when(col(s"l$j").isNotNull, lit(math.pow(decay, j)))
        .otherwise(lit(0.0))
    }
    lagged.select(col("user_id"), col("hour"), col("v"),
        round(num / den, 4).as("ewma"))
      .orderBy("user_id", "hour")
  }

  val eventsEwmaOracle: String = {
    val lags = (1 to 5).map(j =>
      s"lag(v, $j) OVER (PARTITION BY user_id ORDER BY hour) AS l$j")
      .mkString(",\n      |         ")
    val num = (1 to 5).foldLeft("v") { (acc, j) =>
      s"($acc + coalesce(l$j * ${math.pow(0.5, j)}, 0.0))"
    }
    val den = (1 to 5).foldLeft("1.0") { (acc, j) =>
      s"($acc + CASE WHEN l$j IS NOT NULL THEN ${math.pow(0.5, j)} ELSE 0.0 END)"
    }
    s"""WITH hourly AS (
      |  SELECT user_id,
      |         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |         round(avg(value), 4) AS v
      |  FROM events GROUP BY 1, 2),
      |lagged AS (
      |  SELECT user_id, hour, v,
      |         $lags
      |  FROM hourly)
      |SELECT user_id, hour, v, round($num / $den, 4) AS ewma
      |FROM lagged ORDER BY user_id, hour""".stripMargin
  }

  /** Calendar seasonality profile: the (day-of-week × hour-of-day) grid of
    * event counts and mean values with each cell's deviation from the
    * global mean — the classic seasonal-baseline decomposition that
    * anomaly thresholds ([[eventsAnomaly]], [[eventsMad]]) should be
    * conditioned on ("is 3 AM Sunday traffic low, or is the service
    * down?").
    *
    * Scale shape: ONE map-side-combined groupBy reduces the stream to a
    * ≤ 7×24-cell grid; the global mean re-aggregates that grid and
    * attaches as a 1-row broadcast; per-cell float math happens on 168
    * rows. Day-of-week is aligned to DuckDB's Sunday=0 convention
    * (Spark's `dayofweek` is Sunday=1) and cast to long so the grid keys
    * hash identically across engines.
    */
  def seasonalProfile(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables(s, dir, "events")
      .select((dayofweek(col("ts")) - 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"), col("value"))
      .groupBy(col("dow"), col("hod"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sv"))
    val overall = cells.agg(
      (sum(col("sv")) / sum(col("n_events"))).as("g"))
    cells.crossJoin(broadcast(overall))
      .select(col("dow"), col("hod"), col("n_events"),
        round(col("sv") / col("n_events"), 6).as("avg_value"),
        round(col("sv") / col("n_events") - col("g"), 6)
          .as("dev_from_global"))
      .orderBy("dow", "hod")
  }

  val seasonalProfileOracle: String =
    """WITH cells AS (
      |  SELECT dayofweek(CAST(ts AS TIMESTAMP)) AS dow,
      |         hour(CAST(ts AS TIMESTAMP)) AS hod,
      |         count(*) AS n_events, sum(value) AS sv
      |  FROM events GROUP BY 1, 2),
      |g AS (SELECT sum(sv) / sum(n_events) AS g FROM cells)
      |SELECT dow, hod, n_events,
      |       round(sv / n_events, 6) AS avg_value,
      |       round(sv / n_events - g.g, 6) AS dev_from_global
      |FROM cells, g ORDER BY dow, hod""".stripMargin

  /** RFM (recency / frequency / monetary) customer segmentation — the
    * classic marketing cut done scale-safe: users reduce to one row each
    * (keyed aggregate), quartile cutpoints for all three axes come from
    * ONE aggregate over that user-sized frame, and scoring is static
    * codegen'd comparisons against the 1-row cut broadcast (the
    * `equidepth_histogram` shape — never an ntile window over users,
    * which would funnel the user table through one task at web scale).
    * `monetary` is rounded BEFORE cutting so boundary users land in the
    * same quartile on both engines (raw double sums differ at 1e-12 by
    * summation order — enough to flip a quartile at an exact cut).
    * Output: one row per populated (r,f,m) cell with its population and
    * totals.
    */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val mx = ev.agg(max(col("ts").cast("date")).as("maxd"))
    val users = ev.groupBy(col("user_id"))
      .agg(max(col("ts").cast("date")).as("lastd"),
        count(lit(1)).as("freq"),
        round(sum(col("value")), 4).as("monetary"))
      .crossJoin(broadcast(mx))
      .select(col("user_id"),
        datediff(col("maxd"), col("lastd")).cast("long").as("recency"),
        col("freq"), col("monetary"))
    val qs = array(lit(0.25), lit(0.5), lit(0.75))
    val cuts = users.agg(
      percentile(col("recency"), qs).as("rc"),
      percentile(col("freq"), qs).as("fc"),
      percentile(col("monetary"), qs).as("mc"))
    def quart(v: org.apache.spark.sql.Column, c: String) =
      (1 to 3).foldLeft(lit(1)) { (acc, i) =>
        acc + when(v > element_at(col(c), i), 1).otherwise(0)
      }
    users.crossJoin(broadcast(cuts))
      .select(col("user_id"), col("freq"), col("monetary"),
        quart(col("recency"), "rc").as("r_q"),
        quart(col("freq"), "fc").as("f_q"),
        quart(col("monetary"), "mc").as("m_q"))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("freq")).as("total_events"),
        round(sum(col("monetary")), 2).as("total_value"))
      .orderBy("r_q", "f_q", "m_q")
  }

  val rfmSegmentsOracle: String =
    """WITH mx AS (SELECT max(CAST(ts AS DATE)) AS maxd FROM events),
      |u AS (
      |  SELECT user_id,
      |         CAST(date_diff('day', max(CAST(ts AS DATE)),
      |           (SELECT maxd FROM mx)) AS BIGINT) AS recency,
      |         count(*) AS freq,
      |         round(sum(value), 4) AS monetary
      |  FROM events GROUP BY user_id),
      |cuts AS (
      |  SELECT quantile_cont(recency, [0.25, 0.5, 0.75]) AS rc,
      |         quantile_cont(freq, [0.25, 0.5, 0.75]) AS fc,
      |         quantile_cont(monetary, [0.25, 0.5, 0.75]) AS mc
      |  FROM u),
      |scored AS (
      |  SELECT user_id, freq, monetary,
      |         1 + (CASE WHEN recency > rc[1] THEN 1 ELSE 0 END)
      |           + (CASE WHEN recency > rc[2] THEN 1 ELSE 0 END)
      |           + (CASE WHEN recency > rc[3] THEN 1 ELSE 0 END) AS r_q,
      |         1 + (CASE WHEN freq > fc[1] THEN 1 ELSE 0 END)
      |           + (CASE WHEN freq > fc[2] THEN 1 ELSE 0 END)
      |           + (CASE WHEN freq > fc[3] THEN 1 ELSE 0 END) AS f_q,
      |         1 + (CASE WHEN monetary > mc[1] THEN 1 ELSE 0 END)
      |           + (CASE WHEN monetary > mc[2] THEN 1 ELSE 0 END)
      |           + (CASE WHEN monetary > mc[3] THEN 1 ELSE 0 END) AS m_q
      |  FROM u, cuts)
      |SELECT CAST(r_q AS INTEGER) AS r_q, CAST(f_q AS INTEGER) AS f_q,
      |       CAST(m_q AS INTEGER) AS m_q,
      |       count(*) AS n_users,
      |       CAST(sum(freq) AS BIGINT) AS total_events,
      |       round(sum(monetary), 2) AS total_value
      |FROM scored GROUP BY r_q, f_q, m_q ORDER BY r_q, f_q, m_q""".stripMargin

  /** Sequential pattern mining with a Markov null model: the top user-
    * journey TRIGRAMS, each compared against its expected count under the
    * order-1 chain (`E[abc] = n_ab · n_bc / n_b·`), so `lift` separates
    * real sequential structure from what bigram frequencies already
    * predict — the upgrade over [[eventsTransitions]]' plain transition
    * matrix. One user-partitioned double-`lead` pass builds trigrams and
    * bigrams from the SAME frame; everything after is |alphabet|²-sized
    * (≤ 25/125 rows), joined broadcast-style, top-10 by TakeOrdered.
    */
  def pathMining(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val o = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .localCheckpoint()
    val tri = o.filter(col("e3").isNotNull)
      .groupBy(col("event_type").as("e1"), col("e2"), col("e3"))
      .agg(count(lit(1)).as("obs"))
    val bi = o.filter(col("e2").isNotNull)
      .groupBy(col("event_type").as("b1"), col("e2").as("b2"))
      .agg(count(lit(1)).as("n_bi"))
    val bstart = bi.groupBy(col("b1")).agg(sum(col("n_bi")).as("n_start"))
    val exp = col("ab_n").cast("double") * col("bc_n") / col("n_start")
    tri
      .join(bi.select(col("b1").as("e1"), col("b2").as("e2"),
        col("n_bi").as("ab_n")), Seq("e1", "e2"))
      .join(bi.select(col("b1").as("e2"), col("b2").as("e3"),
        col("n_bi").as("bc_n")), Seq("e2", "e3"))
      .join(bstart.select(col("b1").as("e2"), col("n_start")), Seq("e2"))
      .select(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"),
        col("obs"), round(exp, 2).as("exp_markov"),
        round(col("obs") / exp, 4).as("lift"))
      .orderBy(col("obs").desc, col("path"))
      .limit(10)
  }

  val pathMiningOracle: String =
    """WITH o AS (
      |  SELECT user_id, event_type, ts, event_id,
      |         lead(event_type, 1) OVER w AS e2,
      |         lead(event_type, 2) OVER w AS e3
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |tri AS (
      |  SELECT event_type AS e1, e2, e3, count(*) AS obs
      |  FROM o WHERE e3 IS NOT NULL GROUP BY 1, 2, 3),
      |bi AS (
      |  SELECT event_type AS b1, e2 AS b2, count(*) AS n_bi
      |  FROM o WHERE e2 IS NOT NULL GROUP BY 1, 2),
      |bstart AS (SELECT b1, CAST(sum(n_bi) AS BIGINT) AS n_start
      |           FROM bi GROUP BY 1)
      |SELECT t.e1 || '>' || t.e2 || '>' || t.e3 AS path, t.obs,
      |       round(CAST(ab.n_bi AS DOUBLE) * bc.n_bi / bs.n_start, 2)
      |         AS exp_markov,
      |       round(t.obs / (CAST(ab.n_bi AS DOUBLE) * bc.n_bi / bs.n_start), 4)
      |         AS lift
      |FROM tri t
      |JOIN bi ab ON ab.b1 = t.e1 AND ab.b2 = t.e2
      |JOIN bi bc ON bc.b1 = t.e2 AND bc.b2 = t.e3
      |JOIN bstart bs ON bs.b1 = t.e2
      |ORDER BY t.obs DESC, path LIMIT 10""".stripMargin

  /** Deterministic A/B experiment readout: every user is assigned a
    * variant by md5-parity of their id (the standard hash-bucket
    * experiment split — stable across runs, engines, and data order; the
    * same md5→BIGINT bridge [[graft.ops.DedupOps]] uses for its
    * engine-independent fingerprints), then Welch's unequal-variance
    * t-test compares event values between arms: t = (m_A − m_B) /
    * √(s²_A/n_A + s²_B/n_B) with the Welch–Satterthwaite df. On this
    * synthetic data the split is null by construction, so |t| small is
    * the expected readout — the operator is the machinery.
    *
    * Scale shape: ONE conditional keyless aggregate — six partial
    * aggregates ride map-side combine into a single 1-row reduce; no
    * join, no window, no per-arm pass. Variance comes from the exact
    * moment identity s² = (Σx² − n·m²)/(n−1) over conditional sums so
    * both engines aggregate the same moments (built-in var_samp differs
    * in merge order across engines; the moments round stably at 4 dp).
    */
  def abTestStats(s: SparkSession, dir: String): DataFrame = {
    val variant = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long") % 2
    def arm(v: Int, c: org.apache.spark.sql.Column) =
      when(variant === v, c)
    def n(v: Int) = count(arm(v, lit(1))).cast("double")
    def sx(v: Int) = sum(arm(v, col("value")))
    def sxx(v: Int) = sum(arm(v, col("value") * col("value")))
    Tables(s, dir, "events")
      .agg(n(0).as("na"), sx(0).as("sa"), sxx(0).as("qa"),
        n(1).as("nb"), sx(1).as("sb"), sxx(1).as("qb"))
      .select(
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        round(col("sa") / col("na"), 4).as("mean_a"),
        round(col("sb") / col("nb"), 4).as("mean_b"),
        round((col("qa") - col("sa") * col("sa") / col("na")) /
          (col("na") - 1), 4).as("var_a"),
        round((col("qb") - col("sb") * col("sb") / col("nb")) /
          (col("nb") - 1), 4).as("var_b"))
      // t and df are formed from the ROUNDED moments (ADVICE r8): the raw
      // numerator mean_a − mean_b is a catastrophic cancellation of two
      // nearly equal full-corpus sums whose reduction order differs across
      // engines — rounding the moments FIRST makes the statistic a
      // deterministic function of already-agreed 4-dp values at any SF
      .select(col("n_a"), col("n_b"), col("mean_a"), col("mean_b"),
        col("var_a"), col("var_b"),
        round((col("mean_a") - col("mean_b")) /
          sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")), 4)
          .as("welch_t"),
        round(pow(col("var_a") / col("n_a") + col("var_b") / col("n_b"), 2) /
          (pow(col("var_a") / col("n_a"), 2) / (col("n_a") - 1) +
            pow(col("var_b") / col("n_b"), 2) / (col("n_b") - 1)), 2)
          .as("welch_df"))
  }

  val abTestStatsOracle: String =
    """WITH t AS (
      |  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
      |           AS variant, value
      |  FROM events),
      |m AS (
      |  SELECT CAST(count(*) FILTER (variant = 0) AS DOUBLE) AS na,
      |         sum(value) FILTER (variant = 0) AS sa,
      |         sum(value * value) FILTER (variant = 0) AS qa,
      |         CAST(count(*) FILTER (variant = 1) AS DOUBLE) AS nb,
      |         sum(value) FILTER (variant = 1) AS sb,
      |         sum(value * value) FILTER (variant = 1) AS qb
      |  FROM t),
      |v AS (
      |  SELECT na, nb, round(sa / na, 4) AS ma, round(sb / nb, 4) AS mb,
      |         round((qa - sa * sa / na) / (na - 1), 4) AS va,
      |         round((qb - sb * sb / nb) / (nb - 1), 4) AS vb
      |  FROM m)
      |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |       ma AS mean_a, mb AS mean_b,
      |       va AS var_a, vb AS var_b,
      |       round((ma - mb) / sqrt(va / na + vb / nb), 4) AS welch_t,
      |       round(pow(va / na + vb / nb, 2) /
      |             (pow(va / na, 2) / (na - 1) + pow(vb / nb, 2) / (nb - 1)),
      |             2) AS welch_df
      |FROM v""".stripMargin

  /** The conversion-rate counterpart of [[abTestStats]]: a 2×2 chi-square
    * independence test of user-level HIGH-VALUE purchase conversion
    * (a purchase event with value > 200) by the same
    * md5-parity variant split. Counts stay exact BIGINTs all the way to
    * the final statistic (χ² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d)) — the
    * closed 2×2 form needs no expected-cell floats), so the only float op
    * is one division, rounded at 4. Significance at α=0.05 is χ² > 3.841
    * (1 df).
    *
    * Scale shape: one user-keyed aggregate (conversion flag per user) +
    * one keyless 1-row aggregate of four conditional counts — map-side
    * combine end-to-end, no join, no window. The (ad−bc)² cross term is
    * computed in DOUBLE: at web-scale user counts the BIGINT square would
    * overflow first.
    */
  def abChiSquare(s: SparkSession, dir: String): DataFrame = {
    val users = Tables(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 200, 1L)
        .otherwise(0L)).as("converted"))
      .select(
        (conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 2).as("variant"),
        col("converted"))
    def cell(v: Int, conv0: Long) =
      count(when(col("variant") === v && col("converted") === conv0, 1))
    val d = (c: String) => col(c).cast("double")
    users.agg(
      cell(0, 1L).as("a"), cell(0, 0L).as("b"),
      cell(1, 1L).as("c"), cell(1, 0L).as("d"))
      .select(col("a").as("conv_a"), col("b").as("nonconv_a"),
        col("c").as("conv_b"), col("d").as("nonconv_b"),
        // zero-margin guard (ADVICE r8): an empty row/column margin (e.g.
        // no value>200 purchases at some SF) has no measurable association
        // — χ² is DEFINED as 0 there instead of a null from 0/0
        round(when(
          (d("a") + d("b")) * (d("c") + d("d")) *
            (d("a") + d("c")) * (d("b") + d("d")) === 0, lit(0.0))
          .otherwise((d("a") + d("b") + d("c") + d("d")) *
            pow(d("a") * d("d") - d("b") * d("c"), 2) /
            ((d("a") + d("b")) * (d("c") + d("d")) *
              (d("a") + d("c")) * (d("b") + d("d")))), 4).as("chi2"))
      .select(col("conv_a"), col("nonconv_a"), col("conv_b"), col("nonconv_b"),
        col("chi2"), (col("chi2") > 3.841).as("significant"))
  }

  val abChiSquareOracle: String =
    """WITH u AS (
      |  SELECT user_id,
      |         max(CASE WHEN event_type = 'purchase' AND value > 200
      |               THEN 1 ELSE 0 END) AS converted
      |  FROM events GROUP BY user_id),
      |t AS (
      |  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
      |           % 2 AS variant, converted
      |  FROM u),
      |m AS (
      |  SELECT count(*) FILTER (variant = 0 AND converted = 1) AS a,
      |         count(*) FILTER (variant = 0 AND converted = 0) AS b,
      |         count(*) FILTER (variant = 1 AND converted = 1) AS c,
      |         count(*) FILTER (variant = 1 AND converted = 0) AS d
      |  FROM t),
      |x AS (
      |  SELECT a, b, c, d,
      |         CASE WHEN (CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d) *
      |                   (CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d) = 0
      |              THEN CAST(0 AS DOUBLE)
      |              ELSE round((CAST(a AS DOUBLE) + b + c + d) *
      |                pow(CAST(a AS DOUBLE) * d - CAST(b AS DOUBLE) * c, 2) /
      |                ((CAST(a AS DOUBLE) + b) * (CAST(c AS DOUBLE) + d) *
      |                 (CAST(a AS DOUBLE) + c) * (CAST(b AS DOUBLE) + d)), 4)
      |         END AS chi2
      |  FROM m)
      |SELECT a AS conv_a, b AS nonconv_a, c AS conv_b, d AS nonconv_b,
      |       chi2, chi2 > 3.841 AS significant
      |FROM x""".stripMargin

  /** DAU/MAU stickiness — the product-analytics engagement curve (how
    * much of the monthly audience shows up each day): per day, distinct
    * active users over the period's distinct users. The events table
    * spans one month, so MAU is the single period denominator; on a
    * longer stream the same plan groups the denominator by month. Day
    * keys are formatted STRINGS (the [[eventsTumbling]] timestamp-
    * precision discipline).
    *
    * Scale shape: two countDistinct aggregations (per-day and global),
    * the global one attached as a 1-row broadcast — day cardinality
    * output, no window.
    */
  def dauMau(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
    val dau = ev.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val mau = ev.agg(countDistinct(col("user_id")).as("mau"))
    dau.crossJoin(broadcast(mau))
      .select(col("day"), col("dau"), col("mau"),
        round(col("dau") / col("mau"), 4).as("stickiness"))
      .orderBy("day")
  }

  val dauMauOracle: String =
    """WITH ev AS (
      |  SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
      |  FROM events),
      |dau AS (SELECT day, count(DISTINCT user_id) AS dau
      |        FROM ev GROUP BY day),
      |mau AS (SELECT count(DISTINCT user_id) AS mau FROM ev)
      |SELECT day, dau, mau.mau,
      |       round(CAST(dau AS DOUBLE) / mau.mau, 4) AS stickiness
      |FROM dau, mau ORDER BY day""".stripMargin

  /** Rolling 7-day active users (WAU) next to DAU — the engagement pair a
    * product dashboard actually plots ([[dauMau]]'s denominator is too
    * coarse to see week-scale churn). Trailing distinct counts are the
    * classic distributed-window trap (no partial aggregation for
    * `countDistinct` over sliding frames); the scale-safe form FANS OUT:
    * each distinct (user, day) contributes to the 7 window-END days it
    * falls into, then WAU is a plain per-day countDistinct — a bounded
    * ×7 fan-out instead of a corpus-sized ordered window.
    *
    * Scale shape: one distinct over (user, day) (map-side combined —
    * events per user-day collapse locally), a 7-row explode, and two
    * keyed countDistinct aggregates; output is day cardinality.
    */
  def wauRolling(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables(s, dir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .distinct()
    val days = ud.select(
      date_format(col("d"), "yyyy-MM-dd").as("day")).distinct()
    val contrib = ud
      .select(col("user_id"),
        explode(sequence(lit(0), lit(6))).as("k"), col("d"))
      .select(col("user_id"),
        date_format(date_add(col("d").cast("date"), col("k")), "yyyy-MM-dd")
          .as("day"))
    val wau = contrib.join(days, "day")
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("wau"))
    val dau = ud
      .select(col("user_id"), date_format(col("d"), "yyyy-MM-dd").as("day"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau") / col("wau"), 4).as("dau_wau_ratio"))
      .orderBy("day")
  }

  val wauRollingOracle: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events),
      |days AS (SELECT DISTINCT strftime(d, '%Y-%m-%d') AS day FROM ud),
      |contrib AS (
      |  SELECT user_id,
      |         strftime(d + to_days(CAST(k AS INTEGER)), '%Y-%m-%d') AS day
      |  FROM ud, LATERAL unnest(generate_series(0, 6)) t(k)),
      |wau AS (
      |  SELECT c.day, count(DISTINCT c.user_id) AS wau
      |  FROM contrib c JOIN days USING (day) GROUP BY c.day),
      |dau AS (
      |  SELECT strftime(d, '%Y-%m-%d') AS day,
      |         count(DISTINCT user_id) AS dau
      |  FROM ud GROUP BY 1)
      |SELECT day, dau, wau,
      |       round(CAST(dau AS DOUBLE) / wau, 4) AS dau_wau_ratio
      |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin

  /** A/B sample-size planning table — the power analysis run BEFORE an
    * experiment ([[abTestStats]] is the read-out after): from the
    * observed metric mean and variance, the per-arm n needed to detect a
    * relative lift δ at α = 0.05 (two-sided) with 80% power,
    * n = 2(z₀.₀₂₅+z₀.₂)²σ²/(δμ)², for δ ∈ {1%, 2%, 5%, 10%}, with a
    * feasibility flag against the events actually available. Moments are
    * 4-rounded BEFORE the closed form (the [[abTestStats]] cancellation
    * discipline), so both engines compute the formula on identical
    * inputs and the z-constant is one shared literal.
    *
    * Scale shape: ONE keyless moment aggregate; the table is 4 rows.
    */
  def abPower(s: SparkSession, dir: String): DataFrame = {
    val zSq = { val z = 1.959964 + 0.841621; z * z }
    val m = Tables(s, dir, "events")
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("value")).as("sx"),
        sum(col("value") * col("value")).as("sxx"))
      .select(col("n").cast("long").as("n_events"),
        round(col("sx") / col("n"), 4).as("mu"),
        round((col("sxx") - col("sx") * col("sx") / col("n")) /
          (col("n") - 1), 4).as("var_v"))
    m.select(col("n_events"), col("mu"), col("var_v"),
        explode(array(Seq(0.01, 0.02, 0.05, 0.10).map(lit): _*)).as("lift"))
      .select(col("lift"), col("mu"), col("var_v"),
        ceil(lit(2.0) * lit(zSq) * col("var_v") /
          ((col("lift") * col("mu")) * (col("lift") * col("mu"))))
          .cast("long").as("n_per_arm"),
        col("n_events"))
      .withColumn("feasible", col("n_per_arm") * 2 <= col("n_events"))
      .orderBy("lift")
  }

  val abPowerOracle: String = {
    val zSq = { val z = 1.959964 + 0.841621; z * z }
    s"""WITH m AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_events,
       |         round(sum(value) / count(*), 4) AS mu,
       |         round((sum(value * value)
       |             - sum(value) * sum(value) / count(*))
       |           / (count(*) - 1), 4) AS var_v
       |  FROM events),
       |lifts AS (SELECT CAST(unnest([0.01, 0.02, 0.05, 0.10]) AS DOUBLE)
       |                 AS lift)
       |SELECT l.lift, m.mu, m.var_v,
       |       CAST(ceil(2.0 * $zSq * m.var_v /
       |         ((l.lift * m.mu) * (l.lift * m.mu))) AS BIGINT)
       |         AS n_per_arm,
       |       m.n_events,
       |       CAST(ceil(2.0 * $zSq * m.var_v /
       |         ((l.lift * m.mu) * (l.lift * m.mu))) AS BIGINT) * 2
       |         <= m.n_events AS feasible
       |FROM m, lifts l ORDER BY l.lift""".stripMargin
  }

  /** Attribution-lag profile — how long before a purchase its attributed
    * view happened, rolled up per purchase day: conversion count, mean
    * and max lag in hours, and the within-24h share. Reads the
    * [[AnalyticsOps.asofJoinAttribution]] result (the oracle-verified
    * last-touch table), so the lag numbers provably describe the SAME
    * attribution the as-of family serves — the number a marketing
    * attribution window (the 7-day cap in the join) gets tuned against.
    *
    * Scale shape: one purchase-keyed join to attach the day + one
    * map-side-combined per-day aggregate on top of the attribution
    * query's own plan.
    */
  def conversionLag(s: SparkSession, dir: String): DataFrame = {
    val attr = AnalyticsOps.asofJoinAttribution(s, dir)
      .select(col("purchase_id"), col("gap_sec"))
    val pday = Tables(s, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
    attr.join(pday, "purchase_id")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_conversions"),
        // mean from the EXACT integer-seconds sum, one double division at
        // the end — avg(gap/3600.0) accumulates doubles in partition
        // order, and this mean sits within an ulp of a 4dp rounding
        // boundary on the gate corpus (r18: an AQE partition-count change
        // flipped 25.0956 ↔ 25.0957). sum(LONG) is order-independent;
        // the oracle states the same expression.
        round(sum(col("gap_sec")).cast("double") / 3600.0 /
          count(lit(1)), 4).as("mean_lag_hours"),
        round(max(col("gap_sec")) / 3600.0, 4).as("max_lag_hours"),
        sum(when(col("gap_sec") <= 86400, 1L).otherwise(0L))
          .as("n_within_24h"))
      .orderBy("day")
  }

  val conversionLagOracle: String =
    s"""WITH attr AS (
       |  SELECT purchase_id, gap_sec FROM (${AnalyticsOps.asofJoinOracle})),
       |pday AS (
       |  SELECT event_id AS purchase_id,
       |         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
       |  FROM events WHERE event_type = 'purchase')
       |SELECT day, count(*) AS n_conversions,
       |       round(CAST(sum(gap_sec) AS DOUBLE) / 3600.0 / count(*), 4)
       |         AS mean_lag_hours,
       |       round(max(gap_sec) / 3600.0, 4) AS max_lag_hours,
       |       CAST(sum(CASE WHEN gap_sec <= 86400 THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_within_24h
       |FROM attr JOIN pday USING (purchase_id)
       |GROUP BY day ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wau_rolling" -> (wauRolling _),
    "ab_power" -> (abPower _),
    "dau_mau" -> (dauMau _),
    "conversion_lag" -> (conversionLag _),
    "ab_chi_square" -> (abChiSquare _),
    "ab_test_stats" -> (abTestStats _),
    "rfm_segments" -> (rfmSegments _),
    "path_mining" -> (pathMining _),
    "seasonal_profile" -> (seasonalProfile _),
    "events_ewma" -> (eventsEwma _),
    "events_islands" -> (eventsIslands _),
    "cdc_compaction" -> (cdcCompaction _),
    "events_mad" -> (eventsMad _),
    "events_sliding" -> (eventsSliding _),
    "events_gap_fill" -> (eventsGapFill _),
    "events_value_quartiles" -> (eventsValueQuartiles _),
    "events_funnel" -> (eventsFunnel _),
    "events_transitions" -> (eventsTransitions _),
    "events_range_join" -> (eventsRangeJoin _),
    "events_anomaly" -> (eventsAnomaly _),
    "events_tumbling" -> (eventsTumbling _),
    "events_sessionize" -> (eventsSessionize _),
    "session_gap_sweep" -> (sessionGapSweep _),
    "watermark_drop_audit" -> (watermarkDropAudit _),
    "events_json" -> (eventsJson _),
    "events_variant" -> (eventsVariant _),
    "events_session_window" -> (eventsSessionWindow _),
    "events_value_percentiles" -> (valuePercentiles _),
    "events_topk_users" -> (eventsTopkUsers _))

  val oracles: Map[String, String] = Map(
    "wau_rolling" -> wauRollingOracle,
    "ab_power" -> abPowerOracle,
    "dau_mau" -> dauMauOracle,
    "conversion_lag" -> conversionLagOracle,
    "ab_chi_square" -> abChiSquareOracle,
    "ab_test_stats" -> abTestStatsOracle,
    "rfm_segments" -> rfmSegmentsOracle,
    "path_mining" -> pathMiningOracle,
    "seasonal_profile" -> seasonalProfileOracle,
    "events_ewma" -> eventsEwmaOracle,
    "events_islands" -> eventsIslandsOracle,
    "cdc_compaction" -> cdcCompactionOracle,
    "events_mad" -> eventsMadOracle,
    "events_sliding" -> eventsSlidingOracle,
    "events_gap_fill" -> eventsGapFillOracle,
    "events_value_quartiles" -> eventsValueQuartilesOracle,
    "events_funnel" -> eventsFunnelOracle,
    "events_transitions" -> eventsTransitionsOracle,
    "events_range_join" -> eventsRangeJoinOracle,
    "events_anomaly" -> eventsAnomalyOracle,
    "events_tumbling" -> eventsTumblingOracle,
    "events_sessionize" -> eventsSessionizeOracle,
    "session_gap_sweep" -> sessionGapSweepOracle,
    "watermark_drop_audit" -> watermarkDropAuditOracle,
    "events_json" -> eventsJsonOracle,
    "events_variant" -> eventsVariantOracle,
    "events_session_window" -> eventsSessionWindowOracle,
    "events_value_percentiles" -> valuePercentilesOracle,
    "events_topk_users" -> eventsTopkUsersOracle)
}

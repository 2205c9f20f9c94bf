package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the event analytics queries beyond the DuckDB
  * oracle's value equality.
  */
class EventOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("events_sliding: every event counted twice; totals reconcile with tumbling") {
    val sliding = graft.ops.EventOps.eventsSliding(spark, dir).collect()
    val slidingN = sliding.map(_.getLong(2)).sum
    val total = graft.ops.Tables(spark, dir, "events").count()
    assert(slidingN == 2 * total, s"$slidingN != 2*$total")
  }

  test("events_gap_fill: fills from the user's latest prior observation only") {
    val ev = graft.ops.Tables(spark, dir, "events")
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val order = ev.sortBy(e => (e._2, e._3, e._1))  // per-user timeline
    val rows = graft.ops.EventOps.eventsGapFill(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap
    // masked exactly at event_id % 7 == 0; non-masked rows fill to themselves
    rows.foreach { case (id, (_, masked, filled)) =>
      if (id % 7 == 0) assert(masked.isEmpty, id.toString)
      else { assert(masked.nonEmpty); assert(filled == masked) }
    }
    // masked rows take the nearest prior non-masked value in their user's timeline
    order.groupBy(_._2).foreach { case (_, es) =>
      var lastSeen: Option[Double] = None
      es.sortBy(e => (e._3, e._1)).foreach { case (id, _, _) =>
        val (_, masked, filled) = rows(id)
        if (masked.nonEmpty) lastSeen = masked
        else assert(filled == lastSeen, s"event $id")
      }
    }
  }

  test("events_funnel stage counts are monotone non-increasing") {
    val rows = graft.ops.EventOps.eventsFunnel(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_view", "2_click", "3_purchase"))
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse, counts.toString)
    assert(counts.head > 0, "no users entered the funnel — test is vacuous")
  }

  test("events_transitions percentages sum to 100 per from_type") {
    val rows = graft.ops.EventOps.eventsTransitions(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val pctSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pctSum - 100.0) < 0.01, s"$from: $pctSum")
    }
    // transition pair count equals events minus one per active user
    val nPairs = rows.map(_.getLong(2)).sum
    val ev = graft.ops.Tables(spark, dir, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(nPairs == expected)
  }

  test("events_anomaly matches an independent driver-side 3-sigma recompute") {
    val events = graft.ops.Tables(spark, dir, "events")
      .select("event_id", "user_id", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // same membership rule as the operator: the cut is on the HALF_UP
    // 3-decimal-rounded z (engine-stable), not raw doubles
    val expected = events.toSeq.groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val n = es.length
      val mu = es.map(_._3).sum / n
      val sigma = math.sqrt(es.map(e => (e._3 - mu) * (e._3 - mu)).sum / n)
      if (sigma > 0) es.filter { e =>
        val z = BigDecimal((e._3 - mu) / sigma)
          .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
        math.abs(z) > 3.0
      }.map(_._1)
      else Seq.empty[Long]
    }.toSet
    val got = graft.ops.EventOps.eventsAnomaly(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSet == expected)
    assert(got.nonEmpty, "fixture produced no anomalies — test is vacuous")
    // every emitted z clears the cut; rounding can land exactly on it
    got.foreach { r => assert(math.abs(r.getDouble(4)) > 3.0, r) }
  }

  test("events_range_join binned equi-join = naive theta join, and stays a hash join") {
    val ev = graft.ops.Tables(spark, dir, "events")
      .select(col("event_type"), col("user_id"),
        unix_timestamp(date_trunc("second", col("ts"))).as("sec"))
    val camp = ev.groupBy(col("event_type").as("campaign"))
      .agg(min(col("sec")).as("ws"))
      .withColumn("we", col("ws") + 2L * 3600L)
    val naive = ev.join(camp,
        col("sec") >= col("ws") && col("sec") < col("we"))
      .groupBy(col("campaign"), col("ws"), col("we"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("campaign"),
        date_format(to_timestamp(col("ws")), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        date_format(to_timestamp(col("we")), "yyyy-MM-dd HH:mm:ss").as("window_end"),
        col("n_events"), col("n_users"))
    // the naive theta join is the join shape the operator exists to avoid
    assert(naive.queryExecution.executedPlan.toString.contains("NestedLoop"))
    val binned = graft.ops.EventOps.eventsRangeJoin(spark, dir)
    assert(!binned.queryExecution.executedPlan.toString.contains("NestedLoop"))
    val a = naive.collect().map(_.toSeq).toSet
    val b = binned.collect().map(_.toSeq).toSet
    assert(a == b, "binned range join must reproduce the theta join exactly")
    assert(b.nonEmpty)
  }

  test("events_ewma = independent Scala fold over the hourly series") {
    val rows = graft.ops.EventOps.eventsEwma(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    def rnd(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.groupBy(_._1).foreach { case (user, series) =>
      val sorted = series.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, hour, v, ewma), i) =>
        val window = sorted.slice(math.max(0, i - 5), i + 1).reverse // j=0 first
        var num = 0.0; var den = 0.0
        window.zipWithIndex.foreach { case ((_, _, vj, _), j) =>
          num += vj * math.pow(0.5, j); den += math.pow(0.5, j)
        }
        val expected = rnd(num / den)
        assert(math.abs(ewma - expected) < 5e-5,
          s"user $user hour $hour: ewma=$ewma expected=$expected")
        // smoother stays inside the window's value envelope
        val vs = window.map(_._3)
        assert(ewma >= vs.min - 1e-9 && ewma <= vs.max + 1e-9)
      }
      // head of the series: no history, EWMA == the bucket value
      assert(sorted.head._4 == rnd(sorted.head._3))
    }
  }

  test("ab_chi_square: cells partition the users; chi2 matches the expected-cell form") {
    import org.apache.spark.sql.functions._
    val r = graft.ops.EventOps.abChiSquare(spark, dir).collect().head
    val cells = Array(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val nUsers = graft.ops.Tables(spark, dir, "events")
      .select("user_id").distinct().count()
    assert(cells.sum == nUsers, "2x2 cells must partition the user base")
    assert(cells.forall(_ >= 0))
    // the closed 2x2 form must equal the definitional sum over cells of
    // (obs - exp)^2 / exp
    val Array(a, b, c, d) = cells.map(_.toDouble)
    val n = a + b + c + d
    val exp = Array((a + b) * (a + c) / n, (a + b) * (b + d) / n,
      (c + d) * (a + c) / n, (c + d) * (b + d) / n)
    val defn = cells.map(_.toDouble).zip(exp)
      .map { case (o, e) => (o - e) * (o - e) / e }.sum
    assert(math.abs(r.getDouble(4) - defn) < 1e-3,
      s"closed-form chi2 ${r.getDouble(4)} vs definitional $defn")
    assert(r.getBoolean(5) == (r.getDouble(4) > 3.841))
  }

  test("ab_test_stats: arms partition the events; moments match a direct pass") {
    import org.apache.spark.sql.functions._
    val r = graft.ops.EventOps.abTestStats(spark, dir).collect().head
    val (nA, nB) = (r.getLong(0), r.getLong(1))
    val total = graft.ops.Tables(spark, dir, "events").count()
    assert(nA + nB == total, "variants must partition the event stream")
    assert(nA > 0 && nB > 0, "md5-parity split left an arm empty")
    // recompute arm A's mean/variance directly and compare at the
    // operator's own rounding
    val ev = graft.ops.Tables(spark, dir, "events")
      .withColumn("variant",
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 2)
    val a = ev.filter(col("variant") === 0).select("value").collect().map(_.getDouble(0))
    val mean = a.sum / a.length
    val varS = a.map(x => (x - mean) * (x - mean)).sum / (a.length - 1)
    assert(math.abs(r.getDouble(2) - mean) < 1e-3, s"mean_a ${r.getDouble(2)} vs $mean")
    assert(math.abs(r.getDouble(4) - varS) < 1e-2, s"var_a ${r.getDouble(4)} vs $varS")
    // Welch df bounds: min(n)-1 ≤ df ≤ n_a+n_b-2
    val df = r.getDouble(7)
    assert(df >= math.min(nA, nB) - 1 && df <= nA + nB - 2, s"df $df out of bounds")
    assert(!r.getDouble(6).isNaN && !r.getDouble(6).isInfinite)
  }
  test("dau_mau: stickiness = dau/mau, dau bounded by mau, mau is the " +
    "period distinct-user count") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.ops.EventOps.dauMau(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val mau = graft.ops.Tables(spark, dir, "events")
      .select("user_id").distinct().count()
    rows.foreach { case (day, dau, m, st) =>
      assert(m == mau, s"$day mau")
      assert(dau >= 1 && dau <= mau, s"$day dau $dau")
      val expect = BigDecimal(dau.toDouble / mau)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(st == expect, s"$day stickiness")
    }
  }

  test("conversion_lag: totals reconcile with the attribution table and " +
    "lags are non-negative within the 7-day window") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.ops.EventOps.conversionLag(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    val nAttr = graft.ops.AnalyticsOps.asofJoinAttribution(spark, dir).count()
    assert(rows.map(_._2).sum == nAttr,
      "per-day conversions must sum to the attribution rows")
    rows.foreach { case (day, n, mean, mx, within) =>
      assert(n > 0 && within >= 0 && within <= n, day)
      assert(mean >= 0 && mx >= mean - 1e-9, day)
      assert(mx <= 7 * 24.0 + 1e-9, s"$day lag beyond the 7-day window")
    }
  }
  test("wau_rolling: WAU bounds DAU, equals the brute-force trailing-7-day " +
    "distinct count, and the ratio is consistent") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.ops.EventOps.wauRolling(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val ud = graft.ops.Tables(spark, dir, "events")
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("ts"), "yyyy-MM-dd").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getString(1)))
    val fmt = java.time.format.DateTimeFormatter.ISO_LOCAL_DATE
    rows.foreach { case (day, dau, wau, ratio) =>
      assert(dau <= wau, s"$day: DAU $dau > WAU $wau")
      val end = java.time.LocalDate.parse(day, fmt)
      val expect = ud.filter { case (_, d) =>
        val dd = java.time.LocalDate.parse(d, fmt)
        !dd.isAfter(end) && dd.isAfter(end.minusDays(7))
      }.map(_._1).distinct.length
      assert(wau == expect, s"$day: WAU $wau vs brute $expect")
      val r = BigDecimal(dau.toDouble / wau)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ratio == r)
    }
  }

  test("ab_power: n_per_arm follows the closed form and scales as 1/lift^2") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.ops.EventOps.abPower(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(0.01, 0.02, 0.05, 0.10))
    val zSq = { val z = 1.959964 + 0.841621; z * z }
    rows.foreach { case (lift, mu, v, n, nEvents, feasible) =>
      val expect = math.ceil(2.0 * zSq * v / ((lift * mu) * (lift * mu))).toLong
      assert(n == expect, s"lift $lift: $n vs $expect")
      assert(feasible == (n * 2 <= nEvents))
    }
    // halving the lift quadruples the sample size (integer-ceil slack)
    val byLift = rows.map(r => r._1 -> r._4).toMap
    assert(math.abs(byLift(0.01).toDouble / byLift(0.02) - 4.0) < 0.01)
  }

  test("session_gap_sweep: monotone in the gap, and the 1800s row equals events_sessionize") {
    val rows = graft.ops.EventOps.sessionGapSweep(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(300, 900, 1800, 3600))
    assert(rows.map(_._2).distinct.size == 1, "n_events must not vary with gap")
    // widening the gap can only MERGE sessions
    rows.map(_._3).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, s"n_sessions rose with gap: ${rows.toSeq}")
      case _ =>
    }
    rows.map(_._4).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a, s"mean_events fell with gap: ${rows.toSeq}")
      case _ =>
    }
    // watermark_drop_audit: a longer delay can only ADMIT more events,
    // and the sharded (day-keyed + bounded-carry) watermark basis must
    // reproduce a driver-side single-scan running max exactly
    val wm = graft.ops.EventOps.watermarkDropAudit(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(2))).sortBy(_._1)
    assert(wm.map(_._1).toSeq == Seq(60, 300, 900))
    wm.map(_._2).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, s"drops rose with delay: ${wm.toSeq}")
      case _ =>
    }
    val ev = graft.ops.Tables(spark, dir, "events")
      .select(col("event_id"), unix_timestamp(col("ts")).as("es"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def arrOf(id: Long, es: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"arr_$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      es + java.lang.Long.parseLong(h.take(15), 16) % 1800
    }
    val byArrival = ev.map { case (id, es) => (id, es, arrOf(id, es)) }
      .sortBy(t => (t._3, t._1))
    var runMax = Long.MinValue
    var drops60 = 0L
    byArrival.foreach { case (_, es, _) =>
      if (runMax != Long.MinValue && es < runMax - 60L) drops60 += 1
      if (es > runMax) runMax = es
    }
    assert(wm.find(_._1 == 60).get._2 == drops60,
      s"sharded watermark drops ${wm.find(_._1 == 60).get._2} != scan $drops60")

    // the sweep's 1800s row must agree with the shipped sessionizer —
    // same boundary rule, independently computed (per-session grouping
    // there, pure gap-column algebra here)
    val sessions = graft.ops.EventOps.eventsSessionize(spark, dir).collect()
    val n1800 = rows.find(_._1 == 1800).get
    assert(n1800._3 == sessions.length,
      s"sweep says ${n1800._3} sessions at 1800s, sessionize emits ${sessions.length}")
    val singles = sessions.count(_.getLong(2) == 1L)
    val share = graft.ops.EventOps.sessionGapSweep(spark, dir).collect()
      .find(_.getInt(0) == 1800).get.getDouble(5)
    assert(math.abs(share - singles.toDouble / sessions.length) < 1e-5,
      s"single-event share $share vs recount ${singles.toDouble / sessions.length}")
  }
}

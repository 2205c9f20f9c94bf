package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{AsOfJoinExec, AsOfJoinOps}

/** The native as-of operator (§7.4 ladder case c): strategy actually plans
  * it, the merge agrees with the composed interval-join + window form on
  * real data, and the contract edges (tolerance boundary, time ties, null
  * keys, no-match rows) behave as documented.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SparkTestSession.spark
    GraftOptimizations.install(s)
    s
  }
  private val dir = "/root/testdata/sf0.001"

  test("strategy plans AsOfJoinExec (not a fallback) with key-clustered exchanges") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val top = AsOfJoinOps.asofJoinNative(spark, dir).queryExecution.executedPlan
    // descend through the AQE wrapper (its inputPlan is not a `children` kid)
    val plan = top match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case other => other
    }
    val execs = plan.collect { case e: AsOfJoinExec => e }
    assert(execs.size == 1, s"expected one AsOfJoinExec, plan:\n$plan")
    // EnsureRequirements must have clustered both children by key — that
    // shows in the adaptive wrapper's CURRENT plan string (inputPlan is
    // the pre-preparation tree)
    val s = top.toString
    assert(s.contains("Exchange hashpartitioning"), "children not key-clustered")
    assert(s.contains("Sort ["), "children not sorted for the merge")
  }

  test("native merge == composed interval-join + window, row for row") {
    val native = AsOfJoinOps.asofJoinNative(spark, dir).collect().map(_.toSeq)
    val composed = graft.ops.AnalyticsOps.asofJoinAttribution(spark, dir)
      .collect().map(_.toSeq)
    assert(native.length == composed.length)
    assert(native.toSeq == composed.toSeq)
  }

  test("contract edges: tolerance boundary exclusive, ties pick max tie-break, nulls never match") {
    import spark.implicits._
    // times below are raw longs in the operator's (unit-agnostic) time
    // axis; tolerance is in the SAME unit
    val tolMicros = 10L
    val left = Seq(
      (1L, java.lang.Long.valueOf(100L), 20L), // best right t=20: 20 > 10 ✓
      (2L, java.lang.Long.valueOf(100L), 30L), // best right t=25: 25 > 20 ✓
      (3L, java.lang.Long.valueOf(100L), 35L), // best 25: 25 > 25 ✗ — the
                                               // EXACT exclusive boundary
      (4L, java.lang.Long.valueOf(200L), 50L), // ties at t=50: ids 7,8 → 8
      (5L, null.asInstanceOf[java.lang.Long], 50L), // null key: no match
      (6L, java.lang.Long.valueOf(999L), 50L)) // no right rows for key
      .toDF("lid", "k", "lt")
    val right = Seq(
      (10L, java.lang.Long.valueOf(100L), 15L),
      (11L, java.lang.Long.valueOf(100L), 20L),
      (12L, java.lang.Long.valueOf(100L), 25L),
      (7L, java.lang.Long.valueOf(200L), 50L),
      (8L, java.lang.Long.valueOf(200L), 50L),
      (9L, null.asInstanceOf[java.lang.Long], 50L))
      .toDF("rid", "rk", "rt")
    val out = AsOfJoinOps.asOf(left, right,
        leftKey = col("k"), rightKey = col("rk"),
        leftTime = col("lt"), rightTime = col("rt"),
        rightTieBreak = col("rid"), toleranceMicros = tolMicros)
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 11L, 2L -> 12L, 4L -> 8L),
      s"got $out")
    // boundary: left 3 at t=35 has best right at 25; 25 > 35-10=25 fails
    // the EXCLUSIVE lower bound (> lt - tol) — must be absent
    assert(!out.contains(3L))
  }

  test("outer mode keeps every left row; unmatched and null-key rows carry nulls") {
    import spark.implicits._
    val left = Seq(
      (1L, java.lang.Long.valueOf(100L), 20L), // matched
      (3L, java.lang.Long.valueOf(100L), 35L), // boundary-excluded → null
      (5L, null.asInstanceOf[java.lang.Long], 50L), // null key → null
      (6L, java.lang.Long.valueOf(999L), 50L)) // no right key → null
      .toDF("lid", "k", "lt")
    val right = Seq(
      (11L, java.lang.Long.valueOf(100L), 20L),
      (12L, java.lang.Long.valueOf(100L), 25L))
      .toDF("rid", "rk", "rt")
    val out = AsOfJoinOps.asOf(left, right,
        col("k"), col("rk"), col("lt"), col("rt"), col("rid"),
        toleranceMicros = 10L, isOuter = true)
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out == Map(1L -> Some(11L), 3L -> None, 5L -> None, 6L -> None),
      s"got $out")
    // and on real data: outer row count == left row count, inner ⊆ outer
    val nPurchases = graft.ops.Tables(spark, dir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(AsOfJoinOps.asofJoinOuter(spark, dir).count() == nPurchases)
  }

  test("merge is exact under adversarial partitioning (pre-skewed inputs)") {
    // repartition inputs badly — requiredChildDistribution must fix it
    val ev = graft.ops.Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts_s"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_s").as("p_ts")).repartition(7, col("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts_s").as("v_ts")).repartition(3)
    val out = AsOfJoinOps.asOf(p, v,
        col("user_id"), col("v_user"),
        unix_micros(col("p_ts")), unix_micros(col("v_ts")),
        col("view_id"), 7L * 24 * 3600 * 1000000L)
      .select("purchase_id", "view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val ref = graft.ops.AnalyticsOps.asofJoinAttribution(spark, dir)
      .select("purchase_id", "attributed_view_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out == ref)
  }

  test("nearest mode: min |Δt|, INCLUSIVE tolerance, backward wins ties, max tie-break both directions") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 30L),  // back 25 (Δ5) vs fwd 40 (Δ10) → back (rid 12)
      (2L, 100L, 38L),  // back 25 (Δ13) vs fwd 40 (Δ2) → FORWARD (rid 13)
      (3L, 100L, 50L),  // exact tie: back 40 (Δ10) vs fwd 60 (Δ10) → back (rid 13)
      (4L, 100L, 75L),  // back 60 Δ15 > tol(10); fwd 85 Δ10 = tol INCLUSIVE → fwd
      (5L, 100L, 97L),  // fwd-time tie at 107: rids 16,17 → max rid 17
      (6L, 200L, 10L))  // only a FORWARD row exists for this key → rid 20
      .toDF("lid", "k", "lt")
    val right = Seq(
      (11L, 100L, 15L),
      (12L, 100L, 25L),
      (13L, 100L, 40L),
      (14L, 100L, 60L),
      (15L, 100L, 85L),
      (16L, 100L, 107L),
      (17L, 100L, 107L),
      (20L, 200L, 15L))
      .toDF("rid", "rk", "rt")
    val out = AsOfJoinOps.asOf(left, right,
        col("k"), col("rk"), col("lt"), col("rt"), col("rid"),
        toleranceMicros = 10L, nearest = true)
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 12L, 2L -> 13L, 3L -> 13L, 4L -> 15L,
      5L -> 17L, 6L -> 20L), s"got $out")
    // backward-at-exact-tolerance is INCLUSIVE in nearest mode (vs the
    // backward mode's exclusive bound): lt=35, back 25, Δ=10=tol → matches
    val incl = AsOfJoinOps.asOf(
        Seq((9L, 100L, 35L)).toDF("lid", "k", "lt"),
        Seq((12L, 100L, 25L)).toDF("rid", "rk", "rt"),
        col("k"), col("rk"), col("lt"), col("rt"), col("rid"),
        toleranceMicros = 10L, nearest = true)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(incl.toSeq == Seq((9L, 12L)))
  }

  test("nearest mode on real data matches a composed min-by-|Δt| formulation") {
    val native = AsOfJoinOps.asofJoinNearest(spark, dir).collect().map(_.toSeq)
    // composed reference: inclusive |Δt| band join + rank window with the
    // same (|Δt|, backward-first, max view_id) pick order
    val ev = graft.ops.Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts_s"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_s").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts_s").as("v_ts"))
    val tolSec = 2L * 24 * 3600
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("purchase_id"))
      .orderBy(abs(unix_micros(col("p_ts")) - unix_micros(col("v_ts"))),
        when(col("v_ts") <= col("p_ts"), 0).otherwise(1),
        col("view_id").desc)
    val composed = p.join(v, col("user_id") === col("v_user") &&
        abs(unix_micros(col("p_ts")) - unix_micros(col("v_ts")))
          <= tolSec * 1000000L)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("user_id"),
        col("view_id").as("attributed_view_id"),
        ((unix_micros(col("p_ts")) - unix_micros(col("v_ts"))) / 1000000L)
          .cast("long").as("gap_sec"))
      .orderBy("purchase_id").collect().map(_.toSeq)
    assert(native.length == composed.length)
    assert(native.toSeq == composed.toSeq)
    // the mode must actually exercise forward picks on this data
    assert(native.exists(r => r(3).asInstanceOf[Long] < 0),
      "no forward attribution — nearest is vacuously backward here")
  }

  test("forward mode: earliest at-or-after, INCLUSIVE tolerance both ends, max tie-break") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 20L), // fwd 25 (Δ5) → rid 12
      (2L, 100L, 25L), // exact time allowed → rid 12
      (3L, 100L, 28L), // fwd 40, Δ12 > tol(10) → absent
      (4L, 100L, 38L), // fwd-time tie at 40: rids 13,14 → max 14
      (5L, 100L, 61L), // nothing at/after → absent
      (6L, 100L, 50L)) // fwd 60, Δ10 = tol INCLUSIVE → rid 15
      .toDF("lid", "k", "lt")
    val right = Seq(
      (11L, 100L, 15L),
      (12L, 100L, 25L),
      (13L, 100L, 40L),
      (14L, 100L, 40L),
      (15L, 100L, 60L))
      .toDF("rid", "rk", "rt")
    val out = AsOfJoinOps.asOf(left, right,
        col("k"), col("rk"), col("lt"), col("rt"), col("rid"),
        toleranceMicros = 10L, forward = true)
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 12L, 2L -> 12L, 4L -> 14L, 6L -> 15L),
      s"got $out")
  }

  test("forward mode on real data matches the min-by-(t_r - t_l) composed formulation") {
    val native = AsOfJoinOps.asofJoinForward(spark, dir).collect().map(_.toSeq)
    val ev = graft.ops.Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("ts_s"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts_s").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts_s").as("v_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("purchase_id"))
      .orderBy(col("v_ts").asc, col("view_id").desc)
    val composed = p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") &&
        unix_micros(col("v_ts")) - unix_micros(col("p_ts"))
          <= 2L * 24 * 3600 * 1000000L)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("user_id"),
        col("view_id").as("next_view_id"),
        ((unix_micros(col("v_ts")) - unix_micros(col("p_ts"))) / 1000000L)
          .cast("long").as("gap_sec"))
      .orderBy("purchase_id").collect().map(_.toSeq)
    assert(native.length == composed.length)
    assert(native.toSeq == composed.toSeq)
    assert(native.forall(r => r(3).asInstanceOf[Long] >= 0),
      "forward gap must be non-negative")
  }

  test("allowExactMatches=false: equal-time rows excluded in every direction, retained for later lefts") {
    import spark.implicits._
    // BACKWARD: lt=30 must skip the rt=30 row and take rt=25; a LATER
    // left at 35 must still see the rt=30 row as its backward best
    val bl = Seq((1L, 100L, 30L), (2L, 100L, 35L)).toDF("lid", "k", "lt")
    val br = Seq((10L, 100L, 25L), (11L, 100L, 30L)).toDF("rid", "rk", "rt")
    val back = AsOfJoinOps.asOf(bl, br,
        col("k"), col("rk"), col("lt"), col("rt"), col("rid"),
        toleranceMicros = 10L, allowExactMatches = false)
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back == Map(1L -> 10L, 2L -> 11L), s"got $back")

    // NEAREST: lt=30 must skip Δ0 (rt=30), see PAST the equal-time run to
    // the forward row at 33 (Δ3) and prefer it over back 25 (Δ5); the
    // popped rt=30 row must then serve lt=31 as its backward best (Δ1
    // beats fwd Δ2)
    val nl = Seq((1L, 100L, 30L), (2L, 100L, 31L)).toDF("lid", "k", "lt")
    val nr = Seq((10L, 100L, 25L), (20L, 100L, 30L), (21L, 100L, 33L))
      .toDF("rid", "rk", "rt")
    val near = AsOfJoinOps.asOf(nl, nr,
        col("k"), col("rk"), col("lt"), col("rt"), col("rid"),
        toleranceMicros = 10L, nearest = true, allowExactMatches = false)
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(near == Map(1L -> 21L, 2L -> 20L), s"got $near")

    // FORWARD: lt=30 must skip the rt=30 run (including its tie rows) and
    // match the strictly-future rt=35
    val fl = Seq((1L, 100L, 30L)).toDF("lid", "k", "lt")
    val fr = Seq((30L, 100L, 30L), (31L, 100L, 30L), (32L, 100L, 35L))
      .toDF("rid", "rk", "rt")
    val fwd = AsOfJoinOps.asOf(fl, fr,
        col("k"), col("rk"), col("lt"), col("rt"), col("rid"),
        toleranceMicros = 10L, forward = true, allowExactMatches = false)
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fwd == Map(1L -> 32L), s"got $fwd")
  }

  test("nearest + allowExactMatches=false: duplicate left timestamps both " +
    "keep the true backward candidate (r12 property-test regression)") {
    import spark.implicits._
    // two left rows at the SAME (key, time); right has a backward row at
    // t=4, an excluded equal-time row at t=6, and a forward row at t=9
    // outside tol. The pre-fix merge let the popped ==lt run replace the
    // backward buffer, so the SECOND left row lost its t=4 match and was
    // dropped; both rows must match rid=1003.
    val l = Seq((0L, 3L, 6L), (2L, 3L, 6L)).toDF("lid", "k", "lt")
    val r = Seq((1003L, 3L, 4L), (1000L, 3L, 6L), (1004L, 3L, 9L))
      .toDF("rid", "rk", "rt")
    val got = AsOfJoinOps.asOf(l, r,
        col("k"), col("rk"), col("lt"), col("rt"), col("rid"),
        toleranceMicros = 2L, nearest = true, allowExactMatches = false)
      .select(col("lid"), col("rid")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got == Map(0L -> 1003L, 2L -> 1003L), s"got $got")
    // and the stashed equal-time run still serves STRICTLY later lefts:
    // a third left row at t=7 must match the t=6 run's max-tie row
    // (|7-6| = 1 beats the forward row at |9-7| = 2)
    val l2 = Seq((0L, 3L, 6L), (2L, 3L, 6L), (5L, 3L, 7L))
      .toDF("lid", "k", "lt")
    val got2 = AsOfJoinOps.asOf(l2, r,
        col("k"), col("rk"), col("lt"), col("rt"), col("rid"),
        toleranceMicros = 2L, nearest = true, allowExactMatches = false)
      .select(col("lid"), col("rid")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(got2 == Map(0L -> 1003L, 2L -> 1003L, 5L -> 1000L), s"got $got2")
  }

  test("property: every direction × exactness × outer mode matches a naive per-row reference on random inputs") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // naive reference: for each left row scan ALL right rows — an
    // independent O(n·m) restatement of the contract the merge must match
    def reference(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)],
        tol: Long, outer: Boolean, nearest: Boolean, forward: Boolean,
        allowExact: Boolean): Set[(Long, Option[Long])] =
      left.map { case (lid, lk, lt) =>
        val cands = right.filter { case (_, rk, rt) =>
          rk == lk && {
            val dt = rt - lt
            val exactOk = allowExact || dt != 0
            val inDir =
              if (nearest) math.abs(dt) <= tol
              else if (forward) dt >= 0 && dt <= tol
              else dt <= 0 && -dt < tol
            exactOk && inDir
          }
        }
        val pick =
          if (cands.isEmpty) None
          else if (nearest) {
            // min |Δt|; tie → backward; same time → max rid
            val best = cands.minBy { case (rid, _, rt) =>
              (math.abs(rt - lt), if (rt <= lt) 0 else 1, -rid)
            }
            Some(best._1)
          } else if (forward) {
            val best = cands.minBy { case (rid, _, rt) => (rt, -rid) }
            Some(best._1)
          } else {
            val best = cands.maxBy { case (rid, _, rt) => (rt, rid) }
            Some(best._1)
          }
        (lid, pick)
      }.filter(p => outer || p._2.nonEmpty).toSet
    // small key/time domains force heavy collisions, ties, and equal-time
    // runs — exactly the states the buffered merge must get right
    val row = for {
      k <- Gen.choose(0L, 3L); t <- Gen.choose(0L, 30L)
    } yield (k, t)
    val tbl = Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, row))
    val prop = Prop.forAll(tbl, tbl, Gen.choose(1L, 12L), Gen.oneOf(0, 1, 2),
        Gen.oneOf(true, false), Gen.oneOf(true, false)) {
      (ls, rs, tol, dirMode, outer, allowExact) =>
      val near = dirMode == 1; val fwd = dirMode == 2
      val leftRows = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rightRows = rs.zipWithIndex.map { case ((k, t), i) => (1000L + i, k, t) }
      val expected = reference(leftRows, rightRows, tol, outer, near, fwd, allowExact)
      val out = AsOfJoinOps.asOf(
          leftRows.toDF("lid", "k", "lt"), rightRows.toDF("rid", "rk", "rt"),
          col("k"), col("rk"), col("lt"), col("rt"), col("rid"),
          toleranceMicros = tol, isOuter = outer, nearest = near,
          forward = fwd, allowExactMatches = allowExact)
        .select(col("lid"), col("rid")).collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      val ok = out == expected
      if (!ok) println(s"MISMATCH dir=$dirMode outer=$outer exact=$allowExact tol=$tol\n" +
        s"  left=$leftRows\n  right=$rightRows\n  got=$out\n  want=$expected")
      ok
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(80), prop)
    assert(res.passed, res.status.toString)
  }

  test("forward/nearest buffered keys survive iterator reuse for string keys (defensive copy)") {
    import spark.implicits._
    // string keys exercise the UTF8String buffer-reuse hazard (ADVICE r9):
    // many interleaved keys force the right iterator to advance while
    // bestKey/fwdKey are held across left rows
    val ks = (0 until 40).map(i => f"k$i%02d")
    val left = ks.zipWithIndex.map { case (k, i) =>
      (i.toLong, k, 100L)
    }.toDF("lid", "k", "lt")
    val right = ks.zipWithIndex.flatMap { case (k, i) =>
      Seq((1000L + i, k, 90L), (2000L + i, k, 110L))
    }.toDF("rid", "rk", "rt")
    val out = AsOfJoinOps.asOf(left, right,
        col("k"), col("rk"), col("lt"), col("rt"), col("rid"),
        toleranceMicros = 50L, nearest = true)
      .select(col("lid"), col("rid")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Δ10 both directions, backward wins ties → the 1000-block row per key
    assert(out == ks.indices.map(i => i.toLong -> (1000L + i)).toMap,
      s"got $out")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the round-6 relational/statistical operators. The DuckDB
  * oracle at sf0.01 is the primary gate; these pin the engine-side
  * algebraic claims (bloom gate changes the plan not the answer, window
  * skyline equals the definitional domination check, audit consistency)
  * inside one engine.
  */
class RelationalOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("bloom_semi_join result is row-identical to the plain semi join") {
    val bloomed = graft.ops.RelationalOps.bloomSemiJoin(spark, dir).collect()
    val fKeys = graft.ops.Tables(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val plain = graft.ops.Tables(spark, dir, "lineitem")
      .join(fKeys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("l_returnflag").collect()
    assert(bloomed.toSeq == plain.toSeq)
  }

  test("bloom_semi_join plan contains the might_contain gate") {
    val plan = graft.ops.RelationalOps.bloomSemiJoin(spark, dir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("might_contain"), "bloom gate missing from plan")
  }

  test("pareto_frontier equals the definitional domination filter") {
    val frontier = graft.ops.RelationalOps.paretoFrontier(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
    val all = graft.ops.Tables(spark, dir, "part")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    def dominates(q: (Long, Double, Int), p: (Long, Double, Int)): Boolean =
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3)
    val expected = all.filter(p => !all.exists(q => dominates(q, p))).toSet
    assert(frontier == expected)
  }

  test("unpivot_metrics emits all four measures per flag, totals preserved") {
    val rows = graft.ops.RelationalOps.unpivotMetrics(spark, dir).collect()
    val byFlag = rows.groupBy(_.getString(0))
    byFlag.foreach { case (_, rs) =>
      assert(rs.map(_.getString(1)).sorted.toSeq ==
        Seq("discount", "extendedprice", "quantity", "tax"))
    }
    // melted quantity total equals the direct aggregate
    val melted = rows.filter(_.getString(1) == "quantity").map(_.getDouble(2)).sum
    val direct = graft.ops.Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("q"))
      .collect().map(_.getDouble(1)).sum
    assert(math.abs(melted - direct) < 1e-6)
  }

  test("integrity_audit: synthetic star schema has no orphans; unreferenced counts match anti joins") {
    val rows = graft.ops.RelationalOps.integrityAudit(spark, dir).collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getLong(1) == 0L, s"orphans in ${r.getString(0)}"))
    val custUnref = rows.find(_.getString(0).startsWith("orders.o_custkey"))
      .get.getLong(2)
    val expected = graft.ops.Tables(spark, dir, "customer")
      .join(graft.ops.Tables(spark, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(custUnref == expected)
  }

  test("monthly_growth: pct_growth recomputes from consecutive revenues") {
    val rows = graft.ops.RelationalOps.monthlyGrowth(spark, dir).collect()
    assert(rows.length > 12)
    assert(rows.head.isNullAt(2)) // first month has no predecessor
    rows.sliding(2).filter(_.length == 2).foreach { w =>
      val prev = w(0); val cur = w(1)
      val expect = BigDecimal(
        (cur.getDouble(1) - prev.getDouble(1)) / prev.getDouble(1) * 100)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(cur.getDouble(2) - expect) < 1e-9,
        s"${cur.getString(0)}: ${cur.getDouble(2)} vs $expect")
    }
  }

  test("token_zipf: natural-ish corpus slopes negative with sane fit") {
    val r = graft.ops.TextOps.tokenZipf(spark, dir).collect().head
    assert(r.getLong(0) > 10)  // vocabulary floor (sf0.001 is ~30 terms)
    assert(r.getDouble(1) < 0, "zipf slope must be negative")
    assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1) // r2 in [0,1]
  }

  test("corr_matrix: all six distinct pairs once, r in [-1,1]") {
    val rows = graft.ops.AnalyticsOps.corrMatrix(spark, dir).collect()
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val expected = (for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))).toSet
    assert(pairs == expected)
    rows.foreach { r =>
      val v = r.getDouble(2)
      assert(v >= -1.0 && v <= 1.0)
    }
  }

  test("events_mad: outliers bounded and MAD non-negative") {
    val rows = graft.ops.EventOps.eventsMad(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0)            // mad
      assert(r.getLong(4) < r.getLong(1))      // outliers strictly < n
    }
  }

  test("record_linkage = unblocked brute-force resolution (banding loses no candidate)") {
    val sup = graft.ops.Tables(spark, dir, "supplier")
      .selectExpr("s_suppkey", "s_nationkey",
        "cast(round(s_acctbal * 100) as long) as cents").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val cust = graft.ops.Tables(spark, dir, "customer")
      .selectExpr("c_custkey", "c_nationkey",
        "cast(round(c_acctbal * 100) as long) as cents").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // brute force: every same-nation pair within the range, no banding
    val expected = sup.flatMap { case (sk, sn, sc) =>
      val cands = cust.filter { case (_, cn, cc) =>
        cn == sn && math.abs(sc - cc) <= 25000L }
        .map { case (ck, _, cc) =>
          val d = math.abs(sc - cc)
          val score = (if (d <= 5000L) 3.0 else if (d <= 10000L) 2.0 else 1.0) +
            (if (sk % 10 == ck % 10) 0.5 else 0.0)
          (ck, score, d)
        }.filter(_._2 >= 1.0)
      if (cands.isEmpty) None
      else {
        val best = cands.minBy { case (ck, score, d) => (-score, d, ck) }
        Some(sk -> (best._1, best._2, best._3, cands.length.toLong))
      }
    }.toMap
    val got = graft.ops.RelationalOps.recordLinkage(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected,
      s"only-stream=${(got.keySet -- expected.keySet).take(3)} " +
        s"only-ref=${(expected.keySet -- got.keySet).take(3)}")
    assert(got.nonEmpty, "fixture linked nothing — vacuous")
  }

  test("mutual_information: information-theoretic bounds hold") {
    val r = graft.ops.TextOps.mutualInformation(spark, dir).collect().head
    val (mi, hl, hs, nmi) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
    assert(hl > 0 && hs > 0, s"degenerate marginals: $hl, $hs")
    // MI >= 0 (Gibbs) and MI <= min(H) -- allow the 6-decimal rounding slack
    assert(mi >= -1e-6, s"negative MI: $mi")
    assert(mi <= math.min(hl, hs) + 1e-6, s"MI $mi exceeds min entropy")
    assert(nmi >= -1e-6 && nmi <= 1 + 1e-6, s"NMI out of [0,1]: $nmi")
  }


  test("source_divergence: JSD bounds, symmetry of the pair set, and a " +
    "brute-force recheck of one pair") {
    val rows = graft.ops.TextOps.sourceDivergence(spark, dir).collect()
    val nSources = graft.ops.Tables(spark, dir, "documents")
      .select("source").distinct().count().toInt
    assert(rows.length == nSources * (nSources - 1) / 2,
      "one row per unordered source pair")
    val ln2 = math.log(2.0)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "canonical pair order")
      val jsd = r.getDouble(2)
      assert(jsd >= -1e-6 && jsd <= ln2 + 1e-6, s"JSD out of [0, ln2]: $jsd")
      assert(math.abs(r.getDouble(3) - jsd / ln2) < 1e-3)
      assert(r.getLong(4) >= 0 && r.getLong(4) <= 200)
    }
    // brute-force the first pair from raw text with the same top-200 rule
    val docs = graft.ops.Tables(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).toLowerCase.replaceAll("\\s+", " ").trim))
    val allWords = docs.flatMap { case (_, t) => t.split(" ", -1) }
    val top = allWords.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(200).map(_._1).toSet
    def dist(src: String): Map[String, Double] = {
      val ws = docs.filter(_._1 == src)
        .flatMap(_._2.split(" ", -1)).filter(top)
      val n = ws.length.toDouble
      val raw = ws.groupBy(identity).view.mapValues(_.length / n).toMap
      top.map(w => w -> BigDecimal(raw.getOrElse(w, 0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
    }
    val first = rows.head
    val (pa, pb) = (dist(first.getString(0)), dist(first.getString(1)))
    def xlnx(x: Double) = if (x > 0) x * math.log(x) else 0.0
    val jsd = top.toSeq.map { w =>
      val (p, q) = (pa(w), pb(w))
      -xlnx((p + q) / 2) + (xlnx(p) + xlnx(q)) / 2
    }.sum
    assert(math.abs(first.getDouble(2) - jsd) < 1e-4,
      s"brute-force JSD $jsd vs ${first.getDouble(2)}")
  }

  test("bpe_encode: merges only ever shorten; compression in (0, 1]") {
    graft.ops.TextOps.bpeEncode(spark, dir).collect().foreach { r =>
      val (raw, m1, m2) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(m1 <= raw && m2 <= m1,
        s"${r.getString(0)}: lengths must be monotone $raw >= $m1 >= $m2")
      assert(m2 > 0 && r.getDouble(5) > 0 && r.getDouble(5) <= 1.0)
    }
  }

  test("seasonal_profile: complete bounded grid, counts conserved") {
    val rows = graft.ops.EventOps.seasonalProfile(spark, dir).collect()
    assert(rows.length <= 7 * 24)
    rows.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 6, s"dow ${r.getLong(0)}")
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 23, s"hod ${r.getLong(1)}")
    }
    val total = rows.map(_.getLong(2)).sum
    val expected = graft.ops.Tables(spark, dir, "events").count()
    assert(total == expected, s"grid counts $total != $expected events")
  }


  test("sparse_cosine_pairs: valid cosines, ordered pairs, known dup found") {
    val rows = graft.ops.AnalyticsOps.sparseCosinePairs(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not canonical")
      val c = r.getDouble(3)
      assert(c >= 0.5 && c <= 1.0 + 1e-9, s"cosine out of range: $c")
      assert(r.getLong(2) >= 2)
    }
    // weighted phrase cosine must recover some of the exact-jaccard dups
    val jac = graft.ops.DedupOps.dedupNgramJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cos = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((cos & jac).nonEmpty, "no overlap with jaccard near-dups")
  }

}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Accuracy bounds for the sketch aggregates (no DuckDB oracle — sketch
  * values are implementation-specific; correctness here means staying
  * inside the advertised error envelopes vs the exact answers).
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("HLL cardinality within 5% and approx median within 1% of exact") {
    val rows = graft.ops.AnalyticsOps
      .cardinalitySketches(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exactUsers = r.getLong(2).toDouble
      val approxUsers = r.getLong(3).toDouble
      assert(math.abs(approxUsers - exactUsers) / exactUsers <= 0.05,
        s"${r.getString(0)}: HLL $approxUsers vs exact $exactUsers")
      val exactMed = r.getDouble(4)
      val approxMed = r.getDouble(5)
      assert(math.abs(approxMed - exactMed) <=
        math.max(0.01 * math.abs(exactMed), 1e-6),
        s"${r.getString(0)}: approx median $approxMed vs exact $exactMed")
    }
  }

  test("cohort_retention: full retention in the signup week, never above 1") {
    val rows = graft.ops.AnalyticsOps
      .cohortRetention(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), r.toString) // n_active <= cohort_size
      assert(r.getDouble(4) <= 1.0)
      // signing up counts as activity, so offset 0 retains everyone
      if (r.getLong(1) == 0L) assert(r.getDouble(4) == 1.0, r.toString)
    }
  }

  test("brand_affinity: ranked by lift with the support floor enforced") {
    val rows = graft.ops.AnalyticsOps
      .brandAffinity(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 20)
    val lifts = rows.map(_.getDouble(3)).toSeq
    assert(lifts == lifts.sorted.reverse)
    rows.foreach { r =>
      assert(r.getLong(2) >= 20)     // support floor
      assert(r.getString(0) < r.getString(1)) // canonical pair order
      assert(r.getDouble(3) > 0)
    }
  }

  test("KMV aggregator: order-independent, bounded, duplicate-idempotent; estimator sane") {
    val agg = new graft.functions.KmvSmallest(4)
    val vals = Seq("c", "a", "f", "a", "b", "e", "d", "b")
    // sequential reduce in two different orders + a split merge agree
    val r1 = vals.foldLeft(agg.zero)(agg.reduce)
    val r2 = vals.reverse.foldLeft(agg.zero)(agg.reduce)
    val (l, r) = vals.splitAt(3)
    val r3 = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    assert(r1 == Vector("a", "b", "c", "d"))
    assert(r2 == r1 && r3 == r1)
    assert(agg.finish(r1) == "a,b,c,d")
    // estimator: within KMV error bounds of the exact distinct count
    val rows = graft.ops.AnalyticsOps
      .kmvUserSketch(spark, "/root/testdata/sf0.01")
      .withColumn("est", graft.functions.KmvSketch.kmvEstimate(
        org.apache.spark.sql.functions.col("kmv"), 8))
      .collect()
    assert(rows.nonEmpty)
    // kmvEstimate is null for groups under k distinct values (documented);
    // require at least one estimable group so the test can't pass vacuously
    val estimable = rows.filterNot(_.isNullAt(3))
    assert(estimable.nonEmpty, "no group reached k distinct users")
    estimable.foreach { row =>
      val exact = row.getLong(1).toDouble
      val est = row.getDouble(3)
      assert(est > 0.3 * exact && est < 3.0 * exact,
        s"${row.getString(0)}: est $est vs exact $exact")
    }
  }

  test("merge_upsert: action counts reconcile with the change-feed derivation") {
    val dir = "/root/testdata/sf0.01"
    val rows = graft.ops.AnalyticsOps.mergeUpsert(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val orders = graft.ops.Tables(spark, dir, "orders")
    val total = orders.count()
    val updated = orders.filter(
      org.apache.spark.sql.functions.col("o_orderkey") % 10 === 0).count()
    val inserted = orders.filter(
      org.apache.spark.sql.functions.col("o_orderkey") % 100 === 0).count()
    assert(rows("updated") == updated)
    assert(rows("inserted") == inserted)
    assert(rows("unchanged") == total - updated)
    assert(rows.values.sum == total + inserted)
  }

  test("bm25_search: multi-candidate ranking, tie-break, and top-20 cut " +
      "(crafted corpus — the sf corpus yields only 1 candidate, ADVICE r7)") {
    import java.nio.file.Files
    // 26 docs: doc 0 (the query doc by the most-pairable/min-id rule)
    // carries a 30-token run; docs 1..25 each embed the run's first 10
    // tokens (→ 6 shared 5-token shingles, tf=1 each) plus unique padding
    // of length 5 + (i mod 12) — so scores strictly decrease with padding
    // length (BM25 dl-normalization) and equal-padding docs TIE, pinning
    // the doc_id tie-break; 25 candidates exercises the top-20 cut.
    val run = (1 to 30).map(i => s"c$i").mkString(" ")
    val head10 = (1 to 10).map(i => s"c$i").mkString(" ")
    val texts = run +: (1 to 25).map { i =>
      val pad = (1 to (5 + i % 12)).map(j => s"u${i}x$j").mkString(" ")
      s"$head10 $pad"
    }
    val d = Files.createTempDirectory("graft-bm25").toString
    spark.createDataFrame(texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", "spec", t.length.toLong)
      }).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    // independent Scala BM25 with the query's exact rounding discipline
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val shingles = texts.map(_.split(" ").toSeq.sliding(5).map(_.mkString(" ")).toSeq)
    val tf = shingles.zipWithIndex.flatMap { case (ss, id) =>
      ss.groupBy(identity).map { case (s2, g) => (id.toLong, s2, g.size) } }
    val dfm = tf.groupBy(_._2).map { case (s2, g) => s2 -> g.size }
    val dl = tf.groupBy(_._1).map { case (id, g) => id -> g.map(_._3).sum.toLong }
    val nDocs = dl.size
    val avgdl = dl.values.sum.toDouble / nDocs
    val qterms = tf.filter(t => t._1 == 0L &&
      dfm(t._2) >= 2 && dfm(t._2) <= 50).map(_._2).toSet
    assert(qterms.size == 6, s"crafted corpus broke: ${qterms.size} query terms")
    val expected = tf.filter(t => t._1 != 0L && qterms(t._2))
      .groupBy(_._1).map { case (id, g) =>
        val score = r(g.map { case (_, s2, f) =>
          val idf = r(math.log(1.0 + (nDocs - dfm(s2) + 0.5) / (dfm(s2) + 0.5)), 6)
          r(idf * f * 2.2 / (f + 1.2 * (0.25 + 0.75 * dl(id) / avgdl)), 6)
        }.sum, 4)
        (id, dl(id), g.size.toLong, score)
      }.toSeq.sortBy(x => (-x._4, x._1)).take(20)
    assert(expected.size == 20 && expected.map(_._4).distinct.size < 20,
      "corpus must overflow the top-20 AND contain score ties")

    val got = graft.ops.AnalyticsOps.bm25Search(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3))).toSeq
    assert(got == expected,
      s"bm25 ranking mismatch:\n got      $got\n expected $expected")
  }

  test("pagerank_step: ranks positive, descending, and bounded by damping") {
    val rows = graft.ops.AnalyticsOps
      .pagerankStep(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length == 20)
    val ranks = rows.map(_.getDouble(1)).toSeq
    assert(ranks == ranks.sorted.reverse)
    // Σ over ALL nodes of rank¹ ≤ 0.15 + 0.85 = 1, so any single node < 1
    ranks.foreach(r => assert(r > 0 && r < 1.0, r.toString))
  }

  test("q19: OR-of-ANDs still plans as a hash join, not a nested loop") {
    val plan = graft.ops.AnalyticsOps
      .q19Disjunctive(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // Catalyst must extract the common l_partkey = p_partkey equi-condition
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(plan.contains("HashJoin"), plan.take(2000))
  }

  test("q18: every surviving order exceeds the quantity threshold") {
    val rows = graft.ops.AnalyticsOps
      .q18LargeOrders(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(5) > 250, r.toString))
    // ranked by o_totalprice descending
    val prices = rows.map(_.getDouble(4)).toSeq
    assert(prices == prices.sorted.reverse)
  }

  test("pivot: per-year priority counts sum to the year's order count") {
    val dir = "/root/testdata/sf0.01"
    val pivoted = graft.ops.AnalyticsOps.pivotPriorityYear(spark, dir)
      .collect().map(r => r.getInt(0) -> (1 to 5).map(r.getLong).sum).toMap
    val expected = graft.ops.Tables(spark, dir, "orders")
      .groupBy(org.apache.spark.sql.functions.year(
        org.apache.spark.sql.functions.col("o_orderdate")).as("y"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(pivoted == expected)
  }

  test("q6: all three predicates reach the parquet scan; projection pruned") {
    val plan = graft.ops.AnalyticsOps
      .q6ForecastRevenue(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // the scale argument for Q6 IS the pushdown — pin it
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"), plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(l_discount,0.05)"))
    assert(plan.contains("LessThan(l_quantity,24.0)"))
    assert(plan.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"))
  }

  test("kaplan_meier: estimator invariants + definitional product cross-check") {
    val rows = graft.ops.AnalyticsOps
      .kaplanMeier(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // (duration, at_risk, events, censored, survival)
    val durs = rows.map(_.getLong(0))
    assert(durs.sameElements(durs.sorted), "rows ordered by duration")
    // risk set: strictly decreasing reverse-cumulative; head == all subjects
    val atRisk = rows.map(_.getLong(1))
    // withFilter: a single-row result must degrade to a clean pass, not a
    // MatchError from the undersized trailing window (ADVICE r8)
    atRisk.sliding(2).withFilter(_.length == 2)
      .foreach { case Array(a, b) => assert(a > b) }
    val subjects = rows.map(r => r.getLong(2) + r.getLong(3)).sum
    assert(atRisk.head == subjects, "risk set at t₀ must be every subject")
    val nCust = graft.ops.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_custkey").distinct().count()
    assert(subjects == nCust, "one subject per customer")
    // survival: starts ≤ 1, non-increasing, and equals the running product
    var prod = 1.0
    rows.foreach { r =>
      val (n, d, s) = (r.getLong(1), r.getLong(2), r.getDouble(4))
      prod *= (if (d < n) 1.0 - d.toDouble / n else 0.0)
      assert(math.abs(s - prod) < 1e-6, s"S(${r.getLong(0)}) $s vs product $prod")
    }
    rows.map(_.getDouble(4)).sliding(2).withFilter(_.length == 2)
      .foreach { case Array(a, b) =>
        assert(b <= a + 1e-9, "survival must be non-increasing")
      }
    // censored subjects are exactly the customers with ONE distinct order
    // date (sf0.001's dense calendar may make this zero — the count must
    // still reconcile, and the sf0.01 oracle run exercises real censoring)
    val nSingle = graft.ops.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select(org.apache.spark.sql.functions.col("o_custkey"),
        org.apache.spark.sql.functions.col("o_orderdate").cast("date").as("d"))
      .distinct()
      .groupBy("o_custkey").count()
      .filter(org.apache.spark.sql.functions.col("count") === 1).count()
    assert(rows.map(_.getLong(3)).sum == nSingle,
      "censored must equal single-order-date customers")
  }
}

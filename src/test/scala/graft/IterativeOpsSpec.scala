package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{AnalyticsOps, SimilarityOps}

/** Algorithmic invariants of the multi-iteration drivers — properties the
  * N=2 CTE oracles cannot express (they check VALUES, not convergence
  * behavior across an arbitrary number of rounds).
  */
class IterativeOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("k-means inertia is non-increasing across rounds (Lloyd's descent)") {
    val rows = SimilarityOps.kmeansIterate(spark, dir, k = 8, rounds = 3)
      .collect().map(r => (r.getInt(0), r.getDouble(3)))
    val perRound = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    assert(perRound.keySet == Set(1, 2, 3))
    // per-round inertia is a sum of 6-rounded distances; allow that noise
    val eps = 1e-4
    assert(perRound(2) <= perRound(1) + eps,
      s"round 2 inertia ${perRound(2)} > round 1 ${perRound(1)}")
    assert(perRound(3) <= perRound(2) + eps,
      s"round 3 inertia ${perRound(3)} > round 2 ${perRound(2)}")
  }

  test("PageRank: every rank at least the teleport floor, mass bounded by 1") {
    val n = graft.ops.Tables(spark, dir, "part").count().toDouble
    val top = AnalyticsOps.pagerankIterate(spark, dir, rounds = 2)
      .collect().map(_.getDouble(1))
    assert(top.nonEmpty)
    val floor = 0.15 / n
    assert(top.forall(_ >= floor - 1e-9),
      s"rank below teleport floor $floor: ${top.min}")
    // no rank can exceed the total mass of 1 (sink nodes only LEAK mass —
    // no dangling redistribution by design)
    assert(top.forall(_ < 1.0))
  }

  test("SCD2: version chains are well-formed (one current row per key, closed priors)") {
    val rows = AnalyticsOps.scd2Customer(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(4)))
    val byKey = rows.groupBy(_._1)
    assert(byKey.nonEmpty)
    byKey.foreach { case (key, vs) =>
      // exactly one current version per key
      assert(vs.count(_._3) == 1, s"key $key: ${vs.count(_._3)} current rows")
      val versions = vs.map(_._2).sorted.toSeq
      // versions are 1..n with the HIGHEST one current, all priors closed
      assert(versions == (1 to versions.length), s"key $key: $versions")
      val current = vs.filter(_._3).head._2
      assert(current == versions.last, s"key $key: current=$current of $versions")
    }
    // the changes feed actually produced two-version chains and inserts
    assert(byKey.exists(_._2.length == 2), "no updated key has 2 versions")
    assert(byKey.keys.exists(_ < 0), "no inserted (negative-key) rows")
  }

  test("power iteration: output is unit-normalized (Σw² ≈ 1) and matches the single step's direction") {
    val w2 = SimilarityOps.powerIterate(spark, dir, rounds = 2)
      .collect().map(_.getDouble(1))
    assert(w2.length == 64)
    val norm = math.sqrt(w2.map(x => x * x).sum)
    // components are rounded to 6 before the check — tolerance accordingly
    assert(math.abs(norm - 1.0) < 1e-3, s"‖w2‖ = $norm")
    // successive iterates must not flip direction (dominant eigenvalue of
    // a covariance-like PSD operator is positive): w1·w2 > 0
    val w1 = SimilarityOps.powerIteration(spark, dir)
      .collect().map(_.getDouble(1))
    val dot = w1.zip(w2).map { case (a, b) => a * b }.sum
    assert(dot > 0, s"direction flipped between iterations: w1·w2 = $dot")
  }

  test("kmeans_converged: trace = fixed-round iterate at the observed R, descent, genuine stop") {
    val rows = SimilarityOps.kmeansConverged(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val rounds = rows.map(_._1).max
    assert(rounds >= 2, "converged on the seed round — vacuous fixture")
    assert(rounds < 15, "hit maxRounds without converging")
    // the convergence loop must retrace the oracle-verified fixed-round
    // driver exactly — same kernel, same per-round output
    val fixed = SimilarityOps.kmeansIterate(spark, dir, k = 8, rounds = rounds)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSet == fixed.toSet,
      "converged trace diverges from the fixed-round driver")
    // Lloyd's descent: total inertia non-increasing round over round
    val inertia = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rs) => rs.map(_._4).sum }
    inertia.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-6, s"inertia rose: $inertia")
      case _ =>
    }
    // the emitted stopping criterion itself (column `shift`, the max
    // |Δcentroid component| that ENDED the round): ≥ eps on every round
    // but the last — the loop genuinely had to continue — and < eps on
    // the last, which is WHY it stopped (ADVICE r11: this column was
    // previously unread by any gate; eps here matches the default 1e-2)
    val shifts = SimilarityOps.kmeansConverged(spark, dir).collect()
      .map(r => (r.getInt(0), r.getDouble(4)))
      .groupBy(_._1).map { case (it, rs) =>
        val ss = rs.map(_._2).distinct
        assert(ss.length == 1, s"round $it emitted differing shifts: ${ss.toSeq}")
        it -> ss.head
      }
    val eps = 1e-2
    shifts.foreach { case (it, sh) =>
      if (it < rounds) assert(sh >= eps, s"round $it stopped early: shift=$sh")
      else assert(sh < eps, s"last round $it did not converge: shift=$sh")
    }
  }

  test("kmeans_converged: emitted shift sequence equals an independent driver-side recount") {
    // the batch_mix_audit precedent (r12): the stopping-criterion COLUMN
    // was gate-checked against eps but its VALUES only against the
    // query's own kernel — recompute the whole per-round shift sequence
    // from scratch in pure Scala (same seeding, same 6-dp rounding
    // discipline, same (dist, cid) assignment tie-break) and require the
    // emitted trace to match round-for-round
    import org.apache.spark.sql.functions._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val emb = graft.ops.Tables(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.VectorFunctions.toDoubleArray(col("embedding")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val k = 8; val eps = 1e-2; val maxRounds = 15
    var cents: Map[Long, Array[Double]] =
      emb.filter(_._1 < k).map(t => t._1 -> t._2).toMap
    var shifts = Vector.empty[Double]
    var shift = Double.MaxValue
    var r = 0
    while (shift >= eps && r < maxRounds) {
      r += 1
      val assigned = emb.map { case (_, v) =>
        val (_, cid) = cents.toSeq.map { case (cid, cv) =>
          (r6(v.zip(cv).map(t => (t._1 - t._2) * (t._1 - t._2)).sum), cid)
        }.min
        (cid, v)
      }
      val next = assigned.groupBy(_._1).map { case (cid, rows) =>
        val dims = rows.head._2.length
        cid -> Array.tabulate(dims)(i =>
          r6(rows.map(_._2(i)).sum / rows.length))
      }
      shift = next.map { case (cid, cv) =>
        cv.zip(cents(cid)).map(t => math.abs(t._1 - t._2)).max
      }.max
      shifts :+= r6(shift)
      cents = next
    }
    val emitted = SimilarityOps.kmeansConverged(spark, dir).collect()
      .map(row => (row.getInt(0), row.getDouble(4)))
      .groupBy(_._1).view.mapValues(_.map(_._2).head).toMap
    assert(emitted.size == shifts.size,
      s"round count: emitted ${emitted.size}, recount ${shifts.size}")
    shifts.zipWithIndex.foreach { case (sh, i) =>
      assert(math.abs(emitted(i + 1) - sh) <= 1e-6,
        s"round ${i + 1}: emitted shift ${emitted(i + 1)} vs recount $sh")
    }
  }

  test("incremental_ivf: audit row is partition-layout independent and accounts every vector") {
    val row = SimilarityOps.incrementalIvf(spark, dir).collect()(0)
    val n = graft.ops.Tables(spark, dir, "embeddings").count()
    assert(row.getLong(1) == n, s"total_cnt ${row.getLong(1)} != corpus $n")
    assert(row.getLong(2) + row.getLong(3) <= row.getLong(0),
      "new+grown buckets exceed bucket count")
    // the merged checksum and drift must not depend on shuffle layout —
    // the order-independence a maintenance artifact needs to be re-runnable
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val again = SimilarityOps.incrementalIvf(spark, dir).collect()(0)
      assert(again.toSeq == row.toSeq,
        s"layout-dependent audit: ${again.toSeq} vs ${row.toSeq}")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}

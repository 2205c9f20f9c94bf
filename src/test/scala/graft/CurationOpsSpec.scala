package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CurationOps, Tables}

/** corpus_sample is value-checked by the DuckDB oracle (exact sampled set);
  * these tests pin the statistical and engineering properties the oracle
  * can't express: per-stratum rates land near nominal, and the sample is
  * deterministic across plan constructions (the retry-idempotence argument
  * for hash-based over rand()-based sampling).
  */
class CurationOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.01"

  test("per-stratum sampled fraction lands near the nominal rate") {
    val all = Tables(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val kept = CurationOps.corpusSample(spark, dir).collect()
      .map(_.getLong(0)).toSet
    def fraction(tier: String => Boolean): (Double, Int) = {
      val docs = all.filter { case (_, s) => tier(s) }
      (docs.count { case (id, _) => kept(id) }.toDouble / docs.length, docs.length)
    }
    val (evenFrac, nEven) = fraction(_.length % 2 == 0)
    val (oddFrac, nOdd) = fraction(_.length % 2 == 1)
    assert(nEven > 50 && nOdd > 50, s"strata too small: $nEven/$nOdd")
    assert(math.abs(evenFrac - 0.25) < 0.1,
      s"even-length stratum fraction $evenFrac not near 0.25 (n=$nEven)")
    assert(math.abs(oddFrac - 0.75) < 0.1,
      s"odd-length stratum fraction $oddFrac not near 0.75 (n=$nOdd)")
  }

  test("sample is deterministic across constructions (retry idempotence)") {
    val a = CurationOps.corpusSample(spark, dir).collect().map(_.getLong(0)).toSeq
    val b = CurationOps.corpusSample(spark, dir).collect().map(_.getLong(0)).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("source_overlap matches an independent driver-side set recompute") {
    import org.apache.spark.sql.functions._
    val fps = Tables(spark, dir, "documents")
      .select(col("source"),
        graft.ops.DedupOps.prefixFingerprint(col("text"), 50).as("fp"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val bySource = fps.toSeq.groupBy(_._1).map { case (s, xs) =>
      s -> xs.map(_._2).toSet }
    val sources = bySource.keys.toSeq.sorted
    val expected = (for {
      i <- sources.indices; j <- (i + 1) until sources.length
      sa = sources(i); sb = sources(j)
      shared = (bySource(sa) & bySource(sb)).size if shared > 0
    } yield {
      val jac = shared.toDouble /
        (bySource(sa).size + bySource(sb).size - shared)
      (sa, sb, shared.toLong,
        BigDecimal(jac).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }).toSet
    val got = CurationOps.sourceOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture has no cross-source overlap - vacuous")
  }

  test("ngram_novelty: first doc fully novel, novel counts partition the distinct-gram universe") {
    val rows = CurationOps.ngramNovelty(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // the lowest doc_id with any grams sees every one of them first
    val first = rows.filter(_._2 > 0).minBy(_._1)
    assert(first._3 == first._2 && first._4 == 1.0,
      s"first doc not fully novel: $first")
    rows.foreach { case (id, n, novel, frac) =>
      assert(novel <= n, s"doc $id: n_novel > n_grams")
      assert(frac >= 0.0 && frac <= 1.0)
    }
    // each distinct gram is novel in exactly one doc: Σ n_novel = |universe|
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => bc, expression => be}
    val universe = graft.ops.Tables(spark, dir, "documents")
      .select(explode(array_distinct(bc(
        graft.functions.expressions.RollingShingleHash(
          be(transform(split(graft.ops.DedupOps.normText(col("text")), " "),
            t => xxhash64(t))), 3)))).as("fp"))
      .agg(countDistinct(col("fp"))).collect()(0).getLong(0)
    assert(rows.map(_._3).sum == universe,
      "Σ n_novel must equal the corpus-wide distinct-shingle count")
  }

  test("token_budget_fill: small sources saturate, large ones cap at one level, allocations sum to the budget") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    import s.implicits._
    // avail = [100, 200, 3000, 5000], budget = 8300/2 = 4150.
    // level λ solves 100 + 200 + 2λ = 4150 → λ = 1925: the two small
    // sources give everything (frac 1.0), the two big ones cap at 1925.
    val per = Seq(("tiny", 100L), ("small", 200L), ("big", 3000L),
      ("huge", 5000L)).toDF("source", "avail")
    val got = CurationOps.waterFill(per).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toList
    assert(got == List(
      ("big", 3000L, 1925.0, 0.641667, 1925.0),
      ("huge", 5000L, 1925.0, 0.385, 1925.0),
      ("small", 200L, 200.0, 1.0, 1925.0),
      ("tiny", 100L, 100.0, 1.0, 1925.0)), got.toString)
    assert(got.map(_._3).sum == 4150.0, "allocations must exhaust the budget")
  }

  test("property: water-fill == iterative greedy simulation on random availabilities") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    import s.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val avails = Gen.choose(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 10000L)))
    val prop = Prop.forAll(avails) { as: List[Long] =>
      val per = as.zipWithIndex.map { case (a, i) => (f"s$i%02d", a) }
      // reference: the textbook iteration — smallest source first, each
      // takes min(avail, remaining / sources-left)
      val budget = as.sum / 2
      var remaining = budget.toDouble
      val sorted = per.sortBy(p => (p._2, p._1))
      val sim = scala.collection.mutable.Map[String, Double]()
      sorted.zipWithIndex.foreach { case ((src, a), i) =>
        val fair = remaining / (sorted.length - i)
        val alloc = math.min(a.toDouble, fair)
        sim(src) = alloc; remaining -= alloc
      }
      val got = CurationOps.waterFill(per.toDF("source", "avail")).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      val ok = per.forall { case (src, _) =>
        math.abs(got(src) - sim(src)) < 1e-3 // query rounds to 4 decimals
      } && math.abs(got.values.sum - budget) < 1e-2
      if (!ok) println(s"MISMATCH avails=$as got=$got sim=$sim")
      ok
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("quality_ablation reconciles with corpus_curation and partitions the corpus") {
    val dir = "/root/testdata/sf0.001"
    val rows = CurationOps.qualityAblation(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val survivors = CurationOps.corpusCuration(spark, dir).collect()
      .map(_.getLong(1)).sum
    val total = Tables(spark, dir, "documents").count()
    // the `none` row IS corpus_curation's bottom line — one number,
    // reconcilable across the two queries
    assert(rows("none")._1 == survivors,
      s"none=${rows("none")._1} vs curation survivors $survivors")
    assert(rows("any")._1 + rows("none")._1 == total,
      "any + none must partition the corpus")
    // exclusives are disjoint subsets of the joint kill
    val excl = Seq("low_quality", "repetitive", "cluster_dup")
      .map(rows(_)._2).sum
    assert(excl <= rows("any")._1, "Σ exclusives cannot exceed the joint kill")
  }

  test("domain_reweight: weights normalize, excess is floored at zero, " +
    "and up-weighting tracks excess loss") {
    val dir = "/root/testdata/sf0.001"
    val rows = CurationOps.domainReweight(spark, dir).collect()
    assert(rows.nonEmpty)
    val wSum = rows.map(_.getDouble(5)).sum
    assert(math.abs(wSum - 1.0) < 1e-3, s"Σweight = $wSum")
    val tokTotal = rows.map(_.getLong(2)).sum.toDouble
    rows.foreach { r =>
      val (src, nTokens, loss, excess, weight, epoch) =
        (r.getString(0), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getLong(6))
      assert(excess >= 0.0, src)
      assert(loss > 0.0, s"$src: neg-log-prob proxy loss must be positive")
      // weight ∝ share·exp(excess): zero-excess sources land at or below
      // their token share after normalization (Σ rw >= Σ share = 1), and
      // the epoch budget is just the weight scaled to 10M
      val share = nTokens / tokTotal
      if (excess == 0.0) assert(weight <= share + 1e-6, src)
      assert(math.abs(epoch - weight * 1e7) <= 1e7 * 5e-7 + 1.0, src)
    }
    // at least one source must carry positive excess (it is a max-vs-mean)
    assert(rows.exists(_.getDouble(4) > 0.0))
  }

  test("crossval_split: folds partition the corpus and leak counts equal " +
    "an independent crossing-pair recount") {
    val dir = "/root/testdata/sf0.001"
    val rows = CurationOps.crossvalSplit(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables(spark, dir, "documents").count()
    assert(rows.map(_._2).sum == total)
    assert(rows.map(_._1).toSet.subsetOf((0 to 4).toSet))
    // independent recount: fold each doc by the same md5 rule, count
    // crossing pairs from the pair table, charge both folds
    def foldOf(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      ("0123456789abcdef".indexOf(md.charAt(31))) % 5
    }
    val pairs = graft.ops.DedupEdges.pairs(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = new scala.collection.mutable.HashMap[Int, Long]()
      .withDefaultValue(0L)
    pairs.foreach { case (a, b) =>
      val (fa, fb) = (foldOf(a), foldOf(b))
      if (fa != fb) { expected(fa) += 1; expected(fb) += 1 }
    }
    rows.foreach { case (fold, _, _, leaks) =>
      assert(leaks == expected(fold), s"fold $fold")
    }
    // the synthetic near-dups mostly straddle folds — the audit must
    // actually find leakage, or grouped-CV advice would never trigger
    assert(rows.map(_._4).sum > 0)
  }

  test("dedup_cluster_stats: histogram covers the corpus and encodes " +
    "keep-one-per-cluster exactly") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.ops.ClusterOps.dedupClusterStats(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables(spark, dir, "documents").count()
    assert(rows.map(_._3).sum == total, "Σ n_docs must cover the corpus")
    rows.foreach { case (size, nClusters, nDocs, nDropped) =>
      assert(size >= 1 && nClusters > 0)
      assert(nDocs == size * nClusters, s"size $size mass")
      // min-id keep rule: exactly one keeper per cluster
      val expectedDropped = if (size == 1) 0L else nDocs - nClusters
      assert(nDropped == expectedDropped, s"size $size dropped")
    }
    // the synthetic corpus has near-dups by construction — both a
    // singleton tail and at least one real cluster must exist
    assert(rows.exists(_._1 == 1) && rows.exists(_._1 >= 2))
  }

  test("doc_lineage: passport rows reconcile with the artifact tables " +
    "they summarize") {
    val dir = "/root/testdata/sf0.001"
    val rows = CurationOps.docLineage(spark, dir).collect()
    val probeIds = Tables(spark, dir, "documents")
      .filter(org.apache.spark.sql.functions.col("doc_id") % 50 === 0)
      .count()
    assert(rows.length == probeIds)
    val pairs = graft.ops.DedupEdges.pairs(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cl = graft.ops.ClusterOps.dedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    rows.foreach { r =>
      val id = r.getLong(0)
      val deg = pairs.count(p => p._1 == id || p._2 == id)
      assert(r.getLong(2) == deg, s"doc $id degree")
      cl.get(id) match {
        case Some((rep, keep)) =>
          assert(!r.isNullAt(3) && r.getLong(3) == rep && r.getBoolean(4) == keep)
          assert(deg > 0, s"clustered doc $id must have a pair")
        case None =>
          assert(r.isNullAt(3) && r.getBoolean(4), s"unclustered doc $id")
      }
      assert(Set("train", "val", "test")(r.getString(5)))
      assert(r.getInt(6) >= 0 && r.getInt(6) <= 4)
    }
  }

  test("dedup_keep_best: exactly one keeper per cluster, keeper is the " +
    "longest (min-id on ties), and policy_differs is consistent") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.ops.ClusterOps.dedupKeepBest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong,
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
    rows.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.count(_._5) == 1, s"cluster $rep keeper count")
      assert(members.count(_._4) == 1, s"cluster $rep min-id keeper count")
      val keeper = members.find(_._5).get
      val best = members.maxBy(m => (m._3, -m._1))
      assert(keeper._1 == best._1, s"cluster $rep keeper not longest")
      // min-id keeper is the min doc_id (the rep itself)
      assert(members.find(_._4).get._1 == members.map(_._1).min)
    }
    rows.foreach { r => assert(r._6 == (r._4 != r._5)) }
  }

  test("tokenizer_fertility: per-lang ratios are well-formed and cover " +
    "the corpus") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.ops.TextOps.tokenizerFertility(spark, dir).collect()
    val total = Tables(spark, dir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val (lang, ws, bpe, fert, cpt) = (r.getString(0), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))
      // every whitespace word lexes to >= 1 BPE-ish token
      assert(bpe >= ws, s"$lang: $bpe < $ws")
      assert(fert >= 1.0, s"$lang fertility $fert")
      assert(cpt > 0 && cpt < 100, s"$lang chars/token $cpt")
    }
  }

  test("epoch_plan core: closed-form level equals the iterative " +
    "cap-and-redistribute reference on a skewed fixture") {
    import spark.implicits._
    // small sources are sqrt-up-weighted past their 4-epoch cap; the two
    // big ones absorb the spillover
    val fixture = Seq(("tiny_a", 100L), ("tiny_b", 100L),
      ("mid", 10000L), ("big", 40000L))
    val got = CurationOps.epochFill(fixture.toDF("source", "avail"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    // iterative reference: proportional give, cap, redistribute, repeat
    val budget = 2.0 * fixture.map(_._2).sum
    var capped = Set.empty[String]
    var alloc = Map.empty[String, Double]
    var stable = false
    while (!stable) {
      val remaining = budget - capped.toSeq
        .map(c => 4.0 * fixture.find(_._1 == c).get._2).sum
      val flats = fixture.filterNot(f => capped(f._1))
        .map(f => f._1 -> math.sqrt(f._2.toDouble)).toMap
      val t = remaining / flats.values.sum
      val newlyCapped = fixture.filterNot(f => capped(f._1))
        .filter(f => 4.0 * f._2 < t * math.sqrt(f._2.toDouble)).map(_._1)
      if (newlyCapped.isEmpty) {
        stable = true
        alloc = fixture.map(f => f._1 ->
          (if (capped(f._1)) 4.0 * f._2
           else t * math.sqrt(f._2.toDouble))).toMap
      } else capped ++= newlyCapped
    }
    fixture.foreach { case (src, avail) =>
      val (gotAlloc, gotEpochs, gotCapped) = got(src)
      assert(math.abs(gotAlloc - alloc(src)) < 0.02,
        s"$src: $gotAlloc vs reference ${alloc(src)}")
      assert(gotCapped == capped(src), s"$src capped flag")
      assert(gotEpochs <= 4.0 + 1e-6, s"$src epochs $gotEpochs")
      assert(math.abs(gotEpochs - gotAlloc / avail) < 1e-3)
    }
    assert(capped == Set("tiny_a", "tiny_b"), "fixture must bind the cap")
    assert(math.abs(got.values.map(_._1).sum - budget) < 0.1,
      "allocation must exhaust the budget")
  }

  test("property: epoch-fill closed form == iterative cap-and-redistribute " +
    "on random availabilities") {
    import org.apache.spark.sql.SparkSession
    val s: SparkSession = spark
    import s.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val avails = Gen.choose(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1L, 10000L)))
    val prop = Prop.forAll(avails) { as: List[Long] =>
      val per = as.zipWithIndex.map { case (a, i) => (f"s$i%02d", a) }
      val budget = 2.0 * as.sum
      // iterative reference: proportional give by sqrt weight, cap at
      // 4 epochs, redistribute, repeat to fixpoint
      var capped = Set.empty[String]
      var alloc = Map.empty[String, Double]
      var stable = false
      while (!stable) {
        val remaining = budget -
          capped.toSeq.map(c => 4.0 * per.find(_._1 == c).get._2).sum
        val flats = per.filterNot(p => capped(p._1))
          .map(p => p._1 -> math.sqrt(p._2.toDouble)).toMap
        val t = remaining / flats.values.sum
        val newly = per.filterNot(p => capped(p._1))
          .filter(p => 4.0 * p._2 < t * math.sqrt(p._2.toDouble)).map(_._1)
        if (newly.isEmpty) {
          stable = true
          alloc = per.map(p => p._1 -> (if (capped(p._1)) 4.0 * p._2
            else t * math.sqrt(p._2.toDouble))).toMap
        } else capped ++= newly
      }
      val got = CurationOps.epochFill(per.toDF("source", "avail")).collect()
        .map(r => r.getString(0) -> (r.getDouble(3), r.getBoolean(5))).toMap
      val ok = per.forall { case (src, _) =>
        math.abs(got(src)._1 - alloc(src)) < 0.05 &&
          got(src)._2 == capped(src)
      } && math.abs(got.values.map(_._1).sum - budget) < 0.1
      if (!ok) println(s"MISMATCH avails=$as got=$got " +
        s"ref=$alloc capped=$capped")
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("batch_mix_audit: batches partition the corpus, entropy is bounded " +
    "by ln(n_sources), and mix_ratio compares against the corpus marginal") {
    val dir = "/root/testdata/sf0.001"
    val rows = CurationOps.batchMixAudit(spark, dir).collect()
    val total = Tables(spark, dir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total, "batches must partition")
    assert(rows.length <= 16)
    rows.foreach { r =>
      val (batch, nSources, h, maxShare, ratio) =
        (r.getInt(0), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))
      assert(batch >= 0 && batch <= 15)
      assert(h >= -1e-6 && h <= math.log(nSources.toDouble) + 1e-6,
        s"batch $batch: H=$h exceeds ln($nSources)")
      assert(maxShare > 0 && maxShare <= 1.0)
      // a hash-dealt batch can slightly exceed the corpus marginal
      // entropy (fewer singleton sources), but not wildly
      assert(ratio > 0 && ratio < 1.5, s"batch $batch ratio $ratio")
    }
    // driver-side entropy recount: fold every doc by the same md5 rule
    // and recompute each batch's source entropy from scratch
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def batchOf(id: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((id.toString + ":20260812").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      "0123456789abcdef".indexOf(md.charAt(0))
    }
    val expected = docs.groupBy(d => batchOf(d._1)).map { case (b, ds) =>
      val n = ds.length.toDouble
      val h = ds.groupBy(_._2).values
        .map(g => { val p = g.length / n; -p * math.log(p) }).sum
      b -> BigDecimal(h).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    rows.foreach { r =>
      val (batch, h) = (r.getInt(0), r.getDouble(3))
      assert(math.abs(h - expected(batch)) < 1e-5,
        s"batch $batch entropy $h vs recount ${expected(batch)}")
    }
  }

  test("data_card: volumes reconcile with the corpus and the lang profile " +
    "is internally consistent") {
    val dir = "/root/testdata/sf0.001"
    val rows = CurationOps.dataCard(spark, dir).collect()
    val docs = Tables(spark, dir, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count(),
      "Σ n_docs must cover the corpus")
    val langBySource = docs.groupBy("source")
      .agg(org.apache.spark.sql.functions.countDistinct("lang").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (src, nDocs, nLangs, share) =
        (r.getString(0), r.getLong(1), r.getLong(4), r.getDouble(6))
      assert(nLangs == langBySource(src))
      // dominant-language share is bounded by [1/n_langs, 1]
      assert(share <= 1.0 && share >= 1.0 / nLangs.toDouble - 1e-4, src)
      Seq(7, 8, 9).foreach { i =>
        val pct = r.getDouble(i)
        assert(pct >= 0.0 && pct <= 1.0, s"$src col $i")
      }
      assert(nDocs > 0)
    }
  }

  test("grouped_crossval: leaks provably zero, totals reconcile with the per-doc split, clusters never straddle") {
    val grouped = graft.ops.CurationOps.groupedCrossval(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(grouped.map(_._1).toSet == Set(0, 1, 2, 3, 4))
    // the POINT: group-aware folding zeroes the leak the per-doc split
    // measures — and the count is computed, not assumed
    grouped.foreach { case (f, _, _, _, leaks) =>
      assert(leaks == 0L, s"fold $f leaks $leaks near-dup pairs")
    }
    val perDoc = graft.ops.CurationOps.crossvalSplit(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // same corpus, different fold rule: doc and token totals must agree,
    // and the per-doc split genuinely leaks on this corpus (else the
    // grouped variant proves nothing here)
    assert(grouped.map(_._2).sum == perDoc.map(_._1).sum)
    assert(grouped.map(_._4).sum == perDoc.map(_._2).sum)
    assert(perDoc.map(_._3).sum > 0,
      "per-doc split shows no leak at this SF — grouped test is vacuous")
    // (cluster-never-straddles follows from leaks == 0: every near-dup
    // edge is same-fold and edges connect each component, so all members
    // share the representative's fold)
  }

  test("ingest_delta_card: eras partition every source, shares sum to 1 on both eras, shifts definitional") {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val rows = CurationOps.ingestDeltaCard(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7),
        r.getDouble(8), r.getDouble(9), r.getDouble(10)))
    assert(rows.nonEmpty)
    // era doc counts partition each source's documents
    val perSource = Tables(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n"),
        org.apache.spark.sql.functions
          .count(org.apache.spark.sql.functions
            .when(pmod(col("doc_id"), lit(10)) === 9, 1)).as("nd"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    rows.foreach { case (src, bd, dd, _, _, _, _, _, _, _, _) =>
      val (n, nd) = perSource(src)
      assert(bd + dd == n, s"$src: eras do not partition the source")
      assert(dd == nd, s"$src: delta era count mismatch")
    }
    // token shares sum to ~1 on both the base and the union basis
    // (raw ratios rounded at 6 — allow n_sources ulps of rounding)
    val eps = 1e-5
    assert(math.abs(rows.map(_._9).sum - 1.0) < eps, "base shares != 1")
    assert(math.abs(rows.map(_._10).sum - 1.0) < eps, "union shares != 1")
    // lowq counts recomputed independently from the flag frame the card
    // consumes, so the rates AND the shift are pinned definitionally
    // (a sign flip or era swap cannot pass — r15 s2 review #4)
    val lowq = graft.ops.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
      .join(graft.ops.TextOps.textQuality(spark, dir)
        .select(col("doc_id"),
          org.apache.spark.sql.functions.col("low_quality")), "doc_id")
      .collect()
      .map(r => (r.getString(1), r.getLong(0) % 10 == 9, r.getBoolean(2)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // shifts are the (raw-ratio) differences, rounded once
    rows.foreach { case (src, bd, dd, bt, dt, bq, dq, qs, _, _, _) =>
      val tb = rows.map(_._4).sum; val tu = rows.map(r => r._4 + r._5).sum
      val expectShift = r6((bt + dt).toDouble / math.max(tu, 1L)
        - bt.toDouble / math.max(tb, 1L))
      assert(math.abs(rows.find(_._1 == src).get._11 - expectShift) < 1e-9,
        s"$src share_shift")
      val baseLowq = lowq.count(t => t._1 == src && !t._2 && t._3)
      val deltaLowq = lowq.count(t => t._1 == src && t._2 && t._3)
      val baseRate = baseLowq.toDouble / math.max(bd, 1L)
      val deltaRate = deltaLowq.toDouble / math.max(dd, 1L)
      assert(math.abs(bq - r6(baseRate)) < 1e-9, s"$src base_lowq_rate")
      assert(math.abs(dq - r6(deltaRate)) < 1e-9, s"$src delta_lowq_rate")
      assert(math.abs(qs - r6(deltaRate - baseRate)) < 1e-9,
        s"$src quality_shift")
    }
  }

  test("curation_funnel: five fixed stages, monotone attrition, stage 0 is the corpus, retention definitional") {
    val rows = CurationOps.curationFunnel(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((0, "all"), (1, "lang_en"), (2, "quality"),
        (3, "nonrepetitive"), (4, "dedup")))
    // stage 0 is the raw corpus; stage 1 is the plain lang filter
    val docs = Tables(spark, dir, "documents")
    assert(rows(0)._3 == docs.count())
    assert(rows(1)._3 == docs
      .filter(org.apache.spark.sql.functions.col("lang") === "en").count())
    // cumulative stages can only shed documents and tokens
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3, s"stage ${b._2} gained docs")
      assert(b._4 <= a._4, s"stage ${b._2} gained tokens")
    }
    assert(rows.last._3 > 0, "terminal stage empty — funnel test vacuous")
    // retention is definitional against stage 0
    val (d0, t0) = (rows(0)._3, rows(0)._4)
    rows.foreach { case (_, stage, n, t, dr, tr) =>
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(dr - r6(n.toDouble / math.max(d0, 1L))) < 1e-9,
        s"$stage doc_retention")
      assert(math.abs(tr - r6(t.toDouble / math.max(t0, 1L))) < 1e-9,
        s"$stage token_retention")
    }
  }

  test("dsir_weights: per-doc log-ratio equals an independent pure-Scala " +
      "recompute of the full estimate-and-score chain") {
    import org.apache.spark.sql.functions.col
    val b = CurationOps.DsirBuckets
    def bucket(w: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % b
    }
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.replaceAll("\\s+", " ").trim))
    // doc -> bucket bag; the two smoothed distributions; per-doc score
    val docBuckets: Map[Long, Map[Long, Long]] = docs.map { case (id, _, t) =>
      id -> t.split(" ").toSeq.groupBy(bucket).map { case (k, v) => k -> v.size.toLong }
    }.toMap
    val langOf = docs.map(d => d._1 -> d._2).toMap
    def mass(p: Long => Boolean): Map[Long, Long] =
      docBuckets.filter { case (id, _) => p(id) }.values
        .flatten.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val raw = mass(_ => true)
    val tgt = mass(id => langOf(id) == CurationOps.DsirTargetLang)
    val (traw, ttgt) = (raw.values.sum.toDouble, tgt.values.sum.toDouble)
    def lrOf(k: Long): Double =
      math.log((tgt.getOrElse(k, 0L) + 1.0) / (ttgt + b)) -
        math.log((raw.getOrElse(k, 0L) + 1.0) / (traw + b))
    val got = CurationOps.dsirWeights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.length == docs.length)
    got.foreach { case (id, lang, nToks, logratio, selected) =>
      assert(lang == langOf(id))
      val bag = docBuckets(id)
      assert(nToks == bag.values.sum, s"doc $id token count")
      val mine = bag.map { case (k, c) => c * lrOf(k) }.sum
      // the op rounds to 4; the recompute's raw sum must sit within the
      // rounding half-width of the reported value (float-order slack)
      assert(math.abs(mine - logratio) <= 5.1e-5,
        s"doc $id: recomputed $mine vs reported $logratio")
      assert(selected == (logratio > 0), s"doc $id selected flag")
    }
    // the direction DSIR promises: the target-language slice scores
    // higher on average than the rest (it IS the target sample)
    val (en, rest) = got.partition(_._2 == CurationOps.DsirTargetLang)
    val enMean = en.map(_._4).sum / en.length
    val restMean = rest.map(_._4).sum / rest.length
    assert(en.nonEmpty && rest.nonEmpty)
    assert(enMean > restMean,
      s"target slice should score higher: en=$enMean rest=$restMean")
  }

  test("gopher_rules: measured stats match a driver-side recount, flags " +
      "are definitional, the stop-rule degeneracy is the documented one") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.replaceAll("\\s+", " ").trim))
      .toMap
    val got = graft.ops.TextOps.gopherRules(spark, dir).collect()
    assert(got.length == docs.size)
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    var anyStopHit = false
    got.foreach { r =>
      val id = r.getLong(0)
      val words = docs(id).split(" ").toSeq
      val nWords = r.getInt(1)
      assert(nWords == words.length, s"doc $id n_words")
      assert(r.getDouble(2) == r4(words.map(_.length).sum.toDouble / words.length),
        s"doc $id mean_word_len")
      val alphaWords = words.count(_.exists(c => c >= 'a' && c <= 'z'))
      assert(r.getDouble(4) == r4(alphaWords.toDouble / words.length),
        s"doc $id alpha_word_frac")
      val stopHits = graft.ops.TextOps.GopherStopWords
        .count(w => words.contains(w))
      assert(r.getInt(5) == stopHits, s"doc $id stop_hits")
      if (stopHits > 0) anyStopHit = true
      // every flag definitional against its measured column
      assert(r.getBoolean(6) == (nWords >= 50 && nWords <= 100000))
      assert(r.getBoolean(7) == (r.getDouble(2) >= 3.0 && r.getDouble(2) <= 10.0))
      assert(r.getBoolean(8) == (r.getDouble(3) <= 0.1))
      assert(r.getBoolean(9) == (r.getDouble(4) >= 0.8))
      assert(r.getBoolean(10) ==
        (stopHits >= graft.ops.TextOps.GopherMinStopHits))
      val flags = (6 to 10).map(r.getBoolean)
      assert(r.getInt(11) == flags.count(!_), s"doc $id n_rules_failed")
      assert(r.getBoolean(12) == flags.forall(identity), s"doc $id keep")
    }
    // the scaladoc's documented corpus fact: the stopword REGEX works
    // (some doc contains "the") but the >= 2 rule never fires here — if
    // the fixture vocabulary ever gains a second listed stopword this
    // reminds us the keep column stops being vacuous
    assert(anyStopHit, "no stopword hit at all — the \\b regex is broken")
    assert(got.forall(!_.getBoolean(12)),
      "keep fired — update the scaladoc note about the synthetic corpus")
  }

  test("dsir_resample: the Gumbel-top-k draw equals a driver-side recompute " +
      "from the weights table, and resampling tilts toward high weights") {
    val k = CurationOps.DsirSampleK
    def h(id: Long): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16).toDouble
    }
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val wts = CurationOps.dsirWeights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    val expected = wts.map { case (id, w) =>
      (id, r4(w - math.log(-math.log((h(id) + 0.5) / 1152921504606846976.0))))
    }.sortBy { case (id, key) => (-key, id) }.take(k).map(_._1).toSeq
    val got = CurationOps.dsirResample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.length == k)
    assert(got.map(_._1).toSeq == expected, "resampled set or order differs")
    // E[w | resampled] > E[w]: the draw is importance-TILTED, not uniform
    val selMean = got.map(_._2).sum / got.length
    val allMean = wts.map(_._2).sum / wts.length
    assert(selMean > allMean,
      s"resample not tilted toward high weights: sel=$selMean all=$allMean")
  }

  test("ssl_prototypes: prototypicality, rank, and prune flags equal an " +
      "independent driver-side recompute over normalized embeddings") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val raw = Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", "label", "cast(embedding as array<double>) as v")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val normed = raw.map { case (id, l, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, l, v.map(_ / n))
    }
    val centroids: Map[Int, Array[Double]] = normed.groupBy(_._2).map {
      case (l, vs) =>
        val d = vs.head._3.length
        l -> Array.tabulate(d)(i => r6(vs.map(_._3(i)).sum / vs.length))
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dotAb = a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
      val na = math.sqrt(a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * a(i)))
      val nb = math.sqrt(b.indices.foldLeft(0.0)((acc, i) => acc + b(i) * b(i)))
      dotAb / (na * nb)
    }
    val protos = normed.map { case (id, l, v) => (id, l, r6(cos(v, centroids(l)))) }
    val expected: Map[Long, (Int, Double, Double, Boolean)] =
      protos.groupBy(_._2).iterator.flatMap { case (_, vs) =>
        val ordered = vs.sortBy { case (id, _, p) => (p, id) }
        ordered.zipWithIndex.map { case ((id, l, p), i) =>
          val pr = r6(if (ordered.length == 1) 0.0
            else i.toDouble / (ordered.length - 1))
          id -> ((l, p, pr,
            pr >= graft.ops.SimilarityOps.ProtoPruneRank))
        }
      }.toMap
    val got = graft.ops.SimilarityOps.sslPrototypes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(got.length == expected.size)
    got.foreach { case (id, l, p, pr, pruned) =>
      val (el, ep, epr, epruned) = expected(id)
      assert(l == el, s"vec $id label")
      // proto is rounded at 6 on a float whose accumulation order differs;
      // allow the rounding half-width
      assert(math.abs(p - ep) <= 1.1e-6, s"vec $id proto $p vs $ep")
      if (p == ep) {
        assert(pr == epr, s"vec $id pr")
        assert(pruned == epruned, s"vec $id pruned")
      }
    }
    // each label prunes roughly its top quarter (exact count depends on
    // rank ties at the boundary, which vec_id breaks — so exact here)
    val byLabel = got.groupBy(_._2)
    byLabel.foreach { case (l, vs) =>
      val n = vs.length
      val pruned = vs.count(_._5)
      val expectedPruned = vs.count { v =>
        expected(v._1)._3 >= graft.ops.SimilarityOps.ProtoPruneRank }
      assert(pruned == expectedPruned, s"label $l pruned count")
      assert(pruned > 0 && pruned < n, s"label $l prune fraction degenerate")
    }
  }

  test("contamination_semantic: reported max never exceeds the exact " +
      "brute-force max, attains it for most evals, flags definitional") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = Tables(spark, dir, "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        r.getLong(0) -> v.map(_ / n)
      }.toMap
    val evals = vecs.keys.filter(_ % 10 == 7).toSeq.sorted
    val train = vecs.keys.filterNot(_ % 10 == 7).toSeq
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val exactMax: Map[Long, Double] = evals.map { e =>
      e -> train.map(t => dot(vecs(e), vecs(t))).max
    }.toMap
    val got = graft.ops.SimilarityOps.contaminationSemantic(spark, dir)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        r.getBoolean(3)))
    assert(got.map(_._1).toSeq == evals, "one row per eval id, ordered")
    var attained = 0
    got.foreach { case (id, cosOpt, contaminated) =>
      cosOpt match {
        case Some(c) =>
          assert(c <= r6(exactMax(id)) + 1e-9,
            s"eval $id reports $c above the exact max ${exactMax(id)}")
          if (math.abs(c - r6(exactMax(id))) <= 1.1e-6) attained += 1
          assert(contaminated ==
            (c >= graft.ops.SimilarityOps.SemDedupCos), s"eval $id flag")
        case None =>
          assert(!contaminated, s"eval $id contaminated without a match")
      }
    }
    // the 4x20 OR-construction's measured recall bound (the knn_join pin)
    assert(attained >= (evals.size * 0.8).toInt,
      s"top-1 attained the exact max for only $attained/${evals.size}")
  }

  test("soft_dedup: weights definitional, clusters share sizes, expected " +
      "cluster mass is one member, corpus partition reconciles") {
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val labels = graft.ops.DedupEdges.clusterLabels(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusterSize = labels.values.groupBy(identity).map {
      case (c, xs) => c -> xs.size.toLong }
    val got = CurationOps.softDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getDouble(4),
        r.getDouble(5)))
    val corpus = Tables(spark, dir, "documents").count()
    assert(got.length == corpus, "one row per corpus doc")
    got.foreach { case (id, ws, n, w, eff) =>
      val expectedN = labels.get(id).map(clusterSize).getOrElse(1L)
      assert(n == expectedN, s"doc $id n_members")
      assert(w == r6(1.0 / n), s"doc $id weight")
      assert(eff == r4(ws * w), s"doc $id eff_tokens")
    }
    // a cluster's total sampling weight is 1 (up to the 1e-6 rounding on
    // each of its n members), so its EXPECTED doc mass is one member
    got.groupBy(r => labels.get(r._1)).foreach {
      case (Some(c), members) =>
        assert(math.abs(members.map(_._4).sum - 1.0) <=
          members.length * 1e-6, s"cluster $c weight mass")
      case (None, singles) =>
        singles.foreach { m => assert(m._4 == 1.0, s"doc ${m._1} weight 1") }
    }
  }

  test("dsir_drift: era masses match a driver recount, additivity and " +
      "shift definitional against recomputed log-ratios") {
    val b = CurationOps.DsirBuckets
    def bucket(w: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 15), 16) % b
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.replaceAll("\\s+", " ").trim))
    case class M(var rb: Long = 0, var rd: Long = 0, var tb: Long = 0,
      var td: Long = 0)
    val m = scala.collection.mutable.Map.empty[Long, M]
    docs.foreach { case (id, lang, t) =>
      val delta = id % 10 == 9
      val tgt = lang == CurationOps.DsirTargetLang
      t.split(" ").foreach { w =>
        val e = m.getOrElseUpdate(bucket(w), M())
        if (delta) { e.rd += 1; if (tgt) e.td += 1 }
        else { e.rb += 1; if (tgt) e.tb += 1 }
      }
    }
    val (trb, trd) = (m.values.map(_.rb).sum.toDouble, m.values.map(_.rd).sum.toDouble)
    val (ttb, ttd) = (m.values.map(_.tb).sum.toDouble, m.values.map(_.td).sum.toDouble)
    def lr(tgt: Double, tgtTot: Double, raw: Double, rawTot: Double) =
      math.log((tgt + 1.0) / (tgtTot + b)) - math.log((raw + 1.0) / (rawTot + b))
    val got = CurationOps.dsirDrift(spark, dir).collect()
    assert(got.length == m.size, "one row per occupied bucket")
    got.foreach { r =>
      val e = m(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
        ((e.rb, e.rd, e.tb, e.td)), s"bucket ${r.getLong(0)} masses")
      val lb = lr(e.tb, ttb, e.rb, trb)
      val lf = lr(e.tb + e.td, ttb + ttd, e.rb + e.rd, trb + trd)
      assert(math.abs(r.getDouble(5) - lb) <= 1.1e-6, "logratio_base")
      assert(math.abs(r.getDouble(6) - lf) <= 1.1e-6, "logratio_full")
      assert(r.getDouble(7) ==
        r6(math.abs(r.getDouble(6) - r.getDouble(5))), "lr_shift")
    }
  }

  test("filter_agreement: cells partition the corpus and every marginal " +
      "reconciles with its source verdict") {
    val got = CurationOps.filterAgreement(spark, dir).collect()
      .map(r => ((r.getBoolean(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3)), r.getLong(4), r.getLong(5), r.getLong(6)))
    val corpus = Tables(spark, dir, "documents").count()
    assert(got.map(_._2).sum == corpus, "cells partition the corpus")
    // ppm shares: floor division loses < 1 ppm per cell
    assert(math.abs(got.map(_._4).sum - 1000000L) <= got.length,
      "share_ppm does not sum to ~1e6")
    val ruleFail = graft.ops.TextOps.gopherRules(spark, dir)
      .filter(!org.apache.spark.sql.functions.col("r_word_count")).count()
    assert(got.filter(_._1._1).map(_._2).sum == ruleFail, "rule_fail marginal")
    val dropped = graft.ops.DedupEdges.clusterLabels(spark, dir)
      .filter(!org.apache.spark.sql.functions.col("keep")).count()
    assert(got.filter(_._1._2).map(_._2).sum == dropped, "dedup_drop marginal")
    val selected = CurationOps.dsirWeights(spark, dir)
      .filter(org.apache.spark.sql.functions.col("selected")).count()
    assert(got.filter(_._1._3).map(_._2).sum == selected, "selected marginal")
    val pplTail = CurationOps.perplexityFilter(spark, dir)
      .filter(org.apache.spark.sql.functions.col("ppl_bucket") === "tail")
      .count()
    assert(got.filter(_._1._4).map(_._2).sum == pplTail, "ppl_tail marginal")
    import org.apache.spark.sql.functions.{col, sum => fsum}
    val totalTok = graft.ops.TextOps.tokenCount(spark, dir)
      .agg(fsum(col("ws_tokens"))).collect()(0).getLong(0)
    assert(got.map(_._3).sum == totalTok, "token mass reconciles")
    assert(got.count(_._2 > 0) >= 6, "agreement table degenerate")
  }

  test("perplexity_filter: one doc's log_ppl recounted from scratch, " +
      "tertiles ordered and exhaustive") {
    import org.apache.spark.sql.functions.col
    def md5Long(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    val b = CurationOps.DsirBuckets
    def norm(t: String): Array[String] =
      t.toLowerCase.replaceAll("\\s+", " ").trim
        .split(" ").filter(_.nonEmpty)
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // the model from scratch: bigram bucket counts over the en slice
    val c2 = scala.collection.mutable.Map.empty[(Long, Long), Long]
    docs.filter(_._2 == CurationOps.DsirTargetLang).foreach { case (_, _, t) =>
      val bs = norm(t).map(w => md5Long(w) % b)
      bs.zip(bs.drop(1)).foreach(p => c2(p) = c2.getOrElse(p, 0L) + 1)
    }
    val c1 = c2.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    def score(t: String): Option[(Long, Double)] = {
      val bs = norm(t).map(w => md5Long(w) % b)
      val lps = bs.zip(bs.drop(1)).map { case (u, v) =>
        math.log(c2.getOrElse((u, v), 0L) + 1.0) -
          math.log(c1.getOrElse(u, 0L) + b.toDouble)
      }
      if (lps.isEmpty) None else Some((lps.length.toLong, -lps.sum / lps.length))
    }
    val got = CurationOps.perplexityFilter(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    // every scorable doc present, none else; spot-recount ALL scores
    val scorable = docs.flatMap { case (id, lang, t) =>
      score(t).map(s => (id, lang, s))
    }
    assert(scorable.length == got.size, "scored doc set differs")
    scorable.foreach { case (id, lang, (n, lp)) =>
      val (gl, gn, glp, _) = got(id)
      assert(gl == lang && gn == n, s"doc $id lang/n_bigrams")
      assert(math.abs(glp - lp) <= 1.01e-4, s"doc $id log_ppl $glp vs $lp")
    }
    // tertile semantics: all three present, value-ordered head<=middle<=tail,
    // equidepth within one cutpoint-tie of n/3
    val byB = got.values.groupBy(_._4).view.mapValues(_.map(_._3)).toMap
    assert(byB.keySet == Set("head", "middle", "tail"), s"buckets ${byB.keySet}")
    assert(byB("head").max <= byB("middle").min &&
      byB("middle").max <= byB("tail").min, "tertiles not value-ordered")
    val n = got.size
    byB.foreach { case (k, vs) =>
      assert(math.abs(vs.size - n / 3.0) <= n * 0.15 + 2,
        s"$k size ${vs.size} far from n/3 of $n")
    }
  }

  test("pack_sequences: per-shard sequential replay matches, no row " +
      "overfills, token mass conserved") {
    def md5hex(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    import org.apache.spark.sql.functions.col
    val L = CurationOps.PackContextLen.toLong
    val lens = graft.ops.TextOps.tokenCount(spark, dir)
      .select(col("doc_id"), col("ws_tokens").cast("long").as("len"))
      .filter(col("len") > 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    // pure-Scala replay: md5-sharded, md5-ordered, prefix-sum greedy with
    // truncate-at-boundary — the definition, written sequentially
    val expected = lens
      .map { case (id, len) =>
        val h = md5hex(id)
        (java.lang.Long.parseLong(h.substring(0, 15), 16) %
          CurationOps.PackShards, h, id, len)
      }
      .groupBy(_._1).iterator.flatMap { case (shard, ds) =>
        var off = 0L
        ds.sortBy(d => (d._2, d._3)).map { case (_, _, id, len) =>
          val capped = math.min(len, L)
          val bin = off / L
          val kept = math.min(capped, L - off % L)
          off += capped
          (shard, bin, kept, len - kept)
        }
      }.toSeq
      .groupBy(t => (t._1, t._2)).map { case ((shard, bin), rows) =>
        (shard, bin, rows.length.toLong, rows.map(_._3).sum,
          rows.map(_._4).sum)
      }.toSet
    val got = CurationOps.packSequences(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5)))
    assert(got.toSet == expected, "packing differs from sequential replay")
    val full = CurationOps.packSequences(spark, dir).collect()
    full.foreach { r =>
      assert(r.getLong(3) <= L, s"row overfilled: $r")
      // exact integer ppm — definitional floor division, no rounding
      // half-width slack (the r16 red-row class is gone by construction)
      assert(r.getLong(4) == r.getLong(3) * 1000000L / L,
        "fill_ppm not definitional")
    }
    // kept + truncated == original token mass (nothing lost untracked)
    assert(full.map(r => r.getLong(3) + r.getLong(5)).sum ==
      lens.map(_._2).sum, "token mass not conserved")
    // packing actually packs: average fill of non-final rows is high
    val maxBin = full.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).max).toMap
    val interior = full.filter(r => r.getLong(1) < maxBin(r.getLong(0)))
    assert(interior.nonEmpty &&
      interior.map(_.getLong(3)).sum.toDouble / (interior.length * L) > 0.7,
      "interior rows poorly filled — packing degenerate")
  }

  test("pack_length_batches: replay matches, full batches hold exactly " +
      "floor(L/len) docs, truncation strictly the over-length cap") {
    import org.apache.spark.sql.functions.col
    def md5hex(id: Long): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val L = CurationOps.PackContextLen.toLong
    val lens = graft.ops.TextOps.tokenCount(spark, dir)
      .select(col("doc_id"), col("ws_tokens").cast("long").as("len"))
      .filter(col("len") > 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val expected = lens
      .map { case (id, len) =>
        val h = md5hex(id)
        (math.min(len, L),
          java.lang.Long.parseLong(h.substring(0, 15), 16) %
            CurationOps.PackShards, h, id, len)
      }
      .groupBy(t => (t._1, t._2)).iterator.flatMap { case ((cls, sh), ds) =>
        val k = L / cls
        ds.sortBy(d => (d._3, d._4)).zipWithIndex.map {
          case ((_, _, _, _, len), i) => (cls, sh, i / k, len)
        }
      }.toSeq
      .groupBy(t => (t._1, t._2, t._3)).map { case ((cls, sh, b), rows) =>
        (cls, sh, b, rows.length.toLong, rows.length * cls,
          rows.map(_._4 - cls).sum)
      }.toSet
    val got = CurationOps.packLengthBatches(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(6)))
    assert(got.toSet == expected, "batches differ from the length replay")
    // full batches: exactly floor(L/len) docs, fill ≤ L, and NO padding
    // (same-length by construction — fill_tokens = n·len exactly)
    val byGroup = got.groupBy(t => (t._1, t._2))
    byGroup.foreach { case ((cls, sh), bs) =>
      val k = L / cls
      val maxB = bs.map(_._3).max
      bs.foreach { case (_, _, b, n, fill, _) =>
        assert(fill == n * cls, s"class $cls/$sh batch $b padded?")
        assert(fill <= L, s"class $cls/$sh batch $b overfilled")
        if (b < maxB) assert(n == k, s"class $cls/$sh interior batch not full")
      }
    }
    // the trade vs greedy concat: length batching never truncates at a
    // boundary, so its total truncation (over-length cap only) is ≤
    // pack_sequences' (cap + boundary)
    val greedyTrunc = CurationOps.packSequences(spark, dir).collect()
      .map(_.getLong(5)).sum
    assert(got.map(_._6).sum <= greedyTrunc,
      "length batching truncated more than greedy concat")
  }

  test("pack_efficiency_compare: each strategy row reduces its packer's " +
      "own output exactly, and the documented trade holds") {
    val L = CurationOps.PackContextLen.toLong
    def reduceOf(rows: Array[org.apache.spark.sql.Row], nDocsIdx: Int,
        fillIdx: Int, truncIdx: Int): (Long, Long, Long, Long) =
      (rows.length.toLong, rows.map(_.getLong(nDocsIdx)).sum,
        rows.map(_.getLong(fillIdx)).sum, rows.map(_.getLong(truncIdx)).sum)
    val greedy = reduceOf(
      CurationOps.packSequences(spark, dir).collect(), 2, 3, 5)
    val length = reduceOf(
      CurationOps.packLengthBatches(spark, dir).collect(), 3, 4, 6)
    val got = CurationOps.packEfficiencyCompare(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet == Set("greedy_concat", "length_batches"))
    for ((name, (nr, nd, ft, tt)) <- Seq("greedy_concat" -> greedy,
        "length_batches" -> length)) {
      val (gnr, gnd, gft, gtt, gfp, gtp) = got(name)
      assert((gnr, gnd, gft, gtt) == (nr, nd, ft, tt), s"$name reduction")
      assert(gfp == ft * 1000000L / (nr * L), s"$name fill_ppm definitional")
      assert(gtp == tt * 1000000L / (ft + tt), s"$name trunc_ppm definitional")
    }
    // the documented trade: greedy maximizes fill, length batching never
    // truncates at a boundary so its truncation share is <= greedy's
    val (_, _, _, _, gFill, gTrunc) = got("greedy_concat")
    val (_, _, _, _, lFill, lTrunc) = got("length_batches")
    assert(gFill >= lFill, "greedy concat must win fill efficiency")
    assert(lTrunc <= gTrunc, "length batches must win truncation share")
    // both strategies conserve the same original token mass
    assert(greedy._3 + greedy._4 == length._3 + length._4,
      "token mass differs between strategies")
  }

  test("cluster_quota_sample: per-cluster counts capped at the quota, " +
      "order matches the md5 draw, deterministic across constructions") {
    def md5hex(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val all = Tables(spark, dir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val expected: Set[(Long, Int, Int)] =
      all.groupBy(_._2).iterator.flatMap { case (l, vs) =>
        vs.map(_._1).sortBy(id => (md5hex(id), id))
          .take(CurationOps.ClusterQuota)
          .zipWithIndex.map { case (id, i) => (id, l, i + 1) }
      }.toSet
    val got = CurationOps.clusterQuotaSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.toSet == expected, "sampled set/order differs from the draw")
    got.groupBy(_._2).foreach { case (l, vs) =>
      val clusterSize = all.count(_._2 == l)
      assert(vs.length == math.min(clusterSize, CurationOps.ClusterQuota),
        s"label $l quota")
    }
    val again = CurationOps.clusterQuotaSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == again.toSeq, "draw not deterministic")
  }

  test("curriculum_phases: phases partition the corpus into equidepth, " +
      "non-inverting length bands whose shares sum to 1") {
    val got = CurationOps.curriculumPhases(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getDouble(5)))
    assert(got.map(_._1).toSeq == (1 to CurationOps.CurriculumPhases),
      "phase ids")
    val corpus = Tables(spark, dir, "documents").count()
    assert(got.map(_._2).sum == corpus, "phases do not partition the corpus")
    assert(math.abs(got.map(_._6).sum - 1.0) <= got.length * 1e-6,
      "token shares do not sum to 1")
    // equidepth up to cutpoint ties: no phase more than 2x another
    assert(got.map(_._2).max <= 2 * got.map(_._2).min,
      s"phases far from equidepth: ${got.map(_._2).toSeq}")
    // shortest-first: length bands must not invert across phases
    got.sliding(2).foreach { case Array(a, b) =>
      assert(a._5 <= b._4, s"phase ${b._1} overlaps phase ${a._1}")
    }
    // non-inverting bands make every phase-(k+1) doc at least as long
    // as every phase-k doc, so MEAN length is monotone — token MASS is
    // not guaranteed (a tie-shrunk later phase can carry less total)
    val means = got.map(r => r._3.toDouble / r._2)
    assert(means.toSeq == means.toSeq.sorted,
      "mean length not non-decreasing across phases")
  }
}

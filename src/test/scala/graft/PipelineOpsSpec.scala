package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Behavioral invariants of the round-4 pipeline operators — the DuckDB
  * oracle pins exact values; these pin the SEMANTICS a value-match alone
  * would not (redaction completeness, containment asymmetry, histogram
  * totals).
  */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("lang_confusion: recall sums to 1 per truth label; counts cover the corpus") {
    val rows = graft.ops.TextOps.langConfusion(spark, dir).collect()
    assert(rows.map(_.getLong(2)).sum ==
      graft.ops.Tables(spark, dir, "documents").count())
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val s = rs.map(_.getDouble(3)).sum
      assert(math.abs(s - 1.0) < 0.01, s"$lang recall sum $s")
    }
  }

  test("events_value_quartiles: quartiles balanced within one row per type") {
    val rows = graft.ops.EventOps.eventsValueQuartiles(spark, dir).collect()
    rows.groupBy(_.getString(0)).foreach { case (et, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4), et)
      val ns = rs.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"$et: unbalanced ntile $ns")
      // quartile value ranges must not overlap (ntile follows the ordering)
      val sorted = rs.sortBy(_.getInt(1))
      sorted.sliding(2).foreach { case Array(lo, hi) =>
        assert(lo.getDouble(4) <= hi.getDouble(3) + 1e-9, s"$et overlap")
      }
    }
  }

  test("dedup_editdistance: emitted distances match a driver-side recompute") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val norm = graft.ops.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        substring(graft.ops.DedupOps.normText(col("text")), 1, 200).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.ops.DedupOps.dedupEditDistance(spark, dir).collect()
    assert(pairs.nonEmpty, "no edit-distance near-dups at sf0.001 — vacuous")
    pairs.foreach { r =>
      val (a, b, d) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(a < b)
      assert(d <= 20)
      assert(lev(norm(a), norm(b)) == d, s"($a,$b)")
    }
  }

  test("embedding_quantize: error bounded by half a quantization level") {
    val rows = graft.ops.SimilarityOps.embeddingQuantize(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mn, mx, err) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val halfLevel = (mx - mn) / 255.0 / 2.0
      assert(err <= halfLevel * 1.01 + 1e-6, s"vec ${r.getLong(0)}: $err > $halfLevel")
    }
  }

  test("power_iteration: emits a unit vector of the full dimension") {
    val rows = graft.ops.SimilarityOps.powerIteration(spark, dir).collect()
    assert(rows.length == 64)
    assert(rows.map(_.getInt(0)).toSeq == (0 until 64))
    val sumSq = rows.map(r => r.getDouble(1) * r.getDouble(1)).sum
    assert(math.abs(sumSq - 1.0) < 1e-4, s"norm² = $sumSq")
  }

  test("corpus_split partitions every doc once with ~13/2/1 proportions") {
    val rows = graft.ops.CurationOps.corpusSplit(spark, dir).collect()
    val bySplit = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    val total = bySplit.values.sum
    assert(total == graft.ops.Tables(spark, dir, "documents").count())
    val trainFrac = bySplit("train").toDouble / total
    // binomial(500, 13/16): ±5σ ≈ ±0.09
    assert(math.abs(trainFrac - 13.0 / 16) < 0.09, s"train frac $trainFrac")
  }

  test("inverted_index: df matches posting reach; postings sorted and capped") {
    val rows = graft.ops.TextOps.invertedIndex(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getLong(1)
      val postings = r.getString(2).split(",").map(_.toLong).toSeq
      assert(postings.size == math.min(df, 20L), r.toString)
      assert(postings == postings.sorted, "postings not sorted")
      assert(postings.distinct.size == postings.size, "duplicate doc in postings")
    }
  }

  test("bigram_lm_score: scores are negative log-probs, ascending, 20 rows") {
    val rows = graft.ops.TextOps.bigramLmScore(spark, dir).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted, "not ordered by surprise")
    // avg log P with add-one smoothing is strictly negative (P < 1)
    scores.foreach(sc => assert(sc < 0, sc.toString))
    rows.foreach(r => assert(r.getLong(1) > 0))
  }

  test("quality_percentile_cut: ~10% cut per lang, never more than 11%") {
    val rows = graft.ops.TextOps.qualityPercentileCut(spark, dir).collect()
    val byLang = rows.groupBy(_.getString(1))
    byLang.foreach { case (lang, rs) =>
      val frac = rs.count(_.getBoolean(4)).toDouble / rs.length
      // percent_rank < 0.10 keeps the fraction strictly under ~10% + one rank step
      assert(frac <= 0.11, s"$lang: cut fraction $frac")
    }
    assert(rows.exists(_.getBoolean(4)), "no doc cut anywhere — vacuous")
  }

  test("semdedup: drops point at smaller-id cluster-mates that really clear the cosine bar") {
    val dropped = graft.ops.DedupOps.semDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dropped.nonEmpty, "no semantic dups at sf0.001 — vacuous")
    dropped.foreach { case (vec, _, dupOf) => assert(dupOf < vec) }
    // recompute the claimed (vec, dup_of) cosines independently
    val vecs = graft.ops.Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
    }
    dropped.foreach { case (vec, _, dupOf) =>
      assert(cos(vecs(vec), vecs(dupOf)) >= 0.345, s"$vec vs $dupOf")
    }
  }

  test("pii_redact leaves no email or long digit run behind") {
    val rows = graft.ops.TextOps.piiRedact(spark, dir).collect()
    assert(rows.nonEmpty)
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    val longNum = "[0-9]{4,}".r
    rows.foreach { r =>
      val red = r.getString(1)
      assert(email.findFirstIn(red).isEmpty, s"email survived: $red")
      assert(longNum.findFirstIn(red).isEmpty, s"digit run survived: $red")
      // every customer blob carries exactly one constructed email and the
      // 9-digit run of c_name — both must be counted, not just erased
      assert(r.getInt(2) == 1 && r.getInt(3) >= 1, s"counts off: $r")
      assert(red.contains("[EMAIL]") && red.contains("[NUM]"))
      // short numerics (nation key < 100) must SURVIVE redaction
      assert(red.matches(".*nation [0-9]{1,2}$"), s"over-redacted: $red")
    }
  }

  test("top_ngrams is a deterministic top-20 with lexicographic tie-break") {
    val rows = graft.ops.TextOps.topNgrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.length == 20)
    // non-increasing counts; ties sorted by ngram
    rows.sliding(2).foreach { case Array((g1, c1), (g2, c2)) =>
      assert(c1 > c2 || (c1 == c2 && g1 < g2), s"order broken at ($g1,$c1) ($g2,$c2)")
    }
    // stable across constructions (the bench reruns rely on this)
    val again = graft.ops.TextOps.topNgrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.sameElements(again))
  }

  test("contamination_check scores every src0 doc and stays within [0, 1]") {
    val docs = graft.ops.Tables(spark, dir, "documents")
    val nEval = docs.filter(col("source") === "src0").count()
    val rows = graft.ops.TextOps.contaminationCheck(spark, dir).collect()
    assert(rows.length == nEval, "one row per eval doc, hits or not")
    rows.foreach { r =>
      val (n, hits, frac) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(hits >= 0 && hits <= n, s"hits out of range: $r")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(r.getBoolean(4) == frac > 0.5)
    }
    // a doc quoted verbatim in training data must score 1.0 (asymmetric
    // containment, not Jaccard): score src0 against a training set that
    // CONTAINS src0 — every doc with shingles must come back exactly 1.0
    val src0 = docs.filter(col("source") === "src0")
      .select(col("doc_id"), col("source"),
        split(graft.ops.DedupOps.normText(col("text")), " ").as("toks"))
    val self = graft.ops.TextOps.containmentScores(src0, src0).collect()
    assert(self.nonEmpty)
    self.foreach { r =>
      if (r.getLong(1) > 0) {
        assert(r.getLong(2) == r.getLong(1), s"self-containment missed: $r")
        assert(r.getDouble(3) == 1.0 && r.getBoolean(4), s"not 1.0: $r")
      }
    }
    assert(self.exists(_.getLong(1) > 0), "no doc had any shingles")
  }

  test("doc_pack tiles each source without gaps and conserves tokens") {
    val packs = graft.ops.TextOps.docPack(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packs.nonEmpty)
    val toks = graft.ops.TextOps.tokenCount(spark, dir)
      .agg(sum(col("ws_tokens"))).collect()(0).getLong(0)
    assert(packs.map(_._4).sum == toks, "every token lands in exactly one pack")
    packs.groupBy(_._1).foreach { case (src, ps) =>
      val ids = ps.map(_._2).sorted
      assert(ids.head == 0L && ids.last == ids.length - 1,
        s"$src pack ids not contiguous: ${ids.toSeq}")
      // offset packing: a pack can exceed the budget only by its last
      // straddling doc, so every pack except the final one must have been
      // entered before its boundary — n_docs >= 1 and ordering by first_doc
      // matches pack order
      val byPack = ps.sortBy(_._2)
      assert(byPack.forall(_._3 >= 1))
    }
  }

  test("doc_pack straddles pack boundaries correctly at a small budget") {
    // At budget 2048 the sf0.001/sf0.01 corpora fit one pack per source, so
    // the oracle never exercises a boundary; budget 64 forces many. Pin the
    // operator against an independent driver-side recompute of the offset
    // packing from the same token counts.
    val budget = 64
    val toks = graft.ops.TextOps.tokenCount(spark, dir)
      .select(col("source"), col("doc_id"),
        col("ws_tokens").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = toks.toSeq.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      var offset = 0L
      ds.sortBy(_._2).map { case (_, docId, n) =>
        val pack = offset / budget
        offset += n
        ((src, pack), (docId, n))
      }
    }.groupBy(_._1).map { case ((src, pack), rows) =>
      val ds = rows.map(_._2)
      (src, pack, ds.length.toLong, ds.map(_._2).sum,
        ds.map(_._1).min, ds.map(_._1).max)
    }.toSet
    val got = graft.ops.TextOps.docPack(spark, dir, budget).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    // the test is only meaningful if boundaries were actually crossed
    assert(got.exists(_._2 > 0), "budget too large: no source straddled")
  }

  test("bpe_pair_stats matches an independent driver-side recompute") {
    // the DuckDB oracle pins values cross-engine; this pins them against a
    // third, driver-side implementation so a shared misreading of the BPE
    // statistic (e.g. distinct pairs per word, or unweighted counts) can't
    // pass both
    val words = graft.ops.Tables(spark, dir, "documents")
      .select(explode(split(graft.ops.DedupOps.normText(col("text")), " "))
        .as("w")).collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    words.foreach { w =>
      // code-point pairing (not UTF-16 code units): Spark's substring and
      // DuckDB's slicing both count code points, so surrogate pairs must
      // not be split here either
      val cps = w.codePoints().toArray
      (0 until cps.length - 1).foreach { i =>
        val p = new String(cps, i, 2)
        counts(p) = counts.getOrElse(p, 0L) + 1L
      }
    }
    val expected = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(30)
    val got = graft.ops.TextOps.bpePairStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("bpe_iterate: rounds 1/2 reproduce bpe_pair_stats/bpe_2merge winners; counts strictly ranked; N-monotone prefix") {
    import graft.ops.TextOps
    val merges = TextOps.bpeIterate(spark, dir, rounds = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(merges.map(_._1).toSeq == Seq(1, 2, 3, 4))
    // the unrolled special cases: round 1's winner is bpe_pair_stats' top
    // row, round 2's is bpe_2merge's (both oracle-verified queries)
    val ps = TextOps.bpePairStats(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert((merges(0)._2, merges(0)._3) == ps.head,
      s"round 1 ${merges(0)} != bpe_pair_stats top ${ps.head}")
    val m2 = TextOps.bpe2Merge(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert((merges(1)._2, merges(1)._3) == m2.head,
      s"round 2 ${merges(1)} != bpe_2merge top ${m2.head}")
    // merge frequencies are non-increasing across rounds: each round
    // removes mass from the picked pair and can only split others
    assert(merges.map(_._3).sliding(2).forall(w => w(0) >= w(1)),
      s"merge counts not non-increasing: ${merges.toSeq}")
    // a shorter run is a prefix of a longer one (training determinism)
    val m3 = TextOps.bpeIterate(spark, dir, rounds = 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(m3.toSeq == merges.take(3).toSeq, "rounds=3 is not a prefix of rounds=4")
    // bpe_train (the gate-depth N=8 run) extends the same merge table:
    // its first 4 rows ARE bpe_iterate's — merge-order determinism
    // across depths — and its counts stay non-increasing through round 8
    val m8 = TextOps.bpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(m8.map(_._1).toSeq == (1 to 8),
      s"bpe_train rounds: ${m8.map(_._1).toSeq}")
    assert(m8.take(4).toSeq == merges.toSeq,
      "bpe_iterate (N=4) is not a prefix of bpe_train (N=8)")
    assert(m8.map(_._3).sliding(2).forall(w => w(0) >= w(1)),
      s"bpe_train merge counts not non-increasing: ${m8.toSeq}")
  }

  test("bpe depth scaling: 32-merge training is prefix-stable over the gate run and equals a pure-Scala recount round-for-round") {
    import graft.ops.TextOps
    // the 64-symbol budget is the contract the depth run leans on: all
    // distinct single BMP code points (so UTF-8 and UTF-16 pair orderings
    // agree and replace() stays injective on symbol-free words)
    assert(TextOps.BpeMergeSyms.size >= 64)
    assert(TextOps.BpeMergeSyms.distinct.size == TextOps.BpeMergeSyms.size)
    assert(TextOps.BpeMergeSyms.forall(s =>
      s.codePointCount(0, s.length) == 1 && !s.exists(_.isSurrogate)))
    val depth = 32
    val deep = graft.ops.TextOps.bpeIterate(spark, dir, rounds = depth)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(deep.map(_._1).toSeq == (1 to depth))
    // the oracle-gated 8-merge run (bpe_train) is a prefix — training
    // determinism holds at 4× the gate depth
    val gate = TextOps.bpeTrain(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(deep.take(8).toSeq == gate.toSeq,
      "bpe_train (N=8) is not a prefix of the 32-merge run")
    assert(deep.map(_._3).sliding(2).forall(w => w(0) >= w(1)),
      s"deep merge counts not non-increasing: ${deep.toSeq}")
    // independent pure-Scala recount of the WHOLE 32-round loop from the
    // collected word-frequency table — code-point pairing, (cnt DESC,
    // pair) tie-break, leftmost non-overlapping replace, drop-collapsed
    // words: the same primitives Spark and DuckDB define identically.
    // The gate oracle stops at 8 (CTE-unroll-bounded); this is the
    // depth-32 correctness evidence
    var wf = TextOps.bpeWordFreq(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val recount = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    for (r <- 1 to depth) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      wf.foreach { case (w, f) =>
        val cps = w.codePoints().toArray
        (0 until cps.length - 1).foreach { i =>
          val p = new String(cps, i, 2)
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val (pair, cnt) = counts.toSeq.minBy { case (p, c) => (-c, p) }
      recount += ((r, pair, cnt))
      if (r < depth)
        wf = wf
          .map { case (w, f) =>
            (w.replace(pair, TextOps.BpeMergeSyms(r - 1)), f)
          }
          .filter { case (w, _) => w.codePointCount(0, w.length) >= 2 }
    }
    assert(deep.toSeq == recount.toSeq,
      "32-merge training diverges from the pure-Scala recount")
  }

  test("source_mixture flattens toward small sources and spends the budget") {
    val rows = graft.ops.CurationOps.sourceMixture(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.length == 20)
    // weights are a distribution over sources
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 1e7) < 20 * 1) // per-source round-off
    // α = 0.5 damping: weight ratios are the sqrt of token-mass ratios
    val base = rows.head
    rows.tail.foreach { r =>
      val expectRatio = math.sqrt(r._2.toDouble / base._2.toDouble)
      assert(math.abs(r._3 / base._3 - expectRatio) < 1e-3,
        s"damping off for ${r._1}")
    }
    // monotone: more tokens, never a smaller weight
    rows.sortBy(_._2).sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._3 <= hi._3)
    }
  }

  test("corpus_shuffle is deterministic, tiles the corpus, and mixes sources") {
    val docs = graft.ops.Tables(spark, dir, "documents")
    val rows = graft.ops.CurationOps.corpusShuffle(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (0 until 16), "all 16 shards, in order")
    assert(rows.map(_._2).sum == docs.count(), "shards tile the corpus")
    // a shuffle that keeps sources clumped defeats its purpose: with 20
    // sources and ~30 docs/shard, every shard must mix several sources
    rows.foreach { r => assert(r._3 >= 5, s"shard ${r._1} barely mixed: $r") }
    // reproducible across constructions (task-retry / cross-run stability)
    val again = graft.ops.CurationOps.corpusShuffle(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.sameElements(again))
  }

  test("kmeans_step: partitions all vectors; seeds anchor their own clusters") {
    val rows = graft.ops.SimilarityOps.kmeansStep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val total = graft.ops.Tables(spark, dir, "embeddings").count()
    assert(rows.map(_._2).sum == total, "every vector in exactly one cluster")
    // each seed vector is distance 0 from itself, so every seed cluster is
    // non-empty and cluster ids are exactly the seed ids
    assert(rows.map(_._1).sorted.toSeq == (0L until 8L))
    rows.foreach { r => assert(r._3 >= 0.0, s"negative inertia: $r") }
    // deterministic across constructions (argmin ties break on centroid id)
    val again = graft.ops.SimilarityOps.kmeansStep(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.sameElements(again))
  }

  test("embedding_centroids: centroid norm never exceeds mean vector norm") {
    val rows = graft.ops.SimilarityOps.embeddingCentroids(spark, dir).collect()
    assert(rows.nonEmpty)
    val emb = graft.ops.Tables(spark, dir, "embeddings")
    val total = emb.count()
    assert(rows.map(_.getLong(1)).sum == total, "every vector in one label")
    rows.foreach { r =>
      // Jensen: ||mean(v)|| <= mean(||v||) — equality only if all aligned.
      // Both sides are rounded to 5 decimals by the operator, so rounding
      // alone can open a gap of up to 1e-5 when vectors are near-aligned;
      // the tolerance must cover it.
      assert(r.getDouble(2) <= r.getDouble(3) + 1e-5, s"Jensen violated: $r")
      assert(r.getDouble(2) >= 0.0)
    }
  }

  test("char_histogram partitions the corpus exactly once") {
    val rows = graft.ops.AnalyticsOps.charHistogram(spark, dir).collect()
    val docs = graft.ops.Tables(spark, dir, "documents")
    assert(rows.map(_.getLong(1)).sum == docs.count(), "buckets must tile")
    val buckets = rows.map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b <= 9))
    assert(buckets.distinct.length == buckets.length)
    // bucket ranges must not overlap (min of next >= max of previous)
    rows.sortBy(_.getLong(0)).sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(2),
        s"overlapping buckets: $a / $b")
      case _ => ()
    }
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Driver-run perf surface: every SparkEntry query timed at the configured
  * scale factor, one JSON line out (BASELINE.md bench bar).
  *
  * Queries are materialized through the noop sink, NOT `count()`: count lets
  * Catalyst prune unused projections (a sanitize chain would be optimized
  * away entirely) — noop executes the full plan and discards rows.
  *
  * Noise immunity (VERDICT r2): one cold shot per query on a shared box
  * cannot distinguish a real 2× regression from environment contention
  * (r2's apparent 1.3s → 37.2s "regressions" were refuted locally). Each
  * query therefore runs once UNTIMED (JIT + codegen + file-metadata warm-up)
  * and then `REPS` timed executions; the reported number is the median —
  * or, when the rep spread shows contention (max/min > 3) AND the min rep
  * is corroborated by the committed per-query floor, the MIN, with the
  * query named in the record's `contended` list (VERDICT r9 #8, r10 #1;
  * the floor detector `above_floor` catches sustained load the spread
  * detector cannot — see the inline note at the detectors).
  * Every execution is a fresh plan construction followed by
  * `spark.catalog.clearCache()`, so a cached subtree populated by one rep
  * can't make the next rep measure cache reads instead of the query.
  */
object Bench {
  private val Reps = 3

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
  }

  // 3. CROSS-ROUND DRIFT (`vs_prev_round`, VERDICT r15 #7): the floor
  //    detector compares to ALL-TIME mins, so a query can creep 2-3×
  //    across rounds without ever flagging (r15's quality_* cluster
  //    drifted 2.6× vs r14 while staying under its slack bar). Each
  //    query's MIN rep (the least-contended evidence this run offers)
  //    is compared against the PRIOR round's driver reading with the
  //    same two-term bar shape: ratio for multi-second queries,
  //    absolute slack so sub-second prev readings don't flag on
  //    scheduler jitter. The prev reading is itself a one-shot driver
  //    number (possibly noise-inflated — which only makes this bar
  //    LENIENT, never a false flag), so output is an A/B work-list,
  //    not a verdict.
  private[graft] val PrevRatio = 2.0
  private[graft] val PrevSlackSec = 0.75
  private[graft] def vsPrevRound(curMin: Map[String, Double],
      prev: Map[String, Double]): Map[String, (Double, Double)] =
    curMin.flatMap { case (k, mn) =>
      prev.get(k) match {
        case Some(p) if p > 0 && mn > 0 &&
            mn > math.max(PrevRatio * p, p + PrevSlackSec) =>
          Some(k -> (p, mn))
        case _ => None
      }
    }

  /** The prior round's per-query map: the highest-numbered committed
    * close record `scripts/bench_r*_close.json` (env-overridable via
    * SPARK_GRAFT_BENCH_PREV) — NOT the driver's `BENCH_rN.json`, whose
    * 2 KB stdout-tail wrapper truncates the queries map away. The close
    * records are the builder's quiet-box full lines, so the baseline is
    * the LEAST noise-inflated prior reading available. Skipped entirely
    * (empty map) when the record's sf differs from this run's.
    *
    * Round scoping (ADVICE r16): with no further hint the baseline is
    * the last committed CLOSE — during a round's own close sequence
    * that is the same round's earlier reading, so the signal is
    * drift-vs-last-close, not strictly vs the prior round (creep
    * landing between a close and its final record re-baselines
    * itself). Set SPARK_GRAFT_BENCH_ROUND=<N> to exclude round N's own
    * records and measure true cross-round drift.
    */
  private[graft] def loadPrevRound(sfDir: String): Map[String, Double] = {
    // toIntOption, not toInt: this runs AFTER every query has executed —
    // a malformed env value must degrade the detector, never crash the
    // bench and lose the whole run (r17 review)
    val maxRound = sys.env.get("SPARK_GRAFT_BENCH_ROUND")
      .flatMap(_.trim.toIntOption)
    val explicit = sys.env.get("SPARK_GRAFT_BENCH_PREV")
    val path: Option[java.nio.file.Path] = explicit match {
      case Some(p) => Some(java.nio.file.Paths.get(p))
      case None =>
        // name shape: bench_r<N>[_s<W>]_close[<K>].json — ordered
        // NUMERICALLY on (round, wave, re-close) so s10 beats s9 and a
        // close2 re-record beats the superseded close (r16 review; the
        // repo already has bench_r15_s2_close2.json)
        val re = "bench_r(\\d+)(?:_s(\\d+))?_close(\\d*)\\.json".r
        val dir = java.nio.file.Paths.get("scripts")
        try {
          val listing = java.nio.file.Files.list(dir)
          try {
            import scala.jdk.CollectionConverters._
            listing.iterator().asScala
              .flatMap { f =>
                re.findFirstMatchIn(f.getFileName.toString).map { m =>
                  def n(g: String) =
                    if (g == null || g.isEmpty) 0 else g.toInt
                  ((m.group(1).toInt, n(m.group(2)), n(m.group(3))), f)
                }
              }
              // exclude the running round's own close records when the
              // round number is provided (ADVICE r16)
              .filter(e => maxRound.forall(e._1._1 < _))
              .toSeq.maxByOption(_._1).map(_._2)
          } finally listing.close()
        } catch { case e: Throwable =>
          System.err.println(
            s"[bench] drift baseline scan failed under $dir: ${e.getMessage}")
          None
        }
    }
    path.fold(Map.empty[String, Double])(loadPrevRoundFrom(_, sfDir))
  }

  private[graft] def loadPrevRoundFrom(p: java.nio.file.Path,
      sfDir: String): Map[String, Double] = {
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8)
        val prevSf = "\"sf\"\\s*:\\s*\"([^\"]+)\"".r
          .findFirstMatchIn(txt).map(_.group(1))
        if (!prevSf.contains(sfDir)) {
          System.err.println(s"[bench] prev round at $p is sf=" +
            s"${prevSf.getOrElse("?")}, run is at $sfDir — drift detector off")
          Map.empty
        } else {
          val qIdx = txt.indexOf("\"queries\"")
          if (qIdx < 0) Map.empty
          else {
            // format coupling (ADVICE r16): this reader assumes the
            // writer below — a FLAT "queries" object, first '}' after
            // the key closes it, no nested values. A nested value or a
            // number-shaped key before the map would silently truncate
            // or pollute the baseline, so a shape floor guards it: a
            // real close record carries the full registry (hundreds of
            // entries); anything tiny is a parse gone wrong.
            val body = txt.substring(qIdx, txt.indexOf("}", qIdx) + 1)
            val qs = "\"([A-Za-z0-9_]+)\"\\s*:\\s*(-?[0-9.]+)".r
              .findAllMatchIn(body)
              .map(m => m.group(1) -> m.group(2).toDouble).toMap - "queries"
            if (qs.size < 50) {
              System.err.println(s"[bench] drift baseline at $p parsed " +
                s"only ${qs.size} queries — shape mismatch, detector off")
              Map.empty
            } else {
              System.err.println(
                s"[bench] drift baseline: $p (${qs.size} queries)")
              qs
            }
          }
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] no prev round at $p: ${e.getMessage}")
        Map.empty
      }
  }

  /** Bench run order: name-sorted (the driver-comparable default every
    * prior round used), or — under SPARK_GRAFT_BENCH_ORDER=shuffled — a
    * FIXED-SEED permutation of the sorted list. Purpose (VERDICT r17 #3):
    * the recurring driver contention signature is a CONTIGUOUS
    * alphabetical band of above-floor flags; under a shuffled order a
    * load window covering a contiguous stretch of wall-clock should flag
    * a set that is NOT name-contiguous, converting the narrative into a
    * testable property. Fixed seed (180001) so two shuffled runs are
    * rep-for-rep comparable; deterministic given the name set (pinned in
    * BenchSpec).
    */
  private[graft] def orderNames(names: Seq[String],
      shuffled: Boolean): Seq[String] = {
    val sorted = names.sorted
    if (shuffled) new scala.util.Random(180001L).shuffle(sorted) else sorted
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // run with the engine's own optimizer rules active, as a user would
    GraftOptimizations.install(spark)
    // WindowExec warns `No Partition Defined` on the (deliberate) 10-row
    // top-k rank window; at WARN it pollutes the driver-scraped stdout tail
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // the between-rep unpersist of leftover localCheckpoint blocks (below)
    // is deliberate — each rep builds fresh checkpoints, nothing recomputes
    // the old ones — but RDD.unpersist WARNs about truncated lineage per
    // block; keep the driver-scraped tail clean
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    // warm the session (codegen cache, filesystem metadata) outside timing
    spark.read.parquet(s"$sfDir/nation.parquet").write
      .format("noop").mode("overwrite").save()
    // the incremental-dedup query reads a store seeded OUTSIDE the query
    // builder (construction is pure — VERDICT r2 #5)
    // Seed time is measured and reported (`seed_sec`, VERDICT r16 #5 —
    // the aggregate-creep audit): it is bench WALL, paid once before any
    // query timing, and the one block whose cost grows with the seam
    // count rather than the query count.
    val tSeed0 = System.nanoTime()
    // per-seam attribution (VERDICT r17 #5: seed_sec varied 30.7→56.2→70
    // across boxes with no way to say WHICH seam) — one line per seam to
    // stderr + a seed_detail map in the detail record
    val seedDetail = scala.collection.mutable.LinkedHashMap[String, Double]()
    def seedTimed(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      seedDetail(name) = dt
      System.err.println(f"[bench] seed $name%-18s $dt%7.2f s")
    }
    seedTimed("incremental_dedup")(
      graft.ops.IncrementalDedup.seedQueryStore(spark, sfDir))
    // materialize the co-purchase edge list once for the whole graph
    // family (the production materialized-table analog — GraphEdges doc);
    // parquet-backed, so the between-rep cache/checkpoint sweeps below
    // never invalidate it
    seedTimed("graph_edges")(graft.ops.GraphEdges.seed(spark, sfDir))
    seedTimed("dedup_edges")(graft.ops.DedupEdges.seed(spark, sfDir))
    seedTimed("sparse_index")(graft.ops.SparseIndex.seed(spark, sfDir))
    seedTimed("hnsw_index")(graft.ops.HnswIndex.seed(spark, sfDir))
    seedTimed("knn_lists")(graft.ops.KnnLists.seed(spark, sfDir))
    val seedSec = (System.nanoTime() - tSeed0) / 1e9
    System.err.println(f"[bench] seam seeding: $seedSec%.2f s")
    // Run order (VERDICT r17 #3): sorted by default — the driver-
    // comparable order every prior round used. SPARK_GRAFT_BENCH_ORDER=
    // shuffled runs a FIXED-SEED Fisher–Yates permutation instead: if the
    // driver's `above_floor` flag set stops being name-contiguous under a
    // shuffled order, the "contiguous alphabetical load window" contention
    // narrative (r10→r17) is confirmed as an environment property rather
    // than a query property. Fixed seed so two shuffled runs are
    // rep-for-rep comparable.
    val names = orderNames(SparkEntry.queries.keySet.toSeq,
      sys.env.get("SPARK_GRAFT_BENCH_ORDER").contains("shuffled"))
    val tRun0 = System.nanoTime()
    val results = names.map(n => n -> SparkEntry.queries(n)).map { case (name, fn) =>
      // a failing query must NOT report its elapsed-to-exception time — a
      // broken query would read as a perf improvement; -1 marks failure
      def once(): Double = {
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // clearCache only covers the cache manager; the localCheckpoint
        // blocks ClusterOps/CurationOps mint at plan construction free only
        // via GC + ContextCleaner, so drop them explicitly between reps or
        // storage memory accumulates across executions (ADVICE r3)
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        if (ok) dt else -1.0
      }
      once() // untimed warm-up
      name -> Seq.fill(Reps)(once())
    }
    // Shared-box contention defense, two detectors (VERDICT r9 #8, r10 #1):
    //
    // 1. INTRA-RUN SPREAD (`contended`): a rep set like [3.17, 17.63,
    //    12.87] — first rep at the builder's probed level, then the box
    //    degrades — is the recurring r2/r5/r6/r8/r9 noise signature. When
    //    rep max/min exceeds CONTENTION_RATIO the query is flagged.
    //    Reported value: the MIN, but ONLY when the min itself is
    //    corroborated by the committed floor (min ≤ FloorRatio × floor) —
    //    a corroborated min proves the spread was environmental. An
    //    UNcorroborated spread (no floor, or min above it) reports the
    //    median as usual: substituting the best-case rep for a genuinely
    //    bimodal real regression (intermittent spill/GC/skew) would bias
    //    the headline optimistically (ADVICE r10).
    //
    // 2. SUSTAINED LOAD (`above_floor`): the r10 driver run had an
    //    11-query alphabetical band uniformly 2–10× slow with TIGHT rep
    //    spreads — a load window covering a contiguous stretch of the
    //    name-ordered run, invisible to detector 1. Each query's MIN rep
    //    is compared against max(2.5× floor, floor + 0.75 s) — the ratio
    //    term catches real regressions on multi-second queries; the
    //    absolute-slack term (r15 — VERDICT r14 #1) stops sub-second
    //    floors from flagging on driver-box noise ALONE: a 0.22 s floor
    //    read at 0.6 s is a 2.7× "regression" that is 0.4 s of scheduler
    //    jitter, and every such flag cost a PerfProbe A/B ritual that
    //    returned "noise" four rounds running
    //    (scripts/bench_floors.json — the builder's quiet-box per-query
    //    record, reseeded each round close): min above the bar is either
    //    sustained contention or a real regression, named in the record
    //    so the reader A/Bs exactly that list and nothing else
    //    (BASELINE.md protocol). Queries without a committed floor (new
    //    this round) are never floor-flagged.
    val ContentionRatio = 3.0
    val FloorRatio = 2.5
    val FloorSlackSec = 0.75
    val floorsPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_FLOORS", "scripts/bench_floors.json")
    val floors: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(floorsPath)),
          java.nio.charset.StandardCharsets.UTF_8)
        // floors are per-SF absolute seconds: applying sf0.1 floors at
        // sf0.001 would trivially corroborate every contended min, and at
        // sf1 would flag every query (ADVICE r11) — a floors file seeded
        // at a different SF disables BOTH detectors for this run
        val floorsSf = "\"sf\"\\s*:\\s*\"([^\"]+)\"".r
          .findFirstMatchIn(txt).map(_.group(1))
        if (!floorsSf.contains(sfDir)) {
          System.err.println(
            s"[bench] floors at $floorsPath were seeded at sf=${floorsSf.getOrElse("?")}, " +
            s"run is at $sfDir — floor detectors disabled")
          Map.empty[String, Double]
        } else {
          // floors live under "floors": flat string→number pairs; a full
          // JSON parser is overkill for a file this code also writes
          val body = txt.substring(txt.indexOf("\"floors\""))
          "\"([A-Za-z0-9_]+)\"\\s*:\\s*([0-9.]+)".r
            .findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] no floors at $floorsPath: ${e.getMessage}")
        Map.empty
      }
    val stats = results.map { case (k, reps) =>
      if (reps.exists(_ < 0)) (k, -1.0, false, false)
      else {
        val mn = reps.min
        val spread = mn > 0 && reps.max / mn > ContentionRatio
        // one bar for both uses: the corroboration test (detector 1's
        // min-substitution) and the flag are complements, so a min just
        // inside the slack is corroborated noise, never flagged
        def bar(f: Double): Double = math.max(FloorRatio * f, f + FloorSlackSec)
        val floorOk = floors.get(k).exists(f => mn <= bar(f))
        val aboveFloor = floors.get(k).exists(f => mn > bar(f))
        val reported = if (spread && floorOk) mn else median(reps)
        (k, reported, spread, aboveFloor)
      }
    }
    val medians = stats.map { case (k, v, _, _) => k -> v }
    val contendedNames = stats.collect { case (k, _, true, _) => k }
    val aboveFloorNames = stats.collect { case (k, _, _, true) => k }
    val minByName = results.collect {
      case (k, reps) if !reps.exists(_ < 0) => k -> reps.min
    }.toMap
    val drift = vsPrevRound(minByName, loadPrevRound(sfDir))
    // 3-decimal per-query values: at 90+ queries full double precision blew
    // the final line past the driver's ~2.1 KB stdout tail window and the
    // gate recorded parsed:null (VERDICT r4 #1); ms resolution is plenty
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = medians.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // failed queries poison the total too (−1 each would HELP the total;
    // a clearly-broken negative total can't pass a regression bar quietly)
    val total =
      if (medians.exists(_._2 < 0)) -1.0 else medians.map(_._2).sum
    // driver-facing line: the r1-agreed schema (metric/value/unit/queries/
    // sf) EXTENDED by `contended` (r10) and `above_floor` (r11) — additive
    // fields only; the driver's parser is JSON (r10's line with `contended`
    // parsed fine in BENCH_r10.json), so extra keys are tolerated. The
    // per-rep spread (noise forensics) goes to the detail side file.
    val contendedJson =
      contendedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val aboveFloorJson =
      aboveFloorNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    // normally {} — only overlap queries whose BEST rep still exceeds
    // max(2× prev-round reading, prev + 0.75 s) appear, as name:[prev,min]
    val driftJson = drift.toSeq.sortBy(_._1)
      .map { case (k, (p, m)) => "\"" + k + s"\":[${f3(p)},${f3(m)}]" }
      .mkString("{", ",", "}")
    // creep forensics (VERDICT r16 #5): seed_sec is the pre-timing seam
    // cost, run_sec the wall across all warm-ups + reps — `value` only
    // sums reported medians, so run_sec/value exposes how much wall the
    // untimed warm-ups and rep spread actually cost on this box
    val runSec = (System.nanoTime() - tRun0) / 1e9
    val json =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"contended":$contendedJson,"above_floor":$aboveFloorJson,"vs_prev_round":$driftJson,"seed_sec":${f3(seedSec)},"run_sec":${f3(runSec)},"sf":"$sfDir"}"""
    // the full line above still grows with the query count; this one never
    // does (~90 bytes). Printed LAST so any tail window, however small,
    // captures a complete parseable record; the full per-query map is in the
    // preceding line AND in SPARK_GRAFT_BENCH_OUT.
    val compact =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","sf":"$sfDir"}"""
    val detail = {
      val qpart = results.map { case (k, reps) =>
        val ok = !reps.exists(_ < 0)
        val med = if (ok) f3(median(reps)) else "-1"
        val mn = if (ok) f3(reps.min) else "-1"
        "\"" + k + "\":{\"reps\":[" + reps.mkString(",") +
          s"""],"median":$med,"min":$mn}"""
      }.mkString("{", ",", "}")
      val spart = seedDetail.map { case (k, v) => "\"" + k + "\":" + f3(v) }
        .mkString("{", ",", "}")
      s"""{"queries":$qpart,"seed_detail":$spart}"""
    }
    val detailPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_DETAIL", "/tmp/bench_detail.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(detailPath),
      detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $detailPath: ${e.getMessage}")
    }
    // the driver scrapes stdout — belt and braces: write the JSON to a file
    // (env-overridable) AND print it as the last bare line after the session
    // is fully stopped (no executor log tail can interleave; build.sbt's
    // `run / outputStrategy := StdoutOutput` keeps sbt from `[info]`-
    // decorating the line).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    spark.stop()
    System.out.flush(); System.err.flush()
    println(json)
    println(compact)
  }
}

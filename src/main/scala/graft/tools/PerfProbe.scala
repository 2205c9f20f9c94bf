package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only stage/query timer for the heavy pairwise operators: runs the
  * shipped queries cold (first) and warm (second), noop-materialized, so
  * JIT/codegen warm-up effects are visible — bench-order hides them
  * (a cold dedup_minhash_lsh once measured 125s vs 19s warm purely from
  * interpreted-expression JIT warm-up).
  *
  *   SPARK_GRAFT_CPUS=4 sbt 'runMain graft.tools.PerfProbe /root/testdata/sf0.1'
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("dedup_minhash_shingle", "dedup_ngram_jaccard", "dedup_clusters",
        "corpus_curation", "dedup_embedding_lsh", "dedup_embedding_cosine",
        "ann_cosine_topk", "dedup_simhash")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-34s $dt%8.2f s"); dt
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // A/B protocol (BASELINE.md): cold shot, then `SPARK_GRAFT_PROBE_REPS`
    // warm reps (default 3); the recorded verdict number is the warm median.
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    graft.ops.IncrementalDedup.seedQueryStore(spark, dir)
    graft.ops.GraphEdges.seed(spark, dir)
    graft.ops.DedupEdges.seed(spark, dir)
    graft.ops.SparseIndex.seed(spark, dir)
    graft.ops.HnswIndex.seed(spark, dir)
    graft.ops.KnnLists.seed(spark, dir)
    names.foreach { n =>
      val q = graft.SparkEntry.queries(n)
      time(s"$n (cold)")(sink(q(spark, dir)))
      val warm = (1 to reps).map(i => time(s"$n (warm $i)")(sink(q(spark, dir))))
      val s = warm.sorted
      val m = if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      println(f"[probe] $n%-34s median-of-$reps%d warm: $m%8.2f s")
    }
    spark.stop()
  }
}

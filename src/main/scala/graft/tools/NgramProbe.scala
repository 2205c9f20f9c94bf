package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only same-session interleaved A/B of the prefix-filter Jaccard
  * pair build: the OLD shape (no docs checkpoint — tokenization
  * re-evaluated per consumer subtree) vs the SHIPPED shape. Interleaving
  * A B A B ... cancels the box's minutes-scale load drift that makes
  * cross-run medians incomparable.
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftOptimizations.install(spark)

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def sweep(): Unit =
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))

    import graft.ops.DedupOps

    // OLD shape: the pre-r18 pipeline body (no checkpoint), same math
    def oldPairs(): DataFrame = {
      val docs = DedupOps.tokenizedDocs(spark, dir)
        .withColumn("is_delta", lit(false))
      val tokDoc = docs.select(col("doc_id"), col("source"), col("n_tok"),
        explode(col("tokens")).as("tok"))
      val tokDf = tokDoc.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val prefixLen =
        (col("n_tok") - floor((col("n_tok") * 9 + 9) / lit(10)) + 1).cast("int")
      val prefixes = tokDoc.join(tokDf, "tok")
        .groupBy(col("doc_id"), col("source"), col("n_tok"))
        .agg(sort_array(collect_list(struct(col("df"), col("tok")))).as("ord"))
        .select(col("doc_id"), col("source"), col("n_tok"),
          explode(slice(col("ord.tok"), lit(1), prefixLen)).as("ptok"))
      val a = prefixes.as("a"); val b = prefixes.as("b")
      val cond = col("a.ptok") === col("b.ptok") &&
        col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id") &&
        col("a.n_tok") * 10 >= col("b.n_tok") * 9 &&
        col("b.n_tok") * 10 >= col("a.n_tok") * 9
      val candidates = a.join(b, cond)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val ta = docs.select(col("doc_id").as("doc_a"),
        col("tokens").as("tok_a"), col("n_tok").as("n_a"))
      val tb = docs.select(col("doc_id").as("doc_b"),
        col("tokens").as("tok_b"), col("n_tok").as("n_b"))
      candidates.join(ta, "doc_a").join(tb, "doc_b")
        .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
          graft.functions.ArrayFunctions.intersectSize(
            col("tok_a"), col("tok_b")).as("n_i"))
        .select(col("doc_a"), col("doc_b"),
          (col("n_i").cast("double") /
            (col("n_a") + col("n_b") - col("n_i")).cast("double")).as("jaccard"))
        .filter(col("jaccard") >= 0.9)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }
    def newPairs(): DataFrame = DedupOps.dedupNgramJaccard(spark, dir)

    // warm both
    sink(oldPairs()); sweep(); sink(newPairs()); sweep()
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "5").toInt
    val olds = collection.mutable.ArrayBuffer[Double]()
    val news = collection.mutable.ArrayBuffer[Double]()
    for (i <- 1 to reps) {
      olds += time { sink(oldPairs()) }; sweep()
      news += time { sink(newPairs()) }; sweep()
      println(f"[ab] rep $i old ${olds.last}%6.2f new ${news.last}%6.2f")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"[ab] MEDIAN old ${med(olds.toSeq)}%6.2f  new ${med(news.toSeq)}%6.2f")
    spark.stop()
  }
}

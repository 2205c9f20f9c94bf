package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._
import graft.ops.DedupOps.normText
import graft.ops.Tables

/** Scratch instrumentation for the slow queries: times each stage of the
  * minhash pipeline and the ann scoring in isolation (noop-materialized).
  * Dev tool, not part of the query surface.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- cold-first: the shipped query with no warm-up ----
    time("COLD dedupMinhashLsh")(sink(graft.ops.DedupOps.dedupMinhashLsh(spark, dir)))

    // ---- minhash stages ----
    val nHashes = 50; val bands = 5; val rowsPerBand = 10
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        array_distinct(split(normText(col("text")), " ")).as("tokens"))
    time("docs+tokens")(sink(docs))
    val toks = docs.select(col("doc_id"), explode(col("tokens")).as("tok"))
    val sig = toks.groupBy("doc_id").agg(
      array((0 until nHashes).map(j =>
        min(xxhash64(col("tok"), lit(j)))): _*).as("sig"))
    time("signatures")(sink(sig))
    val sigC = sig.cache()
    time("signatures(cache)")(sigC.count())
    val banded = sigC.select(col("doc_id"),
      posexplode(array((0 until bands).map(bnd =>
        struct(lit(bnd).as("band"),
          concat_ws(":", (0 until rowsPerBand).map(r =>
            col("sig")(bnd * rowsPerBand + r)): _*).as("bsig"))): _*)))
      .select(col("doc_id"), col("col.band"), col("col.bsig"))
    val a = banded.as("a"); val b = banded.as("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val candC = candidates.cache()
    val nCand = time("band join+distinct")(candC.count())
    println(s"[probe] candidates: $nCand")
    val sa = sigC.select(col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val sb = sigC.select(col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    val estimated = candC
      .join(broadcast(sa), "doc_a").join(broadcast(sb), "doc_b")
      .withColumn("est", aggregate(
        zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast("double") / lit(nHashes.toDouble))
      .filter(col("est") >= 0.7)
      .select(col("doc_a"), col("doc_b"))
    val estC = estimated.cache()
    val nEst = time("estimate prune")(estC.count())
    println(s"[probe] estimated survivors: $nEst")
    val da = docs.select(col("doc_id").as("doc_a"), col("tokens").as("tok_a"))
    val db = docs.select(col("doc_id").as("doc_b"), col("tokens").as("tok_b"))
    val verified = estC.join(broadcast(da), "doc_a").join(broadcast(db), "doc_b")
      .filter(size(col("tok_a")) * 10 >= size(col("tok_b")) * 9 &&
        size(col("tok_b")) * 10 >= size(col("tok_a")) * 9)
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("tok_a"), col("tok_b"))).cast("double") /
          (size(col("tok_a")) + size(col("tok_b")) -
            size(array_intersect(col("tok_a"), col("tok_b")))).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.9)
    time("exact verify")(sink(verified))

    // ---- the real query, as shipped ----
    time("FULL dedupMinhashLsh")(sink(graft.ops.DedupOps.dedupMinhashLsh(spark, dir)))
    time("FULL dedupNgramJaccard")(sink(graft.ops.DedupOps.dedupNgramJaccard(spark, dir)))

    // ---- ann pieces ----
    val embRaw = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), toDoubleArray(col("embedding")).as("v0"))
    time("emb raw")(sink(embRaw))
    val embNorm = embRaw.select(col("vec_id"), col("label"),
      normalize(col("v0")).as("v"))
    time("emb normalize")(sink(embNorm))
    val embNormR = embNorm.repartition(col("label"))
    val queries = embNormR.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored = embNormR.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        dot(col("qv"), col("v")).as("cos"))
    time("ann scored (repart)")(sink(scored))
    val queries2 = embNorm.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val scored2 = embNorm.crossJoin(broadcast(queries2))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        dot(col("qv"), col("v")).as("cos"))
    time("ann scored (no repart)")(sink(scored2))
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{squaredDistance, squaredDistanceComposed, toDoubleArray}

/** Dev-only A/B timer for the k-means assignment inner loop: the codegen'd
  * [[graft.functions.expressions.SquaredDistance]] vs the interpreted
  * `aggregate(zip_with(...))` composition it replaced (VERDICT r4 #2).
  * Same plan shape on both sides (broadcast centroids, argmin, k-row agg);
  * only the distance expression differs.
  *
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.DistanceProbe /root/testdata/sf0.1'
  */
object DistanceProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = 64 // more centroids than the shipped query → loop dominates
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = graft.ops.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    val cents = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    def assignment(native: Boolean) = {
      val dist =
        if (native) squaredDistance(col("v"), col("cv"))
        else squaredDistanceComposed(col("v"), col("cv"))
      emb.crossJoin(broadcast(cents))
        .withColumn("dist", round(dist, 6))
        .groupBy(col("vec_id"))
        .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cluster"),
          min(col("dist")).as("min_dist"))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"), sum(col("min_dist")).as("inertia"))
    }
    def time(name: String)(f: => Unit): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[distprobe] $name%-22s $dt%8.2f s"); dt
    }
    def sink(native: Boolean): Unit =
      assignment(native).write.format("noop").mode("overwrite").save()
    // warm-up both paths, then alternate timed reps
    sink(native = true); sink(native = false)
    val n = (1 to 3).map(i => time(s"native rep$i")(sink(true))).min
    val c = (1 to 3).map(i => time(s"composed rep$i")(sink(false))).min
    println(f"[distprobe] speedup (composed/native, best-of-3): ${c / n}%.2fx")
    spark.stop()
  }
}

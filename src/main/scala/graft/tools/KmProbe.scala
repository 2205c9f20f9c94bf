package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: print the per-round max centroid shift and total inertia of
  * the k-means convergence loop, to pick an honest (ε, maxRounds).
  */
object KmProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(15)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{SimilarityOps, Tables}
    import graft.functions.VectorFunctions._
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
    var cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    for (r <- 1 to rounds) {
      val byDim = SimilarityOps.kmeansRound(emb, cents)
      val inertia = byDim.filter(col("pos") === 0)
        .agg(sum("inertia")).collect()(0).get(0)
      val next = SimilarityOps.centsOf(byDim)
      val shift = next
        .select(col("cid"), posexplode(col("cv")).as(Seq("pos", "m")))
        .join(cents.select(col("cid"),
          posexplode(col("cv")).as(Seq("pos", "m0"))), Seq("cid", "pos"))
        .agg(max(abs(col("m") - col("m0")))).collect()(0).getDouble(0)
      println(f"[km] round $r%2d inertia=$inertia shift=$shift")
      cents = next
    }
  }
}

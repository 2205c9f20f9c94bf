package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Companion to [[ScaleProbe]] (r16): the sf1 run measured the kNN
  * BUILD family super-linear (×20–37 per ×10 data) while every other
  * probed family stayed ≤ linear. The cause is the FIXED sign-LSH
  * banding config: 4 bits/band = 16 buckets regardless of corpus size,
  * so per-bucket occupancy grows ∝ n and the cohabitation cogroup's
  * candidate count ∝ Σ occ² grows ∝ n² — the documented
  * `ann_lsh_occupancy` knob left unturned. This probe measures the
  * remedy ON the derived sf1 corpus: the same [[graft.ops.SimilarityOps
  * .knnJoin]] build at occupancy-scaled bits (buckets ∝ n keeps
  * occupancy, and therefore per-band candidate mass, ∝ n — linear),
  * plus the neighbor-set agreement between the two configs so the
  * speed/recall trade is visible in the same table.
  */
object BandScaleProbe {
  def main(args: Array[String]): Unit = {
    val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/sfprobe/sf1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftOptimizations.install(spark)
    require(new java.io.File(s"$sf1Dir/_DERIVED_OK").exists(),
      s"run graft.tools.ScaleProbe first to derive $sf1Dir")

    def time[T](name: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[band] $name%-40s $dt%8.2f s"); (r, dt)
    }
    def pairs(df: DataFrame): DataFrame =
      df.select(col("vec_id"), col("neighbor_id"))

    // fixed gate config (4 bits = 16 buckets; occupancy ~1250 at 20k)
    val (p4, _) = time("knnJoin sf1 bits=4 bands=20 (build+count)") {
      val p = pairs(graft.ops.SimilarityOps.knnJoin(spark, sf1Dir, 4, 20,
        graft.ops.SimilarityOps.K)).localCheckpoint()
      (p, p.count())
    }
    // occupancy-scaled: 7 bits = 128 buckets (occupancy ~156 — the
    // sf0.1-equivalent load per bucket)
    val (p7, _) = time("knnJoin sf1 bits=7 bands=20 (build+count)") {
      val p = pairs(graft.ops.SimilarityOps.knnJoin(spark, sf1Dir, 7, 20,
        graft.ops.SimilarityOps.K)).localCheckpoint()
      (p, p.count())
    }
    // same scaled buckets, more bands — buys recall back at linear cost
    val (p7b, _) = time("knnJoin sf1 bits=7 bands=40 (build+count)") {
      val p = pairs(graft.ops.SimilarityOps.knnJoin(spark, sf1Dir, 7, 40,
        graft.ops.SimilarityOps.K)).localCheckpoint()
      (p, p.count())
    }
    // counts were computed inside the timed blocks — reuse, don't rescan
    val n4 = p4._2; val n7 = p7._2; val n7b = p7b._2
    def overlap(a: DataFrame, b: DataFrame): Long =
      a.join(b, Seq("vec_id", "neighbor_id")).count()
    val o7 = overlap(p4._1, p7._1); val o7b = overlap(p4._1, p7b._1)
    println(f"[band] pairs: bits4 $n4%d, bits7 $n7%d (agree $o7%d = " +
      f"${o7.toDouble / n4}%.3f of bits4), bits7x40 $n7b%d (agree $o7b%d = " +
      f"${o7b.toDouble / n4}%.3f of bits4)")
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only BPE training depth-cost probe (r15 — VERDICT r14 #4): time
  * [[graft.ops.TextOps.bpeIterate]] at increasing merge depths so the
  * per-merge cost curve is MEASURED, not assumed linear — each round is
  * a pair-count aggregate + a 1-row broadcast merge over the
  * localCheckpointed Zipf-small word table, so depth N should cost ~N ×
  * the per-round constant, and a super-linear bend would mean checkpoint
  * lineage or plan-size creep. Recorded in BASELINE.md's r15 row.
  *
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.BpeProbe /root/testdata/sf0.1 8 16 32 64'
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val depths = if (args.length > 1) args.drop(1).toSeq.map(_.toInt)
      else Seq(8, 16, 32, 64)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(d: Int): Double = {
      val t0 = System.nanoTime()
      graft.ops.TextOps.bpeIterate(spark, dir, d)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }
    run(depths.head) // JIT/codegen warm-up outside timing
    depths.foreach { d =>
      val reps = Seq.fill(2)(run(d))
      println(f"[probe] bpe depth $d%3d  min ${reps.min}%6.2f s  " +
        f"(${reps.min / d}%5.3f s/merge)")
    }
    spark.stop()
  }
}

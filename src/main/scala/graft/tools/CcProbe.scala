package graft.tools
import org.apache.spark.sql.SparkSession
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = graft.ops.DedupOps.dedupMinhashLsh(spark, dir).select("doc_a","doc_b")
    val t0 = System.nanoTime()
    val e = edges.localCheckpoint()
    println(f"[cc] edge build ${(System.nanoTime()-t0)/1e9}%.2f s, edges=${e.count()}")
    println(s"[cc] nodes=${e.selectExpr("doc_a as id").union(e.selectExpr("doc_b")).distinct().count()}")
    val t1 = System.nanoTime()
    val cc = graft.ops.ClusterOps.connectedComponents(e)
    println(f"[cc] cc ${(System.nanoTime()-t1)/1e9}%.2f s, rows=${cc.count()}, comps=${cc.select("rep").distinct().count()}")
    spark.stop()
  }
}

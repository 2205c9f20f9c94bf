package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only: print shuffle-exchange counts for named queries (the
  * PlanLintSpec budget regex) so budgets are measured, not guessed. */
object PlanCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftOptimizations.install(spark)
    val dir = "/root/testdata/sf0.001"
    args.foreach { n =>
      val p = graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString
      val c = ("(?<![A-Za-z])Exchange (hashpartitioning|SinglePartition|" +
        "RoundRobinPartitioning|rangepartitioning)").r.findAllIn(p).size
      println(s"COUNT $n $c")
    }
    spark.stop()
  }
}

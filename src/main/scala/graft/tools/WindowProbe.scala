package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.window.WindowExec
import graft.{GraftOptimizations, SparkEntry}

/** Dev probe: list every SparkEntry query whose physical plan contains an
  * unpartitioned WindowExec, with the window's immediate child node — the
  * scale-killer shape PlanLintSpec bans (a no-partition window funnels its
  * whole input through ONE task).
  */
object WindowProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftOptimizations.install(spark)
    graft.ops.IncrementalDedup.seedQueryStore(spark, dir)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan
        def walk(p: SparkPlan): Seq[String] = {
          val here = p match {
            case w: WindowExec if w.partitionSpec.isEmpty =>
              Seq(s"$name: Window(order=${w.orderSpec.map(_.sql).mkString(",").take(60)}) child=${w.child.nodeName}")
            case _ => Nil
          }
          val kids = p match {
            case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
              Seq(a.inputPlan)
            case other => other.children
          }
          here ++ kids.flatMap(walk) ++ p.subqueries.flatMap(walk)
        }
        walk(plan).foreach(println)
      } catch { case e: Exception => println(s"$name: PLAN FAILED ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}

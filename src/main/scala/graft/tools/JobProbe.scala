package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev-only empirical profiler (guide §1.1 — the "open the Spark UI,
  * find the slowest stage" loop, headless): runs one query warm and
  * prints every job and stage with wall time, task time, shuffle
  * read/write bytes and rows, so the expensive stage is named instead of
  * guessed. The eager localCheckpoints many operators mint at plan
  * construction show up as their own jobs here — exactly the cost the
  * final action's plan hides.
  *
  *   SPARK_GRAFT_CPUS=32 sbt 'runMain graft.tools.JobProbe /root/testdata/sf0.1 knn_delete_repair'
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: JobProbe <sfDir> <query> [query ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftOptimizations.install(spark)
    graft.ops.IncrementalDedup.seedQueryStore(spark, dir)
    graft.ops.GraphEdges.seed(spark, dir)
    graft.ops.DedupEdges.seed(spark, dir)
    graft.ops.SparseIndex.seed(spark, dir)
    graft.ops.HnswIndex.seed(spark, dir)
    graft.ops.KnnLists.seed(spark, dir)

    case class JobRec(id: Int, var desc: String = "", var start: Long = 0,
      var end: Long = 0)
    case class StageRec(jobId: Int, stageId: Int, name: String, wall: Double,
      taskSec: Double, nTasks: Int, inRows: Long, shRead: Long, shWrite: Long,
      outRows: Long, spill: Long)
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val stages = mutable.ArrayBuffer[StageRec]()
    val stageToJob = mutable.Map[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val r = JobRec(js.jobId,
          Option(js.properties.getProperty("spark.job.description"))
            .getOrElse(""), js.time)
        jobs.synchronized { jobs(js.jobId) = r }
        js.stageIds.foreach(sid => stageToJob.synchronized {
          stageToJob(sid) = js.jobId })
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(je.jobId).foreach(_.end = je.time) }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val jid = stageToJob.synchronized {
          stageToJob.getOrElse(si.stageId, -1) }
        stages.synchronized {
          stages += StageRec(jid, si.stageId, si.name,
            (si.completionTime.getOrElse(0L) -
              si.submissionTime.getOrElse(0L)) / 1e3,
            m.executorRunTime / 1e3,
            si.numTasks,
            m.inputMetrics.recordsRead,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.outputMetrics.recordsWritten,
            m.memoryBytesSpilled)
        }
      }
    }

    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // warm-up (JIT + codegen), unprofiled
      sink(fn(spark, dir))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      jobs.clear(); stages.clear(); stageToJob.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      spark.sparkContext.setJobDescription(n)
      sink(fn(spark, dir))
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // drain listener events before reading (the bus is async)
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
      println(f"\n===== $n: total $dt%.2f s, ${jobs.size}%d jobs =====")
      jobs.values.toSeq.sortBy(j => -(j.end - j.start)).take(12).foreach { j =>
        println(f"  job ${j.id}%3d ${(j.end - j.start) / 1e3}%7.2f s  ${j.desc.take(80)}")
      }
      println("  -- slowest stages --")
      stages.toSeq.sortBy(-_.wall).take(14).foreach { st =>
        println(f"  stage ${st.stageId}%4d job ${st.jobId}%3d wall ${st.wall}%6.2f task ${st.taskSec}%7.2f n ${st.nTasks}%3d " +
          f"inRows ${st.inRows}%9d shR ${st.shRead / 1024}%8d KiB shW ${st.shWrite / 1024}%8d KiB  ${st.name.take(60)}")
      }
    }
    spark.stop()
  }
}

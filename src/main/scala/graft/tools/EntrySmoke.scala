package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only: the driver's entry() smoke (rows > 0 at sf0.001). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftOptimizations.install(spark)
    val n = graft.SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS $n")
    spark.stop()
  }
}

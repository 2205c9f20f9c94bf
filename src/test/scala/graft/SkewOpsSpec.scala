package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.PartitionedSink
import graft.ops.SkewOps

class SkewOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("salted join == plain join on skewed data (inner and left_outer)") {
    // 90% of the big side hits one hot key
    val big = (1 to 2000).map(i =>
      (if (i % 10 == 0) i.toLong % 7 else 42L, s"row$i")).toDF("k", "payload")
    val small = Seq((42L, "hot"), (0L, "a"), (3L, "b"), (99L, "unmatched"))
      .toDF("sk", "dim")

    for (jt <- Seq("inner", "left_outer")) {
      val plain = big.join(small, big("k") === small("sk"), jt)
        .select(col("k"), col("payload"), col("dim"))
        .collect().map(_.toString).sorted.toSeq
      val salted = SkewOps.saltedJoin(big, small, "k", "sk", 8, jt)
        .select(col("k"), col("payload"), col("dim"))
        .collect().map(_.toString).sorted.toSeq
      assert(salted == plain, s"joinType=$jt")
    }
  }

  test("salted semi join == plain semi join") {
    val big = (1 to 500).map(i => (i.toLong % 5, i)).toDF("k", "v")
    val small = Seq((1L, "x"), (3L, "y")).toDF("sk", "d")
    val plain = big.join(small, big("k") === small("sk"), "left_semi")
      .collect().map(_.toString).sorted.toSeq
    val salted = SkewOps.saltedJoin(big, small, "k", "sk", 4, "left_semi")
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("partitioned sink: day partitions exist and pruning reaches the scan") {
    val out = Files.createTempDirectory("graft-part").resolve("events_by_day")
    val events = graft.ops.Tables(spark, "/root/testdata/sf0.001", "events")
    PartitionedSink.writeByDay(events, "ts", out.toString)

    val days = Files.list(out).iterator()
    val dayDirs = new scala.collection.mutable.ArrayBuffer[String]()
    days.forEachRemaining(p => if (p.getFileName.toString.startsWith("day="))
      dayDirs += p.getFileName.toString)
    assert(dayDirs.length >= 25, s"expected ~30 day partitions, got $dayDirs")

    val pruned = PartitionedSink.read(spark, out.toString)
      .filter(col("day") === "2024-01-15")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-15"),
      s"partition pruning missing from scan: $scan")
    assert(pruned.count() > 0)
    // row-count parity with the unpartitioned source for that day
    val expected = events
      .filter(date_format(col("ts"), "yyyy-MM-dd") === "2024-01-15").count()
    assert(pruned.count() == expected)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ClusterOps, DedupOps}

/** Connected-components correctness: synthetic graphs with known components
  * (including a long chain, the worst case for plain min-propagation), and
  * the dedup_clusters query against a driver-side union-find ground truth.
  */
class ClusterOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ClusterOps.connectedComponents(edges.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain, clique, and isolated pair resolve to component minima") {
    // chain 10..18 (diameter 8 — needs pointer jumping to converge in few
    // rounds), clique 1-2-3, pair (100, 7); duplicate and reversed edge
    // listings must not perturb anything
    val chain = (10L until 18L).map(i => (i, i + 1))
    val got = components(chain ++ Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (100L, 7L), (2L, 1L), (1L, 2L)))
    (10L to 18L).foreach(i => assert(got(i) == 10L, s"chain node $i"))
    Seq(1L, 2L, 3L).foreach(i => assert(got(i) == 1L))
    assert(got(100L) == 7L && got(7L) == 7L)
    assert(got.size == 14) // only nodes that appear in edges
  }

  test("empty edge set yields an empty, converged result") {
    assert(components(Seq.empty).isEmpty)
  }

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(x => x -> find(x)).toMap
  }

  private def checkAgainstUnionFind(
      got: Array[(Long, Long, Boolean)], edges: Seq[(Long, Long)]): Unit = {
    val expected = unionFind(edges)
    assert(got.map(t => t._1 -> t._2).toMap == expected)
    got.foreach { case (id, rep, keep) => assert(keep == (id == rep)) }
    // exactly one kept representative per cluster
    assert(got.filter(_._3).map(_._1).toSet == expected.values.toSet)
  }

  test("dedup_clusters matches driver-side union-find over the same edges") {
    val edges = DedupOps.dedupNgramJaccard(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "no near-dup edges at sf0.001")
    val got = ClusterOps.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    checkAgainstUnionFind(got, edges.toSeq)
  }

  test("dedup_clusters_lsh matches union-find over the banded-LSH edges") {
    val edges = DedupOps.dedupMinhashShingle(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "no LSH near-dup edges at sf0.001")
    val got = ClusterOps.dedupClustersLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    checkAgainstUnionFind(got, edges.toSeq)
  }
}

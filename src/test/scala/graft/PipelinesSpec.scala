package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end smoke over the sf0.001 test tables: flagship entry plus every
  * declared query runs and returns the expected shape. Value-level
  * correctness is the driver's DuckDB oracle (SparkEntry.oracleSql).
  */
class PipelinesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly rows-only") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // rows-only queries are allowed (approximate/hash-dependent ops) but
    // must be EXACTLY the deliberate, documented list — a stale entry here
    // means a query gained an oracle without this doc keeping up:
    assert(noOracle == RowsOnly.expected,
      s"undocumented rows-only: ${noOracle -- RowsOnly.expected}; " +
        s"stale RowsOnly entries: ${RowsOnly.expected -- noOracle}")
  }

  test("all queries execute with rows > 0 at sf0.001") {
    graft.ops.IncrementalDedup.seedQueryStore(spark, dir)
    val empty = SparkEntry.queries.collect {
      case (name, fn) if fn(spark, dir).count() == 0 => name
    }
    assert(empty.isEmpty, s"queries returned zero rows: $empty")
  }
}

/** Queries intentionally lacking a DuckDB oracle (hash/model-dependent). */
object RowsOnly {
  val expected: Set[String] =
    // (dedup_minhash_lsh left the registry in r10 — the xxhash64 minhash
    // operator is public API + spec-pinned, its md5 twin
    // dedup_minhash_shingle carries the oracle; the sign-LSH family and
    // clusters_lsh moved to md5 hyperplanes/edges in r9):
    Set(
      // Spark-internal HLL, not SQL-expressible (deterministic md5 HLL
      // sibling: hll_estimate, oracle-backed)
      "cardinality_sketches",
      // stop-round count is float-convergence-dependent; IterativeOpsSpec
      // pins trace ≡ fixed-round iterate at the observed R + strict descent
      "kmeans_converged")
}

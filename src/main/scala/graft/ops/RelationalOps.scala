package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining classic TPC-H query shapes, adapted to the reduced test
  * schema (no partsupp / l_shipmode / commit-receipt dates / c_phone —
  * each adaptation keeps the SHAPE that makes the query a distinct
  * operator exercise: EXISTS/NOT-EXISTS semi/anti joins, correlated
  * scalar aggregates, HAVING-vs-global-scalar cuts, outer-join count
  * distributions, argmax-by-scalar-subquery selection).
  *
  * Scale notes apply throughout: nation/supplier are broadcast-sized
  * dimensions (25 / 100 rows — and in real TPC-H still tiny relative to
  * facts); fact-fact joins shuffle on their natural keys and AQE picks
  * the strategy for derived survivor sets (the q18/q10 discipline —
  * no fixed broadcast hints on linearly-growing sides).
  */
object RelationalOps {

  private def ts(d: String) = lit(d).cast("timestamp")

  /** TPC-H Q4 shape: EXISTS — orders in a quarter with at least one line
    * shipped more than 60 days after ordering, counted per priority.
    * Plans as a left-semi join on the order key; the date conjunct rides
    * the join condition, not a post-filter.
    */
  def q4OrderPriority(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1996-04-01"))
    val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    o.join(li,
        o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4Oracle: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate <  TIMESTAMP '1996-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q7 shape: volume shipping between two nations — supplier
    * nation × customer nation × ship year, with the disjunctive
    * nation-pair predicate. Both nation joins broadcast (25 rows); the
    * lineitem-orders join is the only fact-fact shuffle.
    */
  def q7VolumeShipping(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables(s, dir, "nation")
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    val n2 = Tables(s, dir, "nation")
      .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
    val sup = Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val cust = Tables(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val ord = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    Tables(s, dir, "lineitem")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("snk"))
      .join(broadcast(n2), col("c_nationkey") === col("cnk"))
      .filter(
        (col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
        (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7Oracle: String =
    """SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |         CAST(year(l_shipdate) AS INT) AS l_year,
      |         l_extendedprice * (1 - l_discount) AS volume
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
      |     OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** TPC-H Q8 shape: national market share — of all PROMO-type sales to
    * ASIA-region customers, the fraction supplied by NATION_19, per
    * order year. Two conditional sums in one aggregation; region, nation
    * and the type-filtered part list broadcast; the share division is
    * rounded at 6 (the one order-dependent double op in the query).
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = Tables(s, dir, "nation")
      .join(broadcast(Tables(s, dir, "region")
        .filter(col("r_name") === "ASIA").select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"), "left_semi")
      .select(col("n_nationkey"))
    val suppNation = Tables(s, dir, "supplier")
      .join(broadcast(Tables(s, dir, "nation")
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val promoParts = Tables(s, dir, "part")
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val cust = Tables(s, dir, "customer")
      .join(broadcast(asiaNations),
        col("c_nationkey") === col("n_nationkey"), "left_semi")
      .select(col("c_custkey"))
    Tables(s, dir, "lineitem")
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).as("o_year"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"),
        col("supp_nation"))
      .groupBy(col("o_year"))
      .agg(
        round(sum(when(col("supp_nation") === "NATION_19", col("volume"))
          .otherwise(0.0)) / sum(col("volume")), 6).as("mkt_share"),
        round(sum(col("volume")), 2).as("total_volume"))
      .orderBy("o_year")
  }

  val q8Oracle: String =
    """SELECT o_year,
      |       round(sum(CASE WHEN supp_nation = 'NATION_19' THEN volume
      |                      ELSE 0 END) / sum(volume), 6) AS mkt_share,
      |       round(sum(volume), 2) AS total_volume
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |         l_extendedprice * (1 - l_discount) AS volume,
      |         n2.n_name AS supp_nation
      |  FROM lineitem
      |  JOIN part ON p_partkey = l_partkey AND p_type = 'PROMO'
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation n1 ON n1.n_nationkey = c_nationkey
      |  JOIN region ON r_regionkey = n1.n_regionkey AND r_name = 'ASIA'
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation n2 ON n2.n_nationkey = s_nationkey)
      |GROUP BY o_year ORDER BY o_year""".stripMargin

  /** TPC-H Q16 shape (lineitem as the part-supplier bridge): distinct
    * supplier counts per (brand, size) for a part subset, excluding
    * "complaint" suppliers (negative account balance stands in for the
    * comment LIKE filter) — NOT-IN anti join + grouped COUNT DISTINCT.
    */
  def q16SupplierCount(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables(s, dir, "part")
      .filter(col("p_size").isin(5, 15, 25, 35, 45) &&
        col("p_brand") =!= "Brand#4")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val complaint = Tables(s, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(complaint),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
  }

  val q16Oracle: String =
    """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_size IN (5, 15, 25, 35, 45) AND p_brand <> 'Brand#4'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  /** TPC-H Q20 shape (shipped quantity stands in for partsupp
    * availability): NATION_19 suppliers who moved more than 100 units of
    * 'small *' parts — a HAVING-gated per-supplier aggregate feeding a
    * semi join into the supplier dimension. Quantities are integral
    * doubles, so the HAVING cut needs no rounding guard.
    */
  def q20ExcessSuppliers(s: SparkSession, dir: String): DataFrame = {
    val smallParts = Tables(s, dir, "part")
      .filter(col("p_name").startsWith("small ")).select(col("p_partkey"))
    val movers = Tables(s, dir, "lineitem")
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 100)
    val n19 = Tables(s, dir, "nation")
      .filter(col("n_name") === "NATION_19").select(col("n_nationkey"))
    Tables(s, dir, "supplier")
      .join(broadcast(n19), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(movers, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy("s_name")
  }

  val q20Oracle: String =
    """SELECT s_suppkey, s_name, s_acctbal
      |FROM supplier
      |WHERE s_nationkey IN (SELECT n_nationkey FROM nation
      |                      WHERE n_name = 'NATION_19')
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM lineitem
      |    WHERE l_partkey IN (SELECT p_partkey FROM part
      |                        WHERE p_name LIKE 'small %')
      |    GROUP BY l_suppkey HAVING sum(l_quantity) > 100)
      |ORDER BY s_name""".stripMargin

  /** TPC-H Q9 shape: product-type profit by nation and year. The schema
    * has no partsupp, so supply cost is synthesized as half the part's
    * retail price — preserving the 5-way fact-dimension join and the
    * nation × year rollup that define the query.
    */
  def q9ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    val prt = Tables(s, dir, "part").select(col("p_partkey"), col("p_retailprice"))
    val ord = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
    Tables(s, dir, "lineitem")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(prt, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(
        col("l_extendedprice") * (lit(1) - col("l_discount")) -
          lit(0.5) * col("p_retailprice") * col("l_quantity")), 2)
        .as("sum_profit"))
      .orderBy("nation", "o_year")
  }

  val q9Oracle: String =
    """SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
      |FROM (
      |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
      |         l_extendedprice * (1 - l_discount)
      |           - 0.5 * p_retailprice * l_quantity AS amount
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN part     ON p_partkey = l_partkey
      |  JOIN orders   ON o_orderkey = l_orderkey
      |  JOIN nation   ON n_nationkey = s_nationkey)
      |GROUP BY nation, o_year ORDER BY nation, o_year""".stripMargin

  /** TPC-H Q11 shape: parts whose shipped value (through one nation's
    * suppliers) exceeds a fraction of the national total — a grouped
    * aggregate HAVING-compared against a scalar subquery over the SAME
    * aggregate. Spark computes the per-part frame once; the total is a
    * 1-row broadcast against it (exchange reuse, no second scan at plan
    * level). Both sides of the cut are rounded to 2 so the boundary is
    * engine-deterministic.
    */
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables(s, dir, "nation")
      .filter(col("n_name") === "NATION_3").select(col("n_nationkey"))
    val pv = Tables(s, dir, "lineitem")
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(col("l_quantity") * col("l_extendedprice")).as("value"))
    val cut = pv.agg((sum(col("value")) * lit(0.002)).as("cut"))
    pv.crossJoin(broadcast(cut))
      .filter(round(col("value"), 2) > round(col("cut"), 2))
      .select(col("p_partkey"), round(col("value"), 2).as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  val q11Oracle: String =
    """WITH pv AS (
      |  SELECT l_partkey AS p_partkey,
      |         sum(l_quantity * l_extendedprice) AS value
      |  FROM lineitem
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation   ON n_nationkey = s_nationkey
      |  WHERE n_name = 'NATION_3'
      |  GROUP BY l_partkey)
      |SELECT p_partkey, round(value, 2) AS value
      |FROM pv
      |WHERE round(value, 2) > (SELECT round(sum(value) * 0.002, 2) FROM pv)
      |ORDER BY round(value, 2) DESC, p_partkey""".stripMargin

  /** TPC-H Q12 shape: conditional priority-class counts after a
    * fact-fact join (l_returnflag stands in for the absent l_shipmode).
    * `count(when(...))` compiles to the same conditional count as the
    * oracle's FILTER clause — BIGINT on both engines, no HUGEINT trap.
    */
  def q12PriorityClasses(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1997-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(when(high, lit(1))).as("high_line_count"),
        count(when(!high, lit(1))).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  val q12Oracle: String =
    """SELECT l_returnflag,
      |       count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
      |         AS high_line_count,
      |       count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
      |         AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    * join with a predicate ON THE JOIN (not a post-filter: customers
    * whose only orders are filtered out must still count as 0), then a
    * histogram of the per-customer counts. Two keyed shuffles.
    */
  def q13CustomerDistribution(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    val perCust = Tables(s, dir, "customer").select(col("c_custkey"))
      .join(ord,
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "5-LOW",
        "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Oracle: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15 shape: top supplier by quarterly revenue — the revenue
    * aggregate is computed once, its max is a 1-row broadcast scalar, and
    * the argmax selection is an equality filter against it (revenue
    * rounded BEFORE the max so the tie-set is engine-deterministic).
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    val revenue = Tables(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("total_revenue"))
    val mx = revenue.agg(max(col("total_revenue")).as("mx"))
    Tables(s, dir, "supplier")
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("mx"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15Oracle: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate <  TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17 shape: revenue impact of small-quantity orders — a
    * correlated per-part average re-expressed as a grouped aggregate
    * joined back to the fact rows. The per-part threshold join is
    * AQE-decided (the brand filter shrinks it, but it grows with the
    * part count). Quantities are integral doubles, so the per-part
    * average is bit-exact on both engines and the `<` cut needs no
    * rounding guard.
    */
  def q17SmallQuantity(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val brandParts = Tables(s, dir, "part")
      .filter(col("p_brand") === "Brand#23").select(col("p_partkey"))
    val avgQty = li.groupBy(col("l_partkey").as("ak"))
      .agg((avg(col("l_quantity")) * lit(0.2)).as("qty_cut"))
    li.join(broadcast(brandParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(avgQty, col("l_partkey") === col("ak"))
      .filter(col("l_quantity") < col("qty_cut"))
      .agg(round(sum(col("l_extendedprice")) / lit(7.0), 2).as("avg_yearly"),
        count(lit(1)).as("n_small"))
  }

  val q17Oracle: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
      |       count(*) AS n_small
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#23'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q21 shape (adapted to shipdate-only): suppliers who were the
    * LAST to ship in multi-supplier finished orders — EXISTS (another
    * supplier in the order) AND NOT EXISTS (another supplier shipping
    * strictly later), i.e. one left-semi and one left-anti self-join of
    * lineitem on the order key, both shuffling on l_orderkey so AQE
    * co-plans them.
    */
  def q21WaitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    // EXISTS/NOT-EXISTS decorrelated to AGGREGATES (r6 rewrite): a
    // supplier s in order o survives the NOT-EXISTS (no OTHER supplier
    // ships later than some row of s) iff ms(o,s) ≥ max_{s'≠s} ms(o,s')
    // where ms is the per-supplier max shipdate — and by tie
    // case-analysis that is exactly ms(o,s) = max_s ms(o,s). The EXISTS
    // (another supplier on the order) is nsupp ≥ 2. So three lineitem
    // self-shuffles with pairwise O(items²/order) predicates collapse
    // into TWO keyed aggregates ((o,s) then o) + one co-keyed attach.
    // Honest accounting: A/B at sf0.1 local[32] is a WASH (~1.7 s warm
    // both shapes — the 22.6 s driver reading was shared-box contention,
    // BASELINE.md r5 note); the rewrite is kept for the SCALE shape:
    // per-order state drops from O(items²) SMJ pair-buffering to two
    // algebraic aggregates, and lineitem shuffles from 3 to 1. The
    // oracle keeps the definitional EXISTS/NOT-EXISTS SQL.
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val fOrders = Tables(s, dir, "orders")
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val perSupp = li.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("l_shipdate")).as("ms"))
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(max(col("ms")).as("m1"), count(lit(1)).as("nsupp"))
    val waiting = perSupp.join(perOrder, "l_orderkey")
      .filter(col("nsupp") >= 2 && col("ms") === col("m1"))
      .join(fOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_suppkey"))
    waiting
      .join(broadcast(Tables(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  val q21Oracle: String =
    """SELECT s_name, count(*) AS numwait
      |FROM (
      |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
      |  FROM lineitem l1
      |  JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      |  WHERE EXISTS (SELECT 1 FROM lineitem l2
      |                WHERE l2.l_orderkey = l1.l_orderkey
      |                  AND l2.l_suppkey <> l1.l_suppkey)
      |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                    WHERE l3.l_orderkey = l1.l_orderkey
      |                      AND l3.l_suppkey <> l1.l_suppkey
      |                      AND l3.l_shipdate > l1.l_shipdate)) t
      |JOIN supplier ON s_suppkey = t.l_suppkey
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  /** TPC-H Q22 shape (c_nationkey stands in for the phone country code):
    * well-funded customers from a nation subset with no RECENT orders —
    * a global-average scalar subquery feeding a filter, then an anti
    * join against the filtered order feed (the dormancy cutoff keeps the
    * anti join non-vacuous on this testdata, where every customer has
    * SOME order). The acctbal cut compares raw doubles: the scalar
    * differs between engines only in final-ulp accumulation order, and no
    * customer balance sits within 1e-9 of it (balances have 2-decimal
    * granularity).
    */
  def q22GlobalSales(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
      .filter(col("c_nationkey") < 7)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("abal"))
    cust.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("abal"))
      .join(Tables(s, dir, "orders")
          .filter(col("o_orderdate") >= ts("1999-01-01"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy("cntrycode")
  }

  val q22Oracle: String =
    """SELECT c_nationkey AS cntrycode, count(*) AS numcust,
      |       round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer
      |WHERE c_nationkey < 7
      |  AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                   WHERE c_acctbal > 0 AND c_nationkey < 7)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-01-01')
      |GROUP BY c_nationkey ORDER BY cntrycode""".stripMargin

  /** TPC-H Q2 shape (lineitem as the part-supplier bridge — no partsupp
    * in this schema): for each large part, the cheapest supplier that has
    * shipped it (min acctbal, supplier key tie-break) — the classic
    * argmin-per-group-with-join. `min_by` over a struct gives the argmin
    * in ONE aggregation pass (no self-join back, no window): the
    * (part, supplier) bridge dedups in the same shuffle the argmin uses.
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val bigParts = Tables(s, dir, "part")
      .filter(col("p_size") >= 48).select(col("p_partkey"))
    val sup = Tables(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    Tables(s, dir, "lineitem")
      .join(broadcast(bigParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey").as("p_partkey"), col("l_suppkey"))
      .distinct()
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("p_partkey"))
      .agg(min_by(
        struct(col("s_suppkey"), col("s_name"), col("s_acctbal")),
        struct(col("s_acctbal"), col("s_suppkey"))).as("m"))
      .select(col("p_partkey"), col("m.s_suppkey").as("s_suppkey"),
        col("m.s_name").as("s_name"), col("m.s_acctbal").as("s_acctbal"))
      .orderBy("p_partkey")
  }

  val q2Oracle: String =
    """SELECT p_partkey, s_suppkey, s_name, s_acctbal FROM (
      |  SELECT b.p_partkey, s.s_suppkey, s.s_name, s.s_acctbal,
      |         row_number() OVER (PARTITION BY b.p_partkey
      |           ORDER BY s.s_acctbal, s.s_suppkey) AS rn
      |  FROM (SELECT DISTINCT l_partkey AS p_partkey, l_suppkey
      |        FROM lineitem
      |        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 48)) b
      |  JOIN supplier s ON s.s_suppkey = b.l_suppkey)
      |WHERE rn = 1 ORDER BY p_partkey""".stripMargin

  /** Bloom-filter semi join — [[graft.functions.BloomFunctions]] builds the
    * runtime-filter gate explicitly: lineitem rows pass `might_contain`
    * (a false-positive-only superset test against the finished-order key
    * set) BEFORE the exchange, then the exact left-semi join settles the
    * survivors. The oracle is the plain EXISTS — proving the bloom stage
    * changes the plan, not the answer. At 100 TB the payoff is that the
    * probe shuffle carries only (roughly) matching rows; the false-positive
    * overshoot is bounded by the filter's FPP, not the data.
    */
  def bloomSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val fKeys = Tables(s, dir, "orders")
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_extendedprice"), col("l_discount"))
      .filter(graft.functions.BloomFunctions.bloomMightContain(
        fKeys, expectedItems = 200000L, value = col("l_orderkey")))
      .join(fKeys, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy("l_returnflag")
  }

  val bloomSemiJoinOracle: String =
    """SELECT l_returnflag, count(*) AS n_lines,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** 2-D skyline (Pareto frontier): parts minimizing retail price while
    * maximizing size — no other part is at-least-as-cheap AND
    * at-least-as-large with one strict. Plans WITHOUT the quadratic
    * NOT-EXISTS self-join the definition suggests: collapse to one row
    * per distinct price (keyed aggregate), then compute the
    * strictly-cheaper running max WITHOUT a price-domain-sized
    * single-task window (re-sharded r9 — the r6 shape ran one
    * no-partition window over the distinct-price aggregate, whose ~120k
    * bound GROWS with scale factor, the one whitelist entry VERDICT r8
    * flagged): decile cutpoints over the price aggregate (one percentile
    * pass, 1-row broadcast — the [[AnalyticsOps.globalRank]] shape) split
    * prices into ≤10 range buckets; the running max is then bucket-LOCAL
    * (window partitioned by bucket — a keyed shuffle, never one task)
    * combined with broadcast strictly-before bucket prefix-maxima (a
    * ≤10-row no-partition window). Range bucketing by VALUE keeps the
    * strict-inequality semantics exact: equal prices share a bucket, and
    * any price in an earlier bucket is strictly cheaper (bucket(p') <
    * bucket(p) ⇒ ∃cut: p' ≤ cut < p). `greatest` is null-skipping on
    * both engines, so the global minimum price (no local predecessor, no
    * earlier bucket) keeps its NULL → unconditional frontier membership.
    * The oracle IS the quadratic NOT EXISTS, so the gate proves the
    * bucketed formulation exact, duplicate and tie semantics included
    * (equal points do not dominate each other; both survive).
    */
  def paretoFrontier(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables(s, dir, "part")
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
    val perPrice = p.groupBy(col("p_retailprice"))
      .agg(max(col("p_size")).as("best_size"))
    val ps = (1 to 9).map(_ / 10.0)
    val cuts = perPrice
      .agg(percentile(col("p_retailprice"), array(ps.map(lit): _*)).as("cuts"))
    val bucketExpr = (1 to 9).foldLeft(lit(1)) { (acc, i) =>
      acc + when(col("p_retailprice") > element_at(col("cuts"), i), 1)
        .otherwise(0)
    }
    val bucketed = perPrice.crossJoin(broadcast(cuts))
      .select(col("p_retailprice"), col("best_size"), bucketExpr.as("bucket"))
    val localW = Window.partitionBy(col("bucket"))
      .orderBy(col("p_retailprice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed
      .withColumn("local_max_lt", max(col("best_size")).over(localW))
    val bucketPrefix = bucketed.groupBy(col("bucket"))
      .agg(max(col("best_size")).as("bmax"))
      .withColumn("prefix_max_lt",
        max(col("bmax")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("bucket"), col("prefix_max_lt"))
    val frontier = local.join(broadcast(bucketPrefix), "bucket")
      .withColumn("run_max_lt",
        greatest(col("local_max_lt"), col("prefix_max_lt")))
      .select(col("p_retailprice"), col("best_size"), col("run_max_lt"))
    p.join(frontier, "p_retailprice")
      .filter(col("p_size") === col("best_size") &&
        (col("run_max_lt").isNull || col("run_max_lt") < col("p_size")))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy("p_partkey")
  }

  val paretoFrontierOracle: String =
    """SELECT p_partkey, p_retailprice, p_size
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_retailprice <= p.p_retailprice
      |    AND q.p_size >= p.p_size
      |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
      |ORDER BY p_partkey""".stripMargin

  /** Wide→long melt (`Dataset.unpivot`, the relational UNPIVOT): per-flag
    * measure totals melted to (flag, metric, total) rows — the shape every
    * metrics store ingests. The unpivot itself is NARROW (an Expand over
    * the already-aggregated 3-row table); all data-sized work happens in
    * the keyed aggregate before it.
    */
  def unpivotMetrics(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("quantity"),
        round(sum(col("l_extendedprice")), 2).as("extendedprice"),
        round(sum(col("l_discount")), 2).as("discount"),
        round(sum(col("l_tax")), 2).as("tax"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("quantity"), col("extendedprice"), col("discount"), col("tax")),
        "metric", "total")
      .orderBy("l_returnflag", "metric")
  }

  val unpivotMetricsOracle: String =
    """WITH w AS (
      |  SELECT l_returnflag,
      |         round(sum(l_quantity), 2) AS quantity,
      |         round(sum(l_extendedprice), 2) AS extendedprice,
      |         round(sum(l_discount), 2) AS discount,
      |         round(sum(l_tax), 2) AS tax
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, metric, total FROM (
      |  SELECT l_returnflag, 'quantity' AS metric, quantity AS total FROM w
      |  UNION ALL SELECT l_returnflag, 'extendedprice', extendedprice FROM w
      |  UNION ALL SELECT l_returnflag, 'discount', discount FROM w
      |  UNION ALL SELECT l_returnflag, 'tax', tax FROM w)
      |ORDER BY l_returnflag, metric""".stripMargin

  /** Referential-integrity audit over the star schema's four FK edges:
    * per relationship, orphaned child keys (anti join child→parent) and
    * unreferenced parent rows (anti join parent→child). Each direction is
    * ONE anti join aggregated to a scalar — dimension sides broadcast,
    * the fact-fact edge shuffles on its key; the four relationship rows
    * union. The audit every warehouse load gate runs before publishing.
    */
  def integrityAudit(s: SparkSession, dir: String): DataFrame = {
    def edge(name: String, child: DataFrame, ck: String,
        parent: DataFrame, pk: String): DataFrame = {
      val orphans = child.select(col(ck))
        .join(parent.select(col(pk)), col(ck) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
      val unreferenced = parent.select(col(pk))
        .join(child.select(col(ck)), col(pk) === col(ck), "left_anti")
        .agg(count(lit(1)).as("n_unreferenced"))
      orphans.crossJoin(broadcast(unreferenced))
        .select(lit(name).as("fk"), col("n_orphans"), col("n_unreferenced"))
    }
    val li = Tables(s, dir, "lineitem")
    edge("lineitem.l_orderkey->orders", li, "l_orderkey",
        Tables(s, dir, "orders"), "o_orderkey")
      .unionAll(edge("lineitem.l_partkey->part", li, "l_partkey",
        Tables(s, dir, "part"), "p_partkey"))
      .unionAll(edge("lineitem.l_suppkey->supplier", li, "l_suppkey",
        Tables(s, dir, "supplier"), "s_suppkey"))
      .unionAll(edge("orders.o_custkey->customer", Tables(s, dir, "orders"),
        "o_custkey", Tables(s, dir, "customer"), "c_custkey"))
      .orderBy("fk")
  }

  val integrityAuditOracle: String =
    """SELECT * FROM (
      |SELECT 'lineitem.l_orderkey->orders' AS fk,
      |  (SELECT count(*) FROM lineitem WHERE NOT EXISTS
      |    (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS n_orphans,
      |  (SELECT count(*) FROM orders WHERE NOT EXISTS
      |    (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)) AS n_unreferenced
      |UNION ALL
      |SELECT 'lineitem.l_partkey->part',
      |  (SELECT count(*) FROM lineitem WHERE NOT EXISTS
      |    (SELECT 1 FROM part WHERE p_partkey = l_partkey)),
      |  (SELECT count(*) FROM part WHERE NOT EXISTS
      |    (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey))
      |UNION ALL
      |SELECT 'lineitem.l_suppkey->supplier',
      |  (SELECT count(*) FROM lineitem WHERE NOT EXISTS
      |    (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)),
      |  (SELECT count(*) FROM supplier WHERE NOT EXISTS
      |    (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey))
      |UNION ALL
      |SELECT 'orders.o_custkey->customer',
      |  (SELECT count(*) FROM orders WHERE NOT EXISTS
      |    (SELECT 1 FROM customer WHERE c_custkey = o_custkey)),
      |  (SELECT count(*) FROM customer WHERE NOT EXISTS
      |    (SELECT 1 FROM orders WHERE o_custkey = c_custkey)))
      |ORDER BY fk""".stripMargin

  /** Month-over-month revenue growth: monthly totals (one keyed
    * aggregate), then lag + percent change over the MONTH-CARDINALITY
    * table — the sequential window runs on dozens of rows regardless of
    * fact size. Growth is computed on the already-rounded monthly totals
    * so both engines difference identical inputs.
    */
  def monthlyGrowth(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = Tables(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
    monthly
      .withColumn("prev", lag(col("revenue"), 1).over(Window.orderBy(col("m"))))
      .select(date_format(col("m"), "yyyy-MM").as("month"), col("revenue"),
        round((col("revenue") - col("prev")) / col("prev") * 100, 4)
          .as("pct_growth"))
      .orderBy("month")
  }

  val monthlyGrowthOracle: String =
    """WITH monthly AS (
      |  SELECT date_trunc('month', o_orderdate) AS m,
      |         round(sum(o_totalprice), 2) AS revenue
      |  FROM orders GROUP BY 1)
      |SELECT strftime(m, '%Y-%m') AS month, revenue,
      |       round((revenue - lag(revenue, 1) OVER (ORDER BY m))
      |             / lag(revenue, 1) OVER (ORDER BY m) * 100, 4) AS pct_growth
      |FROM monthly ORDER BY month""".stripMargin

  /** Incremental aggregate maintenance — the materialized-view algebra:
    * per-user event stats maintained by MERGING partial aggregate states
    * (base ⊎ delta) instead of recomputing from all rows. The split is
    * deterministic (event_id % 5: four fifths "already aggregated" base,
    * one fifth "new arrivals"); each side folds to algebraic partials
    * (count, sum, min, max), and the merge is sum-of-counts, sum-of-sums,
    * min-of-mins, max-of-maxes, with avg DERIVED from merged sum/count —
    * never averaged-of-averages. The ORACLE is the full recompute over all
    * events, so the green row proves the maintenance algebra exact, not
    * just plausible.
    *
    * Scale: this is why 100 TB dashboards refresh in minutes — the update
    * pass scans ONLY the delta; the base rides as its (users-sized) partial
    * state. Both sides here scan the same file only because the fixture is
    * one table; the plan shape (two pruned scans → two keyed partials →
    * one users-sized merge agg) is the production one.
    */
  def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    def partials(src: DataFrame): DataFrame = src
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
    val ev = Tables(s, dir, "events").select(col("user_id"), col("value"),
      col("event_id"))
    val base = partials(ev.filter(col("event_id") % 5 =!= 4))
    val delta = partials(ev.filter(col("event_id") % 5 === 4))
    base.unionByName(delta)
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_events"),
        round(sum(col("sum_v")), 4).as("sum_value"),
        round(sum(col("sum_v")) / sum(col("n")), 4).as("avg_value"),
        min(col("min_v")).as("min_value"),
        max(col("max_v")).as("max_value"))
      .orderBy("user_id")
  }

  val incrementalAggOracle: String =
    """SELECT user_id, count(*) AS n_events,
      |       round(sum(value), 4) AS sum_value,
      |       round(sum(value) / count(*), 4) AS avg_value,
      |       min(value) AS min_value, max(value) AS max_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Snapshot diff / reconciliation: compare two versions of the orders
    * table (the "next snapshot" derived deterministically — deletes where
    * key % 97 = 0, 5% price uplift where key % 13 = 0, re-keyed inserts
    * where key % 101 = 0) and report per-status row counts plus the total
    * absolute price drift of changed rows — the audit every CDC/backfill
    * pipeline runs before swapping snapshots.
    *
    * Scale shape: ONE full-outer join on the snapshot key (co-partitioned
    * hash shuffle per side — outer joins cannot broadcast), status
    * classified per row by null-ness and column comparison (codegen'd
    * conditionals, no row fingerprint string-building — doubles compare
    * exactly, never via formatted hashes), then a tiny status rollup.
    */
  def tableDiff(s: SparkSession, dir: String): DataFrame = {
    val old = Tables(s, dir, "orders")
      .select(col("o_orderkey").as("k_old"),
        col("o_totalprice").as("price_old"))
    val nw = Tables(s, dir, "orders")
      .filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") * 1.05)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
      .unionAll(Tables(s, dir, "orders")
        .filter(col("o_orderkey") % 101 === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          (col("o_totalprice") * 0.5).as("o_totalprice")))
      .select(col("o_orderkey").as("k_new"),
        col("o_totalprice").as("price_new"))
    old.join(nw, col("k_old") === col("k_new"), "full_outer")
      .select(
        when(col("k_old").isNull, "added")
          .when(col("k_new").isNull, "removed")
          .when(col("price_old") =!= col("price_new"), "changed")
          .otherwise("unchanged").as("status"),
        abs(coalesce(col("price_new"), lit(0.0)) -
          coalesce(col("price_old"), lit(0.0))).as("drift"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(when(col("status") === "changed", col("drift"))
          .otherwise(0.0)), 2).as("price_drift"))
      .orderBy("status")
  }

  val tableDiffOracle: String =
    """WITH old AS (
      |  SELECT o_orderkey AS k_old, o_totalprice AS price_old FROM orders),
      |nw AS (
      |  SELECT o_orderkey AS k_new,
      |         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 1.05
      |              ELSE o_totalprice END AS price_new
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_totalprice * 0.5
      |  FROM orders WHERE o_orderkey % 101 = 0),
      |classified AS (
      |  SELECT CASE WHEN k_old IS NULL THEN 'added'
      |              WHEN k_new IS NULL THEN 'removed'
      |              WHEN price_old <> price_new THEN 'changed'
      |              ELSE 'unchanged' END AS status,
      |         abs(coalesce(price_new, 0) - coalesce(price_old, 0)) AS drift
      |  FROM old FULL OUTER JOIN nw ON k_old = k_new)
      |SELECT status, count(*) AS n_rows,
      |       round(sum(CASE WHEN status = 'changed' THEN drift
      |                      ELSE 0 END), 2) AS price_drift
      |FROM classified GROUP BY status ORDER BY status""".stripMargin

  /** Probabilistic record linkage (the Fellegi–Sunter decision model,
    * JASA '69, reduced to its deterministic core): do supplier and
    * customer registry rows describe the same party? The operator
    * demonstrates the three mechanics every entity-resolution pipeline
    * at scale is built from, on the fields this schema shares:
    *
    *  1. **Banded blocking, never a cross join**: candidates must share
    *     (nationkey, acctbal-band) — the supplier side explodes to its
    *     band ±1 (3 rows, the standard trick so near-boundary matches
    *     can't be lost), the join is a plain equi-join on the composite
    *     block key, and per-block fanout is bounded by block population,
    *     independent of table sizes.
    *  2. **Agreement vector → additive log-weight score**: balance
    *     proximity in EXACT CENTS (tiers +3/+2/+1 — doubles never
    *     compared, the [[tableDiff]] cents discipline) plus a
    *     registration-digit agreement (+0.5), summed like
    *     Fellegi–Sunter log2(m/u) field weights.
    *  3. **Best-match resolution**: one row per supplier — top score,
    *     ties broken by smaller cent distance then key (fully
    *     deterministic), with the surviving candidate count kept for
    *     audit.
    *
    * A pair can only meet in the CUSTOMER's own band (the exploded side
    * must equal it), so banding introduces no duplicates and needs no
    * distinct.
    */
  def recordLinkage(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = (c: org.apache.spark.sql.Column) =>
      round(c * 100).cast("long")
    val band = 100000L // 1000.00 currency units, in cents
    val sup = Tables(s, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"),
        cents(col("s_acctbal")).as("s_cents"))
      .withColumn("b0", expr(s"s_cents DIV $band"))
      .select(col("s_suppkey"), col("s_nationkey"), col("s_cents"),
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("blk"))
    val cust = Tables(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"),
        cents(col("c_acctbal")).as("c_cents"))
      .withColumn("blk", expr(s"c_cents DIV $band"))
    val scored = sup.join(cust,
        col("s_nationkey") === col("c_nationkey") &&
          sup("blk") === cust("blk"))
      .withColumn("dcents", abs(col("s_cents") - col("c_cents")))
      .filter(col("dcents") <= 25000L)
      .withColumn("score",
        when(col("dcents") <= 5000L, 3.0)
          .when(col("dcents") <= 10000L, 2.0).otherwise(1.0) +
        when(col("s_suppkey") % 10 === col("c_custkey") % 10, 0.5)
          .otherwise(0.0))
      .filter(col("score") >= 1.0)
    val bySup = Window.partitionBy(col("s_suppkey"))
    val ranked = scored
      .withColumn("n_candidates", count(lit(1)).over(bySup))
      .withColumn("rank", row_number().over(bySup.orderBy(
        col("score").desc, col("dcents"), col("c_custkey"))))
    ranked.filter(col("rank") === 1)
      .select(col("s_suppkey"), col("c_custkey"), col("score"),
        col("dcents"), col("n_candidates"))
      .orderBy("s_suppkey")
  }

  val recordLinkageOracle: String =
    """WITH sup AS (
      |  SELECT s_suppkey, s_nationkey,
      |         CAST(round(s_acctbal * 100) AS BIGINT) AS s_cents
      |  FROM supplier),
      |sup_b AS (
      |  SELECT s_suppkey, s_nationkey, s_cents,
      |         (s_cents // 100000) + d AS blk
      |  FROM sup, LATERAL unnest([-1, 0, 1]) AS t(d)),
      |cust AS (
      |  SELECT c_custkey, c_nationkey,
      |         CAST(round(c_acctbal * 100) AS BIGINT) AS c_cents,
      |         CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS blk
      |  FROM customer),
      |scored AS (
      |  SELECT s_suppkey, c_custkey,
      |         abs(s_cents - c_cents) AS dcents,
      |         (CASE WHEN abs(s_cents - c_cents) <= 5000 THEN 3.0
      |               WHEN abs(s_cents - c_cents) <= 10000 THEN 2.0
      |               ELSE 1.0 END
      |          + CASE WHEN s_suppkey % 10 = c_custkey % 10 THEN 0.5
      |                 ELSE 0.0 END) AS score
      |  FROM sup_b JOIN cust
      |    ON s_nationkey = c_nationkey AND sup_b.blk = cust.blk
      |  WHERE abs(s_cents - c_cents) <= 25000),
      |ranked AS (
      |  SELECT s_suppkey, c_custkey, score, dcents,
      |         count(*) OVER (PARTITION BY s_suppkey) AS n_candidates,
      |         row_number() OVER (PARTITION BY s_suppkey
      |           ORDER BY score DESC, dcents, c_custkey) AS rank
      |  FROM scored WHERE score >= 1.0)
      |SELECT s_suppkey, c_custkey, CAST(score AS DOUBLE) AS score,
      |       dcents, n_candidates
      |FROM ranked WHERE rank = 1 ORDER BY s_suppkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "record_linkage" -> (recordLinkage _),
    "incremental_agg" -> (incrementalAgg _),
    "table_diff" -> (tableDiff _),
    "bloom_semi_join" -> (bloomSemiJoin _),
    "pareto_frontier" -> (paretoFrontier _),
    "unpivot_metrics" -> (unpivotMetrics _),
    "integrity_audit" -> (integrityAudit _),
    "monthly_growth" -> (monthlyGrowth _),
    "q2_min_cost_supplier" -> (q2MinCostSupplier _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q7_volume_shipping" -> (q7VolumeShipping _),
    "q8_market_share" -> (q8MarketShare _),
    "q9_product_profit" -> (q9ProductProfit _),
    "q16_supplier_count" -> (q16SupplierCount _),
    "q20_excess_suppliers" -> (q20ExcessSuppliers _),
    "q11_important_parts" -> (q11ImportantParts _),
    "q12_priority_classes" -> (q12PriorityClasses _),
    "q13_customer_distribution" -> (q13CustomerDistribution _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q17_small_quantity" -> (q17SmallQuantity _),
    "q21_waiting_suppliers" -> (q21WaitingSuppliers _),
    "q22_global_sales" -> (q22GlobalSales _))

  val oracles: Map[String, String] = Map(
    "record_linkage" -> recordLinkageOracle,
    "incremental_agg" -> incrementalAggOracle,
    "table_diff" -> tableDiffOracle,
    "bloom_semi_join" -> bloomSemiJoinOracle,
    "pareto_frontier" -> paretoFrontierOracle,
    "unpivot_metrics" -> unpivotMetricsOracle,
    "integrity_audit" -> integrityAuditOracle,
    "monthly_growth" -> monthlyGrowthOracle,
    "q2_min_cost_supplier" -> q2Oracle,
    "q4_order_priority" -> q4Oracle,
    "q7_volume_shipping" -> q7Oracle,
    "q8_market_share" -> q8Oracle,
    "q9_product_profit" -> q9Oracle,
    "q16_supplier_count" -> q16Oracle,
    "q20_excess_suppliers" -> q20Oracle,
    "q11_important_parts" -> q11Oracle,
    "q12_priority_classes" -> q12Oracle,
    "q13_customer_distribution" -> q13Oracle,
    "q15_top_supplier" -> q15Oracle,
    "q17_small_quantity" -> q17Oracle,
    "q21_waiting_suppliers" -> q21Oracle,
    "q22_global_sales" -> q22Oracle)
}

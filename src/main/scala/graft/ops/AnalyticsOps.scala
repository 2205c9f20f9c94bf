package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classic OLAP shapes over the TPC-H-ish tables: grouped aggregation,
  * multi-way join + top-k, and set operations — the remaining §2.11-empty
  * categories as first-class, oracle-backed queries.
  */
object AnalyticsOps {

  /** TPC-H Q1-shaped pricing summary: one shuffle (partial aggregation
    * map-side), grouped on low-cardinality flags.
    */
  def q1PricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |       round(sum(l_quantity), 2) AS sum_qty,
      |       round(sum(l_extendedprice), 2) AS sum_base_price,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |       round(avg(l_quantity), 4) AS avg_qty,
      |       round(avg(l_extendedprice), 4) AS avg_price,
      |       round(avg(l_discount), 6) AS avg_disc,
      |       count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-shaped shipping priority: filter-pushdown on both join sides,
    * broadcast of the (filtered, small) customer dimension, top-10 revenue.
    * Revenue is rounded BEFORE ranking so the ordering itself is oracle-
    * deterministic across double-summation orders.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val orders = Tables(s, dir, "orders")
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_semi")
    Tables(s, dir, "lineitem")
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  val q3Oracle: String =
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |       o_orderpriority,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** Set operations (union / intersect / except) over customer key sets:
    * one labelled count per op. Key sets are distinct custkeys — the set ops
    * shuffle once on the key.
    */
  def setOpsCustomers(s: SparkSession, dir: String): DataFrame = {
    val withOrders = Tables(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
    val building = Tables(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k")).distinct()
    val mk = (name: String, df: DataFrame) =>
      df.agg(count(lit(1)).as("n")).select(lit(name).as("op"), col("n"))
    mk("union", withOrders.union(building).distinct())
      .unionAll(mk("intersect", withOrders.intersect(building)))
      .unionAll(mk("except", withOrders.except(building)))
      .orderBy("op")
  }

  val setOpsOracle: String =
    """WITH wo AS (SELECT DISTINCT o_custkey AS k FROM orders),
      |     b AS (SELECT DISTINCT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
      |SELECT op, n FROM (
      |  SELECT 'union' AS op, (SELECT count(*) FROM (SELECT k FROM wo UNION SELECT k FROM b)) AS n
      |  UNION ALL
      |  SELECT 'intersect', (SELECT count(*) FROM (SELECT k FROM wo INTERSECT SELECT k FROM b))
      |  UNION ALL
      |  SELECT 'except', (SELECT count(*) FROM (SELECT k FROM wo EXCEPT SELECT k FROM b)))
      |ORDER BY op""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "set_ops_customers" -> (setOpsCustomers _))

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" -> q1Oracle,
    "q3_shipping_priority" -> q3Oracle,
    "set_ops_customers" -> setOpsOracle)
}

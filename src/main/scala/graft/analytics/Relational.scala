package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The standard analytic surface the reference lacks (SURVEY.md §2.5
  * "absent" row): window functions, rollup aggregates, set operations.
  * All plain Catalyst — hash/sort aggregates, window exec, no UDFs.
  */
object Relational {

  /** rank / row_number / lag / running sum per nation. The window order is
    * made total (acctbal desc, custkey) so lag/running-sum are
    * deterministic under any partitioning. */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(desc("c_acctbal"), asc("c_custkey"))
    c.select(
      col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
      rank().over(w).as("rnk"),
      row_number().over(w).as("rn"),
      lag("c_acctbal", 1).over(w).as("prev_bal"),
      sum(Tables.dec(col("c_acctbal")))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("run_sum"))
  }

  /** ROLLUP over region → nation with exact decimal totals. Subtotal rows
    * surface as 'ALL' (the dimension names are never null in-data, so
    * coalesce is unambiguous and avoids engine-specific grouping-id
    * encodings). */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(Tables.dec(col("o_totalprice"))).cast("double").as("sum_price"))
      .select(coalesce(col("r_name"), lit("ALL")).as("r_name"),
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        col("n_orders"), col("sum_price"))
  }

  /** UNION / INTERSECT / EXCEPT of the customer-nations vs supplier-nations
    * sets, tagged into one result. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val cn = Tables.customer(spark, dir)
      .select(col("c_nationkey").as("nk")).distinct()
    val sn = Tables.supplier(spark, dir)
      .select(col("s_nationkey").as("nk")).distinct()
    cn.union(sn).distinct().withColumn("setop", lit("union"))
      .union(cn.intersect(sn).withColumn("setop", lit("intersect")))
      .union(cn.except(sn).withColumn("setop", lit("except")))
  }

  val oracle: Map[String, String] = Map(
    "q12_window_rank" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  rank() OVER w AS rnk,
        |  row_number() OVER w AS rn,
        |  lag(c_acctbal, 1) OVER w AS prev_bal,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal DESC, c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""".stripMargin,
    "q13_rollup_agg" ->
      """SELECT COALESCE(r_name, 'ALL') AS r_name, COALESCE(n_name, 'ALL') AS n_name,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)""".stripMargin,
    "q14_setops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
        |     sn AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
        |SELECT nk, 'union' AS setop FROM (SELECT nk FROM cn UNION SELECT nk FROM sn)
        |UNION ALL
        |SELECT nk, 'intersect' AS setop FROM (SELECT nk FROM cn INTERSECT SELECT nk FROM sn)
        |UNION ALL
        |SELECT nk, 'except' AS setop FROM (SELECT nk FROM cn EXCEPT SELECT nk FROM sn)""".stripMargin,
  )
}

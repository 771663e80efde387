package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational transforms — the reference's headline dataflow re-shaped
  * over the star schema (SURVEY.md §2.2–§2.5, §7.2).
  *
  * Reference behaviors covered here:
  *  - top-k by score (`webscraper-postgres.py:30` — `sort=user_rating,desc&
  *    count=250` pushed into the source URL) → `orderBy().limit()`, which
  *    Spark plans as TakeOrderedAndProject (no global sort materialized).
  *  - the enrichment join chain (`:101` left merge; `:163,227` hand-rolled
  *    dict lookups → broadcast hash joins).
  */
object Transform {

  /** Flagship: "top-250 by score with entity enrichment".
    * orders≈movies, customer≈people, nation/region≈dimensions.
    *
    * Scale notes: nation/region are dimension tables → explicit
    * `broadcast()`; orders⋈customer shuffles on the key (both fact-sized at
    * 100 TB); the final top-k is TakeOrderedAndProject — per-partition heap
    * + driver merge of 250 rows, no global sort, no single-node bottleneck.
    */
  def topkEnriched(spark: SparkSession, dir: String): DataFrame = {
    val orders   = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val nation   = Tables.nation(spark, dir)
    val region   = Tables.region(spark, dir)
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(orders("o_orderkey"), col("c_name"), col("n_name"), col("r_name"),
        col("o_totalprice"), col("o_orderdate"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(250)
  }

  /** Pricing summary (TPC-H Q1 shape) — the groupBy-agg surface the
    * reference lacks (SURVEY.md §2.5 "absent" row). Doubles are cast to
    * exact decimals *before* summing: decimal addition is associative, so
    * the result is identical across any partitioning / merge order — a
    * 100 TB-safe determinism property, and what makes the DuckDB hash
    * compare exact.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val one = lit(1).cast(DecimalType(18, 6))
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampNTZType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(Tables.dec(col("l_quantity"))).as("sum_qty"),
        sum(Tables.dec(col("l_extendedprice"))).as("sum_base_price"),
        sum(Tables.dec(col("l_extendedprice")) * (one - Tables.dec(col("l_discount"))))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val oracle: Map[String, String] = Map(
    "q01_topk_enriched" ->
      """SELECT o_orderkey, c_name, n_name, r_name, o_totalprice, o_orderdate
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 250""".stripMargin,
    "q02_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS sum_base_price,
        |  sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}

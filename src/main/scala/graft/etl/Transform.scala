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
    * 100 TB-safe determinism property. The *final* outputs are cast to
    * DOUBLE: the values are exact at scale 6, so the cast is deterministic
    * and identical in both engines, while decimal output types differ in
    * representation (Spark DECIMAL(28,6) vs DuckDB DECIMAL(38,6)) and fail
    * the driver's dtype-sensitive hash compare.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val one = lit(1).cast(DecimalType(18, 6))
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast(TimestampNTZType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Tables.toDouble(sum(Tables.dec(col("l_quantity"))), 2).as("sum_qty"),
        Tables.toDouble(sum(Tables.dec(col("l_extendedprice"))), 2).as("sum_base_price"),
        Tables.toDouble(sum(Tables.dec(col("l_extendedprice")) * (one - Tables.dec(col("l_discount")))), 4)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }


  /** J1: left outer equi-join preserving unmatched left rows
    * (`webscraper-postgres.py:101` — pandas left merge). Null keys do not
    * match (SQL `===`), same as pandas merge-on-NaN. */
  def leftJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .select(c("c_custkey"), c("c_name"), o("o_orderkey"), o("o_totalprice"))
  }

  /** C1–C3: the reference's safe_int / safe_decimal / safe_list sanitizers
    * (`webscraper-postgres.py:174–188,230–237`) as null-on-garbage
    * `try_cast` expressions + `coalesce(…, array())` — no UDFs, fully
    * codegen'd, ANSI-safe. */
  def sanitizeCast(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.select(
      col("p_partkey"),
      expr("try_cast(p_name AS INT)").as("junk_int"),                   // garbage → null
      expr("try_cast(regexp_extract(p_brand, '#([0-9]+)', 1) AS INT)").as("brand_num"),
      expr("try_cast(p_type AS DECIMAL(3,1))").cast("double").as("junk_dec"), // garbage → null
      expr("try_cast(concat(p_size, '.5') AS DECIMAL(5,1))").cast("double")
        .as("size_dec"),
      // safe_list, serialized: array outputs crash the driver's pandas
      // sort (unhashable ndarray) — emit the joined string instead.
      concat_ws(" ",
        coalesce(when(col("p_size") >= 5, split(col("p_name"), " ")), array()))
        .as("tokens"))
  }

  /** P2–P5: rank/title split, positional parse, paren-strip, URL concat
    * (`webscraper-postgres.py:38–56`) over a synthesized "NN. title"
    * column. Pure string expressions — whole-stage codegen. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val titled = p.select(
      col("p_partkey"), col("p_brand"),
      concat(col("p_partkey"), lit(". "), col("p_name")).as("titled"))
    titled.select(
      col("p_partkey"),
      expr("try_cast(regexp_extract(titled, '^([0-9]+)\\. (.*)$', 1) AS INT)").as("rank"),
      regexp_extract(col("titled"), "^([0-9]+)\\. (.*)$", 2).as("title"),
      substring_index(col("titled"), ".", 1).as("rank_str"),
      regexp_replace(concat(lit("("), col("p_brand"), lit(")")), "[()]", "").as("views"),
      concat(lit("https://www.imdb.com/"), col("p_brand")).as("url"))
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
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_base_price,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DECIMAL(28,4)) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q03_left_join" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey""".stripMargin,
    "q04_sanitize_cast" ->
      """SELECT p_partkey,
        |  TRY_CAST(p_name AS INT) AS junk_int,
        |  TRY_CAST(regexp_extract(p_brand, '#([0-9]+)', 1) AS INT) AS brand_num,
        |  CAST(TRY_CAST(p_type AS DECIMAL(3,1)) AS DOUBLE) AS junk_dec,
        |  CAST(TRY_CAST(concat(p_size, '.5') AS DECIMAL(5,1)) AS DOUBLE) AS size_dec,
        |  COALESCE(array_to_string(CASE WHEN p_size >= 5 THEN string_split(p_name, ' ') END, ' '), '') AS tokens
        |FROM part""".stripMargin,
    "q05_string_funcs" ->
      """WITH t AS (SELECT p_partkey, p_brand, concat(p_partkey, '. ', p_name) AS titled FROM part)
        |SELECT p_partkey,
        |  TRY_CAST(regexp_extract(titled, '^([0-9]+)\. (.*)$', 1) AS INT) AS rank,
        |  regexp_extract(titled, '^([0-9]+)\. (.*)$', 2) AS title,
        |  split_part(titled, '.', 1) AS rank_str,
        |  regexp_replace(concat('(', p_brand, ')'), '[()]', '', 'g') AS views,
        |  concat('https://www.imdb.com/', p_brand) AS url
        |FROM t""".stripMargin,
  )
}

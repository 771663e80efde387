package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Constraint validation as data (SURVEY.md §2.1 S4): Spark doesn't
  * enforce PK/FK/UNIQUE/NOT NULL, so the reference's declared constraints
  * (`webscraper-postgres.py:122,130–143`) become *checks that return
  * violation sets* — run before a write the way the DB would have
  * rejected after. All plain aggregates/anti-joins: at 100 TB each check
  * is one shuffle (or none for not-null). */
object Constraints {

  /** UNIQUE/PK: keys appearing more than once. */
  def uniqueViolations(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  /** FOREIGN KEY: child rows whose key has no parent (anti join). */
  def fkOrphans(child: DataFrame, parent: DataFrame,
                fk: String, pk: String): DataFrame =
    child.join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti")

  /** NOT NULL: per-column null counts (map-side only). */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(c))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** q59: the three checks over deliberately-dirtied data, summarized as
    * (check, n_violations): orders duplicated for keys % 100 = 0 (unique
    * violation), lineitem checked against only-even orders (fk orphans),
    * and a column nulled for keys % 10 = 0 (not-null). */
  def constraintReport(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val dirtyOrders = o.unionByName(o.filter(col("o_orderkey") % 100 === 0))
    val dup = uniqueViolations(dirtyOrders, Seq("o_orderkey"))
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("unique_o_orderkey").as("check"), col("n_violations"))
    val orphan = fkOrphans(li, o.filter(col("o_orderkey") % 2 === 0),
        "l_orderkey", "o_orderkey")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("fk_lineitem_orders_even").as("check"), col("n_violations"))
    val nulled = o.withColumn("o_orderpriority",
        when(col("o_orderkey") % 10 === 0, lit(null)).otherwise(col("o_orderpriority")))
    val nn = nullCounts(nulled, Seq("o_orderpriority"))
      .select(lit("notnull_o_orderpriority").as("check"),
        col("o_orderpriority").as("n_violations"))
    dup.unionByName(orphan).unionByName(nn)
  }

  val oracle: Map[String, String] = Map(
    "q59_constraint_report" ->
      """SELECT 'unique_o_orderkey' AS check, count(*) AS n_violations FROM (
        |  SELECT o_orderkey FROM (
        |    SELECT o_orderkey FROM orders
        |    UNION ALL SELECT o_orderkey FROM orders WHERE o_orderkey % 100 = 0)
        |  GROUP BY 1 HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'fk_lineitem_orders_even', count(*) FROM lineitem
        |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0)
        |UNION ALL
        |SELECT 'notnull_o_orderpriority', count(*) FROM orders WHERE o_orderkey % 10 = 0""".stripMargin,
  )
}

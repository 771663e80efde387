package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew management for hot join keys (SURVEY.md §4 / the 100 TB brief):
  * AQE's skew-join split handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin`), but when one key is pathologically hot
  * *and known*, salting bounds the worst task deterministically: the fact
  * side spreads each key over `buckets` sub-keys via a deterministic salt,
  * the build side replicates each row into all buckets, and the join key
  * becomes (key, salt) — the hot key's rows land on `buckets` tasks
  * instead of one. Join semantics are unchanged (each fact row still
  * matches exactly its key's build rows, once).
  */
object Skew {

  /** Salted equi-join: `facts ⋈ dim` on factKey = dimKey, with the fact
    * side salted by `saltExpr % buckets` (pass any well-distributed
    * deterministic column, e.g. xxhash64 of a row id) and the dim side
    * replicated ×buckets. Use when dim is too big to broadcast but a few
    * fact keys are hot. */
  def saltedJoin(facts: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String,
                 saltExpr: Column, buckets: Int): DataFrame = {
    val sf = facts.withColumn("_salt", pmod(saltExpr, lit(buckets)).cast("int"))
    val sd = dim.withColumn("_salt",
      explode(expr(s"sequence(0, ${buckets - 1})")))
    sf.join(sd, sf(factKey) === sd(dimKey) && sf("_salt") === sd("_salt"))
      .drop("_salt")
  }

  /** q48: lineitem ⋈ orders through the salted join (salt = xxhash64 of
    * the line number — deterministic, internal only), aggregated so the
    * oracle is the plain join: salting must be invisible in the result. */
  def saltedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"))
    saltedJoin(li, o, "l_orderkey", "o_orderkey",
      xxhash64(col("l_orderkey"), col("l_linenumber")), buckets = 8)
      .groupBy(col("o_orderstatus"), col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        Tables.toDouble(sum(Tables.dec(col("l_extendedprice"))), 2).as("sum_price"))
  }

  val oracle: Map[String, String] = Map(
    "q48_salted_join" ->
      """SELECT o_orderstatus, l_returnflag, count(*) AS n,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(28,2)) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1, 2""".stripMargin,
  )
}

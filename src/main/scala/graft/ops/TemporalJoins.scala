package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal joins Spark lacks as built-ins (SURVEY.md §2.4 "absent" row),
  * composed from existing operators per the preference order — no custom
  * SparkStrategy needed because the union/window (as-of) and bucket-join
  * (range) formulations are already shuffle-minimal and skew-tolerant.
  */
object TemporalJoins {

  /** AS-OF JOIN (left): for every 'purchase' event, the latest 'error'
    * event of the same user at-or-before it.
    *
    * Algorithm: tag-union both sides, sort per user by (ts, tag, id), and
    * carry the most recent error via `last(ignoreNulls)` over a running
    * window — ONE shuffle on user_id, no per-key blowup, no range
    * cross-product. This is the standard distributed as-of formulation
    * (a sort-merge within repartitioned groups); skewed users stay a
    * single sorted run rather than a quadratic join. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val errors = e.filter(col("event_type") === "error").select(
      col("user_id"), col("ts"), lit(0).as("tag"),
      col("event_id").as("err_id"), col("ts").as("err_ts"),
      lit(null).cast(LongType).as("event_id"))
    val purchases = e.filter(col("event_type") === "purchase").select(
      col("user_id"), col("ts"), lit(1).as("tag"),
      lit(null).cast(LongType).as("err_id"),
      lit(null).cast(TimestampNTZType).as("err_ts"),
      col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("err_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    errors.union(purchases)
      .withColumn("m_err_id", last(col("err_id"), ignoreNulls = true).over(w))
      .withColumn("m_err_ts", last(col("err_ts"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("m_err_id").as("err_id"), col("m_err_ts").as("err_ts"))
  }

  /** RANGE (band) JOIN: all (purchase a, event b) pairs of the same user
    * with b.ts in [a.ts − 5 min, a.ts).
    *
    * Implemented as a bucketed band join: both sides bin to the 5-minute
    * grid, b replicates into (bin, bin+1), equi-join on (user, bin), then
    * the exact interval filter. Work is O(pairs in adjacent bins), not
    * O(pairs per user) — the bucket width bounds the probe range, which
    * is what survives a 100× scale-up where a naive user-equi-join with a
    * time filter degenerates on hot users. */
  def rangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val binSecs = 300L
    def bin(c: org.apache.spark.sql.Column) =
      floor(c.cast(TimestampType).cast(LongType) / binSecs)
    val a = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"),
        bin(col("ts")).as("bin"))
    val b0 = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"),
      col("ts").as("b_ts"), bin(col("ts")).as("b_bin"))
    val b = b0.withColumn("bin", explode(array(col("b_bin"), col("b_bin") + 1)))
      .drop("b_bin")
    a.join(b, a("user_id") === b("b_user") && a("bin") === b("bin"))
      .filter(col("b_ts") >= col("a_ts") - expr("INTERVAL 5 MINUTES") &&
              col("b_ts") < col("a_ts"))
      .select(col("a_id"), col("b_id"), col("user_id"))
  }

  /** AS-OF with a tolerance: matches older than 1 hour are nulled out
    * (the pandas merge_asof `tolerance=` semantics) — a post-filter on
    * the as-of result, so the single-shuffle plan is unchanged. */
  def asofJoinTolerance(spark: SparkSession, dir: String): DataFrame = {
    val base = asofJoin(spark, dir)
    val fresh = col("err_ts") >= col("ts") - expr("INTERVAL 1 HOUR")
    base
      .withColumn("err_id_t", when(fresh, col("err_id")))
      .withColumn("err_ts_t", when(fresh, col("err_ts")))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("err_id_t").as("err_id"), col("err_ts_t").as("err_ts"))
  }

  /** q100: the SAME as-of semantics as q19, through the custom
    * whole-operator path (`graft.plans.AsOfJoin` logical node →
    * `AsOfJoinExec` single-pass merge) instead of the union+window
    * composition — the two implementations check against one oracle, so
    * the custom exec's equivalence is driver-verified on every run. */
  def asofJoinExec(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("err_id"),
        col("ts").as("err_ts"))
    graft.plans.AsOf.join(purchases, errors,
        "user_id", "e_user", "ts", "err_ts", rightTie = Seq("err_id"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("err_id"), col("err_ts"))
  }

  val oracle: Map[String, String] = Map(
    "q58_asof_tolerance" ->
      """SELECT event_id, user_id, ts,
        |  CASE WHEN err_ts >= ts - INTERVAL 1 HOUR THEN err_id END AS err_id,
        |  CASE WHEN err_ts >= ts - INTERVAL 1 HOUR THEN err_ts END AS err_ts
        |FROM (
        |  SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
        |    e.err_id, e.err_ts
        |  FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |  ASOF LEFT JOIN (
        |    SELECT user_id AS e_user, event_id AS err_id, CAST(ts AS TIMESTAMP) AS err_ts
        |    FROM events WHERE event_type = 'error') e
        |  ON p.user_id = e.e_user AND CAST(p.ts AS TIMESTAMP) >= e.err_ts)""".stripMargin,
    // q100 = q19's semantics through the custom exec; same oracle
    "q100_asof_exec" ->
      """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
        |  e.err_id, e.err_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (
        |  SELECT user_id AS e_user, event_id AS err_id, CAST(ts AS TIMESTAMP) AS err_ts
        |  FROM events WHERE event_type = 'error') e
        |ON p.user_id = e.e_user AND CAST(p.ts AS TIMESTAMP) >= e.err_ts""".stripMargin,
    "q19_asof_join" ->
      """SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
        |  e.err_id, e.err_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (
        |  SELECT user_id AS e_user, event_id AS err_id, CAST(ts AS TIMESTAMP) AS err_ts
        |  FROM events WHERE event_type = 'error') e
        |ON p.user_id = e.e_user AND CAST(p.ts AS TIMESTAMP) >= e.err_ts""".stripMargin,
    "q20_range_join" ->
      """SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'purchase'
        | AND CAST(b.ts AS TIMESTAMP) >= CAST(a.ts AS TIMESTAMP) - INTERVAL 5 MINUTE
        | AND CAST(b.ts AS TIMESTAMP) < CAST(a.ts AS TIMESTAMP)""".stripMargin,
  )
}

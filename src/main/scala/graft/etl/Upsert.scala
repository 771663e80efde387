package graft.etl

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Idempotent-load semantics — the reference's ON CONFLICT machinery
  * (SURVEY.md §2.5 U1/U2), re-expressed as set operations:
  *  - insert-if-absent (`ON CONFLICT DO NOTHING`, webscraper-postgres.py:159)
  *    → left_anti join;
  *  - insert-or-update (`ON CONFLICT DO UPDATE`, `:199–222`)
  *    → full-outer join + per-column coalesce (MERGE).
  * Both shuffle on the key only; idempotency (README.md:132) is
  * property-tested in UpsertSpec.
  */
object Upsert {

  /** U1: rows of `incoming` whose key is absent from `existing` — exactly
    * the set `INSERT ... ON CONFLICT DO NOTHING` would add. */
  def insertIfAbsent(existing: DataFrame, incoming: DataFrame, key: Seq[String]): DataFrame =
    incoming.join(existing, key, "left_anti")

  /** U2: MERGE. Keys in both → `dynamicCols` from incoming, `staticCols`
    * from existing; keys only in one side pass through. `op` records the
    * MERGE action per row. */
  def merge(existing: DataFrame, incoming: DataFrame, key: String,
            staticCols: Seq[String], dynamicCols: Seq[String]): DataFrame = {
    val e = existing.as("e")
    val i = incoming.as("i")
    val out: Seq[Column] =
      coalesce(col(s"e.$key"), col(s"i.$key")).as(key) +:
      (staticCols.map(c => coalesce(col(s"e.$c"), col(s"i.$c")).as(c)) ++
       dynamicCols.map(c => coalesce(col(s"i.$c"), col(s"e.$c")).as(c)) :+
       when(col(s"i.$key").isNull, "kept")
         .when(col(s"e.$key").isNull, "inserted")
         .otherwise("updated").as("op"))
    e.join(i, col(s"e.$key") === col(s"i.$key"), "full_outer").select(out: _*)
  }

  /** C4: MERGE with a `last_updated` audit column under an injected fixed
    * clock (the reference's `last_updated TIMESTAMP DEFAULT
    * CURRENT_TIMESTAMP` + `ON CONFLICT ... SET last_updated = now`,
    * `webscraper-postgres.py:123,208`). The clock is a parameter, not
    * `current_timestamp()`, so results stay deterministic and
    * oracle-checkable; production callers pass `Timestamp.from(Instant.now)`.
    * Inserted/updated rows get `clock`; kept rows retain their stamp. */
  def mergeWithClock(existing: DataFrame, incoming: DataFrame, key: String,
                     staticCols: Seq[String], dynamicCols: Seq[String],
                     clock: java.sql.Timestamp): DataFrame =
    merge(existing, incoming.withColumn("last_updated", lit(clock)),
      key, staticCols, dynamicCols :+ "last_updated")

  /** P8-ish semi join: keep customers having ≥1 'F'-status order. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_acctbal")
  }

  /** U1 as a query: customers with no 'P'-status order ("new people" the
    * insert-if-absent pass would add). */
  def antiJoinInsert(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val existing = Tables.orders(spark, dir).filter(col("o_orderstatus") === "P")
      .select(col("o_custkey").as("c_custkey"))
    insertIfAbsent(existing, c, Seq("c_custkey")).select("c_custkey", "c_name")
  }

  /** U2 as a query: existing = even orderkeys, incoming = multiples of 3
    * with refreshed status/price (×1.05, exact decimal). Static col:
    * o_orderdate; dynamic: o_orderstatus, o_totalprice. */
  def mergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val existing = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        Tables.dec(col("o_totalprice")).as("o_totalprice"), col("o_orderdate"))
    val incoming = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), lit("R").as("o_orderstatus"),
        (Tables.dec(col("o_totalprice")) * lit(1.05).cast(DecimalType(3, 2)))
          .cast(DecimalType(18, 6)).as("o_totalprice"),
        col("o_orderdate"))
    merge(existing, incoming, "o_orderkey",
      staticCols = Seq("o_orderdate"),
      dynamicCols = Seq("o_orderstatus", "o_totalprice"))
      // exact decimal internally; DOUBLE at the output boundary (driver's
      // hash compare is decimal-representation-sensitive across engines)
      .withColumn("o_totalprice", col("o_totalprice").cast("double"))
  }

  /** C4 as a query: the q11 merge with last_updated audit stamps under a
    * fixed clock — kept rows retain the old stamp, touched rows get the
    * batch clock (`webscraper-postgres.py:123,208` semantics,
    * deterministic). */
  def mergeTimestamped(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val existing = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        Tables.dec(col("o_totalprice")).as("o_totalprice"), col("o_orderdate"))
      .withColumn("last_updated",
        lit("2020-01-01 00:00:00").cast(org.apache.spark.sql.types.TimestampNTZType))
    val incoming = o.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"), lit("R").as("o_orderstatus"),
        (Tables.dec(col("o_totalprice")) * lit(1.05).cast(DecimalType(3, 2)))
          .cast(DecimalType(18, 6)).as("o_totalprice"),
        col("o_orderdate"))
    mergeWithClock(existing, incoming, "o_orderkey",
      staticCols = Seq("o_orderdate"),
      dynamicCols = Seq("o_orderstatus", "o_totalprice"),
      clock = java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
      .withColumn("o_totalprice", col("o_totalprice").cast("double"))
      .withColumn("last_updated",
        col("last_updated").cast(org.apache.spark.sql.types.TimestampNTZType))
  }

  val oracle: Map[String, String] = Map(
    "q09_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin,
    "q10_anti_join_insert" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')""".stripMargin,
    "q11_merge_upsert" ->
      """WITH e AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(o_totalprice AS DECIMAL(18,6)) AS o_totalprice, o_orderdate
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |i AS (
        |  SELECT o_orderkey, 'R' AS o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,6)) * CAST(1.05 AS DECIMAL(3,2)) AS DECIMAL(18,6)) AS o_totalprice,
        |    o_orderdate
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT COALESCE(e.o_orderkey, i.o_orderkey) AS o_orderkey,
        |  COALESCE(e.o_orderdate, i.o_orderdate) AS o_orderdate,
        |  COALESCE(i.o_orderstatus, e.o_orderstatus) AS o_orderstatus,
        |  CAST(COALESCE(i.o_totalprice, e.o_totalprice) AS DOUBLE) AS o_totalprice,
        |  CASE WHEN i.o_orderkey IS NULL THEN 'kept'
        |       WHEN e.o_orderkey IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS op
        |FROM e FULL OUTER JOIN i ON e.o_orderkey = i.o_orderkey""".stripMargin,
    "q39_merge_timestamped" ->
      """WITH e AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CAST(o_totalprice AS DECIMAL(18,6)) AS o_totalprice, o_orderdate,
        |    TIMESTAMP '2020-01-01 00:00:00' AS last_updated
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |i AS (
        |  SELECT o_orderkey, 'R' AS o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,6)) * CAST(1.05 AS DECIMAL(3,2)) AS DECIMAL(18,6)) AS o_totalprice,
        |    o_orderdate,
        |    TIMESTAMP '2024-06-01 00:00:00' AS last_updated
        |  FROM orders WHERE o_orderkey % 3 = 0)
        |SELECT COALESCE(e.o_orderkey, i.o_orderkey) AS o_orderkey,
        |  COALESCE(e.o_orderdate, i.o_orderdate) AS o_orderdate,
        |  COALESCE(i.o_orderstatus, e.o_orderstatus) AS o_orderstatus,
        |  CAST(COALESCE(i.o_totalprice, e.o_totalprice) AS DOUBLE) AS o_totalprice,
        |  COALESCE(i.last_updated, e.last_updated) AS last_updated,
        |  CASE WHEN i.o_orderkey IS NULL THEN 'kept'
        |       WHEN e.o_orderkey IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS op
        |FROM e FULL OUTER JOIN i ON e.o_orderkey = i.o_orderkey""".stripMargin,
  )
}

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

  /** SCD2 (type-2 slowly-changing dimension) history merge — the one
    * capability the reference's own README names as future work
    * (README.md:141 "track historical changes"): instead of overwriting
    * dynamic fields, a changed key CLOSES its current row (valid_to =
    * clock) and OPENS a new version (valid_from = clock); unchanged and
    * already-closed rows pass through untouched; unseen keys open their
    * first version. Deleted keys stay current (no-retire policy —
    * documented choice). One full-outer shuffle on the key; change
    * detection is null-safe (`<=>`); the injected clock keeps it
    * deterministic and oracle-checkable like mergeWithClock. */
  def scd2Merge(history: DataFrame, incoming: DataFrame, key: String,
                attrs: Seq[String], clock: java.sql.Timestamp): DataFrame = {
    val ntz = org.apache.spark.sql.types.TimestampNTZType
    val clockCol = lit(clock).cast(ntz)
    val nullTs = lit(null).cast(ntz)
    val closed = history.filter(col("valid_to").isNotNull)
    val cur = history.filter(col("valid_to").isNull)
    val changed = col(s"e.$key").isNotNull && col(s"i.$key").isNotNull &&
      attrs.map(a => !(col(s"e.$a") <=> col(s"i.$a"))).reduce(_ || _)
    val j = cur.as("e")
      .join(incoming.as("i"), col(s"e.$key") === col(s"i.$key"), "full_outer")
      .withColumn("_chg", changed)
    def row(side: String, from: Column, to: Column): Seq[Column] =
      (col(s"$side.$key").as(key) +: attrs.map(a => col(s"$side.$a").as(a))) ++
        Seq(from.as("valid_from"), to.as("valid_to"))
    val kept = j.filter(col(s"e.$key").isNotNull && !col("_chg"))
      .select(row("e", col("e.valid_from"), nullTs): _*)
    val closedNow = j.filter(col("_chg"))
      .select(row("e", col("e.valid_from"), clockCol): _*)
    val opened = j.filter(col(s"i.$key").isNotNull && (col(s"e.$key").isNull || col("_chg")))
      .select(row("i", clockCol, nullTs): _*)
    closed.unionByName(kept).unionByName(closedNow).unionByName(opened)
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** SCD2 as a query: customer balances as the tracked attribute —
    * pre-existing closed versions for custkey % 7, changed balances for
    * custkey % 5, brand-new keys for custkey % 11 (shifted ids). */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val ntz = org.apache.spark.sql.types.TimestampNTZType
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_acctbal"))
    val closedHist = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"), (col("c_acctbal") - 50.0).as("c_acctbal"),
        lit("2023-01-01 00:00:00").cast(ntz).as("valid_from"),
        lit("2024-01-01 00:00:00").cast(ntz).as("valid_to"))
    val current = c
      .withColumn("valid_from", lit("2024-01-01 00:00:00").cast(ntz))
      .withColumn("valid_to", lit(null).cast(ntz))
    val incoming = c
      .withColumn("c_acctbal",
        when(col("c_custkey") % 5 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")))
      .unionByName(c.filter(col("c_custkey") % 11 === 0)
        .select((col("c_custkey") + 1000000).as("c_custkey"), col("c_acctbal")))
    scd2Merge(closedHist.unionByName(current), incoming, "c_custkey",
      Seq("c_acctbal"), java.sql.Timestamp.valueOf("2024-06-01 00:00:00"))
  }

  val oracle: Map[String, String] = Map(
    "q82_scd2_history" ->
      """WITH c AS (SELECT c_custkey, c_acctbal FROM customer),
        |hist AS (
        |  SELECT c_custkey, c_acctbal - 50.0 AS c_acctbal,
        |    TIMESTAMP '2023-01-01 00:00:00' AS valid_from,
        |    TIMESTAMP '2024-01-01 00:00:00' AS valid_to
        |  FROM c WHERE c_custkey % 7 = 0),
        |cur AS (
        |  SELECT c_custkey, c_acctbal,
        |    TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM c),
        |inc AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
        |  FROM c
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_acctbal FROM c WHERE c_custkey % 11 = 0),
        |j AS (
        |  SELECT cur.c_custkey AS ek, cur.c_acctbal AS ea, cur.valid_from AS ef,
        |         inc.c_custkey AS ik, inc.c_acctbal AS ia
        |  FROM cur FULL OUTER JOIN inc ON cur.c_custkey = inc.c_custkey),
        |o AS (
        |  SELECT ek AS c_custkey, ea AS c_acctbal, ef AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM j WHERE ek IS NOT NULL AND NOT (ik IS NOT NULL AND ea IS DISTINCT FROM ia)
        |  UNION ALL
        |  SELECT ek, ea, ef, TIMESTAMP '2024-06-01 00:00:00'
        |  FROM j WHERE ek IS NOT NULL AND ik IS NOT NULL AND ea IS DISTINCT FROM ia
        |  UNION ALL
        |  SELECT ik, ia, TIMESTAMP '2024-06-01 00:00:00', CAST(NULL AS TIMESTAMP)
        |  FROM j WHERE ik IS NOT NULL AND (ek IS NULL OR ea IS DISTINCT FROM ia)
        |  UNION ALL
        |  SELECT * FROM hist)
        |SELECT c_custkey, c_acctbal, valid_from, valid_to,
        |  valid_to IS NULL AS is_current
        |FROM o""".stripMargin,
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

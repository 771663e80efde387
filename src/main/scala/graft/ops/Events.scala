package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream analytics over `events.parquet` (SURVEY.md §2.7 JSON gap +
  * §2.9): JSON extraction, tumbling / sliding / session event-time
  * windows — expressed as batch aggregations (DuckDB-checkable); the
  * Structured Streaming wrapper over the same tumbling agg lives in
  * graft.streaming and is equality-tested against this batch version.
  *
  * All timestamps flow through Tables.events (ns → µs TIMESTAMP_NTZ), so
  * comparisons/truncations agree exactly with DuckDB's TIMESTAMP cast.
  */
object Events {

  /** JSON extraction (`from_json` with explicit schema — codegen-friendly,
    * no schema inference pass) + bucketed aggregate. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.select(col("event_type"), col("value"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"))
      .groupBy((col("k") % 10).as("k_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(Tables.dec(col("value"))).cast("double").as("sum_value"),
        max(col("k")).as("max_k"))
  }

  /** Tumbling 1-hour event-time window via Spark's `window()` generator —
    * the idiomatic streaming-compatible form (group keys shuffle-partition
    * the aggregate; partial aggregation happens map-side). */
  def tumbling(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(Tables.dec(col("value"))).cast("double").as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Sliding 10-minute window, 5-minute slide: each event lands in 2
    * windows. Same generator, same scale properties as tumbling. */
  def sliding(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(Tables.dec(col("value"))).cast("double").as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Session windows (30-minute gap) per user via `session_window` —
    * Spark merges overlapping [ts, ts+gap) ranges per group key. Session
    * bounds: start = first event, end = last event + gap (exclusive). */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    e.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(Tables.dec(col("value"))).cast("double").as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))
  }

  /** MapType surface: synthesize a two-key JSON object per event,
    * parse it as map<string,long> (schema-on-read, no inference pass),
    * explode entries, aggregate per key — the generic dynamic-key path
    * the fixed-schema q15 from_json struct can't express. */
  def mapExplode(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .withColumn("j", concat(lit("{\"uid\": "), col("user_id"),
        lit(", \"eid\": "), col("event_id"), lit("}")))
    e.select(col("event_type"),
        explode(from_json(col("j"), MapType(StringType, LongType))))
      .groupBy(col("event_type"), col("key"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"),
        max(col("value")).as("max_v"))
  }

  val oracle: Map[String, String] = Map(
    "q53_map_explode" ->
      """SELECT event_type, key, count(*) AS n,
        |  CAST(sum(v) AS BIGINT) AS sum_v, max(v) AS max_v
        |FROM (
        |  SELECT event_type, 'uid' AS key, user_id AS v FROM events
        |  UNION ALL
        |  SELECT event_type, 'eid' AS key, event_id AS v FROM events)
        |GROUP BY 1, 2""".stripMargin,
    "q15_json_extract" ->
      """SELECT CAST(regexp_extract(props, '"k":\s*([0-9]+)', 1) AS INT) % 10 AS k_bucket,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  max(CAST(regexp_extract(props, '"k":\s*([0-9]+)', 1) AS INT)) AS max_k
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q16_tumbling_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q17_sliding_window" ->
      """SELECT make_timestamp(((epoch_ms(CAST(ts AS TIMESTAMP)) // 300000) - g.i) * 300000000) AS ws,
        |  event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events CROSS JOIN (SELECT unnest(range(0, 2)) AS i) g
        |GROUP BY 1, 2""".stripMargin,
    "q18_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
        |    CASE WHEN lag(CAST(ts AS TIMESTAMP)) OVER w IS NULL
        |           OR CAST(ts AS TIMESTAMP) - lag(CAST(ts AS TIMESTAMP)) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))),
        |y AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM x)
        |SELECT min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end,
        |  user_id, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM y GROUP BY user_id, sid""".stripMargin,
  )
}

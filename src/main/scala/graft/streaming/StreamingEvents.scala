package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming face of the engine (SURVEY.md §2.9): the
  * reference's weekly-cron batch re-run becomes a `Trigger.AvailableNow`
  * streaming query — same tumbling event-time aggregation as the batch
  * `ops.Events.tumbling`, same oracle SQL, results provably equal.
  *
  * In production this is `readStream` on an arriving-files directory with
  * a watermark bounding state; `AvailableNow` processes the current
  * backlog in bounded batches then stops — the exact cron-replacement
  * semantics. The memory sink is only for the verification harness; a
  * real deployment writes parquet/Delta.
  */
object StreamingEvents {

  /** Schema of events.parquet as the stream source sees it (ts read as
    * raw nanos — the legacy conf applies to streaming reads too). */
  private val rawSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Runs the tumbling aggregation as a streaming query over the events
    * file source and returns the final result table. Blocking — intended
    * for verification/bench, not a long-running service. */
  def tumblingAvailableNow(spark: SparkSession, dir: String): DataFrame = {
    // nanosAsLong comes from the session builder (Tables.scala's rule:
    // loaders never mutate session conf)
    // file stream sources take a directory; glob-filter to the events table
    val events = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      // watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
      // wall-clock is identical — cast back to NTZ on output for parity.
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val agg = events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("sum_value"))
      .select(col("window.start").cast(TimestampNTZType).as("ws"),
        col("event_type"), col("n"), col("sum_value"))
    val name = s"stream_tumbling_${System.nanoTime()}"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Oracle: identical to the batch tumbling query — the point. */
  val oracle: Map[String, String] = Map(
    "q34_stream_tumbling" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
  )
}

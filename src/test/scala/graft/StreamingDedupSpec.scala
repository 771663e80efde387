package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Streaming exact dedup — the streaming face of q21: dropDuplicates
  * over a keyed stream with a watermark bounding the dedup state (an
  * unbounded stream can't remember every key forever; the watermark is
  * what makes exact dedup feasible at 100 TB/day). */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("dropDuplicatesWithinWatermark suppresses re-deliveries across batches") {
    val input = MemoryStream[(Long, java.sql.Timestamp, String)](spark)
    val deduped = input.toDF().toDF("doc_id", "ts", "text")
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("doc_id")
    val q = deduped.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("dedup_stream")
      .trigger(Trigger.ProcessingTime(0)).start()
    try {
      input.addData((1L, ts(0), "a"), (2L, ts(1), "b"), (1L, ts(2), "a-dup"))
      q.processAllAvailable()
      input.addData((2L, ts(3), "b-redelivery"), (3L, ts(4), "c"))
      q.processAllAvailable()
      val got = spark.table("dedup_stream")
        .groupBy("doc_id").agg(count(lit(1)).as("n"), min("text").as("text"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
      assert(got.keySet == Set(1L, 2L, 3L))
      assert(got.values.forall(_._1 == 1L), s"every key exactly once: $got")
      assert(got(1L)._2 == "a" && got(2L)._2 == "b", "first delivery wins")
    } finally q.stop()
  }
}

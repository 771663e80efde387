package graft

import graft.etl.Upsert
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming face of the MERGE sink (S6 + §2.9): `foreachBatch` applies
  * the same batch `Upsert.merge` to each micro-batch against a parquet
  * state table — the standard Spark CDC-upsert pattern (Delta's MERGE
  * INTO reduces to exactly this shape without the transaction log). */
class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("foreachBatch merge maintains keyed state across micro-batches") {
    val path = "target/tmp/graft_stream_upsert/state"
    // seed state
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "status", "price")
      .write.mode("overwrite").parquet(path)

    val input = MemoryStream[(Long, String, Double)](spark)
    val q = input.toDF().toDF("k", "status", "price")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val existing = batch.sparkSession.read.parquet(path)
        val merged = Upsert.merge(existing, batch, "k",
          staticCols = Seq.empty, dynamicCols = Seq("status", "price"))
          .select("k", "status", "price")
        // overwrite-out-of-place then swap is the real pattern; a direct
        // overwrite suffices for the single-writer test
        merged.cache().count()
        merged.write.mode("overwrite").parquet(path + "_next")
        batch.sparkSession.read.parquet(path + "_next")
          .write.mode("overwrite").parquet(path)
        ()
      }
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      input.addData((2L, "B", 21.0), (3L, "c", 30.0)) // update 2, insert 3
      q.processAllAvailable()
      input.addData((3L, "C", 31.0))                   // update 3 again
      q.processAllAvailable()
      val state = spark.read.parquet(path)
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
      assert(state == Map(
        1L -> ("a", 10.0),   // untouched
        2L -> ("B", 21.0),   // updated in batch 1
        3L -> ("C", 31.0)))  // inserted then updated
    } finally q.stop()
  }
}

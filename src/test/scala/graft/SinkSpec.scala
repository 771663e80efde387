package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._

/** Writer-side behavior (S4–S8): catalog tables, append/overwrite
  * round-trips, and re-run idempotency — the reference's transaction-per-
  * stage load (`webscraper-postgres.py:109–144`) mapped to write-job
  * atomicity. */
class SinkSpec extends SparkSpec {

  test("saveAsTable creates a catalog table readable by name (S4 DDL)") {
    val n = Tables.nation(spark, sf)
    n.write.mode("overwrite").saveAsTable("graft_nation")
    assert(spark.table("graft_nation").count() == n.count())
    assert(spark.catalog.tableExists("graft_nation"))
    // CREATE TABLE IF NOT EXISTS semantics: a second overwrite is clean
    n.write.mode("overwrite").saveAsTable("graft_nation")
    assert(spark.table("graft_nation").count() == n.count())
    spark.sql("DROP TABLE graft_nation")
  }

  test("csv roundtrip preserves rows and schema (S8)") {
    val back = Sinks.csvRoundtrip(spark, sf)
    assertSameRows(back, Tables.nation(spark, sf))
    assert(back.schema == Tables.nation(spark, sf).schema)
  }

  test("partitionBy write enables partition pruning on read") {
    val e = Tables.events(spark, sf)
    val path = "target/tmp/graft_part/events"
    e.write.mode("overwrite").partitionBy("event_type").parquet(path)
    val back = spark.read.parquet(path).filter(col("event_type") === "click")
    val p = back.queryExecution.executedPlan.toString()
    assert(p.contains("PartitionFilters: [isnotnull(event_type"),
      s"event_type filter must prune partitions, not scan+filter:\n$p")
    assert(back.count() == e.filter(col("event_type") === "click").count())
  }

  test("insert-if-absent sink is idempotent across re-runs (S5/U1)") {
    val first = Sinks.insertIfAbsentSink(spark, sf).collect().toSet
    val second = Sinks.insertIfAbsentSink(spark, sf).collect().toSet
    assert(first == second)
    // and the sink never holds a duplicate key
    val keys = Sinks.insertIfAbsentSink(spark, sf).select("o_orderkey")
    assert(keys.count() == keys.distinct().count())
  }
}

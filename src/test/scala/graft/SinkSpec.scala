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

  test("CSV malformed rows are captured, not fatal (PERMISSIVE + corrupt-record column)") {
    import org.apache.spark.sql.types._
    val path = "target/tmp/graft_csv/dirty"
    val dirty = Seq("1,alpha,10", "2,beta,not_a_number", "3,gamma,30")
    spark.createDataset(dirty)(org.apache.spark.sql.Encoders.STRING)
      .coalesce(1).write.mode("overwrite").text(path)
    val schema = StructType(Seq(
      StructField("id", IntegerType), StructField("name", StringType),
      StructField("qty", IntegerType), StructField("_bad", StringType)))
    // caching is required before querying only the corrupt column
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction)
    val parsed = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_bad")
      .csv(path).cache()
    val rows = parsed.collect()
    assert(rows.length == 3, "malformed rows must not be dropped or fatal")
    val bad = parsed.filter(col("_bad").isNotNull)
    assert(bad.count() == 1 && bad.head.getAs[String]("_bad").contains("not_a_number"))
    // the reference's per-field try/except→NaN analog: bad field → null
    assert(parsed.filter(col("qty").isNull).count() == 1)
  }

  test("insert-if-absent sink is idempotent across re-runs (S5/U1)") {
    val first = Sinks.insertIfAbsentSink(spark, sf).collect().toSet
    val second = Sinks.insertIfAbsentSink(spark, sf).collect().toSet
    assert(first == second)
    // and the sink never holds a duplicate key
    val keys = Sinks.insertIfAbsentSink(spark, sf).select("o_orderkey")
    assert(keys.count() == keys.distinct().count())
  }

  test("partitioned sink: the filtered read-back prunes to one partition directory") {
    val df = Sinks.partitionedSink(spark, sf)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"partition-column filter must prune directories, not scan rows:\n$plan")
    assert(df.count() > 0)
    // and the pruned read equals the plain filter over the source
    assertSameRows(df,
      Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"),
        org.apache.spark.sql.functions.year(col("o_orderdate")).as("o_year"))
        .filter(col("o_year") === 1995))
  }

  test("JDBC write + read roundtrip preserves rows, names, and types (S3/S5)") {
    val n = Tables.nation(spark, sf)
    val back = Sinks.jdbcRoundtrip(spark, sf)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      n.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"schema drifted through JDBC: ${back.schema} vs ${n.schema}")
    assertSameRows(back, n)
    // overwrite mode = idempotent re-run (the reference's weekly-cron property)
    assert(Sinks.jdbcRoundtrip(spark, sf).count() == n.count())
  }

  test("compaction: file count follows the size target; content identical") {
    val d = Tables.documents(spark, sf)
    val back = Sinks.compactSmallFiles(spark, sf)
    assertSameRows(back, d)
    def countFiles(path: String): Int = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).count(_.getPath.getName.endsWith(".parquet"))
    }
    val nFrag = countFiles(Tables.tmpPath(spark, "graft_compact/fragmented"))
    val nComp = countFiles(Tables.tmpPath(spark, "graft_compact/compacted"))
    assert(nFrag == 64, s"fixture must fragment to 64 files, got $nFrag")
    assert(nComp < nFrag, s"compaction must reduce file count: $nComp vs $nFrag")
    // a tighter target must yield at least as many files
    Sinks.compactSmallFiles(spark, sf, targetBytes = 16L << 10).count()
    val nTight = countFiles(Tables.tmpPath(spark, "graft_compact/compacted"))
    assert(nTight >= nComp, s"smaller target cannot produce fewer files: $nTight vs $nComp")
  }

  test("JSONL write + schema-pinned read-back roundtrips the corpus exactly") {
    val d = Tables.documents(spark, sf)
    val back = Sinks.jsonlRoundtrip(spark, sf)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      d.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      s"schema drifted through JSONL: ${back.schema} vs ${d.schema}")
    // text fidelity (escaping, unicode) is the point of the roundtrip
    assertSameRows(back, d)
  }

  test("q122 mergeSchema read serves the union schema with nulls for old files") {
    import org.apache.spark.sql.functions._
    val merged = sources.Sinks.schemaEvolutionRead(spark, sf)
    assert(merged.schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"))
    val total = Tables.orders(spark, sf).count()
    assert(merged.count() == total)
    // v1 (even keys) predates the column; v2 (odd keys) carries it
    assert(merged.filter(col("o_orderkey") % 2 === 0 &&
      col("o_orderstatus").isNotNull).count() == 0)
    assert(merged.filter(col("o_orderkey") % 2 =!= 0 &&
      col("o_orderstatus").isNull).count() == 0)
  }

  test("q123 transitions: edges count real consecutive pairs, top-k cut total") {
    import org.apache.spark.sql.functions._
    val top = graft.ops.Events.clickTransitions(spark, sf, topK = 10).collect()
    assert(top.length == 10)
    // counts are non-increasing down the cut
    val ns = top.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    // total transition mass = events - one terminal event per user
    val all = graft.ops.Events.clickTransitions(spark, sf, topK = 1000000)
    val events = Tables.events(spark, sf)
    val expected = events.count() - events.select("user_id").distinct().count()
    assert(all.agg(sum(col("n"))).collect().head.getLong(0) == expected)
  }
}

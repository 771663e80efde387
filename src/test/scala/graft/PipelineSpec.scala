package graft

import graft.etl.{Extract, Pipeline}
import org.apache.spark.sql.functions._

/** Composition properties of the end-to-end q85 pipeline that the
  * mirrored oracle can't state: determinism across runs, MERGE re-run
  * idempotency (the reference's weekly-cron re-run contract), and
  * stage-consistency invariants. */
class PipelineSpec extends SparkSpec {

  test("pipeline is deterministic across runs") {
    assertSameRows(Pipeline.moviePipeline(spark, sf), Pipeline.moviePipeline(spark, sf))
  }

  test("movies MERGE is re-run idempotent (weekly-cron contract)") {
    val merged = Pipeline.listWithDetails(spark, sf)
    val once = Pipeline.moviesMerge(Pipeline.existingSeed(merged), merged)
    // a second run of the same week's data over the post-merge state must
    // not change the table content — only the op labels differ (every
    // surviving key re-reports 'updated')
    val twice = Pipeline.moviesMerge(once.drop("op"), merged)
    assertSameRows(once.drop("op"), twice.drop("op"))
    assert(twice.filter(col("op") === "inserted").count() == 0,
      "re-run must insert nothing")
  }

  test("every edge's person has exactly one surrogate id and a merged movie") {
    val out = Pipeline.moviePipeline(spark, sf)
    // one id per name, ids form a contiguous 1..n ranking
    val ids = out.select("name", "name_id").distinct()
    assert(ids.count() == ids.select("name").distinct().count())
    val n = ids.count()
    assert(ids.agg(min("name_id"), max("name_id")).head() ==
      org.apache.spark.sql.Row(1L, n), "ids must be dense 1..n")
    // ops are only updated/inserted (all existing keys re-listed)
    assert(out.filter(!col("op").isin("updated", "inserted")).count() == 0)
    // movies without a parsed details_url contribute no edges
    val noUrl = Extract.htmlListExtract(spark, sf)
      .filter(col("details_url").isNull).select(col("p_partkey"))
    assert(out.join(noUrl, Seq("p_partkey"), "left_semi").count() == 0)
  }
}

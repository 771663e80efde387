package graft

import graft.etl.{Extract, Upsert}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end reproduction of the reference's WHOLE dataflow
  * (`webscraper-postgres.py` top to bottom) on synthesized pages: list
  * extraction → detail fan-out → J1 left merge on description →
  * sanitize → entity dedup → surrogate ids → edges → insert-if-absent →
  * MERGE re-run idempotency. This is the "a user of the reference could
  * switch" test: every stage is the library operator, chained. */
class PipelineSpec extends SparkSpec {

  private val nMovies = 40

  /** Synthesized list-page items: one li per movie, all fields present. */
  private def listPages: DataFrame = {
    import spark.implicits._
    (1 to nMovies).toDF("id").selectExpr("id", s"""
      '<li class="ipc-metadata-list-summary-item">'
      || '<div class="ipc-title dli-title with-margin"><a href="/title/tt' || id || '/">x</a></div>'
      || '<h3 class="ipc-title__text">' || id || '. Movie ' || id || '</h3>'
      || '<span class="m dli-title-metadata-item">' || (1970 + id % 40) || '</span>'
      || '<span class="m dli-title-metadata-item">' || (90 + id) || 'm</span>'
      || '<span class="m dli-title-metadata-item">R</span>'
      || '<span class="s metacritic-score-box">' || (50 + id % 50) || '</span>'
      || '<div class="r dli-ratings-container">' || (id % 9 + 1) || '.' || (id % 10) || chr(160) || '(' || id || 'K)</div>'
      || '<div class="p title-description-plot-container">Plot of movie ' || id || '</div>'
      || '</li>' AS html""")
  }

  /** Synthesized detail pages, keyed by the SAME description text (the
    * reference's fragile J1 join key, webscraper-postgres.py:101). */
  private def detailPages: DataFrame = {
    import spark.implicits._
    (1 to nMovies).toDF("id").selectExpr(s"""
      '<div class="detail">'
      || '<p class="pl"><span class="sc-plot">Plot of movie ' || id || '</span></p>'
      || '<ul class="title-pc-list"><li><a>Director ' || (id % 7) || '</a></li></ul>'
      || '<ul class="w"><li>Writer ' || (id % 5) || '</li><li>Writer ' || (id % 11) || '</li></ul>'
      || '<ul class="c"><li class="ipc-inline-list__item">Star ' || (id % 13) || '</li></ul>'
      || '</div>' AS html""")
  }

  private lazy val merged: DataFrame = {
    val movies = Extract.parseListItem(listPages, "html")
      .select("rank", "title", "description", "imdb_score", "views", "details_url")
    val details = Extract.parseDetailPage(detailPages, "html")
      .select(col("description"), col("director"), col("writers"), col("stars"))
    movies.join(details, Seq("description"), "left") // J1: left merge on description
  }

  test("extract + J1 merge: every movie finds exactly one detail page") {
    assert(merged.count() == nMovies)
    assert(merged.filter(col("director").isNull).count() == 0)
  }

  test("sanitizers type the scraped strings: rank/score parse, views stay text") {
    val typed = merged.select(
      expr("try_cast(rank AS INT)").as("rank_i"),
      expr("try_cast(imdb_score AS DECIMAL(3,1))").as("score_d"))
    assert(typed.filter(col("rank_i").isNull).count() == 0)
    assert(typed.filter(col("score_d").isNull).count() == 0)
  }

  test("entity normalization: distinct people, dense surrogate ids, resolved edges") {
    import spark.implicits._
    // A1: flatten director + writers + stars into one name set
    val names = merged.select(explode(split(col("writers"), "\\|")).as("name"))
      .union(merged.select(explode(split(col("stars"), "\\|")).as("name")))
      .union(merged.select(col("director").as("name")))
      .filter(col("name").isNotNull && col("name") =!= "").distinct()
    val expected = ((0 until 5).map(i => s"Writer $i") ++ (0 until 11).map(i => s"Writer $i") ++
      (0 until 13).map(i => s"Star $i") ++ (0 until 7).map(i => s"Director $i")).distinct
    assert(names.as[String].collect().toSet == expected.toSet)
    // surrogate ids: dense 1..N in sorted-name order
    val ids = names.select("name").rdd.map(_.getString(0)).sortBy(identity)
      .zipWithIndex.map { case (n, i) => (n, i + 1) }.collect().toMap
    assert(ids.values.toSeq.sorted == (1 to expected.size))
    // J2–J4: edges resolve through the dictionary, composite-key distinct
    val dict = spark.createDataFrame(ids.toSeq).toDF("name", "name_id")
    val edges = merged.select(col("details_url"), explode(split(col("writers"), "\\|")).as("name"))
      .join(broadcast(dict), "name").select("details_url", "name_id").distinct()
    assert(edges.count() > 0)
    assert(edges.count() == edges.distinct().count())
  }

  test("load stage: insert-if-absent then MERGE re-run is a fixed point") {
    val typed = merged.select(col("details_url"),
      expr("try_cast(rank AS INT)").as("rank"),
      expr("try_cast(imdb_score AS DECIMAL(3,1))").as("imdb_score"))
    val half = typed.filter(col("rank") <= nMovies / 2)
    // first run: half the movies exist; insert-if-absent adds the rest
    val add = Upsert.insertIfAbsent(half, typed, Seq("details_url"))
    assert(add.count() == nMovies - nMovies / 2)
    val state = half.unionByName(add)
    // weekly re-run: same batch, dynamic cols refreshed — nothing changes
    val m1 = Upsert.merge(state, typed, "details_url",
      staticCols = Seq("rank"), dynamicCols = Seq("imdb_score")).drop("op")
      .select("details_url", "rank", "imdb_score")
    val m2 = Upsert.merge(m1, typed, "details_url",
      staticCols = Seq("rank"), dynamicCols = Seq("imdb_score")).drop("op")
      .select("details_url", "rank", "imdb_score")
    assertSameRows(m1, m2)
    assert(m1.count() == nMovies)
  }
}

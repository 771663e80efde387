package graft

import graft.etl.Extract
import org.apache.spark.sql.Row

/** Scrape-parse fixtures (FIXTURES.md §B): every try/except→NaN branch of
  * the reference's extraction (`webscraper-postgres.py:36–70,81–95`) must
  * yield NULL (or [] for list fields), never an error. */
class ExtractSpec extends SparkSpec {

  private lazy val listRows: Map[String, Row] = {
    val df = Extract.readHtmlFixtures(spark,
      getClass.getResource("/html").getPath + "/list_item_*.html")
    Extract.parseListItem(df, "html")
      .select("file", "rank", "title", "year", "duration", "rating",
        "metascore", "imdb_score", "views", "description", "details_url")
      .collect().map(r => r.getString(0) -> r).toMap
  }

  private lazy val detailRows: Map[String, Row] = {
    val df = Extract.readHtmlFixtures(spark,
      getClass.getResource("/html").getPath + "/detail_*.html")
    Extract.parseDetailPage(df, "html")
      .select("file", "description", "director", "writers", "stars")
      .collect().map(r => r.getString(0) -> r).toMap
  }

  private def s(r: Row, i: Int): Option[String] =
    if (r.isNullAt(i)) None else Some(r.getString(i))

  test("full list item extracts all 10 fields") {
    val r = listRows("list_item_full.html")
    assert(s(r, 1) == Some("1"))
    assert(s(r, 2) == Some(" The Shawshank Redemption"))  // python split('.')[1] keeps the space
    assert(s(r, 3) == Some("1994"))
    assert(s(r, 4) == Some("142m"))
    assert(s(r, 5) == Some("R"))
    assert(s(r, 6) == Some("82"))
    assert(s(r, 7) == Some("9.3"))
    assert(s(r, 8) == Some("2.9M"))
    assert(s(r, 9) == Some("Two imprisoned men bond over a number of years."))
    assert(s(r, 10) == Some("https://www.imdb.com/title/tt0111161/"))
  }

  test("missing h3 nulls rank and title, other fields survive") {
    val r = listRows("list_item_missing_h3.html")
    assert(s(r, 1) == None && s(r, 2) == None)
    assert(s(r, 3) == Some("1994"))
    assert(s(r, 10) == Some("https://www.imdb.com/title/tt0000001/"))
  }

  test("title without '.' separator: rank gets the whole text, title is null") {
    val r = listRows("list_item_no_dot.html")
    assert(s(r, 1) == Some("Title Without Rank Separator"))
    assert(s(r, 2) == None)
  }

  test("missing metadata spans null year/duration/rating positionally") {
    val r = listRows("list_item_missing_meta.html")
    assert(s(r, 3) == None && s(r, 4) == None && s(r, 5) == None)
    assert(s(r, 6) == Some("98"))
  }

  test("empty ratings container nulls imdb_score and views") {
    val r = listRows("list_item_missing_meta.html")
    assert(s(r, 7) == None && s(r, 8) == None)
  }

  test("missing title link nulls details_url (no partial URL concat)") {
    val r = listRows("list_item_missing_href.html")
    assert(s(r, 10) == None)
  }

  test("full detail page: description, director, writers from 2nd ul, stars") {
    val r = detailRows("detail_full.html")
    assert(s(r, 1) == Some("A thief who steals corporate secrets."))
    assert(s(r, 2) == Some("Christopher Nolan"))
    assert(s(r, 3) == Some("Jonathan Nolan|David S Goyer"))
    assert(s(r, 4) == Some("Leonardo DiCaprio|Elliot Page"))
  }

  test("missing plot span nulls description; director unaffected") {
    val r = detailRows("detail_missing_description.html")
    assert(s(r, 1) == None)
    assert(s(r, 2) == Some("Akira Kurosawa"))
  }

  test("single ul: writers (positional 2nd ul) and stars are empty, not errors") {
    val r = detailRows("detail_no_writers.html")
    assert(s(r, 3) == Some(""))
    assert(s(r, 4) == Some(""))
  }

  test("fetch source opens ONE fetcher per partition, not per row") {
    import org.apache.spark.sql.functions._
    import graft.sources.{FetchSource, StubListPageFetcher}
    val urls = spark.range(1, 101).toDF("k")
      .select(col("k"), concat(lit("https://fixture.local/title/tt"), col("k"),
        lit("/")).as("url"))
      .repartition(5)
    StubListPageFetcher.inits.set(0)
    val fetched = FetchSource.fetchHtml(urls, "url", () => new StubListPageFetcher)
    assert(fetched.count() == 100)
    assert(StubListPageFetcher.inits.get() == 5,
      s"expected 5 per-partition fetcher inits, got ${StubListPageFetcher.inits.get()}")
  }

  test("fetched pages parse through the same list-item extractor") {
    import org.apache.spark.sql.functions._
    import graft.sources.FetchSource
    val r = FetchSource.fetchParse(spark, sf)
      .filter(col("p_partkey") === 7).collect()
    assert(r.length == 1)
    assert(r.head.getAs[String]("rank") == "7")
    assert(r.head.getAs[String]("title") == " Movie 7")
    assert(r.head.getAs[String]("year") == "1977")
    assert(r.head.getAs[String]("details_url") == "https://www.imdb.com/title/tt7/")
  }
}

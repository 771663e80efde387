package graft

import graft.etl.{Extract, Upsert}
import graft.ops.Clusters
import org.apache.spark.sql.functions._

/** Degenerate-input behavior the oracle can't exercise: empty relations,
  * groups smaller than k, unparseable HTML. Operators must return empty/
  * null results and terminate — never throw or hang. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents on an empty edge list terminates empty") {
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Clusters.connectedComponents(empty).isEmpty)
  }

  test("connectedComponents on a self-loop is a singleton component") {
    val selfy = Seq((7L, 7L)).toDF("a_id", "b_id")
    val got = Clusters.connectedComponents(selfy).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((7L, 7L)))
  }

  test("TopKAgg yields all rows when a group has fewer than k") {
    val topk = udaf(new graft.functions.TopKAgg(5))
    val out = Seq((1L, 0.9, 10L), (1L, 0.8, 11L)).toDF("g", "score", "id")
      .groupBy("g").agg(topk(col("score"), col("id")).as("top"))
      .select(explode(col("top"))).collect()
    assert(out.length == 2)
  }

  test("merge with an empty incoming batch keeps everything") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val incoming = Seq.empty[(Long, String)].toDF("k", "v")
    val m = Upsert.merge(existing, incoming, "k", Seq.empty, Seq("v"))
    assert(m.count() == 2)
    assert(m.filter(col("op") =!= "kept").count() == 0)
  }

  test("merge with an empty existing state inserts everything") {
    val existing = Seq.empty[(Long, String)].toDF("k", "v")
    val incoming = Seq((1L, "a")).toDF("k", "v")
    val m = Upsert.merge(existing, incoming, "k", Seq.empty, Seq("v"))
    assert(m.count() == 1)
    assert(m.head.getAs[String]("op") == "inserted")
  }

  test("parseListItem on garbage/empty HTML nulls every field") {
    val df = Seq("", "<html>nothing relevant</html>", "not html at all").toDF("html")
    val parsed = Extract.parseListItem(df, "html")
      .select("rank", "title", "year", "duration", "rating", "metascore",
        "imdb_score", "views", "description", "details_url")
    parsed.collect().foreach { r =>
      (0 until r.length).foreach(i => assert(r.isNullAt(i), s"col $i not null"))
    }
  }

  test("parseDetailPage on garbage HTML yields null scalars and empty lists") {
    val df = Seq("<div>junk</div>").toDF("html")
    val r = Extract.parseDetailPage(df, "html")
      .select("description", "director", "writers", "stars").head
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getString(2) == "" && r.getString(3) == "")
  }

  test("dedup operators on zero matching documents return empty, not error") {
    // a one-row documents table with empty text produces no shingles
    val docs = Seq((1L, "", "en", "src", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("edge_docs")
    // exact dedup still groups the empty-text row; near-dup pipelines see no pairs
    val fp = docs.groupBy(md5(graft.ops.Dedup.normText(col("text"))).as("text_fp"))
      .agg(min(col("doc_id")).as("keep_id")).collect()
    assert(fp.length == 1)
  }

  test("chunk dedup edges: full copy empties, short doc keeps, first wins") {
    val dir = java.nio.file.Files.createTempDirectory("edge_chunks").toString
    val text25 = (1 to 25).map(i => s"w$i").mkString(" ") // 3 chunks (10/10/5)
    Seq(
      (0L, text25, "en", "src", text25.length.toLong),
      (1L, text25, "en", "src", text25.length.toLong), // exact copy, higher id
      (2L, "solo", "en", "src", 4L))                   // single token, unique
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.Curation.chunkDedup(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("n_kept") == 3 &&
      out(0L).getAs[String]("text_clean") == text25, "first occurrence keeps all")
    assert(out(1L).getAs[Long]("n_kept") == 0 &&
      out(1L).getAs[String]("text_clean") == "", "full copy loses every chunk")
    assert(out(2L).getAs[Long]("n_kept") == 1 &&
      out(2L).getAs[String]("text_clean") == "solo", "unique short doc survives")
  }
}

package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact, exact-jaccard
  * over shingle sets (inverted index), MinHash-LSH (approximate scale
  * path), SimHash. The north-star extension set from SURVEY.md §7.3(6).
  *
  * Scale design: everything is expressed as explode → shuffle-on-key →
  * aggregate; no driver-side state, no cross product. The exact all-pairs
  * jaccard uses an inverted shingle index (pairs must share ≥1 shingle —
  * exact for any threshold > 0); MinHash-LSH replaces "share a shingle"
  * with "share a band bucket", trading exactness for near-constant
  * candidate counts at 100 TB.
  */
object Dedup {

  /** Canonical text normalization shared by the dedup family. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Distinct (doc_id, 3-word-shingle) pairs. */
  private def shingles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(normText(col("text")), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(toks) >= 3
          |  THEN transform(sequence(0, size(toks)-3),
          |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
          |  ELSE array() END""".stripMargin)).as("shingle"))
      .distinct()

  /** Exact dedup: group on the md5 fingerprint of the normalized text,
    * keep min doc_id (the reference's UNIQUE-constraint dedup,
    * `webscraper-postgres.py:122`, applied to documents). Grouping on the
    * 32-byte fingerprint instead of the text itself keeps the shuffle
    * payload constant-size per document at 100 TB — the full text never
    * travels. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(normText(col("text"))).as("text_fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact n-gram (3-shingle) Jaccard near-dup pairs, j ≥ 0.5.
    * Inverted-index candidate generation: only pairs sharing a shingle are
    * scored — exact, because j ≥ 0.5 > 0 implies a shared shingle. The
    * heavy hitter risk (a shingle shared by k docs costs k² candidate
    * rows) is the reason the LSH variant below exists; prefix filtering
    * would prune further while staying exact. */
  def jaccardNearDup(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = sh.select(col("doc_id").as("a_id"), col("shingle"))
    val b = sh.select(col("doc_id").as("b_id"), col("shingle"))
    val inter = a.join(b, "shingle")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("sz", "sz_a"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("sz", "sz_b"), "b_id")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  private val NumHashes = 16
  private val BandRows = 2 // 8 bands × 2 rows: P(candidate|j=0.5) ≈ 0.90

  /** MinHash signatures: one row per doc, h0..h15 = min over shingles of
    * xxhash64(seed, shingle). A single shuffle (groupBy doc_id) computes
    * all 16 mins map-side-partially — this is the 100 TB path where the
    * exact inverted index blows up. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val aggs = (0 until NumHashes).map(s =>
      min(xxhash64(lit(s), col("shingle"))).as(s"h$s"))
    shingles(spark, dir).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH near-dup: band the signatures, bucket-join on
    * (band, band_hash), then verify candidates with EXACT jaccard and keep
    * j ≥ 0.5. Output ⊆ jaccardNearDup's (approximate recall, perfect
    * precision after verification) — asserted in DedupSpec. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(spark, dir)
    val bandCols = (0 until NumHashes / BandRows).map { b =>
      val cols = (0 until BandRows).map(r => col(s"h${b * BandRows + r}"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bh"))
    val cand = buckets.as("x").join(buckets.as("y"), Seq("band", "bh"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    // exact-jaccard verification of the candidate set only
    val sh = shingles(spark, dir)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.select(col("doc_id").as("a_id"), col("shingle")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("shingle").as("shingle_b")), "b_id")
      .filter(col("shingle") === col("shingle_b"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("sz", "sz_a"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("sz", "sz_b"), "b_id")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** SimHash near-dup: 64-bit signature per doc via the VectorSumAgg
    * custom Aggregator (one shuffle), candidates via 16-bit chunk
    * bucketing (Hamming ≤ 3 ⇒ ≥1 of 4 chunks equal, pigeonhole — exact
    * recall for the ≤3 band), verified with bit_count(xor). */
  def simhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhashSignatures(spark, dir)
    val chunks = sig.select(col("doc_id"), col("simhash"),
      explode(expr(
        "transform(sequence(0,3), i -> struct(i AS ck, shiftright(simhash, i*16) & 65535 AS cv))")).as("c"))
      .select(col("doc_id"), col("simhash"), col("c.ck"), col("c.cv"))
    chunks.as("x").join(chunks.as("y"), Seq("ck", "cv"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.simhash").as("sh_a"), col("y.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** doc_id → 64-bit simhash of its token set. */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val vecSum = udaf(new graft.functions.VectorSumAgg(64))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(normText(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()
      .select(col("doc_id"), expr(
        "transform(sequence(0,63), i -> CASE WHEN shiftright(xxhash64(tok), i) & 1 = 1 THEN 1L ELSE -1L END)")
        .as("bits"))
      .groupBy(col("doc_id"))
      .agg(vecSum(col("bits")).as("sums"))
      .select(col("doc_id"), expr(
        """aggregate(sequence(0,63), 0L,
          |  (acc, i) -> CASE WHEN sums[i] >= 0 THEN acc | shiftleft(1L, i) ELSE acc END)""".stripMargin)
        .as("simhash"))
  }

  private val shinglesSql =
    """SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(0, greatest(len(t)-2, 0)),
      |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS shingle
      |FROM (SELECT doc_id,
      |        string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |      FROM documents)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q21_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS text_fp,
        |  min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,
    "q22_jaccard_neardup" ->
      s"""WITH sh AS ($shinglesSql),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id,
         |  CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = a_id
         |JOIN sizes sb ON sb.doc_id = b_id
         |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5""".stripMargin,
    // q23/q24 are approximate (hash-seeded LSH / simhash buckets) — no SQL
    // oracle; they get rows-only driver checks + recall/precision specs in
    // DedupSpec against the exact q22 result.
  )
}

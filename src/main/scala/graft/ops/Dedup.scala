package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact, exact-jaccard
  * over shingle sets (inverted index), MinHash-LSH (approximate scale
  * path), SimHash. The north-star extension set from SURVEY.md §7.3(6).
  *
  * Scale design: everything is expressed as explode → shuffle-on-key →
  * aggregate; no driver-side state, no cross product. Candidate
  * enumeration is always bounded: the exact-jaccard inverted index skips
  * heavy-hitter shingles (df cap) for *enumeration only* (scores still use
  * the full shingle sets), MinHash-LSH replaces "share a shingle" with
  * "share a band bucket", SimHash banding keeps per-bucket groups narrow.
  *
  * Determinism/oracle design: every hash here is md5 — bit-identical in
  * Spark and DuckDB — so q22/q23/q24 are all checkable against DuckDB
  * SQL implementing the very same pipeline (CORRECTNESS gate), unlike
  * seeded xxhash/murmur which only Spark computes.
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

  /** Exact-jaccard scoring of a candidate (a_id, b_id) pair set against
    * the full shingle index: |A∩B| via a hash join on (id, shingle),
    * |A∪B| by inclusion-exclusion, keep j ≥ threshold. Shared by the
    * exact (q22) and LSH (q23) variants — only candidate *enumeration*
    * differs between them; scores are always exact. */
  private def verifyJaccard(cand: DataFrame, sh: DataFrame,
                            threshold: Double): DataFrame = {
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.select(col("doc_id").as("a_id"), col("shingle")), "a_id")
      .join(sh.select(col("doc_id").as("b_id"), col("shingle")),
        Seq("b_id", "shingle")) // equi-join on (b_id, shingle): no pair-local cross product
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("sz", "sz_a"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("sz", "sz_b"), "b_id")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Shingles whose document frequency is ≤ maxDf — candidate enumeration
    * skips heavy hitters (a shingle shared by k docs emits k² candidate
    * rows; one hot shingle would dominate a 100 TB run). Verification
    * still scores over ALL shingles, so reported jaccards stay exact; a
    * pair is only missed if *every* shared shingle is a heavy hitter,
    * which j ≥ 0.5 pairs of real documents don't exhibit (checked against
    * the uncapped oracle in CORRECTNESS + DedupSpec). */
  private def rareShingles(sh: DataFrame, maxDf: Int): DataFrame =
    sh.withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))))
      .filter(col("df") <= maxDf)
      .drop("df")

  private val MaxShingleDf = 50

  /** Exact n-gram (3-shingle) Jaccard near-dup pairs, j ≥ 0.5.
    * Inverted-index candidate generation over df-capped shingles, exact
    * verification over all shingles. */
  def jaccardNearDup(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingles(spark, dir)
    val idx = rareShingles(sh, MaxShingleDf)
    val cand = idx.select(col("doc_id").as("a_id"), col("shingle"))
      .join(idx.select(col("doc_id").as("b_id"), col("shingle")), "shingle")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    verifyJaccard(cand, sh, 0.5)
  }

  private val NumHashes = 16
  private val BandRows = 2 // 8 bands × 2 rows: P(candidate|j=0.5) ≈ 0.90

  /** MinHash signatures: one row per doc, h0..h15 = lexicographic min over
    * shingles of md5("seed:shingle") (a uniform hash's hex string is a
    * valid permutation proxy, and md5 is engine-portable — DuckDB computes
    * the identical signature, which is what makes q23 oracle-checkable).
    * A single shuffle (groupBy doc_id) computes all 16 mins with map-side
    * partial aggregation — this is the 100 TB path where the exact
    * inverted index blows up. */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val aggs = (0 until NumHashes).map(s =>
      min(md5(concat(lit(s"$s:"), col("shingle")))).as(s"h$s"))
    shingles(spark, dir).groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash-LSH near-dup: band the signatures (band hash = md5 of the
    * band's rows), bucket-join on (band, band_hash), then verify
    * candidates with EXACT jaccard and keep j ≥ 0.5. Output ⊆ the exact
    * q22 result (approximate recall, perfect precision after
    * verification) — asserted in DedupSpec and against the DuckDB oracle
    * implementing this same pipeline. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sig = minhashSignatures(spark, dir)
    val bandCols = (0 until NumHashes / BandRows).map { b =>
      val cols = (0 until BandRows).map(r => col(s"h${b * BandRows + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", cols: _*)).as("bh"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bh"))
    val cand = buckets.as("x").join(buckets.as("y"), Seq("band", "bh"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    verifyJaccard(cand, shingles(spark, dir), 0.5)
  }

  /** SimHash near-dup, Hamming ≤ 3 over 64-bit signatures.
    * Banding: 8 chunks of 8 bits, candidates = pairs equal on ≥1 of the
    * C(8,2)=28 chunk *pairs* (16-bit band values). Pigeonhole: ≤3
    * differing bits touch ≤3 chunks, leaving ≥5 clean chunks ⇒ ≥10 clean
    * chunk-pairs — exact recall for the ≤3 band, with narrower buckets
    * than single 16-bit chunks (a hot 16-bit value can't collapse the
    * whole corpus into one group; asserted in DedupSpec). */
  def simhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhashSignatures(spark, dir)
    val bandCols = for { i <- 0 until 8; j <- i + 1 until 8 } yield
      struct(lit(i * 8 + j).as("band"),
        concat(substring(col("sig"), i * 8 + 1, 8),
               substring(col("sig"), j * 8 + 1, 8)).as("bv"))
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.bv"))
    val cand = buckets.as("x").join(buckets.as("y"), Seq("band", "bv"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    cand
      .join(sig.select(col("doc_id").as("a_id"), col("sig").as("sig_a")), "a_id")
      .join(sig.select(col("doc_id").as("b_id"), col("sig").as("sig_b")), "b_id")
      .withColumn("hamming", expr(
        "CAST(size(filter(sequence(1, 64), k -> substring(sig_a, k, 1) <> substring(sig_b, k, 1))) AS INT)"))
      .filter(col("hamming") <= 3)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** doc_id → 64-bit simhash of its token set, as a 64-char '0'/'1'
    * string (bit i at position i+1). Per-token bits come from the md5 hex
    * digits (bit i = bit (i mod 4) of hex digit (i div 4)) — engine-
    * portable, so DuckDB derives identical signatures. The per-bit ±1
    * sums accumulate through the VectorSumAgg typed Aggregator: partial
    * aggregation merges 64-long buffers map-side, so the shuffle carries
    * one buffer per (doc × partition), not one row per token. */
  def simhashSignatures(spark: SparkSession, dir: String): DataFrame = {
    val vecSum = udaf(new graft.functions.VectorSumAgg(64))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(normText(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()
      .select(col("doc_id"), expr(
        """transform(sequence(0, 63), i ->
          |  CASE WHEN (shiftright(instr('0123456789abcdef',
          |                substring(md5(tok), (i div 4) + 1, 1)) - 1,
          |              i % 4) & 1) = 1
          |  THEN 1L ELSE -1L END)""".stripMargin)
        .as("bits"))
      .groupBy(col("doc_id"))
      .agg(vecSum(col("bits")).as("sums"))
      .select(col("doc_id"), expr(
        "concat_ws('', transform(sums, s -> CASE WHEN s >= 0 THEN '1' ELSE '0' END))")
        .as("sig"))
  }

  private val shinglesSql =
    """SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(0, greatest(len(t)-2, 0)),
      |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS shingle
      |FROM (SELECT doc_id,
      |        string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      |      FROM documents)""".stripMargin

  /** Exact-jaccard verification SQL over a `cand(a_id, b_id)` CTE — the
    * DuckDB mirror of verifyJaccard. */
  private val verifySql =
    """sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
      |inter AS (
      |  SELECT c.a_id, c.b_id, count(*) AS i
      |  FROM cand c
      |  JOIN sh a ON a.doc_id = c.a_id
      |  JOIN sh b ON b.doc_id = c.b_id AND b.shingle = a.shingle
      |  GROUP BY 1, 2)
      |SELECT a_id, b_id,
      |  CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = a_id
      |JOIN sizes sb ON sb.doc_id = b_id
      |WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5""".stripMargin

  private val minhashSigSql = {
    val mins = (0 until NumHashes)
      .map(s => s"min(md5('$s:' || shingle)) AS h$s").mkString(",\n  ")
    s"SELECT doc_id,\n  $mins\nFROM sh GROUP BY doc_id"
  }

  private val minhashBandSql = {
    val cases = (0 until NumHashes / BandRows).map { b =>
      val parts = (0 until BandRows).map(r => s"h${b * BandRows + r}")
      s"WHEN $b THEN md5(${parts.mkString(" || '|' || ")})"
    }.mkString(" ")
    s"""SELECT doc_id, band, CASE band $cases END AS bh
       |FROM sig, (SELECT unnest(range(0, ${NumHashes / BandRows})) AS band)""".stripMargin
  }

  private val simhashSigSql =
    """toks AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id,
      |      unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      |    FROM documents) WHERE tok <> ''),
      |bitsum AS (
      |  SELECT doc_id, i,
      |    sum(CASE WHEN ((strpos('0123456789abcdef',
      |            substr(md5(tok), CAST(i // 4 + 1 AS INT), 1)) - 1)
      |          >> (i % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM toks, (SELECT unnest(range(0, 64)) AS i) GROUP BY doc_id, i),
      |sig AS (
      |  SELECT doc_id,
      |    string_agg(CASE WHEN s >= 0 THEN '1' ELSE '0' END, '' ORDER BY i) AS sig
      |  FROM bitsum GROUP BY doc_id)""".stripMargin

  val oracle: Map[String, String] = Map(
    "q21_dedup_exact" ->
      """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS text_fp,
        |  min(doc_id) AS keep_id, count(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,
    // q22: the uncapped exact inverted index — deliberately NOT the capped
    // enumeration the Spark side runs, so the oracle also proves the df
    // cap loses no pairs on this corpus.
    "q22_jaccard_neardup" ->
      s"""WITH sh AS ($shinglesSql),
         |cand AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |$verifySql""".stripMargin,
    "q23_minhash_lsh" ->
      s"""WITH sh AS ($shinglesSql),
         |sig AS ($minhashSigSql),
         |bk AS ($minhashBandSql),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
         |  FROM bk x JOIN bk y ON x.band = y.band AND x.bh = y.bh
         |    AND x.doc_id < y.doc_id),
         |$verifySql""".stripMargin,
    "q24_simhash_neardup" ->
      s"""WITH $simhashSigSql,
         |bands AS (
         |  SELECT doc_id, sig, p.i * 8 + p.j AS band,
         |    substr(sig, CAST(p.i * 8 + 1 AS INT), 8) ||
         |    substr(sig, CAST(p.j * 8 + 1 AS INT), 8) AS bv
         |  FROM sig, (SELECT a.i, b.j
         |             FROM (SELECT unnest(range(0, 8)) AS i) a,
         |                  (SELECT unnest(range(0, 8)) AS j) b
         |             WHERE a.i < b.j) p),
         |cand AS (
         |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id,
         |    x.sig AS sig_a, y.sig AS sig_b
         |  FROM bands x JOIN bands y ON x.band = y.band AND x.bv = y.bv
         |    AND x.doc_id < y.doc_id)
         |SELECT a_id, b_id, hamming FROM (
         |  SELECT a_id, b_id,
         |    CAST(len(list_filter(range(1, 65),
         |      k -> substr(sig_a, CAST(k AS INT), 1) <> substr(sig_b, CAST(k AS INT), 1))) AS INT) AS hamming
         |  FROM cand)
         |WHERE hamming <= 3""".stripMargin,
  )
}

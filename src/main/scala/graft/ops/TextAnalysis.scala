package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines over `documents`
  * (SURVEY.md §7.3(6)): language-ID heuristic, quality scoring, token
  * counting, document fingerprinting. All per-document map-side
  * expressions (no shuffle at all — embarrassingly parallel at 100 TB),
  * fully codegen'd, no UDFs.
  */
object TextAnalysis {

  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is")
  private val stopEs = Seq("el", "la", "de", "que", "y", "en")
  private val stopFr = Seq("le", "la", "de", "et", "les", "des")
  private val stopDe = Seq("der", "die", "das", "und", "ist")

  private def inList(xs: Seq[String]) = xs.map(s => s"'$s'").mkString(", ")
  private def hits(xs: Seq[String]) =
    s"size(filter(toks, x -> x IN (${inList(xs)})))"

  /** n-gram/stopword language-ID heuristic: score per language = stopword
    * hits; argmax with a fixed precedence order. (The corpus is synthetic
    * — the point is the operator shape, matched exactly by the oracle.) */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", split(Dedup.normText(col("text")), " "))
      .select(col("doc_id"), col("lang"),
        expr(hits(stopEn)).as("en"), expr(hits(stopEs)).as("es"),
        expr(hits(stopFr)).as("fr"), expr(hits(stopDe)).as("de"))
      .withColumn("lang_guess", expr(
        """CASE WHEN en >= es AND en >= fr AND en >= de AND en > 0 THEN 'en'
          |     WHEN es >= fr AND es >= de AND es > 0 THEN 'es'
          |     WHEN fr >= de AND fr > 0 THEN 'fr'
          |     WHEN de > 0 THEN 'de'
          |     ELSE 'und' END""".stripMargin))

  /** Quality scoring: length / punctuation / stopword ratios + a weighted
    * score. Ratios are int/int double divisions (deterministic). */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", split(Dedup.normText(col("text")), " "))
      .select(col("doc_id"),
        length(col("text")).as("text_len"),
        size(col("toks")).as("n_tok"),
        (length(col("text")) - length(regexp_replace(col("text"), "[a-zA-Z]", "")))
          .as("n_alpha"),
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .as("n_punct"),
        expr(hits(stopEn)).as("stop_hits"))
      .withColumn("alpha_ratio", col("n_alpha").cast("double") / col("text_len"))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_tok"))
      .withColumn("quality", expr(
        "0.5 * alpha_ratio + 0.3 * stop_ratio + 0.2 * least(CAST(n_tok AS DOUBLE) / 20.0, 1.0)"))
      .withColumn("low_quality", col("quality") < 0.5)

  /** Token counting: whitespace tokens, BPE-ish regex tokens
    * ([alpha]+ | [digit]+ | single symbol), distinct counts, bytes/token. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "\\s+")).as("n_ws_tokens"),
        expr("regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\\\s]', 0)").as("bpe"))
      .select(col("doc_id"), col("source"), col("n_ws_tokens"),
        size(col("bpe")).as("n_bpe_tokens"),
        size(array_distinct(col("bpe"))).as("n_uniq_tokens"))

  /** Document fingerprinting: md5 of normalized text (exact-dup key) +
    * min shingle hash (MinHash-style content fingerprint, k=1). md5 is
    * identical across engines, so this one IS oracle-checkable (unlike
    * seeded murmur/xxhash). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("norm", Dedup.normText(col("text")))
      .withColumn("toks", split(col("norm"), " "))
      .select(col("doc_id"),
        md5(col("norm")).as("fp"),
        expr(
          """array_min(CASE WHEN size(toks) >= 3
            |  THEN transform(sequence(0, size(toks)-3),
            |         i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
            |  ELSE array() END)""".stripMargin).as("min_shingle_fp"))

  /** TF-IDF with top-3 terms per document: tf = in-doc occurrences,
    * idf = ln((N+1)/(df+1)). One shuffle for tf (groupBy doc,term), one
    * for df (groupBy term), corpus size joined in as a broadcast scalar;
    * the per-doc top-3 window partitions on doc_id only — group size is
    * bounded by a document's vocabulary, never the corpus. */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val toks = docs
      .select(col("doc_id"), explode(split(Dedup.normText(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "tok").crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") *
          log((col("n_docs") + lit(1)).cast("double") / (col("df") + lit(1)).cast("double")))
    scored
      // ln() is not correctly-rounded and differs by 1 ulp across libm
      // implementations — rank AND report on the 6-dp-rounded score (tok
      // as total-order tiebreak), so a 1-ulp cross-engine divergence at
      // the rank-3/4 boundary cannot flip top-3 membership
      .withColumn("tfidf", round(col("tfidf"), 6))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(desc("tfidf"), asc("tok"))))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("tok"), col("tf"), col("df"),
        col("tfidf"), col("rn"))
  }

  /** Reproducible train/eval split by content-independent hash: md5 of
    * the doc id compared against a hex threshold ('e6…' ≈ 90% of the
    * uniform hex space). Pure map-side, deterministic across engines and
    * re-runs — the property a training-data split must have (adding docs
    * never reshuffles existing assignments). */
  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        when(md5(col("doc_id").cast("string")) < "e6", "train")
          .otherwise("eval").as("split"))

  /** Deterministic stratified sampling for training-data mixing: keep a
    * per-stratum fraction of documents by comparing md5(doc_id) against a
    * per-language hex threshold (uniform hash ⇒ the kept fraction ≈ the
    * threshold's position in hex space). Content-independent, map-side,
    * reproducible across engines/re-runs, and stable under corpus growth
    * — unlike RNG-seeded sampleBy, whose assignments are engine-specific
    * and reshuffle when partitioning changes. en ≈ 75% ('c0'), others
    * ≈ 25% ('40'). */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h", md5(col("doc_id").cast("string")))
      .filter(when(col("lang") === "en", col("h") < "c0").otherwise(col("h") < "40"))
      .select(col("doc_id"), col("lang"), col("source"))

  /** C4-style text cleaning for training corpora: scrub URLs and emails,
    * strip control characters, collapse whitespace — each step a
    * codegen'd regexp_replace (RE2-compatible patterns, identical in the
    * oracle), with before/after sizes for audit. Map-side only. */
  def textClean(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("cleaned",
        trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          col("text"),
          "https?://[^\\s]+", "<URL>"),
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""),
          "\\s+", " ")))
      .select(col("doc_id"),
        length(col("text")).as("len_before"),
        length(col("cleaned")).as("len_after"),
        md5(col("cleaned")).as("clean_fp"),
        (length(col("text")) - length(col("cleaned"))).as("removed"))

  /** The curation pipeline composed end-to-end: canonical-copy selection
    * (exact-dup fingerprint, keep min doc_id), alpha-ratio quality gate,
    * and a minimum-length gate, accounted per language — the decision
    * summary a corpus build reviews before committing (each gate is an
    * operator from this module; composition stays one shuffled window +
    * one aggregate). */
  def curationSummary(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp"))
    val base = Tables.documents(spark, dir)
      .withColumn("fp", md5(Dedup.normText(col("text"))))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("n_alpha",
        length(col("text")) - length(regexp_replace(col("text"), "[a-zA-Z]", "")))
      .withColumn("alpha_ratio", col("n_alpha").cast("double") / length(col("text")))
      .withColumn("n_tok", size(split(Dedup.normText(col("text")), " ")))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .withColumn("is_lowq", col("alpha_ratio") < 0.5)
      .withColumn("is_short", col("n_tok") < 5)
    base.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dupes"),
        sum(when(!col("is_dup") && col("is_lowq"), 1L).otherwise(0L)).as("n_lowq"),
        sum(when(!col("is_dup") && !col("is_lowq") && col("is_short"), 1L).otherwise(0L)).as("n_short"),
        sum(when(!col("is_dup") && !col("is_lowq") && !col("is_short"), 1L).otherwise(0L)).as("n_kept"))
  }

  private def hitsSql(xs: Seq[String]) =
    s"len(list_filter(toks, x -> x IN (${inList(xs)})))"

  private val toksSql =
    "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"

  val oracle: Map[String, String] = Map(
    "q28_langid" ->
      s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks FROM documents),
         |h AS (SELECT doc_id, lang,
         |  ${hitsSql(stopEn)} AS en, ${hitsSql(stopEs)} AS es,
         |  ${hitsSql(stopFr)} AS fr, ${hitsSql(stopDe)} AS de FROM t)
         |SELECT *, CASE WHEN en >= es AND en >= fr AND en >= de AND en > 0 THEN 'en'
         |     WHEN es >= fr AND es >= de AND es > 0 THEN 'es'
         |     WHEN fr >= de AND fr > 0 THEN 'fr'
         |     WHEN de > 0 THEN 'de'
         |     ELSE 'und' END AS lang_guess
         |FROM h""".stripMargin,
    "q29_quality_score" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |m AS (SELECT doc_id,
         |  length(text) AS text_len,
         |  len(toks) AS n_tok,
         |  length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS n_alpha,
         |  length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         |  ${hitsSql(stopEn)} AS stop_hits
         |FROM t)
         |SELECT *,
         |  CAST(n_alpha AS DOUBLE) / text_len AS alpha_ratio,
         |  CAST(stop_hits AS DOUBLE) / n_tok AS stop_ratio,
         |  0.5 * (CAST(n_alpha AS DOUBLE) / text_len)
         |    + 0.3 * (CAST(stop_hits AS DOUBLE) / n_tok)
         |    + 0.2 * least(CAST(n_tok AS DOUBLE) / 20.0, 1.0) AS quality,
         |  (0.5 * (CAST(n_alpha AS DOUBLE) / text_len)
         |    + 0.3 * (CAST(stop_hits AS DOUBLE) / n_tok)
         |    + 0.2 * least(CAST(n_tok AS DOUBLE) / 20.0, 1.0)) < 0.5 AS low_quality
         |FROM m""".stripMargin,
    "q30_token_stats" ->
      """SELECT doc_id, source,
        |  len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
        |  len(list_distinct(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS n_uniq_tokens
        |FROM documents""".stripMargin,
    "q49_tfidf" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks WHERE tok <> '' GROUP BY 1, 2),
         |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
         |    round(CAST(tf.tf AS DOUBLE) * ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)), 6) AS tfidf
         |  FROM tf JOIN dfreq USING (tok) CROSS JOIN n)
         |SELECT doc_id, tok, tf, df, tfidf, rn FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rn
         |  FROM scored)
         |WHERE rn <= 3""".stripMargin,
    "q50_hash_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6' THEN 'train' ELSE 'eval' END AS split
        |FROM documents""".stripMargin,
    "q51_stratified_sample" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CASE WHEN lang = 'en' THEN md5(CAST(doc_id AS VARCHAR)) < 'c0'
        |           ELSE md5(CAST(doc_id AS VARCHAR)) < '40' END""".stripMargin,
    "q73_curation_summary" ->
      """WITH base AS (
        |  SELECT lang, doc_id,
        |    md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
        |    CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / length(text) AS alpha_ratio,
        |    len(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS n_tok
        |  FROM documents),
        |flagged AS (
        |  SELECT lang,
        |    doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup,
        |    alpha_ratio < 0.5 AS is_lowq,
        |    n_tok < 5 AS is_short
        |  FROM base)
        |SELECT lang, count(*) AS n_total,
        |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dupes,
        |  CAST(sum(CASE WHEN NOT is_dup AND is_lowq THEN 1 ELSE 0 END) AS BIGINT) AS n_lowq,
        |  CAST(sum(CASE WHEN NOT is_dup AND NOT is_lowq AND is_short THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
        |  CAST(sum(CASE WHEN NOT is_dup AND NOT is_lowq AND NOT is_short THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM flagged GROUP BY 1""".stripMargin,
    "q60_text_clean" ->
      """WITH c AS (SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      text,
        |      'https?://[^\s]+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g'),
        |      '\s+', ' ', 'g')) AS cleaned
        |  FROM documents)
        |SELECT doc_id,
        |  length(text) AS len_before,
        |  length(cleaned) AS len_after,
        |  md5(cleaned) AS clean_fp,
        |  length(text) - length(cleaned) AS removed
        |FROM c""".stripMargin,
    "q31_fingerprint" ->
      """WITH t AS (SELECT doc_id,
        |    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm,
        |    string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS fp,
        |  list_min(list_transform(range(0, greatest(len(toks)-2, 0)),
        |    i -> md5(toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS min_shingle_fp
        |FROM t""".stripMargin,
  )
}

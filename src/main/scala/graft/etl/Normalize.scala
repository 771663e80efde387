package graft.etl

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity normalization — the reference's people-dedup + FK-resolution
  * stage (SURVEY.md §2.4–§2.5): flatten list columns, build a global
  * distinct entity set, assign surrogate ids, resolve edges.
  *
  * Reference behaviors: `set(chain(...))` entity dedup
  * (`webscraper-postgres.py:147–154`), SERIAL surrogate keys (`:112,126`),
  * dict-probe FK resolution (`:227,243–246,166–170`) → broadcast hash
  * joins, composite-PK edge dedup (`:132,137,142`).
  */
object Normalize {

  /** A1: explode two "list columns" + one scalar column, union, distinct —
    * one global entity-name set. Distributed as a partial+final hash
    * aggregate; no driver-side set. */
  def entityNames(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val tok  = d.select(explode(split(trim(col("text")), " ")).as("name"))
    val src  = d.select(col("source").as("name"))
    val lang = d.select(col("lang").as("name"))
    tok.union(src).union(lang)
      .filter(col("name").isNotNull && col("name") =!= "")
      .distinct()
  }

  /** SERIAL-style surrogate keys (`webscraper-postgres.py:112,126`), made
    * deterministic: ids are the 1-based rank of the name in sorted order.
    *
    * Scale note: a `row_number()` over a global (partition-less) Window
    * funnels every row through ONE task; `sortBy + zipWithIndex` instead
    * keeps the sort distributed (range-partitioned) and assigns
    * contiguous ids per partition with a per-partition offset — the
    * standard cluster-safe surrogate-key assignment.
    */
  def surrogateIds(spark: SparkSession, dir: String): DataFrame =
    surrogateIdsFor(entityNames(spark, dir))

  /** Same assignment over an arbitrary distinct `name` frame (reused by
    * the composed pipeline's people dictionary, q85). */
  def surrogateIdsFor(names: DataFrame): DataFrame = {
    val ids = names
      .select("name").rdd.map(_.getString(0))
      .sortBy(identity)
      .zipWithIndex()
      .map { case (n, i) => (n, i + 1) }
    names.sparkSession.createDataFrame(ids).toDF("name", "name_id")
  }

  /** J2–J4 + A2: FK-resolution edge build — explode the list column,
    * broadcast-join the (small) entity dictionary, emit distinct
    * (doc_id, name_id) edges. Mirrors the reference's hand-rolled dict
    * probes + composite-PK dedup (`webscraper-postgres.py:239–285`). */
  def edges(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val tok = d
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("name"))
      .filter(col("name") =!= "")
    tok.join(broadcast(surrogateIds(spark, dir)), "name")
      .select("doc_id", "name_id")
      .distinct()
  }

  /** Fuzzy entity matching: near-identical names in the part-name
    * dictionary at Levenshtein ≤ 1 (the reference's README flags name
    * collisions as its entity-resolution gap). Works on the DISTINCT
    * name dictionary — entity resolution is a dictionary-sized problem,
    * so the pair join is over thousands of names, not the fact table.
    *
    * Candidate keys are PassJoin segments (Li, Deng, Feng, "PassJoin: A
    * Partition-based Method for Similarity Joins", VLDB'12), specialized
    * to τ = 1: each data string s of length ls splits into two halves
    * (h = ls div 2); any t with ed(s,t) ≤ 1 contains one half EXACTLY —
    * the prefix s[1..h] at position 1 when the single edit falls after
    * it, else the suffix s[h+1..ls] at position h + 1 + (|t| − ls) —
    * so probing t's 6 windows (2 segments × data length ∈ {|t|−1, |t|,
    * |t|+1}) finds every qualifying pair. The key (part, length,
    * segment-CONTENT) is a real equi-join key: when one length class
    * dominates the dictionary, buckets still subdivide by content,
    * unlike pure length blocking — this is what keeps bucket sizes
    * bounded at a 20M-name dictionary. Catalyst plans a hash join,
    * never a BroadcastNestedLoopJoin (plan-asserted in PlanSpec);
    * Levenshtein runs with an early-abandon threshold (3-arg form) on
    * deduped candidates only. */
  def fuzzyNameMatch(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.part(spark, dir).select(col("p_name")).distinct()
      .withColumn("l", length(col("p_name")))
    // index side: the two exact segments of each data string
    val seg = names.select(col("p_name"), explode(array(
        struct(lit(1).as("part"), col("l").as("ls"),
          expr("substring(p_name, 1, l div 2)").as("seg")),
        struct(lit(2).as("part"), col("l").as("ls"),
          expr("substring(p_name, l div 2 + 1, l - l div 2)").as("seg")))).as("k"))
      .select(col("p_name"), col("k.part").as("part"), col("k.ls").as("ls"),
        col("k.seg").as("seg"))
    // probe side: for each candidate data length ls = l + dl, the exact
    // window where a matching segment must sit (suffix start shifts by
    // δ = |t| − ls = −dl); substring truncation at the string end can
    // only produce a too-short (never falsely-equal) key
    val probe = names.select(col("p_name").as("q_name"), explode(expr(
        """filter(flatten(transform(array(-1, 0, 1), dl ->
          |  array(named_struct('part', 1, 'ls', l + dl,
          |          'seg', substring(p_name, 1, (l + dl) div 2)),
          |        named_struct('part', 2, 'ls', l + dl,
          |          'seg', substring(p_name, (l + dl) div 2 + 1 - dl,
          |                           (l + dl) - (l + dl) div 2))))),
          |  k -> k.ls >= 1)""".stripMargin)).as("k"))
      .select(col("q_name"), col("k.part").as("part"), col("k.ls").as("ls"),
        col("k.seg").as("seg"))
    seg.join(probe, Seq("part", "ls", "seg"))
      .filter(col("p_name") < col("q_name"))
      .select(col("p_name").as("name_a"), col("q_name").as("name_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 1))
      .filter(col("dist") >= 0) // 3-arg levenshtein: −1 marks "above threshold"
  }

  private val namesSql =
    """SELECT DISTINCT name FROM (
      |  SELECT unnest(string_split(trim(text), ' ')) AS name FROM documents
      |  UNION ALL SELECT source FROM documents
      |  UNION ALL SELECT lang FROM documents
      |) WHERE name IS NOT NULL AND name <> ''""".stripMargin

  val oracle: Map[String, String] = Map(
    "q06_entity_dedup" -> namesSql,
    "q07_surrogate_ids" ->
      s"""SELECT name, row_number() OVER (ORDER BY name) AS name_id
         |FROM ($namesSql)""".stripMargin,
    "q08_edges_normalize" ->
      s"""WITH ids AS (
         |  SELECT name, row_number() OVER (ORDER BY name) AS name_id
         |  FROM ($namesSql)),
         |tok AS (
         |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS name
         |  FROM documents)
         |SELECT DISTINCT doc_id, name_id
         |FROM tok JOIN ids USING (name)
         |WHERE name <> ''""".stripMargin,
    "q52_fuzzy_match" ->
      """WITH n AS (SELECT DISTINCT p_name FROM part),
        |c AS (SELECT p_name, length(p_name) AS l FROM n)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        |FROM c a JOIN c b ON a.p_name < b.p_name AND abs(a.l - b.l) <= 1
        |WHERE levenshtein(a.p_name, b.p_name) <= 1""".stripMargin,
  )
}

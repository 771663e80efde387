package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: near-dup PAIRS (q22/q23/q24/q27) only
  * become actionable once transitively clustered — "keep one document per
  * component" — so connected components is the missing last stage of
  * every dedup pipeline here.
  *
  * Algorithm: iterative min-label propagation (each node adopts the
  * smallest id reachable so far; converges in ≤ diameter rounds). Each
  * round is one join + one aggregate — all shuffle-partitioned on node
  * id, no driver-side graph. Dup clusters in web corpora have tiny
  * diameters (a cluster is near-clique shaped), so the loop count is
  * small and independent of corpus size; the classic large-star/
  * small-star optimization would drop the round count further at extreme
  * diameters without changing this interface.
  */
object Clusters {

  /** Connected components of an undirected edge list `(a_id, b_id)`:
    * returns (node, comp) where comp = min node id in the component. */
  def connectedComponents(edges: DataFrame): DataFrame = {
    // localCheckpoint (not just persist) TRUNCATES lineage: without it
    // every iteration re-plans the full upstream DAG (the edge pipeline
    // can be an entire near-dup job) plus one more join per round — the
    // standard iterative-graph hygiene (GraphX materializes the same way).
    // On a fault-tolerant cluster run, swap for reliable checkpoint(): a
    // local checkpoint cannot be recomputed after executor loss.
    val und = edges.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(edges.select(col("b_id").as("src"), col("a_id").as("dst")))
      .localCheckpoint(true)
    var labels = und.select(col("src").as("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      // each node offers its current label to every neighbor
      val offers = und.join(labels, und("src") === labels("node"))
        .select(col("dst").as("node"), col("comp"))
      val next = labels.select("node", "comp").union(offers)
        .groupBy(col("node")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(true)
      changed = next.as("n")
        .join(labels.as("l"), col("n.node") === col("l.node"))
        .filter(col("n.comp") =!= col("l.comp")).count()
      labels = next
    }
    labels
  }

  /** q54: cluster the exact-jaccard near-dup pairs and emit one row per
    * member with its canonical representative (min doc_id of the
    * component) — the "which docs do I drop" answer. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    connectedComponents(Dedup.jaccardNearDup(spark, dir).select("a_id", "b_id"))
      .select(col("node").as("doc_id"), col("comp").as("canonical_id"))

  val oracle: Map[String, String] = Map(
    // reachability via recursive CTE: every label a node can reach;
    // component id = the minimum — identical semantics to the propagation
    "q54_dedup_clusters" ->
      s"""WITH RECURSIVE sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
         |    range(0, greatest(len(t)-2, 0)),
         |    i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))) AS shingle
         |  FROM (SELECT doc_id,
         |        string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS t
         |        FROM documents)),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT a_id, b_id FROM inter
         |  JOIN sizes sa ON sa.doc_id = a_id
         |  JOIN sizes sb ON sb.doc_id = b_id
         |  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5),
         |und AS (SELECT a_id AS src, b_id AS dst FROM pairs
         |        UNION ALL SELECT b_id, a_id FROM pairs),
         |walk(node, lbl) AS (
         |  SELECT src, src FROM und
         |  UNION
         |  SELECT u.dst, w.lbl FROM walk w JOIN und u ON u.src = w.node)
         |SELECT node AS doc_id, min(lbl) AS canonical_id
         |FROM walk GROUP BY node""".stripMargin,
  )
}

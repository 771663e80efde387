package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph analytics beyond connected components (Clusters.scala):
  * PageRank (Page, Brin, Motwani, Winograd 1999) — the standard "which
  * nodes matter" centrality a crawl-curation pipeline runs over its host
  * graph to prioritize fetching and weight domains (the CommonCrawl
  * harmonic/PageRank host ranking). Demonstrated on the orders↔customer
  * bipartite graph (node = 2·orderkey / 2·custkey+1 — the parity trick
  * keeps the two key namespaces disjoint in one BIGINT space).
  *
  * Scale design: each power iteration is ONE shuffle (join ranks to the
  * degree-annotated edge list on src, re-aggregate on dst); the edge list
  * is persisted once with its out-degrees and reused by all iterations,
  * and the node count rides a 1-row broadcast instead of a driver
  * collect. Iteration count is fixed (default 10) — the production
  * shape for rank computation, where convergence-to-tolerance is not
  * worth a per-round driver sync. Undirected edges mean no dangling
  * nodes (every node has in- and out-edges), so no dangling-mass
  * redistribution term is needed.
  *
  * Oracle design: the same 10 iterations UNROLLED as chained CTEs (a
  * recursive CTE cannot aggregate in the recursive term); double
  * summation order differs across engines by ~1e-15 relative, so ranks
  * are reported ×N (O(1) values) rounded to 5 dp, and the top-50 cut
  * ties break on the node id. */
object Graph {

  /** Power iteration over an UNDIRECTED edge list `(src, dst)` (each
    * edge listed in both directions, no self-loops): returns
    * (node, rank, n) with Σ rank = 1. The `n` column carries the node
    * count so callers can normalize without a second pass. */
  private[graft] def rankTable(edges: DataFrame, iters: Int,
                               damping: Double, ckptEvery: Int = 3): DataFrame = {
    require(iters >= 1 && damping > 0 && damping < 1 && ckptEvery >= 1)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // one degree-annotated edge list feeds every iteration — persist it,
    // release once the (node-count-sized) rank table is materialized
    val ed = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = deg.select(col("src").as("node"))
    val nn = nodes.agg(count(lit(1)).as("n"))
    // n enters ONCE as an initial-rank column and stays group-constant
    // through every iteration — no per-round broadcast join
    var ranks = nodes.crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"), col("n"))
    for (i <- 1 to iters) {
      ranks = iterate(ed, ranks, damping)
      // lineage truncation (the Clusters.scala pattern), BATCHED every
      // `ckptEvery` rounds (default 3): an eager checkpoint is a full
      // job, and on a real cluster every job pays scheduler latency, so
      // letting a few rounds compose into one job cuts the job count
      // ~ckptEvery× while plans stay shallow enough that analysis cost
      // never compounds (a monolithic iters-deep tree would). Local A/B
      // at sf0.1 measures 1 vs 3 vs 5 within run-to-run noise — the
      // per-iteration cost there is the shuffle, not the checkpoint —
      // so the knob is a cluster-latency lever, not a local one.
      // Retained blocks are node-count-sized rank vectors, ~MBs even at
      // web scale; on a fault-tolerant cluster swap for reliable
      // checkpoint().
      if (i % ckptEvery == 0 && i < iters) ranks = ranks.localCheckpoint(true)
    }
    val out = ranks.localCheckpoint(true)
    ed.unpersist(false)
    out
  }

  /** One power iteration: shuffle the contribution stream on dst, partial
    * sums map-side. The node count rides along as a constant COLUMN of
    * the rank frame (`first(n)` per group — 8 bytes/row) rather than a
    * per-round 1-row broadcast join: joining nn each round added a
    * BroadcastExchange + join stage to every iteration for a value that
    * never changes. Exposed so PlanSpec can pin the per-round plan shape
    * (the eager checkpointing in `rankTable` hides iteration internals
    * from the final plan). */
  private[graft] def iterate(ed: DataFrame, ranks: DataFrame,
                             damping: Double): DataFrame =
    ed.join(ranks, ed("src") === ranks("node"))
      .select(col("dst").as("node"), (col("rank") / col("d")).as("c"), col("n"))
      .groupBy(col("node")).agg(sum(col("c")).as("m"), first(col("n")).as("n"))
      .select(col("node"),
        ((lit(1.0) - lit(damping)) / col("n") + lit(damping) * col("m")).as("rank"),
        col("n"))

  /** q97: damped PageRank, top-50 nodes. */
  def pageRank(spark: SparkSession, dir: String,
               iters: Int = 10, damping: Double = 0.85,
               ckptEvery: Int = 3): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select((col("o_orderkey") * 2).as("src"), (col("o_custkey") * 2 + 1).as("dst"))
      .distinct()
    val edges = ord.union(ord.select(col("dst").as("src"), col("src").as("dst")))
    rankTable(edges, iters, damping, ckptEvery)
      .select(
        when(col("node") % 2 === 0, "order").otherwise("customer").as("kind"),
        expr("node div 2").as("key"),
        round(col("rank") * col("n"), 5).as("pr"),
        col("node"))
      .orderBy(desc("pr"), asc("node"))
      .limit(50)
      .select(col("kind"), col("key"), col("pr"))
  }

  val oracle: Map[String, String] = {
    val iters = 10
    val chain = (1 to iters).map { k =>
      s"""r$k AS (SELECT node, 0.15/n + 0.85*m AS rank FROM (
         |  SELECT e.dst AS node, sum(r.rank/deg.d) AS m
         |  FROM r${k - 1} r JOIN edges e ON e.src = r.node JOIN deg ON deg.src = r.node
         |  GROUP BY 1) CROSS JOIN nn)""".stripMargin
    }.mkString(",\n")
    Map(
      "q97_pagerank" ->
        s"""WITH e0 AS (SELECT DISTINCT o_orderkey*2 AS src, o_custkey*2+1 AS dst FROM orders),
           |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
           |deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |nn AS (SELECT count(*) AS n FROM nodes),
           |r0 AS (SELECT node, 1.0/n AS rank FROM nodes CROSS JOIN nn),
           |$chain
           |SELECT kind, key, pr FROM (
           |  SELECT CASE WHEN node % 2 = 0 THEN 'order' ELSE 'customer' END AS kind,
           |    node // 2 AS key, round(rank * n, 5) AS pr, node
           |  FROM r$iters CROSS JOIN nn
           |  ORDER BY pr DESC, node LIMIT 50)""".stripMargin,
    )
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over the embedding corpus — the clustering
  * primitive behind corpus organization at scale (topic bucketing,
  * cluster-balanced sampling, and the cluster step of SemDeDup-style
  * semantic dedup, which q27 approximates with md5-sampled cells).
  *
  * Scale shape (the MLlib pattern, expressed in DataFrames): centroids
  * are K·64 numbers — they live in a ONE-ROW frame that broadcast-joins
  * onto the corpus, so ASSIGNMENT is entirely map-side (a transform +
  * array_min over a K-element array per row, whole-stage codegen'd, no
  * shuffle, no UDF); the UPDATE step is one groupBy(cluster) with 64
  * map-side-partial sums, so each Lloyd round shuffles K × partitions
  * rows regardless of corpus size. 3 rounds = 3 tiny shuffles + 3
  * map-side passes over the corpus — the optimal distributed shape.
  *
  * Determinism (the reason this is oracle-checkable EXACTLY, with no
  * float tolerance): all distances run in the integer-scaled BIGINT
  * space of Similarity.scaled (dims ≤ 2e6, so squared distances ≤
  * 64·1.6e13 < 2^63 — exact); each new centroid coordinate is
  * round(sum/n) — sum and n are exact integers, the division is one
  * correctly-rounded double op, and round-half-away-from-zero agrees
  * between Spark (BigDecimal HALF_UP) and DuckDB (C round) — so
  * centroids snap back to BIGINTs both engines derive bit-identically.
  * Ties in the argmin (exact integer distance equality) break to the
  * lowest centroid id via struct ordering. Init is the K smallest
  * vec_ids (a deterministic seed; k-means++ would sample). A cluster
  * that empties simply drops out of the next round in both engines.
  */
object KMeans {

  /** q111: assignment after `iters` Lloyd rounds, K=`k` centroids seeded
    * from the `k` smallest vec_ids. Returns (vec_id, cluster, dist2). */
  def kmeans(spark: SparkSession, dir: String,
             k: Int = 8, iters: Int = 3): DataFrame = {
    val v = Similarity.scaled(spark, dir).select(col("vec_id"), col("ai"))
    finalAssign(v, k, iters).select(col("vec_id"), col("cluster"), col("dist2"))
  }

  /** The shared Lloyd loop + final assignment (vec_id, ai, cluster,
    * dist2) — q111's body, reused by q118's SemDeDup so the clusters
    * both queries (and their chained oracles) see are one code path. */
  private[graft] def finalAssign(v: DataFrame, k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 0)
    var cs = initCentroids(v, k)
    for (_ <- 1 to iters)
      // K-row frame: eager checkpoint keeps each round's plan shallow
      cs = update(assign(v, cs)).localCheckpoint(true)
    assign(v, cs)
  }

  /** One-row frame [carr: array<struct<cid:int, c:array<bigint>>>] from
    * the k smallest vec_ids, cid = rank. TakeOrderedAndProject does the
    * global top-k; the collect_list runs over k rows only. */
  private[graft] def initCentroids(v: DataFrame, k: Int): DataFrame =
    v.orderBy(col("vec_id")).limit(k)
      .agg(sort_array(collect_list(struct(col("vec_id"), col("ai")))).as("s"))
      .select(expr("transform(s, (x, i) -> struct(CAST(i AS INT) AS cid, x.ai AS c))")
        .as("carr"))

  /** Map-side assignment: per row, exact squared distance to each of the
    * K broadcast centroids; array_min's struct ordering gives
    * (min dist2, then min cid). */
  private[graft] def assign(v: DataFrame, cs: DataFrame): DataFrame =
    v.crossJoin(broadcast(cs))
      .withColumn("best", expr(
        """array_min(transform(carr, x -> struct(
          |  aggregate(zip_with(ai, x.c, (a, b) -> (a - b) * (a - b)),
          |            CAST(0 AS BIGINT), (s, e) -> s + e) AS d,
          |  x.cid AS cid)))""".stripMargin))
      .select(col("vec_id"), col("ai"),
        col("best.cid").as("cluster"), col("best.d").as("dist2"))

  /** One Lloyd update: 64 map-side-partial sums per cluster, means
    * rounded back to the exact BIGINT grid, re-packed into the one-row
    * broadcastable centroid frame (sorted by cid). */
  private[graft] def update(assigned: DataFrame): DataFrame = {
    val sums = (0 until 64).map(i => sum(expr(s"ai[$i]")).as(s"s$i"))
    val dims = (0 until 64).map(i =>
      expr(s"CAST(round(CAST(s$i AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)"))
    assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sums: _*)
      .select(struct(col("cluster").as("cid"), array(dims: _*).as("c")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("carr"))
  }

  /** The WITH-body of the unrolled Lloyd chain, ending in CTE `afinal`
    * (vec_id, ai, cid, d) — shared by q111's oracle and q118's, which
    * continues the dataflow with within-cluster pair generation. */
  private[graft] def oracleChain(k: Int, iters: Int): String = {
    val scaledSql =
      """SELECT vec_id,
        |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS ai
        |FROM embeddings""".stripMargin
    def assignSql(cFrom: String, name: String) =
      s"""$name AS (
         |  SELECT vec_id, ai, cid, d FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM (
         |      SELECT v.vec_id, v.ai, c.cid,
         |        CAST(list_sum(list_transform(range(0, 64),
         |          i -> (v.ai[i+1] - c.c[i+1]) * (v.ai[i+1] - c.c[i+1]))) AS BIGINT) AS d
         |      FROM v, $cFrom c))
         |  WHERE rn = 1)""".stripMargin
    def updateSql(aFrom: String, name: String) =
      s"""$name AS (
         |  SELECT cid, list(CAST(round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
         |                   ORDER BY i) AS c
         |  FROM (
         |    SELECT cid, i, CAST(sum(ai[i+1]) AS BIGINT) AS s, count(*) AS n
         |    FROM $aFrom, (SELECT unnest(range(0, 64)) AS i)
         |    GROUP BY 1, 2)
         |  GROUP BY 1)""".stripMargin
    val rounds = (0 until iters).flatMap { r =>
      Seq(assignSql(s"c$r", s"a$r"), updateSql(s"a$r", s"c${r + 1}"))
    }.mkString(",\n")
    s"""v AS ($scaledSql),
       |c0 AS (
       |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, ai AS c
       |  FROM (SELECT vec_id, ai FROM v ORDER BY vec_id LIMIT $k)),
       |$rounds,
       |${assignSql(s"c$iters", "afinal")}""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q111_kmeans" ->
      s"""WITH ${oracleChain(8, 3)}
         |SELECT vec_id, cid AS cluster, d AS dist2 FROM afinal""".stripMargin,
  )
}

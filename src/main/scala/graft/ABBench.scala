package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev utility: SAME-SESSION adjudication of cross-session bench deltas.
  * Cross-session numbers on this box are not comparable (±40% external
  * load noise, SURVEY §12.1 — proven by rounds 7/8, where 4 of 5 flagged
  * "regressions" were phantoms and one was real). So: any query whose
  * cross-session ratio exceeds the noise band gets N same-session runs
  * here; min-of-N is the query's true current cost (min is the
  * load-robust statistic), and max/min bounds the WITHIN-session noise.
  * A flagged query whose same-session min matches the OLD round's number
  * is adjudicated noise; one matching the new (slower) number on an
  * unchanged file needs investigation (the q68 precedent: round 7's own
  * restructure was real and got fixed).
  *
  * Round 8 used this harness with round-6 variant bodies inline; those
  * were removed once q68 was fixed — every round-9 flagged query is
  * code-identical to its prior round, so the A/B is min-of-N of the
  * same form, plus /proc/loadavg context in the artifact.
  *
  * `runMain graft.ABBench <sfDir> [outFile] [q1,q2,...]` → one JSON line.
  */
object ABBench {

  /** The round-9 flagged set: VERDICT r8 finding 1 (q38–q42 adjacent
    * cluster, q119, q127) + ADVICE r8 item 3 (q37, q86, q87, q97) +
    * q136 (§13.6 re-measure item). */
  private val DefaultFlagged = Seq(
    "q37_csv_roundtrip", "q38_sink_insert_absent", "q39_merge_timestamped",
    "q40_cube_agg", "q41_grouping_sets", "q42_pivot_status",
    "q86_stream_join", "q87_pq_ann", "q97_pagerank",
    "q119_containment", "q127_robust_outliers", "q136_chunk_sliding")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = if (args.length > 1) args(1) else "AB_r09.json"
    val queries =
      if (args.length > 2) args(2).split(",").toSeq else DefaultFlagged
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuning.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val loadBefore = Bench.loadAvg()

    def time(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }

    // warmup: codegen/classload, uncounted
    time(SparkEntry.queries(queries.head))

    // round-robin over the set 5 times (rather than 5 back-to-back runs
    // per query) so slow load drift hits every query equally
    val runs = (1 to 5).flatMap { _ =>
      queries.map(q => q -> time(SparkEntry.queries(q)))
    }
    val qs = queries.map { q =>
      val ts = runs.collect { case (`q`, t) => t }.sorted
      f""""$q":{"min":${ts.head}%.3f,"median":${ts(ts.size / 2)}%.3f,"max":${ts.last}%.3f}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"same_session_ab_r09","sf":"$sfDir","cpus":$cpus,"runs_per_query":5,"aggregation":"min_median_max_round_robin","loadavg_before":$loadBefore,"loadavg_after":${Bench.loadAvg()},"queries":$qs}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(json)
    spark.stop()
  }
}

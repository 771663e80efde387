package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: SAME-SESSION A/B of the five queries whose BENCH_r07 vs
  * BENCH_r06 cross-session ratios exceeded the documented ±40%
  * environmental noise (VERDICT r7 §perf: q68 4.1×, q50 4.0×, q52 3.8×,
  * q49 2.6×, q48 2.0×). Cross-session numbers on this box are not
  * comparable (SURVEY §12.1), so this main times, in ONE process with
  * interleaved executions and min-of-3:
  *   - q68 / q50: the current form vs the ROUND-6 form (the only two of
  *     the five whose code actually changed in round 7 — q68's stats
  *     broadcast restructure, q50's isEval expression refactor), the
  *     round-6 bodies reproduced verbatim below from commit 6dd7be6;
  *   - q49 / q52 / q48: code-identical to round 6 (verified by file
  *     diff), so the A/B is two independent same-session passes of the
  *     same query — the spread IS the same-session noise bound.
  *
  * `runMain graft.ABBench <sfDir> [outFile]` → one JSON line.
  */
object ABBench {

  /** q68 as of round 6 (commit 6dd7be6, Relational.scala): histogram
    * crossJoins a 2-column projection of the stats row, then re-joins
    * the full stats row — two broadcast projections of one aggregate. */
  private def r6NumericProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val stats = li.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("l_extendedprice").isNull, 1L).otherwise(0L)).as("n_null"),
      countDistinct(col("l_extendedprice")).as("n_distinct"),
      min(col("l_extendedprice")).as("vmin"),
      max(col("l_extendedprice")).as("vmax"),
      Tables.toDouble(sum(Tables.dec(col("l_extendedprice"))), 2).as("vsum"))
      .withColumn("mean", round(col("vsum") / col("n_rows"), 6))
    val hist = li.crossJoin(broadcast(stats.select("vmin", "vmax")))
      .withColumn("bucket",
        least(floor((col("l_extendedprice") - col("vmin")) * 10.0 /
          (col("vmax") - col("vmin"))), lit(9L)).cast("int"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_in_bucket"))
    hist.crossJoin(broadcast(stats))
      .select(col("bucket"), col("n_in_bucket"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("vmin"), col("vmax"), col("mean"))
  }

  /** q50 as of round 6: the split predicate inlined as `md5 < "e6"`
    * rather than `!isEval` (same semantics, different expression tree). */
  private def r6HashSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        when(md5(col("doc_id").cast("string")) < "e6", "train")
          .otherwise("eval").as("split"))

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = if (args.length > 1) args(1) else "AB_r08.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cur = SparkEntry.queries
    // (query, variant-A = current, variant-B = round-6 or second pass)
    val pairs: Seq[(String, (SparkSession, String) => DataFrame, (SparkSession, String) => DataFrame, String)] = Seq(
      ("q68_numeric_profile", cur("q68_numeric_profile"), r6NumericProfile _, "r6"),
      ("q50_hash_split", cur("q50_hash_split"), r6HashSplit _, "r6"),
      ("q49_tfidf", cur("q49_tfidf"), cur("q49_tfidf"), "same"),
      ("q52_fuzzy_match", cur("q52_fuzzy_match"), cur("q52_fuzzy_match"), "same"),
      ("q48_salted_join", cur("q48_salted_join"), cur("q48_salted_join"), "same"))

    // warmup: codegen/classload, uncounted
    cur("q68_numeric_profile")(spark, sfDir).count()

    def time(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }

    // interleaved A/B/A/B... (3 each) so drift hits both variants equally
    val results = pairs.map { case (name, a, b, kind) =>
      val times = (1 to 3).flatMap(_ => Seq("a" -> time(a), "b" -> time(b)))
      val ta = times.collect { case ("a", t) => t }.min
      val tb = times.collect { case ("b", t) => t }.min
      (name, kind, ta, tb)
    }
    val qs = results.map { case (name, kind, ta, tb) =>
      f""""$name":{"kind":"$kind","cur":$ta%.3f,"other":$tb%.3f,"ratio":${ta / tb}%.2f}"""
    }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"same_session_ab_r08","sf":"$sfDir","cpus":$cpus,"runs_per_variant":3,"aggregation":"min_of_3_interleaved","queries":$qs}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(json)
    spark.stop()
  }
}

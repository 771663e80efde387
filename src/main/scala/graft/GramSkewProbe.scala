package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: PLANTED-SKEW probe for the gram-family join-backs
  * (q133/q138/q147) — the r19 follow-up question to the q154 guard:
  * those operators' occurrence JOINs key on the gram hash over the
  * width-pinned exchange, and AQE's skew-join splitting does not apply
  * to user-specified (`REPARTITION_BY_NUM`) shuffles, so a corpus-hot
  * duplicated gram concentrates its entire occurrence mass in ONE
  * shuffled-hash-join probe task — the same heavy-hitter mechanism the
  * q154 window had, in join form. (The gram aggregates themselves are
  * immune: map-side partial combine collapses a hot gram to one row
  * per map partition before the shuffle.)
  *
  * `runMain graft.GramSkewProbe <srcSfDir> <workDir> <outFile>
  *   [plantEvery=10] [tokens=160] [query=q133_substring_dedup]`
  *
  * Plants a single-token document (`z × tokens`) in every
  * `plantEvery`-th doc — every L-gram of that text is the SAME gram,
  * so one gram owns ~(tokens × docFrac / avgGramsPerDoc) of the gram
  * stream (~3% at the defaults) — then stage-probes the named query
  * min-of-2 warm and reports per-stage max/med. A hot-gram straggler
  * shows as max/med >> 1 on the stage that reads the gram exchange;
  * ~1 means the host absorbed it at this scale (read the top stage's
  * tasks/bytes before concluding). */
object GramSkewProbe {
  def main(args: Array[String]): Unit = {
    val srcSfDir = args(0)
    val workDir = args(1)
    val outFile = if (args.length > 2) args(2) else "GRAM_SKEW_PROBE.json"
    val plantEvery = if (args.length > 3) args(3).toInt else 10
    val tokens = if (args.length > 4) args(4).toInt else 160
    val queryName = if (args.length > 5) args(5) else "q133_substring_dedup"
    require(SparkEntry.queries.contains(queryName), s"unknown query: $queryName")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuning.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val planted = Seq.fill(tokens)("zz0").mkString(" ")
    Tables.documents(spark, srcSfDir)
      .withColumn("text",
        when(col("doc_id") % plantEvery === 0, lit(planted))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$workDir/documents.parquet")

    val rec = new StageRecorder(spark.sparkContext)
    val fn = SparkEntry.queries(queryName)
    val loadBefore = Bench.loadAvg()
    var probedSec = 0.0
    (1 to 2).foreach { i =>
      if (i == 2) { rec.quiesce(); rec.clear() }
      val t0 = System.nanoTime()
      Bench.runFully(fn(spark, workDir))
      val t = (System.nanoTime() - t0) / 1e9
      if (i == 2) { rec.quiesce(); probedSec = t }
      spark.catalog.clearCache()
    }
    val json =
      f"""{"metric":"gram_skew_probe","query":"$queryName","src":"$srcSfDir","work":"$workDir","cpus":$cpus,"plant_every":$plantEvery,"planted_tokens":$tokens,"probed_run_sec":$probedSec%.2f,"quiesce_timeout":${rec.quiesceTimeout},"calib_med_map_task_s":${rec.medianHeavyStageTaskSec}%.2f,"loadavg_before":$loadBefore,"loadavg_after":${Bench.loadAvg()},"stages":[${rec.jsonRows().mkString(",")}]}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(json)
    spark.stop()
  }
}

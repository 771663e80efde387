package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: PLANTED-SKEW probe for the gram-family join-backs
  * (q133/q138/q146/q147; q152 probe-able too) — the r19 finding the r20
  * guard closes: those operators' occurrence JOINs key on the gram hash
  * over the width-pinned exchange, and AQE's skew-join splitting does
  * not apply to user-specified (`REPARTITION_BY_NUM`) shuffles, so a
  * corpus-hot duplicated gram concentrates its entire occurrence mass
  * in ONE shuffled-hash-join probe task — the same heavy-hitter
  * mechanism the q154 window had, in join form. (The gram aggregates'
  * PARTIAL combine would be immune below a planner exchange, but below
  * a user repartition there is no map-side combine either — both the
  * probe and the per-cell aggregate read the hot partition.)
  *
  * `runMain graft.GramSkewProbe <srcSfDir> <workDir> <outFile>
  *   [plantEvery=10] [tokens=160] [query=q133_substring_dedup]`
  *
  * Plants a single-token document (`z × tokens`) in every
  * `plantEvery`-th doc — every L-gram of that text is the SAME gram,
  * so one gram owns ~(tokens × docFrac / avgGramsPerDoc) of the gram
  * stream (~3% at the defaults) — then stage-probes TWO ARMS min-of-2
  * warm in ONE window (the CdcSkewProbe protocol): `off` = the guard
  * disabled (hotMinOcc = −1, the r18/r19 shape that measured max/med
  * 18.87 at sf100) and `guarded` = the SHIPPING entry (auto guard). A
  * hot-gram straggler shows as max/med >> 1 on the stage reading the
  * gram exchange in the off arm; the guard is working when the guarded
  * arm's probe stage is ≲ 2. */
object GramSkewProbe {
  def main(args: Array[String]): Unit = {
    val srcSfDir = args(0)
    val workDir = args(1)
    val outFile = if (args.length > 2) args(2) else "GRAM_SKEW_PROBE.json"
    val plantEvery = if (args.length > 3) args(3).toInt else 10
    val tokens = if (args.length > 4) args(4).toInt else 160
    val queryName = if (args.length > 5) args(5) else "q133_substring_dedup"
    require(SparkEntry.queries.contains(queryName), s"unknown query: $queryName")
    // the guard-off builder per query (q152 has no pinned exchange and
    // therefore no guard — its off arm IS the shipping entry)
    val offBuilders: Map[String, (SparkSession, String) => DataFrame] = Map(
      "q133_substring_dedup" -> ((s, d) =>
        ops.Curation.substringDedup(s, d, hotMinOcc = -1L)),
      "q138_substring_apply" -> ((s, d) =>
        ops.Curation.substringDedupApply(s, d, hotMinOcc = -1L)),
      "q146_boilerplate" -> ((s, d) =>
        ops.Curation.boilerplateDetect(s, d, hotMinOcc = -1L)),
      "q147_boilerplate_apply" -> ((s, d) =>
        ops.Curation.boilerplateApply(s, d, hotMinOcc = -1L)))
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

    // mode=overwrite below DELETES the target first — refuse to point it
    // at the source corpus being read (ADVICE r19: workDir == srcSfDir
    // would destroy the only copy of a scale corpus mid-scan)
    require(java.nio.file.Paths.get(workDir).toAbsolutePath.normalize !=
      java.nio.file.Paths.get(srcSfDir).toAbsolutePath.normalize,
      s"workDir must differ from srcSfDir ($srcSfDir): the probe overwrites workDir/documents.parquet")
    val planted = Seq.fill(tokens)("zz0").mkString(" ")
    Tables.documents(spark, srcSfDir)
      .withColumn("text",
        when(col("doc_id") % plantEvery === 0, lit(planted))
          .otherwise(col("text")))
      .write.mode("overwrite").parquet(s"$workDir/documents.parquet")

    val rec = new StageRecorder(spark.sparkContext)
    def probeArm(name: String, df: => DataFrame): (String, Double, Seq[String]) = {
      var probedSec = 0.0
      (1 to 2).foreach { i =>
        if (i == 2) { rec.quiesce(); rec.clear() }
        val t0 = System.nanoTime()
        Bench.runFully(df)
        val t = (System.nanoTime() - t0) / 1e9
        if (i == 2) { rec.quiesce(); probedSec = t }
        spark.catalog.clearCache()
      }
      System.err.println(f"GRAM_SKEW_PROBE arm=$name probed=$probedSec%.1f")
      (name, probedSec, rec.jsonRows())
    }

    val loadBefore = Bench.loadAvg()
    val shipping = SparkEntry.queries(queryName)
    val arms = (offBuilders.get(queryName).map(b =>
      probeArm("off", b(spark, workDir))).toSeq :+
      probeArm("guarded", shipping(spark, workDir)))
    val armsJson = arms.map { case (n, s, rows) =>
      f""""$n":{"probed_run_sec":$s%.2f,"stages":[${rows.mkString(",")}]}"""
    }.mkString(",")
    val json =
      f"""{"metric":"gram_skew_probe","query":"$queryName","src":"$srcSfDir","work":"$workDir","cpus":$cpus,"plant_every":$plantEvery,"planted_tokens":$tokens,"quiesce_timeout":${rec.quiesceTimeout},"calib_med_map_task_s":${rec.medianHeavyStageTaskSec}%.2f,"loadavg_before":$loadBefore,"loadavg_after":${Bench.loadAvg()},"arms":{$armsJson}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(json)
    spark.stop()
  }
}

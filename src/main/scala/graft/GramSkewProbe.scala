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
    case class Arm(name: String, guardPresent: Boolean, probedSec: Double,
                   detectionWallSec: Double, detectionShare: Double,
                   stages: Seq[String])
    def probeArm(name: String, guardPresent: Boolean,
                 df: => DataFrame): Arm = {
      var probedSec = 0.0
      var detSec = 0.0
      (1 to 2).foreach { i =>
        if (i == 2) { rec.quiesce(); rec.clear(); GuardStats.reset() }
        val t0 = System.nanoTime()
        Bench.runFully(df)
        val t = (System.nanoTime() - t0) / 1e9
        if (i == 2) { rec.quiesce(); probedSec = t
                      detSec = GuardStats.detectionSeconds }
        spark.catalog.clearCache()
      }
      // detection-cost accounting (VERDICT r20 item 5): wall seconds of
      // the detectHotKeys action in the probed run, plus the labeled
      // detection stages' share of ALL probed task time — the number
      // that exposes a corpus whose mega-doc screen has grown into a
      // second corpus pass
      val detShare = rec.taskTimeShare(GuardStats.DetectionJobPrefix)
      System.err.println(
        f"GRAM_SKEW_PROBE arm=$name probed=$probedSec%.1f detection=$detSec%.1fs (share $detShare%.3f)")
      Arm(name, guardPresent, probedSec, detSec, detShare, rec.jsonRows())
    }

    val loadBefore = Bench.loadAvg()
    val shipping = SparkEntry.queries(queryName)
    // the shipping arm is labeled "guarded" only when the query's entry
    // actually carries a guard (ADVICE r20: q152's sole arm used to say
    // "guarded" though its entry has no guard by design — now "shipping"
    // + guard_present:false)
    val shippingHasGuard = offBuilders.contains(queryName)
    val arms = (offBuilders.get(queryName).map(b =>
      probeArm("off", guardPresent = false, b(spark, workDir))).toSeq :+
      probeArm(if (shippingHasGuard) "guarded" else "shipping",
        guardPresent = shippingHasGuard, shipping(spark, workDir)))
    val armsJson = arms.map { a =>
      f""""${a.name}":{"probed_run_sec":${a.probedSec}%.2f,"guard_present":${a.guardPresent},"detection_wall_s":${a.detectionWallSec}%.2f,"detection_share":${a.detectionShare}%.4f,"stages":[${a.stages.mkString(",")}]}"""
    }.mkString(",")
    val json =
      f"""{"metric":"gram_skew_probe","query":"$queryName","src":"$srcSfDir","work":"$workDir","cpus":$cpus,"plant_every":$plantEvery,"planted_tokens":$tokens,"quiesce_timeout":${rec.quiesceTimeout},"calib_med_map_task_s":${rec.medianHeavyStageTaskSec}%.2f,"loadavg_before":$loadBefore,"loadavg_after":${Bench.loadAvg()},"arms":{$armsJson}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(json)
    spark.stop()
  }
}

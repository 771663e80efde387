package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: per-stage skew/spill probe for scale-trend
  * adjudication (VERDICT r14 item 1 — "host-bound" may not be claimed
  * by analogy; it needs the flagged query's OWN stage metrics).
  *
  * `runMain graft.StageProbe <sfDir> <queryName> [outFile] [runs=2]`
  * runs the named [[SparkEntry.queries]] entry with a listener
  * recording every task's run time and spill/shuffle volumes, then
  * writes one JSON line with the top stages by total task time:
  *
  *  - `max_over_med`: max task runtime / median task runtime within
  *    the stage — the skew verdict. ~1 means the partitions are
  *    balanced and any decade inflation is environment (page-cache /
  *    disk / memory-bandwidth pressure), not a hot key; a hot reducer
  *    shows 5–30× here (q155's r13 probe protocol, SURVEY §8.3).
  *  - `spill_disk_mb` / `spill_mem_mb`: whether the stage is paying
  *    the single-host scratch-disk wall that a 1000-executor
  *    deployment would spread O(100 GB)/executor wide.
  *  - `shuffle_read_mb` / `shuffle_write_mb` / `input_mb`: where the
  *    bytes actually move, so a "the join is the bottleneck" claim is
  *    checked against the stage that reads the join's exchange.
  *  - `calib_med_map_task_s` (r19, VERDICT r18 item 6): the probed
  *    run's heaviest stage's (by total task time) median task seconds — the
  *    host-speed constant SURVEY §21.2 tracked across boots (80.9 →
  *    119.6 → 136.1 s on a byte-identical map stage), now recorded
  *    inside the artifact so absolutes can be normalized without
  *    hunting through changelog prose.
  *
  * The probed run is the SECOND execution (min-of-2-warm convention —
  * the first pays codegen/classload and page-cache fill; stage rows
  * report only the probed run's tasks). Recording/quiesce mechanics
  * live in [[StageRecorder]] (shared with CdcSkewProbe). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val queryName = args(1)
    val outFile = if (args.length > 2) args(2) else "STAGE_PROBE.json"
    val runs = if (args.length > 3) args(3).toInt else 2
    require(SparkEntry.queries.contains(queryName), s"unknown query: $queryName")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuning.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // liveness tolerance for single-JVM probe runs: a long driver
      // pause (GC, big task-result processing) must not let the
      // heartbeat receiver declare the local executor dead mid-probe
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rec = new StageRecorder(spark.sparkContext)

    val fn = SparkEntry.queries(queryName)
    val loadBefore = Bench.loadAvg()
    var probedSec = 0.0
    val warmSecs = (1 to runs).map { i =>
      if (i == runs) { rec.quiesce(); rec.clear() }
      val t0 = System.nanoTime()
      // full-plan execution, NOT df.count(): the count re-optimization
      // prunes columns and eliminates row-preserving tails, so a lazy
      // operator can collapse to a metadata scan (see Bench.runFully)
      Bench.runFully(fn(spark, sfDir))
      val t = (System.nanoTime() - t0) / 1e9
      if (i == runs) { rec.quiesce(); probedSec = t }
      spark.catalog.clearCache()
      t
    }
    val loadAfter = Bench.loadAvg()

    val json =
      f"""{"metric":"stage_probe","query":"$queryName","sf":"$sfDir","cpus":$cpus,"runs":$runs,"probed_run_sec":$probedSec%.2f,"all_run_secs":[${warmSecs.map(s => f"$s%.2f").mkString(",")}],"quiesce_timeout":${rec.quiesceTimeout},"calib_med_map_task_s":${rec.medianHeavyStageTaskSec}%.2f,"loadavg_before":${loadBefore},"loadavg_after":${loadAfter},"stages":[${rec.jsonRows().mkString(",")}]}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(json)
    spark.stop()
  }
}

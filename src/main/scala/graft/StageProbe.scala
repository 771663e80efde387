package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
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
  *
  * The probed run is the SECOND execution (min-of-2-warm convention —
  * the first pays codegen/classload and page-cache fill; stage rows
  * report only the probed run's tasks). */
object StageProbe {
  private final class Acc {
    var tasks = 0
    val runMs = mutable.ArrayBuffer.empty[Long]
    var spillMem = 0L
    var spillDisk = 0L
    var shufRead = 0L
    var shufWrite = 0L
    var input = 0L
  }

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

    // Record EVERY task-end (no on/off flag): Spark's listener bus is
    // async, so a flag flipped when the action returns both drops the
    // probed run's final task wave (exactly the slowest tasks the
    // max/med verdict needs) and lets the warm-up run's stragglers leak
    // into a freshly-cleared map. Instead the run boundary is a
    // QUIESCE — poll the recorded task count until it is stable — and
    // the probed run is isolated by clearing after the pre-run quiesce.
    val stages = mutable.LinkedHashMap.empty[Int, Acc]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) stages.synchronized {
          val a = stages.getOrElseUpdate(e.stageId, new Acc)
          a.tasks += 1
          a.runMs += e.taskMetrics.executorRunTime
          a.spillMem += e.taskMetrics.memoryBytesSpilled
          a.spillDisk += e.taskMetrics.diskBytesSpilled
          a.shufRead += e.taskMetrics.shuffleReadMetrics.totalBytesRead
          a.shufWrite += e.taskMetrics.shuffleWriteMetrics.bytesWritten
          a.input += e.taskMetrics.inputMetrics.bytesRead
        }
    })
    // A quiesce that hits the 10 s cap without the bus going stable
    // means the run boundary leaked — a warm-up straggler may land in
    // the probed map, or the probed tail may be read early — skewing
    // exactly the max/med stats this tool adjudicates with. That run
    // must be DISTINGUISHABLE from a clean one (ADVICE r15 item 5):
    // the JSON carries `quiesce_timeout` and stderr gets a warning.
    var quiesceTimeout = false
    def quiesce(): Unit = {
      var last = -1L
      var stable = 0
      var waited = 0
      while (stable < 2 && waited < 10000) {
        val cur = stages.synchronized(stages.valuesIterator.map(_.tasks.toLong).sum)
        if (cur == last) stable += 1 else { stable = 0; last = cur }
        Thread.sleep(250); waited += 250
      }
      if (stable < 2) {
        quiesceTimeout = true
        System.err.println(
          "WARN: StageProbe quiesce hit the 10s cap with task-ends still " +
            "arriving — probe boundaries are contaminated; treat this " +
            "probe's stage stats as unreliable (quiesce_timeout=true)")
      }
    }

    val fn = SparkEntry.queries(queryName)
    val loadBefore = Bench.loadAvg()
    var probedSec = 0.0
    val warmSecs = (1 to runs).map { i =>
      if (i == runs) { quiesce(); stages.synchronized(stages.clear()) }
      val t0 = System.nanoTime()
      // full-plan execution, NOT df.count(): the count re-optimization
      // prunes columns and eliminates row-preserving tails, so a lazy
      // operator can collapse to a metadata scan (see Bench.runFully)
      Bench.runFully(fn(spark, sfDir))
      val t = (System.nanoTime() - t0) / 1e9
      if (i == runs) { quiesce(); probedSec = t }
      spark.catalog.clearCache()
      t
    }
    val loadAfter = Bench.loadAvg()

    def mb(b: Long): String = f"${b / (1024.0 * 1024.0)}%.1f"
    val rows = stages.synchronized(stages.toSeq)
      .sortBy { case (_, a) => -a.runMs.sum }
      .take(12)
      .map { case (id, a) =>
        val sorted = a.runMs.sorted
        val med = if (sorted.isEmpty) 0L else sorted(sorted.size / 2)
        val mx = if (sorted.isEmpty) 0L else sorted.last
        val ratio = if (med > 0) mx.toDouble / med else 0.0
        f"""{"stage":$id,"tasks":${a.tasks},"task_time_sum_s":${sorted.sum / 1e3}%.1f,"task_time_max_s":${mx / 1e3}%.2f,"task_time_med_s":${med / 1e3}%.2f,"max_over_med":$ratio%.2f,"spill_mem_mb":${mb(a.spillMem)},"spill_disk_mb":${mb(a.spillDisk)},"shuffle_read_mb":${mb(a.shufRead)},"shuffle_write_mb":${mb(a.shufWrite)},"input_mb":${mb(a.input)}}"""
      }
    val json =
      f"""{"metric":"stage_probe","query":"$queryName","sf":"$sfDir","cpus":$cpus,"runs":$runs,"probed_run_sec":$probedSec%.2f,"all_run_secs":[${warmSecs.map(s => f"$s%.2f").mkString(",")}],"quiesce_timeout":$quiesceTimeout,"loadavg_before":${loadBefore},"loadavg_after":${loadAfter},"stages":[${rows.mkString(",")}]}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(json)
    spark.stop()
  }
}

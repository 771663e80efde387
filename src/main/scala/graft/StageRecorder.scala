package graft

import scala.collection.mutable
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/** Shared per-stage task-metrics recorder for the probe tools
  * (StageProbe, CdcSkewProbe): records every task-end's runtime and
  * spill/shuffle volumes, isolates run boundaries with a QUIESCE (the
  * listener bus is async — a flag flipped when the action returns drops
  * the final task wave, exactly the slowest tasks the max/med verdict
  * needs), and renders the top stages as the JSON rows the round
  * artifacts use.
  *
  * `medianMapTaskSec(minInputMb)` is the r18 VERDICT item-6 host
  * calibration constant: the median task seconds of the probed run's
  * heaviest input-reading stage — the number SURVEY §21.2 tracked
  * across boots (80.9 → 119.6 → 136.1 s on a byte-identical q133 map
  * stage) — recorded INSIDE every probe artifact so a future reader can
  * normalize absolutes without hunting through changelog prose. */
private[graft] final class StageRecorder(sc: SparkContext) {
  final class Acc {
    var tasks = 0
    val runMs = mutable.ArrayBuffer.empty[Long]
    var spillMem = 0L
    var spillDisk = 0L
    var shufRead = 0L
    var shufWrite = 0L
    var input = 0L
  }

  private val stages = mutable.LinkedHashMap.empty[Int, Acc]
  // stageId → the spark.job.description active when its job started —
  // lets the probes attribute task time to labeled phases (r21: the
  // guard's detection jobs, labeled by Curation.detectHotKeys)
  private val stageDesc = mutable.HashMap.empty[Int, String]
  @volatile var quiesceTimeout = false

  sc.addSparkListener(new SparkListener {
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val d =
        if (e.properties == null) null
        else e.properties.getProperty("spark.job.description")
      if (d != null) stages.synchronized {
        e.stageInfos.foreach(si => stageDesc(si.stageId) = d)
      }
    }
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

  /** Poll until the task-end count is stable; a 10 s cap hit means the
    * run boundary leaked — flagged in the artifact, warned on stderr. */
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
        "WARN: StageRecorder quiesce hit the 10s cap with task-ends still " +
          "arriving — probe boundaries are contaminated; treat this " +
          "probe's stage stats as unreliable (quiesce_timeout=true)")
    }
  }

  def clear(): Unit = stages.synchronized { stages.clear(); stageDesc.clear() }

  /** Fraction of ALL recorded task time spent in stages whose job
    * description starts with `prefix` (VERDICT r20 item 5: the guard's
    * detection share — detection jobs are labeled
    * [[GuardStats.DetectionJobPrefix]]). 0.0 when nothing recorded. */
  def taskTimeShare(prefix: String): Double = {
    val (tot, hit) = stages.synchronized {
      val t = stages.valuesIterator.map(_.runMs.sum).sum
      val h = stages.iterator.collect {
        case (id, a) if stageDesc.get(id).exists(_.startsWith(prefix)) =>
          a.runMs.sum
      }.sum
      (t, h)
    }
    if (tot > 0) hit.toDouble / tot else 0.0
  }

  private def snapshot: Seq[(Int, Acc)] = stages.synchronized(stages.toSeq)

  /** Median task seconds of the HEAVIEST stage (by total task time) —
    * the §21.2 constant (136.13 s on the byte-identical q133 gram map
    * stage for the third r18 boot). Comparable across windows only for
    * the same query + scale, which is exactly how the calibration
    * protocol uses it. 0.0 if nothing was recorded. */
  def medianHeavyStageTaskSec: Double =
    snapshot
      .sortBy { case (_, a) => -a.runMs.sum }
      .headOption.map { case (_, a) =>
        val sorted = a.runMs.sorted
        if (sorted.isEmpty) 0.0 else sorted(sorted.size / 2) / 1e3
      }.getOrElse(0.0)

  /** Top `n` stages by total task time, as JSON rows. */
  def jsonRows(n: Int = 12): Seq[String] = {
    def mb(b: Long): String = f"${b / (1024.0 * 1024.0)}%.1f"
    snapshot
      .sortBy { case (_, a) => -a.runMs.sum }
      .take(n)
      .map { case (id, a) =>
        val sorted = a.runMs.sorted
        val med = if (sorted.isEmpty) 0L else sorted(sorted.size / 2)
        val mx = if (sorted.isEmpty) 0L else sorted.last
        val ratio = if (med > 0) mx.toDouble / med else 0.0
        f"""{"stage":$id,"tasks":${a.tasks},"task_time_sum_s":${sorted.sum / 1e3}%.1f,"task_time_max_s":${mx / 1e3}%.2f,"task_time_med_s":${med / 1e3}%.2f,"max_over_med":$ratio%.2f,"spill_mem_mb":${mb(a.spillMem)},"spill_disk_mb":${mb(a.spillDisk)},"shuffle_read_mb":${mb(a.shufRead)},"shuffle_write_mb":${mb(a.shufWrite)},"input_mb":${mb(a.input)}}"""
      }
  }
}

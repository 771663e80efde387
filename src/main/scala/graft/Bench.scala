package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark: every SparkEntry query on SPARK_GRAFT_SF_DIR.
  *
  * Machine-parsable by construction (round-1 driver got "parsed": null
  * from sbt log noise): the bare JSON is the FINAL stdout line, and the
  * same JSON is written to BENCH.json in the working directory.
  * Comparability: a JIT/session warmup query runs first (uncounted), and
  * each query reports the MIN of two runs (first-run codegen/classload
  * skew was ~5s on whichever query ran first in round 1). r21 adds
  * `queries_min`/`value_min` — the same vector after one targeted third
  * run of the 10 widest intra-query spreads — as the round-over-round
  * comparison denominator (VERDICT r20 item 3: the host's
  * non-reproducing fat tail swings identical code up to 3.6×);
  * `queries`/`value` keep their r01-compatible min-of-2 semantics.
  */
object Bench {
  /** Execute a query's FULL physical plan and return its row count.
    *
    * `df.count()` is NOT that: Catalyst re-optimizes around the count —
    * every output column is pruned, and any cardinality-preserving tail
    * is eliminated outright (a left join whose build side is an
    * aggregate has provably-unique keys, so q133's entire substring-
    * dedup pipeline collapsed to `FileScan parquet []` + count(1):
    * measured 0.97 s "at sf100" while reading 2.4 MB of an 811 MB
    * corpus — r16 found the bench had been timing a metadata count for
    * such queries since the operator landed). `queryExecution.toRdd`
    * compiles the dataframe's own physical plan — every column, every
    * operator — and counting THAT RDD executes it without giving the
    * optimizer a count to collapse. Eager operators (the checkpointing
    * pipelines) are unaffected; lazy operators with row-preserving
    * tails now pay their real cost. */
  private[graft] def runFully(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()

  /** 1/5/15-min system load averages — recorded in the artifact so a
    * judge can adjudicate cross-session timing swings (the box carries
    * external load; SURVEY §12.1) from the artifact itself instead of
    * re-deriving the noise story every round. */
  private[graft] def loadAvg(): String =
    try scala.util.Using.resource(scala.io.Source.fromFile("/proc/loadavg")) {
      src => src.mkString.trim.split(" ").take(3).mkString("[", ",", "]")
    } catch { case _: Throwable => "[]" }

  /** Window calibrator (r20, VERDICT r19 item 4 — the FamilyBench
    * self-labeling ported to the bench denominator): a fixed cheap
    * query (q21 min-of-2) runs before and after the sweep; a
    * last/first swing past [[CalibratorBound]] labels the window
    * REJECTED in-artifact. NOTE the label's semantics (ADVICE r19):
    * ACCEPTED certifies INTRA-RUN stability only — a window that is
    * uniformly degraded the whole run (the r19 bench's own 1.29×-slow
    * boot) still self-labels ACCEPTED; compare `calibrator.first_s`
    * against a healthy-window record (BASELINE.md) for host health. */
  private val CalibratorQuery = "q21_dedup_exact"
  private val CalibratorBound = 1.6

  /** r21 session-2 (OPTIMIZATION_r21 "Not yet optimized" item 1): the
    * 193-query sweep used to carry only ENDPOINT calibrators, so
    * MID-run degradation (the documented erratic-train regime — runs
    * that degrade for a stretch behind clean endpoints) was invisible
    * in-artifact and cost manual solo re-runs to adjudicate. The
    * calibrator now also runs once after every [[SegmentLen]] queries
    * (~20 sub-second runs ≈ 2% of the sweep wall); a segment whose
    * calibrator exceeds CalibratorBound × first_s marks its queries
    * degraded, and the targeted re-run set becomes
    * [[FamilyBench.selectReruns]] (every degraded-segment query plus
    * the [[SpreadReruns]] widest intra-query spreads, train order,
    * capped at [[MaxReruns]]) — the family train's spec-pinned
    * selection at bench scale. `queries`/`value` keep their
    * r01-compatible min-of-2-sweep-runs semantics; only the min vector
    * and the artifact fields grew. Single calibrator run per segment:
    * the segment signal is a degradation FLAG, not a denominator —
    * min-of-2 would double its cost for no sharper flag. */
  private val SegmentLen = 10
  private val SpreadReruns = 10
  private val MaxReruns = 16

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadBefore = loadAvg()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tuning.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: exercise scan + join + agg codegen paths once, uncounted —
    // then warm the calibrator query to a JIT FIXPOINT (r20): a
    // sub-second calibrator keeps speeding up across the whole ~260 s
    // run from shared-path tiered compilation (one warm run measured
    // first/last 0.37/0.20 s on an idle box — a spurious REJECT that
    // has nothing to do with the window). Re-run until two consecutive
    // runs agree within 15% (≤ 6 tries) before taking first_s.
    try etl.Transform.topkEnriched(spark, sfDir).count()
    catch { case _: Throwable => () }
    {
      var prev = Double.MaxValue
      var n = 0
      var stable = false
      while (n < 6 && !stable) {
        val t0 = System.nanoTime()
        // a thrown calibrator run is NON-MEASURABLE (ADVICE r20): its
        // time-to-throw must not feed the stability test — two fast
        // consecutive failures used to exit the loop as "stable"
        val ok = try { runFully(SparkEntry.queries(CalibratorQuery)(spark, sfDir)); true }
                 catch { case e: Throwable =>
                   System.err.println(s"[bench] calibrator warmup FAILED: ${e.getMessage}"); false }
        if (ok) {
          val t = (System.nanoTime() - t0) / 1e9
          stable = t > prev * 0.85 && t < prev * 1.15
          prev = t
        }
        n += 1
        spark.catalog.clearCache()
      }
    }
    // a transient calibrator failure must never abort the run AFTER the
    // whole sweep was measured (ADVICE r20: an uncaught throw here lost
    // the entire BENCH.json) — a failed calibration is recorded as null
    // and the window labeled CALIBRATOR_FAILED
    def calibrate(): Option[Double] =
      try Some((1 to 2).map { _ =>
        val t0 = System.nanoTime()
        runFully(SparkEntry.queries(CalibratorQuery)(spark, sfDir))
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }.min)
      catch { case e: Throwable =>
        System.err.println(s"[bench] calibrator FAILED: ${e.getMessage}")
        spark.catalog.clearCache()
        None
      }
    val calibFirst = calibrate()
    // a throwing query is recorded as FAILED (and excluded from the
    // total), never as a fast "success" timing — a regression that breaks
    // a query must not read as a speedup
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { runFully(fn(spark, sfDir)); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val sortedQueries = SparkEntry.queries.toSeq.sortBy(_._1)
    val segCalib = scala.collection.mutable.ArrayBuffer[Double]()
    val results = sortedQueries.zipWithIndex.map { case ((name, fn), idx) =>
      val runs = (1 to 2).map(_ => timeOnce(name, fn))
      val okTimes = runs.collect { case (t, true) => t }
      // one query's cache hygiene must never bill the next: drop any
      // plan-cache entries it left behind before the next query runs
      spark.catalog.clearCache()
      // segment calibrator (see [[SegmentLen]] scaladoc): one run closes
      // every SegmentLen-query segment; a failed run records -1 (never a
      // fast "healthy" reading)
      if ((idx + 1) % SegmentLen == 0 || idx == sortedQueries.size - 1) {
        val (t, ok) = timeOnce(CalibratorQuery, SparkEntry.queries(CalibratorQuery))
        segCalib += (if (ok) t else -1.0)
        spark.catalog.clearCache()
      }
      // a failed run's time-to-throw must never publish as the query's
      // timing — report min over SUCCESSFUL runs only, -1 if none
      (name, okTimes, runs.forall(_._2))
    }
    // r21 fat-tail denoiser (VERDICT r20 item 3): this host swings
    // identical-code per-query times up to 3.6× between runs with a
    // NON-reproducing outlier set; the 10 queries with the widest
    // absolute intra-query spread (max−min over their own two runs) get
    // ONE targeted third run, and the artifact publishes the per-query
    // min over ALL runs as `queries_min`/`value_min` — the denominator
    // BASELINE.md defines round-over-round comparison on. The legacy
    // `queries`/`value` (min-of-first-2) stay untouched for
    // comparability with r01–r20 artifacts.
    val spreads = results
      .collect { case (n, ts, true) if ts.size >= 2 => (n, ts.max - ts.min) }
      .toMap
    // a query is degraded when ITS segment's calibrator degraded (r21
    // session-2; a -1 failed calibrator run never flags)
    val degraded: Set[String] = calibFirst match {
      case Some(f) => sortedQueries.map(_._1).zipWithIndex.collect {
        case (n, idx) if segCalib.lift(idx / SegmentLen)
          .exists(c => c > 0 && c > CalibratorBound * f) => n
      }.toSet
      case None => Set.empty
    }
    val rerunNames = FamilyBench.selectReruns(
      sortedQueries.map(_._1), spreads, degraded, SpreadReruns, MaxReruns)
    val rerun: Map[String, Double] = rerunNames.flatMap { name =>
      val (t, ok) = timeOnce(name, SparkEntry.queries(name))
      spark.catalog.clearCache()
      if (ok) Some(name -> t) else None
    }.toMap
    val qs = results.map { case (k, ts, _) =>
      "\"" + k + "\":" + (if (ts.nonEmpty) ts.min else -1.0)
    }.mkString("{", ",", "}")
    val qsMin = results.map { case (k, ts, _) =>
      val all = ts ++ rerun.get(k)
      "\"" + k + "\":" + (if (all.nonEmpty) all.min else -1.0)
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, ts, true) if ts.nonEmpty => ts.min }.sum
    val totalMin = results.collect { case (k, ts, true) if ts.nonEmpty =>
      (ts ++ rerun.get(k)).min }.sum
    val rerunJson = rerunNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    val calibLast = calibrate()
    val calibRatio = for (f <- calibFirst; l <- calibLast) yield l / f
    // ONE-SIDED bound (unlike FamilyBench's symmetric one): at sf0.1 the
    // calibrator is sub-second and keeps improving across the ~260 s run
    // from WHOLE-RUN shared-path warm-in (codegen cache, parquet page
    // cache) that no q21-only pre-warm can reach — measured 0.35 → 0.19
    // even after a warm-to-fixpoint loop on an idle box. An improving
    // ratio is expected warm-in, never window evidence; only
    // DEGRADATION (last/first > bound) labels the run REJECTED. The
    // start-degraded-then-recovered corner is adjudicated from
    // loadavg_before + first_s vs the healthy record, both in-artifact.
    val windowStatus = calibRatio match {
      case None => "CALIBRATOR_FAILED"
      case Some(r) if r > CalibratorBound => "REJECTED"
      case _ => "ACCEPTED"
    }
    if (windowStatus == "REJECTED") System.err.println(
      f"WARN: bench window REJECTED by its calibrator — $CalibratorQuery " +
        f"${calibFirst.get}%.2f s before vs ${calibLast.get}%.2f s after " +
        f"(${calibRatio.get}%.2fx, bound ${CalibratorBound}x)")
    def optNum(o: Option[Double]): String =
      o.map(v => f"$v%.3f").getOrElse("null")
    val calib =
      s"""{"query":"$CalibratorQuery","first_s":${optNum(calibFirst)},"last_s":${optNum(calibLast)},"ratio":${optNum(calibRatio)},"bound":$CalibratorBound,"label_semantics":"one-sided: REJECTED only on in-run degradation (ratio > bound); ratio < 1 is expected whole-run warm-in; judge host health from first_s + loadavg_before vs a healthy-window record"}"""
    val segCalibJson = segCalib.map(v => f"$v%.3f").mkString("[", ",", "]")
    val degradedJson = sortedQueries.map(_._1).filter(degraded)
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","runs_per_query":2,"value_min":$totalMin,"queries_min":$qsMin,"rerun_queries":$rerunJson,"min_semantics":"queries_min/value_min = per-query min over the 2 sweep runs plus one targeted re-run of each degraded-segment query and the $SpreadReruns widest absolute intra-query spreads (rerun_queries, train order, cap $MaxReruns); the round-over-round comparison denominator per BASELINE.md","segment_len":$SegmentLen,"calib_segments":$segCalibJson,"segments_degraded":$degradedJson,"window_status":"$windowStatus","calibrator":$calib,"loadavg_before":$loadBefore,"loadavg_after":${loadAvg()}}"""
    Files.writeString(Paths.get("BENCH.json"), json)
    println(json)
    spark.stop()
  }
}

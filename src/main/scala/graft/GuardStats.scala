package graft

/** Telemetry-only accumulator for the hot-key guard's DETECTION cost
  * (VERDICT r20 item 5): the sampled 2%-of-docs + mega-doc-screen pass
  * in `ops.Curation.detectHotKeys` runs at scale inside every guarded
  * query, but its cost was only visible as "sf100 stays in band" — a
  * corpus-shape change (many mega-docs) could silently turn the screen
  * into a second corpus pass with nothing in any artifact to show it.
  * The probes (GramSkewProbe) and FamilyBench reset this before a timed
  * run and publish the detection wall-seconds (and, where a
  * StageRecorder is attached, the detection stages' task-time share)
  * in their artifacts.
  *
  * This records TIMING ONLY — never results: detection keys are always
  * recomputed from the parquet inputs on every invocation. */
private[graft] object GuardStats {
  private val nanos = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Job-description prefix detectHotKeys sets while its detection
    * action runs — StageRecorder attributes stage task time on it. */
  val DetectionJobPrefix = "hot-key detection"

  def addDetectionNanos(n: Long): Unit = { nanos.addAndGet(n); () }
  def detectionSeconds: Double = nanos.get / 1e9
  def reset(): Unit = nanos.set(0L)
}

package graft

import org.apache.spark.sql.SparkSession

/** Session tuning this library recommends (and its own mains set),
  * with the measurement behind each knob — the
  * `spark.sql.shuffle.partitions = cores` convention lives at each
  * builder; what belongs here is anything whose default silently
  * changes an operator's EXECUTION MODE.
  *
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * (default 128): every custom typed aggregator in this library
  * (TopKAgg/TopKDistinctAgg, VectorSumAgg, BitsetOrAgg, MisraGriesAgg)
  * runs through `ObjectHashAggregateExec`, which abandons hash
  * aggregation and SORTS the remaining input once a partition's
  * in-memory map passes the threshold. Per-document groupings pass 128
  * keys/partition at any realistic corpus size, so the default turned
  * every "bounded buffers combine map-side, the scored stream never
  * shuffles" plan into a full disk sort of the stream — measured on
  * q187 at sf100 as ENOSPC through 77 GB of sort spill, bounded ~8 GB
  * once hash mode held. All these buffers are small by construction
  * (top-k tuples, fixed-width vectors, k-entry sketch registers), so
  * the hash-map memory is keys × O(100 B); 2²² keys/partition caps
  * that at a few hundred MB per task, and past the raised bound the
  * sort fallback still guards. */
object Tuning {
  val ObjectAggFallbackKey =
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
  val ObjectAggFallbackKeys: Int = 1 << 22

  /** `spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold`
    * (default 0 = off): lets AQE convert a SortMergeJoin to a
    * ShuffledHashJoin at RUNTIME when every build-side partition's
    * measured shuffle bytes are under the threshold — the
    * runtime-measured twin of q187's plan-time SHUFFLE_HASH gate, and
    * it applies library-wide. Motivation (r17, STAGE_r17_q133_sf100):
    * q133/q138's gram⋈dup-gram join keys 16-byte hashes whose build
    * side is bucket-bounded, but past memory scale Catalyst's SMJ
    * SORTS the corpus-sized gram stream — 18.4 GB memory / 7.8 GB
    * disk spill in the join stage at sf100 where sf10 spills zero, a
    * 36× task-time decade on 10× data. The trade is explicit: an SHJ
    * build map does not spill, so threshold × concurrent task slots
    * must fit execution memory. The threshold is therefore DERIVED
    * from this JVM's heap and slot count (ADVICE r17: a flat 256 MB ×
    * 32 slots = 8 GB of un-spillable builds OOMs a deployment with a
    * smaller heap or more slots than the 64 GB probe box it was sized
    * on): heap/4 ÷ slots bounds the worst-case concurrent build maps
    * to ~1/4 of the heap — under Spark's ~0.6 execution-memory share
    * with headroom for each task's probe/aggregate side — floored at
    * 16 MB (gate-scale partitions are KBs and convert trivially) and
    * capped at 256 MB, the r17 measured operating point (64 GB heap /
    * 32 slots lands exactly there). AQE only converts when the
    * RUNTIME sizes satisfy the bound, which is exactly the gating the
    * plan-time hint cannot have. */
  val ShjConvertKey =
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
  val ShjConvertBytesMax: Long = 256L << 20
  val ShjConvertBytesMin: Long = 16L << 20
  def shjConvertBytes: Long = {
    val heap = Runtime.getRuntime.maxMemory
    val slots = math.max(1L, Runtime.getRuntime.availableProcessors.toLong)
    math.min(ShjConvertBytesMax,
      math.max(ShjConvertBytesMin, heap / 4 / slots))
  }

  /** `SPARK_GRAFT_NO_TUNING=1` — the A/B switch. Disables the
    * session-level tuning below AND the operator-scoped sets inside
    * [[graft.ops.TextAnalysis.bitextMining]] (ADVICE r15 item 3: the
    * scoped raise used to pin itself regardless, so the switch could
    * not produce an untuned q187 run). An untuned q187 at sf100 runs
    * the measured scratch-disk wall — SMJ band-join sorts plus the
    * 128-key sort fallback, 77 GB of spill → ENOSPC on this host —
    * which is exactly what the switch exists to demonstrate. */
  def disabled: Boolean = sys.env.get("SPARK_GRAFT_NO_TUNING").contains("1")

  /** Apply the library's session tuning to a builder (the mains and
    * the test harness route through this; an externally-built session
    * — e.g. the driver's t1 smoke — gets correct results either way,
    * just the default execution modes). [[disabled]] turns it off;
    * the r15 sf1 A/B measured the raise neutral on the family's
    * plain-hash-aggregate members (AB_r15_objectagg_tuning.json). */
  def tune(b: SparkSession.Builder): SparkSession.Builder =
    if (disabled) b
    else b.config(ObjectAggFallbackKey, ObjectAggFallbackKeys.toString)
      // local-mode derivation: this JVM IS the executor. A cluster
      // deployment should size this from ITS executors instead:
      // min(256MB, executor_heap/4 / spark.executor.cores)
      .config(ShjConvertKey, shjConvertBytes.toString)
}

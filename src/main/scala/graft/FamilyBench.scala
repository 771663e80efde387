package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: scale-trend bench for the dedup/similarity/curation
  * family (the operators whose cost depends on corpus structure, not
  * just volume). `runMain graft.FamilyBench <sfDir> [outFile]` — runs
  * each family query twice warm (min-of-2, cache cleared between
  * queries) and prints/writes one JSON line. Pair a driver-sf run with
  * a `graft.ScaleGen` synthetic run for the trend (SURVEY §8.3).
  *
  * CALIBRATOR (r19, VERDICT r18 item 2 — mechanizing the manual r18
  * rejection): the post-reboot host degrades sustained multi-query
  * trains erratically (the r18 full-family sf10 refresh measured q89
  * at 58.9 s in-train vs 5.3 s solo ten minutes later — an 11× swing
  * UNCHANGED code cannot produce), so every run now times a fixed
  * calibrator query (min-of-2) BEFORE and AFTER the train and
  * self-labels `window_status: REJECTED` when the pair deviates past
  * [[CalibratorBound]]. A REJECTED artifact carries no scale claims —
  * re-run a smaller subset in a calmer window instead of arguing with
  * the numbers. The label's SEMANTICS (ADVICE r19): ACCEPTED certifies
  * intra-train stability only — a window uniformly degraded the whole
  * run (the r19 1.29×-slow boot) still labels ACCEPTED, so absolutes
  * from an ACCEPTED run are host-relative; compare `calibrator.first_s`
  * against a healthy-window record for the same sfDir before trusting
  * them (the artifact says so in `label_semantics`).
  *
  * SEGMENT CALIBRATOR + MIN VECTOR (r21, closing OPTIMIZATION_r21's
  * "Not yet optimized" items): the endpoint pair cannot see MID-train
  * degradation — two ACCEPTED r21 sf10 runs degraded ~2.8× in
  * complementary halves behind clean endpoints, costing three manual
  * re-runs plus a solo to adjudicate. The train now (a) runs the
  * calibrator ONCE after every family query and publishes the wall as
  * `calib_s[q]` — a per-segment host constant, the same normalizer the
  * q89 StageProbe pair used to demonstrate its 2.50 wall/calibrator
  * ratio match; (b) flags `segments_degraded` (segment calibrator >
  * [[CalibratorBound]] × first_s); and (c) after the endpoint
  * calibrator, re-runs each degraded-segment query plus the
  * [[SpreadReruns]] widest intra-query spreads once (capped at
  * [[MaxReruns]], see [[selectReruns]]) and publishes the min over all
  * runs as `queries_min` — the family analogue of Bench.scala's r21
  * fat-tail denoiser. Legacy `queries`/`value` (min-of-first-2) are
  * untouched for comparability with r11–r21 artifacts.
  *
  * Needs only documents.parquet + embeddings.parquet in sfDir — exactly
  * what ScaleGen synthesizes. */
object FamilyBench {
  /** Fixed calibrator: cheap, corpus-structural, depends only on the
    * documents table (present at every family scale point). */
  private val CalibratorQuery = "q21_dedup_exact"

  /** Max tolerated last/first calibrator swing before the window
    * self-labels REJECTED. The measured single-query twin-probe noise
    * band on this host is 1.2–2.4× on SUSTAINED sf100 loads but the
    * calibrator is short-query-shaped (the 188-query sf0.1 bench never
    * entered that regime on two slow boots); 1.6 splits the regimes —
    * past it the train itself is degrading the box. */
  private val CalibratorBound = 1.6

  /** How many widest-spread queries get a targeted third run (the
    * family analogue of Bench's 10-of-193; families are 8–40 queries). */
  private val SpreadReruns = 3

  /** Hard cap on targeted re-runs per train (degraded segments can in
    * principle flag every query of a fully-degraded train — that train
    * is a re-run-the-window case, not a re-run-every-query case). */
  private val MaxReruns = 8

  /** Pure re-run selection (spec-pinned): every degraded-segment query
    * plus the [[SpreadReruns]] widest absolute intra-query spreads, in
    * train order, deduplicated, capped at [[MaxReruns]]. Spread ties
    * break by name so the choice is deterministic. */
  private[graft] def selectReruns(
      order: Seq[String],
      spreads: Map[String, Double],
      degraded: Set[String],
      topSpread: Int = SpreadReruns,
      cap: Int = MaxReruns): Seq[String] = {
    val bySpread = spreads.toSeq.sortBy { case (n, s) => (-s, n) }
      .take(topSpread).map(_._1).toSet
    order.filter(n => degraded(n) || bySpread(n)).take(cap)
  }

  private val Family = Seq(
    "q21_dedup_exact", "q22_jaccard_neardup", "q23_minhash_lsh",
    "q24_simhash_neardup", "q25_cosine_topk", "q26_ann_ivf",
    "q27_embedding_neardup", "q54_dedup_clusters", "q76_ann_lsh",
    "q88_bloom_decontaminate", "q89_chunk_dedup", "q90_shard_manifest",
    // r19: the CDC sibling joins its q89 twin in the default family
    // (q189, its forced-guard gate, stays explicit-list only — exact
    // detection triples the chunking cost by design)
    "q154_cdc_chunks",
    // round-7 text/vector additions whose cost is corpus-structural
    // (q94/q103 are excluded: ScaleGen's replica token prefixes make the
    // literal BM25 query terms vanish at synthetic scale)
    "q95_lm_xent", "q96_dsir_weights", "q99_vocab_encode",
    "q105_random_projection",
    // round-7 second-batch additions over the same two tables (q116
    // is excluded: it sketches lineitem, which ScaleGen doesn't grow)
    "q111_kmeans", "q115_priority_sample",
    "q118_semdedup", "q119_containment", "q129_dedup_apply",
    "q130_integrity_manifest",
    // round-8 additions over documents
    "q133_substring_dedup", "q134_bpe_merges", "q135_heavy_hitters",
    "q136_chunk_sliding",
    // round-9 additions: the substring apply composition and the
    // IVF-pruned SemDeDup (the q118 n·K assignment upgrade path)
    "q138_substring_apply", "q139_semdedup_ivf",
    // round-9 second batch: SemDeDup apply (CC on the pair sliver),
    // CMS registers, Gopher rule gates, leakage-safe split
    "q140_semdedup_apply", "q141_cms_registers", "q142_gopher_rules",
    "q143_leakage_safe_split",
    // round-12: the q27 deployment twin (K ∝ n, coarse-probed)
    "q155_embedding_neardup_ivf",
    // round-13 corpus-structural additions over documents
    "q171_kn_xent", "q174_ngram_diversity", "q175_zipf_slope",
    "q180_neyman_alloc", "q181_dup_spectrum",
    // round-14: the rebuilt bitext miner and the KL mix score (q182–
    // q184 compose pipelines already in the family — they run via the
    // explicit-list FAMILY_r14_newops artifacts instead of doubling
    // the default family's wall clock)
    "q186_source_lang_kl", "q187_bitext_mining")

  /** Graph/agg head (round-8 trend extension): the queries whose
    * "fixed-overhead, not a scale-killer" claims had never been measured
    * at 10×. Needs orders/lineitem/events in sfDir — ScaleGen now
    * synthesizes all three with offset key spaces. */
  private val GraphFamily = Seq(
    "q97_pagerank", "q124_basket_pairs", "q125_rfm_segments",
    "q126_assoc_rules", "q128_triangles", "q129_dedup_apply",
    "q132_cohort_retention", "q54_dedup_clusters")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outFile = if (args.length > 1) args(1) else "FAMILY_BENCH.json"
    // args(2): "graph" = the graph/agg head; a comma-separated query
    // list = an explicit subset (the sf10 second-decade runs measure the
    // superlinear-by-construction members without paying the whole
    // family's wall clock at 100x); absent = the full doc family
    val family =
      if (args.length > 2 && args(2) == "graph") GraphFamily
      else if (args.length > 2) {
        val qs = args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val unknown = qs.filterNot(SparkEntry.queries.contains)
        require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
        qs
      } else Family
    val loadBefore = Bench.loadAvg()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // the r11 verdict's environment-constant question (linear q21 at
    // 13.7×/decade): shuffle partitioning is the suspect — let the
    // diagnosis runs vary it independently of parallelism
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    // the r13 width-probe protocol's third axis (SURVEY §8.3): AQE's
    // pre-coalesce width, independent of the reducer target — the
    // "32-reducers/128-initial" config of the probe matrix
    val aqeInitial = sys.env.getOrElse("SPARK_GRAFT_AQE_INITIAL", shuffle)
    val spark = Tuning.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", aqeInitial)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: codegen/classload once, uncounted
    Bench.runFully(SparkEntry.queries("q21_dedup_exact")(spark, sfDir))
    // the declared q118/q27 entries carry the SCALE configuration
    // themselves since round 9 (auto-K ∝ n via semDedupAuto /
    // embeddingNearDupAuto), so no override is needed here
    val fns = SparkEntry.queries
    // returns (min wall, detection wall-s of the min run) — the guard's
    // detection cost (2% sample + mega-doc screen, GuardStats) is
    // published per query so a corpus-shape change can't silently turn
    // the screen into a second corpus pass (VERDICT r20 item 5)
    def timeOnce(name: String): (Double, Double) = {
      GuardStats.reset()
      val t0 = System.nanoTime()
      // full-plan execution, NOT df.count(): the count re-optimization
      // prunes columns and eliminates row-preserving tails, collapsing
      // lazy operators to a metadata scan (the r16 hollow-timing bug,
      // see Bench.runFully — this tool kept the bug one round longer)
      Bench.runFully(fns(name)(spark, sfDir))
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      (t, GuardStats.detectionSeconds)
    }
    def runsOf2(name: String): Seq[(Double, Double)] =
      (1 to 2).map(_ => timeOnce(name))
    val calibFirst = runsOf2(CalibratorQuery).map(_._1).min
    // results: (name, both run times, detection of the min-of-2 run,
    // segment calibrator wall right after this query's runs)
    val results = family.map { name =>
      val runs = runsOf2(name)
      val (t, det) = runs.minBy(_._1)
      val segCalib = timeOnce(CalibratorQuery)._1
      System.err.println(
        f"FAMILY_PROGRESS $name $t%.3f (detection $det%.3f s, segment calib $segCalib%.3f s)")
      (name, runs.map(_._1), det, segCalib)
    }
    val calibLast = runsOf2(CalibratorQuery).map(_._1).min
    // segment health + targeted re-runs (r21 min vector, see scaladoc)
    val degraded = results.collect {
      case (n, _, _, c) if c > CalibratorBound * calibFirst => n
    }.toSet
    val spreads = results.map { case (n, ts, _, _) => n -> (ts.max - ts.min) }.toMap
    val rerunNames = selectReruns(family, spreads, degraded)
    val rerun: Map[String, Double] = rerunNames.map { n =>
      val t = timeOnce(n)._1
      System.err.println(f"FAMILY_RERUN $n $t%.3f")
      n -> t
    }.toMap
    val calibRatio = calibLast / calibFirst
    val windowStatus =
      if (calibRatio > CalibratorBound || calibRatio < 1.0 / CalibratorBound)
        "REJECTED" else "ACCEPTED"
    if (windowStatus == "REJECTED") System.err.println(
      f"WARN: FamilyBench window REJECTED by its calibrator — " +
        f"$CalibratorQuery $calibFirst%.2f s before vs $calibLast%.2f s " +
        f"after (${calibRatio}%.2fx, bound ${CalibratorBound}x); this " +
        "artifact carries NO scale claims")
    val qs = results.map { case (k, ts, _, _) => f""""$k":${ts.min}%.3f""" }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, ts, _, _) =>
      f""""$k":${(ts ++ rerun.get(k)).min}%.3f""" }.mkString("{", ",", "}")
    val calibJson = results.map { case (k, _, _, c) => f""""$k":$c%.3f""" }
      .mkString("{", ",", "}")
    val degradedJson = results.collect { case (k, _, _, c)
      if degraded(k) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val rerunJson = rerunNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    // only queries whose guard detection actually ran appear (sf0.1's
    // width ≤ session partitions keeps the guard off → empty map there)
    val detJson = results.collect { case (k, _, det, _) if det > 0.0 =>
      f""""$k":$det%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2.min).sum
    val totalMin = results.map { case (k, ts, _, _) =>
      (ts ++ rerun.get(k)).min }.sum
    // on-disk input volume (all parquet under sfDir) — the artifact's
    // scale points become self-describing instead of relying on the
    // sfDir name matching a ScaleGen rep count
    val inputMib = {
      val root = java.nio.file.Paths.get(sfDir)
      val s = java.nio.file.Files.walk(root)
      try {
        s.filter(p => java.nio.file.Files.isRegularFile(p) &&
            p.toString.endsWith(".parquet"))
          .mapToLong(java.nio.file.Files.size).sum / (1024.0 * 1024.0)
      } finally s.close()
    }
    val metric =
      if (family eq GraphFamily) "graph_agg_family_total"
      else "dedup_similarity_family_total"
    val json =
      f"""{"metric":"$metric","value":$total%.2f,"unit":"sec","sf":"$sfDir","input_mib":$inputMib%.1f,"cpus":$cpus,"shuffle_partitions":$shuffle,"aqe_initial_partitions":$aqeInitial,"runs_per_query":2,"aggregation":"min_of_2_warm","exec":"full_plan","value_min":$totalMin%.2f,"queries_min":$qsMin,"rerun_queries":$rerunJson,"min_semantics":"queries_min/value_min = per-query min over the 2 sweep runs plus one targeted re-run of each degraded-segment query and the $SpreadReruns widest intra-query spreads (rerun_queries, cap $MaxReruns); the scale-trend denominator","window_status":"$windowStatus","calibrator":{"query":"$CalibratorQuery","first_s":$calibFirst%.3f,"last_s":$calibLast%.3f,"ratio":$calibRatio%.3f,"bound":$CalibratorBound,"label_semantics":"intra-train stability only; compare first_s to a healthy-window record for host health"},"calib_s":$calibJson,"segments_degraded":$degradedJson,"segment_semantics":"calib_s[q] = one calibrator wall right after q's runs — the per-segment host constant; segments_degraded = queries whose segment calibrator exceeded bound x first_s (their timings are window-suspect and were re-run)","loadavg_before":$loadBefore,"loadavg_after":${Bench.loadAvg()},"queries":$qs,"detection_s":$detJson,"detection_semantics":"per-query wall seconds of the hot-key guard's sampled detection pass (2%% doc sample + mega-doc screen) in the min run; present only where detection ran"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(json)
    spark.stop()
  }
}

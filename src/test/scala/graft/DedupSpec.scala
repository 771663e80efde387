package graft

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall/precision/equivalence properties of the dedup family that the
  * DuckDB oracle alone can't state (SURVEY.md §5.2–5.3). */
class DedupSpec extends SparkSpec {

  /** Brute-force exact jaccard pairs at the default threshold — shared
    * ground truth lives in [[SparkSpec.bruteJaccard]]. */
  private def exactJaccard: DataFrame = bruteJaccard(0.5)

  test("prefix-filtered jaccard equals brute-force exact jaccard") {
    assertSameRows(
      Dedup.jaccardNearDup(spark, sf).select("a_id", "b_id"),
      exactJaccard.select("a_id", "b_id"))
  }

  test("LSH output is a subset of exact jaccard with high recall and exact scores") {
    val exact = Dedup.jaccardNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Dedup.minhashLsh(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.keySet.subsetOf(exact.keySet), "LSH must never invent a pair (perfect precision)")
    lsh.foreach { case (k, j) => assert(j == exact(k), s"verified jaccard must be exact for $k") }
    // 8 bands × 2 rows ⇒ P(candidate | j=0.5) ≈ 0.90; observed corpora sit
    // well above the threshold, so demand ≥ 0.8 overall.
    val recall = if (exact.isEmpty) 1.0 else lsh.size.toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall below 0.8")
  }

  test("estimated pair sweep (q149's verify): exact-dup pairs score 16/16, estimator tracks exact jaccard") {
    val sig = Dedup.minhashSignatures(spark, sf)
    val est = Dedup.estimatedPairsOf(sig)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    est.foreach { case ((a, b), m) =>
      assert(a < b, "pairs must be canonical a < b")
      assert(m >= 8 && m <= 16, s"match_cnt out of range: (($a,$b)) -> $m")
    }
    // identical normalized text ⇒ identical shingle set ⇒ identical
    // signature ⇒ the pair MUST surface at exactly 16/16 — the
    // deterministic floor of the estimator's guarantee. The sf0.001
    // fixture plants near-dups but no byte-identical pair, so plant
    // one: clone the min doc under a fresh id and sweep the augmented
    // corpus.
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val src = docs.orderBy("doc_id").limit(1)
    val aug = docs.unionByName(
      src.select((col("doc_id") * 0 + lit(maxId + 1)).as("doc_id"), col("text")))
    val augEst = Dedup.estimatedPairsOf(Dedup.signaturesOf(Dedup.shinglesOf(aug)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val planted = (src.head.getLong(0), maxId + 1)
    assert(augEst.get(planted).contains(16),
      s"planted exact-dup pair $planted missing or below 16: ${augEst.get(planted)}")
    // the estimate is an unbiased j·16: every surfaced pair's exact
    // jaccard should sit near match_cnt/16 (loose band — 16 hashes)
    val exact = bruteJaccard(0.0).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    est.foreach { case (p, m) =>
      val j = exact.getOrElse(p, 0.0)
      assert(math.abs(m / 16.0 - j) <= 0.45,
        s"estimate ${m / 16.0} far from exact $j for $p")
    }
  }

  test("b-bit minhash audit (q153): counts recompute from signatures; compression laws hold") {
    val out = Dedup.bbitMinhashAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out.nonEmpty, "fixture must produce banded candidate pairs")
    // independent recomputation from the collected full signatures
    val sigs = Dedup.minhashSignatures(spark, sf).collect()
      .map(r => r.getLong(0) -> (0 until 16).map(i => r.getLong(i + 1)))
      .toMap
    out.foreach { case ((a, b), (mFull, mB, jFull, jB)) =>
      assert(a < b, "pairs must be canonical a < b")
      val (sa, sb) = (sigs(a), sigs(b))
      val tFull = (0 until 16).count(i => sa(i) == sb(i))
      val tB = (0 until 16).count(i => sa(i) % 16 == sb(i) % 16)
      assert(mFull == tFull && mB == tB, s"($a,$b) counts: got ($mFull,$mB) want ($tFull,$tB)")
      // dropping bits can only CREATE agreement, never destroy it
      assert(mB >= mFull, s"($a,$b): b-bit matches $mB below full matches $mFull")
      // estimators recompute from the counts (dyadic rationals, 6 dp)
      assert(jFull == BigDecimal(mFull / 16.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(jB == BigDecimal((mB / 16.0 - 1.0 / 16) / (1.0 - 1.0 / 16))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      // identical signatures are the estimator's deterministic ceiling
      if (mFull == 16) assert(mB == 16 && jB == 1.0 && jFull == 1.0)
    }
    // the audit's point: the b-bit estimate tracks the full-width one
    // within the Li-König variance inflation (loose band at k = 16)
    out.foreach { case (p, (_, _, jFull, jB)) =>
      assert(math.abs(jB - jFull) <= 0.5, s"$p: b-bit estimate $jB far from $jFull")
    }
  }

  test("simhash banding equals brute-force Hamming<=3 (exact-recall pigeonhole)") {
    val sig = Dedup.simhashSignatures(spark, sf)
    val brute = sig.as("a").crossJoin(sig.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        expr("CAST(bit_count(a.sig ^ b.sig) AS INT)").as("hamming"))
      .filter(col("hamming") <= 3)
    assertSameRows(Dedup.simhashNearDup(spark, sf), brute)
  }

  test("CoveringQuads is an exhaustive complement-closed C(8,4,3) design (r21 band reduction)") {
    val blocks = Dedup.CoveringQuads.map { case (i, j, k, l) => Set(i, j, k, l) }
    assert(blocks.size == 14 && blocks.distinct.size == 14)
    assert(blocks.forall(b => b.size == 4 && b.forall(c => c >= 0 && c < 8)))
    // complement-closure: the clean quad for a dirty set IS a block
    assert(blocks.forall(b => blocks.contains((0 until 8).toSet -- b)),
      "every block's complement must itself be a block")
    // the covering law behind exact recall at Hamming <= 3: every
    // possible <=3-dirty-chunk set sits inside some block, so that
    // block's complement is a fully-clean banded quad (checked
    // EXHAUSTIVELY over all C(8,3) = 56 dirty sets; subsets of size
    // < 3 are covered a fortiori)
    val triples = for {
      a <- 0 until 8; b <- a + 1 until 8; c <- b + 1 until 8
    } yield Set(a, b, c)
    assert(triples.forall(t => blocks.exists(t.subsetOf(_))),
      "every 3-subset of chunks must be contained in some block")
  }

  test("exact dedup keeps one representative per normalized text") {
    val d = Dedup.exact(spark, sf)
    assert(d.count() == d.select("text_fp").distinct().count())
    assert(d.agg(sum("n_dups")).head.getLong(0) == Tables.documents(spark, sf).count())
  }

  test("incremental dedup equals the brute-force delta-vs-corpus truth") {
    val isDelta = (c: org.apache.spark.sql.Column) => md5(c.cast("string")) >= "c0"
    val out = Dedup.incrementalDedup(spark, sf).cache()
    // covers exactly the delta slice, one row per delta doc
    val delta = Tables.documents(spark, sf).filter(isDelta(col("doc_id")))
    assert(out.count() == delta.count())
    // near-dup truth: brute-force jaccard pairs with one end on each side
    // (bruteJaccard emits a_id < b_id, so check membership both ways)
    val nearTruth = bruteJaccard(0.5)
      .filter(isDelta(col("a_id")) =!= isDelta(col("b_id")))
      .select(when(isDelta(col("a_id")), col("a_id")).otherwise(col("b_id")).as("doc_id"))
      .distinct().collect().map(_.getLong(0)).toSet
    // exact-dup truth: fingerprint shared with the corpus side
    val fp = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(Dedup.normText(col("text"))).as("fp"))
    val exactTruth = fp.filter(isDelta(col("doc_id"))).as("d")
      .join(fp.filter(!isDelta(col("doc_id"))).as("c"), expr("d.fp = c.fp"), "left_semi")
      .select(col("d.doc_id")).collect().map(_.getLong(0)).toSet
    out.collect().foreach { r =>
      val (id, st) = (r.getLong(0), r.getString(2))
      val expected = if (exactTruth(id)) "exact_dup"
        else if (nearTruth(id)) "near_dup" else "kept"
      assert(st == expected, s"doc $id: got $st, expected $expected")
    }
    assert(out.filter(col("status") === "kept").count() > 0)
    out.unpersist()
  }

  /** Brute-force directed containment over the corpus shingles. */
  private def bruteContainment(t: Double): Set[(Long, Long)] = {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), split(Dedup.normText(col("text")), " ").as("toks"))
      .select(col("doc_id"), expr(
        """CASE WHEN size(toks) >= 3
          |  THEN array_distinct(transform(sequence(0, size(toks)-3),
          |         i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
          |  ELSE array() END""".stripMargin).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
      .filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a != b
      if sa.intersect(sb).size.toDouble / sa.size >= t
    } yield (a, b)).toSet
  }

  test("containment join equals brute force at default AND non-default thresholds") {
    for (t <- Seq(0.8, 0.6)) {
      val got = Dedup.containmentJoin(spark, sf, t)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == bruteContainment(t), s"mismatch at t=$t")
    }
  }

  test("q181 spectrum: histogram of q21 clusters; doc mass conserved") {
    val clusters = Dedup.exact(spark, sf).collect().map(_.getAs[Long]("n_dups"))
    val exp = clusters.groupBy(identity).view
      .mapValues(g => (g.length.toLong, g.sum)).toMap
    val got = Dedup.dupSpectrum(spark, sf).collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val (nc, nd) = exp(r.getAs[Long]("cluster_size"))
      assert(r.getAs[Long]("n_clusters") == nc && r.getAs[Long]("n_docs") == nd,
        s"size ${r.getAs[Long]("cluster_size")}")
    }
    val total = got.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count(), "doc mass")
  }

  test("q182 agreement: hits are exact set intersections of the declared pair sets") {
    def pairSet(df: DataFrame) = df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val tr = pairSet(Dedup.jaccardNearDup(spark, sf))
    val legs = Map(
      "minhash" -> pairSet(Dedup.minhashLsh(spark, sf)),
      "simhash" -> pairSet(Dedup.simhashNearDup(spark, sf)))
    val got = Dedup.dedupAgreement(spark, sf).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(got.keySet == legs.keySet)
    legs.foreach { case (m, ps) =>
      val r = got(m)
      val hit = ps.intersect(tr).size.toLong
      assert(r.getAs[Long]("n_pairs") == ps.size && r.getAs[Long]("n_true") == tr.size
        && r.getAs[Long]("n_hit") == hit, s"$m counts")
      def rd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("prec") == rd(hit.toDouble / ps.size), s"$m prec")
      assert(r.getAs[Double]("rec") == rd(hit.toDouble / tr.size), s"$m rec")
    }
  }

  test("q188 sampled agreement: doc-sampling restricts every pair set exactly; mod=1 is q182") {
    // All three pair predicates (exact jaccard ≥ t, shared minhash
    // band, simhash Hamming ≤ 3) are PAIRWISE — no dependence on other
    // documents — so the sampled audit's pair sets must be EXACTLY the
    // full-corpus sets restricted to sampled-endpoint pairs. (Candidate
    // ENUMERATION inside q22 re-ranks by the sub-corpus df order, but
    // the prefix/positional filters are lossless for any consistent
    // order and verification is exact, so the OUTPUT restricts.)
    def pairSet(df: DataFrame) = df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sampled = Dedup.sampledDocs(spark, sf, Dedup.AgreementSampleMod)
    val sIds = sampled.select("doc_id").collect().map(_.getLong(0)).toSet
    val nAll = Tables.documents(spark, sf).count()
    assert(sIds.nonEmpty && sIds.size < nAll,
      s"sample ${sIds.size}/$nAll must be a proper non-empty subset")
    def restrict(ps: Set[(Long, Long)]) = ps.filter(p => sIds(p._1) && sIds(p._2))
    val trFull = pairSet(Dedup.jaccardNearDup(spark, sf))
    val mhFull = pairSet(Dedup.minhashLsh(spark, sf))
    val shFull = pairSet(Dedup.simhashNearDup(spark, sf))
    val trS = pairSet(Dedup.jaccardNearDupOf(sampled))
    val mhS = pairSet(Dedup.minhashLshOf(sampled))
    val shS = pairSet(Dedup.simhashNearDupOf(sampled))
    assert(trS == restrict(trFull), "exact-jaccard truth must restrict exactly")
    assert(mhS == restrict(mhFull), "minhash pair set must restrict exactly")
    assert(shS == restrict(shFull), "simhash pair set must restrict exactly")
    // the published audit rows carry the restricted-set arithmetic,
    // with null (not NaN) on a zero denominator
    val got = Dedup.dedupAgreementSampled(spark, sf).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(got.keySet == Set("minhash", "simhash"))
    Seq("minhash" -> mhS, "simhash" -> shS).foreach { case (m, ps) =>
      val r = got(m)
      val hit = ps.intersect(trS).size.toLong
      assert(r.getAs[Long]("n_pairs") == ps.size && r.getAs[Long]("n_true") == trS.size
        && r.getAs[Long]("n_hit") == hit, s"$m counts")
      if (ps.isEmpty) assert(r.isNullAt(r.fieldIndex("prec")), s"$m prec must be null on 0 pairs")
      if (trS.isEmpty) assert(r.isNullAt(r.fieldIndex("rec")), s"$m rec must be null on 0 truth")
    }
    // mod=1 keeps every document: the sampled audit degenerates to q182
    def rows(df: DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(Dedup.dedupAgreementSampled(spark, sf, mod = 1))
      == rows(Dedup.dedupAgreement(spark, sf)), "mod=1 must equal the unsampled audit")
  }

  test("q183 source matrix: cells equal a recompute from the q23 pairs; shares sum to 1") {
    val srcOf = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val exp = Dedup.minhashLsh(spark, sf).select("a_id", "b_id").collect()
      .map { r =>
        val (sa, sb) = (srcOf(r.getLong(0)), srcOf(r.getLong(1)))
        (Seq(sa, sb).min, Seq(sa, sb).max)
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Dedup.sourceDupMatrix(spark, sf).collect()
    assert(got.length == exp.size && exp.nonEmpty)
    val total = exp.values.sum
    got.foreach { r =>
      val key = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert(r.getAs[String]("src_a") <= r.getAs[String]("src_b"), s"$key unordered")
      assert(r.getAs[Long]("n_pairs") == exp(key), s"$key count")
      val share = BigDecimal(exp(key).toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("share") == share, s"$key share")
    }
  }

  test("q184 buckets: mean quality per dup-size bucket equals a direct recompute") {
    val qfp = ops.TextAnalysis.qualityScore(spark, sf)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 1e4)).toMap
    val sizeOf = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(Dedup.normText(col("text"))).as("fp")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val clSize = sizeOf.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val exp = sizeOf.map { case (id, fp) =>
      val s = clSize(fp)
      val b = if (s == 1) "unique" else if (s <= 4) "few" else "many"
      b -> qfp(id)
    }.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, BigDecimal(g.map(_._2).sum.toDouble / g.length / 1e4)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
    val got = Dedup.dupQualityBuckets(spark, sf).collect()
    assert(got.length == exp.size)
    got.foreach { r =>
      val (n, mq) = exp(r.getAs[String]("bucket"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(math.abs(r.getAs[Double]("mean_quality") - mq) < 1e-9,
        s"${r.getAs[String]("bucket")}: ${r.getAs[Double]("mean_quality")} vs $mq")
    }
  }

  test("containment catches the quote-absorption case symmetric jaccard misses") {
    import spark.implicits._
    // doc 2 = doc 1's text embedded in a much longer document: high
    // containment(1 → 2), low jaccard
    val quote = "alpha beta gamma delta epsilon zeta"
    val filler = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, quote), (2L, s"$filler $quote $filler"))
      .toDF("doc_id", "text")
    val contained = Dedup.containmentOf(
      graft.ops.Dedup.shinglesOf(docs), 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(contained.contains((1L, 2L)), "short doc must be contained in long")
    assert(!contained.contains((2L, 1L)), "containment is directed")
    // the same pair is invisible to symmetric resemblance at j >= 0.5
    val sets = docs.select(col("doc_id"), split(Dedup.normText(col("text")), " ").as("toks"))
      .select(col("doc_id"), expr(
        "array_distinct(transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))").as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val j = sets(1L).intersect(sets(2L)).size.toDouble / sets(1L).union(sets(2L)).size
    assert(j < 0.5, s"crafted pair must be low-jaccard, got $j")
  }
}

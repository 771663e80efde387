package graft

import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Semantic properties of the hash split/sampling operators that the
  * pipeline-mirroring oracles can't assert: the realized fractions match
  * the hex thresholds, assignments are content-independent and stable,
  * and strata don't leak into each other. */
class SamplingSpec extends SparkSpec {

  test("hash split realizes ~90/10 and is deterministic") {
    val s = TextAnalysis.hashSplit(spark, sf)
    val n = s.count().toDouble
    val train = s.filter(col("split") === "train").count().toDouble
    // 'e6'/'100' = 230/256 ≈ 0.898; allow sampling noise on 500 docs
    assert(train / n > 0.82 && train / n < 0.95, s"train fraction ${train / n}")
    // stability: the same doc ids get the same split on a re-run
    val a = s.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = TextAnalysis.hashSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(a == b)
  }

  test("stratified sample keeps per-language fractions near their thresholds") {
    val docs = Tables.documents(spark, sf)
    val sample = TextAnalysis.stratifiedSample(spark, sf)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = sample.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, total) =>
      val frac = kept.getOrElse(lang, 0L).toDouble / total
      val want = if (lang == "en") 0.75 else 0.25
      assert(math.abs(frac - want) < 0.2,
        s"$lang kept $frac, wanted ~$want of $total docs")
    }
  }

  test("q115 priority sample: invariants of the Duffield-Lund-Thorup scheme") {
    val k = 20
    val sample = graft.ops.Curation.prioritySample(spark, sf, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // independent priority computation for EVERY doc (same published
    // formula, spec-local code path)
    val all = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map { r =>
        val id = r.getLong(0); val w = r.getLong(1)
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"ps:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 8)
        val h = java.lang.Long.parseLong(hex, 16) % 2147483648L + 1
        (id, w, w * 2147483648L.toDouble / h.toDouble)
      }
    assert(sample.length == math.min(k, all.length))
    // the sample IS the top-k by (p desc, id asc)
    val wantIds = all.sortBy { case (id, _, p) => (-p, id) }.take(k).map(_._1).toSet
    assert(sample.map(_._1).toSet == wantIds)
    // tau = (k+1)-th priority; estimator w_hat = max(w, tau)
    val tau = all.sortBy { case (id, _, p) => (-p, id) }.apply(k)._3
    sample.foreach { case (_, w, p, wHat) =>
      assert(p >= tau, "sampled priority below threshold")
      assert(wHat == math.max(w.toDouble, tau))
    }
    // every unsampled item sits at or below the threshold
    all.filterNot(t => wantIds(t._1)).foreach { case (_, _, p) => assert(p <= tau) }
    // p >= w always (u <= 1), so any item with w >= tau is in the sample
    all.filter(_._2 >= tau).foreach { case (id, _, _) => assert(wantIds(id)) }
  }

  test("q115 degrades to keep-everything when k covers the corpus") {
    val n = Tables.documents(spark, sf).count()
    val sample = graft.ops.Curation.prioritySample(spark, sf, k = 100000)
      .collect()
    assert(sample.length == n)
    // no (k+1)-th priority exists → tau = 0 → estimator is the weight
    sample.foreach(r => assert(r.getDouble(3) == r.getLong(1).toDouble))
  }
}

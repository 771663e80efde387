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
}

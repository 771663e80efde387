package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Scoring}

/** q94 BM25 / q95 bigram-LM cross-entropy / q96 DSIR importance weights. */
class ScoringSpec extends SparkSpec {

  test("bm25: every returned doc contains a query term; scores positive; k bounded") {
    val out = Scoring.bm25TopK(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach(r => assert(r.getAs[Double]("bm25") > 0, s"non-positive score: $r"))
    val hits = Tables.documents(spark, sf)
      .filter(col("text").rlike("(?i)\\b(spark|hash|window)\\b"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    out.foreach(r => assert(hits.contains(r.getAs[Long]("doc_id")),
      s"doc without any query term ranked: $r"))
  }

  test("bm25: the top-20 cut is the global cut (no doc outside beats the floor)") {
    // recompute scores without the limit via the same module path at a
    // wider k is not exposed; assert instead that 20 distinct docs came
    // back and the floor is attained by a doc, i.e. the limit bound the
    // ordered set rather than truncating ties nondeterministically
    val out = Scoring.bm25TopK(spark, sf).collect()
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == out.length)
    val scores = out.map(_.getAs[Double]("bm25"))
    assert(scores.sameElements(scores.sortBy(-_)), "output not rank-ordered")
  }

  test("lm xent: identical normalized text scores identically; n_bigrams = tokens - 1") {
    val xent = Scoring.lmCrossEntropy(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(Dedup.normText(col("text"))).as("fp"),
        (size(split(Dedup.normText(col("text")), " ")) - 1).as("expect_bg"))
    val joined = xent.join(docs, "doc_id")
    // bigram count is a pure function of token count
    assert(joined.filter(col("n_bigrams") =!= col("expect_bg")).count() == 0)
    // exact-dup docs (same fingerprint) must score identically — the model
    // is corpus-global, the score a function of content only
    val perFp = joined.groupBy("fp").agg(count_distinct(col("xent")).as("k"))
    assert(perFp.filter(col("k") > 1).count() == 0)
    // smoothed probabilities are < 1, so every xent is strictly positive
    assert(xent.filter(col("xent") <= 0).count() == 0)
  }

  test("rrf: scores recompute from the ranks; bounds and ordering hold") {
    val out = Scoring.rrfHybrid(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { r =>
      val rb = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val rc = if (r.isNullAt(2)) None else Some(r.getLong(2))
      assert(rb.nonEmpty || rc.nonEmpty, "fused doc must appear in some leg")
      (rb ++ rc).foreach(x => assert(x >= 1 && x <= 50, s"leg rank out of range: $r"))
      val expect = BigDecimal(rb.map(x => 1.0 / (x + 60)).getOrElse(0.0)
        + rc.map(x => 1.0 / (x + 60)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - expect) < 1e-9, s"rrf must equal its definition: $r")
    }
    val scores = out.map(_.getDouble(3))
    assert(scores.sameElements(scores.sortBy(-(_: Double))), "not rank-ordered")
  }

  test("dsir resample: target keep-rate dominates; counts consistent") {
    val rows = Scoring.dsirResample(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.values.foreach { case (n, kept) =>
      assert(kept >= 0 && kept <= n, "kept must be a sub-count")
    }
    assert(rows.values.map(_._2).sum >= 1, "the max-weight doc always passes u < 1")
    val (nEn, keptEn) = rows("en")
    val (nOther, keptOther) = rows.view.filterKeys(_ != "en").values
      .foldLeft((0L, 0L)) { case ((a, b), (n, k)) => (a + n, b + k) }
    // importance resampling must shift the mixture toward the target slice
    assert(keptEn.toDouble / nEn > keptOther.toDouble / nOther,
      s"en keep-rate ${keptEn}/$nEn not above others ${keptOther}/$nOther")
  }

  test("dsir knob: a non-default bucket count still discriminates target from raw") {
    val w = Scoring.dsirWeights(spark, sf, buckets = 64)
    val m = w.groupBy((col("lang") === "en").as("t")).agg(avg(col("log_weight")).as("m"))
      .collect().map(r => r.getAs[Boolean]("t") -> r.getAs[Double]("m")).toMap
    assert(m(true) > m(false), s"64-bucket model lost discrimination: $m")
  }

  test("dsir: weights discriminate target from raw; all docs scored") {
    val w = Scoring.dsirWeights(spark, sf)
    assert(w.count() == Tables.documents(spark, sf).count())
    val m = w.groupBy((col("lang") === "en").as("is_target"))
      .agg(avg(col("log_weight")).as("m"))
      .collect().map(r => r.getAs[Boolean]("is_target") -> r.getAs[Double]("m")).toMap
    // docs drawn from the target slice must average a higher importance
    // weight than the rest — the property that makes resampling move the
    // raw distribution toward the target (Xie et al. 2023, §3)
    assert(m(true) > m(false),
      s"target mean ${m(true)} not above raw mean ${m(false)}")
  }

  test("trigram backoff (q150): equals an independent in-memory reference; every backoff branch fires") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def toks(t: String) = t.trim.toLowerCase.replaceAll("\\s+", " ")
      .split(" ").filter(_.nonEmpty).toSeq
    val (train, heldOut) = docs.partition { case (id, _) => md5hex(id.toString) < "c0" }
    assert(train.nonEmpty && heldOut.nonEmpty, "the md5 split must cut both ways")
    val tt = train.map { case (_, t) => toks(t) }
    def grams(k: Int) = tt.flatMap(_.sliding(k).filter(_.size == k))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (c3, c2, c1m) = (grams(3), grams(2), grams(1))
    def c1(w: String) = c1m.get(Seq(w))
    val n = tt.map(_.size.toLong).sum
    val v = c1m.size.toLong
    var hits = 0L; var bigramBackoffs = 0L; var floors = 0L
    val expected = heldOut.flatMap { case (id, t) =>
      val tk = toks(t)
      if (tk.size < 3) None
      else {
        // the stupid-backoff chain, mirroring the operator's arithmetic
        // shape exactly (same association order, same promotions)
        val ss = tk.sliding(3).toSeq.map { w =>
          if (c3.contains(w)) { hits += 1; c3(w).toDouble / c2(w.take(2)) }
          else if (c2.contains(w.drop(1))) {
            bigramBackoffs += 1; 0.4 * c2(w.drop(1)) / c1(w(1)).get
          } else {
            floors += 1; 0.4 * 0.4 * (c1(w(2)).getOrElse(0L) + 1.0) / (n + v)
          }
        }
        Some(id -> (ss.size.toLong,
          BigDecimal(-ss.map(math.log).sum / ss.size)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.toMap
    // held-out scoring must exercise the whole chain — an in-corpus
    // self-scored variant would leave the backoff branches dead code
    assert(hits > 0 && bigramBackoffs > 0 && floors > 0,
      s"branch coverage: hits=$hits backoffs=$bigramBackoffs floors=$floors")
    val got = graft.ops.Scoring.trigramBackoffXent(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet,
      s"scored-doc set differs: only-got=${(got.keySet -- expected.keySet).take(3)} only-exp=${(expected.keySet -- got.keySet).take(3)}")
    expected.foreach { case (id, (ntg, xent)) =>
      assert(got(id)._1 == ntg, s"doc $id trigram count ${got(id)._1} != $ntg")
      // 6-dp agreement with a last-ulp rounding-boundary allowance
      assert(math.abs(got(id)._2 - xent) <= 1.01e-6,
        s"doc $id xent ${got(id)._2} != $xent")
    }
    // no trained doc leaks into the score set
    assert(!train.exists { case (id, _) => got.contains(id) })
  }

  test("nb classifier (q151): equals an independent in-memory reference; held-out only") {
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def toks(t: String) = t.trim.toLowerCase.replaceAll("\\s+", " ")
      .split(" ").filter(_.nonEmpty).toSeq
    val (train, heldOut) = docs.partition { case (id, _, _) => md5hex(id.toString) < "c0" }
    assert(train.exists(_._2 == "en") && train.exists(_._2 != "en"),
      "train split must contain both classes for the priors to exist")
    val trainTok = train.flatMap { case (_, lang, t) => toks(t).map(lang -> _) }
    val cp = trainTok.filter(_._1 == "en").groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val cAll = trainTok.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tp = trainTok.count(_._1 == "en").toLong
    val tall = trainTok.size.toLong
    val v = cAll.size.toLong
    val np = train.count(_._2 == "en").toLong
    val nd = train.size.toLong
    val expected = heldOut.flatMap { case (id, lang, t) =>
      val tk = toks(t)
      if (tk.isEmpty) None
      else {
        val s = tk.map { w =>
          math.log((cp.getOrElse(w, 0L) + 1.0) / (tp + v)) -
            math.log((cAll.getOrElse(w, 0L) - cp.getOrElse(w, 0L) + 1.0) / (tall - tp + v))
        }.sum
        val lo = BigDecimal(math.log(np.toDouble / (nd - np)) + s)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        Some(id -> (lang, tk.size.toLong, lo))
      }
    }.toMap
    val got = graft.ops.Scoring.nbClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(got.keySet == expected.keySet,
      s"scored-doc set differs: only-got=${(got.keySet -- expected.keySet).take(3)} only-exp=${(expected.keySet -- got.keySet).take(3)}")
    expected.foreach { case (id, (lang, ntok, lo)) =>
      val (gLang, gNtok, gLo, gPred) = got(id)
      assert(gLang == lang && gNtok == ntok, s"doc $id identity columns")
      // 6-dp agreement with a last-ulp rounding-boundary allowance
      assert(math.abs(gLo - lo) <= 1.01e-6, s"doc $id log_odds $gLo != $lo")
      // the ROUNDED value decides the prediction (the q107 rule)
      assert(gPred == (gLo > 0.0), s"doc $id pred/rounded-score disagreement")
    }
    assert(!train.exists { case (id, _, _) => got.contains(id) },
      "no trained doc may be scored")
  }

  test("nb classifier (q151): learns a planted class-separated vocabulary") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // partition candidate ids by the operator's own split rule, then
    // assign classes alternately WITHIN each side so both classes appear
    // in both splits regardless of how the hash falls
    val ids = 0L until 200L
    val (trainIds, heldIds) = ids.partition(id => md5hex(id.toString) < "c0")
    def mk(part: Seq[Long]) = part.zipWithIndex.map { case (id, i) =>
      if (i % 2 == 0) (id, "en", "apple banana cherry date elder fig grape")
      else (id, "xx", "zebra yak xylophone walrus vulture umbrella tapir")
    }
    assert(mk(heldIds).exists(_._2 == "en") && mk(heldIds).exists(_._2 == "xx"))
    val df = (mk(trainIds) ++ mk(heldIds)).toDF("doc_id", "lang", "text")
    val out = graft.ops.Scoring.nbScores(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(3), r.getBoolean(4)))
    assert(out.length == heldIds.size, "every held-out doc must be scored")
    // disjoint class vocabularies → decisive, correct separation
    out.foreach { case (id, lang, lo, pred) =>
      assert(pred == (lang == "en"), s"doc $id ($lang) misclassified: log_odds=$lo")
      if (lang == "en") assert(lo > 1.0, s"doc $id margin too small: $lo")
      else assert(lo < -1.0, s"doc $id margin too small: $lo")
    }
  }

  test("ccnet buckets (q162): per-lang partition of scored docs, ordered and tercile-bounded") {
    val rows = Scoring.ccnetBuckets(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // ground truth: per-lang count of docs that carry an xent (>= 2 tokens)
    val scoredPerLang = Scoring.lmCrossEntropy(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val perLang = rows.groupBy(_._1)
    assert(perLang.keySet == scoredPerLang.keySet, "every scored language bucketized")
    val order = Map("head" -> 0, "middle" -> 1, "tail" -> 2)
    perLang.foreach { case (lang, bs) =>
      assert(bs.map(_._2).distinct.length == bs.length, s"$lang: bucket labels unique")
      assert(bs.forall(b => order.contains(b._2)), s"$lang: only head/middle/tail")
      assert(bs.map(_._3).sum == scoredPerLang(lang), s"$lang: doc counts partition")
      // buckets are xent-ordered: mean xent must rise head -> middle -> tail
      val byOrder = bs.sortBy(b => order(b._2))
      byOrder.sliding(2).foreach {
        case Array(lo, hi) => assert(lo._4 <= hi._4,
          s"$lang: avg_xent must be monotone (${lo._2}=${lo._4} vs ${hi._2}=${hi._4})")
        case _ =>
      }
      // grid-tercile law: the head holds at least its target third, and
      // head+middle at least two thirds (cut buckets overshoot, never undershoot)
      val n = scoredPerLang(lang)
      val cnt = bs.map(b => b._2 -> b._3).toMap
      assert(cnt.getOrElse("head", 0L) >= math.ceil(n / 3.0).toLong,
        s"$lang: head >= ceil(n/3)")
      if (cnt.size == 3)
        assert(cnt("head") + cnt("middle") >= math.ceil(2 * n / 3.0).toLong,
          s"$lang: head+middle >= ceil(2n/3)")
    }
  }

  test("q171 Kneser-Ney: discount mass identity per context; n_bigrams matches q95") {
    // the KN normalization identity, checked from the RAW counts: for
    // every context u, sum of discounted seen mass max(c-D,0) must equal
    // cu - D*fol exactly (quarter-unit arithmetic is exact in doubles) —
    // together with sum(p_cont) = 1 this is what makes p_KN a
    // distribution; a join/count bug breaks it immediately
    val docs = Tables.documents(spark, sf)
      .select(split(Dedup.normText(col("text")), " ").as("toks"))
      .select(explode(expr(
        """CASE WHEN size(toks) >= 2
          |  THEN transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))
          |  ELSE array() END""".stripMargin)).as("bg"))
    val cnt = docs.groupBy(col("bg")).agg(count(lit(1)).as("c"))
      .withColumn("u", split(col("bg"), " ").getItem(0))
      .collect().map(r => (r.getAs[String]("u"), r.getAs[Long]("c")))
    val byU = cnt.groupBy(_._1)
    byU.foreach { case (u, rows) =>
      val cu = rows.map(_._2).sum
      val fol = rows.length
      val discounted = rows.map(r => math.max(r._2 - 0.75, 0.0)).sum
      assert(math.abs(discounted - (cu - 0.75 * fol)) < 1e-9,
        s"context '$u': discount identity")
    }
    // the scored stream is q95's: per-doc bigram counts must agree
    val kn = Scoring.knXent(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bigrams")).toMap
    val q95 = Scoring.lmCrossEntropy(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_bigrams")).toMap
    assert(kn == q95, "q171 must score exactly q95's bigram stream")
    // self-scored KN xent is positive and finite
    Scoring.knXent(spark, sf).collect().foreach { r =>
      val x = r.getAs[Double]("xent_kn")
      assert(x > 0 && !x.isNaN && !x.isInfinite, s"doc ${r.get(0)}: xent $x")
    }
  }

  test("q171 weighted (doc,type) mean equals the per-occurrence average") {
    // the r15 de-skew pre-aggregates occurrences to per-(doc, type)
    // counts and reports Σ c·(−ln p)/Σ c — this law pins that the
    // weighted form IS the per-occurrence average (brute-forced here
    // term by term in driver memory), i.e. the refactor changed the
    // join cardinality and nothing a consumer can see
    val occ = Tables.documents(spark, sf)
      .select(col("doc_id"), split(Dedup.normText(col("text")), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(toks) >= 2
          |  THEN transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))
          |  ELSE array() END""".stripMargin)).as("bg"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("bg")))
    val c = occ.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def u(bg: String) = bg.split(" ", 2)(0)
    def w(bg: String) = bg.split(" ", 2)(1)
    val byU = c.toSeq.groupBy(kv => u(kv._1))
    val cu = byU.view.mapValues(_.map(_._2).sum).toMap
    val fol = byU.view.mapValues(_.size.toLong).toMap
    val pre = c.toSeq.groupBy(kv => w(kv._1)).view.mapValues(_.size.toLong).toMap
    val nbt = c.size.toDouble
    def p(bg: String): Double =
      math.max(c(bg) - 0.75, 0.0) / cu(u(bg)) +
        0.75 * fol(u(bg)) / cu(u(bg)) * (pre(w(bg)) / nbt)
    val brute = occ.groupBy(_._1).map { case (id, os) =>
      id -> os.map(o => -math.log(p(o._2))).sum / os.length
    }
    val got = Scoring.knXent(spark, sf).collect()
    assert(got.length == brute.size, "per-doc row coverage")
    got.foreach { r =>
      val b = brute(r.getAs[Long]("doc_id"))
      assert(math.abs(r.getAs[Double]("xent_kn") - b) < 1e-6,
        s"doc ${r.get(0)}: weighted ${r.getAs[Double]("xent_kn")} vs per-occurrence $b")
    }
  }
}

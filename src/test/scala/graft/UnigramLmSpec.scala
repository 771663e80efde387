package graft

import graft.ops.UnigramLm
import org.apache.spark.sql.functions._

/** Properties of the unigram-LM tokenizer (q156/q157) beyond the oracle:
  * the whole hard-EM train rebuilt in memory must match the distributed
  * result exactly (the ScoringSpec convention — a common-mode bug in the
  * Spark pipeline and its mirrored DuckDB SQL would still fail here),
  * plus the BpeSpec-style structural laws: encode round-trip, character
  * coverage, vocabulary monotonicity, and the rounds=0 degenerate. */
class UnigramLmSpec extends SparkSpec {

  private val MaxPiece = UnigramLm.MaxPieceLen
  private val Scale = UnigramLm.LpScale

  /** Corpus words (normalized, length-capped) with instance counts —
    * recomputed from raw text, independent of the operator's plumbing. */
  private def refWords: Map[String, Long] = {
    val docs = Tables.documents(spark, sf).select(col("text")).collect()
    val toks = docs.flatMap(
      _.getString(0).trim.replaceAll("\\s+", " ").toLowerCase.split(" "))
      .filter(w => w.nonEmpty && w.length <= UnigramLm.MaxWordLen)
    toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
  }

  /** Fixed-point score table from counts — the same HALF_UP rounding
    * Spark's round() and DuckDB's round() apply. */
  private def refLp(counts: Map[String, Long]): Map[String, (Long, Long)] = {
    val n = counts.values.sum.toDouble
    counts.map { case (p, c) =>
      p -> (c, new java.math.BigDecimal(math.log(c / n) * Scale)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue)
    }
  }

  /** Reference Viterbi — ascending-start scan keeps the LOWEST start on
    * score ties, the operator's (score DESC, start ASC) total order. */
  private def refViterbi(word: String, lp: Map[String, (Long, Long)]): Seq[String] = {
    val n = word.length
    val Neg = Long.MinValue / 4
    val best = Array.fill(n + 1)(Neg); best(0) = 0L
    val bpI = Array.fill(n + 1)(-1)
    val bpP = Array.fill(n + 1)("")
    for (j <- 1 to n; i <- math.max(0, j - MaxPiece) until j) {
      lp.get(word.substring(i, j)).foreach { case (_, l) =>
        if (best(i) != Neg && best(i) + l > best(j)) {
          best(j) = best(i) + l; bpI(j) = i; bpP(j) = word.substring(i, j)
        }
      }
    }
    assert(best(n) != Neg, s"'$word' must be segmentable (char coverage)")
    var pos = n
    val acc = scala.collection.mutable.ListBuffer.empty[String]
    while (pos > 0) { acc.prepend(bpP(pos)); pos = bpI(pos) }
    acc.toSeq
  }

  /** The whole hard-EM train, in memory. */
  private def refTrain(rounds: Int): Map[String, (Long, Long)] = {
    val words = refWords
    val seed = words.toSeq
      .flatMap { case (w, c) =>
        for {
          i <- 0 until w.length
          l <- 1 to math.min(MaxPiece, w.length - i)
        } yield (w.substring(i, i + l), c)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      .filter { case (p, c) => p.length == 1 || c >= 2L }
    val chars = seed.keySet.filter(_.length == 1)
    var vocab = refLp(seed)
    for (_ <- 1 to rounds) {
      val usage = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (w, c) =>
        refViterbi(w, vocab).foreach(p => usage(p) = usage.getOrElse(p, 0L) + c)
      }
      val next = chars.map(ch => ch -> math.max(usage.getOrElse(ch, 0L), 1L)).toMap ++
        usage.filter { case (p, u) => p.length > 1 && u > 0 }
      vocab = refLp(next)
    }
    vocab
  }

  test("q156: distributed hard-EM train equals the in-memory reference exactly") {
    val got = UnigramLm.unigramTrain(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = refTrain(UnigramLm.EmRounds)
    assert(got.keySet == want.keySet,
      s"vocab sets differ: only-spark=${(got.keySet -- want.keySet).take(5)} " +
        s"only-ref=${(want.keySet -- got.keySet).take(5)}")
    got.foreach { case (p, cl) =>
      assert(cl == want(p), s"piece '$p': spark=$cl ref=${want(p)}")
    }
  }

  test("q156: rounds=0 is the scored seed table; vocab shrinks monotonically") {
    val byRound = (0 to UnigramLm.EmRounds).map { r =>
      UnigramLm.unigramTrain(spark, sf, rounds = r).collect()
        .map(r2 => r2.getString(0) -> (r2.getLong(1), r2.getLong(2))).toMap
    }
    assert(byRound.head.map { case (p, cl) => p -> cl } ==
      refTrain(0).map { case (p, cl) => p -> cl },
      "rounds=0 must be the seed counts with seed scores")
    byRound.sliding(2).foreach { case Seq(prev, next) =>
      assert(next.keySet.subsetOf(prev.keySet),
        "hard-EM only ever drops pieces (chars floored, never added)")
    }
    // char coverage survives every round
    val chars = refWords.keySet.flatMap(_.toSeq).map(_.toString)
    byRound.foreach(v => assert(chars.subsetOf(v.keySet), "all corpus chars kept"))
  }

  test("q157: every document round-trips through its piece stream") {
    val norm = Tables.documents(spark, sf).select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).trim.replaceAll("\\s+", " ").toLowerCase.split(" ")
          .filter(w => w.nonEmpty && w.length <= UnigramLm.MaxWordLen)
        r.getLong(0) -> toks.toSeq
      }.toMap
    val out = UnigramLm.unigramEncode(spark, sf).collect()
    assert(out.length == norm.count(_._2.nonEmpty), "one row per nonempty doc")
    out.foreach { r =>
      val (id, nTok, nPiece, enc) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
      val toks = norm(id)
      assert(nTok == toks.length, s"doc $id token count")
      // '<p1><p2>' per word, words ' '-joined: stripping the wrapping
      // must reproduce the normalized token stream
      val rebuilt = enc.split(" ").map(_.stripPrefix("<").stripSuffix(">")
        .replace("><", "")).toSeq
      assert(rebuilt == toks, s"doc $id round-trip")
      val pieces = enc.split(" ").map(_.count(_ == '<')).sum
      assert(nPiece == pieces, s"doc $id piece count consistency")
      assert(nPiece >= nTok, "at least one piece per token")
      assert(nPiece <= toks.map(_.length).sum.toLong, "at most one piece per char")
    }
  }

  test("q160: fertility report equals the per-doc encode rollup") {
    val langOf = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val charsOf = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map { r =>
        val toks = r.getString(1).trim.replaceAll("\\s+", " ").toLowerCase.split(" ")
          .filter(w => w.nonEmpty && w.length <= UnigramLm.MaxWordLen)
        r.getLong(0) -> toks.map(_.length.toLong).sum
      }.toMap
    val enc = UnigramLm.unigramEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byLang = enc.groupBy(e => langOf(e._1))
    val got = UnigramLm.unigramFertility(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(got.keySet == byLang.keySet, "one report row per language")
    byLang.foreach { case (lang, docs) =>
      val (nDocs, nWords, nSym) =
        (docs.length.toLong, docs.map(_._2).sum, docs.map(_._3).sum)
      val nChars = docs.map(d => charsOf(d._1)).sum
      val want = (nDocs, nWords, nSym, nChars,
        nSym.toDouble / nWords, nChars.toDouble / nSym)
      assert(got(lang) == want, s"lang $lang: ${got(lang)} vs $want")
    }
  }

  test("q177: greedy encode equals a reference longest-match walk; full coverage") {
    val vocab = UnigramLm.unigramTrain(spark, sf)
      .collect().map(_.getAs[String]("piece")).toSet
    def greedy(w: String): Seq[String] = {
      val ps = Seq.newBuilder[String]
      var pos = 0
      while (pos < w.length) {
        val l = (math.min(MaxPiece, w.length - pos) to 1 by -1)
          .find(l => vocab(w.substring(pos, pos + l)))
          .getOrElse(sys.error(s"no match in '$w' at $pos — char coverage broken"))
        ps += w.substring(pos, pos + l); pos += l
      }
      ps.result()
    }
    val got = UnigramLm.wordpieceEncode(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Long]("n_piece"), r.getAs[String]("enc"))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
    assert(got.size == docs.length)
    docs.foreach { d =>
      val toks = d.getString(1).trim.replaceAll("\\s+", " ").toLowerCase.split(" ")
        .filter(w => w.nonEmpty && w.length <= UnigramLm.MaxWordLen).toSeq
      val segs = toks.map(greedy)
      // coverage: greedy pieces reassemble each word exactly (asserted
      // by construction of `greedy`; the distributed enc must agree)
      val exp = segs.map(_.map(p => s"<$p>").mkString).mkString(" ")
      val (nTok, nPiece, enc) = got(d.getLong(0))
      assert(nTok == toks.length && nPiece == segs.map(_.length).sum,
        s"doc ${d.getLong(0)} counts")
      assert(enc == exp, s"doc ${d.getLong(0)}:\n  got $enc\n  exp $exp")
    }
    // greedy vs Viterbi: same vocab, same corpus — piece streams may
    // differ but both cover; fertility is comparable (within 2x)
    val vit = UnigramLm.unigramEncode(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_piece")).toMap
    got.foreach { case (id, (_, np, _)) =>
      assert(np >= 1 && np <= 2 * math.max(1L, vit(id)), s"doc $id fertility") }
  }

  test("q157: per-word segmentations are the reference Viterbi's") {
    val vocab = refTrain(UnigramLm.EmRounds)
    val out = UnigramLm.unigramEncode(spark, sf).collect()
    out.foreach { r =>
      val enc = r.getString(3)
      enc.split(" ").foreach { we =>
        val pieces = we.stripPrefix("<").stripSuffix(">").split("><").toSeq
        val word = pieces.mkString
        assert(pieces == refViterbi(word, vocab),
          s"word '$word': ${pieces.mkString("|")} vs reference ${refViterbi(word, vocab).mkString("|")}")
      }
    }
  }
}

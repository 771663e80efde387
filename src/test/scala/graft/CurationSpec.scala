package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, TextAnalysis}

/** q88 bloom decontamination + q89 chunk dedup + q90 shard manifest. */
class CurationSpec extends SparkSpec {

  test("bloom decontamination: exact columns equal the exact q79 scan") {
    val bloom = Curation.bloomDecontaminate(spark, sf)
      .select("lang", "n_train", "n_contaminated", "n_clean")
    val exact = TextAnalysis.decontaminate(spark, sf)
      .select("lang", "n_train", "n_contaminated", "n_clean")
    assertSameRows(bloom, exact)
  }

  test("bloom candidates superset contaminated; never exceed train count") {
    val r = Curation.bloomDecontaminate(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (train, cand, cont) = (row.getAs[Long]("n_train"),
        row.getAs[Long]("n_bloom_candidates"), row.getAs[Long]("n_contaminated"))
      assert(cand >= cont, s"bloom has no false negatives: $row")
      assert(cand <= train, s"candidates bounded by split size: $row")
    }
  }

  test("smaller bloom degrades candidates gracefully, never the answer") {
    // 2^10 bits over thousands of shingles → heavy false-positive load;
    // the exact columns must not move
    val tiny = Curation.bloomDecontaminate(spark, sf, bits = 1 << 10)
      .select("lang", "n_train", "n_contaminated", "n_clean")
    val exact = TextAnalysis.decontaminate(spark, sf)
      .select("lang", "n_train", "n_contaminated", "n_clean")
    assertSameRows(tiny, exact)
  }

  test("chunk dedup: chunk multiset is globally unique after the cut") {
    val out = Curation.chunkDedup(spark, sf)
    // re-chunk the cleaned text: every surviving chunk appears exactly once
    // corpus-wide (first occurrences survive, all repeats are cut)
    val reChunks = out.filter(col("n_kept") > 0)
      .select(col("doc_id"), split(col("text_clean"), " ").as("toks"))
      .select(explode(expr(
        """transform(sequence(0, CAST(ceil(size(toks) / 10.0) AS INT) - 1),
          |  c -> concat_ws(' ', slice(toks, c * 10 + 1, 10)))""".stripMargin)).as("chunk"))
    // re-chunking reproduces the kept chunks exactly: every non-final
    // source chunk is exactly 10 tokens and the only short chunk (a doc's
    // final one) sorts last in the reconstruction, so boundaries align
    val dupCount = reChunks.groupBy("chunk").count().filter(col("count") > 1).count()
    assert(dupCount == 0, s"$dupCount chunks still duplicated after dedup")
    assert(out.agg(sum("n_kept")).head.getLong(0) == reChunks.count(),
      "kept chunk count consistent with reconstruction")
  }

  test("chunk dedup: randomized differential vs sequential keep-first reference") {
    import spark.implicits._
    // a 6-token alphabet and 3-token chunks force heavy chunk collisions,
    // both across docs and WITHIN one doc — the corner the set-property
    // tests above and the copy/solo edge cases don't pin
    val rnd = new scala.util.Random(42)
    val ct = 3
    val docs = (0L until 30L).map { id =>
      val n = 1 + rnd.nextInt(40)
      id -> (0 until n).map(_ => s"t${rnd.nextInt(6)}")
    }
    // reference: one sequential pass in ascending (doc_id, pos) — exactly
    // the operator's global min-(doc_id, pos) keep-first contract
    val seen = scala.collection.mutable.Set[String]()
    var withinDocCut = false
    val expected = docs.map { case (id, toks) =>
      val chunks = toks.grouped(ct).toSeq
      val docSeen = scala.collection.mutable.Set[String]()
      val kept = chunks.filter { c =>
        val key = c.mkString(" ")
        if (!docSeen.add(key)) withinDocCut = true
        seen.add(key)
      }
      id -> ((chunks.size.toLong, kept.size.toLong, kept.map(_.mkString(" ")).mkString(" ")))
    }.toMap
    assert(withinDocCut, "fixture must exercise a within-doc repeated chunk")
    assert(expected.values.map(_._2).sum < expected.values.map(_._1).sum,
      "fixture must exercise cross-doc cuts")
    val dir = java.nio.file.Files.createTempDirectory("prop_chunks").toString
    docs.map { case (id, toks) =>
      val t = toks.mkString(" "); (id, t, "en", "src", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.chunkDedup(spark, dir, chunkTokens = ct).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_chunks"),
        r.getAs[Long]("n_kept"), r.getAs[String]("text_clean")))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, e) =>
      assert(got(id) == e, s"doc $id: got ${got(id)}, want $e") }
  }

  test("shard manifest: partition-of-corpus, deterministic, knob-stable") {
    val m = Curation.shardManifest(spark, sf).cache()
    val docs = Tables.documents(spark, sf).count()
    assert(m.agg(sum("n_docs")).head.getLong(0) == docs, "shards partition the corpus")
    // pure function of doc ids: a second evaluation is bit-identical
    assertSameRows(m, Curation.shardManifest(spark, sf))
    // a different shard count still partitions everything
    val m8 = Curation.shardManifest(spark, sf, nShards = 8)
    assert(m8.agg(sum("n_docs")).head.getLong(0) == docs)
    assert(m8.count() == 8)
    m.unpersist()
  }

  test("sharded write lays out sorted shards that reproduce the manifest") {
    import org.apache.spark.sql.functions.{col => c}
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    val keys = Curation.shardKeys(spark, sf, 8)
    keys.repartitionByRange(8, c("shard_id"))
      .sortWithinPartitions(c("shard_id"), c("ord"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(out)
    val back = spark.read.parquet(out)
    // the written layout reproduces the manifest exactly
    val manifest = back.groupBy(c("shard_id").cast("long").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(c("n_tok")).as("n_tokens"),
        min_by(c("doc_id"), c("ord")).as("first_doc_id"))
    assertSameRows(manifest, Curation.shardManifest(spark, sf, nShards = 8))
  }

  test("sequence packing: conserves docs, contiguous packs, exact fill") {
    val p = Curation.sequencePacking(spark, sf).cache()
    val docs = Tables.documents(spark, sf).count()
    assert(p.agg(sum("n_docs")).head.getLong(0) == docs, "every doc lands in a pack")
    // pack ids are contiguous 0..max within each shard (the prefix sum
    // sweeps every integer bucket up to the shard total)
    val gaps = p.groupBy("shard_id")
      .agg(count(lit(1)).as("n"), (max("pack_id") + 1).as("expect"))
      .filter(col("n") =!= col("expect")).count()
    assert(gaps == 0, "no shard has a pack-id gap")
    p.collect().foreach { r =>
      assert(r.getAs[Double]("fill_ratio") ==
        r.getAs[Long]("n_tokens").toDouble / 2048, "fill ratio is exact")
    }
    // determinism: re-evaluation is bit-identical
    assertSameRows(p, Curation.sequencePacking(spark, sf))
    p.unpersist()
  }

  /** q161 = q93's laws under the unigram-LM token count: same shard
    * membership and within-shard order (md5 keys are tokenizer-
    * independent), conservation, pack contiguity, exact fill — plus
    * the cross-variant invariants: total packed tokens equal the q157
    * encode's corpus piece total, and each doc's shard is identical to
    * its q93 shard. */
  test("unigram packing: q93 laws hold and totals match the q157 encode") {
    val p = graft.ops.UnigramLm.unigramPacking(spark, sf).cache()
    val docs = Tables.documents(spark, sf).count()
    assert(p.agg(sum("n_docs")).head.getLong(0) == docs, "every doc lands in a pack")
    val gaps = p.groupBy("shard_id")
      .agg(count(lit(1)).as("n"), (max("pack_id") + 1).as("expect"))
      .filter(col("n") =!= col("expect")).count()
    assert(gaps == 0, "no shard has a pack-id gap")
    p.collect().foreach { r =>
      assert(r.getAs[Double]("fill_ratio") ==
        r.getAs[Long]("n_tokens").toDouble / 2048, "fill ratio is exact")
    }
    // token conservation vs the tokenizer itself: packed totals are the
    // corpus piece count, not the whitespace token count
    val pieces = graft.ops.UnigramLm.unigramEncode(spark, sf)
      .agg(sum("n_piece")).head.getLong(0)
    assert(p.agg(sum("n_tokens")).head.getLong(0) == pieces,
      "packed tokens must conserve the q157 corpus piece total")
    // shard membership is tokenizer-independent (same md5 keys as q93)
    val s93 = Curation.sequencePacking(spark, sf)
      .groupBy("shard_id").agg(sum("n_docs").as("d93"))
    val s161 = p.groupBy("shard_id").agg(sum("n_docs").as("d161"))
    assert(s93.join(s161, Seq("shard_id"), "full")
      .filter(col("d93") =!= col("d161") ||
        col("d93").isNull || col("d161").isNull).count() == 0,
      "per-shard doc counts must be identical across tokenizers")
    assertSameRows(p, graft.ops.UnigramLm.unigramPacking(spark, sf))
    p.unpersist()
  }

  test("chunk dedup: first doc is untouched; totals conserve") {
    val out = Curation.chunkDedup(spark, sf).cache()
    val first = out.orderBy("doc_id").limit(1).head()
    assert(first.getAs[Long]("n_kept") == first.getAs[Long]("n_chunks"),
      "doc 0 keeps everything (nothing precedes it)")
    val r = out.agg(sum("n_kept").as("k"), sum("n_chunks").as("c")).head()
    assert(r.getLong(0) <= r.getLong(1))
    assert(out.filter(col("n_kept") < col("n_chunks")).count() > 0,
      "the synthetic corpus does contain repeated chunks")
    out.unpersist()
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** q101 HLL registers: merge law and estimate accuracy. */
class SketchSpec extends SparkSpec {

  private def regs(df: org.apache.spark.sql.DataFrame): Map[String, Map[Int, Int]] =
    df.collect()
      .groupBy(_.getAs[String]("l_returnflag"))
      .view.mapValues(_.map(r => r.getAs[Long]("bucket").toInt -> r.getAs[Int]("r")).toMap)
      .toMap

  test("cms (q141): point estimates are one-sided and exact sans collision; sketches merge by sum") {
    val W = 1024
    val regs = Sketches.cmsRegisters(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    // independent ground truth: Scala-side token counts + the same
    // md5-derived row hashes
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(r: Int, tok: String): Long = {
      val hex = md.digest(s"$r:$tok".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (BigInt(hex.substring(0, 15), 16) % W).toLong
    }
    val toks = Tables.documents(spark, sf)
      .select(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
      .collect().flatMap(_.getString(0).split(" ")).filter(_.nonEmpty)
    val trueCnt = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(regs.values.sum == toks.length.toLong * 4, "register mass = 4x stream length")
    trueCnt.foreach { case (tok, n) =>
      val est = (0 until 4).map(r => regs.getOrElse((r, h(r, tok)), 0L)).min
      assert(est >= n, s"'$tok': est $est under-counts true $n")
    }
    // exactness when a token's min row is collision-free: bucket mass
    // equals the token's own count ⇒ est == true count (holds for any
    // token where some row's bucket holds only that token)
    val exact = trueCnt.count { case (tok, n) =>
      (0 until 4).map(r => regs.getOrElse((r, h(r, tok)), 0L)).min == n
    }
    assert(exact > 0, "fixture should have some collision-free tokens")
    // merge law: disjoint halves sum elementwise to the full sketch
    val docs = Tables.documents(spark, sf)
    def regsOf(d: org.apache.spark.sql.DataFrame) =
      Sketches.cmsOf(d).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val a = regsOf(docs.filter(col("doc_id") % 2 === 0))
    val b = regsOf(docs.filter(col("doc_id") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet)
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == regs, "cms(A) + cms(B) must equal cms(A ∪ B)")
  }

  test("hll estimate lands within the m=256 error band of the exact count") {
    val est = regs(Sketches.hllRegisters(spark, sf))
      .view.mapValues(Sketches.estimate).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(count_distinct(col("l_orderkey")).as("d"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("d")).toMap
    exact.foreach { case (flag, d) =>
      val e = est(flag)
      // stderr ≈ 1.04/√256 ≈ 6.5%; 4σ keeps the test deterministic-safe
      assert(math.abs(e - d) / d < 0.26, s"$flag: estimate $e vs exact $d")
    }
  }

  test("sketches merge by element-wise max: sketch(A ∪ B) == merge parts") {
    // split lineitem by parity of l_linenumber, sketch each half through
    // the same pipeline, merge, compare to the whole-input sketch
    val li = Tables.lineitem(spark, sf)
    def sketchOf(df: org.apache.spark.sql.DataFrame): Map[String, Map[Int, Int]] = {
      // mirror hllRegisters over an arbitrary input slice
      val d = df.select(col("l_returnflag"), expr(
        "CAST(conv(substring(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
        .select(col("l_returnflag"), (col("h") % 256).as("bucket"), expr(
          """CASE WHEN (h div 256) = 0 THEN 53
            |  ELSE bit_count(((h div 256) & -(h div 256)) - 1) + 1 END""".stripMargin).as("rho"))
        .groupBy(col("l_returnflag"), col("bucket"))
        .agg(max(col("rho")).cast("int").as("r"))
      regs(d)
    }
    val a = sketchOf(li.filter(col("l_linenumber") % 2 === 0))
    val b = sketchOf(li.filter(col("l_linenumber") % 2 === 1))
    val whole = regs(Sketches.hllRegisters(spark, sf))
    val merged = (a.keySet ++ b.keySet).map { flag =>
      val ra = a.getOrElse(flag, Map.empty)
      val rb = b.getOrElse(flag, Map.empty)
      flag -> (ra.keySet ++ rb.keySet).map(k =>
        k -> math.max(ra.getOrElse(k, 0), rb.getOrElse(k, 0))).toMap
    }.toMap
    assert(merged == whole, "element-wise max merge must equal the union sketch")
  }

  test("registers are a pure function of the value set (duplicates free)") {
    val once = regs(Sketches.hllRegisters(spark, sf))
    // double the input: union with itself — registers must not move
    val li = Tables.lineitem(spark, sf)
    val doubled = li.union(li)
      .select(col("l_returnflag"), expr(
        "CAST(conv(substring(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .select(col("l_returnflag"), (col("h") % 256).as("bucket"), expr(
        """CASE WHEN (h div 256) = 0 THEN 53
          |  ELSE bit_count(((h div 256) & -(h div 256)) - 1) + 1 END""".stripMargin).as("rho"))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(max(col("rho")).cast("int").as("r"))
    assert(regs(doubled) == once)
  }

  test("q114 merged estimate = estimate(merged registers), and tracks exact") {
    val est = Sketches.hllMergedEstimate(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the exact-integer SQL estimate must agree with the driver-side
    // register functional (same math, different summation representation)
    val perFlag = Sketches.hllRegisters(spark, sf).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => r.getLong(1).toInt -> r.getInt(2)).toMap).toMap
    val mergedRegs = perFlag.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(math.abs(est("merged") - Sketches.estimate(mergedRegs)) < 1e-3)
    perFlag.foreach { case (flag, r) =>
      assert(math.abs(est(s"flag:$flag") - Sketches.estimate(r)) < 1e-3)
    }
    // and the merged estimate lands in the m=256 error band of the truth
    val exact = Tables.lineitem(spark, sf)
      .agg(count_distinct(col("l_orderkey"))).collect().head.getLong(0)
    assert(math.abs(est("merged") - exact) / exact < 0.26,
      s"merged ${est("merged")} vs exact $exact")
  }

  test("q116 grid-quantile estimates bracket the exact quantiles") {
    val buckets = 4096
    val ests = Sketches.gridQuantiles(spark, sf, buckets).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    val xs = Tables.lineitem(spark, sf).select(col("l_extendedprice"))
      .collect().map(_.getDouble(0)).sorted
    val step = (xs.last - xs.head) / buckets
    ests.foreach { case (phi, target, est) =>
      val exact = xs(target.toInt - 1) // the ⌈φ·n⌉-th smallest
      assert(est >= exact - 1e-9, s"phi=$phi est $est below exact $exact")
      assert(est - exact <= step + 1e-9,
        s"phi=$phi est $est more than a grid step above exact $exact")
    }
  }

  test("q121 inclusion-exclusion intersection estimates track the exact overlaps") {
    val li = Tables.lineitem(spark, sf)
    val sets = li.select(col("l_returnflag"), col("l_orderkey")).distinct()
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ests = Sketches.hllIntersections(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(5)).toMap
    assert(ests.size == sets.size * (sets.size - 1) / 2)
    ests.foreach { case ((fa, fb), est) =>
      val exact = sets(fa).intersect(sets(fb)).size
      // inclusion-exclusion compounds ~3 sketches' stderr (6.5% each);
      // a 0.35 relative band keeps the test deterministic-safe
      assert(math.abs(est - exact) / exact < 0.35,
        s"($fa,$fb): est $est vs exact $exact")
    }
  }

  test("q116 degenerate input: a constant column still answers every phi") {
    import spark.implicits._
    val const = Seq.fill(10)(42.0).toDF("x")
    val rows = Sketches.gridQuantilesOf(const, 4096, Seq(0.5, 0.99)).collect()
    assert(rows.length == 2)
    rows.foreach(r => assert(r.getDouble(2) == 42.0,
      s"phi=${r.getDouble(0)} est ${r.getDouble(2)}"))
  }

  test("q116 histograms merge: shard count vectors add to the whole") {
    // two disjoint shards bucketed on the SAME global grid must sum to
    // the whole-corpus histogram — the property that lets each ingest
    // shard publish its count vector independently
    val li = Tables.lineitem(spark, sf)
    val bounds = li.agg(min(col("l_extendedprice")).as("lo"),
      max(col("l_extendedprice")).as("hi")).collect().head
    val (lo, hi) = (bounds.getDouble(0), bounds.getDouble(1))
    def hist(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
      df.select(least(
        floor((col("l_extendedprice") - lit(lo)) / lit(hi - lo) * 4096),
        lit(4095L)).cast("int").as("b"))
        .groupBy("b").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val a = hist(li.filter(col("l_orderkey") % 2 === 0))
    val b = hist(li.filter(col("l_orderkey") % 2 === 1))
    val whole = hist(li)
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged == whole)
  }

  test("q135 heavy hitters: output equals the exact GROUP BY/HAVING semantics") {
    val k = 16
    val got = Sketches.heavyHitters(spark, sf, k).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // exact recomputation by a different route: full char explode
    val exact = Tables.documents(spark, sf)
      .select(explode(split(regexp_replace(
        graft.ops.Dedup.normText(col("text")), " ", ""), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy("ch").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val want = exact.collect { case (c, v) if v * k > n => (c, v, n) }.toSet
    assert(want.nonEmpty, "fixture must produce at least one heavy hitter")
    assert(got == want, s"only-got=${got -- want} only-want=${want -- got}")
  }
}

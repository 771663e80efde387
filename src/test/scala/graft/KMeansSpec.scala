package graft

import org.apache.spark.sql.functions._
import graft.ops.{KMeans, Similarity}

/** q111 k-means: the distributed Lloyd pipeline must agree EXACTLY with
  * an independent driver-side Lloyd implementation (same integer-scaled
  * arithmetic), including at non-default knobs. */
class KMeansSpec extends SparkSpec {

  /** Driver-side reference Lloyd, written against the spec's own math
    * (plain Scala Long/Double), not the DataFrame code under test. */
  private def referenceLloyd(vs: Array[(Long, Array[Long])], k: Int,
                             iters: Int): Map[Long, (Int, Long)] = {
    def dist2(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // round-half-away-from-zero — the semantics both engines share
    def rnd(x: Double): Long =
      if (x >= 0) math.floor(x + 0.5).toLong else math.ceil(x - 0.5).toLong
    val sorted = vs.sortBy(_._1)
    var cents: Vector[(Int, Array[Long])] =
      sorted.take(k).zipWithIndex.map { case ((_, ai), i) => (i, ai) }.toVector
    def assignAll(): Array[(Long, Array[Long], Int, Long)] =
      sorted.map { case (id, ai) =>
        val (d, cid) = cents.map { case (cid, c) => (dist2(ai, c), cid) }.min
        (id, ai, cid, d)
      }
    for (_ <- 1 to iters) {
      val byC = assignAll().groupBy(_._3)
      cents = byC.toVector.sortBy(_._1).map { case (cid, rows) =>
        val n = rows.length.toDouble
        val c = Array.tabulate(64) { i =>
          rnd(rows.map(_._2(i)).sum.toDouble / n)
        }
        (cid, c)
      }
    }
    assignAll().map { case (id, _, cid, d) => id -> (cid, d) }.toMap
  }

  private def vectors: Array[(Long, Array[Long])] =
    Similarity.scaled(spark, sf).select(col("vec_id"), col("ai")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))

  test("q111 equals the independent reference Lloyd at default knobs") {
    val got = KMeans.kmeans(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val want = referenceLloyd(vectors, k = 8, iters = 3)
    assert(got == want)
  }

  test("q111 equals the reference at non-default knobs (k=4, iters=2)") {
    val got = KMeans.kmeans(spark, sf, k = 4, iters = 2).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val want = referenceLloyd(vectors, k = 4, iters = 2)
    assert(got == want)
  }

  test("degenerate knobs: k larger than the corpus, and zero iterations") {
    import org.apache.spark.sql.functions._
    val tiny = Similarity.scaled(spark, sf)
      .select(col("vec_id"), col("ai")).orderBy(col("vec_id")).limit(5)
      .localCheckpoint(true)
    // k > n: every vector seeds its own centroid and is its own nearest
    val own = KMeans.finalAssign(tiny, k = 8, iters = 1).collect()
    assert(own.length == 5)
    own.foreach(r => assert(r.getLong(3) == 0L,
      s"vec ${r.getLong(0)} should sit on its own centroid"))
    // iters = 0: assignment against the raw seeds, no update round
    val seeds = KMeans.finalAssign(tiny, k = 2, iters = 0).collect()
    assert(seeds.length == 5)
    assert(seeds.map(_.getInt(2)).toSet.subsetOf(Set(0, 1)))
  }

  test("IVF-pruned assignment equals exact Lloyd when every cell is probed") {
    val v = Similarity.scaled(spark, sf).select(col("vec_id"), col("ai"))
    // k=9 ⇒ 3 coarse cells; nprobe=3 probes them all ⇒ the prune is a
    // no-op and the whole chain must match exact Lloyd bit-for-bit
    val exact = KMeans.finalAssign(v, k = 9, iters = 2)
      .select("vec_id", "cluster", "dist2").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val pruned = KMeans.finalAssignIvf(v, k = 9, iters = 2, nprobe = 3)
      .select("vec_id", "cluster", "dist2").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(pruned == exact)
  }

  test("IVF-pruned assignment at nprobe=2: valid, one-sided error, mostly equal") {
    val v = Similarity.scaled(spark, sf).select(col("vec_id"), col("ai"))
    val k = 16
    // iters=0 pins both sides to the SAME raw-seed centroids, so the
    // prune's error is one-sided per vector: it can only find a
    // same-or-farther centroid than the exact argmin
    val exact0 = KMeans.finalAssign(v, k, iters = 0)
      .select("vec_id", "cluster", "dist2").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    val pruned0 = KMeans.finalAssignIvf(v, k, iters = 0, nprobe = 2)
      .select("vec_id", "cluster", "dist2").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(pruned0.keySet == exact0.keySet, "every vector must be assigned")
    pruned0.foreach { case (id, (_, d)) =>
      val de = exact0(id)._2
      assert(d >= de, s"vec $id: pruned dist $d beats exact $de")
    }
    // after full pruned rounds, cluster IDS are nominal (the two runs'
    // centroids diverge), so the meaningful contract is partition
    // QUALITY: the pruned run's total quantization cost stays within a
    // small factor of exact Lloyd's
    val exactCost = KMeans.finalAssign(v, k, iters = 2)
      .agg(sum(col("dist2"))).collect()(0).getLong(0)
    val prunedCost = KMeans.finalAssignIvf(v, k, iters = 2, nprobe = 2)
      .agg(sum(col("dist2"))).collect()(0).getLong(0)
    assert(prunedCost.toDouble <= exactCost.toDouble * 1.5,
      s"pruned quantization cost $prunedCost vs exact $exactCost")
  }

  test("IVF probe budget re-targets past an EMPTY twin cell (the r10 fix)") {
    import spark.implicits._
    // K=5 ⇒ 3 coarse cells = the 3 smallest-md5(cid) centroids — for
    // cids 0..4 that is gi0=cid4, gi1=cid1, gi2=cid2 (md5 order
    // a87.. < c4c.. < c81..). vec1 ≡ vec4 makes gi0/gi1 DUPLICATE
    // coarse twins: both fines file under gi0 by the lower-index
    // tie-break, so cell gi1 is EMPTY (the ADVICE-r9 degenerate case).
    // Query 100 sits closer to the twin coordinate than to c2, so an
    // UNFILTERED nprobe=2 window is {gi0, gi1} — the empty twin wastes
    // a probe and the best reachable centroid is cid1 at d²=1600. The
    // non-empty filter re-targets the window to {gi0, gi2}, whose
    // fines include cid3 at d²=400 — strictly closer. Pre-round-10
    // code (no filter) returns (1, 1600) here and fails this test.
    def vec(x: Long) = Array(x, 0L, 0L, 0L)
    val v = Seq(
      0L -> vec(-50), 1L -> vec(0), 2L -> vec(100), 3L -> vec(60),
      4L -> vec(0), 100L -> vec(40)).toDF("vec_id", "ai")
    val got = KMeans.finalAssignIvf(v, k = 5, iters = 0, nprobe = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getLong(3))).toMap
    assert(got(100L) == ((3, 400L)),
      s"the empty twin cell must not consume a probe: $got")
    assert(got(1L) == ((1, 0L)) && got(4L) == ((1, 0L)),
      "twins sit on their shared centroid (min-cid tie-break)")
    assert(got.size == 6 && got.values.forall(_._2 >= 0L),
      "every vector assigned, no NULL best")
  }

  test("every vector is assigned and clusters are non-trivial") {
    val rows = KMeans.kmeans(spark, sf).collect()
    assert(rows.length == vectors.length)
    val sizes = rows.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    assert(sizes.keySet.subsetOf((0 until 8).toSet))
    assert(sizes.size > 1, "degenerate single-cluster result")
  }
}

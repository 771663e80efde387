package graft

import graft.functions.TopKAgg
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Partitioning/merge-order invariance of the bounded top-k Aggregator —
  * the property the whole "TopKAgg replaces row_number windows" design
  * rests on: Spark may split a group across any partitions and merge the
  * partial buffers in any order, and the result must not move. Property
  * inputs come from a FIXED ScalaCheck seed (deterministic CI), with
  * duplicated scores included so the id tie-break is exercised. */
class AggregatorPropSpec extends AnyFunSuite {

  private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private val pair: Gen[(Double, Long)] = for {
    // coarse scores force plenty of exact ties
    s <- Gen.chooseNum(0, 20).map(_ / 10.0)
    id <- Gen.chooseNum(0L, 500L)
  } yield (s, id)

  private val datasets: List[List[(Double, Long)]] =
    Gen.listOfN(60, Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, pair)))
      .pureApply(Gen.Parameters.default, Seed(7L))

  test("VectorSumAgg is invariant to partitioning and merge order") {
    val vec: Gen[Array[Long]] = Gen.listOfN(8, Gen.chooseNum(-1000L, 1000L)).map(_.toArray)
    val data = Gen.listOfN(30, Gen.chooseNum(1, 20).flatMap(n => Gen.listOfN(n, vec)))
      .pureApply(Gen.Parameters.default, Seed(11L))
    val rnd = new Random(17)
    data.foreach { vecs =>
      val agg = new graft.functions.VectorSumAgg(8)
      val expected = (0 until 8).map(i => vecs.map(_(i)).sum)
      for (_ <- 1 to 3) {
        val nChunks = 1 + rnd.nextInt(4)
        val shuffled = rnd.shuffle(vecs)
        val partials = rnd.shuffle((0 until nChunks).map(i =>
          shuffled.zipWithIndex.collect { case (x, j) if j % nChunks == i => x }
            .foldLeft(agg.zero)(agg.reduce)))
        val merged = partials.foldLeft(agg.zero)(agg.merge)
        assert(agg.finish(merged) == expected)
      }
    }
  }

  test("BitsetOrAgg equals the set-bit union regardless of partitioning") {
    val words = 4 // 256-bit filter for the property
    val posList: Gen[Seq[Long]] =
      Gen.listOfN(3, Gen.chooseNum(0L, words * 64L - 1)).map(_.toSeq)
    val data = Gen.listOfN(30, Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, posList)))
      .pureApply(Gen.Parameters.default, Seed(23L))
    val rnd = new Random(29)
    data.foreach { rows =>
      val agg = new graft.functions.BitsetOrAgg(words)
      val expected = {
        val bits = new Array[Long](words)
        rows.flatten.foreach(p => bits((p >>> 6).toInt) |= (1L << (p & 63)))
        bits.toSeq
      }
      for (_ <- 1 to 3) {
        val nChunks = 1 + rnd.nextInt(4)
        val shuffled = rnd.shuffle(rows)
        val partials = rnd.shuffle((0 until nChunks).map(i =>
          shuffled.zipWithIndex.collect { case (x, j) if j % nChunks == i => x }
            .foldLeft(agg.zero)(agg.reduce)))
        val merged = partials.foldLeft(agg.zero)(agg.merge)
        assert(agg.finish(merged).toSeq == expected,
          s"merge order changed the bitset for $rows")
      }
    }
  }

  test("TopKAgg result is invariant to partitioning and merge order") {
    val rnd = new Random(13)
    for (k <- Seq(1, 3, 5); data <- datasets) {
      val agg = new TopKAgg(k)
      val expected = data.sortWith(before).take(k)
      for (_ <- 1 to 4) {
        val shuffled = rnd.shuffle(data)
        val nChunks = 1 + rnd.nextInt(5)
        val chunks = (0 until nChunks)
          .map(i => shuffled.zipWithIndex.collect { case (x, j) if j % nChunks == i => x })
        val partials = rnd.shuffle(chunks.map(_.foldLeft(agg.zero)(agg.reduce)))
        val merged = partials.foldLeft(agg.zero)(agg.merge)
        assert(agg.finish(merged) == expected,
          s"k=$k nChunks=$nChunks: merge-order changed the top-k for $data")
      }
    }
  }

  test("MisraGriesAgg candidate guarantee holds under any partitioning and merge order") {
    val rnd = new Random(23)
    val chars = "abcdefghij"
    for (trial <- 1 to 40) {
      val k = 1 + rnd.nextInt(8)
      val n = 200 + rnd.nextInt(800)
      // geometric skew: 'a' drawn with p=1/2, 'b' 1/4, … — real heavies exist
      val stream = Seq.fill(n) {
        var i = 0
        while (i < chars.length - 1 && rnd.nextBoolean()) i += 1
        chars(i)
      }
      val trueCounts = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavies = trueCounts.collect { case (c, v) if v * k > n => c }.toSet
      // chop the stream into "documents" (spaces must be skipped)
      val docs = stream.mkString.grouped(1 + rnd.nextInt(20))
        .map(s => if (rnd.nextBoolean()) s + " " else s).toSeq
      val agg = new graft.functions.MisraGriesAgg(k)
      for (_ <- 1 to 3) {
        val shuffled = rnd.shuffle(docs)
        val nChunks = 1 + rnd.nextInt(5)
        val chunks = (0 until nChunks)
          .map(i => shuffled.zipWithIndex.collect { case (x, j) if j % nChunks == i => x })
        val partials = rnd.shuffle(chunks.map(_.foldLeft(agg.zero)(agg.reduce)))
        val cand = agg.finish(partials.foldLeft(agg.zero)(agg.merge))
          .map(_.head).toSet
        assert(cand.size <= k, s"trial $trial: summary exceeded $k counters")
        assert(heavies.subsetOf(cand),
          s"trial $trial k=$k n=$n: lost heavies ${heavies -- cand} (cand=$cand)")
      }
    }
  }

  test("MinByStrAgg matches min_by semantics on nulls and orders by code points") {
    val agg = new graft.functions.MinByStrAgg
    def run(rows: Seq[(String, java.lang.Long)]): java.lang.Long =
      agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    // all-null ordering keys → NULL, never a fabricated id (ADVICE r17)
    assert(run(Seq((null, 1L), (null, 2L))) == null)
    assert(run(Seq.empty) == null)
    // null-ord rows are ignored, like min_by
    assert(run(Seq((null, 9L), ("b", 2L), ("a", 1L))) == 1L)
    // a null id under the winning key returns NULL, not an NPE
    assert(run(Seq(("a", null), ("b", 2L))) == null)
    // code-point order (= UTF8String byte order), NOT UTF-16 code-unit
    // order: U+1F600 (surrogate pair D83D DE00) ranks ABOVE U+FFFD even
    // though its first UTF-16 unit is smaller
    assert(run(Seq(("😀", 1L), ("�", 2L))) == 2L)
    // tie on ord → smaller id, null id first — and merge-order invariant
    val rnd = new Random(29)
    val rows: Seq[(String, java.lang.Long)] =
      Seq(("k", 5L), ("k", 3L), ("a", null), ("a", 7L), (null, 0L), ("z", 1L))
    for (_ <- 1 to 20) {
      val shuffled = rnd.shuffle(rows)
      val nChunks = 1 + rnd.nextInt(4)
      val chunks = (0 until nChunks)
        .map(i => shuffled.zipWithIndex.collect { case (x, j) if j % nChunks == i => x })
      val partials = rnd.shuffle(chunks.map(_.foldLeft(agg.zero)(agg.reduce)))
      assert(agg.finish(partials.foldLeft(agg.zero)(agg.merge)) == null,
        "ord='a' wins and its null id must return NULL under any partitioning")
    }
  }

  test("MinByDoubleAgg matches min(struct).id semantics incl. NaN / -0.0 / ties") {
    val agg = new graft.functions.MinByDoubleAgg
    def run(rows: Seq[(java.lang.Double, java.lang.Long)]): java.lang.Long =
      agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    // empty / all-null ordering keys → NULL, never a fabricated id
    assert(run(Seq.empty) == null)
    assert(run(Seq((null, 1L), (null, 2L))) == null)
    // null-ord rows ignored; null id under the winning key → NULL
    assert(run(Seq((null, 9L), (2.0, 2L), (1.0, 1L))) == 1L)
    assert(run(Seq((1.0, null), (2.0, 2L))) == null)
    // Spark double ordering: NaN ranks LAST (not first, as raw
    // Double.compare-based sorts of (bits) would; nan-safe compare),
    // and -0.0 == 0.0 (so the winner among them is the LOWER id, which
    // java.lang.Double.compare would get wrong by ranking -0.0 first)
    assert(run(Seq((Double.NaN, 1L), (5.0, 2L))) == 2L)
    assert(run(Seq((Double.NaN, 1L), (null, 2L))) == 1L) // NaN beats empty
    assert(run(Seq((0.0, 9L), (-0.0, 7L), (0.0, 3L))) == 3L)
    // ties on ord → smallest id, and merge-order invariance
    val rnd = new Random(31)
    val rows: Seq[(java.lang.Double, java.lang.Long)] =
      Seq((3.5, 5L), (3.5, 3L), (-1.25, 8L), (-1.25, 7L), (null, 0L), (9.0, 1L))
    for (_ <- 1 to 20) {
      val shuffled = rnd.shuffle(rows)
      val nChunks = 1 + rnd.nextInt(4)
      val chunks = (0 until nChunks)
        .map(i => shuffled.zipWithIndex.collect { case (x, j) if j % nChunks == i => x })
      val partials = rnd.shuffle(chunks.map(_.foldLeft(agg.zero)(agg.reduce)))
      assert(agg.finish(partials.foldLeft(agg.zero)(agg.merge)) == 7L,
        "min ord -1.25 wins with its smallest id under any partitioning")
    }
  }

  test("MinByLongAgg matches min(struct).id semantics on longs") {
    val agg = new graft.functions.MinByLongAgg
    def run(rows: Seq[(java.lang.Long, java.lang.Long)]): java.lang.Long =
      agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    assert(run(Seq.empty) == null)
    assert(run(Seq((null, 1L), (null, 2L))) == null)
    assert(run(Seq((null, 9L), (2L, 2L), (1L, 1L))) == 1L)
    assert(run(Seq((1L, null), (2L, 2L))) == null)
    // negative ords order correctly; ties break to the smallest id
    assert(run(Seq((-5L, 4L), (3L, 1L), (-5L, 2L))) == 2L)
    // merge-order invariance over a tie-heavy fixture
    val rnd = new Random(37)
    val rows: Seq[(java.lang.Long, java.lang.Long)] =
      Seq((10L, 5L), (10L, 3L), (-7L, 8L), (-7L, 6L), (null, 0L), (90L, 1L))
    for (_ <- 1 to 20) {
      val shuffled = rnd.shuffle(rows)
      val nChunks = 1 + rnd.nextInt(4)
      val chunks = (0 until nChunks)
        .map(i => shuffled.zipWithIndex.collect { case (x, j) if j % nChunks == i => x })
      val partials = rnd.shuffle(chunks.map(_.foldLeft(agg.zero)(agg.reduce)))
      assert(agg.finish(partials.foldLeft(agg.zero)(agg.merge)) == 6L,
        "min ord -7 wins with its smallest id under any partitioning")
    }
  }
}

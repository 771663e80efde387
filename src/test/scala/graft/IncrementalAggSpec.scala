package graft

import org.apache.spark.sql.functions._
import graft.analytics.Relational

/** q117 incremental aggregate maintenance: state-merge refresh must
  * equal recompute-from-scratch for ANY base/delta split. */
class IncrementalAggSpec extends SparkSpec {

  private def recompute = Tables.lineitem(spark, sf)
    .groupBy(col("l_returnflag"), col("l_linestatus"))
    .agg(count(lit(1)).as("n"),
      Tables.toDouble(sum(Tables.dec(col("l_quantity"))), 2).as("sum_qty"),
      (Tables.toDouble(sum(Tables.dec(col("l_quantity"))), 2) /
        count(lit(1)).cast("double")).as("avg_qty"),
      min(col("l_shipdate")).as("min_ship"),
      max(col("l_shipdate")).as("max_ship"))

  test("refresh equals recompute at the default split") {
    assertSameRows(Relational.incrementalAgg(spark, sf), recompute)
  }

  test("refresh equals recompute at a different, untuned split (mod 3)") {
    assertSameRows(Relational.incrementalAgg(spark, sf, deltaMod = 3), recompute)
  }

  test("q124 basket pairs: total pair mass equals sum of per-basket C(k,2)") {
    val li = Tables.lineitem(spark, sf)
    val expected = li.select(col("l_orderkey"), (col("l_partkey") % 100).as("cat"))
      .distinct().groupBy("l_orderkey").count()
      .select((col("count") * (col("count") - 1) / 2).cast("long").as("pairs"))
      .agg(sum("pairs")).collect().head.getLong(0)
    val all = Relational.basketPairs(spark, sf, topK = 1000000)
    assert(all.agg(sum(col("n"))).collect().head.getLong(0) == expected)
    val top = Relational.basketPairs(spark, sf, topK = 10).collect()
    val ns = top.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("q126 association rules: metrics are the definitions, support pruned") {
    val minSup = 5L
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), (col("l_partkey") % 100).as("cat")).distinct()
    val nOrders = items.select("l_orderkey").distinct().count()
    val catCounts = items.groupBy("cat").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rules = Relational.assocRules(spark, sf, minSupport = minSup, topK = 1000000)
      .collect()
    assert(rules.nonEmpty)
    rules.foreach { r =>
      val (ca, cb, nab) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(nab >= minSup)
      assert(r.getDouble(3) == nab.toDouble / catCounts(ca))
      assert(r.getDouble(4) == (nab * nOrders).toDouble / (catCounts(ca) * catCounts(cb)))
    }
    // lift is symmetric: a→b and b→a carry the same lift (confidence differs)
    val byPair = rules.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    byPair.foreach { case ((a, b), l) =>
      byPair.get((b, a)).foreach(l2 => assert(l2 == l)) }
  }

  test("q125 RFM: segments partition the customer base") {
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    val rows = Relational.rfmSegments(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == nCust, "every customer lands in one segment")
    val labels = rows.map(_.getString(0)).toSet
    assert(labels.forall(_.matches("[Rr][Ff][Mm]")))
    assert(labels.size >= 2, "median splits must be non-trivial")
  }

  test("a key present only in the delta still lands in the refreshed state") {
    // mod 2 puts every even orderkey in the delta; verify both sides of
    // the full-outer merge contribute (counts from each slice sum to n)
    val li = Tables.lineitem(spark, sf)
    val even = li.filter(col("l_orderkey") % 2 === 0).count()
    val odd = li.filter(col("l_orderkey") % 2 =!= 0).count()
    val total = Relational.incrementalAgg(spark, sf, deltaMod = 2)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(total == even + odd)
  }
}

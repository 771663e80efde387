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

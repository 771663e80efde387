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

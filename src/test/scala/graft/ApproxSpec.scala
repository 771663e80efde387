package graft

import org.apache.spark.sql.functions._

/** Approximate-aggregate surface (HLL++ distinct counts, quantile
  * sketches): engine-specific sketch values can't be oracle-compared
  * against DuckDB, so the gate here is the published error bound against
  * the exact answer computed in the same engine. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct stays within its rsd bound") {
    val li = Tables.lineitem(spark, sf)
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx")).head
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.06, s"approx=$approx exact=$exact err=$err beyond 3x rsd")
  }

  test("approx_percentile brackets the exact interpolated percentile") {
    val li = Tables.lineitem(spark, sf)
    val row = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact_p50"),
      expr("approx_percentile(l_quantity, 0.5, 10000)").as("approx_p50"),
      min("l_quantity").as("lo"), max("l_quantity").as("hi")).head
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    val span = row.getDouble(3) - row.getDouble(2)
    assert(math.abs(approx - exact) <= span * 0.05,
      s"approx p50 $approx too far from exact $exact")
  }
}

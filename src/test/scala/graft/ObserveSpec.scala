package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Zero-extra-pass pipeline metrics via the Observation API — the
  * mechanism a production load would use to publish row counts and sums
  * for reconciliation without a second scan (the reference's per-stage
  * print/log equivalent, done right). */
class ObserveSpec extends SparkSpec {

  test("observe collects metrics in the same pass as the action") {
    val obs = Observation("load_stats")
    val df = Tables.orders(spark, sf)
      .observe(obs, count(lit(1)).as("n_rows"),
        sum(Tables.dec(col("o_totalprice"))).cast("double").as("total"),
        max(col("o_orderdate")).as("latest"))
      .filter(col("o_orderstatus") === "F")
    val filtered = df.count()
    val m = obs.get
    assert(m("n_rows") == 1500L, "metrics observe the pre-filter stream")
    assert(filtered < 1500L)
    assert(m("total").asInstanceOf[Double] > 0)
  }
}

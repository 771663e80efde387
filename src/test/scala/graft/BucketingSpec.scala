package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Shuffle-elimination and skew-mitigation evidence (SURVEY.md §4):
  * bucketed tables must co-locate an equi-join with NO exchange on
  * either side, and the salted join must be result-identical to the
  * plain join while spreading each key across `buckets` sub-keys. */
class BucketingSpec extends SparkSpec {

  test("bucketed saveAsTable co-locates the join: no shuffle exchange") {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val c = Tables.customer(spark, sf).select("c_custkey", "c_name")
    o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_orders_bucketed")
    c.write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_customer_bucketed")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val j = spark.table("graft_orders_bucketed")
        .join(spark.table("graft_customer_bucketed"),
          col("o_custkey") === col("c_custkey"))
      val p = j.queryExecution.executedPlan.toString()
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$p")
      assert(j.count() ==
        Tables.orders(spark, sf).join(Tables.customer(spark, sf),
          col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE graft_orders_bucketed")
      spark.sql("DROP TABLE graft_customer_bucketed")
    }
  }

  test("salted join is result-identical to the plain join") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderstatus"))
    val salted = Skew.saltedJoin(li, o, "l_orderkey", "o_orderkey",
      xxhash64(col("l_orderkey"), col("l_linenumber")), buckets = 8)
      .select("l_orderkey", "l_linenumber", "o_orderstatus")
    val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_orderstatus")
    assertSameRows(salted, plain)
  }

  test("salting spreads a key across buckets on the fact side") {
    val li = Tables.lineitem(spark, sf)
    val salts = li.filter(col("l_orderkey") === li.select(min("l_orderkey")).head.getLong(0))
      .select(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(8)).as("s"))
      .distinct().count()
    assert(salts >= 2, "a multi-row key should land in more than one salt bucket")
  }
}

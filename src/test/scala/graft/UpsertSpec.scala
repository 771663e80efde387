package graft

import graft.etl.Upsert
import org.apache.spark.sql.functions._

/** Idempotency of the ON CONFLICT re-expressions (SURVEY.md §5.3): the
  * reference's weekly re-run safety (`reference/README.md:132`) rests on
  * these properties. */
class UpsertSpec extends SparkSpec {

  private def existing = Tables.orders(spark, sf)
    .filter(col("o_orderkey") % 2 === 0)
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate"))

  private def incoming = Tables.orders(spark, sf)
    .filter(col("o_orderkey") % 3 === 0)
    .select(col("o_orderkey"), lit("R").as("o_orderstatus"),
      (col("o_totalprice") * 2).as("o_totalprice"), col("o_orderdate"))

  test("merge is idempotent: merging the same batch twice equals once") {
    val once = Upsert.merge(existing, incoming, "o_orderkey",
      staticCols = Seq("o_orderdate"), dynamicCols = Seq("o_orderstatus", "o_totalprice"))
    // re-merge the merged state with the same incoming batch
    val state = once.drop("op")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val twice = Upsert.merge(state, incoming, "o_orderkey",
      staticCols = Seq("o_orderdate"), dynamicCols = Seq("o_orderstatus", "o_totalprice"))
    assertSameRows(
      once.drop("op").select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"),
      twice.drop("op").select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"))
  }

  test("merge classifies rows: updated ∪ inserted ∪ kept partitions the keys") {
    val m = Upsert.merge(existing, incoming, "o_orderkey",
      staticCols = Seq("o_orderdate"), dynamicCols = Seq("o_orderstatus", "o_totalprice"))
    val byOp = m.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nExisting = existing.count()
    val nIncoming = incoming.count()
    val nBoth = existing.join(incoming, "o_orderkey", "left_semi").count()
    assert(byOp.getOrElse("updated", 0L) == nBoth)
    assert(byOp.getOrElse("inserted", 0L) == nIncoming - nBoth)
    assert(byOp.getOrElse("kept", 0L) == nExisting - nBoth)
    assert(m.count() == m.select("o_orderkey").distinct().count(), "key uniqueness")
  }

  test("insertIfAbsent is idempotent: second application adds nothing") {
    val add = Upsert.insertIfAbsent(existing, incoming, Seq("o_orderkey"))
    val newState = existing.unionByName(add)
    assert(Upsert.insertIfAbsent(newState, incoming, Seq("o_orderkey")).isEmpty)
    // and it never duplicates a key
    assert(newState.count() == newState.select("o_orderkey").distinct().count())
  }

  test("merge with fixed clock stamps only touched rows") {
    val clock = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val m = Upsert.mergeWithClock(
      existing.withColumn("last_updated", lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))),
      incoming, "o_orderkey",
      staticCols = Seq("o_orderdate"), dynamicCols = Seq("o_orderstatus", "o_totalprice"),
      clock = clock)
    val stamped = m.filter(col("last_updated") === lit(clock))
    val untouched = m.filter(col("last_updated") =!= lit(clock))
    assert(stamped.filter(col("op") === "kept").count() == 0)
    assert(untouched.filter(col("op") =!= "kept").count() == 0)
  }

  test("SCD2 merge: versions chain correctly and re-applying is a no-op") {
    val first = Upsert.scd2History(spark, sf)
    // every key has exactly one current row
    val perKey = first.groupBy(col("c_custkey"))
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_cur"))
    assert(perKey.filter(col("n_cur") =!= 1).count() == 0,
      "each key must have exactly one open version")
    // changed keys carry a closed old version stamped with the batch clock
    val clock = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    val closedNow = first.filter(col("valid_to") === lit(clock))
    assert(closedNow.count() > 0)
    closedNow.select("c_custkey").collect().map(_.getLong(0)).foreach { k =>
      assert(k % 5 == 0, s"only changed keys may close at the batch clock ($k)")
    }
    // idempotency: merging the SAME snapshot again changes nothing
    val incoming = first.filter(col("is_current")).select("c_custkey", "c_acctbal")
    val again = Upsert.scd2Merge(first.drop("is_current"), incoming,
      "c_custkey", Seq("c_acctbal"), clock)
      .withColumn("is_current", col("valid_to").isNull)
    assertSameRows(again, first)
  }
}

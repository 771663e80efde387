package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SortExec
import graft.ops.TemporalJoins

/** q100: the custom as-of join operator (logical node → strategy →
  * single-pass merge exec). */
class AsOfExecSpec extends SparkSpec {

  test("custom exec equals the union+window composition on real data") {
    val viaExec = TemporalJoins.asofJoinExec(spark, sf)
    val viaWindow = TemporalJoins.asofJoin(spark, sf)
    assertSameRows(viaExec, viaWindow)
  }

  test("physical plan: AsOfJoinExec present, exactly one exchange+sort per side") {
    // the repo-wide string-match pattern (PlanSpec): executedPlan.toString
    // renders through the AQE wrapper, where node collection would not
    val s = TemporalJoins.asofJoinExec(spark, sf).queryExecution.executedPlan.toString
    // TreeNode.nodeName strips the Exec suffix — the exec renders "AsOfJoin"
    assert(s.contains("AsOfJoin "), s"custom exec missing from plan:\n$s")
    val nEx = "Exchange hashpartitioning".r.findAllIn(s).length
    val nSort = "\\bSort \\[".r.findAllIn(s).length
    assert(nEx == 2, s"want 2 exchanges (one per side), got $nEx:\n$s")
    assert(nSort == 2, s"want 2 sorts (one per side), got $nSort:\n$s")
  }

  test("merge semantics on crafted rows: latest-at-or-before, ties, null padding") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // match: err at ts 10 (tie at equal ts counts)
      (2L, 100L, 25L), // match: latest of {10, 20}
      (3L, 200L, 5L),  // no error for user 200 before ts 5 → nulls
      (4L, 300L, 50L)  // user with no errors at all → nulls
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 11L, 10L), // user 100, err_id 11, ts 10
      (100L, 12L, 10L), // same ts tie → greater err_id wins
      (100L, 13L, 20L),
      (200L, 21L, 7L)   // after left ts 5 → must not match
    ).toDF("e_user", "err_id", "err_ts")
    val out = graft.plans.AsOf.join(left, right,
        "user_id", "e_user", "ts", "err_ts", rightTie = Seq("err_id"))
      .select("event_id", "err_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(1L -> 12L, 2L -> 13L, 3L -> -1L, 4L -> -1L), out.toString)
  }

  test("degenerate inputs: empty right pads all-null; empty left yields empty") {
    import spark.implicits._
    val left = Seq((1L, 10L, 5L), (2L, 20L, 7L)).toDF("event_id", "user_id", "ts")
    val right0 = Seq.empty[(Long, Long, Long)].toDF("e_user", "err_id", "err_ts")
    val allNull = graft.plans.AsOf.join(left, right0,
      "user_id", "e_user", "ts", "err_ts", rightTie = Seq("err_id")).collect()
    assert(allNull.length == 2 && allNull.forall(_.isNullAt(4)),
      s"empty right must null-pad every left row: ${allNull.mkString}")
    val left0 = Seq.empty[(Long, Long, Long)].toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 1L, 1L)).toDF("e_user", "err_id", "err_ts")
    assert(graft.plans.AsOf.join(left0, right,
      "user_id", "e_user", "ts", "err_ts").count() == 0)
  }

  test("duplicate left timestamps: each left row independently matches the same state") {
    import spark.implicits._
    val left = Seq((1L, 7L, 10L), (2L, 7L, 10L), (3L, 7L, 10L))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((7L, 91L, 9L), (7L, 92L, 10L)).toDF("e_user", "err_id", "err_ts")
    val out = graft.plans.AsOf.join(left, right,
        "user_id", "e_user", "ts", "err_ts", rightTie = Seq("err_id"))
      .select("event_id", "err_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 92L, 2L -> 92L, 3L -> 92L), out.toString)
  }

  test("left-column filters push below the as-of join to the scan") {
    val df = TemporalJoins.asofJoinExec(spark, sf).filter(col("user_id") < 10)
    val p = df.queryExecution.executedPlan.toString
    // the pushed predicate must reach the LEFT parquet scan's pushed
    // filters — without the custom rule it sits above the merge and the
    // full left side scans
    assert(p.contains("LessThan(user_id,10)"),
      s"user_id predicate must reach PushedFilters on the scan:\n$p")
    // semantics unchanged vs filtering the composed form
    assertSameRows(df, TemporalJoins.asofJoin(spark, sf).filter(col("user_id") < 10))
  }

  test("right/match-column filters stay above the join (not incorrectly pushed)") {
    val df = TemporalJoins.asofJoinExec(spark, sf).filter(col("err_id").isNotNull)
    assertSameRows(df,
      TemporalJoins.asofJoin(spark, sf).filter(col("err_id").isNotNull))
  }

  test("output preserves left partitioning contract (1:1 with left rows)") {
    val n = TemporalJoins.asofJoinExec(spark, sf).count()
    val nLeft = Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
    assert(n == nLeft, s"as-of left join must be 1:1 with left: $n vs $nLeft")
  }
}

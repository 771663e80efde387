package graft

import org.apache.spark.sql.functions._

/** q127 robust outlier profile: the distributed median/MAD pipeline must
  * agree exactly with a driver-side recomputation from first principles. */
class EventsOpsSpec extends SparkSpec {

  /** Interpolated median, the percentile()/quantile_cont definition:
    * linear interpolation at rank (n−1)·φ over the sorted values. */
  private def medianOf(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val pos = (s.length - 1) * 0.5
    val lo = s(pos.toInt)
    val hi = s(math.ceil(pos).toInt)
    lo + (pos - pos.toInt) * (hi - lo)
  }

  test("q127 equals a first-principles median/MAD recomputation") {
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
    val totals = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val byType = rows.filter(!_.isNullAt(1))
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).toSeq).toMap
    val got = graft.ops.Events.robustOutliers(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, xs) =>
      val med = medianOf(xs)
      val mad = medianOf(xs.map(x => math.abs(x - med)))
      val outliers = xs.count(x => math.abs(x - med) > 3.0 * mad)
      val (n, gmed, gmad, gout) = got(t)
      assert(n == totals(t), s"$t n")
      assert(gmed == med, s"$t med $gmed vs $med")
      assert(gmad == mad, s"$t mad $gmad vs $mad")
      assert(gout == outliers, s"$t outliers $gout vs $outliers")
    }
  }

  test("q132 cohort retention: diagonal complete, no pre-cohort activity") {
    val rows = graft.ops.Events.cohortRetention(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // nobody is active before their own cohort week
    rows.foreach { case (c, w, _) => assert(!w.before(c), s"$w before cohort $c") }
    // diagonal: every user is active in their first week, so the (c, c)
    // cell equals the cohort's size
    val cohortSizes = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("c"))
      .groupBy(col("c")).count().collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val diag = rows.filter { case (c, w, _) => c == w }
      .map { case (c, _, n) => c -> n }.toMap
    assert(diag == cohortSizes, "diagonal must equal cohort sizes")
    // total cell mass = distinct (user, week) pairs
    val userWeeks = Tables.events(spark, sf)
      .select(col("user_id"), date_trunc("week", col("ts"))).distinct().count()
    assert(rows.map(_._3).sum == userWeeks)
  }

  test("q127 outlier threshold knob widens monotonically") {
    val strict = graft.ops.Events.robustOutliers(spark, sf, k = 1.0).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    val loose = graft.ops.Events.robustOutliers(spark, sf, k = 5.0).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    strict.foreach { case (t, n1) => assert(loose(t) <= n1, s"$t not monotone") }
  }
}

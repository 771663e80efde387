package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE runtime re-planning evidence: with skew-join thresholds lowered,
  * a pathologically hot join key must be split across tasks at runtime
  * (the complement to the deterministic `ops.Skew.saltedJoin` for keys
  * that are NOT known in advance). */
class AqeSpec extends SparkSpec {

  test("AQE splits a skewed join partition at runtime") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      import spark.implicits._
      // 50k rows on ONE key + 5k spread keys, joined to a small dim
      val facts = spark.range(55000)
        .select(when(col("id") < 50000, 0L).otherwise(col("id") % 1000).as("k"),
          col("id").as("payload"))
      val dim = (0L until 1000L).toDF("k").withColumn("name", concat(lit("n"), col("k")))
      val joined = facts.join(dim, "k")
      // collect() executes THIS queryExecution (count() would build its
      // own), so the adaptive plan below reflects the actual run
      assert(joined.collect().length == 55000)
      val adaptive = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
      assert(adaptive.isDefined, "expected an AQE plan")
      val fin = adaptive.get.executedPlan.toString()
      assert(fin.contains("skew=true"), s"expected a skew-split join in:\n$fin")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge from a custom LogicalPlan to a DataFrame. Spark exposes
  * no public constructor for this (Dataset.ofRows is private[sql]), so the
  * supported third-party route is a plan-producing function registered
  * behind SparkSessionExtensions — or this: re-analyze the custom node via
  * a one-off wrapper. We keep it to a single reflective call against the
  * classic Dataset companion, isolated here so the rest of the codebase
  * stays on public API. */
object SqlShim {
  private lazy val ofRowsMethod = {
    val companion = Class.forName("org.apache.spark.sql.classic.Dataset$")
    val module = companion.getField("MODULE$").get(null)
    val m = companion.getMethods.find(m =>
      m.getName == "ofRows" && m.getParameterCount == 2).get
    (module, m)
  }

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame = {
    val (module, m) = ofRowsMethod
    m.invoke(module, spark, plan).asInstanceOf[DataFrame]
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession + helpers for all suites. One session per JVM
  * (suites run in the forked test JVM; Spark sessions are expensive). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  /** Fast-loop scale factor for data-driven specs. */
  val sf: String = "/root/testdata/sf0.001"

  /** Order-insensitive DataFrame equality on collected rows. */
  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    val ca = a.collect().toSeq.groupBy(identity).view.mapValues(_.size).toMap
    val cb = b.collect().toSeq.groupBy(identity).view.mapValues(_.size).toMap
    assert(ca == cb, s"row multisets differ: only-left=${(ca.keySet -- cb.keySet).take(3)} only-right=${(cb.keySet -- ca.keySet).take(3)}")
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS) — session conf, set at build
      // time like Verify/Bench do (loaders never mutate session conf)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

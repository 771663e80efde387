package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches. `approx_count_distinct` exists as a
  * built-in, but its HLL++ register layout is engine-private — useless
  * when the sketch itself must be STORED (a per-shard statistics file a
  * loader merges later) or recomputed bit-identically by another engine.
  * This is the portable construction: md5-derived registers any SQL
  * engine reproduces exactly, so the ORACLE checks the full register
  * table, not a tolerance band.
  *
  * Construction (Flajolet et al., "HyperLogLog", AofA 2007; p = 8,
  * m = 256 registers, stderr ≈ 1.04/√m ≈ 6.5%): value → 60-bit
  * md5-derived h; bucket = h mod m; rho = 1 + index of the lowest set
  * bit of w = h div m (trailing-zero count, computed branch-free as
  * bit_count((w & −w) − 1) + 1 — uniform bits make trailing and leading
  * geometrically identical, and this form needs no float log in either
  * engine); register r_b = max rho. Σ and max are what make it a
  * sketch: inserts commute, duplicates are free, and two sketches merge
  * by element-wise max (SketchSpec proves merge(A, B) = sketch(A ∪ B)).
  *
  * Scale shape: one groupBy over (group, bucket) with map-side partial
  * max — the shuffle carries ≤ groups × 256 rows regardless of input
  * size, the property that lets a 100 TB scan emit per-partition
  * sketches and reduce them centrally. */
object Sketches {

  private val P = 8
  private val M = 1 << P // 256 registers

  /** q101: per-returnflag HLL registers over lineitem order keys. */
  def hllRegisters(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), expr(
        "CAST(conv(substring(md5(CAST(l_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT)")
        .as("h"))
      .select(col("l_returnflag"), (col("h") % M).as("bucket"), expr(
        s"""CASE WHEN (h div $M) = 0 THEN 53
           |  ELSE bit_count(((h div $M) & -(h div $M)) - 1) + 1 END""".stripMargin)
        .as("rho"))
      .groupBy(col("l_returnflag"), col("bucket"))
      .agg(max(col("rho")).cast("int").as("r"))

  /** The raw-estimate functional of a register map (no small/large-range
    * correction — callers are in the mid range; absent buckets count as
    * rho 0). Exposed for specs and for loaders consuming stored
    * sketches. */
  def estimate(registers: Map[Int, Int]): Double = {
    val alpha = 0.7213 / (1 + 1.079 / M)
    val s = (0 until M).map(b => math.pow(2.0, -registers.getOrElse(b, 0))).sum
    alpha * M * M / s
  }

  val oracle: Map[String, String] = Map(
    "q101_hll_registers" ->
      s"""SELECT l_returnflag, bucket, CAST(max(rho) AS INT) AS r FROM (
         |  SELECT l_returnflag, h % $M AS bucket,
         |    CASE WHEN (h // $M) = 0 THEN 53
         |         ELSE bit_count(((h // $M) & -(h // $M)) - 1) + 1 END AS rho
         |  FROM (SELECT l_returnflag,
         |          CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS h
         |        FROM lineitem))
         |GROUP BY 1, 2""".stripMargin,
  )
}

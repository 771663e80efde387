package graft

import org.apache.spark.sql.functions._
import graft.ops.Maintenance

/** q112 snapshot diff + q113 z-order/stats pruning. */
class MaintenanceSpec extends SparkSpec {

  test("zval interleaves bits (a even positions, b odd)") {
    val rows = spark.range(1).select(
      Maintenance.zval(lit(1L), lit(0L)).as("z10"),
      Maintenance.zval(lit(0L), lit(1L)).as("z01"),
      Maintenance.zval(lit(3L), lit(3L)).as("z33"),
      Maintenance.zval(lit(65535L), lit(0L)).as("zamax"),
      Maintenance.zval(lit(0L), lit(65535L)).as("zbmax"))
      .collect().head
    assert(rows.getLong(0) == 1L)
    assert(rows.getLong(1) == 2L)
    assert(rows.getLong(2) == 15L)
    assert(rows.getLong(3) == 0x55555555L)
    assert(rows.getLong(4) == 0xAAAAAAAAL)
  }

  test("q113 pruned scan equals the full-scan filter AND skips files") {
    val pruned = Maintenance.zorderPrunedScan(spark, sf)
    val (read, total) = Maintenance.pruneStats.get()
    val full = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
      .filter(col("o_custkey").between(100, 299) &&
        col("o_orderdate").between(
          lit("1997-01-01").cast("timestamp"),
          lit("1997-12-31 23:59:59.999").cast("timestamp")))
    assertSameRows(pruned, full)
    assert(read >= 1, "pruning must keep at least one file for a non-empty box")
    assert(read < total, s"expected real file skipping, read $read of $total")
  }

  test("q113 pruning is correct at a different box (no tuned constants)") {
    val pruned = Maintenance.zorderPrunedScan(spark, sf,
      custLo = 30, custHi = 79, dayLo = "1999-03-01", dayHi = "2000-02-29")
    val full = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
      .filter(col("o_custkey").between(30, 79) &&
        col("o_orderdate").between(
          lit("1999-03-01").cast("timestamp"),
          lit("2000-02-29 23:59:59.999").cast("timestamp")))
    assertSameRows(pruned, full)
  }

  test("q113 a box entirely outside the data prunes every file and returns empty") {
    val pruned = Maintenance.zorderPrunedScan(spark, sf,
      custLo = 60000, custHi = 60100, dayLo = "2020-01-01", dayHi = "2020-12-31")
    assert(pruned.count() == 0)
    val (read, total) = Maintenance.pruneStats.get()
    assert(read == 0 && total > 0, s"expected total pruning, read $read of $total")
  }

  test("q130 integrity manifest detects mutation and duplication") {
    import spark.implicits._
    def manifest(df: org.apache.spark.sql.DataFrame) =
      Maintenance.integrityManifestOf(df).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
    val base = Seq((1L, "alpha", "s"), (2L, "beta", "s"), (3L, "gamma", "s"))
      .toDF("doc_id", "text", "source")
    val clean = manifest(base)
    // replicas with identical content agree
    assert(manifest(base.orderBy(org.apache.spark.sql.functions.desc("doc_id"))) == clean)
    // a one-character mutation moves both fingerprints' tuple
    val mutated = Seq((1L, "alphA", "s"), (2L, "beta", "s"), (3L, "gamma", "s"))
      .toDF("doc_id", "text", "source")
    assert(manifest(mutated)("s") != clean("s"))
    // a row duplicated an EVEN number of extra times cancels out of the
    // xor (h ^ h = 0) but not out of count/sum — why the manifest
    // carries all three fingerprints
    val dup = base.filter($"doc_id" === 2L)
    val doubled = base.unionAll(dup).unionAll(dup)
    val d = manifest(doubled)("s")
    assert(d._2 == clean("s")._2, "xor alone is blind to an even duplication")
    assert(d._1 != clean("s")._1 && d._3 != clean("s")._3,
      "count and sum must catch the duplication")
  }

  test("q112 classifications match the snapshot generators exactly") {
    val diff = Maintenance.snapshotDiff(spark, sf).collect()
    val keys = Tables.orders(spark, sf).select(col("o_orderkey"))
      .collect().map(_.getLong(0))
    val removed = keys.count(_ % 97 == 0)
    val added = keys.count(_ % 83 == 0)
    val changed = keys.count(k => k % 89 == 0 && k % 97 != 0)
    val byChange = diff.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byChange.getOrElse("removed", 0) == removed)
    assert(byChange.getOrElse("added", 0) == added)
    assert(byChange.getOrElse("changed", 0) == changed)
    assert(byChange.keySet == Set("removed", "added", "changed")
      .filter(byChange.getOrElse(_, 0) > 0))
    // changed rows carry both prices, exactly +1 apart
    diff.filter(_.getString(1) == "changed").foreach { r =>
      assert(r.getDouble(3) == r.getDouble(2) + 1.0)
    }
    // added rows are the offset re-inserts: no old price, key ≥ 10^9
    diff.filter(_.getString(1) == "added").foreach { r =>
      assert(r.isNullAt(2) && r.getLong(0) >= 1000000000L)
    }
  }
}

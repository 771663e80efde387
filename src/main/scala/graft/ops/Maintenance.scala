package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-lifecycle operators a long-lived 100 TB corpus store runs
  * between queries: snapshot differencing (the audit/CDC primitive that
  * answers "what changed since yesterday's load") and multi-dimensional
  * data clustering with file-statistics pruning (the layout-as-index
  * primitive that makes selective scans cheap without a real index).
  * Companions to q110's compaction in Sinks.scala.
  */
object Maintenance {

  /** q112: snapshot diff. Classifies every key of two table snapshots as
    * added / removed / changed (unchanged rows are dropped — at 100 TB
    * they are ~all rows, and emitting them would make the diff as large
    * as the table). The "next" snapshot is derived deterministically from
    * orders so the oracle can mirror it: keys ≡ 0 (mod 97) deleted, rows
    * ≡ 0 (mod 89) get +1.00 on the price (an exact double op), and keys
    * ≡ 0 (mod 83) re-enter with a 10^9 id offset as inserts.
    *
    * Scale shape: ONE full-outer sort-merge join on the key plus a
    * map-side null-safe column compare — no column is hashed or
    * collected. Snapshots of the same table are normally written with
    * the same bucketing/partitioning, which turns the join into a
    * storage-partitioned (zero-shuffle) merge; nothing here assumes it.
    */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val cur = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val nxt = nextSnapshot(cur)
    val a = cur.as("a")
    val b = nxt.as("b")
    a.join(b, col("a.o_orderkey") === col("b.o_orderkey"), "full_outer")
      .select(
        coalesce(col("a.o_orderkey"), col("b.o_orderkey")).as("o_orderkey"),
        when(col("b.o_orderkey").isNull, "removed")
          .when(col("a.o_orderkey").isNull, "added")
          .when(!(col("a.o_orderstatus") <=> col("b.o_orderstatus")) ||
                !(col("a.o_totalprice") <=> col("b.o_totalprice")), "changed")
          .as("change"),
        col("a.o_totalprice").as("old_price"),
        col("b.o_totalprice").as("new_price"))
      .filter(col("change").isNotNull)
  }

  /** The simulated day-2 snapshot (shared by query and spec). */
  private[graft] def nextSnapshot(cur: DataFrame): DataFrame =
    cur.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 89 === 0, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")))
      .unionAll(
        cur.filter(col("o_orderkey") % 83 === 0)
          .select((col("o_orderkey") + lit(1000000000L)).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice")))

  /** Morton/Z-value: bit-interleave the low 31 bits of two non-negative
    * keys (a in the even positions, b in the odd) — a 62-bit z-value, so
    * any key < 2^31 keeps full curve locality (TPC-H o_custkey is
    * 150k·sf: 16 bits would silently truncate past sf ≈ 0.4 and degrade
    * pruning; 2^31 covers every realistic sf, and epoch-day needs only
    * 16). Pure shift/mask arithmetic — codegen'd, no UDF; the OR-terms
    * fold into one whole-stage-codegen expression. */
  private[graft] def zval(a: Column, b: Column): Column =
    (0 until 31).map { i =>
      shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** q113: Z-order clustering + min-max file-statistics pruning — the
    * file-skipping story BEYOND directory partitioning (q83) and
    * row-group pushdown (PlanSpec): lay the table out along a Morton
    * curve of (o_custkey, order day), record per-FILE min/max of both
    * dimensions (a 2×2-number stats row per file — what a lakehouse
    * transaction log stores), and serve a 2-D box predicate by reading
    * ONLY the files whose stats rectangle intersects the box. Because
    * the Z-curve is local in BOTH dimensions, a 2-D box touches a small
    * set of contiguous curve ranges; a single-column sort would leave
    * every file's range on the non-sorted dimension as wide as the
    * table (ZOrderSpec measures exactly this).
    *
    * Driver-side work is METADATA-sized by design: the stats manifest
    * has one row per file and the pruning decision collects only the
    * surviving file list — the same driver/executor split every
    * stats-pruning table format uses. Correctness never depends on the
    * pruning: pruned files are provably predicate-free (their stats
    * rectangle misses the box), and the residual filter still runs on
    * the survivors; the oracle is the plain full-scan filter. */
  def zorderPrunedScan(spark: SparkSession, dir: String,
                       nFiles: Int = 16,
                       custLo: Long = 100, custHi: Long = 299,
                       dayLo: String = "1997-01-01", dayHi: String = "1997-12-31"
                      ): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
    val path = graft.Tables.tmpPath(spark, "graft_zorder/orders")
    // epoch-day second dimension (16 bits ≈ 179 years; custkey gets 31)
    val day = datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
    o.withColumn("z", zval(col("o_custkey"), day))
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .drop("z")
      .write.mode("overwrite").parquet(path)
    // per-file stats manifest: one listing-sized aggregate (file, mins, maxs)
    val back = spark.read.schema(o.schema).parquet(path)
    val stats = back
      .groupBy(input_file_name().as("file"))
      .agg(min(col("o_custkey")).as("c_lo"), max(col("o_custkey")).as("c_hi"),
        min(col("o_orderdate")).as("d_lo"), max(col("o_orderdate")).as("d_hi"))
    // the timestamp bounds, in the SAME session-tz cast semantics the
    // residual filter uses (a JVM-local-tz parse here could disagree with
    // the UTC session and wrongly prune a matching file)
    val tsLo = lit(dayLo).cast("timestamp")
    val tsHi = lit(s"$dayHi 23:59:59.999").cast("timestamp")
    // one manifest job, keep-filter pushed BELOW the collect: the driver
    // receives only surviving file names (at ~10⁶ files the full manifest
    // would be the memory hazard, the kept subset rarely is); the total
    // comes from the driver's existing file listing, not a second job
    val keep = stats
      .filter(col("c_lo") <= custHi && col("c_hi") >= custLo &&
        col("d_lo") <= tsHi && col("d_hi") >= tsLo)
      .select(col("file"))
      .collect().map(_.getString(0))
    pruneStats.set((keep.length, back.inputFiles.length)) // observability for the specs
    if (keep.isEmpty) // a box matching no file reads nothing at all
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], o.schema)
    else
      spark.read.schema(o.schema).parquet(keep.toIndexedSeq: _*)
        .filter(col("o_custkey").between(custLo, custHi) &&
          col("o_orderdate").between(tsLo, tsHi))
  }

  /** (files read, files total) of the last zorderPrunedScan on this
    * thread — lets the spec assert real skipping without re-listing. */
  private[graft] val pruneStats = new ThreadLocal[(Int, Int)]

  /** q130: table integrity manifest — the replication/migration
    * verification primitive: per partition (source), the row count, two
    * ORDER-INSENSITIVE content fingerprints (bit_xor and exact-decimal
    * sum of a 60-bit md5 row hash — xor alone is blind to duplicated
    * pairs, the sum catches them, together they pin multiset identity
    * for any realistic drift), and the key range. Two tables replicate
    * correctly iff their manifests match — compared as two tiny tables,
    * never by rereading either side. Everything combines map-side; the
    * shuffle carries one row per (partition × task). */
  def integrityManifest(spark: SparkSession, dir: String): DataFrame =
    integrityManifestOf(Tables.documents(spark, dir))

  private[graft] def integrityManifestOf(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("doc_id"),
        // 60-bit hash for the xor fingerprint; a 40-bit slice for the
        // sum fingerprint so Σ over ≤ 2^23 (8.4M) rows per partition
        // stays under 2^63 — an exact BIGINT in both engines (a wider
        // sum would force HUGEINT/DECIMAL(38) whose client types
        // diverge, and non-ANSI Spark would wrap int64 silently where
        // DuckDB widens — the engines would diverge loudly at scale)
        expr("CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', text)), 1, 15), 16, 10) AS BIGINT)")
          .as("h"),
        expr("CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', text)), 1, 10), 16, 10) AS BIGINT)")
          .as("h40"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(h)").as("xor_fp"),
        sum(col("h40")).as("sum_fp"),
        min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))

  val oracle: Map[String, String] = Map(
    "q130_integrity_manifest" ->
      """SELECT source, count(*) AS n_docs,
        |  bit_xor(h) AS xor_fp,
        |  CAST(sum(h40) AS BIGINT) AS sum_fp,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM (SELECT source, doc_id,
        |        CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15) AS BIGINT) AS h,
        |        CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 10) AS BIGINT) AS h40
        |      FROM documents)
        |GROUP BY 1""".stripMargin,
    "q112_snapshot_diff" ->
      """WITH cur AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |nxt AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice + 1.0e0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM cur WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 1000000000, o_orderstatus, o_totalprice
        |  FROM cur WHERE o_orderkey % 83 = 0)
        |SELECT coalesce(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |  CASE WHEN b.o_orderkey IS NULL THEN 'removed'
        |       WHEN a.o_orderkey IS NULL THEN 'added'
        |       WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |         OR a.o_totalprice IS DISTINCT FROM b.o_totalprice THEN 'changed'
        |  END AS change,
        |  a.o_totalprice AS old_price, b.o_totalprice AS new_price
        |FROM cur a FULL OUTER JOIN nxt b ON a.o_orderkey = b.o_orderkey
        |WHERE CASE WHEN b.o_orderkey IS NULL THEN 'removed'
        |           WHEN a.o_orderkey IS NULL THEN 'added'
        |           WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |             OR a.o_totalprice IS DISTINCT FROM b.o_totalprice THEN 'changed'
        |      END IS NOT NULL""".stripMargin,
    "q113_zorder_prune" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |WHERE o_custkey BETWEEN 100 AND 299
        |  AND o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
        |                      AND TIMESTAMP '1997-12-31 23:59:59.999'""".stripMargin,
  )
}

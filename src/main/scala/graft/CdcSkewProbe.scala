package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: PLANTED-SKEW stage probe for the q154 heavy-hitter
  * guard (VERDICT r18 item 1's "done" evidence).
  *
  * `runMain graft.CdcSkewProbe <srcSfDir> <workDir> <outFile>
  *   [plantEvery=10] [repeats=12]`
  *
  * Builds a skewed twin of `srcSfDir`'s documents table in `workDir`:
  * every `plantEvery`-th doc's text is replaced by one CDC-stable
  * 8-token unit repeated `repeats` times — the unit is SEARCHED so that
  * no interior token pair anchors and the wrap pair does, making every
  * repeat one chunk with ONE shared fingerprint. At the defaults that
  * fingerprint owns ~20% of all chunk rows (10% of docs × 12 rows each
  * vs ~5.5 rows/doc natural) — the corpus-hot regime the r18 verdict
  * flagged (a boilerplate chunk owning a constant doc fraction).
  *
  * Then stage-probes BOTH arms on the planted corpus, min-of-2 warm,
  * in one window (the comparison is arm-to-arm, so the host-speed
  * constant cancels):
  *  - `window`  — guard OFF (`hotMinOcc = -1`): the r18 pure-window
  *    shape, where the hot fp's entire row mass lands in ONE reduce
  *    partition of the fp exchange (expect max/med >> 1 there);
  *  - `guarded` — the SHIPPING q154 path (`cdcChunks`, auto guard:
  *    sampled detection → exact broadcast counts → full-width salt),
  *    where no partition owns more than ~1/w of the hot fp (expect
  *    max/med ~ 1 on every major stage).
  *
  * The probe requires the auto guard to actually engage (corpus width
  * must exceed the session width — run at sf100 scale, not sf10) and
  * records both arms' per-stage max/med, spill, and bytes. */
object CdcSkewProbe {
  /** An 8-token unit whose interior pairs never anchor and whose wrap
    * pair (last, first) does — searched deterministically with the
    * operator's own boundary rule so "S × repeats" chunks to `repeats`
    * identical fingerprints. */
  private[graft] def stableUnit(d: Int): Seq[String] = {
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def anchors(a: String, b: String): Boolean =
      java.lang.Long.parseLong(md5hex(s"$a $b").take(15), 16) % d == 0
    val pool = (0 until 4096).map(i => s"hh$i")
    // greedy from each pool rotation: append tokens that never anchor
    // after the current tail, until an 8-token unit whose WRAP pair
    // anchors shows up (expected ~d rotations at P[anchor] = 1/d)
    pool.indices.iterator.map { off =>
      val p = pool.drop(off) ++ pool.take(off)
      val buf = scala.collection.mutable.ArrayBuffer(p.head)
      val it = p.iterator.drop(1)
      while (buf.size < 8 && it.hasNext) {
        val t = it.next()
        if (!anchors(buf.last, t)) buf += t
      }
      buf.toSeq
    }.find { u =>
      u.size == 8 && anchors(u.last, u.head) &&
        u.sliding(2).forall(pr => !anchors(pr(0), pr(1)))
    }.getOrElse(sys.error(s"no CDC-stable unit found for d=$d"))
  }

  def main(args: Array[String]): Unit = {
    val srcSfDir = args(0)
    val workDir = args(1)
    val outFile = if (args.length > 2) args(2) else "CDC_SKEW_PROBE.json"
    val plantEvery = if (args.length > 3) args(3).toInt else 10
    val repeats = if (args.length > 4) args(4).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuning.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = 8
    val unit = stableUnit(d)
    val planted = (1 to repeats).flatMap(_ => unit).mkString(" ")
    val docs = Tables.documents(spark, srcSfDir)
      .withColumn("text",
        when(col("doc_id") % plantEvery === 0, lit(planted))
          .otherwise(col("text")))
    // mode=overwrite below DELETES the target first — refuse to point it
    // at the source corpus being read (ADVICE r19: workDir == srcSfDir
    // would destroy the only copy of a scale corpus mid-scan)
    require(java.nio.file.Paths.get(workDir).toAbsolutePath.normalize !=
      java.nio.file.Paths.get(srcSfDir).toAbsolutePath.normalize,
      s"workDir must differ from srcSfDir ($srcSfDir): the probe overwrites workDir/documents.parquet")
    val docsPath = s"$workDir/documents.parquet"
    docs.write.mode("overwrite").parquet(docsPath)

    val width = {
      // same sizing the shipping entry uses, read from the planted dir
      val p = new org.apache.hadoop.fs.Path(docsPath)
      val bytes = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getContentSummary(p).getLength
      math.max(cpus.toInt, (bytes * 4 / (64L << 20)).toInt)
    }
    require(width > cpus.toInt,
      s"auto guard would not engage (width $width <= session $cpus) — " +
        "run the probe at a corpus scale where the straggler regime exists (sf100)")

    val rec = new StageRecorder(spark.sparkContext)
    def probeArm(name: String, df: => DataFrame): (String, Double, Seq[String]) = {
      var probedSec = 0.0
      (1 to 2).foreach { i =>
        if (i == 2) { rec.quiesce(); rec.clear() }
        val t0 = System.nanoTime()
        Bench.runFully(df)
        val t = (System.nanoTime() - t0) / 1e9
        if (i == 2) { rec.quiesce(); probedSec = t }
        spark.catalog.clearCache()
      }
      System.err.println(f"CDC_SKEW_PROBE arm=$name probed=$probedSec%.1f")
      (name, probedSec, rec.jsonRows())
    }

    val loadBefore = Bench.loadAvg()
    val arms = Seq(
      probeArm("window", graft.ops.Curation.cdcChunksOf(
        Tables.documents(spark, workDir), d, width, hotMinOcc = -1L)),
      probeArm("guarded", graft.ops.Curation.cdcChunks(spark, workDir, d)))
    val armsJson = arms.map { case (n, s, rows) =>
      f""""$n":{"probed_run_sec":$s%.2f,"stages":[${rows.mkString(",")}]}"""
    }.mkString(",")
    val json =
      f"""{"metric":"cdc_skew_probe","src":"$srcSfDir","work":"$workDir","cpus":$cpus,"plant_every":$plantEvery,"repeats":$repeats,"width":$width,"quiesce_timeout":${rec.quiesceTimeout},"calib_med_map_task_s":${rec.medianHeavyStageTaskSec}%.2f,"loadavg_before":$loadBefore,"loadavg_after":${Bench.loadAvg()},"arms":{$armsJson}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), json)
    println(json)
    spark.stop()
  }
}

package graft

import java.util.concurrent.ConcurrentLinkedQueue
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev utility: executed-plan operator-smell sweep over EVERY
  * execution each query triggers — including the eager-checkpoint
  * internals the declared-plan sweep cannot see.
  *
  * `runMain graft.ExecutedSweep <sfDir> [outFile]`
  *
  * Why this exists (r18): `Explain --plan-only` greps the DECLARED
  * physical plan, but a query that truncates lineage with an eager
  * `localCheckpoint` declares only a post-checkpoint Scan — q87's
  * per-subspace struct-min, q97/q176's per-round join+agg, q54's
  * star-contraction rounds all execute during query CONSTRUCTION and
  * never appear in `df.explain`. This tool registers a
  * [[QueryExecutionListener]] (every `Dataset.withAction` — count,
  * collect, checkpoint — reports its QueryExecution on success), runs
  * each `SparkEntry.queries` entry fully, and greps the FINAL
  * executed plan of every captured execution for the three smells the
  * plan sweeps police: SortAggregate, CartesianProduct,
  * BroadcastNestedLoopJoin. Output is one JSON line with per-query
  * execution/smell counts and library totals.
  *
  * Scope notes, honestly stated:
  *  - the listener bus is ASYNC — after each query the tool quiesces
  *    (polls until no new events for 300 ms, 10 s cap) before
  *    attributing captured executions to the query; a `leftover`
  *    count records any stragglers attributed to the NEXT query.
  *  - streaming micro-batches do not report through
  *    QueryExecutionListener; the streaming queries' batch-side
  *    executions (source prep, result readout) still do.
  *  - BroadcastNestedLoopJoin is counted, not failed: the library's
  *    34 singleton-stat-row joins are the intended keyless-1-row
  *    pattern (SURVEY §21.3); the per-query counts let a reviewer
  *    diff against that known population. */
object ExecutedSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = if (args.length > 1) args(1) else "EXECSWEEP.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tuning.tune(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val captured = new ConcurrentLinkedQueue[(String, String)]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        // executedPlan here is the FINAL plan (AQE has run by success
        // time), so ReusedExchange / SMJ→SHJ conversions are visible
        captured.add(funcName -> qe.executedPlan.toString)
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })

    def quiesce(): Unit = {
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      var last = -1
      var stableSince = System.nanoTime()
      while (System.nanoTime() < deadline &&
        (captured.size != last || System.nanoTime() - stableSince < 300L * 1000 * 1000)) {
        if (captured.size != last) { last = captured.size; stableSince = System.nanoTime() }
        Thread.sleep(50)
      }
    }

    def drain(): Seq[(String, String)] = {
      val b = Seq.newBuilder[(String, String)]
      var e = captured.poll()
      while (e != null) { b += e; e = captured.poll() }
      b.result()
    }

    val smells = Seq("SortAggregate", "CartesianProduct", "BroadcastNestedLoopJoin")
    def count(hay: String, needle: String): Int =
      hay.sliding(needle.length).count(_ == needle)

    // warmup (codegen/classload) — drained, not attributed
    Bench.runFully(SparkEntry.queries("q21_dedup_exact")(spark, sfDir))
    quiesce(); drain()

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val leftoverBefore = captured.size
      Bench.runFully(fn(spark, sfDir))
      quiesce()
      val execs = drain()
      val counts = smells.map(s => s -> execs.map(e => count(e._2, s)).sum).toMap
      println(f"$name%-34s execs=${execs.size}%3d " +
        smells.map(s => s"${s.take(4).toLowerCase}=${counts(s)}").mkString(" "))
      (name, execs.size, leftoverBefore, counts)
    }

    val totals = smells.map(s => s -> rows.map(_._4(s)).sum).toMap
    val json = rows.map { case (n, e, lo, c) =>
      s""""$n":{"executions":$e,"leftover_at_start":$lo,""" +
        smells.map(s => s""""$s":${c(s)}""").mkString(",") + "}"
    }.mkString(
      s"""{"metric":"executed_sweep","sf":"$sfDir","queries":${rows.size},""" +
        smells.map(s => s""""total_$s":${totals(s)}""").mkString(",") + ""","per_query":{""",
      ",", "}}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes("UTF-8"))
    println(json.take(500))
    println(s"TOTALS: " + smells.map(s => s"$s=${totals(s)}").mkString(" "))
    spark.stop()
  }
}

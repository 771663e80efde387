package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

import scala.collection.mutable

/** Misra-Gries frequent-items summary (Misra & Gries 1982; mergeability
  * per Agarwal et al., "Mergeable Summaries", PODS 2012 §3) over the
  * CHARACTER stream of its string inputs — `k` counters in fixed memory
  * regardless of stream length or key cardinality.
  *
  * Guarantee carried through merges: any item with true count
  * > N/(k+1) has a positive counter in the final summary (each
  * decrement event retires k+1 occurrences, so undercount ≤ N/(k+1)),
  * which makes the summary a PROVABLE candidate superset for the
  * "count > N/k" heavy-hitter predicate — the caller recounts the ≤ k
  * candidates exactly and the sketch never appears in the answer.
  *
  * Each `reduce` consumes a whole document (one row in, length(text)
  * stream updates inside the loop) — the per-row explode a relational
  * formulation would need never materializes. Merge sums two summaries
  * and, when over k counters, subtracts the (k+1)-th largest combined
  * count from all (the PODS'12 merge), restoring the bound. Spaces are
  * skipped: the stream is the corpus's non-space characters.
  */
class MisraGriesAgg(val k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k >= 1, "counter budget must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], text: String): Map[String, Long] = {
    val m = mutable.Map.empty[String, Long] ++= buf
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c != ' ') {
        val s = c.toString
        m.get(s) match {
          case Some(v) => m.update(s, v + 1)
          case None if m.size < k => m.update(s, 1L)
          case None =>
            // decrement-all, drop zeros; the arriving item is not inserted
            val dead = mutable.ArrayBuffer.empty[String]
            m.foreach { case (key, v) =>
              if (v == 1L) dead += key else m.update(key, v - 1)
            }
            dead.foreach(m.remove)
        }
      }
      i += 1
    }
    m.toMap
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = mutable.Map.empty[String, Long] ++= a
    b.foreach { case (key, v) => sum.update(key, sum.getOrElse(key, 0L) + v) }
    if (sum.size <= k) sum.toMap
    else {
      val d = sum.values.toArray.sortBy(-_).apply(k) // (k+1)-th largest
      sum.iterator.collect { case (key, v) if v > d => key -> (v - d) }.toMap
    }
  }

  override def finish(buf: Map[String, Long]): Seq[String] =
    buf.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}

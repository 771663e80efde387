package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Bounded top-k accumulator for (score, id) pairs, ordered score DESC then
  * id ASC — a typed `Aggregator`, so Spark runs it with partial (map-side)
  * aggregation: each input partition reduces to a ≤k-element buffer before
  * the shuffle, and the exchange carries at most k rows per (group ×
  * partition) instead of the whole corpus per group. This replaces the
  * `row_number() OVER (PARTITION BY q)` top-k, whose window partition
  * materializes ALL n candidate rows of a query in one task — the
  * difference between O(k) and O(n) per-query shuffle volume at 100 TB.
  *
  * Determinism: total order (score DESC, id ASC), so the result is
  * independent of partitioning and merge order.
  */
class TopKAgg(val k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  /** "a ranks strictly before b" — score desc, id asc. */
  private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && before(buf.last, in)) buf // common case: not in top-k, O(1)
    else (buf :+ in).sortWith(before).take(k)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(before).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

/** [[TopKAgg]] for MULTISET inputs where every duplicate of an (score,
  * id) pair is bit-identical (the q187 case: a candidate pair emits one
  * scored row per shared band, all with the SAME exact-integer cosine):
  * exact tuple-dedup inside the bounded buffer makes
  * `groupBy.agg(topkDistinct)` equal to `distinct → groupBy.agg(topk)`
  * WITHOUT the distinct's full-stream exchange — the scored rows
  * aggregate where the join produces them (the q155 r13f lesson) and
  * only ≤k-row buffers ever shuffle. The early drop of a row ranking
  * strictly below a full buffer's last entry is dedup-safe: a duplicate
  * of anything in the buffer never ranks strictly below the last
  * (equal entries are not `before` each other). */
class TopKDistinctAgg(k: Int) extends TopKAgg(k) {
  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && beforeLast(buf, in)) buf
    else (buf :+ in).distinct.sortWith(beforeOrd).take(k)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).distinct.sortWith(beforeOrd).take(k)

  private def beforeOrd(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def beforeLast(buf: Seq[(Double, Long)], in: (Double, Long)): Boolean =
    beforeOrd(buf.last, in)
}

package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Deterministic arg-min over a STRING ordering key: the id whose
  * (ord, id) pair is lexicographically smallest — a typed `Aggregator`
  * replacement for `min_by(id, ord)` on corpus-sized streams.
  *
  * Why not the built-in: `min_by`'s declarative buffer carries the
  * ordering value itself, and a STRING buffer attribute is not
  * UnsafeRow-mutable, so Catalyst silently plans **SortAggregate** —
  * which sorts the whole input stream by group key in every partition,
  * map-side AND reduce-side (verified on q90's physical plan; the same
  * execution-mode class as the r16 Curation `min(struct)` fix, which
  * this sweep found one spelling of still alive). A typed aggregator
  * runs through ObjectHashAggregateExec instead: hash-mode partial
  * aggregation with a bounded one-pair buffer, nothing corpus-sized
  * ever sorts (graft.Tuning raises the 128-key sort fallback; past the
  * raised bound the fallback still guards, degrading to exactly the
  * sort the built-in always paid).
  *
  * Determinism: total order (ord ASC, id ASC) — unlike `min_by`, which
  * picks an arbitrary id among tied ordering keys. At the call sites
  * (q90/q93/q161) ord = md5(doc_id), so ties don't arise; the total
  * order is defense in depth. */
class MinByStrAgg extends Aggregator[(String, Long), (String, Long), Long] {

  /** "a ranks strictly before b" — ord asc, id asc; null ord = empty. */
  private def before(a: (String, Long), b: (String, Long)): Boolean =
    b._1 == null ||
      (a._1 != null && (a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)))

  override def zero: (String, Long) = (null, 0L)

  override def reduce(buf: (String, Long), in: (String, Long)): (String, Long) =
    if (in._1 != null && before(in, buf)) in else buf

  override def merge(a: (String, Long), b: (String, Long)): (String, Long) =
    if (before(a, b)) a else b

  override def finish(buf: (String, Long)): Long = buf._2

  override def bufferEncoder: Encoder[(String, Long)] =
    ExpressionEncoder[(String, Long)]()

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

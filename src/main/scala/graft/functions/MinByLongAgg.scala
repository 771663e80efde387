package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Deterministic arg-min over a LONG ordering key: the id whose
  * (ord, id) pair is smallest — [[MinByDoubleAgg]]'s integer sibling,
  * for the `min(struct(longOrd, id))` argmin sites (q87's per-subspace
  * PQ encoding: integer-exact squared distances ordered with ties to
  * the lowest centroid id, the oracle's row_number over (d, c_id)).
  *
  * Same contract as the siblings: a (boxed) pair buffer runs in
  * hash-mode ObjectHashAggregate where the declarative struct-min's
  * non-mutable buffer planned SortAggregate; null ordering keys are
  * IGNORED (an all-null group and a null winning id finish to NULL —
  * this DIVERGES from `min(struct(ord, id))`, which ranks a null
  * field first and would let a null-ord row win; call sites rely on
  * non-null ords); total order (ord ASC, id ASC NULLS FIRST). Long
  * ordering has no NaN/-0.0 subtleties — plain signed comparison
  * matches Spark. */
class MinByLongAgg extends Aggregator[(java.lang.Long, java.lang.Long),
    (java.lang.Long, java.lang.Long), java.lang.Long] {

  /** id tie-break: ASC, null first (a total order, so ties cannot make
    * the result partitioning-dependent). */
  private def idLt(a: java.lang.Long, b: java.lang.Long): Boolean =
    (a == null && b != null) || (a != null && b != null && a.longValue < b.longValue)

  /** "a ranks strictly before b" — ord asc, id asc; null ord = empty. */
  private def before(a: (java.lang.Long, java.lang.Long),
                     b: (java.lang.Long, java.lang.Long)): Boolean =
    b._1 == null || (a._1 != null &&
      (a._1.longValue < b._1.longValue ||
        (a._1.longValue == b._1.longValue && idLt(a._2, b._2))))

  override def zero: (java.lang.Long, java.lang.Long) = (null, null)

  override def reduce(buf: (java.lang.Long, java.lang.Long),
                      in: (java.lang.Long, java.lang.Long)): (java.lang.Long, java.lang.Long) =
    if (in._1 != null && before(in, buf)) in else buf

  override def merge(a: (java.lang.Long, java.lang.Long),
                     b: (java.lang.Long, java.lang.Long)): (java.lang.Long, java.lang.Long) =
    if (before(a, b)) a else b

  /** NULL for an all-null-ord group and for a null winning id. */
  override def finish(buf: (java.lang.Long, java.lang.Long)): java.lang.Long =
    if (buf._1 == null) null else buf._2

  override def bufferEncoder: Encoder[(java.lang.Long, java.lang.Long)] =
    ExpressionEncoder[(java.lang.Long, java.lang.Long)]()

  override def outputEncoder: Encoder[java.lang.Long] = Encoders.LONG
}

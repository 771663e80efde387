package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Deterministic arg-min over a DOUBLE ordering key: the id whose
  * (ord, id) pair is smallest — the [[MinByStrAgg]] pattern for the
  * per-group argmax/argmin slivers spelled `min(struct(ord, id))`.
  *
  * Why not the struct min: a StructType buffer attribute is not
  * UnsafeRow-mutable, so the declarative `min(struct(…))` falls out of
  * HashAggregate into SortAggregate — the r16/r17 execution-mode class
  * that sorts the whole input stream per aggregation (q129's
  * cluster-sliver argmax was the last such site left by the r17 sweep;
  * retired r18). This typed Aggregator's (Double, Long) buffer runs in
  * ObjectHashAggregate hash mode — per-group state is one boxed pair,
  * and past `Tuning.ObjectAggFallbackKeys` groups per partition the
  * sort fallback still guards (degrading to exactly the sort the
  * struct min always paid).
  *
  * Semantics match `min(struct(ord, id)).id` for NON-NULL ordering
  * keys under Spark's double ordering, and DIVERGE on null ord (the
  * same divergence [[MinByStrAgg]] documents vs `min_by`):
  *  - doubles compare nan-safe (NaN ranks LAST and equals itself;
  *    -0.0 equals 0.0) — `Utils.nanSafeCompareDoubles` semantics, NOT
  *    `java.lang.Double.compare` (which ranks -0.0 below 0.0);
  *  - rows whose ordering key is null are IGNORED; a group with no
  *    non-null ordering key finishes to NULL (never a fabricated id).
  *    The struct min ranks a null FIELD first, so `min(struct(ord,
  *    id))` would let a null-ord row WIN its group — call sites must
  *    either guarantee non-null ords or coalesce the ord to an
  *    explicit worst/best sentinel (q129 maps null quality to
  *    +Infinity ord so null-quality members lose, matching its
  *    oracle's NULLS-LAST `ORDER BY quality DESC`);
  *  - a null id under the winning ordering key is returned as NULL.
  *
  * Determinism: total order (ord ASC, id ASC NULLS FIRST) — at the
  * call site (q129) ties on ord break to the lowest doc_id, exactly
  * the oracle's `row_number() OVER (ORDER BY quality DESC, doc_id)`. */
class MinByDoubleAgg extends Aggregator[(java.lang.Double, java.lang.Long),
    (java.lang.Double, java.lang.Long), java.lang.Long] {

  /** Spark's nan-safe double comparison: NaN > everything, NaN = NaN,
    * -0.0 = 0.0. */
  private def cmp(a: Double, b: Double): Int =
    if (a < b) -1
    else if (a > b) 1
    else {
      val an = a.isNaN; val bn = b.isNaN
      if (an && bn) 0 else if (an) 1 else if (bn) -1 else 0
    }

  /** id tie-break: ASC, null first (a total order, so ties cannot make
    * the result partitioning-dependent). */
  private def idLt(a: java.lang.Long, b: java.lang.Long): Boolean =
    (a == null && b != null) || (a != null && b != null && a.longValue < b.longValue)

  /** "a ranks strictly before b" — ord asc, id asc; null ord = empty. */
  private def before(a: (java.lang.Double, java.lang.Long),
                     b: (java.lang.Double, java.lang.Long)): Boolean =
    b._1 == null || (a._1 != null && {
      val c = cmp(a._1.doubleValue, b._1.doubleValue)
      c < 0 || (c == 0 && idLt(a._2, b._2))
    })

  override def zero: (java.lang.Double, java.lang.Long) = (null, null)

  override def reduce(buf: (java.lang.Double, java.lang.Long),
                      in: (java.lang.Double, java.lang.Long)): (java.lang.Double, java.lang.Long) =
    if (in._1 != null && before(in, buf)) in else buf

  override def merge(a: (java.lang.Double, java.lang.Long),
                     b: (java.lang.Double, java.lang.Long)): (java.lang.Double, java.lang.Long) =
    if (before(a, b)) a else b

  /** NULL for an all-null-ord group and for a null winning id. */
  override def finish(buf: (java.lang.Double, java.lang.Long)): java.lang.Long =
    if (buf._1 == null) null else buf._2

  override def bufferEncoder: Encoder[(java.lang.Double, java.lang.Long)] =
    ExpressionEncoder[(java.lang.Double, java.lang.Long)]()

  override def outputEncoder: Encoder[java.lang.Long] = Encoders.LONG
}

package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Deterministic arg-min over a STRING ordering key: the id whose
  * (ord, id) pair is smallest — a typed `Aggregator` replacement for
  * `min_by(id, ord)` on corpus-sized streams.
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
  * Semantics match `min_by(id, ord)` (ADVICE r17 items 1–2):
  *  - ordering compares Unicode CODE POINTS, which for well-formed
  *    strings is exactly UTF8String's unsigned-byte order (UTF-8 is
  *    code-point-order-preserving) — NOT Java's UTF-16 code-unit
  *    order, which ranks supplementary-plane characters differently;
  *  - rows whose ordering key is null are ignored; a group with no
  *    non-null ordering key finishes to NULL (never a fabricated id);
  *  - a null id under the winning ordering key is returned as NULL,
  *    not an NPE (boxed input/output encoders).
  *
  * Determinism: total order (ord ASC, id ASC NULLS FIRST) — unlike
  * `min_by`, which picks an arbitrary id among tied ordering keys. At
  * the call sites (q90/q93/q161) ord = md5 hex of a non-null PK, so
  * neither ties nor nulls arise; the total order and null handling are
  * defense in depth. */
class MinByStrAgg extends Aggregator[(String, java.lang.Long),
    (String, java.lang.Long), java.lang.Long] {

  /** Code-point lexicographic a < b — equals UTF-8 unsigned-byte order
    * (UTF8String / DuckDB collation) for well-formed strings. */
  private def cpLt(a: String, b: String): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(i)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
    }
    a.length < b.length
  }

  /** id tie-break: ASC, null first (a total order, so ties cannot make
    * the result partitioning-dependent). */
  private def idLt(a: java.lang.Long, b: java.lang.Long): Boolean =
    (a == null && b != null) || (a != null && b != null && a.longValue < b.longValue)

  /** "a ranks strictly before b" — ord asc, id asc; null ord = empty. */
  private def before(a: (String, java.lang.Long), b: (String, java.lang.Long)): Boolean =
    b._1 == null ||
      (a._1 != null && (cpLt(a._1, b._1) || (a._1 == b._1 && idLt(a._2, b._2))))

  override def zero: (String, java.lang.Long) = (null, null)

  override def reduce(buf: (String, java.lang.Long),
                      in: (String, java.lang.Long)): (String, java.lang.Long) =
    if (in._1 != null && before(in, buf)) in else buf

  override def merge(a: (String, java.lang.Long),
                     b: (String, java.lang.Long)): (String, java.lang.Long) =
    if (before(a, b)) a else b

  /** NULL for an all-null-ord group and for a null winning id — what
    * min_by returns — instead of the r17 0L sentinel. */
  override def finish(buf: (String, java.lang.Long)): java.lang.Long =
    if (buf._1 == null) null else buf._2

  override def bufferEncoder: Encoder[(String, java.lang.Long)] =
    ExpressionEncoder[(String, java.lang.Long)]()

  override def outputEncoder: Encoder[java.lang.Long] = Encoders.LONG
}

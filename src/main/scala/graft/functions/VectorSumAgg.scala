package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Element-wise sum of fixed-length Long vectors — a typed `Aggregator`
  * (SURVEY.md §2.8: the one custom-UDAF-shaped need of the extension
  * operators). Used for SimHash bit-count accumulation (Dedup) and usable
  * for IVF centroid accumulation.
  *
  * Partial aggregation applies: Spark merges per-partition buffers
  * map-side, so the shuffle carries one 64-long buffer per (group ×
  * partition), not one row per token — the property that makes SimHash a
  * single cheap shuffle at 100 TB.
  */
class VectorSumAgg(val dim: Int)
    extends Aggregator[Array[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](dim)

  // Array[Long] (not Seq) on the input side: the encoder decodes the
  // array<bigint> column to a primitive array, avoiding 64 boxed Longs
  // per input row
  override def reduce(buf: Array[Long], in: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { buf(i) += in(i); i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dim) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

/** Bitset-OR accumulator: every input row contributes a small list of bit
  * POSITIONS; the aggregate is the union bitset, packed into `words`
  * 64-bit longs. A typed `Aggregator`, so Spark runs it with partial
  * (map-side) aggregation: each input partition reduces to one
  * fixed-size `words`-long buffer before the shuffle, and the exchange
  * carries `words * 8` bytes per partition REGARDLESS of input row count
  * — the construction step of a Bloom filter (Bloom, CACM 1970) as a
  * single distributed aggregate, no driver-side sketch assembly.
  *
  * Positions must lie in [0, words * 64); the constructor-fixed width
  * keeps merge O(words) and the result broadcastable.
  */
class BitsetOrAgg(val words: Int)
    extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
  require(words > 0, "bitset width must be positive")

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(buf: Array[Long], in: Seq[Long]): Array[Long] = {
    val it = in.iterator
    while (it.hasNext) {
      val p = it.next()
      buf((p >>> 6).toInt) |= (1L << (p & 63))
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

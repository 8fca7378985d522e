package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The k smallest DISTINCT-ranked long ids per group, as a bounded typed
  * Aggregator — [[TopKAggregator]] specialized to the unscored min-id
  * case (the domain-cap gate): the input is ONE primitive long (no
  * score/tuple row to encode), the buffer one primitive long array (the
  * cheapest partial/final wire format Spark has), so the per-row cost is
  * a branch against the current k-th value and the exchange carries at
  * most k longs per group per map task.
  *
  * The buffer is kept ascending-sorted. Rows >= the k-th smallest (the
  * steady state once a group's buffer fills) return the buffer UNCHANGED
  * — no allocation on the hot path.
  */
class MinKLongsAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], id: Long): Array[Long] = {
    val n = buf.length
    if (n == k && id >= buf(n - 1)) return buf
    // binary search for the insertion point (first index with value > id)
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) <= id) lo = mid + 1 else hi = mid
    }
    val out = new Array[Long](math.min(n + 1, k))
    System.arraycopy(buf, 0, out, 0, lo)
    if (lo < out.length) {
      out(lo) = id
      System.arraycopy(buf, lo, out, lo + 1, out.length - lo - 1)
    }
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      if (j >= b.length || (i < a.length && a(i) <= b(j))) {
        out(o) = a(i); i += 1
      } else {
        out(o) = b(j); j += 1
      }
      o += 1
    }
    out
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

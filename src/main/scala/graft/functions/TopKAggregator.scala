package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Top-k per group as a typed Aggregator with a bounded buffer — the
  * scale alternative to the `row_number() <= k` window idiom: a window
  * sorts EVERY row of every group (full shuffle of the table, then a
  * per-partition sort), while this aggregate's partial/final two-phase
  * split combines map-side, so the shuffle carries at most k (score, id)
  * pairs per group per map task, and nothing ever sorts more than the
  * k-sized buffers. At 100 TB "top 3 per brand" shuffles kilobytes
  * instead of the fact table.
  *
  * Ordering is (score DESC, id ASC) — the id tiebreak makes the result
  * deterministic under any partitioning and lets an external engine
  * (the window-idiom DuckDB oracle) reproduce it exactly.
  *
  * The buffer is a plain sorted Vector (descending): k is small by
  * contract (a top-*k* report), so insertion cost is bounded and the
  * all-product buffer stays on the UnsafeRow fast path; a heap would win
  * only for k in the thousands, where a window is the better tool anyway.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {
  require(k > 0, "k must be positive")

  // (score, id) ranks before (score', id') when score > score', or
  // scores tie and id < id'. Double.compare is the IEEE-754 total order
  // (NaN greater than every value, matching Spark's sort ordering), so
  // NaN scores rank deterministically instead of failing both > and ==
  // and making the result arrival-order-dependent.
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean = {
    val cmp = java.lang.Double.compare(a._1, b._1)
    cmp > 0 || (cmp == 0 && a._2 < b._2)
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(buf: Seq[(Double, Long)],
      row: (Double, Long)): Seq[(Double, Long)] = {
    if (buf.size == k && !beats(row, buf.last)) buf
    else {
      val i = buf.indexWhere(beats(row, _)) match {
        case -1 => buf.size
        case n => n
      }
      ((buf.take(i) :+ row) ++ buf.drop(i)).take(k)
    }
  }

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(reduce)

  /** Ids in rank order (the scores are reproducible from the input; a
    * caller needing them joins back by id).
    */
  override def finish(buf: Seq[(Double, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

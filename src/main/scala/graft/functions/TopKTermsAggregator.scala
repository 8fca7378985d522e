package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Top-k (score-micros, term) pairs per group with a bounded buffer —
  * [[TopKAggregator]] with a STRING payload instead of a long id, for
  * ranking tails whose unit is a vocabulary term rather than a
  * document. The motivating case is significant-terms mining: the
  * per-query candidate set is every distinct term co-occurring in the
  * query's match set, which at corpus scale is the corpus VOCABULARY —
  * a `sort_array(collect_list(...))` fold materializes all of it in one
  * aggregation buffer on one reducer, while this aggregator's
  * partial/final split keeps every buffer at k entries and ships at
  * most k pairs per group per map task.
  *
  * Ordering is (micros DESC, term ASC) — exact integer scores plus the
  * lexicographic tiebreak make the result deterministic under any
  * partitioning and replayable by the window-idiom DuckDB oracle.
  * finish() returns the pairs themselves in rank order (unlike
  * [[TopKAggregator]] the payload is not re-joinable by id, so the
  * scores travel with it).
  */
class TopKTermsAggregator(k: Int)
    extends Aggregator[(Long, String), Seq[(Long, String)],
      Seq[(Long, String)]] {
  require(k > 0, "k must be positive")

  // (micros, term) ranks before (micros', term') when micros >
  // micros', or they tie and term sorts first in UTF-8 byte order.
  // Code-point comparison == UTF-8 byte order; JVM String.compareTo
  // is UTF-16 code-unit order, which diverges above the BMP (e.g.
  // U+10000 vs U+FFFF), and the DuckDB oracle sorts UTF-8 bytes.
  private def utf8Less(a: String, b: String): Boolean = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    i >= a.length && j < b.length // strict prefix sorts first
  }

  private def beats(a: (Long, String), b: (Long, String)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && utf8Less(a._2, b._2))

  override def zero: Seq[(Long, String)] = Vector.empty

  override def reduce(buf: Seq[(Long, String)],
      row: (Long, String)): Seq[(Long, String)] = {
    if (buf.size == k && !beats(row, buf.last)) buf
    else {
      val i = buf.indexWhere(beats(row, _)) match {
        case -1 => buf.size
        case n => n
      }
      ((buf.take(i) :+ row) ++ buf.drop(i)).take(k)
    }
  }

  override def merge(a: Seq[(Long, String)],
      b: Seq[(Long, String)]): Seq[(Long, String)] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[(Long, String)]): Seq[(Long, String)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Long, String)]]()

  override def outputEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Long, String)]]()
}

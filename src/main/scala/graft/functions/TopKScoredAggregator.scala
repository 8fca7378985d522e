package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** [[TopKAggregator]] that RETURNS the scores with the ids — for
  * consumers whose downstream math needs the top-k scores themselves
  * (margin-based bitext mining averages a vector's top-k neighborhood
  * sims), where a re-join by id would recompute every kept cosine.
  * Scores are exact integer micros (the caller rounds before the
  * aggregate), so ordering and the returned pairs are deterministic
  * under any partitioning and replayable by the window-idiom DuckDB
  * oracle. Ordering (micros DESC, id ASC); bounded k-sized buffer
  * through the partial/final split like every TopK* aggregator here.
  */
class TopKScoredAggregator(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(k > 0, "k must be positive")

  private def beats(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Long, Long)] = Vector.empty

  override def reduce(buf: Seq[(Long, Long)],
      row: (Long, Long)): Seq[(Long, Long)] = {
    if (buf.size == k && !beats(row, buf.last)) buf
    else {
      val i = buf.indexWhere(beats(row, _)) match {
        case -1 => buf.size
        case n => n
      }
      ((buf.take(i) :+ row) ++ buf.drop(i)).take(k)
    }
  }

  override def merge(a: Seq[(Long, Long)],
      b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Long, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Long, Long)]]()
}

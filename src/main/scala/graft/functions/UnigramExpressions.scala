package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM (SentencePiece-posture) Viterbi segmentation with an
  * embedded `(piece, logp)` vocabulary — the OTHER production tokenizer
  * family beside BPE: each word is split into the vocabulary pieces
  * maximizing the sum of piece log-probabilities (the Viterbi path of
  * the unigram language model), instead of BPE's greedy merge order.
  *
  * Scores are integer MICRO-log-probs (`Long`), so the DP is exact
  * integer arithmetic and the DuckDB oracle replays the identical path:
  * `best[i] = max over j of best[j] + logp(word[j..i))`, candidates
  * scanned j ascending with strictly-greater comparison — ties keep the
  * SMALLEST j (the longest piece), the same `(score desc, j asc)` rule
  * the oracle's `list_min`-over-argmax implements. A position no
  * vocabulary piece ends at falls back to a single-character UNK piece
  * with `unkMicros` (harshly negative), so every word is segmentable.
  *
  * One eval segments a whole word array (the [[WordShingles]]
  * CodegenFallback amortization argument: the vocabulary map is built
  * once per expression instance, not per row). Character indexing is
  * UTF-16, matching the oracle's code-point `substr` for BMP text —
  * the ASCII corpora this battery scores; non-BMP corpora would need
  * code-point stepping (the [[TopKTermsAggregator]] UTF-8 discipline).
  *
  * Map-only; at 100 TB this rides the scan like the BPE encoder does.
  */
case class UnigramSegment(child: Expression, vocab: Seq[(String, Long)],
    unkMicros: Long, maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {

  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
  require(vocab.nonEmpty, "vocabulary must be non-empty")
  require(vocab.map(_._1).distinct.length == vocab.length,
    "vocabulary pieces must be unique")
  require(vocab.forall(p => p._1.nonEmpty && p._1.length <= maxPieceLen),
    "every piece must be 1..maxPieceLen chars")

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("score_micros", LongType, nullable = false)))

  override def prettyName: String = "unigram_segment"

  @transient private lazy val vmap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, lp) => m.put(p, java.lang.Long.valueOf(lp)) }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val out = new java.util.ArrayList[AnyRef]()
    var total = 0L
    var wi = 0
    while (wi < words.numElements()) {
      val w = words.getUTF8String(wi).toString
      val n = w.length
      if (n > 0) {
        val best = new Array[Long](n + 1)
        val back = new Array[Int](n + 1)
        var i = 1
        while (i <= n) {
          var bs = Long.MinValue
          var bj = -1
          var j = math.max(0, i - maxPieceLen)
          while (j < i) {
            val lp = vmap.get(w.substring(j, i))
            // ascending j + strictly-greater keeps the smallest j on
            // ties — the longest piece, the oracle's argmax rule
            if (lp ne null) {
              val s = best(j) + lp.longValue
              if (bj == -1 || s > bs) { bs = s; bj = j }
            }
            j += 1
          }
          if (bj == -1) { bs = best(i - 1) + unkMicros; bj = i - 1 }
          best(i) = bs
          back(i) = bj
          i += 1
        }
        total += best(n)
        // backtrace, then emit in order
        val rev = new java.util.ArrayList[String]()
        var p = n
        while (p > 0) { rev.add(w.substring(back(p), p)); p = back(p) }
        var k = rev.size() - 1
        while (k >= 0) { out.add(UTF8String.fromString(rev.get(k))); k -= 1 }
      }
      wi += 1
    }
    InternalRow(new GenericArrayData(
      out.toArray[AnyRef](new Array[AnyRef](out.size()))), total)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

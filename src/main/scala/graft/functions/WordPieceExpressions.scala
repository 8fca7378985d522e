package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece segmentation (the BERT tokenizer family) with an embedded
  * vocabulary — the THIRD production tokenizer beside BPE
  * ([[graft.functions.Bpe]]) and unigram-LM ([[UnigramSegment]]): each
  * word is split by GREEDY LONGEST-MATCH-FIRST — at every position take
  * the longest vocabulary piece that matches, where pieces at word-
  * interior positions carry the `contPrefix` marker (`##` in BERT); if
  * NO piece matches at some position, the WHOLE word collapses to the
  * single `unkToken` (BERT's all-or-nothing rule, unlike unigram's
  * per-character fallback).
  *
  * The algorithm is pure string matching — no scores — so the DuckDB
  * oracle replays it exactly with a recursive CTE over distinct words
  * (longest match = `list_max` over the lengths whose candidate piece
  * is in the vocabulary; the all-or-nothing rule via a failed flag).
  *
  * One eval segments a whole word array (the [[WordShingles]]
  * CodegenFallback amortization argument: the vocabulary set is built
  * once per expression instance, not per row). Character indexing is
  * UTF-16, matching the oracle's `substr` for BMP text — the ASCII
  * corpora this battery scores.
  *
  * Map-only; at 100 TB this rides the scan like the other two encoders.
  */
case class WordPieceSegment(child: Expression, vocab: Seq[String],
    contPrefix: String, unkToken: String, maxPieceLen: Int)
    extends UnaryExpression with CodegenFallback {

  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
  require(vocab.nonEmpty, "vocabulary must be non-empty")
  require(contPrefix.nonEmpty, "contPrefix must be non-empty")
  require(vocab.distinct.length == vocab.length,
    "vocabulary pieces must be unique")
  require(vocab.forall { p =>
    val body = if (p.startsWith(contPrefix)) p.drop(contPrefix.length) else p
    body.nonEmpty && body.length <= maxPieceLen
  }, "every piece body must be 1..maxPieceLen chars")
  require(!vocab.contains(unkToken), "unkToken must not be a vocab piece")

  override def dataType: DataType = StructType(Seq(
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("n_unk_words", LongType, nullable = false)))

  override def prettyName: String = "wordpiece_segment"

  @transient private lazy val vset: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val out = new java.util.ArrayList[AnyRef]()
    var unkWords = 0L
    var wi = 0
    while (wi < words.numElements()) {
      val w = words.getUTF8String(wi).toString
      val n = w.length
      if (n > 0) {
        val acc = new java.util.ArrayList[String]()
        var start = 0
        var failed = false
        while (start < n && !failed) {
          // longest-match-first: scan candidate lengths descending so
          // the first hit IS the greedy choice
          var l = math.min(maxPieceLen, n - start)
          var hit: String = null
          while (l >= 1 && (hit eq null)) {
            val cand =
              if (start == 0) w.substring(0, l)
              else contPrefix + w.substring(start, start + l)
            if (vset.contains(cand)) hit = cand else l -= 1
          }
          if (hit eq null) failed = true
          else { acc.add(hit); start += l }
        }
        if (failed) {
          out.add(UTF8String.fromString(unkToken))
          unkWords += 1L
        } else {
          var k = 0
          while (k < acc.size()) {
            out.add(UTF8String.fromString(acc.get(k))); k += 1
          }
        }
      }
      wi += 1
    }
    InternalRow(new GenericArrayData(
      out.toArray[AnyRef](new Array[AnyRef](out.size()))), unkWords)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

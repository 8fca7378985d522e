package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of an `array<string>` in first-occurrence order
  * — semantically `array_distinct(transform(sequence(0, size-n), i ->
  * concat_ws(' ', w[i], ..., w[i+n-1])))`, replaced by one imperative loop.
  *
  * The higher-order form is the dedup pipeline's hot projection and is
  * evaluated interpreted (no codegen for lambda functions): measured at
  * sf0.1 it made the explode stage ~40x slower than the same arrays built
  * here (12.6 s -> 0.3 s for 52k shingles), and q27 spent 20+ of its 23 s in
  * it. One eval per row against O(words * n) work amortizes the
  * CodegenFallback call overhead, same as [[MinHashSignature]].
  *
  * Inputs shorter than n yield an empty array (callers pre-filter).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements() - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = words.getUTF8String(i + j); j += 1 }
      seen.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray[AnyRef](new Array[AnyRef](seen.size())))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

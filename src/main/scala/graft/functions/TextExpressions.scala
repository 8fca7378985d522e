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

/** Per-document n-gram repetition statistics of an `array<string>` word
  * column: `struct<n_grams, distinct_grams, top_count>` over the
  * POSITIONAL (non-distinct) n-gram multiset — the inputs of the
  * Gopher-style repetition quality gates (duplicate-n-gram fraction,
  * top-n-gram share), which flag the boilerplate-looping documents an
  * LLM pipeline drops.
  *
  * Repetition is a per-document function, so this is deliberately ONE
  * map-only expression instead of the explode → groupBy(doc, gram) →
  * re-aggregate plan (two shuffles carrying every gram of the corpus; at
  * 100 TB that shuffle IS the job). One hash map per row, one eval per
  * row (the [[WordShingles]] CodegenFallback amortization argument).
  *
  * Inputs shorter than n words yield (0, 0, 0) — callers pre-filter.
  */
case class RepetitionStats(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "gram width must be >= 1")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("distinct_grams", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements() - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Int](m * 2)
    val space = UTF8String.fromString(" ")
    var top = 0
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = words.getUTF8String(i + j); j += 1 }
      val c = counts.merge(UTF8String.concatWs(space, parts: _*), 1, _ + _)
      if (c > top) top = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m.toLong, counts.size.toLong, top.toLong))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** POSITIONAL k-gram fingerprints of an `array<string>` token column:
  * element i is the [[HashFamilies.md5Long]] of the k-gram starting at
  * token i, rendered as a 16-hex-char string (= `substr(md5(gram), 1, 16)`,
  * the same oracle-replicable encoding [[WinnowFingerprints]] uses). Unlike
  * [[WordShingles]] the output is NOT distinct and keeps positional order,
  * so `posexplode` recovers (position, fingerprint) — the input of
  * duplicate-SPAN detection, where overlap merging needs the positions.
  *
  * Semantically `transform(sequence(0, size-k), i ->
  * substring(md5(concat_ws(' ', slice(w, i+1, k))), 1, 16))`, replaced by
  * one imperative loop for the same reason as [[WordShingles]]: the
  * higher-order form evaluates interpreted per element and dominated the
  * dedup pipeline when measured.
  *
  * Inputs shorter than k tokens yield an empty array.
  */
case class GramFingerprints(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "gram width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "gram_fingerprints"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val m = words.numElements() - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val space = UTF8String.fromString(" ")
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = words.getUTF8String(i + j); j += 1 }
      val h = HashFamilies.md5Long(UTF8String.concatWs(space, parts: _*))
      out(i) = UTF8String.fromString(f"$h%016x")
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing (MOSS) fingerprints of an `array<string>` token column:
  * positional k-gram hashes, minimum per sliding window of `win`, distinct
  * in first-occurrence order, rendered as 16-hex-char strings (the first 8
  * bytes of md5 — [[HashFamilies.md5Long]] — so the DuckDB oracle
  * recomputes the identical selection; fixed-width lowercase hex compares
  * lexicographically exactly like the unsigned numeric hash).
  *
  * Semantically `array_distinct(transform(sequence(1, nGrams-win+1),
  * j -> array_min(slice(gramHashes, j, win))))` over
  * `transform(sequence(0, n-k), i -> substring(md5(concat_ws(' ', ...)), 1, 16))`
  * — but the higher-order chain evaluates interpreted per ELEMENT and
  * recomputes each window min from scratch (O(nGrams * win) comparisons
  * plus lambda dispatch); this loop hashes each gram once and keeps a
  * monotone deque for O(nGrams) total window minima, one eval per row
  * (same CodegenFallback amortization argument as [[WordShingles]]).
  *
  * Inputs shorter than win+k-1 tokens yield an empty array.
  */
case class WinnowFingerprints(child: Expression, k: Int, win: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "gram width must be >= 1")
  require(win >= 1, "window width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[ArrayData]
    val n = words.numElements()
    val nGrams = n - k + 1
    if (n < k + win - 1) return new GenericArrayData(Array.empty[Any])

    val space = UTF8String.fromString(" ")
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = words.getUTF8String(i + j); j += 1 }
      hashes(i) = HashFamilies.md5Long(UTF8String.concatWs(space, parts: _*))
      i += 1
    }

    // monotone deque of indices: front is always the window minimum
    // (unsigned compare = fixed-width-hex string compare); popping equal
    // values keeps the later index, which never changes the min VALUE
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new Array[Int](nGrams)
    var head = 0
    var tail = 0
    var idx = 0
    while (idx < nGrams) {
      while (tail > head &&
          java.lang.Long.compareUnsigned(hashes(dq(tail - 1)), hashes(idx)) >= 0)
        tail -= 1
      dq(tail) = idx
      tail += 1
      if (dq(head) <= idx - win) head += 1
      if (idx >= win - 1) seen.add(hashes(dq(head)))
      idx += 1
    }

    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) {
      out(o) = UTF8String.fromString(f"${it.next().longValue()}%016x")
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

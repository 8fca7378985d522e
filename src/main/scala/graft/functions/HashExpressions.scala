package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Deterministic hash families used by the dedup operators (SURVEY §2.6
  * north-star extensions). Both expressions are per-row, allocation-light
  * imperative loops — the alternative (nested `transform`/`aggregate`
  * higher-order functions) re-walks the token array k (resp. 64) times and
  * builds a lambda frame per element, which does not survive a 100x scale-up.
  * CodegenFallback is acceptable here: each evaluates once per row against
  * O(tokens) work, so the interpreted-call overhead is amortized (unlike the
  * per-pair hot path of [[CosineSimilarity]], which gets real codegen).
  */
object HashFamilies {
  /** Mersenne prime 2^31-1: `a*h+b` stays well inside Long for a,b,h < 2^31. */
  val Prime: Long = 2147483647L

  /** Deterministic (a, b) coefficient pairs via a fixed LCG — no
    * `Math.random`, reproducible across runs and engines.
    */
  def coefficients(k: Int, seed: Long): Array[(Long, Long)] = {
    var s = seed
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 33) % (Prime - 1) + 1 }
    Array.fill(k)((next(), next()))
  }
}

/** MinHash signature: `array<string>` shingles -> `array<long>` of k minimums
  * of universal-hash permutations `(a_i * xxhash64(s) + b_i) mod p`.
  * Empty/short inputs produce an empty signature (callers filter).
  */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {

  // input contract: array<string> (builders in GraftFunctions guarantee it)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash"

  @transient private lazy val coeffs = HashFamilies.coefficients(k, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val baseHashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      baseHashes(i) = java.lang.Math.floorMod(h, HashFamilies.Prime)
      i += 1
    }
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      val (a, b) = coeffs(j)
      var min = Long.MaxValue
      i = 0
      while (i < n) {
        val v = (a * baseHashes(i) + b) % HashFamilies.Prime
        if (v < min) min = v
        i += 1
      }
      sig(j) = min
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over `array<string>` tokens: per bit position, sum +1/-1
  * votes of each token's xxhash64 bit; the sign becomes the output bit.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  // input contract: array<string> (builders in GraftFunctions guarantee it)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

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

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Engine-portable 64-bit token hash: the first 8 bytes of md5(s),
    * big-endian, as a Long bit pattern (value is *unsigned* — use
    * `Long.remainderUnsigned` / `>>>` on it). Chosen over xxhash64 because
    * every SQL engine ships md5, so an independent oracle can recompute
    * identical minhash/simhash values:
    * DuckDB `CAST('0x' || substr(md5(s), 1, 16) AS UBIGINT)` yields the
    * same bit pattern.
    */
  def md5Long(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes)
    java.nio.ByteBuffer.wrap(bytes).getLong
  }

  /** [[md5Long]] reduced mod [[Prime]] on the unsigned value. */
  def md5Mod(s: UTF8String): Long =
    java.lang.Long.remainderUnsigned(md5Long(s), Prime)

  /** Deterministic pseudo-random hyperplanes (fixed LCG, values in [-1,1])
    * for sign-LSH bucketing ([[HyperplaneBuckets]]).
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    var s = seed
    def next(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    Array.fill(nPlanes)(Array.fill(dim)(next()))
  }

  /** One plane family per table, distinct seeds → independent buckets. */
  def planeFamilies(nTables: Int, nPlanes: Int, dim: Int,
      seed: Long): Array[Array[Array[Double]]] =
    Array.tabulate(nTables)(t => hyperplanes(nPlanes, dim, seed + t))
}

/** MinHash signature: `array<string>` shingles -> `array<long>` of k minimums
  * of universal-hash permutations `(a_i * md5_64(s) + b_i) mod p`.
  * Empty/short inputs produce an empty signature (callers filter).
  * The md5 base hash makes signatures reproducible by any SQL engine
  * (see [[HashFamilies.md5Long]]) — the DuckDB oracle recomputes them.
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
      baseHashes(i) = HashFamilies.md5Mod(arr.getUTF8String(i))
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
  * votes of each token's md5-derived hash bit; the sign becomes the output
  * bit. md5 base hash for engine portability ([[HashFamilies.md5Long]]).
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
      val h = HashFamilies.md5Long(arr.getUTF8String(i))
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

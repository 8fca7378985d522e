package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.CountAndTotal

/** Buffer for [[CountAndTotalAggregator]]: the running total is exact
  * fixed-point at scale 9, held as two longs (whole `units` + fractional
  * `nanos`, same sign, |nanos| < 1e9). Exact arithmetic means merge order
  * across partitions cannot perturb the Double result — a plain Double
  * accumulator would make the aggregate non-deterministic under shuffle at
  * any real scale. All-primitive fields keep the buffer on the UnsafeRow
  * fast path; the previous BigDecimal-backed buffer paid a boxed
  * allocation per input row (q25 ran ~1.9x its built-in twin q08).
  * Headroom: |units| < 2^63 ≈ 9.2e18 — thousands of years of 100 TB days.
  */
final case class CountAndTotalBuffer(count: Long, units: Long, nanos: Long)

/** The reference's only user-defined aggregate, re-expressed on Spark's
  * public typed-Aggregator surface (SURVEY §2.3 A2 / §4.2; reference:
  * `streams/PurchasesTopology.java:61-66,75-80` — `count += 1;
  * total += quantity`). Registered via `functions.udaf` it is usable from
  * both the Column DSL and SQL, and Catalyst plans it with the same
  * partial/final two-phase split as built-in aggregates.
  */
class CountAndTotalAggregator extends Aggregator[Double, CountAndTotalBuffer, CountAndTotal] {

  private val Nano = 1000000000L

  /** HALF_UP total nanos of `v` — matches `BigDecimal(v).setScale(9,
    * HALF_UP)` for |v| < ~4e6: the double product's relative error
    * (~|v|*1e9*2^-52) is far below the 0.5 rounding threshold there, and
    * +0.5-then-floor reproduces HALF_UP's round-half-away-from-zero
    * (`math.rint` would round half to even and diverge on exact halves).
    *
    * Beyond that bound the `v * 1e9` double path can misround, and past
    * ~9.2e9 `toLong` would silently saturate at Long.MaxValue — so larger
    * magnitudes take the exact BigDecimal path, and inputs whose nano count
    * cannot fit a Long at all fail loudly (`longValueExact` throws) instead
    * of corrupting the total.
    */
  private val FastPathBound = 4.0e6

  private def toNanos(v: Double): Long =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v))
      // the old double path silently folded NaN to 0 via NaN.toLong;
      // non-finite quantities are data corruption — same loud contract as
      // the overflow case below
      throw new ArithmeticException(s"CountAndTotal input is not finite: $v")
    else if (math.abs(v) <= FastPathBound) {
      val scaled = v * 1e9
      if (scaled >= 0) math.floor(scaled + 0.5).toLong
      else -math.floor(-scaled + 0.5).toLong
    } else
      java.math.BigDecimal.valueOf(v)
        .setScale(9, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()

  /** Normalize so units/nanos share sign and |nanos| < 1e9. */
  private def norm(count: Long, units: Long, nanos: Long): CountAndTotalBuffer = {
    var u = units + nanos / Nano
    var n = nanos % Nano
    if (n > 0 && u < 0) { u += 1; n -= Nano }
    else if (n < 0 && u > 0) { u -= 1; n += Nano }
    CountAndTotalBuffer(count, u, n)
  }

  override def zero: CountAndTotalBuffer = CountAndTotalBuffer(0L, 0L, 0L)

  override def reduce(b: CountAndTotalBuffer, quantity: Double): CountAndTotalBuffer = {
    val t = toNanos(quantity)
    norm(b.count + 1, b.units + t / Nano, b.nanos + t % Nano)
  }

  override def merge(a: CountAndTotalBuffer, b: CountAndTotalBuffer): CountAndTotalBuffer =
    norm(a.count + b.count, a.units + b.units, a.nanos + b.nanos)

  override def finish(b: CountAndTotalBuffer): CountAndTotal =
    // one BigDecimal per GROUP (not per row): correctly-rounded Double of
    // the exact decimal units + nanos*1e-9
    CountAndTotal(b.count,
      java.math.BigDecimal.valueOf(b.units)
        .add(java.math.BigDecimal.valueOf(b.nanos, 9)).doubleValue())

  override def bufferEncoder: Encoder[CountAndTotalBuffer] = Encoders.product[CountAndTotalBuffer]
  override def outputEncoder: Encoder[CountAndTotal] = Encoders.product[CountAndTotal]
}

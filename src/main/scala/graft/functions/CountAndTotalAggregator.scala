package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.CountAndTotal

/** Buffer for [[CountAndTotalAggregator]]: the running total is an exact
  * BigDecimal (scale 9, HALF_UP — the same rounding Spark's double->decimal
  * Cast uses) so merge order across partitions cannot perturb the Double
  * result. A plain Double accumulator would make the aggregate
  * non-deterministic under shuffle at any real scale.
  */
final case class CountAndTotalBuffer(count: Long, total: BigDecimal)

/** The reference's only user-defined aggregate, re-expressed on Spark's
  * public typed-Aggregator surface (SURVEY §2.3 A2 / §4.2; reference:
  * `streams/PurchasesTopology.java:61-66,75-80` — `count += 1;
  * total += quantity`). Registered via `functions.udaf` it is usable from
  * both the Column DSL and SQL, and Catalyst plans it with the same
  * partial/final two-phase split as built-in aggregates.
  */
class CountAndTotalAggregator extends Aggregator[Double, CountAndTotalBuffer, CountAndTotal] {
  private val Scale = 9

  private def dec(v: Double): BigDecimal =
    BigDecimal(v).setScale(Scale, BigDecimal.RoundingMode.HALF_UP)

  override def zero: CountAndTotalBuffer = CountAndTotalBuffer(0L, BigDecimal(0).setScale(Scale))

  override def reduce(b: CountAndTotalBuffer, quantity: Double): CountAndTotalBuffer =
    CountAndTotalBuffer(b.count + 1, b.total + dec(quantity))

  override def merge(a: CountAndTotalBuffer, b: CountAndTotalBuffer): CountAndTotalBuffer =
    CountAndTotalBuffer(a.count + b.count, a.total + b.total)

  override def finish(b: CountAndTotalBuffer): CountAndTotal =
    CountAndTotal(b.count, b.total.toDouble)

  override def bufferEncoder: Encoder[CountAndTotalBuffer] = Encoders.product[CountAndTotalBuffer]
  override def outputEncoder: Encoder[CountAndTotal] = Encoders.product[CountAndTotal]
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.operators.RangeJoin

/** Scale probe for the bucketized band join (SURVEY §9 evidence): duplicate
  * the part table 1x/2x/4x (ids offset so all copies join) and time the
  * same ±2.5 price-band join at each multiplier. Output pairs grow ~m^2 per
  * price cell (every copy matches every copy — the adversarial case);
  * the probe records whether RUNTIME tracks the output size (pair
  * generation, unavoidable) rather than exploding super-linearly
  * (which would indicate candidate blowup beyond the true matches).
  */
object RangeJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-rangejoin-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val part = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_retailprice")).cache()
    part.count()

    val baseRows = part.count()
    Seq(1, 2, 4).foreach { m =>
      val df = (0 until m).map(i => part.select(
        (col("p_partkey") + lit(i * 10_000_000L)).as("p_partkey"),
        col("p_retailprice"))).reduce(_ unionAll _)
      val anchors = df.where(col("p_partkey") % 10 === 0)
      val t0 = System.nanoTime()
      val n = RangeJoin.bandJoin(anchors, df, "p_retailprice",
        "p_partkey", "p_partkey", band = 2.5, step = 5.0).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"m=$m%d rows=${m * baseRows}%d pairs=$n%d secs=$secs%.2f")
    }
    spark.stop()
  }
}

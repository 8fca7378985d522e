package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Engine
import graft.operators.Packing

/** Scale probe for greedy sequence packing (SURVEY §9 evidence): rows
  * grow 1M -> 4M -> 16M (synthetic ids with deterministic token counts,
  * 1024 shards, 4096-token budget) and runtime should track ~linearly —
  * the operator is one hash exchange on the shard key plus a
  * partition-local sort and a single forward pass, so super-linear growth
  * would mean the per-shard pass stopped streaming (e.g. a shard
  * materializing in memory), which is the 100 TB failure mode the design
  * avoids. The greedy pass itself carries three longs of state regardless
  * of shard size.
  */
object PackingProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local("graft-packing-probe")
    spark.sparkContext.setLogLevel("ERROR")

    Seq(1_000_000L, 4_000_000L, 16_000_000L).foreach { n =>
      val docs = spark.range(n).select(
        col("id"),
        (col("id") * 37 % 900 + 100).as("tokens"), // 100..999 tokens/doc
        (col("id") % 1024).as("shard"))
      val t0 = System.nanoTime()
      val seqs = Packing.packGreedy(docs, "id", "tokens", "shard", 4096)
        .select(countDistinct(col("shard"), col("seq_id"))).head().getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"rows=$n%,d sequences=$seqs%,d secs=$secs%.1f")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.operators.Dedup

/** Scale probe for cross-run MinHash near-dup (SURVEY §9 evidence): the
  * axis this operator uniquely faces is HISTORY size — a daily batch is
  * roughly constant, but the signature table grows with every batch ever
  * accepted. The probe loads m history batches (corpus copies with
  * offset ids: the adversarial case where every history doc is a
  * candidate of every batch doc that shares a band) and times one
  * fixed-size incoming batch against each history depth. The history
  * cost is one signature scan + the (band, bucket)-keyed join, both
  * linear in history rows; super-linear growth would mean the bucket
  * join degenerated (hot buckets) or the scan stopped pruning.
  */
object IncrementalMinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-mh-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val baseRows = docs.count()
    val batch = docs.limit(500)
      .select((col("doc_id") + lit(900000000L)).as("doc_id"), col("text"))

    Seq(1, 2, 5, 10).foreach { m =>
      val table = java.nio.file.Files
        .createTempDirectory("graft-mh-probe").toString + "/sigs"
      (0 until m).foreach { i =>
        Dedup.incrementalMinhashLsh(
          docs.select((col("doc_id") + lit(i * 10_000_000L)).as("doc_id"),
            col("text")),
          "doc_id", "text", table, batchId = s"h$i").count()
      }
      val t0 = System.nanoTime()
      val pairs = Dedup.incrementalMinhashLsh(
        batch, "doc_id", "text", table, batchId = "probe").count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"history=${m * baseRows}%d batch=500 pairs=$pairs%d secs=$secs%.2f")
    }
    spark.stop()
  }
}

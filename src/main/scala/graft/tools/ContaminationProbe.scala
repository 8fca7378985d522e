package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.operators.TextAnalysis

/** Scale probe for benchmark decontamination (SURVEY §9 evidence): the
  * probe (benchmark) set stays FIXED while the corpus is duplicated
  * 1x/2x/5x/10x (ids offset), timing the same containment query at each
  * multiplier. The probe postings are broadcast, so runtime should track
  * the corpus scan ~linearly — super-linear growth would mean the corpus
  * side started shuffling with the multiplier, which is exactly the 100 TB
  * failure mode the broadcast design avoids. Flagged pairs grow ~m-fold
  * (each corpus copy of a contaminated doc flags once).
  */
object ContaminationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-contam-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val baseRows = docs.count()
    val probes = docs.where(col("doc_id") % 17 === 0)

    Seq(1, 2, 5, 10).foreach { m =>
      val corpus = (0 until m).map(i => docs.select(
        (col("doc_id") + lit(i * 10_000_000L)).as("doc_id"),
        col("text"))).reduce(_ unionAll _)
      val t0 = System.nanoTime()
      val n = TextAnalysis.contaminationPairs(corpus, probes,
        "doc_id", "text", n = 3, threshold = 0.8,
        excludeSelfIds = true).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"m=$m%d rows=${m * baseRows}%d flagged=$n%d secs=$secs%.2f")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.operators.Dedup

/** Scale probe for duplicate-span detection (SURVEY §9 evidence): the
  * corpus is duplicated 1x/2x/5x/10x (ids offset), timing
  * [[Dedup.duplicateSpans]] at each multiplier. Duplicating the corpus is
  * the ADVERSARIAL case: from m=2 every window of every document is
  * corpus-duplicated, so the semi-join passes all positions and the
  * window/aggregate stage processes the full position stream — the probe
  * therefore bounds the operator's worst case, not its typical sparse-hit
  * case. Every stage is linear by construction (one fingerprint hash
  * aggregate, one semi-join, one per-doc window pass), so runtime should
  * track rows ~linearly; super-linear growth would mean the fingerprint
  * exchange or the per-doc sort stopped scaling.
  */
object DuplicateSpansProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-spans-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val baseRows = docs.count()

    Seq(1, 2, 5, 10).foreach { m =>
      val corpus = (0 until m).map(i => docs.select(
        (col("doc_id") + lit(i * 10_000_000L)).as("doc_id"),
        col("text"))).reduce(_ unionAll _)
      val t0 = System.nanoTime()
      val agg = Dedup.duplicateSpans(corpus, "doc_id", "text")
        .agg(count(lit(1)), coalesce(sum(col("dup_tokens")), lit(0L))).head()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"m=$m%d rows=${m * baseRows}%d flaggedDocs=${agg.getLong(0)}%d " +
        f"dupTokens=${agg.getLong(1)}%d secs=$secs%.2f")
    }
    spark.stop()
  }
}

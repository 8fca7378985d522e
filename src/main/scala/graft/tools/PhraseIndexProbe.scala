package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.operators.LexicalIndex

/** Scale probe for positional-index phrase retrieval (SURVEY §9
  * evidence): a FIXED phrase query set against a positional index built
  * over the corpus duplicated 1x/2x/5x/10x (ids offset). Build time
  * should track corpus size ~linearly (tokenize scan + the one
  * bucket-cluster exchange); QUERY time should grow only with the
  * phrase terms' posting volume — the scan stays pruned to the query
  * buckets and the candidate aggregate's exchange carries integer
  * position lists of matching docs only, so super-linear query growth
  * would mean the pruning or the candidate filter stopped holding, the
  * 100 TB failure mode this layout exists to avoid. Hits grow ~m-fold
  * (each corpus copy matches once).
  */
object PhraseIndexProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-phrase-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val baseRows = docs.count()
    val queries = Seq(1L -> "fast table", 2L -> "a a", 3L -> "table table",
        4L -> "value table part", 5L -> "key agg row")
      .toDF("query_id", "phrase")

    Seq(1, 2, 5, 10).foreach { m =>
      val corpus = (0 until m).map(i => docs.select(
        (col("doc_id") + lit(i * 10_000_000L)).as("doc_id"),
        col("text"))).reduce(_ unionAll _)
      val dir = graft.io.Spill.tempDir("graft-phrase-probe-") + "/idx"
      val tb0 = System.nanoTime()
      LexicalIndex.write(corpus, "doc_id", "text", dir, nBuckets = 64,
        positional = true)
      val buildSecs = (System.nanoTime() - tb0) / 1e9
      val tq0 = System.nanoTime()
      val n = LexicalIndex.phraseTopKIndexed(spark, dir, queries,
        "query_id", "phrase", k = 20).count()
      val querySecs = (System.nanoTime() - tq0) / 1e9
      println(f"m=$m%d rows=${m * baseRows}%d hits=$n%d " +
        f"build=$buildSecs%.2f query=$querySecs%.2f")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.operators.LexicalIndex

/** Scale probe for positional-index proximity and windowed-passage
  * retrieval (SURVEY §9 evidence, the PhraseIndexProbe discipline): a
  * FIXED query set against ONE positional index per corpus multiple
  * (sf0.1 documents duplicated 1x/2x/5x/10x, ids offset), each query
  * family timed separately. Both paths share the phrase path's pruned
  * posting scan and candidate aggregate, so query time should stay FLAT
  * in the corpus multiplier post-warmup — super-linear growth would
  * mean bucket pruning or the candidate filters stopped holding, the
  * 100 TB failure mode the positional layout exists to avoid.
  */
object ProximityPassageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-prox-probe")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val baseRows = docs.count()
    val queries = Seq(1L -> "fast table", 2L -> "value part",
        3L -> "value table part", 4L -> "key agg row", 5L -> "table")
      .toDF("query_id", "qterms")

    Seq(1, 2, 5, 10).foreach { m =>
      val corpus = (0 until m).map(i => docs.select(
        (col("doc_id") + lit(i * 10_000_000L)).as("doc_id"),
        col("text"))).reduce(_ unionAll _)
      val dir = graft.io.Spill.tempDir("graft-prox-probe-") + "/idx"
      val tb0 = System.nanoTime()
      LexicalIndex.write(corpus, "doc_id", "text", dir, nBuckets = 64,
        positional = true)
      val buildSecs = (System.nanoTime() - tb0) / 1e9
      val tq0 = System.nanoTime()
      val nProx = LexicalIndex.proximityTopKIndexed(spark, dir, queries,
        "query_id", "qterms", slop = 8, k = 20).count()
      val proxSecs = (System.nanoTime() - tq0) / 1e9
      val tp0 = System.nanoTime()
      val nPass = LexicalIndex.passageTopKIndexed(spark, dir, queries,
        "query_id", "qterms", window = 8, k = 20).count()
      val passSecs = (System.nanoTime() - tp0) / 1e9
      println(f"m=$m%d rows=${m * baseRows}%d build=$buildSecs%.2f " +
        f"prox=$proxSecs%.2f (rows=$nProx%d) " +
        f"passage=$passSecs%.2f (rows=$nPass%d)")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.operators.Similarity

/** Recall-dial probe for the LSH margin miner (VERDICT r15 item 3):
  * sweep `nPlanes` x `nTables` and measure the error-rate-vs-cost
  * trade against the exact sweep's pairs, via the SAME
  * [[Similarity.miningErrorRate]] audit the battery runs (q166).
  *
  * The dial's theory: a pair is a candidate when it shares a sign-LSH
  * bucket in ANY table, so the expected candidate fraction on
  * direction-uniform data is ~ 1 - (1 - 2^-nPlanes)^nTables ~
  * nTables / 2^nPlanes; more tables buy recall linearly in cost,
  * more planes cut cost exponentially but sharpen the similarity
  * threshold below which pairs are lost. The probe prints, per cell:
  * the MEASURED candidate fraction (distinct colliding pairs over
  * |src| x |tgt|), miner wall seconds, and the audited error rate —
  * the numbers SURVEY §9's dial table records. Random embeddings are
  * the sign-LSH WORST case (mined pairs sit at low absolute cosine,
  * near the hyperplanes); clustered production embeddings recall far
  * better at the same dial (the tight-cluster spec case is exact).
  */
object BitextDialProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-bitext-dial")
    spark.sparkContext.setLogLevel("ERROR")
    val embs = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).cache()
    embs.count()
    // the q166 battery split: even ids mine against odd ids
    val src = embs.where(col("vec_id") % 2 === 0).cache()
    val tgt = embs.where(col("vec_id") % 2 =!= 0).cache()
    val nSrc = src.count(); val nTgt = tgt.count()
    val gold = Similarity.marginMinePairs(src, tgt, "vec_id",
        "embedding", k = 4, minMargin = 1.0)
      .select(col("src_id"), col("tgt_id")).cache()
    println(s"src=$nSrc tgt=$nTgt goldPairs=${gold.count()}")

    println("planes tables candFrac seconds errorRate")
    for (nPlanes <- Seq(2, 4, 6, 8); nTables <- Seq(2, 4, 8, 16, 32)) {
      // measured candidate universe: distinct cross pairs sharing any
      // bucket (what the miner actually scores)
      val sp = Similarity.lshPostings(src.select(
          col("vec_id").as("src_id"), col("embedding")),
        "src_id", "embedding", nPlanes, nTables, 64, 11L)
        .select(col("src_id"), col("table"), col("bucket"))
      val tp = Similarity.lshPostings(tgt.select(
          col("vec_id").as("tgt_id"), col("embedding")),
        "tgt_id", "embedding", nPlanes, nTables, 64, 11L)
        .select(col("tgt_id"), col("table"), col("bucket"))
      val cand = tp.join(sp, Seq("table", "bucket"))
        .select(col("src_id"), col("tgt_id")).distinct().count()
      val t0 = System.nanoTime()
      val mined = Similarity.marginMinePairsLsh(src, tgt, "vec_id",
        "embedding", k = 4, minMargin = 1.0, nPlanes = nPlanes,
        nTables = nTables, dim = 64)
      val err = Similarity.miningErrorRate(mined, gold)
        .head().getDouble(3)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$nPlanes%6d $nTables%6d ${cand.toDouble / (nSrc * nTgt)}%8.4f " +
        f"$secs%7.2f $err%9.6f")
      graft.io.Spill.releaseAll()
    }
    spark.stop()
  }
}

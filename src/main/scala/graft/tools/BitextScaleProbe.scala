package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.operators.Similarity

/** Scale probe for the margin bitext miners (SURVEY §9): a FIXED
  * source probe batch against a target corpus duplicated 1x/2x/5x/10x
  * (ids offset). With the source batch fixed — the production mining
  * shape — all three paths are LINEAR in the target multiple: the
  * exact sweep's pair count is |src| x m|tgt| by definition, and the
  * bucketed paths' collision count multiplies by m (each duplicate
  * collides exactly where its original did). The probe checks
  * per-target-row throughput stays flat and that the bucketed paths'
  * advantage holds as the corpus grows; super-linear growth in any
  * column means the candidate dedup or the spill stopped bounding the
  * tail — the 100 TB failure mode. (Growing BOTH sides multiplies
  * pairs quadratically in the exact path by definition; that is what
  * the LSH/indexed variants exist to avoid, and why production miners
  * batch the source side.)
  */
object BitextScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-bitext-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val embs = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).cache()
    embs.count()
    val src = embs.where(col("vec_id") % 2 === 0).cache()
    val nSrc = src.count()
    val tgtBase = embs.where(col("vec_id") % 2 =!= 0)

    Seq(1, 2, 5, 10).foreach { m =>
      val tgt = (0 until m).map(i => tgtBase.select(
        (col("vec_id") + lit(i * 10_000_000L)).as("vec_id"),
        col("embedding"))).reduce(_ unionAll _).cache()
      val nTgt = tgt.count()
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (exactS, nExact) = time(Similarity.marginMinePairs(src, tgt,
        "vec_id", "embedding", k = 4, minMargin = 1.0).count())
      val (lshS, nLsh) = time(Similarity.marginMinePairsLsh(src, tgt,
        "vec_id", "embedding", k = 4, minMargin = 1.0,
        nPlanes = 4, nTables = 12, dim = 64).count())
      val dir = graft.io.Spill.tempDir("graft-bitext-probe-") + "/lsh"
      Similarity.writeLshIndex(tgt, "vec_id", "embedding", dir,
        nPlanes = 4, nTables = 12, dim = 64)
      val (idxS, nIdx) = time(Similarity.marginMinePairsIndexed(spark,
        dir, src, "vec_id", "embedding", k = 4, minMargin = 1.0,
        nPlanes = 4, nTables = 12, dim = 64).count())
      println(f"m=$m%d src=$nSrc%d tgt=$nTgt%d " +
        f"exact=$exactS%.2f (${exactS * 1e9 / (nSrc * nTgt)}%.1f ns/pair, rows=$nExact%d) " +
        f"lsh=$lshS%.2f (rows=$nLsh%d) indexed=$idxS%.2f (rows=$nIdx%d)")
      tgt.unpersist()
      graft.io.Spill.releaseAll()
    }
    spark.stop()
  }
}

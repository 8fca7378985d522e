package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum}

/** Maintenance for `batch=<id>`-directory count tables whose rows are
  * ADDITIVE (a sum over batch dirs is the true value): the generalized
  * form of the duplicate-span count fold, shared with the Naive Bayes
  * incremental count table. Distinct-row tables (fingerprints,
  * signatures, embeddings) use `Dedup.compactDistinctFold` instead —
  * their fold is idempotent and needs no crash marker.
  */
object BatchTable {

  /** Fold all `batch=<id>` dirs (minus `excludeBatch`, the possibly
    * in-flight one) into ONE `batch=compact-<id>` dir holding
    * `sum(sumCol)` per `keyCols`, targeting `targetFileBytes` files.
    *
    * Crash discipline (the q105 span-count machinery verbatim): an
    * `_compact_inflight` marker (target + source names) is written
    * before the fold and removed after the source delete; a retry first
    * completes or rolls back the recorded fold — sources are deleted
    * iff the target finished (`_SUCCESS`), a partial target is dropped
    * — so a sum can read DOUBLE only in the transient window between
    * fold-write and delete, never permanently. Callers must be
    * double-tolerant in that window (span gates drop a little extra
    * text; an NB model's probabilities shift one refresh early).
    * Returns the parquet data-file count after compaction.
    */
  def compactSumFold(spark: SparkSession, path: String,
      keyCols: Seq[String], sumCol: String, excludeBatch: String = null,
      targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFileCount: Int = {
      val it = fs.listFiles(root, true)
      var n = 0
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    val marker = new org.apache.hadoop.fs.Path(root, "_compact_inflight")
    // recover a crashed predecessor before reading anything: finish its
    // delete if the fold completed, drop the partial fold if not
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().toList finally in.close()
      lines match {
        case target :: staleSources =>
          val targetPath = new org.apache.hadoop.fs.Path(root, target)
          if (fs.exists(new org.apache.hadoop.fs.Path(targetPath, "_SUCCESS")))
            staleSources.foreach(n =>
              fs.delete(new org.apache.hadoop.fs.Path(root, n), true))
          else fs.delete(targetPath, true)
        case Nil =>
      }
      fs.delete(marker, false)
    }
    val sources = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .filter(_.getName.startsWith("batch="))
      .filterNot(p => excludeBatch != null && p.getName == s"batch=$excludeBatch")
    if (sources.length <= 1) return dataFileCount
    val bytes = sources.map(p => fs.getContentSummary(p).getLength).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val targetName = "batch=compact-" +
      java.util.UUID.randomUUID().toString.take(12)
    val out = fs.create(marker, true)
    try out.write((targetName +: sources.map(_.getName))
      .mkString("\n").getBytes("UTF-8")) finally out.close()
    spark.read.parquet(sources.map(_.toString).toIndexedSeq: _*)
      .groupBy(keyCols.map(col): _*).agg(sum(col(sumCol)).as(sumCol))
      .coalesce(nFiles)
      .write.mode("overwrite")
      .parquet(s"$path/$targetName")
    sources.foreach(fs.delete(_, true))
    fs.delete(marker, false)
    dataFileCount
  }
}

package graft.io

import org.apache.spark.sql.SparkSession

/** Shared temp-sibling + rename swap used by [[Layout.compact]],
  * [[Merge.upsertWrite]], and [[graft.operators.LexicalIndex.compact]]:
  * write the replacement NEXT TO the target, then two renames exchange
  * them — never a lazy read-then-overwrite of the same path (which loses
  * the table), and never delete-then-rename (which leaves the table
  * OFFLINE if the rename fails; the old copy stays in place until the
  * new one is in). If the replacement write throws, the partial temp
  * directory is deleted and the target is untouched. The swap window is
  * not atomic for concurrent readers.
  */
private[graft] object Swap {

  /** `write` receives the temp path and must materialize the replacement
    * there; on success the temp is swapped into `path`.
    */
  def swapInto(spark: SparkSession, path: String, prefix: String)(
      write: String => Unit): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(s"$path.$prefix-tmp-$stamp")
    val old = new org.apache.hadoop.fs.Path(s"$path.$prefix-old-$stamp")
    try write(tmp.toString)
    catch { case e: Throwable => fs.delete(tmp, true); throw e }
    if (!fs.rename(hPath, old)) {
      fs.delete(tmp, true)
      sys.error(s"swapInto: cannot move $path aside")
    }
    if (!fs.rename(tmp, hPath)) { // restore on failure, loudly
      fs.rename(old, hPath)
      fs.delete(tmp, true)
      sys.error(s"swapInto: cannot swap replacement into $path")
    }
    fs.delete(old, true): Unit
  }
}

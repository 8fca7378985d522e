package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Upsert (SCD-1 merge) without a table format: last-write-wins per key,
  * expressed as `updates ∪ (target ANTI-JOIN updates)` — one hash shuffle
  * on the key, no full-outer join, no driver round-trip. At 100 TB pair it
  * with a partitioned target and prune both sides to the touched
  * partitions before calling; a real lakehouse table format adds snapshot
  * isolation on top, the merge plan itself is this one.
  */
object Merge {

  /** Plan form: all `updates` rows plus every `target` row whose key has
    * no update. Schemas must match by name (`unionByName`). Delete support:
    * pass tombstone rows in `updates` flagged by `tombstoneCol`; they win
    * the merge (shadowing the target row) and are then dropped, so a
    * delete is "upsert a tombstone".
    */
  def upsert(target: DataFrame, updates: DataFrame, keyCols: Seq[String],
      tombstoneCol: Option[String] = None): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val merged = updates.unionByName(
      target.join(updates.select(keyCols.map(col): _*).distinct(),
        keyCols, "left_anti"))
    tombstoneCol match {
      case Some(t) => merged.where(!coalesce(col(t), lit(false))).drop(t)
      case None => merged
    }
  }

  /** Apply an upsert to a parquet path in place, via the same
    * temp-sibling + rename swap as [[Layout.compact]] (a lazy
    * read-then-overwrite of the same path would lose the table). Not
    * atomic for concurrent readers — same caveat as compact.
    */
  def upsertWrite(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], tombstoneCol: Option[String] = None): Unit = {
    val target = spark.read.parquet(path)
    val merged = upsert(target, updates, keyCols, tombstoneCol)
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(s"$path.merge-tmp-$stamp")
    val old = new org.apache.hadoop.fs.Path(s"$path.merge-old-$stamp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (!fs.rename(hPath, old)) sys.error(s"upsertWrite: cannot move $path aside")
    if (!fs.rename(tmp, hPath)) {
      fs.rename(old, hPath)
      sys.error(s"upsertWrite: cannot swap in merged copy for $path")
    }
    fs.delete(old, true)
  }
}

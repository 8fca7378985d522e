package graft.io

import org.apache.spark.sql.{Column, DataFrame}

/** Data-layout writers — the storage-side half of scan performance. A scan
  * can only skip what the writer clustered: parquet keeps min/max stats
  * per file and per row group, so a table RANGE-PARTITIONED and sorted on
  * its query column yields files with DISJOINT value ranges, and a range
  * predicate then prunes whole files before any I/O (and row groups
  * within the touched files). Unsorted ingest order scatters every value
  * range across every file — stats exist but never exclude anything.
  *
  * At 100 TB this is the difference between a date-range query reading a
  * day's files and reading the corpus; it composes with
  * [[Bucketing]] (join locality) and the LSH index's partition pruning
  * (point lookups) as the third layout tool.
  */
object Layout {

  /** Write `df` clustered for range predicates on `sortCols`:
    * `repartitionByRange` puts each value range in one output partition
    * (global order across files), `sortWithinPartitions` orders rows
    * inside each file (row-group stats monotone within a file).
    */
  def writeRangeSorted(df: DataFrame, path: String, numFiles: Int,
      sortCols: Column*): Unit =
    df.repartitionByRange(numFiles, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(path)
}

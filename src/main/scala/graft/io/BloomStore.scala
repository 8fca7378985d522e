package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.sketch.BloomFilter

/** Persisted, generation-versioned Bloom filter beside a fingerprint
  * table (`<table>/_bloom/gen-<n>.bf` + `gen-<n>.meta`) — the cache that
  * lets [[graft.operators.Dedup.incrementalExactDedupBloom]] route a
  * batch WITHOUT rescanning the whole history every call.
  *
  * Correctness contract: the filter is a SUPERSET cache — it may claim
  * fingerprints the table does not hold (routes a few extra rows into
  * the exact confirm join; harmless), but must NEVER miss one the table
  * holds (a false negative would route a true duplicate down the
  * definitely-novel lane and re-admit it). Two mechanisms enforce it:
  *
  *   - callers update the filter BEFORE writing the batch's fingerprint
  *     directory, so a crash between the two leaves a filter that
  *     over-claims, never one that under-claims;
  *   - the `.meta` file is written after its `.bf` payload and acts as
  *     the commit marker — a torn write leaves the previous generation
  *     current.
  *
  * The underscore directory name keeps Spark's parquet reader from
  * treating the artifacts as data (standard `_`-prefix hidden-path
  * rule). The table's batch directories remain the durable truth: a
  * missing or stale-parameter filter is simply rebuilt from one scan.
  * All IO goes through the Hadoop FileSystem of the table path, so the
  * store works wherever the table lives (local, HDFS, object stores
  * with a Hadoop connector).
  *
  * Single-writer, like the fingerprint table itself.
  */
private[graft] object BloomStore {

  final case class Meta(expected: Long, fpp: Double, inserted: Long)

  private def dir(table: String) = new Path(table, "_bloom")

  private def fs(spark: SparkSession, table: String): FileSystem =
    dir(table).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest committed generation number, or -1. A generation counts only
    * once its `.meta` marker exists.
    */
  def latestGen(spark: SparkSession, table: String): Long = {
    val f = fs(spark, table)
    val d = dir(table)
    if (!f.exists(d)) return -1L
    f.listStatus(d).iterator.map(_.getPath.getName)
      .collect { case n if n.startsWith("gen-") && n.endsWith(".meta") =>
        n.stripPrefix("gen-").stripSuffix(".meta") }
      .flatMap(s => scala.util.Try(s.toLong).toOption match {
        case Some(v) => Iterator.single(v); case None => Iterator.empty })
      .foldLeft(-1L)(math.max)
  }

  /** Load the latest committed filter, or None. */
  def load(spark: SparkSession, table: String): Option[(BloomFilter, Meta)] = {
    val gen = latestGen(spark, table)
    if (gen < 0) return None
    val f = fs(spark, table)
    val d = dir(table)
    val metaTxt = {
      val in = f.open(new Path(d, s"gen-$gen.meta"))
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val kv = metaTxt.linesIterator.map(_.split("=", 2))
      .collect { case Array(k, v) => k -> v }.toMap
    val meta = Meta(kv("expected").toLong, kv("fpp").toDouble,
      kv("inserted").toLong)
    val in = f.open(new Path(d, s"gen-$gen.bf"))
    val bf = try BloomFilter.readFrom(in) finally in.close()
    Some((bf, meta))
  }

  /** Persist `bf` as the next generation (payload first, then the meta
    * commit marker), best-effort deleting older generations after.
    */
  def save(spark: SparkSession, table: String, bf: BloomFilter,
      meta: Meta): Long = {
    val f = fs(spark, table)
    val d = dir(table)
    if (!f.exists(d)) f.mkdirs(d)
    val gen = latestGen(spark, table) + 1
    val out = f.create(new Path(d, s"gen-$gen.bf"), true)
    try bf.writeTo(out) finally out.close()
    val m = f.create(new Path(d, s"gen-$gen.meta"), true)
    try m.write(
      s"expected=${meta.expected}\nfpp=${meta.fpp}\ninserted=${meta.inserted}\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally m.close()
    // older generations are garbage once the new marker is visible
    f.listStatus(d).foreach { st =>
      val n = st.getPath.getName
      val old = n.startsWith("gen-") &&
        scala.util.Try(n.stripPrefix("gen-").takeWhile(_.isDigit).toLong)
          .toOption.exists(_ < gen)
      if (old) scala.util.Try(f.delete(st.getPath, false))
    }
    gen
  }

  /** Drop all generations (used when a rebuild decides the persisted
    * parameters no longer fit the history).
    */
  def clear(spark: SparkSession, table: String): Unit = {
    val f = fs(spark, table)
    val d = dir(table)
    if (f.exists(d)) f.delete(d, true)
  }
}

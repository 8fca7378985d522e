package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Engine
import graft.functions.TextFunctions

/** Dev-only injectivity audit for the hashed-shingle shuffle keys in
  * [[graft.operators.Dedup.ngramJaccardPairs]] (guide §2.3, round-20
  * verdict item 5): for each fixture SF and each shingle width the
  * battery uses, count distinct shingles vs distinct xxhash64 values
  * over the documents corpus — equality proves the hash is injective on
  * that corpus, so hashed-key pair building is bit-identical to
  * string-key pair building there (the DuckDB oracle keeps string keys).
  *
  * `sbt "runMain graft.tools.ShingleHashCheck"` — prints one line per
  * (sf, n) and exits nonzero on any collision.
  */
object ShingleHashCheck {
  def main(args: Array[String]): Unit = {
    val spark = Engine.local("graft-shinglehash")
    spark.sparkContext.setLogLevel("ERROR")
    val base = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    var bad = 0
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); n <- Seq(2, 3)) {
      val docs = spark.read.parquet(s"$base/$sf/documents.parquet")
      val sh = docs
        .select(TextFunctions.words(col("text")).as("w"))
        .where(size(col("w")) >= n)
        .select(explode(TextFunctions.wordShingles(col("w"), n)).as("s"))
        .distinct()
      val row = sh.agg(count(lit(1)).as("n_shingles"),
        countDistinct(xxhash64(col("s"))).as("n_hashes")).first()
      val ok = row.getLong(0) == row.getLong(1)
      if (!ok) bad += 1
      println(s"$sf n=$n shingles=${row.getLong(0)} " +
        s"hashes=${row.getLong(1)} ${if (ok) "OK" else "COLLISION"}")
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}

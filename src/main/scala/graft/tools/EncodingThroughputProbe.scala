package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}
import graft.operators.Encoding

/** Throughput probe for the mojibake-repair stage (round 17): the
  * generated replace cascade runs ~2×|MojibakeTable| + |Confusables|
  * sequential scans per value — the documented price of oracle
  * replayability. This probe MEASURES that price against two
  * baselines on the same corpus scan:
  *
  *   - `baseline`  — md5(text): one pass, the floor any text stage pays;
  *   - `lower`     — md5(lower(text)): one extra linear pass;
  *   - `fix`       — md5(Encoding.fixText(text)): the full chain.
  *
  * All three run through the noop sink (full physical plan, no
  * collect), min-of-3, so the per-char cost multiple of the repair
  * chain is a measured number SURVEY §9 can cite instead of "linear,
  * trust us". A multiple in the low tens at single-digit MB/s/core
  * still scan-bounds at 100 TB only when the cluster's CPU:IO ratio
  * allows — if this stage ever dominates a profile, the documented
  * upgrade is a single-pass longest-match Expression (losing DuckDB
  * replayability for the battery row, so it stays an explicit trade).
  */
object EncodingThroughputProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-enc-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val nDocs = docs.count()
    val totalChars = docs.agg(sum(length(col("text")))).head().getLong(0)

    def time(label: String)(c: org.apache.spark.sql.Column): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        docs.select(md5(c).as("h")).write.format("noop")
          .mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"$label%-9s ${best}%.3f s  " +
        f"${totalChars / best / 1e6}%.1f Mchars/s")
      best
    }

    println(s"docs=$nDocs chars=$totalChars sf=$sfDir")
    val b = time("baseline")(col("text"))
    val l = time("lower")(lower(col("text")))
    val f = time("fix")(Encoding.fixText(col("text")))
    println(f"fix/baseline = ${f / b}%.1fx   fix/lower = ${f / l}%.1fx")
    spark.stop()
  }
}

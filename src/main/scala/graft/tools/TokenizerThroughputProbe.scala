package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Engine, Tables}

/** Throughput probe for the tokenizer TRIAD (round 17): all three
  * families claim the same 100 TB posture — a map-only imperative
  * expression riding the scan — but their per-word inner loops differ
  * by an order of complexity:
  *
  *   - `wordpiece` — greedy longest-match, O(len · maxPieceLen) probes
  *     of one hash set per word;
  *   - `unigram`   — Viterbi DP, O(len · maxPieceLen) map probes PLUS
  *     the backtrace and integer accumulation;
  *   - `bpe`       — greedy min-rank merge loop with per-word
  *     memoization (the merges table replayed).
  *
  * The probe measures each against the md5 one-pass floor on the same
  * corpus scan (noop sink, min-of-3), so SURVEY §9 cites measured
  * Mchars/s multiples instead of "map-only, trust us". Per-word
  * memoization (BPE) and the once-per-expression vocabulary maps
  * (all three) mean cost scales with text volume, not vocabulary.
  */
object TokenizerThroughputProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.local("graft-tok-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).cache()
    val nDocs = docs.count()
    val totalChars = docs.agg(sum(length(col("text")))).head().getLong(0)

    def time(label: String)(c: org.apache.spark.sql.Column): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        docs.select(c.as("out")).write.format("noop")
          .mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val best = runs.min
      println(f"$label%-9s ${best}%.3f s  " +
        f"${totalChars / best / 1e6}%.1f Mchars/s")
      best
    }

    println(s"docs=$nDocs chars=$totalChars sf=$sfDir")
    val words = graft.functions.TextFunctions.words(col("text"))
    val b = time("baseline")(md5(col("text")))
    val wp = time("wordpiece")(md5(array_join(
      graft.operators.WordPiece.segmentWords(words)
        .getField("pieces"), " ")))
    val un = time("unigram")(md5(array_join(
      graft.operators.UnigramLm.segmentWords(words)
        .getField("pieces"), " ")))
    val bp = time("bpe")(md5(array_join(
      call_function("bpe_tokens", col("text")), " ")))
    println(f"wordpiece/baseline = ${wp / b}%.1fx   " +
      f"unigram/baseline = ${un / b}%.1fx   bpe/baseline = ${bp / b}%.1fx")
    spark.stop()
  }
}

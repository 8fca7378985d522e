package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wsTokens

/** Fixed-size token chunking with stride — the standard preprocessing step
  * between cleaning and sequence assembly in an LLM pipeline: long
  * documents become overlapping windows of at most `size` tokens, starting
  * every `stride` tokens (stride < size = overlap, which preserves context
  * across chunk boundaries for training and for embedding-indexing).
  *
  * Pure map-side: tokenize, enumerate window starts (`sequence`), explode,
  * slice — all codegen'd built-ins, zero shuffles, so at 100 TB this runs
  * at scan speed and the output count is exactly
  * `sum_docs ceil(n_tokens / stride)`. The assignment depends only on the
  * document text, so an external engine replays it verbatim (the DuckDB
  * oracle reconstructs every chunk and its text).
  *
  * Semantics: window starts are 0, stride, 2*stride, ... < n_tokens; each
  * chunk is tokens[start, min(start+size, n)). Every start below n emits
  * (trailing chunks may be shorter than `size`); empty documents emit
  * nothing. `chunk_id` = start / stride, contiguous from 0 per document.
  */
object Chunking {

  /** Chunk `textCol` into windows of `size` tokens every `stride` tokens.
    * Output: `idCol`, `chunk_id` (long, from 0 per doc), `n_tokens`
    * (long), `chunk_text` (tokens re-joined with single spaces).
    */
  def chunk(df: DataFrame, idCol: String, textCol: String, size: Int,
      stride: Int): DataFrame = {
    require(size > 0, "size must be positive")
    require(stride > 0 && stride <= size,
      "stride must be in [1, size] (stride > size would drop tokens)")
    val toks = wsTokens(col(textCol))
    df.select(col(idCol), toks.as("toks"))
      .where(size_(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        posexplode(sequence(lit(0), size_(col("toks")) - 1, lit(stride))))
      .select(col(idCol),
        col("pos").cast("long").as("chunk_id"),
        slice(col("toks"), col("col") + 1, lit(size)).as("chunk"))
      .select(col(idCol), col("chunk_id"),
        size_(col("chunk")).cast("long").as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  // functions.size, disambiguated from scala.Predef and the `size` param
  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)
}

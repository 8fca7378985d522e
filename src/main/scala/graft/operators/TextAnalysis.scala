package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Document-level text analysis (SURVEY §2.6 north-star): language ID,
  * quality scoring, token counting, fingerprinting. All per-row, codegen'd
  * expressions — map-only plans with zero shuffles, so throughput scales
  * linearly with executors at any corpus size.
  */
object TextAnalysis {

  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), langId(col(textCol)).as("lang_pred"))

  def quality(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), col(textCol), words(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
      .select(col(idCol),
        size(col("w")).cast("long").as("n_words"),
        qualityScore(col("w"), col(textCol)).as("quality"))

  /** [[quality]] with the stopword term matched to each document's OWN
    * predicted language (multilingual corpora; English-only weighting
    * under-scores well-formed non-English prose).
    */
  def qualityByLang(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), col(textCol),
        langId(col(textCol)).as("lang_pred"), words(col(textCol)).as("w"))
      .where(size(col("w")) > 0)
      .select(col(idCol), col("lang_pred"),
        size(col("w")).cast("long").as("n_words"),
        qualityScoreByLang(col("w"), col(textCol), col("lang_pred")).as("quality"))

  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      wsTokenCount(col(textCol)).as("ws_tokens"),
      bpeTokenCount(col(textCol)).as("bpe_tokens"))

  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), fingerprint(col(textCol)).as("fp"))
}

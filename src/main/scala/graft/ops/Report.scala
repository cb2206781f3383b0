package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Corpus DATA CARD — the per-source summary table a dataset release
  * ships (docs, tokens, duplication, language mix, mean quality): one
  * grouped pass composing the repo's deterministic text signals, so the
  * numbers in the card are exactly the ones the curation operators
  * gate on.
  */
object Report {

  /** One row per `source`:
    *
    *   n_docs, n_tokens, n_chars — corpus volume
    *   avg_tokens                — round(n_tokens / n_docs, 4)
    *   dup_docs                  — n_docs − distinct md5(text): exact
    *                               verbatim-duplicate count (integer)
    *   n_en, n_und               — [[TextFunctions.langId]] doc counts
    *   avg_quality               — mean [[TextFunctions.qualityScore]],
    *                               summed in exact integer 1e-4 units
    *                               (the score is already 4dp-rounded) so
    *                               the mean is order-independent; one
    *                               final division, rounded at 4dp
    *
    * Scale: every signal is a map-side codegen'd projection; the only
    * shuffles are the two-phase grouped aggregate and the per-group
    * exact DISTINCT (Spark's Expand) for `dup_docs` — swap that term
    * for [[Hll.approxDistinctByGroup]] when sources hold billions of
    * docs and an approximate dup count suffices. */
  def corpusDataCard(
      df: DataFrame, source: Column, text: Column): DataFrame = {
    val perDoc = df.select(
      source.as("source"),
      TextFunctions.tokenCount(text).cast("long").as("__nt"),
      length(text).cast("long").as("__chars"),
      round(TextFunctions.qualityScore(text) * lit(10000.0), 0)
        .cast("long").as("__qmicro"),
      TextFunctions.langId(text).as("__lang"),
      md5(text.cast("string")).as("__h"))
    perDoc.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        sum(col("__chars")).as("n_chars"),
        (count(lit(1)) - countDistinct(col("__h"))).as("dup_docs"),
        count(when(col("__lang") === "en", 1)).as("n_en"),
        count(when(col("__lang") === "und", 1)).as("n_und"),
        sum(col("__qmicro")).as("__qsum"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") /
          col("n_docs").cast("double"), 4).as("avg_tokens"),
        col("n_chars"), col("dup_docs"), col("n_en"), col("n_und"),
        round(col("__qsum").cast("double") / lit(10000.0) /
          col("n_docs").cast("double"), 4).as("avg_quality"))
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level term weighting: per-(document, term) TF-IDF.
  *
  * Shapes as three aggregations Catalyst pipelines with map-side partial
  * aggregation: token explode → (doc, term) counts (shuffle on the pair),
  * vocabulary doc-frequencies derived FROM the tf table (shuffle on term —
  * input is one row per (doc, term), far smaller than the raw token
  * stream), and the corpus size as a broadcast single-row aggregate. The
  * tf⋈df join shuffles on term; hint the df side broadcast when the
  * vocabulary fits (typically yes — vocabularies grow ~log of corpus).
  */
object Tfidf {

  /** (doc_id, term, tf, df, tfidf) for every (document, term) occurrence;
    * tfidf = tf · ln(N / df), rounded to 4 decimals (cross-engine double
    * noise floor). Documents with no tokens contribute nothing (and still
    * count toward N). */
  def tfidf(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      explode(TextFunctions.tokens(text)).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("__n").cast("double") / col("df").cast("double")), 4)
          .as("tfidf"))
  }
}

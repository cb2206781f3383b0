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
  * df side carries one row per vocabulary term and is broadcast-hinted
  * (vocabularies grow ~log of corpus — same hint [[unigramNll]] and
  * [[bm25]] use), so the tf side never shuffles for the join.
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
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("__n").cast("double") / col("df").cast("double")), 4)
          .as("tfidf"))
  }

  /** CCNet-style unigram language-model scoring — the classic perplexity
    * quality filter: score every document by its average negative
    * log-likelihood under the corpus's own unigram distribution (high
    * avg-NLL ⇒ rare-token word salad; low ⇒ repetitive boilerplate).
    *
    * Same three-aggregation pipeline as [[tfidf]]: token explode →
    * (doc, term) counts, corpus term counts derived FROM the tf table
    * (shuffle carries one row per (doc, term), not the raw token stream),
    * and the model — one logprob per VOCABULARY term — broadcast back.
    * At 100 TB the corpus side shuffles only on (doc, term) and doc.
    *
    * Engine-portable: per-term ln(count/N) is quantized to integer
    * micro-nats (`floor(lp·10⁶ + 0.5)` as LONG) BEFORE the per-document
    * sum, so the only cross-row float reduction is exact integer
    * arithmetic — order-independent on any engine. Documents with no
    * tokens surface with n_tokens = 0 and NULL score.
    *
    * Residual portability caveat: lp_micro quantizes AFTER a
    * transcendental ln, so a 1-ulp JVM-vs-libm difference at an exact
    * `.5` boundary could still flip one term (~1e-10 per term); every
    * column DOWNSTREAM of the quantization is exact integer arithmetic,
    * including `avg_nll_micro` (integer division — both engines truncate
    * identically for the non-negative values here). `avg_nll` is the
    * human-friendly double and is NOT engine-hash-stable.
    *
    * @return (doc_id, n_tokens, nll_micro = Σ tf·(−lp_micro),
    *         avg_nll_micro = nll_micro div n_tokens (integer, exact),
    *         avg_nll = nll_micro / 10⁶ / n_tokens rounded at 4dp)
    */
  def unigramNll(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = docs.select(id.as("doc_id"),
      explode(TextFunctions.tokens(text)).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val termCounts = tf.groupBy(col("term")).agg(sum(col("tf")).as("cnt"))
    val n = termCounts.agg(sum(col("cnt")).as("__n"))
    val model = termCounts.crossJoin(broadcast(n))
      .select(col("term"),
        floor(log(col("cnt").cast("double") / col("__n").cast("double")) *
          lit(1e6) + lit(0.5)).cast("long").as("__lp_micro"))
    val perDoc = tf.join(broadcast(model), Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        (-sum(col("tf") * col("__lp_micro"))).as("nll_micro"))
    docs.select(id.as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"),
        expr("nll_micro div n_tokens").as("avg_nll_micro"),
        round(col("nll_micro").cast("double") / lit(1e6) /
          col("n_tokens").cast("double"), 4).as("avg_nll"))
  }

  /** Bigram conditional LM scoring — the contextual sibling of
    * [[unigramNll]]: each document is scored by the average negative
    * conditional log-likelihood −ln P(w₂|w₁) of its CONSECUTIVE token
    * pairs under the corpus's own bigram distribution, with
    * P(w₂|w₁) = cnt(w₁ w₂) / cnt(w₁ ·) (denominator = bigram-initial
    * count, summed over bigrams sharing the prefix). Scoring the
    * training corpus against itself means every scored bigram has a
    * nonzero count — no smoothing needed; scoring NEW text against a
    * fixed model would add add-k smoothing at the same join.
    *
    * Same pipeline + portability discipline as [[unigramNll]]: (doc,
    * bigram) counts shuffle once, per-bigram conditional logprobs
    * quantize to integer micro-nats BEFORE the per-document sum (the
    * only cross-row reduction is exact integer arithmetic), and the
    * prefix-totals side broadcasts (≤ unigram vocabulary rows). The
    * model join is deliberately UNHINTED: the bigram vocabulary is
    * bounded by |V|² — at small scale Catalyst auto-broadcasts it, at
    * 100 TB it correctly degrades to a shuffle join on the bigram.
    * Documents with < 2 tokens have 0 bigrams and a NULL average.
    *
    * @return (doc_id, n_bigrams, nll_micro, avg_nll_micro)
    */
  def bigramNll(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = TextFunctions.tokens(text)
    val bigrams = when(size(toks) >= 2,
      graft.functions.exprs.word_shingles(toks, 2))
      .otherwise(typedLit(Seq.empty[String]))
    val bg = docs.select(id.as("doc_id"), explode(bigrams).as("bigram"))
    // tf feeds both the model-count side and the per-document scoring
    // join — checkpoint so the corpus is tokenized/exploded once
    val tf = bg.groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val cnt = tf.groupBy(col("bigram")).agg(sum(col("tf")).as("cnt"))
    val prefixTotals = cnt
      .groupBy(substring_index(col("bigram"), " ", 1).as("__w1"))
      .agg(sum(col("cnt")).as("__w1cnt"))
    val model = cnt
      .join(broadcast(prefixTotals),
        substring_index(col("bigram"), " ", 1) === col("__w1"))
      .select(col("bigram"),
        floor(log(col("cnt").cast("double") / col("__w1cnt").cast("double")) *
          lit(1e6) + lit(0.5)).cast("long").as("__lp_micro"))
    val perDoc = tf.join(model, Seq("bigram"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        (-sum(col("tf") * col("__lp_micro"))).as("nll_micro"))
    docs.select(id.as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("nll_micro"), lit(0L)).as("nll_micro"),
        expr("nll_micro div n_bigrams").as("avg_nll_micro"))
  }

  /** Okapi BM25 ranking of documents against a bag of query `terms`:
    * score(d) = Σ_t idf(t) · tf/(tf + k1·(1 − b + b·len(d)/avgdl)), with
    * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1). Same aggregation
    * pipeline as [[tfidf]], restricted to the query terms (the per-doc tf
    * table filters BEFORE its shuffle, so cost scales with hits, not
    * vocabulary); corpus constants (N, avgdl) ride one broadcast row.
    * The corpus is tokenized ONCE: the token table is lazily
    * local-checkpointed (same pattern as Dedup's shingle table) and feeds
    * doc lengths, per-doc tf, and df(t) — which is derived from the
    * query-filtered tf table (df = rows per term there), so no
    * full-vocabulary aggregation ever runs. Deterministic double
    * arithmetic identical on any engine; rounded at 4 decimals.
    * Documents matching no term are absent (score 0). */
  def bm25(
      docs: DataFrame, id: Column, text: Column, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "at least one query term required")
    val distinct = terms.distinct
    val base = docs.select(id.as("doc_id"),
      TextFunctions.tokens(text).as("__toks"))
      .localCheckpoint(eager = false)
    val lens = base.select(col("doc_id"), size(col("__toks")).as("__len"))
    val tfQ = base.select(col("doc_id"), explode(col("__toks")).as("term"))
      .filter(col("term").isin(distinct: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    bm25From(tfQ, lens, k1, b)
  }

  /** Per-document token-distribution SHANNON ENTROPY — the classic
    * diversity/boilerplate quality signal (low entropy ⇒ a few tokens
    * dominate: repeated boilerplate; high ⇒ diverse vocabulary):
    * `H = ln(n) − (Σ_t c_t·ln(c_t))/n` over the doc's token counts.
    *
    * Engine-portable like [[unigramNll]]: each term's `c·ln(c)` is
    * quantized to integer micro-nats (`floor(x·10⁶ + 0.5)`) BEFORE the
    * per-doc sum, and the final division is integer `div` — every
    * cross-row reduction is exact integer arithmetic, so an external
    * SQL engine replays `entropy_micro` exactly (same 1-ulp `ln`
    * residual caveat as the LM scores). One (doc, term) shuffle + one
    * doc shuffle; empty docs surface with n_tokens = 0, NULL entropy. */
  def tokenEntropy(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val tf = docs.select(id.as("doc_id"),
        explode(TextFunctions.tokens(text)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("__c"))
    val agg = tf
      .select(col("doc_id"), col("__c"),
        floor(col("__c").cast("double") * log(col("__c").cast("double"))
          * lit(1e6) + lit(0.5)).cast("long").as("__m"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("__n"), sum(col("__m")).as("__s"))
    docs.select(id.as("doc_id")).join(agg, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("__n"), lit(0L)).as("n_tokens"),
        when(col("__n") > 0L,
          floor(log(col("__n").cast("double")) * lit(1e6) + lit(0.5))
            .cast("long") - expr("__s div __n"))
          .as("entropy_micro"))
  }

  /** BM25 scoring from its two sufficient statistics tables —
    * `tfQ` (doc_id, term, tf) restricted to the query terms and `lens`
    * (doc_id, __len) over the WHOLE corpus. Shared by [[bm25]] (which
    * derives both from the raw text) and
    * [[graft.text.SearchIndex.bm25Index]] (which reads them from the
    * materialized index) — one scoring body, so the two paths cannot
    * drift. */
  private[text] def bm25From(
      tfQ: DataFrame, lens: DataFrame, k1: Double, b: Double): DataFrame = {
    val dfT = tfQ.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // exact-integer token sum / doc count: avg() would fold doubles in
    // partition order; integer sums are order-independent on any engine
    val consts = lens.agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(lens.agg(
        (sum(col("__len")).cast("double") / count(lit(1)).cast("double"))
          .as("__avgdl"))))
    val idf = log((col("__n").cast("double") - col("df") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5)) + lit(1.0))
    val norm = col("tf").cast("double") +
      lit(k1) * (lit(1.0 - b) + lit(b) * col("__len").cast("double") / col("__avgdl"))
    tfQ.join(broadcast(dfT), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(consts))
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * col("tf").cast("double") / norm), 4).as("bm25"))
  }
}

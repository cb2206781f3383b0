package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid lexical + vector retrieval with reciprocal-rank fusion (RRF,
  * Cormack et al. 2009): fuse a BM25 ranking and an embedding-cosine
  * ranking by `Σ 1/(c + rank)` — the standard zero-tuning combiner for
  * keyword+semantic search over a document corpus (score scales never
  * need calibrating because only RANKS enter the sum).
  *
  * Scale shape: each retriever reduces the corpus to its top-N
  * candidates DISTRIBUTED (BM25 via the query-term-filtered aggregation
  * in [[Tfidf.bm25]], cosine via a map-side scored scan; both end in
  * TakeOrdered — the O(N)-driver top-k pattern). Fusion then runs on
  * ≤ 2N rows, so the rank windows are bounded single-partition passes
  * over the candidate lists, never the corpus. N is the recall knob.
  *
  * Engine-portable determinism: ranks are assigned over the ROUNDED
  * scores (BM25 4dp, cosine 6dp — the cross-engine double noise floors
  * the repo's other oracles established) with id tie-breaks, and the
  * fused ordering uses the ROUNDED rrf — so an external SQL engine
  * replays the exact result. */
object Hybrid {

  /** Fuse two candidate lists by reciprocal-rank fusion. Inputs are
    * (id, score) DataFrames ALREADY reduced to top-N candidates; a
    * document absent from one list simply contributes no term for it
    * (standard RRF). Returns the top `k` of
    * `rrf = Σ_present 1/(c + rank)` with rank ties broken by id.
    * Output: (id, lex_rank, vec_rank, rrf). */
  def rrfFuse(lexical: DataFrame, vector: DataFrame, k: Int,
      c: Int = 60): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(c >= 0, s"rrf constant must be >= 0: $c")
    val Seq(lexId, lexScore) = lexical.columns.toSeq.take(2)
    val Seq(vecId, vecScore) = vector.columns.toSeq.take(2)
    // candidate lists are N-sized by contract — the windows here rank a
    // bounded list, not a table (see class doc). They are PARTITIONED on
    // a value-derived constant bucket so the single-task plan is
    // explicit in the spec instead of tripping WindowExec's
    // partition-less warning wall. The bucket derives from hash(score):
    // hash() is total (never null/NaN, always > -Inf), so EVERY row —
    // null, NaN, or -Infinity scores included — lands in the same
    // bucket 1 and row_number stays a single global rank (a score-cast
    // bucket would give null/NaN/-Inf their own partition and restart
    // rank at 1, colliding with the real rank 1).
    val oneBucket = (s: Column) =>
      graft.functions.exprs.bucket_by_bounds(hash(s).cast("double"),
        Seq(Double.NegativeInfinity))
    val lr = lexical.select(col(lexId).as("id"), col(lexScore).as("__s"))
      .withColumn("lex_rank", row_number()
        .over(Window.partitionBy(oneBucket(col("__s")))
          .orderBy(col("__s").desc, col("id").asc)).cast("long"))
      .drop("__s")
    val vr = vector.select(col(vecId).as("id"), col(vecScore).as("__s"))
      .withColumn("vec_rank", row_number()
        .over(Window.partitionBy(oneBucket(col("__s")))
          .orderBy(col("__s").desc, col("id").asc)).cast("long"))
      .drop("__s")
    lr.join(vr, Seq("id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(c.toDouble) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c.toDouble) + col("vec_rank")), lit(0.0)),
        6))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(k)
  }

  /** End-to-end hybrid retrieval: BM25 over `docs(text)` for `terms`
    * and brute-force cosine over `embeddings(vec)` for `queryVec`, each
    * reduced to `nCandidates`, fused to the top `k` by RRF. The two id
    * columns must share an id space. */
  def hybridRetrieve(
      docs: DataFrame, id: Column, text: Column,
      embeddings: DataFrame, embId: Column, vec: Column,
      terms: Seq[String], queryVec: Seq[Double],
      nCandidates: Int, k: Int, c: Int = 60): DataFrame = {
    require(nCandidates >= k, s"nCandidates ($nCandidates) must cover k ($k)")
    val lex = Tfidf.bm25(docs, id, text, terms)
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(nCandidates)
    val vr = graft.ann.Ann.bruteForceTopK(
        embeddings, embId, vec, queryVec, k = nCandidates)
      .select(col("neighbor_id"), col("cosine"))
    rrfFuse(lex, vr, k, c)
  }
}

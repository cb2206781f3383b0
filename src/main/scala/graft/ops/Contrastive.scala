package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.exprs

/** Contrastive-training pair preparation: deterministic NEGATIVE
  * sampling against a dense-id corpus.
  *
  * For each query id, `k` pseudo-random corpus ids that are NOT among
  * its positives, drawn by hash probing: probe slot `i` proposes
  * `md5(salt:q:i) mod corpusSize` — a fixed, rerun-stable, engine-
  * replayable sequence (the repo's salted-md5 sampling discipline), so
  * the training set is reproducible anywhere. The probe table is
  * `k·oversample` rows PER QUERY built map-side (no query×corpus
  * blow-up — the classic scale trap of "rank all non-positives"); the
  * only joins are a positives anti-join on (query, candidate) and the
  * per-query windows run over the bounded probe rows. Collisions
  * (duplicate proposals, positive hits) consume oversample headroom —
  * raise `oversample` if queries come back short (they surface with
  * fewer than k rows rather than silently repeating a negative).
  *
  * Contract: corpus ids are the DENSE range [0, corpusSize) — the
  * standard post-curation contiguous re-index (true of every table
  * here). For sparse id spaces, probe against a dense row-number index
  * first. */
object Contrastive {

  /** (q_id, neg_id, rank) — up to `k` negatives per distinct query in
    * `positives`, rank 1..k in probe order. */
  def sampleNegatives(
      positives: DataFrame, qCol: Column, posCol: Column,
      corpusSize: Int, k: Int,
      salt: String = "graft", oversample: Int = 4): DataFrame = {
    require(corpusSize >= 1, s"corpusSize must be >= 1: $corpusSize")
    require(k >= 1, s"k must be >= 1: $k")
    require(oversample >= 2, s"oversample must be >= 2: $oversample")
    val pos = positives.select(qCol.as("q_id"), posCol.as("pos_id"))
    val probes = pos.select(col("q_id")).distinct()
      .select(col("q_id"),
        explode(sequence(lit(0), lit(k * oversample - 1))).as("slot"))
      .select(col("q_id"), col("slot"),
        exprs.md5_bucket(
          concat(lit(s"$salt:"), col("q_id").cast("string"),
            lit(":"), col("slot").cast("string")),
          corpusSize).cast("long").as("neg_id"))
    // first proposal of a duplicate candidate wins; positives drop out
    val wDup = Window.partitionBy(col("q_id"), col("neg_id"))
      .orderBy(col("slot"))
    val wRank = Window.partitionBy(col("q_id")).orderBy(col("slot"))
    probes
      .withColumn("__first", row_number().over(wDup))
      .filter(col("__first") === 1).drop("__first")
      .join(pos.withColumnRenamed("pos_id", "neg_id"),
        Seq("q_id", "neg_id"), "left_anti")
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("neg_id"), col("rank"))
  }

  /** Adjacent-chunk POSITIVE pairs — the standard self-supervised
    * positives for contrastive pretraining: consecutive sliding-window
    * chunks of one document ([[graft.text.TextFunctions.chunkDocs]])
    * paired (anchor, positive). One doc-key shuffle; the lead window
    * runs over each doc's bounded chunk list. Returns
    * (doc_id, chunk_idx, anchor, positive). */
  def adjacentChunkPairs(
      docs: DataFrame, id: Column, text: Column,
      chunkTokens: Int = 32, stride: Int = 16): DataFrame = {
    val chunks = graft.text.TextFunctions.chunkDocs(
      docs, id, text, chunkTokens, stride)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_idx"))
    chunks
      .withColumn("positive", lead(col("chunk_text"), 1).over(w))
      .filter(col("positive").isNotNull)
      .select(col("doc_id"), col("chunk_idx"),
        col("chunk_text").as("anchor"), col("positive"))
  }
}

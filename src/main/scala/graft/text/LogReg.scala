package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained weights of a hashed-n-gram logistic-regression classifier:
  * micro-unit (×10⁶) integer weights per OBSERVED feature bucket (unseen
  * buckets score 0) plus an intercept. Bounded by `buckets` entries — at
  * any corpus scale the model is a broadcast-sized object. */
case class LogRegModel(
    buckets: Int, interceptMicro: Long, weightsMicro: Map[Int, Long])

/** Trained document-quality classifier — the fastText/WebText-style filter
  * every large pretraining corpus is gated by (GPT-3's "high-quality
  * document" LR over curated positives vs random crawl negatives): binary
  * logistic regression over the SAME hashed unigram+bigram buckets as
  * [[Dsir]], trained by full-batch gradient descent.
  *
  * Determinism (and hence oracle replayability): the only cross-row
  * reductions are exact integer sums. Weights live in integer micro-units;
  * a document's margin Σ tf·w_micro + b_micro is exact integer arithmetic;
  * the per-document residual y − σ(margin) quantizes to integer micro-units
  * BEFORE the per-bucket gradient sum; the weight update divides with
  * Java `/` — truncation toward zero, which is exactly DuckDB's integer
  * `//` (verified: −7 // 2 = −3) and Spark SQL's `div`, so the oracle's
  * negative-gradient updates replay bit-for-bit. The single transcendental
  * (exp inside σ) sits immediately before a quantization, the same
  * accepted 1-ulp caveat as [[Tfidf.unigramNll]]'s ln.
  *
  * Scale shape: featurization is one map-side codegen pass + TWO shuffles
  * (to (doc_id, bucket) counts, then to one bounded feature array per
  * document — ≤ `buckets` entries each), checkpointed once. Each GD
  * iteration is then ONE Spark job with no doc-keyed shuffle at all:
  * margins and residuals evaluate map-side over the feature arrays
  * (weights ride the plan as a ≤ `buckets`-entry map literal), per-bucket
  * gradients partial-aggregate map-side, and only ≤ `buckets`+1 rows (the
  * bucket gradients plus a sentinel for the intercept) cross the network
  * to the driver. (A broadcast-join + re-aggregation formulation was
  * measured first: Catalyst re-shuffles the checkpointed table every
  * iteration because a LogicalRDD does not carry its writer's
  * partitioning — the array formulation sidesteps the shuffle instead of
  * trying to reuse it.) Scoring 100 TB is one broadcast join + one
  * aggregation.
  */
object LogReg {

  /** Fit by `iters` full-batch GD steps at learning rate `etaMilli`/1000.
    * `pos`/`neg` are the labeled corpora (y = 1 / y = 0). */
  def fit(
      pos: DataFrame, neg: DataFrame, id: Column, text: Column,
      buckets: Int = 1024, iters: Int = 5, etaMilli: Long = 500): LogRegModel = {
    val labeled = pos.select(id.as("doc_id"), text.as("__text"), lit(1L).as("y"))
      .unionByName(
        neg.select(id.as("doc_id"), text.as("__text"), lit(0L).as("y")))
    fitOnTf(labeled.select(col("doc_id"), col("y")),
      Dsir.featureTf(labeled, col("doc_id"), col("__text"), buckets),
      buckets, iters, etaMilli)
  }

  /** [[fit]] over a PRECOMPUTED featurization — the shared-tf entry for
    * pipelines that featurize the corpus once and feed several models
    * (fit + score + DSIR read the same (doc_id, bucket, tf) table instead
    * of re-running tokenize→hash per consumer). `labels` = (doc_id,
    * y ∈ {0L, 1L}) for every labeled doc; `tf` must be
    * [[Dsir.featureTf]]'s output restricted to exactly those docs.
    * Identical arithmetic to [[fit]] — the wrapper above IS this method. */
  def fitOnTf(
      labels: DataFrame, tf: DataFrame,
      buckets: Int, iters: Int = 5, etaMilli: Long = 500): LogRegModel = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(etaMilli >= 1, s"etaMilli must be >= 1: $etaMilli")
    // One featurization pass, folded to ONE bounded array per document
    // (≤ `buckets` distinct entries — the bucket domain caps the row) so
    // every GD iteration can evaluate margins entirely map-side.
    val emptyFeats = array().cast("array<struct<bucket:int,tf:bigint>>")
    val docFeats = labels
      .join(
        tf.groupBy(col("doc_id"))
          .agg(collect_list(struct(col("bucket"), col("tf"))).as("__feats")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("y"),
        coalesce(col("__feats"), emptyFeats).as("__feats"))
      .localCheckpoint(eager = false)
    val n = docFeats.count()
    require(n > 0, "at least one labeled document required")

    var w = Map.empty[Int, Long]
    var b = 0L
    for (_ <- 0 until iters) {
      // One job: per-bucket gradient rows plus a bucket -1 sentinel
      // carrying the doc's residual (the intercept gradient) — partial
      // aggregation means only ≤ buckets+1 rows leave any task. The
      // whole per-document pass (margin → sigmoid → residual → gradient
      // rows) is ONE compiled kernel ([[graft.functions.LogRegGradient]],
      // arithmetic bit-identical to the former aggregate/transform HOF
      // pair whose lambdas evaluated interpreted per feature); weights
      // ride the expression OBJECT, so iterations reuse one codegen
      // class instead of recompiling a dense-literal plan per step.
      val wArr = Array.tabulate(buckets)(bkt => w.getOrElse(bkt, 0L)).toSeq
      val g = docFeats
        .select(explode(graft.functions.exprs.logreg_gradient(
          col("__feats"), col("y"), wArr, b)).as("e"))
        .groupBy(col("e.bucket"))
        .agg(sum(col("e.g")).as("__g"))
        .collect().map(row => row.getInt(0) -> row.getLong(1)).toMap
      val g0 = g.getOrElse(-1, 0L)
      // |residual| ≤ 10⁶, so a gradient sum is bounded by 10⁶ · Σ tf over
      // the bucket; guard the etaMilli multiply before it can wrap. (A
      // corpus putting > ~9·10¹² feature occurrences in ONE bucket needs
      // a larger bucket count before it needs this classifier.)
      g.valuesIterator.foreach { v =>
        require(math.abs(v) <= Long.MaxValue / etaMilli,
          s"gradient $v would overflow the etaMilli=$etaMilli update; " +
            "increase buckets or lower etaMilli")
      }
      w = (w.keySet ++ g.keySet - (-1)).iterator.map { bkt =>
        bkt -> (w.getOrElse(bkt, 0L) +
          etaMilli * g.getOrElse(bkt, 0L) / (1000L * n))
      }.toMap
      b += etaMilli * g0 / (1000L * n)
    }
    LogRegModel(buckets, b, w)
  }

  /** Score every document under a fitted model. Documents with no features
    * get margin = intercept. margin_micro > 0 ⟺ p(quality) > 1/2.
    *
    * @return (doc_id, n_features, margin_micro)
    */
  def score(
      docs: DataFrame, id: Column, text: Column, model: LogRegModel): DataFrame =
    scoreOnTf(docs.select(id.as("doc_id")),
      Dsir.featureTf(docs, id, text, model.buckets), model)

  /** [[score]] over a PRECOMPUTED featurization (see [[fitOnTf]]):
    * `ids` = one (doc_id) row per doc to score, `tf` their featureTf
    * table. Identical arithmetic to [[score]]. */
  def scoreOnTf(
      ids: DataFrame, tf: DataFrame, model: LogRegModel): DataFrame = {
    val spark = ids.sparkSession
    val wDf =
      if (model.weightsMicro.isEmpty)
        spark.createDataFrame(Seq.empty[(Int, Long)]).toDF("bucket", "w")
      else spark.createDataFrame(model.weightsMicro.toSeq).toDF("bucket", "w")
    val perDoc = tf
      .join(broadcast(wDf), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_features"),
        sum(col("tf") * coalesce(col("w"), lit(0L))).as("__dot"))
    ids.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_features"), lit(0L)).as("n_features"),
        (coalesce(col("__dot"), lit(0L)) + lit(model.interceptMicro))
          .as("margin_micro"))
  }
}

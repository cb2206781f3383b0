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
  * Scale shape: featurization is one map-side codegen pass + ONE shuffle to
  * (doc_id, bucket) counts, repartitioned by doc_id and checkpointed once.
  * Each iteration then runs margin (broadcast weight join + exchange-free
  * doc aggregation on the co-partitioned table), residual, and a gradient
  * aggregation whose output is ≤ `buckets` rows — the only data reaching
  * the driver, per iteration, is the model itself. Scoring 100 TB is one
  * broadcast join + one aggregation.
  */
object LogReg {

  /** Fit by `iters` full-batch GD steps at learning rate `etaMilli`/1000.
    * `pos`/`neg` are the labeled corpora (y = 1 / y = 0). */
  def fit(
      pos: DataFrame, neg: DataFrame, id: Column, text: Column,
      buckets: Int = 1024, iters: Int = 5, etaMilli: Long = 500): LogRegModel = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(etaMilli >= 1, s"etaMilli must be >= 1: $etaMilli")
    val labeled = pos.select(id.as("doc_id"), text.as("__text"), lit(1L).as("y"))
      .unionByName(
        neg.select(id.as("doc_id"), text.as("__text"), lit(0L).as("y")))
    // One featurization pass; co-partition by doc so every per-iteration
    // doc-keyed aggregation and join is exchange-free.
    val tf = Dsir.featureTf(labeled, col("doc_id"), col("__text"), buckets)
      .repartition(col("doc_id"))
      .localCheckpoint(eager = false)
    val labels = labeled.select(col("doc_id"), col("y"))
      .repartition(col("doc_id"))
      .localCheckpoint(eager = false)
    val n = labels.count()
    require(n > 0, "at least one labeled document required")

    val spark = pos.sparkSession
    var w = Map.empty[Int, Long]
    var b = 0L
    for (_ <- 0 until iters) {
      val wDf =
        if (w.isEmpty) spark.createDataFrame(Seq.empty[(Int, Long)])
          .toDF("bucket", "w")
        else spark.createDataFrame(w.toSeq).toDF("bucket", "w")
      val dots = tf.join(broadcast(wDf), Seq("bucket"), "left")
        .groupBy(col("doc_id"))
        .agg(sum(col("tf") * coalesce(col("w"), lit(0L))).as("__dot"))
      // Checkpoint the residuals: both the per-bucket gradient and the
      // intercept gradient read them, and without it the broadcast join +
      // doc aggregation + sigmoid would recompute for the second action.
      val resid = labels.join(dots, Seq("doc_id"), "left")
        .select(col("doc_id"),
          floor((col("y").cast("double") -
            lit(1.0) / (lit(1.0) + exp(-(
              (coalesce(col("__dot"), lit(0L)) + lit(b)).cast("double") /
                lit(1e6))))) * lit(1e6) + lit(0.5))
            .cast("long").as("__r"))
        .localCheckpoint(eager = false)
      val g = tf.join(resid, Seq("doc_id"))
        .groupBy(col("bucket"))
        .agg(sum(col("tf") * col("__r")).as("__g"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val g0 = resid.agg(sum(col("__r"))).collect()(0).getLong(0)
      // |residual| ≤ 10⁶, so a gradient sum is bounded by 10⁶ · Σ tf over
      // the bucket; guard the etaMilli multiply before it can wrap. (A
      // corpus putting > ~9·10¹² feature occurrences in ONE bucket needs
      // a larger bucket count before it needs this classifier.)
      (g.valuesIterator ++ Iterator(g0)).foreach { v =>
        require(math.abs(v) <= Long.MaxValue / etaMilli,
          s"gradient $v would overflow the etaMilli=$etaMilli update; " +
            "increase buckets or lower etaMilli")
      }
      w = (w.keySet ++ g.keySet).iterator.map { bkt =>
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
      docs: DataFrame, id: Column, text: Column, model: LogRegModel): DataFrame = {
    val spark = docs.sparkSession
    val wDf =
      if (model.weightsMicro.isEmpty)
        spark.createDataFrame(Seq.empty[(Int, Long)]).toDF("bucket", "w")
      else spark.createDataFrame(model.weightsMicro.toSeq).toDF("bucket", "w")
    val perDoc = Dsir.featureTf(docs, id, text, model.buckets)
      .join(broadcast(wDf), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_features"),
        sum(col("tf") * coalesce(col("w"), lit(0L))).as("__dot"))
    docs.select(id.as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_features"), lit(0L)).as("n_features"),
        (coalesce(col("__dot"), lit(0L)) + lit(model.interceptMicro))
          .as("margin_micro"))
  }
}

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023): score
  * every raw-corpus document by how much more likely its hashed-n-gram
  * features are under a small TARGET corpus (the distribution you want more
  * of — e.g. curated reference text) than under the raw corpus itself, then
  * keep the highest-scoring documents. This is the domain-targeted
  * selection step of a training-data pipeline: the target fits in one
  * aggregate, the raw corpus is scored by a broadcast join — no raw-side
  * shuffle beyond one (doc, bucket) aggregation.
  *
  * Model: bag of hashed features (unigrams + bigrams of the normalized
  * token stream, md5-hashed into `buckets` buckets — the paper's hashed
  * n-gram generative model), add-one smoothing over the bucket space:
  *
  *   log w(doc) = Σ_features [ ln((t_b + 1)/(T + B)) − ln((r_b + 1)/(R + B)) ]
  *
  * with t_b/r_b the target/raw counts of the feature's bucket, T/R the
  * corpus feature totals, B = `buckets`.
  *
  * Engine portability (the [[Tfidf.unigramNll]] discipline): each per-bucket
  * log-probability quantizes to integer micro-nats BEFORE any cross-row
  * arithmetic — the log-ratio is an integer difference and the per-document
  * score an exact integer dot product, order-independent on any engine. The
  * bucket hash is [[graft.functions.Md5Bucket]] = DuckDB
  * `md5_number_lower(f) % B`, so an external SQL oracle replays membership
  * bit-for-bit. No integer division anywhere — nothing here needs one
  * (when one IS needed, Java `/`, Spark `div` and DuckDB `//` all
  * truncate toward zero and agree — see [[LogReg]]'s update rule).
  *
  * Scale shape: the raw corpus tokenizes ONCE map-side (codegen'd
  * [[graft.functions.Tokenize]]/[[graft.functions.WordShingles]]/
  * [[graft.functions.Md5Bucket]] kernels), shuffles once on (doc_id,
  * bucket) — partial aggregation caps per-task output at B rows per doc —
  * and joins a ≤ B-row broadcast ratio table. The target corpus contributes
  * one bucket-sized aggregation. Selection is a distributed
  * TakeOrdered(k), never a global sort materialization.
  */
object Dsir {

  /** (doc_id, bucket, tf) of hashed unigram+bigram features — the shared
    * featurization of the hashed-n-gram model family ([[Dsir]] importance
    * weights, [[LogReg]] logistic-regression classifier). */
  private[graft] def featureTf(
      df: DataFrame, id: Column, text: Column, buckets: Int): DataFrame = {
    val toks = TextFunctions.tokens(text)
    val bigrams = when(size(toks) >= 2,
      graft.functions.exprs.word_shingles(toks, 2))
      .otherwise(typedLit(Seq.empty[String]))
    df.select(id.as("doc_id"),
        explode(concat(toks, bigrams)).as("__f"))
      .select(col("doc_id"),
        graft.functions.exprs.md5_bucket(col("__f"), buckets).as("bucket"))
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("tf"))
  }

  /** Per-bucket smoothed log-probability in integer micro-nats:
    * (bucket, lp_micro = floor(ln((cnt+1)/(total+B))·10⁶ + 0.5)).
    * Buckets absent from `tf` are not materialized — callers must treat a
    * missing bucket as cnt = 0 (the smoothing constant). */
  private def bucketLogProbs(tf: DataFrame, buckets: Int): DataFrame = {
    val cnts = tf.groupBy(col("bucket")).agg(sum(col("tf")).as("cnt"))
    val total = cnts.agg(sum(col("cnt")).as("__t"))
    cnts.crossJoin(broadcast(total))
      .select(col("bucket"), col("cnt"),
        floor(log((col("cnt") + lit(1)).cast("double") /
          (col("__t") + lit(buckets)).cast("double")) * lit(1e6) + lit(0.5))
          .cast("long").as("lp_micro"),
        col("__t").as("__total"))
  }

  /** Importance weight of every raw document under the hashed-n-gram
    * target/raw models. Documents with no features (empty text) surface
    * with n_features = 0 and logw_micro = 0.
    *
    * @return (doc_id, n_features, logw_micro) — logw_micro is the exact
    *         integer Σ tf·(lpT_micro − lpR_micro); positive = more
    *         target-like than raw-average.
    */
  def importanceWeights(
      raw: DataFrame, target: DataFrame, id: Column, text: Column,
      buckets: Int = 4096): DataFrame =
    // raw (doc, bucket) tf feeds both the raw model counts and the scoring
    // join — checkpoint so the corpus is tokenized/exploded once
    importanceWeightsOnTf(raw.select(id.as("doc_id")),
      featureTf(raw, id, text, buckets).localCheckpoint(eager = false),
      featureTf(target, id, text, buckets), buckets)

  /** [[importanceWeights]] over PRECOMPUTED featurizations (see
    * [[LogReg.fitOnTf]]): `rawIds` = one (doc_id) per raw doc, `rawTf` /
    * `targetTf` their featureTf tables (callers checkpoint/share rawTf).
    * Identical arithmetic to [[importanceWeights]]. */
  private[graft] def importanceWeightsOnTf(
      rawIds: DataFrame, rawTf: DataFrame, targetTf: DataFrame,
      buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")

    // lpT feeds both the ratio join and the smoothing-constant total;
    // checkpoint the ≤ B-row table so the target is tokenized once.
    val lpT = bucketLogProbs(targetTf, buckets).localCheckpoint(eager = false)
    val lpR = bucketLogProbs(rawTf, buckets)
    // Unseen-in-target buckets score the smoothing constant ln(1/(T+B)):
    // rebuild it from the broadcast total (every row carries __total).
    val tTotal = lpT.agg(max(col("__total")).as("__tt"))
    val ratio = lpR.select(col("bucket"), col("lp_micro").as("__lpr"))
      .join(lpT.select(col("bucket"), col("lp_micro").as("__lpt")),
        Seq("bucket"), "left")
      .crossJoin(broadcast(tTotal))
      .select(col("bucket"),
        (coalesce(col("__lpt"),
          floor(log(lit(1.0) / (coalesce(col("__tt"), lit(0L)) + lit(buckets))
            .cast("double")) * lit(1e6) + lit(0.5)).cast("long")) -
          col("__lpr")).as("lr_micro"))

    val perDoc = rawTf.join(broadcast(ratio), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_features"),
        sum(col("tf") * col("lr_micro")).as("logw_micro"))
    rawIds.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_features"), lit(0L)).as("n_features"),
        coalesce(col("logw_micro"), lit(0L)).as("logw_micro"))
  }

  /** The selection step: the k most target-like raw documents by
    * (logw_micro desc, doc_id asc) — deterministic top-k rather than
    * Gumbel-noised resampling, so membership is a pure function of the two
    * corpora and any engine replays it. Distributed TakeOrdered(k): only k
    * rows ever reach the driver side of the sort.
    *
    * @return (doc_id, n_features, logw_micro) of the k selected documents.
    */
  def selectByImportance(
      raw: DataFrame, target: DataFrame, id: Column, text: Column, k: Int,
      buckets: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    importanceWeights(raw, target, id, text, buckets)
      .orderBy(col("logw_micro").desc, col("doc_id"))
      .limit(k)
  }


  /** Corpus-distance diagnostic: KL(target ‖ raw) over the add-one
    * smoothed hashed-feature bucket distributions, in integer micro-nats
    * — the "how far is my mixture from the target domain" number
    * data-mixing iterations steer by.
    *
    * KL = Σ_{b=0..B-1} p_t(b)·(ln p_t(b) − ln p_r(b)) with
    * p_t(b) = (t_b+1)/(T+B). Computed as an EXACT integer numerator:
    * contributions (t_b+1)·(lpT_micro − lpR_micro) summed over the union
    * of observed buckets, plus the closed-form term for the B−observed
    * buckets neither corpus saw (each contributes 1·(lpT₀ − lpR₀), the
    * two smoothing constants) — the full smoothed-model sum, no
    * truncation, no float reduction. The caller divides by (T+B)·10⁶
    * for nats.
    *
    * @return one row: (n_buckets_observed, target_total, raw_total,
    *         kl_num_micro) where KL ≈ kl_num_micro / (target_total +
    *         buckets) / 10⁶ nats.
    */
  def klDivergence(
      raw: DataFrame, target: DataFrame, id: Column, text: Column,
      buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    // Checkpoint the ≤ B-row model tables: each feeds both the full join
    // and its total aggregate, and without it the corpus-sized
    // tokenize/explode/aggregate lineage would re-execute per consumer.
    val lpT = bucketLogProbs(featureTf(target, id, text, buckets), buckets)
      .localCheckpoint(eager = false)
    val lpR = bucketLogProbs(featureTf(raw, id, text, buckets), buckets)
      .localCheckpoint(eager = false)
    val tTotal = lpT.agg(max(col("__total")).as("__tt"))
    val rTotal = lpR.agg(max(col("__total")).as("__rt"))
    def smooth(total: Column): Column =
      floor(log(lit(1.0) / (coalesce(total, lit(0L)) + lit(buckets))
        .cast("double")) * lit(1e6) + lit(0.5)).cast("long")
    val joined = lpT
      .select(col("bucket"), col("cnt").as("__tcnt"), col("lp_micro").as("__lpt"))
      .join(lpR.select(col("bucket"), col("lp_micro").as("__lpr")),
        Seq("bucket"), "full")
      .crossJoin(broadcast(tTotal)).crossJoin(broadcast(rTotal))
      .select(
        ((coalesce(col("__tcnt"), lit(0L)) + lit(1)) *
          (coalesce(col("__lpt"), smooth(col("__tt"))) -
            coalesce(col("__lpr"), smooth(col("__rt"))))).as("__contrib"))
      .agg(count(lit(1)).as("n_buckets_observed"),
        sum(col("__contrib")).as("__observed"))
    joined.crossJoin(broadcast(tTotal)).crossJoin(broadcast(rTotal))
      .select(col("n_buckets_observed"),
        coalesce(col("__tt"), lit(0L)).as("target_total"),
        coalesce(col("__rt"), lit(0L)).as("raw_total"),
        (coalesce(col("__observed"), lit(0L)) +
          (lit(buckets) - col("n_buckets_observed")) *
            (smooth(col("__tt")) - smooth(col("__rt")))).as("kl_num_micro"))
  }

  /** The paper's actual sampler — importance RESAMPLING without
    * replacement via the Gumbel-top-k trick (Vieira 2014): each document
    * gets key = log w + G_i with G_i standard Gumbel noise, and the k
    * largest keys are a without-replacement sample with P ∝ w. The noise
    * is DETERMINISTIC pseudo-randomness from the salted md5 of the id
    * (the [[graft.ops.Sampling]] discipline): u = ((md5-lower-64 >>> 11)
    * + 0.5) / 2⁵³ — a (0,1)-exclusive uniform built identically from
    * DuckDB's `md5_number_lower(salt || '|' || id) >> 11`, so membership
    * replays on any engine — and G = −ln(−ln u) quantizes to integer
    * micro-units before the rank. Same distributed TakeOrdered(k) shape
    * as [[selectByImportance]]; rerunning with the same salt is
    * idempotent, a new salt draws a fresh sample.
    *
    * @return (doc_id, n_features, logw_micro, key_micro) of the k sampled
    *         documents.
    */
  def resampleByImportance(
      raw: DataFrame, target: DataFrame, id: Column, text: Column, k: Int,
      salt: String, buckets: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    importanceWeights(raw, target, id, text, buckets)
      .withColumn("key_micro", col("logw_micro") + gumbelMicro(salt))
      .orderBy(col("key_micro").desc, col("doc_id"))
      .limit(k)
  }


  /** Deterministic salted-md5 Gumbel key in integer micro-units. */
  private def gumbelMicro(salt: String): Column = {
    val u = (shiftrightunsigned(
      graft.functions.exprs.md5_lower64(
        concat_ws("|", lit(salt), col("doc_id").cast("string"))), 11)
      .cast("double") + lit(0.5)) / lit(9007199254740992.0) // 2^53
    floor(-log(-log(u)) * lit(1e6) + lit(0.5)).cast("long")
  }
}

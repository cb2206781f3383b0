package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for dataset curation. Random
  * sampling (`df.sample`) is nondeterministic across retries and
  * partitionings — a rerun of the pipeline yields a different corpus.
  * These operators derive every keep/drop decision from a salted hash of
  * the row's id, so the sample is a pure function of (data, salt): stable
  * under retries, re-partitioning, and incremental re-runs, and
  * reproducible by any engine that can md5 (which is how the DuckDB
  * oracle checks them value-for-value).
  */
object Sampling extends org.apache.spark.internal.Logging {

  /** Hex md5 of `salt|id` — the shared ranking key. Lowercase fixed-width
    * hex compares lexicographically exactly like the underlying 128-bit
    * number, in any engine. */
  private def rankHash(id: Column, salt: String): Column =
    md5(concat_ws("|", lit(salt), id.cast("string")))

  /** Exact-N-per-stratum sample: within each stratum, rank rows by the
    * salted id hash (id as tie-break) and keep the first `n`.
    *
    * Scale: one shuffle on the stratum key; each stratum sorts in its
    * partition. A pathologically hot stratum degrades to one task's
    * sort — pre-filter with [[hashSample]] at a generous fraction first
    * (hash-fraction ∘ rank keeps determinism) to bound the sort input.
    */
  def stratifiedSample(
      df: DataFrame, stratum: Column, id: Column, n: Int,
      salt: String = "graft"): DataFrame = {
    require(n > 0, "n must be positive")
    val w = Window.partitionBy(stratum).orderBy(rankHash(id, salt), id)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic Bernoulli-style sample: keep a row iff the first 8 hex
    * digits of its salted id hash fall below `fraction` of the 32-bit
    * space. Pure map-side filter — no shuffle, no state; the same row is
    * kept in every rerun and on every engine. Granularity 1/2³². */
  def hashSample(
      df: DataFrame, id: Column, fraction: Double,
      salt: String = "graft"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.filter(concat(lit("0"), substring(rankHash(id, salt), 1, 8))
      < lit(thresholdHex(fraction)))
  }

  /** Per-stratum [[hashSample]] — the domain-mixing primitive: each
    * stratum keeps its own fraction (e.g. up-weight curated sources,
    * down-weight crawl). Still a pure map-side filter: the per-stratum
    * thresholds compile into one CASE expression, no shuffle, no
    * stratum-size pre-pass. */
  def weightedHashSample(
      df: DataFrame, id: Column, stratum: Column,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = "graft"): DataFrame = {
    (fractions.values ++ Seq(defaultFraction)).foreach(f =>
      require(f >= 0.0 && f <= 1.0, s"fractions must be in [0,1]: $f"))
    // sorted for a deterministic CASE chain (Map order is not)
    val thr = fractions.toSeq.sortBy(_._1).foldLeft(lit(thresholdHex(defaultFraction))) {
      case (acc, (k, f)) => when(stratum === k, lit(thresholdHex(f))).otherwise(acc)
    }
    df.filter(concat(lit("0"), substring(rankHash(id, salt), 1, 8)) < thr)
  }

  /** Deterministic train/val/test split: every row gets a `split` label
    * from the hash-range its salted id falls into — disjoint, exhaustive,
    * stable under reruns/repartitioning, and consistent with
    * [[hashSample]]'s keep set (same hash, same ordering). Map-side only.
    *
    * @param splits (label, weight) in priority order; weights sum to 1 */
  def assignSplit(
      df: DataFrame, id: Column, splits: Seq[(String, Double)],
      salt: String = "graft"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    splits.foreach { case (_, w) => require(w >= 0.0, s"negative weight: $w") }
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1: ${splits.map(_._2).sum}")
    val h = concat(lit("0"), substring(rankHash(id, salt), 1, 8))
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    val label = splits.init.zip(cum.init) match {
      case Nil => lit(splits.last._1)
      case (first, c0) +: rest =>
        rest.foldLeft(when(h < lit(thresholdHex(c0)), first._1)) {
          case (acc, ((name, _), c)) => acc.when(h < lit(thresholdHex(c)), name)
        }.otherwise(splits.last._1)
    }
    df.withColumn("split", label)
  }

  /** Corpus mixing to TARGET COMPOSITION — the budgeting layer above
    * [[weightedHashSample]]: given per-source weights (the composition the
    * training mix should have) it derives each source's sampling fraction
    * from the actual source sizes, optionally REPLICATING small sources
    * for multiple epochs (the Pile/LLaMA-style up-weighting of curated
    * sources against crawl).
    *
    * Derivation (all arithmetic in closed form so a SQL oracle replays it
    * bit-for-bit): normalized weight w_i, source size n_i, total target
    * T (`totalRows`, or the largest downsample-only mixture
    * min_i floor(n_i / w_i) when omitted); per-source target
    * t_i = floor(w_i·T + 0.5); epochs e_i = ceil(t_i / n_i) (1 unless
    * `allowUpsample`); keep fraction f_i = t_i / (n_i·e_i) over the
    * (id, epoch) candidate pairs, decided by the same salted-md5 rank as
    * [[hashSample]]. Expected |out_i| = t_i with 1/2³² granularity —
    * membership, like every operator here, is exact and rerun-stable.
    *
    * Scale: one k-row count aggregate (k = #sources, driver-collected),
    * then a pure map-side epoch-explode + hash filter — the corpus never
    * shuffles; a 100 TB mix runs at scan speed. Output adds an `epoch`
    * column (0-based; always 0 without upsampling) so downstream dedup
    * can distinguish deliberate replicas.
    */
  def mixCorpus(
      df: DataFrame, id: Column, source: Column,
      weights: Map[String, Double],
      totalRows: Long = -1L,
      allowUpsample: Boolean = false,
      salt: String = "graft"): DataFrame = {
    require(weights.nonEmpty, "at least one source weight required")
    weights.foreach { case (k, w) => require(w > 0.0, s"weight for $k must be > 0: $w") }
    val wsum = weights.values.sum
    val norm = weights.view.mapValues(_ / wsum).toMap
    val keys = weights.keys.toSeq.sorted

    val counts: Map[String, Long] = df
      .filter(source.isin(keys: _*))
      .groupBy(source.as("__src")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = keys.filterNot(k => counts.getOrElse(k, 0L) > 0L)
    require(missing.isEmpty, s"sources with no rows: ${missing.mkString(", ")}")

    val t = if (totalRows > 0L) totalRows
      else keys.map(k => math.floor(counts(k) / norm(k)).toLong).min
    val plan: Seq[(String, Long, Double)] = keys.map { k =>
      val target = math.floor(norm(k) * t + 0.5).toLong
      val epochs = (target + counts(k) - 1) / counts(k) // ceil, ≥ 1
      require(epochs == 1L || allowUpsample,
        s"source $k needs $epochs epochs for its target ($target of ${counts(k)} " +
          "rows); pass allowUpsample = true to replicate it")
      (k, math.max(1L, epochs), target.toDouble / (counts(k) * math.max(1L, epochs)))
    }

    applyMixPlan(df, id, source,
      plan.map { case (k, e, f) => (k, e, thresholdHex(f)) }, salt)
  }

  /** Temperature-weighted corpus mix at τ = 2 (w_i ∝ √n_i) — the
    * standard up-weighting of small sources against dominant ones in
    * multilingual / multi-source training mixes (temperature sampling
    * p_i ∝ q_i^(1/τ)). Same contract as [[mixCorpus]] — the weights are
    * DERIVED from the observed source sizes instead of passed in.
    *
    * Every step is EXACT INTEGER arithmetic so any engine with 128-bit
    * integers (DuckDB `HUGEINT`) replays membership bit-for-bit — no
    * floating-point sum whose result depends on operand order, and no
    * `pow()` whose last ulp varies by libm (which is why τ is fixed at
    * 2: `sqrt` is IEEE-754 correctly-rounded everywhere; for other τ
    * compute weights externally and call [[mixCorpus]]):
    *
    *   s_i   = ⌊√(n_i·10⁶)⌋          (integer milli-sqrt; one IEEE
    *                                  double conversion + sqrt + floor,
    *                                  identical on every IEEE engine)
    *   S     = Σ s_i                  (integer sum — order-free)
    *   T     = min_i ⌊n_i·S / s_i⌋   (largest downsample-only total),
    *           or `totalRows` when given
    *   t_i   = ⌊s_i·T/S + ½⌋ = (2·s_i·T + S) div (2·S)
    *   e_i   = ⌈t_i / n_i⌉ (1 unless `allowUpsample`)
    *   thr_i = (t_i·2³³ + n_i·e_i) div (2·n_i·e_i)   (= round(f·2³²))
    *
    * All products stay within 128 bits far past 100 TB row counts
    * (n_i ≤ 2⁶³, s_i ≤ 2³², S ≤ k·2³²). Scale shape is [[mixCorpus]]'s:
    * one k-row count aggregate, then a map-side epoch-explode + hash
    * filter — the corpus never shuffles. */
  def mixCorpusTemperature(
      df: DataFrame, id: Column, source: Column,
      sources: Seq[String],
      totalRows: Long = -1L,
      allowUpsample: Boolean = false,
      salt: String = "graft"): DataFrame = {
    require(sources.nonEmpty, "at least one source required")
    require(sources.distinct.size == sources.size,
      s"duplicate sources: ${sources.diff(sources.distinct).mkString(", ")}")
    val keys = sources.sorted

    val counts: Map[String, Long] = df
      .filter(source.isin(keys: _*))
      .groupBy(source.as("__src")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = keys.filterNot(k => counts.getOrElse(k, 0L) > 0L)
    require(missing.isEmpty, s"sources with no rows: ${missing.mkString(", ")}")

    val s: Map[String, BigInt] = keys.map { k =>
      k -> BigInt(math.floor(math.sqrt(counts(k).toDouble * 1000000.0)).toLong)
    }.toMap
    val bigS = s.values.sum
    val t: BigInt = if (totalRows > 0L) BigInt(totalRows)
      else keys.map(k => BigInt(counts(k)) * bigS / s(k)).min
    val plan: Seq[(String, Long, String)] = keys.map { k =>
      val target = (2 * s(k) * t + bigS) / (2 * bigS)
      val n = BigInt(counts(k))
      val epochs = ((target + n - 1) / n).max(1).toLong
      require(epochs == 1L || allowUpsample,
        s"source $k needs $epochs epochs for its target ($target of ${counts(k)} " +
          "rows); pass allowUpsample = true to replicate it")
      val denom = n * epochs
      val thr = ((target * 8589934592L + denom) / (2 * denom))
        .min(BigInt(4294967296L))
      (k, epochs, f"${thr.toLong}%09x")
    }
    applyMixPlan(df, id, source, plan, salt)
  }

  /** Shared tail of the mixing operators: epoch-explode each kept source
    * to its replica count, then keep (id, epoch) pairs whose salted md5
    * prefix falls under the source's 9-hex-digit threshold. Pure
    * map-side — no shuffle. */
  private def applyMixPlan(
      df: DataFrame, id: Column, source: Column,
      plan: Seq[(String, Long, String)], salt: String): DataFrame = {
    val keys = plan.map(_._1)
    val epochsOf = plan.foldLeft(lit(1L)) { case (acc, (k, e, _)) =>
      when(source === k, lit(e)).otherwise(acc)
    }
    val thresholdOf = plan.foldLeft(lit(thresholdHex(0.0))) { case (acc, (k, _, h)) =>
      when(source === k, lit(h)).otherwise(acc)
    }
    df.filter(source.isin(keys: _*))
      .withColumn("epoch", explode(sequence(lit(0L), epochsOf - 1)))
      .filter(concat(lit("0"),
        substring(md5(concat_ws("|", lit(salt), id.cast("string"),
          col("epoch").cast("string"))), 1, 8)) < thresholdOf)
  }

  // Both compare sides zero-padded to 9 hex digits so fraction=1.0
  // (0x100000000, above every 32-bit prefix) still compares correctly
  // as a string.
  private[ops] def thresholdHex(fraction: Double): String =
    f"${math.round(fraction * 4294967296.0).min(4294967296L)}%09x"

  /** Keep rows whose RANK position over `score` falls in the integer
    * percent band [loPct, hiPct) — CCNet's keep-the-middle recipe by
    * PERCENTILE instead of fixed thresholds (a band of values must be
    * re-tuned per corpus; a band of ranks self-calibrates).
    *
    * Exact and engine-portable by construction: a row's position is the
    * EXCLUSIVE count of strictly-smaller scores (all ties share one
    * position, so membership is a function of the score value alone),
    * and the band test is pure integer arithmetic
    * (100·pos ≥ loPct·N ∧ 100·pos < hiPct·N). Rows with NULL score are
    * dropped (NULL ordering differs across engines).
    *
    * Scale: one distributed groupBy(score) builds the per-value counts;
    * the exclusive cumulative position over distinct scores is then
    * produced DISTRIBUTED by [[GlobalOrder.exclusivePrefixSum]]
    * (quantile-bucketed, PARTITIONED window + bucket offsets) — a
    * continuous double score no longer degrades to an all-distinct
    * single-task window. The band's score values semi-join back
    * (equi-join; sized like the distinct values). Non-numeric score
    * types fall back to one bucket inside GlobalOrder (quantile
    * boundaries need a numeric axis) — quantize or rank-encode such
    * scores upstream. */
  def filterByScoreBand(
      df: DataFrame, score: Column, loPct: Int, hiPct: Int): DataFrame = {
    require(0 <= loPct && loPct < hiPct && hiPct <= 100,
      s"need 0 <= loPct < hiPct <= 100: [$loPct, $hiPct)")
    val nn = df.filter(score.isNotNull)
    val n = nn.count()
    if (n == 0) return nn
    val counts = nn.groupBy(score.as("__s")).agg(count(lit(1)).as("__c"))
    // caller-specific overflow advice: a GlobalOrder bucket here holds
    // DISTINCT score values, so overflow means the quantile sketch could
    // not band them — reported in score-band vocabulary, not GlobalOrder's
    val (ranked, stats) = GlobalOrder.exclusivePrefixSumStats(
      counts, Seq(col("__s")), col("__c"), "__pos",
      warner = Some((b, cnt) => logWarning(s"filterByScoreBand: $cnt " +
        s"distinct score values collapsed into one rank bucket ($b) — the " +
        "band stays exact but ranks inside it compute in ONE task; " +
        "spread the score distribution or rank-encode it upstream")))
    // the band resolves in units of WHOLE score values (all ties share
    // one position). A single value repeated >= the band's width means
    // the kept fraction can deviate arbitrarily from [loPct, hiPct) —
    // exact by the documented semantics, but worth a loud heads-up.
    if (stats.maxRowWeight * 100L >= (hiPct - loPct).toLong * n)
      logWarning(s"filterByScoreBand: one score value repeats " +
        s"${stats.maxRowWeight} of $n rows (>= the requested " +
        s"${hiPct - loPct}% band) — rank-band membership is all-or-nothing " +
        "per value, so the kept fraction can deviate far from the band; " +
        "quantize the score less aggressively or add a tiebreak axis " +
        "into the score upstream")
    val kept = ranked
      .filter(lit(100L) * col("__pos") >= lit(loPct.toLong * n) &&
        lit(100L) * col("__pos") < lit(hiPct.toLong * n))
      .select(col("__s"))
    nn.join(kept, score === col("__s"), "left_semi")
  }
}

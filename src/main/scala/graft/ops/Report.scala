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
  private def perDocSignals(
      df: DataFrame, source: Column, text: Column): DataFrame =
    df.select(
      source.as("source"),
      text.as("__text"),
      TextFunctions.tokenCount(text).cast("long").as("__nt"),
      length(text).cast("long").as("__chars"),
      round(TextFunctions.qualityScore(text) * lit(10000.0), 0)
        .cast("long").as("__qmicro"),
      TextFunctions.langId(text).as("__lang"))

  def corpusDataCard(
      df: DataFrame, source: Column, text: Column): DataFrame = {
    perDocSignals(df, source, text)
      .withColumn("__h", md5(col("__text")))
      .groupBy(col("source"))
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

  // ---- incremental (segment/streaming) data card ----------------------
  //
  // Every exact-card signal except dup_docs is an integer SUM — freely
  // mergeable — and dup_docs' exact per-group DISTINCT is the one term
  // that cannot merge, so the incremental card swaps it for the
  // portable per-group HLL distinct estimate ([[Hll.groupRegisters]] /
  // [[Hll.groupEstimateFromRegisters]] — register-wise max merges, the
  // estimator replays in SQL). Per-batch partials land as COMMITTED
  // SEGMENTS; the read-time merge equals a one-shot build over all
  // ingested data, so a live card costs one batch-sized pass per batch.

  private def cardSpec(p: Int): String = s"datacard:v1 p=$p"

  /** The mergeable per-source integer partials of the card. */
  def dataCardCounts(
      df: DataFrame, source: Column, text: Column): DataFrame =
    countsFromSignals(perDocSignals(df, source, text))

  private def countsFromSignals(sigs: DataFrame): DataFrame =
    sigs.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        sum(col("__chars")).as("n_chars"),
        count(when(col("__lang") === "en", 1)).as("n_en"),
        count(when(col("__lang") === "und", 1)).as("n_und"),
        sum(col("__qmicro")).as("qsum"))

  /** Append one batch's card partials (count sums + per-source HLL
    * registers over the doc text) as a COMMITTED SEGMENT. Crash/retry
    * semantics as in the other sketch tables: a re-delivered batch
    * overwrites its own segment. */
  def appendDataCardSegment(
      df: DataFrame, source: Column, text: Column, p: Int,
      dir: String, segmentId: String): Unit = {
    val spark = df.sparkSession
    val hadSpec = IndexSpec.checkReturningPresence(df, dir, cardSpec(p))
    val segDir = Segments.prepare(spark, dir, segmentId)
    val sigs = perDocSignals(df, source, text).localCheckpoint()
    // the two sub-table writes are independent (visibility gated by the
    // segment commit below) — overlap them (guide §2.6)
    Parallel.inParallel(
      countsFromSignals(sigs)
        .write.mode("overwrite").parquet(s"$segDir/counts"),
      Hll.groupRegisters(sigs, col("source"), col("__text"), p)
        .write.mode("overwrite").parquet(s"$segDir/registers"))
    Segments.commit(spark, segDir)
    if (!hadSpec) IndexSpec.write(df, dir, cardSpec(p))
  }

  /** The merged card over every live segment: counts sum, registers
    * max, estimator applied — identical to a one-shot build over all
    * ingested data. Returns (source, n_docs, n_tokens, avg_tokens,
    * n_chars, n_en, n_und, avg_quality, v_zero, t_scaled, est) — the
    * last three are the portable distinct-docs estimate. */
  def readDataCard(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      p: Int): DataFrame = {
    IndexSpec.check(spark, dir, cardSpec(p), writeIfMissing = false)
    val counts = Segments.readPart(spark, dir, "counts")
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(col("n_en")).as("n_en"),
        sum(col("n_und")).as("n_und"),
        sum(col("qsum")).as("qsum"))
    val regs = Segments.readPart(spark, dir, "registers")
      .groupBy(col("group"), col("register"))
      .agg(max(col("rank")).as("rank"))
    val est = Hll.groupEstimateFromRegisters(regs, p)
      .withColumnRenamed("group", "source")
    // left_outer: a source whose every document has NULL text produces
    // counts rows but no registers (groupRegisters drops null items) —
    // it must appear in the card with the all-zero-register estimate
    // (v_zero = m, t_scaled = m * 2^48, est = 0), not silently vanish
    val m = (1 << p).toLong
    counts.join(est, Seq("source"), "left_outer")
      .withColumn("v_zero", coalesce(col("v_zero"), lit(m)))
      .withColumn("t_scaled", coalesce(col("t_scaled"), lit(m * (1L << 48))))
      .withColumn("est", coalesce(col("est"), lit(0.0)))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") /
          col("n_docs").cast("double"), 4).as("avg_tokens"),
        col("n_chars"), col("n_en"), col("n_und"),
        round(col("qsum").cast("double") / lit(10000.0) /
          col("n_docs").cast("double"), 4).as("avg_quality"),
        col("v_zero"), col("t_scaled"), col("est"))
  }

  /** Cross-source LEAKAGE matrix — the data-governance view of the
    * winnowing match join: for every unordered source pair, how many
    * document pairs share verbatim content (>= minShared winnow
    * fingerprints) and how strong the overlap is in total. The diagonal
    * (source_a == source_b) is within-source duplication; off-diagonal
    * cells are cross-source contamination — exactly what a release
    * review asks before mixing corpora ("does src A copy from src B?").
    *
    * Scale: rides entirely on [[TextFunctions.winnowPairs]]' bucketed
    * plan (map-side selection, hash equi-join, max-df cull); the source
    * attachment is two ids-only joins and the matrix aggregate is
    * O(sources²) rows at most.
    *
    * @return (source_a, source_b, n_pairs, shared_total) with
    *         source_a <= source_b. */
  def leakageMatrix(
      df: DataFrame, id: Column, text: Column, source: Column,
      k: Int = 12, w: Int = 8, minShared: Long = 5L,
      maxDf: Long = Long.MaxValue): DataFrame = {
    val pairs = TextFunctions.winnowPairs(df, id, text, k, w, minShared, maxDf)
    val src = df.select(id.as("__id"), source.as("__src"))
    pairs
      .join(src.select(col("__id").as("id_a"), col("__src").as("__sa")), Seq("id_a"))
      .join(src.select(col("__id").as("id_b"), col("__src").as("__sb")), Seq("id_b"))
      .select(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"),
        col("shared"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("shared")).as("shared_total"))
  }
}

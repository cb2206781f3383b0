package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: group documents into
  * consecutive token-budget packs (the unit a trainer concatenates into
  * fixed-length sequences).
  */
object Packing extends org.apache.spark.internal.Logging {

  /** Assign each row a `pack_id` so consecutive rows (in `order` within
    * each `shard`) accumulate ~`budget` tokens per pack:
    * pack_id = floor(exclusive-prefix-sum(tokens) / budget).
    *
    * A document is assigned to the pack its FIRST token lands in, so a
    * pack may overflow `budget` by less than its last document's length —
    * the streaming-friendly formulation (one window prefix sum; exact
    * first-fit would need a running reset no engine's window algebra
    * expresses). Deterministic given (shard, order).
    *
    * Scale: one shuffle on `shard`; pack ids are shard-local (globalize
    * with (shard, pack_id) — a global pack order would force a single
    * sort). Pick shards so one shard's rows fit a task's sort.
    */
  def packByBudget(
      df: DataFrame, shard: Column, order: Column,
      tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(shard).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(tokens).over(w))
      // (cum - tokens) = exclusive prefix; exact integer division at
      // any shard size (double floor mis-rounds past 2^53 tokens)
      .withColumn("pack_id", ColMath.floorDiv(col("__cum") - tokens, budget))
      .drop("__cum")
  }

  /** Concat-and-chunk SEQUENCE packing — the GPT-style "make training
    * sequences" step: per shard, documents concatenate in `order` into
    * one token stream that is cut into fixed `seqLen`-token windows, a
    * document SPLITTING across windows when it straddles a boundary
    * (unlike [[packByBudget]], which keeps documents whole and lets a
    * pack overflow). Output is one row per (sequence, document-slice):
    *
    *   shard, seq_id        — the training sequence (shard-local id)
    *   seq_off              — slice start offset WITHIN the sequence
    *   doc (= `order`)      — the source document
    *   doc_off, n_tokens    — the token range [doc_off, doc_off+n) of
    *                          the document this slice carries
    *   eod                  — true iff the document ends in this slice
    *                          (where a trainer drops its EOS / resets
    *                          attention)
    *
    * All integer arithmetic over one prefix sum: a doc spans stream
    * tokens [cum−n, cum); window s spans [s·L, (s+1)·L); the slice for
    * (doc, s) is their intersection. Every window except a shard's last
    * is exactly full, so sequence construction is a pure slice-copy —
    * no trainer-side repacking.
    *
    * Scale: one shuffle on `shard` (the window prefix sum); the explode
    * emits ceil(n/L)+1 ≥ slices per doc — output is Θ(docs + tokens/L)
    * rows however the corpus is distributed, and no token array is ever
    * materialized. Zero-token docs carry no tokens and are dropped.
    * Shards bound a task's sort exactly as in [[packByBudget]]. */
  def packSequences(
      df: DataFrame, shard: Column, order: Column,
      tokens: Column, seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    // window over the RENAMED columns — it applies after the projection
    val w = Window.partitionBy(col("shard")).orderBy(col("doc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val L = lit(seqLen)
    df.select(shard.as("shard"), order.as("doc"), tokens.as("__n"))
      .filter(col("__n") > 0L)
      .withColumn("__end", sum(col("__n")).over(w))
      .withColumn("__start", col("__end") - col("__n"))
      // windows this doc touches: floor(start/L) .. floor((end-1)/L),
      // in exact integer arithmetic (prefix sums are non-negative, but
      // double division would drift past 2^53 tokens)
      .withColumn("seq_id", explode(sequence(
        ColMath.floorDiv(col("__start"), seqLen),
        ColMath.floorDiv(col("__end") - 1L, seqLen))))
      .select(col("shard"), col("seq_id"),
        (greatest(col("__start"), col("seq_id") * L) - col("seq_id") * L)
          .as("seq_off"),
        col("doc"),
        (greatest(col("__start"), col("seq_id") * L) - col("__start"))
          .as("doc_off"),
        (least(col("__end"), (col("seq_id") + 1L) * L) -
          greatest(col("__start"), col("seq_id") * L)).as("n_tokens"),
        (least(col("__end"), (col("seq_id") + 1L) * L) === col("__end"))
          .as("eod"))
  }

  /** MATERIALIZE the training sequences: the same concat-and-chunk plan
    * as [[packSequences]], but carrying each document's token ARRAY
    * through so the output is one row per sequence with its actual
    * `seqLen`-token content (the final shard a data loader memory-maps;
    * every sequence except a shard's last is exactly full).
    *
    * One scan, one plan: the prefix-sum window rides on the array
    * column, each (doc, window) slice is cut MAP-SIDE
    * (`slice(toks, doc_off+1, n)` — no token ever leaves its row until
    * the final assembly), and the per-sequence groupBy concatenates the
    * ≤ a-handful of slices in seq_off order. Two shuffles of the token
    * payload (window + assembly) — the floor for a materialization
    * whose output IS corpus-sized. Empty docs drop as in
    * [[packSequences]]. */
  def materializeSequences(
      df: DataFrame, shard: Column, order: Column,
      tokensArr: Column, seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val L = lit(seqLen)
    df.select(shard.as("shard"), order.as("doc"), tokensArr.as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0L)
      .withColumn("__end", sum(col("__n")).over(w))
      .withColumn("__start", col("__end") - col("__n"))
      .withColumn("seq_id", explode(sequence(
        ColMath.floorDiv(col("__start"), seqLen),
        ColMath.floorDiv(col("__end") - 1L, seqLen))))
      .select(col("shard"), col("seq_id"),
        (greatest(col("__start"), col("seq_id") * L) - col("seq_id") * L)
          .as("__seq_off"),
        slice(col("__toks"),
          (greatest(col("__start"), col("seq_id") * L) - col("__start") +
            1L).cast("int"),
          (least(col("__end"), (col("seq_id") + 1L) * L) -
            greatest(col("__start"), col("seq_id") * L)).cast("int"))
          .as("__slice"))
      .groupBy(col("shard"), col("seq_id"))
      .agg(flatten(transform(
        sort_array(collect_list(struct(col("__seq_off"), col("__slice")))),
        m => m.getField("__slice"))).as("tokens"))
      .select(col("shard"), col("seq_id"), col("tokens"),
        size(col("tokens")).cast("long").as("n_tokens"))
  }

  /** Deterministic TRAINING-ORDER interleave of packed sequences across
    * weighted sources — stride scheduling (Waldspurger & Weihl, OSDI
    * 1995): sequence k of source s is assigned virtual time
    * (k+1)/weight(s), and the global schedule is the ascending
    * virtual-time order (ties by (shard, seq)). Sources with twice the
    * weight appear twice as often, evenly spread — the "mix corpora at
    * fixed ratios without clumping" step between packing and the data
    * loader. Sources absent from `weights` are excluded (weight 0).
    *
    * Returns (step, shard, seq_id, vt): step is the contiguous global
    * training position. The weight lookup is a literal CASE chain
    * (map-side, no join); the global order is inherent — a total
    * training order IS the product — but it is produced DISTRIBUTED:
    * [[GlobalOrder.rowNumber]] quantile-buckets the vt axis, ranks
    * inside buckets (a PARTITIONED window) and adds bucket-count
    * offsets, so no task ever holds more than ~2²² sequence-metadata
    * rows (vs a partition-less row_number window pulling the whole
    * schedule — billions of rows at 100 TB — through one task).
    * vt doubles are (k+1)/w — identical IEEE division on any engine,
    * so the order and the 6dp-rounded output replay exactly. */
  def strideSchedule(
      seqs: DataFrame, shard: Column, seqId: Column,
      weights: Map[String, Double]): DataFrame = {
    // the CASE chain grows with the map — for thousands of sources use
    // [[strideScheduleBy]] (broadcast weight table) instead
    require(weights.nonEmpty, "at least one source weight required")
    require(weights.values.forall(_ > 0.0),
      s"weights must be positive: $weights")
    val wCol = weights.foldLeft(lit(null).cast("double")) {
      case (acc, (s, w)) => when(col("shard") === s, lit(w)).otherwise(acc)
    }
    stepOrder(seqs.select(shard.as("shard"), seqId.as("seq_id")).distinct()
      .withColumn("__w", wCol)
      .filter(col("__w").isNotNull)
      .withColumn("vt",
        (col("seq_id").cast("double") + lit(1.0)) / col("__w")))
  }

  /** Shared schedule tail: distributed global step over (vt, shard,
    * seq_id) — see [[GlobalOrder]] for why not a bare row_number. A
    * virtual-time tie run longer than a bucket (many sources at
    * identical weights emitting the same (k+1)/w values) surfaces as a
    * stride-schedule-specific warning: the schedule stays exact, but
    * that vt band numbers in one task. */
  private def stepOrder(withVt: DataFrame): DataFrame =
    GlobalOrder.rowNumberStats(withVt,
        Seq(col("vt"), col("shard"), col("seq_id")), "step",
        warner = Some((b, cnt) => logWarning(s"strideSchedule: $cnt " +
          s"sequences share one virtual-time band ($b) — equal-weight " +
          "sources emit colliding (k+1)/weight values; the schedule stays " +
          "exact but that band numbers in ONE task; perturb the source " +
          "weights slightly (e.g. 1.0, 1.000001, ...) to spread ties")))._1
      .select(col("step"), col("shard"), col("seq_id"),
        round(col("vt"), 6).as("vt"))

  /** [[strideSchedule]] with DATA-DERIVED weights: a (shard, weight)
    * DataFrame instead of a driver-side map — the shape for weights
    * computed from the corpus itself (e.g. temperature-scaled token
    * shares). The weight side broadcasts (one row per source); shards
    * absent from `weights` or with non-positive weight are excluded.
    * Ordering semantics identical to [[strideSchedule]]. */
  def strideScheduleBy(
      seqs: DataFrame, shard: Column, seqId: Column,
      weights: DataFrame): DataFrame = {
    stepOrder(seqs.select(shard.as("shard"), seqId.as("seq_id")).distinct()
      .join(broadcast(weights.select(col("shard"), col("weight"))),
        Seq("shard"))
      .filter(col("weight") > 0.0)
      .withColumn("vt",
        (col("seq_id").cast("double") + lit(1.0)) / col("weight"))
      .drop("weight", "__w"))
  }

  /** Materialize [[packByBudget]]'s assignment as ONE ROW PER PACK —
    * the unit a trainer actually consumes: ordered member ids, their
    * token counts (boundary offsets = its prefix sums) and the pack
    * total. `order` doubles as the member id.
    *
    * Scale: the pack rows are budget-bounded as long as members carry
    * ≥ 1 token each — FILTER ZERO-TOKEN DOCS UPSTREAM (they all share
    * one prefix position, so a run of them lands in a single pack and
    * its row grows unboundedly). One extra shuffle on (shard, pack_id)
    * over the window's shard shuffle. */
  def packManifest(
      df: DataFrame, shard: Column, order: Column,
      tokens: Column, budget: Long): DataFrame = {
    val packed = packByBudget(df, shard, order, tokens, budget)
    packed
      .groupBy(shard.as("shard"), col("pack_id"))
      .agg(sort_array(collect_list(struct(order.as("o"), tokens.as("t"))))
        .as("__m"))
      .select(col("shard"), col("pack_id"),
        transform(col("__m"), m => m.getField("o")).as("docs"),
        transform(col("__m"), m => m.getField("t")).as("token_counts"),
        aggregate(col("__m"), lit(0L),
          (acc, m) => acc + m.getField("t")).as("pack_tokens"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: group documents into
  * consecutive token-budget packs (the unit a trainer concatenates into
  * fixed-length sequences).
  */
object Packing {

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
      // (cum - tokens) = exclusive prefix; exact in double far past any
      // real corpus shard (2^53 tokens)
      .withColumn("pack_id",
        floor((col("__cum") - tokens) / lit(budget.toDouble)).cast("long"))
      .drop("__cum")
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

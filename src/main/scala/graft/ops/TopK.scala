package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group top-k selection at aggregation cost — "the 5 best documents
  * per source", "the k nearest candidates per query" — without the
  * window-function shape's scale trap: `row_number() OVER (PARTITION BY
  * g ORDER BY key DESC)` shuffles EVERY row to its group's partition and
  * sorts it (a hot group = one straggling sort task), while this folds a
  * bounded O(k) heap per group map-side, ships ≤ k pairs per (input
  * partition × group) through the shuffle, and never sorts more than the
  * k survivors of a group ([[graft.functions.TopKByKey]]).
  */
object TopK {

  /** Top `k` ids per group by `(key desc, id asc)` — deterministic for
    * any input order (the id tiebreak). Rows with a null key or id are
    * skipped; a group whose every row is skipped emits nothing.
    *
    * `key` and `id` must be integral (cast to long upstream); ranking by
    * a double belongs behind a fixed-point quantization anyway (the
    * repo-wide exactness discipline).
    *
    * @return (group, rank, key, id) — rank 1 = strongest, ordered within
    *         each group
    */
  def topKByGroup(
      df: DataFrame, group: Column, key: Column, id: Column, k: Int): DataFrame =
    df.groupBy(group.as("group"))
      .agg(graft.functions.exprs.top_k_by(key.cast("long"), id.cast("long"), k)
        .as("__top"))
      .select(col("group"), posexplode(col("__top")))
      .select(col("group"), (col("pos") + 1).cast("long").as("rank"),
        col("col.key").as("key"), col("col.id").as("id"))

  /** [[topKByGroup]] that returns the WHOLE winning rows: the heap
    * selects (group, id, rank) at aggregation cost, then ONE join on the
    * id column recovers the rows — and the selected side is
    * groups × k rows, so Spark broadcasts it and the corpus never
    * shuffles (the id must be unique per row for the join to be 1:1).
    * Output = the original columns + `rank`. */
  def topKRowsByGroup(
      df: DataFrame, group: Column, key: Column, id: Column, k: Int): DataFrame = {
    require(!df.columns.contains("rank"),
      "the output adds a 'rank' column — rename the input's existing " +
        s"'rank' first: ${df.columns.toSeq}")
    val picked = topKByGroup(df, group, key, id, k)
      .select(col("id").as("__pick_id"), col("rank"))
    df.join(broadcast(picked), id.cast("long") === col("__pick_id"))
      .drop("__pick_id")
  }

  /** [[topKByGroup]] for a DOUBLE ranking key, no precision loss: the
    * key rides the heap as its order-preserving IEEE sortable-bits long
    * ([[graft.functions.SortableDoubleBits]] — signed long compare ==
    * `Double.compare`) and is recovered bit-for-bit on the way out.
    * `ascending = true` ranks smallest-first (nearest-by-distance) by
    * heaping the BITWISE-NOT of the bits — strictly order-reversing with
    * no negation overflow; note the id tiebreak stays ascending. */
  def topKByGroupDouble(
      df: DataFrame, group: Column, key: Column, id: Column, k: Int,
      ascending: Boolean = false): DataFrame = {
    val bits = graft.functions.exprs.sortable_double_bits(key.cast("double"))
    val heapKey = if (ascending) bitwise_not(bits) else bits
    val outKey = graft.functions.exprs.double_from_sortable_bits(
      if (ascending) bitwise_not(col("col.key")) else col("col.key"))
    df.groupBy(group.as("group"))
      .agg(graft.functions.exprs.top_k_by(heapKey, id.cast("long"), k)
        .as("__top"))
      .select(col("group"), posexplode(col("__top")))
      .select(col("group"), (col("pos") + 1).cast("long").as("rank"),
        outKey.as("key"), col("col.id").as("id"))
  }
}

package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semi-join reduction through the index ("dynamic FILE pruning" for
  * ordinary columns): Spark's DPP prunes partition DIRECTORIES when a
  * join key is the partition column, but a join on any other indexed
  * column still scans every fact file. When the build side's distinct
  * join keys fit a driver cap, `fact JOIN dim ON k` is equivalent to
  * `fact WHERE k IN (dim keys) JOIN dim`, and that IN-list is exactly
  * what the index prunes FILES with (per-file bloom / dictionary /
  * min-max) — the fact side reads only files that can contain a matching
  * key, long before the join runs.
  *
  * The rewrite never changes semantics: inner-join rows with keys
  * outside the dim cannot survive, and null keys never match an
  * equi-join. The cap probe is `limit(maxKeys + 1)` — the dim is never
  * collected unboundedly; past the cap the plain join returns unchanged
  * and Catalyst/AQE plan it as usual. At 100 TB this is the selective
  * star-join shape: a thousand-key dim against a million-file fact turns
  * into a thousand-entry IN probe against per-file sketches, reading the
  * handful of files that matter.
  */
object JoinPrune {

  /** Inner equi-join with index-backed file pruning on the fact side.
    *
    * @param fact    indexed scan (`spark.index.parquet(...)`) — plain
    *                DataFrames also work, degrading to a row-level
    *                pushed filter without the file cut
    * @param dim     build side; evaluated TWICE (key probe + the join
    *                itself), so it must be deterministic — a sampled or
    *                otherwise nondeterministic dim could yield probe keys
    *                that miss join-time rows and silently drop matches
    * @param factKey fact join column (the indexed one)
    * @param dimKey  dim join column
    * @param maxKeys driver cap on collected distinct keys; above it the
    *                plain join is returned unchanged
    */
  def semiJoinPruned(
      fact: DataFrame,
      dim: DataFrame,
      factKey: Column,
      dimKey: Column,
      maxKeys: Int = 10000): DataFrame = {
    require(maxKeys >= 1, s"maxKeys must be >= 1: $maxKeys")
    val keys = dim.select(dimKey.as("__k")).filter(col("__k").isNotNull)
      .distinct().limit(maxKeys + 1).collect().map(_.get(0)).toSeq
    if (keys.length > maxKeys) fact.join(dim, factKey === dimKey)
    else fact.filter(factKey.isin(keys: _*)).join(dim, factKey === dimKey)
  }
}

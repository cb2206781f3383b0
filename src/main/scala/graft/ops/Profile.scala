package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality gate a 100 TB ingest pipeline runs
  * before (and after) every transform: per-column row/null/distinct counts
  * and min/max bounds, computed in ONE aggregation pass over the table.
  *
  * Scale notes: all per-column aggregates fold map-side; the exact
  * distinct counts make Catalyst plan an Expand (one input row per
  * profiled column) — cost is O(rows × cols) but still a single shuffle
  * keyed by the distinct values. [[profileApprox]] swaps the exact counts
  * for HyperLogLog sketches (no Expand) for wide tables and quick scans.
  * min/max are emitted as strings so one schema serves every column type.
  */
object Profile {

  /** Exact profile (engine-portable, oracle-checkable). GATED on width:
    * the exact distinct counts expand the input O(cols)×, so profiling
    * more than `maxExactCols` columns (default 16) is refused with a
    * pointer to [[profileApprox]] — at 100 TB a 50-column exact profile
    * is a 50× row multiplication before the shuffle. Raise the limit
    * explicitly only when the table is known small. */
  def profile(df: DataFrame, cols: Seq[String], maxExactCols: Int = 16): DataFrame = {
    require(cols.size <= maxExactCols,
      s"exact profile over ${cols.size} columns would expand every row " +
        s"${cols.size}x before the shuffle (O(rows x cols)); use " +
        s"profileApprox for wide tables, or pass maxExactCols >= ${cols.size} " +
        "if the table is known small")
    profileWith(df, cols, c => countDistinct(col(c)))
  }

  /** [[profile]] with HyperLogLog distinct counts (`rsd` relative error):
    * no Expand, one plain aggregation pass — the wide-table / quick-scan
    * variant. Counts are approximate and NOT engine-portable (opaque
    * HLL++ sketch); when the estimate must be externally checkable,
    * prefer [[profilePortable]]. Everything else matches [[profile]]. */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  /** [[profileApprox]]'s ORACLE-PORTABLE successor: per-column
    * row/null counts plus a distinct-count estimate from the portable
    * per-group HyperLogLog ([[Hll.approxDistinctByGroup]], group = the
    * column name over string-cast cell values) — an external SQL engine
    * replays the ESTIMATE itself, which `approx_count_distinct`'s
    * opaque HLL++ sketch cannot. Like any multi-column profile the scan
    * visits each cell once per column (the unpivot), but the shuffle
    * carries only (column, register) partials — ≤ cols·2^p rows,
    * however wide the values. Cast caveat: distincts count STRING
    * representations — exact for ints/strings/dates; avoid raw doubles
    * (engine formatting differs).
    * Returns (col, rows, nulls, v_zero, t_scaled, est). */
  def profilePortable(
      df: DataFrame, cols: Seq[String], p: Int = 10): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    // the unpivot feeds TWO aggregations (counts + HLL registers) —
    // materialize it once so the source table is scanned and the
    // cols-way explode computed a single time (the bm25 pattern)
    val items = df.select(explode(array(cols.map { c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))
      }: _*)).as("kv"))
      .select(col("kv.c").as("col"), col("kv.v").as("v"))
      .localCheckpoint(false)
    val counts = items.groupBy(col("col")).agg(
      count(lit(1)).as("rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("nulls"))
    val est = Hll.approxDistinctByGroup(
        items.filter(col("v").isNotNull), col("col"), col("v"), p)
      .withColumnRenamed("group", "col")
    counts.join(est, Seq("col"), "left_outer")
  }

  private def profileWith(
      df: DataFrame, cols: Seq[String], distinctAgg: String => Column): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    // positional aliases + exploded struct array (the Expect.check
    // pattern): profiled column names are bound as literals, never
    // spliced into SQL text or backticked identifiers
    val aggExprs = count(lit(1)).as("__n") +:
      cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$i"),
          distinctAgg(c).as(s"__nd_$i"),
          min(col(c)).cast("string").as(s"__min_$i"),
          max(col(c)).cast("string").as(s"__max_$i"))
      }
    val row = df.agg(aggExprs.head, aggExprs.tail: _*)
    val pairs = array(cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column_name"), col(s"__nulls_$i").as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"), col(s"__min_$i").as("min_val"),
        col(s"__max_$i").as("max_val"))
    }: _*)
    row.select(col("__n").as("n_rows"), explode(pairs).as("kv"))
      .select(col("kv.column_name").as("column_name"), col("n_rows"),
        col("kv.n_nulls").as("n_nulls"), col("kv.n_distinct").as("n_distinct"),
        col("kv.min_val").as("min_val"), col("kv.max_val").as("max_val"))
  }
}

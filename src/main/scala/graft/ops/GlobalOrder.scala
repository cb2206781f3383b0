package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exclusive prefix sums over a TOTAL order — the building
  * block behind global step numbering ([[Packing.strideSchedule]]) and
  * exclusive-rank banding ([[Sampling.filterByScoreBand]]), neither of
  * which may run the classic `row_number().over(Window.orderBy(...))`
  * shape: a partition-less window moves every row through ONE task,
  * the canonical 100×-scale killer.
  *
  * Shape: (1) one aggregate computes the row count and an
  * `approx_percentile` grid of the LEADING order column; (2) each row
  * is assigned a bucket by binary search against those boundaries
  * ([[graft.functions.BucketByBounds]] — a pure, monotone function of
  * the row's own value); (3) per-bucket totals (≤ 4096 rows) collect to
  * the driver and become exclusive bucket offsets; (4) the final pass
  * runs the prefix-sum window PARTITIONED BY bucket and adds the
  * offset. The global order is the product, but no task ever sees more
  * than ~one bucket (~2²² rows at balance).
  *
  * Why buckets instead of the two-pass zipWithIndex shape
  * (range-repartition + partition-offset counts): the count job and the
  * numbering job re-execute the input lineage independently, and a
  * range partitioner's sampled boundaries depend on intra-partition row
  * ORDER, which is not deterministic under shuffle-fetch races — the
  * two jobs could disagree on partition membership and mis-offset
  * silently (or force a persist the library would leak). Bucket
  * membership here depends ONLY on the row's value, so every pass
  * agrees on it by construction, cache or no cache.
  */
object GlobalOrder {

  /** approx_percentile probability grid: 4095 interior quantiles. */
  private val Grid = 4096

  /** Target rows per bucket (4M): one window task's comfortable sort. */
  private val RowsPerBucket = 1L << 22

  /** Adds `outName` = the exclusive prefix sum of `weight` (long) over
    * the total order `orderCols` (ascending, first column numeric and
    * non-null, the full list free of duplicates across rows). Rows keep
    * all existing columns. Returns the input unchanged plus `outName`.
    */
  def exclusivePrefixSum(
      df: DataFrame, orderCols: Seq[Column],
      weight: Column, outName: String): DataFrame =
    exclusivePrefixSum(df, orderCols, weight, outName, RowsPerBucket)

  /** [[exclusivePrefixSum]] with an explicit bucket-size target —
    * package-visible so tests can force the multi-bucket path at unit
    * scale. */
  private[graft] def exclusivePrefixSum(
      df: DataFrame, orderCols: Seq[Column],
      weight: Column, outName: String, rowsPerBucket: Long): DataFrame = {
    require(orderCols.nonEmpty, "at least one order column required")
    require(rowsPerBucket >= 1, "rowsPerBucket must be positive")
    // Three passes consume the input (quantile grid, bucket totals, the
    // final ranked frame) — for callers whose input is an expensive
    // aggregation (distinct scores over a scored corpus) the recomputes
    // dominate. Persist it once: pass 1 materializes the cache, passes
    // 2-3 read it, and Spark's ContextCleaner drops the blocks when the
    // returned frame becomes unreachable (no explicit unpersist — the
    // caller still holds the lazy result). MEMORY_AND_DISK: the frame is
    // order-metadata sized, spilling beats recomputing.
    val in = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lead = orderCols.head.cast("double")
    // pass 1: count (materializes the cache). The 4095-point quantile
    // sketch only runs when the data actually needs multiple buckets —
    // at or under one bucket's worth of rows it is pure fixed overhead
    // (the common toy/verify size), and above, its scan reads the cache.
    val n = in.agg(count(lit(1))).head.getLong(0)
    if (n == 0) { in.unpersist(); return df.withColumn(outName, lit(0L)) }
    val nBuckets = math.min(Grid.toLong,
      math.max(1L, (n + rowsPerBucket - 1) / rowsPerBucket)).toInt
    val grid: Seq[Double] =
      if (nBuckets <= 1) Nil
      else {
        val probs = (1 until Grid).map(_.toDouble / Grid).toArray
        val q = in.agg(approx_percentile(lead, lit(probs), lit(100000))
          .as("__go_q")).head()
        if (q.isNullAt(0)) Nil else q.getSeq[Double](0)
      }
    // single-bucket fallback uses a -Inf boundary, NOT lit(0): a literal
    // bucket constant-folds out of the window's partitionSpec, which
    // degrades the partitioned window back to the partition-less shape
    // this class exists to avoid (and trips WindowExec's warning). A
    // boundary-derived bucket is a function of the row's value, so the
    // spec survives optimization; at fallback size (< rowsPerBucket
    // rows) one partition holding everything is the intended plan.
    val bounds: Seq[Double] =
      if (grid.isEmpty || nBuckets <= 1) Seq(Double.NegativeInfinity)
      else (1 until nBuckets)
        .map(i => grid((i.toLong * Grid / nBuckets).toInt - 1))
        .distinct.sorted
    val bucket: Column = graft.functions.exprs.bucket_by_bounds(lead, bounds)
    val bucketed = in.withColumn("__go_b", bucket)
    // pass 2: per-bucket weight totals — ≤ 4096 rows to the driver;
    // deterministic because the bucket is a pure function of the row
    val totals = bucketed.groupBy(col("__go_b"))
      .agg(sum(weight.cast("long")).as("__go_w"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, w) => val o = (b, acc); acc += w; o }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__go_b", "__go_off"))
    // pass 3: PARTITIONED window + bucket offset = global prefix sum
    val w = Window.partitionBy(col("__go_b")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(offDf, "__go_b")
      .withColumn(outName,
        coalesce(sum(weight.cast("long")).over(w), lit(0L)) + col("__go_off"))
      .drop("__go_b", "__go_off")
  }

  /** Adds `outName` = the 1-based global rank (row_number) over the
    * total order `orderCols` — [[exclusivePrefixSum]] with weight 1. */
  def rowNumber(df: DataFrame, orderCols: Seq[Column],
      outName: String): DataFrame =
    exclusivePrefixSum(df, orderCols, lit(1L), "__go_pre")
      .withColumn(outName, col("__go_pre") + lit(1L))
      .drop("__go_pre")
}

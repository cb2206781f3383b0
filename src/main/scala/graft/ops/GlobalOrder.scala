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
object GlobalOrder extends org.apache.spark.internal.Logging {

  /** Per-call telemetry returned by [[exclusivePrefixSumStats]] —
    * scoped to the call (no shared mutable state; concurrent runs in one
    * session each read their own). `rows` = input row count;
    * `buckets` = banding buckets used; `maxRowWeight` = the largest
    * single-row weight (callers that pre-aggregate ties into weights —
    * [[Sampling.filterByScoreBand]]'s per-score counts — read their
    * longest tie run here); `overflow` = (bucket id, row count) of the
    * worst bucket that blew past [[OverflowFactor]]× the per-bucket
    * target. A bucket is a function of the LEADING order value only, so
    * a lead tie run longer than a bucket cannot be split by quantile
    * boundaries and degrades that bucket to one window task — the
    * per-bucket totals already sit on the driver, so detection is free.
    * None when every bucket stayed within bounds. */
  private[graft] final case class OrderStats(
      rows: Long, buckets: Int, maxRowWeight: Long,
      overflow: Option[(Int, Long)])

  /** approx_percentile probability grid: 4095 interior quantiles. */
  private val Grid = 4096

  /** Overflow warn threshold: quantile-sketch noise alone can skew a
    * bucket ~2x, so only a >4x bucket is called a tie run. */
  private val OverflowFactor = 4L

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
    exclusivePrefixSumStats(df, orderCols, weight, outName, RowsPerBucket)._1

  /** [[exclusivePrefixSum]] with an explicit bucket-size target —
    * package-visible so tests can force the multi-bucket path at unit
    * scale. */
  private[graft] def exclusivePrefixSum(
      df: DataFrame, orderCols: Seq[Column],
      weight: Column, outName: String, rowsPerBucket: Long): DataFrame =
    exclusivePrefixSumStats(df, orderCols, weight, outName, rowsPerBucket)._1

  /** Core of [[exclusivePrefixSum]], returning the per-call
    * [[OrderStats]] alongside the frame. `warner`, when set, replaces
    * the generic tie-run overflow warning with a caller-specific one
    * ((bucket, rows) → caller logs its own advice) — public operators
    * ([[Sampling.filterByScoreBand]], [[Packing.strideSchedule]]) route
    * it so the user sees advice in their operator's vocabulary. */
  private[graft] def exclusivePrefixSumStats(
      df: DataFrame, orderCols: Seq[Column],
      weight: Column, outName: String,
      rowsPerBucket: Long = RowsPerBucket,
      warner: Option[(Int, Long) => Unit] = None): (DataFrame, OrderStats) = {
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
    // Quantile banding needs a lead that maps to double MONOTONICALLY.
    // Numeric leads cast directly; temporal leads derive their epoch
    // number (a raw cast of a string/struct lead would throw
    // CAST_INVALID_INPUT under ANSI, Spark 4's default, or yield null
    // buckets with ANSI off). Non-bandable types take the single-bucket
    // path on a hash-derived lead instead — hash() is total over every
    // type, and in one bucket the banding value never influences the
    // ORDER (orderCols do), only the partitionSpec. NaN leads are folded
    // onto +Inf BEFORE banding: the binary search would otherwise send
    // NaN to bucket 0 while asc ordering sorts NaN LAST — a non-monotone
    // band that silently mis-offsets; as +Inf they band with the top
    // bucket and the window's true ordering settles them within it.
    import org.apache.spark.sql.types._
    val leadType = df.select(orderCols.head).schema.head.dataType
    val bandLead: Option[Column] = leadType match {
      case _: NumericType => Some(orderCols.head.cast("double"))
      case _: TimestampType => Some(unix_micros(orderCols.head).cast("double"))
      case _: TimestampNTZType =>
        // ntz→ltz resolves through the session zone; in DST zones the
        // offset varies per wall-clock value, but the resolution stays
        // WEAKLY monotone (gaps/ambiguous hours collapse, never
        // reorder), and weak monotonicity is all banding needs — the
        // window's true ordering settles order within a bucket
        Some(unix_micros(orderCols.head.cast("timestamp")).cast("double"))
      case _: DateType => Some(unix_date(orderCols.head).cast("double"))
      case _ => None
    }
    val numericLead = bandLead.isDefined
    val lead = bandLead match {
      case Some(c) => nanvl(c, lit(Double.PositiveInfinity))
      case None => hash(orderCols.head).cast("double")
    }
    // pass 1: count (materializes the cache). The 4095-point quantile
    // sketch only runs when the data actually needs multiple buckets —
    // at or under one bucket's worth of rows it is pure fixed overhead
    // (the common toy/verify size), and above, its scan reads the cache.
    val n = in.agg(count(lit(1))).head.getLong(0)
    if (n == 0) {
      in.unpersist()
      return (df.withColumn(outName, lit(0L)), OrderStats(0L, 0, 0L, None))
    }
    val nBuckets =
      if (!numericLead) 1
      else math.min(Grid.toLong,
        math.max(1L, (n + rowsPerBucket - 1) / rowsPerBucket)).toInt
    if (!numericLead && n > rowsPerBucket) {
      logWarning(s"GlobalOrder: non-numeric leading order column " +
        s"(${leadType.simpleString}) over $n rows cannot be quantile-banded — " +
        "running as ONE window task; cast or quantize the lead to a numeric " +
        "score to distribute the order")
    }
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
    // a null lead (doc contract says non-null, but callers pass user
    // frames) banding to a null bucket would NPE the totals collect /
    // drop rows through the offset join — coalesce it into bucket 0,
    // which is exactly where asc NULLS FIRST ordering puts those rows
    val bucket: Column = coalesce(
      graft.functions.exprs.bucket_by_bounds(lead, bounds), lit(0))
    val bucketed = in.withColumn("__go_b", bucket)
    // pass 2: per-bucket weight totals + row counts + max single-row
    // weight — ≤ 4096 rows to the driver; deterministic because the
    // bucket is a pure function of the row. The counts feed the tie-run
    // overflow telemetry for free; the max weight feeds callers whose
    // weights are pre-aggregated tie-run lengths (filterByScoreBand).
    val totals3 = bucketed.groupBy(col("__go_b"))
      .agg(sum(weight.cast("long")).as("__go_w"), count(lit(1)).as("__go_n"),
        max(weight.cast("long")).as("__go_m"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    var overflow: Option[(Int, Long)] = None
    if (nBuckets > 1) {
      // expected size per bucket exceeds rowsPerBucket once n caps the
      // Grid — compare against the larger of the two, or balanced data
      // past Grid x target rows would warn spuriously
      val expectPerBucket = math.max(rowsPerBucket,
        (n + nBuckets - 1) / nBuckets)
      totals3.filter(_._3 > OverflowFactor * expectPerBucket)
        .sortBy(-_._3).headOption.foreach { case (b, _, cnt, _) =>
          overflow = Some((b, cnt))
          warner match {
            case Some(warn) => warn(b, cnt)
            case None => logWarning(s"GlobalOrder bucket $b holds $cnt rows " +
              s"(> ${OverflowFactor}x the $expectPerBucket target): the leading " +
              "order column has a tie run longer than a bucket, so that bucket " +
              "degrades to ONE window task — pre-quantize the lead or add a " +
              "higher-cardinality leading axis")
          }
        }
    }
    val maxRowWeight = if (totals3.isEmpty) 0L else totals3.map(_._4).max
    val stats = OrderStats(n, math.max(nBuckets, 1), maxRowWeight, overflow)
    val totals = totals3.map { case (b, w, _, _) => (b, w) }
    var acc = 0L
    val offsets = totals.map { case (b, w) => val o = (b, acc); acc += w; o }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("__go_b", "__go_off"))
    // pass 3: PARTITIONED window + bucket offset = global prefix sum
    val w = Window.partitionBy(col("__go_b")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val out = bucketed.join(offDf, "__go_b")
      .withColumn(outName,
        coalesce(sum(weight.cast("long")).over(w), lit(0L)) + col("__go_off"))
      .drop("__go_b", "__go_off")
    (out, stats)
  }

  /** Adds `outName` = the 1-based global rank (row_number) over the
    * total order `orderCols` — [[exclusivePrefixSum]] with weight 1. */
  def rowNumber(df: DataFrame, orderCols: Seq[Column],
      outName: String): DataFrame =
    rowNumberStats(df, orderCols, outName)._1

  /** [[rowNumber]] returning the per-call [[OrderStats]]; `warner` as in
    * [[exclusivePrefixSumStats]]. */
  private[graft] def rowNumberStats(df: DataFrame, orderCols: Seq[Column],
      outName: String, rowsPerBucket: Long = RowsPerBucket,
      warner: Option[(Int, Long) => Unit] = None): (DataFrame, OrderStats) = {
    val (pre, stats) = exclusivePrefixSumStats(
      df, orderCols, lit(1L), "__go_pre", rowsPerBucket, warner)
    (pre.withColumn(outName, col("__go_pre") + lit(1L)).drop("__go_pre"), stats)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.exprs

/** Count-min sketch (Cormode & Muthukrishnan 2005) over an item stream —
  * the bounded-memory frequency summary for heavy-hitter detection and
  * point-frequency serving at corpus scale.
  *
  * The sketch is a depth × width grid of counters: occurrence x
  * increments cell (d, h_d(x)) for each of `depth` independent hashes,
  * and `est(x) = min_d cells[d][h_d(x)]` never underestimates (every
  * counter x touches counts all of x, plus collisions). Width bounds the
  * overestimate: E[err] ≤ 2·N/width per row, with depth rows driving the
  * failure probability down exponentially.
  *
  * Why a sketch when `groupBy(item).count` is also one shuffle: the
  * cells table is FIXED-SIZE (depth·width rows, not vocabulary-sized)
  * and MERGEABLE (cell-wise sum — [[mergeCells]]), so per-batch /
  * per-partition sketches combine associatively into a corpus summary
  * that is persisted once and probed forever without re-scanning — the
  * ingest-time shape for "how often does this token/URL/n-gram occur in
  * 100 TB" point queries. Construction is one map-side-combined shuffle
  * of depth·width cells regardless of data size or skew (a hot key
  * cannot straggle: its counts fold into partial aggregates).
  *
  * Engine-portable: h_d is [[graft.functions.Md5Bucket]] over the salted
  * item (`"cms<d>:" + item`) = DuckDB `md5_number_lower('cms'||d||':'||x)
  * % width` (unsigned remainder), so an external SQL engine replays
  * cells and estimates bit-for-bit. */
object Cms {

  /** Build the sketch: one (d, bucket, cnt) row per non-empty cell.
    * `items` is one row per OCCURRENCE (pre-explode tokens upstream);
    * null items are skipped. depth·width should stay small enough to
    * broadcast (the default regime: ≤ ~10⁵ cells). */
  def countMinCells(
      items: DataFrame, item: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1, s"depth must be >= 1: $depth")
    require(width >= 1, s"width must be >= 1: $width")
    items.select(item.as("__item")).filter(col("__item").isNotNull)
      .select(explode(array((0 until depth).map { d =>
        struct(lit(d).as("d"),
          exprs.md5_bucket(concat(lit(s"cms$d:"), col("__item")), width)
            .as("bucket"))
      }: _*)).as("h"))
      .groupBy(col("h.d").as("d"), col("h.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Cell-wise sum of two sketches built with the SAME (depth, width) —
    * the associative merge that makes per-batch sketches compose into a
    * corpus sketch: `mergeCells(cells(A), cells(B)) == cells(A ⊎ B)`. */
  def mergeCells(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("d"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-frequency estimates for a set of query items: est(x) =
    * min_d cells[d][h_d(x)], an upper bound on x's true occurrence
    * count (0 for items hitting only empty cells). The cells table is
    * broadcast — the probe is a map-side join however many query items
    * arrive. Returns (item, est). */
  def estimateCounts(
      cells: DataFrame, queries: DataFrame, item: Column,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape: $depth x $width")
    queries.select(item.as("item")).filter(col("item").isNotNull).distinct()
      .select(col("item"), explode(array((0 until depth).map { d =>
        struct(lit(d).as("d"),
          exprs.md5_bucket(concat(lit(s"cms$d:"), col("item")), width)
            .as("bucket"))
      }: _*)).as("h"))
      .select(col("item"), col("h.d").as("d"), col("h.bucket").as("bucket"))
      .join(broadcast(cells), Seq("d", "bucket"), "left_outer")
      .groupBy(col("item"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  private def sketchSpec(depth: Int, width: Int): String =
    s"cms-sketch:v1 depth=$depth width=$width"

  /** Append one batch's cells as a SEGMENT of a materialized sketch
    * table — the ingest-time shape: each micro-batch/partition writes
    * its own depth×width grid under a fresh segment id and the merged
    * sketch is recovered on read ([[readCells]]) by cell-wise sum,
    * which mergeability makes exactly the one-shot sketch. Segment
    * commit markers make a crashed append invisible (rerun with the
    * same id converges); (depth, width) are pinned in `_index_spec` so
    * a mismatched append fails instead of silently folding into wrong
    * cells. */
  def appendCellsSegment(
      items: DataFrame, item: Column, depth: Int, width: Int,
      dir: String, segmentId: String): Unit = {
    val spark = items.sparkSession
    val hadSpec =
      IndexSpec.checkReturningPresence(items, dir, sketchSpec(depth, width))
    val segDir = Segments.prepare(spark, dir, segmentId)
    countMinCells(items, item, depth, width)
      .write.mode("overwrite").parquet(s"$segDir/cells")
    Segments.commit(spark, segDir)
    if (!hadSpec) IndexSpec.write(items, dir, sketchSpec(depth, width))
  }

  /** The merged sketch over every live segment (cell-wise sum — by
    * mergeability, identical to a one-shot build over all ingested
    * data). The result has ≤ depth·width rows however many segments
    * exist. */
  def readCells(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      depth: Int, width: Int): DataFrame = {
    IndexSpec.check(spark, dir, sketchSpec(depth, width), writeIfMissing = false)
    Segments.readPart(spark, dir, "cells")
      .groupBy(col("d"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Fold all live segments into one (the LSM merge keeping read fan-in
    * bounded after many streamed batches); crash-safe via the segment
    * `_replaces`-before-`_commit` ordering, single-compactor locked.
    * Returns segments merged (0–1 = nothing to do). */
  def compactCellsSegments(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      depth: Int, width: Int,
      lockLeaseMs: Long = MaintenanceLock.DefaultLeaseMs): Int = {
    IndexSpec.check(spark, dir, sketchSpec(depth, width), writeIfMissing = false)
    MaintenanceLock.withLock(Segments.fsOf(spark, dir),
        new org.apache.hadoop.fs.Path(dir), lockLeaseMs) {
      val live = Segments.live(spark, dir)
      if (live.length <= 1) 0
      else {
        val names = live.map(p => new org.apache.hadoop.fs.Path(p).getName)
        val target = {
          val h = s"compact-${names.hashCode.toHexString}"
          if (names.contains(h)) s"$h-x" else h
        }
        val segDir = Segments.prepare(spark, dir, target)
        spark.read.parquet(live.map(s => s"$s/cells"): _*)
          .groupBy(col("d"), col("bucket"))
          .agg(sum(col("cnt")).as("cnt"))
          .write.mode("overwrite").parquet(s"$segDir/cells")
        Segments.commit(spark, segDir, replaces = names)
        Segments.delete(spark, live)
        live.length
      }
    }
  }

  /** Heavy-hitter candidates: every distinct item whose CMS estimate
    * reaches `minCount`. Guaranteed a SUPERSET of the true ≥ minCount
    * items (est never underestimates); width controls false positives.
    * Returns (item, est). */
  def heavyHitters(
      items: DataFrame, item: Column, depth: Int, width: Int,
      minCount: Long): DataFrame = {
    val cells = countMinCells(items, item, depth, width)
    estimateCounts(cells, items, item, depth, width)
      .filter(col("est") >= minCount)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.exprs

/** Engine-portable HyperLogLog (Flajolet et al. 2007) — approximate
  * distinct counting whose SKETCH is exactly replayable by an external
  * SQL engine, unlike `approx_count_distinct`'s opaque HLL++ binary.
  *
  * Register assignment is pure integer arithmetic over the md5-derived
  * 64-bit item hash: the top `p` bits pick the register, the rank is
  * the leading-zero count of the remaining `64-p` bits + 1, computed by
  * OR-smearing + `bit_count` (builtin, codegen'd — no log2 whose double
  * rounding could differ between engines). The register table
  * (`register`, `max rank`) is the whole sketch: ≤ 2^p rows from ONE
  * map-side-combined shuffle regardless of data size or skew, MERGEABLE
  * by register-wise max ([[mergeRegisters]]) — the per-batch /
  * per-partition composition shape — and byte-identical to a DuckDB
  * replay of the same bit formulas.
  *
  * [[estimateDistinct]] applies the standard harmonic-mean estimator
  * with the small-range (linear-counting) correction on the collected
  * ≤ 2^p rows — driver-side by construction, like the repo's other
  * bounded collects. Standard error ≈ 1.04/√(2^p) (p=10 → ~3.3 %). */
object Hll {

  /** Non-empty registers of the sketch: (register, rank) with
    * rank = max over items hashing there. `p` ∈ [4, 16] picks
    * m = 2^p registers. Null items are skipped. */
  def hllRegisters(items: DataFrame, item: Column, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16]: $p")
    val wBits = 64 - p
    // leading-zero rank of the low wBits bits via OR-smear + bit_count:
    // bit_length(w) = popcount(smear(w)); rank = wBits - bit_length + 1
    val smeared = Seq(1, 2, 4, 8, 16, 32).foldLeft(col("__w")) { (s, k) =>
      s.bitwiseOR(shiftrightunsigned(s, k))
    }
    items.select(item.as("__item")).filter(col("__item").isNotNull)
      .select(exprs.md5_lower64(concat(lit("hll:"), col("__item"))).as("__h"))
      .select(
        shiftrightunsigned(col("__h"), wBits).cast("int").as("register"),
        col("__h").bitwiseAND(lit((1L << wBits) - 1L)).as("__w"))
      .select(col("register"),
        when(col("__w") === 0L, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - bit_count(smeared).cast("int"))
          .as("rank"))
      .groupBy(col("register"))
      .agg(max(col("rank")).as("rank"))
  }

  /** Register-wise max of two sketches built with the SAME `p` —
    * `mergeRegisters(hll(A), hll(B)) == hll(A ∪ B)` exactly. */
  def mergeRegisters(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("register"))
      .agg(max(col("rank")).as("rank"))

  /** The HLL cardinality estimate from a register table: harmonic mean
    * with the linear-counting small-range correction. Collects ≤ 2^p
    * rows. */
  def estimateDistinct(registers: DataFrame, p: Int): Double = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16]: $p")
    val m = 1 << p
    val filled = registers.select(col("register"), col("rank"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    require(filled.keys.forall(j => j >= 0 && j < m),
      s"register out of range for p=$p")
    val ranks = (0 until m).map(j => filled.getOrElse(j, 0))
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / ranks.map(r => math.pow(2.0, -r)).sum
    val zeros = ranks.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  /** One-call convenience: approximate distinct count of `item`. */
  def approxDistinct(items: DataFrame, item: Column, p: Int = 12): Double =
    estimateDistinct(hllRegisters(items, item, p), p)

  private def sketchSpec(p: Int): String = s"hll-sketch:v1 p=$p"

  /** Append one batch's registers as a SEGMENT of a materialized HLL
    * sketch table — the ingest-time shape mirroring
    * [[Cms.appendCellsSegment]]: each micro-batch/partition writes its
    * own ≤ 2^p register table under a fresh segment id and the merged
    * sketch is recovered on read ([[readRegisters]]) by register-wise
    * MAX, which mergeability makes exactly the one-shot sketch over
    * everything ingested. Segment commit markers make a crashed append
    * invisible (rerun with the same id converges); `p` is pinned in
    * `_index_spec` so a mismatched append fails instead of silently
    * folding incompatible register spaces. */
  def appendRegistersSegment(
      items: DataFrame, item: Column, p: Int,
      dir: String, segmentId: String): Unit = {
    require(p >= 4 && p <= 16, s"p must be in [4, 16]: $p")
    val spark = items.sparkSession
    val hadSpec =
      IndexSpec.checkReturningPresence(items, dir, sketchSpec(p))
    val segDir = Segments.prepare(spark, dir, segmentId)
    hllRegisters(items, item, p)
      .write.mode("overwrite").parquet(s"$segDir/registers")
    Segments.commit(spark, segDir)
    if (!hadSpec) IndexSpec.write(items, dir, sketchSpec(p))
  }

  /** The merged sketch over every live segment (register-wise max — by
    * mergeability, identical to a one-shot build over all ingested
    * data). ≤ 2^p rows however many segments exist. */
  def readRegisters(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      p: Int): DataFrame = {
    IndexSpec.check(spark, dir, sketchSpec(p), writeIfMissing = false)
    Segments.readPart(spark, dir, "registers")
      .groupBy(col("register"))
      .agg(max(col("rank")).as("rank"))
  }

  /** Fold all live segments into one (the LSM merge keeping read fan-in
    * bounded after many streamed batches); crash-safe via the segment
    * `_replaces`-before-`_commit` ordering, single-compactor locked.
    * Returns segments merged (0–1 = nothing to do). */
  def compactRegistersSegments(
      spark: org.apache.spark.sql.SparkSession, dir: String, p: Int,
      lockLeaseMs: Long = MaintenanceLock.DefaultLeaseMs): Int = {
    IndexSpec.check(spark, dir, sketchSpec(p), writeIfMissing = false)
    MaintenanceLock.withLock(Segments.fsOf(spark, dir),
        new org.apache.hadoop.fs.Path(dir), lockLeaseMs) {
      val live = Segments.live(spark, dir)
      if (live.length <= 1) 0
      else {
        val names = live.map(d => new org.apache.hadoop.fs.Path(d).getName)
        val target = {
          val h = s"compact-${names.hashCode.toHexString}"
          if (names.contains(h)) s"$h-x" else h
        }
        val segDir = Segments.prepare(spark, dir, target)
        spark.read.parquet(live.map(s => s"$s/registers"): _*)
          .groupBy(col("register"))
          .agg(max(col("rank")).as("rank"))
          .write.mode("overwrite").parquet(s"$segDir/registers")
        Segments.commit(spark, segDir, replaces = names)
        Segments.delete(spark, live)
        live.length
      }
    }
  }

  /** DISTRIBUTED per-group approximate distinct — the scale shape of
    * `GROUP BY g, approx_count_distinct(x)` with a fully replayable
    * estimate: per (group, register) max-rank fold, then a per-group
    * harmonic sum computed in EXACT integer arithmetic by scaling
    * `2^-rank` to `2^(48-rank)` (ranks clamp at 48 — a rank beyond 48
    * witnesses ≈ m·2⁴⁸ cardinality, far past any estimable range — so
    * every term is an exact BIGINT and the sum is order-independent).
    * The only doubles are one final division and the linear-counting
    * `ln` branch, identical IEEE arithmetic on any engine; `est` rounds
    * at 4dp. Two map-side-combined shuffles: (group, register) then
    * group; intermediate size ≤ groups·2^p rows.
    *
    * Returns (group, v_zero, t_scaled, est): the exact-integer sketch
    * summary plus the corrected estimate (linear counting below
    * 2.5·m when empty registers remain, harmonic mean above). */
  def approxDistinctByGroup(
      items: DataFrame, group: Column, item: Column, p: Int): DataFrame =
    groupEstimateFromRegisters(groupRegisters(items, group, item, p), p)

  /** The (group, register, max rank) fold of [[approxDistinctByGroup]]
    * — the MERGEABLE half (register-wise max across partials), exposed
    * so segment/streaming ingests can persist per-batch partials and
    * recover the exact one-shot estimate at read time. */
  def groupRegisters(
      items: DataFrame, group: Column, item: Column, p: Int): DataFrame = {
    require(p >= 7 && p <= 12,
      s"p must be in [7, 12] for the by-group estimator: $p")
    val wBits = 64 - p
    val smeared = Seq(1, 2, 4, 8, 16, 32).foldLeft(col("__w")) { (s, k) =>
      s.bitwiseOR(shiftrightunsigned(s, k))
    }
    items
      .select(group.as("group"), item.as("__item"))
      .filter(col("__item").isNotNull)
      .select(col("group"),
        exprs.md5_lower64(concat(lit("hll:"), col("__item"))).as("__h"))
      .select(col("group"),
        shiftrightunsigned(col("__h"), wBits).cast("int").as("register"),
        col("__h").bitwiseAND(lit((1L << wBits) - 1L)).as("__w"))
      .select(col("group"), col("register"),
        when(col("__w") === 0L, lit(wBits + 1))
          .otherwise(lit(wBits + 1) - bit_count(smeared).cast("int"))
          .as("rank"))
      .groupBy(col("group"), col("register"))
      .agg(max(col("rank")).as("rank"))
  }

  /** [[approxDistinctByGroup]]'s estimator stage over an already-folded
    * (group, register, rank) table. */
  def groupEstimateFromRegisters(regs: DataFrame, p: Int): DataFrame = {
    require(p >= 7 && p <= 12,
      s"p must be in [7, 12] for the by-group estimator: $p")
    val m = 1 << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    regs.groupBy(col("group"))
      .agg(count(lit(1)).as("__filled"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 48 - least(rank, 48))"))
          .as("__tf"))
      .select(col("group"),
        (lit(m.toLong) - col("__filled")).as("v_zero"),
        (col("__tf") + (lit(m.toLong) - col("__filled")) * lit(1L << 48))
          .as("t_scaled"))
      .select(col("group"), col("v_zero"), col("t_scaled"), {
        val raw = lit(alpha * m.toDouble * m.toDouble) *
          lit((1L << 48).toDouble) / col("t_scaled").cast("double")
        round(
          when(col("v_zero") > 0L && raw <= lit(2.5 * m),
            lit(m.toDouble) *
              log(lit(m.toDouble) / col("v_zero").cast("double")))
            .otherwise(raw),
          4).as("est")
      })
  }
}

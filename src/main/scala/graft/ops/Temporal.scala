package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in for: as-of join and
  * interval range join.
  *
  * Both are expressed so Catalyst plans them as equi-shuffles: the naive
  * formulations (correlated per-row subquery, or a `t BETWEEN lo AND hi`
  * join condition with no equi-key) plan as BroadcastNestedLoopJoin /
  * CartesianProduct — O(N·M) compares that die long before 100 TB.
  */
object Temporal {

  /** As-of join: for each left row, the most recent right row with the
    * same key and `rightTime <= leftTime`; ties on time broken by the
    * largest `tieBreak`. Left rows with no matching right row keep null
    * payload (left-outer semantics).
    *
    * Plan shape: union both sides, one window pass partitioned by key and
    * ordered by (time, side, tieBreak) carrying `last(payload,
    * ignoreNulls)` — a SINGLE shuffle on the join key and no join node at
    * all. Right rows sort before left rows at equal time, so the bound is
    * inclusive. Cost is the window sort per key partition; a pathologically
    * hot key degrades to one partition's sort (salt upstream if needed).
    *
    * @param payload  right-side column names to carry; each appears in the
    *                 output as `prefix + name`
    * @param tieBreak right-side column ordering the winner among right
    *                 rows with identical (key, time) — REQUIRED so the
    *                 result is deterministic, not first-seen
    * @param tolerance max allowed `leftTime - rightTime` (same numeric
    *                 unit as the time columns, which must cast to long);
    *                 a match older than this is dropped (null payload,
    *                 pandas merge_asof-style). None = unbounded lookback.
    */
  def asofJoin(
      left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      payload: Seq[String], tieBreak: String,
      prefix: String = "asof_",
      tolerance: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "payload must name at least one right-side column")
    tolerance.foreach(t => require(t >= 0, s"tolerance must be >= 0: $t"))
    val lStructCol = struct(left.columns.map(col).toIndexedSeq: _*)
    val lType = left.select(lStructCol.as("s")).schema("s").dataType
    // the matched right row's time rides inside the payload struct so the
    // tolerance can be applied after the window carry
    val pStructCol = struct(
      (col(rightTime).cast("long").as("__mt") +: payload.map(col)).toIndexedSeq: _*)
    val pType = right.select(pStructCol.as("s")).schema("s").dataType
    // Native type so string/timestamp tie-breaks order correctly (a cast to
    // long would null them out and make the winner nondeterministic).
    val tbType = right.select(col(tieBreak).as("s")).schema("s").dataType

    val lSide = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"), lit(null).cast(tbType).as("__tb"),
      lStructCol.as("__l"), lit(null).cast(pType).as("__p"))
    // A NULL rightTime can never satisfy rightTime <= leftTime, but it would
    // sort first (nulls-first asc) and win `last(ignoreNulls)` — drop it.
    val rSide = right.filter(col(rightTime).isNotNull).select(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"), col(tieBreak).as("__tb"),
      lit(null).cast(lType).as("__l"), pStructCol.as("__p"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val out = lSide.unionByName(rSide)
      .withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched = tolerance match {
      case Some(tol) =>
        // match too old → same as no match (null payload)
        out.withColumn("__last",
          when(col("__t").cast("long") - col("__last.__mt") <= lit(tol), col("__last")))
      case None => out
    }
    matched.select(
      left.columns.map(c => col(s"__l.$c").as(c)).toIndexedSeq ++
        payload.map(p => col(s"__last.$p").as(s"$prefix$p")): _*)
  }

  /** Interval-point range join: inner-joins right rows (point `tName`)
    * to left rows (interval `[loName, hiName]`, inclusive), optionally
    * also on an equi-key.
    *
    * Plan shape: each interval explodes to the time buckets it covers;
    * each point maps to exactly ONE bucket, so the bucket match is a
    * plain equi-join producing no duplicate pairs (no post-join dedup),
    * and the exact BETWEEN runs as a post-join filter. Shuffle volume is
    * amplified only on the interval side, by ceil(span/bucketWidth)+1 —
    * pick `bucketWidth` near the typical span so the factor stays small.
    *
    * All time columns must be in the same numeric unit (e.g. epoch
    * micros). Output = left columns then right columns; the caller must
    * ensure the two sides' names are disjoint.
    */
  def rangeJoin(
      left: DataFrame, loName: String, hiName: String,
      right: DataFrame, tName: String,
      bucketWidth: Long,
      keys: Option[(String, String)] = None): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"left/right column names must be disjoint, both have: $dup")
    require(!(left.columns ++ right.columns).contains("__bucket"),
      "column name __bucket is reserved by rangeJoin")

    val lb = left.withColumn("__bucket",
      explode(sequence(
        floor(col(loName).cast("long") / bucketWidth).cast("long"),
        floor(col(hiName).cast("long") / bucketWidth).cast("long"))))
      .alias("__L")
    val rb = right.withColumn("__bucket",
      floor(col(tName).cast("long") / bucketWidth).cast("long"))
      .alias("__R")

    val bucketEq = col("__L.__bucket") === col("__R.__bucket")
    val cond = keys match {
      case Some((lk, rk)) => bucketEq && col(s"__L.$lk") === col(s"__R.$rk")
      case None => bucketEq
    }
    lb.join(rb, cond)
      .filter(col(tName).cast("long")
        .between(col(loName).cast("long"), col(hiName).cast("long")))
      .select((left.columns.map(c => col(s"__L.$c")) ++
        right.columns.map(c => col(s"__R.$c"))).toIndexedSeq: _*)
  }

  /** Interval-interval OVERLAP join: inner-joins left `[lLo, lHi]` to
    * right `[rLo, rHi]` where the closed intervals intersect
    * (`lLo <= rHi AND rLo <= lHi`), optionally also on an equi-key —
    * the session-concurrency / availability-window primitive the
    * interval-point [[rangeJoin]] cannot express.
    *
    * Plan shape: BOTH sides explode to the time buckets they cover and
    * meet in an equi-join on the bucket (plus the key), so no cross
    * join ever forms. An overlapping pair shares every bucket of its
    * intersection — it is emitted ONLY in the FIRST shared bucket
    * (`bucket == max(floor(lLo/w), floor(rLo/w))`, a post-join filter),
    * so each pair appears exactly once with NO distinct/dedup pass.
    * Shuffle amplification is ceil(span/bucketWidth)+1 per side — pick
    * `bucketWidth` near the typical span. Time columns must share one
    * numeric unit; the two sides' column names must be disjoint. */
  def intervalOverlapJoin(
      left: DataFrame, lLoName: String, lHiName: String,
      right: DataFrame, rLoName: String, rHiName: String,
      bucketWidth: Long,
      keys: Option[(String, String)] = None): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"left/right column names must be disjoint, both have: $dup")
    require(!(left.columns ++ right.columns).contains("__bucket"),
      "column name __bucket is reserved by intervalOverlapJoin")
    // ColMath.floorDiv, not `/`: double division can mis-bucket epoch
    // micros above 2^53 and the first-shared-bucket gate would then
    // drop or double-emit the pair
    def buckets(lo: String, hi: String) =
      explode(sequence(
        ColMath.floorDiv(col(lo).cast("long"), bucketWidth),
        ColMath.floorDiv(col(hi).cast("long"), bucketWidth)))
    val lb = left.withColumn("__bucket", buckets(lLoName, lHiName)).alias("__L")
    val rb = right.withColumn("__bucket", buckets(rLoName, rHiName)).alias("__R")
    val bucketEq = col("__L.__bucket") === col("__R.__bucket")
    val cond = keys match {
      case Some((lk, rk)) => bucketEq && col(s"__L.$lk") === col(s"__R.$rk")
      case None => bucketEq
    }
    val lLo = col(lLoName).cast("long")
    val lHi = col(lHiName).cast("long")
    val rLo = col(rLoName).cast("long")
    val rHi = col(rHiName).cast("long")
    lb.join(rb, cond)
      .filter(lLo <= rHi && rLo <= lHi)
      // first-shared-bucket gate: exactly-once emission, no dedup pass
      .filter(col("__L.__bucket") ===
        greatest(ColMath.floorDiv(lLo, bucketWidth),
          ColMath.floorDiv(rLo, bucketWidth)))
      .select((left.columns.map(c => col(s"__L.$c")) ++
        right.columns.map(c => col(s"__R.$c"))).toIndexedSeq: _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a (user, timestamp, action) stream:
  * ordered-funnel completion and cohort retention — the product-
  * analytics queries a clickstream warehouse serves, expressed as
  * equi-join/aggregate plans an engine can run at any scale.
  */
object Funnel {

  /** Ordered funnel: for each user, the earliest completion time of
    * every step prefix — t_i = min ts of an `actions(i)` event STRICTLY
    * AFTER t_(i-1) (the classic "view then click then purchase" chain;
    * a user's step-i event before their step-(i-1) completion does not
    * count). Returns one row per user who completed step 1:
    * (user, t_1 … t_k nullable, steps_completed).
    *
    * Scale: k−1 equi-joins on the user key, each over the single-row-
    * per-user completion table of the previous step (ids-only, the raw
    * stream is scanned once per step filter and never shuffled whole) —
    * map-side-combined mins before every shuffle. k is the funnel
    * length, a small constant. */
  def funnel(
      events: DataFrame, user: Column, ts: Column, action: Column,
      actions: Seq[String]): DataFrame = {
    require(actions.nonEmpty, "at least one funnel step required")
    require(actions.distinct.length == actions.length,
      s"duplicate funnel steps: $actions")
    val base = events.select(user.as("user"), ts.as("__ts"),
      action.as("__a"))
    val first = base.filter(col("__a") === actions.head)
      .groupBy(col("user")).agg(min(col("__ts")).as("t_1"))
    val completed = actions.zipWithIndex.tail.foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"t_$i"
        val cur = s"t_${i + 1}"
        val next = base.filter(col("__a") === step)
          .join(acc.select(col("user"), col(prev).as("__prev")), Seq("user"))
          .filter(col("__ts") > col("__prev"))
          .groupBy(col("user")).agg(min(col("__ts")).as(cur))
        acc.join(next.select(col("user"), col(cur)), Seq("user"), "left_outer")
    }
    val stepCols = actions.indices.map(i => col(s"t_${i + 1}"))
    completed.withColumn("steps_completed",
      stepCols.map(c => when(c.isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("int"))
  }

  /** Funnel conversion counts: how many users completed each step
    * prefix. One row per step: (step, action, n_users). */
  def funnelCounts(
      events: DataFrame, user: Column, ts: Column, action: Column,
      actions: Seq[String]): DataFrame = {
    val f = funnel(events, user, ts, action, actions)
    val spark = events.sparkSession
    import spark.implicits._
    val steps = actions.zipWithIndex
      .map { case (a, i) => (i + 1, a) }.toDF("step", "action")
    val counts = f.select(
      explode(array(actions.indices.map(i =>
        when(col(s"t_${i + 1}").isNotNull, lit(i + 1))): _*)).as("step"))
      .filter(col("step").isNotNull)
      .groupBy(col("step")).agg(count(lit(1)).as("n_users"))
    steps.join(counts, Seq("step"), "left_outer")
      .select(col("step"), col("action"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
  }

  /** Gap-filled per-key time series — the resample step dashboards and
    * anomaly detectors need (a missing bucket is a ZERO, not an absent
    * row): for every key, every `bucketSeconds` bucket between that
    * key's first and last event, with its event count and value sum
    * (0 for silent buckets). Returns (key, bucket, n_events, sum_value).
    *
    * Scale: one (key, bucket) aggregate + one per-key min/max aggregate
    * whose `sequence` explode emits exactly span/bucket rows per key —
    * output is the resampled series itself, nothing larger; both joins
    * are equi-joins on (key, bucket). A key spanning years at 1-second
    * buckets emits millions of rows — pick the bucket for the span. */
  def gapFillCounts(
      events: DataFrame, key: Column, ts: Column, value: Column,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds >= 1, s"bucketSeconds must be >= 1: $bucketSeconds")
    // same epoch-positive `div` caveat as [[retentionCohorts]]
    val bMicros = bucketSeconds * 1000000L
    val base = events.select(key.as("key"), unix_micros(ts).as("__us"),
        value.as("__v"))
      .select(col("key"), expr(s"__us div ${bMicros}L").as("bucket"),
        col("__v"))
    val counts = base.groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("__v")).as("__sv"))
    val buckets = base.groupBy(col("key"))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col("key"),
        explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    buckets.join(counts, Seq("key", "bucket"), "left_outer")
      .select(col("key"), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        round(coalesce(col("__sv"), lit(0.0)), 4).as("sum_value"))
  }

  /** Cohort retention: users are cohorted by the fixed `periodDays`
    * window of their FIRST event (period = unix_micros // period
    * length, exact integer arithmetic); for every (cohort, offset)
    * the count of cohort users active `offset` periods later.
    * Returns (cohort_period, period_offset, n_users) — the retention
    * triangle.
    *
    * Scale: one min-per-user aggregate, one distinct over (user,
    * period) — both map-side combined — and an equi-join on the user
    * key; no window, no cross product, cardinality ≤ users × periods. */
  def retentionCohorts(
      events: DataFrame, user: Column, ts: Column,
      periodDays: Int): DataFrame = {
    require(periodDays >= 1, s"periodDays must be >= 1: $periodDays")
    val periodMicros = periodDays.toLong * 86400L * 1000000L
    // integer `div`: exact at any timestamp (long / long in Column
    // algebra would detour through double). `div` truncates toward
    // zero, so pre-1970 timestamps would need a floor adjustment —
    // event streams are epoch-positive by construction here
    val base = events.select(user.as("user"), unix_micros(ts).as("__us"))
      .select(col("user"), expr(s"__us div ${periodMicros}L").as("__p"))
    val cohort = base.groupBy(col("user"))
      .agg(min(col("__p")).as("cohort_period"))
    base.distinct()
      .join(cohort, Seq("user"))
      .select(col("cohort_period"),
        (col("__p") - col("cohort_period")).as("period_offset"))
      .groupBy(col("cohort_period"), col("period_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}

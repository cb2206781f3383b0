package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal joins (graft.ops.Temporal): as-of / range / sessionize /
  * SCD-2 — operators Spark lacks as built-ins, planned as
  * equi-shuffles. */
private[graft] trait QueriesTemporal { self: SparkEntryFixtures =>

  def temporalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------------------
    // Temporal joins (graft.ops.Temporal): operators Spark lacks as
    // built-ins, planned as equi-shuffles (no nested-loop / cartesian).
    // Times are carried as epoch-micros longs end to end.
    // ------------------------------------------------------------------

    // As-of join, attribution shape: for each purchase, the most recent
    // click by the same user at or before the purchase (ties: largest
    // event_id). One shuffle on user_id, no join node.
    "q_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = eventsTbl(s, dir)
        .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("t_us"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"t_us")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"t_us")
      graft.ops.Temporal.asofJoin(
          purchases, "user_id", "t_us",
          clicks, "user_id", "t_us",
          payload = Seq("event_id", "t_us"), tieBreak = "event_id")
        .orderBy($"event_id")
    }),

    // As-of join with a 2-hour lookback tolerance (pandas merge_asof
    // shape): a most-recent click older than the bound is no match.
    "q_asof_tolerance" -> ((s, dir) => {
      import s.implicits._
      val ev = eventsTbl(s, dir)
        .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("t_us"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"t_us")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"t_us")
      graft.ops.Temporal.asofJoin(
          purchases, "user_id", "t_us",
          clicks, "user_id", "t_us",
          payload = Seq("event_id", "t_us"), tieBreak = "event_id",
          tolerance = Some(2L * 3600L * 1000000L))
        .orderBy($"event_id")
    }),

    // Interval range join: per purchase, count + value of view/click
    // activity by the same user in the preceding hour. Intervals bucket
    // to ≤ 2 one-hour buckets → equi-join on (user, bucket), exact
    // bounds as a post-join filter; purchases with no activity kept via
    // a final left join.
    "q_range_join" -> ((s, dir) => {
      import s.implicits._
      val hourUs = 3600L * 1000000L
      val ev = eventsTbl(s, dir)
        .select($"event_id", $"user_id", $"event_type", $"value",
          unix_micros($"ts").as("t_us"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"t_us",
          ($"t_us" - hourUs).as("lo_us"), ($"t_us" - 1L).as("hi_us"))
      val activity = ev.filter($"event_type".isin("view", "click"))
        .select($"user_id".as("a_user"), $"t_us".as("a_t_us"), $"value".as("a_value"))
      val joined = graft.ops.Temporal.rangeJoin(
        purchases, "lo_us", "hi_us", activity, "a_t_us",
        bucketWidth = hourUs, keys = Some(("user_id", "a_user")))
      val agg = joined.groupBy($"event_id")
        .agg(count(lit(1)).as("n_prior"), round(sum($"a_value"), 4).as("v_prior"))
      purchases.select($"event_id", $"user_id", $"t_us")
        .join(agg, Seq("event_id"), "left")
        .select($"event_id", $"user_id", $"t_us",
          coalesce($"n_prior", lit(0L)).as("n_prior"),
          round(coalesce($"v_prior", lit(0.0)), 4).as("v_prior"))
        .orderBy($"event_id")
    }),

    // Exact percentiles (sort-based aggregate) per group.
    "q_agg_percentile" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    })
  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator suite (SURVEY.md §2.3 delegated categories — part
  * of the complete-engine surface a reference user relies on). */
private[graft] trait QueriesRelational { self: SparkEntryFixtures =>

  def relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Aggregation with filter pushdown (TPC-H Q1 shape).
    "q_agg_pricing" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // Broadcast hash join (dim table) + aggregation.
    "q_join_broadcast" -> ((s, dir) => {
      import s.implicits._
      val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("total_price"))
        .orderBy($"c_mktsegment")
    }),

    // Multi-way join: fact ⋈ fact ⋈ broadcast dims.
    "q_join_multi" -> ((s, dir) => {
      import s.implicits._
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
      val n = tbl(s, dir, "nation")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("total_price"))
        .orderBy($"n_name")
    }),

    // Left-semi join (EXISTS).
    "q_join_semi" -> ((s, dir) => {
      import s.implicits._
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders").select($"o_custkey".as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_semi")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_nationkey")
    }),

    // Left-anti join (NOT EXISTS): customers with no high-value orders.
    "q_join_anti" -> ((s, dir) => {
      import s.implicits._
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
        .filter($"o_totalprice" > 400000.0)
        .select($"o_custkey".as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_nationkey")
    }),

    // Left outer join: every customer, order count may be zero.
    "q_join_outer" -> ((s, dir) => {
      import s.implicits._
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"),
          round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("total_price"))
        .orderBy($"c_custkey")
        .limit(1000)
    }),

    // Window: lead/lag/first_value across an ordered partition.
    "q_window_leadlag" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      tbl(s, dir, "orders")
        .filter($"o_custkey" < 200)
        .select($"o_custkey", $"o_orderkey",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          first($"o_orderkey").over(w).as("first_key"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Window: rank within group, top-k per partition.
    "q_window_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"p_brand")
        .orderBy($"p_retailprice".desc, $"p_partkey")
      tbl(s, dir, "part")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"p_brand", $"p_partkey", $"p_retailprice", $"rn")
        .orderBy($"p_brand", $"rn")
    }),

    // Window: running sum (identical accumulation order both engines →
    // bit-exact prefix sums).
    "q_window_running" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, dir, "orders")
        .filter($"o_custkey" < 100)
        .withColumn("running_total", round(sum($"o_totalprice").over(w), 2))
        .select($"o_custkey", $"o_orderkey", $"running_total")
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Global sort + limit (TakeOrderedAndProject).
    "q_sort_limit" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .limit(100)
    }),

    // Set operations.
    "q_set_intersect" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "customer").select($"c_nationkey".as("nationkey"))
        .intersect(tbl(s, dir, "supplier").select($"s_nationkey".as("nationkey")))
        .orderBy($"nationkey")
    }),
    "q_set_except" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "customer").select($"c_nationkey".as("nationkey"))
        .except(tbl(s, dir, "supplier").filter($"s_acctbal" > 9000.0)
          .select($"s_nationkey".as("nationkey")))
        .orderBy($"nationkey")
    }),
    "q_set_union" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "customer").select($"c_nationkey".as("nationkey"))
        .union(tbl(s, dir, "supplier").select($"s_nationkey".as("nationkey")))
        .distinct()
        .orderBy($"nationkey")
    }),

    // Scalar string functions.
    // Full outer join with non-matching rows on BOTH sides (disjoint
    // key-range slices force left-only and right-only null fills).
    "q_join_full" -> ((s, dir) => {
      import s.implicits._
      val cust = tbl(s, dir, "customer")
        .filter($"c_custkey" <= 100L)
        .select($"c_custkey", $"c_mktsegment")
      val ords = tbl(s, dir, "orders")
        .filter($"o_custkey".between(50L, 150L))
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
      cust.join(ords, $"c_custkey" === $"o_custkey", "full_outer")
        .select(coalesce($"c_custkey", $"o_custkey").as("custkey"),
          $"c_mktsegment", coalesce($"n_orders", lit(0L)).as("n_orders"))
        .orderBy($"custkey")
    }),

    // Schema-evolution union: unionByName null-fills columns missing on
    // one side — the heterogeneous-batch shape of long-lived pipelines.
    "q_union_by_name" -> ((s, dir) => {
      import s.implicits._
      val a = tbl(s, dir, "orders")
        .select($"o_orderpriority".as("priority"), $"o_totalprice".as("amount"))
      val b = tbl(s, dir, "lineitem")
        .select($"l_extendedprice".as("amount"))
      a.unionByName(b, allowMissingColumns = true)
        .groupBy($"priority")
        .agg(count(lit(1)).as("n"), round(sum($"amount"), 2).as("total"))
        .orderBy($"priority".asc_nulls_first)
    }),

    "q_scalar_string" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "part")
        .select(
          $"p_partkey",
          upper(substring($"p_name", 1, 10)).as("name10"),
          length($"p_name").as("name_len"),
          concat($"p_brand", lit("#"), $"p_type").as("brand_type"))
        .orderBy($"p_partkey")
    }),

    // Scalar date/time functions.
    "q_scalar_datetime" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "orders")
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("o_year"),
          month($"o_orderdate").as("o_month"),
          dayofmonth($"o_orderdate").as("o_day"),
          quarter($"o_orderdate").as("o_quarter"))
        .orderBy($"o_orderkey")
        .limit(2000)
    }),

    // CASE WHEN + conditional aggregation.
    "q_case_when" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "orders")
        .select(
          when($"o_totalprice" > 300000.0, "big")
            .when($"o_totalprice" > 100000.0, "mid")
            .otherwise("small").as("bucket"),
          $"o_totalprice")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"bucket")
    }),

    // Grouping sets (ROLLUP) — nullable group keys, NULLS FIRST pinned.
    "q_rollup" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // HAVING (post-aggregation filter).
    "q_having" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "lineitem")
        .groupBy($"l_partkey")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"))
        .filter($"sum_qty" > 150.0)
        .orderBy($"l_partkey")
    }),

    // DISTINCT aggregation.
    "q_distinct_agg" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "orders")
        .agg(
          countDistinct($"o_custkey").as("n_custs"),
          count(lit(1)).as("n_orders"))
    }),

    // Statistical aggregates: stddev/variance/median (exact interpolated
    // percentile — matches DuckDB quantile_cont).
    "q_agg_stats" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(stddev($"l_quantity"), 4).as("sd_qty"),
          round(var_samp($"l_quantity"), 4).as("var_qty"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(min($"l_extendedprice"), 2).as("min_price"),
          round(max($"l_extendedprice"), 2).as("max_price"))
        .orderBy($"l_returnflag")
    }),

    // PIVOT (conditional aggregation with fixed value list).
    "q_pivot" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum($"o_totalprice"), 2))
        .orderBy($"o_orderpriority")
    }),

    // Correlated scalar subquery through the SQL surface.
    "q_subquery_scalar" -> ((s, dir) => {
      tbl(s, dir, "customer").createOrReplaceTempView("graft_customer")
      tbl(s, dir, "orders").createOrReplaceTempView("graft_orders")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT count(*) FROM graft_orders o
          |   WHERE o.o_custkey = c.c_custkey) AS n_orders
          |FROM graft_customer c ORDER BY c_custkey LIMIT 1000""".stripMargin)
    }),

    // Array functions over split text (size/contains/element_at/sort+join).
    "q_scalar_array" -> ((s, dir) => {
      import s.implicits._
      val words = split($"p_type", " ")
      tbl(s, dir, "part")
        .select(
          $"p_partkey",
          size(words).as("n_words"),
          array_contains(words, "BRUSHED").cast("int").as("has_brushed"),
          element_at(words, 1).as("first_word"),
          array_join(sort_array(words), "_").as("sorted_words"))
        .orderBy($"p_partkey")
    }),

  )
}

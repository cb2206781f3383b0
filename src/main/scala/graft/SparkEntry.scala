package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator/capability from SURVEY.md §2
  * (the reference's own surface: indexed scans + the relational operators its
  * tests delegate to Spark) or from the training-data-pipeline extension set
  * (dedup / similarity / text analysis). Each has a DuckDB oracle in
  * [[oracleSql]] where ANSI-SQL-expressible.
  *
  * Determinism rules (driver hash-compares row values after sorting columns
  * by name):
  *   - every query ends in a total ORDER BY (unique tie-break key);
  *   - double aggregates are rounded at the data's intrinsic decimal
  *     precision (2dp for raw money sums, 4dp for price*(1-disc) products)
  *     so Spark's and DuckDB's summation-order float noise (~1e-6 at
  *     sf0.01) cannot flip the rounded digit;
  *   - ORDER BY on nullable group keys pins NULLS FIRST explicitly (Spark
  *     default asc = nulls first; DuckDB default = nulls last).
  */
object SparkEntry {

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark rejects; read the
    * raw nanos as long and convert to a microsecond timestamp. */
  private[graft] def eventsTbl(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts", timestamp_micros((col("ts") / 1000L).cast("long")))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_idx_point_lookup")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Index-engine scratch tables: the driver testdata ships single-file
  // tables, so file-level pruning needs a deterministic multi-file copy.
  // Built once per (scale factor, engine version) under target/ and
  // indexed through the public graft.index API.
  // ---------------------------------------------------------------------

  private val scratchRoot = "/root/repo/target/graft_scratch"

  private def scratchVersion: String = graft.index.IndexMetadata.CurrentVersion.toString

  /** Indexed multi-file copy of lineitem for sfDir; create-once. */
  private[graft] def indexedLineitem(s: SparkSession, dir: String): DataFrame =
    SparkEntry.synchronized {
      import graft.index.implicits._
      val sfName = new java.io.File(dir).getName
      val scratch = s"$scratchRoot/$sfName"
      val tableDir = s"$scratch/lineitem"
      s.conf.set(graft.index.IndexConf.MetastoreLocation, s"$scratch/metastore")
      val marker = new java.io.File(s"$scratch/lineitem_ready")
      val upToDate = marker.exists() &&
        new String(java.nio.file.Files.readAllBytes(marker.toPath)) == scratchVersion
      if (!upToDate) {
        s.read.parquet(s"$dir/lineitem.parquet")
          .repartition(16, col("l_orderkey"))
          .write.mode("overwrite").parquet(tableDir)
        s.index.create.mode("overwrite")
          .indexBy("l_orderkey", "l_suppkey", "l_returnflag", "l_shipdate")
          .parquet(tableDir)
        java.nio.file.Files.write(marker.toPath, scratchVersion.getBytes)
      }
      s.index.parquet(tableDir)
    }

  // ---------------------------------------------------------------------
  // Relational operator suite (SURVEY.md §2.3 delegated categories —
  // part of the complete-engine surface a reference user relies on).
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    // ------------------------------------------------------------------
    // Index engine (SURVEY.md §2.1): indexed Parquet scans — point,
    // range, IN, And/Or with unindexed residue, string equality — over a
    // multi-file lineitem copy indexed via spark.index.create. Results
    // must equal a plain scan of the original table; pruning is asserted
    // in IndexEndToEndSpec and measured in Bench.
    // ------------------------------------------------------------------

    "q_idx_point_lookup" -> ((s, dir) => {
      import s.implicits._
      val li = indexedLineitem(s, dir)
      val key = s.read.parquet(s"$dir/lineitem.parquet")
        .agg(min($"l_orderkey")).head.getLong(0)
      li.filter($"l_orderkey" === key)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity",
          $"l_returnflag")
        .orderBy($"l_linenumber")
    }),

    "q_idx_range_date" -> ((s, dir) => {
      import s.implicits._
      indexedLineitem(s, dir)
        .filter($"l_shipdate" >= lit("1992-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1992-04-01").cast("timestamp_ntz"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }),

    "q_idx_in_list" -> ((s, dir) => {
      import s.implicits._
      indexedLineitem(s, dir)
        .filter($"l_suppkey".isin(1L, 2L, 3L))
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "q_idx_and_or" -> ((s, dir) => {
      import s.implicits._
      val key = s.read.parquet(s"$dir/lineitem.parquet")
        .agg(max($"l_orderkey")).head.getLong(0)
      indexedLineitem(s, dir)
        .filter(($"l_returnflag" === "R" && $"l_suppkey" === 1L) ||
          $"l_orderkey" === key)
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_returnflag")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "q_idx_string_eq" -> ((s, dir) => {
      import s.implicits._
      indexedLineitem(s, dir)
        .filter($"l_returnflag" === "A")
        .groupBy($"l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("total"))
        .orderBy($"l_linestatus")
    }),

    // Time-window aggregation over the events table (streaming-shaped
    // query run in batch; window start rendered as string for a
    // timestamp-precision-agnostic compare).
    "q_events_window" -> ((s, dir) => {
      import s.implicits._
      eventsTbl(s, dir)
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("total_value"))
        .select(
          date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("win_start"),
          $"event_type", $"n", $"total_value")
        .orderBy($"win_start", $"event_type")
    })
  )

  /** DuckDB-dialect oracle for each query above (same table names as the
    * parquet basenames in the sf directory). */
  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_multi" ->
      """SELECT n_name, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_join_semi" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer WHERE EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer WHERE NOT EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |   AND o_totalprice > 400000.0)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_window_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) WHERE rn <= 3
        |ORDER BY p_brand, rn""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_total
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |WHERE s_acctbal > 9000.0
        |ORDER BY nationkey""".stripMargin,
    "q_set_union" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,
    "q_scalar_string" ->
      """SELECT p_partkey,
        |  upper(substr(p_name, 1, 10)) AS name10,
        |  length(p_name) AS name_len,
        |  p_brand || '#' || p_type AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_scalar_datetime" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS o_year,
        |  month(o_orderdate) AS o_month,
        |  dayofmonth(o_orderdate) AS o_day,
        |  quarter(o_orderdate) AS o_quarter
        |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin,
    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice > 300000.0 THEN 'big'
        |  WHEN o_totalprice > 100000.0 THEN 'mid'
        |  ELSE 'small' END AS bucket,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_having" ->
      """SELECT l_partkey, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_partkey
        |HAVING round(sum(l_quantity), 2) > 150.0
        |ORDER BY l_partkey""".stripMargin,
    "q_distinct_agg" ->
      """SELECT count(DISTINCT o_custkey) AS n_custs, count(*) AS n_orders
        |FROM orders""".stripMargin,
    "q_idx_point_lookup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)
        |ORDER BY l_linenumber""".stripMargin,
    "q_idx_range_date" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1992-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1992-04-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_in_list" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice
        |FROM lineitem WHERE l_suppkey IN (1, 2, 3)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_and_or" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag
        |FROM lineitem
        |WHERE (l_returnflag = 'R' AND l_suppkey = 1)
        |   OR l_orderkey = (SELECT max(l_orderkey) FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_string_eq" ->
      """SELECT l_linestatus, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem WHERE l_returnflag = 'A'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin
  )
}

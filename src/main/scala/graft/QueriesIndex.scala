package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Index engine (SURVEY.md §2.1): indexed scans — point/range/IN/
  * And-Or/dict/nested/array/map/multi-root — plus metadata-only
  * aggregates, top-k rewrite, join pruning, refresh/compact/cluster. */
private[graft] trait QueriesIndex { self: SparkEntryFixtures =>

  def indexQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

    // Same selective point query through a MULTI-ROOT index (lineitem
    // split across two sibling dirs, one index over the set): pruning
    // cuts files of both roots, results equal the plain whole table.
    "q_idx_multiroot" -> ((s, dir) => {
      import s.implicits._
      val li = indexedLineitemTwoRoots(s, dir)
      val key = s.read.parquet(s"$dir/lineitem.parquet")
        .agg(min($"l_orderkey")).head.getLong(0)
      li.filter($"l_orderkey" === key)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity",
          $"l_returnflag")
        .orderBy($"l_linenumber")
    }),

    // Same selective point query through the ORC-backed index: stripe
    // stats + bloom prune ORC files exactly as footers prune parquet; the
    // oracle reads the identical rows from the parquet table.
    "q_idx_orc" -> ((s, dir) => {
      import s.implicits._
      val li = indexedLineitemOrc(s, dir)
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
        .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1995-04-01").cast("timestamp_ntz"))
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

    // Semi-join reduction through the index ("dynamic FILE pruning" for a
    // NON-partition join key — the shape DPP can't cover): the small dim's
    // distinct keys become an IN-list the per-file sketches prune with, so
    // the fact side reads only files that can contain a matching supplier.
    // Falls back to the plain join past the key cap; semantics identical.
    "q_idx_join_prune" -> ((s, dir) => {
      import s.implicits._
      val dim = tbl(s, dir, "supplier").filter($"s_suppkey" <= 3)
        .select($"s_suppkey", $"s_name")
      graft.index.JoinPrune.semiJoinPruned(
          indexedLineitem(s, dir), dim, $"l_suppkey", $"s_suppkey")
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"s_name",
          $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Runtime BLOOM join pruning (big-dim sibling of q_idx_join_prune):
    // dim keys never collected — a min/max range cut prunes fact FILES
    // through the index and a broadcast bloom gates rows map-side before
    // the join shuffle. Bloom has no false negatives, so the result is
    // the plain inner join bit-for-bit.
    "q_idx_join_bloom" -> ((s, dir) => {
      import s.implicits._
      val dim = tbl(s, dir, "orders")
        .filter($"o_custkey" === 1L).select($"o_orderkey", $"o_orderpriority")
      graft.index.JoinPrune.bloomJoinPruned(
          indexedLineitem(s, dir), dim, $"l_orderkey", $"o_orderkey")
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey",
          $"o_orderpriority", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // ARRAY-element membership through the index: the orders-to-supplier
    // arrays table is indexed on the array column's ELEMENT domain, so
    // array_contains(supps, 3) prunes files by element min/max + sketch
    // membership — the oracle replays containment as a HAVING over the
    // base lineitem rows (order-independent, so collect_list ordering
    // cannot flake the gate).
    "q_idx_array_contains" -> ((s, dir) => {
      import s.implicits._
      indexedOrderSupps(s, dir)
        .filter(array_contains($"supps", 3L))
        .select($"l_orderkey", $"n_items")
        .orderBy($"l_orderkey")
    }),

    // AUTOMATIC join pruning on a NESTED struct-leaf key: the stock join
    // condition payload.user_id = c_custkey resolves by the chain's root
    // attribute, the probe IN binds to the relation-level dotted path,
    // and the nested fold cuts files — zero API, composing the r8 nested
    // leaves with the r9 join rule.
    "q_idx_join_auto_nested" -> ((s, dir) => {
      import s.implicits._
      val dim = tbl(s, dir, "customer").filter($"c_custkey" <= 3)
        .select($"c_custkey")
      indexedOrdersNested(s, dir)
        .join(dim, $"payload.user_id" === $"c_custkey")
        .select($"o_orderkey", $"payload.user_id".as("user_id"),
          round($"payload.price", 2).as("price"))
        .orderBy($"o_orderkey")
    }),

    // Key-domain pruning of map<primitive,_> columns: map_contains_key
    // pre-translates to key membership the index answers from key
    // min/max + dict/bloom per file; the answered VALUE (element_at)
    // comes from the scan, keyed rows only.
    "q_idx_map_contains" -> ((s, dir) => {
      import s.implicits._
      indexedOrderSuppMap(s, dir)
        .filter(map_contains_key($"suppmap", 3L))
        .select($"l_orderkey", element_at($"suppmap", 3L).as("n_supp3"))
        .orderBy($"l_orderkey")
    }),

    // STRUCT-LEAF element pruning through ONE repeated level (the most
    // common real nested shape: array<struct<...>>): indexing items.supp
    // records element-domain stats over the leaf, and exists(items,
    // x -> x.supp = 3) prunes files by leaf membership; the oracle
    // replays containment as a HAVING over the base lineitem rows.
    "q_idx_array_struct" -> ((s, dir) => {
      import s.implicits._
      indexedOrderItems(s, dir)
        .filter(exists($"items", x => x.getField("supp") === 3L))
        .select($"l_orderkey", $"n_items")
        .orderBy($"l_orderkey")
    }),

    // MAP VALUE-domain pruning: every file's maps carry the SAME keys
    // (key membership can't cut), but values are range-clustered, so
    // m['okey'] = 1 cuts files by VALUE membership intersected with the
    // key verdict; the oracle replays the map lookup on base rows.
    "q_idx_map_value" -> ((s, dir) => {
      import s.implicits._
      indexedOrderValMap(s, dir)
        .filter($"attrs".getItem("okey") === 1L)
        .select($"l_orderkey", $"n_items")
        .orderBy($"l_orderkey")
    }),

    // Element IN-list through the same index: arrays_overlap with a
    // literal array pre-translates to In(element-domain) — file cut on
    // any of the probe values; the oracle replays overlap as a HAVING
    // over base rows.
    "q_idx_arrays_overlap" -> ((s, dir) => {
      import s.implicits._
      indexedOrderSupps(s, dir)
        .filter(arrays_overlap($"supps", array(lit(3L), lit(7L))))
        .select($"l_orderkey", $"n_items")
        .orderBy($"l_orderkey")
    }),

    // ANTI-join probe-side pruning (the NOT-EXISTS decontamination
    // shape): the indexed fact sits on the RIGHT of a left_anti join —
    // probe-only, so the rule injects the dim-key IN over it (a right
    // row whose key misses every left key can never kill a left row)
    // and the fact files cut; the oracle replays NOT EXISTS.
    "q_idx_join_anti" -> ((s, dir) => {
      import s.implicits._
      val dim = tbl(s, dir, "supplier").filter($"s_suppkey" <= 20)
        .select($"s_suppkey")
      dim.join(
          indexedLineitem(s, dir)
            .filter($"l_quantity" === 50 && $"l_linenumber" === 7),
          $"s_suppkey" === $"l_suppkey", "left_anti")
        .orderBy($"s_suppkey")
    }),

    // AUTOMATIC join pruning (zero-API twin of q_idx_join_prune): a stock
    // df.join over the indexed fact — no JoinPrune call anywhere — and the
    // conf-on JoinPruneRule injects the dim-key IN probe at optimize time,
    // so per-file sketches cut fact files on a NON-partition join key.
    "q_idx_join_auto" -> ((s, dir) => {
      import s.implicits._
      val dim = tbl(s, dir, "supplier").filter($"s_suppkey" <= 3)
        .select($"s_suppkey", $"s_name")
      indexedLineitem(s, dir).join(dim, $"l_suppkey" === $"s_suppkey")
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"s_name",
          $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Query through an index built by create-on-half + append + refresh:
    // both file generations must answer, with pruning (the point key is
    // odd, so it lives only in refresh-appended files).
    "q_idx_refresh" -> ((s, dir) => {
      import s.implicits._
      val li = indexedLineitemRefreshed(s, dir)
      val oddKey = s.read.parquet(s"$dir/lineitem.parquet")
        .filter($"l_orderkey" % 2 === 1)
        .agg(min($"l_orderkey")).head.getLong(0)
      li.filter($"l_orderkey" === oddKey || $"l_returnflag" === "R")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }),

    // Aggregation through a compacted-then-refreshed index: the 32-file
    // small-file tail was rewritten by Layout.compact and re-indexed by
    // spark.index.refresh; rows must match the pre-compaction table.
    "q_idx_compact" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemCompacted(s, dir)
        .filter($"l_orderkey" <= 30000L)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }),

    // Range predicate over the range-clustered layout: min/max pruning
    // works BECAUSE the layout correlates with the predicate (the
    // hash-layout q_idx_range_date scans everything; this scans the few
    // files whose shipdate slice intersects — see IndexEndToEndSpec).
    "q_idx_range_cluster" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemClustered(s, dir)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1996-04-01").cast("timestamp_ntz"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }),

    // DOUBLE range over the price-clustered layout: footer DOUBLE stats
    // ride the IEEE754-sortable-bits canonical Long domain — pruning on
    // price/score predicates the reference's 5-type limit never served
    // (file cut asserted in IndexEndToEndSpec).
    "q_idx_range_double" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemPrice(s, dir)
        .filter($"l_extendedprice" >= 50000.0 && $"l_extendedprice" < 55000.0)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }),

    // DOUBLE point lookup through the membership sketch: equality probes
    // hash the canonical sortable-bits Long, so bloom/dict sharpen the
    // verdict exactly as for integer keys.
    "q_idx_point_double" -> ((s, dir) => {
      import s.implicits._
      val key = s.read.parquet(s"$dir/lineitem.parquet")
        .agg(max($"l_extendedprice")).head.getDouble(0)
      indexedLineitemPrice(s, dir)
        .filter($"l_extendedprice" === key)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // DECIMAL(12,2) range: canonical = unscaled Long; parquet int-backed
    // decimal footer stats serve it directly.
    "q_idx_range_decimal" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemPrice(s, dir)
        .filter($"l_quantity_dec" >= lit(BigDecimal("10.00")) &&
          $"l_quantity_dec" <= lit(BigDecimal("12.00")))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum($"l_quantity_dec").cast("double"), 2).as("sum_q"))
        .orderBy($"l_returnflag")
    }),

    // FLOAT range filter (canonical = sortable float bits widened to
    // Long); the float column only filters — outputs stay exact.
    "q_idx_range_float" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemPrice(s, dir)
        .filter($"l_discount_f" >= lit(0.09f))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }),

    // Metadata-only min/max/count over the DOUBLE column: answered from
    // the index files table, zero data files opened (MetadataAggregateRule
    // over the extended Canon domain).
    "q_idx_double_meta" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemPrice(s, dir)
        .agg(count(lit(1)).as("n_rows"),
          min($"l_extendedprice").as("min_price"),
          max($"l_extendedprice").as("max_price"))
    }),

    // NESTED-leaf predicates (payload.user_id / payload.status) served by
    // per-leaf footer stats — range + equality pruning on an event-style
    // struct table (file cut asserted in IndexEndToEndSpec).
    "q_idx_nested" -> ((s, dir) => {
      import s.implicits._
      indexedOrdersNested(s, dir)
        .filter($"payload.user_id" <= 50L && $"payload.status" === "O")
        .select($"o_orderkey", $"payload.user_id".as("user_id"),
          $"payload.status".as("status"),
          round($"payload.price", 2).as("price"))
        .orderBy($"o_orderkey")
    }),

    // NESTED top-k: stock orderBy on the struct leaf + limit — the
    // automatic rewrite resolves the dotted path and injects the bound.
    "q_idx_nested_topk" -> ((s, dir) => {
      import s.implicits._
      indexedOrdersNested(s, dir)
        .orderBy($"payload.user_id".desc, $"o_orderkey")
        .limit(100)
        .select($"o_orderkey", $"payload.user_id".as("user_id"))
    }),

    // NESTED metadata-only aggregate: count/min/max of the struct leaf
    // answered from the index files table (plan-asserted in
    // MetadataAggSpec).
    "q_idx_nested_meta" -> ((s, dir) => {
      import s.implicits._
      indexedOrdersNested(s, dir).agg(
        count(lit(1)).as("n_rows"),
        count($"payload.user_id").as("n_users"),
        min($"payload.user_id").as("min_user"),
        max($"payload.user_id").as("max_user"))
    }),

    // Range over an INT96-written (legacy) timestamp column: footer stats
    // are unusable for INT96, so this exercises the full-scan min/max
    // fallback end-to-end — pruning is asserted in IndexEndToEndSpec.
    "q_idx_range_ts_int96" -> ((s, dir) => {
      import s.implicits._
      indexedOrdersInt96(s, dir)
        .filter($"o_ordertime" >= lit("1995-01-01").cast("timestamp") &&
          $"o_ordertime" < lit("1995-07-01").cast("timestamp"))
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"o_orderstatus")
    }),

    // Co-located bucketed join: both tables pre-bucketed on the join key,
    // so the fact-to-fact join runs with ZERO exchange (e2e-asserted) —
    // the shuffle was paid once at ingest.
    "q_bucket_join" -> ((s, dir) => {
      import s.implicits._
      val (li, ord) = bucketedJoinTables(s, dir)
      li.join(ord.hint("merge"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"o_orderstatus")
    }),

    // Z-order layout: a conjunctive range on BOTH interleaved keys scans
    // only the files whose z-rectangle intersects; the oracle checks the
    // rows, the e2e suite asserts the pruning.
    "q_idx_zorder" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemZorder(s, dir)
        .filter($"l_suppkey".between(10, 25) && $"l_orderkey".between(5000, 20000))
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Metadata-only aggregates (MetadataAggregateRule): unfiltered
    // count/min/max over the indexed relation rewrite to a LocalRelation
    // computed from the index files table — ZERO data files opened (the
    // e2e suite asserts the plan; this row gates the VALUES). The date
    // column rides the same canonical epoch-day stats as range pruning.
    "q_idx_agg_meta" -> ((s, dir) => {
      import s.implicits._
      indexedLineitem(s, dir).agg(
        count(lit(1)).as("n_rows"),
        count($"l_orderkey").as("n_keys"),
        min($"l_orderkey").as("min_key"),
        max($"l_orderkey").as("max_key"),
        min($"l_shipdate").as("min_ship"),
        max($"l_shipdate").as("max_ship"))
    }),

    // Metadata-only DISTINCT: the exact dict sketches enumerate each
    // file's value set, so SELECT DISTINCT is the union of sketches —
    // no data scan (plan asserted in the e2e suite, values here).
    "q_idx_distinct_meta" -> ((s, dir) => {
      import s.implicits._
      indexedPartDict(s, dir).select($"p_brand").distinct().orderBy($"p_brand")
    }),

    // Metadata-only count(distinct) + string min/max through the dict
    // sketch union (plain string BOUNDS may be truncated and are never
    // served as answers; the dict enumerates attained values).
    "q_idx_agg_dict_meta" -> ((s, dir) => {
      import s.implicits._
      indexedPartDict(s, dir).agg(
        countDistinct($"p_type").as("n_types"),
        min($"p_type").as("min_type"),
        max($"p_type").as("max_type"))
    }),

    // Metadata-only GROUP BY partition column: per-partition stat folds
    // merged per group — the generalized spark.sql.optimizer.metadataOnly
    // (counts and bounds, not just keys). Zero data files opened.
    "q_idx_group_meta" -> ((s, dir) => {
      import s.implicits._
      indexedOrdersPart(s, dir)
        .groupBy($"o_year")
        .agg(count(lit(1)).as("n_orders"),
          min($"o_custkey").as("min_cust"),
          max($"o_custkey").as("max_cust"))
        .orderBy($"o_year")
    }),

    // Metadata-only partition-filtered global aggregate: the WHERE prunes
    // via partition values, the answer merges surviving partitions' folds.
    "q_idx_filter_meta" -> ((s, dir) => {
      import s.implicits._
      indexedOrdersPart(s, dir)
        .filter($"o_year" >= 1994 && $"o_year" <= 1996)
        .agg(count(lit(1)).as("n_orders"),
          min($"o_custkey").as("min_cust"),
          max($"o_custkey").as("max_cust"),
          min($"o_year").as("min_year"),
          max($"o_year").as("max_year"))
    }),

    // Index-backed TOP-K pruning: the per-block stats prove a cutoff T
    // with >= 100 non-null l_orderkey values above it, so `key >= T`
    // prunes whole files before the sort runs (e2e asserts the file cut;
    // this row gates the VALUES against the plain ORDER BY ... LIMIT).
    "q_idx_topk" -> ((s, dir) => {
      import s.implicits._
      graft.index.TopK.topKPruned(indexedLineitem(s, dir), $"l_orderkey", 100)
        .orderBy($"l_orderkey".desc, $"l_linenumber".desc)
        .limit(100)
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_extendedprice")
    }),

    // The AUTOMATIC twin of q_idx_topk: stock orderBy().limit() with no
    // TopK API call — TopKRewriteRule injects the index-proven bound
    // (plan-asserted + file-cut e2e in IndexEndToEndSpec).
    "q_idx_topk_auto" -> ((s, dir) => {
      import s.implicits._
      indexedLineitem(s, dir)
        .orderBy($"l_orderkey".desc, $"l_linenumber".desc)
        .limit(100)
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_extendedprice")
    }),

    // GROUPED top-k with index-backed file pruning: the 10 highest
    // custkeys PER YEAR over the Hive-partitioned orders table — one
    // range predicate (the weakest per-partition kth bound) preserves
    // every year's top-10 at once, then the window ranks survivors. The
    // fixture's hash-ish layout proves VALUES; the file cut on a
    // clustered layout is e2e-asserted in IndexEndToEndSpec.
    "q_idx_topk_group" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_year").orderBy($"o_custkey".desc, $"o_orderkey")
      graft.index.TopK.topKPerGroupPruned(
          indexedOrdersPart(s, dir), $"o_year", $"o_custkey", 10)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 10)
        .select($"o_year", $"rn", $"o_orderkey", $"o_custkey")
        .orderBy($"o_year", $"rn")
    }),

    // The AUTOMATIC twin of q_idx_topk_group: stock window rank filter,
    // no API call — TopKRewriteRule bounds Spark's WindowGroupLimit
    // lowering with the weakest per-partition kth bound (plan-asserted +
    // file-cut e2e in IndexEndToEndSpec).
    "q_idx_topk_group_auto" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_year").orderBy($"o_custkey".desc, $"o_orderkey")
      indexedOrdersPart(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 10)
        .select($"o_year", $"rn", $"o_orderkey", $"o_custkey")
        .orderBy($"o_year", $"rn")
    }),

    // Salted equi-join (hot-key skew shape): deterministic row-hash salt
    // on the big side, small side replicated xsalts, join on (key, salt);
    // merge hint keeps it a shuffle join so the salt actually matters.
    "q_skew_join" -> ((s, dir) => {
      import s.implicits._
      val joined = graft.ops.Skew.saltedJoin(
        tbl(s, dir, "lineitem").select($"l_orderkey", $"l_extendedprice"),
        "l_orderkey",
        tbl(s, dir, "orders").select($"o_orderkey", $"o_orderpriority").hint("merge"),
        "o_orderkey", salts = 8)
      joined.groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("total"))
        .orderBy($"o_orderpriority")
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

    // Dict/bitmap sketch variants under the oracle gate: exact-set dict
    // on the long key, roaring bitmap on the int line number.
    "q_idx_dict" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemDict(s, dir)
        .filter($"l_suppkey" === 7L && $"l_linenumber" === 2)
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_quantity")
        .orderBy($"l_orderkey")
    }),

    // Hive-partitioned table: partition pruning (o_year) composes with
    // index-statistics pruning (o_custkey) inside listFiles.
    // Substring predicates (Contains + EndsWith) answered by the EXACT
    // dict sketches: files whose p_type dictionary lacks a '%CONOM%'
    // match are pruned — min/max can't do this, only a dictionary can.
    "q_idx_contains" -> ((s, dir) => {
      import s.implicits._
      indexedPartDict(s, dir)
        .filter($"p_type".contains("CONOM") && $"p_brand".endsWith("3"))
        .select($"p_partkey", $"p_brand", $"p_type", $"p_retailprice")
        .orderBy($"p_partkey")
    }),

    "q_idx_partition" -> ((s, dir) => {
      import s.implicits._
      val part = indexedOrdersPart(s, dir)
      val key = s.read.parquet(s"$dir/orders.parquet")
        .filter(year($"o_orderdate") === 1995)
        .agg(min($"o_custkey")).head.getLong(0)
      part.filter($"o_year" === 1995 && $"o_custkey" === key)
        .select($"o_orderkey", $"o_custkey", $"o_year", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

  )
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Streaming (graft.streaming): Structured Streaming ingest/window/
  * session/CDC queries that must reproduce the batch answer. */
private[graft] trait QueriesStreaming { self: SparkEntryFixtures =>

  def streamingQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------------------
    // Streaming (graft.streaming): a real Structured Streaming query
    // (file source → watermark → windowed agg → memory sink) and
    // gap-based sessionization; both must reproduce the batch answer.
    // ------------------------------------------------------------------

    // statePartitions=2: state cardinality is windows × event types
    // (~200 keys), so 2 store partitions bound the per-microbatch
    // commit/IO overhead — the manual analogue of the shuffle coalescing
    // AQE would do but can't in stateful streaming. Raise with key
    // cardinality at scale.
    "q_stream_hourly" -> ((s, dir) =>
      graft.streaming.Streaming.hourlyEventCounts(s, dir, statePartitions = 2)),

    // Same aggregation through the at-scale sink: update output mode +
    // foreachBatch parquet upsert (no complete-mode driver materialization).
    // Fixed scratch location, wiped per run — repeated Verify/Bench calls
    // don't accumulate checkpoint/sink garbage.
    "q_stream_hourly_update" -> ((s, dir) => {
      import s.implicits._
      val sfName = new java.io.File(dir).getName
      val out = s"$scratchRoot/$sfName/stream_upsert"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      graft.streaming.Streaming.hourlyEventCountsUpsert(s, dir, out, statePartitions = 2)
        .orderBy($"win_start", $"event_type")
    }),

    // Streaming exact dedup: every distinct (user, event type) pair is
    // emitted exactly once (stateful dropDuplicates, append mode).
    "q_stream_dedup" -> ((s, dir) =>
      graft.streaming.Streaming.streamingDistinct(
        s, dir, Seq("user_id", "event_type"))),

    // Watermarked stream-stream inner join (click → purchase attribution
    // within 4 h, per user): state evicted by watermark + time bound,
    // append sink; static input drained ⇒ exact batch-join parity.
    "q_stream_join" -> ((s, dir) =>
      graft.streaming.Streaming.clickPurchaseJoin(s, dir, withinMinutes = 240)),

    // Stream-static broadcast enrichment (stateless streaming join).
    "q_stream_enrich" -> ((s, dir) =>
      graft.streaming.Streaming.enrichWithCustomers(s, dir)),

    // Query over a table built by streaming ingest with per-batch index
    // maintenance: indexed predicate answers through the incrementally
    // refreshed index (create on batch 0 + refresh × later batches).
    "q_stream_ingest" -> ((s, dir) => {
      import s.implicits._
      streamIngestedEvents(s, dir)
        .filter($"event_type" === "purchase")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("total_value"))
        .orderBy($"user_id")
    }),

    // Streaming near-dedup ingest: 4 ranged document slices arrive as
    // separate micro-batches (file source, one file per trigger, arrival
    // order pinned by mtime); each batch dedups against the materialized
    // MinHash index of everything kept so far, then within itself, and
    // the survivors grow the index for later batches. Oracle: unrolled
    // batch-by-batch replay on exact Jaccard — the same est==exact
    // pair-set equivalence q_dedup_minhash rests on.
    // Streaming winnow-gated ingest (nearDedupIngest's exact-substring
    // twin): per batch, dedup against the materialized winnow index of
    // everything kept so far, in-batch keep-smallest, kept fingerprints
    // land as committed segments. Oracle: sequential replay of the batch
    // fold over the bit-exact winnow pair set.
    "q_stream_winnow" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_winnow")
      graft.streaming.Streaming.winnowIngest(s, dir, work, nBatches = 4,
          k = 12, w = 8, minShared = 5L)
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    "q_stream_neardedup" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_neardedup")
      graft.streaming.Streaming.nearDedupIngest(s, dir, work, nBatches = 4,
          numHashes = 64, bands = 16, shingleK = 3, threshold = 0.5)
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    // Streaming CDC upsert ingest: keyed update micro-batches merge into
    // the bucket-partitioned keyed table (delta-proportional per-batch
    // IO; re-delivered batches converge). Final table = one-shot merge,
    // so the oracle replays updates ∪ (base ∖ updated-keys).
    "q_stream_upsert" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_upsert")
      graft.streaming.Streaming.upsertIngest(s, dir, work,
          nBatches = 4, numBuckets = 16)
        .orderBy($"doc_id")
    }),

    // Streaming vector-index ingest: 4 ranged micro-batches of
    // embeddings, each appending its IVFADC cells+codes batch-side; the
    // grown codes table then serves the standard top-10 probe —
    // identical to a one-shot build, so it shares q_ann_ivfpq's oracle.
    "q_stream_vectoringest" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      val work = scratchTableDir(dir, "stream_vectoringest")
      graft.streaming.Streaming.vectorIngest(s, dir, work, q, k = 10,
        excludeId = Some(qRow.getLong(0)))
    }),

    // Streaming CDC → SCD-2 history: the event log arrives as 4 ranged
    // (= time-ordered) micro-batches, batch 0 bootstraps the bucketed
    // history table, later batches take the delta-proportional keyed
    // merge. In-order batches ≡ the one-shot fold, so the served
    // history shares the from-scratch SCD-2 oracle.
    // Streaming JSONL file front door: raw json-lines shards arrive as
    // files, each batch routes through the one-pass PERMISSIVE parse
    // into committed batch dirs (redelivery overwrites = exactly-once).
    // Lines are constructed verbatim in both engines; the oracle derives
    // routing and parsed fields in closed form from the construction.
    "q_stream_jsonl" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_jsonl")
      val lines = tbl(s, dir, "documents").select($"doc_id",
        when($"doc_id" % 11 === 5,
          concat(lit("{\"k\": "), $"doc_id", lit(", \"s\": ")))
          .otherwise(concat(lit("{\"k\": "), $"doc_id",
            lit(", \"s\": \""), $"source", lit("\"}"))).as("line"))
      graft.streaming.Streaming.jsonlFileIngest(
          s, lines, $"doc_id", $"line", work, "k BIGINT, s STRING",
          nBatches = 4)
        .select($"k", $"s", $"quarantined", $"raw")
        .orderBy($"quarantined", $"k", $"raw")
    }),

    // Streaming mini-batch k-means ingest: the modulo-sliced batches
    // arrive as files and fold into the per-batch-committed centroid
    // state — the SAME deterministic sequence the one-shot
    // q_ann_kmeans_minibatch runs, so the two share an oracle.
    "q_stream_kmeans" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_kmeans")
      graft.streaming.Streaming.kmeansIngest(s, dir, work,
        k = 8, nBatches = 4)
    }),

    "q_stream_scd2" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_scd2")
      graft.streaming.Streaming.scd2Ingest(s, dir, work,
          nBatches = 4, numBuckets = 16)
        .select($"user_id", $"event_type",
          unix_micros($"valid_from").as("valid_from_us"),
          unix_micros($"valid_to").as("valid_to_us"),
          $"version".cast("long").as("version"), $"is_current")
        .orderBy($"user_id", $"version")
    }),

    // Streaming trigram-index ingest: 4 ranged micro-batches, each
    // appending its posting-chunk segment; the grown index serves the
    // cross-word substring exactly like a one-shot build (contains
    // verify), so it shares q_text_trgm's brute-scan oracle.
    "q_stream_trgm" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_trgm")
      graft.streaming.Streaming.trigramIngest(s, dir, work,
          pattern = "spark wind", nBatches = 4)
        .orderBy($"doc_id")
    }),

    // Streaming sketch ingest: 4 ranged micro-batches, each appending
    // its count-min cell grid as a committed segment; mergeability makes
    // the read-time cell-wise sum identical to a one-shot build, so the
    // served point estimates share q_text_cms's oracle.
    "q_stream_cms" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_cms")
      graft.streaming.Streaming.cmsIngest(s, dir, work,
          queryTerms = Seq("spark", "window", "data", "the", "graftabsent"),
          nBatches = 4, depth = 4, width = 512)
        .orderBy($"term")
    }),

    // Streaming HLL ingest: 4 ranged micro-batches each append their
    // own register table as a committed segment; register-wise max over
    // segments (idempotent + associative) recovers EXACTLY the one-shot
    // sketch, so the served registers share q_text_hll's bit-level
    // oracle.
    "q_stream_hll" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_hll")
      graft.streaming.Streaming.hllIngest(s, dir, work,
          nBatches = 4, p = 10)
        .orderBy($"register")
    }),

    // Streaming DATA-CARD ingest: 4 ranged micro-batches each append
    // their per-source count partials + HLL registers as committed
    // segments; the merged read (sums + register max + estimator)
    // equals the one-shot card, so it shares a from-scratch oracle —
    // including the exact-integer distinct-docs estimate.
    "q_stream_datacard" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_datacard")
      graft.streaming.Streaming.dataCardIngest(s, dir, work,
          nBatches = 4, p = 10)
        .orderBy($"source")
    }),

    // Streaming search-index ingest: 4 ranged micro-batches, each
    // appending its posting chunks batch-side; the grown index then
    // serves the standard conjunctive query — identical to a one-shot
    // build, so it shares q_text_search's oracle.
    "q_stream_searchingest" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_searchingest")
      graft.streaming.Streaming.searchIngest(s, dir, work,
          terms = Seq("spark", "window"), nBatches = 4)
        .orderBy($"doc_id")
    }),

    // Rolling 1-hour per-user window via a RANGE frame on event time —
    // the numeric-range formulation both engines evaluate identically.
    "q_window_range" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600L * 1000000L, 0L)
      eventsTbl(s, dir)
        .select($"event_id", $"user_id",
          count(lit(1)).over(w).as("n_1h"),
          round(sum($"value").over(w), 4).as("sum_1h"))
        .orderBy($"event_id")
    }),

    // One-pass column profiling over orders (nulls / distincts / bounds).
    "q_profile" -> ((s, dir) =>
      graft.ops.Profile.profile(
          tbl(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
            "o_orderpriority"))
        .orderBy(col("column_name"))),

    // NOTE: the HLL wide-table profile (Profile.profileApprox) is no
    // longer a scoreboard row — q_profile_portable value-gates the same
    // plan shape with SQL-replayable arithmetic, so the opaque-sketch
    // variant would only add a permanent rows-only row. The API remains
    // (CurationSpec's "profileApprox" test covers it).

    "q_sessionize" -> ((s, dir) => {
      import s.implicits._
      graft.streaming.Streaming.sessionStats(eventsTbl(s, dir), gapMinutes = 30)
        .orderBy($"user_id")
    }),

    // Spark's NATIVE session_window (gap-merged event-time sessions as a
    // grouping expression — one shuffle on (user, session)); oracle
    // replays the gap semantics with lag + cumulative sum.
    "q_session_window" -> ((s, dir) => {
      import s.implicits._
      eventsTbl(s, dir)
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("session_value"))
        .select($"user_id",
          date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("session_start"),
          $"n_events", $"session_value")
        .orderBy($"user_id", $"session_start")
    }),

    // Fixed-bound histogram of order totals via width_bucket.
    "q_agg_histogram" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "orders")
        .groupBy(width_bucket($"o_totalprice", lit(0.0), lit(600000.0), lit(24))
          .as("bucket"))
        .agg(count(lit(1)).as("n"), round(min($"o_totalprice"), 2).as("lo"),
          round(max($"o_totalprice"), 2).as("hi"))
        .orderBy($"bucket")
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
    }),

  )
}

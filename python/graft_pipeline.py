"""Python API for the graft training-data pipeline operators.

Thin pyspark wrapper over the JVM facade `graft.PythonApi` (string
column names, plain lists). Requires the graft jar on the driver
classpath, like `graft_index.py`:

    from graft_pipeline import Pipeline
    p = Pipeline(spark)

    kept = p.dedup_minhash(df, "doc_id", "text", threshold=0.5)
    p.build_search_index(df, "doc_id", "text", "/idx/search")
    hits = p.search_all(spark, "/idx/search", ["spark", "window"])
    ranked = p.bm25(spark, "/idx/search", ["spark", "window"])
    knn = p.knn_join(emb, "vec_id", "embedding", k=10)
    ranks = p.page_rank(edges, "src", "dst")

Every method returns a pyspark DataFrame (or None for builders); all
semantics and scale notes live on the Scala operators' scaladoc.
"""

from pyspark.sql import DataFrame


def _jlist(spark, values, element="String"):
    gateway = spark.sparkContext._gateway
    lst = gateway.jvm.java.util.ArrayList()
    for v in values:
        lst.add(float(v) if element == "Double" else v)
    return lst


class Pipeline:
    def __init__(self, spark):
        self._spark = spark
        self._japi = spark._jvm.graft.PythonApi
        self._jspark = spark._jsparkSession

    def _df(self, jdf):
        return DataFrame(jdf, self._spark)

    # ---- dedup ----------------------------------------------------------

    def dedup_exact(self, df, key_col, tie_break_col):
        return self._df(self._japi.dedupExact(df._jdf, key_col, tie_break_col))

    def dedup_minhash(self, df, id_col, text_col, num_hashes=64, bands=16,
                      shingle_k=3, threshold=0.5):
        return self._df(self._japi.dedupMinhash(
            df._jdf, id_col, text_col, num_hashes, bands, shingle_k, threshold))

    def build_minhash_index(self, df, id_col, text_col, path, num_hashes=64,
                            bands=16, shingle_k=3):
        self._japi.buildMinhashIndex(
            df._jdf, id_col, text_col, path, num_hashes, bands, shingle_k)

    def append_to_minhash_index(self, df, id_col, text_col, path,
                                num_hashes=64, bands=16, shingle_k=3):
        self._japi.appendToMinhashIndex(
            df._jdf, id_col, text_col, path, num_hashes, bands, shingle_k)

    def append_minhash_segment(self, df, id_col, text_col, path, segment_id,
                               num_hashes=64, bands=16, shingle_k=3):
        """Crash-safe idempotent segment append (commit-marker gated)."""
        self._japi.appendMinhashSegment(
            df._jdf, id_col, text_col, path, segment_id,
            num_hashes, bands, shingle_k)

    def compact_minhash_segments(self, path, num_hashes=64, bands=16,
                                 shingle_k=3):
        """Merge live segments into one (LSM merge); returns count merged."""
        return self._japi.compactMinhashSegments(
            self._jspark, path, num_hashes, bands, shingle_k)

    def dedup_against_index(self, df, id_col, text_col, path, num_hashes=64,
                            bands=16, shingle_k=3, threshold=0.5):
        return self._df(self._japi.dedupAgainstIndex(
            self._jspark, df._jdf, id_col, text_col, path,
            num_hashes, bands, shingle_k, threshold))

    def edit_distance_pairs(self, df, id_col, str_col, max_dist=1):
        """All pairs within levenshtein max_dist (symmetric-delete blocking,
        exact recall, no cross join). Returns (id_a, id_b, dist)."""
        return self._df(self._japi.editDistancePairs(
            df._jdf, id_col, str_col, max_dist))

    def edit_distance_lookup(self, queries, q_id_col, q_col, dict_df, w_col,
                             max_dist=1):
        """Every (query, dict entry) pair within levenshtein max_dist; the
        dictionary broadcasts so the query side never shuffles."""
        return self._df(self._japi.editDistanceLookup(
            queries._jdf, q_id_col, q_col, dict_df._jdf, w_col, max_dist))

    def spell_correct(self, queries, q_id_col, q_col, dict_df, w_col,
                      max_dist=1):
        """Best dictionary correction per query (dist asc, match asc)."""
        return self._df(self._japi.spellCorrect(
            queries._jdf, q_id_col, q_col, dict_df._jdf, w_col, max_dist))

    def build_edit_distance_index(self, df, id_col, str_col, path, max_dist=1):
        self._japi.buildEditDistanceIndex(df._jdf, id_col, str_col, path, max_dist)

    def append_edit_distance_segment(self, df, id_col, str_col, path,
                                     segment_id, max_dist=1):
        self._japi.appendEditDistanceSegment(
            df._jdf, id_col, str_col, path, segment_id, max_dist)

    def compact_edit_distance_segments(self, spark, path, max_dist=1):
        return self._japi.compactEditDistanceSegments(self._jspark, path, max_dist)

    def match_against_edit_distance_index(self, df, id_col, str_col, path,
                                          max_dist=1):
        """(id, corpus_id, dist) pairs within max_dist of indexed rows."""
        return self._df(self._japi.matchAgainstEditDistanceIndex(
            self._jspark, df._jdf, id_col, str_col, path, max_dist))

    def dedup_against_edit_distance_index(self, df, id_col, str_col, path,
                                          max_dist=1):
        """Drop batch rows within max_dist of any indexed corpus row."""
        return self._df(self._japi.dedupAgainstEditDistanceIndex(
            self._jspark, df._jdf, id_col, str_col, path, max_dist))

    def leakage_matrix(self, df, id_col, text_col, source_col,
                       k=12, w=8, min_shared=5, max_df=2**62):
        """Cross-source verbatim-overlap matrix over the winnow match
        join: (source_a, source_b, n_pairs, shared_total)."""
        return self._df(self._japi.leakageMatrix(
            df._jdf, id_col, text_col, source_col, k, w, min_shared, max_df))

    def blocklist_matches(self, df, id_col, text_col, phrases):
        """(doc_id, matched) for docs containing any blocklisted phrase —
        one Aho-Corasick pass per doc however long the list."""
        return self._df(self._japi.blocklistMatches(
            df._jdf, id_col, text_col, _jlist(self._spark, phrases)))

    def filter_blocked_phrases(self, df, text_col, phrases):
        """Rows whose text contains NO blocklisted phrase."""
        return self._df(self._japi.filterBlockedPhrases(
            df._jdf, text_col, _jlist(self._spark, phrases)))

    def winnow_fingerprints(self, df, id_col, text_col, k=12, w=8):
        """MOSS winnowing selections: (doc_id, pos, hash) per document."""
        return self._df(self._japi.winnowFingerprints(
            df._jdf, id_col, text_col, k, w))

    def winnow_pairs(self, df, id_col, text_col, k=12, w=8, min_shared=2,
                     max_df=2**62):
        """Document pairs sharing >= min_shared winnow fingerprints
        (positional substring-match signal); max_df culls boilerplate."""
        return self._df(self._japi.winnowPairs(
            df._jdf, id_col, text_col, k, w, min_shared, max_df))

    def build_winnow_index(self, df, id_col, text_col, path, k=12, w=8):
        self._japi.buildWinnowIndex(df._jdf, id_col, text_col, path, k, w)

    def append_winnow_segment(self, df, id_col, text_col, path, segment_id,
                              k=12, w=8):
        self._japi.appendWinnowSegment(
            df._jdf, id_col, text_col, path, segment_id, k, w)

    def compact_winnow_segments(self, spark, path, k=12, w=8):
        return self._japi.compactWinnowSegments(self._jspark, path, k, w)

    def dedup_against_winnow_index(self, df, id_col, text_col, path,
                                   k=12, w=8, min_shared=2):
        """Drop batch docs sharing >= min_shared stored fingerprints with
        any indexed document (ingest-time verbatim-overlap gate)."""
        return self._df(self._japi.dedupAgainstWinnowIndex(
            self._jspark, df._jdf, id_col, text_col, path, k, w, min_shared))

    # ---- text quality / decontamination ---------------------------------

    def text_signals(self, df, text_col="text"):
        return self._df(self._japi.textSignals(df._jdf, text_col))

    def redact_pii(self, df, text_col="text", out_col="redacted"):
        return self._df(self._japi.redactPii(df._jdf, text_col, out_col))

    def decontaminate(self, corpus, corpus_id, corpus_text,
                      bench, bench_id, bench_text,
                      shingle_k=8, min_overlap=1):
        return self._df(self._japi.decontaminate(
            corpus._jdf, corpus_id, corpus_text,
            bench._jdf, bench_id, bench_text, shingle_k, min_overlap))

    def decontaminate_fuzzy(self, corpus, corpus_id, corpus_text,
                            bench, bench_id, bench_text,
                            num_hashes=64, bands=16, shingle_k=3,
                            threshold=0.5):
        """Drop corpus docs that MinHash-near-match any benchmark doc."""
        return self._df(self._japi.decontaminateFuzzy(
            corpus._jdf, corpus_id, corpus_text,
            bench._jdf, bench_id, bench_text,
            num_hashes, bands, shingle_k, threshold))

    # ---- materialized search index --------------------------------------

    def build_search_index(self, df, id_col, text_col, path,
                           chunk_size=1 << 16):
        self._japi.buildSearchIndex(df._jdf, id_col, text_col, path, chunk_size)

    def append_to_search_index(self, df, id_col, text_col, path,
                               chunk_size=1 << 16):
        self._japi.appendToSearchIndex(
            df._jdf, id_col, text_col, path, chunk_size)

    def append_search_segment(self, df, id_col, text_col, path, segment_id,
                              chunk_size=1 << 16):
        """Crash-safe idempotent segment append (commit-marker gated)."""
        self._japi.appendSearchSegment(
            df._jdf, id_col, text_col, path, segment_id, chunk_size)

    def compact_search_segments(self, path, chunk_size=1 << 16):
        """Merge live segments into one (LSM merge); returns count merged."""
        return self._japi.compactSearchSegments(self._jspark, path, chunk_size)

    def search_all(self, spark, path, terms, chunk_size=1 << 16):
        return self._df(self._japi.searchIndexAll(
            self._jspark, path, _jlist(spark, terms), chunk_size))

    def bm25(self, spark, path, terms, k1=1.2, b=0.75, chunk_size=1 << 16):
        return self._df(self._japi.bm25Index(
            self._jspark, path, _jlist(spark, terms), k1, b, chunk_size))

    # ---- embeddings / ANN -----------------------------------------------

    def knn_join(self, df, id_col, vec_col, k=10, nprobe=2, kmeans_k=16,
                 iters=2):
        return self._df(self._japi.knnJoin(
            df._jdf, id_col, vec_col, k, nprobe, kmeans_k, iters))

    def build_ivfpq_index(self, df, id_col, vec_col, path, dim, cells=16,
                          m=8, codebook_k=16, seed=42):
        self._japi.buildIvfPqIndex(
            df._jdf, id_col, vec_col, path, dim, cells, m, codebook_k, seed)

    def append_to_ivfpq_index(self, df, id_col, vec_col, path, dim, cells=16,
                              m=8, codebook_k=16, seed=42):
        self._japi.appendToIvfPqIndex(
            df._jdf, id_col, vec_col, path, dim, cells, m, codebook_k, seed)

    def query_ivfpq_index(self, spark, path, query, k=10, cells=16, nprobe=4,
                          m=8, codebook_k=16, seed=42):
        return self._df(self._japi.queryIvfPqIndex(
            self._jspark, path, _jlist(spark, query, element="Double"),
            k, cells, nprobe, m, codebook_k, seed))

    # ---- sampling / splits ----------------------------------------------

    def hash_sample(self, df, id_col, fraction, salt="graft"):
        return self._df(self._japi.hashSample(df._jdf, id_col, fraction, salt))

    def assign_split(self, df, id_col, splits, salt="graft"):
        """splits: list of (name, weight) pairs summing to 1."""
        names = [n for n, _ in splits]
        weights = [w for _, w in splits]
        return self._df(self._japi.assignSplit(
            df._jdf, id_col,
            _jlist(self._spark, names),
            _jlist(self._spark, weights, element="Double"), salt))

    # ---- graph ----------------------------------------------------------

    def page_rank(self, edges, src_col, dst_col, iters=5, damp_pct=85):
        return self._df(self._japi.pageRank(
            edges._jdf, src_col, dst_col, iters, damp_pct))

    # ---- trained selection models ---------------------------------------

    def dsir_weights(self, raw, target, id_col, text_col, buckets=4096):
        """DSIR importance weight (log p_target/p_raw, integer micro-nats)
        per raw document under hashed unigram+bigram bucket models."""
        return self._df(self._japi.dsirWeights(
            raw._jdf, target._jdf, id_col, text_col, buckets))

    def dsir_select(self, raw, target, id_col, text_col, k, buckets=4096):
        """Deterministic top-k most-target-like raw documents."""
        return self._df(self._japi.dsirSelect(
            raw._jdf, target._jdf, id_col, text_col, k, buckets))

    def dsir_resample(self, raw, target, id_col, text_col, k, salt="graft",
                      buckets=4096):
        """Gumbel-top-k importance resample (P ∝ w, without replacement,
        deterministic salted-md5 noise)."""
        return self._df(self._japi.dsirResample(
            raw._jdf, target._jdf, id_col, text_col, k, salt, buckets))

    def kl_divergence(self, raw, target, id_col, text_col, buckets=4096):
        """One-row KL(target || raw) numerator over the smoothed hashed
        bucket models; KL ≈ kl_num_micro / (target_total+buckets) / 1e6."""
        return self._df(self._japi.klDivergence(
            raw._jdf, target._jdf, id_col, text_col, buckets))

    def logreg_score(self, docs, pos, neg, id_col, text_col, buckets=1024,
                     iters=5, eta_milli=500):
        """Train the LR quality classifier on pos/neg and score docs:
        (doc_id, n_features, margin_micro)."""
        return self._df(self._japi.logRegScore(
            docs._jdf, pos._jdf, neg._jdf, id_col, text_col, buckets, iters,
            eta_milli))

    # ---- containment / projection / URL / keyed table --------------------

    def containment_pairs(self, df, id_col, text_col, shingle_k=3,
                          threshold=0.8):
        """Directed containment pairs (id_a contained in id_b) via the
        lossless prefix-filter join — excerpt/quote detection."""
        return self._df(self._japi.containmentPairs(
            df._jdf, id_col, text_col, shingle_k, threshold))

    def decontaminate_containment(self, corpus, corpus_id, corpus_text,
                                  bench, bench_id, bench_text, shingle_k=8,
                                  threshold=0.6):
        """Drop corpus docs containing >= threshold of some benchmark
        doc's shingles (the quoted-verbatim case Jaccard misses)."""
        return self._df(self._japi.decontaminateContainment(
            corpus._jdf, corpus_id, corpus_text,
            bench._jdf, bench_id, bench_text, shingle_k, threshold))

    def random_projection(self, df, id_col, vec_col, out_dim, dim, seed=42):
        """Johnson-Lindenstrauss +/-1 projection to out_dim exact-integer
        components: (vec_id, proj)."""
        return self._df(self._japi.randomProjection(
            df._jdf, id_col, vec_col, out_dim, dim, seed))

    def normalize_url(self, df, url_col, out_col="norm_url"):
        """Canonical URL form (case, www, default ports, tracking params,
        param order, fragments, trailing slashes) for URL-level dedup."""
        return self._df(self._japi.normalizeUrl(df._jdf, url_col, out_col))

    def html_to_text(self, df, html_col, out_col="clean_text"):
        """HTML -> visible text: script/style/comment removal, tag
        separators, common-entity decode, whitespace collapse."""
        return self._df(self._japi.htmlToText(df._jdf, html_col, out_col))

    def html_blocks(self, df, id_col, html_col, min_tokens=5,
                    max_anchor_pct=50):
        """Link-density boilerplate pruning: split at block tags, score
        each block's anchor-token share, flag keepers.
        (doc_id, block_idx, n_tokens, anchor_tokens, kept, text)."""
        return self._df(self._japi.htmlBlocks(
            df._jdf, id_col, html_col, min_tokens, max_anchor_pct))

    def top_k_by_group(self, df, group_col, key_col, id_col, k):
        """Per-group top-k by (key desc, id asc) at aggregation cost
        (bounded heap, no window sort): (group, rank, key, id)."""
        return self._df(self._japi.topKByGroup(
            df._jdf, group_col, key_col, id_col, k))

    def kmeans_state_init(self, df, id_col, vec_col, k):
        """Mini-batch k-means: seed + fold the first batch into the
        per-cluster integer-sum state (cluster, n, sums, seed)."""
        return self._df(self._japi.kmeansStateInit(df._jdf, id_col, vec_col, k))

    def kmeans_state_update(self, state, df, id_col, vec_col):
        """Fold one more batch into the state: batch-sized assignment
        against the live sums/n centroids, exact integer accumulation."""
        return self._df(self._japi.kmeansStateUpdate(
            state._jdf, df._jdf, id_col, vec_col))

    def kmeans_state_report(self, state):
        """Live centroids of a state: (cluster, n, i, c_milli)."""
        return self._df(self._japi.kmeansStateReport(state._jdf))

    def write_jsonl_shards(self, df, shard_col, order_col, out_dir,
                           docs_per_shard):
        """Export gzipped JSON-lines chunks of N consecutive docs per
        shard key under shard=/chunk= dirs; returns rows written."""
        return self._japi.writeJsonlShards(
            df._jdf, shard_col, order_col, out_dir, docs_per_shard)

    def read_jsonl_shards(self, dir, ddl):
        """Read an exported shard tree back (JSON fields per `ddl` +
        shard/chunk directory columns)."""
        return self._df(self._japi.readJsonlShards(self._jspark, dir, ddl))

    def write_keyed_table(self, df, key_col, path, num_buckets,
                          mode="error"):
        """Create a hash-bucket-partitioned keyed table for
        delta-proportional upserts/deletes."""
        self._japi.writeKeyedTable(df._jdf, key_col, path, num_buckets, mode)

    def read_keyed_table(self, spark, path):
        return self._df(self._japi.readKeyedTable(self._jspark, path))

    def rebucket_keyed_table(self, spark, path, key_col, old_buckets,
                             new_buckets):
        """Migrate the keyed table to a new bucket count (paid-once full
        rewrite; the layout pin otherwise refuses mismatched mutation)."""
        self._japi.rebucketKeyedTable(self._jspark, path, key_col,
                                      old_buckets, new_buckets)

    def upsert_by_key(self, spark, path, updates, key_col, num_buckets):
        """MERGE a keyed delta; returns (touched_buckets, total_buckets,
        upserted, carried)."""
        return tuple(self._japi.upsertByKey(
            self._jspark, path, updates._jdf, key_col, num_buckets))

    def delete_by_key(self, spark, path, keys, key_col, num_buckets):
        """DELETE keys from the keyed table; returns (touched_buckets,
        total_buckets, deleted, carried)."""
        return tuple(self._japi.deleteByKey(
            self._jspark, path, keys._jdf, key_col, num_buckets))

    def scd2_from_change_log(self, changes, key_col, ts_col, attr_cols,
                             tie_break_cols=()):
        """Collapse a change log into SCD Type-2 history rows
        (valid_from/valid_to/version/is_current)."""
        return self._df(self._japi.scd2FromChangeLog(
            changes._jdf, key_col, ts_col,
            _jlist(self._spark, list(attr_cols)),
            _jlist(self._spark, list(tie_break_cols))))

    def scd2_write_history(self, changes, key_col, ts_col, attr_cols, path,
                           num_buckets, tie_break_cols=(), mode="error"):
        """Create the bucketed SCD-2 history table from an initial log."""
        self._japi.scd2WriteHistory(
            self._jspark, changes._jdf, key_col, ts_col,
            _jlist(self._spark, list(attr_cols)), path, num_buckets,
            _jlist(self._spark, list(tie_break_cols)), mode)

    def scd2_read_history(self, spark, path):
        return self._df(self._japi.scd2ReadHistory(self._jspark, path))

    def scd2_merge_changes(self, spark, path, batch, key_col, ts_col,
                           attr_cols, num_buckets, tie_break_cols=()):
        """MERGE a change batch into the history table (delta-proportional
        partition rewrite); returns (touched_buckets, total_buckets,
        applied, rewritten)."""
        return tuple(self._japi.scd2MergeChanges(
            self._jspark, path, batch._jdf, key_col, ts_col,
            _jlist(self._spark, list(attr_cols)), num_buckets,
            _jlist(self._spark, list(tie_break_cols))))

    def scd2_as_of(self, history, at):
        """Point-in-time view: versions valid at ISO instant `at`."""
        return self._df(self._japi.scd2AsOf(history._jdf, at))

    def scd2_lookup_as_of(self, facts, fact_key, fact_time, history,
                          key_col, attr_cols, prefix="state_"):
        """Enrich each fact row with the dimension version valid at its
        own instant (single-shuffle as-of join)."""
        return self._df(self._japi.scd2LookupAsOf(
            facts._jdf, fact_key, fact_time, history._jdf, key_col,
            _jlist(self._spark, list(attr_cols)), prefix))

    def trigram_append_segment(self, docs, id_col, text_col, path,
                               segment_id, chunk_size=1 << 16):
        """Append a batch's character trigrams as a committed segment of
        the substring (pg_trgm-style) index."""
        self._japi.trigramAppendSegment(docs._jdf, id_col, text_col, path,
                                        segment_id, chunk_size)

    def trigram_compact_segments(self, spark, path, chunk_size=1 << 16):
        return self._japi.trigramCompactSegments(self._jspark, path,
                                                 chunk_size)

    def trigram_search_substring(self, spark, path, corpus, id_col,
                                 text_col, pattern, chunk_size=1 << 16):
        """Exact substring search served index-first (candidates via
        all-trigram intersection, contains verify on candidates only)."""
        return self._df(self._japi.trigramSearchSubstring(
            self._jspark, path, corpus._jdf, id_col, text_col, pattern,
            chunk_size))

    def hybrid_retrieve(self, docs, id_col, text_col, embeddings,
                        emb_id_col, vec_col, terms, query_vec,
                        n_candidates=100, k=10, c=60):
        """BM25 + cosine candidates fused by reciprocal-rank fusion."""
        return self._df(self._japi.hybridRetrieve(
            docs._jdf, id_col, text_col, embeddings._jdf, emb_id_col,
            vec_col, _jlist(self._spark, list(terms)),
            _jlist(self._spark, list(query_vec), element="Double"),
            n_candidates, k, c))

    def rrf_fuse(self, lexical, vector, k=10, c=60):
        """Fuse two (id, score) candidate lists by RRF."""
        return self._df(self._japi.rrfFuse(lexical._jdf, vector._jdf, k, c))

    def count_min_cells(self, items, item_col, depth=4, width=4096):
        """Build the mergeable count-min cell grid over an item stream."""
        return self._df(self._japi.countMinCells(
            items._jdf, item_col, depth, width))

    def cms_merge_cells(self, a, b):
        return self._df(self._japi.cmsMergeCells(a._jdf, b._jdf))

    def cms_estimate_counts(self, cells, queries, item_col, depth=4,
                            width=4096):
        """Point-frequency upper-bound estimates for query items."""
        return self._df(self._japi.cmsEstimateCounts(
            cells._jdf, queries._jdf, item_col, depth, width))

    def cms_append_cells_segment(self, items, item_col, path, segment_id,
                                 depth=4, width=4096):
        """Append one batch's cells as a committed segment of a
        materialized sketch table (params pinned in _index_spec)."""
        self._japi.cmsAppendCellsSegment(items._jdf, item_col, depth,
                                         width, path, segment_id)

    def cms_read_cells(self, spark, path, depth=4, width=4096):
        """Merged sketch over all live segments (== one-shot build)."""
        return self._df(self._japi.cmsReadCells(self._jspark, path,
                                                depth, width))

    def cms_compact_cells_segments(self, spark, path, depth=4, width=4096):
        """Fold live segments into one; returns segments merged."""
        return self._japi.cmsCompactCellsSegments(self._jspark, path,
                                                  depth, width)

    def cms_heavy_hitters(self, items, item_col, min_count, depth=4,
                          width=4096):
        """Superset of items occurring >= min_count times."""
        return self._df(self._japi.cmsHeavyHitters(
            items._jdf, item_col, depth, width, min_count))

    def sample_negatives(self, positives, q_col, pos_col, corpus_size, k,
                         salt="graft", oversample=4):
        """Deterministic hash-probe negatives per query (dense-id corpus);
        returns (q_id, neg_id, rank)."""
        return self._df(self._japi.sampleNegatives(
            positives._jdf, q_col, pos_col, corpus_size, k, salt, oversample))

    def adjacent_chunk_pairs(self, docs, id_col, text_col, chunk_tokens=32,
                             stride=16):
        """Self-supervised (anchor, positive) pairs from consecutive
        sliding-window chunks."""
        return self._df(self._japi.adjacentChunkPairs(
            docs._jdf, id_col, text_col, chunk_tokens, stride))

    def interval_overlap_join(self, left, l_lo, l_hi, right, r_lo, r_hi,
                              bucket_width, left_key="", right_key=""):
        """Interval-interval overlap join (bucket equi-join, exactly-once
        pair emission, no cross join)."""
        return self._df(self._japi.intervalOverlapJoin(
            left._jdf, l_lo, l_hi, right._jdf, r_lo, r_hi, bucket_width,
            left_key, right_key))

    def token_entropy(self, docs, id_col, text_col):
        """Per-doc token-distribution entropy in integer micro-nats."""
        return self._df(self._japi.tokenEntropy(docs._jdf, id_col, text_col))

    def expect_check(self, df, checks):
        """Expectation report; checks = [(name, sql_predicate), ...]."""
        flat = [x for pair in checks for x in pair]
        return self._df(self._japi.expectCheck(
            df._jdf, _jlist(self._spark, flat)))

    def expect_enforce(self, df, checks):
        """expect_check + raise if any expectation fails."""
        flat = [x for pair in checks for x in pair]
        return self._df(self._japi.expectEnforce(
            df._jdf, _jlist(self._spark, flat)))

    def z_score_outliers(self, df, group_col, value_col, z=3):
        """Per-group z-score outlier rows, exact integer arithmetic."""
        return self._df(self._japi.zScoreOutliers(
            df._jdf, group_col, value_col, z))

    def hll_registers(self, items, item_col, p=12):
        """Engine-portable HyperLogLog register table (mergeable)."""
        return self._df(self._japi.hllRegisters(items._jdf, item_col, p))

    def hll_merge_registers(self, a, b):
        return self._df(self._japi.hllMergeRegisters(a._jdf, b._jdf))

    def hll_estimate_distinct(self, registers, p=12):
        return self._japi.hllEstimateDistinct(registers._jdf, p)

    def hll_approx_distinct(self, items, item_col, p=12):
        """One-call approximate distinct count (~1.04/sqrt(2^p) error)."""
        return self._japi.hllApproxDistinct(items._jdf, item_col, p)

    def hll_approx_distinct_by_group(self, items, group_col, item_col, p=10):
        """Distributed per-group approx distinct with a SQL-replayable
        estimate; returns (group, v_zero, t_scaled, est)."""
        return self._df(self._japi.hllApproxDistinctByGroup(
            items._jdf, group_col, item_col, p))

    def parse_json_tagged(self, df, json_col, schema_ddl):
        """One-pass JSON parse with quarantine routing; schema_ddl is a
        DDL fragment like 'k INT, name STRING'."""
        return self._df(self._japi.parseJsonTagged(
            df._jdf, json_col, schema_ddl))

    def parse_csv_tagged(self, df, csv_col, schema_ddl):
        """CSV twin of parse_json_tagged (type failure / short row
        quarantines)."""
        return self._df(self._japi.parseCsvTagged(
            df._jdf, csv_col, schema_ddl))

    def ingest_json_files(self, spark, input_glob, schema_ddl, out_dir):
        """JSON-lines files -> routed parquet partitioned by the
        quarantine flag; returns (good, quarantined)."""
        return tuple(self._japi.ingestJsonFiles(
            self._jspark, input_glob, schema_ddl, out_dir))

    def read_ingested(self, spark, out_dir):
        return self._df(self._japi.readIngested(self._jspark, out_dir))

    # ---- sequence packing + schedule ---------------------------------

    def pack_by_budget(self, df, shard_col, order_col, tokens_col, budget):
        """Whole-doc token-budget packs (pack_id per shard)."""
        return self._df(self._japi.packByBudget(
            df._jdf, shard_col, order_col, tokens_col, budget))

    def pack_manifest(self, df, shard_col, order_col, tokens_col, budget):
        """One row per pack: ordered members, counts, total."""
        return self._df(self._japi.packManifest(
            df._jdf, shard_col, order_col, tokens_col, budget))

    def pack_sequences(self, df, shard_col, order_col, tokens_col, seq_len):
        """Concat-and-chunk fixed-window sequence slices (docs split
        across windows; eod marks attention resets)."""
        return self._df(self._japi.packSequences(
            df._jdf, shard_col, order_col, tokens_col, seq_len))

    def materialize_sequences(self, df, shard_col, order_col,
                              tokens_arr_col, seq_len):
        """One row per fixed-length sequence with its actual token
        content (the shard a data loader consumes)."""
        return self._df(self._japi.materializeSequences(
            df._jdf, shard_col, order_col, tokens_arr_col, seq_len))

    def stride_schedule(self, seqs, shard_col, seq_id_col, weights):
        """Deterministic weighted interleave of packed sequences
        (stride scheduling); weights = {source: weight}."""
        gateway = self._spark.sparkContext._gateway
        jmap = gateway.jvm.java.util.HashMap()
        for k, v in weights.items():
            jmap.put(k, float(v))
        return self._df(self._japi.strideSchedule(
            seqs._jdf, shard_col, seq_id_col, jmap))

    # ---- event analytics ---------------------------------------------

    def funnel(self, events, user_col, ts_col, action_col, actions):
        """Ordered funnel completion times per user (strictly-after
        chain); t_1..t_k + steps_completed."""
        return self._df(self._japi.funnel(
            events._jdf, user_col, ts_col, action_col,
            _jlist(self._spark, actions)))

    def funnel_counts(self, events, user_col, ts_col, action_col, actions):
        """Users completing each funnel prefix: (step, action, n_users)."""
        return self._df(self._japi.funnelCounts(
            events._jdf, user_col, ts_col, action_col,
            _jlist(self._spark, actions)))

    def gap_fill_counts(self, events, key_col, ts_col, value_col,
                        bucket_seconds=3600):
        """Gap-filled per-key time series (silent buckets are zeros)."""
        return self._df(self._japi.gapFillCounts(
            events._jdf, key_col, ts_col, value_col, bucket_seconds))

    def stride_schedule_by(self, seqs, shard_col, seq_id_col, weights_df):
        """stride_schedule with data-derived (shard, weight) rows."""
        return self._df(self._japi.strideScheduleBy(
            seqs._jdf, shard_col, seq_id_col, weights_df._jdf))

    def retention_cohorts(self, events, user_col, ts_col, period_days=7):
        """Cohort retention triangle: (cohort_period, period_offset,
        n_users)."""
        return self._df(self._japi.retentionCohorts(
            events._jdf, user_col, ts_col, period_days))

    # ---- corpus reporting --------------------------------------------

    def corpus_data_card(self, df, source_col, text_col):
        """Per-source release summary (volume, exact dup count, language
        mix, mean quality)."""
        return self._df(self._japi.corpusDataCard(
            df._jdf, source_col, text_col))

    def append_data_card_segment(self, df, source_col, text_col, path,
                                 segment_id, p=10):
        """Append one batch's card partials as a committed segment."""
        self._japi.appendDataCardSegment(
            df._jdf, source_col, text_col, p, path, segment_id)

    def read_data_card(self, spark, path, p=10):
        """Merged incremental card (counts + HLL distinct estimate)."""
        return self._df(self._japi.readDataCard(self._jspark, path, p))

    # ---- HLL sketch segments -----------------------------------------

    def hll_append_registers_segment(self, items, item_col, path,
                                     segment_id, p=12):
        self._japi.hllAppendRegistersSegment(
            items._jdf, item_col, p, path, segment_id)

    def hll_read_registers(self, spark, path, p=12):
        return self._df(self._japi.hllReadRegisters(self._jspark, path, p))

    def hll_compact_registers_segments(self, spark, path, p=12):
        return self._japi.hllCompactRegistersSegments(self._jspark, path, p)

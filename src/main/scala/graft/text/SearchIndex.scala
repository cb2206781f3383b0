package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.tokens

/** Materialized full-text serving index — the search twin of the
  * MinHash / fingerprint / IVFADC serving indexes (`graft.dedup.Dedup`,
  * `graft.ann.Ann`): tokenize the corpus ONCE at build, serve keyword
  * search and BM25 forever after from the stored posting lists, and
  * grow by appending batches whose postings are computed batch-side
  * only (the corpus text is never re-read).
  *
  * Layout (the segment recipe of every production search engine):
  *   - `postings/`: (term, chunk_idx, postings: array<struct<doc_id, tf>>)
  *     — chunk_idx = doc_id DIV chunkSize is VALUE-derived (the chunked
  *     invertedIndex discipline): no row holds more than chunkSize
  *     entries (a stop-word term at 100 TB is many bounded rows, not one
  *     straggler), and append only ever ADDS rows (parquet append —
  *     existing files are untouched). (term, chunk_idx) is NOT a unique
  *     key across appends: a batch whose doc-id range overlaps a stored
  *     chunk's range writes a second bounded row for the same key, so
  *     readers must aggregate across rows — the probe paths here explode
  *     and re-group, never assuming one row per key. Files are
  *     repartitioned + sorted by term so a `term IN (...)` probe prunes
  *     row groups via parquet min/max stats.
  *   - `doclens/`: (doc_id, len) — the BM25 length normalizer; also
  *     metadata for N and avgdl, recomputed at probe time so append
  *     keeps scoring exact (stored aggregates would go stale).
  *
  * Scoring parity is structural: [[bm25Index]] feeds the STORED tf/len
  * tables through the same `Tfidf.bm25From` body that scores from raw
  * text, so index-served BM25 is bit-identical to a from-scratch run
  * over the same corpus — and stays exact after any number of appends.
  * The `_index_spec` guard pins `chunkSize` (mismatched chunk arithmetic
  * would interleave differently-sized chunks; the analyzer is the fixed
  * [[TextFunctions.tokens]]).
  */
object SearchIndex {

  private def spec(chunkSize: Int) = s"search chunkSize=$chunkSize"

  /** Build the index at `dir` (overwrite). One tokenize pass; postings
    * and doc lengths derive from a shared checkpointed token table. */
  def buildSearchIndex(
      docs: DataFrame, id: Column, text: Column, dir: String,
      chunkSize: Int = 1 << 16): Unit =
    writeSearchIndex(docs, id, text, dir, "overwrite", chunkSize)

  /** Append a NEW batch of documents. Only the batch is tokenized; its
    * chunks land next to the stored ones. Batch doc_ids must be fresh
    * (re-ingesting an id double-counts it, as in every serving index
    * here — dedup upstream). The append is TWO parquet jobs (doclens,
    * postings), each atomic via Spark's commit protocol but not atomic
    * together: a crash between them leaves lengths without postings, and
    * replaying the batch then double-counts doclens. A production ingest
    * that must survive mid-append crashes should stage each batch as a
    * segment + commit marker (the `ops.Layout` manifest recipe) rather
    * than re-run a partially-applied batch. */
  def appendToSearchIndex(
      docs: DataFrame, id: Column, text: Column, dir: String,
      chunkSize: Int = 1 << 16): Unit =
    writeSearchIndex(docs, id, text, dir, "append", chunkSize)

  private def writeSearchIndex(
      docs: DataFrame, id: Column, text: Column, dir: String, mode: String,
      chunkSize: Int): Unit = {
    require(chunkSize >= 1, s"chunkSize must be >= 1: $chunkSize")
    // spec ordering discipline shared with the other serving indexes:
    // overwrite drops the spec before data and rewrites it after; append
    // verifies upfront but defers a missing spec's heal/build write until
    // both data writes commit (a first-append-as-build dying mid-way must
    // not leave a valid spec over partial data)
    val hadSpec =
      if (mode == "overwrite") { graft.ops.IndexSpec.delete(docs, dir); false }
      else graft.ops.IndexSpec.checkReturningPresence(docs, dir, spec(chunkSize))
    val base = docs.select(id.as("doc_id"), tokens(text).as("__toks"))
      .localCheckpoint(eager = false)
    base.select(col("doc_id"), size(col("__toks")).as("len"))
      .write.mode(mode).parquet(s"$dir/doclens")
    base.select(col("doc_id"), explode(col("__toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term"), expr(s"doc_id div $chunkSize").as("chunk_idx"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("tf"))))
        .as("postings"))
      .repartition(col("term"))
      .sortWithinPartitions(col("term"), col("chunk_idx"))
      .write.mode(mode).parquet(s"$dir/postings")
    if (!hadSpec) graft.ops.IndexSpec.write(docs, dir, spec(chunkSize))
  }

  /** The stored (doc_id, term, tf) rows for the given terms — postings
    * read with a term-IN filter (row-group pruned), exploded. */
  // ---- crash-safe SEGMENT appends -------------------------------------
  //
  // The plain append above is two parquet jobs with no cross-job
  // atomicity (scaladoc caveat). Segments close that gap with the
  // `ops.Layout` manifest recipe: each batch writes its doclens+postings
  // under `segments/<segmentId>/` and only then creates a `_commit`
  // marker there. Probes union the base dirs with COMMITTED segments
  // only, so a batch that dies mid-write is invisible, and re-running it
  // OVERWRITES its own segment directory — per-segment-id idempotence,
  // which is exactly-once ingest under Structured Streaming's
  // at-least-once foreachBatch retries (segmentId = batchId).

  /** Idempotently (re)write one committed segment
    * ([[graft.ops.Segments]] protocol). A retried batch with the same
    * `segmentId` replaces its previous (possibly partial) attempt
    * instead of double-counting. */
  def appendSegment(
      docs: DataFrame, id: Column, text: Column, dir: String,
      segmentId: String, chunkSize: Int = 1 << 16): Unit = {
    require(chunkSize >= 1, s"chunkSize must be >= 1: $chunkSize")
    val spark = docs.sparkSession
    val hadSpec =
      graft.ops.IndexSpec.checkReturningPresence(docs, dir, spec(chunkSize))
    val segDir = graft.ops.Segments.prepare(spark, dir, segmentId)
    val base = docs.select(id.as("doc_id"), tokens(text).as("__toks"))
      .localCheckpoint(eager = false)
    // batch-bounded shape (segmentId = one micro-batch): ONE exchange on
    // term — HashPartitioning(term) satisfies BOTH aggregations'
    // clustering ((doc_id, term) ⊇ {term} and (term, chunk_idx) ⊇
    // {term}), so the tf agg, the chunk agg and the file clustering
    // share a single shuffle where the old plan paid three. The doclens
    // and postings writes are independent (visibility gated by the
    // segment commit below) and overlap (guide §2.6).
    graft.ops.Parallel.inParallel(
      base.select(col("doc_id"), size(col("__toks")).as("len"))
        .write.mode("overwrite").parquet(s"$segDir/doclens"),
      base.select(col("doc_id"), explode(col("__toks")).as("term"))
        .repartition(col("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .groupBy(col("term"), expr(s"doc_id div $chunkSize").as("chunk_idx"))
        .agg(sort_array(collect_list(struct(col("doc_id"), col("tf"))))
          .as("postings"))
        .sortWithinPartitions(col("term"), col("chunk_idx"))
        .write.mode("overwrite").parquet(s"$segDir/postings"))
    graft.ops.Segments.commit(spark, segDir)
    if (!hadSpec) graft.ops.IndexSpec.write(docs, dir, spec(chunkSize))
  }

  /** Merge all live segments into ONE canonical segment (unique
    * (term, chunk_idx) keys again) — the LSM merge step that keeps probe
    * fan-in bounded after many streamed batches. Crash-safe by write
    * ordering: the merged segment's `_replaces` list is written BEFORE
    * its `_commit` marker, so a crash before commit leaves the old
    * segments live and the merge invisible, and the instant the commit
    * lands the replaced segments stop being read even though their dirs
    * are only deleted afterwards (lazy cleanup — re-runnable). The base
    * build dirs are untouched. Returns the number of segments merged
    * (0–1 = nothing to do). */
  def compactSegments(
      spark: SparkSession, dir: String, chunkSize: Int = 1 << 16): Int = {
    graft.ops.IndexSpec.check(spark, dir, spec(chunkSize), writeIfMissing = false)
    // single-compactor lock: two concurrent compactions would derive the
    // SAME deterministic target name from the same live set and write
    // into one directory concurrently (concurrent APPENDS need no lock —
    // distinct segment dirs — and an append racing this compaction is
    // safe: the merge replaces only the segments it listed)
    graft.ops.MaintenanceLock.withLock(
        graft.ops.Segments.fsOf(spark, dir),
        new org.apache.hadoop.fs.Path(dir)) {
      compactSegmentsLocked(spark, dir)
    }
  }

  private def compactSegmentsLocked(spark: SparkSession, dir: String): Int = {
    val live = graft.ops.Segments.live(spark, dir)
    if (live.length <= 1) return 0
    val names = live.map(p => new org.apache.hadoop.fs.Path(p).getName)
    // deterministic target name; a crashed attempt is overwritten
    val target = {
      val h = s"compact-${names.hashCode.toHexString}"
      if (names.contains(h)) s"$h-x" else h // never collide with an input
    }
    val segDir = graft.ops.Segments.prepare(spark, dir, target)
    spark.read.parquet(live.map(s => s"$s/doclens"): _*)
      .write.mode("overwrite").parquet(s"$segDir/doclens")
    spark.read.parquet(live.map(s => s"$s/postings"): _*)
      .select(col("term"), col("chunk_idx"), explode(col("postings")).as("__p"))
      .groupBy(col("term"), col("chunk_idx"))
      .agg(sort_array(collect_list(col("__p"))).as("postings"))
      .repartition(col("term"))
      .sortWithinPartitions(col("term"), col("chunk_idx"))
      .write.mode("overwrite").parquet(s"$segDir/postings")
    graft.ops.Segments.commit(spark, segDir, replaces = names)
    graft.ops.Segments.delete(spark, live)
    live.length
  }

  private def readPart(spark: SparkSession, dir: String, sub: String): DataFrame =
    graft.ops.Segments.readPart(spark, dir, sub)

  private def tfFor(
      spark: SparkSession, dir: String, terms: Seq[String],
      chunkSize: Int): DataFrame = {
    graft.ops.IndexSpec.check(spark, dir, spec(chunkSize), writeIfMissing = false)
    readPart(spark, dir, "postings")
      .filter(col("term").isin(terms.distinct: _*))
      .select(col("term"), explode(col("postings")).as("__p"))
      .select(col("__p.doc_id").as("doc_id"), col("term"), col("__p.tf").as("tf"))
  }

  /** Conjunctive (AND) keyword search served from the index — row-for-row
    * what [[TextFunctions.searchAll]] answers from raw text. */
  def searchIndexAll(
      spark: SparkSession, dir: String, terms: Seq[String],
      chunkSize: Int = 1 << 16): DataFrame = {
    require(terms.nonEmpty, "at least one search term required")
    val distinct = terms.distinct
    tfFor(spark, dir, terms, chunkSize)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === distinct.size)
      .select(col("doc_id"))
  }

  /** BM25 served from the index — bit-identical to [[Tfidf.bm25]] over
    * the same corpus (shared scoring body, exact stored statistics). */
  def bm25Index(
      spark: SparkSession, dir: String, terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75,
      chunkSize: Int = 1 << 16): DataFrame = {
    require(terms.nonEmpty, "at least one query term required")
    val lens = readPart(spark, dir, "doclens")
      .select(col("doc_id"), col("len").as("__len"))
    Tfidf.bm25From(tfFor(spark, dir, terms, chunkSize), lens, k1, b)
  }
}

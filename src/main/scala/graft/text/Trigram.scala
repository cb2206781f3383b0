package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized character-TRIGRAM index — pg_trgm-style serving for
  * substring (`LIKE '%...%'`) queries over a document corpus: the one
  * query shape word-level inverted indexes cannot answer (a pattern
  * crossing word boundaries, or matching inside a token).
  *
  * Build: each document's DISTINCT trigrams over the normalized text
  * (the corpus-standard lowercase/alnum/space-squeeze normalization)
  * become chunked posting lists `(gram, chunk_idx, postings)` — the
  * same bounded-row shape as [[SearchIndex]] (no posting row exceeds
  * `chunkSize` ids, chunk key derived from `doc_id div chunkSize`, pure
  * map-side), written as crash-safe committed SEGMENTS that append per
  * batch and compact under the single-writer lock.
  *
  * Serve: a pattern's trigrams prune the postings read (parquet
  * pushdown on the sorted `gram` column), candidates = docs containing
  * ALL pattern trigrams (an intersection-count over the posting rows —
  * necessary, not sufficient), then an exact `contains` verify over
  * ONLY the candidate rows of the corpus (a semi-join read — at 100 TB
  * the corpus is never scanned; false candidates cost one row read
  * each). The verify makes results EXACT, so the oracle is the
  * brute-force substring scan itself — any blocking false-negative
  * would surface as a missing row. */
object Trigram {

  private def spec(chunkSize: Int): String = s"trigram-index:v1 chunk=$chunkSize"

  /** The corpus-standard normalization (identical on DuckDB:
    * `trim(regexp_replace(regexp_replace(lower(x),'[^a-z0-9 ]',' ','g'),' +',' ','g'))`). */
  def normText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Driver-side twin of [[normText]] for query patterns. */
  def normPattern(pattern: String): String =
    pattern.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim

  /** Distinct character trigrams of the RAW text column — the
    * normalization happens inside the codegen'd kernel in the same
    * byte pass ([[graft.functions.CharNgrams]]; an earlier
    * `transform(sequence, i -> substring(norm, i, 3))` formulation
    * re-evaluated the inlined normalization regex per position through
    * Spark's interpreted lambda — O(len²) regex work per row). */
  def trigramsOf(text: Column): Column =
    graft.functions.exprs.char_ngrams(text, 3)

  private def trigramSeq(s: String): Seq[String] =
    if (s.length < 3) Nil
    else (0 to s.length - 3).map(i => s.substring(i, i + 3)).distinct

  /** Append one batch of documents as a committed index segment. */
  def appendSegment(
      docs: DataFrame, id: Column, text: Column, dir: String,
      segmentId: String, chunkSize: Int = 1 << 16): Unit = {
    require(chunkSize >= 1, s"chunkSize must be >= 1: $chunkSize")
    val spark = docs.sparkSession
    val hadSpec =
      graft.ops.IndexSpec.checkReturningPresence(docs, dir, spec(chunkSize))
    val segDir = graft.ops.Segments.prepare(spark, dir, segmentId)
    // ONE exchange: repartition(gram) BEFORE the aggregation —
    // HashPartitioning(gram) satisfies the groupBy(gram, chunk_idx)
    // clustering requirement, so the agg reuses it and the old
    // agg-exchange + repartition-exchange pair collapses to one shuffle.
    // Shuffle bytes are identical either way: trigrams are DISTINCT per
    // doc, so the collect_list partial aggregation shipped every
    // (gram, doc_id) row regardless.
    docs.select(id.as("doc_id"), trigramsOf(text).as("__g"))
      .select(col("doc_id"), explode(col("__g")).as("gram"))
      .repartition(col("gram"))
      .groupBy(col("gram"), expr(s"doc_id div $chunkSize").as("chunk_idx"))
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
      .sortWithinPartitions(col("gram"), col("chunk_idx"))
      .write.mode("overwrite").parquet(s"$segDir/postings")
    graft.ops.Segments.commit(spark, segDir)
    if (!hadSpec) graft.ops.IndexSpec.write(docs, dir, spec(chunkSize))
  }

  /** Fold live segments into one (LSM merge, locked). Returns segments
    * merged (0–1 = nothing to do). */
  def compactSegments(
      spark: SparkSession, dir: String, chunkSize: Int = 1 << 16,
      lockLeaseMs: Long = graft.ops.MaintenanceLock.DefaultLeaseMs): Int = {
    graft.ops.IndexSpec.check(spark, dir, spec(chunkSize), writeIfMissing = false)
    graft.ops.MaintenanceLock.withLock(graft.ops.Segments.fsOf(spark, dir),
        new org.apache.hadoop.fs.Path(dir), lockLeaseMs) {
      val live = graft.ops.Segments.live(spark, dir)
      if (live.length <= 1) 0
      else {
        val names = live.map(p => new org.apache.hadoop.fs.Path(p).getName)
        val target = {
          val h = s"compact-${names.hashCode.toHexString}"
          if (names.contains(h)) s"$h-x" else h
        }
        val segDir = graft.ops.Segments.prepare(spark, dir, target)
        spark.read.parquet(live.map(s => s"$s/postings"): _*)
          .select(col("gram"), col("chunk_idx"), explode(col("postings")).as("__d"))
          .groupBy(col("gram"), col("chunk_idx"))
          .agg(sort_array(collect_list(col("__d"))).as("postings"))
          .repartition(col("gram"))
          .sortWithinPartitions(col("gram"), col("chunk_idx"))
          .write.mode("overwrite").parquet(s"$segDir/postings")
        graft.ops.Segments.commit(spark, segDir, replaces = names)
        graft.ops.Segments.delete(spark, live)
        live.length
      }
    }
  }

  /** Exact substring search served from the index: index-pruned
    * candidate intersection + `contains` verify over only the candidate
    * rows of `corpus`. The normalized pattern must be ≥ 3 chars (below
    * that a trigram index cannot prune — scan with a plain filter
    * instead). Returns the matching ids as `doc_id`. */
  def searchSubstring(
      spark: SparkSession, dir: String,
      corpus: DataFrame, id: Column, text: Column,
      pattern: String, chunkSize: Int = 1 << 16): DataFrame = {
    graft.ops.IndexSpec.check(spark, dir, spec(chunkSize), writeIfMissing = false)
    val p = normPattern(pattern)
    require(p.length >= 3,
      s"normalized pattern '$p' shorter than a trigram — use a plain " +
        "contains scan for sub-trigram patterns")
    val grams = trigramSeq(p)
    val candidates = graft.ops.Segments.readPart(spark, dir, "postings")
      .filter(col("gram").isin(grams: _*))
      .select(col("gram"), explode(col("postings")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("gram")).as("__ng"))
      .filter(col("__ng") === grams.length)
      .select(col("doc_id"))
    corpus.select(id.as("doc_id"), normText(text).as("__n"))
      .join(candidates, Seq("doc_id"), "left_semi")
      .filter(col("__n").contains(p))
      .select(col("doc_id"))
  }
}

package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Deduplication operators for training-data pipelines, all expressed as
  * declarative DataFrame transformations so Catalyst plans them (map-side
  * partial aggregation, broadcast where small, shuffle only on the chosen
  * keys):
  *
  *   - exact:   hash-groupBy on a content key;
  *   - MinHash: shingle → minhash signature → LSH band join → signature-
  *              estimated Jaccard (scale path: candidates only meet inside
  *              a band bucket — no cross join);
  *   - SimHash: 64-bit fingerprint → 16-bit chunk blocking → Hamming ≤ k;
  *   - n-gram Jaccard: exact set similarity with a size-ratio prefilter.
  *
  * All hashing is xxhash64-based and fully deterministic.
  */
object Dedup {

  // ---- exact ----------------------------------------------------------

  /** Keep one representative row (smallest tieBreak) per key. */
  def dedupExact(df: DataFrame, key: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(tieBreak)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Duplicate groups (key, size, member ids) with size > 1. The member
    * array is CAPPED at `maxMembers` smallest ids (group_size stays
    * exact): a degenerate corpus where one value dominates would
    * otherwise build a single row holding every id — the rank filter
    * runs in a spillable window over the same key partitioning (no extra
    * shuffle), so aggregation memory is bounded by the cap. */
  def exactDuplicateGroups(df: DataFrame, key: Column, id: Column,
      maxMembers: Int = 1 << 16): DataFrame = {
    require(maxMembers >= 1, s"maxMembers must be >= 1, got $maxMembers")
    val w = Window.partitionBy(col("__k")).orderBy(col("__id"))
    df.select(key.as("__k"), id.as("__id"))
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("__k").as("dup_key"))
      .agg(count(lit(1)).as("group_size"),
        sort_array(collect_list(when(col("__rn") <= maxMembers, col("__id"))))
          .as("ids"))
      .filter(col("group_size") > 1)
  }

  // ---- shingling ------------------------------------------------------

  /** Distinct k-word shingles of the normalized text; texts shorter than k
    * tokens collapse to one whole-text shingle. Native expression — the
    * HOF formulation dominated the whole dedup pipeline's runtime. */
  def shingles(text: Column, k: Int): Column =
    array_distinct(graft.functions.exprs.word_shingles(TextFunctions.tokens(text), k))

  // ---- MinHash + LSH --------------------------------------------------

  /** numHashes-long minhash signature (native expression: one xxhash64
    * pair per shingle + universal-hash composition across seeds). */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    graft.functions.exprs.minhash_signature(sh, numHashes)

  /** Estimated Jaccard = fraction of agreeing signature positions.
    * Compiled kernel ([[graft.functions.ArrayAgreeCount]]) — the
    * aggregate(zip_with(...)) HOF pair evaluated its lambdas interpreted
    * per signature position; the integer count and the division are
    * bit-identical. */
  def signatureJaccard(a: Column, b: Column): Column =
    graft.functions.exprs.array_agree_count(a, b).cast("double") /
      size(a).cast("double")

  /** The `bands` LSH band keys of a signature: band b hashes its `rows`
    * contiguous signature positions into one long. Shared by the batch
    * pair join and the materialized index so the two can never disagree. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",",
        slice(sig, b * lit(rows) + lit(1), lit(rows)).cast("array<string>"))))

  /** Candidate pairs whose signatures agree on at least one LSH band,
    * scored by signature-estimated Jaccard and thresholded.
    *
    * Scale design: docs are exploded to (bandIdx, bandKey) and candidates
    * meet through an equi-join on the band key — a hash shuffle on
    * (bandIdx, bandKey), never a cross join. Hot buckets (identical
    * boilerplate docs) are the skew risk; AQE skew-join handles moderate
    * cases, salting is the escape hatch.
    *
    * @return (id_a, id_b, est_jaccard) with id_a < id_b
    */
  def minhashPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    // Signatures feed three consumers (band explode + two per-side
    // re-joins); a lazy localCheckpoint computes them once and shares the
    // materialized blocks instead of re-running tokenize→shingle→minhash
    // per consumer (~512 B/doc of executor storage at 64 hashes; blocks
    // are released when the checkpointed RDD is GC'd via ContextCleaner,
    // i.e. after the result DataFrame itself becomes unreachable).
    val sigDf = df.select(id.as("__id"),
      minhashSignature(shingles(text, shingleK), numHashes).as("__sig"))
      .localCheckpoint(false)
    // Band join carries ids only — shipping the 64-long signatures through
    // the ×bands-exploded shuffle would amplify shuffle volume ~2×bands×
    // signature size per doc. Signatures are re-joined once per side after
    // the candidate pairs are distinct (same shape as ngramJaccardPairs).
    val banded = sigDf.select(col("__id"),
      posexplode(bandKeys(col("__sig"), bands, rows)).as(Seq("__band", "__key")))
    val candidates = banded.select(col("__band"), col("__key"), col("__id").as("id_a"))
      .join(banded.select(col("__band"), col("__key"), col("__id").as("id_b")),
        Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    candidates
      .join(sigDf.select(col("__id").as("id_a"), col("__sig").as("__sig_a")), Seq("id_a"))
      .join(sigDf.select(col("__id").as("id_b"), col("__sig").as("__sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(signatureJaccard(col("__sig_a"), col("__sig_b")), 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** Materialize the MinHash LSH serving index for INCREMENTAL dedup —
    * the ingest-time story: a 100 TB corpus' signatures are computed once
    * at index time, and each new batch only computes its OWN signatures
    * and equi-joins the stored band keys, instead of re-running
    * tokenize→shingle→minhash over the corpus per batch.
    *
    * Two tables under `dir`, keeping ids-only through the wide join:
    *   - `bands/` (band, key, doc_id) — the join side; probes JOIN on
    *     (band, key) and never filter on band alone, so the table is
    *     plain parquet (a partitionBy(band) would multiply file count
    *     ×bands for zero pruning, inflating every probe's listing);
    *   - `sigs/` (doc_id, sig) — read only to verify candidates
    *     (signature-estimated Jaccard), never exploded.
    *
    * Deterministic signatures ⇒ rebuild = rerun; append a delta batch's
    * rows to both tables to grow the index incrementally. */
  def buildMinhashIndex(
      df: DataFrame,
      id: Column,
      text: Column,
      dir: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3): Unit =
    writeMinhashIndex(df, id, text, dir, "overwrite", numHashes, bands, shingleK)

  /** Grow a [[buildMinhashIndex]] table with a delta batch's signatures
    * and band keys (the ingest-time append: a batch that survived dedup
    * becomes part of the corpus the NEXT batch dedups against).
    * Deterministic signatures make append idempotent per batch content. */
  def appendToMinhashIndex(
      df: DataFrame,
      id: Column,
      text: Column,
      dir: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3): Unit =
    writeMinhashIndex(df, id, text, dir, "append", numHashes, bands, shingleK)

  private def writeMinhashIndex(
      df: DataFrame,
      id: Column,
      text: Column,
      dir: String,
      mode: String,
      numHashes: Int,
      bands: Int,
      shingleK: Int): Unit = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val spec = s"minhash numHashes=$numHashes bands=$bands shingleK=$shingleK"
    // spec ordering (graft.ops.IndexSpec): overwrite drops the old spec
    // FIRST and writes the new one only after both data writes commit —
    // a build dying mid-way leaves no spec, so a later probe cannot
    // silently pass the guard over stale/partial data. Append verifies
    // upfront (mismatch fails before data is written) but DEFERS a
    // missing spec's heal/build write until after the data commits, for
    // the same crash guarantee.
    val hadSpec =
      if (mode == "overwrite") { graft.ops.IndexSpec.delete(df, dir); false }
      else graft.ops.IndexSpec.checkReturningPresence(df, dir, spec)
    val rows = numHashes / bands
    val sig = df.select(id.as("doc_id"),
      minhashSignature(shingles(text, shingleK), numHashes).as("sig"))
      .localCheckpoint(false)
    sig.write.mode(mode).parquet(s"$dir/sigs")
    sig.select(col("doc_id"),
        posexplode(bandKeys(col("sig"), bands, rows)).as(Seq("band", "key")))
      .select(col("band"), col("key"), col("doc_id"))
      .write.mode(mode).parquet(s"$dir/bands")
    if (!hadSpec) graft.ops.IndexSpec.write(df, dir, spec)
  }

  /** Idempotently (re)write one committed SEGMENT of the MinHash index
    * (the [[graft.ops.Segments]] protocol — the crash-safe sibling of
    * [[appendToMinhashIndex]], whose sigs+bands writes are two jobs with
    * no cross-job atomicity): a batch that dies mid-write leaves an
    * uncommitted, invisible segment, and a retried batch with the same
    * `segmentId` replaces its previous attempt instead of
    * double-counting — exactly-once ingest under foreachBatch's
    * at-least-once retries (segmentId = batchId). Probes union the base
    * dirs with committed segments transparently. */
  def appendMinhashSegment(
      df: DataFrame,
      id: Column,
      text: Column,
      dir: String,
      segmentId: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3): Unit = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val spec = s"minhash numHashes=$numHashes bands=$bands shingleK=$shingleK"
    val spark = df.sparkSession
    val hadSpec = graft.ops.IndexSpec.checkReturningPresence(df, dir, spec)
    val segDir = graft.ops.Segments.prepare(spark, dir, segmentId)
    val rows = numHashes / bands
    val sig = df.select(id.as("doc_id"),
      minhashSignature(shingles(text, shingleK), numHashes).as("sig"))
      .localCheckpoint(false)
    sig.write.mode("overwrite").parquet(s"$segDir/sigs")
    sig.select(col("doc_id"),
        posexplode(bandKeys(col("sig"), bands, rows)).as(Seq("band", "key")))
      .select(col("band"), col("key"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$segDir/bands")
    graft.ops.Segments.commit(spark, segDir)
    if (!hadSpec) graft.ops.IndexSpec.write(df, dir, spec)
  }

  /** Merge all live MinHash segments into one (the LSM merge step; same
    * crash-safe `_replaces`-before-`_commit` ordering as the search
    * index's [[graft.text.SearchIndex.compactSegments]]). Returns the
    * number of segments merged (0–1 = nothing to do). */
  def compactMinhashSegments(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3): Int = {
    graft.ops.IndexSpec.check(spark, dir,
      s"minhash numHashes=$numHashes bands=$bands shingleK=$shingleK",
      writeIfMissing = false)
    // single-compactor lock (see SearchIndex.compactSegments)
    graft.ops.MaintenanceLock.withLock(
        graft.ops.Segments.fsOf(spark, dir),
        new org.apache.hadoop.fs.Path(dir)) {
      compactMinhashLocked(spark, dir)
    }
  }

  private def compactMinhashLocked(
      spark: org.apache.spark.sql.SparkSession, dir: String): Int = {
    val live = graft.ops.Segments.live(spark, dir)
    if (live.length <= 1) return 0
    val names = live.map(p => new org.apache.hadoop.fs.Path(p).getName)
    val target = {
      val h = s"compact-${names.hashCode.toHexString}"
      if (names.contains(h)) s"$h-x" else h
    }
    val segDir = graft.ops.Segments.prepare(spark, dir, target)
    live.map(s => spark.read.parquet(s"$s/sigs")).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$segDir/sigs")
    live.map(s => spark.read.parquet(s"$s/bands")).reduce(_ unionByName _)
      .select(col("band"), col("key"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$segDir/bands")
    graft.ops.Segments.commit(spark, segDir, replaces = names)
    graft.ops.Segments.delete(spark, live)
    live.length
  }

  /** Drop every row of `df` (a NEW batch) that is a MinHash near-duplicate
    * (signature-estimated Jaccard ≥ threshold) of any document in the
    * [[buildMinhashIndex]] table at `dir`. The batch side computes its
    * signatures once; the corpus side contributes only stored band keys
    * (ids through the shuffle) and the candidate signatures — the corpus
    * text is never read. Same banding/verify arithmetic as
    * [[minhashPairs]], so recall is identical. In-batch duplicates are
    * NOT removed here — run [[dedupMinhash]] on the batch first (or after)
    * if both levels are wanted. */
  def dedupAgainstIndex(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      id: Column,
      text: Column,
      dir: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    graft.ops.IndexSpec.check(df, dir,
      s"minhash numHashes=$numHashes bands=$bands shingleK=$shingleK")
    val rows = numHashes / bands
    val sigDf = df.select(id.as("__id"),
      minhashSignature(shingles(text, shingleK), numHashes).as("__sig"))
      .localCheckpoint(false)
    // batch signatures ride the band explode (batch-bounded shuffle) so
    // the batch re-join disappears; the corpus side stays ids-only —
    // same shape as dedupAgainstIndexSigned. NO broadcast hints here,
    // deliberately (A/B'd r14): this one-shot op reads parquet on both
    // sides, so Catalyst has real size stats and already broadcasts the
    // bounded batch side (locally AND at scale); forcing hints
    // serialized the broadcast builds and measured slower. Explicit
    // hints belong to the stats-less CHECKPOINTED streaming frames
    // (dedupAgainstIndexSigned).
    val newBands = sigDf.select(col("__id"), col("__sig"),
      posexplode(bandKeys(col("__sig"), bands, rows)).as(Seq("band", "key")))
    val corpusBands = graft.ops.Segments.readPart(spark, dir, "bands")
      .select(col("band"), col("key"), col("doc_id").as("__corpus_id"))
    val candidates = newBands.join(corpusBands, Seq("band", "key"))
      .select(col("__id"), col("__sig"), col("__corpus_id"))
    val corpusSigs = graft.ops.Segments.readPart(spark, dir, "sigs")
      .select(col("doc_id").as("__corpus_id"), col("sig").as("__corpus_sig"))
    val dups = candidates
      .join(corpusSigs, Seq("__corpus_id"))
      .filter(round(signatureJaccard(col("__sig"), col("__corpus_sig")), 4)
        >= threshold)
      .select(col("__id").as("__dup_id")).distinct()
    df.join(dups, id === col("__dup_id"), "left_anti")
  }

  /** Remove near-duplicates: drop every doc that pairs with a smaller id. */
  def dedupMinhash(
      df: DataFrame,
      id: Column,
      text: Column,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val dupIds = minhashPairs(df, id, text, numHashes, bands, shingleK, threshold)
      .select(col("id_b").as("__dup_id")).distinct()
    df.join(dupIds, id === col("__dup_id"), "left_anti")
  }

  // ---- shared-signature batch path (streaming ingest) ------------------
  //
  // A streaming near-dedup batch needs signatures THREE times — the
  // index probe, the in-batch dedup, and the kept-segment append. The
  // *Signed variants run the identical banding/verify arithmetic over a
  // (doc_id, text, sig) frame computed once, so the tokenize→shingle→
  // minhash kernel is paid once per batch instead of three times.

  /** Sign a batch once: (doc_id, sig) ONLY — ~512 B/doc of shareable
    * checkpointed blocks (lazy localCheckpoint). Deliberately WITHOUT the
    * text column: checkpointing document text costs more than the
    * signature kernel saves; callers recover text with one final
    * semi-join against the batch. */
  def minhashSigned(df: DataFrame, id: Column, text: Column,
      numHashes: Int = 64, shingleK: Int = 3): DataFrame =
    df.select(id.as("doc_id"),
      minhashSignature(shingles(text, shingleK), numHashes).as("sig"))
      .localCheckpoint(false)

  /** [[dedupAgainstIndex]] over a pre-signed frame — returns the
    * SURVIVING signed rows. */
  def dedupAgainstIndexSigned(
      spark: org.apache.spark.sql.SparkSession,
      signed: DataFrame,
      dir: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    graft.ops.IndexSpec.check(signed, dir,
      s"minhash numHashes=$numHashes bands=$bands shingleK=$shingleK")
    val rows = numHashes / bands
    // the BATCH side's signature rides its band explode (batch-bounded,
    // ~512 B × bands per doc) so the batch re-join disappears — and the
    // batch-derived side BROADCASTS (micro-batches are bounded by design,
    // the same contract as Parallel.cpuBound): the corpus `bands`/`sigs`
    // tables — the frames that GROW with the corpus — are only scanned
    // map-side, never shuffled, per micro-batch. Without the hint the
    // checkpointed batch's size estimate is unknown, so Catalyst planned
    // sort-merge and re-shuffled the stored tables on every batch.
    val newBands = signed.select(col("doc_id").as("__id"), col("sig").as("__sig"),
      posexplode(bandKeys(col("sig"), bands, rows)).as(Seq("band", "key")))
    val corpusBands = graft.ops.Segments.readPart(spark, dir, "bands")
      .select(col("band"), col("key"), col("doc_id").as("__corpus_id"))
    // no intermediate distinct: a pair surfacing from several shared
    // bands only re-evaluates the cheap signatureJaccard in the verify
    // join, while the distinct costs a full extra Exchange per batch
    val candidates = broadcast(newBands).join(corpusBands, Seq("band", "key"))
      .select(col("__id"), col("__sig"), col("__corpus_id"))
    val corpusSigs = graft.ops.Segments.readPart(spark, dir, "sigs")
      .select(col("doc_id").as("__corpus_id"), col("sig").as("__corpus_sig"))
    // candidates are bounded by batch × band collisions — broadcast them
    // through the verify too, so the corpus signature table is likewise
    // scanned in place; the dup-id distinct is dropped (an anti-join
    // build side dedups by construction, the distinct only cost an
    // Exchange per batch)
    val dups = broadcast(candidates)
      .join(corpusSigs, Seq("__corpus_id"))
      .filter(round(signatureJaccard(col("__sig"), col("__corpus_sig")), 4)
        >= threshold)
      .select(col("__id").as("__dup_id"))
    signed.join(broadcast(dups), col("doc_id") === col("__dup_id"), "left_anti")
  }

  /** [[dedupMinhash]] over a pre-signed frame — drops every doc pairing
    * (est. Jaccard >= threshold) with a smaller id, returns surviving
    * signed rows. */
  def dedupMinhashSigned(
      signed: DataFrame,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    // The input is a BATCH (streaming ingest unit), bounded by design —
    // unlike the corpus-wide minhashPairs, signatures can ride the band
    // explode (bands × ~512 B/doc of batch-bounded shuffle), so the
    // verify runs INSIDE the one band self-join instead of two extra
    // re-joins against the signature table (2 fewer joins per
    // micro-batch; identical pair set and verify arithmetic).
    val banded = signed.select(col("doc_id").as("__id"), col("sig").as("__sig"),
      posexplode(bandKeys(col("sig"), bands, rows)).as(Seq("__band", "__key")))
    // band-collision multiplicity re-verifies the cheap agreement count
    // (no intermediate distinct — an Exchange per micro-batch). The self-
    // join BROADCASTS its build side (batch-bounded by design, like the
    // probe in dedupAgainstIndexSigned) so the in-batch dedup plans with
    // NO shuffle at all; the dup-id distinct is dropped (the anti-join
    // build side dedups by construction)
    val dupIds = banded.select(col("__band"), col("__key"),
        col("__id").as("id_a"), col("__sig").as("__sig_a"))
      .join(broadcast(banded.select(col("__band"), col("__key"),
        col("__id").as("id_b"), col("__sig").as("__sig_b"))),
        Seq("__band", "__key"))
      .filter(col("id_a") < col("id_b"))
      .filter(round(signatureJaccard(col("__sig_a"), col("__sig_b")), 4) >= threshold)
      .select(col("id_b").as("__dup_id"))
    signed.join(broadcast(dupIds), col("doc_id") === col("__dup_id"), "left_anti")
  }

  /** [[appendMinhashSegment]] from pre-signed rows — no re-signing. */
  def appendMinhashSegmentSigned(
      signed: DataFrame,
      dir: String,
      segmentId: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleK: Int = 3): Unit = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val spec = s"minhash numHashes=$numHashes bands=$bands shingleK=$shingleK"
    val spark = signed.sparkSession
    val hadSpec = graft.ops.IndexSpec.checkReturningPresence(signed, dir, spec)
    val segDir = graft.ops.Segments.prepare(spark, dir, segmentId)
    val rows = numHashes / bands
    val sig = signed.select(col("doc_id"), col("sig"))
    sig.write.mode("overwrite").parquet(s"$segDir/sigs")
    sig.select(col("doc_id"),
        posexplode(bandKeys(col("sig"), bands, rows)).as(Seq("band", "key")))
      .select(col("band"), col("key"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$segDir/bands")
    graft.ops.Segments.commit(spark, segDir)
    if (!hadSpec) graft.ops.IndexSpec.write(signed, dir, spec)
  }

  // ---- SimHash --------------------------------------------------------

  /** 64-bit SimHash of the token multiset: per token hash, each bit votes
    * ±1; fingerprint bit = sign of the vote sum. Native expression —
    * the HOF formulation (aggregate × zip_with over 64 bits) evaluates
    * interpreted per element and is ~100× slower. */
  def simhash64(text: Column, algo: String = "xx"): Column =
    graft.functions.exprs.simhash64(TextFunctions.tokens(text), algo)

  /** Near-dup pairs by SimHash Hamming distance ≤ maxDist — see
    * [[fingerprintPairs]] for the blocking scheme. */
  def simhashPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      maxDist: Int = 3,
      algo: String = "xx"): DataFrame =
    fingerprintPairs(df, id, simhash64(text, algo), maxDist)

  /** The maxDist+1 pigeonhole bit-chunks of a 64-bit fingerprint: chunk c
    * covers `width` bits starting at `off`; the first `rem` chunks get one
    * extra bit so the 64 bits are fully partitioned. Two fingerprints at
    * Hamming ≤ maxDist agree on at least one chunk (pigeonhole), so
    * equi-joining on (chunk, value) is a complete blocking. */
  private def fpChunkCols(fp: Column, maxDist: Int): Seq[Column] = {
    val nChunks = maxDist + 1
    val base = 64 / nChunks
    val rem = 64 % nChunks
    (0 until nChunks).map { c =>
      val width = base + (if (c < rem) 1 else 0)
      val off = c * base + math.min(c, rem)
      val mask = if (width == 64) -1L else (1L << width) - 1L
      call_function("shiftright", fp, lit(off)).bitwiseAND(mask)
    }
  }

  /** Near-dup pairs of ANY 64-bit fingerprint column (SimHash, perceptual
    * image hash, …) by Hamming distance ≤ maxDist, blocked on the
    * [[fpChunkCols]] pigeonhole chunks — complete for any
    * 1 ≤ maxDist ≤ 15; returns (id_a < id_b, hamming). */
  def fingerprintPairs(
      df: DataFrame,
      id: Column,
      fingerprint: Column,
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 1 && maxDist <= 15,
      s"maxDist must be in [1, 15] (need maxDist+1 chunks of >=4 bits): $maxDist")
    val fp = df.select(id.as("__id"), fingerprint.as("__fp"))
    val chunked = fp.select(col("__id"), col("__fp"),
      posexplode(array(fpChunkCols(col("__fp"), maxDist): _*))
        .as(Seq("__chunk", "__val")))
    val left = chunked.select(col("__chunk"), col("__val"),
      col("__id").as("id_a"), col("__fp").as("__fp_a"))
    val right = chunked.select(col("__chunk"), col("__val"),
      col("__id").as("id_b"), col("__fp").as("__fp_b"))
    left.join(right, Seq("__chunk", "__val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__fp_a").bitwiseXOR(col("__fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming"))
  }

  // ---- materialized fingerprint (Hamming) index -----------------------

  /** Materialize the Hamming-space serving index — the fingerprint twin
    * of [[buildMinhashIndex]], for any 64-bit fingerprint (SimHash,
    * perceptual image hash, audio envelope): fingerprints are computed
    * ONCE at index time, and a new batch equi-joins the stored pigeonhole
    * chunks instead of re-fingerprinting the corpus per batch.
    *
    * Two tables under `dir`:
    *   - `chunks/` (chunk, val, doc_id), partitioned by chunk — the join
    *     side, same complete blocking as [[fingerprintPairs]];
    *   - `fps/` (doc_id, fp) — read only to verify candidates by exact
    *     Hamming distance.
    *
    * The index is maxDist-specific (chunk boundaries derive from it);
    * probe with the same maxDist it was built with. */
  def buildFingerprintIndex(
      df: DataFrame,
      id: Column,
      fingerprint: Column,
      dir: String,
      maxDist: Int = 3): Unit =
    writeFingerprintIndex(df, id, fingerprint, dir, "overwrite", maxDist)

  /** Grow a [[buildFingerprintIndex]] table with a delta batch (the
    * ingest-time append, mirroring [[appendToMinhashIndex]]). */
  def appendToFingerprintIndex(
      df: DataFrame,
      id: Column,
      fingerprint: Column,
      dir: String,
      maxDist: Int = 3): Unit =
    writeFingerprintIndex(df, id, fingerprint, dir, "append", maxDist)

  private def writeFingerprintIndex(
      df: DataFrame,
      id: Column,
      fingerprint: Column,
      dir: String,
      mode: String,
      maxDist: Int): Unit = {
    require(maxDist >= 1 && maxDist <= 15,
      s"maxDist must be in [1, 15]: $maxDist")
    val spec = s"fingerprint maxDist=$maxDist"
    // same spec ordering discipline as writeMinhashIndex
    val hadSpec =
      if (mode == "overwrite") { graft.ops.IndexSpec.delete(df, dir); false }
      else graft.ops.IndexSpec.checkReturningPresence(df, dir, spec)
    val fp = df.select(id.as("doc_id"), fingerprint.as("fp"))
      .localCheckpoint(false)
    fp.write.mode(mode).parquet(s"$dir/fps")
    fp.select(col("doc_id"),
        posexplode(array(fpChunkCols(col("fp"), maxDist): _*))
          .as(Seq("chunk", "val")))
      .select(col("chunk"), col("val"), col("doc_id"))
      .write.mode(mode).partitionBy("chunk").parquet(s"$dir/chunks")
    if (!hadSpec) graft.ops.IndexSpec.write(df, dir, spec)
  }

  /** Crash-safe SEGMENT append for the fingerprint index — the
    * [[graft.ops.Segments]] twin of [[appendMinhashSegment]] (fps+chunks
    * are two jobs; the segment commit makes a mid-write crash invisible
    * and a same-id retry overwrite, i.e. exactly-once ingest). */
  def appendFingerprintSegment(
      df: DataFrame,
      id: Column,
      fingerprint: Column,
      dir: String,
      segmentId: String,
      maxDist: Int = 3): Unit = {
    require(maxDist >= 1 && maxDist <= 15,
      s"maxDist must be in [1, 15]: $maxDist")
    val spec = s"fingerprint maxDist=$maxDist"
    val spark = df.sparkSession
    val hadSpec = graft.ops.IndexSpec.checkReturningPresence(df, dir, spec)
    val segDir = graft.ops.Segments.prepare(spark, dir, segmentId)
    val fp = df.select(id.as("doc_id"), fingerprint.as("fp"))
      .localCheckpoint(false)
    fp.write.mode("overwrite").parquet(s"$segDir/fps")
    fp.select(col("doc_id"),
        posexplode(array(fpChunkCols(col("fp"), maxDist): _*))
          .as(Seq("chunk", "val")))
      .select(col("chunk"), col("val"), col("doc_id"))
      .write.mode("overwrite").partitionBy("chunk").parquet(s"$segDir/chunks")
    graft.ops.Segments.commit(spark, segDir)
    if (!hadSpec) graft.ops.IndexSpec.write(df, dir, spec)
  }

  /** LSM merge for fingerprint segments ([[compactMinhashSegments]]'
    * twin). Returns the number of segments merged. */
  def compactFingerprintSegments(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      maxDist: Int = 3): Int = {
    graft.ops.IndexSpec.check(spark, dir, s"fingerprint maxDist=$maxDist",
      writeIfMissing = false)
    // single-compactor lock (see SearchIndex.compactSegments)
    graft.ops.MaintenanceLock.withLock(
        graft.ops.Segments.fsOf(spark, dir),
        new org.apache.hadoop.fs.Path(dir)) {
      compactFingerprintLocked(spark, dir)
    }
  }

  private def compactFingerprintLocked(
      spark: org.apache.spark.sql.SparkSession, dir: String): Int = {
    val live = graft.ops.Segments.live(spark, dir)
    if (live.length <= 1) return 0
    val names = live.map(p => new org.apache.hadoop.fs.Path(p).getName)
    val target = {
      val h = s"compact-${names.hashCode.toHexString}"
      if (names.contains(h)) s"$h-x" else h
    }
    val segDir = graft.ops.Segments.prepare(spark, dir, target)
    live.map(s => spark.read.parquet(s"$s/fps")).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$segDir/fps")
    live.map(s => spark.read.parquet(s"$s/chunks")).reduce(_ unionByName _)
      .select(col("chunk"), col("val"), col("doc_id"))
      .write.mode("overwrite").partitionBy("chunk").parquet(s"$segDir/chunks")
    graft.ops.Segments.commit(spark, segDir, replaces = names)
    graft.ops.Segments.delete(spark, live)
    live.length
  }

  /** Drop every row of `df` (a NEW batch) whose fingerprint is within
    * Hamming `maxDist` of any document in the [[buildFingerprintIndex]]
    * table at `dir`. The batch computes its fingerprints once; the
    * corpus contributes stored chunk keys (ids through the shuffle) and
    * candidate fingerprints only — corpus content is never re-read.
    * In-batch duplicates are NOT removed here (run [[fingerprintPairs]]
    * on the batch for that level), mirroring [[dedupAgainstIndex]]. */
  def dedupAgainstFingerprintIndex(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame,
      id: Column,
      fingerprint: Column,
      dir: String,
      maxDist: Int = 3): DataFrame = {
    require(maxDist >= 1 && maxDist <= 15,
      s"maxDist must be in [1, 15]: $maxDist")
    graft.ops.IndexSpec.check(df, dir, s"fingerprint maxDist=$maxDist")
    val fpDf = df.select(id.as("__id"), fingerprint.as("__fp"))
      .localCheckpoint(false)
    // NO broadcast hints here, deliberately (A/B'd r14): one-shot op
    // over parquet — Catalyst has real stats and broadcasts the bounded
    // batch side itself; forced hints measured slower (serialized
    // broadcast builds).
    val newChunks = fpDf.select(col("__id"),
      posexplode(array(fpChunkCols(col("__fp"), maxDist): _*))
        .as(Seq("chunk", "val")))
    val corpusChunks = graft.ops.Segments.readPart(spark, dir, "chunks")
      .select(col("chunk"), col("val"), col("doc_id").as("__corpus_id"))
    val candidates = newChunks.join(corpusChunks, Seq("chunk", "val"))
      .select(col("__id"), col("__corpus_id")).distinct()
    val corpusFps = graft.ops.Segments.readPart(spark, dir, "fps")
      .select(col("doc_id").as("__corpus_id"), col("fp").as("__corpus_fp"))
    val dups = candidates
      .join(fpDf, Seq("__id"))
      .join(corpusFps, Seq("__corpus_id"))
      .filter(bit_count(col("__fp").bitwiseXOR(col("__corpus_fp"))) <= maxDist)
      .select(col("__id").as("__dup_id")).distinct()
    df.join(dups, id === col("__dup_id"), "left_anti")
  }

  // ---- duplicate clusters (connected components) ----------------------

  /** Connected components over an undirected pair list (id_a, id_b):
    * returns (id, label) where label = min id reachable from id.
    *
    * Iterative min-label propagation: each round joins labels across
    * edges and keeps the minimum — rounds = graph diameter, and near-dup
    * graphs are unions of small cliques, so it converges in 2-3 rounds.
    * Every round is one shuffle on id; `localCheckpoint` truncates the
    * growing lineage so plans stay O(1) per round. (At extreme diameters
    * the alternating large-star/small-star formulation halves rounds;
    * not needed for dedup graphs.)
    *
    * Round cost shape (guide §1.2/§2.4): the edge table — the side that
    * grows with the corpus — is checkpointed PRE-PARTITIONED on the join
    * key, so it crosses the network once total instead of once per
    * round (each round re-exchanges only the label table); and the
    * per-round checkpoint is LAZY, so the convergence count is the job
    * that materializes it — one action per round instead of
    * checkpoint-job + count-job. */
  def connectedComponents(pairs: DataFrame, maxIterations: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .repartition(col("dst"))
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIterations) {
      val neighborMin = edges
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nbr_min"))
      val updated = labels
        .join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("new_label"))
        .localCheckpoint(eager = false)
      changed = updated.filter(col("new_label") < col("label")).count()
      labels = updated.select(col("id"), col("new_label").as("label"))
      iter += 1
    }
    if (changed > 0) {
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIterations rounds " +
          s"($changed labels still changing) — graph diameter exceeds maxIterations; " +
          "raise it or pre-contract the graph")
    }
    labels
  }

  /** Near-duplicate clusters: LSH-candidate pairs verified by exact
    * n-gram Jaccard ≥ threshold, closed under transitivity. One row per
    * cluster: (cluster_id = min member id, size, sorted members).
    * Members are capped at `maxMembers` smallest ids (size stays exact)
    * for the same bounded-row reason as [[exactDuplicateGroups]]. */
  def duplicateClusters(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleK: Int = 3,
      threshold: Double = 0.5,
      maxMembers: Int = 1 << 16): DataFrame = {
    require(maxMembers >= 1, s"maxMembers must be >= 1, got $maxMembers")
    val pairs = ngramJaccardPairs(df, id, text, shingleK, threshold)
    val w = Window.partitionBy(col("label")).orderBy(col("id"))
    connectedComponents(pairs)
      .withColumn("__rn", row_number().over(w))
      .groupBy(col("label").as("cluster_id"))
      .agg(count(lit(1)).as("size"),
        sort_array(collect_list(when(col("__rn") <= maxMembers, col("id"))))
          .as("members"))
  }

  // ---- exact n-gram Jaccard -------------------------------------------

  /** Exact Jaccard over distinct n-gram shingles, pairs with sim ≥
    * threshold.
    *
    * Default (scale) path: candidate pairs come from the MinHash LSH band
    * join, then exact Jaccard verifies each candidate — quadratic work is
    * avoided entirely; recall for a pair at similarity s is
    * 1-(1-s^r)^b (≈1-4e-8 at s=0.9 with 64 hashes / 16 bands). The
    * `exact=true` path cross-joins with a size-ratio prefilter
    * (|A|/|B| ≥ τ is necessary for J ≥ τ) — guaranteed complete, small
    * tables only. */
  def ngramJaccardPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleK: Int = 3,
      threshold: Double = 0.5,
      exact: Boolean = false,
      numHashes: Int = 64,
      bands: Int = 16): DataFrame = {
    // shingle sets feed candidate generation + two verify-side joins —
    // compute once (see minhashPairs note). cpuBound: shingling + the
    // minhash kernel are CPU-bound; a single-file scan would run them
    // on one core (guide §2.6)
    val sh = graft.ops.Parallel.cpuBoundIfSmall(df.select(id.as("__id"), text.as("__t")))
      .select(col("__id"), shingles(col("__t"), shingleK).as("__sh"))
      .localCheckpoint(false)
    val candidates: DataFrame =
      if (exact) {
        sh.select(col("__id").as("id_a"))
          .crossJoin(sh.select(col("__id").as("id_b")))
          .filter(col("id_a") < col("id_b"))
      } else {
        require(numHashes % bands == 0, "numHashes must be divisible by bands")
        val rows = numHashes / bands
        val sig = sh.select(col("__id"),
          minhashSignature(col("__sh"), numHashes).as("__sig"))
        val banded = sig.select(col("__id"),
          posexplode(bandKeys(col("__sig"), bands, rows)).as(Seq("__band", "__key")))
        banded.select(col("__band"), col("__key"), col("__id").as("id_a"))
          .join(banded.select(col("__band"), col("__key"), col("__id").as("id_b")),
            Seq("__band", "__key"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct()
      }
    candidates
      .join(sh.select(col("__id").as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .filter(least(size(col("__sh_a")), size(col("__sh_b"))).cast("double") >=
        lit(threshold) * greatest(size(col("__sh_a")), size(col("__sh_b"))).cast("double"))
      .select(col("id_a"), col("id_b"),
        round(size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("double") /
          size(array_union(col("__sh_a"), col("__sh_b"))).cast("double"), 4)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- containment (prefix-filter set-similarity join) ----------------

  /** Directed containment pairs: C(A→B) = |shingles(A) ∩ shingles(B)| /
    * |shingles(A)| ≥ threshold — the ASYMMETRIC near-dup signal symmetric
    * Jaccard misses: a short excerpt, quote, or truncated copy sits almost
    * entirely inside its source (C ≈ 1) while their Jaccard is tiny, so
    * neither MinHash LSH nor `ngramJaccardPairs` can find it.
    *
    * Default (scale) path is PREFIX FILTERING (the PPJoin family,
    * Xiao et al. 2008), which unlike LSH is LOSSLESS for containment:
    * order each set's shingles by ascending global document frequency
    * (ties by value); a pair with |A∩B| ≥ ⌈τ·|A|⌉ must share a shingle
    * among A's first |A| − ⌈τ·|A|⌉ + 1 — otherwise the whole intersection
    * would have to fit in the remaining ⌈τ·|A|⌉ − 1 positions. Candidates
    * come from an equi-join of A-prefixes against the full shingle
    * postings, then exact containment verifies each candidate.
    *
    * Scale design: the probe side carries only the RAREST 1−τ fraction of
    * each doc's shingles (at τ=0.8, 1/5th), so hot boilerplate shingles
    * almost never appear as probe keys; the full-postings side is the
    * inverted-index shape — one shuffle on shingle, skew handled by AQE
    * skew-join (frequency ordering already concentrates matches on rare
    * keys). Everything past candidate generation is ids-only until the
    * two bounded verify joins. The `exact=true` path cross-joins — small
    * inputs only.
    *
    * @return (id_a, id_b, containment) directed: id_a is the contained
    *         doc, id_b the container; both directions may appear.
    */
  def containmentPairs(
      df: DataFrame,
      id: Column,
      text: Column,
      shingleK: Int = 3,
      threshold: Double = 0.8,
      exact: Boolean = false): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    // shingle sets feed candidate generation + two verify-side joins —
    // compute once (see minhashPairs note). cpuBound: shingling is a
    // CPU-bound kernel; a single-file scan would run it on one core
    val sh = graft.ops.Parallel.cpuBoundIfSmall(df.select(id.as("__id"), text.as("__t")))
      .select(col("__id"), shingles(col("__t"), shingleK).as("__sh"))
      .localCheckpoint(false)
    val candidates: DataFrame =
      if (exact) {
        sh.select(col("__id").as("id_a"))
          .crossJoin(sh.select(col("__id").as("id_b")))
          .filter(col("id_a") =!= col("id_b"))
      } else {
        val ex = sh.select(col("__id"), size(col("__sh")).as("__n"),
          explode(col("__sh")).as("__s"))
        val freq = ex.groupBy(col("__s")).agg(count(lit(1)).as("__df"))
        // rank each doc's shingles rarest-first; the prefix is lossless
        // by the pigeonhole argument above. floor+1 ≥ the exact
        // n − ⌈τn⌉ + 1 bound, so a float ⌈⌉ that rounds τ·n UP across an
        // integer (0.7·10 → 7.000…01) can never shorten the prefix below
        // soundness — at worst one extra probe shingle per doc.
        val ranked = ex.join(freq, Seq("__s"))
          .withColumn("__r", row_number().over(
            Window.partitionBy(col("__id")).orderBy(col("__df"), col("__s"))))
        val prefix = ranked.filter(
          col("__r") <= col("__n") - floor(lit(threshold) * col("__n")) + 1)
        prefix.select(col("__s"), col("__id").as("id_a"))
          .join(ex.select(col("__s"), col("__id").as("id_b")), Seq("__s"))
          .filter(col("id_a") =!= col("id_b"))
          .select(col("id_a"), col("id_b")).distinct()
      }
    // Filter on the UNROUNDED ratio (rounding first would admit
    // inter = ⌈τn⌉ − 1 via 4-dp round-up on ≥20k-shingle docs — outside
    // the prefix guarantee); the reported value is rounded for cross-
    // engine display stability only. cpuSpreadIdsOnly: the per-candidate
    // array_intersect verify is the CPU-heavy tail of this operator and
    // the candidate frame is (id, id) — AQE's byte-based coalescing
    // otherwise collapses the tiny-byte/huge-CPU verify stage onto a
    // few partitions (measured +69% when the spread was estimate-gated
    // away); the ids-only exchange is cheap at any corpus scale and the
    // count never drops below the session's shuffle width.
    graft.ops.Parallel.cpuSpreadIdsOnly(candidates)
      .join(sh.select(col("__id").as("id_a"), col("__sh").as("__sh_a")), Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("__sh").as("__sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("double") /
          size(col("__sh_a")).cast("double")).as("__c"))
      .filter(col("__c") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__c"), 4).as("containment"))
  }

  // ---- edit distance (symmetric-delete blocking) -----------------------

  /** All pairs within levenshtein distance `maxDist`, blocked by the
    * SYMMETRIC-DELETE neighborhood
    * ([[graft.functions.DeletionNeighborhood]]): each string explodes its
    * ≤ maxDist-deletion variants, candidates meet through an equi-join on
    * the variant, a codegen'd `levenshtein` verifies — EXACT recall (a
    * pair within distance d always shares a variant) with no cross join.
    * The record-linkage / fuzzy-entity-matching primitive the n-gram
    * operators don't cover: token-level shingles can't see single-
    * character typos inside a word.
    *
    * Scale design: the variant join runs over DISTINCT strings, never
    * records — a corpus where thousands of records share one attribute
    * value (the adversarial skew case for symmetric-delete blocking)
    * contributes ONE row to the neighborhood join, not a quadratically
    * hot variant key. Same-string record pairs (distance 0) bypass the
    * variant machinery entirely through a plain string equi-join, and
    * cross-string matches expand from the verified string-pair table
    * back to records through two output-proportional joins; the
    * levenshtein DP also runs once per distinct string PAIR instead of
    * once per record pair. Recall stays EXACT. The `exact=true` path
    * cross-joins: small inputs / differential testing only.
    *
    * @return (id_a, id_b, dist) with id_a < id_b, dist <= maxDist.
    */
  def editDistancePairs(
      df: DataFrame,
      id: Column,
      s: Column,
      maxDist: Int,
      exact: Boolean = false): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      s"maxDist must be in [1, 3]: $maxDist")
    // distinct: replayed (id, s) rows must not double-emit edges, and the
    // record table feeds five plan legs below — checkpoint it once.
    // cpuBoundIfSmall: the deletion-neighborhood explode + levenshtein DP
    // below are CPU-bound and a byte-sized plan (single-file scan,
    // AQE-coalesced distinct) would run them on 1–2 cores (guide §2.6) —
    // but distinct (id, s) RECORDS scale with the corpus, so the spread
    // is stats-gated (an unconditional repartition(defaultParallelism)
    // could REDUCE a big input's partition count and concentrate memory)
    val base = graft.ops.Parallel.cpuBoundIfSmall(
        df.select(id.as("__id"), s.as("__s"))
          .filter(col("__s").isNotNull)
          .distinct())
      .localCheckpoint(eager = false)
    if (exact) {
      base.select(col("__id").as("id_a"), col("__s").as("__sa"))
        .crossJoin(base.select(col("__id").as("id_b"), col("__s").as("__sb")))
        .filter(col("id_a") < col("id_b"))
        .filter(abs(length(col("__sa")) - length(col("__sb"))) <= maxDist)
        .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
        .filter(col("dist") <= maxDist)
        .select(col("id_a"), col("id_b"), col("dist"))
    } else {
      // records sharing a string are distance-0 pairs by definition:
      // one equi-join on the string, no variants, no DP
      val samePairs = base.select(col("__s"), col("__id").as("__ida"))
        .join(base.select(col("__s"), col("__id").as("__idb")), Seq("__s"))
        .filter(col("__ida") < col("__idb"))
        .select(col("__ida").as("id_a"), col("__idb").as("id_b"),
          lit(0).as("dist"))
      // neighborhood join over distinct strings only; both sides read
      // the exploded variants — compute once (localCheckpoint, same
      // shape as the minhash/shingle reuse)
      // cpuBound again: the distinct's own exchange AQE-coalesces by
      // bytes, re-serializing the explode + the DP it feeds
      val v = graft.ops.Parallel.cpuBound(base.select(col("__s")).distinct())
        .select(col("__s"),
          explode(graft.functions.exprs.deletion_neighborhood(col("__s"), maxDist))
            .as("__v"))
        .localCheckpoint(eager = false)
      // the DP runs after the candidate distinct's exchange — cpuBound
      // keeps it on every core too (same rationale as the legs above)
      val strPairs = graft.ops.Parallel.cpuBound(
          v.select(col("__v"), col("__s").as("__sa"))
            .join(v.select(col("__v"), col("__s").as("__sb")), Seq("__v"))
            .filter(col("__sa") < col("__sb"))
            // length gap > d can't be within d — prunes before BOTH the
            // dedup exchange and the O(len²) DP (filter commutes with
            // distinct: same surviving pair set)
            .filter(abs(length(col("__sa")) - length(col("__sb"))) <= maxDist)
            .select(col("__sa"), col("__sb"))
            .distinct())
        .withColumn("dist", levenshtein(col("__sa"), col("__sb")))
        .filter(col("dist") <= maxDist)
      // expand verified string pairs to record pairs; strings differ, so
      // each unordered record pair surfaces exactly once — order the ids,
      // and drop the id_a == id_b degenerate (one id carrying two strings
      // within maxDist of each other is not a pair with itself)
      val crossPairs = strPairs
        .join(base.select(col("__s").as("__sa"), col("__id").as("__ida")),
          Seq("__sa"))
        .join(base.select(col("__s").as("__sb"), col("__id").as("__idb")),
          Seq("__sb"))
        .filter(col("__ida") =!= col("__idb"))
        .select(least(col("__ida"), col("__idb")).as("id_a"),
          greatest(col("__ida"), col("__idb")).as("id_b"), col("dist"))
      samePairs.unionByName(crossPairs)
    }
  }

  // ---- materialized edit-distance index (streaming entity resolution) --

  /** Materialize the symmetric-delete variant table — the edit-distance
    * twin of the winnow/minhash serving indexes, for ingest-time record
    * linkage: corpus variants are generated ONCE at index time into
    * `vars/ (variant, doc_id, s)`; a new batch generates only its own
    * neighborhood and equi-joins the stored table (the stored string
    * rides along for the levenshtein verify — attribute strings are
    * short). `_index_spec`-pinned maxDist: variants depend on it. */
  def buildEditDistanceIndex(
      df: DataFrame, id: Column, s: Column,
      dir: String, maxDist: Int = 1): Unit =
    writeEditDistanceIndex(df, id, s, dir, "overwrite", maxDist)

  /** Grow a [[buildEditDistanceIndex]] table with a delta batch. */
  def appendToEditDistanceIndex(
      df: DataFrame, id: Column, s: Column,
      dir: String, maxDist: Int = 1): Unit =
    writeEditDistanceIndex(df, id, s, dir, "append", maxDist)

  private def writeEditDistanceIndex(
      df: DataFrame, id: Column, s: Column,
      dir: String, mode: String, maxDist: Int): Unit = {
    require(maxDist >= 1 && maxDist <= 3,
      s"maxDist must be in [1, 3]: $maxDist")
    val spec = s"editdist maxDist=$maxDist"
    val hadSpec =
      if (mode == "overwrite") { graft.ops.IndexSpec.delete(df, dir); false }
      else graft.ops.IndexSpec.checkReturningPresence(df, dir, spec)
    df.select(id.as("doc_id"), s.as("s")).filter(col("s").isNotNull)
      .select(col("doc_id"), col("s"),
        explode(graft.functions.exprs.deletion_neighborhood(col("s"), maxDist))
          .as("variant"))
      .select(col("variant"), col("doc_id"), col("s"))
      .write.mode(mode).parquet(s"$dir/vars")
    if (!hadSpec) graft.ops.IndexSpec.write(df, dir, spec)
  }

  /** Crash-safe SEGMENT append for the edit-distance index (the
    * [[graft.ops.Segments]] shape: commit marker, retry-overwrite,
    * exactly-once ingest). */
  def appendEditDistanceSegment(
      df: DataFrame, id: Column, s: Column,
      dir: String, segmentId: String, maxDist: Int = 1): Unit = {
    require(maxDist >= 1 && maxDist <= 3,
      s"maxDist must be in [1, 3]: $maxDist")
    val spec = s"editdist maxDist=$maxDist"
    val spark = df.sparkSession
    val hadSpec = graft.ops.IndexSpec.checkReturningPresence(df, dir, spec)
    val segDir = graft.ops.Segments.prepare(spark, dir, segmentId)
    df.select(id.as("doc_id"), s.as("s")).filter(col("s").isNotNull)
      .select(col("doc_id"), col("s"),
        explode(graft.functions.exprs.deletion_neighborhood(col("s"), maxDist))
          .as("variant"))
      .select(col("variant"), col("doc_id"), col("s"))
      .write.mode("overwrite").parquet(s"$segDir/vars")
    graft.ops.Segments.commit(spark, segDir)
    if (!hadSpec) graft.ops.IndexSpec.write(df, dir, spec)
  }

  /** LSM merge for edit-distance segments. Returns the number merged. */
  def compactEditDistanceSegments(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      maxDist: Int = 1): Int = {
    graft.ops.IndexSpec.check(spark, dir, s"editdist maxDist=$maxDist",
      writeIfMissing = false)
    graft.ops.MaintenanceLock.withLock(
        graft.ops.Segments.fsOf(spark, dir),
        new org.apache.hadoop.fs.Path(dir)) {
      val live = graft.ops.Segments.live(spark, dir)
      if (live.length <= 1) 0
      else {
        val names = live.map(p => new org.apache.hadoop.fs.Path(p).getName)
        val target = {
          val h = s"compact-${names.hashCode.toHexString}"
          if (names.contains(h)) s"$h-x" else h
        }
        val segDir = graft.ops.Segments.prepare(spark, dir, target)
        live.map(s => spark.read.parquet(s"$s/vars")).reduce(_ unionByName _)
          .select(col("variant"), col("doc_id"), col("s"))
          .write.mode("overwrite").parquet(s"$segDir/vars")
        graft.ops.Segments.commit(spark, segDir, replaces = names)
        graft.ops.Segments.delete(spark, live)
        live.length
      }
    }
  }

  /** Match a NEW batch against the indexed corpus: every (batch row,
    * corpus row) pair within levenshtein `maxDist` — the streaming
    * record-linkage probe. Candidate generation runs over DISTINCT
    * strings on both sides (the batch's, and the distinct (variant, s)
    * projection of the stored table), so a corpus where many records
    * share one attribute value never forms a quadratic candidate set:
    * string pairs verify once through the codegen'd levenshtein, then
    * expand to record pairs through two output-proportional joins.
    *
    * @return (id, corpus_id, dist). */
  def matchAgainstEditDistanceIndex(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, id: Column, s: Column,
      dir: String, maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      s"maxDist must be in [1, 3]: $maxDist")
    graft.ops.IndexSpec.check(df, dir, s"editdist maxDist=$maxDist")
    // distinct: a replayed (id, s) batch row must not double-emit its
    // match links (the removed record-level distinct's remaining duty)
    val batchRecs = df.select(id.as("__id"), s.as("__s"))
      .filter(col("__s").isNotNull)
      .distinct()
      .localCheckpoint(eager = false)
    val batchVars = batchRecs.select(col("__s")).distinct()
      .select(col("__s"),
        explode(graft.functions.exprs.deletion_neighborhood(col("__s"), maxDist))
          .as("variant"))
    val stored = graft.ops.Segments.readPart(spark, dir, "vars")
    val corpusVars = stored.select(col("variant"), col("s").as("__cs")).distinct()
    val strPairs = batchVars.join(corpusVars, Seq("variant"))
      .select(col("__s"), col("__cs")).distinct()
      .filter(abs(length(col("__s")) - length(col("__cs"))) <= maxDist)
      .withColumn("dist", levenshtein(col("__s"), col("__cs")))
      .filter(col("dist") <= maxDist)
    val corpusRecs = stored
      .select(col("doc_id").as("corpus_id"), col("s").as("__cs")).distinct()
    strPairs.join(batchRecs, Seq("__s")).join(corpusRecs, Seq("__cs"))
      .select(col("__id").as("id"), col("corpus_id"), col("dist"))
  }

  /** Drop every batch row within levenshtein `maxDist` of ANY indexed
    * corpus row (the dedup front over
    * [[matchAgainstEditDistanceIndex]]). In-batch duplicates are NOT
    * removed here, mirroring the other incremental dedup fronts. */
  def dedupAgainstEditDistanceIndex(
      spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, id: Column, s: Column,
      dir: String, maxDist: Int = 1): DataFrame = {
    val dups = matchAgainstEditDistanceIndex(spark, df, id, s, dir, maxDist)
      .select(col("id").as("__dup_id")).distinct()
    df.join(dups, id === col("__dup_id"), "left_anti")
  }

  /** Dictionary lookup within edit distance (the spell-correction /
    * canonicalization shape): every (query, dict entry) pair with
    * levenshtein <= maxDist, via the same symmetric-delete blocking as
    * [[editDistancePairs]]. With `broadcastDict` (vocabularies are small)
    * the exploded dictionary broadcasts and the corpus side NEVER
    * shuffles — a pure map-side plan however large the query table.
    *
    * @return (id, query, match, dist), one row per qualifying pair.
    */
  def editDistanceLookup(
      queries: DataFrame,
      qId: Column,
      q: Column,
      dict: DataFrame,
      w: Column,
      maxDist: Int,
      broadcastDict: Boolean = true): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      s"maxDist must be in [1, 3]: $maxDist")
    val qb = queries.select(qId.as("__qid"), q.as("__q"))
      .filter(col("__q").isNotNull)
    val db = dict.select(w.as("__w")).filter(col("__w").isNotNull).distinct()
    val qv = qb.select(col("__qid"), col("__q"),
      explode(graft.functions.exprs.deletion_neighborhood(col("__q"), maxDist))
        .as("__v"))
    val dv0 = db.select(col("__w"),
      explode(graft.functions.exprs.deletion_neighborhood(col("__w"), maxDist))
        .as("__v"))
    val dv = if (broadcastDict) broadcast(dv0) else dv0
    qv.join(dv, Seq("__v"))
      .select(col("__qid"), col("__q"), col("__w")).distinct()
      .filter(abs(length(col("__q")) - length(col("__w"))) <= maxDist)
      .withColumn("dist", levenshtein(col("__q"), col("__w")))
      .filter(col("dist") <= maxDist)
      .select(col("__qid").as("id"), col("__q").as("query"),
        col("__w").as("match"), col("dist"))
  }

  /** Best dictionary correction per query: the [[editDistanceLookup]]
    * match with the smallest distance, ties broken by match string
    * ascending (deterministic). Queries with no dictionary entry within
    * `maxDist` are absent from the output. */
  def spellCorrect(
      queries: DataFrame,
      qId: Column,
      q: Column,
      dict: DataFrame,
      w: Column,
      maxDist: Int,
      broadcastDict: Boolean = true): DataFrame =
    editDistanceLookup(queries, qId, q, dict, w, maxDist, broadcastDict)
      .groupBy(col("id"), col("query"))
      // struct min = (dist asc, match asc) lexicographic — one aggregate,
      // no window sort
      .agg(min(struct(col("dist"), col("match"))).as("__b"))
      .select(col("id"), col("query"),
        col("__b").getField("match").as("match"),
        col("__b").getField("dist").as("dist"))
}

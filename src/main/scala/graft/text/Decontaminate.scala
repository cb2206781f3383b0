package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: find (and drop) corpus
  * documents that share k-word shingles with an evaluation/benchmark set.
  * The standard pre-training hygiene step — eval questions that leak into
  * the corpus inflate benchmark scores — and a pure relational shape:
  * explode shingles on both sides and equi-join, never pairwise text
  * comparison.
  *
  * Scale design: the benchmark side is eval-set-sized (10³–10⁵ docs), so
  * its exploded shingle list broadcasts; the 100 TB corpus side streams
  * map-side through the broadcast hash join with NO corpus shuffle. The
  * only shuffle is the (doc, bench) overlap count, whose input is just
  * the matched shingle rows — bounded by actual contamination, not corpus
  * size.
  */
object Decontaminate {

  /** (doc_id, bench_id, overlap) for every corpus × benchmark pair
    * sharing at least `minOverlap` DISTINCT k-word shingles.
    *
    * `overlap` counts distinct shared shingles: [[graft.dedup.Dedup.shingles]]
    * emits each doc's distinct shingle set, so each shared shingle joins
    * exactly once per (doc, bench) pair and a plain count is the distinct
    * overlap.
    *
    * @param shingleK   shingle width in tokens; larger k = stricter match
    *                   (8–13 typical for decontamination, small corpora
    *                   need smaller)
    * @param minOverlap pairs with fewer distinct shared shingles are
    *                   dropped (raises precision against boilerplate)
    */
  def contaminatedPairs(
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      bench: DataFrame, benchId: Column, benchText: Column,
      shingleK: Int = 8, minOverlap: Int = 1): DataFrame = {
    require(shingleK >= 1, "shingleK must be >= 1")
    require(minOverlap >= 1, "minOverlap must be >= 1")
    val cSh = corpus.select(corpusId.as("doc_id"),
      explode(graft.dedup.Dedup.shingles(corpusText, shingleK)).as("__sh"))
    val bSh = bench.select(benchId.as("bench_id"),
      explode(graft.dedup.Dedup.shingles(benchText, shingleK)).as("__sh"))
    cSh.join(broadcast(bSh), Seq("__sh"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /** The corpus with every contaminated document removed (anti-join on
    * the flagged ids — corpus rows never shuffle, flagged ids broadcast). */
  def decontaminate(
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      bench: DataFrame, benchId: Column, benchText: Column,
      shingleK: Int = 8, minOverlap: Int = 1): DataFrame = {
    val flagged = contaminatedPairs(
      corpus, corpusId, corpusText, bench, benchId, benchText,
      shingleK, minOverlap)
      .select(col("doc_id").as("__flagged_id")).distinct()
    corpus.join(broadcast(flagged), corpusId === col("__flagged_id"), "left_anti")
  }

  /** Per-document contamination REPORT — the measurement twin of
    * [[decontaminate]]'s binary drop: for every corpus document, the
    * fraction of its distinct k-word shingles that appear anywhere in the
    * benchmark set. Pipelines gate on the fraction (e.g. drop > 20 %
    * overlap, audit 1–20 %) rather than any-overlap, and the per-doc
    * score is what contamination dashboards plot.
    *
    * Scale design: pure MAP-SIDE — the benchmark's distinct shingle set
    * is eval-sized by contract, so it ships to executors once and each
    * corpus doc counts its own members with the codegen'd
    * [[graft.functions.CountInSet]] kernel; the corpus NEVER shuffles and
    * there is no join (plan shape shared with [[decontaminateBloom]],
    * exact instead of probabilistic). Below `inlineThreshold` distinct
    * shingles the set is inlined into the expression literal; above it,
    * it rides the broadcast torrent into a closure (like every broadcast
    * kernel here — dedupSegments, decontaminateBloom — the broadcast
    * lives until the result DataFrame is unreachable and ContextCleaner
    * runs; score large benchmarks in a bounded-lifetime session rather
    * than a years-long REPL).
    *
    * Benchmarks past `maxBenchShingles` distinct shingles AUTO-ROUTE to
    * a Bloom-filter probe (built by `stat.bloomFilter`'s distributed
    * merge — the driver never holds the shingle strings): conservative
    * per-doc counts — false positives can only INFLATE `n_matched`, so
    * bloom-tier contamination is an upper bound and a gate "drop when
    * contamination > τ" only over-drops, never leaks benchmark text.
    * The route taken is observable per call via
    * [[contaminationScoreRouted]].
    *
    * @return (doc_id, n_shingles, n_matched, contamination) —
    *         contamination = n_matched / n_shingles rounded to 4 dp,
    *         0.0 for shingle-less (empty) documents.
    */
  def contaminationScore(
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      bench: DataFrame, benchText: Column,
      shingleK: Int = 8,
      inlineThreshold: Int = 4096,
      maxBenchShingles: Int = 1 << 22,
      bloomFpp: Double = 0.0001): DataFrame =
    contaminationScoreRouted(corpus, corpusId, corpusText, bench, benchText,
      shingleK, inlineThreshold, maxBenchShingles, bloomFpp)._1

  /** [[contaminationScore]] plus the probe route it took — "inline"
    * (codegen literal set), "broadcast" (exact driver-collected set) or
    * "bloom" (distributed-merged filter, conservative counts). The tag
    * is scoped to THIS call (threaded through the tier builders, no
    * shared state), so concurrent scores in one session each read their
    * own route. */
  private[graft] def contaminationScoreRouted(
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      bench: DataFrame, benchText: Column,
      shingleK: Int = 8,
      inlineThreshold: Int = 4096,
      maxBenchShingles: Int = 1 << 22,
      bloomFpp: Double = 0.0001): (DataFrame, String) = {
    require(shingleK >= 1, "shingleK must be >= 1")
    val benchShingles = bench
      .select(explode(graft.dedup.Dedup.shingles(benchText, shingleK)).as("__sh"))
    val sh = graft.dedup.Dedup.shingles(corpusText, shingleK)
    // Bloom tier: distributed-merged filter — the driver never holds the
    // shingle strings, only the (bounded, ~MBs) filter bytes. Counts are
    // conservative (fp can only inflate n_matched). Sized by the actual
    // distinct estimate, not the cap.
    def bloomTier(expected: Long): (Column, String) = {
      val bf = benchShingles.stat.bloomFilter(
        "__sh", math.max(1L << 16, expected * 2), bloomFpp)
      val bc = corpus.sparkSession.sparkContext.broadcast(bf)
      (coalesce(graft.functions.exprs.count_in_bloom(sh, bc), lit(0)), "bloom")
    }
    def exactTier(benchSet: Array[String]): (Column, String) =
      if (benchSet.length <= inlineThreshold)
        (graft.functions.exprs.count_in_set(sh, benchSet.sorted.toIndexedSeq),
          "inline")
      else {
        val bc = corpus.sparkSession.sparkContext.broadcast(benchSet.toSet)
        // coalesce preserves the former UDF's null-shingles → 0 behavior
        (coalesce(graft.functions.exprs.count_in_broadcast_set(sh, bc), lit(0)),
          "broadcast")
      }
    // TWO-TIER routing, sized so the common case stays ONE bench-side
    // job: real eval sets are well under 2^18 distinct shingles, and the
    // small probe collects at most that many strings (bounded, ~tens of
    // MB worst case). Only a benchmark that blows past the small cut
    // pays the distinct ESTIMATE, which then decides exact-vs-bloom
    // WITHOUT a multi-million-string driver collect. 5% margin under
    // the cap covers the sketch's rsd.
    val smallCut = math.min(maxBenchShingles, 1 << 18)
    val probe1 = benchShingles.distinct().limit(smallCut + 1).collect()
    val (matched, route) =
      if (probe1.length <= smallCut) exactTier(probe1.map(_.getString(0)))
      else {
        val approxN = benchShingles
          .agg(approx_count_distinct(col("__sh"), 0.01).as("n")).head.getLong(0)
        if (approxN > (maxBenchShingles.toLong * 95) / 100) bloomTier(approxN)
        else {
          val probe2 = benchShingles.distinct().limit(maxBenchShingles + 1).collect()
          if (probe2.length > maxBenchShingles) {
            // the estimate undercounted past the margin — fall through
            bloomTier(probe2.length.toLong * 2)
          } else exactTier(probe2.map(_.getString(0)))
        }
      }
    val scored = corpus.select(corpusId.as("doc_id"),
        size(sh).as("n_shingles"), matched.as("n_matched"))
      .withColumn("contamination",
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(round(col("n_matched").cast("double") / col("n_shingles"), 4)))
    (scored, route)
  }

  /** Bloom-probe decontamination — the memory-bounded variant of
    * [[decontaminate]] for benchmark sets too large to broadcast as
    * exact shingle rows (an exact 10⁸-shingle side is GBs of broadcast
    * strings; a Bloom filter at 0.1 % fpp is ~170 MB): the benchmark's
    * shingles fold into per-partition Bloom filters merged by
    * `stat.bloomFilter`, and the single filter broadcasts once. The
    * corpus is then cleaned by a pure MAP-SIDE probe — no join at all
    * (plan-asserted: zero Exchange, zero Join); a doc is dropped when at
    * least `minOverlap` of its distinct shingles probe positive.
    *
    * Conservative by construction: false positives can only OVER-remove
    * — benchmark text can never leak through. P(clean doc dropped) ≈
    * 1−(1−fpp)^shingles(doc) at minOverlap=1; size `fpp` against the
    * corpus's per-doc shingle counts. Not SQL-oracle-portable (Spark's
    * Bloom hashing) — differentially tested against the exact path. */
  def decontaminateBloom(
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      bench: DataFrame, benchText: Column,
      shingleK: Int = 8, minOverlap: Int = 1,
      expectedShingles: Long = 1L << 20, fpp: Double = 0.001): DataFrame = {
    require(shingleK >= 1, "shingleK must be >= 1")
    require(minOverlap >= 1, "minOverlap must be >= 1")
    val bf = bench
      .select(explode(graft.dedup.Dedup.shingles(benchText, shingleK)).as("__sh"))
      .stat.bloomFilter("__sh", expectedShingles, fpp)
    val bc = corpus.sparkSession.sparkContext.broadcast(bf)
    // broadcast-variable probe kernel: the filter cannot ride a codegen
    // literal (same trade as dedupSegments' broadcast tier); coalesce
    // preserves the former UDF's null-shingles → 0 behavior
    corpus.filter(
      coalesce(graft.functions.exprs.count_in_bloom(
        graft.dedup.Dedup.shingles(corpusText, shingleK), bc), lit(0)) < minOverlap)
  }

  /** CONTAINMENT decontamination: drop corpus docs that contain at least
    * `threshold` of some benchmark document's distinct shingles —
    * C(bench→doc) = |sh(bench) ∩ sh(doc)| / |sh(bench)| ≥ τ. This is the
    * quoted-verbatim case the other variants handle poorly: a benchmark
    * question quoted inside a much larger page has near-total per-BENCH
    * containment but tiny symmetric Jaccard (invisible to
    * [[decontaminateFuzzy]]), and [[decontaminate]]'s fixed `minOverlap`
    * cannot distinguish a 10-shingle question fully contained from 10
    * incidental shingles of a 500-shingle one.
    *
    * Scale shape = [[contaminatedPairs]]: the benchmark side broadcasts,
    * the 100 TB corpus streams map-side through the join with no corpus
    * shuffle; the overlap aggregation's input is the matched rows only.
    * The ratio is compared UNROUNDED (the containmentPairs discipline —
    * a 4-dp round-up must not admit a sub-threshold pair). */
  def decontaminateContainment(
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      bench: DataFrame, benchId: Column, benchText: Column,
      shingleK: Int = 8, threshold: Double = 0.6): DataFrame = {
    require(shingleK >= 1, "shingleK must be >= 1")
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val cSh = corpus.select(corpusId.as("__did"),
      explode(graft.dedup.Dedup.shingles(corpusText, shingleK)).as("__sh"))
    val bSh = bench.select(benchId.as("__bid"),
        graft.dedup.Dedup.shingles(benchText, shingleK).as("__bsh"))
      .select(col("__bid"), size(col("__bsh")).as("__bn"),
        explode(col("__bsh")).as("__sh"))
    val flagged = cSh.join(broadcast(bSh), Seq("__sh"))
      .groupBy(col("__did"), col("__bid"), col("__bn"))
      .agg(count(lit(1)).as("__inter"))
      .filter(col("__inter").cast("double") / col("__bn").cast("double")
        >= threshold)
      .select(col("__did").as("__flagged")).distinct()
    corpus.join(broadcast(flagged), corpusId === col("__flagged"), "left_anti")
  }

  /** FUZZY decontamination: drop corpus docs that are MinHash
    * NEAR-duplicates of any benchmark doc (signature-estimated Jaccard
    * ≥ `threshold`) — the GPT-3/Llama-style near-match benchmark filter,
    * where [[decontaminate]]'s exact-shingle overlap misses lightly
    * paraphrased or truncated benchmark copies.
    *
    * Scale shape = `Dedup.dedupAgainstIndex` with the benchmark side
    * in-memory: both sides compute signatures ONCE (the corpus-sized
    * work is one signature pass), candidates meet through a band-key
    * equi-join (ids through the shuffle — band keys block, never an
    * all-pairs compare), then the signature verify. Same
    * banding/estimate arithmetic as `Dedup.minhashPairs`, so recall is
    * identical. */
  def decontaminateFuzzy(
      corpus: DataFrame, corpusId: Column, corpusText: Column,
      bench: DataFrame, benchId: Column, benchText: Column,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val d = graft.dedup.Dedup
    val rows = numHashes / bands
    val cSig = corpus.select(corpusId.as("__cid"),
      d.minhashSignature(d.shingles(corpusText, shingleK), numHashes).as("__csig"))
      .localCheckpoint(false)
    val bSig = bench.select(benchId.as("__bid"),
      d.minhashSignature(d.shingles(benchText, shingleK), numHashes).as("__bsig"))
      .localCheckpoint(false)
    val cBands = cSig.select(col("__cid"),
      posexplode(d.bandKeys(col("__csig"), bands, rows)).as(Seq("band", "key")))
    val bBands = bSig.select(col("__bid"),
      posexplode(d.bandKeys(col("__bsig"), bands, rows)).as(Seq("band", "key")))
    val flagged = cBands.join(bBands, Seq("band", "key"))
      .select(col("__cid"), col("__bid")).distinct()
      .join(cSig, Seq("__cid"))
      .join(bSig, Seq("__bid"))
      .filter(round(d.signatureJaccard(col("__csig"), col("__bsig")), 4)
        >= threshold)
      .select(col("__cid").as("__flagged")).distinct()
    corpus.join(flagged, corpusId === col("__flagged"), "left_anti")
  }
}

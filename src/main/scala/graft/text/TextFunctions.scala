package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, built
  * entirely from codegen'd `org.apache.spark.sql.functions` so they run
  * inside whole-stage codegen with no UDF boundary. Every function has an
  * exact ANSI-SQL twin (used as the DuckDB oracle in SparkEntry):
  * language-ID (stopword + CJK heuristic), quality scoring, token
  * counting, and document fingerprinting.
  */
object TextFunctions {

  /** Lowercase, strip non-alphanumerics, collapse whitespace. */
  def normalized(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** Whitespace tokens of the normalized text; empty text → empty array.
    * Native single-pass expression, token-stream-identical to
    * `split(normalized(c), " ")` (verified in PipelineSpec). */
  def tokens(c: Column): Column = graft.functions.exprs.tokenize(c)

  def tokenCount(c: Column): Column = size(tokens(c))

  /** A BPE-ish subword count estimate: whitespace tokens plus one extra
    * unit per 6 characters of long tokens (cheap stand-in for a real
    * tokenizer's subword splits; deterministic + SQL-expressible).
    * Native one-pass kernel — the HOF `aggregate` formulation evaluated
    * its lambda interpreted per token. */
  def subwordCountEstimate(c: Column): Column =
    graft.functions.exprs.subword_count(tokens(c), 6)

  def charCount(c: Column): Column = length(c)

  private def ratioOf(c: Column, keepClass: String): Column =
    length(regexp_replace(c, keepClass, "")).cast("double") /
      greatest(length(c), lit(1)).cast("double")

  /** Share of ASCII punctuation characters. */
  def punctRatio(c: Column): Column = ratioOf(c, "[^\\p{Punct}]")

  /** Share of decimal digits. */
  def digitRatio(c: Column): Column = ratioOf(c, "[^0-9]")

  /** Share of uppercase ASCII letters. */
  def upperRatio(c: Column): Column = ratioOf(c, "[^A-Z]")

  /** Share of CJK ideographs (used for zh detection). */
  def cjkRatio(c: Column): Column = ratioOf(c, "[^\\x{4e00}-\\x{9fff}]")

  val stopwordsEn: Seq[String] =
    Seq("the", "a", "and", "of", "to", "is", "in", "that", "it", "as")
  val stopwordsDe: Seq[String] =
    Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "auf")
  val stopwordsFr: Seq[String] =
    Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour")
  val stopwordsEs: Seq[String] =
    Seq("el", "los", "las", "y", "es", "un", "una", "en", "que", "por")

  def stopwordHits(c: Column, words: Seq[String]): Column =
    graft.functions.exprs.count_in_set(tokens(c), words)

  def stopwordRatio(c: Column): Column =
    stopwordHits(c, stopwordsEn).cast("double") /
      greatest(tokenCount(c), lit(1)).cast("double")

  /** Deterministic language-ID heuristic: CJK ratio → zh; otherwise argmax
    * of per-language stopword hits with a fixed en>de>fr>es tie order;
    * all-zero → "und". (On synthetic word-salad corpora this mostly says
    * "en"/"und" — the point is the operator shape + oracle parity.) */
  def langId(c: Column): Column = {
    val en = stopwordHits(c, stopwordsEn)
    val de = stopwordHits(c, stopwordsDe)
    val fr = stopwordHits(c, stopwordsFr)
    val es = stopwordHits(c, stopwordsEs)
    when(cjkRatio(c) > 0.05, "zh")
      .when(en === 0 && de === 0 && fr === 0 && es === 0, "und")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Deterministic [0,1] quality score from length, stopword density and
    * punctuation/digit noise. Identical double arithmetic on both engines
    * → safe to round at 4dp. */
  def qualityScore(c: Column): Column = {
    val lengthScore = least(tokenCount(c).cast("double") / lit(64.0), lit(1.0))
    val stopScore = least(stopwordRatio(c) * lit(4.0), lit(1.0))
    val punctPenalty = least(punctRatio(c) * lit(4.0), lit(1.0))
    val digitPenalty = least(digitRatio(c) * lit(4.0), lit(1.0))
    round(
      lit(0.25) * lengthScore + lit(0.25) * stopScore +
        lit(0.25) * (lit(1.0) - punctPenalty) + lit(0.25) * (lit(1.0) - digitPenalty), 4)
  }

  /** Gopher-style rule gate (Rae et al. 2021, arXiv:2112.11446 §A1.1,
    * restricted to the LM-free signals): per-rule boolean flags plus an
    * overall `pass`, as one struct column so a curation pipeline can
    * filter on `pass` OR keep the flags for per-rule yield accounting —
    * the standard pre-dedup quality stage. Pure map-side projection over
    * the codegen'd token/ratio kernels; engine-portable (integer token
    * counts, identical double division and comparisons).
    *
    * Rules: word count in [minWords, maxWords]; mean word length in
    * [minMeanWordLen, maxMeanWordLen]; digit-character ratio ≤
    * maxDigitRatio (the available stand-in for Gopher's symbol ratio);
    * at least minStopwordHits English stopword hits (Gopher requires 2). */
  def gopherFlags(
      c: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxDigitRatio: Double = 0.2, minStopwordHits: Int = 2): Column = {
    val toks = tokens(c)
    val n = size(toks)
    val meanLen = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), _ + _).cast("double") / greatest(n, lit(1)).cast("double")
    val wordsOk = n >= minWords && n <= maxWords
    val meanLenOk = n > 0 && meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen
    val digitOk = digitRatio(c) <= maxDigitRatio
    val stopOk = stopwordHits(c, stopwordsEn) >= minStopwordHits
    struct(
      wordsOk.as("words_ok"),
      meanLenOk.as("mean_word_len_ok"),
      digitOk.as("digit_ok"),
      stopOk.as("stopword_ok"),
      (wordsOk && meanLenOk && digitOk && stopOk).as("pass"))
  }

  /** Duplicate-segment statistics — Gopher's duplicate-line signal at
    * k-word segment granularity (the corpus here has no newlines; for
    * line-structured text, split on '\n' upstream and pass k covering a
    * line): (n_segments, dup_segments = repeats of an identical earlier
    * segment, dup_fraction at 4dp). Pure map-side array arithmetic. */
  def duplicateSegmentStats(c: Column, k: Int): Column = {
    val segs = segments(c, k)
    val n = size(segs)
    val dups = n - size(array_distinct(segs))
    struct(
      n.cast("long").as("n_segments"),
      dups.cast("long").as("dup_segments"),
      round(dups.cast("double") / greatest(n, lit(1)).cast("double"), 4)
        .as("dup_fraction"))
  }

  /** Content fingerprint: md5 of the normalized text (md5 exists on both
    * engines; use [[fingerprint64]] for a cheaper Spark-only 64-bit key). */
  def fingerprint(c: Column): Column = md5(normalized(c))

  /** 64-bit xxhash fingerprint (Spark-side pipelines; not oracle-portable). */
  def fingerprint64(c: Column): Column = xxhash64(normalized(c))

  /** PII masking: emails, IPv4 addresses and NNN-NNN-NNNN phone numbers
    * replaced by placeholder tokens. Regexes restricted to the syntax
    * Java regex and RE2 interpret identically (explicit classes, bounded
    * repetition, \b), so the masking is engine-portable — email first so
    * its digits can't half-match as a phone number. Codegen'd
    * regexp_replace chain, no UDF. */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b", "<IP>")
    regexp_replace(ip, "\\+?\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>")
  }

  /** Non-overlapping k-token segments of the normalized text, in document
    * order (the no-newline analogue of a document's "lines" — segment i
    * covers tokens [i*k, i*k+k)). The unit of corpus-level boilerplate
    * removal in [[dedupSegments]]. */
  def segments(c: Column, k: Int): Column =
    graft.functions.exprs.word_windows(tokens(c), k, k)

  /** Corpus-level boilerplate segment removal (the line-dedup step of
    * RefinedWeb/C4-style curation, on k-token segments since this corpus
    * has no newlines): drop every segment that occurs in >= `minDocs`
    * distinct documents, keeping the rest in order.
    *
    * Scale design: the frequent-segment lexicon is aggregated first
    * (map-side partial agg, shuffle keyed on segment — never on the
    * document) and is SMALL BY CONSTRUCTION (bounded by corpus vocabulary
    * of repeated boilerplate, not corpus size). The corpus is then cleaned
    * in a single map-side projection — the 100 TB corpus side never
    * shuffles, mirroring [[graft.text.Decontaminate]]'s broadcast shape.
    * HOW the lexicon reaches the executors depends on its size:
    *
    *   - ≤ `inlineThreshold` entries: inlined into the native
    *     [[graft.functions.RemoveInSet]] hash-set expression —
    *     whole-stage-codegen'd, zero per-task setup;
    *   - above it: shipped ONCE per executor as a broadcast variable
    *     consumed by a closure (a ~1M-string expression literal would be
    *     a driver-memory and plan-serialization hazard; the broadcast
    *     torrent is the mechanism built for exactly this);
    *   - above `maxLexicon`: the lexicon is NEVER collected. The corpus is
    *     posexploded into (doc, pos, segment) rows, frequent segments are
    *     dropped with a left-anti join against the lexicon DataFrame, and
    *     documents are reassembled in position order. This is the one tier
    *     where the corpus shuffles (explode + anti-join + groupBy doc) —
    *     the correct trade when the boilerplate lexicon itself is too big
    *     for any single JVM, instead of failing. Driver memory stays O(1).
    *
    * The tier is chosen with a `limit(maxLexicon+1).collect()` probe, so
    * the driver never materializes more than `maxLexicon`+1 segments even
    * when the corpus is degenerate.
    *
    * @return (doc_id, segs_total, segs_removed, clean_text)
    */
  def dedupSegments(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      k: Int = 2, minDocs: Int = 20,
      maxLexicon: Int = 1 << 20,
      inlineThreshold: Int = 4096): org.apache.spark.sql.DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    val lexiconDf = df.select(id.as("__id"), explode(segments(text, k)).as("__seg"))
      .groupBy(col("__seg"))
      .agg(countDistinct(col("__id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__seg"))
    // Bounded probe: collects at most maxLexicon+1 rows regardless of how
    // degenerate the corpus is.
    val probe = lexiconDf.limit(maxLexicon + 1).collect()
    if (probe.length > maxLexicon) return dedupSegmentsJoin(df, id, text, k, lexiconDf)
    val lexicon = probe.map(_.getString(0)).sorted
    val segs = segments(text, k)
    val kept =
      if (lexicon.length <= inlineThreshold) {
        // native hash-set removal: O(|segs|) per doc, codegen'd
        graft.functions.exprs.remove_in_set(segs, lexicon.toIndexedSeq)
      } else {
        // broadcast-variable kernel: same semantics, lexicon rides the
        // broadcast torrent instead of the serialized plan
        val bc = df.sparkSession.sparkContext.broadcast(lexicon.toSet)
        graft.functions.exprs.remove_in_broadcast_set(segs, bc)
      }
    df.select(id.as("doc_id"),
      size(segs).as("segs_total"),
      (size(segs) - size(kept)).as("segs_removed"),
      array_join(kept, " ").as("clean_text"))
  }

  /** Reassemble per-document text from kept (position, unit) rows in
    * position order — the shared tail of every operator that explodes a
    * document, filters units, and rebuilds it ([[dedupSegmentsJoin]],
    * [[dedupSegmentsKeepFirst]], [[removeDuplicateSpans]]). Positions are
    * unique per document, so the struct sort is a pure position sort.
    * @return (doc_id, __kept, clean_text) */
  private def reassembleByPosition(
      kept: org.apache.spark.sql.DataFrame,
      pos: Column, unit: Column): org.apache.spark.sql.DataFrame =
    kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("__kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(pos.as("__p"), unit.as("__u")))),
            s => s.getField("__u")), " ").as("clean_text"))

  /** The fully-distributed tier of [[dedupSegments]]: segment-level
    * left-anti join against the (never collected) frequent-segment
    * lexicon, then positional reassembly. Row-identical to the broadcast
    * tier (asserted in PipelineSpec with `maxLexicon = 0`). */
  private def dedupSegmentsJoin(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      k: Int,
      lexiconDf: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val base = df.select(id.as("doc_id"), segments(text, k).as("__segs"))
    val exploded = base.select(col("doc_id"),
      posexplode(col("__segs")).as(Seq("__pos", "__seg")))
    val keptRows = exploded.join(lexiconDf, Seq("__seg"), "left_anti")
    val reassembled = reassembleByPosition(keptRows, col("__pos"), col("__seg"))
    base.select(col("doc_id"), size(col("__segs")).as("segs_total"))
      .join(reassembled, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("segs_total"),
        (col("segs_total") - coalesce(col("__kept"), lit(0))).as("segs_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Global FIRST-OCCURRENCE segment dedup (the C4 recipe: "we removed
    * all but one of any three-sentence span occurring more than once",
    * on k-token segments since this corpus has no sentence boundaries):
    * every repeated segment keeps only its single globally-first
    * occurrence — the one with the smallest (doc_id, position) — and
    * every later occurrence, in other documents OR later in the same
    * document, is dropped. Contrast [[dedupSegments]], which drops ALL
    * occurrences of frequent segments (boilerplate removal); keep-first
    * preserves exactly one copy of every span in the corpus.
    *
    * Scale design: one shuffle keyed on the segment. The keeper table
    * (segment → min struct(doc_id, pos), a map-side-partial `min` — one
    * row per distinct segment, immune to hot-segment skew) re-joins the
    * exploded corpus as a sort-merge equi-join with exactly one keeper
    * row per key, then documents reassemble in position order (same
    * groupBy-doc shape as [[dedupSegments]]'s join tier). No windows over
    * the segment partition — a stop-word segment at 100 TB would put its
    * whole occurrence list in one task.
    *
    * @return (doc_id, segs_total, segs_removed, clean_text)
    */
  def dedupSegmentsKeepFirst(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      k: Int = 2): org.apache.spark.sql.DataFrame = {
    val base = df.select(id.as("doc_id"), segments(text, k).as("__segs"))
      .localCheckpoint(eager = false)
    val exploded = base.select(col("doc_id"),
      posexplode(col("__segs")).as(Seq("__pos", "__seg")))
    val keepers = exploded
      .groupBy(col("__seg"))
      .agg(min(struct(col("doc_id"), col("__pos"))).as("__first"))
    val keptRows = exploded.join(keepers, Seq("__seg"))
      .filter(col("doc_id") === col("__first.doc_id") &&
        col("__pos") === col("__first.__pos"))
    val reassembled = reassembleByPosition(keptRows, col("__pos"), col("__seg"))
    base.select(col("doc_id"), size(col("__segs")).as("segs_total"))
      .join(reassembled, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("segs_total"),
        (col("segs_total") - coalesce(col("__kept"), lit(0))).as("segs_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Duplicated-substring coverage (the hash-windowed distributed
    * approximation of suffix-array ExactSubstr dedup, Lee et al. 2021
    * "Deduplicating Training Data Makes Language Models Better"): slide
    * an L-token window with stride 1 over every document; a window is
    * DUPLICATED when the same L tokens occur at 2+ positions anywhere in
    * the corpus (across documents or within one); a document's duplicated
    * token positions are those covered by at least one duplicated window.
    * Reports per-document coverage — the "fraction of my text that exists
    * elsewhere verbatim" signal pipelines threshold on before cutting
    * spans.
    *
    * Scale design: the corpus shuffles once keyed on the window text
    * (map-side partial count; one count row per distinct window — skew
    * from hot windows collapses in the partial agg), duplicated windows
    * re-join the exploded corpus as an equi-join, and coverage is a
    * per-document distinct-position count whose input is bounded by
    * actual duplication × L, not corpus size. Windows shorter than L
    * (document tails, docs with < L tokens) are excluded from both sides
    * of the ratio. At true 100 TB swap the window STRING for its 128-bit
    * hash before the shuffle (same grouping, 1/Lth the bytes) — kept as
    * text here so the oracle can replay byte-for-byte.
    *
    * @return (doc_id, n_tokens, n_windows, dup_windows, covered_tokens,
    *         dup_fraction) — dup_fraction = covered_tokens / n_tokens
    *         rounded to 4 dp, 0.0 for empty documents.
    */
  /** (base, wins) for stride-1 L-token windowing: base = (doc_id, __toks,
    * __wins), lazily checkpointed; wins keeps only FULL windows
    * (position p valid iff p + L ≤ n_tokens). The shared preamble of
    * [[duplicateSpans]] and [[removeDuplicateSpans]]. */
  private def windowedBase(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      windowL: Int): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    require(windowL >= 1, s"window length must be >= 1: $windowL")
    val toks = tokens(text)
    val base = df.select(id.as("doc_id"), toks.as("__toks"),
        graft.functions.exprs.word_windows(toks, windowL, 1).as("__wins"))
      .localCheckpoint(eager = false)
    val wins = base.select(col("doc_id"), size(col("__toks")).as("__n"),
        posexplode(col("__wins")).as(Seq("__pos", "__win")))
      .filter(col("__pos") + windowL <= col("__n"))
    (base, wins)
  }

  def duplicateSpans(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      windowL: Int = 8): org.apache.spark.sql.DataFrame = {
    val (base, wins) = windowedBase(df, id, text, windowL)
    val dups = wins.groupBy(col("__win"))
      .agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") >= 2)
      .select(col("__win"))
    val covered = wins.join(dups, Seq("__win"))
      .select(col("doc_id"), col("__pos"),
        explode(sequence(col("__pos"), col("__pos") + lit(windowL - 1))).as("__t"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("__t")).cast("int").as("covered_tokens"),
        countDistinct(col("__pos")).cast("int").as("dup_windows"))
    base.select(col("doc_id"), size(col("__toks")).as("n_tokens"),
        greatest(size(col("__toks")) - lit(windowL - 1), lit(0)).as("__nw"))
      .withColumn("n_windows",
        when(col("n_tokens") < windowL, lit(0)).otherwise(col("__nw")))
      .join(covered, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"), col("n_windows"),
        coalesce(col("dup_windows"), lit(0)).as("dup_windows"),
        coalesce(col("covered_tokens"), lit(0)).as("covered_tokens"))
      .withColumn("dup_fraction",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(round(col("covered_tokens").cast("double") / col("n_tokens"), 4)))
  }

  /** Duplicated-substring REMOVAL — the cutting step ExactSubstr dedup
    * actually ships (where [[duplicateSpans]] only measures): every
    * duplicated L-token window keeps its single globally-first
    * (doc_id, pos) occurrence, and a token position is cut when some
    * duplicated window covering it at that position is NOT the global
    * first — so exactly one copy of each duplicated string survives
    * (modulo overlaps with other non-first duplicated windows, the
    * standard greedy approximation of the suffix-array span rule).
    *
    * Scale design: the window table shuffles once keyed on the window
    * (partial-agg count + min keeper — one row per distinct window,
    * hot-window skew collapses map-side), non-keeper occurrences explode
    * to a removal-position set BOUNDED BY ACTUAL DUPLICATION × L, and the
    * corpus reassembles with one token-level anti-join + groupBy doc —
    * the same one-corpus-shuffle trade as [[dedupSegments]]'s join tier.
    *
    * @return (doc_id, n_tokens, removed_tokens, clean_text)
    */
  def removeDuplicateSpans(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      windowL: Int = 8): org.apache.spark.sql.DataFrame = {
    val (base, wins) = windowedBase(df, id, text, windowL)
    val dups = wins.groupBy(col("__win"))
      .agg(count(lit(1)).as("__occ"),
        min(struct(col("doc_id"), col("__pos"))).as("__first"))
      .filter(col("__occ") >= 2)
    val removalPos = wins.join(dups, Seq("__win"))
      .filter(!(col("doc_id") === col("__first.doc_id") &&
        col("__pos") === col("__first.__pos")))
      .select(col("doc_id"),
        explode(sequence(col("__pos"), col("__pos") + lit(windowL - 1))).as("__t"))
      .distinct()
    val tokRows = base.select(col("doc_id"),
      posexplode(col("__toks")).as(Seq("__t", "__tok")))
    val keptRows = tokRows.join(removalPos, Seq("doc_id", "__t"), "left_anti")
    val reassembled = reassembleByPosition(keptRows, col("__t"), col("__tok"))
    base.select(col("doc_id"), size(col("__toks")).as("n_tokens"))
      .join(reassembled, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__kept"), lit(0))).as("removed_tokens"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Sliding-window document chunking: split each document into token
    * windows of size `k` advancing by `stride` (overlapping when
    * stride < k) — the context-window preparation step before embedding
    * or sequence packing. Chunk c covers tokens [c*stride, c*stride+k);
    * the last chunk may be partial but no chunk is fully contained in an
    * earlier one; an empty document yields no chunks. Pure map-side
    * per-document expression work — nothing shuffles.
    *
    * @return (doc_id, chunk_idx, n_tokens, chunk_text)
    */
  def chunkDocs(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      k: Int = 32, stride: Int = 16): org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"chunk size must be >= 1: $k")
    require(stride >= 1 && stride <= k, s"stride must be in [1, k]: $stride")
    df.select(id.as("doc_id"),
        posexplode(graft.functions.exprs.word_windows(tokens(text), k, stride))
          .as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx"),
        size(split(col("chunk_text"), " ")).as("n_tokens"),
        col("chunk_text"))
  }

  /** Posting-list inverted index with CHUNKED postings: one row per
    * (term, chunk) where chunk_idx = doc_id div chunkSize, so no single
    * row ever holds more than `chunkSize` ids — a stop-word term at
    * 100 TB becomes many bounded rows instead of one multi-GB array
    * (straggler, then OOM). The chunk key is derived from the id VALUE,
    * not a rank, so chunking is pure map-side (no window over the term
    * partition, which would rebuild the giant row in one task); chunk
    * indices are sparse where an id range has no postings, and
    * concatenating a term's chunks in chunk_idx order yields the globally
    * sorted posting list (ids must be non-negative for div to agree with
    * floor). doc_freq (per-term total across chunks) is re-attached by a
    * streaming sort-merge join on term — bounded memory even for a
    * degenerate one-term corpus.
    *
    * @return (term, chunk_idx, doc_freq, postings) */
  def invertedIndex(
      df: org.apache.spark.sql.DataFrame, id: Column,
      text: Column, chunkSize: Int = 1 << 16): org.apache.spark.sql.DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1: $chunkSize")
    val byChunk = df
      .select(id.as("doc_id"), explode(array_distinct(tokens(text))).as("term"))
      .groupBy(col("term"), expr(s"doc_id div $chunkSize").as("chunk_idx"))
      .agg(sort_array(collect_list(col("doc_id"))).as("postings"))
      .localCheckpoint(eager = false)
    val totals = byChunk.groupBy(col("term"))
      .agg(sum(size(col("postings"))).cast("long").as("doc_freq"))
    byChunk.join(totals, Seq("term"))
      .select(col("term"), col("chunk_idx"), col("doc_freq"), col("postings"))
  }

  /** MOSS winnowing fingerprint table (Schleimer et al. 2003): one row
    * per selected (position, hash) — see
    * [[graft.functions.WinnowFingerprints]] for the selection rule. The
    * POSITIONAL substring-match signal the set-based shingle operators
    * drop: any shared normalized substring of >= k + w - 1 characters is
    * guaranteed a shared fingerprint, at density ~2/(w+1). Selection is
    * pure map-side kernel work; nothing shuffles.
    *
    * @return (doc_id, pos, hash) */
  def winnowFingerprints(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      k: Int = 12, w: Int = 8): org.apache.spark.sql.DataFrame =
    df.select(id.as("doc_id"),
        explode(graft.functions.exprs.winnow_fingerprints(text, k, w)).as("__f"))
      .select(col("doc_id"), col("__f").getField("pos").as("pos"),
        col("__f").getField("hash").as("hash"))

  /** Cross-document winnowing matches: pairs sharing at least `minShared`
    * distinct selected fingerprints (the MOSS match score). Candidates
    * meet through an equi-join on the 64-bit fingerprint — ids-only after
    * the map-side selection, no cross join. `maxDf` drops fingerprints
    * selected in more than that many documents (boilerplate guard, the
    * MOSS "too common" cull): a header shared by a million docs would
    * otherwise emit a quadratic pair set for one hash; matches inside it
    * are noise anyway.
    *
    * @return (id_a, id_b, shared) with id_a < id_b, shared >= minShared. */
  def winnowPairs(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      k: Int = 12, w: Int = 8, minShared: Long = 2L,
      maxDf: Long = Long.MaxValue): org.apache.spark.sql.DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    require(maxDf >= 2, s"maxDf < 2 can never match: $maxDf")
    // distinct hash set feeds the df-cull and both join sides — once
    val fp = winnowFingerprints(df, id, text, k, w)
      .select(col("doc_id"), col("hash")).distinct()
      .localCheckpoint(eager = false)
    val culled =
      if (maxDf == Long.MaxValue) fp
      else fp.join(
        fp.groupBy(col("hash")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxDf).select(col("hash")),
        Seq("hash"))
    culled.select(col("hash"), col("doc_id").as("id_a"))
      .join(culled.select(col("hash"), col("doc_id").as("id_b")), Seq("hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  // ---- shared-fingerprint batch path (streaming ingest) ----------------
  //
  // A streaming winnow batch needs fingerprints THREE times — the index
  // probe, the in-batch dedup, and the kept-segment append. The *Fp
  // variants run the identical join arithmetic over a DISTINCT
  // (doc_id, hash) frame computed once, so the rolling-hash selection
  // kernel is paid once per batch instead of three times. Unlike the
  // minhash Signed frame, a too-short document yields ZERO fingerprint
  // rows — it can never match anything, so the Fp helpers return DUP-ID
  // frames the caller anti-joins against the full batch (a survivor-rows
  // design would silently drop fingerprint-less docs).

  /** Fingerprint a batch once: DISTINCT (doc_id, hash) ONLY — the
    * shareable frame (lazy localCheckpoint); position is not needed by
    * any consumer and text deliberately does not ride the checkpoint. */
  def winnowFingerprintSet(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      k: Int = 12, w: Int = 8): org.apache.spark.sql.DataFrame =
    winnowFingerprints(df, id, text, k, w)
      .select(col("doc_id"), col("hash")).distinct()
      .localCheckpoint(eager = false)

  /** [[dedupAgainstWinnowIndex]]'s probe over a pre-fingerprinted frame:
    * the ids of fp's documents sharing >= `minShared` distinct selected
    * fingerprints with any ONE indexed document, as (`__dup_id`). */
  def winnowIndexDupIdsFp(
      spark: org.apache.spark.sql.SparkSession,
      fp: org.apache.spark.sql.DataFrame, dir: String,
      k: Int = 12, w: Int = 8,
      minShared: Long = 2L): org.apache.spark.sql.DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    graft.ops.IndexSpec.check(fp, dir, s"winnow k=$k w=$w")
    val corpus = graft.ops.Segments.readPart(spark, dir, "fps")
      .select(col("hash"), col("doc_id").as("__corpus_id"))
    // the batch fingerprints BROADCAST (micro-batch-bounded by design):
    // the stored corpus table — the side that grows — is scanned
    // map-side, never shuffled per batch; only the bounded (__id,
    // __corpus_id) pair counts cross an exchange for the aggregation.
    // No trailing distinct: consumers anti-join, whose build side
    // dedups by construction (the distinct cost an Exchange per batch)
    broadcast(fp.select(col("hash"), col("doc_id").as("__id")))
      .join(corpus, Seq("hash"))
      .groupBy(col("__id"), col("__corpus_id"))
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >= minShared)
      .select(col("__id").as("__dup_id"))
  }

  /** [[dedupWinnow]]'s in-batch drop set over a pre-fingerprinted frame:
    * the LARGER id of every match pair (keep-smallest), as (`__dup_id`). */
  def winnowDupIdsFp(
      fp: org.apache.spark.sql.DataFrame,
      minShared: Long = 2L,
      maxDf: Long = Long.MaxValue): org.apache.spark.sql.DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    require(maxDf >= 2, s"maxDf < 2 can never match: $maxDf")
    val culled =
      if (maxDf == Long.MaxValue) fp
      else fp.join(
        fp.groupBy(col("hash")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxDf).select(col("hash")),
        Seq("hash"))
    // the self-join BROADCASTS its build side (the frame is one
    // micro-batch's fingerprints — bounded by design) so the in-batch
    // match plans without shuffling either side; no trailing distinct
    // (consumers anti-join, whose build side dedups by construction)
    culled.select(col("hash"), col("doc_id").as("id_a"))
      .join(broadcast(culled.select(col("hash"), col("doc_id").as("id_b"))),
        Seq("hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("id_b").as("__dup_id"))
  }

  /** [[appendWinnowSegment]] from pre-fingerprinted rows — no re-hash
    * (the frame is already the distinct (hash, doc_id) the segment
    * stores). */
  def appendWinnowSegmentFp(
      fp: org.apache.spark.sql.DataFrame,
      dir: String, segmentId: String, k: Int = 12, w: Int = 8): Unit = {
    val spec = s"winnow k=$k w=$w"
    val spark = fp.sparkSession
    val hadSpec = graft.ops.IndexSpec.checkReturningPresence(fp, dir, spec)
    val segDir = graft.ops.Segments.prepare(spark, dir, segmentId)
    fp.select(col("hash"), col("doc_id"))
      .write.mode("overwrite").parquet(s"$segDir/fps")
    graft.ops.Segments.commit(spark, segDir)
    if (!hadSpec) graft.ops.IndexSpec.write(fp, dir, spec)
  }

  /** Phrase-blocklist audit table: one row per document with at least one
    * blocklisted phrase, carrying WHICH phrases matched (phrase-list
    * order) — the safety-filter audit trail. One Aho–Corasick pass per
    * document over the plan-literal phrase set
    * ([[graft.functions.MatchedPhrases]]), map-side, O(len + matches)
    * however long the blocklist; substring semantics == `contains`
    * (pre-lowercase text and phrases for case-folded gates).
    *
    * @return (doc_id, matched) */
  def blocklistMatches(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      phrases: Seq[String]): org.apache.spark.sql.DataFrame =
    df.select(id.as("doc_id"),
        graft.functions.exprs.matched_phrases(text, phrases).as("matched"))
      .filter(size(col("matched")) > 0)

  /** The gate itself: rows whose text contains NO blocklisted phrase. */
  def filterBlockedPhrases(
      df: org.apache.spark.sql.DataFrame, text: Column,
      phrases: Seq[String]): org.apache.spark.sql.DataFrame =
    df.filter(size(graft.functions.exprs.matched_phrases(text, phrases)) === 0)

  /** In-batch winnow dedup: drop the LARGER id of every
    * [[winnowPairs]] match (keep-smallest, the [[graft.dedup.Dedup]]
    * convention), leaving one representative per overlap cluster edge. */
  def dedupWinnow(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      k: Int = 12, w: Int = 8, minShared: Long = 2L,
      maxDf: Long = Long.MaxValue): org.apache.spark.sql.DataFrame = {
    val fp = winnowFingerprintSet(df, id, text, k, w)
    df.join(winnowDupIdsFp(fp, minShared, maxDf), id === col("__dup_id"), "left_anti")
  }

  // ---- materialized winnow index (ingest-time substring-match check) --

  /** Materialize the winnow fingerprint table — the exact-substring-match
    * twin of the minhash/fingerprint serving indexes: fingerprints are
    * selected ONCE at index time; a new batch computes only its own
    * selections and equi-joins the stored table, so corpus text is never
    * re-read per batch. One sub-table `fps/` (hash, doc_id), distinct.
    * The index is (k, w)-specific — probe with the parameters it was
    * built with (`_index_spec`-pinned). */
  def buildWinnowIndex(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      dir: String, k: Int = 12, w: Int = 8): Unit =
    writeWinnowIndex(df, id, text, dir, "overwrite", k, w)

  /** Grow a [[buildWinnowIndex]] table with a delta batch. */
  def appendToWinnowIndex(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      dir: String, k: Int = 12, w: Int = 8): Unit =
    writeWinnowIndex(df, id, text, dir, "append", k, w)

  private def writeWinnowIndex(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      dir: String, mode: String, k: Int, w: Int): Unit = {
    val spec = s"winnow k=$k w=$w"
    val hadSpec =
      if (mode == "overwrite") { graft.ops.IndexSpec.delete(df, dir); false }
      else graft.ops.IndexSpec.checkReturningPresence(df, dir, spec)
    winnowFingerprints(df, id, text, k, w)
      .select(col("hash"), col("doc_id")).distinct()
      .write.mode(mode).parquet(s"$dir/fps")
    if (!hadSpec) graft.ops.IndexSpec.write(df, dir, spec)
  }

  /** Crash-safe SEGMENT append for the winnow index (the
    * [[graft.ops.Segments]] shape shared by the minhash / fingerprint /
    * search indexes: a mid-write crash is invisible until the commit
    * marker lands, and a same-id retry overwrites its own segment —
    * exactly-once ingest). */
  def appendWinnowSegment(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      dir: String, segmentId: String, k: Int = 12, w: Int = 8): Unit = {
    val spec = s"winnow k=$k w=$w"
    val spark = df.sparkSession
    val hadSpec = graft.ops.IndexSpec.checkReturningPresence(df, dir, spec)
    val segDir = graft.ops.Segments.prepare(spark, dir, segmentId)
    winnowFingerprints(df, id, text, k, w)
      .select(col("hash"), col("doc_id")).distinct()
      .write.mode("overwrite").parquet(s"$segDir/fps")
    graft.ops.Segments.commit(spark, segDir)
    if (!hadSpec) graft.ops.IndexSpec.write(df, dir, spec)
  }

  /** LSM merge for winnow segments. Returns the number merged. */
  def compactWinnowSegments(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      k: Int = 12, w: Int = 8): Int = {
    graft.ops.IndexSpec.check(spark, dir, s"winnow k=$k w=$w",
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
        live.map(s => spark.read.parquet(s"$s/fps")).reduce(_ unionByName _)
          .select(col("hash"), col("doc_id")).distinct()
          .write.mode("overwrite").parquet(s"$segDir/fps")
        graft.ops.Segments.commit(spark, segDir, replaces = names)
        graft.ops.Segments.delete(spark, live)
        live.length
      }
    }
  }

  /** Drop every row of `df` (a NEW batch) sharing at least `minShared`
    * distinct winnow fingerprints with any indexed document — the
    * ingest-time verbatim-overlap gate (guaranteed to catch any shared
    * normalized run >= k+w-1 characters when minShared fingerprints of
    * it survive). The batch selects its fingerprints once map-side; the
    * corpus contributes only stored (hash, id) rows through one
    * equi-join — no re-fingerprinting, no text re-read. In-batch
    * duplicates are NOT removed here (run [[winnowPairs]] on the batch
    * for that level), mirroring the other incremental dedup fronts. */
  def dedupAgainstWinnowIndex(
      spark: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      dir: String, k: Int = 12, w: Int = 8,
      minShared: Long = 2L): org.apache.spark.sql.DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    graft.ops.IndexSpec.check(df, dir, s"winnow k=$k w=$w")
    // cpuBoundIfSmall: the rolling-hash kernel over the batch is
    // CPU-bound; a single-file batch scan would run it on one core
    val batch = winnowFingerprints(
        graft.ops.Parallel.cpuBoundIfSmall(df), id, text, k, w)
      .select(col("hash"), col("doc_id").as("__id")).distinct()
    val corpus = graft.ops.Segments.readPart(spark, dir, "fps")
      .select(col("hash"), col("doc_id").as("__corpus_id"))
    // NO broadcast hints here, deliberately (A/B'd r14): this one-shot
    // op reads parquet on both sides, so Catalyst has real size stats
    // and already broadcasts the bounded batch side (locally AND at
    // scale); forcing hints serialized the broadcast builds and cost
    // +57% (2.13 -> 3.75 s on q_text_winnow_incremental). Explicit
    // hints belong to the stats-less CHECKPOINTED streaming frames
    // (winnowIndexDupIdsFp / winnowDupIdsFp).
    val dups = batch.join(corpus, Seq("hash"))
      .groupBy(col("__id"), col("__corpus_id"))
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >= minShared)
      .select(col("__id").as("__dup_id")).distinct()
    df.join(dups, id === col("__dup_id"), "left_anti")
  }

  /** Conjunctive (AND) keyword search: documents containing EVERY term,
    * via count-matching exploded terms — the posting-intersection shape,
    * no per-term corpus rescans. */
  def searchAll(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "at least one search term required")
    val distinct = terms.distinct
    df.select(id.as("doc_id"), explode(array_distinct(tokens(text))).as("term"))
      .filter(col("term").isin(distinct: _*))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__hits"))
      .filter(col("__hits") === distinct.size)
      .select(col("doc_id"))
  }

  /** Per-document k-gram repetition statistics — the boilerplate /
    * degenerate-text signal quality filters threshold on:
    * (doc_id, n_grams, top_count, rep_ratio = top/total). Two pipelined
    * aggregations, shuffle keyed on (doc, gram) then doc. */
  def repetitionStats(
      df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      k: Int = 2): org.apache.spark.sql.DataFrame = {
    val grams = df.select(id.as("doc_id"),
      explode(graft.functions.exprs.word_shingles(tokens(text), k)).as("__g"))
    grams.groupBy(col("doc_id"), col("__g")).agg(count(lit(1)).as("__c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("n_grams"), max(col("__c")).as("top_count"))
      .select(col("doc_id"), col("n_grams"), col("top_count"),
        round(col("top_count").cast("double") / col("n_grams").cast("double"), 4)
          .as("rep_ratio"))
  }
}

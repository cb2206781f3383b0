package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Training-data pipeline operators (graft.text / dedup / ann /
  * multimodal / ops) over the documents + embeddings tables. */
private[graft] trait QueriesPipeline { self: SparkEntryFixtures =>

  def pipelineQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ------------------------------------------------------------------
    // Training-data pipeline operators (graft.text / dedup / ann /
    // multimodal) over the documents + embeddings tables.
    // ------------------------------------------------------------------

    // Token counting + BPE-ish subword estimate.
    "q_text_tokens" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents")
        .select($"doc_id",
          graft.text.TextFunctions.tokenCount($"text").as("n_tokens"),
          graft.text.TextFunctions.subwordCountEstimate($"text").as("n_subwords"),
          length($"text").as("n_chars_raw"))
        .orderBy($"doc_id")
    }),

    // BPE tokenizer TRAINING: distributed word-count pass, driver merge
    // learning over the (distinct-word-sized) table. VALUE-GATED: the
    // trainer's whole iterative loop replays in SQL — a recursive CTE
    // whose working table is the per-round word/symbol state, the
    // global argmax an aggregate over the previous iteration (count
    // desc, pair asc tie-break), the merge sweep a parity-selected
    // non-overlapping replacement (handles a == b runs) — and matches
    // the TreeSet trainer bit-for-bit; BpeSpec additionally diffs it
    // against a naive recount-everything reference.
    "q_text_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      val wc = graft.text.Bpe.wordCounts(
        tbl(s, dir, "documents"), $"text", minCount = 2L)
      s.createDataFrame(graft.text.Bpe.train(wc, numMerges = 24))
        .select($"rank", $"left", $"right", $"pairCount".as("pair_count"))
        .orderBy($"rank")
    }),

    // BPE ENCODING, value-gated: the codegen'd kernel under a FIXED
    // plan-literal merge table (hierarchical, a != b for every pair, so
    // a single round's sweep has no overlapping occurrences and the
    // oracle's recursive-CTE replay over distinct words is exact —
    // lowest-rank adjacent pair per round, all occurrences merged
    // left-to-right). Emits the full subword segmentation per doc.
    // Encoding under TRAINED merges (the q_text_bpe_merges output) is
    // the same kernel + BpeSpec's differential tests.
    "q_text_bpe_encode" -> ((s, dir) => {
      import s.implicits._
      val toks = graft.text.TextFunctions.tokens($"text")
      val enc = graft.text.Bpe.encode(toks, bpeFixedMerges)
      tbl(s, dir, "documents").select($"doc_id",
          size(toks).as("n_words"),
          size(enc).as("n_subwords"),
          concat_ws(" ", enc).as("subwords"))
        .orderBy($"doc_id")
    }),

    // The TRAIN -> ENCODE integration gate: merges learned from the
    // corpus (the q_text_bpe_merges trainer), then the codegen'd encode
    // kernel segments every document under them — and the ORACLE
    // replays BOTH stages in SQL (trainer recursion + encoder recursion
    // composed), so the full tokenizer pipeline is hash-verified, not
    // just its parts.
    "q_text_bpe_encode_trained" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val merges = graft.text.Bpe.mergesOf(graft.text.Bpe.train(
        graft.text.Bpe.wordCounts(docs, $"text", minCount = 2L), numMerges = 24))
      val enc = graft.text.Bpe.encode(
        graft.text.TextFunctions.tokens($"text"), merges)
      docs.select($"doc_id",
          size(enc).as("n_subwords"),
          concat_ws(" ", enc).as("subwords"))
        .orderBy($"doc_id")
    }),

    // Quality scoring: ratios + combined score.
    "q_text_quality" -> ((s, dir) => {
      import s.implicits._
      val t = graft.text.TextFunctions
      tbl(s, dir, "documents")
        .select($"doc_id",
          round(t.punctRatio($"text"), 4).as("punct_ratio"),
          round(t.digitRatio($"text"), 4).as("digit_ratio"),
          round(t.stopwordRatio($"text"), 4).as("stopword_ratio"),
          t.qualityScore($"text").as("quality"))
        .orderBy($"doc_id")
    }),

    // Corpus DATA CARD: the per-source release summary (volume, exact
    // verbatim-dup count, language mix, mean quality) in one grouped
    // pass over the same deterministic signals the curation gates use.
    // Quality means sum in exact integer 1e-4 units (the per-doc score
    // is already 4dp-rounded) so the mean is order-independent; the
    // oracle replays every signal including the langid chain.
    "q_report_datacard" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Report.corpusDataCard(
          tbl(s, dir, "documents"), $"source", $"text")
        .orderBy($"source")
    }),

    // Round-4 composed curation pipeline: Gopher rule gate → URL/domain
    // provenance filter → corpus mix to target composition (with
    // epoch upsampling). The oracle replays all three stages — flags,
    // domain NOT IN, and the full mix derivation with counts taken over
    // the SURVIVOR set.
    "q_pipeline_curate2" -> ((s, dir) => {
      import s.implicits._
      val t = graft.text.TextFunctions
      val gated = tbl(s, dir, "documents").filter(
        t.gopherFlags($"text", minWords = 40, maxWords = 100000,
          minMeanWordLen = 4.0, maxMeanWordLen = 10.0,
          maxDigitRatio = 0.2, minStopwordHits = 2).getField("pass"))
      val withUrl = gated.withColumn("url",
        concat(lit("https://www."), $"source", lit(".example.com/doc/"), $"doc_id"))
      val clean = graft.text.Web.filterBlockedDomains(withUrl, $"url",
        Seq("src1.example.com", "src3.example.com", "src5.example.com"))
      graft.ops.Sampling.mixCorpus(clean, $"doc_id", $"source",
          weights = Map("src0" -> 1.0, "src2" -> 1.0, "src4" -> 2.0),
          totalRows = 60L, allowUpsample = true, salt = "cur2")
        .select($"doc_id", $"source", $"epoch")
        .orderBy($"doc_id", $"epoch")
    }),

    // Round-5 composed curation pipeline: zero-duplicate-segment gate
    // (Gopher dup-line, strict) → bigram-LM middle band (CCNet-style:
    // cut word salad AND boilerplate; model trained on the FULL corpus)
    // → registrable-domain (eTLD+1) provenance gate over subdomain-
    // varying URLs → deterministic 10-per-source cap. The oracle replays
    // every stage from scratch.
    "q_pipeline_curate3" -> ((s, dir) => {
      import s.implicits._
      val t = graft.text.TextFunctions
      val docs = tbl(s, dir, "documents")
      // gate on the exact integer count, not the 4-dp rounded fraction:
      // a >20k-segment doc with one duplicate rounds to 0.0 but the
      // DuckDB oracle's count(*) > count(DISTINCT seg) would exclude it
      val seg = docs.filter(
        t.duplicateSegmentStats($"text", k = 2).getField("dup_segments") === 0L)
      val lm = graft.text.Tfidf.bigramNll(docs, $"doc_id", $"text")
        .filter($"avg_nll_micro".between(3340000L, 3430000L))
        .select($"doc_id", $"avg_nll_micro")
      val banded = seg.join(lm, Seq("doc_id"))
      val sub = when($"doc_id" % 4 === 0, "www.").when($"doc_id" % 4 === 1, "a.b.")
        .when($"doc_id" % 4 === 2, "").otherwise("sub.")
      val tld = when($"doc_id" % 3 === 0, ".com")
        .when($"doc_id" % 3 === 1, ".co.uk").otherwise(".com.au")
      val withUrl = banded.withColumn("url",
        concat(lit("https://"), sub, $"source", tld, lit("/doc/"), $"doc_id"))
      val clean = graft.text.Web.filterBlockedRegistrable(withUrl, $"url",
        Seq("src1.co.uk", "src3.com.au", "src5.com"))
      graft.ops.Sampling.stratifiedSample(
          clean, $"source", $"doc_id", n = 10, salt = "cur3")
        .select($"doc_id", $"source", $"avg_nll_micro")
        .orderBy($"doc_id")
    }),

    // Duplicate-segment fraction (Gopher's dup-line signal at 2-word
    // segment granularity): 181/500 docs at sf0.01 carry at least one
    // repeated segment, so the fraction genuinely splits the corpus.
    "q_text_dupseg" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents")
        .select($"doc_id",
          graft.text.TextFunctions.duplicateSegmentStats($"text", k = 2).as("d"))
        .select($"doc_id", $"d.n_segments", $"d.dup_segments", $"d.dup_fraction")
        .orderBy($"doc_id")
    }),

    // Gopher-style rule gate: per-rule flags + overall pass, thresholds
    // chosen to split the corpus on every rule the synthetic text can
    // exercise. The oracle re-derives each flag from scratch.
    "q_text_gopher" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents")
        .select($"doc_id",
          graft.text.TextFunctions.gopherFlags($"text",
            minWords = 40, maxWords = 100000,
            minMeanWordLen = 4.0, maxMeanWordLen = 10.0,
            maxDigitRatio = 0.2, minStopwordHits = 2).as("g"))
        .select($"doc_id", $"g.words_ok", $"g.mean_word_len_ok",
          $"g.digit_ok", $"g.stopword_ok", $"g.pass")
        .orderBy($"doc_id")
    }),

    // URL/domain provenance filter: deterministic per-doc URLs, blocklist
    // drops three source domains map-side (literal NOT IN — no shuffle).
    // URL blocklist keyed on the REGISTRABLE domain (eTLD+1 via the
    // embedded public-suffix snapshot): fixtures vary subdomain depth
    // (www./a.b./bare/sub.) and TLD shape (.com/.co.uk/.com.au), so
    // 'src1.co.uk' must block 'a.b.src1.co.uk' but not 'src1.com'. The
    // oracle re-derives host, www-stripped domain, and registrable
    // domain from the same suffix snapshot.
    "q_web_domains" -> ((s, dir) => {
      import s.implicits._
      val sub = when($"doc_id" % 4 === 0, "www.")
        .when($"doc_id" % 4 === 1, "a.b.")
        .when($"doc_id" % 4 === 2, "").otherwise("sub.")
      val tld = when($"doc_id" % 3 === 0, ".com")
        .when($"doc_id" % 3 === 1, ".co.uk").otherwise(".com.au")
      val docs = tbl(s, dir, "documents").withColumn("url",
        concat(lit("https://"), sub, $"source", tld, lit("/doc/"), $"doc_id"))
      graft.text.Web.filterBlockedRegistrable(docs, $"url",
          Seq("src1.co.uk", "src3.com.au", "src5.com"))
        .select($"doc_id", graft.text.Web.domainOf($"url").as("domain"),
          graft.text.Web.registrableDomainOf($"url").as("registrable"))
        .orderBy($"doc_id")
    }),

    // Canonical URL normalization (the first, cheapest crawl-dedup tier):
    // planted URLs vary scheme case, www/sub labels, default vs explicit
    // ports, trailing slashes, tracking params, param order and
    // fragments; the oracle replays construction AND every normalization
    // rule with the same engine-portable regexes. Pure map-side.
    "q_web_urlnorm" -> ((s, dir) => {
      import s.implicits._
      val scheme = when($"doc_id" % 2 === 0, "HTTPS://").otherwise("http://")
      val sub = when($"doc_id" % 4 === 0, "WWW.")
        .when($"doc_id" % 4 === 1, "a.B.").otherwise("")
      val port = when($"doc_id" % 3 === 0, ":443")
        .when($"doc_id" % 3 === 1, ":8080").otherwise("")
      val pathTail = when($"doc_id" % 2 === 1, "/").otherwise("")
      val qs = when($"doc_id" % 4 === 0, "?utm_source=news&b=2&a=1")
        .when($"doc_id" % 4 === 1, "?gclid=99")
        .when($"doc_id" % 4 === 2, "?z=1&fbclid=abc&a=2&").otherwise("")
      val frag = when($"doc_id" % 5 === 0, "#Sec2").otherwise("")
      tbl(s, dir, "documents")
        .withColumn("url", concat(scheme, sub, $"source", lit(".com"), port,
          lit("/Doc/"), $"doc_id", pathTail, qs, frag))
        .select($"doc_id", $"url",
          graft.text.Web.normalizeUrl($"url").as("norm_url"))
        .orderBy($"doc_id")
    }),

    // HTML -> visible text (the step between crawl fetch and every
    // content heuristic): planted pages exercise script/style content
    // removal (including '<' inside code), comments, tag separators and
    // the entity decode chain; the oracle replays the same order-pinned
    // regex chain. Pure map-side.
    "q_web_htmltext" -> ((s, dir) => {
      import s.implicits._
      val stylePart = when($"doc_id" % 4 === 0,
        "<style>p { color: #fff; }</style>").otherwise("")
      val scriptPart = when($"doc_id" % 3 === 0,
        "<script type=\"text/javascript\">if (a<b && c>d) { alert('x'); }</script>")
        .otherwise("")
      val commentPart = when($"doc_id" % 5 === 0,
        "<!-- hidden <b>note</b> -->").otherwise("")
      val entities = when($"doc_id" % 2 === 0,
        " Fish &amp; Chips &lt;tm&gt; say &quot;hi&quot; it&#39;s a&nbsp;b")
        .otherwise("")
      tbl(s, dir, "documents")
        .withColumn("html", concat(
          lit("<html><head><title>Doc "), $"doc_id", lit("</title>"),
          stylePart, scriptPart, lit("</head>\n<body>"), commentPart,
          lit("<h1>Doc "), $"doc_id", lit("</h1>\n<p>"),
          substring($"text", 1, 120), lit("</p>"), entities,
          lit("</body></html>")))
        .select($"doc_id", graft.text.Web.htmlToText($"html").as("clean_text"))
        .orderBy($"doc_id")
    }),

    // Link-density boilerplate pruning (the jusText/trafilatura-class
    // heuristic): planted pages carry a nav bar, a "read more" promo row
    // and a footer — all mostly anchor text — around real prose; blocks
    // split at block-tag boundaries, each scored by token count and
    // anchor-token share (integer cross-multiplied gate). The oracle
    // replays the split, both text chains and the token arithmetic.
    "q_web_htmlblocks" -> ((s, dir) => {
      import s.implicits._
      val nav = "<nav><a href='/'>Home</a> <a href='/a'>About us</a> " +
        "<a href='/c'>Contact</a></nav>"
      val promo = "<div>Read more: <a href='/x'>click here now</a> and " +
        "<a href='/y'>subscribe to our newsletter</a></div>"
      val footer = "<footer><a href='/p'>Privacy policy</a> " +
        "<a href='/t'>Terms</a></footer>"
      val withHtml = tbl(s, dir, "documents")
        .withColumn("html", concat(
          lit("<html><body>" + nav), lit("<h1>Doc "), $"doc_id",
          lit("</h1><p>"), substring($"text", 1, 200), lit("</p>"),
          when($"doc_id" % 3 === 0, promo).otherwise(""),
          lit(footer + "</body></html>")))
      graft.text.Web.htmlBlocks(withHtml, $"doc_id", $"html",
          minTokens = 5, maxAnchorPct = 50)
        .orderBy($"doc_id", $"block_idx")
    }),

    // PageRank link centrality (the CommonCrawl-style crawl/keep signal)
    // over a deterministic doc_id-arithmetic link graph, 5 iterations.
    // Integer nano-rank arithmetic end to end (floor divisions, integer
    // sums) — the oracle replays all 5 iterations exactly, no float
    // accumulation anywhere.
    "q_web_pagerank" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val n = docs.count()
      val e = docs.select($"doc_id".as("src"), (($"doc_id" * 7 + 1) % n).as("dst"))
        .union(docs.select($"doc_id".as("src"), (($"doc_id" * 13 + 5) % n).as("dst")))
        .filter($"src" =!= $"dst")
      graft.ops.Graph.pageRank(e, $"src", $"dst", iters = 5)
        .select($"node", $"rank".as("rank_nano"))
        .orderBy($"node")
    }),

    // Language-ID heuristic distribution.
    "q_text_langid" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents")
        .select(graft.text.TextFunctions.langId($"text").as("lang_pred"))
        .groupBy($"lang_pred").agg(count(lit(1)).as("n"))
        .orderBy($"lang_pred")
    }),

    // Corpus-level term frequencies: explode tokens → count → top 50
    // (partial aggregation map-side; only (token, count) pairs shuffle).
    "q_text_topterms" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents")
        .select(explode(graft.text.TextFunctions.tokens($"text")).as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"tok")
        .limit(50)
    }),

    // Document fingerprinting (md5 of normalized text).
    "q_text_fingerprint" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents")
        .select($"doc_id", graft.text.TextFunctions.fingerprint($"text").as("fp"))
        .orderBy($"doc_id")
        .limit(200)
    }),

    // Exact dedup groups on a content-prefix hash key.
    "q_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      val key = md5(concat_ws(" ",
        slice(graft.text.TextFunctions.tokens($"text"), 1, 3)))
      tbl(s, dir, "documents")
        .groupBy(key.as("dup_key"))
        .agg(count(lit(1)).as("group_size"), min($"doc_id").as("keeper_id"))
        .filter($"group_size" > 1)
        .orderBy($"dup_key")
    }),

    // Exact n-gram Jaccard near-dup pairs (k=3, τ=0.5).
    "q_dedup_ngram" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.ngramJaccardPairs(
          tbl(s, dir, "documents"), $"doc_id", $"text", shingleK = 3, threshold = 0.5)
        .orderBy($"id_a", $"id_b")
    }),

    // Cross-source LEAKAGE matrix (data governance): per unordered source
    // pair, document pairs sharing verbatim content through the winnow
    // match join — the "does src A copy from src B" release review.
    // Oracle: the full winnow replay + source joins + least/greatest
    // grouping.
    "q_report_leakage" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Report.leakageMatrix(
          tbl(s, dir, "documents"), $"doc_id", $"text", $"source",
          k = 12, w = 8, minShared = 5L, maxDf = 40L)
        .orderBy($"source_a", $"source_b")
    }),

    // Phrase-blocklist audit (safety filtering): which banned phrases
    // each document contains, via ONE Aho-Corasick pass per doc over the
    // plan-literal phrase set — O(len + matches) however long the list,
    // where per-phrase contains() rescans the corpus N times. Substring
    // semantics == contains, so the oracle is a list_filter replay.
    "q_text_blocklist" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.blocklistMatches(
          tbl(s, dir, "documents"), $"doc_id", $"text",
          Seq("fast table", "scan slow", "batch window spark",
            "customer query", "value sort column"))
        // comparator-safe: the driver's pandas sort can't hash raw arrays
        .select($"doc_id", concat_ws("|", $"matched").as("matched"))
        .orderBy($"doc_id")
    }),

    // MOSS winnowing matches (Schleimer et al. 2003): document pairs
    // sharing >= 5 selected k-gram fingerprints after a max-df boilerplate
    // cull — the POSITIONAL substring-match signal (guaranteed for shared
    // runs >= k+w-1 chars) set-based shingles drop. md5-lower-64 gram
    // hashes make the whole selection DuckDB-replayable bit-for-bit.
    "q_text_winnow" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.winnowPairs(
          tbl(s, dir, "documents"), $"doc_id", $"text",
          k = 12, w = 8, minShared = 5L, maxDf = 40L)
        .orderBy($"id_a", $"id_b")
    }),

    // INCREMENTAL winnow dedup against the materialized fingerprint
    // table (the exact-substring twin of q_dedup_simhash_incremental):
    // even-id docs are winnow-indexed once; the odd-id batch selects only
    // its own fingerprints and equi-joins the stored table. Oracle: a
    // batch doc survives iff no corpus-half partner shares >= 5 distinct
    // fingerprints over the bit-exact md5 winnow replay.
    "q_text_winnow_incremental" -> ((s, dir) => {
      import s.implicits._
      val batch = tbl(s, dir, "documents").filter($"doc_id" % 2 === 1)
      graft.text.TextFunctions.dedupAgainstWinnowIndex(s, batch,
          $"doc_id", $"text", winnowIndexDir(s, dir),
          k = 12, w = 8, minShared = 5L)
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    // Edit-distance similarity self-join (record linkage / fuzzy entity
    // matching): all customer-name pairs within levenshtein 1 via
    // symmetric-delete blocking (exact recall, no cross join). Oracle:
    // exact cross-join levenshtein.
    "q_dedup_editdist" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.editDistancePairs(
          tbl(s, dir, "customer"), $"c_custkey", $"c_name", maxDist = 1)
        .orderBy($"id_a", $"id_b")
    }),

    // INCREMENTAL record linkage against the materialized edit-distance
    // index (streaming entity resolution): even-id customers' deletion
    // variants are indexed once; the odd-id batch generates only its own
    // neighborhood and equi-joins the stored variants, then levenshtein
    // verifies. Oracle: exact cross-half levenshtein join.
    "q_dedup_editdist_incremental" -> ((s, dir) => {
      import s.implicits._
      val batch = tbl(s, dir, "customer").filter($"c_custkey" % 2 === 1)
      graft.dedup.Dedup.matchAgainstEditDistanceIndex(s, batch,
          $"c_custkey", $"c_name", editDistIndexDir(s, dir), maxDist = 1)
        .orderBy($"id", $"corpus_id")
    }),

    // Spell correction against a corpus-derived vocabulary: per mutated
    // part-name token the closest dictionary word within levenshtein 1
    // (ties by match asc); the exploded dictionary broadcasts so the
    // query side never shuffles. Oracle: exact cross-join + window rank.
    "q_text_spellcorrect" -> ((s, dir) => {
      import s.implicits._
      val p = tbl(s, dir, "part")
      val dict = p.select(explode(split($"p_name", " ")).as("w"))
      val qs = p.select($"p_partkey".as("qid"),
        expr("substr(element_at(split(p_name, ' '), 1), 1, 1) || " +
          "substr(element_at(split(p_name, ' '), 1), 3)").as("q"))
      graft.dedup.Dedup.spellCorrect(qs, $"qid", $"q", dict, $"w", maxDist = 1)
        .orderBy($"id")
    }),

    // Directed containment pairs (excerpt / quote / truncated-copy
    // detection): C(A→B) = |sh(A)∩sh(B)| / |sh(A)| ≥ 0.7 via the LOSSLESS
    // prefix-filter join (PPJoin family) — the asymmetric signal Jaccard
    // LSH can't see. Oracle: exact cross-join containment.
    "q_dedup_containment" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.containmentPairs(
          tbl(s, dir, "documents"), $"doc_id", $"text", shingleK = 3, threshold = 0.7)
        .orderBy($"id_a", $"id_b")
    }),

    // MinHash+LSH near-dup pairs — same planted duplicates, banded join
    // (no cross join). Oracle: the exact-Jaccard pair SET (id_a, id_b);
    // est_jaccard is signature-estimated so only pair identity is
    // oracle-checkable.
    "q_dedup_minhash" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.minhashPairs(
          tbl(s, dir, "documents"), $"doc_id", $"text",
          numHashes = 64, bands = 16, shingleK = 3, threshold = 0.5)
        .select($"id_a", $"id_b")
        .orderBy($"id_a", $"id_b")
    }),

    // INCREMENTAL dedup against the materialized MinHash index: the
    // even-id half of documents is indexed once (signatures + band keys
    // stored); the odd-id half arrives as a new batch that computes only
    // its own signatures and joins the stored bands. Oracle: a batch doc
    // survives iff it has no exact-Jaccard >= 0.5 partner in the corpus
    // half (the same est==exact pair-set equivalence q_dedup_minhash
    // rests on, restricted to cross-half pairs).
    "q_dedup_incremental" -> ((s, dir) => {
      import s.implicits._
      val batch = tbl(s, dir, "documents").filter($"doc_id" % 2 === 1)
      graft.dedup.Dedup.dedupAgainstIndex(s, batch, $"doc_id", $"text",
          minhashIndexDir(s, dir),
          numHashes = 64, bands = 16, shingleK = 3, threshold = 0.5)
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    // Near-duplicate clusters: LSH pairs → exact-Jaccard verify →
    // connected components (the shape corpus dedup actually ships).
    // `members` is emitted as a comma-joined string (numeric order kept):
    // the driver's comparison hashes scalar cells, not arrays.
    "q_dedup_clusters" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.duplicateClusters(
          tbl(s, dir, "documents"), $"doc_id", $"text", shingleK = 3, threshold = 0.5)
        .withColumn("members",
          array_join(expr("transform(members, x -> cast(x as string))"), ","))
        .orderBy($"cluster_id")
    }),

    // PII redaction: emails / IPv4 / phone numbers masked by an engine-
    // portable regex chain. PII is planted per-doc so the oracle checks
    // every mask actually fires on varying inputs.
    "q_text_redact" -> ((s, dir) => {
      import s.implicits._
      val planted = concat(
        substring($"text", 1, 80),
        lit(" contact user"), $"doc_id", lit("@example.com or 10.0."),
        $"doc_id" % 256, lit(".7 call 555-123-4567"))
      tbl(s, dir, "documents")
        .select($"doc_id", graft.text.TextFunctions.redactPii(planted).as("redacted"))
        .orderBy($"doc_id")
        .limit(300)
    }),

    // Per-document 2-gram repetition ratio (boilerplate signal).
    "q_text_repetition" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.repetitionStats(
          tbl(s, dir, "documents"), $"doc_id", $"text", k = 2)
        .orderBy($"doc_id")
    }),

    // End-to-end curation pipeline — the composition a training-data run
    // actually ships: quality + language gate → exact content dedup
    // (md5 fingerprint, keep smallest id) → deterministic stratified
    // sample per source. Every stage is one of this engine's operators.
    "q_pipeline_curate" -> ((s, dir) => {
      import s.implicits._
      val t = graft.text.TextFunctions
      val scored = tbl(s, dir, "documents")
        .select($"doc_id", $"source",
          t.qualityScore($"text").as("quality"),
          t.langId($"text").as("lang_pred"),
          t.fingerprint($"text").as("fp"))
        .filter($"quality" >= 0.5 && $"lang_pred".isin("en", "und"))
      val deduped = graft.dedup.Dedup.dedupExact(scored, $"fp", $"doc_id")
      graft.ops.Sampling.stratifiedSample(
          deduped, $"source", $"doc_id", n = 10, salt = "cur")
        .select($"doc_id", $"source", $"quality")
        .orderBy($"doc_id")
    }),

    // Inverted index: (term, chunk) → bounded posting chunk, with the
    // per-term doc_freq total re-attached; chunkSize 100 so the sf0.01
    // corpus genuinely splits terms across chunks. Postings emitted as
    // size + first/last ids (driver compare hashes scalar cells only).
    "q_text_invindex" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.invertedIndex(
          tbl(s, dir, "documents"), $"doc_id", $"text", chunkSize = 100)
        .select($"term", $"chunk_idx", $"doc_freq",
          size($"postings").as("chunk_docs"),
          element_at($"postings", 1).as("first_doc"),
          element_at($"postings", -1).as("last_doc"))
        .orderBy($"term", $"chunk_idx")
    }),

    // Conjunctive keyword search by posting intersection.
    "q_text_search" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.searchAll(
          tbl(s, dir, "documents"), $"doc_id", $"text", Seq("spark", "window"))
        .orderBy($"doc_id")
    }),

    // The same conjunctive search served from the MATERIALIZED index
    // (built incrementally: even half built, odd half appended) — the
    // corpus text is never read at query time; term-IN row-group pruning
    // reads only the probed posting lists. Shares q_text_search's oracle.
    "q_text_search_indexed" -> ((s, dir) => {
      import s.implicits._
      graft.text.SearchIndex.searchIndexAll(
          s, searchIndexDir(s, dir), Seq("spark", "window"))
        .orderBy($"doc_id")
    }),

    // Deterministic train/val/test split by salted-hash range.
    "q_sample_split" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sampling.assignSplit(
          tbl(s, dir, "documents"), $"doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), salt = "s3")
        .select($"doc_id", $"source", $"split")
        .orderBy($"doc_id")
    }),

    // Corpus-level boilerplate segment removal (line-dedup shape): drop
    // 2-token segments occurring in >= 20 distinct docs; the frequent-
    // segment lexicon is aggregated once and the corpus side is cleaned
    // in a pure map-side projection (no shuffle of the documents).
    "q_text_segdedup" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.dedupSegments(
          tbl(s, dir, "documents"), $"doc_id", $"text", k = 2, minDocs = 20)
        .orderBy($"doc_id")
    }),

    // Sliding-window chunking (size 32, stride 16): the context-window
    // prep step before embedding/packing; pure map-side explode.
    "q_text_chunks" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.chunkDocs(
          tbl(s, dir, "documents"), $"doc_id", $"text", k = 32, stride = 16)
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // Okapi BM25 ranking for a two-term query (identical double
    // arithmetic on both engines; 4dp round).
    "q_text_bm25" -> ((s, dir) => {
      import s.implicits._
      graft.text.Tfidf.bm25(
          tbl(s, dir, "documents"), $"doc_id", $"text", Seq("spark", "window"))
        .orderBy($"doc_id")
    }),

    // BM25 served from the materialized search index: stored tf/len
    // tables through the SAME scoring body (Tfidf.bm25From) — bit-
    // identical to the from-scratch run, including after the odd-half
    // append. Shares q_text_bm25's oracle.
    "q_text_bm25_indexed" -> ((s, dir) => {
      import s.implicits._
      graft.text.SearchIndex.bm25Index(
          s, searchIndexDir(s, dir), Seq("spark", "window"))
        .orderBy($"doc_id")
    }),

    // Per-document token-distribution entropy (diversity/boilerplate
    // signal): c·ln(c) quantized to integer micro-nats before the
    // per-doc sum, integer division — exact integer arithmetic in every
    // cross-row reduction, replayed by the oracle.
    "q_text_entropy" -> ((s, dir) => {
      import s.implicits._
      graft.text.Tfidf.tokenEntropy(tbl(s, dir, "documents"), $"doc_id", $"text")
        .orderBy($"doc_id")
    }),

    // Trigram-index substring search (the pg_trgm shape): the corpus's
    // distinct character trigrams land as two chunked posting segments
    // (even/odd halves — the append path), then a cross-word pattern is
    // served index-first: posting reads pruned to the pattern's grams,
    // all-gram intersection candidates, exact contains verify over ONLY
    // candidate corpus rows. Verify makes it exact, so the oracle is
    // the brute substring scan — a blocking false-negative would
    // surface as a missing row.
    "q_text_trgm" -> ((s, dir) => {
      import s.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/trgm_index"
      val fs = new org.apache.hadoop.fs.Path(td)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(td), true)
      val docs = tbl(s, dir, "documents")
      graft.text.Trigram.appendSegment(
        docs.filter($"doc_id" % 2 === 0), $"doc_id", $"text", td, "b0")
      graft.text.Trigram.appendSegment(
        docs.filter($"doc_id" % 2 === 1), $"doc_id", $"text", td, "b1")
      graft.text.Trigram.searchSubstring(s, td, docs, $"doc_id", $"text",
          pattern = "spark wind")
        .orderBy($"doc_id")
    }),

    // ORACLE-PORTABLE approximate profile: per-column rows/nulls plus a
    // distinct estimate whose arithmetic replays in SQL (the portable
    // per-group HLL) — the wide-table profiling path, now value-gated
    // where approx_count_distinct's opaque sketch couldn't be.
    "q_profile_portable" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Profile.profilePortable(tbl(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderpriority", "o_orderdate"), p = 10)
        .orderBy($"col")
    }),

    // Distributed per-group approx-distinct over the SAME portable HLL:
    // per-(source, register) fold, then a per-group harmonic sum in
    // EXACT integer arithmetic (2^-rank scaled to 2^(48-rank) BIGINTs),
    // linear-counting correction — the estimate itself replays in SQL,
    // which approx_count_distinct's opaque sketch cannot.
    "q_text_hll_group" -> ((s, dir) => {
      import s.implicits._
      val toks = tbl(s, dir, "documents")
        .select($"source",
          explode(graft.text.TextFunctions.tokens($"text")).as("term"))
      graft.ops.Hll.approxDistinctByGroup(toks, $"source", $"term", p = 7)
        .select($"group".as("grp"), $"v_zero", $"t_scaled", $"est")
        .orderBy($"grp")
    }),

    // Engine-portable HyperLogLog sketch over the document vocabulary:
    // the register table (top-10-bit register, leading-zero rank via
    // OR-smear + bit_count — pure integer ops) IS the output, replayed
    // bit-for-bit by the oracle; ≤1024 rows from one map-side-combined
    // shuffle however large the corpus. (The estimate arithmetic is
    // unit-tested against exact distincts — HllSpec.)
    "q_text_hll" -> ((s, dir) => {
      import s.implicits._
      val toks = tbl(s, dir, "documents")
        .select(explode(graft.text.TextFunctions.tokens($"text")).as("term"))
      graft.ops.Hll.hllRegisters(toks, $"term", p = 10)
        .orderBy($"register")
    }),

    // Robust JSON ingest with quarantine routing: the event payloads
    // with a deterministic slice corrupted in-flight (truncation —
    // every 7th row), parsed under a target schema in ONE map-side
    // from_json projection. Good rows surface parsed, malformed rows
    // flag quarantined=true — no job failure, no silent drop.
    "q_ingest_quarantine" -> ((s, dir) => {
      import s.implicits._
      val ev = eventsTbl(s, dir).select($"event_id",
        when($"event_id" % 7 === 3,
            expr("substring(props, 1, length(props)-2)"))
          .otherwise($"props").as("payload"))
      graft.ops.Ingest.parseJsonTagged(ev, $"payload",
          new org.apache.spark.sql.types.StructType()
            .add("k", org.apache.spark.sql.types.IntegerType))
        .select($"event_id", $"k", $"quarantined")
        .orderBy($"event_id")
    }),

    // CSV twin of the quarantine ingest: positional lines with a
    // deterministic slice's INT field corrupted; type failure routes
    // the row, the independently-parsed second field survives.
    "q_ingest_csv" -> ((s, dir) => {
      import s.implicits._
      val lines = tbl(s, dir, "orders").select($"o_orderkey",
        when($"o_orderkey" % 11 === 5,
            concat(lit("xx,"), $"o_orderstatus"))
          .otherwise(concat($"o_orderkey".cast("string"), lit(","),
            $"o_orderstatus")).as("line"))
      graft.ops.Ingest.parseCsvTagged(lines, $"line",
          new org.apache.spark.sql.types.StructType()
            .add("k", org.apache.spark.sql.types.IntegerType)
            .add("status", org.apache.spark.sql.types.StringType))
        .select($"o_orderkey", $"k", $"status", $"quarantined")
        .orderBy($"o_orderkey")
    }),

    // Count-min sketch point-frequency probes: all document tokens fold
    // into a 4×512 cell grid (ONE map-side-combined shuffle of ≤2048
    // rows regardless of corpus size or token skew — the mergeable,
    // persistable frequency summary), then fixed query terms probe the
    // broadcast cells. est = min over rows, never under the true count.
    "q_text_cms" -> ((s, dir) => {
      import s.implicits._
      val toks = tbl(s, dir, "documents")
        .select(explode(graft.text.TextFunctions.tokens($"text")).as("term"))
      val cells = graft.ops.Cms.countMinCells(toks, $"term",
        depth = 4, width = 512)
      graft.ops.Cms.estimateCounts(cells,
          Seq("spark", "window", "data", "the", "graftabsent").toDF("term"),
          $"term", depth = 4, width = 512)
        .withColumnRenamed("item", "term")
        .orderBy($"term")
    }),

    // Heavy-hitter sweep through the same sketch: every distinct token
    // whose CMS estimate reaches the threshold — a guaranteed SUPERSET
    // of the true heavy vocabulary (est never underestimates), with
    // width bounding false positives.
    "q_text_cms_heavy" -> ((s, dir) => {
      import s.implicits._
      val toks = tbl(s, dir, "documents")
        .select(explode(graft.text.TextFunctions.tokens($"text")).as("term"))
      graft.ops.Cms.heavyHitters(toks, $"term", depth = 4, width = 512,
          minCount = 200L)
        .withColumnRenamed("item", "term")
        .orderBy($"term")
    }),

    // Hybrid lexical+vector retrieval: BM25 candidates for a two-term
    // query and cosine candidates for a probe vector (each top-20 via
    // distributed TakeOrdered), fused by reciprocal-rank fusion to the
    // final top-10. Ranks assign over the ROUNDED scores with id
    // tie-breaks and the fused order uses the ROUNDED rrf, so the
    // oracle replays ranking and fusion exactly.
    "q_hybrid_retrieve" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val q = emb.orderBy($"vec_id").limit(1).select($"embedding")
        .head.getSeq[Float](0).map(_.toDouble)
      graft.text.Hybrid.hybridRetrieve(
          tbl(s, dir, "documents"), $"doc_id", $"text",
          emb, $"vec_id", $"embedding",
          terms = Seq("spark", "window"), queryVec = q,
          nCandidates = 20, k = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy($"rrf".desc, $"doc_id")
    }),

    // Per-(doc, term) TF-IDF over a bounded corpus slice; tf/df are
    // integers, the score rounds at the cross-engine double noise floor.
    // Unigram LM quality scoring (the CCNet-style perplexity filter):
    // average negative log-likelihood per document under the corpus's
    // own unigram distribution. Per-term logprobs are quantized to
    // integer micro-nats BEFORE the per-doc sum, so the only cross-row
    // reduction is exact integer arithmetic on both engines.
    // Hash only integer-exact columns: nll_micro and avg_nll_micro are
    // pure integer arithmetic downstream of the micro-nat quantization
    // (the convenience double avg_nll is dropped — Spark and DuckDB
    // round(double, 4) can disagree on shortest-repr vs binary HALF_UP).
    "q_text_perplexity" -> ((s, dir) => {
      import s.implicits._
      graft.text.Tfidf.unigramNll(tbl(s, dir, "documents"), $"doc_id", $"text")
        .select($"doc_id", $"n_tokens", $"nll_micro", $"avg_nll_micro")
        .orderBy($"doc_id")
    }),

    // Percentile-band perplexity filter (CCNet keep-the-middle by RANK,
    // self-calibrating — no per-corpus threshold tuning): keep docs whose
    // exclusive-rank position over avg_nll_micro lies in [20%, 80%).
    // Ties share a position (membership is a function of the score
    // value), the band test is exact integer arithmetic, and the
    // cumulative window runs over DISTINCT quantized scores only.
    "q_text_band" -> ((s, dir) => {
      import s.implicits._
      val nll = graft.text.Tfidf.unigramNll(
          tbl(s, dir, "documents"), $"doc_id", $"text")
        .select($"doc_id", $"avg_nll_micro")
      graft.ops.Sampling.filterByScoreBand(nll, $"avg_nll_micro", 20, 80)
        .orderBy($"doc_id")
    }),

    // DSIR importance weights (Xie et al. 2023): every document scored by
    // ln p_target/p_raw under hashed unigram+bigram models (1024 buckets,
    // add-one smoothing), target = the English slice of the corpus. Each
    // bucket logprob quantizes to integer micro-nats before the integer
    // dot product, and the bucket hash is md5_number_lower % B — both
    // replayable bit-for-bit by the oracle.
    "q_text_dsir" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Dsir.importanceWeights(
          docs, docs.filter($"lang" === "en"), $"doc_id", $"text",
          buckets = 1024)
        .orderBy($"doc_id")
    }),

    // The DSIR selection step: top-100 most-target-like documents by
    // (logw_micro desc, doc_id) — deterministic membership the oracle
    // replays with a window rank.
    "q_text_dsir_select" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Dsir.selectByImportance(
          docs, docs.filter($"lang" === "en"), $"doc_id", $"text",
          k = 100, buckets = 1024)
        .orderBy($"doc_id")
    }),

    // Corpus-distance diagnostic: KL(target ‖ raw) over the smoothed
    // hashed-feature bucket models — one exact-integer numerator row
    // covering the full smoothed bucket space (observed union + the
    // closed-form never-seen term).
    "q_text_kl" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Dsir.klDivergence(
        docs, docs.filter($"lang" === "en"), $"doc_id", $"text",
        buckets = 1024)
    }),

    // The paper's actual sampler: Gumbel-top-k importance RESAMPLING
    // (P ∝ w, without replacement) with deterministic salted-md5 Gumbel
    // noise quantized to micro-units — membership replays on any engine.
    "q_text_dsir_resample" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Dsir.resampleByImportance(
          docs, docs.filter($"lang" === "en"), $"doc_id", $"text",
          k = 100, salt = "dsir1", buckets = 1024)
        .orderBy($"doc_id")
    }),

    // Trained quality classifier (the WebText/GPT-3-style LR filter):
    // 3 full-batch GD steps of logistic regression over hashed
    // unigram+bigram buckets, positives = the English slice, then every
    // document scored by its integer margin. Weights live in integer
    // micro-units, residuals quantize before the gradient sums, updates
    // divide by truncation (Java / = DuckDB //) — the oracle replays all
    // 3 unrolled iterations.
    "q_text_quality_lr" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      // shared featurization: fit + score read one tf table (see curate5).
      // NULL-safe labels: the oracle labels every non-'en' doc (NULL lang
      // included) as the negative class — when(=== 'en') sends NULL to
      // the otherwise(0) branch, the same partition
      val tfAll = graft.text.Dsir.featureTf(
          docs, $"doc_id", $"text", buckets = 1024)
        .localCheckpoint(eager = false)
      val labels = docs.select($"doc_id",
        when($"lang" === "en", 1L).otherwise(0L).as("y"))
      val model = graft.text.LogReg.fitOnTf(labels, tfAll,
        buckets = 1024, iters = 3, etaMilli = 500)
      graft.text.LogReg.scoreOnTf(docs.select($"doc_id"), tfAll, model)
        .orderBy($"doc_id")
    }),

    // Bigram conditional LM (contextual perplexity filter): avg
    // -ln P(w2|w1) per doc under the corpus's own bigram distribution,
    // integer micro-nats before the per-doc sum — same portability
    // discipline as q_text_perplexity, one model row per corpus bigram.
    "q_text_bigramlm" -> ((s, dir) => {
      import s.implicits._
      graft.text.Tfidf.bigramNll(tbl(s, dir, "documents"), $"doc_id", $"text")
        .orderBy($"doc_id")
    }),

    "q_text_tfidf" -> ((s, dir) => {
      import s.implicits._
      graft.text.Tfidf.tfidf(
          tbl(s, dir, "documents").filter($"doc_id" < 50), $"doc_id", $"text")
        .orderBy($"doc_id", $"term")
    }),

    // Deterministic stratified sampling: exactly 10 docs per source,
    // ranked by salted md5 of the id — reproducible on any engine, so
    // the oracle checks the SAMPLE MEMBERSHIP value-for-value.
    "q_sample_stratified" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sampling.stratifiedSample(
          tbl(s, dir, "documents"), $"source", $"doc_id", n = 10, salt = "s1")
        .select($"doc_id", $"lang", $"source", $"n_chars")
        .orderBy($"doc_id")
    }),

    // Deterministic hash-fraction sampling (map-side, no shuffle):
    // keep iff md5-prefix < fraction of the 32-bit space.
    "q_sample_hash" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sampling.hashSample(
          tbl(s, dir, "documents"), $"doc_id", fraction = 0.25, salt = "s2")
        .select($"doc_id", $"source")
        .orderBy($"doc_id")
    }),

    // Domain-mixing sampling: per-language keep fractions compiled into
    // one map-side CASE filter (en half, zh quarter, rest 10%).
    "q_sample_weighted" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sampling.weightedHashSample(
          tbl(s, dir, "documents"), $"doc_id", $"lang",
          fractions = Map("en" -> 0.5, "zh" -> 0.25),
          defaultFraction = 0.1, salt = "s3")
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }),

    // Corpus mixing to target composition: 50/25/25 over three sources at
    // a 150-row budget forces src0 through 3 replication epochs and the
    // others through fractional downsampling — the oracle re-derives
    // counts, targets, epochs, and thresholds from scratch in SQL.
    "q_sample_mix" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sampling.mixCorpus(
          tbl(s, dir, "documents"), $"doc_id", $"source",
          weights = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25),
          totalRows = 150L, allowUpsample = true, salt = "mix")
        .select($"doc_id", $"source", $"epoch")
        .orderBy($"doc_id", $"epoch")
    }),

    // Temperature mixing at tau = 2: per-language weights derived as
    // sqrt(n_i), flattening the en-dominant skew. Every plan quantity is
    // exact integer arithmetic (milli-sqrt, 128-bit products), so the
    // oracle replays membership bit-for-bit in HUGEINT.
    "q_sample_temperature" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sampling.mixCorpusTemperature(
          tbl(s, dir, "documents"), $"doc_id", $"lang",
          sources = Seq("de", "en", "es", "fr", "zh"), salt = "s5")
        .select($"doc_id", $"lang", $"epoch")
        .orderBy($"doc_id")
    }),

    // Sequence packing: per-source prefix-sum token batching at a 2000-
    // token budget — the pack assignment is a pure window computation the
    // oracle replays exactly.
    // Keyed-table MERGE with partition-level rewrite: base = docs with
    // doc_id % 7 != 3 (score = n_chars), updates = docs with doc_id % 5
    // == 0 at score × 10 — replacements AND inserts in one delta; only
    // the buckets holding updated keys are read or rewritten (the
    // incremental-update story for a 100 TB mutable corpus table). The
    // table is rebuilt fresh each invocation so reruns stay
    // deterministic; the oracle replays the merge as updates ∪
    // (base ∖ updated-keys).
    "q_upsert_keyed" -> ((s, dir) => {
      import s.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/upsert_keyed"
      val docs = tbl(s, dir, "documents")
      graft.ops.Upsert.writeKeyedTable(
        docs.filter($"doc_id" % 7 =!= 3)
          .select($"doc_id", $"source", $"n_chars".as("score")),
        key = "doc_id", dir = td, numBuckets = 16, mode = "overwrite")
      graft.ops.Upsert.upsertByKey(s, td,
        docs.filter($"doc_id" % 5 === 0)
          .select($"doc_id", $"source", ($"n_chars" * 10).as("score")),
        key = "doc_id", numBuckets = 16)
      graft.ops.Upsert.readKeyedTable(s, td).orderBy($"doc_id")
    }),

    // The SQL MERGE surface: the same keyed merge spelled as
    // `MERGE INTO PARQUET '<path>' USING (<query>) ON KEY doc_id` —
    // parsed by GraftSqlParser (dispatch via spark.sql is pinned in
    // SqlDdlSpec; this session has no parser extension, so the parsed
    // command plan executes directly), bucket count derived from the
    // pinned _index_spec, stats row returned, oracle = the merge replay.
    "q_upsert_sql" -> ((s, dir) => {
      import s.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/upsert_sql"
      val docs = tbl(s, dir, "documents")
      graft.ops.Upsert.writeKeyedTable(
        docs.filter($"doc_id" % 7 =!= 3)
          .select($"doc_id", $"source", $"n_chars".as("score")),
        key = "doc_id", dir = td, numBuckets = 16, mode = "overwrite")
      docs.createOrReplaceTempView("graft_merge_docs")
      val mergeSql =
        s"""MERGE INTO PARQUET '$td' USING (
           |  SELECT doc_id, source, n_chars * 10 AS score
           |  FROM graft_merge_docs WHERE doc_id % 5 = 0
           |) ON KEY doc_id""".stripMargin
      val plan = graft.index.GraftSqlParser.parseGraftPlan(mergeSql).getOrElse(
        throw new IllegalStateException(s"graft MERGE failed to parse: $mergeSql"))
      org.apache.spark.sql.graft.SparkInternals.runPlan(s, plan).collect()
      graft.ops.Upsert.readKeyedTable(s, td).orderBy($"doc_id")
    }),

    // The MERGE ∘ INDEX composition, hook-driven: same merge as
    // q_upsert_keyed but the table carries an index and
    // refreshAfterMaintenance=true makes the upsert refresh it inside its
    // own table lock — the result is read back THROUGH the index (stale
    // listing would fail loudly on the rewritten buckets), and the oracle
    // is the plain merge replay, so freshness is value-gated.
    "q_upsert_indexed" -> ((s, dir) => {
      import s.implicits._
      import graft.index.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/upsert_indexed"
      val docs = tbl(s, dir, "documents")
      graft.ops.Upsert.writeKeyedTable(
        docs.filter($"doc_id" % 7 =!= 3)
          .select($"doc_id", $"source", $"n_chars".as("score")),
        key = "doc_id", dir = td, numBuckets = 16, mode = "overwrite")
      // same metastore the scratch tables use (standalone runs would
      // otherwise default to a stray ./index_metastore); stats-only index
      // (no sketch scan) — the gate proves freshness through the hook,
      // and min/max stats alone drive the listing
      s.conf.set(graft.index.IndexConf.MetastoreLocation,
        s"$scratchRoot/${new java.io.File(dir).getName}/metastore")
      s.index.create.mode("overwrite")
        .option(graft.index.IndexConf.FilterEnabled, "false")
        .indexBy("doc_id").parquet(td)
      val prev = s.conf.getOption(graft.index.IndexConf.RefreshAfterMaintenance)
      s.conf.set(graft.index.IndexConf.RefreshAfterMaintenance, "true")
      try {
        graft.ops.Upsert.upsertByKey(s, td,
          docs.filter($"doc_id" % 5 === 0)
            .select($"doc_id", $"source", ($"n_chars" * 10).as("score")),
          key = "doc_id", numBuckets = 16)
      } finally prev match {
        case Some(v) => s.conf.set(graft.index.IndexConf.RefreshAfterMaintenance, v)
        case None => s.conf.unset(graft.index.IndexConf.RefreshAfterMaintenance)
      }
      s.index.parquet(td).select($"doc_id", $"source", $"score")
        .orderBy($"doc_id")
    }),

    // Layout MIGRATION mid-lifecycle: build at 4 buckets, REBUCKET to
    // 16 (the paid-once full rewrite for a table that outgrew its pin —
    // the spec guard refuses every cheaper path), then a normal
    // delta-proportional merge under the NEW layout. Values must be
    // indistinguishable from never having migrated, so the oracle is
    // the plain upsert replay.
    "q_upsert_rebucket" -> ((s, dir) => {
      import s.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/upsert_rebucket"
      val docs = tbl(s, dir, "documents")
      graft.ops.Upsert.writeKeyedTable(
        docs.filter($"doc_id" % 7 =!= 3)
          .select($"doc_id", $"source", $"n_chars".as("score")),
        key = "doc_id", dir = td, numBuckets = 4, mode = "overwrite")
      graft.ops.Upsert.rebucketKeyedTable(s, td, key = "doc_id",
        oldBuckets = 4, newBuckets = 16)
      graft.ops.Upsert.upsertByKey(s, td,
        docs.filter($"doc_id" % 5 === 0)
          .select($"doc_id", $"source", ($"n_chars" * 10).as("score")),
        key = "doc_id", numBuckets = 16)
      graft.ops.Upsert.readKeyedTable(s, td).orderBy($"doc_id")
    }),

    // Keyed-table DELETE (the GDPR/takedown path): same delta-
    // proportional cost as the merge — only buckets holding requested
    // keys are read/rewritten, and a bucket emptied by the delete is
    // dropped explicitly (dynamic overwrite alone would leave its old
    // files). Requested keys absent from the table are a no-op.
    "q_delete_keyed" -> ((s, dir) => {
      import s.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/delete_keyed"
      val docs = tbl(s, dir, "documents")
      graft.ops.Upsert.writeKeyedTable(
        docs.select($"doc_id", $"source", $"n_chars"),
        key = "doc_id", dir = td, numBuckets = 16, mode = "overwrite")
      graft.ops.Upsert.deleteByKey(s, td,
        docs.filter($"doc_id" % 6 === 1).select($"doc_id")
          .union(docs.limit(3).select($"doc_id" + 1000000L)),
        key = "doc_id", numBuckets = 16)
      graft.ops.Upsert.readKeyedTable(s, td).orderBy($"doc_id")
    }),

    // SCD Type-2 history from the event change log: each user's
    // event_type state versioned with validity intervals. One key
    // shuffle folds the whole log (change collapse + interval close +
    // versions share a single Exchange/Sort); same-instant collisions
    // resolved by event_id (last wins). Intervals surface as epoch
    // micros — exact integers on both engines.
    "q_scd2" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Scd2.fromChangeLog(eventsTbl(s, dir), "user_id", "ts",
          Seq("event_type"), tieBreaks = Seq("event_id"))
        .select($"user_id", $"event_type",
          unix_micros($"valid_from").as("valid_from_us"),
          unix_micros($"valid_to").as("valid_to_us"),
          $"version".cast("long").as("version"), $"is_current")
        .orderBy($"user_id", $"version")
    }),

    // Interval-interval OVERLAP join (session-concurrency primitive):
    // per-user daily activity spans, pairs of users concurrently active
    // on the same day. Both sides explode to hour buckets and meet in
    // an equi-join on (day, bucket) — no cross join; the first-shared-
    // bucket gate emits each pair exactly once with no dedup pass.
    "q_interval_join" -> ((s, dir) => {
      import s.implicits._
      val spans = eventsTbl(s, dir)
        .filter($"user_id" < 12)
        .groupBy($"user_id", to_date($"ts").as("day"))
        .agg(unix_micros(min($"ts")).as("lo"), unix_micros(max($"ts")).as("hi"))
      val lft = spans.select($"user_id".as("user_a"), $"day".as("day_a"),
        $"lo".as("lo_a"), $"hi".as("hi_a"))
      val rgt = spans.select($"user_id".as("user_b"), $"day".as("day_b"),
        $"lo".as("lo_b"), $"hi".as("hi_b"))
      graft.ops.Temporal.intervalOverlapJoin(
          lft, "lo_a", "hi_a", rgt, "lo_b", "hi_b",
          bucketWidth = 3600L * 1000000L, keys = Some(("day_a", "day_b")))
        .filter($"user_a" < $"user_b")
        .select(date_format($"day_a", "yyyy-MM-dd").as("day"),
          $"user_a", $"user_b",
          (least($"hi_a", $"hi_b") - greatest($"lo_a", $"lo_b")).as("overlap_us"))
        .orderBy($"day", $"user_a", $"user_b")
    }),

    // Point-in-time SNAPSHOT: the whole dimension "as of" one instant
    // (training-set reproduction) — the interval filter over the fold.
    "q_scd2_asof" -> ((s, dir) => {
      import s.implicits._
      val hist = graft.ops.Scd2.fromChangeLog(eventsTbl(s, dir), "user_id",
        "ts", Seq("event_type"), tieBreaks = Seq("event_id"))
      graft.ops.Scd2.asOf(hist, lit("2024-01-15 00:00:00").cast("timestamp"))
        .select($"user_id", $"event_type",
          unix_micros($"valid_from").as("valid_from_us"))
        .orderBy($"user_id")
    }),

    // Point-in-time SCD-2 lookup — the classic consumer: every event
    // enriched with its user's STATE VERSION valid at that event's
    // instant (as-of join on valid_from: one key shuffle, no join
    // node). The oracle replays the history fold plus a per-event
    // latest-version-at-or-before pick.
    "q_scd2_lookup" -> ((s, dir) => {
      import s.implicits._
      val ev = eventsTbl(s, dir)
      val hist = graft.ops.Scd2.fromChangeLog(ev, "user_id", "ts",
        Seq("event_type"), tieBreaks = Seq("event_id"))
      graft.ops.Scd2.lookupAsOf(
          ev.select($"event_id", $"user_id", $"ts"), "user_id", "ts",
          hist, "user_id", Seq("event_type"))
        .select($"event_id", $"user_id", $"state_event_type")
        .orderBy($"event_id")
    }),

    // Incremental SCD-2: the same history built by three TIME-RANGED
    // keyed MERGE batches into a bucket-partitioned table (per-batch
    // cost ∝ touched buckets — the CDC-to-history path at 100 TB). For
    // in-order batches, batch-by-batch merging is definitionally
    // equivalent to the one-shot fold (see mergeChanges's late-data
    // contract), so the oracle replays the FULL log — a value-level
    // check that the incremental path converges to the batch answer.
    "q_scd2_merge" -> ((s, dir) => {
      import s.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/scd2_merge"
      val ev = eventsTbl(s, dir)
      graft.ops.Scd2.writeHistory(spark = s,
        changes = ev.filter($"ts" < "2024-01-11"),
        key = "user_id", ts = "ts", attrs = Seq("event_type"), dir = td,
        numBuckets = 16, tieBreaks = Seq("event_id"), mode = "overwrite")
      graft.ops.Scd2.mergeChanges(s, td,
        ev.filter($"ts" >= "2024-01-11" && $"ts" < "2024-01-21"),
        key = "user_id", ts = "ts", attrs = Seq("event_type"),
        numBuckets = 16, tieBreaks = Seq("event_id"))
      graft.ops.Scd2.mergeChanges(s, td,
        ev.filter($"ts" >= "2024-01-21"),
        key = "user_id", ts = "ts", attrs = Seq("event_type"),
        numBuckets = 16, tieBreaks = Seq("event_id"))
      graft.ops.Scd2.readHistory(s, td)
        .select($"user_id", $"event_type",
          unix_micros($"valid_from").as("valid_from_us"),
          unix_micros($"valid_to").as("valid_to_us"),
          $"version".cast("long").as("version"), $"is_current")
        .orderBy($"user_id", $"version")
    }),

    // Round-6 fifth composed pipeline — entropy-banded packing: the new
    // token-entropy signal gates the corpus by RANK band (keep the
    // middle 10–90%: cut both word-salad and degenerate boilerplate
    // tails, no absolute threshold to tune), survivors pack into
    // 1500-token training shards per source. Every stage integer-exact;
    // the oracle replays entropy, band membership, and the cumulative
    // pack arithmetic.
    "q_pipeline_curate7" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val ent = graft.text.Tfidf.tokenEntropy(docs, $"doc_id", $"text")
      val banded = graft.ops.Sampling.filterByScoreBand(
          ent, $"entropy_micro", 10, 90)
        .select($"doc_id", $"n_tokens")
      graft.ops.Packing.packByBudget(
          banded.join(docs.select($"doc_id", $"source"), Seq("doc_id"))
            .select($"doc_id", $"source", $"n_tokens"),
          shard = $"source", order = $"doc_id", tokens = $"n_tokens",
          budget = 1500L)
        .orderBy($"doc_id")
    }),

    // Round-6 sixth composed pipeline — per-source quality quota: the
    // trained LR margin (exact integer micro-units) ranks every doc and
    // the bounded-heap top-k keeps the 10 best PER SOURCE — the "best-k
    // per domain" selection a curated mixture wants, at aggregation
    // cost (no per-source sort at 100 TB). The oracle replays the
    // training chain and the quota as a window.
    "q_pipeline_curate8" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      // shared featurization: fit + score read one tf table (see curate5)
      val tfAll = graft.text.Dsir.featureTf(
          docs, $"doc_id", $"text", buckets = 1024)
        .localCheckpoint(eager = false)
      val labels = docs.select($"doc_id",
        when($"lang" === "en", 1L).otherwise(0L).as("y"))
      val model = graft.text.LogReg.fitOnTf(labels, tfAll,
        buckets = 1024, iters = 3, etaMilli = 500)
      val scored = graft.text.LogReg.scoreOnTf(docs.select($"doc_id"), tfAll, model)
        .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
      graft.ops.TopK.topKByGroup(
          scored, $"source", $"margin_micro", $"doc_id", k = 10)
        .toDF("source", "rank", "margin_micro", "doc_id")
        .orderBy($"source", $"rank")
    }),

    // Adjacent-chunk positive pairs (self-supervised contrastive
    // positives): consecutive 32-token windows of each doc paired
    // (anchor, positive) via one doc-key shuffle + bounded lead window.
    "q_text_pairs" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Contrastive.adjacentChunkPairs(
          tbl(s, dir, "documents"), $"doc_id", $"text")
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // Deterministic negative sampling for contrastive training: k
    // non-positive corpus ids per query via salted-md5 hash probing —
    // k·oversample probe rows per query built MAP-SIDE (no
    // query×corpus blow-up), positives anti-joined out, rerun-stable
    // and engine-replayable.
    "q_sample_negatives" -> ((s, dir) => {
      import s.implicits._
      val pos = tbl(s, dir, "documents").filter($"doc_id" < 50)
        .select($"doc_id".as("q_id"), (($"doc_id" * 7 + 3) % 500).as("pos_id"))
      graft.ops.Contrastive.sampleNegatives(pos, $"q_id", $"pos_id",
          corpusSize = 500, k = 5)
        .orderBy($"q_id", $"rank")
    }),

    // Data-quality expectations (the between-stage assertion gate):
    // five named predicates over orders in ONE aggregation pass, each
    // reporting rows/violations/pass; null predicate results count as
    // violations (conservative).
    "q_quality_checks" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Expect.check(tbl(s, dir, "orders"), Seq(
          "price_positive" -> ($"o_totalprice" > 0),
          "status_known" -> $"o_orderstatus".isin("F", "O", "P"),
          "date_in_range" ->
            $"o_orderdate".between("1992-01-01", "1998-12-31"),
          "custkey_present" -> $"o_custkey".isNotNull,
          "priority_nonempty" -> (length($"o_orderpriority") > 0)))
        .orderBy($"check")
    }),

    // Per-group z-score outliers with ENGINE-EXACT arithmetic: the
    // cross-multiplied test (n·x−S)² > z²(n·Q−S²) in 38-digit decimals
    // — no float mean/variance, no sqrt, bit-reproducible outlier set.
    "q_agg_outliers" -> ((s, dir) => {
      import s.implicits._
      val ev = eventsTbl(s, dir).select($"event_id", $"event_type",
        floor($"value" * 100 + 0.5).cast("long").as("cents"))
      graft.ops.Anomaly.zScoreOutliers(ev, $"event_type", $"cents", z = 3)
        .orderBy($"event_id")
    }),

    // Per-group top-k at AGGREGATION cost (bounded-heap
    // TypedImperativeAggregate, map-side partials of <= k pairs per
    // group per partition) instead of the window shape's
    // shuffle-and-sort-every-row; the oracle IS the window shape, so the
    // two formulations are proved equivalent. (key desc, id asc) total
    // order makes the result input-order-independent.
    "q_agg_topk" -> ((s, dir) => {
      import s.implicits._
      graft.ops.TopK.topKByGroup(tbl(s, dir, "documents"),
          group = $"source", key = length($"text"), id = $"doc_id", k = 5)
        .toDF("source", "rank", "text_len", "doc_id")
        .orderBy($"source", $"rank")
    }),

    // JSONL shard export ROUND TRIP: write gzipped JSON-lines chunks of
    // 32 consecutive docs per source, read the tree back (JSON fields +
    // shard/chunk directory columns) — the oracle replays the chunk
    // prefix-sum arithmetic and the original values, so a row that
    // serialized wrong, landed in the wrong chunk, or failed to read
    // back breaks the hash.
    "q_export_jsonl" -> ((s, dir) => {
      import s.implicits._
      val td = scratchTableDir(dir, "export_jsonl")
      val docs = tbl(s, dir, "documents").select($"doc_id", $"source", $"text")
      graft.ops.Export.writeJsonlShards(
        docs, $"source", $"doc_id", td, docsPerShard = 32)
      graft.ops.Export.readJsonlShards(
          s, td, "doc_id BIGINT, source STRING, text STRING")
        .select($"doc_id", $"source", $"shard", $"chunk".cast("long").as("chunk"),
          $"text")
        .orderBy($"doc_id")
    }),

    "q_pack_budget" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Packing.packByBudget(
          tbl(s, dir, "documents")
            .select($"doc_id", $"source",
              size(graft.text.TextFunctions.tokens($"text")).cast("long").as("n_tokens")),
          shard = $"source", order = $"doc_id", tokens = $"n_tokens", budget = 2000L)
        .orderBy($"doc_id")
    }),

    // Pack MANIFESTS: one row per training pack (ordered member ids +
    // token counts + total) — the unit a trainer consumes. Zero-token
    // docs filtered upstream (they would share one prefix position and
    // grow a single pack row unboundedly).
    "q_pack_manifest" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Packing.packManifest(
          tbl(s, dir, "documents")
            .select($"doc_id", $"source",
              size(graft.text.TextFunctions.tokens($"text")).cast("long").as("n_tokens"))
            .filter($"n_tokens" >= 1),
          shard = $"source", order = $"doc_id", tokens = $"n_tokens",
          budget = 2000L)
        // comparator-safe: join member/count arrays to strings
        .select($"shard", $"pack_id",
          concat_ws(",", $"docs".cast("array<string>")).as("docs"),
          concat_ws(",", $"token_counts".cast("array<string>")).as("token_counts"),
          $"pack_tokens")
        .orderBy($"shard", $"pack_id")
    }),

    // Concat-and-chunk SEQUENCE packing: per source, documents
    // concatenate in doc_id order and cut into fixed 512-token training
    // windows, docs SPLITTING across window boundaries (the GPT-style
    // "make sequences" step packByBudget's whole-doc packs don't do).
    // One prefix-sum window + pure integer interval intersection; every
    // window except a source's last is exactly full. Oracle replays the
    // prefix sum and the slice arithmetic over generate_series.
    "q_pack_sequences" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Packing.packSequences(
          tbl(s, dir, "documents")
            .select($"doc_id", $"source",
              size(graft.text.TextFunctions.tokens($"text")).cast("long").as("n_tokens")),
          shard = $"source", order = $"doc_id", tokens = $"n_tokens",
          seqLen = 512L)
        .orderBy($"shard", $"seq_id", $"seq_off")
    }),

    // Deterministic training-order interleave: stride scheduling over
    // the packed sequences — sequence k of source s runs at virtual
    // time (k+1)/weight(s), globally ordered. Sources outside the
    // weight map are excluded; ties break by (shard, seq). The oracle
    // replays packing, the CASE weight lookup and the row_number.
    "q_pack_schedule" -> ((s, dir) => {
      import s.implicits._
      val seqs = graft.ops.Packing.packSequences(
        tbl(s, dir, "documents")
          .select($"doc_id", $"source",
            size(graft.text.TextFunctions.tokens($"text")).cast("long").as("n_tokens")),
        shard = $"source", order = $"doc_id", tokens = $"n_tokens",
        seqLen = 512L)
      graft.ops.Packing.strideSchedule(seqs, $"shard", $"seq_id",
          weights = Map("src0" -> 1.0, "src1" -> 3.0, "src2" -> 1.5,
            "src3" -> 0.5, "src4" -> 2.0, "src5" -> 1.0))
        .orderBy($"step")
    }),

    // MATERIALIZED training sequences: the concat-and-chunk plan
    // carrying the token arrays through — one row per 512-token
    // sequence with its actual content, slices cut map-side and
    // assembled per sequence. The oracle replays the window, the
    // 1-based list slicing and the ordered flatten.
    "q_pack_materialize" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Packing.materializeSequences(
          tbl(s, dir, "documents")
            .select($"doc_id", $"source",
              graft.text.TextFunctions.tokens($"text").as("toks")),
          shard = $"source", order = $"doc_id", tokensArr = $"toks",
          seqLen = 512L)
        // comparator-safe: tokens never contain spaces (whitespace split)
        .select($"shard", $"seq_id",
          concat_ws(" ", $"tokens").as("tokens"), $"n_tokens")
        .orderBy($"shard", $"seq_id")
    }),

    // Ordered funnel (view -> click -> purchase): per user the earliest
    // completion chain, each step's min-ts STRICTLY AFTER the previous
    // step's completion — k-1 ids-only equi-joins, never a window over
    // the raw stream. Timestamps surface as unix micros (the repo's
    // timestamp-output convention).
    "q_events_funnel" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Funnel.funnel(eventsTbl(s, dir),
          $"user_id", $"ts", $"event_type",
          Seq("view", "click", "purchase"))
        .select($"user".as("user_id"),
          unix_micros($"t_1").as("t1_us"),
          unix_micros($"t_2").as("t2_us"),
          unix_micros($"t_3").as("t3_us"),
          $"steps_completed")
        .orderBy($"user_id")
    }),

    // Funnel conversion table: users completing each step prefix.
    "q_events_funnel_counts" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Funnel.funnelCounts(eventsTbl(s, dir),
          $"user_id", $"ts", $"event_type",
          Seq("view", "click", "purchase"))
        .orderBy($"step")
    }),

    // Gap-filled hourly resample: every hour between each user's first
    // and last event carries its count + value sum, silent hours as
    // ZEROS — the dashboard/anomaly-input shape. Exact integer bucket
    // arithmetic; output is the series itself.
    "q_events_resample" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Funnel.gapFillCounts(eventsTbl(s, dir),
          $"user_id", $"ts", $"value", bucketSeconds = 3600L)
        .withColumnRenamed("key", "user_id")
        .orderBy($"user_id", $"bucket")
    }),

    // Capstone pipeline: quality gate -> concat-and-chunk packing ->
    // TEMPERATURE-DERIVED weights (w = sqrt of each source's gated
    // token mass, the tau=2 mix) -> stride-scheduled global training
    // order, first 100 steps. Weights come from the data via the
    // broadcast-join schedule variant; the oracle replays the entire
    // chain: per-doc 4dp quality, the gate, prefix sums, window split,
    // sqrt weights, vt order and the row_number cut.
    "q_pipeline_curate9" -> ((s, dir) => {
      import s.implicits._
      val t = graft.text.TextFunctions
      val gated = tbl(s, dir, "documents")
        .filter(t.qualityScore($"text") >= 0.5)
        .select($"doc_id", $"source",
          size(t.tokens($"text")).cast("long").as("n_tokens"))
      val seqs = graft.ops.Packing.packSequences(gated,
        shard = $"source", order = $"doc_id", tokens = $"n_tokens",
        seqLen = 256L)
      val w = gated.groupBy($"source".as("shard"))
        .agg(sqrt(sum($"n_tokens").cast("double")).as("weight"))
      graft.ops.Packing.strideScheduleBy(seqs, $"shard", $"seq_id", w)
        .filter($"step" <= 100)
        .orderBy($"step")
    }),

    // Cohort retention triangle: weekly cohorts by first event, count
    // of cohort users active k weeks later. Exact integer period
    // arithmetic (micros div week); two map-side-combined aggregates +
    // one user-key join.
    "q_events_retention" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Funnel.retentionCohorts(eventsTbl(s, dir),
          $"user_id", $"ts", periodDays = 7)
        .orderBy($"cohort_period", $"period_offset")
    }),

    // Benchmark decontamination: corpus docs sharing >= 2 distinct
    // 3-shingles with a held-out benchmark slice (every 20th doc).
    // Benchmark shingles broadcast; the corpus side never shuffles until
    // the (doc,bench) overlap count. Oracle = exact shingle-set
    // intersection sizes in DuckDB.
    "q_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Decontaminate.contaminatedPairs(
          docs.filter($"doc_id" % 20 =!= 0), $"doc_id", $"text",
          docs.filter($"doc_id" % 20 === 0), $"doc_id", $"text",
          shingleK = 3, minOverlap = 2)
        .orderBy($"doc_id", $"bench_id")
    }),

    // CONTAINMENT decontamination: drop corpus docs containing >= 60% of
    // some benchmark doc's distinct shingles — the quoted-verbatim case
    // symmetric Jaccard misses. Benchmark side broadcasts; corpus never
    // shuffles. Oracle: exact per-pair containment over the same shingle
    // sets.
    "q_decontaminate_contain" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Decontaminate.decontaminateContainment(
          docs.filter($"doc_id" % 20 =!= 0), $"doc_id", $"text",
          docs.filter($"doc_id" % 20 === 0), $"doc_id", $"text",
          shingleK = 3, threshold = 0.6)
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    // FUZZY decontamination (near-match benchmark filter): drop corpus
    // docs that are MinHash near-duplicates (est Jaccard >= 0.5) of any
    // benchmark doc — catches paraphrased/truncated copies the exact
    // shingle overlap misses. Band-key blocking, never all-pairs. The
    // oracle replays with exact Jaccard (the est==exact equivalence all
    // minhash oracles rest on for this corpus).
    "q_decontaminate_fuzzy" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Decontaminate.decontaminateFuzzy(
          docs.filter($"doc_id" % 20 =!= 0), $"doc_id", $"text",
          docs.filter($"doc_id" % 20 === 0), $"doc_id", $"text")
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    // Per-document contamination fraction (the report pipelines gate on,
    // vs q_decontaminate's binary pair list): share of each corpus doc's
    // distinct 3-shingles present anywhere in the benchmark slice.
    // Pure map-side probe — benchmark shingles ride a codegen'd
    // count-in-set kernel, the corpus never shuffles and never joins.
    "q_text_contamination" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Decontaminate.contaminationScore(
          docs.filter($"doc_id" % 20 =!= 0), $"doc_id", $"text",
          docs.filter($"doc_id" % 20 === 0), $"text",
          shingleK = 3)
        .orderBy($"doc_id")
    }),

    // C4-style keep-first segment dedup: every repeated 2-token segment
    // keeps only its globally-first (doc_id, pos) occurrence; contrast
    // q_text_segdedup, which drops ALL occurrences of frequent segments.
    // One shuffle keyed on the segment; no windows over the segment
    // partition (hot segments stay skew-safe in the partial-agg min).
    "q_text_segdedup_first" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.dedupSegmentsKeepFirst(
          tbl(s, dir, "documents"), $"doc_id", $"text", k = 2)
        .orderBy($"doc_id")
    }),

    // Duplicated-substring coverage (hash-windowed ExactSubstr shape):
    // fraction of each doc's tokens covered by a 5-token window that
    // occurs verbatim 2+ times anywhere in the corpus.
    "q_text_dupspans" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.duplicateSpans(
          tbl(s, dir, "documents"), $"doc_id", $"text", windowL = 5)
        .orderBy($"doc_id")
    }),

    // The CUTTING step of ExactSubstr dedup: every duplicated 5-token
    // window keeps its globally-first occurrence; positions covered by a
    // non-first duplicated window are removed and documents reassemble.
    "q_text_dupspans_cut" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.removeDuplicateSpans(
          tbl(s, dir, "documents"), $"doc_id", $"text", windowL = 5)
        .orderBy($"doc_id")
    }),

    // Round-6 composed pipeline: verbatim-duplication gate (exact
    // integer inequality, 5·covered <= n ⟺ dup_fraction <= 0.2) →
    // contamination gate (<10 % of distinct shingles in the benchmark
    // slice; bench docs themselves drop out) → embedding outlier cut
    // (5 farthest per k-means cluster, doc_id = vec_id) → deterministic
    // 10-per-source cap via the portable salted-md5 rank.
    "q_pipeline_curate4" -> ((s, dir) => {
      import s.implicits._
      val t = graft.text.TextFunctions
      val docs = tbl(s, dir, "documents")
      val spans = t.duplicateSpans(docs, $"doc_id", $"text", windowL = 5)
        .filter($"covered_tokens" * 5 <= $"n_tokens")
        .select($"doc_id")
      val contam = graft.text.Decontaminate.contaminationScore(
          docs.filter($"doc_id" % 20 =!= 0), $"doc_id", $"text",
          docs.filter($"doc_id" % 20 === 0), $"text", shingleK = 3)
        .filter($"n_matched" * 10 < $"n_shingles")
        .select($"doc_id")
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 2)
      val outliers = graft.ann.Ann.clusterOutliers(
          emb, $"vec_id", $"embedding", cents, nPerCluster = 5)
        .select($"vec_id".as("doc_id"))
      val kept = docs.select($"doc_id", $"source")
        .join(spans, Seq("doc_id"))
        .join(contam, Seq("doc_id"))
        .join(outliers, Seq("doc_id"), "left_anti")
      graft.ops.Sampling.stratifiedSample(
          kept, $"source", $"doc_id", n = 10, salt = "cur4")
        .select($"doc_id", $"source")
        .orderBy($"doc_id")
    }),

    // Round-6 fourth composed pipeline — the crawl-hygiene front door
    // built from this block's new operators: (1) canonical-URL dedup
    // (pairs of docs carry two messy variants of one page URL — scheme
    // case, www, :443, tracking param, trailing slash — and collapse
    // after normalizeUrl, keeping the smallest doc_id), (2) containment
    // decontamination against the doc_id % 25 == 0 benchmark slice
    // (drop pages containing >= 60% of a benchmark doc's shingles),
    // (3) deterministic 20-per-source cap. The oracle replays the FULL
    // normalization regex chain, the per-pair containment, and the
    // salted-md5 rank.
    "q_pipeline_curate6" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val page = expr("doc_id div 2")
      val url = when($"doc_id" % 2 === 0,
          concat(lit("https://www.ex"), page % 7, lit(".com/p/"), page,
            lit("?utm_source=x")))
        .otherwise(concat(lit("HTTPS://ex"), page % 7, lit(".com:443/p/"),
          page, lit("/")))
      val urlDeduped = graft.dedup.Dedup.dedupExact(
        docs.withColumn("url", url),
        graft.text.Web.normalizeUrl($"url"), $"doc_id")
      val corpus = urlDeduped.filter($"doc_id" % 25 =!= 0)
      val bench = docs.filter($"doc_id" % 25 === 0)
      val cleaned = graft.text.Decontaminate.decontaminateContainment(
        corpus, $"doc_id", $"text", bench, $"doc_id", $"text",
        shingleK = 3, threshold = 0.6)
      graft.ops.Sampling.stratifiedSample(
          cleaned.select($"doc_id", $"source"),
          $"source", $"doc_id", n = 20, salt = "cur6")
        .orderBy($"doc_id")
    }),

    // Round-6 second composed pipeline — both TRAINED models in one
    // gate: every document's combined score = DSIR importance weight
    // (domain relevance vs the English target) + LR quality margin
    // (3-iteration classifier, same 1024 hashed buckets), top-100 by
    // (combined desc, doc_id), then a 5-per-source cap by the same
    // order. All exact integer arithmetic downstream of the micro-nat
    // quantizations; the oracle replays BOTH model chains off one shared
    // hashed-feature table. (At 100 TB the three featurization passes
    // here would share one persisted (doc, bucket) tf table — the oracle
    // already does.)
    "q_pipeline_curate5" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      // ONE featurization pass shared by all four consumers (DSIR's raw
      // and target models, the LR fit, the LR scoring join) via the OnTf
      // entry points — this used to tokenize/hash the corpus four times
      // (the r12 plan audit's own note). Arithmetic identical; the
      // en-slice tf is the semi-join restriction of the shared table.
      val tfAll = graft.text.Dsir.featureTf(
          docs, $"doc_id", $"text", buckets = 1024)
        .localCheckpoint(eager = false)
      val enIds = docs.filter($"lang" === "en").select($"doc_id")
      val w = graft.text.Dsir.importanceWeightsOnTf(
        docs.select($"doc_id"), tfAll,
        tfAll.join(enIds, Seq("doc_id"), "left_semi"), buckets = 1024)
      val labels = docs.select($"doc_id",
        when($"lang" === "en", 1L).otherwise(0L).as("y"))
      val model = graft.text.LogReg.fitOnTf(labels, tfAll,
        buckets = 1024, iters = 3, etaMilli = 500)
      val m = graft.text.LogReg.scoreOnTf(docs.select($"doc_id"), tfAll, model)
        .select($"doc_id", $"margin_micro")
      val top = w.join(m, Seq("doc_id"))
        .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
        .select($"doc_id", $"source",
          ($"logw_micro" + $"margin_micro").as("combined_micro"))
        .orderBy($"combined_micro".desc, $"doc_id")
        .limit(100)
      val capped = top.withColumn("__srk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"source")
          .orderBy($"combined_micro".desc, $"doc_id")))
        .filter($"__srk" <= 5)
      capped.select($"doc_id", $"source", $"combined_micro")
        .orderBy($"doc_id")
    }),

    // SimHash Hamming-distance near-dup pairs. Token hash = md5-lower-64
    // so the DuckDB oracle reproduces the fingerprints bit-for-bit
    // (md5_number_lower) — a full value-level check of tokenize → bit
    // votes → chunk blocking → Hamming join.
    "q_dedup_simhash" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.simhashPairs(
          tbl(s, dir, "documents"), $"doc_id", $"text", maxDist = 3, algo = "md5")
        .orderBy($"id_a", $"id_b")
    }),

    // INCREMENTAL Hamming dedup against the materialized fingerprint
    // index (the SimHash twin of q_dedup_incremental): even-id docs are
    // fingerprint-indexed once; the odd-id batch computes only its own
    // fingerprints and joins the stored pigeonhole chunks. Oracle: a
    // batch doc survives iff no corpus-half partner at Hamming <= 3 over
    // the bit-exact md5 fingerprint replay.
    "q_dedup_simhash_incremental" -> ((s, dir) => {
      import s.implicits._
      val batch = tbl(s, dir, "documents").filter($"doc_id" % 2 === 1)
      graft.dedup.Dedup.dedupAgainstFingerprintIndex(s, batch, $"doc_id",
          graft.dedup.Dedup.simhash64($"text", algo = "md5"),
          simhashIndexDir(s, dir), maxDist = 3)
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    // Brute-force cosine top-10 for the first embedding vector.
    "q_ann_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.bruteForceTopK(
        emb, $"vec_id", $"embedding", q, k = 10, excludeId = Some(qRow.getLong(0)))
    }),

    // Embedding cosine near-dup pairs, LSH-bucket-blocked (the scale
    // path: candidates meet via equi-join on the bucket, no cross join).
    // Oracle recomputes the seeded hyperplane buckets from literals.
    "q_ann_cosine_pairs" -> ((s, dir) => {
      import s.implicits._
      graft.ann.Ann.cosinePairs(
          tbl(s, dir, "embeddings"), $"vec_id", $"embedding",
          threshold = 0.4, dim = 64, bucketed = true, nBits = 8)
        .orderBy($"id_a", $"id_b")
    }),

    // Embedding dedup: keep one representative per transitive cosine
    // cluster (LSH-blocked pairs → connected components → keep min id).
    "q_ann_dedup" -> ((s, dir) => {
      import s.implicits._
      graft.ann.Ann.dedupEmbeddings(
          tbl(s, dir, "embeddings"), $"vec_id", $"embedding",
          threshold = 0.4, dim = 64, nBits = 8, tables = 4)
        .select($"vec_id")
        .orderBy($"vec_id")
    }),

    // LSH-bucketed ANN over the same query vector (recall<1 ⇒ rows-only).
    "q_ann_lsh" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.lshTopK(
        emb, $"vec_id", $"embedding", q, k = 10, nBits = 8,
        excludeId = Some(qRow.getLong(0)))
    }),

    // IVF-flat ANN: coarse cells from a deterministic codebook, query
    // probes the 4 nearest of 16 cells and exact-re-ranks inside — the
    // inverted-file scale path (cells become partition keys at ingest).
    // Oracle recomputes every cell assignment from centroid literals.
    "q_ann_ivf" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.ivfTopK(
        emb, $"vec_id", $"embedding", q, k = 10, cells = 16, nprobe = 4,
        excludeId = Some(qRow.getLong(0)))
    }),

    // Multi-probe LSH: single table, query bucket + all 1-bit-flip
    // buckets probed (recall via probes instead of table replication).
    "q_ann_multiprobe" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.lshTopKMultiProbe(
        emb, $"vec_id", $"embedding", q, k = 10, nBits = 8,
        excludeId = Some(qRow.getLong(0)))
    }),

    // Int8 scalar quantization (the 4× ANN memory cut): integer-exact
    // per-vector summary + the raw double scale, identical arithmetic on
    // both engines.
    // Product quantization: 64-dim float32 → 8 sub-codes (32× memory
    // cut), top-10 by asymmetric distance — the oracle re-derives every
    // code from the deterministic codebook literals and recomputes the
    // ADC from the query row's own embedding.
    "q_ann_pq" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.pqAdcTopK(emb, $"vec_id", $"embedding", q,
        graft.ann.Ann.pqCodebooks(m = 8, k = 16, subDim = 8),
        k = 10, excludeId = Some(qRow.getLong(0)))
    }),

    // IVF-ADC (FAISS IVFPQ): coarse cells cut the scan to 4/16 probe
    // lists, PQ codes + the ADC table score the survivors — the
    // billion-vector serving layout (cells = partition key, m bytes per
    // row, raw vectors never read).
    "q_ann_ivfpq" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.ivfPqTopK(emb, $"vec_id", $"embedding", q,
        k = 10, cells = 16, nprobe = 4, m = 8, codebookK = 16,
        excludeId = Some(qRow.getLong(0)))
    }),

    // Same IVFADC query served from the MATERIALIZED codes table
    // (partitioned by cell): probe-cell partition pruning + stored-code
    // ADC — identical results to q_ann_ivfpq at codes-table cost.
    "q_ann_ivfpq_indexed" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.queryIvfPqIndex(s, ivfPqCodesDir(s, dir), q,
        k = 10, cells = 16, nprobe = 4, m = 8, codebookK = 16,
        excludeId = Some(qRow.getLong(0)))
    }),

    // The serving index GROWN incrementally (build on the even-id half,
    // append the odd-id batch — appendToIvfPqIndex): deterministic
    // codebooks make batch-encoded codes identical to one-shot codes, so
    // the same query over the incrementally-built table must reproduce
    // q_ann_ivfpq_indexed exactly (one shared oracle).
    "q_ann_ivfpq_incremental" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.queryIvfPqIndex(s, ivfPqCodesIncrDir(s, dir), q,
        k = 10, cells = 16, nprobe = 4, m = 8, codebookK = 16,
        excludeId = Some(qRow.getLong(0)))
    }),

    "q_ann_quantize" -> ((s, dir) => {
      import s.implicits._
      graft.ann.Ann.quantizeInt8Summary(
          tbl(s, dir, "embeddings"), $"vec_id", $"embedding")
        .orderBy($"vec_id")
    }),

    // Johnson–Lindenstrauss random projection 64 → 16 dims: seeded ±1
    // Rademacher matrix (md5-parity signs) × milli-quantized vectors —
    // exact integer outputs the oracle regenerates from (seed, j, i)
    // alone. Map-side codegen'd kernel; nothing shuffles.
    "q_ann_rp" -> ((s, dir) => {
      import s.implicits._
      graft.ann.Ann.randomProjection(
          tbl(s, dir, "embeddings"), $"vec_id", $"embedding",
          outDim = 16, dim = 64, seed = 42L)
        // comparator-safe: exact-integer projection joins to one string
        .select($"vec_id",
          concat_ws(",", $"proj".cast("array<string>")).as("proj"))
        .orderBy($"vec_id")
    }),

    // Top-10 nearest neighbors in the PROJECTED space (squared L2 over
    // exact-integer 16-dim projections, ties by id) — the JL-compressed
    // search baseline. Oracle replays matrix, projections, query
    // projection and the ranking.
    "q_ann_rp_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.rpTopK(emb, $"vec_id", $"embedding", q,
        k = 10, outDim = 16, seed = 42L, excludeId = Some(qRow.getLong(0)))
    }),

    // Lloyd's k-means over embeddings (k=8, 2 iterations): trained
    // centroids for IVF/diversity sampling. Milli-quantized inputs keep
    // every cross-row sum exact integer arithmetic, so the oracle
    // replays init, both centroid updates, and the final assignment
    // from scratch and matches bit-for-bit.
    "q_ann_kmeans" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 2)
      graft.ann.Ann.kmeansAssign(emb, $"vec_id", $"embedding", cents)
        .orderBy($"vec_id")
    }),

    // Mini-batch (incremental) k-means: 4 modulo-sliced batches fold into
    // the running per-cluster integer-sum state — the centroid-refresh
    // path for a live IVF index (batch-sized cost per update, no corpus
    // re-scan). The oracle replays the ENTIRE batch sequence: seed from
    // batch 0, assign each batch to the then-current sums/n centroids,
    // accumulate. Output = per-dimension live centroids + counts.
    "q_ann_kmeans_minibatch" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val nBatches = 4
      var st = graft.ann.Ann.kmeansStateInit(
        emb.filter($"vec_id" % nBatches === 0), $"vec_id", $"embedding", k = 8)
      (1 until nBatches).foreach { t =>
        st = graft.ann.Ann.kmeansStateUpdate(
          st, emb.filter($"vec_id" % nBatches === t), $"vec_id", $"embedding")
      }
      graft.ann.Ann.kmeansStateReport(st)
    }),

    // Approximate kNN JOIN: each vector's 3 highest-cosine neighbors via
    // k-means cell blocking (data side 1 cell, probe side 2 cells) + exact
    // re-rank — the all-rows graph the single-query topk can't build. The
    // oracle replays the k-means fit, both cell assignments, and the
    // rounded-cosine rank order from scratch.
    "q_ann_knn_join" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 2)
      graft.ann.Ann.knnJoin(emb, $"vec_id", $"embedding", cents,
          k = 3, nprobe = 2)
        .orderBy($"vec_id", $"nn_rank")
    }),

    // Two-table retrieval: the odd-id half as the query set, the even-id
    // half as the embedded corpus — each query's 3 nearest corpus
    // vectors through the same cell blocking as the self-join.
    "q_ann_knn_retrieve" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 2)
      graft.ann.Ann.knnJoinAgainst(
          emb.filter($"vec_id" % 2 === 1), $"vec_id", $"embedding",
          emb.filter($"vec_id" % 2 === 0), $"vec_id", $"embedding",
          cents, k = 3, nprobe = 2)
        .orderBy($"vec_id", $"nn_rank")
    }),

    // ANN HARD-NEGATIVE mining (contrastive training's quality lever):
    // each odd-id query's highest-cosine even-id corpus neighbors that
    // are NOT its positive — the same cell-blocked kNN machinery, a
    // positives anti-join, and a bounded per-query re-rank. k=4
    // candidates absorb the one possible positive hit, then top-3.
    "q_ann_hardneg" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 2)
      val pos = emb.filter($"vec_id" % 2 === 1)
        .select($"vec_id", (($"vec_id" + 1) % 500).as("neighbor_id"))
      graft.ann.Ann.knnJoinAgainst(
          emb.filter($"vec_id" % 2 === 1), $"vec_id", $"embedding",
          emb.filter($"vec_id" % 2 === 0), $"vec_id", $"embedding",
          cents, k = 4, nprobe = 2)
        .join(pos, Seq("vec_id", "neighbor_id"), "left_anti")
        .withColumn("hn_rank", row_number().over(
          Window.partitionBy($"vec_id")
            .orderBy($"cosine".desc, $"neighbor_id")).cast("long"))
        .filter($"hn_rank" <= 3)
        .select($"vec_id", $"neighbor_id", $"cosine", $"hn_rank")
        .orderBy($"vec_id", $"hn_rank")
    }),

    // SemDeDup-companion prototypicality pruning: the 5 farthest vectors
    // per k-means cluster (off-distribution candidates a curation pass
    // cuts). Assignment is the map-side codegen'd kernel; the only
    // shuffle is the k-partition cluster window.
    "q_ann_outliers" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 2)
      graft.ann.Ann.clusterOutliers(emb, $"vec_id", $"embedding", cents,
          nPerCluster = 5)
        .orderBy($"vec_id")
    }),

    // TRAINED-codebook PQ: per-subspace k-means sub-codebooks (pqFit)
    // replace the hash-derived ones — the production recall path. The
    // oracle re-derives all 8 sub-fits from scratch (first-k init, exact
    // integer-mean Lloyd updates, first-min ties) plus every code and
    // ADC entry.
    "q_ann_pq_trained" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      val books = graft.ann.Ann.pqFit(emb, $"vec_id", $"embedding",
        m = 8, subDim = 8, k = 16, iters = 1)
      graft.ann.Ann.pqAdcTopKTrained(emb, $"vec_id", $"embedding", q,
        books, k = 10, excludeId = Some(qRow.getLong(0)))
    }),

    // Nearest-class-centroid (Rocchio) classification: 90 seed vectors
    // labeled c0/c1/c2 by vec_id mod 3 fit one exact-integer-mean
    // centroid per class (the same portable sum/count arithmetic as a
    // Lloyd update); every vector then gets the map-side kernel
    // assignment. The oracle replays the class means and every
    // assignment from scratch.
    "q_ann_classify" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val seeds = emb.filter($"vec_id" < 90)
        .withColumn("label", concat(lit("c"), ($"vec_id" % 3).cast("string")))
      val cents = graft.ann.Ann.fitClassCentroids(seeds, $"embedding", $"label")
      graft.ann.Ann.classifyByCentroids(emb, $"vec_id", $"embedding", cents)
        .orderBy($"vec_id")
    }),

    // TRAINED coarse quantizer IVF: kmeansFit centroids as the coarse
    // cells (L2 assignment, first-min ties), query probes its 4 nearest
    // of 16 data-adapted cells, exact cosine re-rank inside. The oracle
    // replays the fit and every assignment from scratch.
    "q_ann_ivf_trained" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 16, iters = 1)
      graft.ann.Ann.ivfTopKTrained(emb, $"vec_id", $"embedding", q,
        cents, k = 10, nprobe = 4, excludeId = Some(qRow.getLong(0)))
    }),

    // Cluster-balanced diversity sampling: k-means clusters as strata,
    // 20 lowest salted-hash ids kept per cluster — the selection recipe
    // for diverse subsets. The oracle replays the fit, every assignment,
    // and the md5 rank from scratch.
    "q_ann_diversity" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 1)
      graft.ann.Ann.diversitySample(
          emb, $"vec_id", $"embedding", cents, nPerCluster = 20, salt = "d1")
        .orderBy($"vec_id")
    }),

    // SemDeDup-style semantic dedup: k-means clusters (1 Lloyd iteration,
    // the oracle replays fit + assignment + pairs + closure from scratch)
    // block the exact-cosine near-duplicate graph; one survivor per
    // component.
    "q_ann_semdedup" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 1)
      graft.ann.Ann.semanticDedup(
          emb, $"vec_id", $"embedding", cents, threshold = 0.4)
        .select($"vec_id")
        .orderBy($"vec_id")
    }),

    // Multimodal decode plumbing (stubbed kernels, real Dataset pipeline).
    "q_multimodal_decode" -> ((s, dir) => {
      import s.implicits._
      graft.multimodal.Multimodal.decodeDocuments(s, tbl(s, dir, "documents"))
        .select($"id", $"modality", $"width", $"height", $"nFrames", $"byteLen")
        .orderBy($"id")
    }),

    // REAL image decode (JDK javax.imageio, zero external deps):
    // document-derived constant-gray PNGs whose dimensions and mean luma
    // have closed forms — the oracle states the closed forms, Spark must
    // recover them through an ACTUAL png-encode → imageio-decode round
    // trip running inside typed mapPartitions kernels.
    "q_multimodal_image" -> ((s, dir) => {
      import s.implicits._
      graft.multimodal.Multimodal
        .decodeDocumentImages(s, tbl(s, dir, "documents"))
        .select($"id".as("doc_id"), $"width", $"height",
          $"meanLuma".as("mean_luma"))
        .orderBy($"doc_id")
    }),

    // Perceptual-hash (aHash) image dedup over REAL PNG decode: the
    // two-band gradient fixture gives every doc's 64-bit hash a closed
    // form the oracle replays from doc_id arithmetic alone, while Spark
    // must recover it through an actual PNG encode -> imageio decode ->
    // integer threshold pipeline; `kept` marks the min-id representative
    // of each exact-hash duplicate group.
    "q_multimodal_imagehash" -> ((s, dir) => {
      import s.implicits._
      val hashed = graft.multimodal.Multimodal.perceptualHashes(
        graft.multimodal.Multimodal.gradientImagesFromDocuments(
          s, tbl(s, dir, "documents")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"phash")
      hashed.select($"id".as("doc_id"), $"phash",
          ($"id" === min($"id").over(w)).as("kept"))
        .orderBy($"doc_id")
    }),

    // Nearest-neighbor image RESIZE over the two-band fixture: 32x32 ->
    // 8x8 samples columns {0,4,..,28} (4 per band), so the re-decoded
    // mean luma of every thumbnail has the closed form
    // (v1 + v2 + 1) div 2 the oracle replays from doc_id arithmetic —
    // while Spark must run the real decode -> integer-floor sample ->
    // PNG re-encode -> re-decode chain to produce it.
    "q_multimodal_resize" -> ((s, dir) => {
      import s.implicits._
      graft.multimodal.Multimodal.resizeImages(
          graft.multimodal.Multimodal.gradientImagesFromDocuments(
            s, tbl(s, dir, "documents")), outW = 8, outH = 8)
        .select($"id".as("doc_id"), $"width", $"height", $"meanLuma".as("mean_luma"))
        .orderBy($"doc_id")
    }),

    // Audio envelope fingerprint dedup over REAL WAV decode — the audio
    // twin of q_multimodal_imagehash: the two-phase fixture gives every
    // doc's 64-bit fingerprint a closed form the oracle replays from
    // doc_id arithmetic, while Spark recovers it through an actual WAV
    // encode -> javax.sound decode -> threshold pipeline.
    "q_multimodal_audiohash" -> ((s, dir) => {
      import s.implicits._
      val hashed = graft.multimodal.Multimodal.audioFingerprints(
        graft.multimodal.Multimodal.twoPhaseAudiosFromDocuments(
          s, tbl(s, dir, "documents")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"afp")
      hashed.select($"id".as("doc_id"), $"afp",
          ($"id" === min($"id").over(w)).as("kept"))
        .orderBy($"doc_id")
    }),

    // REAL audio decode (JDK javax.sound.sampled, zero external deps):
    // document-derived WAV square waves whose sample rate, channel count,
    // frame count, duration and RMS all have closed forms — the oracle
    // states the closed forms, Spark must recover them through an ACTUAL
    // wav-encode → javax.sound decode round trip inside typed
    // mapPartitions kernels.
    "q_multimodal_audio" -> ((s, dir) => {
      import s.implicits._
      graft.multimodal.Multimodal
        .decodeDocumentAudios(s, tbl(s, dir, "documents"))
        .select($"id".as("doc_id"), $"sampleRate".as("sample_rate"),
          $"channels", $"nSamples".as("n_samples"),
          $"durationMs".as("duration_ms"), $"rms")
        .orderBy($"doc_id")
    }),

    // REAL video CONTAINER metadata decode (no codec needed): document-
    // derived MP4 (even ids) / AVI (odd ids) payloads whose duration,
    // dimensions, track count and frame count all have closed forms —
    // the oracle states the closed forms, Spark must recover them through
    // an actual encode → MP4 box walk / AVI RIFF walk inside typed
    // mapPartitions kernels.
    "q_multimodal_video" -> ((s, dir) => {
      import s.implicits._
      graft.multimodal.Multimodal
        .decodeDocumentVideos(s, tbl(s, dir, "documents"))
        .select($"id".as("doc_id"), $"container", $"width", $"height",
          $"nTracks".as("n_tracks"), $"frameCount".as("frame_count"),
          $"durationMs".as("duration_ms"))
        .orderBy($"doc_id")
    }),

    // REAL video frame PIXEL decode + frame sampling: every 2nd frame of
    // document-derived MJPEG AVIs goes through an actual RIFF walk →
    // imageio JPEG decode; sampled indices and true codec dimensions
    // have closed-form oracles (pixel stats are lossy-codec territory —
    // unit-tested differentially, not oracle-gated).
    "q_multimodal_videoframes" -> ((s, dir) => {
      import s.implicits._
      graft.multimodal.Multimodal
        .decodeDocumentVideoFrames(s, tbl(s, dir, "documents"))
        .select($"id".as("doc_id"), $"frameIdx".cast("long").as("frame_idx"),
          $"width", $"height")
        .orderBy($"doc_id", $"frame_idx")
    }),

    // JSON extraction from the events props column.
    "q_scalar_json" -> ((s, dir) => {
      import s.implicits._
      eventsTbl(s, dir)
        .select($"event_id",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"k").agg(count(lit(1)).as("n"))
        .orderBy($"k")
    }),

    // CUBE grouping sets.
    "q_cube" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

  )
}

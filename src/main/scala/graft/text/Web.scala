package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain operators — the provenance-filtering stage of web-corpus
  * curation (C4 and RefinedWeb both gate on URL blocklists before any
  * content heuristic runs, since a domain verdict is orders of magnitude
  * cheaper than reading the page).
  *
  * Engine-portable by construction: host extraction and the www-strip are
  * single regexes evaluated identically by Spark's codegen'd regexp
  * kernels and the SQL oracle.
  */
object Web {

  /** Host part of a URL: text between `scheme://` (optional userinfo
    * skipped) and the first `/`, `:`, `?` or `#`, lowercased. NULL-safe:
    * non-URLs yield an empty string (regexp_extract's no-match value). */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))

  /** Domain used for exact-host blocklist matching: the host minus one
    * leading `www.` label. For registrable-domain (eTLD+1) matching —
    * the keying C4/RefinedWeb-grade blocklists use — see
    * [[registrableDomainOf]]. */
  def domainOf(url: Column): Column =
    regexp_replace(hostOf(url), "^www\\.", "")

  /** Embedded public-suffix snapshot: the multi-label entries (every
    * bare TLD already follows the PSL default rule of one public label).
    * A DATA SNAPSHOT of the common ccTLD second-level registries, not a
    * dependency — trimmed to two-label suffixes so the longest-match
    * rule reduces to one anchored regex; extend the list to track the
    * full publicsuffix.org set. */
  val publicSuffixes: Seq[String] = Seq(
    // United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "sch.uk",
    // Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    // Australia / New Zealand
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "net.nz", "org.nz",
    // Brazil / Latin America
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.ar", "com.mx", "gob.mx", "org.mx", "com.co", "com.pe", "com.ve",
    "com.ec", "com.uy", "com.do", "com.gt", "com.cl",
    // China / Korea / Taiwan / Hong Kong / SE Asia
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
    "co.kr", "go.kr", "or.kr", "ac.kr", "com.tw", "org.tw", "edu.tw",
    "com.hk", "org.hk", "edu.hk", "com.sg", "edu.sg", "org.sg",
    "co.th", "ac.th", "go.th", "or.th", "com.my", "org.my", "edu.my",
    "com.ph", "org.ph", "com.vn", "edu.vn", "co.id", "or.id", "ac.id",
    "go.id", "com.bd", "com.pk", "edu.pk",
    // India / Middle East / Africa
    "ac.in", "co.in", "firm.in", "gen.in", "gov.in", "ind.in", "net.in",
    "org.in", "res.in", "co.il", "org.il", "ac.il", "gov.il",
    "com.sa", "com.eg", "com.tr", "edu.tr", "gov.tr", "org.tr",
    "ac.za", "co.za", "gov.za", "net.za", "org.za", "web.za",
    "co.ke", "or.ke", "ac.ke", "com.ng", "edu.ng", "gov.ng",
    // Europe
    "ac.at", "co.at", "gv.at", "or.at", "com.pl", "edu.pl", "net.pl",
    "org.pl", "com.ru", "com.ua", "edu.ua", "gov.ua", "com.gr", "edu.gr",
    "com.pt", "edu.pt", "com.ro", "org.ro", "co.hu", "org.hu")

  private def suffixAlternation: String =
    publicSuffixes.map(_.replace(".", "\\.")).mkString("|")

  /** Registrable domain (eTLD+1): one label past the public suffix —
    * multi-label suffixes from the [[publicSuffixes]] snapshot, bare
    * TLDs via the PSL default single-label rule. `sub.example.co.uk` →
    * `example.co.uk`; `a.b.example.com` → `example.com`. A host that IS
    * a public suffix, is single-label, or is empty passes through
    * unchanged (no registrable domain to extract — never a false
    * block). Two anchored regexes + a CASE — codegen'd, and replayed
    * verbatim by the SQL oracle from the same snapshot. */
  def registrableDomainOf(url: Column): Column = {
    val host = hostOf(url)
    val multi = regexp_extract(host, s"([^.]+\\.(?:$suffixAlternation))$$", 1)
    val twoLabel = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(multi =!= "", multi).when(twoLabel =!= "", twoLabel).otherwise(host)
  }

  /** Drop rows whose URL's [[domainOf]] appears in `blockedDomains`
    * (a one-column DataFrame of domains). A curated blocklist (thousands
    * of rows) broadcasts under Spark's auto-broadcast threshold, so the
    * corpus never shuffles; a crawl-scale blocklist (millions of domains)
    * flows through the same left_anti as a shuffle join — both are the
    * plan you'd want, chosen by size, with no code change. */
  def filterBlockedDomains(
      df: DataFrame, url: Column, blockedDomains: DataFrame): DataFrame = {
    val blocked = blockedDomains.toDF("__blocked_domain")
    df.join(blocked, domainOf(url) === col("__blocked_domain"), "left_anti")
  }

  /** Literal-list convenience for small, fixed blocklists: compiles to a
    * map-side NOT IN — zero joins, zero shuffles. */
  def filterBlockedDomains(
      df: DataFrame, url: Column, blockedDomains: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty, "empty blocklist: nothing to filter")
    df.filter(!domainOf(url).isin(blockedDomains: _*))
  }

  /** [[filterBlockedDomains]] keyed on the REGISTRABLE domain
    * ([[registrableDomainOf]]): a blocklist entry `example.co.uk` blocks
    * `example.co.uk`, `www.example.co.uk`, `a.b.example.co.uk`, … — the
    * matching C4/RefinedWeb-grade blocklists assume. Same plan shapes as
    * the exact-host variant (broadcast/shuffled left_anti by size). */
  def filterBlockedRegistrable(
      df: DataFrame, url: Column, blockedDomains: DataFrame): DataFrame = {
    val blocked = blockedDomains.toDF("__blocked_domain")
    df.join(blocked, registrableDomainOf(url) === col("__blocked_domain"), "left_anti")
  }

  /** Literal-list registrable-domain blocklist — map-side NOT IN. */
  def filterBlockedRegistrable(
      df: DataFrame, url: Column, blockedDomains: Seq[String]): DataFrame = {
    require(blockedDomains.nonEmpty, "empty blocklist: nothing to filter")
    df.filter(!registrableDomainOf(url).isin(blockedDomains: _*))
  }

  /** Canonical URL form for URL-level dedup — the first dedup tier of a
    * crawl pipeline (two fetches of the same page routinely differ only
    * in tracking params, fragment, default port, or a trailing slash,
    * and URL equality is orders of magnitude cheaper than content
    * hashing). Rules, all applied map-side with engine-portable regexes:
    *
    *   1. scheme and host lowercased; one leading `www.` label stripped;
    *   2. the scheme's DEFAULT port stripped (`:80` http / `:443`
    *      https), any other explicit port kept;
    *   3. fragment (`#…`) removed;
    *   4. query params split on `&`: empties and tracking params
    *      (`utm_*`, `gclid`, `fbclid`, `ref`) dropped, the rest SORTED
    *      (param order never changes content) and re-joined — an empty
    *      result drops the `?` entirely;
    *   5. trailing `/`s stripped from the path (path case kept — paths
    *      are case-sensitive, hosts are not).
    *
    * A value with no `scheme://host` shape passes through UNCHANGED
    * (never invent a canonical form for a non-URL). Deduplicate with
    * `dedupExact(df, normalizeUrl(url), tieBreak)`. */
  def normalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport =
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)", 1)
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val host = regexp_replace(
      lower(regexp_replace(hostport, ":[0-9]+$", "")), "^www\\.", "")
    val portPart = when(port === "", lit(""))
      .when(scheme === "http" && port === "80", lit(""))
      .when(scheme === "https" && port === "443", lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]+([^?#]*)", 1)
    val cleanPath = regexp_replace(path, "/+$", "")
    // anchored pre-fragment scan: a '?' INSIDE the fragment (SPA routes
    // like '#/r?tab=1') must not be promoted to a query string — [^#]*?
    // can never cross the '#', so only a real query's '?' matches
    val query = regexp_extract(url, "^[^#]*?\\?([^#]*)", 1)
    val params = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)(=.*)?$"))
    val queryPart = when(size(params) > 0,
      concat(lit("?"), array_join(array_sort(params), "&"))).otherwise(lit(""))
    when(hostport === "", url)
      .otherwise(concat(scheme, lit("://"), host, portPart, cleanPath, queryPart))
  }

  /** HTML → visible text — the step between the crawl fetch and every
    * content heuristic in this package (quality, langid, dedup all want
    * prose, not markup). Order-pinned regex chain, applied map-side and
    * shared verbatim with the SQL oracle so both engines produce
    * byte-identical text:
    *
    *   1. `<script>`/`<style>` elements removed WITH their content
    *      (case-insensitive, non-greedy close; an unterminated element
    *      keeps its text — rule 3 then strips the dangling tag);
    *   2. comments `<!-- … -->` removed;
    *   3. every remaining tag `<…>` replaced by a space (the separator
    *      keeps `…word</p><p>word…` from fusing);
    *   4. the six ubiquitous named/numeric entities decoded — `&lt;`
    *      `&gt;` `&quot;` `&#39;` `&nbsp;` first, `&amp;` LAST (so
    *      double-escaped `&amp;lt;` decodes one level per pass, the
    *      replace-chain convention both engines share);
    *   5. whitespace runs collapsed to one space, ends trimmed.
    *
    * Deliberately boilerplate-agnostic: nav/footer pruning is a
    * MODELING choice (link-density thresholds) — [[htmlBlocks]] is the
    * block-level extractor that applies it. NULL html yields NULL. */
  def htmlToText(html: Column): Column =
    visibleTail(stripContainers(html))

  /** Rules 1–2 of [[htmlToText]]: elements whose CONTENT must vanish. */
  private[text] def stripContainers(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")

  /** Rules 3–5 of [[htmlToText]]: tag separators, entity decode
    * (`&amp;` last), whitespace collapse. */
  private[text] def visibleTail(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val decoded = replace(replace(replace(replace(replace(replace(
      noTags,
      lit("&lt;"), lit("<")),
      lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")),
      lit("&#39;"), lit("'")),
      lit("&nbsp;"), lit(" ")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Block-level tag boundary — the segmentation [[htmlBlocks]] splits
    * on (opening OR closing forms; inline tags like `<a>`/`<b>` stay
    * inside their block). After the tag name the regex requires `>`,
    * `/` or whitespace — without that boundary, `p` would match
    * `<path>`, `li` would match `<link>`, `tr` would match `<track>`
    * and split prose spuriously (RE2 has no lookahead, so the boundary
    * is an optional attribute-tail group rather than `(?=…)`). */
  private[text] val BlockTagRegex: String =
    "(?i)</?(?:p|div|section|article|main|header|footer|nav|aside|" +
      "h[1-6]|li|ul|ol|table|tr|td|th|blockquote|pre|br|hr)" +
      "(?:[\\s/][^>]*)?>"

  /** BOILERPLATE-pruning block extraction — the LINK-DENSITY heuristic
    * every production crawl-text extractor centers on (jusText,
    * trafilatura, RefinedWeb): navigation, footers and "read more" rows
    * are mostly anchor text, prose is not. Deterministic and
    * engine-portable end to end:
    *
    *   1. script/style/comment CONTENT removed (before splitting — a
    *      script body must not become a block);
    *   2. the page splits into blocks at block-level tag boundaries
    *      ([[BlockTagRegex]]; inline markup stays inside its block);
    *   3. per block: visible text (the [[htmlToText]] tail), its token
    *      count, and the token count of the text INSIDE `<a>` elements;
    *   4. `kept` = at least `minTokens` tokens AND anchor-token share ≤
    *      `maxAnchorPct`% — compared by integer cross-multiplication
    *      (`anchor·100 ≤ pct·total`), no float ratio.
    *
    * Empty blocks (adjacent tags) are dropped; the rest carry the flag
    * rather than vanishing, so thresholds stay tunable downstream.
    * All map-side: split + posexplode + codegen'd regex/token kernels,
    * no shuffle.
    *
    * @return (doc_id, block_idx, n_tokens, anchor_tokens, kept, text)
    */
  def htmlBlocks(
      df: DataFrame, id: Column, html: Column,
      minTokens: Int = 5, maxAnchorPct: Int = 50): DataFrame = {
    require(minTokens >= 1, s"minTokens must be >= 1: $minTokens")
    require(maxAnchorPct >= 0 && maxAnchorPct <= 100,
      s"maxAnchorPct must be in [0,100]: $maxAnchorPct")
    val toks = (c: Column) => size(graft.text.TextFunctions.tokens(c))
    df.select(id.as("doc_id"),
        posexplode(split(stripContainers(html), BlockTagRegex)))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("block_idx"),
        visibleTail(col("col")).as("text"),
        // <a…> must not swallow <abbr>/<area>/<audio>: after 'a' comes
        // '>' or an attribute list starting with whitespace
        visibleTail(array_join(regexp_extract_all(col("col"),
          lit("(?is)<a(?:\\s[^>]*)?>(.*?)</a>"), lit(1)), " ")).as("__atext"))
      .select(col("doc_id"), col("block_idx"),
        toks(col("text")).cast("long").as("n_tokens"),
        toks(col("__atext")).cast("long").as("anchor_tokens"),
        col("text"))
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("block_idx"), col("n_tokens"),
        col("anchor_tokens"),
        (col("n_tokens") >= minTokens &&
          col("anchor_tokens") * 100 <= col("n_tokens") * maxAnchorPct)
          .as("kept"),
        col("text"))
  }
}

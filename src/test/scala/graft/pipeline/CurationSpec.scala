package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling
import graft.text.{Decontaminate, Tfidf}

/** Unit coverage for the corpus-curation operators: decontamination,
  * deterministic sampling, TF-IDF. */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-curation-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("contaminatedPairs counts distinct shared shingles, minOverlap filters") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words here entirely"),
      (3L, "the quick brown fox sat still")
    ).toDF("id", "txt")
    val bench = Seq(
      (100L, "the quick brown fox jumps high")
    ).toDF("bid", "btxt")
    // 3-shingles of doc1 ∩ bench: "the quick brown", "quick brown fox",
    // "brown fox jumps" → overlap 3; doc3 ∩ bench: 2; doc2: 0
    val pairs = Decontaminate.contaminatedPairs(
      corpus, $"id", $"txt", bench, $"bid", $"btxt",
      shingleK = 3, minOverlap = 2)
    val got = pairs.select($"doc_id", $"bench_id", $"overlap")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 100L, 3L), (3L, 100L, 2L)))
  }

  test("decontaminate drops flagged docs and keeps the rest") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words here entirely")
    ).toDF("id", "txt")
    val bench = Seq((100L, "the quick brown fox jumps high")).toDF("bid", "btxt")
    val clean = Decontaminate.decontaminate(
      corpus, $"id", $"txt", bench, $"bid", $"btxt", shingleK = 3, minOverlap = 2)
    assert(clean.select($"id").as[Long].collect().toSeq == Seq(2L))
  }

  test("contaminatedPairs broadcasts the benchmark side") {
    val corpus = Seq((1L, "a b c d")).toDF("id", "txt")
    val bench = Seq((2L, "a b c")).toDF("bid", "btxt")
    val plan = Decontaminate.contaminatedPairs(
      corpus, $"id", $"txt", bench, $"bid", $"btxt", 3, 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"bench side must broadcast:\n$plan")
  }

  test("decontaminateBloom: map-side probe matches the exact path, never leaks") {
    val corpus = (1L to 60L).map { i =>
      (i, if (i % 10 == 0) "the quick brown fox jumps over the lazy dog"
      else s"unique words number $i about topic ${i * 7} and item ${i * 13} plus tail ${i * 31}")
    }.toDF("id", "txt")
    val bench = Seq((100L, "the quick brown fox jumps high today")).toDF("bid", "btxt")
    val exact = Decontaminate.decontaminate(
        corpus, $"id", $"txt", bench, $"bid", $"btxt", shingleK = 3, minOverlap = 2)
      .select($"id").as[Long].collect().toSet
    val viaBloom = Decontaminate.decontaminateBloom(
      corpus, $"id", $"txt", bench, $"btxt",
      shingleK = 3, minOverlap = 2, expectedShingles = 4096, fpp = 0.0001)
    val bloomIds = viaBloom.select($"id").as[Long].collect().toSet
    // conservative: bloom can only over-remove, never keep a contaminated doc
    assert(bloomIds.subsetOf(exact), s"bloom kept a contaminated doc: " +
      s"${bloomIds -- exact}")
    // with a generously-sized filter the two paths agree exactly
    assert(bloomIds == exact, s"over-removal at fpp=1e-4: ${exact -- bloomIds}")
    // pure map-side: no join, no shuffle anywhere in the corpus plan
    val plan = viaBloom.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"bloom path must be a map-side probe:\n$plan")
  }

  test("stratifiedSample: exact n per stratum, deterministic, subset of input") {
    val df = (1L to 300L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val a = Sampling.stratifiedSample(df, $"src", $"id", n = 7, salt = "t")
    assert(a.groupBy($"src").count().as[(String, Long)].collect().toMap
      == Map("s0" -> 7L, "s1" -> 7L, "s2" -> 7L))
    val b = Sampling.stratifiedSample(df, $"src", $"id", n = 7, salt = "t")
    assert(a.select($"id").as[Long].collect().sorted
      .sameElements(b.select($"id").as[Long].collect().sorted))
    // different salt -> (almost surely) different members, same counts
    val c = Sampling.stratifiedSample(df, $"src", $"id", n = 7, salt = "u")
    assert(!c.select($"id").as[Long].collect().sorted
      .sameElements(a.select($"id").as[Long].collect().sorted))
  }

  test("stratifiedSample keeps whole strata smaller than n") {
    val df = Seq((1L, "tiny"), (2L, "tiny")).toDF("id", "src")
    assert(Sampling.stratifiedSample(df, $"src", $"id", n = 10).count() == 2L)
  }

  test("hashSample: fraction edges, determinism, rough proportion") {
    val df = (1L to 2000L).toDF("id")
    assert(Sampling.hashSample(df, $"id", 0.0).count() == 0L)
    assert(Sampling.hashSample(df, $"id", 1.0).count() == 2000L)
    val n = Sampling.hashSample(df, $"id", 0.3, salt = "t").count()
    assert(n > 450 && n < 750, s"0.3 of 2000 sampled $n") // ±25% tolerance
    val a = Sampling.hashSample(df, $"id", 0.3, salt = "t").as[Long].collect().sorted
    val b = Sampling.hashSample(df, $"id", 0.3, salt = "t").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("hashSample plans no shuffle") {
    val df = (1L to 100L).toDF("id")
    val plan = Sampling.hashSample(df, $"id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"map-side filter must not shuffle:\n$plan")
  }

  test("weightedHashSample: per-stratum fractions, consistent with hashSample") {
    val df = (1L to 3000L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "de"))
      .toDF("id", "lang")
    val sampled = Sampling.weightedHashSample(
      df, $"id", $"lang", Map("en" -> 1.0, "zh" -> 0.0), defaultFraction = 0.5, salt = "t")
    val counts = sampled.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(counts("en") == 1000L, s"fraction 1.0 must keep all: $counts")
    assert(!counts.contains("zh"), s"fraction 0.0 must drop all: $counts")
    assert(counts("de") > 300 && counts("de") < 700, s"default 0.5: $counts")
    // per-stratum membership == plain hashSample at that fraction
    val deOnly = Sampling.hashSample(df.filter($"lang" === "de"), $"id", 0.5, salt = "t")
      .select($"id").as[Long].collect().sorted
    val deViaWeighted = sampled.filter($"lang" === "de")
      .select($"id").as[Long].collect().sorted
    assert(deOnly.sameElements(deViaWeighted))
  }

  test("mixCorpus: downsample-only default, composition near weights") {
    // 1000 "crawl" rows, 200 "wiki" rows; equal weights → the largest
    // feasible mixture without upsampling is bound by wiki: T = 400
    val df = ((1L to 1000L).map(i => (i, "crawl")) ++
      (2001L to 2200L).map(i => (i, "wiki"))).toDF("id", "src")
    val mix = Sampling.mixCorpus(df, $"id", $"src",
      weights = Map("crawl" -> 1.0, "wiki" -> 1.0), salt = "m")
    val counts = mix.groupBy($"src").count().as[(String, Long)].collect().toMap
    // wiki target 200 of 200 → fraction 1.0 keeps all; crawl ~200 of 1000
    assert(counts("wiki") == 200L, s"binding source keeps all rows: $counts")
    assert(counts("crawl") > 140 && counts("crawl") < 260, s"~200 expected: $counts")
    assert(mix.select($"epoch").distinct().as[Long].collect().toSeq == Seq(0L))
    // deterministic across reruns
    val again = Sampling.mixCorpus(df, $"id", $"src",
      weights = Map("crawl" -> 1.0, "wiki" -> 1.0), salt = "m")
    assert(mix.select($"id", $"epoch").as[(Long, Long)].collect().sorted
      .sameElements(again.select($"id", $"epoch").as[(Long, Long)].collect().sorted))
  }

  test("mixCorpus: upsampling replicates epochs; refused without the flag") {
    val df = ((1L to 900L).map(i => (i, "crawl")) ++
      (2001L to 2100L).map(i => (i, "wiki"))).toDF("id", "src")
    // 50/50 at T=600 → wiki target 300 of 100 rows → 3 epochs
    val e = intercept[IllegalArgumentException] {
      Sampling.mixCorpus(df, $"id", $"src",
        weights = Map("crawl" -> 0.5, "wiki" -> 0.5), totalRows = 600L)
    }
    assert(e.getMessage.contains("allowUpsample"))
    val mix = Sampling.mixCorpus(df, $"id", $"src",
      weights = Map("crawl" -> 0.5, "wiki" -> 0.5), totalRows = 600L,
      allowUpsample = true, salt = "m")
    val wiki = mix.filter($"src" === "wiki")
    // target 300 over 100×3 candidates at fraction 1.0 → exactly 3 epochs of all
    assert(wiki.count() == 300L)
    assert(wiki.select($"epoch").distinct().as[Long].collect().sorted.toSeq
      == Seq(0L, 1L, 2L))
    val crawl = mix.filter($"src" === "crawl")
    assert(crawl.select($"epoch").distinct().as[Long].collect().toSeq == Seq(0L))
    assert(crawl.count() > 230 && crawl.count() < 370, s"~300: ${crawl.count()}")
  }

  test("mixCorpus plans no shuffle after the count pre-pass") {
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "src")
    val plan = Sampling.mixCorpus(df, $"id", $"src",
      weights = Map("a" -> 0.5, "b" -> 0.5)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mixing must stay map-side:\n$plan")
  }

  test("mixCorpusTemperature: sqrt weights flatten skew, binding source keeps all") {
    // 1600 "en" vs 100 "de" → milli-sqrt weights 40000:10000 → T = 500,
    // targets 400/100: the raw 94/6 skew flattens to 80/20 and the
    // small source (the binding one) keeps every row.
    val df = ((1L to 1600L).map(i => (i, "en")) ++
      (5001L to 5100L).map(i => (i, "de"))).toDF("id", "lang")
    val mix = Sampling.mixCorpusTemperature(df, $"id", $"lang",
      sources = Seq("en", "de"), salt = "t")
    val counts = mix.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(counts("de") == 100L, s"binding source keeps all rows: $counts")
    assert(counts("en") > 330 && counts("en") < 470, s"~400 expected: $counts")
    assert(mix.select($"epoch").distinct().as[Long].collect().toSeq == Seq(0L))
    val again = Sampling.mixCorpusTemperature(df, $"id", $"lang",
      sources = Seq("en", "de"), salt = "t")
    assert(mix.select($"id", $"epoch").as[(Long, Long)].collect().sorted
      .sameElements(again.select($"id", $"epoch").as[(Long, Long)].collect().sorted))
  }

  test("mixCorpusTemperature: upsample refused without the flag, honored with it") {
    val df = ((1L to 1600L).map(i => (i, "en")) ++
      (5001L to 5100L).map(i => (i, "de"))).toDF("id", "lang")
    // totalRows = 1000 → de target 200 of 100 rows → 2 epochs
    val e = intercept[IllegalArgumentException] {
      Sampling.mixCorpusTemperature(df, $"id", $"lang",
        sources = Seq("en", "de"), totalRows = 1000L)
    }
    assert(e.getMessage.contains("allowUpsample"))
    val mix = Sampling.mixCorpusTemperature(df, $"id", $"lang",
      sources = Seq("en", "de"), totalRows = 1000L, allowUpsample = true,
      salt = "t")
    val de = mix.filter($"lang" === "de")
    assert(de.count() == 200L, s"2 full epochs of 100: ${de.count()}")
    assert(de.select($"epoch").distinct().as[Long].collect().sorted.toSeq
      == Seq(0L, 1L))
  }

  test("mixCorpusTemperature: missing source fails fast; map-side after pre-pass") {
    val df = (1L to 50L).map(i => (i, "en")).toDF("id", "lang")
    val e = intercept[IllegalArgumentException] {
      Sampling.mixCorpusTemperature(df, $"id", $"lang", sources = Seq("en", "xx"))
    }
    assert(e.getMessage.contains("xx"))
    val plan = Sampling.mixCorpusTemperature(df, $"id", $"lang",
      sources = Seq("en")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"mixing must stay map-side:\n$plan")
  }

  test("Web: host/domain extraction and blocklist filtering") {
    import graft.text.Web
    val df = Seq(
      (1L, "https://www.spam.example.com/page?q=1"),
      (2L, "http://good.example.org/a/b"),
      (3L, "https://user:pw@www.Weird.NET:8443/x"),
      (4L, "not a url at all"),
      (5L, "ftp://spam.example.com/file")
    ).toDF("id", "url")
    val domains = df.select($"id", Web.domainOf($"url").as("d"))
      .as[(Long, String)].collect().toMap
    assert(domains(1L) == "spam.example.com")
    assert(domains(2L) == "good.example.org")
    assert(domains(3L) == "weird.net") // userinfo skipped, port cut, lowered
    assert(domains(4L) == "")          // non-URL -> empty, never a false block
    assert(domains(5L) == "spam.example.com")
    // literal blocklist: map-side NOT IN, no shuffle
    val kept = Web.filterBlockedDomains(df, $"url", Seq("spam.example.com"))
    assert(kept.select($"id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))
    assert(!kept.queryExecution.executedPlan.toString.contains("Exchange"))
    // DataFrame blocklist: anti-join, same survivors
    val keptDf = Web.filterBlockedDomains(df, $"url",
      Seq("spam.example.com").toDF("domain"))
    assert(keptDf.select($"id").as[Long].collect().sorted.toSeq == Seq(2L, 3L, 4L))
  }

  test("bigramNll: closed-form conditional logprobs, short docs get 0 bigrams") {
    // corpus bigrams: "a b"x2 (d1+d2), "b a"x1, "a c"x1
    // P(b|a)=2/3, P(c|a)=1/3, P(a|b)=1 -> micro-nats -405465, -1098612, 0
    val docs = Seq(
      (1L, "a b a c"), // bigrams: a b / b a / a c
      (2L, "a b"),
      (3L, "x") // single token -> no bigrams
    ).toDF("id", "text")
    val got = graft.text.Tfidf.bigramNll(docs, col("id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(got(0) == ((1L, 3L, 405465L + 0L + 1098612L, 1504077L / 3)), s"${got(0)}")
    assert(got(1) == ((2L, 1L, 405465L, 405465L)), s"${got(1)}")
    assert(got(2) == ((3L, 0L, 0L, -1L)), s"${got(2)}")
  }

  test("Web: registrable domain (eTLD+1) via the public-suffix snapshot") {
    import graft.text.Web
    val df = Seq(
      (1L, "https://a.example.co.uk/x"),        // multi-label suffix
      (2L, "https://www.example.co.uk/x"),      // www + multi-label
      (3L, "https://example.co.uk/x"),          // already registrable
      (4L, "https://deep.sub.example.com.au/x"),
      (5L, "https://a.b.example.com/x"),        // default 1-label rule
      (6L, "https://example.com/x"),
      (7L, "https://co.uk/"),                   // bare public suffix
      (8L, "https://localhost/x"),              // single label
      (9L, "not a url")
    ).toDF("id", "url")
    val got = df.select($"id", Web.registrableDomainOf($"url").as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "example.co.uk")
    assert(got(2L) == "example.co.uk")
    assert(got(3L) == "example.co.uk")
    assert(got(4L) == "example.com.au")
    assert(got(5L) == "example.com")
    assert(got(6L) == "example.com")
    assert(got(7L) == "co.uk")     // pass-through: no registrable to extract
    assert(got(8L) == "localhost")
    assert(got(9L) == "")
    // a registrable-keyed blocklist blocks every subdomain depth, and
    // 'example.co.uk' does NOT block 'example.com'
    val kept = Web.filterBlockedRegistrable(df, $"url", Seq("example.co.uk"))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(4L, 5L, 6L, 7L, 8L, 9L))
    assert(!Web.filterBlockedRegistrable(df, $"url", Seq("example.co.uk"))
      .queryExecution.executedPlan.toString.contains("Exchange"))
    val keptDf = Web.filterBlockedRegistrable(df, $"url",
      Seq("example.com.au", "example.com").toDF("domain"))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(keptDf == Seq(1L, 2L, 3L, 7L, 8L, 9L))
  }

  test("normalizeUrl: each canonicalization rule, non-URL passthrough") {
    import graft.text.Web
    val df = Seq(
      // scheme/host case + www strip + default port + trailing slash
      (1L, "HTTPS://WWW.Example.COM:443/Path/"),
      // non-default port kept; path case kept
      (2L, "http://example.com:8080/A/b"),
      // http default port stripped; https' 443 on http KEPT
      (3L, "http://example.com:80/x"),
      (4L, "http://example.com:443/x"),
      // tracking params dropped, remainder sorted, fragment dropped
      (5L, "https://example.com/p?utm_source=n&b=2&a=1&gclid=9#frag"),
      // tracking-only query loses its '?'; empty params vanish
      (6L, "https://example.com/p?utm_campaign=x&fbclid=1&"),
      (7L, "https://example.com/p?ref=tw&z=1&ref2=keep"),
      // userinfo skipped for host; root path collapses
      (8L, "https://u:pw@Www.Example.com/"),
      // identical pages differing only in canonicalized bits
      (9L, "https://www.example.com/doc?b=2&a=1#x"),
      (10L, "https://example.com:443/doc/?a=1&b=2&utm_medium=m"),
      (11L, "not a url"),
      (12L, "")
    ).toDF("id", "url")
    val got = df.select($"id", Web.normalizeUrl($"url").as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "https://example.com/Path")
    assert(got(2L) == "http://example.com:8080/A/b")
    assert(got(3L) == "http://example.com/x")
    assert(got(4L) == "http://example.com:443/x")
    assert(got(5L) == "https://example.com/p?a=1&b=2")
    assert(got(6L) == "https://example.com/p")
    assert(got(7L) == "https://example.com/p?ref2=keep&z=1")
    assert(got(8L) == "https://example.com")
    assert(got(9L) == got(10L), s"9=${got(9L)} 10=${got(10L)}")
    assert(got(11L) == "not a url")
    assert(got(12L) == "")
    // map-side: no Exchange in the plan
    assert(!df.select(Web.normalizeUrl($"url"))
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("htmlToText: script/style content, comments, tags, entities, whitespace") {
    import graft.text.Web
    val df = Seq(
      // script content removed even with '<'/'>' inside code
      (1L, "<p>keep</p><script>if (a<b && c>d) { x('y'); }</script><p>tail</p>"),
      // style content removed; case-insensitive open tags
      (2L, "<STYLE>p{color:red}</STYLE><B>bold</B> text"),
      // comments vanish including markup inside them
      (3L, "before<!-- <b>secret</b> -->after"),
      // tags become separators: adjacent blocks don't fuse
      (4L, "<p>one</p><p>two</p>"),
      // entity decode, &amp; last so &amp;lt; decodes one level
      (5L, "Fish &amp; Chips &lt;tm&gt; it&#39;s &quot;q&quot; a&nbsp;b &amp;lt;raw"),
      // unterminated script keeps its text (only the dangling tag strips)
      (6L, "<p>x</p><script>orphan code"),
      (7L, "   lots \n\t of   space   ")
    ).toDF("id", "html")
    val got = df.select($"id", Web.htmlToText($"html").as("t"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "keep tail")
    assert(got(2L) == "bold text")
    assert(got(3L) == "before after")
    assert(got(4L) == "one two")
    assert(got(5L) == "Fish & Chips <tm> it's \"q\" a b &lt;raw")
    assert(got(6L) == "x orphan code")
    assert(got(7L) == "lots of space")
    // null-safe and map-side
    assert(df.select(Web.htmlToText(lit(null.asInstanceOf[String]))).head().isNullAt(0))
    assert(!df.select(Web.htmlToText($"html"))
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("htmlBlocks: link-density cuts nav/footer, keeps prose; script content never splits") {
    import graft.text.Web
    val html = "<html><body>" +
      "<nav><a href='/'>Home</a> <a href='/a'>About us here</a></nav>" +
      "<script>var x = '<p>not a block</p>';</script>" +
      "<p>This is a real paragraph of prose with many plain tokens " +
      "and just one <a href='/r'>reference</a> inside it.</p>" +
      "<footer><a href='/p'>Privacy policy</a> <a href='/t'>Terms</a></footer>" +
      "</body></html>"
    val df = Seq((1L, html)).toDF("id", "html")
    val got = Web.htmlBlocks(df, $"id", $"html", minTokens = 5, maxAnchorPct = 50)
      .orderBy($"block_idx")
      .as[(Long, Int, Long, Long, Boolean, String)].collect().toSeq
    // script content produced no block (removed before the split)
    assert(!got.exists(_._6.contains("not a block")), got)
    val nav = got.find(_._6.startsWith("Home")).get
    assert(nav._3 == 4L && nav._4 == 4L && !nav._5, nav) // 100% anchor
    val prose = got.find(_._6.startsWith("This is a real")).get
    assert(prose._5, prose)
    assert(prose._4 == 1L, prose) // only "reference" is anchor text
    val footer = got.find(_._6.startsWith("Privacy")).get
    assert(!footer._5, footer)
    // a short all-plain block fails the min-token gate
    val short = Web.htmlBlocks(
        Seq((2L, "<p>too few words</p>")).toDF("id", "html"),
        $"id", $"html", minTokens = 5, maxAnchorPct = 50)
      .as[(Long, Int, Long, Long, Boolean, String)].head()
    assert(short._3 == 3L && !short._5, short)
    // map-side: no Exchange
    assert(!Web.htmlBlocks(df, $"id", $"html")
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("htmlBlocks: tag-name boundaries — <abbr> is not an anchor, <path>/<link> not blocks") {
    import graft.text.Web
    val html = "<html><body>" +
      // <abbr> must not start an anchor span that swallows the prose
      "<p><abbr title='HyperText'>HTML</abbr> is the standard markup " +
      "language for building documents with a <a href='/r'>reference</a></p>" +
      // <path>/<link>-class tags must not split the paragraph
      "<p>Total <svg><path d='M0 0'/></svg> sales rose strongly this " +
      "quarter across <link rel='x'/> every region we track</p>" +
      "</body></html>"
    val got = Web.htmlBlocks(Seq((1L, html)).toDF("id", "html"),
        $"id", $"html", minTokens = 5, maxAnchorPct = 50)
      .as[(Long, Int, Long, Long, Boolean, String)].collect().toSeq
    val abbr = got.find(_._6.startsWith("HTML is")).get
    assert(abbr._4 == 1L, s"only 'reference' is anchor text: $abbr")
    assert(abbr._5, abbr)
    val svg = got.find(_._6.startsWith("Total")).get
    assert(svg._6.contains("sales rose") && svg._6.contains("every region"),
      s"<path>/<link> must not split the block: $svg")
    assert(svg._5, svg)
  }

  test("normalizeUrl: a '?' inside the fragment is not a query string") {
    import graft.text.Web
    val df = Seq(
      // SPA-style routes: everything after '#' must vanish, including '?'
      (1L, "https://example.com/app#/route?tab=1"),
      (2L, "https://example.com/app#/route?tab=2&x=9"),
      // a real query AND a '?' in the fragment: only the real one survives
      (3L, "https://example.com/app?b=2&a=1#/r?z=3"),
      (4L, "https://example.com/app#?")
    ).toDF("id", "url")
    val got = df.select($"id", Web.normalizeUrl($"url").as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "https://example.com/app")
    assert(got(2L) == "https://example.com/app")
    assert(got(1L) == got(2L), "fragment-only differences must canonicalize equal")
    assert(got(3L) == "https://example.com/app?a=1&b=2")
    assert(got(4L) == "https://example.com/app")
  }

  test("duplicateSegmentStats counts repeats of identical segments") {
    import graft.text.TextFunctions
    val docs = Seq(
      (1L, "a b a b a b"),       // 3 segments "a b" -> 2 dups
      (2L, "a b c d e f"),       // 3 distinct segments
      (3L, "x"),                 // 1 partial segment
      (4L, "")                   // empty
    ).toDF("id", "text")
    val got = docs.select($"id",
        TextFunctions.duplicateSegmentStats($"text", k = 2).as("d"))
      .select($"id", $"d.n_segments", $"d.dup_segments", $"d.dup_fraction")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 2L, 0.6667)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 3L, 0L, 0.0)))
    assert(got(3L) == ((3L, 1L, 0L, 0.0)))
    assert(got(4L) == ((4L, 0L, 0L, 0.0)))
    assert(!docs.select(TextFunctions.duplicateSegmentStats($"text", 2))
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("gopherFlags: each rule fires independently; pass is their AND") {
    import graft.text.TextFunctions
    val docs = Seq(
      (1L, ("the is lexicon " * 20).trim),          // all rules pass
      (2L, "the is short doc"),                     // words_ok fails
      (3L, ("ab xy zz qq the is " * 10).trim),      // mean len < 3
      (4L, ("12345 67890 the is words here now " * 8).trim), // digits heavy
      (5L, ("lexicon semantic corpus " * 20).trim)  // no stopwords
    ).toDF("id", "text")
    val out = docs.select($"id",
        TextFunctions.gopherFlags($"text", minWords = 10, maxWords = 1000,
          minMeanWordLen = 3.0, maxMeanWordLen = 10.0,
          maxDigitRatio = 0.1, minStopwordHits = 2).as("g"))
      .select($"id", $"g.words_ok", $"g.mean_word_len_ok", $"g.digit_ok",
        $"g.stopword_ok", $"g.pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, true, true, true, true, true)))
    assert(!out(2L)._2 && !out(2L)._6, s"short doc must fail words_ok: ${out(2L)}")
    assert(!out(3L)._3 && !out(3L)._6, s"tiny words must fail mean len: ${out(3L)}")
    assert(!out(4L)._4 && !out(4L)._6, s"digit-heavy must fail: ${out(4L)}")
    assert(!out(5L)._5 && !out(5L)._6, s"no stopwords must fail: ${out(5L)}")
    // pure map-side projection
    assert(!docs.select(TextFunctions.gopherFlags($"text"))
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("assignSplit: disjoint exhaustive labels, consistent with hashSample") {
    val df = spark.range(1000).toDF("id")
    val out = Sampling.assignSplit(df, col("id"),
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), salt = "sx")
    assert(out.count() == 1000)
    val byLabel = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > 700 && byLabel("train") < 900)
    // the train partition IS hashSample(0.8) with the same salt
    val sampled = Sampling.hashSample(df, col("id"), 0.8, salt = "sx")
      .collect().map(_.getLong(0)).toSet
    val train = out.filter(col("split") === "train")
      .collect().map(_.getLong(0)).toSet
    assert(train == sampled)
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(df, col("id"), Seq(("a", 0.5), ("b", 0.4)))
    }
  }

  test("inverted index + conjunctive search agree with direct filters") {
    val docs = Seq(
      (1L, "spark window join"), (2L, "spark filter"),
      (3L, "window only here"), (4L, "spark window agg")
    ).toDF("id", "txt")
    // default chunkSize >> 4 ids: every term collapses to one chunk
    val idx = graft.text.TextFunctions.invertedIndex(docs, col("id"), col("txt"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getSeq[Long](3))).toMap
    assert(idx("spark") == ((3L, Seq(1L, 2L, 4L))))
    assert(idx("window") == ((3L, Seq(1L, 3L, 4L))))
    val hits = graft.text.TextFunctions.searchAll(
        docs, col("id"), col("txt"), Seq("spark", "window", "spark"))
      .collect().map(_.getLong(0)).sorted
    assert(hits.toSeq == Seq(1L, 4L))
  }

  test("inverted index: chunked output reassembles to the unchunked index") {
    // pseudo-random corpus (deterministic seed arithmetic, no RNG):
    // chunked postings, concatenated per term in chunk order, must equal
    // the single-chunk index's postings, and doc_freq must agree on
    // every chunk row
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon")
    val docs = spark.range(200).select($"id",
      concat_ws(" ",
        element_at(lit(words), ($"id" % 5 + 1).cast("int")),
        element_at(lit(words), ($"id" * 7 % 5 + 1).cast("int")),
        element_at(lit(words), ($"id" * 13 % 5 + 1).cast("int"))).as("txt"))
    def index(chunk: Int) = graft.text.TextFunctions
      .invertedIndex(docs, col("id"), col("txt"), chunkSize = chunk)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getSeq[Long](3)))
    val whole = index(1 << 20)
      .map { case (t, _, df, ids) => t -> ((df, ids)) }.toMap
    val chunked = index(17)
    val reassembled = chunked.groupBy(_._1).map { case (t, rows) =>
      t -> rows.sortBy(_._2).flatMap(_._4).toSeq
    }
    assert(reassembled.keySet == whole.keySet)
    for ((t, ids) <- reassembled) {
      assert(ids == whole(t)._2, s"term $t postings differ")
      assert(chunked.filter(_._1 == t).forall(_._3 == whole(t)._1),
        s"term $t doc_freq differs on some chunk")
      assert(chunked.filter(_._1 == t).forall(_._4.size <= 17))
    }
  }

  test("inverted index chunks bound row size on a degenerate one-term corpus") {
    // every doc is the same single token — the shape that made the old
    // unchunked layout one giant straggler row per stop-word term
    val n = 1000L
    val docs = spark.range(n).select($"id", lit("the").as("txt"))
    val rows = graft.text.TextFunctions
      .invertedIndex(docs, col("id"), col("txt"), chunkSize = 64)
      .collect()
    assert(rows.forall(_.getString(0) == "the"))
    assert(rows.forall(_.getLong(2) == n))           // doc_freq on every chunk
    assert(rows.forall(_.getSeq[Long](3).size <= 64)) // bounded postings
    assert(rows.length == math.ceil(n / 64.0).toInt)
    // chunk_idx order concatenation reproduces the sorted posting list
    val concat = rows.sortBy(_.getLong(1)).flatMap(_.getSeq[Long](3)).toSeq
    assert(concat == (0L until n))
    // chunk key is the id value range, not a rank
    assert(rows.forall(r => r.getSeq[Long](3)
      .forall(d => d / 64 == r.getLong(1))))
  }

  test("packByBudget assigns packs by exclusive prefix sum per shard") {
    val df = Seq(
      ("A", 1L, 800L), ("A", 2L, 800L), ("A", 3L, 800L), ("A", 4L, 800L),
      ("B", 1L, 2500L), ("B", 2L, 1L)
    ).toDF("shard", "ord", "toks")
    val out = graft.ops.Packing.packByBudget(df, $"shard", $"ord", $"toks", budget = 2000L)
      .select($"shard", $"ord", $"pack_id").as[(String, Long, Long)].collect().toSet
    // A prefixes 0,800,1600,2400 -> packs 0,0,0,1; B prefixes 0,2500 -> 0,1
    assert(out == Set(
      ("A", 1L, 0L), ("A", 2L, 0L), ("A", 3L, 0L), ("A", 4L, 1L),
      ("B", 1L, 0L), ("B", 2L, 1L)))
  }

  test("packSequences: docs split across fixed windows, offsets and eod exact") {
    val df = Seq(
      ("A", 1L, 3L), ("A", 2L, 5L), ("A", 3L, 4L), // stream [0,3)[3,8)[8,12)
      ("A", 4L, 0L),                               // zero-token: dropped
      ("B", 1L, 9L)                                // [0,9) spans 3 windows
    ).toDF("shard", "ord", "toks")
    val out = graft.ops.Packing.packSequences(
        df, $"shard", $"ord", $"toks", seqLen = 4L)
      .select($"shard", $"seq_id", $"seq_off", $"doc", $"doc_off",
        $"n_tokens", $"eod")
      .as[(String, Long, Long, Long, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      ("A", 0L, 0L, 1L, 0L, 3L, true),   // doc1 fully inside window 0
      ("A", 0L, 3L, 2L, 0L, 1L, false),  // doc2 head fills window 0
      ("A", 1L, 0L, 2L, 1L, 4L, true),   // doc2 tail fills window 1
      ("A", 2L, 0L, 3L, 0L, 4L, true),
      ("B", 0L, 0L, 1L, 0L, 4L, false),
      ("B", 1L, 0L, 1L, 4L, 4L, false),
      ("B", 2L, 0L, 1L, 8L, 1L, true)))
    // every window except a shard's last is exactly full
    val fill = graft.ops.Packing.packSequences(
        df, $"shard", $"ord", $"toks", seqLen = 4L)
      .groupBy($"shard", $"seq_id").agg(sum($"n_tokens").as("n"))
      .as[(String, Long, Long)].collect()
    val lastSeq = fill.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    fill.foreach { case (sh, s, n) =>
      if (s < lastSeq(sh)) assert(n == 4L, s"window ($sh,$s) not full: $n")
      else assert(n <= 4L)
    }
    // slices tile each document without gaps or overlap
    val slices = out.toSeq.filter(_._1 == "B").sortBy(_._5)
    assert(slices.map(_._5) == Seq(0L, 4L, 8L)) // doc_off contiguous
    assert(slices.map(_._6).sum == 9L)
  }

  test("materializeSequences: token content tiles the stream exactly") {
    val df = Seq(
      ("A", 1L, Seq("a1", "a2", "a3")),
      ("A", 2L, Seq("b1", "b2", "b3", "b4", "b5")),
      ("A", 3L, Seq.empty[String]),
      ("B", 1L, Seq("c1", "c2"))
    ).toDF("shard", "ord", "toks")
    val out = graft.ops.Packing.materializeSequences(
        df, $"shard", $"ord", $"toks", seqLen = 4L)
      .orderBy($"shard", $"seq_id")
      .as[(String, Long, Seq[String], Long)].collect().toSeq
    assert(out == Seq(
      ("A", 0L, Seq("a1", "a2", "a3", "b1"), 4L),
      ("A", 1L, Seq("b2", "b3", "b4", "b5"), 4L),
      ("B", 0L, Seq("c1", "c2"), 2L)))
  }

  test("packManifest: ordered members, counts, totals per pack") {
    val df = Seq(
      ("A", 1L, 800L), ("A", 2L, 800L), ("A", 3L, 800L), ("A", 4L, 800L),
      ("B", 1L, 2500L), ("B", 2L, 1L)
    ).toDF("shard", "ord", "toks")
    val out = graft.ops.Packing.packManifest(
        df, $"shard", $"ord", $"toks", budget = 2000L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getSeq[Long](2), r.getSeq[Long](3), r.getLong(4)))).toMap
    assert(out(("A", 0L)) == ((Seq(1L, 2L, 3L), Seq(800L, 800L, 800L), 2400L)))
    assert(out(("A", 1L)) == ((Seq(4L), Seq(800L), 800L)))
    assert(out(("B", 0L)) == ((Seq(1L), Seq(2500L), 2500L)))
    assert(out(("B", 1L)) == ((Seq(2L), Seq(1L), 1L)))
  }

  test("tfidf broadcasts the document-frequency side (plan assert)") {
    val docs = (1L to 50L).map(i => (i, s"w$i common shared")).toDF("id", "txt")
    val plan = Tfidf.tfidf(docs, $"id", $"txt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"tf⋈df must broadcast the vocabulary side, not shuffle both:\n$plan")
  }

  test("tfidf matches hand-computed scores") {
    // 3 docs; "apple" in all 3 (idf=ln(1)=0), "banana" in 1 (idf=ln 3),
    // "cherry" twice in doc 3 and once in doc 2 (df=2)
    val docs = Seq(
      (1L, "apple banana"),
      (2L, "apple cherry"),
      (3L, "apple cherry cherry")
    ).toDF("id", "txt")
    val out = Tfidf.tfidf(docs, $"id", $"txt")
      .select($"doc_id", $"term", $"tf", $"df", $"tfidf")
      .as[(Long, String, Long, Long, Double)].collect().toSet
    val ln3 = math.log(3.0)
    val ln15 = math.log(1.5)
    def r(x: Double) = math.round(x * 10000.0) / 10000.0
    assert(out == Set(
      (1L, "apple", 1L, 3L, 0.0),
      (1L, "banana", 1L, 1L, r(ln3)),
      (2L, "apple", 1L, 3L, 0.0),
      (2L, "cherry", 1L, 2L, r(ln15)),
      (3L, "apple", 1L, 3L, 0.0),
      (3L, "cherry", 2L, 2L, r(2 * ln15))))
  }

  test("tfidf counts empty-token docs toward N but emits no rows for them") {
    val docs = Seq((1L, "apple"), (2L, "")).toDF("id", "txt")
    val out = Tfidf.tfidf(docs, $"id", $"txt")
      .select($"doc_id", $"term", $"tf", $"df", $"tfidf")
      .as[(Long, String, Long, Long, Double)].collect().toSet
    // N=2, df(apple)=1 -> idf = ln 2
    val r = math.round(math.log(2.0) * 10000.0) / 10000.0
    assert(out == Set((1L, "apple", 1L, 1L, r)))
  }

  test("redactPii masks email, ipv4 and phone; leaves clean text intact") {
    import graft.text.TextFunctions
    val df = Seq(
      (1L, "mail a.b+c@sub.example.org now"),
      (2L, "host 192.168.001.1 up"),
      (3L, "call +555-123-4567 or 555-987-6543"),
      (4L, "nothing sensitive 12.5 here v1.2.3.4.5")
    ).toDF("id", "txt")
    val got = df.select($"id", TextFunctions.redactPii($"txt").as("r"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == "mail <EMAIL> now")
    assert(got(2L) == "host <IP> up")
    assert(got(3L) == "call <PHONE> or <PHONE>")
    // no \b between "v" and "1", so the leftmost IP match is "2.3.4.5"
    assert(got(4L) == "nothing sensitive 12.5 here v1.<IP>")
  }

  test("dedupSegments drops corpus-frequent segments, keeps rest in order") {
    // segment "visit our sponsor" (k=3) planted in 3 of 4 docs
    val docs = Seq(
      (1L, "alpha beta gamma visit our sponsor delta epsilon zeta"),
      (2L, "visit our sponsor one two three four five six"),
      (3L, "unique words only in this document right here now"),
      (4L, "seven eight nine visit our sponsor ten eleven twelve")
    ).toDF("id", "txt")
    val out = graft.text.TextFunctions.dedupSegments(
        docs, col("id"), col("txt"), k = 3, minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ==
      Seq((1L, 3, 1), (2L, 3, 1), (3L, 3, 0), (4L, 3, 1)))
    assert(out(0).getString(3) == "alpha beta gamma delta epsilon zeta")
    assert(out(1).getString(3) == "one two three four five six")
    assert(out(2).getString(3) == "unique words only in this document right here now")
  }

  test("dedupSegments cleans the corpus map-side (no shuffle in the plan)") {
    val docs = Seq((1L, "a b c d"), (2L, "a b e f"), (3L, "a b g h")).toDF("id", "txt")
    val out = graft.text.TextFunctions.dedupSegments(
      docs, col("id"), col("txt"), k = 2, minDocs = 3)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(out.filter(col("segs_removed") =!= 1).isEmpty)
  }

  test("dedupSegments large lexicon: broadcast kernel, no giant plan literal") {
    // two docs share 5000 single-token segments → lexicon of 5000 > the
    // 4096 inline threshold → broadcast-variable path
    val shared = (0 until 5000).map(i => f"tok$i%04d").mkString(" ")
    val docs = Seq(
      (1L, shared), (2L, shared), (3L, "only unique words here")
    ).toDF("id", "txt")
    val out = graft.text.TextFunctions.dedupSegments(
      docs, col("id"), col("txt"), k = 1, minDocs = 2)
    val plan = out.queryExecution.executedPlan.toString
    // the 5000-entry lexicon must NOT be serialized into the plan: the
    // plan stays KB-sized and carries no native remove_in_set literal
    assert(!plan.contains("remove_in_set"))
    assert(plan.length < 100000, s"plan unexpectedly large: ${plan.length} chars")
    // still map-side only — the corpus never shuffles
    assert(!plan.contains("Exchange"))
    val rows = out.orderBy("doc_id").collect()
    assert(rows(0).getInt(1) == 5000 && rows(0).getInt(2) == 5000 &&
      rows(0).getString(3).isEmpty)
    assert(rows(2).getInt(2) == 0 &&
      rows(2).getString(3) == "only unique words here")
    // both delivery mechanisms implement identical semantics
    val viaInline = graft.text.TextFunctions.dedupSegments(
        docs, col("id"), col("txt"), k = 1, minDocs = 2,
        inlineThreshold = 1 << 20)
      .orderBy("doc_id").collect().map(_.toString)
    assert(rows.map(_.toString).sameElements(viaInline))
  }

  test("dedupSegments above maxLexicon: distributed anti-join tier, row-identical") {
    // corpus with a 6-entry lexicon (minDocs=2, k=1) plus edge docs: one
    // fully boilerplate (clean_text -> ""), one empty. maxLexicon=2 forces
    // the never-collected anti-join tier; semantics must match broadcast.
    val shared = "common words that repeat everywhere always"
    val docs = Seq(
      (1L, s"$shared plus something new"),
      (2L, shared), // fully removed
      (3L, s"fresh material here $shared"),
      (4L, "") // no segments at all
    ).toDF("id", "txt")
    val viaJoin = graft.text.TextFunctions.dedupSegments(
        docs, col("id"), col("txt"), k = 1, minDocs = 2, maxLexicon = 2)
      .orderBy("doc_id").collect()
    val viaBroadcast = graft.text.TextFunctions.dedupSegments(
        docs, col("id"), col("txt"), k = 1, minDocs = 2,
        inlineThreshold = 0) // force the broadcast tier as the yardstick
      .orderBy("doc_id").collect()
    assert(viaJoin.map(_.toString).sameElements(viaBroadcast.map(_.toString)))
    assert(viaJoin(1).getInt(2) == 6 && viaJoin(1).getString(3).isEmpty)
    assert(viaJoin(3).getInt(1) == 0 && viaJoin(3).getString(3).isEmpty)
    // the lexicon is never collected on this tier: the plan carries a real
    // anti-join instead of a remove_in_set literal or broadcast kernel
    val plan = graft.text.TextFunctions.dedupSegments(
        docs, col("id"), col("txt"), k = 1, minDocs = 2, maxLexicon = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"))
    assert(!plan.contains("remove_in_set"))
  }

  test("dedupSegmentsKeepFirst keeps only the globally-first occurrence") {
    // k=1 segments; "dup" occurs at (1,0), (1,2), (2,1), (3,0): only the
    // (1,0) copy survives. Within-doc repeats dedup too.
    val docs = Seq(
      (1L, "dup alpha dup beta"),
      (2L, "gamma dup delta"),
      (3L, "dup epsilon"),
      (4L, "") // empty doc: 0 segments, clean_text ""
    ).toDF("id", "txt")
    val out = graft.text.TextFunctions.dedupSegmentsKeepFirst(
        docs, col("id"), col("txt"), k = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 4, 1, "dup alpha beta"),
      (2L, 3, 1, "gamma delta"),
      (3L, 2, 1, "epsilon"),
      (4L, 0, 0, "")))
    // order within the keeper doc is preserved even when later positions win
    val swap = Seq((1L, "b a"), (2L, "a b")).toDF("id", "txt")
    val got = graft.text.TextFunctions.dedupSegmentsKeepFirst(
        swap, col("id"), col("txt"), k = 1)
      .orderBy("doc_id").collect().map(_.getString(3))
    assert(got.toSeq == Seq("b a", "")) // doc 2's "a b" both seen first in doc 1
  }

  test("duplicateSpans: coverage union, window bounds, short docs") {
    // L=3. "one two three four" appears in docs 1 and 2 → windows
    // "one two three" and "two three four" duplicated; doc 1 tokens 0-3
    // covered (4 of 6), doc 2 tokens 1-4 covered (4 of 5).
    val docs = Seq(
      (1L, "one two three four fife six"),
      (2L, "zero one two three four"),
      (3L, "totally different words here"),
      (4L, "tiny doc"), // 2 tokens < L → 0 windows
      (5L, "") // empty
    ).toDF("id", "txt")
    val out = graft.text.TextFunctions.duplicateSpans(
        docs, col("id"), col("txt"), windowL = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1L, 6, 4, 2, 4, 0.6667),
      (2L, 5, 3, 2, 4, 0.8),
      (3L, 4, 2, 0, 0, 0.0),
      (4L, 2, 0, 0, 0, 0.0),
      (5L, 0, 0, 0, 0, 0.0)))
    // within-one-doc repetition also counts as duplication
    val selfRep = Seq((1L, "spam spam spam spam")).toDF("id", "txt")
    val sr = graft.text.TextFunctions.duplicateSpans(
        selfRep, col("id"), col("txt"), windowL = 2)
      .collect()(0)
    assert(sr.getInt(3) == 3 && sr.getInt(4) == 4 && sr.getDouble(5) == 1.0)
  }

  test("removeDuplicateSpans: keeper survives, later occurrences cut") {
    val docs = Seq(
      (1L, "one two three four fife six"),
      (2L, "zero one two three four"),
      (3L, "totally different words here")
    ).toDF("id", "txt")
    val out = graft.text.TextFunctions.removeDuplicateSpans(
        docs, col("id"), col("txt"), windowL = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // doc 1 holds the first occurrences of both duplicated windows →
    // untouched; doc 2 loses the covered positions 1-4, keeping "zero"
    assert(out.toSeq == Seq(
      (1L, 6, 0, "one two three four fife six"),
      (2L, 5, 4, "zero"),
      (3L, 4, 0, "totally different words here")))
    // within-doc repetition: "spam spam" keeper at pos 0, cuts pos 1-3
    val sr = graft.text.TextFunctions.removeDuplicateSpans(
        Seq((1L, "spam spam spam spam")).toDF("id", "txt"),
        col("id"), col("txt"), windowL = 2)
      .collect()(0)
    assert(sr.getInt(1) == 4 && sr.getInt(2) == 3 && sr.getString(3) == "spam")
  }

  test("contaminationScore: exact fractions, map-side plan, tier parity") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated content with fresh words"),
      (3L, "")
    ).toDF("id", "txt")
    val bench = Seq("the quick brown fox ran away").toDF("txt")
    val out = graft.text.Decontaminate.contaminationScore(
        corpus, col("id"), col("txt"), bench, col("txt"), shingleK = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    // doc 1: 7 distinct 3-shingles, 2 of them ("the quick brown",
    // "quick brown fox") in the bench set
    assert(out(0) == ((1L, 7, 2, 0.2857)))
    assert(out(1)._3 == 0 && out(1)._4 == 0.0)
    // empty doc collapses to the single "" shingle, unmatched
    assert(out(2) == ((3L, 1, 0, 0.0)))
    // the probe is map-side: no Exchange, no Join in the corpus scan
    val plan = graft.text.Decontaminate.contaminationScore(
        corpus, col("id"), col("txt"), bench, col("txt"), shingleK = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"))
    // broadcast tier (inlineThreshold=0) is value-identical to inline
    val (viaBcDf, bcRoute) = graft.text.Decontaminate.contaminationScoreRouted(
      corpus, col("id"), col("txt"), bench, col("txt"), shingleK = 3,
      inlineThreshold = 0)
    val viaBc = viaBcDf.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.sameElements(viaBc))
    assert(bcRoute == "broadcast")
  }

  test("contaminationScore: oversized benchmarks auto-route to the bloom tier") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated content with fresh words"),
      (3L, "")
    ).toDF("id", "txt")
    val bench = Seq("the quick brown fox ran away").toDF("txt")
    val (exactDf, exactRoute) = graft.text.Decontaminate.contaminationScoreRouted(
      corpus, col("id"), col("txt"), bench, col("txt"), shingleK = 3)
    val exact = exactDf.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(exactRoute == "inline")
    // a 1-shingle cap forces the route the driver would take on a
    // benchmark too large to collect: no exact-set collect, a
    // distributed-merged bloom probe, CONSERVATIVE counts (>= exact;
    // at 0.01% fpp over 6 shingles, equality in practice)
    val (bloomDf, bloomRoute) = graft.text.Decontaminate.contaminationScoreRouted(
      corpus, col("id"), col("txt"), bench, col("txt"), shingleK = 3,
      maxBenchShingles = 1)
    val bloom = bloomDf.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(bloomRoute == "bloom")
    exact.zip(bloom).foreach { case ((id, n, m), (idB, nB, mB)) =>
      assert(id == idB && n == nB, "ids and shingle counts must agree")
      assert(mB >= m, s"bloom tier undercounted doc $id: $mB < $m")
      assert(mB <= n, s"bloom tier counted more matches than shingles on doc $id")
    }
    // still map-side: no Exchange, no Join in the corpus scan
    val plan = graft.text.Decontaminate.contaminationScore(
        corpus, col("id"), col("txt"), bench, col("txt"), shingleK = 3,
        maxBenchShingles = 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"))
  }

  test("chunkDocs: overlap, partial tail, short and empty docs") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens, k=4 s=2 → chunks at 0,2,4,6
      (2L, "x y"),                 // shorter than k → one whole-doc chunk
      (3L, "")                     // empty → no chunks
    ).toDF("id", "txt")
    val out = graft.text.TextFunctions.chunkDocs(
        docs, col("id"), col("txt"), k = 4, stride = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 0, 4, "a b c d"), (1L, 1, 4, "c d e f"),
      (1L, 2, 4, "e f g h"), (1L, 3, 4, "g h i j"),
      (2L, 0, 2, "x y")))
    // stride == k → non-overlapping partition of the tokens
    val flat = graft.text.TextFunctions.chunkDocs(
        docs.filter(col("id") === 1L), col("id"), col("txt"), k = 4, stride = 4)
      .collect().map(_.getString(3))
    assert(flat.sorted.toSeq == Seq("a b c d", "e f g h", "i j"))
  }

  test("profile: one row per column with null/distinct/bounds") {
    val df = Seq(
      (1L, Some("x"), 10),
      (2L, None, 20),
      (3L, Some("y"), 20)
    ).toDF("id", "s", "v")
    val p = graft.ops.Profile.profile(df, Seq("id", "s", "v"))
      .orderBy("column_name").collect()
    assert(p.map(_.getString(0)).toSeq == Seq("id", "s", "v"))
    val byName = p.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(byName("id") == ((3L, 0L, 3L, "1", "3")))
    assert(byName("s") == ((3L, 1L, 2L, "x", "y")))
    assert(byName("v") == ((3L, 0L, 2L, "10", "20")))
    intercept[IllegalArgumentException] {
      graft.ops.Profile.profile(df, Seq("nope"))
    }
    // width gate: the exact Expand is O(rows x cols) — wide profiles are
    // refused unless the caller raises the limit explicitly
    intercept[IllegalArgumentException] {
      graft.ops.Profile.profile(df, Seq("id", "s", "v"), maxExactCols = 2)
    }
    assert(graft.ops.Profile.profile(df, Seq("id", "s", "v"), maxExactCols = 3)
      .count() == 3L)
  }

  test("profileApprox: HLL distinct within rsd, no Expand in the plan") {
    val df = spark.range(20000).toDF("id")
      .withColumn("m", col("id") % 1000)
    val exact = graft.ops.Profile.profile(df, Seq("id", "m"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val approx = graft.ops.Profile.profileApprox(df, Seq("id", "m"), rsd = 0.05)
    val got = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    Seq("id", "m").foreach { c =>
      val err = math.abs(got(c).toDouble - exact(c)) / exact(c)
      assert(err < 0.15, s"$c: approx ${got(c)} vs exact ${exact(c)}")
    }
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
    // the exact multi-column profile needs an Expand; the HLL one doesn't
    assert(graft.ops.Profile.profile(df, Seq("id", "m"))
      .queryExecution.executedPlan.toString.contains("Expand"))
  }

  test("repetitionStats computes top-gram ratio per doc") {
    import graft.text.TextFunctions
    val df = Seq(
      (1L, "a b a b a"),      // 2-grams: ab,ba,ab,ba -> top 2 of 4
      (2L, "x x x x"),        // xx,xx,xx -> top 3 of 3
      (3L, "one")             // short doc -> single whole-text gram
    ).toDF("id", "txt")
    val got = TextFunctions.repetitionStats(df, $"id", $"txt", k = 2)
      .select($"doc_id", $"n_grams", $"top_count", $"rep_ratio")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 4L, 2L, 0.5), (2L, 3L, 3L, 1.0), (3L, 1L, 1L, 1.0)))
  }

  test("search index: incremental build+append serves search and BM25 " +
      "identically to from-scratch runs; spec guard") {
    val docs = Seq(
      (0L, "spark window spark join"), (1L, "window functions in spark"),
      (2L, "nothing relevant here"), (3L, "spark only"),
      (4L, "window only window"), (5L, "spark window again")
    ).toDF("id", "txt")
    val dir = java.nio.file.Files.createTempDirectory("graft-sidx").toString
    graft.text.SearchIndex.buildSearchIndex(
      docs.filter($"id" % 2 === 0), col("id"), col("txt"), dir, chunkSize = 2)
    graft.text.SearchIndex.appendToSearchIndex(
      docs.filter($"id" % 2 === 1), col("id"), col("txt"), dir, chunkSize = 2)
    val terms = Seq("spark", "window")
    // search parity with the raw-text path over the SAME corpus
    val fromIdx = graft.text.SearchIndex.searchIndexAll(spark, dir, terms,
      chunkSize = 2).as[Long].collect().sorted.toSeq
    val scratch = graft.text.TextFunctions.searchAll(
      docs, col("id"), col("txt"), terms).as[Long].collect().sorted.toSeq
    assert(fromIdx == scratch && fromIdx == Seq(0L, 1L, 5L))
    // BM25 parity: shared scoring body + exact stored stats ⇒ identical
    val bIdx = graft.text.SearchIndex.bm25Index(spark, dir, terms, chunkSize = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bRaw = graft.text.Tfidf.bm25(docs, col("id"), col("txt"), terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bIdx == bRaw && bIdx.nonEmpty)
    // chunk bound honored: no postings row exceeds chunkSize entries
    val maxLen = spark.read.parquet(s"$dir/postings")
      .agg(max(size($"postings"))).head.getInt(0)
    assert(maxLen <= 2)
    // probing or appending with a different chunkSize → must throw
    val e = intercept[IllegalArgumentException] {
      graft.text.SearchIndex.searchIndexAll(spark, dir, terms, chunkSize = 8)
    }
    assert(e.getMessage.contains("mismatched parameters"))
    // plan audit: the term-IN probe reaches the postings parquet scan as
    // a pushed filter (row-group pruning at scale), and the corpus
    // documents table appears nowhere in the served plan
    val plan = graft.text.SearchIndex.searchIndexAll(spark, dir, terms,
      chunkSize = 2).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"))
  }

  test("search index segments: committed-only reads, retry idempotence, " +
      "base+segment parity") {
    val docs = Seq(
      (0L, "spark window spark join"), (1L, "window functions in spark"),
      (2L, "nothing relevant here"), (3L, "spark only"),
      (4L, "window only window"), (5L, "spark window again")
    ).toDF("id", "txt")
    val dir = java.nio.file.Files.createTempDirectory("graft-sseg").toString
    val terms = Seq("spark", "window")
    // base build (even) + one committed segment (odd)
    graft.text.SearchIndex.buildSearchIndex(
      docs.filter($"id" % 2 === 0), col("id"), col("txt"), dir, chunkSize = 2)
    graft.text.SearchIndex.appendSegment(
      docs.filter($"id" % 2 === 1), col("id"), col("txt"), dir, "b1",
      chunkSize = 2)
    def search() = graft.text.SearchIndex.searchIndexAll(spark, dir, terms,
      chunkSize = 2).as[Long].collect().sorted.toSeq
    def bm25() = graft.text.SearchIndex.bm25Index(spark, dir, terms,
      chunkSize = 2).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(search() == Seq(0L, 1L, 5L))
    // retry idempotence: re-running the same segment id changes nothing
    val before = bm25()
    graft.text.SearchIndex.appendSegment(
      docs.filter($"id" % 2 === 1), col("id"), col("txt"), dir, "b1",
      chunkSize = 2)
    assert(bm25() == before)
    // parity with the from-scratch run over the whole corpus
    val raw = graft.text.Tfidf.bm25(docs, col("id"), col("txt"), terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bm25() == raw)
    // an uncommitted segment (no _commit marker) is invisible to probes
    val seg2 = new java.io.File(s"$dir/segments/b2")
    graft.text.SearchIndex.appendSegment(
      Seq((7L, "spark window ghost")).toDF("id", "txt"),
      col("id"), col("txt"), dir, "b2", chunkSize = 2)
    assert(search().contains(7L))
    new java.io.File(seg2, "_commit").delete()
    assert(!search().contains(7L), "uncommitted segment must be invisible")
    assert(bm25() == raw, "uncommitted segment must not affect BM25 stats")
  }

  test("search index compaction: merges segments losslessly; _replaces " +
      "supersedes inputs even before deletion") {
    val docs = Seq(
      (0L, "spark window spark join"), (1L, "window functions in spark"),
      (2L, "nothing relevant here"), (3L, "spark only"),
      (4L, "window only window"), (5L, "spark window again")
    ).toDF("id", "txt")
    val dir = java.nio.file.Files.createTempDirectory("graft-scomp").toString
    val terms = Seq("spark", "window")
    // three streamed segments, no base
    for (b <- 0 to 2) {
      graft.text.SearchIndex.appendSegment(
        docs.filter($"id" % 3 === b), col("id"), col("txt"), dir, s"b$b",
        chunkSize = 2)
    }
    def bm25() = graft.text.SearchIndex.bm25Index(spark, dir, terms,
      chunkSize = 2).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val before = bm25()
    assert(before == graft.text.Tfidf.bm25(docs, col("id"), col("txt"), terms)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap)
    // compact: 3 segments merge into one; results unchanged
    assert(graft.text.SearchIndex.compactSegments(spark, dir, chunkSize = 2) == 3)
    assert(bm25() == before)
    val segs = new java.io.File(s"$dir/segments").listFiles().map(_.getName)
    assert(segs.length == 1 && segs(0).startsWith("compact-"))
    // canonical again: unique (term, chunk_idx) keys after the merge
    val dup = spark.read.parquet(s"$dir/segments/${segs(0)}/postings")
      .groupBy($"term", $"chunk_idx").count().filter($"count" > 1).count()
    assert(dup == 0)
    // a second compact is a no-op
    assert(graft.text.SearchIndex.compactSegments(spark, dir, chunkSize = 2) == 0)
    // _replaces supersedes inputs the instant the merge commits: recreate
    // a replaced input dir — probes must keep ignoring it
    val ghost = docs.filter($"id" === 0).limit(1)
    graft.text.SearchIndex.appendSegment(
      ghost, col("id"), col("txt"), dir, "zz-extra", chunkSize = 2)
    val merged = graft.text.SearchIndex.compactSegments(spark, dir, chunkSize = 2)
    assert(merged == 2) // compact-* + zz-extra
    // a held maintenance lock excludes a concurrent compaction (two
    // compactors would write the same deterministic target dir)
    val lock = new java.io.File(dir, graft.ops.MaintenanceLock.LockName)
    graft.text.SearchIndex.appendSegment(
      docs.filter($"id" === 1), col("id"), col("txt"), dir, "zz-more",
      chunkSize = 2)
    assert(lock.createNewFile())
    intercept[graft.ops.ConcurrentMaintenanceException] {
      graft.text.SearchIndex.compactSegments(spark, dir, chunkSize = 2)
    }
    lock.delete()
    // a replaced name is permanently retired: reusing it must fail fast
    // (probes skip retired names, so a resurrected dir would be silently
    // invisible — the guard turns that footgun into an error)
    val e = intercept[IllegalArgumentException] {
      graft.text.SearchIndex.appendSegment(
        Seq((9L, "spark window phantom")).toDF("id", "txt"),
        col("id"), col("txt"), dir, "zz-extra", chunkSize = 2)
    }
    assert(e.getMessage.contains("retired"))
    // and a fresh id works
    graft.text.SearchIndex.appendSegment(
      Seq((9L, "spark window phantom")).toDF("id", "txt"),
      col("id"), col("txt"), dir, "zz-extra2", chunkSize = 2)
    val hits = graft.text.SearchIndex.searchIndexAll(spark, dir, terms,
      chunkSize = 2).as[Long].collect().toSet
    assert(hits.contains(9L))
  }

  test("decontaminateContainment: quoted benchmark drops where fuzzy misses") {
    // corpus doc 1 QUOTES the whole benchmark question inside a much
    // longer page: containment(bench→doc) = 1 but Jaccard ≈ 10/78 —
    // invisible to the fuzzy (symmetric) variant at any useful threshold
    val page = (0 until 60).map(i => s"w$i").mkString(" ") +
      " what is the capital of france answer paris obviously " +
      (60 until 80).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, page),
      (2L, "a completely unrelated page about spark physical plans"),
      (3L, "another page mentioning france once in passing")).toDF("id", "text")
    val bench = Seq(
      (100L, "what is the capital of france answer paris obviously"))
      .toDF("id", "text")
    val kept = graft.text.Decontaminate.decontaminateContainment(
        corpus, $"id", $"text", bench, $"id", $"text",
        shingleK = 3, threshold = 0.6)
      .select($"id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L), s"expected only the quote dropped: $kept")
    // the fuzzy (symmetric-Jaccard) variant keeps the quoting page
    val fuzzyKept = graft.text.Decontaminate.decontaminateFuzzy(
        corpus, $"id", $"text", bench, $"id", $"text", threshold = 0.5)
      .select($"id").as[Long].collect().toSet
    assert(fuzzyKept.contains(1L))
    // corpus side never shuffles before the broadcast join: the kept-side
    // plan has no Exchange upstream of the join (anti-join flag side is
    // broadcast too)
    val plan = graft.text.Decontaminate.decontaminateContainment(
      corpus, $"id", $"text", bench, $"id", $"text",
      shingleK = 3, threshold = 0.6).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("decontaminateFuzzy: near-matches drop, parity with minhashPairs") {
    val bench = Seq(
      (100L, "one two three four five six seven eight"),
      (101L, "alpha beta gamma delta epsilon zeta eta")
    ).toDF("id", "txt")
    val corpus = Seq(
      (0L, "one two three four five six seven nine"), // near-copy of 100
      (1L, "alpha beta gamma delta epsilon zeta eta"), // exact copy of 101
      (2L, "totally unrelated prose with novel words"),
      (3L, "more singular content matching nothing")
    ).toDF("id", "txt")
    val kept = graft.text.Decontaminate.decontaminateFuzzy(
        corpus, col("id"), col("txt"), bench, col("id"), col("txt"))
      .select($"id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L))
    // differential: a corpus doc is dropped iff minhashPairs over the
    // union pairs it with a bench doc (same signature arithmetic)
    val pairs = graft.dedup.Dedup.minhashPairs(
        corpus.unionByName(bench), col("id"), col("txt"))
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val ref = Seq(0L, 1L, 2L, 3L).filterNot(c =>
      Seq(100L, 101L).exists(b => pairs((c, b)) || pairs((b, c))))
    assert(kept == ref)
  }

  test("filterByScoreBand: exclusive-rank band, whole tie-groups, null drop") {
    val df = (1L to 10L).map(i => (i, i)).toDF("id", "s")
    // pos(v) = v-1; [20,80) keeps 100·pos in [200,800) → v ∈ 3..8
    val kept = Sampling.filterByScoreBand(df, $"s", 20, 80)
      .select($"id").as[Long].collect().sorted
    assert(kept.toSeq == (3L to 8L))
    // ties share one position: the whole group is in or out together
    val tied = Seq(1L, 1L, 1L, 1L, 5L, 5L, 5L, 5L, 9L, 9L).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val keptTied = Sampling.filterByScoreBand(tied, $"s", 20, 80)
      .select($"s").as[Long].collect().toSeq
    assert(keptTied == Seq(5L, 5L, 5L, 5L))
    // nulls are dropped, not banded
    val withNull = Seq((0L, Some(1L)), (1L, None), (2L, Some(2L)))
      .toDF("id", "s")
    assert(Sampling.filterByScoreBand(withNull, $"s", 0, 100).count() == 2)
  }

  test("filterByScoreBand: constant score warns through the PUBLIC API, output stays exact") {
    import scala.jdk.CollectionConverters._
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.LogEvent
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    // capture WARNs emitted by the Sampling logger — the assertion runs
    // against the real public entry point, not an internal hook
    val captured = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val appender = new AbstractAppender(
        "band-capture", null, null, false, Property.EMPTY_ARRAY) {
      override def append(event: LogEvent): Unit =
        captured.add(
          s"${event.getLevel}:${event.getMessage.getFormattedMessage}")
    }
    appender.start()
    val logger = LogManager.getLogger("graft.ops.Sampling")
      .asInstanceOf[org.apache.logging.log4j.core.Logger]
    logger.addAppender(appender)
    try {
      // one score value repeated across ALL rows: band membership is
      // all-or-nothing by the documented tie semantics
      val const = (1L to 50L).map(i => (i, 7L)).toDF("id", "s")
      // every row's exclusive position is 0 → [0,40) keeps ALL
      assert(Sampling.filterByScoreBand(const, $"s", 0, 40).count() == 50)
      // … and [40,80) keeps NONE (0 < 40% lower bound)
      assert(Sampling.filterByScoreBand(const, $"s", 40, 80).count() == 0)
      val warns = captured.asScala
        .filter(m => m.startsWith("WARN") && m.contains("filterByScoreBand"))
      assert(warns.size == 2, s"expected 2 tie-run warnings, got: $captured")
      assert(warns.forall(_.contains("all-or-nothing")),
        "warning must carry the score-band-specific advice")
      // a well-spread score must NOT warn
      captured.clear()
      val spread = (1L to 50L).map(i => (i, i)).toDF("id", "s")
      assert(Sampling.filterByScoreBand(spread, $"s", 20, 80).count() == 30)
      assert(!captured.asScala.exists(_.contains("filterByScoreBand")),
        s"spurious warning on spread scores: $captured")
    } finally {
      logger.removeAppender(appender)
      appender.stop()
    }
  }

  test("pageRank: exact integer recurrence on a hand-computed cycle") {
    // 0→{1,2}, 1→2, 2→0; N=3, scale 1e9:
    //   r0 = 333333333, base = 50000000
    //   contribs: 0 sends 166666666 to each of 1,2; 1 sends 333333333; 2 sends 333333333
    //   r1(0) = 50000000 + (85·333333333)//100 = 333333333
    //   r1(1) = 50000000 + (85·166666666)//100 = 191666666
    //   r1(2) = 50000000 + (85·(166666666+333333333))//100 = 474999999
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L)).toDF("s", "d")
    val r1 = graft.ops.Graph.pageRank(e, $"s", $"d", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(0L -> 333333333L, 1L -> 191666666L, 2L -> 474999999L))
    // floor-division leak: total mass stays ≤ scale and shrinks
    val r5 = graft.ops.Graph.pageRank(e, $"s", $"d", iters = 5)
      .agg(sum($"rank")).head.getLong(0)
    assert(r5 <= 1000000000L && r5 >= 900000000L)
  }

  test("pageRank: no-in-edge node holds exactly base; runs are deterministic") {
    // 0→1, 1→2, 2→1: node 0 receives nothing → rank = base = 50000000
    val e = Seq((0L, 1L), (1L, 2L), (2L, 1L)).toDF("s", "d")
    def run() = graft.ops.Graph.pageRank(e, $"s", $"d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = run()
    assert(a(0L) == 50000000L)
    assert(a == run())
    // the 1↔2 loop holds the remaining mass; both above base
    assert(a(1L) > 50000000L && a(2L) > 50000000L)
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

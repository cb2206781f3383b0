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

  /** Domain used for blocklist matching: the host minus one leading
    * `www.` label. (True registrable-domain/eTLD+1 needs the public
    * suffix list; the www-strip is the standard cheap normalization and
    * keeps the operator dependency-free.) */
  def domainOf(url: Column): Column =
    regexp_replace(hostOf(url), "^www\\.", "")

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
}

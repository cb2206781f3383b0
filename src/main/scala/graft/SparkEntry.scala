package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator/capability from SURVEY.md §2
  * (the reference's own surface: indexed scans + the relational operators its
  * tests delegate to Spark) or from the training-data-pipeline extension set
  * (dedup / similarity / text analysis). Each has a DuckDB oracle in
  * [[oracleSql]] where ANSI-SQL-expressible.
  *
  * Determinism rules (driver hash-compares row values after sorting columns
  * by name):
  *   - every query ends in a total ORDER BY (unique tie-break key);
  *   - double aggregates are rounded at the data's intrinsic decimal
  *     precision (2dp for raw money sums, 4dp for price*(1-disc) products)
  *     so Spark's and DuckDB's summation-order float noise (~1e-6 at
  *     sf0.01) cannot flip the rounded digit;
  *   - ORDER BY on nullable group keys pins NULLS FIRST explicitly (Spark
  *     default asc = nulls first; DuckDB default = nulls last).
  */
object SparkEntry
  extends SparkEntryFixtures
  with QueriesRelational
  with QueriesIndex
  with QueriesPipeline
  with QueriesStreaming
  with QueriesTemporal
  with SparkEntryOracles {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_idx_point_lookup")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator (SURVEY.md §2) — the union of
    * the per-domain maps (split by domain in round 11; a silent `++`
    * override across domains would drop a query, so disjointness is
    * asserted once). */
  def queries: Map[String, (SparkSession, String) => DataFrame] = queriesUnion

  private lazy val queriesUnion: Map[String, (SparkSession, String) => DataFrame] = {
    val maps = Seq(relationalQueries, indexQueries, pipelineQueries,
      streamingQueries, temporalQueries)
    val keys = maps.flatMap(_.keys)
    val dups = keys.groupBy(identity).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query keys across domains: ${dups.mkString(", ")}")
    maps.reduce(_ ++ _)
  }
}

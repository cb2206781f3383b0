package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality EXPECTATIONS — the assertion gate an ingest pipeline
  * runs between stages (the Great-Expectations shape, Spark-native):
  * named boolean predicates evaluated over the whole table in ONE
  * aggregation pass (no per-check scans), each reporting row count,
  * violation count and a pass flag. A NULL predicate result counts as a
  * violation — an expectation that cannot be evaluated has failed, the
  * conservative read. */
object Expect {

  /** (check, rows, violations, passed) — one row per named check, all
    * computed in a single scan + single-row aggregate. */
  def check(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "at least one expectation required")
    require(checks.map(_._1).distinct.size == checks.size,
      s"duplicate check names: ${checks.map(_._1)}")
    // positional aliases + an exploded (name, count) struct array — check
    // names are bound as LITERALS, never spliced into SQL text or column
    // identifiers, so quotes/backticks/dots in a name are just data
    val aggExprs = count(lit(1)).as("__n") +:
      checks.zipWithIndex.map { case ((_, cond), i) =>
        sum(when(coalesce(cond, lit(false)), 0L).otherwise(1L))
          .as(s"__viol_$i")
      }
    val row = df.agg(aggExprs.head, aggExprs.tail: _*)
    val pairs = array(checks.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("check"), col(s"__viol_$i").as("violations"))
    }: _*)
    row.select(col("__n"), explode(pairs).as("kv"))
      .select(col("kv.check").as("check"), col("__n").as("rows"),
        coalesce(col("kv.violations"), lit(0L)).as("violations"),
        (coalesce(col("kv.violations"), lit(0L)) === 0L).as("passed"))
  }

  /** [[check]] + fail-fast: throws listing every failed expectation
    * (with counts) if any has violations; returns the report otherwise.
    * The gate shape for pipeline code. */
  def enforce(df: DataFrame, checks: Seq[(String, Column)]): DataFrame = {
    val report = check(df, checks)
    val failed = report.filter(!col("passed"))
      .select(col("check"), col("violations"))
      .collect().map(r => s"${r.getString(0)} (${r.getLong(1)} rows)")
    require(failed.isEmpty,
      s"expectations failed: ${failed.mkString(", ")}")
    report
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric anomaly detection with ENGINE-EXACT arithmetic: per-group
  * z-score outliers over an integer-unit value column (cents, micros —
  * quantize upstream), decided WITHOUT any floating-point mean or
  * variance. The test `|x − μ| > z·σ` with `μ = S/n`,
  * `σ² = (n·Q − S²)/n²` cross-multiplies to
  *
  *   (n·x − S)² > z² · (n·Q − S²)
  *
  * — all integer products, evaluated in 38-digit decimals (Spark
  * `DecimalType(38,0)`, DuckDB `HUGEINT`), so the outlier set is
  * bit-reproducible on any engine: no summation-order noise, no sqrt,
  * no boundary ulps. Plan: one grouped aggregate over (n, S, Q) joined
  * back broadcast (one row per group), then a map-side flag — two
  * scans, one tiny shuffle. Magnitude headroom: exact while
  * `n·max(x)²` stays under 10³⁸ (a trillion rows of 10⁹-unit values). */
object Anomaly {

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** Rows whose value lies more than `z` standard deviations from their
    * group's mean. Groups with zero variance flag nothing (every value
    * at the mean); single-row groups flag nothing. Returns the input
    * columns of `df` for the flagged rows. */
  def zScoreOutliers(
      df: DataFrame, group: Column, value: Column, z: Int): DataFrame = {
    require(z >= 1, s"z must be >= 1: $z")
    val stats = df
      .groupBy(group.as("__g"))
      .agg(count(lit(1)).as("__zn"),
        sum(dec(value)).as("__zs"),
        sum(dec(value) * dec(value)).as("__zq"))
    val joined = df.join(broadcast(stats), group === col("__g"))
    val n = dec(col("__zn"))
    val s = col("__zs")
    val q = col("__zq")
    val d = n * dec(value) - s
    joined
      .filter(d * d > lit(z.toLong * z.toLong) * (n * q - s * s))
      .select(df.columns.map(col): _*)
  }
}

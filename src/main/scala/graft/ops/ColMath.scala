package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SparkInternals

/** Exact integer column arithmetic shared by the bucketing operators.
  *
  * Column `/` is double division — above 2^53 the rounding can move a
  * value across a bucket boundary, and a mis-bucketed interval endpoint
  * silently drops (or double-emits) a join pair. SQL's `div` is exact
  * but truncates toward zero, so negative inputs (pre-1970 epoch micros)
  * bucket one slot too high. [[floorDiv]] composes the two fixes.
  */
private[graft] object ColMath {

  /** Floor division of a long column by a positive long literal, exact
    * for the full long domain (negative inputs floor-adjusted). */
  def floorDiv(x: Column, w: Long): Column = {
    require(w > 0, s"divisor must be positive: $w")
    val q = SparkInternals.wrap(new IntegralDivide(
      SparkInternals.unwrap(x), SparkInternals.unwrap(lit(w))))
    when(x < 0 && x % w =!= 0, q - 1L).otherwise(q).cast("long")
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot-key workloads.
  *
  * AQE's skew-join handling splits oversized shuffle partitions at
  * runtime, but a partition holding ONE pathological key cannot be split
  * by key ranges — every row of that key still lands in one task. Salting
  * separates even that case: the hot key's rows spread across `salts`
  * tasks at the cost of replicating the other side once per salt value.
  */
object Skew {

  /** Salted inner equi-join for when neither side fits a broadcast and a
    * handful of keys dominate the big side. The big side gets a salt —
    * row hash mixed with a row ordinal mod `salts`, so even
    * byte-identical duplicate rows of the hot key (the dedup-workload
    * case, where a pure row hash would collapse to one salt) spread
    * across tasks — and the small side is replicated once per salt; the
    * join runs on (key, salt). Shuffle volume grows by ×salts on the
    * SMALL side only.
    *
    * Pass `ordinal` (any column unique per row — a primary key, a file
    * offset) to make the salt a pure function of row content:
    * deterministic under task retry and any repartitioning. Without it
    * the ordinal falls back to `monotonically_increasing_id()`, which
    * depends on the runtime partition layout — the JOIN OUTPUT is still
    * row-identical (the salt only routes rows; every (key, salt) pair
    * meets its replicated small side), but the routing itself is not
    * replayable.
    *
    * Output = big columns then small columns (names must be disjoint),
    * inner-join semantics, row-identical to the unsalted join.
    */
  def saltedJoin(
      big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      salts: Int,
      ordinal: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(salts > 0, "salts must be positive")
    val dup = big.columns.toSet.intersect(small.columns.toSet)
    require(dup.isEmpty, s"big/small column names must be disjoint, both have: $dup")
    require(!(big.columns ++ small.columns).contains("__salt"),
      "column name __salt is reserved by saltedJoin")

    val b = big.withColumn("__salt",
        saltExpr(big.columns.map(col).toIndexedSeq, salts, ordinal))
      .alias("__B")
    val s = small.withColumn("__salt",
      explode(array((0 until salts).map(lit).toIndexedSeq: _*)))
      .alias("__S")
    b.join(s,
        col(s"__B.$bigKey") === col(s"__S.$smallKey") &&
          col("__B.__salt") === col("__S.__salt"))
      .select((big.columns.map(c => col(s"__B.$c")) ++
        small.columns.map(c => col(s"__S.$c"))).toIndexedSeq: _*)
  }

  /** Big-side salt: row hash + ordinal, mod `salts`. The ordinal term is
    * what spreads byte-identical duplicate rows; the hash term
    * decorrelates rows that arrive ordered by key. With a caller-supplied
    * ordinal the whole expression is a pure function of row content —
    * deterministic under repartitioning and task retry; the
    * `monotonically_increasing_id()` fallback is partition-layout
    * dependent (see [[saltedJoin]]). */
  private[graft] def saltExpr(rowCols: Seq[org.apache.spark.sql.Column], salts: Int,
      ordinal: Option[org.apache.spark.sql.Column] = None) =
    pmod(xxhash64(rowCols: _*) +
        ordinal.map(_.cast("long")).getOrElse(monotonically_increasing_id()),
      lit(salts.toLong)).cast("int")
}

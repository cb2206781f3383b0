package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`):
  *
  *   - brute-force cosine top-k — the exactness baseline, a single
  *     codegen'd projection + TakeOrderedAndProject (no shuffle beyond
  *     the top-k reduction);
  *   - LSH-bucketed search — deterministic random-hyperplane sign bits
  *     computed from xxhash-derived planes; candidates restricted to the
  *     query's bucket (the 100 TB path: bucket is a partitioning key, so
  *     a query touches one partition's worth of vectors);
  *   - cosine near-duplicate pairs with a bucket-blocked join.
  *
  * Dot products are plain `zip_with`/`aggregate` over doubles — inside
  * whole-stage codegen, no UDFs.
  */
object Ann {

  /** Native-expression kernels (graft.functions) — bit-identical to the
    * zip_with/aggregate formulation but ~100× faster per element. */
  def dot(a: Column, b: Column): Column = graft.functions.exprs.dot_product(a, b)

  def norm(a: Column): Column = sqrt(graft.functions.exprs.norm_squared(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / greatest(norm(a) * norm(b), lit(1e-12))

  /** Exact top-k nearest neighbours of one query vector. */
  def bruteForceTopK(
      df: DataFrame,
      id: Column,
      vec: Column,
      query: Seq[Double],
      k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val q = array(query.map(lit): _*)
    val scored = df.select(id.as("neighbor_id"), cosine(vec, q).as("__cos"))
    val filtered = excludeId match {
      case Some(x) => scored.filter(col("neighbor_id") =!= x)
      case None => scored
    }
    filtered
      .orderBy(col("__cos").desc, col("neighbor_id"))
      .limit(k)
      .select(col("neighbor_id"), round(col("__cos"), 6).as("cosine"))
  }

  /** Deterministic hyperplane matrix: planes(b)(d) derived from a spectral
    * hash of (seed, b, d), mapped to [-1, 1]. Reproducible everywhere. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] =
    (0 until nBits).map { b =>
      (0 until dim).map { d =>
        val h = scala.util.hashing.byteswap64(seed ^ (b.toLong << 32) ^ d.toLong)
        (h.toDouble / Long.MaxValue.toDouble)
      }
    }

  /** Sign-bit LSH bucket id (one int of nBits sign bits). */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val pl = array(p.map(lit): _*)
      when(dot(vec, pl) > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Bucket-restricted ANN: search only vectors sharing the query's LSH
    * bucket (recall < 1 by construction; raise nBits↓/multi-probe for
    * recall, or pre-partition the table by bucket at 100 TB scale). */
  def lshTopK(
      df: DataFrame,
      id: Column,
      vec: Column,
      query: Seq[Double],
      k: Int,
      nBits: Int = 8,
      seed: Long = 42L,
      excludeId: Option[Long] = None): DataFrame = {
    val dim = query.length
    val planes = hyperplanes(nBits, dim, seed)
    val queryBucket = planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d > 0) 1L << i else 0L
    }.sum
    val bucketed = df.select(id.as("neighbor_id"), vec.as("__v"),
      lshBucket(vec, planes).as("__bucket"))
      .filter(col("__bucket") === queryBucket)
    bruteForceTopK(bucketed, col("neighbor_id"), col("__v"), query, k, excludeId)
  }

  /** Cosine near-duplicate pairs (id_a < id_b, cosine ≥ threshold), blocked
    * on the LSH bucket so candidates meet via equi-join, not cross join.
    * Exact variant (bucketed=false) cross-joins — small tables only. */
  def cosinePairs(
      df: DataFrame,
      id: Column,
      vec: Column,
      threshold: Double,
      dim: Int,
      bucketed: Boolean = true,
      nBits: Int = 8,
      seed: Long = 42L): DataFrame = {
    val base = df.select(id.as("__id"), vec.as("__v"))
    val (left, right, keys) =
      if (bucketed) {
        val planes = hyperplanes(nBits, dim, seed)
        val b = base.withColumn("__bucket", lshBucket(col("__v"), planes))
        (b.select(col("__bucket"), col("__id").as("id_a"), col("__v").as("__va")),
          b.select(col("__bucket"), col("__id").as("id_b"), col("__v").as("__vb")),
          Seq("__bucket"))
      } else {
        (base.select(col("__id").as("id_a"), col("__v").as("__va")),
          base.select(col("__id").as("id_b"), col("__v").as("__vb")),
          Nil)
      }
    // Precompute per-vector norms once (N sqrt's) instead of per pair (N²).
    val leftN = left.withColumn("__na", norm(col("__va")))
    val rightN = right.withColumn("__nb", norm(col("__vb")))
    val joined = if (keys.isEmpty) leftN.crossJoin(rightN) else leftN.join(rightN, keys)
    joined
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("__va"), col("__vb")) /
          greatest(col("__na") * col("__nb"), lit(1e-12)), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}

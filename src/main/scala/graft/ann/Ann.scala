package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Hyperplane tables for multi-table LSH, derivable from
    * (nBits, dim, tables, seed) alone. Each table's seed is byteswap64-
    * mixed: a plain `seed + t` would collide with the `(b<<32) ^ d` seed
    * layout inside [[hyperplanes]] (42^d == 43^(d^1)), making the tables
    * coordinate PERMUTATIONS of each other instead of independent —
    * silently collapsing the multi-table recall gain. */
  def hyperplaneTables(
      nBits: Int, dim: Int, tables: Int, seed: Long = 42L): Seq[Seq[Seq[Double]]] =
    (0 until tables).map(t =>
      hyperplanes(nBits, dim, scala.util.hashing.byteswap64(seed + 0x9E3779B97F4A7C15L * (t + 1))))

  /** Driver-side bucket of a literal query vector in one table. */
  def bucketOf(query: Seq[Double], planes: Seq[Seq[Double]]): Long =
    planes.zipWithIndex.map { case (p, i) =>
      val d = p.zip(query).map { case (a, b) => a * b }.sum
      if (d > 0) 1L << i else 0L
    }.sum

  /** Bucket-restricted ANN with multi-table LSH: search vectors sharing
    * the query's bucket in ANY of `tables` independent hyperplane tables
    * (recall 1-(1-p^nBits)^tables for per-plane agreement p; still < 1 —
    * the scan stays a codegen'd filter, no shuffle). At 100 TB the
    * buckets become partition keys so a query touches `tables` partitions. */
  def lshTopK(
      df: DataFrame,
      id: Column,
      vec: Column,
      query: Seq[Double],
      k: Int,
      nBits: Int = 8,
      tables: Int = 4,
      seed: Long = 42L,
      excludeId: Option[Long] = None): DataFrame = {
    val dim = query.length
    val planeTables = hyperplaneTables(nBits, dim, tables, seed)
    val anyBucketMatch = planeTables
      .map(p => lshBucket(vec, p) === lit(bucketOf(query, p)))
      .reduce(_ || _)
    val bucketed = df.filter(anyBucketMatch).select(id.as("neighbor_id"), vec.as("__v"))
    bruteForceTopK(bucketed, col("neighbor_id"), col("__v"), query, k, excludeId)
  }

  /** Single-table MULTI-PROBE LSH: instead of paying `tables`× index
    * storage for recall, probe the query's bucket AND every bucket within
    * Hamming distance `probeRadius` (sign bits are the ones most likely
    * to be wrong for a near neighbour). Candidate test is a codegen'd
    * `bit_count(bucket XOR qBucket) <= probeRadius` filter — no shuffle,
    * no replication; at 100 TB with bucket as the partition key a query
    * touches Σ_{i≤r} C(nBits,i) partitions.
    *
    * Probe budget (nBits=8): buckets touched / expected data fraction
    * grow with the radius —
    *   r=0 →   1 bucket  (1/256 of the data), lowest recall;
    *   r=1 →   9 buckets (~3.5%), the default sweet spot;
    *   r=2 →  37 buckets (~14.5%), recall ⊇ r=1 by construction;
    *   r=3 →  93 buckets (~36%) — at that point brute force competes.
    * Recall for a neighbour at angle θ: P(≤r of nBits sign bits differ),
    * Binomial(nBits, θ/π) CDF at r — monotone in r, so raising the radius
    * strictly widens the candidate set (asserted in PipelineSpec).
    * Recall/latency knob: multi-table trades storage, multi-probe trades
    * probes. */
  def lshTopKMultiProbe(
      df: DataFrame,
      id: Column,
      vec: Column,
      query: Seq[Double],
      k: Int,
      nBits: Int = 8,
      seed: Long = 42L,
      excludeId: Option[Long] = None,
      probeRadius: Int = 1): DataFrame = {
    require(probeRadius >= 0 && probeRadius <= nBits,
      s"probeRadius must be in [0, $nBits]: $probeRadius")
    val planes = hyperplanes(nBits, query.length, seed)
    val qBucket = bucketOf(query, planes)
    val probed = df
      .filter(bit_count(lshBucket(vec, planes).bitwiseXOR(lit(qBucket))) <= probeRadius)
      .select(id.as("neighbor_id"), vec.as("__v"))
    bruteForceTopK(probed, col("neighbor_id"), col("__v"), query, k, excludeId)
  }

  /** IVF-ADC (the FAISS IVFPQ shape): coarse cells restrict the
    * candidate set to the `nprobe` probe lists nearest the query, then
    * PQ codes + an asymmetric-distance lookup table score the survivors.
    * At 100 TB this is the full billion-vector serving layout: the codes
    * table is PARTITIONED BY cell (each probe reads nprobe/cells of the
    * data), rows carry m small ints instead of the raw vector, and the
    * query never touches the embeddings themselves — cell filter and ADC
    * are both map-side expressions over literals. */
  def ivfPqTopK(
      df: DataFrame,
      id: Column,
      vec: Column,
      query: Seq[Double],
      k: Int,
      cells: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      codebookK: Int = 16,
      seed: Long = 42L,
      excludeId: Option[Long] = None): DataFrame = {
    require(nprobe >= 1 && nprobe <= cells, s"nprobe must be in [1, $cells]")
    require(query.length % m == 0,
      s"query dim ${query.length} not divisible into $m subspaces")
    val cents = ivfCodebook(cells, query.length, seed)
    val probe = ivfProbeCells(query, cents, nprobe)
    val books = pqCodebooks(m, codebookK, query.length / m, seed)
    val restricted = df.filter(ivfCell(vec, cents).isin(probe: _*))
    pqAdcTopK(restricted, id, vec, query, books, k, excludeId)
  }

  /** Deterministic IVF codebook: `k` unit-normalized centroids, a pure
    * function of (k, dim, seed) — the same spectral-hash construction as
    * [[hyperplanes]], L2-normalized in exact driver arithmetic so both
    * the operators and the SQL oracle can embed identical literals. The
    * TRAINED alternative is [[kmeansFit]] + [[ivfTopKTrained]]; the probe
    * structure is unchanged by where centroids come from. */
  def ivfCodebook(k: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] =
    hyperplanes(k, dim, scala.util.hashing.byteswap64(seed ^ 0x1DF5C3A7B9E1L))
      .map { c =>
        val n = math.sqrt(c.map(x => x * x).sum)
        c.map(_ / n)
      }

  /** Coarse-quantizer cell of `vec`: index of the max-dot centroid
    * (spherical Voronoi), ties to the FIRST max index — the exact
    * formulation `array_position(dots, array_max(dots)) - 1` so DuckDB's
    * `list_position(dots, list_max(dots)) - 1` reproduces every
    * assignment bit-for-bit. */
  def ivfCell(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    // single nested-array literal — see nearestCentroid's planning note
    val cents = typedLit(centroids.map(_.toIndexedSeq).toIndexedSeq)
    val dots = transform(cents, c => dot(vec, c))
    (array_position(dots, array_max(dots)) - 1).cast("int")
  }

  /** Driver-side: the `nprobe` cells nearest a literal query vector
    * (by centroid dot, descending; ties by cell index). */
  def ivfProbeCells(
      query: Seq[Double], centroids: Seq[Seq[Double]], nprobe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => (c.zip(query).map { case (a, b) => a * b }.sum, i) }
      .sortBy { case (d, i) => (-d, i) }
      .take(nprobe).map(_._2)

  /** IVF(-flat) top-k: vectors are assigned to coarse cells once (at
    * scale: a partitioning/clustering key written at ingest); a query
    * exact-re-ranks only the `nprobe` nearest cells — it touches
    * nprobe/k of the data instead of all of it, and recall loss is
    * confined to neighbours quantized into unprobed cells. */
  def ivfTopK(
      df: DataFrame,
      id: Column,
      vec: Column,
      query: Seq[Double],
      k: Int,
      cells: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L,
      excludeId: Option[Long] = None): DataFrame = {
    require(nprobe >= 1 && nprobe <= cells, s"nprobe must be in [1, $cells]")
    val cents = ivfCodebook(cells, query.length, seed)
    val probe = ivfProbeCells(query, cents, nprobe)
    val restricted = df
      .filter(ivfCell(vec, cents).isin(probe: _*))
      .select(id.as("neighbor_id"), vec.as("__v"))
    bruteForceTopK(restricted, col("neighbor_id"), col("__v"), query, k, excludeId)
  }

  /** Embedding-level dedup: drop every vector that is transitively
    * cosine-connected (≥ threshold, within the multi-table LSH blocking)
    * to a smaller id — i.e. keep one representative per near-duplicate
    * cluster. Pairs come from [[cosinePairs]]'s bucketed path; the
    * closure via [[graft.dedup.Dedup.connectedComponents]]. */
  def dedupEmbeddings(
      df: DataFrame,
      id: Column,
      vec: Column,
      threshold: Double,
      dim: Int,
      nBits: Int = 8,
      tables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val pairs = cosinePairs(df, id, vec, threshold, dim,
      bucketed = true, nBits = nBits, tables = tables, seed = seed)
    val dups = graft.dedup.Dedup.connectedComponents(
        pairs.select(col("id_a"), col("id_b")))
      .filter(col("id") =!= col("label"))
      .select(col("id").as("__dup"))
    df.join(dups, id === col("__dup"), "left_anti")
  }

  /** SemDeDup-style within-cluster cosine pairs (id_a < id_b, cosine ≥
    * threshold): k-means clusters are the BLOCKING key — candidates meet
    * through an equi-join on their nearest-centroid assignment, and the
    * exact cosine (6dp, raw embedding units) verifies each candidate.
    * The semantic-dedup recipe of Abbas et al. 2023 (arXiv:2303.09540),
    * with trained centroids from [[kmeansFit]] where the LSH blocking of
    * [[cosinePairs]] would split genuinely similar regions across
    * hyperplane buckets.
    *
    * Scale: assignment is a map-side projection (centroids ride the plan
    * as literals, k×dim doubles); the join shuffles each side once on the
    * cluster id. Within-cluster cost is quadratic in cluster size, so at
    * scale pick k ∝ N to bound clusters near N/k (SemDeDup uses ~100k
    * clusters for billions of embeddings); a skewed giant cluster is the
    * signal to refit with larger k, not to widen this join.
    */
  def semanticPairs(
      df: DataFrame,
      id: Column,
      vec: Column,
      centroids: Seq[Seq[Double]],
      threshold: Double): DataFrame = {
    require(centroids.nonEmpty, "at least one centroid required")
    val base = df.select(id.as("__id"), vec.as("__v"),
      nearestCentroid(quantizeMilli(vec), centroids).as("__c"))
    // cluster blocking yields each pair exactly once (one key per vector,
    // unlike multi-table LSH), so vectors join through directly — no
    // ids-only pre-pass + re-join is needed
    base.select(col("__c"), col("__id").as("id_a"),
        col("__v").as("__va"), norm(col("__v")).as("__na"))
      .join(base.select(col("__c"), col("__id").as("id_b"),
        col("__v").as("__vb"), norm(col("__v")).as("__nb")), Seq("__c"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("__va"), col("__vb")) /
          greatest(col("__na") * col("__nb"), lit(1e-12)), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Approximate k-nearest-neighbor JOIN: for EVERY vector its `k`
    * highest-cosine neighbors — the all-rows sibling of the single-query
    * [[bruteForceTopK]] and the per-pair [[semanticPairs]] (kNN graphs
    * feed dedup-cluster analysis, diversity scoring and
    * retrieval-augmented curation).
    *
    * Blocking: the DATA side lands in its nearest k-means cell (one row
    * per vector), the PROBE side is replicated to its `nprobe` nearest
    * cells (the multi-probe recipe — neighbors just across a Voronoi
    * boundary are still found when probe > 1). Candidates meet through a
    * cell equi-join; the exact cosine re-rank and a per-probe-id
    * row_number window produce ranks 1..k by (cosine desc, neighbor_id
    * asc) over the ROUNDED cosine (6 dp) — the cross-engine-stable order.
    *
    * Scale: no cross join — shuffle cost is nprobe replicas of the probe
    * side plus the cell equi-join; per-cell work is |cell|×|probes in
    * cell|, bounded by cluster balance (more cells ⇒ smaller blocks;
    * fit more centroids at 100 TB). Both cell assignments are map-side
    * codegen'd kernels ([[graft.functions.NearestCentroids]]). Recall is
    * approximate: a true neighbor outside the probed cells is missed —
    * raise nprobe for recall, cells for speed. Deterministic and
    * oracle-replayable (integer-exact cell distances, rounded-cosine
    * rank order). */
  def knnJoin(
      df: DataFrame,
      id: Column,
      vec: Column,
      centroidsMilli: Seq[Seq[Double]],
      k: Int,
      nprobe: Int = 2): DataFrame =
    knnJoinAgainst(df, id, vec, df, id, vec, centroidsMilli, k, nprobe,
      excludeSameId = true)

  /** Two-table retrieval form of [[knnJoin]]: each QUERY vector's `k`
    * nearest CORPUS vectors — the batch-retrieval shape (score a query
    * set against an embedded corpus) the self-join specializes. Same
    * blocking (corpus 1 cell, queries nprobe cells), same rounded-cosine
    * rank order. `excludeSameId` drops corpus rows sharing the query's
    * id — the self-join NEEDS it (a vector is trivially its own nearest
    * neighbor) and [[knnJoin]] passes true; for independent id spaces it
    * must stay false, or a corpus doc that merely collides with a query
    * id would silently vanish from that query's top-k. */
  def knnJoinAgainst(
      queries: DataFrame,
      qId: Column,
      qVec: Column,
      corpus: DataFrame,
      cId: Column,
      cVec: Column,
      centroidsMilli: Seq[Seq[Double]],
      k: Int,
      nprobe: Int = 2,
      excludeSameId: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(nprobe >= 1 && nprobe <= centroidsMilli.length,
      s"nprobe must be in [1, ${centroidsMilli.length}]")
    // cpuBoundIfSmall: cell assignment + the per-candidate dot products
    // after the join are CPU-bound; a single-file embedding scan would
    // otherwise run them on one core (guide §2.6)
    val data = graft.ops.Parallel.cpuBoundIfSmall(corpus).select(
      nearestCentroid(quantizeMilli(cVec), centroidsMilli).as("__c"),
      cId.as("neighbor_id"), cVec.as("__vb"), norm(cVec).as("__nb"))
    val probes = graft.ops.Parallel.cpuBoundIfSmall(queries)
      .select(qId.as("vec_id"), qVec.as("__va"),
        norm(qVec).as("__na"),
        explode(graft.functions.exprs.nearest_centroids(
          quantizeMilli(qVec), centroidsMilli, nprobe)).as("__c"))
    val joined = probes.join(data, Seq("__c"))
    val scored = (if (excludeSameId)
        joined.filter(col("vec_id") =!= col("neighbor_id"))
      else joined)
      .select(col("vec_id"), col("neighbor_id"),
        round(dot(col("__va"), col("__vb")) /
          greatest(col("__na") * col("__nb"), lit(1e-12)), 6).as("cosine"))
    // no dedup needed: the corpus side holds each vector in exactly ONE
    // cell and the probe cells are distinct, so a (vec_id, neighbor_id)
    // pair meets at most once. Rank via the bounded-heap aggregate
    // rather than a row_number window: the 6-dp-rounded cosine is
    // order-isomorphic to its exact micro-units long, so (micro desc,
    // id asc) reproduces the window order bit-for-bit (micro/1e6 and
    // round(c, 6) are both the nearest double to the same 6-dp decimal)
    // — while map-side partials ship <= k candidates per (partition ×
    // query) through the shuffle instead of every scored pair, and a hot
    // cell never becomes one straggling per-query sort.
    scored
      .groupBy(col("vec_id"))
      .agg(graft.functions.exprs.top_k_by(
        round(col("cosine") * 1e6).cast("long"), col("neighbor_id"), k)
        .as("__top"))
      .select(col("vec_id"), posexplode(col("__top")))
      .select(col("vec_id"), col("col.id").as("neighbor_id"),
        (col("col.key").cast("double") / 1e6).as("cosine"),
        (col("pos") + 1).cast("int").as("nn_rank"))
  }

  /** Semantic dedup: keep one representative (the smallest id) per
    * transitively-connected [[semanticPairs]] component — the
    * cluster-blocked sibling of [[dedupEmbeddings]]. */
  def semanticDedup(
      df: DataFrame,
      id: Column,
      vec: Column,
      centroids: Seq[Seq[Double]],
      threshold: Double): DataFrame = {
    val pairs = semanticPairs(df, id, vec, centroids, threshold)
    val dups = graft.dedup.Dedup.connectedComponents(
        pairs.select(col("id_a"), col("id_b")))
      .filter(col("id") =!= col("label"))
      .select(col("id").as("__dup"))
    df.join(dups, id === col("__dup"), "left_anti")
  }

  /** Cosine near-duplicate pairs (id_a < id_b, cosine ≥ threshold).
    *
    * Default (scale) path: multi-table LSH blocking — each vector is
    * exploded to `tables` (table, bucket) keys, candidates meet via an
    * ids-only equi-join on the key, pairs are deduped, then vectors are
    * re-joined once per side for the exact cosine verify. No cross join;
    * shuffle carries ids + one long per (vector × table). Recall for a
    * pair with cosine c is 1-(1-(1-θ/π)^nBits)^tables, θ=arccos(c).
    *
    * The exact variant (bucketed=false) cross-joins — small inputs only. */
  def cosinePairs(
      df: DataFrame,
      id: Column,
      vec: Column,
      threshold: Double,
      dim: Int,
      bucketed: Boolean = true,
      nBits: Int = 8,
      tables: Int = 4,
      seed: Long = 42L): DataFrame = {
    val base = df.select(id.as("__id"), vec.as("__v"))
    val candidates =
      if (bucketed) {
        val planeTables = hyperplaneTables(nBits, dim, tables, seed)
        val banded = base.select(col("__id"),
          posexplode(array(planeTables.map(p => lshBucket(col("__v"), p)): _*))
            .as(Seq("__t", "__b")))
        banded.select(col("__t"), col("__b"), col("__id").as("id_a"))
          .join(banded.select(col("__t"), col("__b"), col("__id").as("id_b")),
            Seq("__t", "__b"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct()
      } else {
        base.select(col("__id").as("id_a"))
          .crossJoin(base.select(col("__id").as("id_b")))
          .filter(col("id_a") < col("id_b"))
      }
    // Re-join vectors once per side; per-vector norms computed once (N
    // sqrt's) instead of per pair (N²).
    candidates
      .join(base.select(col("__id").as("id_a"), col("__v").as("__va"),
        norm(col("__v")).as("__na")), Seq("id_a"))
      .join(base.select(col("__id").as("id_b"), col("__v").as("__vb"),
        norm(col("__v")).as("__nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("__va"), col("__vb")) /
          greatest(col("__na") * col("__nb"), lit(1e-12)), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Deterministic product-quantization codebooks: `m` subspaces × `k`
    * sub-centroids of `subDim` dims each, derived per subspace by the
    * same hash construction as [[ivfCodebook]] (a pure function of the
    * arguments, so the SQL oracle embeds identical literals). The
    * TRAINED alternative is [[pqFit]] (per-subspace [[kmeansFit]]) +
    * [[pqAdcTopKTrained]]; encode/ADC below are unchanged by where
    * codebooks come from. */
  def pqCodebooks(
      m: Int, k: Int, subDim: Int, seed: Long = 42L): Seq[Seq[Seq[Double]]] =
    (0 until m).map(j =>
      ivfCodebook(k, subDim, scala.util.hashing.byteswap64(
        seed + 0x9E3779B97F4A7C15L * (j + 1))))

  /** PQ encode: vec → `m` sub-codes, code_j = index of the nearest
    * (squared-L2, first-min ties) sub-centroid of subspace j. The whole
    * codebook rides the plan as ONE 3-level array literal; pure map-side
    * projection. At 100 TB this is the memory story of billion-vector
    * ANN: m bytes per vector (m small ints) instead of 4·dim — a 64-dim
    * float32 embedding compresses 32× at m=8. */
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty, "empty codebooks")
    val subDim = codebooks.head.head.length
    require(codebooks.forall(_.forall(_.length == subDim)),
      "all sub-centroids must share subDim")
    // one nearest-centroid kernel per subspace (m codegen'd calls) —
    // bit-identical to the former transform-over-codebook-literal whose
    // inner squaredDistance lambdas evaluated interpreted (the kernel
    // widens float elements to double itself, exactly like the old cast)
    array(codebooks.zipWithIndex.map { case (book, j) =>
      graft.functions.exprs
        .nearest_centroid(slice(vec, j * subDim + 1, subDim), book)
        .getField("idx")
    }: _*)
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    * exact, each candidate is represented by its code's sub-centroids,
    * and the distance is the sum of per-subspace lookup-table entries
    * `table[j][code_j] = ||query_j − codebook_j[code_j]||²` — the
    * classic Jégou et al. 2011 formulation. The m×k table is computed
    * driver-side from the literal query (left-fold dimension sums, the
    * same order the oracle's list_sum uses) and rides the plan as one
    * literal; scoring is a map-side array lookup + fold, so the scan
    * never touches the raw vectors — at scale the codes table is the
    * only thing read. Ties broken by neighbor id. */
  def pqAdcTopK(
      df: DataFrame,
      id: Column,
      vec: Column,
      query: Seq[Double],
      codebooks: Seq[Seq[Seq[Double]]],
      k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val base = df.select(id.as("neighbor_id"),
      pqAdcScore(pqEncode(vec, codebooks), query, codebooks).as("adc_dist2"))
    excludeId.fold(base)(x => base.filter(col("neighbor_id") =!= x))
      .orderBy(col("adc_dist2").asc, col("neighbor_id").asc)
      .limit(k)
  }

  /** ADC distance of an already-encoded `codes` column to a literal
    * query (6dp): Σ_j table[j][code_j], the m×k table precomputed
    * driver-side. Scoring stored codes costs one array lookup + fold per
    * row — no vector math on the scan path. */
  def pqAdcScore(
      codes: Column, query: Seq[Double],
      codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val m = codebooks.length
    val subDim = codebooks.head.head.length
    require(query.length == m * subDim,
      s"query dim ${query.length} != m·subDim = ${m * subDim}")
    val table: Seq[Seq[Double]] = codebooks.zipWithIndex.map { case (book, j) =>
      val qsub = query.slice(j * subDim, (j + 1) * subDim)
      book.map(c => c.zip(qsub).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    val tab = typedLit(table.map(_.toIndexedSeq).toIndexedSeq)
    round(aggregate(
      transform(codes, (c, j) => element_at(element_at(tab, j + 1), c + 1)),
      lit(0.0), (acc, x) => acc + x), 6)
  }

  /** TRAINED product-quantization codebooks — the production alternative
    * to the hash-derived [[pqCodebooks]] (whose scaladoc acknowledges the
    * gap): per-subspace Lloyd's k-means ([[kmeansFit]]) over the sliced
    * embedding column. Returned centroids are in MILLI-units (the
    * quantized space [[kmeansFit]] operates in), so encode/score against
    * them must quantize the vectors the same way — [[pqAdcTopKTrained]]
    * does. Deterministic and oracle-replayable end to end: slicing
    * commutes with quantization elementwise, so the SQL oracle re-derives
    * every sub-codebook from scratch with the same first-k init and
    * exact integer-mean updates as [[kmeansFit]].
    *
    * Cost: the m sub-fits are FUSED — one persisted quantized projection,
    * one driver-sliced init collect, and ONE Spark job per Lloyd
    * iteration (each vector explodes into its m sub-vectors; the shuffle
    * groups on (subspace, cluster) and carries m×k×(subDim+1) values) —
    * instead of m independent fits' m×(1+iters) jobs. Bit-identical to
    * per-subspace [[kmeansFit]] (slicing commutes with quantization
    * elementwise; integer-valued sums are exact in any order; same
    * first-k / farthest-first init, first-min ties, exact integer-mean
    * updates — asserted in PipelineSpec), so the SQL oracle's
    * per-subspace replay is unchanged. At 100 TB you fit on a bounded
    * sample — codebook quality needs ~100k vectors, not the corpus —
    * then encode the full corpus map-side with the fitted literals. */
  def pqFit(
      df: DataFrame,
      id: Column,
      vec: Column,
      m: Int,
      subDim: Int,
      k: Int,
      iters: Int = 1,
      seeding: String = "first",
      sampleSize: Int = 4096,
      seed: Long = 42L): Seq[Seq[Seq[Double]]] = {
    require(m >= 1 && subDim >= 1, s"need m, subDim >= 1: $m, $subDim")
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0: $k, $iters")
    require(Seq("first", "farthest").contains(seeding),
      s"seeding must be 'first' or 'farthest': $seeding")
    val q = df.select(id.as("__id"), quantizeMilli(vec).as("__q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      def sliced(full: Seq[IndexedSeq[Double]], j: Int): IndexedSeq[IndexedSeq[Double]] =
        full.map(_.slice(j * subDim, (j + 1) * subDim)).toIndexedSeq
      var books: IndexedSeq[IndexedSeq[IndexedSeq[Double]]] = seeding match {
        case "first" =>
          val init = q.orderBy(col("__id")).limit(k).collect()
            .map(_.getSeq[Double](1).toIndexedSeq)
          require(init.length == k, s"need at least $k vectors, found ${init.length}")
          IndexedSeq.tabulate(m)(j => sliced(init.toIndexedSeq, j))
        case "farthest" =>
          val cand = q.orderBy(xxhash64(col("__id"), lit(seed)), col("__id"))
            .limit(math.max(sampleSize, k)).collect()
            .map(_.getSeq[Double](1).toIndexedSeq)
          require(cand.length >= k, s"need at least $k vectors, found ${cand.length}")
          IndexedSeq.tabulate(m)(j => farthestFirst(sliced(cand.toIndexedSeq, j), k))
      }
      for (_ <- 1 to iters) {
        val subCols = (0 until m).map { j =>
          val sub = slice(col("__q"), j * subDim + 1, subDim)
          struct(lit(j).as("j"), nearestCentroid(sub, books(j)).as("c"), sub.as("s"))
        }
        val exploded = q.select(explode(array(subCols: _*)).as("e"))
          .select(col("e.j").as("__j"), col("e.c").as("__c"), col("e.s").as("__s"))
        val aggs = (0 until subDim).map(i =>
          sum(element_at(col("__s"), i + 1)).as(s"__sum$i")) :+ count(lit(1)).as("__n")
        val updated = exploded.groupBy(col("__j"), col("__c"))
          .agg(aggs.head, aggs.tail: _*)
          .collect().map { r =>
            val n = r.getLong(subDim + 2).toDouble
            (r.getInt(0), r.getInt(1)) ->
              (0 until subDim).map(i => r.getDouble(i + 2) / n).toIndexedSeq
          }.toMap
        books = books.zipWithIndex.map { case (book, j) =>
          book.zipWithIndex.map { case (old, c) => updated.getOrElse((j, c), old) }
        }
      }
      books
    } finally { q.unpersist(blocking = false); () }
  }

  /** ADC distance against TRAINED milli-unit codebooks: the m×k lookup
    * table is built driver-side from the MILLI-quantized query, summed
    * left-to-right over subspaces, and reported in ORIGINAL embedding
    * units² (divide by 1e6, 6dp) — every input is exact integer-valued
    * or an exact integer mean, so the oracle reproduces each entry
    * bit-for-bit. */
  def pqAdcScoreTrained(
      codes: Column, queryMilli: Seq[Double],
      codebooksMilli: Seq[Seq[Seq[Double]]]): Column = {
    val m = codebooksMilli.length
    val subDim = codebooksMilli.head.head.length
    require(queryMilli.length == m * subDim,
      s"query dim ${queryMilli.length} != m·subDim = ${m * subDim}")
    val table: Seq[Seq[Double]] = codebooksMilli.zipWithIndex.map { case (book, j) =>
      val qsub = queryMilli.slice(j * subDim, (j + 1) * subDim)
      book.map(c => c.zip(qsub).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    val tab = typedLit(table.map(_.toIndexedSeq).toIndexedSeq)
    round(aggregate(
      transform(codes, (c, j) => element_at(element_at(tab, j + 1), c + 1)),
      lit(0.0), (acc, x) => acc + x) / lit(1e6), 6)
  }

  /** ADC top-k with TRAINED codebooks from [[pqFit]]: vectors are
    * milli-quantized, encoded against the milli-unit sub-codebooks
    * (same [[pqEncode]] kernel — squared-L2, first-min ties), and scored
    * with [[pqAdcScoreTrained]]. Same map-side shape as [[pqAdcTopK]];
    * only where the codebooks come from changed. */
  def pqAdcTopKTrained(
      df: DataFrame,
      id: Column,
      vec: Column,
      query: Seq[Double],
      codebooksMilli: Seq[Seq[Seq[Double]]],
      k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val qm = query.map(x => math.floor(x * 1000.0 + 0.5))
    val base = df.select(id.as("neighbor_id"),
      pqAdcScoreTrained(pqEncode(quantizeMilli(vec), codebooksMilli),
        qm, codebooksMilli).as("adc_dist2"))
    excludeId.fold(base)(x => base.filter(col("neighbor_id") =!= x))
      .orderBy(col("adc_dist2").asc, col("neighbor_id").asc)
      .limit(k)
  }

  /** Driver-side probe list for a TRAINED (k-means / L2) coarse
    * quantizer: the `nprobe` centroids nearest the milli-quantized query
    * by squared L2 (ascending, ties by cell index) — the L2 sibling of
    * the dot-product [[ivfProbeCells]]. */
  def ivfProbeCellsTrained(
      queryMilli: Seq[Double], centroidsMilli: Seq[Seq[Double]],
      nprobe: Int): Seq[Int] =
    centroidsMilli.zipWithIndex
      .map { case (c, i) =>
        (c.zip(queryMilli).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }
      .sortBy { case (d, i) => (d, i) }
      .take(nprobe).map(_._2)

  /** IVF-flat top-k with a TRAINED coarse quantizer: cells are
    * [[kmeansFit]] centroids (assignment via [[nearestCentroid]] on the
    * milli-quantized vector — squared L2, first-min ties, the exact rule
    * [[kmeansAssign]] uses), the query probes its `nprobe` nearest cells,
    * and survivors are exact-cosine re-ranked. Same nprobe/cells scan
    * fraction as [[ivfTopK]], with data-adapted cells instead of
    * hash-derived ones. */
  def ivfTopKTrained(
      df: DataFrame,
      id: Column,
      vec: Column,
      query: Seq[Double],
      centroidsMilli: Seq[Seq[Double]],
      k: Int,
      nprobe: Int = 4,
      excludeId: Option[Long] = None): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroidsMilli.length,
      s"nprobe must be in [1, ${centroidsMilli.length}]")
    val qm = query.map(x => math.floor(x * 1000.0 + 0.5))
    val probe = ivfProbeCellsTrained(qm, centroidsMilli, nprobe)
    val restricted = df
      .filter(nearestCentroid(quantizeMilli(vec), centroidsMilli).isin(probe: _*))
      .select(id.as("neighbor_id"), vec.as("__v"))
    bruteForceTopK(restricted, col("neighbor_id"), col("__v"), query, k, excludeId)
  }

  /** Materialize the IVFADC serving table: (vec_id, codes) PARTITIONED
    * BY cell. This is the at-scale layout the probe structure assumes —
    * a query touches only its nprobe partition DIRECTORIES (Spark
    * partition pruning, visible as PartitionFilters in the scan), reads
    * m small ints per row, and never opens the embeddings table. Rebuild
    * = rerun (same deterministic codebooks ⇒ stable codes). */
  def buildIvfPqIndex(
      df: DataFrame,
      id: Column,
      vec: Column,
      dir: String,
      dim: Int,
      cells: Int = 16,
      m: Int = 8,
      codebookK: Int = 16,
      seed: Long = 42L): Unit =
    writeIvfPqIndex(df, id, vec, dir, "overwrite", dim, cells, m, codebookK, seed)

  /** Append a NEW batch of vectors to a [[buildIvfPqIndex]] table — the
    * ingest-time shape of the vector serving index (the IVFADC twin of
    * `Dedup.appendToMinhashIndex`): only the batch's cells and codes are
    * computed (one map-side projection — the deterministic codebooks make
    * old and new codes consistent by construction), and the new rows land
    * in their cell partition directories next to the existing ones.
    * Probing sees the union immediately; the stored corpus is never
    * re-encoded or re-read. The `_index_spec` guard rejects appends whose
    * (dim, cells, m, codebookK, seed) differ from the build's — codes
    * under different codebooks share a table but not a distance space. */
  def appendToIvfPqIndex(
      df: DataFrame,
      id: Column,
      vec: Column,
      dir: String,
      dim: Int,
      cells: Int = 16,
      m: Int = 8,
      codebookK: Int = 16,
      seed: Long = 42L): Unit =
    writeIvfPqIndex(df, id, vec, dir, "append", dim, cells, m, codebookK, seed)

  private def ivfPqSpec(dim: Int, cells: Int, m: Int, codebookK: Int, seed: Long) =
    s"ivfpq dim=$dim cells=$cells m=$m codebookK=$codebookK seed=$seed"

  private def writeIvfPqIndex(
      df: DataFrame, id: Column, vec: Column, dir: String, mode: String,
      dim: Int, cells: Int, m: Int, codebookK: Int, seed: Long): Unit = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val spec = ivfPqSpec(dim, cells, m, codebookK, seed)
    // same spec write-ordering discipline as the MinHash/fingerprint
    // builders: overwrite drops the old spec before data and writes the
    // new one after; append verifies upfront but defers a missing spec's
    // heal/build write until the data commits
    val hadSpec =
      if (mode == "overwrite") { graft.ops.IndexSpec.delete(df, dir); false }
      else graft.ops.IndexSpec.checkReturningPresence(df, dir, spec)
    val cents = ivfCodebook(cells, dim, seed)
    val books = pqCodebooks(m, codebookK, dim / m, seed)
    df.select(id.as("vec_id"), ivfCell(vec, cents).as("cell"),
        pqEncode(vec, books).as("codes"))
      .write.mode(mode).partitionBy("cell").parquet(dir)
    if (!hadSpec) graft.ops.IndexSpec.write(df, dir, spec)
  }

  /** Top-k over a [[buildIvfPqIndex]] table: probe-cell partition
    * pruning + stored-code ADC. Same results as [[ivfPqTopK]] over the
    * raw vectors (same codebooks ⇒ same codes ⇒ same distances), at
    * codes-table cost. */
  def queryIvfPqIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      query: Seq[Double],
      k: Int,
      cells: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      codebookK: Int = 16,
      seed: Long = 42L,
      excludeId: Option[Long] = None): DataFrame = {
    require(nprobe >= 1 && nprobe <= cells, s"nprobe must be in [1, $cells]")
    graft.ops.IndexSpec.check(spark, dir,
      ivfPqSpec(query.length, cells, m, codebookK, seed), writeIfMissing = false)
    val cents = ivfCodebook(cells, query.length, seed)
    val probe = ivfProbeCells(query, cents, nprobe)
    val books = pqCodebooks(m, codebookK, query.length / m, seed)
    val base = spark.read.parquet(dir)
      .filter(col("cell").isin(probe: _*))
      .select(col("vec_id").as("neighbor_id"),
        pqAdcScore(col("codes"), query, books).as("adc_dist2"))
    excludeId.fold(base)(x => base.filter(col("neighbor_id") =!= x))
      .orderBy(col("adc_dist2").asc, col("neighbor_id").asc)
      .limit(k)
  }

  /** Embeddings quantized to integer-valued doubles (milli-units,
    * `floor(x·1000 + 0.5)`): float32→double is exact and floor(x+0.5)
    * evaluates identically on any engine, so every downstream sum over
    * these values is EXACT integer arithmetic in doubles — order-
    * independent, reproducible bit-for-bit by the SQL oracle. The
    * foundation of the engine-portable k-means below. Native one-pass
    * kernel (bit-identical to the `transform`+`floor` formulation, which
    * evaluated its lambda interpreted per element). */
  def quantizeMilli(vec: Column): Column =
    graft.functions.exprs.quantize_milli(vec)

  // ---- random projection (Johnson–Lindenstrauss) ----------------------

  /** Seeded ±1 Rademacher projection matrix: sign(j, i) = +1 iff
    * md5_lower64("seed:j:i") is even under UNSIGNED remainder — bit-
    * identical to DuckDB `md5_number_lower(concat(seed,':',j,':',i)) % 2
    * = 0`, so an external oracle regenerates the whole matrix from
    * (outDim, dim, seed) without shipping it. Rademacher entries satisfy
    * the JL lemma like Gaussians do (Achlioptas 2003) while keeping
    * every projected component an exact integer over milli-quantized
    * inputs. */
  def rademacherMatrix(outDim: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    require(outDim >= 1 && dim >= 1, s"matrix dims must be >= 1: $outDim x $dim")
    (0 until outDim).map(j => (0 until dim).map(i =>
      if (graft.functions.Md5Bucket.of(s"$seed:$j:$i", 2) == 0) 1.0 else -1.0))
  }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions —
    * the standard cost-cutter BEFORE clustering / kNN-graph work at
    * scale: pairwise distances are preserved within 1±ε for
    * outDim = O(log n / ε²), and every downstream distance loop shrinks
    * by dim/outDim. Pure map-side codegen'd kernel (the matrix rides the
    * plan as one literal, the corpus never shuffles); milli-quantized
    * inputs × ±1 entries make each output an exact integer the oracle
    * replays bit-for-bit.
    *
    * @return (vec_id, proj: array<bigint>) */
  def randomProjection(df: DataFrame, id: Column, vec: Column,
      outDim: Int, dim: Int, seed: Long = 42L): DataFrame =
    df.select(id.as("vec_id"),
      graft.functions.exprs.mat_vec(quantizeMilli(vec),
        rademacherMatrix(outDim, dim, seed)).cast("array<bigint>").as("proj"))

  /** Brute-force top-k in the PROJECTED space: the JL-compressed search
    * baseline (compare against [[bruteForceTopK]] recall to size outDim).
    * The query is projected driver-side with the same exact integer
    * arithmetic the kernel uses; candidates rank by squared L2 between
    * exact-integer projections (ties by id). One map-side scan +
    * TakeOrdered — no shuffle of the corpus. */
  def rpTopK(df: DataFrame, id: Column, vec: Column, query: Seq[Double],
      k: Int, outDim: Int, seed: Long = 42L,
      excludeId: Option[Long] = None): DataFrame = {
    val mat = rademacherMatrix(outDim, query.length, seed)
    val qProj = mat.map(row =>
      row.zip(query).map { case (s, x) => s * math.floor(x * 1000.0 + 0.5) }.sum)
    val qLit = array(qProj.map(lit): _*)
    val projected = df.select(id.as("vec_id"),
      graft.functions.exprs.mat_vec(quantizeMilli(vec), mat).as("__proj"))
    val base = projected.select(col("vec_id").as("neighbor_id"),
      squaredDistance(col("__proj"), qLit).cast("bigint").as("proj_dist2"))
    excludeId.fold(base)(x => base.filter(col("neighbor_id") =!= x))
      .orderBy(col("proj_dist2").asc, col("neighbor_id").asc)
      .limit(k)
  }

  /** Squared L2 distance as a sequential left fold — the exact
    * formulation `list_sum(list_transform(...))` evaluates in DuckDB, so
    * both engines add the per-dimension squares in the same order. */
  def squaredDistance(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Index of the nearest centroid (squared L2), ties to the FIRST
    * minimum — the same tie rule [[ivfCell]] uses so the oracle's
    * `row_number() OVER (ORDER BY dist, cluster) = 1` reproduces it.
    * Native kernel: per-centroid squares accumulate left-to-right and
    * strict `<` keeps the first min — bit-identical to the former
    * `transform(centsLit, c => squaredDistance(vec, c))` +
    * `array_position(dists, array_min(dists)) - 1` formulation, whose
    * HOF lambdas evaluated interpreted per (centroid × dimension) and
    * dominated the k-means/PQ scan time (kernel-vs-HOF parity asserted
    * in PipelineSpec). */
  def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    graft.functions.exprs.nearest_centroid(vec, centroids).getField("idx")

  /** Lloyd's k-means over milli-quantized embeddings — the trained
    * replacement for [[ivfCodebook]]'s hash-derived centroids (its
    * scaladoc's acknowledged gap) and the standard cluster-balance /
    * diversity-sampling primitive of corpus curation.
    *
    * Deterministic and engine-portable by construction:
    *   - init (`seeding`):
    *       - `"first"` (default): the vectors of the `k` smallest ids —
    *         trivially replayable by the SQL oracle; weak when those ids
    *         land in one true cluster;
    *       - `"farthest"`: deterministic k-means++-style seeding — a
    *         salted-hash sample of `sampleSize` candidates (smallest
    *         xxhash64(id, seed), ties by id — reproducible on any engine)
    *         followed by driver-side farthest-first traversal (greedy
    *         max-min, the deterministic limit of the k-means++ D²
    *         distribution). Exact integer-in-double arithmetic end to
    *         end, so an oracle CAN replay it, at the cost of a longer
    *         SQL derivation;
    *   - assignment: [[nearestCentroid]] (exact double arithmetic,
    *     first-min ties);
    *   - update: per-cluster per-dimension mean = exact integer sum /
    *     count (quantized inputs keep sums exact below 2⁵³ — at 10⁹
    *     vectors × |q|≤10⁴ that is 10¹³ ≪ 2⁵³), computed as ONE
    *     aggregation with `dim+1` map-side-combined columns (no explode,
    *     shuffle carries k×(dim+1) values); empty clusters keep their
    *     previous centroid.
    *
    * Each iteration is one Spark job over the PERSISTED quantized
    * projection (scan + quantize paid once, not once per iteration);
    * only the k×dim centroid matrix is collected (exactly MLlib's driver
    * footprint). Returns the centroids in milli-units.
    */
  def kmeansFit(
      df: DataFrame,
      id: Column,
      vec: Column,
      k: Int,
      iters: Int = 2,
      seeding: String = "first",
      sampleSize: Int = 4096,
      seed: Long = 42L): Seq[Seq[Double]] = {
    require(k >= 1, s"k must be >= 1: $k")
    require(iters >= 0, s"iters must be >= 0: $iters")
    require(Seq("first", "farthest").contains(seeding),
      s"seeding must be 'first' or 'farthest': $seeding")
    val q = df.select(id.as("__id"), quantizeMilli(vec).as("__q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: Seq[Seq[Double]] = seeding match {
        case "first" =>
          val init = q.orderBy(col("__id")).limit(k).collect()
          require(init.length == k, s"need at least $k vectors, found ${init.length}")
          init.map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
        case "farthest" =>
          val cand = q
            .orderBy(xxhash64(col("__id"), lit(seed)), col("__id"))
            .limit(math.max(sampleSize, k)).collect()
            .map(_.getSeq[Double](1).toIndexedSeq)
          require(cand.length >= k, s"need at least $k vectors, found ${cand.length}")
          farthestFirst(cand.toIndexedSeq, k)
      }
      val dim = cents.head.length
      for (_ <- 1 to iters) {
        val assigned = q.select(col("__q"), nearestCentroid(col("__q"), cents).as("__c"))
        val aggs = (0 until dim).map(i =>
          sum(element_at(col("__q"), i + 1)).as(s"__s$i")) :+ count(lit(1)).as("__n")
        val updated = assigned.groupBy(col("__c")).agg(aggs.head, aggs.tail: _*)
          .collect().map { r =>
            val n = r.getLong(dim + 1).toDouble
            r.getInt(0) -> (0 until dim).map(i => r.getDouble(i + 1) / n)
          }.toMap
        cents = cents.zipWithIndex.map { case (old, j) => updated.getOrElse(j, old) }
      }
      cents
    } finally { q.unpersist(blocking = false); () }
  }

  /** Greedy farthest-first traversal over a candidate sample: start from
    * the first candidate (the min-hash one — a deterministic "uniform"
    * draw), then repeatedly add the candidate with the LARGEST squared
    * distance to its nearest chosen centroid (ties to the smallest
    * candidate index). O(|candidates| × k) exact double arithmetic on
    * integer-valued inputs — deterministic everywhere. */
  private[ann] def farthestFirst(
      cand: IndexedSeq[IndexedSeq[Double]], k: Int): IndexedSeq[IndexedSeq[Double]] = {
    val chosen = scala.collection.mutable.ArrayBuffer(cand.head)
    // min squared distance from each candidate to the chosen set so far
    val minD2 = Array.tabulate(cand.length)(i => d2(cand(i), cand.head))
    while (chosen.length < k) {
      var best = 0
      var i = 1
      while (i < cand.length) {
        if (minD2(i) > minD2(best)) best = i
        i += 1
      }
      chosen += cand(best)
      i = 0
      while (i < cand.length) {
        val d = d2(cand(i), cand(best))
        if (d < minD2(i)) minD2(i) = d
        i += 1
      }
    }
    chosen.toIndexedSeq
  }

  private def d2(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** INCREMENTALLY-maintained k-means — the centroid-refresh story for a
    * live IVF/IVFADC serving index: a full Lloyd refit re-scans the whole
    * corpus, while the mini-batch fold (Sculley 2010's web-scale k-means,
    * made deterministic) absorbs each arriving batch into running
    * per-cluster EXACT INTEGER sums over milli-quantized vectors:
    *
    *   - state = k rows `(cluster, n, sums, seed)`; the live centroid is
    *     `sums/n` (an exact integer-ratio double) or the seed while the
    *     cluster is empty — so any engine replays the whole batch
    *     sequence bit-for-bit;
    *   - [[kmeansStateUpdate]] assigns the batch to the CURRENT
    *     centroids with the codegen'd [[nearestCentroid]] kernel
    *     (map-side; first-min ties) and adds per-dimension sums/counts —
    *     ONE distributed aggregation of ≤ k×(dim+1) values per batch,
    *     batch-sized cost however large the accumulated corpus;
    *   - the k-row state itself merges driver-side (the same bounded
    *     footprint as [[kmeansFit]]'s centroid collect).
    *
    * Batch ORDER matters (assignment uses the evolving centroids) and an
    * update is NOT idempotent against the same state — persist the state
    * per batch id and rebuild a retry from the PRIOR state (the
    * committed-segment discipline the streaming ingests use).
    */
  def kmeansStateInit(
      batch: DataFrame, id: Column, vec: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // persisted: the seed collect and the assignment job must see the
    // SAME rows (and pay the quantize scan once) — the kmeansFit pattern
    val q = batch.select(id.as("__id"), quantizeMilli(vec).as("__q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val init = q.orderBy(col("__id")).limit(k).collect()
      require(init.length == k, s"need at least $k vectors, found ${init.length}")
      val seeds = init.map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
      mergeState(batch.sparkSession,
        seeds.indices.map(j => (j, 0L, IndexedSeq.fill(seeds(j).length)(0.0), seeds(j))),
        assignAndSum(q, seeds))
    } finally { q.unpersist(blocking = false); () }
  }

  /** Absorb one batch into the state (see [[kmeansStateInit]]). */
  def kmeansStateUpdate(
      state: DataFrame, batch: DataFrame, id: Column, vec: Column): DataFrame = {
    val rows = collectState(state)
    val cents = rows.map { case (_, n, sums, seed) =>
      if (n > 0L) sums.map(_ / n) else seed
    }
    val q = batch.select(id.as("__id"), quantizeMilli(vec).as("__q"))
    mergeState(state.sparkSession, rows, assignAndSum(q, cents))
  }

  /** Live centroids of a state (milli domain — the [[kmeansAssign]] /
    * [[clusterOutliers]] / [[knnJoin]] contract). */
  def kmeansStateCentroids(state: DataFrame): Seq[Seq[Double]] =
    collectState(state).map { case (_, n, sums, seed) =>
      if (n > 0L) sums.map(_ / n) else seed
    }

  /** Flat report of a state's live centroids: (cluster, n, i, c_milli)
    * — dimension-exploded, 6-dp-rounded milli units (exactly what an
    * external replay of the batch sequence reproduces). */
  def kmeansStateReport(state: DataFrame): DataFrame =
    state.select(col("cluster"), col("n"),
        when(col("n") > 0, transform(col("sums"), x => x / col("n")))
          .otherwise(col("seed")).as("cent"))
      .select(col("cluster"), col("n"), posexplode(col("cent")))
      .select(col("cluster"), col("n"), (col("pos") + 1).cast("int").as("i"),
        round(col("col"), 6).as("c_milli"))
      .orderBy(col("cluster"), col("i"))

  /** One distributed job: nearest-centroid assignment + per-cluster
    * (count, per-dimension sums) — ≤ k rows back to the driver. */
  private def assignAndSum(
      q: DataFrame, cents: IndexedSeq[IndexedSeq[Double]]):
      Map[Int, (Long, IndexedSeq[Double])] = {
    val dim = cents.head.length
    val assigned = q.select(col("__q"), nearestCentroid(col("__q"), cents).as("__c"))
    val aggs = (0 until dim).map(i =>
      sum(element_at(col("__q"), i + 1)).as(s"__s$i")) :+ count(lit(1)).as("__n")
    assigned.groupBy(col("__c")).agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        r.getInt(0) -> ((r.getLong(dim + 1), (0 until dim).map(i => r.getDouble(i + 1))))
      }.toMap
  }

  private def collectState(
      state: DataFrame): IndexedSeq[(Int, Long, IndexedSeq[Double], IndexedSeq[Double])] =
    state.select(col("cluster"), col("n"), col("sums"), col("seed"))
      .orderBy(col("cluster")).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Double](2).toIndexedSeq, r.getSeq[Double](3).toIndexedSeq))
      .toIndexedSeq

  private def mergeState(
      spark: org.apache.spark.sql.SparkSession,
      rows: IndexedSeq[(Int, Long, IndexedSeq[Double], IndexedSeq[Double])],
      delta: Map[Int, (Long, IndexedSeq[Double])]): DataFrame = {
    import spark.implicits._
    rows.map { case (j, n, sums, seed) =>
      delta.get(j) match {
        case Some((dn, dsums)) =>
          (j, n + dn, sums.zip(dsums).map { case (a, b) => a + b }, seed)
        case None => (j, n, sums, seed)
      }
    }.toDF("cluster", "n", "sums", "seed")
  }

  /** Cluster assignment of every vector against fitted centroids:
    * (vec_id, cluster, dist2 = squared L2 in ORIGINAL embedding units,
    * rounded at 6dp). A pure map-side projection — centroids ride the
    * plan as literals, nothing shuffles. */
  def kmeansAssign(
      df: DataFrame,
      id: Column,
      vec: Column,
      centroids: Seq[Seq[Double]]): DataFrame = {
    // one kernel evaluation yields both the argmin and its distance
    val nc = graft.functions.exprs.nearest_centroid(quantizeMilli(vec), centroids)
    df.select(id.as("vec_id"), nc.as("__nc"))
      .select(col("vec_id"),
        col("__nc.idx").as("cluster"),
        round(col("__nc.dist") / lit(1e6), 6).as("dist2"))
  }

  /** Cluster-balanced DIVERSITY sampling over an embedding column:
    * k-means clusters are the strata and each keeps its `nPerCluster`
    * lowest salted-hash ids — the embedding-space complement of
    * [[graft.ops.Sampling.stratifiedSample]] and the selection recipe
    * for diverse fine-tuning subsets (where [[semanticDedup]] removes
    * redundancy, this keeps a size-bounded spread across semantic
    * regions). Assignment is the map-side [[nearestCentroid]] kernel
    * (centroids ride the plan as literals); ranking is the same
    * engine-portable salted md5 every sampling oracle replays; the only
    * shuffle is the per-cluster window.
    *
    * @return (vec_id, cluster) for the kept vectors
    */
  def diversitySample(
      df: DataFrame,
      id: Column,
      vec: Column,
      centroids: Seq[Seq[Double]],
      nPerCluster: Int,
      salt: String = "graft"): DataFrame = {
    require(nPerCluster > 0, s"nPerCluster must be positive: $nPerCluster")
    val assigned = df.select(id.as("vec_id"),
      nearestCentroid(quantizeMilli(vec), centroids).as("cluster"))
    graft.ops.Sampling.stratifiedSample(
      assigned, col("cluster"), col("vec_id"), nPerCluster, salt)
  }

  /** Per-cluster OUTLIER extraction over an embedding column — the
    * prototypicality signal of SemDeDup-style pruning (Abbas et al.
    * 2023 keep/cut examples by distance to their cluster centroid):
    * each vector is assigned to its nearest centroid by the map-side
    * [[nearestCentroid]] kernel, then the `nPerCluster` FARTHEST
    * vectors per cluster are returned with their rank — the candidates
    * a curation pass inspects or cuts as off-distribution. Deterministic
    * ties: equal distances rank by vec_id.
    *
    * Scale shape: assignment is a codegen'd scan (centroids are plan
    * literals, no shuffle); ranking is the bounded-heap aggregate over
    * the distance's order-preserving sortable-bits long — map-side
    * partials ship ≤ nPerCluster rows per (partition × cluster) and no
    * task ever sorts a whole cluster (the former per-cluster window
    * made a mega-cluster one straggling sort).
    *
    * `centroids` live in the quantizeMilli domain, exactly as
    * [[kmeansFit]] returns them (same contract as [[kmeansAssign]]).
    *
    * @return (vec_id, cluster, dist2, outlier_rank), rank 1 = farthest
    */
  def clusterOutliers(
      df: DataFrame,
      id: Column,
      vec: Column,
      centroids: Seq[Seq[Double]],
      nPerCluster: Int): DataFrame = {
    require(nPerCluster > 0, s"nPerCluster must be positive: $nPerCluster")
    val nc = graft.functions.exprs.nearest_centroid(quantizeMilli(vec), centroids)
    val assigned = df.select(id.as("vec_id"), nc.as("__nc"))
      .select(col("vec_id"),
        col("__nc.idx").as("cluster"),
        col("__nc.dist").as("__d"))
    // (dist desc, vec_id asc) through the heap: sortable-bits longs
    // compare exactly like the doubles, and the original distance is
    // recovered bit-for-bit for the output column
    assigned
      .groupBy(col("cluster"))
      .agg(graft.functions.exprs.top_k_by(
        graft.functions.exprs.sortable_double_bits(col("__d")),
        col("vec_id").cast("long"), nPerCluster).as("__top"))
      .select(col("cluster"), posexplode(col("__top")))
      .select(col("col.id").as("vec_id"), col("cluster"),
        round(graft.functions.exprs.double_from_sortable_bits(col("col.key"))
          / lit(1e6), 6).as("dist2"),
        (col("pos") + 1).cast("int").as("outlier_rank"))
  }

  /** Per-class centroid fit for the nearest-class-centroid (Rocchio)
    * classifier below: one aggregation over the LABELED seed set yields
    * each class's per-dimension exact integer-sum mean over
    * milli-quantized vectors — the same update arithmetic as one
    * [[kmeansFit]] Lloyd step, so the SQL oracle replays it with the
    * proven-portable sum/count derivation. Classes are returned sorted
    * by label; that order IS the centroid index the classifier's
    * first-min tie rule resolves against, so ties are deterministic and
    * engine-replayable.
    *
    * Scale shape: the seed set is the small side (thousands of labeled
    * examples against a 100 TB corpus); the aggregation shuffles
    * k×(dim+1) values and the driver holds one k×dim matrix. */
  def fitClassCentroids(
      labeled: DataFrame, vec: Column, label: Column): Seq[(String, Seq[Double])] = {
    val q = labeled.select(label.cast("string").as("__l"), quantizeMilli(vec).as("__q"))
    val first = q.select(col("__q")).head(1)
    require(first.nonEmpty, "labeled seed set is empty")
    val dim = first.head.getSeq[Double](0).length
    val aggs = (0 until dim).map(i =>
      sum(element_at(col("__q"), i + 1)).as(s"__s$i")) :+ count(lit(1)).as("__n")
    q.groupBy(col("__l")).agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { r =>
        require(!r.isNullAt(0), "labels must be non-null")
        val n = r.getLong(dim + 1).toDouble
        (r.getString(0), (0 until dim).map(i => r.getDouble(i + 1) / n): Seq[Double])
      }
      .sortBy(_._1).toIndexedSeq
  }

  /** Nearest-class-centroid classification of every vector — the
    * zero-dependency analog of the embedding-based quality/topic
    * classifiers modern corpus curation gates on (label a few thousand
    * seed documents, score the whole corpus): assignment is the same
    * map-side [[nearestCentroid]] kernel as [[kmeansAssign]] (class
    * centroids ride the plan as literals, first-min ties against the
    * label-sorted order, nothing shuffles), so scoring 100 TB is one
    * codegen'd scan.
    *
    * @param classCentroids [[fitClassCentroids]] output (label-sorted)
    * @return (vec_id, label, dist2 in original embedding units, 6dp)
    */
  def classifyByCentroids(
      df: DataFrame,
      id: Column,
      vec: Column,
      classCentroids: Seq[(String, Seq[Double])]): DataFrame = {
    require(classCentroids.nonEmpty, "at least one class required")
    require(classCentroids.map(_._1).distinct.size == classCentroids.size,
      "duplicate class labels")
    val sorted = classCentroids.sortBy(_._1)
    val labels = array(sorted.map(c => lit(c._1)): _*)
    val nc = graft.functions.exprs.nearest_centroid(quantizeMilli(vec), sorted.map(_._2))
    df.select(id.as("vec_id"), nc.as("__nc"))
      .select(col("vec_id"),
        element_at(labels, col("__nc.idx") + 1).as("label"),
        round(col("__nc.dist") / lit(1e6), 6).as("dist2"))
  }

  /** Symmetric per-vector int8 scalar quantization — the 4× memory cut
    * that makes billion-vector ANN fit an executor fleet: each vector is
    * rescaled by `scale = max|v_i| / 127` and stored as small ints.
    * Engine-portable arithmetic: elements are cast to double BEFORE any
    * op (float32→double is exact) and rounding is floor(x + 0.5), which
    * evaluates identically everywhere, unlike round()'s half-even/half-up
    * variance. A zero vector quantizes to zeros with scale 0.
    *
    * @return (vec_id, scale, quantized array<long> in [-127, 127])
    */
  def quantizeInt8(df: DataFrame, id: Column, vec: Column): DataFrame = {
    val v = transform(vec, x => x.cast("double"))
    val scale0 = array_max(transform(v, x => abs(x))) / lit(127.0)
    val safe = when(col("__scale") === 0.0, lit(1.0)).otherwise(col("__scale"))
    df.select(id.as("vec_id"), v.as("__v"), scale0.as("__scale"))
      .select(col("vec_id"), col("__scale").as("scale"),
        transform(col("__v"), x =>
          least(greatest(floor(x / safe + lit(0.5)), lit(-127.0)), lit(127.0))
            .cast("long")).as("q"))
  }

  /** Summary row per vector for the quantization contract query:
    * integer-exact q_sum/q_min/q_max/n_saturated (order-independent),
    * raw double scale (identical arithmetic on any engine). */
  def quantizeInt8Summary(df: DataFrame, id: Column, vec: Column): DataFrame =
    quantizeInt8(df, id, vec).select(
      col("vec_id"), col("scale"),
      aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
      array_min(col("q")).as("q_min"),
      array_max(col("q")).as("q_max"),
      size(filter(col("q"), x => abs(x) === 127L)).as("n_saturated"))
}

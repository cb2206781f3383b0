package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph signals for web-corpus curation. CommonCrawl-style
  * pipelines rank hosts/pages by link centrality to pick what to crawl
  * and keep (the provenance-quality complement of the content gates in
  * `graft.text`); a PageRank-ish score over the URL graph is the
  * standard such signal.
  */
object Graph {

  /** PageRank over a directed edge list, in EXACT INTEGER arithmetic so
    * any engine replays it bit-for-bit (the repo's micro-nat discipline):
    * ranks live in integer `scale` units (default nano-ranks, 1e9 =
    * total mass 1.0), every division is a floor over non-negative longs
    * (Spark `DIV` = DuckDB `//` there), and every cross-row sum is an
    * integer sum — order-independent, no float accumulation anywhere.
    *
    * Per iteration:
    *   contrib(u→v) = rank(u) DIV outdeg(u)
    *   rank'(v)     = base + (dampPct · Σ contrib) DIV 100
    * with base = ((100 − dampPct) · scale) DIV (100 · N). Floor-division
    * remainders and the mass of DANGLING nodes (no out-edges) leak — the
    * total mass shrinks slightly each iteration instead of being
    * redistributed. That keeps the recurrence local (no global
    * dangling-mass aggregate per iteration) and does not change the
    * ranking ORDER a curation gate consumes; absolute values are
    * therefore a lower bound on the classical formulation's.
    *
    * Scale: nodes and out-degrees are computed once; each iteration is
    * one node-keyed join (rank ⋈ outdeg ⋈ edges on src) and one
    * aggregation shuffle on dst — the irreducible PageRank cost. The
    * static sides (edges, out-degrees, nodes) are hash-partitioned once
    * and PERSISTED — measured on Spark 4.1: a cached InMemoryRelation
    * keeps its outputPartitioning under AQE, so per-iteration joins add
    * no exchange above it, while a localCheckpoint'ed scan does NOT (AQE
    * re-inserts ENSURE_REQUIREMENTS above LogicalRDD, re-shuffling the
    * big edge table every iteration — the formulation this replaced).
    * Rank lineage is truncated per iteration (localCheckpoint) so 50
    * iterations do not build a 50-join plan; the final ranks materialize
    * before the static caches are released. Returns (node, rank) with
    * rank in `scale` units.
    */
  def pageRank(
      edges: DataFrame,
      src: Column,
      dst: Column,
      iters: Int = 5,
      dampPct: Int = 85,
      scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    require(dampPct >= 0 && dampPct <= 100, s"dampPct must be in [0,100]: $dampPct")
    require(scale > 0, s"scale must be positive: $scale")
    // Caveat inherited from persist(): a partition lost to executor
    // failure recomputes silently from the caller's `edges` lineage —
    // callers feeding a NONDETERMINISTIC edge plan (sample/limit) should
    // materialize it first. (localCheckpoint would fail loudly instead,
    // but loses its partitioning under AQE — see the scaladoc.)
    val e = edges.select(src.as("src"), dst.as("dst"))
      .repartition(col("src"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .persist()
    try {
      val n = nodes.count()
      require(n > 0, "pageRank needs a non-empty edge list")
      val base = ((100L - dampPct) * scale) / (100L * n)
      var ranks = nodes.select(col("node"), lit(scale / n).as("rank"))
      for (_ <- 1 to iters) {
        val sums = ranks
          .join(outdeg, ranks("node") === outdeg("src"))
          .select(col("src"), expr("rank DIV outdeg").as("contrib"))
          .join(e, "src")
          .groupBy(col("dst"))
          .agg(sum(col("contrib")).as("s"))
        ranks = nodes.join(sums, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(base) + expr(s"($dampPct * coalesce(s, 0L)) DIV 100")).as("rank"))
          .localCheckpoint(false)
      }
      // Materialize the (lazily checkpointed) final ranks while the
      // static caches are still alive — callers get a lineage-truncated
      // result and leave no pinned storage behind.
      ranks.count()
      ranks
    } finally {
      // CacheManager entries hold strong references (unlike checkpoint
      // RDDs, which the ContextCleaner collects) — release them on every
      // path, including failures.
      e.unpersist(false); nodes.unpersist(false); outdeg.unpersist(false)
    }
  }
}

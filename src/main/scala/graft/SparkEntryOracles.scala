package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** DuckDB-dialect oracle SQL for every [[SparkEntry]] query (same table
  * names as the parquet basenames in the sf directory), plus the
  * generators that replay plan-literal artifacts (LSH hyperplanes,
  * codebooks) as SQL literals. */
private[graft] trait SparkEntryOracles { self: SparkEntryFixtures =>


  // ---------------------------------------------------------------------
  // Oracle-SQL generators for the LSH queries: the hyperplanes are a pure
  // function of (nBits, dim, seed), so the oracle embeds them as literals
  // and recomputes every bucket assignment independently in DuckDB.
  // ---------------------------------------------------------------------

  /** Round-trip double literal DuckDB parses as DOUBLE (not DECIMAL). */
  private def sqlDouble(d: Double): String = {
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "E0"
  }

  /** Sign-bit LSH bucket of `vecCol` over the given planes as a DuckDB
    * expression — mirrors [[graft.ann.Ann.lshBucket]]. */
  private def bucketSql(vecCol: String, dim: Int, planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = p.map(sqlDouble).mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(range(1,${dim + 1}), " +
        s"j -> CAST($vecCol[j] AS DOUBLE) * $plane[j])) > 0 " +
        s"THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** One bucket column per LSH table, derived from the SAME
    * [[graft.ann.Ann.hyperplaneTables]] the operators use. */
  private def bucketColsSql(vecCol: String, nBits: Int, dim: Int, tables: Int): String =
    graft.ann.Ann.hyperplaneTables(nBits, dim, tables).zipWithIndex.map { case (planes, t) =>
      s"  ${bucketSql(vecCol, dim, planes)} AS b$t"
    }.mkString(",\n")

  /** Cosine of two DuckDB float-list columns in double precision. */
  /** 16-element list of `vecCol`·centroid dots, from the SAME
    * [[graft.ann.Ann.ivfCodebook]] the operator uses. */
  /** Full from-scratch replay of [[graft.ann.Ann.pqEncode]] +
    * [[graft.ann.Ann.pqAdcTopK]]: per-subspace code assignment against
    * the deterministic codebook literals (first-min ties via
    * list_position), then the asymmetric distance recomputed from the
    * query row's own embedding — same dimension fold order and same
    * left-associated subspace sum as the operators. */
  /** Per-subspace (code expression over alias `e`, ADC term over aliases
    * `qe`/`codes`) pairs for the PQ oracles below. */
  private def pqExprs(m: Int, k: Int, subDim: Int): (Seq[String], Seq[String]) = {
    val books = graft.ann.Ann.pqCodebooks(m, k, subDim)
    def bookLit(j: Int): String =
      books(j).map(_.map(sqlDouble).mkString("[", ", ", "]"))
        .mkString("[", ",\n      ", "]")
    val codeExprs = (0 until m).map { j =>
      val dists = s"list_transform(${bookLit(j)}, c -> " +
        s"list_sum(list_transform(range(1, ${subDim + 1}), " +
        s"i -> (e[${j * subDim} + i] - c[i]) * (e[${j * subDim} + i] - c[i]))))"
      s"(list_position($dists, list_min($dists)) - 1)"
    }
    val adcTerms = (0 until m).map { j =>
      s"list_sum(list_transform(range(1, ${subDim + 1}), " +
        s"i -> (qe[${j * subDim} + i] - (${bookLit(j)})[codes[${j + 1}] + 1][i]) * " +
        s"(qe[${j * subDim} + i] - (${bookLit(j)})[codes[${j + 1}] + 1][i])))"
    }
    (codeExprs, adcTerms)
  }

  private def pqAdcSql(m: Int, k: Int, subDim: Int, topK: Int): String = {
    val (codeExprs, adcTerms) = pqExprs(m, k, subDim)
    s"""WITH v AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
       |q AS (SELECT e AS qe FROM v
       |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
       |c AS (SELECT vec_id, [
       |  ${codeExprs.mkString(",\n  ")}
       |  ] AS codes FROM v),
       |d AS (SELECT c.vec_id AS neighbor_id,
       |  round(${adcTerms.mkString("\n  + ")}, 6) AS adc_dist2
       |  FROM c, q)
       |SELECT neighbor_id, adc_dist2 FROM d
       |WHERE neighbor_id <> (SELECT min(vec_id) FROM embeddings)
       |ORDER BY adc_dist2, neighbor_id LIMIT $topK""".stripMargin
  }

  /** [[pqAdcSql]] with the IVF coarse filter in front — the IVFADC
    * replay: cell per vector from the centroid dots (first-max ties),
    * query probes the nprobe best cells, codes/ADC score only the
    * survivors. */
  /** Shared by q_text_search and q_text_search_indexed (index-served
    * search answers the same query, row-for-row). */
  /** Bit-level HLL register replay (p=10 over document tokens) — shared
    * by the one-shot sketch and its streamed-segment twin. */
  private val hllRegistersSql: String =
    """WITH t AS (SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
      |  FROM documents),
      |tt AS (SELECT doc_id,
      |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
      |tok AS (SELECT unnest(toks) AS term FROM tt),
      |hh AS (SELECT md5_number_lower('hll:' || term) AS h FROM tok),
      |b AS (SELECT CAST(h >> 54 AS INT) AS register,
      |  h & ((1::UBIGINT << 54) - 1) AS w FROM hh),
      |s1 AS (SELECT register, w, w | (w >> 1) AS s FROM b),
      |s2 AS (SELECT register, w, s | (s >> 2) AS s FROM s1),
      |s3 AS (SELECT register, w, s | (s >> 4) AS s FROM s2),
      |s4 AS (SELECT register, w, s | (s >> 8) AS s FROM s3),
      |s5 AS (SELECT register, w, s | (s >> 16) AS s FROM s4),
      |s6 AS (SELECT register, w, s | (s >> 32) AS s FROM s5),
      |r AS (SELECT register,
      |  CASE WHEN w = 0 THEN 55 ELSE 55 - CAST(bit_count(s) AS INT) END AS rnk
      |  FROM s6)
      |SELECT register, max(rnk) AS rank FROM r
      |GROUP BY register ORDER BY register""".stripMargin

  private val textSearchSql: String =
    """WITH t AS (SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
      |  FROM documents),
      |tt AS (SELECT doc_id,
      |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t)
      |SELECT doc_id FROM tt
      |WHERE list_contains(toks, 'spark') AND list_contains(toks, 'window')
      |ORDER BY doc_id""".stripMargin

  /** Shared by q_text_cms / q_text_cms_heavy: the tokenized stream and
    * the 4×512 count-min cell grid (salted md5 buckets, unsigned
    * remainder). */
  private val cmsCellsSql: String =
    """t AS (SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
      |  FROM documents),
      |tt AS (SELECT doc_id,
      |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
      |tok AS (SELECT unnest(toks) AS term FROM tt),
      |h AS (SELECT r.d,
      |    CAST(md5_number_lower('cms' || r.d || ':' || t.term) % 512 AS INT) AS bucket
      |  FROM tok t CROSS JOIN range(0, 4) r(d)),
      |cells AS (SELECT d, bucket, count(*) AS cnt FROM h GROUP BY d, bucket)""".stripMargin

  /** DuckDB list-of-structs literal of [[bpeFixedMerges]], rank = list
    * position - 1 (kept sorted so `M[best + 1]` indexes the winning pair). */
  private val bpeMergesLit: String = bpeFixedMerges.zipWithIndex
    .map { case ((a, b), r) => s"{'r': $r, 'a': '$a', 'b': '$b'}" }
    .mkString("[", ", ", "]")

  /** The lowest applicable merge rank over adjacent symbol pairs —
    * NULL when no merge applies (the encoder's termination test). */
  private def bpeBestSql(syms: String): String =
    s"list_min(flatten(list_transform(range(1, len($syms)), i -> " +
      s"list_transform($bpeMergesLit, mm -> CASE WHEN mm.a = $syms[i] " +
      s"AND mm.b = $syms[i+1] THEN mm.r END))))"

  /** Shared trainer-replay CTE block (q_text_bpe_merges and
    * q_text_bpe_encode_trained): tokenization with per-doc positions,
    * the >= 2-count word table, the recursive per-round trainer state
    * `st`, and the learned merge list `ml` (structs ordered by rank).
    * The sweep's occurrence selection is PARITY-based — within a run of
    * consecutive occurrences (possible only when a == b) the 1st, 3rd,
    * ... merge and the rest skip, exactly the kernels' left-to-right
    * non-overlapping scan. */
  private val bpeTrainerCtes: String =
    """t AS (SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
      |  FROM documents),
      |d AS (SELECT doc_id,
      |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
      |tok AS (SELECT doc_id, unnest(range(1, len(toks)+1)) AS pos,
      |  unnest(toks) AS word FROM d),
      |wc AS (SELECT word, count(*)::BIGINT AS n FROM tok
      |  GROUP BY word HAVING count(*) >= 2),
      |st AS (
      |  SELECT 0 AS round, NULL::VARCHAR AS ma, NULL::VARCHAR AS mb,
      |         NULL::BIGINT AS mc, word, n,
      |         list_transform(range(1, length(word)+1),
      |           i -> substr(word, i::INT, 1)) AS syms
      |  FROM wc
      |  UNION ALL
      |  SELECT z.round + 1, z.a, z.b, z.c, z.word, z.n,
      |    list_filter(list_transform(range(1, len(z.syms)+1), i ->
      |      CASE WHEN z.sel[i] THEN z.a || z.b
      |           WHEN i > 1 AND z.sel[i-1] THEN NULL
      |           ELSE z.syms[i] END), x -> x IS NOT NULL) AS syms
      |  FROM (
      |    SELECT st.round, st.word, st.n, st.syms, b2.a, b2.b, b2.c,
      |      list_transform(range(1, len(st.syms)+1), i ->
      |        (i < len(st.syms) AND st.syms[i] = b2.a AND st.syms[i+1] = b2.b) AND
      |        (i - coalesce(list_max(list_transform(range(1, i+1), j ->
      |           CASE WHEN NOT (j < len(st.syms) AND st.syms[j] = b2.a
      |                AND st.syms[j+1] = b2.b) THEN j END)), 0)) % 2 = 1) AS sel
      |    FROM st CROSS JOIN (
      |      SELECT a, b, c FROM (
      |        SELECT x.syms[x.j] AS a, x.syms[x.j + 1] AS b, sum(x.n)::BIGINT AS c
      |        FROM (SELECT n, syms, unnest(range(1, len(syms)))::INT AS j FROM st) x
      |        GROUP BY 1, 2)
      |      ORDER BY c DESC, a, b LIMIT 1) b2(a, b, c)
      |    WHERE st.round < 24 AND b2.c >= 2) z
      |),
      |mg AS (SELECT DISTINCT (round - 1)::INT AS r, ma AS a, mb AS b
      |  FROM st WHERE round >= 1),
      |ml AS (SELECT coalesce(list(struct_pack(r := r, a := a, b := b)
      |  ORDER BY r), []) AS ms FROM mg)""".stripMargin

  /** Lowest-rank merge applicable to adjacent pairs of `syms`, over the
    * struct-list `ms` — NULL when no merge applies (encode termination). */
  private def bpeBestRankSql(syms: String, ms: String): String =
    s"list_min(flatten(list_transform(range(1, len($syms)), i -> " +
      s"list_transform($ms, mm -> CASE WHEN mm.a = $syms[i] " +
      s"AND mm.b = $syms[i+1] THEN mm.r END))))"

  /** Shared by q_scd2 (one-shot fold) and q_scd2_merge (batch-by-batch
    * keyed merges — definitionally equivalent, so one full-log replay
    * checks both): instant collapse by event_id-desc winner, null-safe
    * change detection, interval close + versions per user. */
  private val scd2Sql: String =
    """WITH vis AS (SELECT user_id, ts, event_type,
      |  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |  FROM events),
      |v AS (SELECT user_id, ts, event_type FROM vis WHERE rn = 1),
      |o AS (SELECT user_id, ts, event_type,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM v),
      |op AS (SELECT user_id, ts, event_type FROM o
      |  WHERE pts IS NULL OR prev IS DISTINCT FROM event_type),
      |h AS (SELECT user_id, event_type, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS version
      |  FROM op)
      |SELECT user_id, event_type,
      |  epoch_us(valid_from) AS valid_from_us,
      |  epoch_us(valid_to) AS valid_to_us,
      |  version, (valid_to IS NULL) AS is_current
      |FROM h ORDER BY user_id, version""".stripMargin

  /** Shared by q_text_bm25 and q_text_bm25_indexed (one scoring body —
    * Tfidf.bm25From — on the Spark side, one oracle here). */
  private val textBm25Sql: String =
    """WITH t AS (SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
      |  FROM documents),
      |tt AS (SELECT doc_id,
      |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
      |lens AS (SELECT doc_id, len(toks) AS len FROM tt),
      |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
      |tfall AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
      |dft AS (SELECT term, count(*) AS df FROM tfall
      |  WHERE term IN ('spark', 'window') GROUP BY term),
      |tfq AS (SELECT doc_id, term, count(*) AS tf FROM tok
      |  WHERE term IN ('spark', 'window') GROUP BY doc_id, term),
      |c AS (SELECT (SELECT count(*) FROM tt)::DOUBLE AS n,
      |  (SELECT sum(len) FROM lens)::DOUBLE / (SELECT count(*) FROM tt)::DOUBLE AS avgdl)
      |SELECT q.doc_id,
      |  round(sum(ln((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
      |    * q.tf / (q.tf + 1.2 * (0.25 + 0.75 * l.len / c.avgdl))), 4) AS bm25
      |FROM tfq q JOIN dft d ON q.term = d.term
      |  JOIN lens l ON q.doc_id = l.doc_id CROSS JOIN c
      |GROUP BY q.doc_id ORDER BY q.doc_id""".stripMargin

  /** Replay of [[graft.ann.Ann.knnJoinAgainst]] (and the self-join
    * specialization): shared k-means centroid chain, both cell
    * assignments (data rn=1, probe rn<=nprobe by (dist, cell)), the cell
    * equi-join and the rounded-cosine rank order. `probeWhere` /
    * `dataWhere` restrict the two sides (empty = self-join, which also
    * sets `excludeSame` — the operator's excludeSameId). */
  private def knnJoinSql(
      topK: Int, nprobe: Int, excludeSame: Boolean,
      probeWhere: String = "", dataWhere: String = ""): String =
    "WITH " + kmeansCentsSql(k = 8, dim = 64, iters = 2) +
      s"""dists AS (SELECT v.vec_id, c2.c,
        |  list_sum(list_transform(range(1, 65),
        |    i -> (v.q[i] - c2.cent[i]) * (v.q[i] - c2.cent[i]))) AS d
        |  FROM v, c2),
        |cellr AS (SELECT vec_id, c,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM dists),
        |e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings),
        |n AS (SELECT vec_id, ev,
        |  sqrt(list_sum(list_transform(ev, x -> x * x))) AS nm FROM e),
        |cand AS (SELECT p.vec_id AS vec_id, d.vec_id AS neighbor_id
        |  FROM (SELECT vec_id, c FROM cellr WHERE rn <= $nprobe $probeWhere) p
        |  JOIN (SELECT vec_id, c FROM cellr WHERE rn = 1 $dataWhere) d
        |  ON p.c = d.c${if (excludeSame) " AND p.vec_id <> d.vec_id" else ""}),
        |cos AS (SELECT cand.vec_id, cand.neighbor_id,
        |  round(list_sum(list_transform(range(1, 65), i -> a.ev[i] * b.ev[i])) /
        |    greatest(a.nm * b.nm, 1e-12), 6) AS cosine
        |  FROM cand JOIN n a ON cand.vec_id = a.vec_id
        |  JOIN n b ON cand.neighbor_id = b.vec_id)
        |SELECT vec_id, neighbor_id, cosine, nn_rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cosine DESC, neighbor_id) AS nn_rank FROM cos)
        |WHERE nn_rank <= $topK ORDER BY vec_id, nn_rank""".stripMargin

  /** Unrolled replay of [[graft.ops.Graph.pageRank]] over the
    * doc_id-arithmetic link fixture: every division is a floor over
    * non-negative integers (DuckDB `//` = Spark `DIV`), every sum an
    * integer sum, so all `iters` iterations replay bit-for-bit. */
  private def pageRankSql(iters: Int, dampPct: Int = 85): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e AS (SELECT src, dst FROM (
        |    SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT n FROM nn) AS dst
        |    FROM documents
        |    UNION ALL
        |    SELECT doc_id, (doc_id * 13 + 5) % (SELECT n FROM nn) FROM documents)
        |  WHERE src <> dst),
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |nc AS (SELECT count(*) AS n FROM nodes),
        |od AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |r0 AS (SELECT node, 1000000000 // (SELECT n FROM nc) AS pr FROM nodes),
        |""".stripMargin)
    for (t <- 1 to iters) {
      val prev = s"r${t - 1}"
      sb.append(
        s"""r$t AS (SELECT nodes.node,
           |  (${100 - dampPct} * CAST(1000000000 AS BIGINT)) // (100 * (SELECT n FROM nc))
           |    + ($dampPct * coalesce(s.s, 0)) // 100 AS pr
           |  FROM nodes LEFT JOIN (
           |    SELECT e.dst, sum($prev.pr // od.deg) AS s
           |    FROM $prev JOIN od ON $prev.node = od.src
           |    JOIN e ON e.src = od.src
           |    GROUP BY e.dst) s ON nodes.node = s.dst),
           |""".stripMargin)
    }
    sb.append(
      s"""fin AS (SELECT node, pr FROM r$iters)
         |SELECT node, CAST(pr AS BIGINT) AS rank_nano FROM fin ORDER BY node""".stripMargin)
    sb.toString
  }

  private def ivfPqSql(
      cells: Int, nprobe: Int, dim: Int,
      m: Int, k: Int, subDim: Int, topK: Int): String = {
    val (codeExprs, adcTerms) = pqExprs(m, k, subDim)
    s"""WITH v AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
       |  ${ivfDotsSql("embedding", cells, dim)} AS dots
       |  FROM embeddings),
       |cl AS (SELECT vec_id, e,
       |    list_position(dots, list_max(dots)) - 1 AS cell FROM v),
       |q AS (SELECT vec_id AS qid, e AS qe, dots AS qdots FROM v
       |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
       |qd AS (SELECT unnest(range($cells)) AS cell, unnest(qdots) AS d FROM q),
       |probe AS (SELECT cell FROM qd ORDER BY d DESC, cell LIMIT $nprobe),
       |c AS (SELECT vec_id, [
       |  ${codeExprs.mkString(",\n  ")}
       |  ] AS codes FROM cl
       |  WHERE cell IN (SELECT cell FROM probe)),
       |d AS (SELECT c.vec_id AS neighbor_id,
       |  round(${adcTerms.mkString("\n  + ")}, 6) AS adc_dist2
       |  FROM c, q WHERE c.vec_id <> q.qid)
       |SELECT neighbor_id, adc_dist2 FROM d
       |ORDER BY adc_dist2, neighbor_id LIMIT $topK""".stripMargin
  }

  private def ivfDotsSql(vecCol: String, cells: Int, dim: Int): String = {
    val cents = graft.ann.Ann.ivfCodebook(cells, dim)
    cents.map { c =>
      val lit = c.map(sqlDouble).mkString("[", ", ", "]")
      s"list_sum(list_transform(range(1,${dim + 1}), " +
        s"i -> CAST($vecCol[i] AS DOUBLE) * $lit[i]))"
    }.mkString("[\n    ", ",\n    ", "]")
  }

  /** Full from-scratch replay of [[graft.ann.Ann.kmeansFit]] +
    * [[graft.ann.Ann.kmeansAssign]] in DuckDB: milli-quantize, init from
    * the k smallest ids, then per iteration one assignment (row_number
    * over (dist, cluster) = the operators' first-min tie rule) and one
    * exact integer-mean centroid update (empty clusters keep their
    * previous centroid), ending with the final assignment. */
  /** WITH-body prefix deriving the k-means centroid chain `v, c0 .. c{iters}`
    * from scratch (quantized vectors, first-k init, Lloyd updates) —
    * shared by the kmeans and semantic-dedup oracles. Ends with a comma. */
  private def kmeansCentsSql(k: Int, dim: Int, iters: Int): String = {
    val r = s"range(1, ${dim + 1})"
    val sb = new StringBuilder
    sb.append(
      s"""v AS (SELECT vec_id,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)) AS q
         |  FROM embeddings),
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, q AS cent
         |  FROM (SELECT vec_id, q FROM v ORDER BY vec_id LIMIT $k)),
         |""".stripMargin)
    for (t <- 1 to iters) {
      val prev = s"c${t - 1}"
      sb.append(
        s"""d$t AS (SELECT v.vec_id, v.q, $prev.c,
           |  list_sum(list_transform($r,
           |    i -> (v.q[i] - $prev.cent[i]) * (v.q[i] - $prev.cent[i]))) AS d
           |  FROM v, $prev),
           |a$t AS (SELECT vec_id, q, c FROM (SELECT *, row_number()
           |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM d$t) WHERE rn = 1),
           |m$t AS (SELECT a$t.c, t.i, sum(q[t.i]) / count(*) AS val
           |  FROM a$t, (SELECT unnest($r) AS i) t GROUP BY a$t.c, t.i),
           |c$t AS (SELECT $prev.c, coalesce(l.cent, $prev.cent) AS cent FROM $prev
           |  LEFT JOIN (SELECT c, list(val ORDER BY i) AS cent FROM m$t GROUP BY c) l
           |  ON $prev.c = l.c),
           |""".stripMargin)
    }
    sb.toString
  }

  /** Full from-scratch replay of [[graft.ann.Ann.pqFit]] +
    * [[graft.ann.Ann.pqAdcTopKTrained]]: per-subspace k-means over the
    * sliced milli-quantized sub-vectors (same first-k init / first-min
    * ties / exact integer-mean updates as [[kmeansCentsSql]], slicing
    * commutes with quantization), then code assignment against the
    * FITTED sub-centroids and the left-associated milli-unit ADC sum
    * reported in original units². */
  private def pqTrainedSql(
      m: Int, k: Int, subDim: Int, iters: Int, topK: Int): String = {
    val r = s"range(1, ${subDim + 1})"
    val sb = new StringBuilder
    sb.append(
      s"""WITH v AS (SELECT vec_id,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)) AS q
         |  FROM embeddings),
         |""".stripMargin)
    for (j <- 0 until m) {
      val p = s"s$j"
      sb.append(
        s"""${p}v AS (SELECT vec_id,
           |  list_transform($r, i -> q[${j * subDim} + i]) AS sq FROM v),
           |${p}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, sq AS cent
           |  FROM (SELECT vec_id, sq FROM ${p}v ORDER BY vec_id LIMIT $k)),
           |""".stripMargin)
      for (t <- 1 to iters) {
        val prev = s"${p}c${t - 1}"
        sb.append(
          s"""${p}d$t AS (SELECT w.vec_id, w.sq, $prev.c,
             |  list_sum(list_transform($r,
             |    i -> (w.sq[i] - $prev.cent[i]) * (w.sq[i] - $prev.cent[i]))) AS d
             |  FROM ${p}v w, $prev),
             |${p}a$t AS (SELECT vec_id, sq, c FROM (SELECT *, row_number()
             |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM ${p}d$t) WHERE rn = 1),
             |${p}m$t AS (SELECT a.c, t.i, sum(a.sq[t.i]) / count(*) AS val
             |  FROM ${p}a$t a, (SELECT unnest($r) AS i) t GROUP BY a.c, t.i),
             |${p}c$t AS (SELECT $prev.c, coalesce(l.cent, $prev.cent) AS cent FROM $prev
             |  LEFT JOIN (SELECT c, list(val ORDER BY i) AS cent FROM ${p}m$t GROUP BY c) l
             |  ON $prev.c = l.c),
             |""".stripMargin)
      }
      val fin = s"${p}c$iters"
      sb.append(
        s"""${p}cd AS (SELECT w.vec_id, f.c,
           |  list_sum(list_transform($r,
           |    i -> (w.sq[i] - f.cent[i]) * (w.sq[i] - f.cent[i]))) AS d
           |  FROM ${p}v w, $fin f),
           |${p}code AS (SELECT vec_id, c FROM (SELECT *, row_number()
           |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM ${p}cd) WHERE rn = 1),
           |${p}adc AS (SELECT co.vec_id,
           |  list_sum(list_transform($r,
           |    i -> (qs.sq[i] - f.cent[i]) * (qs.sq[i] - f.cent[i]))) AS term
           |  FROM ${p}code co JOIN $fin f ON f.c = co.c,
           |  (SELECT sq FROM ${p}v
           |   WHERE vec_id = (SELECT min(vec_id) FROM embeddings)) qs),
           |""".stripMargin)
    }
    val joins = (0 until m)
      .map(j => s"JOIN s${j}adc t$j ON t$j.vec_id = v.vec_id").mkString("\n  ")
    val sum = (0 until m).map(j => s"t$j.term").mkString(" + ")
    sb.append(
      s"""f AS (SELECT v.vec_id AS neighbor_id,
         |  round(($sum) / 1000000.0, 6) AS adc_dist2
         |  FROM v
         |  $joins
         |  WHERE v.vec_id <> (SELECT min(vec_id) FROM embeddings))
         |SELECT neighbor_id, adc_dist2 FROM f
         |ORDER BY adc_dist2, neighbor_id LIMIT $topK""".stripMargin)
    sb.toString
  }

  /** Shared hashed-feature prelude (unigram+bigram md5 buckets over
    * `documents`) for the DSIR / LR oracle replays: CTEs t, tt, feats,
    * fb, rtf — ends with a trailing comma. */
  private def hashedFeatsSql(buckets: Int): String =
    s"""t AS (SELECT doc_id,
       |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
       |  FROM documents),
       |tt AS (SELECT doc_id,
       |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
       |feats AS (SELECT doc_id, unnest(toks || CASE WHEN len(toks) >= 2
       |  THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
       |  ELSE [] END) AS f FROM tt),
       |fb AS (SELECT doc_id, CAST(md5_number_lower(f) % $buckets AS BIGINT) AS bucket FROM feats),
       |rtf AS (SELECT doc_id, bucket, count(*) AS tf FROM fb GROUP BY 1, 2),
       |""".stripMargin

  /** Smoothed bucket models over the prelude's rtf/fb — the ONE copy of
    * the raw/target logprob CTEs every DSIR-family oracle builds on:
    * rc/rt/lpr (raw side), ttf/tct/lpt (target side, lpt carries cnt) —
    * ends with a trailing comma. */
  private def bucketModelsSql(buckets: Int): String =
    s"""rc AS (SELECT bucket, sum(tf) AS cnt FROM rtf GROUP BY 1),
       |rt AS (SELECT sum(cnt) AS t FROM rc),
       |lpr AS (SELECT bucket, CAST(floor(ln((cnt + 1)::DOUBLE / (rt.t + $buckets)::DOUBLE)
       |  * 1000000 + 0.5) AS BIGINT) AS lp FROM rc, rt),
       |ttf AS (SELECT fb.bucket, count(*) AS cnt FROM fb
       |  JOIN documents d ON fb.doc_id = d.doc_id WHERE d.lang = 'en' GROUP BY 1),
       |tct AS (SELECT coalesce(sum(cnt), 0) AS t FROM ttf),
       |lpt AS (SELECT bucket, cnt, CAST(floor(ln((cnt + 1)::DOUBLE / (tct.t + $buckets)::DOUBLE)
       |  * 1000000 + 0.5) AS BIGINT) AS lp FROM ttf, tct),
       |""".stripMargin

  /** DSIR model chain: the shared bucket models, then per-bucket
    * log-ratio and the per-doc weight CTE `pd` (doc_id, nf, lw) — ends
    * with a trailing comma. */
  private def dsirChainSql(buckets: Int): String =
    bucketModelsSql(buckets) +
    s"""ratio AS (SELECT r.bucket, coalesce(l.lp,
       |    (SELECT CAST(floor(ln(1.0 / (tct.t + $buckets)::DOUBLE) * 1000000 + 0.5) AS BIGINT)
       |     FROM tct)) - r.lp AS lr
       |  FROM lpr r LEFT JOIN lpt l ON r.bucket = l.bucket),
       |pd AS (SELECT rtf.doc_id, sum(rtf.tf) AS nf, sum(rtf.tf * ratio.lr) AS lw
       |  FROM rtf JOIN ratio ON rtf.bucket = ratio.bucket GROUP BY 1),
       |""".stripMargin

  /** Replay of [[graft.text.Dsir.klDivergence]]: both smoothed bucket
    * models, the full-outer union of observed buckets, the exact integer
    * contribution sum, and the closed-form never-seen-bucket term. */
  private def klSql(buckets: Int): String =
    "WITH " + hashedFeatsSql(buckets) + bucketModelsSql(buckets) +
      s"""consts AS (SELECT
         |  CAST(floor(ln(1.0 / (tct.t + $buckets)::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS st,
         |  CAST(floor(ln(1.0 / (rt.t + $buckets)::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS sr
         |  FROM tct, rt),
         |u AS (SELECT t.cnt AS tcnt, t.lp AS lpt2, r.lp AS lpr2
         |  FROM lpt t FULL JOIN lpr r ON t.bucket = r.bucket),
         |obs AS (SELECT count(*) AS nb,
         |    sum((coalesce(u.tcnt, 0) + 1) * (coalesce(u.lpt2, consts.st)
         |      - coalesce(u.lpr2, consts.sr))) AS s2
         |  FROM u, consts)
         |SELECT obs.nb::BIGINT AS n_buckets_observed, tct.t::BIGINT AS target_total,
         |  rt.t::BIGINT AS raw_total,
         |  (coalesce(obs.s2, 0) + ($buckets - obs.nb) * (consts.st - consts.sr))::BIGINT
         |    AS kl_num_micro
         |FROM obs, consts, tct, rt""".stripMargin

  /** Replay of [[graft.text.Dsir]]: hashed unigram+bigram feature buckets
    * (md5_number_lower % 1024 — bit-identical to [[graft.functions.Md5Bucket]]),
    * add-one-smoothed target/raw bucket logprobs quantized to integer
    * micro-nats, exact integer per-doc dot product; target = lang 'en'.
    * With `selectK` set, the deterministic top-k selection by
    * (logw_micro desc, doc_id); with `resample` = (k, salt), the
    * Gumbel-top-k without-replacement sample (key = logw + salted-md5
    * Gumbel noise quantized to micro-units). */
  private def dsirSql(
      selectK: Option[Int],
      resample: Option[(Int, String)] = None): String = {
    val body = "WITH " + hashedFeatsSql(1024) + dsirChainSql(1024) +
      """w AS (SELECT d.doc_id, coalesce(pd.nf, 0)::BIGINT AS n_features,
        |    coalesce(pd.lw, 0)::BIGINT AS logw_micro
        |  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id)""".stripMargin
    (selectK, resample) match {
      case (None, None) => body + "\nSELECT * FROM w ORDER BY doc_id"
      case (Some(k), None) => body +
        s""",
           |sel AS (SELECT doc_id, n_features, logw_micro, row_number()
           |    OVER (ORDER BY logw_micro DESC, doc_id) AS rk FROM w)
           |SELECT doc_id, n_features, logw_micro FROM sel WHERE rk <= $k
           |ORDER BY doc_id""".stripMargin
      case (None, Some((k, salt))) => body +
        s""",
           |keys AS (SELECT doc_id, n_features, logw_micro, logw_micro +
           |    CAST(floor(-ln(-ln(((md5_number_lower('$salt' || '|' || doc_id::VARCHAR)
           |      >> 11)::DOUBLE + 0.5) / 9007199254740992.0)) * 1000000 + 0.5) AS BIGINT)
           |    AS key_micro FROM w),
           |sel AS (SELECT *, row_number() OVER (ORDER BY key_micro DESC, doc_id)
           |    AS rk FROM keys)
           |SELECT doc_id, n_features, logw_micro, key_micro FROM sel
           |WHERE rk <= $k ORDER BY doc_id""".stripMargin
      case _ => throw new IllegalArgumentException(
        "selectK and resample are mutually exclusive")
    }
  }

  /** Logistic-regression chain over the prelude's rtf: labels, iteration
    * CTEs w0..wN/b0..bN, and the per-doc score CTE `sc` (doc_id, nf,
    * dot) — ends with a trailing comma. Final margin = dot + bN. */
  private def logRegChainSql(iters: Int, etaMilli: Long): String = {
    val sb = new StringBuilder
    sb.append(
      s"""labels AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
         |nn AS (SELECT count(*) AS n FROM documents),
         |w0 AS (SELECT DISTINCT bucket, 0::BIGINT AS w FROM rtf),
         |b0 AS (SELECT 0::BIGINT AS b),
         |""".stripMargin)
    for (i <- 1 to iters) {
      val (pw, pb) = (s"w${i - 1}", s"b${i - 1}")
      sb.append(
        s"""dots$i AS (SELECT rtf.doc_id, sum(rtf.tf * $pw.w) AS dot
           |  FROM rtf JOIN $pw USING (bucket) GROUP BY 1),
           |resid$i AS (SELECT l.doc_id, CAST(floor((l.y::DOUBLE -
           |    1.0 / (1.0 + exp(-((coalesce(d.dot, 0) + $pb.b)::DOUBLE / 1000000))))
           |    * 1000000 + 0.5) AS BIGINT) AS r
           |  FROM labels l LEFT JOIN dots$i d USING (doc_id), $pb),
           |g$i AS (SELECT rtf.bucket, sum(rtf.tf * resid$i.r) AS g
           |  FROM rtf JOIN resid$i USING (doc_id) GROUP BY 1),
           |w$i AS (SELECT $pw.bucket,
           |    ($pw.w + ($etaMilli * coalesce(g$i.g, 0)) // (1000 * nn.n))::BIGINT AS w
           |  FROM $pw LEFT JOIN g$i USING (bucket), nn),
           |b$i AS (SELECT ($pb.b + ($etaMilli * (SELECT sum(r) FROM resid$i))
           |    // (1000 * nn.n))::BIGINT AS b FROM $pb, nn),
           |""".stripMargin)
    }
    sb.append(
      s"""sc AS (SELECT rtf.doc_id, sum(rtf.tf) AS nf,
         |    sum(rtf.tf * coalesce(w$iters.w, 0)) AS dot
         |  FROM rtf LEFT JOIN w$iters USING (bucket) GROUP BY 1),
         |""".stripMargin)
    sb.toString
  }

  /** Replay of [[graft.text.LogReg]]: the shared hashed-feature prelude,
    * then `iters` UNROLLED gradient-descent iterations (the kmeansCentsSql
    * recipe) — margins by integer dot product, residuals quantized to
    * micro-units right after the sigmoid, integer gradient sums, weight
    * updates by DuckDB `//` = Java's truncating `/` — and the final margin
    * scores. Positives = lang 'en'. */
  private def logRegSql(iters: Int, buckets: Int, etaMilli: Long): String =
    "WITH " + hashedFeatsSql(buckets) + logRegChainSql(iters, etaMilli).stripSuffix(",\n") +
      s"""
         |SELECT d.doc_id, coalesce(sc.nf, 0)::BIGINT AS n_features,
         |  (coalesce(sc.dot, 0) + (SELECT b FROM b$iters))::BIGINT AS margin_micro
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         |ORDER BY d.doc_id""".stripMargin

  /** Replay of [[q_pipeline_curate8]]: the LR training chain, then the
    * per-source quality quota as the window formulation of the heap
    * top-k (margin desc, doc_id asc). */
  private def curate8Sql(
      iters: Int, buckets: Int, etaMilli: Long, perSource: Int): String =
    "WITH " + hashedFeatsSql(buckets) + logRegChainSql(iters, etaMilli) +
      s"""sco AS (SELECT d.doc_id, d.source,
         |    (coalesce(sc.dot, 0) + (SELECT b FROM b$iters))::BIGINT AS margin_micro
         |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY margin_micro DESC, doc_id) AS rank FROM sco)
         |SELECT source, rank, margin_micro, doc_id FROM rk
         |WHERE rank <= $perSource ORDER BY source, rank""".stripMargin

  /** Replay of [[q_pipeline_curate5]]: BOTH trained-model chains off one
    * shared hashed-feature table — per-doc combined score = DSIR weight +
    * LR margin, global top-`topK` by (combined desc, doc_id), then a
    * `perSource` cap in the same order. */
  private def curate5Sql(
      iters: Int, buckets: Int, etaMilli: Long, topK: Int,
      perSource: Int): String =
    "WITH " + hashedFeatsSql(buckets) + dsirChainSql(buckets) +
      logRegChainSql(iters, etaMilli) +
      s"""comb AS (SELECT d.doc_id, d.source,
         |    (coalesce(pd.lw, 0) + coalesce(sc.dot, 0) +
         |     (SELECT b FROM b$iters))::BIGINT AS combined_micro
         |  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
         |    LEFT JOIN sc ON d.doc_id = sc.doc_id),
         |ranked AS (SELECT *, row_number() OVER (ORDER BY combined_micro DESC, doc_id)
         |    AS rk FROM comb),
         |topd AS (SELECT doc_id, source, combined_micro FROM ranked WHERE rk <= $topK),
         |capped AS (SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY combined_micro DESC, doc_id) AS srk FROM topd)
         |SELECT doc_id, source, combined_micro FROM capped WHERE srk <= $perSource
         |ORDER BY doc_id""".stripMargin

  /** Replay of [[graft.ann.Ann.kmeansFit]] + [[graft.ann.Ann.ivfTopKTrained]]:
    * the trained-centroid chain, every vector's L2 cell assignment
    * (first-min ties), the query's nprobe nearest cells (d asc, ties by
    * cell), exact cosine re-rank of the probed survivors. */
  private def ivfTrainedSql(
      k: Int, dim: Int, iters: Int, nprobe: Int, topK: Int): String = {
    val r = s"range(1, ${dim + 1})"
    "WITH " + kmeansCentsSql(k, dim, iters) +
      s"""df AS (SELECT v.vec_id, c$iters.c,
         |  list_sum(list_transform($r,
         |    i -> (v.q[i] - c$iters.cent[i]) * (v.q[i] - c$iters.cent[i]))) AS d
         |  FROM v, c$iters),
         |asg AS (SELECT vec_id, c FROM (SELECT *, row_number()
         |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df) WHERE rn = 1),
         |qv AS (SELECT vec_id AS qid, q AS qq FROM v
         |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
         |qd AS (SELECT c$iters.c,
         |  list_sum(list_transform($r,
         |    i -> (qv.qq[i] - c$iters.cent[i]) * (qv.qq[i] - c$iters.cent[i]))) AS d
         |  FROM c$iters, qv),
         |probe AS (SELECT c FROM qd ORDER BY d, c LIMIT $nprobe),
         |s AS (SELECT a.vec_id AS neighbor_id,
         |  ${cosineSql("ea.embedding", "eq.embedding", dim)} AS cs
         |  FROM asg a
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN qv ON a.vec_id <> qv.qid
         |  JOIN embeddings eq ON eq.vec_id = qv.qid
         |  WHERE a.c IN (SELECT c FROM probe))
         |SELECT neighbor_id, round(cs, 6) AS cosine FROM s
         |ORDER BY cs DESC, neighbor_id LIMIT $topK""".stripMargin
  }

  /** Full replay of the [[graft.ann.Ann.kmeansStateInit]] →
    * [[graft.ann.Ann.kmeansStateUpdate]] mini-batch sequence: seed
    * centroids = first k vectors of batch 0, then each modulo-sliced
    * batch assigns against the then-current `sums/n` centroids
    * (first-min ties) and folds per-dimension exact integer sums +
    * counts. Emits (cluster, n, i, c_milli). */
  private def minibatchKmeansSql(k: Int, dim: Int, batches: Int): String = {
    val r = s"range(1, ${dim + 1})"
    val zeros = s"list_transform($r, i -> CAST(0 AS DOUBLE))"
    val sb = new StringBuilder
    sb.append(
      s"""WITH v AS (SELECT vec_id,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)) AS q
         |  FROM embeddings),
         |sd AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, q AS seed
         |  FROM (SELECT vec_id, q FROM v WHERE vec_id % $batches = 0
         |        ORDER BY vec_id LIMIT $k)),
         |c0 AS (SELECT c, seed AS cent FROM sd),
         |""".stripMargin)
    for (t <- 0 until batches) {
      val prevState = if (t == 0) "sd" else s"s${t - 1}"
      // live centroids for this batch's assignment
      if (t > 0) sb.append(
        s"""c$t AS (SELECT c, CASE WHEN n > 0
           |    THEN list_transform(sums, x -> x / n) ELSE seed END AS cent
           |  FROM $prevState),
           |""".stripMargin)
      sb.append(
        s"""d$t AS (SELECT v.vec_id, v.q, c$t.c,
           |  list_sum(list_transform($r,
           |    i -> (v.q[i] - c$t.cent[i]) * (v.q[i] - c$t.cent[i]))) AS d
           |  FROM v, c$t WHERE v.vec_id % $batches = $t),
           |a$t AS (SELECT vec_id, q, c FROM (SELECT *, row_number()
           |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM d$t) WHERE rn = 1),
           |m$t AS (SELECT a$t.c, t.i, sum(q[t.i]) AS sv, count(*) AS cnt
           |  FROM a$t, (SELECT unnest($r) AS i) t GROUP BY a$t.c, t.i),
           |g$t AS (SELECT c, list(sv ORDER BY i) AS sums, max(cnt) AS n
           |  FROM m$t GROUP BY c),
           |""".stripMargin)
      val (pn, psums) =
        if (t == 0) ("CAST(0 AS BIGINT)", zeros)
        else (s"s${t - 1}.n", s"s${t - 1}.sums")
      sb.append(
        s"""s$t AS (SELECT $prevState.c, $pn + coalesce(g$t.n, 0) AS n,
           |  CASE WHEN g$t.c IS NULL THEN $psums
           |    ELSE list_transform($r, i -> $psums[i] + g$t.sums[i]) END AS sums,
           |  $prevState.seed
           |  FROM $prevState LEFT JOIN g$t ON $prevState.c = g$t.c),
           |""".stripMargin)
    }
    sb.append(
      s"""fin AS (SELECT * FROM s${batches - 1})
         |SELECT CAST(c AS INT) AS cluster, n, CAST(t.i AS INT) AS i,
         |  round(CASE WHEN n > 0 THEN sums[t.i] / n ELSE seed[t.i] END, 6) AS c_milli
         |FROM fin, (SELECT unnest($r) AS i) t
         |ORDER BY cluster, i""".stripMargin)
    sb.toString
  }

  /** Replay of [[graft.text.Web.htmlBlocks]] over the q_web_htmlblocks
    * page construction: container strip → block split (ordinality via
    * generate_subscripts) → visible-text + anchor-text chains → token
    * counts → the integer cross-multiplied link-density gate. */
  private def htmlBlocksSql(minTokens: Int, maxAnchorPct: Int): String = {
    // rules 3-5 of the htmlToText chain (tag strip, entities, whitespace)
    def vis(x: String): String =
      "trim(regexp_replace(replace(replace(replace(replace(replace(replace(" +
        s"regexp_replace($x, '<[^>]*>', ' ', 'g')," +
        """'&lt;','<'),'&gt;','>'),'&quot;','"'),'&#39;',''''),""" +
        """'&nbsp;',' '),'&amp;','&'), '\s+',' ','g'))"""
    // the Tokenize kernel's documented regex equivalent
    def norm(x: String): String =
      s"trim(regexp_replace(regexp_replace(lower($x)," +
        "'[^a-z0-9 ]',' ','g'),' +',' ','g'))"
    def ntok(x: String): String =
      s"(CASE WHEN length(${norm(x)}) = 0 THEN 0 " +
        s"ELSE len(string_split(${norm(x)}, ' ')) END)::BIGINT"
    // name boundary: without it `p` would match `<path>`, `li` `<link>`
    val blockTag = "(?i)</?(?:p|div|section|article|main|header|footer|" +
      "nav|aside|h[1-6]|li|ul|ol|table|tr|td|th|blockquote|pre|br|hr)" +
      "(?:[\\s/][^>]*)?>"
    s"""WITH u AS (SELECT doc_id,
       |  '<html><body><nav><a href=''/''>Home</a> <a href=''/a''>About us</a> ' ||
       |  '<a href=''/c''>Contact</a></nav><h1>Doc ' || doc_id::VARCHAR ||
       |  '</h1><p>' || substr(text, 1, 200) || '</p>' ||
       |  (CASE WHEN doc_id % 3 = 0
       |    THEN '<div>Read more: <a href=''/x''>click here now</a> and ' ||
       |         '<a href=''/y''>subscribe to our newsletter</a></div>'
       |    ELSE '' END) ||
       |  '<footer><a href=''/p''>Privacy policy</a> ' ||
       |  '<a href=''/t''>Terms</a></footer></body></html>' AS html
       |  FROM documents),
       |cl AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(html,
       |  '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
       |  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
       |  '(?s)<!--.*?-->', ' ', 'g') AS ch FROM u),
       |sg AS (SELECT doc_id, string_split_regex(ch, '$blockTag') AS l FROM cl),
       |b AS (SELECT doc_id, unnest(l) AS seg,
       |  generate_subscripts(l, 1)::INT AS block_idx FROM sg),
       |t AS (SELECT doc_id, block_idx, ${vis("seg")} AS text,
       |  ${
        // DuckDB array_to_string([]) is NULL where Spark array_join([]) is '';
        // the '<a' must not swallow <abbr>/<area>/<audio>
        vis("coalesce(array_to_string(regexp_extract_all(seg, " +
          "'(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1), ' '), '')")} AS atext
       |  FROM b),
       |n AS (SELECT doc_id, block_idx, text,
       |  ${ntok("text")} AS n_tokens, ${ntok("atext")} AS anchor_tokens FROM t)
       |SELECT doc_id, block_idx, n_tokens, anchor_tokens,
       |  (n_tokens >= $minTokens
       |    AND anchor_tokens * 100 <= $maxAnchorPct * n_tokens) AS kept, text
       |FROM n WHERE n_tokens > 0 ORDER BY doc_id, block_idx""".stripMargin
  }

  private def kmeansSql(k: Int, dim: Int, iters: Int): String = {
    val r = s"range(1, ${dim + 1})"
    "WITH " + kmeansCentsSql(k, dim, iters) +
      s"""df AS (SELECT v.vec_id, c$iters.c,
         |  list_sum(list_transform($r,
         |    i -> (v.q[i] - c$iters.cent[i]) * (v.q[i] - c$iters.cent[i]))) AS d
         |  FROM v, c$iters)
         |SELECT vec_id, CAST(c AS INT) AS cluster, round(d / 1000000.0, 6) AS dist2
         |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df)
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }

  /** Cluster-outlier oracle: the [[kmeansSql]] assignment, re-ranked per
    * cluster by DESCENDING integer distance (monotone with the emitted
    * 6-dp dist2, so ranking pre-division is exact), vec_id tie-break. */
  private def outliersSql(k: Int, dim: Int, iters: Int, n: Int): String = {
    val r = s"range(1, ${dim + 1})"
    "WITH " + kmeansCentsSql(k, dim, iters) +
      s"""df AS (SELECT v.vec_id, c$iters.c,
         |  list_sum(list_transform($r,
         |    i -> (v.q[i] - c$iters.cent[i]) * (v.q[i] - c$iters.cent[i]))) AS d
         |  FROM v, c$iters),
         |asg AS (SELECT vec_id, CAST(c AS INT) AS cluster, d
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df)
         |  WHERE rn = 1),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY cluster
         |    ORDER BY d DESC, vec_id) AS orank FROM asg)
         |SELECT vec_id, cluster, round(d / 1000000.0, 6) AS dist2,
         |  CAST(orank AS INT) AS outlier_rank
         |FROM rk WHERE orank <= $n ORDER BY vec_id""".stripMargin
  }

  /** Semantic-dedup oracle: re-derives the k-means centroids, assigns
    * every vector to its nearest (first-min ties), forms within-cluster
    * cosine pairs, closes them transitively, keeps min-id per component. */
  private def semanticDedupSql(k: Int, dim: Int, iters: Int, threshold: Double): String = {
    val r = s"range(1, ${dim + 1})"
    "WITH RECURSIVE " + kmeansCentsSql(k, dim, iters) +
      s"""df AS (SELECT v.vec_id, c$iters.c,
         |  list_sum(list_transform($r,
         |    i -> (v.q[i] - c$iters.cent[i]) * (v.q[i] - c$iters.cent[i]))) AS d
         |  FROM v, c$iters),
         |asg AS (SELECT vec_id, c
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df)
         |  WHERE rn = 1),
         |p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM asg x JOIN asg y ON x.c = y.c AND x.vec_id < y.vec_id
         |  JOIN embeddings ea ON ea.vec_id = x.vec_id
         |  JOIN embeddings eb ON eb.vec_id = y.vec_id
         |  WHERE round(${cosineSql("ea.embedding", "eb.embedding", dim)}, 6) >= $threshold),
         |e AS (SELECT id_a AS a, id_b AS b FROM p
         |  UNION ALL SELECT id_b, id_a FROM p),
         |reach(node, lab) AS (
         |  SELECT a, a FROM e
         |  UNION
         |  SELECT e.a, reach.lab FROM e JOIN reach ON e.b = reach.node),
         |dup AS (SELECT node FROM reach GROUP BY node HAVING min(lab) < node)
         |SELECT vec_id FROM embeddings
         |WHERE vec_id NOT IN (SELECT node FROM dup)
         |ORDER BY vec_id""".stripMargin
  }

  private def cosineSql(a: String, b: String, dim: Int): String = {
    val r = s"range(1,${dim + 1})"
    s"""list_sum(list_transform($r, i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |    / greatest(
       |        sqrt(list_sum(list_transform($r, i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |      * sqrt(list_sum(list_transform($r, i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))), 1e-12)""".stripMargin
  }

  /** DuckDB-dialect oracle for each query above (same table names as the
    * parquet basenames in the sf directory). */

  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_multi" ->
      """SELECT n_name, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_join_semi" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer WHERE EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer WHERE NOT EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |   AND o_totalprice > 400000.0)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_join_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0.0), 2) AS total_price
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey LIMIT 1000""".stripMargin,
    "q_window_leadlag" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_orderkey) OVER w AS first_key
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) WHERE rn <= 3
        |ORDER BY p_brand, rn""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_total
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |WHERE s_acctbal > 9000.0
        |ORDER BY nationkey""".stripMargin,
    "q_set_union" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,
    "q_join_full" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 100),
        |o AS (SELECT o_custkey, count(*)::BIGINT AS n_orders FROM orders
        |  WHERE o_custkey BETWEEN 50 AND 150 GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_mktsegment,
        |  coalesce(n_orders, 0)::BIGINT AS n_orders
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "q_union_by_name" ->
      """WITH u AS (
        |  SELECT o_orderpriority AS priority, o_totalprice AS amount FROM orders
        |  UNION ALL
        |  SELECT NULL AS priority, l_extendedprice AS amount FROM lineitem)
        |SELECT priority, count(*)::BIGINT AS n, round(sum(amount), 2) AS total
        |FROM u GROUP BY priority ORDER BY priority NULLS FIRST""".stripMargin,
    "q_scalar_string" ->
      """SELECT p_partkey,
        |  upper(substr(p_name, 1, 10)) AS name10,
        |  length(p_name) AS name_len,
        |  p_brand || '#' || p_type AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_scalar_datetime" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS o_year,
        |  month(o_orderdate) AS o_month,
        |  dayofmonth(o_orderdate) AS o_day,
        |  quarter(o_orderdate) AS o_quarter
        |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin,
    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice > 300000.0 THEN 'big'
        |  WHEN o_totalprice > 100000.0 THEN 'mid'
        |  ELSE 'small' END AS bucket,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_having" ->
      """SELECT l_partkey, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_partkey
        |HAVING round(sum(l_quantity), 2) > 150.0
        |ORDER BY l_partkey""".stripMargin,
    "q_distinct_agg" ->
      """SELECT count(DISTINCT o_custkey) AS n_custs, count(*) AS n_orders
        |FROM orders""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_subquery_scalar" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c ORDER BY c_custkey LIMIT 1000""".stripMargin,
    "q_scalar_array" ->
      """SELECT p_partkey,
        |  CAST(len(string_split(p_type, ' ')) AS INT) AS n_words,
        |  CAST(list_contains(string_split(p_type, ' '), 'BRUSHED') AS INT)
        |    AS has_brushed,
        |  string_split(p_type, ' ')[1] AS first_word,
        |  array_to_string(list_sort(string_split(p_type, ' ')), '_')
        |    AS sorted_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_text_tokens" ->
      """WITH t AS (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(coalesce(list_sum(list_transform(toks,
        |    s -> greatest(1, CAST(ceil(length(s)/6.0) AS INT)))), 0) AS INT) AS n_subwords,
        |  CAST(length(text) AS INT) AS n_chars_raw
        |FROM tt ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT doc_id,
        |  length(regexp_replace(text,'[^[:punct:]]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS pr,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s)))::DOUBLE
        |    / greatest(len(toks),1)::DOUBLE AS sr,
        |  len(toks) AS nt
        |  FROM tt)
        |SELECT doc_id, round(pr,4) AS punct_ratio, round(dr,4) AS digit_ratio,
        |  round(sr,4) AS stopword_ratio,
        |  round(0.25*least(nt::DOUBLE/64.0, 1.0) + 0.25*least(sr*4.0, 1.0)
        |    + 0.25*(1.0-least(pr*4.0, 1.0)) + 0.25*(1.0-least(dr*4.0, 1.0)), 4) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_pipeline_curate2" ->
      """WITH t AS (SELECT doc_id, source, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, source, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT doc_id, source, len(toks) AS nt,
        |  coalesce(list_sum(list_transform(toks, s -> length(s))), 0)::DOUBLE
        |    / greatest(len(toks), 1)::DOUBLE AS ml,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE
        |    / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s))) AS sh
        |  FROM tt),
        |gated AS (SELECT doc_id, source FROM m
        |  WHERE nt >= 40 AND nt <= 100000 AND nt > 0 AND ml >= 4.0 AND ml <= 10.0
        |    AND dr <= 0.2 AND sh >= 2),
        |clean AS (SELECT doc_id, source FROM gated
        |  WHERE regexp_replace(lower(regexp_extract(
        |      'https://www.' || source || '.example.com/doc/' || doc_id::VARCHAR,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)),
        |      '^www\.', '')
        |    NOT IN ('src1.example.com','src3.example.com','src5.example.com')),
        |counts AS (
        |  SELECT source, count(*)::BIGINT AS n FROM clean
        |  WHERE source IN ('src0','src2','src4') GROUP BY source),
        |par AS (
        |  SELECT source, n,
        |    CASE source WHEN 'src0' THEN 0.25 WHEN 'src2' THEN 0.25 ELSE 0.5 END AS w
        |  FROM counts),
        |tgt AS (SELECT source, n, CAST(floor(w * 60 + 0.5) AS BIGINT) AS t FROM par),
        |ep AS (SELECT source, n, t, CAST(ceil(t::DOUBLE / n) AS BIGINT) AS e FROM tgt),
        |thr AS (
        |  SELECT source, e,
        |    lpad(format('{:x}',
        |      CAST(floor(t::DOUBLE / (n * e) * 4294967296.0 + 0.5) AS BIGINT)), 9, '0') AS th
        |  FROM ep),
        |epochs AS (SELECT source, th, unnest(range(e)) AS epoch FROM thr),
        |cand AS (
        |  SELECT d.doc_id, d.source, ei.epoch, ei.th
        |  FROM clean d JOIN epochs ei ON d.source = ei.source)
        |SELECT doc_id, source, epoch
        |FROM cand
        |WHERE '0' || substr(md5('cur2|' || doc_id::VARCHAR || '|' || epoch::VARCHAR), 1, 8) < th
        |ORDER BY doc_id, epoch""".stripMargin,
    "q_text_dupseg" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |words AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS idx FROM tt),
        |segs AS (SELECT doc_id, (idx-1)//2 AS i, string_agg(w, ' ' ORDER BY idx) AS seg
        |  FROM words GROUP BY doc_id, (idx-1)//2),
        |agg AS (SELECT doc_id, count(*)::BIGINT AS n_segments,
        |    (count(*) - count(DISTINCT seg))::BIGINT AS dup_segments
        |  FROM segs GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(a.n_segments, 0)::BIGINT AS n_segments,
        |  coalesce(a.dup_segments, 0)::BIGINT AS dup_segments,
        |  round(coalesce(a.dup_segments, 0)::DOUBLE
        |    / greatest(coalesce(a.n_segments, 0), 1)::DOUBLE, 4) AS dup_fraction
        |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q_text_gopher" ->
      """WITH t AS (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT doc_id, len(toks) AS nt,
        |  coalesce(list_sum(list_transform(toks, s -> length(s))), 0)::DOUBLE
        |    / greatest(len(toks), 1)::DOUBLE AS ml,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE
        |    / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s))) AS sh
        |  FROM tt)
        |SELECT doc_id,
        |  (nt >= 40 AND nt <= 100000) AS words_ok,
        |  (nt > 0 AND ml >= 4.0 AND ml <= 10.0) AS mean_word_len_ok,
        |  (dr <= 0.2) AS digit_ok,
        |  (sh >= 2) AS stopword_ok,
        |  ((nt >= 40 AND nt <= 100000) AND (nt > 0 AND ml >= 4.0 AND ml <= 10.0)
        |    AND (dr <= 0.2) AND (sh >= 2)) AS pass
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_web_pagerank" -> pageRankSql(iters = 5),
    "q_web_urlnorm" ->
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END) ||
        |  (CASE WHEN doc_id % 4 = 0 THEN 'WWW.'
        |    WHEN doc_id % 4 = 1 THEN 'a.B.' ELSE '' END) ||
        |  source || '.com' ||
        |  (CASE WHEN doc_id % 3 = 0 THEN ':443'
        |    WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END) ||
        |  '/Doc/' || doc_id::VARCHAR ||
        |  (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END) ||
        |  (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=news&b=2&a=1'
        |    WHEN doc_id % 4 = 1 THEN '?gclid=99'
        |    WHEN doc_id % 4 = 2 THEN '?z=1&fbclid=abc&a=2&' ELSE '' END) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '#Sec2' ELSE '' END) AS url
        |  FROM documents),
        |parts AS (SELECT doc_id, url,
        |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)', 1) AS hostport,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '^[^#]*?\?([^#]*)', 1) AS q
        |  FROM u),
        |comp AS (SELECT doc_id, url, scheme,
        |  regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')), '^www\.', '') AS host,
        |  regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
        |  regexp_replace(path, '/+$', '') AS cpath,
        |  list_sort(list_filter(string_split(q, '&'), p -> p <> '' AND
        |    NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)(=.*)?$'))) AS params
        |  FROM parts)
        |SELECT doc_id, url, scheme || '://' || host ||
        |  (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |    OR (scheme = 'https' AND port = '443') THEN '' ELSE ':' || port END) ||
        |  cpath ||
        |  (CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&')
        |    ELSE '' END) AS norm_url
        |FROM comp ORDER BY doc_id""".stripMargin,
    "q_web_htmltext" ->
      """WITH u AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || doc_id::VARCHAR || '</title>' ||
        |  (CASE WHEN doc_id % 4 = 0 THEN '<style>p { color: #fff; }</style>' ELSE '' END) ||
        |  (CASE WHEN doc_id % 3 = 0
        |    THEN '<script type="text/javascript">if (a<b && c>d) { alert(''x''); }</script>'
        |    ELSE '' END) ||
        |  '</head>' || chr(10) || '<body>' ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '<!-- hidden <b>note</b> -->' ELSE '' END) ||
        |  '<h1>Doc ' || doc_id::VARCHAR || '</h1>' || chr(10) || '<p>' ||
        |  substr(text, 1, 120) || '</p>' ||
        |  (CASE WHEN doc_id % 2 = 0
        |    THEN ' Fish &amp; Chips &lt;tm&gt; say &quot;hi&quot; it&#39;s a&nbsp;b'
        |    ELSE '' END) ||
        |  '</body></html>' AS html FROM documents),
        |c AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |    '(?s)<!--.*?-->', ' ', 'g'),
        |    '<[^>]*>', ' ', 'g') AS t FROM u)
        |SELECT doc_id, trim(regexp_replace(
        |  replace(replace(replace(replace(replace(replace(t,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&nbsp;', ' '), '&amp;', '&'),
        |  '\s+', ' ', 'g')) AS clean_text
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_web_htmlblocks" -> htmlBlocksSql(minTokens = 5, maxAnchorPct = 50),
    "q_web_domains" -> {
      // same public-suffix snapshot as Web.registrableDomainOf — the
      // alternation is generated from it so the two can never drift
      val alt = graft.text.Web.publicSuffixes
        .map(_.replace(".", "\\.")).mkString("|")
      val multi = s"regexp_extract(host, '([^.]+\\.(?:$alt))$$', 1)"
      val two = "regexp_extract(host, '([^.]+\\.[^.]+)$', 1)"
      s"""WITH u AS (SELECT doc_id,
        |  'https://' ||
        |  CASE doc_id % 4 WHEN 0 THEN 'www.' WHEN 1 THEN 'a.b.'
        |    WHEN 2 THEN '' ELSE 'sub.' END ||
        |  source ||
        |  CASE doc_id % 3 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
        |    ELSE '.com.au' END ||
        |  '/doc/' || doc_id::VARCHAR AS url
        |  FROM documents),
        |h AS (SELECT doc_id,
        |  lower(regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)) AS host
        |  FROM u),
        |d AS (SELECT doc_id,
        |  regexp_replace(host, '^www\\.', '') AS domain,
        |  CASE WHEN $multi <> '' THEN $multi
        |       WHEN $two <> '' THEN $two
        |       ELSE host END AS registrable
        |  FROM h)
        |SELECT doc_id, domain, registrable FROM d
        |WHERE registrable NOT IN ('src1.co.uk','src3.com.au','src5.com')
        |ORDER BY doc_id""".stripMargin
    },
    "q_text_langid" ->
      """WITH t AS (SELECT text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |s AS (SELECT
        |  len(list_filter(toks, w -> list_contains(['the','a','and','of','to','is','in','that','it','as'], w))) AS en,
        |  len(list_filter(toks, w -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','auf'], w))) AS de,
        |  len(list_filter(toks, w -> list_contains(['le','la','les','et','est','un','une','dans','que','pour'], w))) AS fr,
        |  len(list_filter(toks, w -> list_contains(['el','los','las','y','es','un','una','en','que','por'], w))) AS es,
        |  length(regexp_replace(text,'[^\x{4e00}-\x{9fff}]','','g'))::DOUBLE
        |    / greatest(length(text),1)::DOUBLE AS cjkr
        |  FROM tt)
        |SELECT CASE WHEN cjkr > 0.05 THEN 'zh'
        |  WHEN en=0 AND de=0 AND fr=0 AND es=0 THEN 'und'
        |  WHEN en>=de AND en>=fr AND en>=es THEN 'en'
        |  WHEN de>=fr AND de>=es THEN 'de'
        |  WHEN fr>=es THEN 'fr' ELSE 'es' END AS lang_pred, count(*) AS n
        |FROM s GROUP BY 1 ORDER BY lang_pred""".stripMargin,
    "q_text_topterms" ->
      """WITH t AS (SELECT
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tok AS (SELECT unnest(
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END) AS tok
        |  FROM t)
        |SELECT tok, count(*) AS n FROM tok GROUP BY tok
        |ORDER BY n DESC, tok LIMIT 50""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))) AS fp
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,
    "q_dedup_exact" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |k AS (SELECT doc_id, md5(array_to_string(
        |  (CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END)[1:3], ' ')) AS dup_key
        |  FROM t)
        |SELECT dup_key, count(*) AS group_size, min(doc_id) AS keeper_id
        |FROM k GROUP BY dup_key HAVING count(*) > 1 ORDER BY dup_key""".stripMargin,
    "q_report_leakage" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |h AS (SELECT doc_id, list_transform(range(0, greatest(length(norm) - 11, 0)),
        |    p -> md5_number_lower(substr(norm, p::INT + 1, 12))) AS hs FROM t),
        |sel AS (SELECT doc_id, hs, unnest(list_transform(
        |    range(0, CASE WHEN len(hs) = 0 THEN 0 ELSE greatest(len(hs) - 7, 1) END),
        |    j -> j::INT + least(8, len(hs) - j::INT)
        |       - list_position(list_reverse(hs[j+1 : j+8]), list_min(hs[j+1 : j+8])))) AS pos
        |  FROM h),
        |fp AS (SELECT DISTINCT doc_id, hs[pos+1] AS hash FROM sel),
        |ok AS (SELECT hash FROM fp GROUP BY hash HAVING count(*) <= 40),
        |fc AS (SELECT fp.doc_id, fp.hash FROM fp JOIN ok USING (hash)),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM fc a JOIN fc b ON a.hash = b.hash AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |ps AS (SELECT least(sa.source, sb.source) AS source_a,
        |    greatest(sa.source, sb.source) AS source_b, p.shared
        |  FROM p JOIN documents sa ON p.id_a = sa.doc_id
        |         JOIN documents sb ON p.id_b = sb.doc_id)
        |SELECT source_a, source_b, count(*) AS n_pairs,
        |  sum(shared)::BIGINT AS shared_total
        |FROM ps GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,
    "q_text_blocklist" ->
      """WITH m AS (SELECT doc_id,
        |  list_filter(['fast table', 'scan slow', 'batch window spark',
        |    'customer query', 'value sort column'],
        |    p -> contains(text, p)) AS matched
        |  FROM documents)
        |SELECT doc_id, array_to_string(matched, '|') AS matched
        |FROM m WHERE len(matched) > 0
        |ORDER BY doc_id""".stripMargin,
    // exact replay of the BPE TRAINER: recursive CTE whose working
    // table is the (word, count, symbols) state of one round; the best
    // pair is a global aggregate over the previous iteration (count
    // desc, (left, right) asc — the TreeSet's order), and the sweep
    // merges non-overlapping occurrences left-to-right via the parity
    // of each occurrence's run position (sound for a == b runs, where
    // "aaa" counts the pair twice but merges once). Stops below
    // minPairCount = 2 or at 24 merges. Matches trainLocal bit-for-bit.
    "q_text_bpe_merges" ->
      s"""WITH RECURSIVE $bpeTrainerCtes
        |SELECT DISTINCT (round - 1)::INT AS rank, ma AS "left", mb AS "right",
        |  mc AS pair_count
        |FROM st WHERE round >= 1 ORDER BY rank""".stripMargin,
    // the TRAIN -> ENCODE composition: the recursive trainer CTE learns
    // the merges, a second recursion replays the encoder under them
    // (lowest-rank applicable pair per round, parity-selected sweep)
    // over distinct words, and per-doc subword streams reassemble in
    // token order — the full pipeline hash-verified end to end
    "q_text_bpe_encode_trained" ->
      s"""WITH RECURSIVE $bpeTrainerCtes,
        |w AS (SELECT DISTINCT word FROM tok),
        |enc AS (
        |  SELECT word, list_transform(range(1, length(word)+1),
        |    i -> substr(word, i::INT, 1)) AS syms FROM w
        |  UNION ALL
        |  SELECT z.word, list_filter(list_transform(range(1, len(z.syms)+1), i ->
        |      CASE WHEN z.sel[i] THEN z.pa || z.pb
        |           WHEN i > 1 AND z.sel[i-1] THEN NULL
        |           ELSE z.syms[i] END), x -> x IS NOT NULL) AS syms
        |  FROM (
        |    SELECT y.word, y.syms,
        |      (y.ms[y.best + 1]).a AS pa, (y.ms[y.best + 1]).b AS pb,
        |      list_transform(range(1, len(y.syms)+1), i ->
        |        (i < len(y.syms) AND y.syms[i] = (y.ms[y.best+1]).a
        |           AND y.syms[i+1] = (y.ms[y.best+1]).b) AND
        |        (i - coalesce(list_max(list_transform(range(1, i+1), j ->
        |          CASE WHEN NOT (j < len(y.syms) AND y.syms[j] = (y.ms[y.best+1]).a
        |               AND y.syms[j+1] = (y.ms[y.best+1]).b) THEN j END)), 0)) % 2 = 1)
        |        AS sel
        |    FROM (SELECT e.word, e.syms, ml.ms,
        |            ${bpeBestRankSql("e.syms", "ml.ms")} AS best
        |          FROM enc e CROSS JOIN ml) y
        |    WHERE y.best IS NOT NULL) z
        |),
        |fin AS (SELECT word, syms FROM
        |  (SELECT e.word, e.syms, ${bpeBestRankSql("e.syms", "ml.ms")} AS best
        |   FROM enc e CROSS JOIN ml) y WHERE best IS NULL),
        |ew AS (SELECT word, array_to_string(syms, ' ') AS sub,
        |  len(syms) AS n_sub FROM fin),
        |agg AS (SELECT tok.doc_id, sum(ew.n_sub) AS n_subwords,
        |  array_to_string(list(ew.sub ORDER BY tok.pos), ' ') AS subwords
        |  FROM tok JOIN ew USING (word) GROUP BY tok.doc_id)
        |SELECT dd.doc_id, coalesce(a.n_subwords, 0)::INT AS n_subwords,
        |  coalesce(a.subwords, '') AS subwords
        |FROM documents dd LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // exact replay of the BPE encoder under the plan-literal merge
    // table: recursive CTE over DISTINCT words, one round per step =
    // lowest-rank adjacent pair merged at every matching position
    // (a != b for all pairs makes positions non-overlapping)
    "q_text_bpe_encode" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |d AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT doc_id, unnest(range(1, len(toks)+1)) AS pos,
        |  unnest(toks) AS word FROM d),
        |w AS (SELECT DISTINCT word FROM tok),
        |enc AS (
        |  SELECT word, list_transform(range(1, length(word)+1),
        |    i -> substr(word, i::INT, 1)) AS syms FROM w
        |  UNION ALL
        |  SELECT word, list_filter(list_transform(range(1, len(syms)+1), i ->
        |      CASE WHEN i < len(syms) AND syms[i] = mg.a AND syms[i+1] = mg.b
        |             THEN mg.a || mg.b
        |           WHEN i > 1 AND syms[i-1] = mg.a AND syms[i] = mg.b THEN NULL
        |           ELSE syms[i] END), x -> x IS NOT NULL) AS syms
        |  FROM (SELECT word, syms,
        |        $bpeMergesLit[${bpeBestSql("syms")} + 1] AS mg FROM enc) z
        |  WHERE mg IS NOT NULL),
        |fin AS (SELECT word, syms FROM (SELECT word, syms,
        |    $bpeMergesLit[${bpeBestSql("syms")} + 1] AS mg FROM enc) z
        |  WHERE mg IS NULL),
        |ew AS (SELECT word, array_to_string(syms, ' ') AS sub,
        |  len(syms) AS n_sub FROM fin),
        |agg AS (SELECT tok.doc_id, count(*) AS n_words,
        |  sum(ew.n_sub) AS n_subwords,
        |  array_to_string(list(ew.sub ORDER BY tok.pos), ' ') AS subwords
        |  FROM tok JOIN ew USING (word) GROUP BY tok.doc_id)
        |SELECT dd.doc_id, coalesce(a.n_words, 0)::INT AS n_words,
        |  coalesce(a.n_subwords, 0)::INT AS n_subwords,
        |  coalesce(a.subwords, '') AS subwords
        |FROM documents dd LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_text_winnow_incremental" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |h AS (SELECT doc_id, list_transform(range(0, greatest(length(norm) - 11, 0)),
        |    p -> md5_number_lower(substr(norm, p::INT + 1, 12))) AS hs FROM t),
        |sel AS (SELECT doc_id, hs, unnest(list_transform(
        |    range(0, CASE WHEN len(hs) = 0 THEN 0 ELSE greatest(len(hs) - 7, 1) END),
        |    j -> j::INT + least(8, len(hs) - j::INT)
        |       - list_position(list_reverse(hs[j+1 : j+8]), list_min(hs[j+1 : j+8])))) AS pos
        |  FROM h),
        |fp AS (SELECT DISTINCT doc_id, hs[pos+1] AS hash FROM sel),
        |dup AS (SELECT b.doc_id FROM fp b JOIN fp c ON b.hash = c.hash
        |  AND b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        |  GROUP BY b.doc_id, c.doc_id HAVING count(*) >= 5)
        |SELECT doc_id FROM documents
        |WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM dup)
        |ORDER BY doc_id""".stripMargin,
    "q_text_winnow" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |h AS (SELECT doc_id, list_transform(range(0, greatest(length(norm) - 11, 0)),
        |    p -> md5_number_lower(substr(norm, p::INT + 1, 12))) AS hs FROM t),
        |sel AS (SELECT doc_id, hs, unnest(list_transform(
        |    range(0, CASE WHEN len(hs) = 0 THEN 0 ELSE greatest(len(hs) - 7, 1) END),
        |    j -> j::INT + least(8, len(hs) - j::INT)
        |       - list_position(list_reverse(hs[j+1 : j+8]), list_min(hs[j+1 : j+8])))) AS pos
        |  FROM h),
        |fp AS (SELECT DISTINCT doc_id, hs[pos+1] AS hash FROM sel),
        |ok AS (SELECT hash FROM fp GROUP BY hash HAVING count(*) <= 40),
        |fc AS (SELECT fp.doc_id, fp.hash FROM fp JOIN ok USING (hash))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |FROM fc a JOIN fc b ON a.hash = b.hash AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 5
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_editdist" ->
      """WITH s AS (SELECT c_custkey AS id, c_name AS name FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  levenshtein(a.name, b.name)::INT AS dist
        |FROM s a JOIN s b ON a.id < b.id
        |WHERE abs(length(a.name) - length(b.name)) <= 1
        |  AND levenshtein(a.name, b.name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_editdist_incremental" ->
      """WITH b AS (SELECT c_custkey AS id, c_name AS name FROM customer
        |  WHERE c_custkey % 2 = 1),
        |e AS (SELECT c_custkey AS corpus_id, c_name AS name FROM customer
        |  WHERE c_custkey % 2 = 0)
        |SELECT b.id, e.corpus_id, levenshtein(b.name, e.name)::INT AS dist
        |FROM b JOIN e ON abs(length(b.name) - length(e.name)) <= 1
        |  AND levenshtein(b.name, e.name) <= 1
        |ORDER BY id, corpus_id""".stripMargin,
    "q_text_spellcorrect" ->
      """WITH dict AS (
        |  SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w FROM part),
        |q AS (SELECT p_partkey AS id,
        |    substr(string_split(p_name,' ')[1], 1, 1) ||
        |    substr(string_split(p_name,' ')[1], 3) AS query
        |  FROM part),
        |m AS (SELECT q.id, q.query, d.w AS match, levenshtein(q.query, d.w)::INT AS dist
        |  FROM q CROSS JOIN dict d WHERE levenshtein(q.query, d.w) <= 1),
        |r AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist, match) AS rn
        |  FROM m)
        |SELECT id, query, match, dist FROM r WHERE rn = 1 ORDER BY id""".stripMargin,
    "q_dedup_ngram" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.s, b.s))::DOUBLE /
        |    len(list_distinct(list_concat(a.s, b.s)))::DOUBLE, 4) AS jaccard
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_containment" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s))::DOUBLE / len(a.s)::DOUBLE AS c
        |  FROM sh a, sh b WHERE a.doc_id <> b.doc_id)
        |SELECT id_a, id_b, round(c, 4) AS containment FROM p WHERE c >= 0.7
        |ORDER BY id_a, id_b""".stripMargin,
    "q_text_redact" ->
      """WITH p AS (SELECT doc_id,
        |  substr(text, 1, 80) || ' contact user' || doc_id ||
        |  '@example.com or 10.0.' || (doc_id % 256) || '.7 call 555-123-4567' AS planted
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(planted,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '<IP>', 'g'),
        |    '\+?\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS redacted
        |FROM p ORDER BY doc_id LIMIT 300""".stripMargin,
    "q_text_repetition" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |g AS (SELECT doc_id, unnest(
        |  CASE WHEN len(toks) <= 2 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-1), i -> array_to_string(toks[i+1:i+2],' ')) END) AS g
        |  FROM tt),
        |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g)
        |SELECT doc_id, sum(c)::BIGINT AS n_grams, max(c)::BIGINT AS top_count,
        |  round(max(c)::DOUBLE / sum(c)::DOUBLE, 4) AS rep_ratio
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_pipeline_curate" ->
      """WITH t AS (SELECT doc_id, source, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, source, text, norm,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT doc_id, source, md5(norm) AS fp,
        |  length(regexp_replace(text,'[^[:punct:]]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS pr,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s)))::DOUBLE
        |    / greatest(len(toks),1)::DOUBLE AS sr,
        |  len(toks) AS nt,
        |  len(list_filter(toks, w -> list_contains(['the','a','and','of','to','is','in','that','it','as'], w))) AS en,
        |  len(list_filter(toks, w -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','auf'], w))) AS de,
        |  len(list_filter(toks, w -> list_contains(['le','la','les','et','est','un','une','dans','que','pour'], w))) AS fr,
        |  len(list_filter(toks, w -> list_contains(['el','los','las','y','es','un','una','en','que','por'], w))) AS es,
        |  length(regexp_replace(text,'[^\x{4e00}-\x{9fff}]','','g'))::DOUBLE
        |    / greatest(length(text),1)::DOUBLE AS cjkr
        |  FROM tt),
        |scored AS (SELECT doc_id, source, fp,
        |  round(0.25*least(nt::DOUBLE/64.0, 1.0) + 0.25*least(sr*4.0, 1.0)
        |    + 0.25*(1.0-least(pr*4.0, 1.0)) + 0.25*(1.0-least(dr*4.0, 1.0)), 4) AS quality,
        |  CASE WHEN cjkr > 0.05 THEN 'zh'
        |    WHEN en=0 AND de=0 AND fr=0 AND es=0 THEN 'und'
        |    WHEN en>=de AND en>=fr AND en>=es THEN 'en'
        |    WHEN de>=fr AND de>=es THEN 'de'
        |    WHEN fr>=es THEN 'fr' ELSE 'es' END AS lang_pred
        |  FROM m),
        |f AS (SELECT * FROM scored
        |  WHERE quality >= 0.5 AND lang_pred IN ('en', 'und')),
        |d AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY md5('cur|' || doc_id::VARCHAR), doc_id) AS srn
        |  FROM d WHERE rn = 1)
        |SELECT doc_id, source, quality FROM r WHERE srn <= 10
        |ORDER BY doc_id""".stripMargin,
    "q_text_invindex" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |term AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tt),
        |ch AS (SELECT term, doc_id // 100 AS chunk_idx, count(*)::INT AS chunk_docs,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |  FROM term GROUP BY term, doc_id // 100),
        |tot AS (SELECT term, sum(chunk_docs)::BIGINT AS doc_freq FROM ch GROUP BY term)
        |SELECT ch.term, ch.chunk_idx, tot.doc_freq, ch.chunk_docs,
        |  ch.first_doc, ch.last_doc
        |FROM ch JOIN tot ON ch.term = tot.term
        |ORDER BY ch.term, ch.chunk_idx""".stripMargin,
    "q_text_search" -> textSearchSql,
    // the index-served search answers the SAME query: one oracle
    "q_text_search_indexed" -> textSearchSql,
    "q_sample_split" ->
      s"""SELECT doc_id, source,
        |  CASE WHEN '0' || substr(md5('s3|' || doc_id::VARCHAR), 1, 8) <
        |      '${"%09x".format(math.round(0.8 * 4294967296.0))}' THEN 'train'
        |    WHEN '0' || substr(md5('s3|' || doc_id::VARCHAR), 1, 8) <
        |      '${"%09x".format(math.round(0.9 * 4294967296.0))}' THEN 'val'
        |    ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_segdedup" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |words AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS idx FROM tt),
        |segs AS (SELECT doc_id, (idx-1)//2 AS i, string_agg(w, ' ' ORDER BY idx) AS seg
        |  FROM words GROUP BY doc_id, (idx-1)//2),
        |freq AS (SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 20),
        |agg AS (SELECT s.doc_id, count(*)::INT AS segs_total,
        |    sum(CASE WHEN f.seg IS NOT NULL THEN 1 ELSE 0 END)::INT AS segs_removed,
        |    coalesce(string_agg(CASE WHEN f.seg IS NULL THEN s.seg END, ' ' ORDER BY s.i), '') AS clean_text
        |  FROM segs s LEFT JOIN freq f ON s.seg = f.seg
        |  GROUP BY s.doc_id)
        |SELECT t.doc_id, coalesce(a.segs_total, 0) AS segs_total,
        |  coalesce(a.segs_removed, 0) AS segs_removed,
        |  coalesce(a.clean_text, '') AS clean_text
        |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q_text_chunks" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM tt),
        |ints AS (SELECT unnest(range(0, (SELECT
        |  coalesce(max((greatest(n - 32, 0) + 15) // 16 + 1), 0) FROM n))) AS c)
        |SELECT doc_id, c::INT AS chunk_idx,
        |  len(toks[c*16+1 : c*16+32])::INT AS n_tokens,
        |  array_to_string(toks[c*16+1 : c*16+32], ' ') AS chunk_text
        |FROM n JOIN ints
        |  ON n.n > 0 AND c <= (greatest(n.n - 32, 0) + 15) // 16
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_text_bm25" -> textBm25Sql,
    // same micro-nat quantization before the integer per-doc sum
    "q_text_entropy" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
        |tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
        |per AS (SELECT doc_id, c,
        |  CAST(floor(c::DOUBLE * ln(c::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
        |  FROM tf),
        |a AS (SELECT doc_id, sum(c)::BIGINT AS n, sum(m)::BIGINT AS s
        |  FROM per GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n, 0)::BIGINT AS n_tokens,
        |  CASE WHEN a.n > 0 THEN
        |    CAST(floor(ln(a.n::DOUBLE) * 1000000 + 0.5) AS BIGINT) - (a.s // a.n)
        |  END AS entropy_micro
        |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // the index-served search is EXACT (contains verify), so the
    // brute-force normalized substring scan is the complete oracle
    "q_text_trgm" ->
      """SELECT doc_id FROM (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS n
        |  FROM documents)
        |WHERE contains(n, 'spark wind') ORDER BY doc_id""".stripMargin,
    // unpivot the five columns, then the same portable-HLL chain at
    // p=10 (m=1024) with exact rows/nulls alongside
    "q_profile_portable" ->
      """WITH items AS (
        |  SELECT 'o_orderkey' AS col, o_orderkey::VARCHAR AS v FROM orders
        |  UNION ALL SELECT 'o_custkey', o_custkey::VARCHAR FROM orders
        |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL SELECT 'o_orderdate', o_orderdate::VARCHAR FROM orders),
        |cnts AS (SELECT col, count(*) AS rows,
        |  sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls
        |  FROM items GROUP BY col),
        |hh AS (SELECT col, md5_number_lower('hll:' || v) AS h FROM items
        |  WHERE v IS NOT NULL),
        |b AS (SELECT col, CAST(h >> 54 AS INT) AS register,
        |  h & ((1::UBIGINT << 54) - 1) AS w FROM hh),
        |s1 AS (SELECT col, register, w, w | (w >> 1) AS s FROM b),
        |s2 AS (SELECT col, register, w, s | (s >> 2) AS s FROM s1),
        |s3 AS (SELECT col, register, w, s | (s >> 4) AS s FROM s2),
        |s4 AS (SELECT col, register, w, s | (s >> 8) AS s FROM s3),
        |s5 AS (SELECT col, register, w, s | (s >> 16) AS s FROM s4),
        |s6 AS (SELECT col, register, w, s | (s >> 32) AS s FROM s5),
        |r AS (SELECT col, register,
        |  CASE WHEN w = 0 THEN 55 ELSE 55 - CAST(bit_count(s) AS INT) END AS rnk
        |  FROM s6),
        |regs AS (SELECT col, register, max(rnk) AS rnk FROM r GROUP BY 1, 2),
        |a AS (SELECT col, count(*) AS filled,
        |  sum(1::BIGINT << (48 - least(rnk, 48))) AS tf FROM regs GROUP BY col),
        |f AS (SELECT col, (1024 - filled)::BIGINT AS v_zero,
        |  (tf + (1024 - filled)::BIGINT * (1::BIGINT << 48))::BIGINT AS t_scaled
        |  FROM a)
        |SELECT c.col, c.rows, c.nulls, f.v_zero, f.t_scaled,
        |  round(CASE WHEN f.v_zero > 0 AND
        |      0.7213 / (1 + 1.079 / 1024.0) * 1024.0 * 1024.0
        |        * 281474976710656.0 / f.t_scaled <= 2560.0
        |    THEN 1024.0 * ln(1024.0 / f.v_zero)
        |    ELSE 0.7213 / (1 + 1.079 / 1024.0) * 1024.0 * 1024.0
        |        * 281474976710656.0 / f.t_scaled END, 4) AS est
        |FROM cnts c LEFT JOIN f ON c.col = f.col
        |ORDER BY c.col""".stripMargin,
    // per-source register fold + exact-integer harmonic sum + the same
    // double correction arithmetic (identical IEEE op order)
    "q_text_hll_group" ->
      """WITH t AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT source,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT source, unnest(toks) AS term FROM tt),
        |hh AS (SELECT source, md5_number_lower('hll:' || term) AS h FROM tok),
        |b AS (SELECT source, CAST(h >> 57 AS INT) AS register,
        |  h & ((1::UBIGINT << 57) - 1) AS w FROM hh),
        |s1 AS (SELECT source, register, w, w | (w >> 1) AS s FROM b),
        |s2 AS (SELECT source, register, w, s | (s >> 2) AS s FROM s1),
        |s3 AS (SELECT source, register, w, s | (s >> 4) AS s FROM s2),
        |s4 AS (SELECT source, register, w, s | (s >> 8) AS s FROM s3),
        |s5 AS (SELECT source, register, w, s | (s >> 16) AS s FROM s4),
        |s6 AS (SELECT source, register, w, s | (s >> 32) AS s FROM s5),
        |r AS (SELECT source, register,
        |  CASE WHEN w = 0 THEN 58 ELSE 58 - CAST(bit_count(s) AS INT) END AS rnk
        |  FROM s6),
        |regs AS (SELECT source, register, max(rnk) AS rnk FROM r GROUP BY 1, 2),
        |a AS (SELECT source, count(*) AS filled,
        |  sum(1::BIGINT << (48 - least(rnk, 48))) AS tf FROM regs GROUP BY source),
        |f AS (SELECT source AS grp, (128 - filled)::BIGINT AS v_zero,
        |  (tf + (128 - filled)::BIGINT * (1::BIGINT << 48))::BIGINT AS t_scaled
        |  FROM a)
        |SELECT grp, v_zero, t_scaled,
        |  round(CASE WHEN v_zero > 0 AND
        |      0.7213 / (1 + 1.079 / 128.0) * 128.0 * 128.0
        |        * 281474976710656.0 / t_scaled <= 320.0
        |    THEN 128.0 * ln(128.0 / v_zero)
        |    ELSE 0.7213 / (1 + 1.079 / 128.0) * 128.0 * 128.0
        |        * 281474976710656.0 / t_scaled END, 4) AS est
        |FROM f ORDER BY grp""".stripMargin,
    // segmented build == one-shot (contains verify): same brute oracle
    "q_stream_trgm" ->
      """SELECT doc_id FROM (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS n
        |  FROM documents)
        |WHERE contains(n, 'spark wind') ORDER BY doc_id""".stripMargin,
    // bit-exact replay of the HLL register table: md5_number_lower is
    // the proven md5-lower-64 twin; register = top 10 bits, rank via
    // the same OR-smear + bit_count ladder (integer ops only)
    "q_report_datacard" ->
      """WITH t AS (SELECT source, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT source, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT source,
        |  len(toks)::BIGINT AS nt,
        |  length(text)::BIGINT AS chars,
        |  length(regexp_replace(text,'[^[:punct:]]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS pr,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s))) AS en,
        |  len(list_filter(toks, s -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','auf'], s))) AS de,
        |  len(list_filter(toks, s -> list_contains(['le','la','les','et','est','un','une','dans','que','pour'], s))) AS fr,
        |  len(list_filter(toks, s -> list_contains(['el','los','las','y','es','un','una','en','que','por'], s))) AS es,
        |  length(regexp_replace(text,'[^\x{4e00}-\x{9fff}]','','g'))::DOUBLE
        |    / greatest(length(text),1)::DOUBLE AS cjkr,
        |  md5(text) AS h
        |  FROM tt),
        |q AS (SELECT source, nt, chars, h,
        |  CASE WHEN cjkr > 0.05 THEN 'zh'
        |    WHEN en=0 AND de=0 AND fr=0 AND es=0 THEN 'und'
        |    WHEN en>=de AND en>=fr AND en>=es THEN 'en'
        |    WHEN de>=fr AND de>=es THEN 'de'
        |    WHEN fr>=es THEN 'fr' ELSE 'es' END AS lang,
        |  CAST(round(10000.0 * round(0.25*least(nt::DOUBLE/64.0, 1.0)
        |    + 0.25*least(en::DOUBLE / greatest(nt,1)::DOUBLE * 4.0, 1.0)
        |    + 0.25*(1.0-least(pr*4.0, 1.0))
        |    + 0.25*(1.0-least(dr*4.0, 1.0)), 4)) AS BIGINT) AS qmicro
        |  FROM m)
        |SELECT source, count(*)::BIGINT AS n_docs, sum(nt)::BIGINT AS n_tokens,
        |  round(sum(nt)::DOUBLE / count(*)::DOUBLE, 4) AS avg_tokens,
        |  sum(chars)::BIGINT AS n_chars,
        |  (count(*) - count(DISTINCT h))::BIGINT AS dup_docs,
        |  (count(*) FILTER (lang = 'en'))::BIGINT AS n_en,
        |  (count(*) FILTER (lang = 'und'))::BIGINT AS n_und,
        |  round(sum(qmicro)::DOUBLE / 10000.0 / count(*)::DOUBLE, 4) AS avg_quality
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "q_stream_datacard" ->
      """WITH t AS (SELECT source, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT source, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT source, text,
        |  len(toks)::BIGINT AS nt,
        |  length(text)::BIGINT AS chars,
        |  length(regexp_replace(text,'[^[:punct:]]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS pr,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s))) AS en,
        |  len(list_filter(toks, s -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','auf'], s))) AS de,
        |  len(list_filter(toks, s -> list_contains(['le','la','les','et','est','un','une','dans','que','pour'], s))) AS fr,
        |  len(list_filter(toks, s -> list_contains(['el','los','las','y','es','un','una','en','que','por'], s))) AS es,
        |  length(regexp_replace(text,'[^\x{4e00}-\x{9fff}]','','g'))::DOUBLE
        |    / greatest(length(text),1)::DOUBLE AS cjkr
        |  FROM tt),
        |q AS (SELECT source, nt, chars,
        |  CASE WHEN cjkr > 0.05 THEN 'zh'
        |    WHEN en=0 AND de=0 AND fr=0 AND es=0 THEN 'und'
        |    WHEN en>=de AND en>=fr AND en>=es THEN 'en'
        |    WHEN de>=fr AND de>=es THEN 'de'
        |    WHEN fr>=es THEN 'fr' ELSE 'es' END AS lang,
        |  CAST(round(10000.0 * round(0.25*least(nt::DOUBLE/64.0, 1.0)
        |    + 0.25*least(en::DOUBLE / greatest(nt,1)::DOUBLE * 4.0, 1.0)
        |    + 0.25*(1.0-least(pr*4.0, 1.0))
        |    + 0.25*(1.0-least(dr*4.0, 1.0)), 4)) AS BIGINT) AS qmicro
        |  FROM m),
        |counts AS (SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(nt)::BIGINT AS n_tokens, sum(chars)::BIGINT AS n_chars,
        |  (count(*) FILTER (lang = 'en'))::BIGINT AS n_en,
        |  (count(*) FILTER (lang = 'und'))::BIGINT AS n_und,
        |  sum(qmicro)::BIGINT AS qsum
        |  FROM q GROUP BY source),
        |hh AS (SELECT source, md5_number_lower('hll:' || text) AS h FROM t),
        |b AS (SELECT source, CAST(h >> 54 AS INT) AS register,
        |  h & ((1::UBIGINT << 54) - 1) AS w FROM hh),
        |s1 AS (SELECT source, register, w, w | (w >> 1) AS s FROM b),
        |s2 AS (SELECT source, register, w, s | (s >> 2) AS s FROM s1),
        |s3 AS (SELECT source, register, w, s | (s >> 4) AS s FROM s2),
        |s4 AS (SELECT source, register, w, s | (s >> 8) AS s FROM s3),
        |s5 AS (SELECT source, register, w, s | (s >> 16) AS s FROM s4),
        |s6 AS (SELECT source, register, w, s | (s >> 32) AS s FROM s5),
        |r AS (SELECT source, register,
        |  CASE WHEN w = 0 THEN 55 ELSE 55 - CAST(bit_count(s) AS INT) END AS rnk
        |  FROM s6),
        |regs AS (SELECT source, register, max(rnk) AS rnk FROM r GROUP BY 1, 2),
        |a AS (SELECT source, count(*) AS filled,
        |  sum(1::BIGINT << (48 - least(rnk, 48))) AS tf FROM regs GROUP BY source),
        |f AS (SELECT source, (1024 - filled)::BIGINT AS v_zero,
        |  (tf + (1024 - filled)::BIGINT * (1::BIGINT << 48))::BIGINT AS t_scaled
        |  FROM a)
        |SELECT source, c.n_docs, c.n_tokens,
        |  round(c.n_tokens::DOUBLE / c.n_docs::DOUBLE, 4) AS avg_tokens,
        |  c.n_chars, c.n_en, c.n_und,
        |  round(c.qsum::DOUBLE / 10000.0 / c.n_docs::DOUBLE, 4) AS avg_quality,
        |  f.v_zero, f.t_scaled,
        |  round(CASE WHEN f.v_zero > 0 AND
        |      0.7213 / (1 + 1.079 / 1024.0) * 1024.0 * 1024.0
        |        * 281474976710656.0 / f.t_scaled <= 2560.0
        |    THEN 1024.0 * ln(1024.0 / f.v_zero)
        |    ELSE 0.7213 / (1 + 1.079 / 1024.0) * 1024.0 * 1024.0
        |        * 281474976710656.0 / f.t_scaled END, 4) AS est
        |FROM counts c JOIN f USING (source)
        |ORDER BY source""".stripMargin,
    "q_text_hll" -> hllRegistersSql,
    // Streamed segment ingest is exactly the one-shot sketch by
    // register-wise-max mergeability — same bit-level oracle.
    "q_stream_hll" -> hllRegistersSql,
    // per-check violation counts; same conservative null handling
    "q_quality_checks" ->
      """WITH n AS (SELECT count(*) AS rows FROM orders),
        |v AS (
        |  SELECT 'price_positive' AS "check",
        |    sum(CASE WHEN coalesce(o_totalprice > 0, false)
        |      THEN 0 ELSE 1 END)::BIGINT AS violations FROM orders
        |  UNION ALL SELECT 'status_known',
        |    sum(CASE WHEN coalesce(o_orderstatus IN ('F','O','P'), false)
        |      THEN 0 ELSE 1 END)::BIGINT FROM orders
        |  UNION ALL SELECT 'date_in_range',
        |    sum(CASE WHEN coalesce(o_orderdate BETWEEN '1992-01-01' AND '1998-12-31', false)
        |      THEN 0 ELSE 1 END)::BIGINT FROM orders
        |  UNION ALL SELECT 'custkey_present',
        |    sum(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END)::BIGINT
        |    FROM orders
        |  UNION ALL SELECT 'priority_nonempty',
        |    sum(CASE WHEN coalesce(length(o_orderpriority) > 0, false)
        |      THEN 0 ELSE 1 END)::BIGINT FROM orders)
        |SELECT v."check", n.rows, v.violations,
        |  (v.violations = 0) AS passed
        |FROM v, n ORDER BY v."check"""".stripMargin,
    // exact cross-multiplied z-test in HUGEINT — no float stats
    "q_agg_outliers" ->
      """WITH o AS (SELECT event_id, event_type,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |st AS (SELECT event_type AS g, count(*)::HUGEINT AS n,
        |  sum(cents::HUGEINT) AS s,
        |  sum(cents::HUGEINT * cents::HUGEINT) AS q
        |  FROM o GROUP BY 1)
        |SELECT o.event_id, o.event_type, o.cents
        |FROM o JOIN st ON o.event_type = st.g
        |WHERE (st.n * o.cents::HUGEINT - st.s) * (st.n * o.cents::HUGEINT - st.s)
        |   > 9 * (st.n * st.q - st.s * st.s)
        |ORDER BY event_id""".stripMargin,
    // replay the chunk prefix-sum and the original values
    "q_export_jsonl" ->
      """SELECT doc_id, source, source AS shard,
        |  ((row_number() OVER (PARTITION BY source ORDER BY doc_id)) - 1)
        |    // 32 AS chunk,
        |  text
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the window formulation IS the oracle for the heap aggregate
    "q_agg_topk" ->
      """SELECT source, rank, text_len, doc_id FROM (
        |  SELECT source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY length(text) DESC, doc_id) AS rank,
        |    length(text)::BIGINT AS text_len, doc_id
        |  FROM documents) t
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    // the corruption is the only failure mode, so the flag and the
    // nulled INT field are closed-form
    "q_ingest_csv" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 11 <> 5 THEN o_orderkey::INT END AS k,
        |  o_orderstatus AS status,
        |  (o_orderkey % 11 = 5) AS quarantined
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // same deterministic truncation; json_valid mirrors PERMISSIVE
    // from_json's row-level corrupt routing for malformed payloads
    "q_ingest_quarantine" ->
      """WITH p AS (SELECT event_id,
        |  CASE WHEN event_id % 7 = 3
        |    THEN substr(props, 1, length(props) - 2) ELSE props END AS payload
        |  FROM events)
        |SELECT event_id,
        |  CASE WHEN json_valid(payload)
        |    THEN CAST(json_extract(payload, '$.k') AS INTEGER) END AS k,
        |  NOT json_valid(payload) AS quarantined
        |FROM p ORDER BY event_id""".stripMargin,
    // exact replay of the count-min grid: same salted md5 buckets
    // (unsigned remainder — the Dsir-proven md5_number_lower pattern),
    // same min-over-rows estimate
    "q_text_cms" ->
      s"""WITH $cmsCellsSql,
        |q AS (SELECT unnest(['spark','window','data','the','graftabsent']) AS term),
        |qh AS (SELECT q.term, r.d,
        |    CAST(md5_number_lower('cms' || r.d || ':' || q.term) % 512 AS INT) AS bucket
        |  FROM q CROSS JOIN range(0, 4) r(d))
        |SELECT qh.term, min(coalesce(c.cnt, 0)) AS est
        |FROM qh LEFT JOIN cells c ON qh.d = c.d AND qh.bucket = c.bucket
        |GROUP BY qh.term ORDER BY term""".stripMargin,
    // mergeable segments ⇒ the streamed sketch equals the one-shot grid
    "q_stream_cms" ->
      s"""WITH $cmsCellsSql,
        |q AS (SELECT unnest(['spark','window','data','the','graftabsent']) AS term),
        |qh AS (SELECT q.term, r.d,
        |    CAST(md5_number_lower('cms' || r.d || ':' || q.term) % 512 AS INT) AS bucket
        |  FROM q CROSS JOIN range(0, 4) r(d))
        |SELECT qh.term, min(coalesce(c.cnt, 0)) AS est
        |FROM qh LEFT JOIN cells c ON qh.d = c.d AND qh.bucket = c.bucket
        |GROUP BY qh.term ORDER BY term""".stripMargin,
    "q_text_cms_heavy" ->
      s"""WITH $cmsCellsSql,
        |q AS (SELECT DISTINCT term FROM tok),
        |qh AS (SELECT q.term, r.d,
        |    CAST(md5_number_lower('cms' || r.d || ':' || q.term) % 512 AS INT) AS bucket
        |  FROM q CROSS JOIN range(0, 4) r(d)),
        |e AS (SELECT qh.term, min(coalesce(c.cnt, 0)) AS est
        |  FROM qh LEFT JOIN cells c ON qh.d = c.d AND qh.bucket = c.bucket
        |  GROUP BY qh.term)
        |SELECT term, est FROM e WHERE est >= 200 ORDER BY term""".stripMargin,
    // full replay of both retrievers + reciprocal-rank fusion: BM25
    // candidate list (rounded-score ranks), cosine candidate list
    // (membership by raw cosine, ranks over the 6dp round — mirroring
    // bruteForceTopK feeding rrfFuse), rrf = Σ 1/(60+rank) rounded 6dp
    "q_hybrid_retrieve" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |lens AS (SELECT doc_id, len(toks) AS len FROM tt),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
        |dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
        |  WHERE term IN ('spark', 'window') GROUP BY term),
        |tfq AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term IN ('spark', 'window') GROUP BY doc_id, term),
        |c AS (SELECT (SELECT count(*) FROM tt)::DOUBLE AS n,
        |  (SELECT sum(len) FROM lens)::DOUBLE / (SELECT count(*) FROM tt)::DOUBLE AS avgdl),
        |bscore AS (SELECT q.doc_id,
        |  round(sum(ln((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |    * q.tf / (q.tf + 1.2 * (0.25 + 0.75 * l.len / c.avgdl))), 4) AS bm25
        |  FROM tfq q JOIN dft d ON q.term = d.term
        |    JOIN lens l ON q.doc_id = l.doc_id CROSS JOIN c
        |  GROUP BY q.doc_id),
        |btop AS (SELECT doc_id, bm25 FROM bscore
        |  ORDER BY bm25 DESC, doc_id LIMIT 20),
        |brank AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank FROM btop),
        |qv AS (SELECT embedding AS e FROM embeddings
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
        |s AS (SELECT vec_id AS doc_id,
        |  list_sum(list_transform(range(1,65),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(qv.e[i] AS DOUBLE)))
        |  / greatest(
        |      sqrt(list_sum(list_transform(range(1,65),
        |        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
        |    * sqrt(list_sum(list_transform(range(1,65),
        |        i -> CAST(qv.e[i] AS DOUBLE) * CAST(qv.e[i] AS DOUBLE)))), 1e-12) AS craw
        |  FROM embeddings, qv),
        |ctop AS (SELECT doc_id, round(craw, 6) AS cosine FROM s
        |  ORDER BY craw DESC, doc_id LIMIT 20),
        |crank AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY cosine DESC, doc_id) AS vec_rank FROM ctop),
        |f AS (SELECT coalesce(b.doc_id, v.doc_id) AS doc_id,
        |    b.lex_rank, v.vec_rank,
        |    round(coalesce(1.0/(60 + b.lex_rank), 0)
        |      + coalesce(1.0/(60 + v.vec_rank), 0), 6) AS rrf
        |  FROM brank b FULL OUTER JOIN crank v ON b.doc_id = v.doc_id)
        |SELECT doc_id, lex_rank, vec_rank, rrf FROM f
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    // index-served BM25 shares the scoring body (Tfidf.bm25From) with the
    // from-scratch path: one oracle
    "q_text_bm25_indexed" -> textBm25Sql,
    "q_text_tfidf" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents WHERE doc_id < 50),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM t)
        |SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |  round(tf.tf * ln(n.n::DOUBLE / df.df::DOUBLE), 4) AS tfidf
        |FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        |ORDER BY tf.doc_id, tf.term""".stripMargin,
    "q_sample_stratified" ->
      """WITH r AS (SELECT doc_id, lang, source, n_chars,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY md5('s1|' || doc_id::VARCHAR), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, source, n_chars FROM r WHERE rn <= 10
        |ORDER BY doc_id""".stripMargin,
    "q_sample_hash" ->
      """SELECT doc_id, source FROM documents
        |WHERE '0' || substr(md5('s2|' || doc_id::VARCHAR), 1, 8) < '040000000'
        |ORDER BY doc_id""".stripMargin,
    "q_sample_weighted" ->
      """SELECT doc_id, lang FROM documents
        |WHERE '0' || substr(md5('s3|' || doc_id::VARCHAR), 1, 8) <
        |  CASE WHEN lang = 'en' THEN '080000000'
        |       WHEN lang = 'zh' THEN '040000000'
        |       ELSE '01999999a' END
        |ORDER BY doc_id""".stripMargin,
    "q_sample_mix" ->
      """WITH counts AS (
        |  SELECT source, count(*)::BIGINT AS n FROM documents
        |  WHERE source IN ('src0','src1','src2') GROUP BY source),
        |par AS (
        |  SELECT source, n,
        |    CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25 ELSE 0.25 END AS w
        |  FROM counts),
        |tgt AS (SELECT source, n, CAST(floor(w * 150 + 0.5) AS BIGINT) AS t FROM par),
        |ep AS (SELECT source, n, t, CAST(ceil(t::DOUBLE / n) AS BIGINT) AS e FROM tgt),
        |thr AS (
        |  SELECT source, e,
        |    lpad(format('{:x}',
        |      CAST(floor(t::DOUBLE / (n * e) * 4294967296.0 + 0.5) AS BIGINT)), 9, '0') AS th
        |  FROM ep),
        |epochs AS (SELECT source, th, unnest(range(e)) AS epoch FROM thr),
        |cand AS (
        |  SELECT d.doc_id, d.source, ei.epoch, ei.th
        |  FROM documents d JOIN epochs ei ON d.source = ei.source)
        |SELECT doc_id, source, epoch
        |FROM cand
        |WHERE '0' || substr(md5('mix|' || doc_id::VARCHAR || '|' || epoch::VARCHAR), 1, 8) < th
        |ORDER BY doc_id, epoch""".stripMargin,
    "q_sample_temperature" ->
      """WITH n AS (
        |  SELECT lang, count(*)::BIGINT AS n FROM documents
        |  WHERE lang IN ('de','en','es','fr','zh') GROUP BY lang),
        |ms AS (
        |  SELECT lang, n,
        |    CAST(floor(sqrt(n::DOUBLE * 1000000.0)) AS HUGEINT) AS ms FROM n),
        |tot AS (SELECT sum(ms) AS stot FROM ms),
        |tt AS (SELECT min((n::HUGEINT * stot) // ms) AS tt FROM ms, tot),
        |plan AS (
        |  SELECT lang, n,
        |    (2::HUGEINT * ms * (SELECT tt FROM tt) + stot) // (2::HUGEINT * stot)
        |      AS target
        |  FROM ms, tot),
        |thr AS (
        |  SELECT lang,
        |    printf('%09x',
        |      CAST((target * 8589934592::HUGEINT + n) // (2::HUGEINT * n) AS BIGINT))
        |      AS th
        |  FROM plan)
        |SELECT d.doc_id, d.lang, 0::BIGINT AS epoch
        |FROM documents d JOIN thr ON d.lang = thr.lang
        |WHERE '0' || substr(md5('s5|' || d.doc_id::VARCHAR || '|0'), 1, 8) < thr.th
        |ORDER BY doc_id""".stripMargin,
    "q_pack_manifest" ->
      """WITH t AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |n AS (SELECT doc_id, source,
        |  len(CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END)::BIGINT AS n_tokens
        |  FROM t),
        |f AS (SELECT * FROM n WHERE n_tokens >= 1),
        |c AS (SELECT doc_id, source, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM f),
        |p AS (SELECT doc_id, source, n_tokens,
        |  CAST(floor((cum - n_tokens) / 2000.0) AS BIGINT) AS pack_id FROM c)
        |SELECT source AS shard, pack_id,
        |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS docs,
        |  array_to_string(list(n_tokens ORDER BY doc_id), ',') AS token_counts,
        |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
        |FROM p GROUP BY 1, 2 ORDER BY shard, pack_id""".stripMargin,
    "q_delete_keyed" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id % 6 <> 1 ORDER BY doc_id""".stripMargin,
    "q_stream_upsert" ->
      """WITH base AS (SELECT doc_id, source, n_chars AS score FROM documents),
        |u AS (SELECT doc_id, source, n_chars * 10 AS score
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id, source, score FROM u
        |UNION ALL
        |SELECT b.doc_id, b.source, b.score FROM base b
        |WHERE b.doc_id NOT IN (SELECT doc_id FROM u)
        |ORDER BY doc_id""".stripMargin,
    "q_upsert_keyed" ->
      """WITH base AS (SELECT doc_id, source, n_chars AS score
        |  FROM documents WHERE doc_id % 7 <> 3),
        |u AS (SELECT doc_id, source, n_chars * 10 AS score
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id, source, score FROM u
        |UNION ALL
        |SELECT b.doc_id, b.source, b.score FROM base b
        |WHERE b.doc_id NOT IN (SELECT doc_id FROM u)
        |ORDER BY doc_id""".stripMargin,
    // SQL MERGE surface: same merge replay as q_upsert_keyed
    "q_upsert_sql" ->
      """WITH base AS (SELECT doc_id, source, n_chars AS score
        |  FROM documents WHERE doc_id % 7 <> 3),
        |u AS (SELECT doc_id, source, n_chars * 10 AS score
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id, source, score FROM u
        |UNION ALL
        |SELECT b.doc_id, b.source, b.score FROM base b
        |WHERE b.doc_id NOT IN (SELECT doc_id FROM u)
        |ORDER BY doc_id""".stripMargin,
    // the hook-refreshed INDEXED read must equal the plain merge replay
    "q_upsert_indexed" ->
      """WITH base AS (SELECT doc_id, source, n_chars AS score
        |  FROM documents WHERE doc_id % 7 <> 3),
        |u AS (SELECT doc_id, source, n_chars * 10 AS score
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id, source, score FROM u
        |UNION ALL
        |SELECT b.doc_id, b.source, b.score FROM base b
        |WHERE b.doc_id NOT IN (SELECT doc_id FROM u)
        |ORDER BY doc_id""".stripMargin,
    // rebucketing must be value-invisible: same replay as q_upsert_keyed
    "q_upsert_rebucket" ->
      """WITH base AS (SELECT doc_id, source, n_chars AS score
        |  FROM documents WHERE doc_id % 7 <> 3),
        |u AS (SELECT doc_id, source, n_chars * 10 AS score
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id, source, score FROM u
        |UNION ALL
        |SELECT b.doc_id, b.source, b.score FROM base b
        |WHERE b.doc_id NOT IN (SELECT doc_id FROM u)
        |ORDER BY doc_id""".stripMargin,
    "q_scd2" -> scd2Sql,
    // incremental merges converge to the one-shot fold — same replay
    "q_scd2_merge" -> scd2Sql,
    // in-order streamed CDC batches converge to the same fold
    "q_stream_scd2" -> scd2Sql,
    // the streamed batch sequence IS the one-shot mini-batch sequence
    "q_stream_kmeans" -> minibatchKmeansSql(k = 8, dim = 64, batches = 4),
    // routing and fields in closed form from the line construction
    "q_stream_jsonl" ->
      """WITH u AS (SELECT doc_id, source,
        |  CASE WHEN doc_id % 11 = 5
        |    THEN '{"k": ' || doc_id::VARCHAR || ', "s": '
        |    ELSE '{"k": ' || doc_id::VARCHAR || ', "s": "' || source || '"}'
        |  END AS line FROM documents)
        |SELECT CASE WHEN doc_id % 11 <> 5 THEN doc_id END AS k,
        |  CASE WHEN doc_id % 11 <> 5 THEN source END AS s,
        |  (doc_id % 11 = 5) AS quarantined,
        |  CASE WHEN doc_id % 11 = 5 THEN line END AS raw
        |FROM u ORDER BY quarantined, k, raw""".stripMargin,
    // entropy replay -> rank-band membership -> cumulative pack ids
    "q_pipeline_curate7" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
        |tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
        |per AS (SELECT doc_id, c,
        |  CAST(floor(c::DOUBLE * ln(c::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
        |  FROM tf),
        |a AS (SELECT doc_id, sum(c)::BIGINT AS n, sum(m)::BIGINT AS s
        |  FROM per GROUP BY doc_id),
        |scores AS (SELECT doc_id, n AS n_tokens,
        |    CAST(floor(ln(n::DOUBLE) * 1000000 + 0.5) AS BIGINT) - (s // n) AS e
        |  FROM a WHERE n > 0),
        |cnt2 AS (SELECT count(*) AS n FROM scores),
        |vc AS (SELECT e AS sv, count(*) AS c FROM scores GROUP BY 1),
        |cum AS (SELECT sv, coalesce(sum(c) OVER (ORDER BY sv
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos FROM vc),
        |keep AS (SELECT sv FROM cum, cnt2
        |  WHERE 100 * pos >= 10 * cnt2.n AND 100 * pos < 90 * cnt2.n),
        |kept AS (SELECT s.doc_id, s.n_tokens FROM scores s
        |  JOIN keep ON s.e = keep.sv),
        |wsrc AS (SELECT k.doc_id, d.source, k.n_tokens FROM kept k
        |  JOIN documents d ON k.doc_id = d.doc_id),
        |c3 AS (SELECT doc_id, source, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM wsrc)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor((cum - n_tokens) / 1500.0) AS BIGINT) AS pack_id
        |FROM c3 ORDER BY doc_id""".stripMargin,
    // the chunk replay joined to its successor chunk
    "q_text_pairs" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM tt),
        |ints AS (SELECT unnest(range(0, (SELECT
        |  coalesce(max((greatest(n - 32, 0) + 15) // 16 + 1), 0) FROM n))) AS c),
        |chunks AS (SELECT doc_id, c::INT AS chunk_idx,
        |  array_to_string(toks[c*16+1 : c*16+32], ' ') AS chunk_text
        |  FROM n JOIN ints
        |  ON n.n > 0 AND c <= (greatest(n.n - 32, 0) + 15) // 16),
        |p AS (SELECT doc_id, chunk_idx, chunk_text AS anchor,
        |    lead(chunk_text) OVER (PARTITION BY doc_id ORDER BY chunk_idx)
        |      AS positive
        |  FROM chunks)
        |SELECT doc_id, chunk_idx, anchor, positive FROM p
        |WHERE positive IS NOT NULL ORDER BY doc_id, chunk_idx""".stripMargin,
    // replay of the salted-md5 probe sequence, dedup, anti-join, rank
    "q_sample_negatives" ->
      """WITH q AS (SELECT doc_id AS q_id, (doc_id * 7 + 3) % 500 AS pos_id
        |  FROM documents WHERE doc_id < 50),
        |probes AS (SELECT d.q_id, r.slot,
        |    CAST(md5_number_lower('graft:' || d.q_id || ':' || r.slot) % 500
        |      AS BIGINT) AS neg_id
        |  FROM (SELECT DISTINCT q_id FROM q) d CROSS JOIN range(0, 20) r(slot)),
        |ded AS (SELECT q_id, slot, neg_id,
        |    row_number() OVER (PARTITION BY q_id, neg_id ORDER BY slot) AS f
        |  FROM probes),
        |keep AS (SELECT d.q_id, d.slot, d.neg_id FROM ded d
        |  WHERE f = 1 AND NOT EXISTS (
        |    SELECT 1 FROM q WHERE q.q_id = d.q_id AND q.pos_id = d.neg_id)),
        |r AS (SELECT q_id, neg_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY slot) AS rank
        |  FROM keep)
        |SELECT q_id, neg_id, rank FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // plain overlap predicates — bucketing must not change the answer
    "q_interval_join" ->
      """WITH s AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi
        |  FROM events WHERE user_id < 12
        |  GROUP BY user_id, CAST(ts AS DATE))
        |SELECT strftime(a.day, '%Y-%m-%d') AS day,
        |  a.user_id AS user_a, b.user_id AS user_b,
        |  least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_us
        |FROM s a JOIN s b ON a.day = b.day AND a.user_id < b.user_id
        |  AND a.lo <= b.hi AND b.lo <= a.hi
        |ORDER BY day, user_a, user_b""".stripMargin,
    // fold + the covering-interval filter at the snapshot instant
    "q_scd2_asof" ->
      """WITH vis AS (SELECT user_id, ts, event_type,
        |  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events),
        |v AS (SELECT user_id, ts, event_type FROM vis WHERE rn = 1),
        |o AS (SELECT user_id, ts, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM v),
        |op AS (SELECT user_id, ts, event_type FROM o
        |  WHERE pts IS NULL OR prev IS DISTINCT FROM event_type),
        |h AS (SELECT user_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
        |  FROM op)
        |SELECT user_id, event_type, epoch_us(valid_from) AS valid_from_us
        |FROM h
        |WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
        |  AND (valid_to IS NULL OR TIMESTAMP '2024-01-15 00:00:00' < valid_to)
        |ORDER BY user_id""".stripMargin,
    // history fold + per-event latest-version-at-or-before pick
    "q_scd2_lookup" ->
      """WITH vis AS (SELECT user_id, ts, event_type,
        |  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events),
        |v AS (SELECT user_id, ts, event_type FROM vis WHERE rn = 1),
        |o AS (SELECT user_id, ts, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM v),
        |h AS (SELECT user_id, ts AS valid_from, event_type FROM o
        |  WHERE pts IS NULL OR prev IS DISTINCT FROM event_type)
        |SELECT e.event_id, e.user_id,
        |  (SELECT h.event_type FROM h
        |   WHERE h.user_id = e.user_id AND h.valid_from <= e.ts
        |   ORDER BY h.valid_from DESC LIMIT 1) AS state_event_type
        |FROM events e ORDER BY event_id""".stripMargin,
    "q_pack_budget" ->
      """WITH t AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |n AS (SELECT doc_id, source,
        |  len(CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END)::BIGINT AS n_tokens
        |  FROM t),
        |c AS (SELECT doc_id, source, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM n)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor((cum - n_tokens) / 2000.0) AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |n AS (SELECT doc_id, source,
        |  len(CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END)::BIGINT AS n
        |  FROM t),
        |c AS (SELECT doc_id, source, n,
        |  (sum(n) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM n WHERE n > 0),
        |s AS (SELECT source AS shard, doc_id AS doc, cum - n AS st, cum AS en,
        |  unnest(generate_series((cum - n) // 512, (cum - 1) // 512)) AS seq_id
        |  FROM c)
        |SELECT shard, seq_id::BIGINT AS seq_id,
        |  (greatest(st, seq_id * 512) - seq_id * 512)::BIGINT AS seq_off,
        |  doc,
        |  (greatest(st, seq_id * 512) - st)::BIGINT AS doc_off,
        |  (least(en, (seq_id + 1) * 512) - greatest(st, seq_id * 512))::BIGINT
        |    AS n_tokens,
        |  least(en, (seq_id + 1) * 512) = en AS eod
        |FROM s ORDER BY shard, seq_id, seq_off""".stripMargin,
    "q_pack_schedule" ->
      """WITH t AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |n AS (SELECT doc_id, source,
        |  len(CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END)::BIGINT AS n
        |  FROM t),
        |c AS (SELECT doc_id, source, n,
        |  (sum(n) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM n WHERE n > 0),
        |sq AS (SELECT source AS shard,
        |  unnest(generate_series((cum - n) // 512, (cum - 1) // 512)) AS seq_id
        |  FROM c),
        |d AS (SELECT DISTINCT shard, seq_id::BIGINT AS seq_id FROM sq),
        |w AS (SELECT shard, seq_id,
        |  CASE shard WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 3.0
        |    WHEN 'src2' THEN 1.5 WHEN 'src3' THEN 0.5 WHEN 'src4' THEN 2.0
        |    WHEN 'src5' THEN 1.0 ELSE NULL END AS wt FROM d),
        |v AS (SELECT shard, seq_id,
        |  (seq_id + 1)::DOUBLE / wt AS vt FROM w WHERE wt IS NOT NULL)
        |SELECT (row_number() OVER (ORDER BY vt, shard, seq_id))::BIGINT AS step,
        |  shard, seq_id, round(vt, 6) AS vt
        |FROM v ORDER BY step""".stripMargin,
    "q_pack_materialize" ->
      """WITH t AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, source,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |n AS (SELECT doc_id, source, toks, len(toks)::BIGINT AS n FROM tt
        |  WHERE len(toks) > 0),
        |c AS (SELECT doc_id, source, toks, n,
        |  (sum(n) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM n),
        |s AS (SELECT source AS shard, toks, cum - n AS st, cum AS en,
        |  unnest(generate_series((cum - n) // 512, (cum - 1) // 512)) AS seq_id
        |  FROM c),
        |sl AS (SELECT shard, seq_id::BIGINT AS seq_id,
        |  greatest(st, seq_id * 512) - seq_id * 512 AS seq_off,
        |  toks[(greatest(st, seq_id * 512) - st + 1):
        |       (least(en, (seq_id + 1) * 512) - st)] AS sl
        |  FROM s)
        |SELECT shard, seq_id,
        |  array_to_string(flatten(list(sl ORDER BY seq_off)), ' ') AS tokens,
        |  len(flatten(list(sl ORDER BY seq_off)))::BIGINT AS n_tokens
        |FROM sl GROUP BY shard, seq_id ORDER BY shard, seq_id""".stripMargin,
    "q_events_funnel" ->
      """WITH e AS (SELECT user_id, ts, event_type FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT user_id, min(ts) AS t2 FROM e
        |  JOIN s1 USING (user_id) WHERE event_type = 'click' AND ts > t1
        |  GROUP BY 1),
        |s3 AS (SELECT user_id, min(ts) AS t3 FROM e
        |  JOIN s2 USING (user_id) WHERE event_type = 'purchase' AND ts > t2
        |  GROUP BY 1)
        |SELECT s1.user_id, epoch_us(t1) AS t1_us, epoch_us(t2) AS t2_us,
        |  epoch_us(t3) AS t3_us,
        |  (1 + (t2 IS NOT NULL)::INT + (t3 IS NOT NULL)::INT)::INT
        |    AS steps_completed
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q_events_funnel_counts" ->
      """WITH e AS (SELECT user_id, ts, event_type FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT user_id, min(ts) AS t2 FROM e
        |  JOIN s1 USING (user_id) WHERE event_type = 'click' AND ts > t1
        |  GROUP BY 1),
        |s3 AS (SELECT user_id, min(ts) AS t3 FROM e
        |  JOIN s2 USING (user_id) WHERE event_type = 'purchase' AND ts > t2
        |  GROUP BY 1)
        |SELECT step, action, n_users::BIGINT AS n_users FROM (
        |  SELECT 1 AS step, 'view' AS action,
        |    (SELECT count(*) FROM s1) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |ORDER BY step""".stripMargin,
    "q_events_resample" ->
      """WITH b AS (SELECT user_id, epoch_us(ts) // 3600000000 AS bucket,
        |  value FROM events),
        |c AS (SELECT user_id, bucket, count(*)::BIGINT AS n_events,
        |  sum(value) AS sv FROM b GROUP BY 1, 2),
        |r AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        |  FROM b GROUP BY 1),
        |g AS (SELECT user_id,
        |  unnest(generate_series(lo, hi)) AS bucket FROM r)
        |SELECT g.user_id, g.bucket::BIGINT AS bucket,
        |  coalesce(c.n_events, 0)::BIGINT AS n_events,
        |  round(coalesce(c.sv, 0.0), 4) AS sum_value
        |FROM g LEFT JOIN c ON g.user_id = c.user_id AND g.bucket = c.bucket
        |ORDER BY g.user_id, g.bucket""".stripMargin,
    "q_pipeline_curate9" ->
      """WITH t AS (SELECT doc_id, source, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, source, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT doc_id, source,
        |  len(toks)::BIGINT AS nt,
        |  length(regexp_replace(text,'[^[:punct:]]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS pr,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s))) AS en
        |  FROM tt),
        |g AS (SELECT doc_id, source, nt AS n FROM m
        |  WHERE round(0.25*least(nt::DOUBLE/64.0, 1.0)
        |    + 0.25*least(en::DOUBLE / greatest(nt,1)::DOUBLE * 4.0, 1.0)
        |    + 0.25*(1.0-least(pr*4.0, 1.0))
        |    + 0.25*(1.0-least(dr*4.0, 1.0)), 4) >= 0.5),
        |c AS (SELECT doc_id, source, n,
        |  (sum(n) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM g WHERE n > 0),
        |sq AS (SELECT source AS shard,
        |  unnest(generate_series((cum - n) // 256, (cum - 1) // 256)) AS seq_id
        |  FROM c),
        |d AS (SELECT DISTINCT shard, seq_id::BIGINT AS seq_id FROM sq),
        |w AS (SELECT source AS shard, sqrt(sum(n)::DOUBLE) AS wt
        |  FROM g GROUP BY 1),
        |v AS (SELECT d.shard, d.seq_id,
        |  (d.seq_id + 1)::DOUBLE / w.wt AS vt
        |  FROM d JOIN w ON d.shard = w.shard WHERE w.wt > 0),
        |s AS (SELECT (row_number() OVER (ORDER BY vt, shard, seq_id))::BIGINT
        |    AS step, shard, seq_id, round(vt, 6) AS vt FROM v)
        |SELECT step, shard, seq_id, vt FROM s
        |WHERE step <= 100 ORDER BY step""".stripMargin,
    "q_events_retention" ->
      """WITH b AS (SELECT user_id,
        |  epoch_us(ts) // 604800000000 AS p FROM events),
        |c AS (SELECT user_id, min(p) AS cohort_period FROM b GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, p FROM b)
        |SELECT cohort_period, p - cohort_period AS period_offset,
        |  count(*)::BIGINT AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_decontaminate" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |c AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
        |b AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id % 20 = 0)
        |SELECT c.doc_id, b.bench_id, len(list_intersect(c.s, b.s)) AS overlap
        |FROM c, b WHERE len(list_intersect(c.s, b.s)) >= 2
        |ORDER BY doc_id, bench_id""".stripMargin,
    "q_text_contamination" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |b AS (SELECT DISTINCT unnest(s) AS shw FROM sh WHERE doc_id % 20 = 0),
        |c AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
        |cx AS (SELECT doc_id, unnest(s) AS shw FROM c),
        |m AS (SELECT cx.doc_id, count(*)::INT AS n_matched
        |  FROM cx JOIN b USING (shw) GROUP BY cx.doc_id)
        |SELECT c.doc_id, len(c.s)::INT AS n_shingles,
        |  coalesce(m.n_matched, 0)::INT AS n_matched,
        |  CASE WHEN len(c.s) = 0 THEN 0.0
        |    ELSE round(coalesce(m.n_matched, 0)::DOUBLE / len(c.s), 4) END
        |    AS contamination
        |FROM c LEFT JOIN m USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_decontaminate_contain" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |c AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
        |b AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 = 0),
        |f AS (SELECT DISTINCT c.doc_id FROM c, b
        |  WHERE len(list_intersect(c.s, b.s))::DOUBLE / len(b.s)::DOUBLE >= 0.6)
        |SELECT doc_id FROM c WHERE doc_id NOT IN (SELECT doc_id FROM f)
        |ORDER BY doc_id""".stripMargin,
    "q_text_segdedup_first" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |words AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS idx FROM tt),
        |segs AS (SELECT doc_id, (idx-1)//2 AS i, string_agg(w, ' ' ORDER BY idx) AS seg
        |  FROM words GROUP BY doc_id, (idx-1)//2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY seg ORDER BY doc_id, i) AS rn FROM segs),
        |agg AS (SELECT doc_id, count(*)::INT AS segs_total,
        |    sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::INT AS segs_removed,
        |    coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY i), '') AS clean_text
        |  FROM r GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(a.segs_total, 0) AS segs_total,
        |  coalesce(a.segs_removed, 0) AS segs_removed,
        |  coalesce(a.clean_text, '') AS clean_text
        |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q_text_dupspans" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM tt),
        |w AS (SELECT doc_id, unnest(range(0, greatest(n - 4, 0))) AS pos, toks FROM n),
        |ww AS (SELECT doc_id, pos, array_to_string(toks[pos+1 : pos+5], ' ') AS win FROM w),
        |d AS (SELECT win FROM ww GROUP BY win HAVING count(*) >= 2),
        |c AS (SELECT ww.doc_id, ww.pos FROM ww JOIN d USING (win)),
        |dw AS (SELECT doc_id, count(DISTINCT pos)::INT AS dup_windows FROM c GROUP BY doc_id),
        |p AS (SELECT doc_id, unnest(range(pos, pos + 5)) AS tpos FROM c),
        |cov AS (SELECT doc_id, count(DISTINCT tpos)::INT AS covered_tokens FROM p GROUP BY doc_id)
        |SELECT n.doc_id, n.n::INT AS n_tokens,
        |  (CASE WHEN n.n < 5 THEN 0 ELSE n.n - 4 END)::INT AS n_windows,
        |  coalesce(dw.dup_windows, 0) AS dup_windows,
        |  coalesce(cov.covered_tokens, 0) AS covered_tokens,
        |  CASE WHEN n.n = 0 THEN 0.0
        |    ELSE round(coalesce(cov.covered_tokens, 0)::DOUBLE / n.n, 4) END
        |    AS dup_fraction
        |FROM n LEFT JOIN dw USING (doc_id) LEFT JOIN cov USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // Keeper = the globally-first (doc_id, pos) occurrence of each
    // duplicated window (row_number over the same ordering as the
    // operator's min struct); a token position is cut when covered by a
    // NON-first duplicated window.
    "q_text_dupspans_cut" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM tt),
        |w AS (SELECT doc_id, unnest(range(0, greatest(n - 4, 0))) AS pos, toks FROM n),
        |ww AS (SELECT doc_id, pos, array_to_string(toks[pos+1 : pos+5], ' ') AS win FROM w),
        |rk AS (SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn,
        |    count(*) OVER (PARTITION BY win) AS occ
        |  FROM ww),
        |rem0 AS (SELECT doc_id, unnest(range(pos, pos + 5)) AS tpos
        |  FROM rk WHERE occ >= 2 AND rn > 1),
        |rem AS (SELECT DISTINCT doc_id, tpos FROM rem0),
        |toksx AS (SELECT doc_id, unnest(toks) AS tok,
        |    generate_subscripts(toks, 1) - 1 AS tpos FROM tt),
        |keptx AS (SELECT tx.doc_id, tx.tok, tx.tpos FROM toksx tx
        |  LEFT JOIN rem ON tx.doc_id = rem.doc_id AND tx.tpos = rem.tpos
        |  WHERE rem.doc_id IS NULL),
        |agg AS (SELECT doc_id, count(*)::INT AS kept,
        |    string_agg(tok, ' ' ORDER BY tpos) AS clean_text
        |  FROM keptx GROUP BY doc_id)
        |SELECT n.doc_id, n.n::INT AS n_tokens,
        |  (n.n - coalesce(agg.kept, 0))::INT AS removed_tokens,
        |  coalesce(agg.clean_text, '') AS clean_text
        |FROM n LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // Stage-by-stage replay of the round-6 composed pipeline: k-means
    // outlier chain + verbatim-duplication gate + contamination gate +
    // salted-rank cap, all on exact integer inequalities.
    "q_pipeline_curate4" ->
      ("WITH " + {
        val r = "range(1, 65)"
        kmeansCentsSql(k = 8, dim = 64, iters = 2) +
        s"""asg AS (SELECT vec_id, c, d FROM (SELECT *, row_number()
           |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
           |  FROM (SELECT v.vec_id, c2.c,
           |    list_sum(list_transform($r,
           |      i -> (v.q[i] - c2.cent[i]) * (v.q[i] - c2.cent[i]))) AS d
           |    FROM v, c2)) WHERE rn = 1),
           |outl AS (SELECT vec_id FROM (SELECT *, row_number()
           |    OVER (PARTITION BY c ORDER BY d DESC, vec_id) AS orank FROM asg)
           |  WHERE orank <= 5),
           |t AS (SELECT doc_id, source,
           |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
           |  FROM documents),
           |tt AS (SELECT doc_id,
           |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
           |n AS (SELECT doc_id, toks, len(toks) AS n FROM tt),
           |w AS (SELECT doc_id, unnest(range(0, greatest(n - 4, 0))) AS pos, toks FROM n),
           |ww AS (SELECT doc_id, pos, array_to_string(toks[pos+1 : pos+5], ' ') AS win FROM w),
           |dupw AS (SELECT win FROM ww GROUP BY win HAVING count(*) >= 2),
           |cw AS (SELECT ww.doc_id, ww.pos FROM ww JOIN dupw USING (win)),
           |pp AS (SELECT doc_id, unnest(range(pos, pos + 5)) AS tpos FROM cw),
           |cov AS (SELECT doc_id, count(DISTINCT tpos) AS covered FROM pp GROUP BY doc_id),
           |dgate AS (SELECT n.doc_id FROM n LEFT JOIN cov USING (doc_id)
           |  WHERE coalesce(cov.covered, 0) * 5 <= n.n),
           |shh AS (SELECT doc_id, list_distinct(
           |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
           |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
           |  FROM tt),
           |bsh AS (SELECT DISTINCT unnest(s) AS shw FROM shh WHERE doc_id % 20 = 0),
           |csh AS (SELECT doc_id, s FROM shh WHERE doc_id % 20 <> 0),
           |cxx AS (SELECT doc_id, unnest(s) AS shw FROM csh),
           |mm AS (SELECT cxx.doc_id, count(*) AS n_matched
           |  FROM cxx JOIN bsh USING (shw) GROUP BY cxx.doc_id),
           |cgate AS (SELECT csh.doc_id FROM csh LEFT JOIN mm USING (doc_id)
           |  WHERE coalesce(mm.n_matched, 0) * 10 < len(csh.s)),
           |kept AS (SELECT d.doc_id, d.source FROM documents d
           |  JOIN dgate USING (doc_id) JOIN cgate USING (doc_id)
           |  WHERE d.doc_id NOT IN (SELECT vec_id FROM outl)),
           |rr AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
           |    ORDER BY md5('cur4|' || doc_id::VARCHAR), doc_id) AS rn FROM kept)
           |SELECT doc_id, source FROM rr WHERE rn <= 10
           |ORDER BY doc_id""".stripMargin
      }),
    "q_dedup_clusters" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |  AND round(len(list_intersect(a.s, b.s))::DOUBLE /
        |    len(list_distinct(list_concat(a.s, b.s)))::DOUBLE, 4) >= 0.5),
        |e AS (SELECT id_a AS a, id_b AS b FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(node, lab) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.a, reach.lab FROM e JOIN reach ON e.b = reach.node),
        |lbl AS (SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node)
        |SELECT cluster_id, count(*) AS size,
        |  array_to_string(list_sort(list(node)), ',') AS members
        |FROM lbl GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,
    "q_dedup_minhash" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s))::DOUBLE /
        |    len(list_distinct(list_concat(a.s, b.s)))::DOUBLE AS j
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id)
        |SELECT id_a, id_b FROM p WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin,
    "q_decontaminate_fuzzy" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |flagged AS (SELECT c.doc_id
        |  FROM sh c, sh b
        |  WHERE c.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
        |    AND len(list_intersect(c.s, b.s))::DOUBLE /
        |        len(list_distinct(list_concat(c.s, b.s)))::DOUBLE >= 0.5)
        |SELECT doc_id FROM documents
        |WHERE doc_id % 20 <> 0 AND doc_id NOT IN (SELECT doc_id FROM flagged)
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_incremental" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |dup AS (SELECT b.doc_id
        |  FROM sh a, sh b
        |  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |    AND len(list_intersect(a.s, b.s))::DOUBLE /
        |        len(list_distinct(list_concat(a.s, b.s)))::DOUBLE >= 0.5)
        |SELECT doc_id FROM documents
        |WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM dup)
        |ORDER BY doc_id""".stripMargin,
    "q_ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS e FROM embeddings
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
        |s AS (SELECT vec_id AS neighbor_id,
        |  list_sum(list_transform(range(1,65),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(q.e[i] AS DOUBLE)))
        |  / greatest(
        |      sqrt(list_sum(list_transform(range(1,65),
        |        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
        |    * sqrt(list_sum(list_transform(range(1,65),
        |        i -> CAST(q.e[i] AS DOUBLE) * CAST(q.e[i] AS DOUBLE)))), 1e-12) AS c
        |  FROM embeddings, q WHERE vec_id <> q.qid)
        |SELECT neighbor_id, round(c, 6) AS cosine FROM s
        |ORDER BY c DESC, neighbor_id LIMIT 10""".stripMargin,
    "q_ann_cosine_pairs" ->
      s"""WITH v AS (SELECT vec_id, embedding,
        |${bucketColsSql("embedding", 8, 64, 4)}
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(${cosineSql("a.embedding", "b.embedding", 64)}, 6) AS cosine
        |  FROM v a, v b WHERE a.vec_id < b.vec_id AND
        |    (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3))
        |SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "q_ann_dedup" ->
      s"""WITH RECURSIVE v AS (SELECT vec_id, embedding,
        |${bucketColsSql("embedding", 8, 64, 4)}
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM v a, v b WHERE a.vec_id < b.vec_id AND
        |    (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
        |    AND round(${cosineSql("a.embedding", "b.embedding", 64)}, 6) >= 0.4),
        |e AS (SELECT id_a AS a, id_b AS b FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(node, lab) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.a, reach.lab FROM e JOIN reach ON e.b = reach.node),
        |dup AS (SELECT node FROM reach GROUP BY node HAVING min(lab) < node)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT node FROM dup)
        |ORDER BY vec_id""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH v AS (SELECT vec_id, embedding,
        |${bucketColsSql("embedding", 8, 64, 4)}
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding AS e,
        |    b0 AS qb0, b1 AS qb1, b2 AS qb2, b3 AS qb3 FROM v
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
        |s AS (SELECT vec_id AS neighbor_id,
        |  ${cosineSql("embedding", "q.e", 64)} AS c
        |  FROM v, q WHERE vec_id <> q.qid AND
        |    (v.b0 = q.qb0 OR v.b1 = q.qb1 OR v.b2 = q.qb2 OR v.b3 = q.qb3))
        |SELECT neighbor_id, round(c, 6) AS cosine FROM s
        |ORDER BY c DESC, neighbor_id LIMIT 10""".stripMargin,
    "q_ann_multiprobe" ->
      s"""WITH v AS (SELECT vec_id, embedding,
        |  ${bucketSql("embedding", 64, graft.ann.Ann.hyperplanes(8, 64))} AS b
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding AS e, b AS qb FROM v
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
        |s AS (SELECT vec_id AS neighbor_id,
        |  ${cosineSql("embedding", "q.e", 64)} AS c
        |  FROM v, q WHERE vec_id <> q.qid AND
        |    bit_count(xor(v.b, q.qb)) <= 1)
        |SELECT neighbor_id, round(c, 6) AS cosine FROM s
        |ORDER BY c DESC, neighbor_id LIMIT 10""".stripMargin,
    "q_ann_pq" -> pqAdcSql(m = 8, k = 16, subDim = 8, topK = 10),
    "q_ann_ivfpq" -> ivfPqSql(cells = 16, nprobe = 4, dim = 64,
      m = 8, k = 16, subDim = 8, topK = 10),
    // the materialized-codes variant serves the SAME query: one oracle
    "q_ann_ivfpq_indexed" -> ivfPqSql(cells = 16, nprobe = 4, dim = 64,
      m = 8, k = 16, subDim = 8, topK = 10),
    // build(even half) + append(odd half) must serve the SAME query as a
    // one-shot build over everything (deterministic codebooks ⇒ identical
    // codes regardless of which batch encoded a vector): one oracle again
    "q_ann_ivfpq_incremental" -> ivfPqSql(cells = 16, nprobe = 4, dim = 64,
      m = 8, k = 16, subDim = 8, topK = 10),
    "q_ann_quantize" ->
      """WITH v AS (SELECT vec_id,
        |  list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
        |s AS (SELECT vec_id, e,
        |  list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v),
        |q AS (SELECT vec_id, scale,
        |  list_transform(e, x -> least(greatest(
        |    floor(x / (CASE WHEN scale = 0 THEN 1.0 ELSE scale END) + 0.5),
        |    -127.0), 127.0)::BIGINT) AS qs
        |  FROM s)
        |SELECT vec_id, scale, list_sum(qs)::BIGINT AS q_sum,
        |  list_min(qs) AS q_min, list_max(qs) AS q_max,
        |  len(list_filter(qs, x -> abs(x) = 127))::INT AS n_saturated
        |FROM q ORDER BY vec_id""".stripMargin,
    "q_ann_rp" ->
      """WITH q AS (SELECT vec_id,
        |  list_transform(embedding, x -> floor(x::DOUBLE * 1000 + 0.5)) AS qv
        |  FROM embeddings)
        |SELECT vec_id, array_to_string(list_transform(range(0, 16), j ->
        |  CAST(list_sum(list_transform(range(0, 64), i ->
        |    (CASE WHEN md5_number_lower('42:' || j || ':' || i) % 2 = 0
        |     THEN 1 ELSE -1 END) * qv[i + 1])) AS BIGINT)), ',') AS proj
        |FROM q ORDER BY vec_id""".stripMargin,
    "q_ann_rp_topk" ->
      """WITH q0 AS (SELECT vec_id,
        |  list_transform(embedding, x -> floor(x::DOUBLE * 1000 + 0.5)) AS qv
        |  FROM embeddings),
        |p AS (SELECT vec_id, list_transform(range(0, 16), j ->
        |  list_sum(list_transform(range(0, 64), i ->
        |    (CASE WHEN md5_number_lower('42:' || j || ':' || i) % 2 = 0
        |     THEN 1 ELSE -1 END) * qv[i + 1]))) AS proj FROM q0),
        |qq AS (SELECT proj AS qp FROM p
        |  WHERE vec_id = (SELECT min(vec_id) FROM p)),
        |d AS (SELECT vec_id AS neighbor_id,
        |  CAST(list_sum(list_transform(range(0, 16), j ->
        |    (proj[j + 1] - qp[j + 1]) * (proj[j + 1] - qp[j + 1]))) AS BIGINT)
        |    AS proj_dist2
        |  FROM p, qq WHERE vec_id <> (SELECT min(vec_id) FROM p))
        |SELECT neighbor_id, proj_dist2 FROM d
        |ORDER BY proj_dist2, neighbor_id LIMIT 10""".stripMargin,
    "q_ann_ivf" ->
      s"""WITH v AS (SELECT vec_id, embedding,
        |  ${ivfDotsSql("embedding", 16, 64)} AS dots
        |  FROM embeddings),
        |cells AS (SELECT vec_id, embedding,
        |    list_position(dots, list_max(dots)) - 1 AS cell FROM v),
        |q AS (SELECT vec_id AS qid, embedding AS e, dots AS qdots FROM v
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
        |qd AS (SELECT unnest(range(16)) AS cell, unnest(qdots) AS d FROM q),
        |probe AS (SELECT cell FROM qd ORDER BY d DESC, cell LIMIT 4),
        |s AS (SELECT c.vec_id AS neighbor_id,
        |  ${cosineSql("c.embedding", "q.e", 64)} AS c
        |  FROM cells c, q WHERE c.vec_id <> q.qid
        |    AND c.cell IN (SELECT cell FROM probe))
        |SELECT neighbor_id, round(c, 6) AS cosine FROM s
        |ORDER BY c DESC, neighbor_id LIMIT 10""".stripMargin,
    "q_ann_kmeans" -> kmeansSql(k = 8, dim = 64, iters = 2),
    "q_ann_kmeans_minibatch" -> minibatchKmeansSql(k = 8, dim = 64, batches = 4),
    // replay the fit (shared centroid chain), then BOTH cell assignments
    // (data rn=1, probe rn<=2 by (dist, cell)), the cell equi-join, the
    // exact cosine, and the rounded-cosine rank order
    "q_ann_knn_join" -> knnJoinSql(topK = 3, nprobe = 2, excludeSame = true),
    // retrieval = the same replay with the probe side restricted to the
    // odd-id half and the corpus side to the even-id half
    "q_ann_knn_retrieve" -> knnJoinSql(topK = 3, nprobe = 2, excludeSame = false,
      probeWhere = "AND vec_id % 2 = 1", dataWhere = "AND vec_id % 2 = 0"),
    // the retrieval chain at k=4, positives dropped arithmetically,
    // bounded per-query re-rank to the 3 hardest negatives
    "q_ann_hardneg" ->
      s"""WITH hard AS (
        |  SELECT vec_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cosine DESC, neighbor_id) AS hn_rank
        |  FROM (
        |${knnJoinSql(topK = 4, nprobe = 2, excludeSame = false,
          probeWhere = "AND vec_id % 2 = 1", dataWhere = "AND vec_id % 2 = 0")}
        |  ) base
        |  WHERE neighbor_id <> (vec_id + 1) % 500)
        |SELECT vec_id, neighbor_id, cosine, hn_rank FROM hard
        |WHERE hn_rank <= 3 ORDER BY vec_id, hn_rank""".stripMargin,
    "q_ann_outliers" -> outliersSql(k = 8, dim = 64, iters = 2, n = 5),
    "q_ann_classify" ->
      """WITH v AS (SELECT vec_id,
        |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)) AS q
        |  FROM embeddings),
        |seeds AS (SELECT vec_id, q, 'c' || CAST(vec_id % 3 AS VARCHAR) AS l
        |  FROM v WHERE vec_id < 90),
        |m AS (SELECT l, t.i, sum(q[t.i]) / count(*) AS val
        |  FROM seeds, (SELECT unnest(range(1, 65)) AS i) t GROUP BY l, t.i),
        |cents AS (SELECT l, dense_rank() OVER (ORDER BY l) - 1 AS c,
        |    list(val ORDER BY i) AS cent
        |  FROM m GROUP BY l),
        |df AS (SELECT v.vec_id, cents.l, cents.c,
        |  list_sum(list_transform(range(1, 65),
        |    i -> (v.q[i] - cents.cent[i]) * (v.q[i] - cents.cent[i]))) AS d
        |  FROM v, cents)
        |SELECT vec_id, l AS label, round(d / 1000000.0, 6) AS dist2
        |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df)
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "q_ann_pq_trained" -> pqTrainedSql(m = 8, k = 16, subDim = 8,
      iters = 1, topK = 10),
    "q_ann_diversity" -> ("WITH " + kmeansCentsSql(k = 8, dim = 64, iters = 1) +
      s"""df AS (SELECT v.vec_id, c1.c,
         |  list_sum(list_transform(range(1, 65),
         |    i -> (v.q[i] - c1.cent[i]) * (v.q[i] - c1.cent[i]))) AS d
         |  FROM v, c1),
         |asg AS (SELECT vec_id, c FROM (SELECT *, row_number()
         |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df) WHERE rn = 1),
         |r AS (SELECT vec_id, c, row_number() OVER (PARTITION BY c
         |    ORDER BY md5('d1|' || vec_id::VARCHAR), vec_id) AS rk FROM asg)
         |SELECT vec_id, CAST(c AS INT) AS cluster FROM r WHERE rk <= 20
         |ORDER BY vec_id""".stripMargin),
    "q_ann_ivf_trained" -> ivfTrainedSql(k = 16, dim = 64, iters = 1,
      nprobe = 4, topK = 10),
    "q_ann_semdedup" -> semanticDedupSql(k = 8, dim = 64, iters = 1, threshold = 0.4),
    "q_text_perplexity" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |tc AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
        |n AS (SELECT sum(cnt) AS n FROM tc),
        |model AS (SELECT term,
        |  CAST(floor(ln(cnt::DOUBLE / n.n::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS lp
        |  FROM tc, n),
        |pd AS (SELECT tf.doc_id, sum(tf.tf) AS n_tokens,
        |    -sum(tf.tf * m.lp) AS nll_micro
        |  FROM tf JOIN model m ON tf.term = m.term GROUP BY tf.doc_id)
        |SELECT d.doc_id, coalesce(pd.n_tokens, 0)::BIGINT AS n_tokens,
        |  coalesce(pd.nll_micro, 0)::BIGINT AS nll_micro,
        |  (pd.nll_micro // pd.n_tokens)::BIGINT AS avg_nll_micro
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // perplexity prelude → per-doc avg scores (nulls out) → per-value
    // counts → exclusive-rank positions → integer band test → semi-join
    "q_text_band" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |tc AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
        |nn AS (SELECT sum(cnt) AS n FROM tc),
        |model AS (SELECT term,
        |  CAST(floor(ln(cnt::DOUBLE / nn.n::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS lp
        |  FROM tc, nn),
        |pd AS (SELECT tf.doc_id, sum(tf.tf) AS n_tokens,
        |    -sum(tf.tf * m.lp) AS nll_micro
        |  FROM tf JOIN model m ON tf.term = m.term GROUP BY tf.doc_id),
        |scores AS (SELECT doc_id,
        |    (nll_micro // n_tokens)::BIGINT AS avg_nll_micro
        |  FROM pd WHERE n_tokens > 0),
        |cnt2 AS (SELECT count(*) AS n FROM scores),
        |vc AS (SELECT avg_nll_micro AS s, count(*) AS c FROM scores GROUP BY 1),
        |cum AS (SELECT s, coalesce(sum(c) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos FROM vc),
        |keep AS (SELECT s FROM cum, cnt2
        |  WHERE 100 * pos >= 20 * cnt2.n AND 100 * pos < 80 * cnt2.n)
        |SELECT scores.doc_id, scores.avg_nll_micro FROM scores
        |JOIN keep ON scores.avg_nll_micro = keep.s
        |ORDER BY scores.doc_id""".stripMargin,
    "q_pipeline_curate3" -> {
      val alt = graft.text.Web.publicSuffixes
        .map(_.replace(".", "\\.")).mkString("|")
      val multi = s"regexp_extract(host, '([^.]+\\.(?:$alt))$$', 1)"
      val two = "regexp_extract(host, '([^.]+\\.[^.]+)$', 1)"
      s"""WITH t AS (SELECT doc_id, source, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, source,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |words AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS idx FROM tt),
        |segs AS (SELECT doc_id, (idx-1)//2 AS i, string_agg(w, ' ' ORDER BY idx) AS seg
        |  FROM words GROUP BY doc_id, (idx-1)//2),
        |dupdocs AS (SELECT doc_id FROM segs GROUP BY doc_id
        |  HAVING count(*) > count(DISTINCT seg)),
        |bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |  THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |  ELSE [] END) AS bigram FROM tt),
        |tf AS (SELECT doc_id, bigram, count(*) AS tf FROM bg GROUP BY doc_id, bigram),
        |c AS (SELECT bigram, sum(tf) AS cnt FROM tf GROUP BY bigram),
        |p AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(cnt) AS w1cnt
        |  FROM c GROUP BY 1),
        |model AS (SELECT c.bigram,
        |  CAST(floor(ln(c.cnt::DOUBLE / p.w1cnt::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS lp
        |  FROM c JOIN p ON split_part(c.bigram, ' ', 1) = p.w1),
        |pd AS (SELECT tf.doc_id, sum(tf.tf) AS n_bigrams,
        |    -sum(tf.tf * m.lp) AS nll_micro
        |  FROM tf JOIN model m ON tf.bigram = m.bigram GROUP BY tf.doc_id),
        |band AS (SELECT doc_id, (nll_micro // n_bigrams)::BIGINT AS avg_nll_micro
        |  FROM pd WHERE (nll_micro // n_bigrams) BETWEEN 3340000 AND 3430000),
        |joined AS (SELECT d.doc_id, d.source, band.avg_nll_micro
        |  FROM documents d JOIN band ON d.doc_id = band.doc_id
        |  WHERE d.doc_id NOT IN (SELECT doc_id FROM dupdocs)),
        |u AS (SELECT doc_id, source, avg_nll_micro,
        |  'https://' ||
        |  CASE doc_id % 4 WHEN 0 THEN 'www.' WHEN 1 THEN 'a.b.'
        |    WHEN 2 THEN '' ELSE 'sub.' END ||
        |  source ||
        |  CASE doc_id % 3 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
        |    ELSE '.com.au' END ||
        |  '/doc/' || doc_id::VARCHAR AS url
        |  FROM joined),
        |h AS (SELECT doc_id, source, avg_nll_micro,
        |  lower(regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)) AS host
        |  FROM u),
        |clean AS (SELECT doc_id, source, avg_nll_micro FROM h
        |  WHERE (CASE WHEN $multi <> '' THEN $multi
        |         WHEN $two <> '' THEN $two ELSE host END)
        |    NOT IN ('src1.co.uk','src3.com.au','src5.com')),
        |r AS (SELECT doc_id, source, avg_nll_micro,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY md5('cur3|' || doc_id::VARCHAR), doc_id) AS rn FROM clean)
        |SELECT doc_id, source, avg_nll_micro FROM r WHERE rn <= 10
        |ORDER BY doc_id""".stripMargin
    },
    "q_text_bigramlm" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |  THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |  ELSE [] END) AS bigram FROM tt),
        |tf AS (SELECT doc_id, bigram, count(*) AS tf FROM bg GROUP BY doc_id, bigram),
        |c AS (SELECT bigram, sum(tf) AS cnt FROM tf GROUP BY bigram),
        |p AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(cnt) AS w1cnt
        |  FROM c GROUP BY 1),
        |model AS (SELECT c.bigram,
        |  CAST(floor(ln(c.cnt::DOUBLE / p.w1cnt::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS lp
        |  FROM c JOIN p ON split_part(c.bigram, ' ', 1) = p.w1),
        |pd AS (SELECT tf.doc_id, sum(tf.tf) AS n_bigrams,
        |    -sum(tf.tf * m.lp) AS nll_micro
        |  FROM tf JOIN model m ON tf.bigram = m.bigram GROUP BY tf.doc_id)
        |SELECT d.doc_id, coalesce(pd.n_bigrams, 0)::BIGINT AS n_bigrams,
        |  coalesce(pd.nll_micro, 0)::BIGINT AS nll_micro,
        |  (pd.nll_micro // pd.n_bigrams)::BIGINT AS avg_nll_micro
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q_text_dsir" -> dsirSql(selectK = None),
    "q_text_dsir_select" -> dsirSql(selectK = Some(100)),
    "q_text_dsir_resample" -> dsirSql(selectK = None,
      resample = Some((100, "dsir1"))),
    "q_text_kl" -> klSql(buckets = 1024),
    "q_text_quality_lr" -> logRegSql(iters = 3, buckets = 1024, etaMilli = 500),
    "q_pipeline_curate8" ->
      curate8Sql(iters = 3, buckets = 1024, etaMilli = 500, perSource = 10),
    "q_pipeline_curate6" ->
      """WITH u AS (SELECT doc_id, source,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN 'https://www.ex' || ((doc_id // 2) % 7)::VARCHAR || '.com/p/'
        |      || (doc_id // 2)::VARCHAR || '?utm_source=x'
        |    ELSE 'HTTPS://ex' || ((doc_id // 2) % 7)::VARCHAR || '.com:443/p/'
        |      || (doc_id // 2)::VARCHAR || '/' END AS url
        |  FROM documents),
        |parts AS (SELECT doc_id, source, url,
        |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)', 1) AS hostport,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '^[^#]*?\?([^#]*)', 1) AS q
        |  FROM u),
        |comp AS (SELECT doc_id, source, scheme,
        |  regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')), '^www\.', '') AS host,
        |  regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
        |  regexp_replace(path, '/+$', '') AS cpath,
        |  list_sort(list_filter(string_split(q, '&'), p -> p <> '' AND
        |    NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)(=.*)?$'))) AS params
        |  FROM parts),
        |nrm AS (SELECT doc_id, source, scheme || '://' || host ||
        |  (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |    OR (scheme = 'https' AND port = '443') THEN '' ELSE ':' || port END) ||
        |  cpath ||
        |  (CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&')
        |    ELSE '' END) AS norm_url
        |  FROM comp),
        |kept AS (SELECT doc_id, source FROM (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY norm_url ORDER BY doc_id) AS rn
        |  FROM nrm) WHERE rn = 1),
        |t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |c AS (SELECT k.doc_id, k.source, sh.s FROM kept k
        |  JOIN sh ON k.doc_id = sh.doc_id WHERE k.doc_id % 25 <> 0),
        |b AS (SELECT s FROM sh WHERE doc_id % 25 = 0),
        |f AS (SELECT DISTINCT c.doc_id FROM c, b
        |  WHERE len(list_intersect(c.s, b.s))::DOUBLE / len(b.s)::DOUBLE >= 0.6),
        |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY md5('cur6|' || doc_id::VARCHAR), doc_id) AS rn
        |  FROM c WHERE doc_id NOT IN (SELECT doc_id FROM f))
        |SELECT doc_id, source FROM r WHERE rn <= 20
        |ORDER BY doc_id""".stripMargin,
    "q_pipeline_curate5" -> curate5Sql(iters = 3, buckets = 1024,
      etaMilli = 500, topK = 100, perSource = 5),
    "q_dedup_simhash" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |h AS (SELECT doc_id, list_transform(toks, s -> md5_number_lower(s)) AS hs FROM tt),
        |f AS (SELECT doc_id, list_transform(range(0,64), b ->
        |    CASE WHEN 2 * len(list_filter(hs, x -> ((x >> b) & 1) = 1)) > len(hs)
        |    THEN 1 ELSE 0 END) AS bits
        |  FROM h),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(list_sum(list_transform(range(1,65),
        |      i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END)) AS INT) AS hamming
        |  FROM f a, f b WHERE a.doc_id < b.doc_id)
        |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_simhash_incremental" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |h AS (SELECT doc_id, list_transform(toks, s -> md5_number_lower(s)) AS hs FROM tt),
        |f AS (SELECT doc_id, list_transform(range(0,64), b ->
        |    CASE WHEN 2 * len(list_filter(hs, x -> ((x >> b) & 1) = 1)) > len(hs)
        |    THEN 1 ELSE 0 END) AS bits
        |  FROM h),
        |dropped AS (SELECT b.doc_id FROM f a, f b
        |  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |  AND list_sum(list_transform(range(1,65),
        |    i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END)) <= 3)
        |SELECT doc_id FROM f
        |WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM dropped)
        |ORDER BY doc_id""".stripMargin,
    "q_multimodal_decode" ->
      """WITH m AS (SELECT doc_id AS id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS modality,
        |  CAST(octet_length(encode(text)) AS INT) AS len FROM documents)
        |SELECT id, modality,
        |  CAST(CASE modality WHEN 'image' THEN 16 + len % 640
        |    WHEN 'audio' THEN 0 ELSE 16 + len % 320 END AS INT) AS width,
        |  CAST(CASE modality WHEN 'image' THEN 16 + (len * 7) % 480
        |    WHEN 'audio' THEN 0 ELSE 16 + (len * 3) % 240 END AS INT) AS height,
        |  CAST(CASE modality WHEN 'image' THEN 1
        |    WHEN 'audio' THEN 1 + len % 16 ELSE 1 + len % 32 END AS INT) AS "nFrames",
        |  len AS "byteLen"
        |FROM m ORDER BY id""".stripMargin,
    "q_multimodal_audiohash" ->
      """WITH h AS (SELECT doc_id,
        |  CASE WHEN (doc_id % 500) > ((3 * doc_id) % 500) THEN 4294967295
        |       WHEN ((3 * doc_id) % 500) > (doc_id % 500) THEN -4294967296
        |       ELSE 0 END AS afp
        |  FROM documents)
        |SELECT doc_id, afp,
        |  (doc_id = min(doc_id) OVER (PARTITION BY afp)) AS kept
        |FROM h ORDER BY doc_id""".stripMargin,
    "q_multimodal_imagehash" ->
      """WITH h AS (SELECT doc_id,
        |  CASE WHEN (doc_id % 200) > ((7 * doc_id) % 200) THEN 1085102592571150095
        |       WHEN ((7 * doc_id) % 200) > (doc_id % 200) THEN -1085102592571150096
        |       ELSE 0 END AS phash
        |  FROM documents)
        |SELECT doc_id, phash,
        |  (doc_id = min(doc_id) OVER (PARTITION BY phash)) AS kept
        |FROM h ORDER BY doc_id""".stripMargin,
    "q_multimodal_resize" ->
      """SELECT doc_id, 8 AS width, 8 AS height,
        |  (((doc_id % 200) + ((7 * doc_id) % 200) + 1) // 2)::BIGINT AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_image" ->
      """SELECT doc_id,
        |  (16 + doc_id % 64)::INT AS width,
        |  (16 + (doc_id * 7) % 48)::INT AS height,
        |  (doc_id % 240)::BIGINT AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_audio" ->
      """SELECT doc_id,
        |  8000::INT AS sample_rate,
        |  1::INT AS channels,
        |  (800 + 8 * (doc_id % 100))::INT AS n_samples,
        |  ((800 + 8 * (doc_id % 100)) // 8)::BIGINT AS duration_ms,
        |  (1 + doc_id % 1000)::BIGINT AS rms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_video" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS container,
        |  (160 + 16 * (doc_id % 28))::INT AS width,
        |  (120 + 8 * (doc_id % 30))::INT AS height,
        |  (CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END)::INT AS n_tracks,
        |  (50 + doc_id % 200)::BIGINT AS frame_count,
        |  ((50 + doc_id % 200) * 40)::BIGINT AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_videoframes" ->
      """SELECT d.doc_id, u.frame_idx,
        |  (16 + 8 * (d.doc_id % 10))::INT AS width,
        |  (16 + 8 * ((3 * d.doc_id) % 8))::INT AS height
        |FROM documents d,
        |  LATERAL (SELECT unnest(range(0, 2 + d.doc_id % 4)) AS frame_idx) u
        |WHERE u.frame_idx % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q_idx_point_lookup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)
        |ORDER BY l_linenumber""".stripMargin,
    "q_idx_orc" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)
        |ORDER BY l_linenumber""".stripMargin,
    "q_idx_multiroot" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)
        |ORDER BY l_linenumber""".stripMargin,
    "q_idx_refresh" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey =
        |    (SELECT min(l_orderkey) FROM lineitem WHERE l_orderkey % 2 = 1)
        |  OR l_returnflag = 'R'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_contains" ->
      """SELECT p_partkey, p_brand, p_type, p_retailprice
        |FROM part
        |WHERE p_type LIKE '%CONOM%' AND p_brand LIKE '%3'
        |ORDER BY p_partkey""".stripMargin,
    "q_idx_compact" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey <= 30000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_range_date" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_range_cluster" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_range_double" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_extendedprice >= 50000.0 AND l_extendedprice < 55000.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_point_double" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_extendedprice = (SELECT max(l_extendedprice) FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_range_decimal" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_q
        |FROM lineitem
        |WHERE CAST(l_quantity AS DECIMAL(12,2)) >= 10.00
        |  AND CAST(l_quantity AS DECIMAL(12,2)) <= 12.00
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_range_float" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE CAST(l_discount AS REAL) >= CAST(0.09 AS REAL)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_double_meta" ->
      """SELECT count(*) AS n_rows, min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,
    "q_idx_nested" ->
      """SELECT o_orderkey, o_custkey AS user_id, o_orderstatus AS status,
        |  round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_custkey <= 50 AND o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,
    "q_idx_nested_topk" ->
      """SELECT o_orderkey, o_custkey AS user_id
        |FROM orders
        |ORDER BY o_custkey DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_idx_nested_meta" ->
      """SELECT count(*) AS n_rows, count(o_custkey) AS n_users,
        |  min(o_custkey) AS min_user, max(o_custkey) AS max_user
        |FROM orders""".stripMargin,
    "q_idx_range_ts_int96" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_bucket_join" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_idx_zorder" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice
        |FROM lineitem
        |WHERE l_suppkey BETWEEN 10 AND 25 AND l_orderkey BETWEEN 5000 AND 20000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_skew_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_idx_agg_meta" ->
      """SELECT count(*) AS n_rows, count(l_orderkey) AS n_keys,
        |  min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
        |FROM lineitem""".stripMargin,
    "q_idx_distinct_meta" ->
      "SELECT DISTINCT p_brand FROM part ORDER BY p_brand",
    "q_idx_agg_dict_meta" ->
      """SELECT count(DISTINCT p_type) AS n_types, min(p_type) AS min_type,
        |  max(p_type) AS max_type
        |FROM part""".stripMargin,
    "q_idx_group_meta" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, count(*) AS n_orders,
        |  min(o_custkey) AS min_cust, max(o_custkey) AS max_cust
        |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q_idx_filter_meta" ->
      """SELECT count(*) AS n_orders, min(o_custkey) AS min_cust,
        |  max(o_custkey) AS max_cust,
        |  CAST(min(year(o_orderdate)) AS INT) AS min_year,
        |  CAST(max(year(o_orderdate)) AS INT) AS max_year
        |FROM orders WHERE year(o_orderdate) BETWEEN 1994 AND 1996""".stripMargin,
    "q_idx_topk" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey DESC, l_linenumber DESC LIMIT 100""".stripMargin,
    "q_idx_topk_auto" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey DESC, l_linenumber DESC LIMIT 100""".stripMargin,
    "q_idx_topk_group" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |  year(o_orderdate)::INT AS o_year FROM orders),
        |r AS (SELECT o_year, o_orderkey, o_custkey,
        |  (row_number() OVER (PARTITION BY o_year
        |     ORDER BY o_custkey DESC, o_orderkey))::INT AS rn FROM o)
        |SELECT o_year, rn, o_orderkey, o_custkey FROM r WHERE rn <= 10
        |ORDER BY o_year, rn""".stripMargin,
    "q_idx_topk_group_auto" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |  year(o_orderdate)::INT AS o_year FROM orders),
        |r AS (SELECT o_year, o_orderkey, o_custkey,
        |  (row_number() OVER (PARTITION BY o_year
        |     ORDER BY o_custkey DESC, o_orderkey))::INT AS rn FROM o)
        |SELECT o_year, rn, o_orderkey, o_custkey FROM r WHERE rn <= 10
        |ORDER BY o_year, rn""".stripMargin,
    "q_idx_in_list" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice
        |FROM lineitem WHERE l_suppkey IN (1, 2, 3)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_join_prune" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, s_name, l_extendedprice
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_suppkey <= 3
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_join_bloom" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, o_orderpriority,
        |  l_extendedprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_custkey = 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_join_auto" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, s_name, l_extendedprice
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_suppkey <= 3
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_array_contains" ->
      """SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |GROUP BY l_orderkey
        |HAVING sum(CASE WHEN l_suppkey = 3 THEN 1 ELSE 0 END) > 0
        |ORDER BY l_orderkey""".stripMargin,
    "q_idx_arrays_overlap" ->
      """SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |GROUP BY l_orderkey
        |HAVING sum(CASE WHEN l_suppkey IN (3, 7) THEN 1 ELSE 0 END) > 0
        |ORDER BY l_orderkey""".stripMargin,
    "q_idx_array_struct" ->
      """SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |GROUP BY l_orderkey
        |HAVING sum(CASE WHEN l_suppkey = 3 THEN 1 ELSE 0 END) > 0
        |ORDER BY l_orderkey""".stripMargin,
    "q_idx_join_anti" ->
      """SELECT s_suppkey FROM supplier
        |WHERE s_suppkey <= 20
        |AND NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_suppkey = s_suppkey
        |    AND l.l_quantity = 50 AND l.l_linenumber = 7)
        |ORDER BY s_suppkey""".stripMargin,
    "q_idx_map_value" ->
      """SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |GROUP BY l_orderkey
        |HAVING l_orderkey = 1
        |ORDER BY l_orderkey""".stripMargin,
    "q_idx_join_auto_nested" ->
      """SELECT o_orderkey, o_custkey AS user_id,
        |  round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_custkey <= 3)
        |ORDER BY o_orderkey""".stripMargin,
    "q_idx_map_contains" ->
      """SELECT l_orderkey,
        |  CAST(sum(CASE WHEN l_suppkey = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_supp3
        |FROM lineitem GROUP BY l_orderkey
        |HAVING sum(CASE WHEN l_suppkey = 3 THEN 1 ELSE 0 END) > 0
        |ORDER BY l_orderkey""".stripMargin,
    "q_idx_and_or" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag
        |FROM lineitem
        |WHERE (l_returnflag = 'R' AND l_suppkey = 1)
        |   OR l_orderkey = (SELECT max(l_orderkey) FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_string_eq" ->
      """SELECT l_linestatus, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem WHERE l_returnflag = 'A'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_idx_dict" ->
      """SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
        |  l_suppkey, l_quantity
        |FROM lineitem WHERE l_suppkey = 7 AND l_linenumber = 2
        |ORDER BY l_orderkey""".stripMargin,
    "q_idx_partition" ->
      """SELECT o_orderkey, o_custkey, CAST(year(o_orderdate) AS INT) AS o_year,
        |  o_totalprice
        |FROM orders
        |WHERE year(o_orderdate) = 1995 AND o_custkey =
        |  (SELECT min(o_custkey) FROM orders WHERE year(o_orderdate) = 1995)
        |ORDER BY o_orderkey""".stripMargin,
    "q_events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "q_stream_ingest" ->
      """SELECT user_id, count(*)::BIGINT AS n, round(sum(value), 4) AS total_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Batch-by-batch replay of the streaming near-dedup ingest, unrolled
    // over the 4 arrival buckets (bucket = doc_id div slice, slice =
    // max(doc_id)//4 + 1 — the same integer arithmetic as the stager).
    // Per batch i: s_i = batch minus docs similar to any previously KEPT
    // doc; k_i = s_i minus docs similar to a smaller doc within s_i.
    // Similarity = exact 3-shingle Jaccard >= 0.5 (j has ida < idb, and
    // ranged buckets make every cross-batch pair ida-first).
    // the streamed index serves the same conjunctive query: one oracle
    "q_stream_searchingest" -> textSearchSql,
    // the streamed codes table serves the same IVFADC probe: one oracle
    "q_stream_vectoringest" -> ivfPqSql(cells = 16, nprobe = 4, dim = 64,
      m = 8, k = 16, subDim = 8, topK = 10),
    "q_stream_winnow" -> {
      val prelude =
        """WITH t AS (SELECT doc_id,
          |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
          |  FROM documents),
          |h AS (SELECT doc_id, list_transform(range(0, greatest(length(norm) - 11, 0)),
          |    p -> md5_number_lower(substr(norm, p::INT + 1, 12))) AS hs FROM t),
          |sel AS (SELECT doc_id, hs, unnest(list_transform(
          |    range(0, CASE WHEN len(hs) = 0 THEN 0 ELSE greatest(len(hs) - 7, 1) END),
          |    j -> j::INT + least(8, len(hs) - j::INT)
          |       - list_position(list_reverse(hs[j+1 : j+8]), list_min(hs[j+1 : j+8])))) AS pos
          |  FROM h),
          |fp AS (SELECT DISTINCT doc_id, hs[pos+1] AS hash FROM sel),
          |j AS (SELECT a.doc_id AS ida, b.doc_id AS idb FROM fp a JOIN fp b
          |  ON a.hash = b.hash AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2 HAVING count(*) >= 5),
          |d AS (SELECT doc_id,
          |  doc_id // (SELECT max(doc_id) // 4 + 1 FROM documents) AS b
          |  FROM documents),
          |s0 AS (SELECT doc_id FROM d WHERE b = 0),
          |k0 AS (SELECT doc_id FROM s0 WHERE doc_id NOT IN
          |  (SELECT idb FROM j WHERE ida IN (SELECT doc_id FROM s0)))""".stripMargin
      val batches = (1 until 4).map { i =>
        val prevKept = (0 until i).map(jj => s"SELECT doc_id FROM k$jj")
          .mkString(" UNION ALL ")
        s"""s$i AS (SELECT doc_id FROM d WHERE b = $i AND doc_id NOT IN
           |  (SELECT idb FROM j WHERE ida IN ($prevKept))),
           |k$i AS (SELECT doc_id FROM s$i WHERE doc_id NOT IN
           |  (SELECT idb FROM j WHERE ida IN (SELECT doc_id FROM s$i)))""".stripMargin
      }
      val union = (0 until 4).map(i => s"SELECT doc_id FROM k$i")
        .mkString(" UNION ALL ")
      (Seq(prelude) ++ batches).mkString(",\n") +
        s"\nSELECT doc_id FROM ($union) ORDER BY doc_id"
    },
    "q_stream_neardedup" -> {
      val prelude =
        """WITH t AS (SELECT doc_id,
          |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
          |  FROM documents),
          |tt AS (SELECT doc_id,
          |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
          |sh AS (SELECT doc_id, list_distinct(
          |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
          |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
          |  FROM tt),
          |d AS (SELECT doc_id, s,
          |  doc_id // (SELECT max(doc_id) // 4 + 1 FROM sh) AS b FROM sh),
          |j AS (SELECT a.doc_id AS ida, x.doc_id AS idb FROM d a JOIN d x
          |  ON a.doc_id < x.doc_id
          |  AND round(len(list_intersect(a.s, x.s))::DOUBLE /
          |    len(list_distinct(list_concat(a.s, x.s)))::DOUBLE, 4) >= 0.5),
          |s0 AS (SELECT doc_id FROM d WHERE b = 0),
          |k0 AS (SELECT doc_id FROM s0 WHERE doc_id NOT IN
          |  (SELECT idb FROM j WHERE ida IN (SELECT doc_id FROM s0)))""".stripMargin
      val batches = (1 until 4).map { i =>
        val prevKept = (0 until i).map(jj => s"SELECT doc_id FROM k$jj")
          .mkString(" UNION ALL ")
        s"""s$i AS (SELECT doc_id FROM d WHERE b = $i AND doc_id NOT IN
           |  (SELECT idb FROM j WHERE ida IN ($prevKept))),
           |k$i AS (SELECT doc_id FROM s$i WHERE doc_id NOT IN
           |  (SELECT idb FROM j WHERE ida IN (SELECT doc_id FROM s$i)))""".stripMargin
      }
      val union = (0 until 4).map(i => s"SELECT doc_id FROM k$i")
        .mkString(" UNION ALL ")
      (Seq(prelude) ++ batches).mkString(",\n") +
        s"\nSELECT doc_id FROM ($union) ORDER BY doc_id"
    },
    "q_session_window" ->
      """WITH l AS (SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL THEN 1
        |    WHEN epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM l),
        |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM f)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*)::BIGINT AS n_events, round(sum(value), 4) AS session_value
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_start""".stripMargin,
    "q_agg_histogram" ->
      // DuckDB has no width_bucket; replicate Spark's formula exactly:
      // width = (600000-0)/24 = 25000 (exact double), bucket =
      // floor(v/width)+1 clamped to 0 / n+1 outside the bounds.
      """SELECT (CASE WHEN o_totalprice < 0.0 THEN 0
        |    WHEN o_totalprice >= 600000.0 THEN 25
        |    ELSE floor(o_totalprice / 25000.0)::BIGINT + 1 END)::BIGINT AS bucket,
        |  count(*)::BIGINT AS n, round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_stream_enrich" ->
      """SELECT e.event_id, e.user_id, c.c_mktsegment, e.event_type, e.value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,
    "q_window_range" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  round(sum(value) OVER w, 4) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_profile" ->
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate", "o_orderpriority")
        .map(c =>
          s"""SELECT '$c' AS column_name, count(*)::BIGINT AS n_rows,
             |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
             |  count(DISTINCT $c)::BIGINT AS n_distinct,
             |  min($c)::VARCHAR AS min_val, max($c)::VARCHAR AS max_val
             |FROM orders""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name"),
    "q_stream_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |  (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS lag_seconds
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND epoch_us(p.ts) >= epoch_us(c.ts)
        |  AND epoch_us(p.ts) <= epoch_us(c.ts) + 240::BIGINT * 60 * 1000000
        |ORDER BY click_id, purchase_id""".stripMargin,
    "q_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.t_us,
        |  l.event_id AS asof_event_id, l.t_us AS asof_t_us
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.event_id, c.t_us FROM c
        |  WHERE c.user_id = p.user_id AND c.t_us <= p.t_us
        |  ORDER BY c.t_us DESC, c.event_id DESC LIMIT 1) l ON true
        |ORDER BY p.event_id""".stripMargin,
    "q_asof_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.t_us,
        |  l.event_id AS asof_event_id, l.t_us AS asof_t_us
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.event_id, c.t_us FROM c
        |  WHERE c.user_id = p.user_id AND c.t_us <= p.t_us
        |    AND p.t_us - c.t_us <= 7200000000
        |  ORDER BY c.t_us DESC, c.event_id DESC LIMIT 1) l ON true
        |ORDER BY p.event_id""".stripMargin,
    "q_range_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT user_id, epoch_us(ts) AS t_us, value
        |  FROM events WHERE event_type IN ('view', 'click'))
        |SELECT p.event_id, p.user_id, p.t_us,
        |  count(a.t_us) AS n_prior,
        |  round(coalesce(sum(a.value), 0), 4) AS v_prior
        |FROM p LEFT JOIN a ON a.user_id = p.user_id
        |  AND a.t_us BETWEEN p.t_us - 3600000000 AND p.t_us - 1
        |GROUP BY 1, 2, 3 ORDER BY p.event_id""".stripMargin,
    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q_scalar_json" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_stream_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q_stream_hourly_update" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q_sessionize" ->
      """WITH l AS (SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL THEN 1
        |    WHEN epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM l),
        |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM f),
        |g AS (SELECT user_id, session_seq, count(*) AS n_events,
        |    round(sum(value), 4) AS session_value
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |  max(n_events) AS max_session_events,
        |  round(sum(session_value), 4) AS total_value
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}

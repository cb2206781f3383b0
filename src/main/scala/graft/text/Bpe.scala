package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One learned BPE merge: at `rank`, adjacent symbols (`left`, `right`)
  * fuse into `left + right`; `pairCount` is the occurrence-weighted
  * frequency that won the rank (the classic trainer's argmax value). */
case class BpeMerge(rank: Int, left: String, right: String, pairCount: Long)

/** Byte-pair-encoding tokenizer training and inference (Sennrich et al.
  * 2016, arXiv:1508.07909) — the vocabulary-learning step of a training
  * -data pipeline, Spark-first:
  *
  *   - the CORPUS-proportional work is one distributed aggregation:
  *     tokenize → explode → count by word. Its output is DISTINCT-WORD
  *     sized (~1e8 for 100 TB of web text, a few GB of (word, count)
  *     rows), not corpus sized;
  *   - merge LEARNING then runs on the driver over that word-frequency
  *     table — the standard trainer shape (single-node over word counts,
  *     exactly how reference BPE/WordPiece trainers operate) — guarded
  *     by `maxVocab` with `minCount` as the documented relief valve:
  *     hapax legomena dominate web-scale vocabularies and contribute
  *     nothing to merge statistics worth their memory;
  *   - ENCODING is a map-side codegen'd expression
  *     ([[graft.functions.BpeEncode]]): merge ranks ride the plan to
  *     every task, each distinct word pays the merge loop once per task
  *     (memoized), the corpus never shuffles.
  *
  * The trainer keeps pair counts in a TreeSet ordered by
  * (count desc, pair asc), so each merge is an O(log P) argmax plus
  * incremental neighbor updates only in words containing the merged
  * pair — O(merges · log P + touched-symbols), not
  * O(merges · vocabulary).
  *
  * Determinism: ties break lexicographically on (left, right); word
  * order never affects pair sums; the collected word table is sorted.
  * Same corpus + params ⇒ byte-identical merge list on every run and
  * partitioning.
  */
object Bpe {

  /** Distributed word-frequency table: (word, n), the corpus's only
    * full pass. `minCount` prunes the hapax tail BEFORE the driver ever
    * sees it — the filter runs on the aggregated table, so the shuffle
    * carries one row per distinct word regardless. */
  def wordCounts(df: DataFrame, text: Column, minCount: Long = 1L): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1: $minCount")
    df.select(explode(graft.functions.exprs.tokenize(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Learn `numMerges` merges from a (word, n) table. Collects at most
    * `maxVocab` + 1 rows and fails fast past the cap (raise `minCount`
    * or `maxVocab`); training cost is driver-side but bounded by the
    * distinct-word count, never the corpus. Stops early when no
    * adjacent pair occurs at least `minPairCount` times. */
  def train(
      wordCounts: DataFrame,
      numMerges: Int,
      maxVocab: Int = 2000000,
      minPairCount: Long = 2L): Seq[BpeMerge] = {
    require(numMerges >= 0, s"numMerges must be >= 0: $numMerges")
    require(maxVocab >= 1, s"maxVocab must be >= 1: $maxVocab")
    val rows = wordCounts.select(col("word").cast("string"), col("n").cast("long"))
      .limit(maxVocab + 1).collect()
    require(rows.length <= maxVocab,
      s"word table exceeds maxVocab = $maxVocab distinct words; raise minCount " +
        "(hapax pruning) or maxVocab")
    val words: Array[(Array[String], Long)] = rows
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
      .map { case (w, n) =>
        require(n > 0L, s"non-positive count for word '$w': $n")
        (w.codePoints().toArray.map(cp => new String(Character.toChars(cp))), n)
      }
    trainLocal(words, numMerges, minPairCount)
  }

  /** The merge list in rank order — the shape [[encode]] consumes. */
  def mergesOf(ms: Seq[BpeMerge]): Seq[(String, String)] =
    ms.map(m => (m.left, m.right))

  /** Map-side BPE encoding of a token array column: flattened subword
    * array under the given merges. */
  def encode(tokens: Column, merges: Seq[(String, String)]): Column =
    graft.functions.exprs.bpe_encode(tokens, merges)

  /** Exact driver kernel over pre-split words. Package-visible for the
    * differential test against the naive recount-everything trainer. */
  private[graft] def trainLocal(
      words: Array[(Array[String], Long)],
      numMerges: Int,
      minPairCount: Long): Seq[BpeMerge] = {
    import scala.collection.mutable
    val syms: Array[mutable.ArrayBuffer[String]] =
      words.map { case (w, _) => mutable.ArrayBuffer.from(w) }
    val wcnt: Array[Long] = words.map(_._2)

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // argmax structure: highest count first, lexicographic pair tie-break
    val heap = mutable.TreeSet.empty[(Long, String, String)](
      Ordering.Tuple3(Ordering.Long.reverse, Ordering.String, Ordering.String))

    def bump(p: (String, String), delta: Long, wi: Int): Unit = {
      val c0 = pairCount.getOrElse(p, 0L)
      if (c0 != 0L) heap.remove((c0, p._1, p._2))
      val c1 = c0 + delta
      if (c1 != 0L) {
        pairCount(p) = c1
        heap.add((c1, p._1, p._2))
      } else pairCount.remove(p)
      if (delta > 0L && wi >= 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += wi
    }

    var i = 0
    while (i < syms.length) {
      val s = syms(i)
      var j = 0
      while (j < s.length - 1) {
        bump((s(j), s(j + 1)), wcnt(i), i)
        j += 1
      }
      i += 1
    }

    val merges = mutable.ArrayBuffer.empty[BpeMerge]
    var m = 0
    var exhausted = heap.isEmpty
    while (m < numMerges && !exhausted) {
      val (c, a, b) = heap.head
      if (c < minPairCount) exhausted = true
      else {
        merges += BpeMerge(m, a, b, c)
        val ab = a + b
        // only words actually containing (a, b) are touched; stale
        // indexes (pair since merged away there) scan and no-op
        for (wi <- pairWords.getOrElse((a, b), mutable.Set.empty)) {
          val s = syms(wi)
          val n = wcnt(wi)
          val out = new mutable.ArrayBuffer[String](s.length)
          var j = 0
          while (j < s.length) {
            if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
              val prev = if (out.nonEmpty) out.last else null
              val next = if (j + 2 < s.length) s(j + 2) else null
              if (prev != null) bump((prev, a), -n, -1)
              if (next != null) bump((b, next), -n, -1)
              bump((a, b), -n, -1)
              if (prev != null) bump((prev, ab), n, wi)
              if (next != null) bump((ab, next), n, wi)
              out += ab
              j += 2
            } else {
              out += s(j)
              j += 1
            }
          }
          syms(wi) = out
        }
        // every in-word occurrence was decremented above; drop remnants
        pairCount.remove((a, b)).foreach(c0 => heap.remove((c0, a, b)))
        pairWords.remove((a, b))
        m += 1
        exhausted = heap.isEmpty
      }
    }
    merges.toSeq
  }

  /** Naive reference trainer — recount every pair each iteration. Test
    * oracle for [[trainLocal]]'s incremental bookkeeping; O(merges ×
    * corpus symbols), never used in production paths. */
  private[graft] def trainNaive(
      words: Array[(Array[String], Long)],
      numMerges: Int,
      minPairCount: Long): Seq[BpeMerge] = {
    import scala.collection.mutable
    var syms: Array[Vector[String]] = words.map(_._1.toVector)
    val wcnt = words.map(_._2)
    val merges = mutable.ArrayBuffer.empty[BpeMerge]
    var m = 0
    var stop = false
    while (m < numMerges && !stop) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      for (i <- syms.indices; j <- 0 until syms(i).length - 1)
        counts((syms(i)(j), syms(i)(j + 1))) =
          counts.getOrElse((syms(i)(j), syms(i)(j + 1)), 0L) + wcnt(i)
      if (counts.isEmpty) stop = true
      else {
        val (p, c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        if (c < minPairCount) stop = true
        else {
          merges += BpeMerge(m, p._1, p._2, c)
          syms = syms.map { s =>
            val out = mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < s.length) {
              if (j < s.length - 1 && s(j) == p._1 && s(j + 1) == p._2) {
                out += p._1 + p._2; j += 2
              } else { out += s(j); j += 1 }
            }
            out.toVector
          }
          m += 1
        }
      }
    }
    merges.toSeq
  }
}

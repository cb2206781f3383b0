package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Bpe, BpeMerge}

/** Coverage for the BPE trainer and encoder: the incremental trainer is
  * differentially tested against a naive recount-everything reference,
  * the encoder against closed-form segmentations. */
class BpeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bpe-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def split(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  test("trainLocal matches the naive recount trainer on random corpora") {
    val rng = new scala.util.Random(42)
    for (trial <- 0 until 20) {
      val alphabet = "abcd".take(2 + trial % 3)
      val words = (0 until (5 + rng.nextInt(40))).map { _ =>
        val w = (0 until (1 + rng.nextInt(8)))
          .map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
        (split(w), 1L + rng.nextInt(9).toLong)
      }.groupBy(_._1.mkString).map { case (_, g) =>
        (g.head._1, g.map(_._2).sum)
      }.toArray.sortBy(_._1.mkString)
      val nm = 1 + rng.nextInt(12)
      val mpc = 1L + rng.nextInt(3).toLong
      val fast = Bpe.trainLocal(words, nm, mpc)
      val naive = Bpe.trainNaive(words, nm, mpc)
      assert(fast == naive, s"trial $trial (nm=$nm mpc=$mpc): $fast vs $naive")
    }
  }

  test("trainLocal handles overlapping runs (aaa…) identically to naive") {
    val words = Array(
      (split("aaaa"), 3L), (split("aaab"), 2L), (split("baaa"), 2L))
    val fast = Bpe.trainLocal(words, 6, 1L)
    val naive = Bpe.trainNaive(words, 6, 1L)
    assert(fast == naive)
  }

  test("train over a DataFrame learns the hand-computed merges") {
    // corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3
    // classic Sennrich fixture: pair (e,s) count 9 wins first, then
    // (es,t) 9, then... deterministic lexicographic tie-breaks.
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, $"text")
    assert(wc.as[(String, Long)].collect().toMap ==
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L))
    val merges = Bpe.train(wc, numMerges = 3)
    assert(merges.take(2) ==
      Seq(BpeMerge(0, "e", "s", 9L), BpeMerge(1, "es", "t", 9L)))
    // third merge: remaining pairs — lo:7, ow:7, we:2, er:2, ne:6, ew:6,
    // west:6, wi:3, id:3, dest:3 → count 7 tie between (l,o) and (o,w);
    // lexicographic tie-break picks (l,o).
    assert(merges(2) == BpeMerge(2, "l", "o", 7L))
  }

  test("minCount prunes the hapax tail before training") {
    val docs = Seq((1L, "zap zap zap singleton")).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, $"text", minCount = 2L)
    assert(wc.as[(String, Long)].collect().toMap == Map("zap" -> 3L))
  }

  test("train fails fast past maxVocab") {
    val docs = Seq((1L, "one two three four five")).toDF("doc_id", "text")
    val wc = Bpe.wordCounts(docs, $"text")
    val e = intercept[IllegalArgumentException](Bpe.train(wc, 2, maxVocab = 3))
    assert(e.getMessage.contains("maxVocab"))
  }

  test("encode applies merges rank-first and reconstructs each word") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val merges = Bpe.mergesOf(
      Bpe.train(Bpe.wordCounts(docs, $"text"), numMerges = 4))
    val toks = graft.functions.exprs.tokenize($"text")
    val enc = docs
      .select($"text", Bpe.encode(toks, merges).as("sub"))
      .as[(String, Seq[String])].collect()
    enc.foreach { case (w, sub) =>
      assert(sub.mkString == w, s"subwords of '$w' must concatenate back")
      assert(sub.forall(_.nonEmpty))
    }
    // "newest" under merges (e,s),(es,t),(l,o),(lo,w) → n e w est
    val newest = enc.find(_._1 == "newest").get._2
    assert(newest == Seq("n", "e", "w", "est"), newest.toString)
    // "low" → single fused token after (l,o) then (lo,w)
    assert(enc.find(_._1 == "low").get._2 == Seq("low"))
  }

  test("encode with zero merges splits to code points; empty array passes through") {
    val df = Seq(Seq("ab", "c"), Seq.empty[String]).toDF("toks")
    val got = df.select(Bpe.encode($"toks", Nil).as("sub"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(Seq("a", "b", "c"), Seq.empty[String]))
  }

  test("encode matches a driver-side reference on multi-codepoint text") {
    // non-BMP code points (🜁 U+1F701) must split on code points, not chars
    val words = Seq("caé", "a🜁b", "café")
    val df = words.map(w => Tuple1(Seq(w))).toDF("toks")
    val merges = Seq(("a", "é"), ("c", "aé"))
    val got = df.select(Bpe.encode($"toks", merges).as("sub"))
      .as[Seq[String]].collect().toSeq
    got.zip(words).foreach { case (sub, w) => assert(sub.mkString == w) }
    // rank 0 fuses a+é, then rank 1 fuses c with the fused aé
    assert(got(0) == Seq("caé"))
    assert(got(1) == Seq("a", "🜁", "b"))
    // in "café" the é is NOT adjacent to a — nothing fuses
    assert(got(2) == Seq("c", "a", "f", "é"))
  }

  test("duplicate pair in the merge list keeps the stronger (earlier) rank") {
    val df = Seq(Tuple1(Seq("ab"))).toDF("toks")
    val merges = Seq(("a", "b"), ("a", "b"))
    val got = df.select(Bpe.encode($"toks", merges).as("sub"))
      .as[Seq[String]].collect().head
    assert(got == Seq("ab"))
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

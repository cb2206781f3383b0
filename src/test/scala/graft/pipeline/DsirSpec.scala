package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Md5Bucket
import graft.text.Dsir

/** Unit coverage for DSIR importance resampling: the hash-bucket kernel's
  * unsigned-mod semantics, a differential replay of the full weight
  * arithmetic against an independent in-memory implementation, and the
  * separation/selection behavior the operator exists for. */
class DsirSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dsir-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  test("Md5Bucket uses unsigned remainder of the 64-bit md5") {
    // Verify against BigInt arithmetic on the unsigned reinterpretation of
    // the signed long — i.e. DuckDB's UBIGINT % — over strings whose
    // md5-lower-64 covers both sign halves.
    val b = 1024
    for (s <- Seq("a", "b", "fox", "the quick", "zz9", "", "Ω unicode")) {
      val h = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val d = md.digest(s.getBytes("UTF-8"))
        var x = 0L
        var i = 15
        while (i >= 8) { x = (x << 8) | (d(i) & 0xffL); i -= 1 }
        x
      }
      val unsigned = (BigInt(h) & BigInt("ffffffffffffffff", 16)) % b
      assert(Md5Bucket.of(s, b) == unsigned.toInt, s"string '$s'")
    }
  }

  /** Independent replay: tokenize with a plain regex, hash via the kernel
    * helper, quantize with math.log — none of the Spark column machinery. */
  private def referenceWeights(
      raw: Seq[(Long, String)], target: Seq[(Long, String)],
      buckets: Int): Map[Long, (Long, Long)] = {
    def feats(text: String): Seq[Int] = {
      val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .trim.split("\\s+").filter(_.nonEmpty).toSeq
      val bigrams =
        if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
        else Seq.empty
      (toks ++ bigrams).map(Md5Bucket.of(_, buckets))
    }
    def counts(docs: Seq[(Long, String)]): Map[Int, Long] =
      docs.flatMap(d => feats(d._2)).groupBy(identity)
        .map { case (bkt, occ) => bkt -> occ.size.toLong }
    def lpMicro(cnt: Long, total: Long): Long =
      math.floor(math.log((cnt + 1).toDouble / (total + buckets).toDouble)
        * 1e6 + 0.5).toLong
    val tc = counts(target); val rc = counts(raw)
    val tTot = tc.values.sum; val rTot = rc.values.sum
    raw.map { case (id, text) =>
      val fs = feats(text)
      val lw = fs.map { bkt =>
        lpMicro(tc.getOrElse(bkt, 0L), tTot) - lpMicro(rc(bkt), rTot)
      }.sum
      id -> (fs.size.toLong, lw)
    }.toMap
  }

  test("importanceWeights matches an independent replay exactly") {
    val raw = Seq(
      (1L, "spark shuffles data across the cluster"),
      (2L, "le chat noir dort sur le tapis rouge"),
      (3L, "spark partitions data and the cluster computes"),
      (4L, "der hund läuft schnell durch den Wald"),
      (5L, ""),
      (6L, "one"))
    val target = Seq(
      (10L, "spark computes aggregates over partitions of data"),
      (11L, "the cluster shuffles partitions across executors"))
    val got = Dsir.importanceWeights(
        raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"),
        $"doc_id", $"text", buckets = 64)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = referenceWeights(raw, target, buckets = 64)
    assert(got == want)
    assert(got(5L) == (0L, 0L), "empty doc surfaces with zero features")
  }

  test("target-like documents outscore off-target ones; top-k selects them") {
    // Raw = 3 docs drawn from the target vocabulary + 3 from a disjoint
    // one. The in-vocabulary docs must all rank above the others.
    val raw = Seq(
      (1L, "alpha beta gamma delta alpha beta"),
      (2L, "epsilon zeta alpha beta gamma"),
      (3L, "gamma delta epsilon alpha"),
      (4L, "uno dos tres cuatro cinco seis"),
      (5L, "sept huit neuf dix onze douze"),
      (6L, "tredici quattordici quindici sedici"))
    val target = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "beta gamma delta alpha zeta epsilon"))
    val rawDf = raw.toDF("doc_id", "text")
    val targetDf = target.toDF("doc_id", "text")
    val w = Dsir.importanceWeights(rawDf, targetDf, $"doc_id", $"text",
        buckets = 256)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    for (in <- Seq(1L, 2L, 3L); out <- Seq(4L, 5L, 6L))
      assert(w(in) > w(out), s"doc $in should outscore doc $out: $w")
    val sel = Dsir.selectByImportance(rawDf, targetDf, $"doc_id", $"text",
        k = 3, buckets = 256)
      .select($"doc_id").as[Long].collect().toSet
    assert(sel == Set(1L, 2L, 3L))
  }

  test("klDivergence matches an independent full-smoothed-sum replay") {
    val raw = Seq(
      (1L, "spark shuffles data across the cluster"),
      (2L, "le chat noir dort sur le tapis"),
      (3L, "spark partitions data and computes"),
      (4L, "der hund läuft schnell"))
    val target = Seq(
      (10L, "spark computes aggregates over partitions"),
      (11L, "the cluster shuffles partitions"))
    val buckets = 64
    def feats(text: String): Seq[Int] = {
      val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .trim.split("\\s+").filter(_.nonEmpty).toSeq
      val bigrams =
        if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
        else Seq.empty
      (toks ++ bigrams).map(Md5Bucket.of(_, buckets))
    }
    def counts(docs: Seq[(Long, String)]): Map[Int, Long] =
      docs.flatMap(d => feats(d._2)).groupBy(identity)
        .map { case (b, o) => b -> o.size.toLong }
    def lp(c: Long, total: Long): Long =
      math.floor(math.log((c + 1).toDouble / (total + buckets).toDouble)
        * 1e6 + 0.5).toLong
    val tc = counts(target); val rc = counts(raw)
    val tTot = tc.values.sum; val rTot = rc.values.sum
    val union = tc.keySet ++ rc.keySet
    val observed = union.toSeq.map { b =>
      (tc.getOrElse(b, 0L) + 1) *
        (lp(tc.getOrElse(b, 0L), tTot) - lp(rc.getOrElse(b, 0L), rTot))
    }.sum
    val wantKl = observed +
      (buckets - union.size) * (lp(0, tTot) - lp(0, rTot))
    val got = Dsir.klDivergence(
        raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"),
        $"doc_id", $"text", buckets = buckets)
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((union.size.toLong, tTot, rTot, wantKl)))
    // Identical corpora: every per-bucket term and the never-seen term
    // cancel to a zero numerator.
    val self = Dsir.klDivergence(
        raw.toDF("doc_id", "text"), raw.toDF("doc_id", "text"),
        $"doc_id", $"text", buckets = buckets)
      .select($"kl_num_micro").as[Long].head()
    assert(self == 0L)
  }

  test("resampleByImportance matches an independent Gumbel-key replay") {
    val raw = Seq(
      (1L, "alpha beta gamma delta"), (2L, "uno dos tres cuatro"),
      (3L, "alpha gamma beta"), (4L, "cinco seis siete"),
      (5L, "beta delta alpha gamma beta"), (6L, "ocho nueve diez"))
    val target = Seq((10L, "alpha beta gamma delta"))
    val buckets = 64
    val want = referenceWeights(raw, target, buckets)
    def key(id: Long, salt: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(s"$salt|$id".getBytes("UTF-8"))
      var h = 0L
      var i = 15
      while (i >= 8) { h = (h << 8) | (d(i) & 0xffL); i -= 1 }
      val u = ((h >>> 11) + 0.5) / 9007199254740992.0
      want(id)._2 + math.floor(-math.log(-math.log(u)) * 1e6 + 0.5).toLong
    }
    for (salt <- Seq("s1", "s2")) {
      val got = Dsir.resampleByImportance(
          raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"),
          $"doc_id", $"text", k = 3, salt = salt, buckets = buckets)
        .select($"doc_id", $"key_micro").as[(Long, Long)].collect().toMap
      val expected = raw.map(_._1).map(id => id -> key(id, salt))
        .sortBy { case (id, k) => (-k, id) }.take(3).toMap
      assert(got == expected, s"salt $salt")
    }
  }

  test("the scoring join broadcasts the bucket-ratio table") {
    val raw = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val target = Seq((10L, "a b")).toDF("doc_id", "text")
    val plan = Dsir.importanceWeights(raw, target, $"doc_id", $"text",
        buckets = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"ratio table must broadcast:\n$plan")
  }
}

package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ann.Ann

/** Property coverage for the round-4 kernels: the URL regexes are total
  * and match a reference JVM implementation on arbitrary inputs; PQ
  * encode/ADC maintain their invariants on random vectors. Batched:
  * ScalaCheck generates inputs, ONE Spark job evaluates each batch. */
class KernelPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-kernel-props")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** Reference JVM implementation of Web.domainOf (same regexes via
    * java.util.regex — the semantics the Column version must match). */
  private def refDomain(url: String): String = {
    val m = java.util.regex.Pattern
      .compile("^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)")
      .matcher(url)
    val host = if (m.find()) m.group(1).toLowerCase else ""
    host.replaceFirst("^www\\.", "")
  }

  test("Web.domainOf is total and equals the JVM reference on arbitrary input") {
    val part = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("www.", "a@b", "spam.example.com", ":", "/", "?", "#", "://",
        "HTTPS://", "ftp", "日本", "''", " ", ""))
    val urlGen = Gen.listOfN(6, part).map(_.mkString)
    val urls = (1 to 400).flatMap(i => urlGen.sample).distinct
    val got = urls.toDF("url")
      .select($"url", graft.text.Web.domainOf($"url").as("d"))
      .as[(String, String)].collect().toMap
    urls.foreach { u =>
      assert(got(u) == refDomain(u), s"mismatch for input <$u>")
    }
  }

  test("PQ invariants: code range, ADC equals the naive driver computation") {
    val m = 4; val k = 8; val subDim = 4; val dim = m * subDim
    val books = Ann.pqCodebooks(m, k, subDim)
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-5.0, 5.0))
    val vecs = (1 to 200).flatMap(_ => vecGen.sample).map(_.toIndexedSeq)
    val query = vecGen.sample.get

    // naive reference: encode + ADC entirely on the driver
    def refEncode(v: Seq[Double]): Seq[Int] =
      (0 until m).map { j =>
        val sub = v.slice(j * subDim, (j + 1) * subDim)
        val d = books(j).map(c =>
          c.zip(sub).map { case (a, b) => (a - b) * (a - b) }.sum)
        d.indexOf(d.min)
      }
    def refAdc(codes: Seq[Int]): Double = {
      val raw = (0 until m).map { j =>
        val qsub = query.slice(j * subDim, (j + 1) * subDim)
        books(j)(codes(j)).zip(qsub).map { case (a, b) => (a - b) * (a - b) }.sum
      }.foldLeft(0.0)(_ + _)
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    val df = vecs.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat).toArray)
    }.toDF("vec_id", "v")
    val got = df.select($"vec_id", Ann.pqEncode($"v", books).as("codes"),
        Ann.pqAdcScore(Ann.pqEncode($"v", books), query, books).as("d"))
      .as[(Long, Seq[Int], Double)].collect()
    got.foreach { case (i, codes, d) =>
      assert(codes.length == m && codes.forall(c => c >= 0 && c < k),
        s"codes out of range for vec $i: $codes")
      assert(codes == refEncode(vecs(i.toInt)),
        s"encode mismatch for vec $i")
      assert(math.abs(d - refAdc(codes)) < 1e-9,
        s"ADC mismatch for vec $i: spark=$d ref=${refAdc(codes)}")
      assert(d >= 0.0, s"negative ADC for vec $i")
    }
  }

  test("nearest_centroid / quantize_milli kernels equal the HOF formulation") {
    // the kernels replaced interpreted HOF pipelines; arithmetic must be
    // BIT-identical (same fold order, first-min ties) — that identity is
    // what keeps every kmeans/PQ oracle valid
    val dim = 16; val k = 6
    val centGen = Gen.listOfN(dim, Gen.chooseNum(-3000.0, 3000.0))
    val cents = (1 to k).flatMap(_ => centGen.sample).map(_.toIndexedSeq)
    // include exact-duplicate centroids to exercise the first-min tie
    val centsTied = cents.updated(3, cents(1))
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-5.0, 5.0))
    val vecs = (1 to 300).flatMap(_ => vecGen.sample)
    val df = vecs.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat).toArray)
    }.toDF("vec_id", "v")
    val hofQuant = transform($"v", x =>
      floor(x.cast("double") * lit(1000.0) + lit(0.5)).cast("double"))
    val centsLit = typedLit(centsTied.map(_.toIndexedSeq).toIndexedSeq)
    val hofDists = transform(centsLit, c =>
      aggregate(zip_with(hofQuant, c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))
    val got = df.select($"vec_id",
        Ann.quantizeMilli($"v").as("kq"), hofQuant.as("hq"),
        graft.functions.exprs.nearest_centroid(
          Ann.quantizeMilli($"v"), centsTied).as("nc"),
        (array_position(hofDists, array_min(hofDists)) - 1).cast("int").as("hidx"),
        array_min(hofDists).as("hdist"))
      .select($"vec_id", $"kq", $"hq", $"nc.idx", $"nc.dist", $"hidx", $"hdist")
      .as[(Long, Seq[Double], Seq[Double], Int, Double, Int, Double)].collect()
    got.foreach { case (i, kq, hq, kidx, kdist, hidx, hdist) =>
      assert(kq == hq, s"quantize mismatch for vec $i")
      assert(kidx == hidx, s"argmin mismatch for vec $i: kernel=$kidx hof=$hidx")
      assert(kdist == hdist, s"dist mismatch for vec $i: kernel=$kdist hof=$hdist")
    }
    // explicit tie: a vector exactly on duplicate centroids 1 and 3 must
    // pick the FIRST (index 1)
    val tied = Seq((0L, centsTied(1).map(x => (x / 1000.0).toFloat).toArray))
      .toDF("vec_id", "v")
    val t = tied.select(graft.functions.exprs.nearest_centroid(
      Ann.quantizeMilli($"v"), centsTied).getField("idx")).as[Int].head()
    assert(t == 1, s"first-min tie must pick index 1, got $t")
  }

  test("mat_vec kernel equals the HOF formulation on random matrices") {
    // same bit-identity contract as nearest_centroid: per-row products
    // accumulate left-to-right from 0.0, so the q_ann_rp oracle's
    // list_sum replay stays valid
    val dim = 12; val out = 7
    val rowGen = Gen.listOfN(dim, Gen.chooseNum(-9.0, 9.0))
    val mat = (1 to out).flatMap(_ => rowGen.sample).map(_.toIndexedSeq)
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-5.0, 5.0))
    val vecs = (1 to 300).flatMap(_ => vecGen.sample)
    val df = vecs.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat).toArray)
    }.toDF("vec_id", "v")
    val matLit = typedLit(mat.toIndexedSeq)
    val hof = transform(matLit, r =>
      aggregate(zip_with(r, $"v".cast("array<double>"), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x))
    val diff = df.select(
        graft.functions.exprs.mat_vec($"v", mat).as("a"), hof.as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(diff == 0)
  }

  test("nearest_centroids (top-n) equals sort-by-(dist,idx) on random input") {
    // the multi-probe kernel's bounded insertion sort must reproduce the
    // full (dist asc, idx asc) order for every prefix length n, and its
    // head must equal the single-nearest kernel
    val dim = 8; val k = 7
    val centGen = Gen.listOfN(dim, Gen.chooseNum(-2000.0, 2000.0))
    val cents0 = (1 to k).flatMap(_ => centGen.sample).map(_.toIndexedSeq)
    val cents = cents0.updated(4, cents0(2)) // duplicate → idx ties
    val vecGen = Gen.listOfN(dim, Gen.chooseNum(-4.0, 4.0))
    val vecs = (1 to 200).flatMap(_ => vecGen.sample)
    val df = vecs.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat).toArray)
    }.toDF("vec_id", "v")
    for (n <- Seq(1, 3, k)) {
      val got = df.select($"vec_id", $"v",
          graft.functions.exprs.nearest_centroids(
            Ann.quantizeMilli($"v"), cents, n).as("cs"))
        .as[(Long, Seq[Float], Seq[Int])].collect()
      got.foreach { case (i, v, cs) =>
        val q = v.map(x => math.floor(x.toDouble * 1000.0 + 0.5))
        val ref = cents.zipWithIndex.map { case (c, ci) =>
          var acc = 0.0
          var j = 0
          while (j < dim) { val d = q(j) - c(j); acc += d * d; j += 1 }
          (acc, ci)
        }.sortBy(identity).take(n).map(_._2)
        assert(cs == ref, s"vec $i n=$n: kernel=$cs ref=$ref")
      }
    }
  }

  test("Md5Bucket/Md5Lower64: unsigned-mod and bit identity on arbitrary strings") {
    val strGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(24)),
      Gen.oneOf("", " ", "ő", "日本語テキスト", "a|b|c", "\u0000x", "🙂🙃"),
      Gen.listOfN(8, Gen.choose(32.toChar, 0x2FFF.toChar)).map(_.mkString))
    val cases = (1 to 300).flatMap(_ => strGen.sample).distinct
    val buckets = Seq(1, 2, 7, 64, 1024, 65536)
    for (s <- cases) {
      val h = graft.functions.Md5Lower64(null)
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      // Reference: unsigned reinterpretation via BigInt (= DuckDB UBIGINT)
      val unsigned = BigInt(h) & ((BigInt(1) << 64) - 1)
      // The raw md5 digest bytes 8..15 little-endian, independently
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(s.getBytes("UTF-8"))
      val ref = (8 to 15).foldRight(BigInt(0))((i, acc) =>
        (acc << 8) | BigInt(d(i) & 0xff))
      assert(unsigned == ref, s"string '$s'")
      for (b <- buckets)
        assert(graft.functions.Md5Bucket.of(s, b) == (unsigned % b).toInt,
          s"string '$s' buckets $b")
    }
  }

  test("symmetric-delete EXACT RECALL: edited pairs always share a variant") {
    // the soundness claim editDistancePairs rests on: apply <= d random
    // edits (insert/delete/substitute) to a random string; the pair must
    // share a <= d-deletion variant, whatever the edit mix
    val rng = new scala.util.Random(20260814)
    val alpha = "abcde" // small alphabet → frequent repeats/collisions
    def randStr(n: Int) = (1 to n).map(_ => alpha(rng.nextInt(5))).mkString
    def edit(s: String): String = {
      val kind = rng.nextInt(3)
      if (kind == 0 && s.nonEmpty) { // delete
        val i = rng.nextInt(s.length); s.substring(0, i) + s.substring(i + 1)
      } else if (kind == 1) { // insert
        val i = rng.nextInt(s.length + 1)
        s.substring(0, i) + alpha(rng.nextInt(5)) + s.substring(i)
      } else if (s.nonEmpty) { // substitute
        val i = rng.nextInt(s.length)
        s.substring(0, i) + alpha(rng.nextInt(5)) + s.substring(i + 1)
      } else s
    }
    val d = 2
    val cases = (1 to 300).map { _ =>
      val a = randStr(2 + rng.nextInt(12))
      var b = a
      (1 to rng.nextInt(d + 1)).foreach(_ => b = edit(b))
      (a, b)
    }
    val rows = cases.toDF("a", "b").select(
        graft.functions.exprs.deletion_neighborhood($"a", d).as("na"),
        graft.functions.exprs.deletion_neighborhood($"b", d).as("nb"),
        $"a", $"b")
      .select($"a", $"b", size(array_intersect($"na", $"nb")).as("n"))
      .as[(String, String, Int)].collect()
    rows.foreach { case (a, b, n) =>
      assert(n > 0, s"pair within $d edits shares no variant: <$a> <$b>")
    }
  }

  test("winnowing guarantee: shared run >= k+w-1 chars => shared fingerprint") {
    val rng = new scala.util.Random(42)
    val words = Seq("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def salad(n: Int) = (1 to n).map(_ => words(rng.nextInt(words.length))).mkString(" ")
    val k = 8; val w = 4 // guarantee threshold: 11 normalized chars
    val cases = (1 to 150).map { _ =>
      val shared = salad(4 + rng.nextInt(6)) // >= 11 chars normalized
      (s"${salad(rng.nextInt(8))} $shared ${salad(rng.nextInt(8))}".trim,
        s"${salad(rng.nextInt(8))} $shared ${salad(rng.nextInt(8))}".trim)
    }
    val viol = cases.toDF("a", "b").select(
        size(array_intersect(
          transform(graft.functions.exprs.winnow_fingerprints($"a", k, w),
            f => f.getField("hash")),
          transform(graft.functions.exprs.winnow_fingerprints($"b", k, w),
            f => f.getField("hash")))).as("n"))
      .filter($"n" === 0).count()
    assert(viol == 0, s"$viol pairs with a shared >=${k + w - 1}-char run share no fingerprint")
  }

  test("aho-corasick equals per-phrase contains on random small-alphabet input") {
    val rng = new scala.util.Random(7)
    def s(n: Int) = (1 to n).map(_ => "ab" (rng.nextInt(2))).mkString
    val phrases = (1 to 12).map(_ => s(1 + rng.nextInt(4))).distinct
    val texts = (1 to 400).map(_ => s(rng.nextInt(24)))
    val diff = texts.toDF("t").select(
        graft.functions.exprs.matched_phrases($"t", phrases).as("a"),
        filter(typedLit(phrases), p => $"t".contains(p)).as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(diff == 0)
  }

  test("ColMath.floorDiv equals Math.floorDiv over the full long domain") {
    // the bucket-id arithmetic intervalOverlapJoin/packSequences ride on:
    // double division mis-rounds above 2^53 and SQL div truncates toward
    // zero — floorDiv must match java.lang.Math.floorDiv everywhere
    val edge = Seq(Long.MinValue, Long.MinValue + 1, -(1L << 54) - 3,
      -(1L << 53), -1L, 0L, 1L, (1L << 53) + 1, Long.MaxValue)
    val gen = Gen.oneOf(Gen.chooseNum(Long.MinValue, Long.MaxValue), Gen.oneOf(edge))
    val divisors = Seq(1L, 2L, 3L, 512L, 3600L * 1000000L, (1L << 53) + 5)
    val prop = Prop.forAll(Gen.listOfN(50, gen)) { xs =>
      val df = xs.toDF("x")
      divisors.forall { w =>
        val got = df.select(graft.ops.ColMath.floorDiv(col("x"), w))
          .as[Long].collect().toSeq
        got == xs.map(java.lang.Math.floorDiv(_, w))
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("mixCorpus with one full-weight source keeps every row in epoch 0") {
    val df = (1L to 500L).map(i => (i, "only")).toDF("id", "src")
    val mix = graft.ops.Sampling.mixCorpus(
      df, col("id"), col("src"), weights = Map("only" -> 1.0))
    assert(mix.count() == 500L)
    assert(mix.select(col("epoch")).distinct().as[Long].collect().toSeq == Seq(0L))
  }

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }
}

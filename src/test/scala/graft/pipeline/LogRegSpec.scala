package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Md5Bucket
import graft.text.{LogReg, LogRegModel}

/** Unit coverage for the hashed-n-gram logistic-regression quality
  * classifier: exact differential replay of the integer-quantized GD
  * against an independent in-memory implementation, learning behavior on a
  * separable fixture, and the scoring plan shape. */
class LogRegSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-logreg-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }

  private def feats(text: String, buckets: Int): Seq[Int] = {
    val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .trim.split("\\s+").filter(_.nonEmpty).toSeq
    val bigrams =
      if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toSeq
      else Seq.empty
    (toks ++ bigrams).map(Md5Bucket.of(_, buckets))
  }

  /** Independent replay of [[LogReg.fit]]: plain Scala maps, math.exp,
    * truncating integer division — none of the Spark column machinery. */
  private def referenceFit(
      pos: Seq[(Long, String)], neg: Seq[(Long, String)], buckets: Int,
      iters: Int, etaMilli: Long): LogRegModel = {
    val labeled = pos.map { case (id, t) => (id, t, 1L) } ++
      neg.map { case (id, t) => (id, t, 0L) }
    val tf: Map[Long, Map[Int, Long]] = labeled.map { case (id, t, _) =>
      id -> feats(t, buckets).groupBy(identity)
        .map { case (b, o) => b -> o.size.toLong }
    }.toMap
    val n = labeled.size.toLong
    var w = Map.empty[Int, Long]
    var b = 0L
    for (_ <- 0 until iters) {
      val resid: Map[Long, Long] = labeled.map { case (id, _, y) =>
        val dot = tf(id).iterator
          .map { case (bkt, c) => c * w.getOrElse(bkt, 0L) }.sum
        val sigma = 1.0 / (1.0 + math.exp(-((dot + b).toDouble / 1e6)))
        id -> math.floor((y.toDouble - sigma) * 1e6 + 0.5).toLong
      }.toMap
      val g = labeled.flatMap { case (id, _, _) =>
        tf(id).map { case (bkt, c) => bkt -> c * resid(id) }
      }.groupBy(_._1).map { case (bkt, xs) => bkt -> xs.map(_._2).sum }
      val g0 = resid.values.sum
      w = (w.keySet ++ g.keySet).iterator.map { bkt =>
        bkt -> (w.getOrElse(bkt, 0L) +
          etaMilli * g.getOrElse(bkt, 0L) / (1000L * n))
      }.toMap
      b += etaMilli * g0 / (1000L * n)
    }
    LogRegModel(buckets, b, w)
  }

  private val pos = Seq(
    (1L, "alpha beta gamma delta alpha"),
    (2L, "beta gamma delta epsilon beta gamma"),
    (3L, "gamma alpha epsilon delta"))
  private val neg = Seq(
    (11L, "uno dos tres cuatro cinco"),
    (12L, "seis siete ocho nueve uno dos"),
    (13L, "diez once doce trece"),
    (14L, ""))

  test("fit matches an independent replay exactly") {
    val got = LogReg.fit(pos.toDF("doc_id", "text"), neg.toDF("doc_id", "text"),
      $"doc_id", $"text", buckets = 128, iters = 3, etaMilli = 500)
    val want = referenceFit(pos, neg, buckets = 128, iters = 3, etaMilli = 500)
    assert(got.interceptMicro == want.interceptMicro)
    assert(got.weightsMicro == want.weightsMicro)
  }

  test("the trained model separates the two vocabularies") {
    val model = LogReg.fit(pos.toDF("doc_id", "text"), neg.toDF("doc_id", "text"),
      $"doc_id", $"text", buckets = 128, iters = 8, etaMilli = 900)
    val margins = LogReg.score(
        (pos ++ neg).toDF("doc_id", "text"), $"doc_id", $"text", model)
      .select($"doc_id", $"margin_micro").as[(Long, Long)].collect().toMap
    for ((id, _) <- pos; (nid, _) <- neg)
      assert(margins(id) > margins(nid),
        s"positive $id must outscore negative $nid: $margins")
    // A new doc scores intercept + Σ tf·w over its hashed buckets (bucket
    // collisions with trained features included — verify against the model).
    val unseen = LogReg.score(Seq((99L, "xyzzy plugh"))
        .toDF("doc_id", "text"), $"doc_id", $"text", model)
      .select($"margin_micro").as[Long].head()
    val expected = model.interceptMicro +
      feats("xyzzy plugh", 128).map(b => model.weightsMicro.getOrElse(b, 0L)).sum
    assert(unseen == expected)
  }

  test("empty-text documents score the intercept with zero features") {
    val model = LogRegModel(64, 42L, Map(1 -> 10L))
    val got = LogReg.score(Seq((7L, "")).toDF("doc_id", "text"),
        $"doc_id", $"text", model)
      .as[(Long, Long, Long)].head()
    assert(got == ((7L, 0L, 42L)))
  }

  test("scoring broadcasts the weight table") {
    val model = LogRegModel(64, 0L, Map(1 -> 10L, 2 -> -5L))
    val plan = LogReg.score(Seq((1L, "a b c")).toDF("doc_id", "text"),
        $"doc_id", $"text", model)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weight table must broadcast:\n$plan")
  }
}

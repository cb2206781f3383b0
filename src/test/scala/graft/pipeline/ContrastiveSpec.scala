package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Contrastive

/** Deterministic negative sampling. */
class ContrastiveSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-contrastive-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val pos = Seq((0L, 1L), (0L, 2L), (1L, 0L), (2L, 5L))
    .toDF("q", "p")

  test("k negatives per query, none positive, none duplicated, rank 1..k") {
    val out = Contrastive.sampleNegatives(pos, $"q", $"p",
        corpusSize = 100, k = 4)
      .as[(Long, Long, Long)].collect().toSeq
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(0L, 1L, 2L))
    val positives = Map(0L -> Set(1L, 2L), 1L -> Set(0L), 2L -> Set(5L))
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 4, s"q=$q got ${rows.length} negatives")
      assert(rows.map(_._3).sorted == Seq(1L, 2L, 3L, 4L))
      val negs = rows.map(_._2)
      assert(negs.distinct.length == negs.length, s"q=$q duplicates: $negs")
      assert(negs.forall(n => !positives(q).contains(n)), s"q=$q hit a positive")
      assert(negs.forall(n => n >= 0 && n < 100))
    }
  }

  test("rerun-stable: identical output across invocations") {
    def run() = Contrastive.sampleNegatives(pos, $"q", $"p", 100, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(run() == run())
  }

  test("salt changes the draw") {
    val a = Contrastive.sampleNegatives(pos, $"q", $"p", 1000, 5, salt = "s1")
      .as[(Long, Long, Long)].collect().toSet
    val b = Contrastive.sampleNegatives(pos, $"q", $"p", 1000, 5, salt = "s2")
      .as[(Long, Long, Long)].collect().toSet
    assert(a != b)
  }

  test("shortfall surfaces as fewer rows, never a repeated negative") {
    // corpus of 3 ids, 2 of them positive for q=0 -> at most 1 negative
    val tight = Seq((0L, 0L), (0L, 1L)).toDF("q", "p")
    val out = Contrastive.sampleNegatives(tight, $"q", $"p",
        corpusSize = 3, k = 5, oversample = 8)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.length <= 1)
    out.foreach { case (_, n, _) => assert(n == 2L) }
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

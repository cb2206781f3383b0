package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Hybrid

/** Reciprocal-rank fusion semantics. */
class HybridSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-hybrid-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("rrfFuse: both-list docs beat single-list docs at equal ranks") {
    val lex = Seq((1L, 5.0), (2L, 4.0), (3L, 3.0)).toDF("id", "s")
    val vec = Seq((1L, 0.9), (4L, 0.8), (5L, 0.7)).toDF("id", "s")
    val out = Hybrid.rrfFuse(lex, vec, k = 5, c = 60)
      .select($"id", $"lex_rank", $"vec_rank", $"rrf")
      .as[(Long, Option[Long], Option[Long], Double)].collect()
    // doc 1 is rank 1 in both lists: rrf = 2/61
    assert(out.head._1 == 1L &&
      out.head._2 == Some(1L) && out.head._3 == Some(1L))
    assert(math.abs(out.head._4 - math.rint(2.0 / 61.0 * 1e6) / 1e6) < 1e-9)
    // singles: rank-2 entries (2 and 4) tie at 1/62, id ascending
    val ids = out.map(_._1).toSeq
    assert(ids == Seq(1L, 2L, 4L, 3L, 5L))
  }

  test("rrfFuse: score ties rank by id ascending") {
    val lex = Seq((7L, 1.0), (3L, 1.0)).toDF("id", "s")
    val vec = Seq.empty[(Long, Double)].toDF("id", "s")
    val out = Hybrid.rrfFuse(lex, vec, k = 2, c = 60)
      .select($"id", $"lex_rank").as[(Long, Long)].collect().toSeq
    assert(out == Seq((3L, 1L), (7L, 2L)))
  }

  test("rrfFuse: k truncates the fused list") {
    val lex = (1L to 10L).map(i => (i, 100.0 - i)).toDF("id", "s")
    val vec = Seq.empty[(Long, Double)].toDF("id", "s")
    assert(Hybrid.rrfFuse(lex, vec, k = 4).count() == 4)
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

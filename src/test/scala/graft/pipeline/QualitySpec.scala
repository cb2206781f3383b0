package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Anomaly, Expect}

/** Expectation checks and exact z-score outliers. */
class QualitySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-quality-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val df = Seq(
    (1L, 10, Some("a")), (2L, -5, Some("b")), (3L, 7, None)
  ).toDF("id", "v", "s")

  test("check: per-expectation violation counts in one pass; null fails") {
    val rep = Expect.check(df, Seq(
        "v_positive" -> ($"v" > 0),
        "s_present" -> $"s".isNotNull,
        "id_unique_enough" -> ($"id" <= 3)))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rep("v_positive") == ((3L, 1L, false)))
    assert(rep("s_present") == ((3L, 1L, false)))
    assert(rep("id_unique_enough") == ((3L, 0L, true)))
    // null predicate result (s-dependent check on a null row) violates
    val nullRep = Expect.check(df, Seq("s_is_a" -> ($"s" === "a")))
      .as[(String, Long, Long, Boolean)].head()
    assert(nullRep._3 == 2L) // "b" fails, null fails conservatively
  }

  test("check names with quotes/backticks/dots are data, not SQL") {
    val rep = Expect.check(df, Seq(
        "customer's `id`.present" -> $"id".isNotNull,
        "v > 0 -- or 1=1" -> ($"v" > 0)))
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rep("customer's `id`.present") == ((3L, 0L, true)))
    assert(rep("v > 0 -- or 1=1") == ((3L, 1L, false)))
  }

  test("enforce throws listing every failing expectation") {
    val e = intercept[IllegalArgumentException] {
      Expect.enforce(df, Seq(
        "v_positive" -> ($"v" > 0), "ok" -> $"id".isNotNull))
    }
    assert(e.getMessage.contains("v_positive (1 rows)"))
    assert(!e.getMessage.contains("ok ("))
    // all-pass returns the report
    assert(Expect.enforce(df, Seq("ok" -> $"id".isNotNull)).count() == 1)
  }

  test("zScoreOutliers matches the naive float computation on a planted tail") {
    val values = (Seq.fill(200)(100L) ++ Seq.fill(200)(110L) :+ 10000L)
    val data = values.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
      .toDF("id", "g", "v")
    val got = Anomaly.zScoreOutliers(data, $"g", $"v", z = 3)
      .select($"v").as[Long].collect().toSeq
    assert(got == Seq(10000L))
    // zero-variance group flags nothing
    val flat = (1 to 10).map(i => (i.toLong, "z", 5L)).toDF("id", "g", "v")
    assert(Anomaly.zScoreOutliers(flat, $"g", $"v", 3).count() == 0)
    // single-row group flags nothing (variance undefined -> 0 > 0 false)
    val one = Seq((1L, "o", 42L)).toDF("id", "g", "v")
    assert(Anomaly.zScoreOutliers(one, $"g", $"v", 3).count() == 0)
  }

  test("zScoreOutliers is exact at the boundary (no float ulps)") {
    // group {0, 0, 0, 4}: mean 1, var 3 -> sigma = sqrt(3);
    // |4-1| = 3 = z*sigma for z^2*var = 3 -> test z=1: 9 > 1*12? no...
    // construct exact: values {0,2} mean 1 var 1; |2-1|=1 = 1*sigma
    // strict > must NOT flag the exact boundary
    val d = Seq((1L, "g", 0L), (2L, "g", 2L)).toDF("id", "g", "v")
    assert(Anomaly.zScoreOutliers(d, $"g", $"v", z = 1).count() == 0)
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

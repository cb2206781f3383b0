package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Temporal

/** Unit coverage for the temporal join operators (as-of, range join). */
class TemporalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-temporal-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // quotes: (key, time, quote_id, px); trades: (key, time, trade_id)
  private lazy val quotes = Seq(
    (1L, 10L, 100L, 1.0),
    (1L, 20L, 101L, 2.0),
    (1L, 20L, 102L, 3.0), // tie on time with 101 — larger id wins
    (1L, 30L, 103L, 4.0),
    (2L, 15L, 200L, 9.0)
  ).toDF("key", "t", "quote_id", "px")

  private lazy val trades = Seq(
    (1L, 5L, 1000L),  // before any quote -> null
    (1L, 20L, 1001L), // equal time -> inclusive, tie-break to 102
    (1L, 25L, 1002L), // between -> 102
    (1L, 99L, 1003L), // after all -> 103
    (2L, 15L, 2000L), // other key, equal time -> 200
    (3L, 50L, 3000L)  // key with no quotes -> null
  ).toDF("key", "t", "trade_id")

  test("asofJoin picks latest right row at or before left time, ties by tieBreak") {
    val out = Temporal.asofJoin(
      trades, "key", "t", quotes, "key", "t",
      payload = Seq("quote_id", "px"), tieBreak = "quote_id")
    val byTrade = out.collect()
      .map(r => r.getAs[Long]("trade_id") ->
        (Option(r.getAs[java.lang.Long]("asof_quote_id")), Option(r.getAs[java.lang.Double]("asof_px"))))
      .toMap
    assert(byTrade(1000L) == ((None, None)))
    assert(byTrade(1001L) == ((Some(102L), Some(3.0))))
    assert(byTrade(1002L) == ((Some(102L), Some(3.0))))
    assert(byTrade(1003L) == ((Some(103L), Some(4.0))))
    assert(byTrade(2000L) == ((Some(200L), Some(9.0))))
    assert(byTrade(3000L) == ((None, None)))
    assert(out.count() == trades.count()) // exactly one output row per left row
  }

  test("asofJoin tolerance drops matches older than the bound") {
    val out = Temporal.asofJoin(
      trades, "key", "t", quotes, "key", "t",
      payload = Seq("quote_id"), tieBreak = "quote_id",
      tolerance = Some(10L))
    val byTrade = out.collect()
      .map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Long]("asof_quote_id"))).toMap
    assert(byTrade(1001L) == Some(102L)) // gap 0 <= 10
    assert(byTrade(1002L) == Some(102L)) // gap 5 <= 10
    assert(byTrade(1003L) == None)       // gap 69 > 10 -> dropped
    assert(byTrade(2000L) == Some(200L)) // gap 0
    assert(byTrade(1000L) == None && byTrade(3000L) == None)
    assert(out.count() == trades.count())
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(trades, "key", "t", quotes, "key", "t",
        payload = Seq("quote_id"), tieBreak = "quote_id", tolerance = Some(-1L))
    }
  }

  test("asofJoin ignores right rows with a NULL time") {
    // a null-time quote sorts before every trade (nulls first) and would
    // wrongly win last(ignoreNulls) if not filtered out
    val q = Seq(
      (Some(1L), Option.empty[Long], Some(700L)),
      (Some(2L), Some(10L), Some(701L))
    ).toDF("key", "t", "quote_id")
    val tr = Seq((1L, 50L, 1L), (2L, 50L, 2L)).toDF("key", "t", "trade_id")
    val out = Temporal.asofJoin(tr, "key", "t", q, "key", "t",
      payload = Seq("quote_id"), tieBreak = "quote_id")
    val byTrade = out.collect()
      .map(r => r.getAs[Long]("trade_id") -> Option(r.getAs[java.lang.Long]("asof_quote_id")))
      .toMap
    assert(byTrade(1L).isEmpty, "NULL-time right row must never match")
    assert(byTrade(2L).contains(701L))
  }

  test("asofJoin breaks ties by a string tieBreak in native ordering") {
    // a cast-to-long tie-break would null out the strings and pick
    // nondeterministically; native ordering must pick "b" over "a"
    val q = Seq((1L, 10L, "a", 1.0), (1L, 10L, "b", 2.0)).toDF("key", "t", "qid", "px")
    val tr = Seq((1L, 20L, 1L)).toDF("key", "t", "trade_id")
    val out = Temporal.asofJoin(tr, "key", "t", q, "key", "t",
      payload = Seq("qid", "px"), tieBreak = "qid")
    val row = out.collect().head
    assert(row.getAs[String]("asof_qid") == "b")
    assert(row.getAs[Double]("asof_px") == 2.0)
  }

  test("asofJoin plans a single shuffle and no join node") {
    val out = Temporal.asofJoin(
      trades, "key", "t", quotes, "key", "t",
      payload = Seq("quote_id"), tieBreak = "quote_id")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected no join node:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly one shuffle:\n$plan")
  }

  test("rangeJoin matches inclusive bounds across bucket boundaries") {
    // intervals chosen to span 1, 2 and 3 buckets of width 10
    val intervals = Seq(
      (1L, 100L, 5L, 9L),   // inside one bucket
      (2L, 200L, 8L, 21L),  // spans three buckets
      (3L, 300L, 40L, 40L)  // degenerate single-point interval
    ).toDF("ikey", "interval_id", "lo", "hi")
    val points = Seq(
      (1L, 5L, 500L),  // at lo -> match interval 100
      (1L, 9L, 501L),  // at hi -> match interval 100
      (1L, 10L, 502L), // outside -> no match
      (2L, 21L, 503L), // at hi in third bucket -> match 200
      (2L, 22L, 504L), // past hi, same bucket -> no match
      (3L, 40L, 505L), // exact point -> match 300
      (9L, 8L, 506L)   // key mismatch -> no match
    ).toDF("pkey", "pt", "point_id")
    val out = Temporal.rangeJoin(
      intervals, "lo", "hi", points, "pt",
      bucketWidth = 10L, keys = Some(("ikey", "pkey")))
    val pairs = out.select($"interval_id", $"point_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 500L), (100L, 501L), (200L, 503L), (300L, 505L)))
  }

  test("rangeJoin emits no duplicate pairs for multi-bucket intervals") {
    val intervals = Seq((1L, 1L, 0L, 35L)).toDF("ikey", "interval_id", "lo", "hi")
    val points = Seq((1L, 17L, 7L)).toDF("pkey", "pt", "point_id")
    val out = Temporal.rangeJoin(intervals, "lo", "hi", points, "pt",
      bucketWidth = 10L, keys = Some(("ikey", "pkey")))
    assert(out.count() == 1)
  }

  test("rangeJoin without keys joins on bucket only, and plans no cartesian") {
    val intervals = Seq((1L, 0L, 9L), (2L, 100L, 109L)).toDF("interval_id", "lo", "hi")
    val points = Seq((5L, 50L), (105L, 51L)).toDF("pt", "point_id")
    val out = Temporal.rangeJoin(intervals, "lo", "hi", points, "pt", bucketWidth = 10L)
    val pairs = out.select($"interval_id", $"point_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 50L), (2L, 51L)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join:\n$plan")
  }

  test("rangeJoin rejects colliding column names") {
    val l = Seq((1L, 2L, 3L)).toDF("id", "lo", "hi")
    val r = Seq((1L, 2L)).toDF("id", "pt")
    val e = intercept[IllegalArgumentException] {
      Temporal.rangeJoin(l, "lo", "hi", r, "pt", 10L)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("intervalOverlapJoin == brute-force overlap, exactly once per pair") {
    // spans crossing many buckets (width 10): duplicates would surface
    val left = Seq((1L, 0L, 35L), (2L, 40L, 45L), (3L, 90L, 95L))
      .toDF("lid", "lo_a", "hi_a")
    val right = Seq((10L, 30L, 60L), (11L, 44L, 44L), (12L, 96L, 99L))
      .toDF("rid", "lo_b", "hi_b")
    val got = graft.ops.Temporal.intervalOverlapJoin(
        left, "lo_a", "hi_a", right, "lo_b", "hi_b", bucketWidth = 10L)
      .select($"lid", $"rid").as[(Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
    val brute = (for {
      (l, llo, lhi) <- Seq((1L, 0L, 35L), (2L, 40L, 45L), (3L, 90L, 95L))
      (r, rlo, rhi) <- Seq((10L, 30L, 60L), (11L, 44L, 44L), (12L, 96L, 99L))
      if llo <= rhi && rlo <= lhi
    } yield (l, r)).toSet
    assert(got.keySet == brute, s"got ${got.keySet} want $brute")
    assert(got.values.forall(_ == 1), s"pairs must appear exactly once: $got")
  }

  test("intervalOverlapJoin: touching endpoints overlap (closed intervals)") {
    val l = Seq((1L, 0L, 10L)).toDF("lid", "lo_a", "hi_a")
    val r = Seq((2L, 10L, 20L), (3L, 11L, 20L)).toDF("rid", "lo_b", "hi_b")
    val got = graft.ops.Temporal.intervalOverlapJoin(
        l, "lo_a", "hi_a", r, "lo_b", "hi_b", bucketWidth = 7L)
      .select($"rid").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("intervalOverlapJoin keys restrict pairs; plan has no cartesian") {
    val l = Seq((1L, "x", 0L, 10L), (2L, "y", 0L, 10L)).toDF("lid", "lk", "lo_a", "hi_a")
    val r = Seq((9L, "x", 5L, 15L)).toDF("rid", "rk", "lo_b", "hi_b")
    val joined = graft.ops.Temporal.intervalOverlapJoin(
      l, "lo_a", "hi_a", r, "lo_b", "hi_b", bucketWidth = 8L,
      keys = Some(("lk", "rk")))
    assert(joined.select($"lid").as[Long].collect().toSeq == Seq(1L))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), s"no cartesian expected:\n$plan")
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

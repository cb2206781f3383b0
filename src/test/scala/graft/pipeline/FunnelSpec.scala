package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Funnel, Packing}

/** Event-sequence analytics: ordered funnels, cohort retention, and the
  * stride training schedule. */
class FunnelSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-funnel-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("funnel: steps must complete strictly in order") {
    val events = Seq(
      // user 1 completes all three in order
      (1L, ts(10), "view"), (1L, ts(20), "click"), (1L, ts(30), "purchase"),
      // user 2's purchase PRECEDES the click -> only 2 steps count
      (2L, ts(10), "view"), (2L, ts(40), "click"), (2L, ts(20), "purchase"),
      // user 3 never views -> absent from the funnel entirely
      (3L, ts(10), "click"), (3L, ts(20), "purchase"),
      // user 4: click before view doesn't count; later click does
      (4L, ts(10), "click"), (4L, ts(20), "view"), (4L, ts(30), "click")
    ).toDF("u", "t", "a")
    val out = Funnel.funnel(events, $"u", $"t", $"a",
        Seq("view", "click", "purchase"))
      .select($"user", unix_micros($"t_1"), unix_micros($"t_2"),
        unix_micros($"t_3"), $"steps_completed")
      .as[(Long, Long, Option[Long], Option[Long], Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    def us(s: Long) = s * 1000000L
    assert(out(1L) == ((us(10), Some(us(20)), Some(us(30)), 3)))
    assert(out(2L) == ((us(10), Some(us(40)), None, 2)))
    assert(!out.contains(3L))
    assert(out(4L) == ((us(20), Some(us(30)), None, 2)))
  }

  test("funnelCounts: prefix counts, zero rows kept") {
    val events = Seq(
      (1L, ts(10), "view"), (1L, ts(20), "click"),
      (2L, ts(10), "view")
    ).toDF("u", "t", "a")
    val out = Funnel.funnelCounts(events, $"u", $"t", $"a",
        Seq("view", "click", "purchase"))
      .as[(Int, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "view", 2L), (2, "click", 1L),
      (3, "purchase", 0L)))
  }

  test("retentionCohorts: triangle counts by first-activity period") {
    val day = 86400L
    val events = Seq(
      // user 1 first in period 0 (days 0-6), active periods 0,1,2
      (1L, ts(1 * day)), (1L, ts(8 * day)), (1L, ts(15 * day)),
      // user 2 first in period 0, active 0 only (two events same period)
      (2L, ts(2 * day)), (2L, ts(3 * day)),
      // user 3 first in period 1, active 1,2
      (3L, ts(8 * day)), (3L, ts(14 * day))
    ).toDF("u", "t")
    val out = Funnel.retentionCohorts(events, $"u", $"t", periodDays = 7)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("strideSchedule: weights set appearance frequency, order deterministic") {
    // shard A weight 2, shard B weight 1, 6 seqs each
    val seqs = (for (s <- Seq("A", "B"); k <- 0L until 6L) yield (s, k))
      .toDF("shard", "seq_id")
    val out = Packing.strideSchedule(seqs, $"shard", $"seq_id",
        Map("A" -> 2.0, "B" -> 1.0))
      .orderBy($"step")
      .as[(Long, String, Long, Double)].collect().toSeq
    // A at vt 0.5,1,1.5,2,2.5,3; B at 1,2,3,4,5,6 -> prefix is A-heavy 2:1
    assert(out.map(_._2).take(3) == Seq("A", "A", "B"))
    // every A pair straddles at most one B in any window: check the
    // full interleave is the stride order (vt ascending, ties A first)
    val vts = out.map(_._4)
    assert(vts == vts.sorted)
    // steps contiguous from 1
    assert(out.map(_._1) == (1L to 12L))
    // unknown shard excluded
    val out2 = Packing.strideSchedule(
      seqs.union(Seq(("C", 0L)).toDF("shard", "seq_id")),
      $"shard", $"seq_id", Map("A" -> 2.0, "B" -> 1.0))
    assert(out2.filter($"shard" === "C").count() == 0)
  }

  test("gapFillCounts: silent buckets are zeros, span per key") {
    val h = 3600L
    val events = Seq(
      (1L, ts(0 * h + 10), 2.0), (1L, ts(0 * h + 20), 3.0),
      (1L, ts(3 * h), 1.0),             // hours 1,2 silent
      (2L, ts(5 * h), 4.0)              // single-bucket key
    ).toDF("u", "t", "v")
    val out = Funnel.gapFillCounts(events, $"u", $"t", $"v",
        bucketSeconds = 3600L)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 0L, 2L, 5.0), (1L, 1L, 0L, 0.0), (1L, 2L, 0L, 0.0),
      (1L, 3L, 1L, 1.0), (2L, 5L, 1L, 4.0)))
  }

  test("strideSchedule / filterByScoreBand: no partition-less WindowExec") {
    // the global step / exclusive rank must be produced by a PARTITIONED
    // window (GlobalOrder's bucket design) — a Window.orderBy with no
    // partition spec funnels the whole schedule through one task
    // AQE wraps the executed plan in AdaptiveSparkPlanExec, which hides
    // WindowExec from a naive collect — build the frame with AQE off so
    // the assert actually sees the window operators. The lit(0) bucket
    // fallback this guards against constant-folds OUT of the
    // partitionSpec, so the assert must check the OPTIMIZED plan.
    def assertPartitionedWindows(build: => org.apache.spark.sql.DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val df = build
        val windows = df.queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w
        }
        assert(windows.nonEmpty, "expected a WindowExec in the plan")
        val bare = windows.filter(_.partitionSpec.isEmpty)
        assert(bare.isEmpty,
          s"partition-less WindowExec in:\n${df.queryExecution.executedPlan}")
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    val seqs = (for (s <- Seq("A", "B"); k <- 0L until 50L) yield (s, k))
      .toDF("shard", "seq_id")
    assertPartitionedWindows(
      Packing.strideSchedule(seqs, $"shard", $"seq_id", Map("A" -> 2.0, "B" -> 1.0)))
    val scored = (1 to 200).map(i => (i.toLong, i * 0.37)).toDF("id", "s")
    assertPartitionedWindows(
      graft.ops.Sampling.filterByScoreBand(scored, $"s", 20, 80))
  }

  test("GlobalOrder: bucketed prefix sums match the single-window oracle") {
    import graft.ops.GlobalOrder
    // enough rows + forced multi-bucket path via many distinct doubles:
    // compare against a driver-side oracle on the same total order
    val rows = (1 to 3000).map { i =>
      val v = math.sin(i * 12.9898) * 43758.5453 % 7.0  // scattered doubles
      (v, i.toLong, (i % 13).toLong)
    }
    val df = rows.toDF("v", "id", "w")
    // rowsPerBucket=100 forces ~30 quantile buckets — the multi-bucket
    // path (bucket assignment + offset join), not the 1-bucket fallback
    val got = GlobalOrder.exclusivePrefixSum(
        df, Seq($"v", $"id"), $"w", "pre", rowsPerBucket = 100L)
      .select($"id", $"pre").as[(Long, Long)].collect().toMap
    var acc = 0L
    val want = rows.sortBy(r => (r._1, r._2)).map { r =>
      val o = (r._2, acc); acc += r._3; o
    }.toMap
    assert(got == want)
    val rn = GlobalOrder.rowNumber(df, Seq($"v", $"id"), "step")
      .select($"step").as[Long].collect().sorted.toSeq
    assert(rn == (1L to 3000L))
  }

  test("GlobalOrder: non-numeric lead takes the single-bucket path (no ANSI cast)") {
    import graft.ops.GlobalOrder
    // a STRING lead previously hit cast("double") — CAST_INVALID_INPUT
    // under Spark 4 ANSI; now it must band to one bucket and rank fine
    val df = Seq(("banana", 2L), ("apple", 1L), ("cherry", 3L), ("date", 4L))
      .toDF("s", "id")
    val got = GlobalOrder.rowNumber(df, Seq($"s", $"id"), "rk")
      .select($"s", $"rk").as[(String, Long)].collect().toMap
    assert(got == Map("apple" -> 1L, "banana" -> 2L, "cherry" -> 3L, "date" -> 4L))
  }

  test("GlobalOrder: null numeric leads rank first, no NPE, no dropped rows") {
    import graft.ops.GlobalOrder
    val df = Seq[(java.lang.Double, Long)]((2.0, 2L), (null, 10L), (1.0, 1L),
      (null, 11L), (3.0, 3L)).toDF("v", "id")
    val got = GlobalOrder.rowNumber(df, Seq($"v", $"id"), "rk")
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    // asc NULLS FIRST: the two null-score rows take ranks 1-2 by id
    assert(got == Map(10L -> 1L, 11L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 5L))
  }

  test("GlobalOrder: timestamp leads band into multiple buckets (epoch derivation)") {
    import graft.ops.GlobalOrder
    // 3000 distinct timestamps with rowsPerBucket=100: the temporal
    // derivation must quantile-band (NOT degrade to one window task),
    // and the global order must match the driver oracle
    val rows = (1 to 3000).map(i => (ts(i * 37L), i.toLong))
    val df = rows.toDF("t", "id")
    val got = GlobalOrder.exclusivePrefixSum(
        df, Seq($"t", $"id"), lit(1L), "pre", rowsPerBucket = 100L)
      .select($"id", $"pre").as[(Long, Long)].collect().toMap
    val want = rows.sortBy(_._2).zipWithIndex
      .map { case ((_, id), i) => id -> i.toLong }.toMap
    assert(got == want)
  }

  test("GlobalOrder: NaN leads band with the top bucket, order stays exact") {
    import graft.ops.GlobalOrder
    // NaN sorts LAST under Spark asc ordering but a raw binary search
    // would band it to bucket 0 — the nanvl(+Inf) fold keeps banding
    // monotone. 300 rows force the multi-bucket path at target 50.
    val rows = (1 to 300).map { i =>
      val v = if (i % 100 == 0) Double.NaN else i.toDouble
      (v, i.toLong)
    }
    val df = rows.toDF("v", "id")
    val got = GlobalOrder.rowNumber(df, Seq($"v", $"id"), "rk")
      .select($"id", $"rk").as[(Long, Long)].collect().toMap
    // oracle: non-NaN ascending by (v, id), then the three NaN rows by id
    val (nan, fin) = rows.partition(_._1.isNaN)
    val want = (fin.sortBy(r => (r._1, r._2)) ++ nan.sortBy(_._2))
      .zipWithIndex.map { case ((_, id), i) => id -> (i + 1).toLong }.toMap
    assert(got == want)
  }

  test("GlobalOrder property: 20 seeded random frames match the driver oracle") {
    import graft.ops.GlobalOrder
    // adversarial mix per case: small value domains (tie runs), nulls
    // (rank first), NaN (ranks last), random weights, bucket sizes that
    // force 1..many buckets — exclusive prefix sums must equal the
    // driver-side fold over Spark's total order in every case
    val rnd = new scala.util.Random(20260816L)
    (1 to 20).foreach { case_ =>
      val n = 1 + rnd.nextInt(400)
      val domain = 1 + rnd.nextInt(20)
      val rowsPerBucket = Seq(1L, 7L, 50L)(rnd.nextInt(3))
      val rows = (1 to n).map { i =>
        val v: java.lang.Double = rnd.nextInt(10) match {
          case 0 => null
          case 1 => Double.NaN
          case _ => (rnd.nextInt(domain) * 3.5) - 7.0
        }
        (v, i.toLong, rnd.nextInt(5).toLong)
      }
      val df = rows.toDF("v", "id", "w")
      val got = GlobalOrder.exclusivePrefixSum(
          df, Seq($"v", $"id"), $"w", "pre", rowsPerBucket)
        .select($"id", $"pre").as[(Long, Long)].collect().toMap
      // driver oracle over Spark's asc order: nulls FIRST, NaN LAST
      // (java.lang.Double.compare agrees on NaN-largest), id tiebreak
      val ord = new Ordering[(java.lang.Double, Long, Long)] {
        def compare(a: (java.lang.Double, Long, Long),
            b: (java.lang.Double, Long, Long)): Int = {
          val c = (a._1, b._1) match {
            case (null, null) => 0
            case (null, _) => -1
            case (_, null) => 1
            case (x, y) => java.lang.Double.compare(x, y)
          }
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }
      var acc = 0L
      val want = rows.sorted(ord).map { r =>
        val o = (r._2, acc); acc += r._3; o
      }.toMap
      assert(got == want,
        s"case $case_ (n=$n domain=$domain rpb=$rowsPerBucket) diverged")
    }
  }

  test("GlobalOrder: a lead-value tie run longer than a bucket trips the overflow telemetry") {
    import graft.ops.GlobalOrder
    // constant lead: quantile bounds cannot split it — everything lands
    // in one bucket, 200 rows >> 4x the 10-row target. The result must
    // stay exact; the telemetry must name the overflowing bucket.
    val df = (1 to 200).map(i => (0.0, i.toLong)).toDF("v", "id")
    var warned = List.empty[(Int, Long)]
    val (ranked, stats) = GlobalOrder.exclusivePrefixSumStats(
      df, Seq($"v", $"id"), lit(1L), "pre", rowsPerBucket = 10L,
      warner = Some((b, c) => warned ::= (b, c)))
    val rn = ranked.select($"id", $"pre").as[(Long, Long)].collect().toMap
    assert(rn == (1 to 200).map(i => i.toLong -> (i - 1).toLong).toMap)
    val (_, cnt) = stats.overflow.getOrElse(
      fail("overflow telemetry did not fire on a constant lead"))
    assert(cnt == 200L)
    assert(warned.map(_._2) == List(200L), "caller warner must fire once")
    assert(stats.rows == 200L && stats.maxRowWeight == 1L)
    // balanced data must NOT trip it
    val spread = (1 to 200).map(i => (i.toDouble, i.toLong)).toDF("v", "id")
    val (ranked2, stats2) = GlobalOrder.exclusivePrefixSumStats(
      spread, Seq($"v", $"id"), lit(1L), "pre", rowsPerBucket = 10L)
    ranked2.count()
    assert(stats2.overflow.isEmpty)
  }

  test("strideScheduleBy matches the map variant on equal weights") {
    val seqs = (for (s <- Seq("A", "B"); k <- 0L until 5L) yield (s, k))
      .toDF("shard", "seq_id")
    val wdf = Seq(("A", 2.0), ("B", 1.0), ("C", 0.0)).toDF("shard", "weight")
    val byDf = Packing.strideScheduleBy(seqs, $"shard", $"seq_id", wdf)
      .as[(Long, String, Long, Double)].collect().sortBy(_._1).toSeq
    val byMap = Packing.strideSchedule(seqs, $"shard", $"seq_id",
        Map("A" -> 2.0, "B" -> 1.0))
      .as[(Long, String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(byDf == byMap)
    // zero-weight shard excluded even if present in the weight table
    assert(!byDf.exists(_._2 == "C"))
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scd2

/** SCD Type-2 history: change-log fold semantics, the single-Exchange
  * plan shape, and incremental-merge ≡ from-scratch equivalence. */
class Scd2Spec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-scd2-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-scd2").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/t"
  }

  private def histRows(df: DataFrame): Set[(Long, String, Long, Option[Long], Long, Boolean)] =
    df.select(col("k"), col("attr"),
        unix_millis(col("valid_from")), unix_millis(col("valid_to")),
        col("version").cast("long"), col("is_current"))
      .as[(Long, String, Long, Option[Long], Long, Boolean)]
      .collect().toSet

  test("fromChangeLog: collapse, intervals, versions, current flag") {
    // key 1: a -> a (collapse) -> b -> b (collapse) -> a  => 3 versions
    // key 2: single observation                           => 1 version
    val log = Seq(
      (1L, ts(10), "a"), (1L, ts(20), "a"), (1L, ts(30), "b"),
      (1L, ts(40), "b"), (1L, ts(50), "a"),
      (2L, ts(15), "x")
    ).toDF("k", "t", "attr")
    val hist = Scd2.fromChangeLog(log, "k", "t", Seq("attr"))
    assert(histRows(hist) == Set(
      (1L, "a", 10000L, Some(30000L), 1L, false),
      (1L, "b", 30000L, Some(50000L), 2L, false),
      (1L, "a", 50000L, None, 3L, true),
      (2L, "x", 15000L, None, 1L, true)))
  }

  test("fromChangeLog: null attribute flips are changes (null-safe)") {
    val log = Seq(
      (1L, ts(10), Some("a")), (1L, ts(20), None),
      (1L, ts(30), None), (1L, ts(40), Some("a"))
    ).toDF("k", "t", "attr")
    val hist = Scd2.fromChangeLog(log, "k", "t", Seq("attr"))
      .select(col("attr"), col("version").cast("long")).as[(Option[String], Long)]
      .collect().toSet
    assert(hist == Set((Some("a"), 1L), (None, 2L), (Some("a"), 3L)))
  }

  test("fromChangeLog: multi-attribute change detection") {
    val log = Seq(
      (1L, ts(10), "a", 1), (1L, ts(20), "a", 2), (1L, ts(30), "a", 2)
    ).toDF("k", "t", "attr", "n")
    val hist = Scd2.fromChangeLog(log, "k", "t", Seq("attr", "n"))
    assert(hist.count() == 2) // n change opens v2; identical row collapses
  }

  test("fromChangeLog: same-instant collision — last tie-break wins") {
    val log = Seq(
      (1L, ts(10), 1L, "a"), (1L, ts(10), 2L, "b"), (1L, ts(20), 3L, "c")
    ).toDF("k", "t", "seq", "attr")
    val hist = Scd2.fromChangeLog(log, "k", "t", Seq("attr"),
      tieBreaks = Seq("seq"))
    val rows = hist.select(col("attr"), col("version").cast("long"))
      .as[(String, Long)].collect().toSet
    // seq=2 "b" wins instant 10; "a" never became visible state
    assert(rows == Set(("b", 1L), ("c", 2L)))
  }

  test("fromChangeLog plans ONE Exchange even with tie-breaks") {
    val log = Seq((1L, ts(10), 1L, "a")).toDF("k", "t", "seq", "attr")
    val plan = Scd2.fromChangeLog(log, "k", "t", Seq("attr"),
        tieBreaks = Seq("seq"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected a single key shuffle:\n$plan")
  }

  test("asOf reproduces point-in-time state") {
    val log = Seq(
      (1L, ts(10), "a"), (1L, ts(30), "b"), (2L, ts(5), "x")
    ).toDF("k", "t", "attr")
    val hist = Scd2.fromChangeLog(log, "k", "t", Seq("attr"))
    val at25 = Scd2.asOf(hist, lit(ts(25)))
      .select(col("k"), col("attr")).as[(Long, String)].collect().toSet
    assert(at25 == Set((1L, "a"), (2L, "x")))
    val at35 = Scd2.asOf(hist, lit(ts(35)))
      .select(col("k"), col("attr")).as[(Long, String)].collect().toSet
    assert(at35 == Set((1L, "b"), (2L, "x")))
    // before any observation: empty
    assert(Scd2.asOf(hist, lit(ts(1))).count() == 0)
  }

  private def mkLog(rows: Seq[(Long, Long, String)]): DataFrame =
    rows.map { case (k, t, a) => (k, ts(t), a) }.toDF("k", "t", "attr")

  test("lookupAsOf enriches facts with the version valid at their instant") {
    val hist = Scd2.fromChangeLog(
      mkLog(Seq((1L, 10L, "a"), (1L, 30L, "b"), (2L, 20L, "x"))),
      "k", "t", Seq("attr"))
    val facts = Seq(
      (100L, 1L, ts(10)), // at the open instant -> that version
      (101L, 1L, ts(29)), // inside v1
      (102L, 1L, ts(30)), // at v2 open -> v2
      (103L, 1L, ts(99)), // current
      (104L, 2L, ts(25)),
      (105L, 2L, ts(5)),  // before first version -> null
      (106L, 3L, ts(50))  // unknown key -> null
    ).toDF("fid", "k", "ft")
    val got = Scd2.lookupAsOf(facts, "k", "ft", hist, "k", Seq("attr"))
      .select($"fid", $"state_attr").as[(Long, Option[String])]
      .collect().toMap
    assert(got == Map(
      100L -> Some("a"), 101L -> Some("a"), 102L -> Some("b"),
      103L -> Some("b"), 104L -> Some("x"), 105L -> None, 106L -> None))
  }

  test("writeHistory append with a different bucket layout fails fast") {
    val dir = tmpDir()
    val rows = (0L until 20L).map(k => (k, 10L, "a"))
    Scd2.writeHistory(spark, mkLog(rows), "k", "t", Seq("attr"), dir,
      numBuckets = 8)
    // a re-pinned different layout would leave keys spread across two
    // bucketings — the guard must refuse before any data write
    val e = intercept[IllegalArgumentException] {
      Scd2.writeHistory(spark, mkLog(Seq((100L, 10L, "b"))), "k", "t",
        Seq("attr"), dir, numBuckets = 16, mode = "append")
    }
    assert(e.getMessage.contains("buckets=8"), e.getMessage)
    assert(Scd2.readHistory(spark, dir).count() == 20L)
  }

  test("rebucketHistory: merges keep converging across the migration") {
    val all = (0L until 30L).flatMap { k =>
      (0L until 4L).map(i => (k, 10L + i * 10L, s"s${(k + i) % 3}"))
    }
    val (b0, b1) = all.partition(_._2 <= 20L)
    val dir = tmpDir()
    Scd2.writeHistory(spark, mkLog(b0), "k", "t", Seq("attr"), dir,
      numBuckets = 4)
    Scd2.rebucketHistory(spark, dir, "k", oldBuckets = 4, newBuckets = 8)
    intercept[IllegalArgumentException] {
      Scd2.mergeChanges(spark, dir, mkLog(b1), "k", "t", Seq("attr"),
        numBuckets = 4)
    }
    Scd2.mergeChanges(spark, dir, mkLog(b1), "k", "t", Seq("attr"),
      numBuckets = 8)
    assert(histRows(Scd2.readHistory(spark, dir)) ==
      histRows(Scd2.fromChangeLog(mkLog(all), "k", "t", Seq("attr"))))
  }

  test("mergeChanges batch-by-batch == fromChangeLog from scratch") {
    val all = (0L until 40L).flatMap { k =>
      (0L until 6L).map(i => (k, 10L + i * 10L, s"s${(k + i) % 3}"))
    }
    val (b0, rest) = all.partition(_._2 <= 20L)
    val (b1, b2) = rest.partition(_._2 <= 40L)
    val dir = tmpDir()
    Scd2.writeHistory(spark, mkLog(b0), "k", "t", Seq("attr"), dir,
      numBuckets = 8)
    Scd2.mergeChanges(spark, dir, mkLog(b1), "k", "t", Seq("attr"),
      numBuckets = 8)
    Scd2.mergeChanges(spark, dir, mkLog(b2), "k", "t", Seq("attr"),
      numBuckets = 8)
    val got = histRows(Scd2.readHistory(spark, dir))
    val want = histRows(
      Scd2.fromChangeLog(mkLog(all), "k", "t", Seq("attr")))
    assert(got == want)
  }

  test("mergeChanges: rerun of the same batch converges (idempotent)") {
    val dir = tmpDir()
    Scd2.writeHistory(spark, mkLog(Seq((1L, 10L, "a"), (2L, 10L, "x"))),
      "k", "t", Seq("attr"), dir, numBuckets = 4)
    val batch = mkLog(Seq((1L, 20L, "b")))
    Scd2.mergeChanges(spark, dir, batch, "k", "t", Seq("attr"), numBuckets = 4)
    val once = histRows(Scd2.readHistory(spark, dir))
    Scd2.mergeChanges(spark, dir, batch, "k", "t", Seq("attr"), numBuckets = 4)
    assert(histRows(Scd2.readHistory(spark, dir)) == once)
  }

  test("mergeChanges: same-instant correction replaces the stored point") {
    val dir = tmpDir()
    Scd2.writeHistory(spark, mkLog(Seq((1L, 10L, "a"), (1L, 20L, "b"))),
      "k", "t", Seq("attr"), dir, numBuckets = 4)
    // correction: the observation at t=20 was really "c"
    Scd2.mergeChanges(spark, dir, mkLog(Seq((1L, 20L, "c"))),
      "k", "t", Seq("attr"), numBuckets = 4)
    val got = histRows(Scd2.readHistory(spark, dir))
    assert(got == histRows(Scd2.fromChangeLog(
      mkLog(Seq((1L, 10L, "a"), (1L, 20L, "c"))), "k", "t", Seq("attr"))))
  }

  test("mergeChanges late-data contract: intervals re-derive around a " +
      "late point; collapsed observations stay collapsed") {
    val dir = tmpDir()
    // stored fold of (a@10, a@20, b@30) = a@10, b@30 — a@20 collapsed
    Scd2.writeHistory(spark,
      mkLog(Seq((1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"))),
      "k", "t", Seq("attr"), dir, numBuckets = 4)
    // late x@25 folds against the COLLAPSED points: a@10, x@25, b@30
    // (a@20 cannot re-open — it no longer exists; documented contract)
    Scd2.mergeChanges(spark, dir, mkLog(Seq((1L, 25L, "x"))),
      "k", "t", Seq("attr"), numBuckets = 4)
    val got = histRows(Scd2.readHistory(spark, dir))
    assert(got == Set(
      (1L, "a", 10000L, Some(25000L), 1L, false),
      (1L, "x", 25000L, Some(30000L), 2L, false),
      (1L, "b", 30000L, None, 3L, true)))
  }

  test("mergeChanges: untouched buckets are not rewritten") {
    val dir = tmpDir()
    val base = (0L until 64L).map(k => (k, 10L, "a"))
    Scd2.writeHistory(spark, mkLog(base), "k", "t", Seq("attr"), dir,
      numBuckets = 8)
    val before = new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("graft_bucket="))
      .map(f => f.getName -> f.listFiles().map(_.lastModified()).max).toMap
    Thread.sleep(1100)
    val stats = Scd2.mergeChanges(spark, dir, mkLog(Seq((3L, 20L, "b"))),
      "k", "t", Seq("attr"), numBuckets = 8)
    assert(stats.touchedBuckets == 1 && stats.applied == 1L)
    val after = new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("graft_bucket="))
      .map(f => f.getName -> f.listFiles().map(_.lastModified()).max).toMap
    val touched = before.keys.filter(n => before(n) != after(n))
    assert(touched.size == 1, s"exactly one bucket dir rewritten: $touched")
  }

  test("mergeChanges guards: ambiguous instants / wrong buckets fail fast") {
    val dir = tmpDir()
    Scd2.writeHistory(spark, mkLog(Seq((1L, 10L, "a"))), "k", "t",
      Seq("attr"), dir, numBuckets = 4)
    val dup = mkLog(Seq((1L, 20L, "b"), (1L, 20L, "c")))
    val e1 = intercept[IllegalArgumentException] {
      Scd2.mergeChanges(spark, dir, dup, "k", "t", Seq("attr"), numBuckets = 4)
    }
    assert(e1.getMessage.contains("tieBreaks"))
    val e2 = intercept[IllegalArgumentException] {
      Scd2.mergeChanges(spark, dir, mkLog(Seq((1L, 20L, "b"))), "k", "t",
        Seq("attr"), numBuckets = 8) // wrong bucket count vs pinned spec
    }
    assert(e2.getMessage.contains("buckets"))
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

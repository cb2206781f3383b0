package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Hll

/** Portable HyperLogLog: register formula, mergeability, accuracy. */
class HllSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-hll-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("register/rank replicate the reference bit formula") {
    // independent Scala reimplementation straight from the definition:
    // top-p bits pick the register; rank = leading zeros of the low
    // 64-p bits (within that width) + 1
    // md5-lower-64 re-derived from its definition (little-endian long of
    // MD5 digest bytes 8..15 — DuckDB's md5_number_lower)
    def md5lo(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (15 to 8 by -1).foldLeft(0L)((h, i) => (h << 8) | (d(i) & 0xffL))
    }
    val p = 10
    val items = Seq("alpha", "beta", "gamma", "", "42")
    val expected: Map[Int, Int] = items.map { s =>
      val h = md5lo("hll:" + s)
      val reg = (h >>> (64 - p)).toInt
      val w = h & ((1L << (64 - p)) - 1L)
      val rank =
        if (w == 0L) 64 - p + 1
        else java.lang.Long.numberOfLeadingZeros(w) - p + 1
      reg -> rank
    }.groupBy(_._1).map { case (r, rs) => r -> rs.map(_._2).max }.toMap
    val got = Hll.hllRegisters(items.toDF("x"), $"x", p)
      .as[(Int, Int)].collect().toMap
    assert(got == expected)
  }

  test("duplicates do not move the sketch") {
    val once = Hll.hllRegisters(Seq("a", "b", "c").toDF("x"), $"x", 8)
      .as[(Int, Int)].collect().toSet
    val dup = Hll.hllRegisters(
        Seq("a", "a", "b", "b", "b", "c").toDF("x"), $"x", 8)
      .as[(Int, Int)].collect().toSet
    assert(once == dup)
  }

  test("mergeRegisters(hll(A), hll(B)) == hll(A union B)") {
    val a = (1 to 500).map(i => s"a$i").toDF("x")
    val b = (1 to 500).map(i => s"b$i").toDF("x")
    val merged = Hll.mergeRegisters(
        Hll.hllRegisters(a, $"x", 10), Hll.hllRegisters(b, $"x", 10))
      .as[(Int, Int)].collect().toSet
    val oneShot = Hll.hllRegisters(a.union(b), $"x", 10)
      .as[(Int, Int)].collect().toSet
    assert(merged == oneShot)
  }

  test("estimate lands within theoretical error across regimes") {
    // small range (linear counting) and the raw harmonic-mean regime
    for ((n, tolPct) <- Seq((300, 10.0), (20000, 12.0))) {
      val items = (1 to n).map(i => s"item-$i").toDF("x")
      val est = Hll.approxDistinct(items, $"x", p = 10)
      val errPct = math.abs(est - n) / n * 100.0
      assert(errPct <= tolPct,
        s"n=$n est=$est err=${errPct}% (expected ~3.3% typical, $tolPct% cap)")
    }
  }

  test("by-group estimates track exact distincts per group") {
    val items = (1 to 3).flatMap { g =>
      (1 to g * 400).map(i => (s"g$g", s"item-$g-$i"))
    }.toDF("g", "x")
    val est = graft.ops.Hll.approxDistinctByGroup(items, $"g", $"x", p = 10)
      .select($"group", $"est").as[(String, Double)].collect().toMap
    for (g <- 1 to 3) {
      val n = g * 400
      val errPct = math.abs(est(s"g$g") - n) / n * 100.0
      assert(errPct <= 12.0, s"g$g est=${est(s"g$g")} vs $n ($errPct%)")
    }
  }

  test("by-group matches the single-set estimator on one group") {
    val items = (1 to 5000).map(i => ("only", s"v$i")).toDF("g", "x")
    val grouped = graft.ops.Hll.approxDistinctByGroup(items, $"g", $"x", p = 10)
      .select($"est").as[Double].head()
    val single = graft.ops.Hll.approxDistinct(items.select($"x"), $"x", p = 10)
    assert(math.abs(grouped - single) <= math.max(1.0, single * 0.001),
      s"grouped=$grouped single=$single")
  }

  test("sketch size is bounded by 2^p however large the input") {
    val items = (1 to 50000).map(i => s"v$i").toDF("x")
    assert(Hll.hllRegisters(items, $"x", 6).count() <= 64L)
  }

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-hll").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/sketch"
  }

  test("segmented sketch: append-per-batch == one-shot; rerun converges") {
    val dir = tmpDir()
    val a = (1 to 200).map(i => s"a$i").toDF("x")
    val b = (1 to 150).map(i => s"b$i").toDF("x")
    Hll.appendRegistersSegment(a, $"x", 8, dir, "b0")
    Hll.appendRegistersSegment(b, $"x", 8, dir, "b1")
    // re-delivered batch overwrites its own segment (exactly-once; max
    // is idempotent anyway — doubly safe)
    Hll.appendRegistersSegment(b, $"x", 8, dir, "b1")
    val merged = Hll.readRegisters(spark, dir, 8)
      .as[(Int, Int)].collect().toSet
    val oneShot = Hll.hllRegisters(a.union(b), $"x", 8)
      .as[(Int, Int)].collect().toSet
    assert(merged == oneShot)
    // mismatched p fails fast against the pinned spec
    intercept[IllegalArgumentException] {
      Hll.appendRegistersSegment(a, $"x", 9, dir, "b2")
    }
  }

  test("data card: a source whose text is all NULL still gets a row (est 0)") {
    // counts partials exist for the source but groupRegisters drops null
    // items — the serve-side left join must keep the source visible with
    // the all-zero-register estimate instead of silently dropping it
    val docs = Seq(
      ("alive", Option("some words here")), ("alive", Option("more words")),
      ("ghost", Option.empty[String]), ("ghost", Option.empty[String])
    ).toDF("src", "txt")
    val dir = tmpDir()
    graft.ops.Report.appendDataCardSegment(docs, $"src", $"txt", 10, dir, "b0")
    val card = graft.ops.Report.readDataCard(spark, dir, 10)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(card.keySet == Set("alive", "ghost"), s"got ${card.keySet}")
    val g = card("ghost")
    assert(g.getAs[Long]("n_docs") == 2L)
    assert(g.getAs[Long]("v_zero") == (1L << 10))
    assert(g.getAs[Double]("est") == 0.0)
    assert(card("alive").getAs[Double]("est") > 0.0)
  }

  test("incremental data card: segment merge equals one-shot; counts exact") {
    val docs = (0 until 60).map { i =>
      (s"s${i % 3}", s"doc $i the quick common words here now ${i % 7}")
    }.toDF("src", "txt")
    val (a, b) = (docs.limit(25), docs.exceptAll(docs.limit(25)))
    val dir = tmpDir()
    graft.ops.Report.appendDataCardSegment(a, $"src", $"txt", 10, dir, "b0")
    graft.ops.Report.appendDataCardSegment(b, $"src", $"txt", 10, dir, "b1")
    val merged = graft.ops.Report.readDataCard(spark, dir, 10)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val oneDir = tmpDir()
    graft.ops.Report.appendDataCardSegment(docs, $"src", $"txt", 10, oneDir, "all")
    val oneShot = graft.ops.Report.readDataCard(spark, oneDir, 10)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(merged == oneShot && merged.keySet == Set("s0", "s1", "s2"))
    // integer partials agree with the exact card's shared columns
    val exact = graft.ops.Report.corpusDataCard(docs, $"src", $"txt")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    merged.foreach { case (s, vals) =>
      assert((vals(0), vals(1), vals(3)) == exact(s),
        s"counts drift for $s: $vals vs ${exact(s)}")
    }
    // distinct estimate is near the true distinct count (20 per source)
    val est = graft.ops.Report.readDataCard(spark, dir, 10)
      .select($"source", $"est").as[(String, Double)].collect().toMap
    est.values.foreach(e => assert(math.abs(e - 20.0) <= 4.0, est))
    // mismatched p fails against the pinned spec
    intercept[IllegalArgumentException] {
      graft.ops.Report.appendDataCardSegment(a, $"src", $"txt", 9, dir, "b2")
    }
  }

  test("segment compaction folds to one segment, same registers") {
    val dir = tmpDir()
    val a = (1 to 100).map(i => s"a$i").toDF("x")
    val b = (1 to 80).map(i => s"c$i").toDF("x")
    Hll.appendRegistersSegment(a, $"x", 7, dir, "b0")
    Hll.appendRegistersSegment(b, $"x", 7, dir, "b1")
    val before = Hll.readRegisters(spark, dir, 7)
      .as[(Int, Int)].collect().toSet
    assert(Hll.compactRegistersSegments(spark, dir, 7) == 2)
    assert(Hll.compactRegistersSegments(spark, dir, 7) == 0) // idempotent
    val after = Hll.readRegisters(spark, dir, 7)
      .as[(Int, Int)].collect().toSet
    assert(after == before)
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

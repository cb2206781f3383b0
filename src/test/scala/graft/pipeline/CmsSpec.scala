package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Cms

/** Count-min sketch: never-underestimate, mergeability, heavy hitters. */
class CmsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-cms-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def occurrences(counts: Map[String, Int]) =
    counts.toSeq.flatMap { case (s, n) => Seq.fill(n)(s) }.toDF("x")

  test("estimates never underestimate; exact absent collisions") {
    val truth = Map("a" -> 100, "b" -> 40, "c" -> 7, "d" -> 1)
    val items = occurrences(truth)
    val cells = Cms.countMinCells(items, $"x", depth = 4, width = 64)
    val est = Cms.estimateCounts(cells, items, $"x", depth = 4, width = 64)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (s, n) =>
      assert(est(s) >= n, s"underestimate for $s: ${est(s)} < $n")
    }
    // 4 distinct items in a 4x64 sketch: collisions need two of four
    // md5-derived buckets to coincide per row — expect exact estimates
    assert(est == truth.map { case (s, n) => s -> n.toLong })
  }

  test("cell grid is bounded by depth x width and counts every occurrence") {
    val items = occurrences(Map("a" -> 10, "b" -> 5, "c" -> 3))
    val cells = Cms.countMinCells(items, $"x", depth = 3, width = 8)
      .as[(Int, Int, Long)].collect()
    assert(cells.length <= 3 * 8)
    assert(cells.forall { case (d, b, _) => d >= 0 && d < 3 && b >= 0 && b < 8 })
    // each depth row partitions the stream: its cells sum to N
    cells.groupBy(_._1).foreach { case (d, cs) =>
      assert(cs.map(_._3).sum == 18L, s"depth $d lost occurrences")
    }
  }

  test("mergeCells(cells(A), cells(B)) == cells(A ++ B)") {
    val a = occurrences(Map("a" -> 5, "b" -> 2))
    val b = occurrences(Map("b" -> 3, "c" -> 9))
    val merged = Cms.mergeCells(
        Cms.countMinCells(a, $"x", 4, 32),
        Cms.countMinCells(b, $"x", 4, 32))
      .as[(Int, Int, Long)].collect().toSet
    val direct = Cms.countMinCells(a.union(b), $"x", 4, 32)
      .as[(Int, Int, Long)].collect().toSet
    assert(merged == direct)
  }

  test("heavyHitters is a superset of true heavy items") {
    val truth = Map("hot1" -> 50, "hot2" -> 30, "warm" -> 10) ++
      (1 to 40).map(i => s"cold$i" -> 1).toMap
    val items = occurrences(truth)
    val hh = Cms.heavyHitters(items, $"x", depth = 4, width = 128,
        minCount = 25L)
      .as[(String, Long)].collect().toMap
    assert(hh.contains("hot1") && hh.contains("hot2"))
    assert(!hh.contains("warm") || hh("warm") >= 25L) // only via collision
  }

  test("absent item estimates 0 when its cells are empty") {
    val items = occurrences(Map("a" -> 3))
    val cells = Cms.countMinCells(items, $"x", depth = 4, width = 1024)
    val est = Cms.estimateCounts(cells,
        Seq("zebra").toDF("x"), $"x", depth = 4, width = 1024)
      .as[(String, Long)].collect().toMap
    // 1024-wide sketch holding one item: at least one of zebra's 4
    // cells is all but surely empty; the min can only be 0 or 3
    assert(est("zebra") == 0L || est("zebra") == 3L)
  }

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-cms").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/sketch"
  }

  test("segmented sketch: append-per-batch == one-shot; rerun converges") {
    val dir = tmpDir()
    val a = occurrences(Map("a" -> 5, "b" -> 2))
    val b = occurrences(Map("b" -> 3, "c" -> 9))
    Cms.appendCellsSegment(a, $"x", 4, 32, dir, "b0")
    Cms.appendCellsSegment(b, $"x", 4, 32, dir, "b1")
    // re-delivered batch overwrites its own segment (exactly-once)
    Cms.appendCellsSegment(b, $"x", 4, 32, dir, "b1")
    val merged = Cms.readCells(spark, dir, 4, 32)
      .as[(Int, Int, Long)].collect().toSet
    val oneShot = Cms.countMinCells(a.union(b), $"x", 4, 32)
      .as[(Int, Int, Long)].collect().toSet
    assert(merged == oneShot)
    // mismatched parameters fail fast against the pinned spec
    intercept[IllegalArgumentException] {
      Cms.appendCellsSegment(a, $"x", 4, 64, dir, "b2")
    }
  }

  test("segment compaction folds to one segment, same cells") {
    val dir = tmpDir()
    val a = occurrences(Map("a" -> 5))
    val b = occurrences(Map("a" -> 2, "b" -> 7))
    Cms.appendCellsSegment(a, $"x", 3, 16, dir, "b0")
    Cms.appendCellsSegment(b, $"x", 3, 16, dir, "b1")
    val before = Cms.readCells(spark, dir, 3, 16)
      .as[(Int, Int, Long)].collect().toSet
    assert(Cms.compactCellsSegments(spark, dir, 3, 16) == 2)
    assert(Cms.compactCellsSegments(spark, dir, 3, 16) == 0) // idempotent
    val after = Cms.readCells(spark, dir, 3, 16)
      .as[(Int, Int, Long)].collect().toSet
    assert(after == before)
  }

  test("probe plan is a broadcast join (cells never shuffle the corpus)") {
    val items = occurrences(Map("a" -> 3, "b" -> 2))
    val cells = Cms.countMinCells(items, $"x", 2, 16)
    val plan = Cms.estimateCounts(cells, items, $"x", 2, 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

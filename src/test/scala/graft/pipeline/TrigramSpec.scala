package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.text.Trigram

/** Trigram substring index: exactness, segments, pruning guards. */
class TrigramSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-trgm-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-trgm").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/idx"
  }

  private val docs = Seq(
    (0L, "Spark window functions are great"),
    (1L, "the windy city"),           // contains "wind" but not "spark wind"
    (2L, "spark windows everywhere"), // "spark wind" crosses the boundary
    (3L, "nothing relevant"),
    (4L, "SPARK  WINDOW!!")           // normalization collapses to match
  ).toDF("doc_id", "text")

  test("index-served search == brute contains scan (cross-word pattern)") {
    val dir = tmpDir()
    Trigram.appendSegment(docs.filter($"doc_id" < 2), $"doc_id", $"text", dir, "b0")
    Trigram.appendSegment(docs.filter($"doc_id" >= 2), $"doc_id", $"text", dir, "b1")
    val got = Trigram.searchSubstring(spark, dir, docs, $"doc_id", $"text",
      "spark wind").as[Long].collect().toSet
    val brute = docs
      .filter(Trigram.normText($"text").contains("spark wind"))
      .select($"doc_id").as[Long].collect().toSet
    assert(got == brute && got == Set(0L, 2L, 4L))
  }

  test("substring-inside-token patterns work (word indexes cannot)") {
    val dir = tmpDir()
    Trigram.appendSegment(docs, $"doc_id", $"text", dir, "b0")
    val got = Trigram.searchSubstring(spark, dir, docs, $"doc_id", $"text",
      "indy").as[Long].collect().toSet
    assert(got == Set(1L)) // inside "windy"
  }

  test("compaction preserves results; spec pin guards chunk size") {
    val dir = tmpDir()
    Trigram.appendSegment(docs.filter($"doc_id" < 2), $"doc_id", $"text", dir, "b0")
    Trigram.appendSegment(docs.filter($"doc_id" >= 2), $"doc_id", $"text", dir, "b1")
    val before = Trigram.searchSubstring(spark, dir, docs, $"doc_id", $"text",
      "window").as[Long].collect().toSet
    assert(Trigram.compactSegments(spark, dir) == 2)
    val after = Trigram.searchSubstring(spark, dir, docs, $"doc_id", $"text",
      "window").as[Long].collect().toSet
    assert(after == before)
    intercept[IllegalArgumentException] {
      Trigram.appendSegment(docs, $"doc_id", $"text", dir, "b2", chunkSize = 8)
    }
  }

  test("serving plan pushes the gram filter into the postings scan") {
    val dir = tmpDir()
    Trigram.appendSegment(docs, $"doc_id", $"text", dir, "b0")
    val plan = Trigram.searchSubstring(spark, dir, docs, $"doc_id", $"text",
      "spark wind").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(gram"),
      s"gram filter should reach the parquet scan:\n$plan")
  }

  test("sub-trigram patterns are rejected toward a plain scan") {
    val dir = tmpDir()
    Trigram.appendSegment(docs, $"doc_id", $"text", dir, "b0")
    intercept[IllegalArgumentException] {
      Trigram.searchSubstring(spark, dir, docs, $"doc_id", $"text", "ab")
    }
  }

  test("posting rows are chunk-bounded") {
    val dir = tmpDir()
    val wide = (0L until 300L).map(i => (i, "aaaa")).toDF("doc_id", "text")
    Trigram.appendSegment(wide, $"doc_id", $"text", dir, "b0", chunkSize = 64)
    val rows = spark.read.parquet(s"$dir/segments/b0/postings")
      .select(size($"postings")).as[Int].collect()
    assert(rows.nonEmpty && rows.forall(_ <= 64))
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

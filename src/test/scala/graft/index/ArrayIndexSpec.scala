package graft.index

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.implicits._

/** Element-domain indexing of `array<primitive>` columns: per-block
  * element min/max + dict/bloom sketches answer `array_contains(col, v)`
  * as a FILE cut (a file with no element == v has no containing row),
  * while every row-domain consumer — metadata-only aggregates, top-k
  * bounds, null reasoning — must skip the element-domain field. */
class ArrayIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val work = Files.createTempDirectory("graft-arrayidx").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-arrayidx")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config(IndexConf.MetastoreLocation, s"$work/metastore")
    .config("spark.sql.warehouse.dir", s"$work/warehouse")
    .getOrCreate()

  // 16 files; file i holds arrays drawn from [i*100, i*100+99] plus one
  // shared string tag per file — element ranges are disjoint per file, so
  // a point containment provably cuts to one file
  private lazy val tablePath: String = {
    import spark.implicits._
    val p = s"$work/arr_table"
    val rows = (0 until 16).flatMap { f =>
      (0 until 50).map { r =>
        val base = f * 100L + r
        (f.toLong * 1000 + r,
          Seq(base, base + 1, base + 2),
          Seq(s"tag$f", s"row${f}_$r"))
      }
    }
    rows.toDF("id", "vals", "tags")
      .repartitionByRange(16, $"id")
      .write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("vals", "tags", "id").parquet(p)
    p
  }

  private def indexed: DataFrame = spark.index.parquet(tablePath)
  private def plain: DataFrame = spark.read.parquet(tablePath)

  private def listedFiles(df: DataFrame): (Long, Long) = {
    df.collect()
    val fi = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }
      .getOrElse(fail("not an indexed scan"))
    (fi.lastListedFiles, fi.lastTotalFiles)
  }

  private def checkSame(a: DataFrame, b: DataFrame): Unit = {
    val as = a.collect().map(_.toString).sorted.toSeq
    val bs = b.collect().map(_.toString).sorted.toSeq
    assert(as == bs, s"results differ: ${as.take(3)} vs ${bs.take(3)}")
  }

  test("array_contains on a long-array element cuts files and matches plain") {
    import spark.implicits._
    // 250 lives only in file 2's element range
    val q = indexed.filter(array_contains($"vals", 250L))
    checkSame(q, plain.filter(array_contains($"vals", 250L)))
    val (listed, total) = listedFiles(indexed.filter(array_contains($"vals", 250L)))
    assert(total == 16L, s"fixture must be 16 files, got $total")
    assert(listed <= 2L && listed >= 1L,
      s"element ranges are file-disjoint — expected <=2 files, listed $listed")
  }

  test("value outside every element range lists zero files") {
    import spark.implicits._
    val q = indexed.filter(array_contains($"vals", 99999L))
    assert(q.count() == 0L)
    val (listed, _) = listedFiles(indexed.filter(array_contains($"vals", 99999L)))
    assert(listed == 0L, s"no file's element range holds 99999, listed $listed")
  }

  test("string-array element membership prunes through the sketch") {
    import spark.implicits._
    val q = indexed.filter(array_contains($"tags", "tag7"))
    checkSame(q, plain.filter(array_contains($"tags", "tag7")))
    assert(q.count() == 50L)
    val (listed, total) = listedFiles(indexed.filter(array_contains($"tags", "tag7")))
    assert(listed < total, s"tag7 lives in one file: $listed/$total")
  }

  test("arrays_overlap with a literal array prunes by element IN-list") {
    import spark.implicits._
    // 250 and 840 live in files 2 and 8 respectively
    val probe = array(lit(250L), lit(840L))
    val q = indexed.filter(arrays_overlap($"vals", probe))
    checkSame(q, plain.filter(arrays_overlap($"vals", probe)))
    val (listed, total) = listedFiles(indexed.filter(arrays_overlap($"vals", probe)))
    assert(listed <= 4L && listed >= 2L,
      s"two probe values in file-disjoint ranges: expected <=4 of $total, listed $listed")
    // literal-on-the-left symmetric form
    val q2 = indexed.filter(arrays_overlap(probe, $"vals"))
    checkSame(q2, plain.filter(arrays_overlap(probe, $"vals")))
    // all-out-of-range probe lists zero files
    val none = indexed.filter(arrays_overlap($"vals", array(lit(88888L))))
    assert(none.count() == 0L)
    val (l0, _) = listedFiles(indexed.filter(arrays_overlap($"vals", array(lit(88888L)))))
    assert(l0 == 0L, s"no element range holds 88888, listed $l0")
  }

  test("conjunction with a scalar predicate composes both cuts") {
    import spark.implicits._
    val q = indexed.filter(array_contains($"vals", 250L) && $"id" >= 0L)
    checkSame(q, plain.filter(array_contains($"vals", 250L) && $"id" >= 0L))
  }

  test("null and empty arrays are never wrongly pruned; null literal bails") {
    import spark.implicits._
    val p = s"$work/arr_nulls"
    Seq(
      (1L, Seq(10L, 20L)),
      (2L, Seq.empty[Long]),
      (3L, null)
    ).toDF("id", "vals").coalesce(1).write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("vals").parquet(p)
    val t = spark.index.parquet(p)
    checkSame(t.filter(array_contains($"vals", 10L)),
      spark.read.parquet(p).filter(array_contains($"vals", 10L)))
    // array_contains(col, null) yields null/undefined matches — the
    // pre-translation must NOT fire; results equal the plain read
    checkSame(t.filter(array_contains($"vals", lit(null).cast("long"))),
      spark.read.parquet(p).filter(array_contains($"vals", lit(null).cast("long"))))
    // whole-array equality is fold-safe (type-gated to may-contain)
    checkSame(t.filter($"vals" === array(lit(10L), lit(20L))),
      spark.read.parquet(p).filter($"vals" === array(lit(10L), lit(20L))))
  }

  test("row-domain consumers skip element-domain fields") {
    import spark.implicits._
    // metadata-only aggregate must NOT answer from element stats: count
    // over the table is fine (row counts), but min/max of the array
    // column stays a scan and matches Spark's array ordering
    val mn = indexed.agg(min($"vals")).head.getSeq[Long](0)
    assert(mn == plain.agg(min($"vals")).head.getSeq[Long](0))
    // top-k over the array column must not be rewritten into an element
    // bound — plain sort semantics preserved
    val top = indexed.orderBy($"vals".desc).limit(3).collect().map(_.getSeq[Long](1))
    val expect = plain.orderBy($"vals".desc).limit(3).collect().map(_.getSeq[Long](1))
    assert(top.toSeq == expect.toSeq)
  }

  test("refresh: appended file's new element values are found and pruned to") {
    import spark.implicits._
    val p = s"$work/arr_refresh"
    Seq((1L, Seq(1L, 2L))).toDF("id", "vals")
      .coalesce(1).write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("vals").parquet(p)
    Seq((2L, Seq(7777L))).toDF("id", "vals")
      .coalesce(1).write.mode("append").parquet(p)
    spark.index.refresh.parquet(p)
    val q = spark.index.parquet(p).filter(array_contains($"vals", 7777L))
    assert(q.select($"id").as[Long].collect().toSeq == Seq(2L))
    val (listed, total) = listedFiles(
      spark.index.parquet(p).filter(array_contains($"vals", 7777L)))
    assert(total == 2L && listed == 1L, s"expected 1/2 files, got $listed/$total")
  }

  test("ORC: element-domain stats prune the same way") {
    import spark.implicits._
    val p = s"$work/arr_orc"
    (0 until 8).flatMap { f =>
      (0 until 20).map(r => (f.toLong * 100 + r, Seq(f * 100L + r, f * 100L + r + 1)))
    }.toDF("id", "vals")
      .repartitionByRange(8, $"id")
      .write.mode("overwrite").orc(p)
    spark.index.create.mode("overwrite").indexBy("vals").orc(p)
    val t = spark.index.orc(p)
    checkSame(t.filter(array_contains($"vals", 305L)),
      spark.read.orc(p).filter(array_contains($"vals", 305L)))
    val probe = t.filter(array_contains($"vals", 305L))
    probe.collect()
    val fi = probe.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }.get
    assert(fi.lastListedFiles < fi.lastTotalFiles,
      s"ORC element stats should cut: ${fi.lastListedFiles}/${fi.lastTotalFiles}")
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

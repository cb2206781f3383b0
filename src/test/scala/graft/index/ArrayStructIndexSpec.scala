package graft.index

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.implicits._

/** Element-domain indexing of struct LEAVES under one repeated level —
  * `events: array<struct<...>>`, the most common real-world nested shape.
  * Indexing `events.supp` records per-block min/max + dict/bloom over the
  * leaf values of every element, so `exists(events, x -> x.supp = v)` and
  * `array_contains(events.supp, v)` prune FILES (a file with no element
  * whose supp == v has no matching row); range conjuncts inside the
  * lambda cut by element min/max. Row-domain consumers skip the field —
  * the array-of-struct sibling of [[ArrayIndexSpec]]/[[MapIndexSpec]]. */
class ArrayStructIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val work = Files.createTempDirectory("graft-arrstructidx").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-arrstructidx")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config(IndexConf.MetastoreLocation, s"$work/metastore")
    .config("spark.sql.warehouse.dir", s"$work/warehouse")
    .getOrCreate()

  // 16 files; file i holds events whose supp values live in
  // [i*100, i*100+99] and whose qty mirrors supp — leaf domains are
  // file-disjoint, so a point probe provably cuts to one file
  private lazy val tablePath: String = {
    import spark.implicits._
    val p = s"$work/arrstruct_table"
    val rows = (0 until 16).flatMap { f =>
      (0 until 50).map { r =>
        val base = f * 100L + r
        (f.toLong * 1000 + r,
          Seq((base, base * 10, s"t$base"), (base + 1, base * 10 + 1, s"t${base + 1}")))
      }
    }
    rows.toDF("id", "raw")
      .select($"id", transform($"raw", x =>
        struct(x.getField("_1").as("supp"), x.getField("_2").as("qty"),
          x.getField("_3").as("tag"))).as("events"))
      .repartitionByRange(16, $"id")
      .write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite")
      .indexBy("events.supp", "events.tag", "id").parquet(p)
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

  test("exists(col, x -> x.leaf = v) cuts files and matches plain") {
    import spark.implicits._
    // 250 lives only in file 2's supp range
    def q(d: DataFrame) = d.filter(exists($"events", x => x.getField("supp") === 250L))
    checkSame(q(indexed), q(plain))
    val (listed, total) = listedFiles(q(indexed))
    assert(total == 16L, s"fixture must be 16 files, got $total")
    assert(listed <= 2L && listed >= 1L,
      s"supp ranges are file-disjoint — expected <=2 files, listed $listed")
  }

  test("leaf value outside every range lists zero files") {
    import spark.implicits._
    val q = indexed.filter(exists($"events", x => x.getField("supp") === 99999L))
    assert(q.count() == 0L)
    val (listed, _) = listedFiles(
      indexed.filter(exists($"events", x => x.getField("supp") === 99999L)))
    assert(listed == 0L, s"no file's supp range holds 99999, listed $listed")
  }

  test("array_contains(col.leaf, v) spelling prunes the same way") {
    import spark.implicits._
    def q(d: DataFrame) = d.filter(array_contains($"events.supp", 250L))
    checkSame(q(indexed), q(plain))
    val (listed, total) = listedFiles(q(indexed))
    assert(listed <= 2L, s"extraction spelling should cut: $listed/$total")
  }

  test("string leaf membership prunes through the sketch") {
    import spark.implicits._
    def q(d: DataFrame) = d.filter(exists($"events", x => x.getField("tag") === "t250"))
    checkSame(q(indexed), q(plain))
    val (listed, total) = listedFiles(q(indexed))
    assert(listed < total, s"t250 lives in one file: $listed/$total")
  }

  test("range conjunct inside the lambda cuts by element min/max") {
    import spark.implicits._
    // only the last file's supp range exceeds 1500
    def q(d: DataFrame) = d.filter(exists($"events", x => x.getField("supp") >= 1500L))
    checkSame(q(indexed), q(plain))
    val (listed, total) = listedFiles(q(indexed))
    assert(listed <= 2L, s"range cut expected <=2 of $total files, listed $listed")
    // conjunction: both leaves constrain the SAME witnessing element
    def q2(d: DataFrame) = d.filter(exists($"events",
      x => x.getField("supp") === 250L && x.getField("tag") === "t250"))
    checkSame(q2(indexed), q2(plain))
    val (l2, _) = listedFiles(q2(indexed))
    assert(l2 <= 2L, s"conjunct cut expected <=2 files, listed $l2")
  }

  test("string predicates inside the lambda cut by the leaf's byte range") {
    import spark.implicits._
    // LIKE 't25%' → StartsWith: only files whose tag range intersects
    // [t25, t26) survive the byte-range fold
    def q(d: DataFrame) = d.filter(exists($"events", x =>
      x.getField("tag").startsWith("t25")))
    checkSame(q(indexed), q(plain))
    val (listed, total) = listedFiles(q(indexed))
    assert(listed < total, s"prefix cut expected: $listed/$total")
    // contains/endsWith parity (no dict sketch on this fixture: correct,
    // unpruned)
    def qc(d: DataFrame) = d.filter(exists($"events", x =>
      x.getField("tag").contains("250")))
    checkSame(qc(indexed), qc(plain))
    def qe(d: DataFrame) = d.filter(exists($"events", x =>
      x.getField("tag").endsWith("250")))
    checkSame(qe(indexed), qe(plain))
  }

  test("exists over an UNINDEXED leaf or unsupported shape never misprunes") {
    import spark.implicits._
    // qty is not indexed: no cut, but correct results
    def q(d: DataFrame) = d.filter(exists($"events", x => x.getField("qty") === 2500L))
    checkSame(q(indexed), q(plain))
    // negated predicate inside the lambda must not prune (not translated)
    def qn(d: DataFrame) = d.filter(exists($"events", x => x.getField("supp") =!= 250L))
    checkSame(qn(indexed), qn(plain))
  }

  test("null/empty arrays and null leaves are never wrongly pruned") {
    import spark.implicits._
    val p = s"$work/arrstruct_nulls"
    val rows = Seq(
      (1L, Seq((Some(10L), "a"), (None, "b"))),
      (2L, Seq.empty[(Option[Long], String)]),
      (3L, null)
    )
    rows.toDF("id", "raw")
      .select($"id", transform($"raw", x =>
        struct(x.getField("_1").as("supp"), x.getField("_2").as("tag"))).as("events"))
      .coalesce(1).write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("events.supp").parquet(p)
    val t = spark.index.parquet(p)
    val pl = spark.read.parquet(p)
    def q(d: DataFrame) = d.filter(exists($"events", x => x.getField("supp") === 10L))
    checkSame(q(t), q(pl))
    assert(q(t).select($"id").as[Long].collect().toSeq == Seq(1L))
    // null literal: the translation must not fire; results equal plain
    def qn(d: DataFrame) = d.filter(
      exists($"events", x => x.getField("supp") === lit(null).cast("long")))
    checkSame(qn(t), qn(pl))
  }

  test("row-domain consumers skip element-domain struct leaves") {
    import spark.implicits._
    // metadata-only count must not consult the member-domain field
    assert(indexed.count() == plain.count())
    assert(indexed.agg(count($"events")).head.getLong(0) ==
      plain.agg(count($"events")).head.getLong(0))
  }

  test("paths through TWO repeated levels or maps are rejected") {
    import spark.implicits._
    val p = s"$work/arrstruct_deep"
    Seq((1L, Seq(Seq(1L, 2L)), Map("k" -> 1L)))
      .toDF("id", "nested", "m")
      .select($"id", transform($"nested", x => struct(x.as("inner"))).as("events"), $"m")
      .coalesce(1).write.mode("overwrite").parquet(p)
    // events.inner is array<array<long>> leaf: rejected (second repeated level)
    val e1 = intercept[IllegalArgumentException] {
      spark.index.create.mode("overwrite").indexBy("events.inner").parquet(p)
    }
    assert(e1.getMessage.contains("unsupported"))
    // path through a map is rejected
    val e2 = intercept[IllegalArgumentException] {
      spark.index.create.mode("overwrite").indexBy("m.k").parquet(p)
    }
    assert(e2.getMessage != null)
  }

  test("array-of-struct NESTED under a struct (payload.events.supp) indexes too") {
    import spark.implicits._
    val p = s"$work/arrstruct_nested"
    val rows = (0 until 8).flatMap { f =>
      (0 until 20).map { r =>
        val base = f * 100L + r
        (f.toLong * 100 + r, Seq(Tuple1(base), Tuple1(base + 1)))
      }
    }
    rows.toDF("id", "raw")
      .select($"id", struct(transform($"raw", x =>
        struct(x.getField("_1").as("supp"))).as("events")).as("payload"))
      .repartitionByRange(8, $"id")
      .write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("payload.events.supp").parquet(p)
    val t = spark.index.parquet(p)
    val pl = spark.read.parquet(p)
    def q(d: DataFrame) = d.filter(exists($"payload.events", x =>
      x.getField("supp") === 305L))
    checkSame(q(t), q(pl))
    val probe = q(t)
    probe.collect()
    val fi = probe.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }.get
    assert(fi.lastListedFiles < fi.lastTotalFiles,
      s"nested-prefix leaf should cut: ${fi.lastListedFiles}/${fi.lastTotalFiles}")
    // the extraction spelling over the nested path prunes the same way
    def q2(d: DataFrame) = d.filter(array_contains($"payload.events.supp", 305L))
    checkSame(q2(t), q2(pl))
  }

  test("refresh: appended file's new leaf values are found and pruned to") {
    import spark.implicits._
    val p = s"$work/arrstruct_refresh"
    def write(id: Long, supp: Long, mode: String): Unit =
      Seq((id, Seq(Tuple1(supp))))
        .toDF("id", "raw")
        .select($"id", transform($"raw", x =>
          struct(x.getField("_1").as("supp"))).as("events"))
        .coalesce(1).write.mode(mode).parquet(p)
    write(1L, 5L, "overwrite")
    spark.index.create.mode("overwrite").indexBy("events.supp").parquet(p)
    write(2L, 7777L, "append")
    spark.index.refresh.parquet(p)
    val q = spark.index.parquet(p)
      .filter(exists($"events", x => x.getField("supp") === 7777L))
    assert(q.select($"id").as[Long].collect().toSeq == Seq(2L))
    val (listed, total) = listedFiles(spark.index.parquet(p)
      .filter(exists($"events", x => x.getField("supp") === 7777L)))
    assert(total == 2L && listed == 1L, s"expected 1/2 files, got $listed/$total")
  }

  test("ORC: struct-leaf element stats prune the same way") {
    import spark.implicits._
    val p = s"$work/arrstruct_orc"
    val rows = (0 until 8).flatMap { f =>
      (0 until 20).map { r =>
        val base = f * 100L + r
        (f.toLong * 100 + r, Seq((base, s"t$base"), (base + 1, s"t${base + 1}")))
      }
    }
    rows.toDF("id", "raw")
      .select($"id", transform($"raw", x =>
        struct(x.getField("_1").as("supp"), x.getField("_2").as("tag"))).as("events"))
      .repartitionByRange(8, $"id")
      .write.mode("overwrite").orc(p)
    spark.index.create.mode("overwrite").indexBy("events.supp").orc(p)
    val t = spark.index.orc(p)
    def q(d: DataFrame) = d.filter(exists($"events", x => x.getField("supp") === 305L))
    checkSame(q(t), q(spark.read.orc(p)))
    val probe = q(t)
    probe.collect()
    val fi = probe.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }.get
    assert(fi.lastListedFiles < fi.lastTotalFiles,
      s"ORC struct-leaf stats should cut: ${fi.lastListedFiles}/${fi.lastTotalFiles}")
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

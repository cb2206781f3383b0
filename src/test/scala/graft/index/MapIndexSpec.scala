package graft.index

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.implicits._

/** Key-domain indexing of `map<primitive, _>` columns: per-block key
  * min/max + dict/bloom sketches answer `map_contains_key(col, k)` and
  * `col[k] = v` as a FILE cut (a file with no entry keyed k has no
  * matching row), while every row-domain consumer — metadata-only
  * aggregates, top-k bounds, null reasoning — must skip the key-domain
  * field. The map twin of [[ArrayIndexSpec]]. */
class MapIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val work = Files.createTempDirectory("graft-mapidx").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-mapidx")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config(IndexConf.MetastoreLocation, s"$work/metastore")
    .config("spark.sql.warehouse.dir", s"$work/warehouse")
    .getOrCreate()

  // 16 files; file i holds maps keyed from [i*100, i*100+99] plus one
  // shared string-keyed map per file — key ranges are disjoint per file,
  // so a point key-membership provably cuts to one file
  private lazy val tablePath: String = {
    import spark.implicits._
    val p = s"$work/map_table"
    val rows = (0 until 16).flatMap { f =>
      (0 until 50).map { r =>
        val base = f * 100L + r
        (f.toLong * 1000 + r,
          Map(base -> base * 10, (base + 1) -> (base * 10 + 1)),
          Map(s"tag$f" -> r.toLong, s"row${f}_$r" -> base))
      }
    }
    rows.toDF("id", "kv", "skv")
      .repartitionByRange(16, $"id")
      .write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("kv", "skv", "id").parquet(p)
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

  test("map_contains_key on a long-key map cuts files and matches plain") {
    import spark.implicits._
    // 250 lives only in file 2's key range
    val q = indexed.filter(map_contains_key($"kv", 250L))
    checkSame(q, plain.filter(map_contains_key($"kv", 250L)))
    val (listed, total) = listedFiles(indexed.filter(map_contains_key($"kv", 250L)))
    assert(total == 16L, s"fixture must be 16 files, got $total")
    assert(listed <= 2L && listed >= 1L,
      s"key ranges are file-disjoint — expected <=2 files, listed $listed")
  }

  test("key outside every range lists zero files") {
    import spark.implicits._
    val q = indexed.filter(map_contains_key($"kv", 99999L))
    assert(q.count() == 0L)
    val (listed, _) = listedFiles(indexed.filter(map_contains_key($"kv", 99999L)))
    assert(listed == 0L, s"no file's key range holds 99999, listed $listed")
  }

  test("string-key membership prunes through the sketch") {
    import spark.implicits._
    val q = indexed.filter(map_contains_key($"skv", "tag7"))
    checkSame(q, plain.filter(map_contains_key($"skv", "tag7")))
    assert(q.count() == 50L)
    val (listed, total) = listedFiles(indexed.filter(map_contains_key($"skv", "tag7")))
    assert(listed < total, s"tag7 keys live in one file: $listed/$total")
  }

  test("m[k] = v equality implies key presence and prunes the same way") {
    import spark.implicits._
    // kv[250] = 2500 holds in exactly one row of file 2
    val q = indexed.filter($"kv".getItem(250L) === 2500L)
    checkSame(q, plain.filter($"kv".getItem(250L) === 2500L))
    val (listed, total) = listedFiles(indexed.filter($"kv".getItem(250L) === 2500L))
    assert(listed <= 2L, s"value-equality cuts by KEY membership: $listed/$total")
    // literal-on-the-left symmetric form
    checkSame(indexed.filter(lit(2500L) === $"kv".getItem(250L)),
      plain.filter(lit(2500L) === $"kv".getItem(250L)))
    // an equality whose VALUE never occurs still only cuts by key — rows
    // with the key but another value are filtered by the scan, not us
    assert(indexed.filter($"kv".getItem(250L) === -1L).count() == 0L)
    // m[k] IS NOT NULL is the same key-presence probe
    val nn = indexed.filter($"kv".getItem(250L).isNotNull)
    checkSame(nn, plain.filter($"kv".getItem(250L).isNotNull))
    val (ln, tn) = listedFiles(indexed.filter($"kv".getItem(250L).isNotNull))
    assert(ln <= 2L, s"IS NOT NULL cuts by KEY membership: $ln/$tn")
  }

  test("conjunction with a scalar predicate composes both cuts") {
    import spark.implicits._
    val q = indexed.filter(map_contains_key($"kv", 250L) && $"id" >= 0L)
    checkSame(q, plain.filter(map_contains_key($"kv", 250L) && $"id" >= 0L))
  }

  test("null and empty maps are never wrongly pruned; null key literal bails") {
    import spark.implicits._
    val p = s"$work/map_nulls"
    Seq(
      (1L, Map(10L -> 1L, 20L -> 2L)),
      (2L, Map.empty[Long, Long]),
      (3L, null)
    ).toDF("id", "kv").coalesce(1).write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("kv").parquet(p)
    val t = spark.index.parquet(p)
    checkSame(t.filter(map_contains_key($"kv", 10L)),
      spark.read.parquet(p).filter(map_contains_key($"kv", 10L)))
    // map_contains_key(col, null) yields null matches — the
    // pre-translation must NOT fire; results equal the plain read
    checkSame(t.filter(map_contains_key($"kv", lit(null).cast("long"))),
      spark.read.parquet(p).filter(map_contains_key($"kv", lit(null).cast("long"))))
    // m[k] = null is never true; the key-equality translation must not
    // fire on a null VALUE literal either
    checkSame(t.filter($"kv".getItem(10L) === lit(null).cast("long")),
      spark.read.parquet(p).filter($"kv".getItem(10L) === lit(null).cast("long")))
  }

  test("row-domain consumers skip key-domain fields") {
    import spark.implicits._
    // count(mapCol) needs per-row null counts, which the key domain
    // suppresses — must full-scan and match plain exactly
    assert(indexed.agg(count($"kv")).head.getLong(0) ==
      plain.agg(count($"kv")).head.getLong(0))
    // metadata-only count over row domain still works on the same index
    assert(indexed.count() == plain.count())
  }

  test("refresh: appended file's new keys are found and pruned to") {
    import spark.implicits._
    val p = s"$work/map_refresh"
    Seq((1L, Map(1L -> 1L, 2L -> 2L))).toDF("id", "kv")
      .coalesce(1).write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("kv").parquet(p)
    Seq((2L, Map(7777L -> 1L))).toDF("id", "kv")
      .coalesce(1).write.mode("append").parquet(p)
    spark.index.refresh.parquet(p)
    val q = spark.index.parquet(p).filter(map_contains_key($"kv", 7777L))
    assert(q.select($"id").as[Long].collect().toSeq == Seq(2L))
    val (listed, total) = listedFiles(
      spark.index.parquet(p).filter(map_contains_key($"kv", 7777L)))
    assert(total == 2L && listed == 1L, s"expected 1/2 files, got $listed/$total")
  }

  test("ORC: key-domain stats prune the same way") {
    import spark.implicits._
    val p = s"$work/map_orc"
    (0 until 8).flatMap { f =>
      (0 until 20).map(r =>
        (f.toLong * 100 + r, Map(f * 100L + r -> r.toLong, f * 100L + r + 1 -> r.toLong)))
    }.toDF("id", "kv")
      .repartitionByRange(8, $"id")
      .write.mode("overwrite").orc(p)
    spark.index.create.mode("overwrite").indexBy("kv").orc(p)
    val t = spark.index.orc(p)
    checkSame(t.filter(map_contains_key($"kv", 305L)),
      spark.read.orc(p).filter(map_contains_key($"kv", 305L)))
    val probe = t.filter(map_contains_key($"kv", 305L))
    probe.collect()
    val fi = probe.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }.get
    assert(fi.lastListedFiles < fi.lastTotalFiles,
      s"ORC key stats should cut: ${fi.lastListedFiles}/${fi.lastTotalFiles}")
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

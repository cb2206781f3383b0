package graft.index

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.implicits._

/** VALUE-domain indexing of `map<primitive, primitive>` columns: indexing
  * a map now also records per-block min/max + sketches over the entry
  * VALUES (field `m#value`), so `m[k] = v` prunes by value membership of
  * v INTERSECTED with key membership of k. The fixture keys every map
  * with the SAME small key set (key-only pruning can't cut anything) but
  * file-disjoint value ranges — any cut observed is the value domain's. */
class MapValueIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val work = Files.createTempDirectory("graft-mapvalidx").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-mapvalidx")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config(IndexConf.MetastoreLocation, s"$work/metastore")
    .config("spark.sql.warehouse.dir", s"$work/warehouse")
    .getOrCreate()

  // 16 files; every row's map has keys {"lo", "hi"} (key domain is
  // file-UNIFORM — key membership cuts nothing) while the values of file
  // i live in [i*100, i*100+99] — value ranges are file-disjoint
  private lazy val tablePath: String = {
    import spark.implicits._
    val p = s"$work/mapval_table"
    val rows = (0 until 16).flatMap { f =>
      (0 until 50).map { r =>
        val base = f * 100L + r
        (f.toLong * 1000 + r, Map("lo" -> base, "hi" -> (base + 1)))
      }
    }
    rows.toDF("id", "kv")
      .repartitionByRange(16, $"id")
      .write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("kv", "id").parquet(p)
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

  test("m[k] = v cuts by VALUE membership where keys are uniform") {
    import spark.implicits._
    // key "lo" is in every file; value 250 only in file 2's range
    def q(d: DataFrame) = d.filter($"kv".getItem("lo") === 250L)
    checkSame(q(indexed), q(plain))
    val (listed, total) = listedFiles(q(indexed))
    assert(total == 16L, s"fixture must be 16 files, got $total")
    assert(listed <= 2L && listed >= 1L,
      s"value ranges are file-disjoint — expected <=2 files, listed $listed")
  }

  test("value outside every range lists zero files") {
    import spark.implicits._
    val q = indexed.filter($"kv".getItem("lo") === 99999L)
    assert(q.count() == 0L)
    val (listed, _) = listedFiles(indexed.filter($"kv".getItem("lo") === 99999L))
    assert(listed == 0L, s"no file's value range holds 99999, listed $listed")
  }

  test("range and IN comparisons on m[k] cut by the value domain") {
    import spark.implicits._
    // only file 15's values exceed 1500
    def qr(d: DataFrame) = d.filter($"kv".getItem("hi") >= 1500L)
    checkSame(qr(indexed), qr(plain))
    val (lr, _) = listedFiles(qr(indexed))
    assert(lr <= 2L, s"range cut expected <=2 files, listed $lr")
    // literal-on-the-left flips the operator
    def qrl(d: DataFrame) = d.filter(lit(120L) > $"kv".getItem("lo"))
    checkSame(qrl(indexed), qrl(plain))
    val (ll, _) = listedFiles(qrl(indexed))
    assert(ll <= 2L, s"flipped range cut expected <=2 files, listed $ll")
    // IN list of values from two files
    def qi(d: DataFrame) = d.filter($"kv".getItem("lo").isin(250L, 1250L))
    checkSame(qi(indexed), qi(plain))
    val (li, _) = listedFiles(qi(indexed))
    assert(li <= 4L, s"IN cut expected <=4 files, listed $li")
    // null probe values never widen the cut unsoundly
    def qn(d: DataFrame) = d.filter($"kv".getItem("lo")
      .isin(lit(250L), lit(null).cast("long")))
    checkSame(qn(indexed), qn(plain))
  }

  test("element_at spelling and positional array lookups cut the same way") {
    import spark.implicits._
    // try_element_at never errors (failOnError=false) — the ElementAt
    // translation fires and the value domain cuts
    def qt(d: DataFrame) = d.filter(try_element_at($"kv", lit("lo")) === 250L)
    checkSame(qt(indexed), qt(plain))
    val (l, _) = listedFiles(qt(indexed))
    assert(l <= 2L, s"try_element_at value cut expected <=2 files, listed $l")
    // ANSI element_at ERRORS on a missing key — the translation must NOT
    // fire (pruning would silence the error), but results stay correct
    def q(d: DataFrame) = d.filter(element_at($"kv", "lo") === 250L)
    checkSame(q(indexed), q(plain))
    // positional array lookup over an element-domain indexed array
    val p = s"$work/mapval_arrpos"
    (0 until 8).flatMap { f =>
      (0 until 20).map(r => (f.toLong * 100 + r, Seq(f * 100L + r, f * 100L + r + 1)))
    }.toDF("id", "vals")
      .repartitionByRange(8, $"id")
      .write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("vals").parquet(p)
    val t = spark.index.parquet(p)
    val pl = spark.read.parquet(p)
    // try_element_at is 1-based and null-on-out-of-bounds: translation fires
    def qa(d: DataFrame) = d.filter(try_element_at($"vals", lit(1)) === 305L)
    checkSame(qa(t), qa(pl))
    val probe = qa(t)
    probe.collect()
    val fi = probe.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }.get
    assert(fi.lastListedFiles < fi.lastTotalFiles,
      s"try_element_at element cut: ${fi.lastListedFiles}/${fi.lastTotalFiles}")
    // range form through the same translation
    def qar(d: DataFrame) = d.filter(try_element_at($"vals", lit(2)) >= 700L)
    checkSame(qar(t), qar(pl))
    // ANSI arr[i] (GetArrayItem, failOnError) stays untranslated but correct
    def qansi(d: DataFrame) = d.filter($"vals".getItem(0) === 305L)
    checkSame(qansi(t), qansi(pl))
    // ordinal 0 THROWS unconditionally even in try_element_at (array
    // ordinals are 1-based; 0 is INVALID_ARRAY_INDEX, not null). The
    // translation must NOT fire: with a probe value absent from every
    // file, an unguarded element cut would empty the listing and return
    // silent zero rows instead of the mandatory runtime error.
    def q0(d: DataFrame) = d.filter(try_element_at($"vals", lit(0)) === -999L)
    val ePlain = intercept[Exception] { q0(pl).collect() }
    val eIdx = intercept[Exception] { q0(t).collect() }
    assert(eIdx.getClass == ePlain.getClass,
      s"indexed path must surface the same ordinal-0 error: " +
        s"${eIdx.getClass} vs ${ePlain.getClass}")
  }

  test("map_values membership prunes by the value domain") {
    import spark.implicits._
    def q(d: DataFrame) = d.filter(array_contains(map_values($"kv"), 250L))
    checkSame(q(indexed), q(plain))
    val (listed, total) = listedFiles(q(indexed))
    assert(listed <= 2L, s"value membership should cut: $listed/$total")
    // exists over map_values with a range predicate
    def qe(d: DataFrame) = d.filter(exists(map_values($"kv"), x => x >= 1500L))
    checkSame(qe(indexed), qe(plain))
  }

  test("key membership still intersects: absent key prunes even with a live value") {
    import spark.implicits._
    // value 250 exists (file 2) but key "absent" exists nowhere — the key
    // cut alone empties the listing
    def q(d: DataFrame) = d.filter($"kv".getItem("absent") === 250L)
    checkSame(q(indexed), q(plain))
    val (listed, _) = listedFiles(q(indexed))
    assert(listed == 0L, s"key-domain cut must still apply, listed $listed")
  }

  test("key-only probes keep working and value equality never misprunes a match") {
    import spark.implicits._
    def q(d: DataFrame) = d.filter(map_contains_key($"kv", "hi"))
    checkSame(q(indexed), q(plain))
    assert(q(indexed).count() == 800L)
    // literal-on-the-left symmetric form
    checkSame(indexed.filter(lit(251L) === $"kv".getItem("hi")),
      plain.filter(lit(251L) === $"kv".getItem("hi")))
  }

  test("unsupported VALUE types index the key domain only") {
    import spark.implicits._
    val p = s"$work/mapval_unsupported"
    Seq((1L, Map("a" -> Seq(1L, 2L)))).toDF("id", "kv")
      .coalesce(1).write.mode("overwrite").parquet(p)
    // value type array<long> is not canonizable — key-domain field only
    spark.index.create.mode("overwrite").indexBy("kv").parquet(p)
    val t = spark.index.parquet(p)
    checkSame(t.filter(map_contains_key($"kv", "a")),
      spark.read.parquet(p).filter(map_contains_key($"kv", "a")))
  }

  test("null map values are never wrongly pruned") {
    import spark.implicits._
    val p = s"$work/mapval_nulls"
    Seq(
      (1L, Map("a" -> Some(10L), "b" -> None)),
      (2L, Map.empty[String, Option[Long]])
    ).toDF("id", "kv").coalesce(1).write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("kv").parquet(p)
    val t = spark.index.parquet(p)
    val pl = spark.read.parquet(p)
    checkSame(t.filter($"kv".getItem("a") === 10L), pl.filter($"kv".getItem("a") === 10L))
    // null VALUE literal: translation must not fire
    checkSame(t.filter($"kv".getItem("a") === lit(null).cast("long")),
      pl.filter($"kv".getItem("a") === lit(null).cast("long")))
    // IS NOT NULL keys on key membership only (value unknown)
    checkSame(t.filter($"kv".getItem("b").isNotNull),
      pl.filter($"kv".getItem("b").isNotNull))
  }

  test("version: collection-domain indexes write v5; scalar indexes stay v3-readable") {
    import spark.implicits._
    // the fixture index carries a map value field -> v5
    val meta5 = new Metastore(spark, IndexConf(spark, Map.empty))
      .load(Metastore.Dataspace, IndexedDataSource.resolveTablePath(spark, tablePath))._2
    assert(meta5.version == 5, s"map-value index must be v5, got ${meta5.version}")
    // a scalar-only index writes the LOWEST descriptive version (v3) so
    // pre-collection-domain binaries can still read it
    val p = s"$work/mapval_scalar"
    Seq((1L, "x")).toDF("id", "s").coalesce(1).write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("id", "s").parquet(p)
    val meta3 = new Metastore(spark, IndexConf(spark, Map.empty))
      .load(Metastore.Dataspace, IndexedDataSource.resolveTablePath(spark, p))._2
    assert(meta3.version == 3, s"scalar index must be v3, got ${meta3.version}")
    assert(spark.index.parquet(p).count() == 1L)
  }

  test("row-domain consumers skip the value-domain field") {
    import spark.implicits._
    assert(indexed.count() == plain.count())
    assert(indexed.agg(count($"kv")).head.getLong(0) ==
      plain.agg(count($"kv")).head.getLong(0))
  }

  test("ORC: value-domain stats prune the same way") {
    import spark.implicits._
    val p = s"$work/mapval_orc"
    (0 until 8).flatMap { f =>
      (0 until 20).map(r => (f.toLong * 100 + r, Map("lo" -> (f * 100L + r))))
    }.toDF("id", "kv")
      .repartitionByRange(8, $"id")
      .write.mode("overwrite").orc(p)
    spark.index.create.mode("overwrite").indexBy("kv").orc(p)
    val t = spark.index.orc(p)
    def q(d: DataFrame) = d.filter($"kv".getItem("lo") === 305L)
    checkSame(q(t), q(spark.read.orc(p)))
    val probe = q(t)
    probe.collect()
    val fi = probe.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }.get
    assert(fi.lastListedFiles < fi.lastTotalFiles,
      s"ORC value stats should cut: ${fi.lastListedFiles}/${fi.lastTotalFiles}")
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

package graft.index

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.implicits._

/** Multi-root / glob tables (extension over the reference's single
  * non-glob dir, IndexedDataSource.scala:173-177): one index over a
  * resolved ROOT SET — create/load/exists/delete/refresh address the
  * set, pruning and results treat the union of roots as one table. */
class MultiRootIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val work = Files.createTempDirectory("graft-multiroot").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-multiroot-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config(IndexConf.MetastoreLocation, s"$work/metastore")
    .getOrCreate()

  import spark.implicits._

  // lineitem split into two sibling roots by orderkey parity — the
  // "same table landed in two directories" shape
  private lazy val (rootA, rootB) = {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val a = s"$work/roots/lineitem_even"
    val b = s"$work/roots/lineitem_odd"
    li.filter($"l_orderkey" % 2 === 0).repartition(4, $"l_orderkey")
      .write.parquet(a)
    li.filter($"l_orderkey" % 2 === 1).repartition(4, $"l_orderkey")
      .write.parquet(b)
    (a, b)
  }

  private def plainUnion: DataFrame =
    spark.read.parquet(rootA, rootB)

  private def checkSame(indexed: DataFrame, plain: DataFrame): Unit = {
    val a = indexed.collect().map(_.toString).sorted
    val b = plain.collect().map(_.toString).sorted
    assert(a.length == b.length, s"row count: indexed=${a.length} plain=${b.length}")
    assert(a.sameElements(b), "row contents differ")
  }

  /** (listed, total) from the GraftFileIndex's telemetry after running
    * the query — the pruned listing, not a fresh unfiltered one. */
  private def listedFiles(df: DataFrame): (Long, Long) = {
    df.collect()
    val fi = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collectFirst {
      case g: org.apache.spark.sql.graft.GraftFileIndex => g
    }.get
    (fi.lastListedFiles, fi.lastTotalFiles)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.index.create.mode("overwrite")
      .indexBy("l_orderkey", "l_returnflag")
      .parquet(rootA, rootB)
  }

  test("create over two roots; load returns the exact union") {
    val indexed = spark.index.parquet(rootA, rootB)
    checkSame(indexed, plainUnion)
    assert(indexed.count() == plainUnion.count())
  }

  test("selective point query prunes across BOTH roots' files") {
    val key = plainUnion.agg(min($"l_orderkey")).head.getLong(0)
    val q = spark.index.parquet(rootA, rootB).filter($"l_orderkey" === key)
    checkSame(q, plainUnion.filter($"l_orderkey" === key))
    val (listed, total) = listedFiles(q)
    assert(total == 8, s"expected 8 files across both roots, total=$total")
    assert(listed < total, s"expected pruning below $total files, listed $listed")
  }

  test("glob spec resolves to the same index entry as the explicit list") {
    // the glob expands to exactly {rootA, rootB}; same sorted set ->
    // same metastore entry, so exists is true without another create
    assert(spark.index.exists.parquet(s"$work/roots/lineitem_*"))
    val viaGlob = spark.index.parquet(s"$work/roots/lineitem_*")
    checkSame(viaGlob, plainUnion)
  }

  test("the set keys the entry: single roots and other sets are separate") {
    assert(!spark.index.exists.parquet(rootA))
    assert(!spark.index.exists.parquet(rootB))
  }

  test("multi-root metadata writes v6 and records every root") {
    val ms = new Metastore(spark, IndexConf(spark))
    val roots = IndexedDataSource.resolveTableRoots(spark, Seq(rootA, rootB))
    val (_, meta) = ms.load(Metastore.Dataspace, roots)
    assert(meta.version == 6, s"multi-root index must be v6, got ${meta.version}")
    assert(meta.tablePaths.size == 2)
    assert(meta.rootPathStrings.size == 2)
  }

  test("nested roots are rejected") {
    val inner = s"$rootA/inner"
    spark.range(2).write.mode("overwrite").parquet(inner)
    val e = intercept[IllegalArgumentException] {
      IndexedDataSource.resolveTableRoots(spark, Seq(rootA, inner))
    }
    assert(e.getMessage.contains("must not nest"))
    // cleanup so the union table stays two clean roots
    val p = new org.apache.hadoop.fs.Path(inner)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  test("refresh picks up a new file under one root of the set") {
    val before = spark.index.parquet(rootA, rootB).count()
    val extra = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter($"l_orderkey" % 2 === 0).limit(50)
    extra.coalesce(1).write.mode("append").parquet(rootA)
    val stats = spark.index.refresh.parquet(rootA, rootB)
    assert(stats.addedFiles >= 1, s"expected added files, got $stats")
    val after = spark.index.parquet(rootA, rootB)
    checkSame(after, plainUnion)
    assert(after.count() == before + 50)
  }

  test("delete removes only the set's entry") {
    // a separate single-root index must survive the set delete
    spark.index.create.mode("overwrite").indexBy("l_orderkey").parquet(rootB)
    assert(spark.index.exists.parquet(rootB))
    spark.index.delete.parquet(rootA, rootB)
    assert(!spark.index.exists.parquet(rootA, rootB))
    assert(spark.index.exists.parquet(rootB))
    spark.index.delete.parquet(rootB)
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

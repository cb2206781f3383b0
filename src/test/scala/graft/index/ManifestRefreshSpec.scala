package graft.index

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.implicits._

/** The dir-mtime manifest tier of the distributed refresh listing: a
  * persisted (dir, mtime, capturedAt) table lets a refresh PROBE every
  * known dir's mtime in one small job and re-list ONLY the dirs that
  * changed — rename-based writers always bump the parent dir's mtime on
  * add/remove, so an unchanged (slack-safe) mtime proves the stored
  * rows for that dir are current. */
class ManifestRefreshSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val work = Files.createTempDirectory("graft-manifest").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-manifest-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config(IndexConf.MetastoreLocation, s"$work/metastore")
    .getOrCreate()

  import spark.implicits._

  // slack 0: local-FS mtimes are millisecond-granular and the create's
  // stats jobs put real time between file writes and capture, so the
  // very first refresh can already skip unchanged dirs
  private val opts = Map(
    IndexConf.DistributedPruningThreshold -> "1",
    // "auto" would disable the tier for file:// roots — force it on
    IndexConf.RefreshDirManifest -> "true",
    IndexConf.RefreshDirMtimeSlack -> "0")

  private val tablePath = s"$work/orders_part"

  private def refresh() =
    IndexedDataSource.refreshIndex(spark, tablePath, Metastore.Dataspace, opts)

  private def checkSame(): Unit = {
    val a = spark.index.parquet(tablePath).collect().map(_.toString).sorted
    val b = spark.read.parquet(tablePath).collect().map(_.toString).sorted
    assert(a.length == b.length && a.sameElements(b), "indexed != plain")
  }

  private lazy val years: Seq[Int] = {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(tablePath)
    orders.select("o_year").distinct().as[Int].collect().sorted.toSeq
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    years // build fixture
    spark.index.create.mode("overwrite").options(opts)
      .indexBy("o_custkey").parquet(tablePath)
  }

  test("create seeds the manifest; a no-change refresh probes and skips every dir") {
    val ms = new Metastore(spark, IndexConf(spark, opts))
    val roots = IndexedDataSource.resolveTableRoots(spark, Seq(tablePath))
    val indexDir = ms.location(Metastore.Dataspace, roots)
    val fs = ms.fs
    assert(fs.exists(new org.apache.hadoop.fs.Path(indexDir, Metastore.DirsDir)),
      "create at distributed scale must seed the dirs manifest")
    IndexedDataSource.lastManifestStats = None
    assert(refresh() == IndexedDataSource.RefreshStats(0L, 0L))
    val (probed, changed, deleted, unchanged) =
      IndexedDataSource.lastManifestStats.getOrElse(fail("manifest tier did not run"))
    // root + one dir per year partition
    assert(probed == years.size + 1L, s"probed $probed of ${years.size + 1}")
    assert(deleted == 0L)
    assert(changed + unchanged == probed)
    assert(unchanged > 0L, "slack-safe dirs must be skipped, not re-listed")
  }

  test("append to ONE partition: only that dir re-lists, delta indexed") {
    val before = spark.read.parquet(tablePath).count()
    val y = years.head
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .filter(col("o_year") === y).limit(40).drop("o_year")
      .coalesce(1).write.mode("append").parquet(s"$tablePath/o_year=$y")
    IndexedDataSource.lastManifestStats = None
    val stats = refresh()
    assert(stats.addedFiles == 1L && stats.removedFiles == 0L, s"got $stats")
    val (probed, changed, deleted, unchanged) =
      IndexedDataSource.lastManifestStats.getOrElse(fail("manifest tier did not run"))
    assert(changed == 1L,
      s"exactly the appended partition dir must re-list, got changed=$changed " +
        s"(probed=$probed unchanged=$unchanged)")
    assert(deleted == 0L)
    assert(spark.read.parquet(tablePath).count() == before + 40)
    checkSame()
  }

  test("new partition dir: the root's mtime flags it, values append") {
    val newYear = years.max + 50
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .limit(25).coalesce(1)
      .write.mode("append").parquet(s"$tablePath/o_year=$newYear")
    IndexedDataSource.lastManifestStats = None
    val stats = refresh()
    assert(stats.addedFiles == 1L && stats.removedFiles == 0L, s"got $stats")
    val (_, changed, _, _) =
      IndexedDataSource.lastManifestStats.getOrElse(fail("manifest tier did not run"))
    // the ROOT changed (new child dir); the new dir itself is
    // manifest-unknown and discovered by the walk, not counted in changed
    assert(changed == 1L, s"only the root should re-list, got $changed")
    checkSame()
    val q = spark.index.parquet(tablePath).filter(col("o_year") === newYear)
    assert(q.count() == 25)
  }

  test("deleted partition dir: rows drop, manifest forgets the dir") {
    val y = years.last
    val victim = new org.apache.hadoop.fs.Path(s"$tablePath/o_year=$y")
    val vfs = victim.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victimRows = spark.read.parquet(tablePath)
      .filter(col("o_year") === y).count()
    assert(vfs.delete(victim, true))
    IndexedDataSource.lastManifestStats = None
    val stats = refresh()
    assert(stats.removedFiles >= 1L && stats.addedFiles == 0L, s"got $stats")
    checkSame()
    assert(spark.index.parquet(tablePath).filter(col("o_year") === y).count() == 0)
    val (probedBefore, _, deleted, _) =
      IndexedDataSource.lastManifestStats.getOrElse(fail("manifest tier did not run"))
    assert(deleted == 1L, s"the dropped dir must probe as deleted, got $deleted")
    assert(victimRows > 0)
    // next refresh probes one dir fewer — the manifest forgot it
    IndexedDataSource.lastManifestStats = None
    assert(refresh() == IndexedDataSource.RefreshStats(0L, 0L))
    val (probedAfter, _, _, _) =
      IndexedDataSource.lastManifestStats.getOrElse(fail("manifest tier did not run"))
    assert(probedAfter == probedBefore - 1,
      s"probed $probedAfter, want ${probedBefore - 1}")
  }

  test("auto mode never engages for file:// roots (scheme-gated)") {
    IndexedDataSource.lastManifestStats = None
    val auto = opts + (IndexConf.RefreshDirManifest -> "auto")
    val stats = IndexedDataSource.refreshIndex(
      spark, tablePath, Metastore.Dataspace, auto)
    assert(stats == IndexedDataSource.RefreshStats(0L, 0L))
    assert(IndexedDataSource.lastManifestStats.isEmpty,
      "auto must not engage the tier on a local (non-whitelisted) scheme")
    checkSame()
  }

  test("mtime 0 is never trusted: such a dir re-lists on every refresh") {
    // settle to a clean manifest first
    assert(refresh() == IndexedDataSource.RefreshStats(0L, 0L))
    val y = years(1)
    val victim = java.nio.file.Paths.get(s"$work/orders_part/o_year=$y")
    val origMtime = java.nio.file.Files.getLastModifiedTime(victim)
    try {
      // synthetic-directory simulation: an object store reports mtime 0
      java.nio.file.Files.setLastModifiedTime(
        victim, java.nio.file.attribute.FileTime.fromMillis(0L))
      (1 to 2).foreach { i =>
        IndexedDataSource.lastManifestStats = None
        assert(refresh() == IndexedDataSource.RefreshStats(0L, 0L))
        val (_, changed, _, _) = IndexedDataSource.lastManifestStats
          .getOrElse(fail("manifest tier did not run"))
        assert(changed >= 1L,
          s"refresh #$i must treat the mtime-0 dir as changed (always re-list)")
      }
    } finally {
      java.nio.file.Files.setLastModifiedTime(victim, origMtime)
    }
  }

  test("fullWalk option heals a preserved-mtime blind spot the probe misses") {
    // settle: manifest current, nothing to do
    assert(refresh() == IndexedDataSource.RefreshStats(0L, 0L))
    val y = years(2)
    val dir = java.nio.file.Paths.get(s"$work/orders_part/o_year=$y")
    val origMtime = java.nio.file.Files.getLastModifiedTime(dir)
    // land a new file, then restore the dir's mtime — the adversarial
    // writer the manifest tier documents as invisible
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .filter(col("o_year") === y).limit(10).drop("o_year")
      .coalesce(1).write.mode("append").parquet(s"$tablePath/o_year=$y")
    java.nio.file.Files.setLastModifiedTime(dir, origMtime)
    // the probe-guided refresh is blind to it (this IS the blind spot)
    IndexedDataSource.lastManifestStats = None
    assert(refresh() == IndexedDataSource.RefreshStats(0L, 0L),
      "probe-guided refresh seeing the hidden file would make this test vacuous")
    // the escape hatch walks everything and picks the file up
    val stats = IndexedDataSource.refreshIndex(spark, tablePath,
      Metastore.Dataspace, opts + (IndexConf.RefreshFullWalk -> "true"))
    assert(stats == IndexedDataSource.RefreshStats(1L, 0L), s"got $stats")
    checkSame()
    // and the manifest was REBUILT by the walk: the next probe-guided
    // refresh runs the tier and is current
    IndexedDataSource.lastManifestStats = None
    assert(refresh() == IndexedDataSource.RefreshStats(0L, 0L))
    assert(IndexedDataSource.lastManifestStats.nonEmpty,
      "tier must resume after the full walk")
  }

  test("manifest off: refresh works without the tier (full walk)") {
    IndexedDataSource.lastManifestStats = None
    val noManifest = opts + (IndexConf.RefreshDirManifest -> "false")
    val stats = IndexedDataSource.refreshIndex(
      spark, tablePath, Metastore.Dataspace, noManifest)
    assert(stats == IndexedDataSource.RefreshStats(0L, 0L))
    assert(IndexedDataSource.lastManifestStats.isEmpty,
      "manifest tier must not run when disabled")
    checkSame()
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

package graft.index

import java.net.URI
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.implicits._

/** An object-store stand-in with SYNTHETIC directories: every directory
  * reports modification time 0 from both `getFileStatus` and
  * `listStatus` (S3A semantics — dir entries are fabricated, their
  * mtime never moves when children land). Files keep their real
  * mtimes, like real object payloads. listStatus calls are counted so
  * the re-list behavior is measured, not argued. */
class SyntheticMtimeFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3mock"
  override def getUri: URI = URI.create("s3mock:///")

  // the short constructor (no permission/owner) — the deprecated local
  // status loads permissions lazily via `new File(path)`, which rejects
  // the s3mock:// qualified URI; dir listings never need them anyway
  private def zeroDirMtime(st: FileStatus): FileStatus =
    if (!st.isDirectory) st
    else new FileStatus(st.getLen, true, st.getReplication, st.getBlockSize,
      0L, st.getPath)

  override def getFileStatus(p: Path): FileStatus =
    zeroDirMtime(super.getFileStatus(p))

  override def listStatus(p: Path): Array[FileStatus] = {
    SyntheticMtimeFileSystem.listStatusCalls.incrementAndGet()
    SyntheticMtimeFileSystem.listedPaths.add(p.toString)
    super.listStatus(p).map(zeroDirMtime)
  }
}

object SyntheticMtimeFileSystem {
  val listStatusCalls = new AtomicLong(0L)
  val listedPaths = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def reset(): Unit = { listStatusCalls.set(0L); listedPaths.clear() }
  def drain(): Seq[String] = {
    val b = Seq.newBuilder[String]
    var p = listedPaths.poll()
    while (p != null) { b += p; p = listedPaths.poll() }
    b.result()
  }
}

/** The dir-manifest refresh tier against a store whose directory mtimes
  * are CONSTANT ZERO (object-store semantics) — converting the three
  * code-comment guarantees of the manifest safety design into
  * measurements:
  *   - "auto" never engages for a scheme outside the whitelist, and
  *     refresh still finds new files there (via the full walk);
  *   - a FORCE-enabled manifest never trusts an mtime-0 dir: every
  *     refresh re-lists every dir (listStatus-counted) and new files
  *     are picked up — the `mt > 0` distrust in the skip proof;
  *   - the `fullWalk` hatch rebuilds the manifest on such a store
  *     without error. */
class SyntheticMtimeRefreshSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val work = Files.createTempDirectory("graft-s3mock").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-s3mock-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.hadoop.fs.s3mock.impl",
      classOf[SyntheticMtimeFileSystem].getName)
    .config(IndexConf.MetastoreLocation, s"$work/metastore")
    .getOrCreate()

  import spark.implicits._

  // forced-manifest table (partitioned, so the manifest tracks subdirs)
  private val forcedPath = s"s3mock://$work/orders_forced"
  // auto-mode table for the whitelist gate
  private val autoPath = s"s3mock://$work/orders_auto"

  private val baseOpts = Map(
    IndexConf.DistributedPruningThreshold -> "1",
    IndexConf.RefreshDirMtimeSlack -> "0")
  private val forcedOpts = baseOpts +
    (IndexConf.RefreshDirManifest -> "true")
  // DEFAULT whitelist (hdfs family): s3mock must not be trusted
  private val autoOpts = baseOpts +
    (IndexConf.RefreshDirManifest -> "auto")

  private def refresh(path: String, o: Map[String, String]) =
    IndexedDataSource.refreshIndex(spark, path, Metastore.Dataspace, o)

  private def writeOrders(path: String): Seq[Int] = {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(path)
    orders.select("o_year").distinct().as[Int].collect().sorted.toSeq
  }

  private def appendOneFile(path: String, y: Int): Long = {
    val add = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .filter(col("o_year") === y).limit(30).drop("o_year")
    add.coalesce(1).write.mode("append").parquet(s"$path/o_year=$y")
    add.count()
  }

  private lazy val years: Seq[Int] = writeOrders(forcedPath)

  override def beforeAll(): Unit = {
    super.beforeAll()
    years
    spark.index.create.mode("overwrite").options(forcedOpts)
      .indexBy("o_custkey").parquet(forcedPath)
  }

  test("'auto' stays OFF on a non-whitelisted synthetic-mtime scheme; refresh still finds new files") {
    writeOrders(autoPath)
    spark.index.create.mode("overwrite").options(autoOpts)
      .indexBy("o_custkey").parquet(autoPath)
    IndexedDataSource.lastManifestStats = None
    assert(refresh(autoPath, autoOpts) == IndexedDataSource.RefreshStats(0L, 0L))
    assert(IndexedDataSource.lastManifestStats.isEmpty,
      "auto must not engage the mtime probe for s3mock:// under the " +
        "default (HDFS-family) whitelist")
    // the full walk sees the appended file even though no dir mtime moved
    val y = years.head
    appendOneFile(autoPath, y)
    IndexedDataSource.lastManifestStats = None
    assert(refresh(autoPath, autoOpts) == IndexedDataSource.RefreshStats(1L, 0L))
    assert(IndexedDataSource.lastManifestStats.isEmpty)
    IndexedDataSource.deleteIndex(spark, autoPath, Metastore.Dataspace)
  }

  test("force-enabled manifest never trusts mtime-0 dirs: every refresh re-lists every dir") {
    // no data change at all — the mt>0 distrust must still re-list
    // EVERYTHING (on a store with real mtimes this would skip all dirs)
    SyntheticMtimeFileSystem.reset()
    IndexedDataSource.lastManifestStats = None
    assert(refresh(forcedPath, forcedOpts) == IndexedDataSource.RefreshStats(0L, 0L))
    val (probed, changed, deleted, unchanged) =
      IndexedDataSource.lastManifestStats.getOrElse(
        fail("forced manifest must engage the probe"))
    assert(probed == years.size + 1L, s"probed=$probed")
    assert(unchanged == 0L,
      "an mtime-0 dir must NEVER satisfy the unchanged-skip proof")
    assert(changed == probed && deleted == 0L)
    val dirListings = SyntheticMtimeFileSystem.drain().filter(p =>
      p.endsWith("orders_forced") || p.matches(".*o_year=\\d+$"))
    assert(dirListings.size == years.size + 1,
      s"every dir must re-list on a synthetic-mtime store, got: $dirListings")
  }

  test("force-enabled manifest picks up a new file despite the frozen dir mtime") {
    val y = years.last
    val added = appendOneFile(forcedPath, y)
    IndexedDataSource.lastManifestStats = None
    assert(refresh(forcedPath, forcedOpts) == IndexedDataSource.RefreshStats(1L, 0L))
    assert(IndexedDataSource.lastManifestStats.exists(_._2 >= 1L))
    // and the refreshed index answers correctly over the grown table
    val plain = spark.read.parquet(forcedPath)
    val indexed = spark.index.parquet(forcedPath)
    assert(indexed.count() == plain.count())
    val key = plain.filter(col("o_year") === y)
      .select("o_custkey").as[Long].head()
    assert(indexed.filter(col("o_custkey") === key).count() ==
      plain.filter(col("o_custkey") === key).count())
    assert(added > 0)
  }

  test("fullWalk rebuilds the manifest on the synthetic-mtime store without error") {
    val y = years.head
    appendOneFile(forcedPath, y)
    val o = forcedOpts + (IndexConf.RefreshFullWalk -> "true")
    IndexedDataSource.lastManifestStats = None
    assert(refresh(forcedPath, o) == IndexedDataSource.RefreshStats(1L, 0L))
    // fullWalk bypasses the probe by design …
    assert(IndexedDataSource.lastManifestStats.isEmpty)
    // … but REBUILDS the manifest: the next plain refresh probes again
    IndexedDataSource.lastManifestStats = None
    assert(refresh(forcedPath, forcedOpts) == IndexedDataSource.RefreshStats(0L, 0L))
    assert(IndexedDataSource.lastManifestStats.nonEmpty,
      "fullWalk must leave a rebuilt manifest behind")
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

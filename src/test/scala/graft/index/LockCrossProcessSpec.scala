package graft.index

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.implicits._

/** CROSS-PROCESS maintenance-lock stress: the in-process lifecycle is
  * covered by IndexEndToEndSpec and MemoConcurrencySpec; this suite
  * spawns a REAL second JVM ([[LockStressChild]] via the forked test
  * classpath) and proves the three inter-process claims the lock makes:
  *   - a lock held by another live process makes refresh fail FAST
  *     (ConcurrentMaintenanceException, no interleaved mutation);
  *   - the holder releasing (process exits cleanly) unblocks the next
  *     run with no residue;
  *   - a holder that CRASHED in another process heals by lease expiry:
  *     an expired lock is swept and refresh proceeds; a fresh one still
  *     blocks. */
class LockCrossProcessSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val work = Files.createTempDirectory("graft-lockx").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-lockx-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config(IndexConf.MetastoreLocation, s"$work/metastore")
    .getOrCreate()

  private val tablePath = s"$work/orders"

  private lazy val indexDir: org.apache.hadoop.fs.Path = {
    val metastore = Metastore(spark)
    metastore.location(Metastore.Dataspace,
      IndexedDataSource.resolveTablePath(spark, tablePath))
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .repartition(4).write.mode("overwrite").parquet(tablePath)
    spark.index.create.mode("overwrite").indexBy("o_custkey").parquet(tablePath)
  }

  private def appendFile(): Unit =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .limit(20).coalesce(1).write.mode("append").parquet(tablePath)

  /** Spawn the child JVM on the forked test classpath; returns
    * (process, stdout reader). */
  private def spawnChild(mode: String): (Process, java.io.BufferedReader) = {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val pb = new ProcessBuilder(javaBin, "-cp", sys.props("java.class.path"),
      "graft.index.LockStressChild", mode, indexDir.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    (p, new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream, "UTF-8")))
  }

  private def awaitLine(r: java.io.BufferedReader, want: String): Unit = {
    val deadline = System.currentTimeMillis() + 60000
    var line = r.readLine()
    while (line != null && line != want) {
      assert(System.currentTimeMillis() < deadline, s"timed out awaiting $want")
      line = r.readLine()
    }
    assert(line == want, s"child ended before printing $want")
  }

  test("a lock held by a second JVM blocks refresh fast; its release unblocks") {
    appendFile()
    val (child, out) = spawnChild("hold")
    try {
      awaitLine(out, "HELD")
      val t0 = System.nanoTime()
      intercept[graft.ops.ConcurrentMaintenanceException] {
        spark.index.refresh.parquet(tablePath)
      }
      // fail FAST: the blocked run must not wait out any lease
      assert((System.nanoTime() - t0) / 1e9 < 30.0)
      // the index survived the blocked attempt
      assert(spark.index.exists.parquet(tablePath))
    } finally {
      child.getOutputStream.close() // signals the child to release
      assert(child.waitFor() == 0, "holder child must exit cleanly")
    }
    awaitLine(out, "RELEASED")
    val stats = spark.index.refresh.parquet(tablePath)
    assert(stats.addedFiles == 1L, s"got $stats")
  }

  test("a crashed holder in another process heals by lease expiry; a fresh crash still blocks") {
    // fresh crash: lease still live -> blocked
    appendFile()
    val (fresh, fOut) = spawnChild("crash-fresh")
    awaitLine(fOut, "CRASHED")
    assert(fresh.waitFor() == 137)
    intercept[graft.ops.ConcurrentMaintenanceException] {
      spark.index.refresh.parquet(tablePath)
    }
    // sweep the fresh lock so the expired-crash leg starts clean
    val fs = indexDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val lock = new org.apache.hadoop.fs.Path(
      indexDir.getParent, "_" + indexDir.getName + ".lock")
    fs.delete(lock, false)

    // expired crash (child backdated its own lock file 1 h): the next
    // refresh heals it and proceeds, nothing left behind
    val (crashed, cOut) = spawnChild("crash")
    awaitLine(cOut, "CRASHED")
    assert(crashed.waitFor() == 137)
    assert(fs.exists(lock), "the crashed child must leave its lock behind")
    val stats = spark.index.refresh.parquet(tablePath)
    assert(stats.addedFiles == 1L, s"got $stats")
    assert(!fs.exists(lock), "healing must remove the expired lock")
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

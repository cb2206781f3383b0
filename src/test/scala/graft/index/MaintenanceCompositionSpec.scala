package graft.index

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.implicits._

/** Index ↔ mutable-table composition: every maintenance op
  * (upsertByKey / deleteByKey / compact / rebucket) run UNDER an index,
  * against both sides of the freshness contract —
  *
  *   - default: the op leaves the index on its old snapshot (the
  *     documented appends-invisible contract, which for rewriting ops
  *     means a direct indexed read FAILS on the removed files rather
  *     than silently serving wrong rows), and an explicit refresh
  *     restores correct, still-pruned reads;
  *   - `spark.sql.index.refreshAfterMaintenance=true`: the op refreshes
  *     the index itself, inside its table lock, so the very next indexed
  *     read is correct with zero API. */
class MaintenanceCompositionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val work = Files.createTempDirectory("graft-maintcomp").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-maintcomp")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config(IndexConf.MetastoreLocation, s"$work/metastore")
    .config("spark.sql.warehouse.dir", s"$work/warehouse")
    .getOrCreate()

  private def buildKeyed(p: String, buckets: Int = 8): Unit = {
    // create rebalances to one file per bucket, so the multi-file state
    // the compact test needs comes from an APPEND (one more file per
    // bucket — the real accumulation mode for append-mode ingests)
    graft.ops.Upsert.writeKeyedTable(
      spark.range(0, 500).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("v")),
      "k", p, numBuckets = buckets, mode = "overwrite")
    graft.ops.Upsert.writeKeyedTable(
      spark.range(500, 1000).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("v")),
      "k", p, numBuckets = buckets, mode = "append")
    spark.index.create.mode("overwrite").indexBy("k").parquet(p)
  }

  private def updates(): DataFrame =
    spark.range(0, 3).select(col("id").as("k"),
      concat(lit("NEW"), col("id")).as("v"))

  private def pruned(df: DataFrame): (Long, Long) = {
    df.collect()
    val fi = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }
      .getOrElse(fail("not an indexed scan"))
    (fi.lastListedFiles, fi.lastTotalFiles)
  }

  private def withHook[T](body: => T): T = {
    spark.conf.set(IndexConf.RefreshAfterMaintenance, "true")
    try body finally spark.conf.unset(IndexConf.RefreshAfterMaintenance)
  }

  test("default: a rewriting op leaves the old snapshot (read fails loudly, " +
      "never wrong rows); refresh restores pruned reads") {
    val p = s"$work/keyed_default"
    buildKeyed(p)
    graft.ops.Upsert.upsertByKey(spark, p, updates(), "k", numBuckets = 8)
    // the stale listing points at files the dynamic overwrite removed —
    // failing beats silently serving pre-merge rows
    val e = intercept[Exception] {
      spark.index.parquet(p).filter(col("k") === 1L).collect()
    }
    assert(e.toString.toLowerCase.contains("file") ||
      Option(e.getCause).exists(_.toString.toLowerCase.contains("file")),
      s"expected a missing-file failure, got $e")
    // explicit refresh: correct values, pruning intact
    spark.index.refresh.parquet(p)
    val q = spark.index.parquet(p).filter(col("k") === 1L)
    assert(q.select("v").collect().map(_.getString(0)).toSeq == Seq("NEW1"))
    val (listed, total) = pruned(spark.index.parquet(p).filter(col("k") === 1L))
    assert(listed < total, s"pruning must survive the refresh: $listed/$total")
  }

  test("refreshAfterMaintenance: upsert then delete are immediately visible " +
      "through the index, no manual refresh") {
    val p = s"$work/keyed_hook"
    buildKeyed(p)
    withHook {
      graft.ops.Upsert.upsertByKey(spark, p, updates(), "k", numBuckets = 8)
      val q = spark.index.parquet(p).filter(col("k") === 2L)
      assert(q.select("v").collect().map(_.getString(0)).toSeq == Seq("NEW2"))
      val (listed, total) = pruned(spark.index.parquet(p).filter(col("k") === 2L))
      assert(listed < total, s"expected pruning: $listed/$total")

      graft.ops.Upsert.deleteByKey(spark, p,
        spark.range(700, 701).select(col("id").as("k")), "k", 8)
      assert(spark.index.parquet(p).filter(col("k") === 700L).isEmpty)
      assert(spark.index.parquet(p).count() == 999L)
    }
  }

  test("refreshAfterMaintenance: compact keeps the index live and pruned") {
    val p = s"$work/keyed_compact"
    buildKeyed(p)
    withHook {
      val st = graft.ops.Layout.compact(spark, p,
        smallFileBytes = 64L << 20, targetFileBytes = 128L << 20)
      assert(st.compactedFiles > 0, s"fixture must actually compact: $st")
      assert(spark.index.parquet(p).count() == 1000L)
      val (listed, total) = pruned(spark.index.parquet(p).filter(col("k") === 5L))
      assert(listed <= total && listed >= 1)
      // the index's files table tracks exactly the post-compaction listing
      val live = java.nio.file.Files.walk(java.nio.file.Paths.get(p))
        .filter(f => f.getFileName.toString.endsWith(".parquet") &&
          !f.getFileName.toString.startsWith("_") &&
          !f.getFileName.toString.startsWith("."))
        .count()
      val q = spark.index.parquet(p)
      q.collect()
      val fi = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.relation.location
      }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }.get
      assert(fi.lastTotalFiles == live,
        s"index files table (${fi.lastTotalFiles}) vs live files ($live)")
    }
  }

  test("refreshAfterMaintenance: rebucket (whole-table swap) keeps the index live") {
    val p = s"$work/keyed_rebucket"
    buildKeyed(p)
    withHook {
      graft.ops.Upsert.rebucketKeyedTable(spark, p, "k",
        oldBuckets = 8, newBuckets = 4)
      assert(spark.index.parquet(p).count() == 1000L)
      val q = spark.index.parquet(p).filter(col("k") === 123L)
      assert(q.select("v").collect().map(_.getString(0)).toSeq == Seq("v123"))
      val (listed, total) = pruned(spark.index.parquet(p).filter(col("k") === 123L))
      assert(listed < total, s"expected pruning under the new layout: $listed/$total")
    }
  }

  test("refreshAfterMaintenance: vacuum refreshes only when it recovered something") {
    val p = s"$work/keyed_vacuum"
    buildKeyed(p)
    withHook {
      // nothing to heal: vacuum must NOT refresh (cheap no-op), index
      // snapshot untouched
      assert(graft.ops.Layout.vacuum(spark, p) == 0)
      // plant dead compaction debris; healing it changes the candidate
      // file set, so the hook refreshes and reads stay consistent
      new java.io.File(s"$p/_compact_tmp_dead1").mkdirs()
      assert(graft.ops.Layout.vacuum(spark, p) >= 1)
      assert(spark.index.parquet(p).count() == 1000L)
      val (listed, total) = pruned(spark.index.parquet(p).filter(col("k") === 5L))
      assert(listed < total)
    }
  }

  test("refreshAfterMaintenance on an UN-indexed table is a no-op, not an error") {
    val p = s"$work/keyed_noindex"
    graft.ops.Upsert.writeKeyedTable(
      spark.range(0, 100).select(col("id").as("k"), col("id").as("v")),
      "k", p, numBuckets = 4, mode = "overwrite")
    withHook {
      val st = graft.ops.Upsert.upsertByKey(spark, p,
        spark.range(0, 2).select(col("id").as("k"), (col("id") + 1000L).as("v")),
        "k", numBuckets = 4)
      assert(st.upserted == 2L)
      assert(graft.ops.Upsert.readKeyedTable(spark, p).count() == 100L)
    }
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Upsert

/** Keyed-table upsert: merge semantics, delta-proportional IO, guards. */
class UpsertSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-upsert-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-upsert").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/t"
  }

  private def bucketDirs(dir: String): Map[String, Long] =
    new java.io.File(dir).listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("graft_bucket="))
      .map(f => f.getName ->
        f.listFiles().map(_.lastModified()).maxOption.getOrElse(0L))
      .toMap

  test("append with a different bucket layout fails fast; matching append lands") {
    val dir = tmpDir()
    val base = (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v")
    Upsert.writeKeyedTable(base, "k", dir, numBuckets = 8)
    // a silently re-pinned different layout would spread one key across
    // two bucketings and make later upserts miss rows — must refuse
    // BEFORE any data write
    val more = (100L until 110L).map(i => (i, s"v$i")).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.writeKeyedTable(more, "k", dir, numBuckets = 16, mode = "append")
    }
    assert(e.getMessage.contains("buckets=8"), e.getMessage)
    assert(Upsert.readKeyedTable(spark, dir).count() == 50L,
      "failed append must not have written rows")
    // the matching layout appends fine and stays upsert-consistent
    Upsert.writeKeyedTable(more, "k", dir, numBuckets = 8, mode = "append")
    assert(Upsert.readKeyedTable(spark, dir).count() == 60L)
    val up = Seq((100L, "NEW")).toDF("k", "v")
    Upsert.upsertByKey(spark, dir, up, "k", numBuckets = 8)
    val got = Upsert.readKeyedTable(spark, dir).filter($"k" === 100L)
      .select("v").as[String].collect().toSeq
    assert(got == Seq("NEW"), s"exactly one row for the key: $got")
  }

  test("rebucket: grow and shrink migrate the pin; shrink drops stale dirs") {
    val dir = tmpDir()
    val base = (0L until 300L).map(i => (i, s"v$i")).toDF("k", "v")
    Upsert.writeKeyedTable(base, "k", dir, numBuckets = 8)
    // grow 8 -> 16: old-layout ops refuse, new-layout merge works
    Upsert.rebucketKeyedTable(spark, dir, "k", oldBuckets = 8, newBuckets = 16)
    intercept[IllegalArgumentException] {
      Upsert.upsertByKey(spark, dir, Seq((1L, "X")).toDF("k", "v"), "k", 8)
    }
    Upsert.upsertByKey(spark, dir, Seq((1L, "NEW")).toDF("k", "v"), "k", 16)
    val afterGrow = Upsert.readKeyedTable(spark, dir)
    assert(afterGrow.count() == 300L)
    assert(afterGrow.filter($"k" === 1L).select("v").as[String]
      .collect().toSeq == Seq("NEW"))
    assert(bucketDirs(dir).size == 16)
    // wrong old-layout claim refuses the migration itself
    intercept[IllegalArgumentException] {
      Upsert.rebucketKeyedTable(spark, dir, "k", oldBuckets = 8, newBuckets = 4)
    }
    // shrink 16 -> 4: stale bucket dirs must not survive the rewrite
    Upsert.rebucketKeyedTable(spark, dir, "k", oldBuckets = 16, newBuckets = 4)
    assert(bucketDirs(dir).size == 4, s"stale dirs: ${bucketDirs(dir).keys}")
    val afterShrink = Upsert.readKeyedTable(spark, dir)
    assert(afterShrink.count() == 300L)
    assert(afterShrink.filter($"k" === 1L).select("v").as[String]
      .collect().toSeq == Seq("NEW"))
  }

  test("upsert: replace + insert + carry, only touched buckets rewritten") {
    val dir = tmpDir()
    val base = (0L until 200L).map(i => (i, s"v$i")).toDF("k", "v")
    Upsert.writeKeyedTable(base, "k", dir, numBuckets = 8)
    val before = bucketDirs(dir)
    assert(before.size == 8, s"expected all 8 bucket dirs: ${before.keys}")
    // updates: replace keys 0..4, insert keys 1000..1002
    val updates = ((0L until 5L) ++ (1000L until 1003L))
      .map(i => (i, s"NEW$i")).toDF("k", "v")
    Thread.sleep(1100) // mtime resolution guard
    val stats = Upsert.upsertByKey(spark, dir, updates, "k", numBuckets = 8)
    assert(stats.upserted == 8L)
    assert(stats.touchedBuckets < 8,
      s"8 updated keys should not touch every bucket: $stats")
    // carried = base rows living in touched buckets minus the 5 replaced
    val touchedSet = updates.select(Upsert.bucketOf($"k", 8))
      .distinct().as[Int].collect().toSet
    val baseInTouched = base
      .filter(Upsert.bucketOf($"k", 8).isin(touchedSet.toSeq.map(Int.box): _*))
      .count()
    assert(stats.carried == baseInTouched - 5L, s"$stats vs base $baseInTouched")
    // content = reference merge
    val got = Upsert.readKeyedTable(spark, dir)
      .as[(Long, String)].collect().toMap
    val expect = ((0L until 200L).map(i => i -> s"v$i").toMap
      ++ ((0L until 5L) ++ (1000L until 1003L)).map(i => i -> s"NEW$i").toMap)
    assert(got == expect)
    // untouched bucket dirs were not rewritten
    val after = bucketDirs(dir)
    val touchedNames = updates
      .select(Upsert.bucketOf($"k", 8)).distinct().as[Int].collect()
      .map(b => s"graft_bucket=$b").toSet
    assert(touchedNames.size == stats.touchedBuckets)
    before.foreach { case (name, mtime) =>
      if (!touchedNames.contains(name)) {
        assert(after(name) == mtime, s"untouched $name was rewritten")
      }
    }
    // the base read prunes partitions (plan-level evidence)
    val pruned = spark.read.parquet(dir).filter($"graft_bucket".isin(0, 1))
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters"))
  }

  test("upsert: rerun of the same delta is idempotent") {
    val dir = tmpDir()
    Upsert.writeKeyedTable(
      (0L until 50L).map(i => (i, i * 2)).toDF("k", "x"), "k", dir, 4)
    val updates = Seq((3L, 999L), (60L, 600L)).toDF("k", "x")
    Upsert.upsertByKey(spark, dir, updates, "k", 4)
    val first = Upsert.readKeyedTable(spark, dir)
      .as[(Long, Long)].collect().sorted.toSeq
    Upsert.upsertByKey(spark, dir, updates, "k", 4)
    val second = Upsert.readKeyedTable(spark, dir)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(first == second)
    assert(first.toMap.apply(3L) == 999L && first.toMap.apply(60L) == 600L)
    assert(first.size == 51)
  }

  test("upsert guards: duplicate update keys, mismatched bucket count") {
    val dir = tmpDir()
    Upsert.writeKeyedTable(
      (0L until 10L).map(i => (i, i)).toDF("k", "x"), "k", dir, 4)
    intercept[IllegalArgumentException] {
      Upsert.upsertByKey(spark, dir,
        Seq((1L, 1L), (1L, 2L)).toDF("k", "x"), "k", 4)
    }
    // wrong numBuckets would land keys in the wrong partitions — the
    // pinned spec fails fast instead
    val err = intercept[IllegalArgumentException] {
      Upsert.upsertByKey(spark, dir, Seq((1L, 9L)).toDF("k", "x"), "k", 8)
    }
    assert(err.getMessage.contains("buckets=4"))
    // missing table fails fast
    intercept[IllegalArgumentException] {
      Upsert.upsertByKey(spark, tmpDir(), Seq((1L, 9L)).toDF("k", "x"), "k", 4)
    }
  }

  test("delete: removes keys, empties whole buckets, no-ops absent keys") {
    val dir = tmpDir()
    val base = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
    Upsert.writeKeyedTable(base, "k", dir, numBuckets = 8)
    val before = bucketDirs(dir)
    // delete EVERY key of bucket 3 (whole-bucket wipe), a couple of keys
    // of other buckets, and two keys that do not exist
    val bucket3Keys = base.filter(Upsert.bucketOf($"k", 8) === 3)
      .select($"k").as[Long].collect().toSeq
    assert(bucket3Keys.nonEmpty)
    val scattered = Seq(0L, 1L).filterNot(bucket3Keys.contains)
    val toDelete = (bucket3Keys ++ scattered ++ Seq(5000L, 6000L)).toDF("k")
    Thread.sleep(1100)
    val stats = Upsert.deleteByKey(spark, dir, toDelete, "k", 8)
    assert(stats.deleted == bucket3Keys.size + scattered.size, stats.toString)
    val got = Upsert.readKeyedTable(spark, dir).as[(Long, String)].collect().toMap
    val expect = (0L until 100L)
      .filterNot(i => bucket3Keys.contains(i) || scattered.contains(i))
      .map(i => i -> s"v$i").toMap
    assert(got == expect)
    // the emptied bucket dir is GONE (dynamic overwrite alone would have
    // left its old files in place)
    assert(!new java.io.File(s"$dir/graft_bucket=3").exists())
    // untouched buckets were not rewritten
    val touchedNames = toDelete
      .select(Upsert.bucketOf($"k", 8)).distinct().as[Int].collect()
      .map(b => s"graft_bucket=$b").toSet
    val after = bucketDirs(dir)
    before.foreach { case (name, mtime) =>
      if (!touchedNames.contains(name)) {
        assert(after(name) == mtime, s"untouched $name was rewritten")
      }
    }
    // deleting only-absent keys changes nothing
    val st2 = Upsert.deleteByKey(spark, dir, Seq(7777L).toDF("k"), "k", 8)
    assert(st2.deleted == 0L)
    assert(Upsert.readKeyedTable(spark, dir).count() == expect.size.toLong)
  }

  test("upsert: insert into a bucket dir that does not exist yet") {
    val dir = tmpDir()
    // 3 rows across 64 buckets — most bucket dirs absent initially
    Upsert.writeKeyedTable(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), "k", dir, 64)
    val nBefore = bucketDirs(dir).size
    assert(nBefore <= 3)
    // insert keys until one lands in a previously-absent bucket
    val fresh = (100L until 200L).find { i =>
      val b = Seq(Tuple1(i)).toDF("k")
        .select(Upsert.bucketOf($"k", 64)).as[Int].head()
      !new java.io.File(s"$dir/graft_bucket=$b").exists()
    }.get
    Upsert.upsertByKey(spark, dir, Seq((fresh, "new")).toDF("k", "v"), "k", 64)
    val got = Upsert.readKeyedTable(spark, dir).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "c", fresh -> "new"))
  }

  test("small-file keyed table: compact heals buckets in place") {
    val dir = tmpDir()
    // the create path now rebalances to one file per bucket, so
    // fragmentation accumulates from APPENDS (each lands one more file
    // per bucket — the real at-scale accumulation for append-mode
    // ingests). Note single-key UPSERTS do not accumulate: dynamic
    // overwrite replaces the whole touched partition each time.
    Upsert.writeKeyedTable(
      (0L until 200L).map(i => (i, i)).toDF("k", "x"), "k", dir, 4)
    Upsert.writeKeyedTable(
      (200L until 400L).map(i => (i, i)).toDF("k", "x"), "k", dir, 4,
      mode = "append")
    val someBucket = new java.io.File(s"$dir/graft_bucket=0")
    assert(someBucket.listFiles().count(_.getName.endsWith(".parquet")) >= 2,
      "fixture should start with multiple small files per bucket")
    val before = Upsert.readKeyedTable(spark, dir)
      .as[(Long, Long)].collect().sorted.toSeq
    val stats = graft.ops.Layout.compact(spark, dir,
      smallFileBytes = 1L << 20, targetFileBytes = 4L << 20, minFiles = 2)
    assert(stats.compactedFiles >= 8, s"expected a real compaction: $stats")
    val after = Upsert.readKeyedTable(spark, dir)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(after == before, "compaction changed table content")
    // the compacted table still upserts correctly
    Upsert.upsertByKey(spark, dir, Seq((7L, 999L)).toDF("k", "x"), "k", 4)
    assert(Upsert.readKeyedTable(spark, dir)
      .filter($"k" === 7L).as[(Long, Long)].head()._2 == 999L)
  }

  test("failed mode=error rewrite leaves the existing table's spec intact") {
    val dir = tmpDir()
    val base = (0L until 50L).map(i => (i, s"v$i")).toDF("k", "v")
    Upsert.writeKeyedTable(base, "k", dir, numBuckets = 8)
    // default mode=error against the existing table: the data write
    // throws — and must NOT have consumed the 8-bucket spec first
    intercept[Exception] {
      Upsert.writeKeyedTable(base, "k", dir, numBuckets = 4)
    }
    // the surviving spec still guards the layout: a 4-bucket upsert is
    // refused instead of silently landing keys in wrong buckets
    val e = intercept[IllegalArgumentException] {
      Upsert.upsertByKey(spark, dir, Seq((1L, "x")).toDF("k", "v"), "k", 4)
    }
    assert(e.getMessage.contains("buckets=8"))
    // and the correctly-parameterized upsert still works
    Upsert.upsertByKey(spark, dir, Seq((1L, "x")).toDF("k", "v"), "k", 8)
    assert(Upsert.readKeyedTable(spark, dir)
      .filter($"k" === 1L).as[(Long, String)].head()._2 == "x")
  }

  test("deleting every row leaves a readable empty table that accepts new upserts") {
    val dir = tmpDir()
    val base = (0L until 20L).map(i => (i, s"v$i")).toDF("k", "v")
    Upsert.writeKeyedTable(base, "k", dir, numBuckets = 4)
    val stats = Upsert.deleteByKey(
      spark, dir, (0L until 20L).toDF("k"), "k", numBuckets = 4)
    assert(stats.deleted == 20L && stats.carried == 0L)
    // the emptied table must still read (zero rows, schema intact) …
    val empty = Upsert.readKeyedTable(spark, dir)
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("k", "v"))
    // … and accept later upserts
    Upsert.upsertByKey(spark, dir, Seq((3L, "back")).toDF("k", "v"), "k", 4)
    assert(Upsert.readKeyedTable(spark, dir)
      .as[(Long, String)].collect().toSeq == Seq((3L, "back")))
  }

  override def afterAll(): Unit = spark.stop()
}

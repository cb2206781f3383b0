package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ↔ batch agreement: on a static input, the streaming window
  * aggregation and the stateful sessionizer must reproduce the batch
  * (window-function) answers exactly. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def batchEvents = graft.SparkEntry.eventsTbl(spark, dir)

  test("streaming hourly window equals batch aggregation") {
    val streamed = Streaming.hourlyEventCounts(spark, dir)
      .collect().map(_.toString).sorted
    val batch = batchEvents
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("total_value"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("win_start"),
        $"event_type", $"n", $"total_value")
      .collect().map(_.toString).sorted
    assert(streamed.length == batch.length && streamed.sameElements(batch))
  }

  test("update-mode foreachBatch upsert sink equals batch aggregation") {
    val out = java.nio.file.Files.createTempDirectory("graft-upsert-spec").toString
    val streamed = Streaming.hourlyEventCountsUpsert(spark, dir, out)
      .collect().map(_.toString).sorted
    val batch = batchEvents
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("total_value"))
      .select(date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("win_start"),
        $"event_type", $"n", $"total_value")
      .collect().map(_.toString).sorted
    assert(streamed.length == batch.length && streamed.sameElements(batch))
  }

  test("upsert merge branch: overlapping keys last-write-wins, no duplicates") {
    val path = java.nio.file.Files.createTempDirectory("graft-upsert-merge").toString + "/data"
    val b0 = Seq(("h1", "a", 1L, 1.0), ("h2", "a", 2L, 2.0))
      .toDF("win_start", "event_type", "n", "total_value")
    val b1 = Seq(("h2", "a", 5L, 5.0), ("h3", "b", 3L, 3.0))
      .toDF("win_start", "event_type", "n", "total_value")
    Streaming.upsertParquet(b0, path, Seq("win_start", "event_type"), 0L)
    Streaming.upsertParquet(b1, path, Seq("win_start", "event_type"), 1L)
    // empty batch (watermark finalization) must be a no-op
    Streaming.upsertParquet(b1.limit(0), path, Seq("win_start", "event_type"), 2L)
    val got = spark.read.parquet(path)
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("h1", "a", 1L, 1.0), ("h2", "a", 5L, 5.0), ("h3", "b", 3L, 3.0)))
  }

  test("upsert crash retry between the two renames restores the rename-aside copy") {
    val path = java.nio.file.Files.createTempDirectory("graft-upsert-crash1").toString + "/data"
    val keys = Seq("win_start", "event_type")
    val b0 = Seq(("h1", "a", 1L, 1.0), ("h2", "a", 2L, 2.0))
      .toDF("win_start", "event_type", "n", "total_value")
    val b1 = Seq(("h2", "a", 5L, 5.0), ("h3", "b", 3L, 3.0))
      .toDF("win_start", "event_type", "n", "total_value")
    Streaming.upsertParquet(b0, path, keys, 0L)
    // simulate a crash DURING batch 1, after rename(data, old) but before
    // rename(tmp, data): the sink dir is gone, only the aside copy remains
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(s"${path}_old_1")))
    // Structured Streaming reruns the same batchId — the retry must
    // restore h1 (pre-batch state), not reduce the sink to b1 alone
    Streaming.upsertParquet(b1, path, keys, 1L)
    val got = spark.read.parquet(path)
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      ("h1", "a", 1L, 1.0), ("h2", "a", 5L, 5.0), ("h3", "b", 3L, 3.0)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${path}_old_1")))
  }

  test("upsert crash retry after a completed swap drops the stale copy idempotently") {
    val path = java.nio.file.Files.createTempDirectory("graft-upsert-crash2").toString + "/data"
    val keys = Seq("win_start", "event_type")
    val b0 = Seq(("h1", "a", 1L, 1.0)).toDF("win_start", "event_type", "n", "total_value")
    val b1 = Seq(("h2", "a", 5L, 5.0)).toDF("win_start", "event_type", "n", "total_value")
    Streaming.upsertParquet(b0, path, keys, 0L)
    Streaming.upsertParquet(b1, path, keys, 1L)
    // simulate a crash AFTER batch 1's swap but before its cleanup: the
    // stale pre-swap copy is still sitting next to the committed data
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    org.apache.hadoop.fs.FileUtil.copy(
      fs, new org.apache.hadoop.fs.Path(path),
      fs, new org.apache.hadoop.fs.Path(s"${path}_old_1"), false, conf)
    // rerun of batch 1 must converge to the same rows and clear the leftover
    Streaming.upsertParquet(b1, path, keys, 1L)
    val got = spark.read.parquet(path)
      .as[(String, String, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(("h1", "a", 1L, 1.0), ("h2", "a", 5L, 5.0)))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${path}_old_1")))
  }

  test("streaming jsonl file ingest equals the one-shot tagged parse") {
    val lines = Seq(
      (0L, """{"k": 1}"""), (1L, """{"k": bad"""),
      (2L, """{"k": 3}"""), (3L, """nope""")).toDF("id", "line")
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl-ingest").toString
    val got = Streaming.jsonlFileIngest(
        spark, lines, $"id", $"line", out, "k BIGINT", nBatches = 2)
      .select($"k", $"quarantined", $"raw")
      .collect().map(_.toString).sorted.toSeq
    val oneShot = graft.ops.Ingest.parseJsonTagged(
        lines.select($"line".as("value")), col("value"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
      .select($"k", $"quarantined", $"raw")
      .collect().map(_.toString).sorted.toSeq
    assert(got == oneShot)
    assert(got.size == 4 && oneShot.count(_.contains("true")) == 2)
  }

  test("streaming kmeans ingest survives an empty leading batch (init moves to the first non-empty)") {
    import graft.ann.Ann
    // modulo-4 slicing over ONLY odd vec_ids: batches 0 and 2 are empty;
    // init must happen on batch 1 and batch 3 must fold from batch 1's
    // state, not from a nonexistent s2
    val out = java.nio.file.Files.createTempDirectory("graft-kmeans-empty").toString
    val odd = java.nio.file.Files.createTempDirectory("graft-kmeans-odd").toString
    spark.read.parquet(s"$dir/embeddings.parquet")
      .filter($"vec_id" % 2 === 1)
      .write.mode("overwrite").parquet(s"$odd/embeddings.parquet")
    val streamed = Streaming.kmeansIngest(spark, odd, out, k = 4, nBatches = 4)
      .collect().map(_.toString).toSeq
    val emb = spark.read.parquet(s"$odd/embeddings.parquet")
    var st = Ann.kmeansStateInit(
      emb.filter($"vec_id" % 4 === 1), $"vec_id", $"embedding", k = 4)
    st = Ann.kmeansStateUpdate(
      st, emb.filter($"vec_id" % 4 === 3), $"vec_id", $"embedding")
    assert(streamed == Ann.kmeansStateReport(st).collect().map(_.toString).toSeq)
  }

  test("streaming mini-batch kmeans equals the one-shot batch sequence") {
    import graft.ann.Ann
    val out = java.nio.file.Files.createTempDirectory("graft-kmeans-ingest").toString
    val streamed = Streaming.kmeansIngest(spark, dir, out, k = 4, nBatches = 3)
      .collect().map(_.toString).toSeq
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    var st = Ann.kmeansStateInit(
      emb.filter($"vec_id" % 3 === 0), $"vec_id", $"embedding", k = 4)
    (1 until 3).foreach { t =>
      st = Ann.kmeansStateUpdate(
        st, emb.filter($"vec_id" % 3 === t), $"vec_id", $"embedding")
    }
    val oneShot = Ann.kmeansStateReport(st).collect().map(_.toString).toSeq
    assert(streamed == oneShot)
  }

  test("stream-stream join equals batch interval join") {
    val streamed = Streaming.clickPurchaseJoin(spark, dir, withinMinutes = 240)
      .collect().map(_.toString).sorted
    val ev = batchEvents
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"), $"ts".as("purchase_ts"))
    val batch = clicks.join(purchases,
        $"user_id" === $"p_user" &&
          $"purchase_ts" >= $"click_ts" &&
          $"purchase_ts" <= $"click_ts" + expr("INTERVAL 240 MINUTES"))
      .select($"click_id", $"purchase_id", $"user_id",
        expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000")
          .as("lag_seconds"))
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("stream-static enrichment equals batch join") {
    val streamed = Streaming.enrichWithCustomers(spark, dir)
      .collect().map(_.toString).sorted
    val batch = batchEvents
      .join(spark.read.parquet(s"$dir/customer.parquet")
        .select($"c_custkey", $"c_mktsegment"), $"user_id" === $"c_custkey")
      .select($"event_id", $"user_id", $"c_mktsegment", $"event_type", $"value")
      .collect().map(_.toString).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }

  test("streaming ingest maintains the index across batches and prunes") {
    import graft.index.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ingest-spec").toString
    spark.conf.set(graft.index.IndexConf.MetastoreLocation, s"$work/metastore")
    val tableDir = s"$work/events_table"
    val indexed = Streaming.ingestIndexed(
      spark, dir, tableDir, indexCols = Seq("user_id", "event_type"))
    // every streamed row landed, none duplicated
    val got = indexed.orderBy($"event_id").collect().map(_.toString)
    val want = batchEvents.orderBy($"event_id").collect().map(_.toString)
    assert(got.length == want.length && got.sameElements(want))
    assert(spark.index.exists.parquet(tableDir))
    // the per-batch appends left multiple files; an indexed equality
    // predicate must prune to a subset
    val user = batchEvents.select($"user_id").head.getLong(0)
    val q = spark.index.parquet(tableDir).filter($"user_id" === user)
    val fi = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }.get
    q.collect()
    assert(fi.lastTotalFiles >= 4, s"expected >=4 ingested files: ${fi.lastTotalFiles}")
    assert(fi.lastListedFiles < fi.lastTotalFiles,
      s"ingested index should prune: ${fi.lastListedFiles}/${fi.lastTotalFiles}")
  }

  test("ingest restart over a stale metastore entry (table dir gone) recreates the index") {
    import graft.index.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ingest-stale").toString
    spark.conf.set(graft.index.IndexConf.MetastoreLocation, s"$work/metastore")
    val tableDir = s"$work/events_table"
    // first build leaves a live index entry in the metastore
    Streaming.ingestIndexed(spark, dir, tableDir, indexCols = Seq("user_id"))
    assert(spark.index.exists.parquet(tableDir))
    // simulate the stale-restart state: the TABLE dir is gone (e.g. a
    // fixture cleanup) while the metastore entry survives — possibly
    // from an older metadata version. The re-ingest must CREATE over it
    // on batch 0, not route to refresh() and trip the version gate
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tableDir), true)
    val again = Streaming.ingestIndexed(spark, dir, tableDir, indexCols = Seq("user_id"))
    assert(again.count() == batchEvents.count())
    assert(spark.index.exists.parquet(tableDir))
  }

  test("stateful sessionizer agrees with window-function sessionize") {
    val events = batchEvents
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[Event]
    val stateful = StatefulSessionize(events, gapMinutes = 30)
      .groupBy($"user_id")
      .agg(max($"session_seq").as("n_sessions"), count(lit(1)).as("n_events"))
      .collect().map(_.toString).sorted
    val windowed = Streaming.sessionize(batchEvents, gapMinutes = 30)
      .groupBy($"user_id")
      .agg(max($"session_seq").as("n_sessions"), count(lit(1)).as("n_events"))
      .collect().map(_.toString).sorted
    assert(stateful.sameElements(windowed))
  }

  test("session stats are sane") {
    val stats = Streaming.sessionStats(batchEvents, gapMinutes = 30)
    val row = stats.agg(sum($"n_sessions"), max($"max_session_events")).head
    assert(row.getLong(0) > 0)
  }

  test("streaming distinct equals batch distinct, one row per key") {
    val streamed = Streaming.streamingDistinct(spark, dir, Seq("user_id", "event_type"))
      .collect().map(_.toString).sorted
    val batch = batchEvents.select($"user_id", $"event_type").distinct()
      .collect().map(_.toString).sorted
    assert(streamed.length == batch.length, "one emission per distinct key")
    assert(streamed.sameElements(batch))
  }

  test("streaming near-dedup ingest equals sequential batch incremental dedup") {
    // 12 docs, nBatches=3 → slice=4: buckets {0-3} {4-7} {8-11}. Planted:
    // within-batch dup (1≈2), cross-batch dups (0≈5, 3≈9), a chain whose
    // earlier member was itself dropped (2≈1 kept? no: 1<2 so 2 dropped;
    // 6≈2 must still be dropped only if similar to a KEPT doc).
    val fixture = java.nio.file.Files.createTempDirectory("graft-neardedup").toString
    val mk = (s: String) => s
    val docs = Seq(
      0L -> "alpha beta gamma delta epsilon zeta",
      1L -> "one two three four five six seven",
      2L -> "one two three four five six eight", // ≈1 (same batch)
      3L -> "red orange yellow green blue indigo",
      4L -> "totally fresh content in bucket one",
      5L -> "alpha beta gamma delta epsilon zeta", // =0 (vs index)
      6L -> "one two three four five six nine", // ≈1 (kept, earlier batch)
      7L -> "unique text that matches nothing else",
      8L -> "more singular prose without a twin",
      9L -> "red orange yellow green blue violet", // ≈3 (vs index)
      10L -> "closing words entirely their own here",
      11L -> "final document with novel token streams"
    ).map { case (i, s) => (i, mk(s)) }.toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$fixture/documents.parquet")
    val work = s"$fixture/work"
    val streamed = Streaming.nearDedupIngest(spark, fixture, work,
        nBatches = 3, numHashes = 64, bands = 16, shingleK = 3, threshold = 0.5)
      .select($"doc_id").as[Long].collect().sorted
    // reference: same rule replayed sequentially from the one-shot pair set
    // (dedupAgainstIndex and minhashPairs share signature arithmetic, so
    // the pair sets are identical)
    val pairs = graft.dedup.Dedup.minhashPairs(docs, $"doc_id", $"text",
        numHashes = 64, bands = 16, shingleK = 3, threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val sim = (a: Long, b: Long) => pairs((a min b, a max b))
    val slice = 11L / 3 + 1
    var kept = Vector[Long]()
    (0L until 3L).foreach { b =>
      val batch = (0L to 11L).filter(_ / slice == b)
      val s = batch.filterNot(dd => kept.exists(c => sim(c, dd)))
      val k = s.filterNot(dd => s.exists(c => c < dd && sim(c, dd)))
      kept ++= k
    }
    assert(streamed.toSeq == kept.sorted)
    // the planted dups actually engaged each tier
    assert(!streamed.contains(2L), "within-batch dup must drop")
    assert(!streamed.contains(5L) && !streamed.contains(9L),
      "cross-batch dups must drop against the index")
    assert(streamed.contains(0L) && streamed.contains(1L) && streamed.contains(3L))
  }

  test("streaming winnow ingest equals sequential batch replay") {
    val run = "the missile knows where it is at all times because it " +
      "knows where it is not and by subtracting where it is"
    val fixture = java.nio.file.Files.createTempDirectory("graft-wining").toString
    val docs = Seq(
      0L -> s"first carrier $run first tail",
      1L -> "fresh words with no overlap at all in this one",
      2L -> s"second carrier $run second tail", // ≈0 (same batch) → drop
      3L -> "another standalone document with its own content",
      4L -> s"third carrier later on $run third tail", // ≈0 (vs index)
      5L -> "yet more singular prose in the second bucket",
      6L -> "closing text matching nothing else anywhere",
      7L -> s"fourth carrier $run fourth tail" // ≈0 (vs index)
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$fixture/documents.parquet")
    val streamed = Streaming.winnowIngest(spark, fixture, s"$fixture/work",
        nBatches = 3, k = 12, w = 8, minShared = 3L)
      .select($"doc_id").as[Long].collect().sorted
    // reference: the same keep rule replayed sequentially from the
    // one-shot pair set (index probe and winnowPairs share the kernel)
    val pairs = graft.text.TextFunctions.winnowPairs(docs, $"doc_id",
        $"text", k = 12, w = 8, minShared = 3L)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val sim = (a: Long, b: Long) => pairs((a min b, a max b))
    val slice = 7L / 3 + 1
    var kept = Vector[Long]()
    (0L until 3L).foreach { b =>
      val batch = (0L to 7L).filter(_ / slice == b)
      val s = batch.filterNot(dd => kept.exists(c => sim(c, dd)))
      val k = s.filterNot(dd => s.exists(c => c < dd && sim(c, dd)))
      kept ++= k
    }
    assert(streamed.toSeq == kept.sorted)
    assert(!streamed.contains(2L), "within-batch overlap must drop")
    assert(!streamed.contains(4L) && !streamed.contains(7L),
      "cross-batch overlaps must drop against the index")
    assert(streamed.contains(0L) && streamed.contains(1L))
  }

  test("streaming upsert ingest equals the one-shot merge") {
    val fixture = java.nio.file.Files.createTempDirectory("graft-upsing").toString
    val docs = (0L until 30L).map(i => (i, s"s${i % 3}", i * 7))
      .toDF("doc_id", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$fixture/documents.parquet")
    val got = Streaming.upsertIngest(spark, fixture, s"$fixture/work",
        nBatches = 3, numBuckets = 8)
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val expect = (0L until 30L).map { i =>
      (i, (s"s${i % 3}", if (i % 3 == 0) i * 70 else i * 7))
    }.toMap
    assert(got == expect)
  }

  test("streaming upsert: a later batch overrides an earlier one's key") {
    // hand-staged batches (ranged slicing never repeats a key): both
    // update k=1, the mtime-later file must win in the final table
    val root = java.nio.file.Files.createTempDirectory("graft-upsord").toString
    val tableDir = s"$root/keyed"
    graft.ops.Upsert.writeKeyedTable(
      Seq((1L, "orig"), (2L, "keep")).toDF("k", "v"), "k", tableDir, 4)
    val staged = s"$root/staged"
    new java.io.File(staged).mkdirs()
    Seq(Seq((1L, "first")), Seq((1L, "second"), (3L, "ins")))
      .zipWithIndex.foreach { case (rows, i) =>
        val b = s"$root/b$i"
        rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(b)
        val part = new java.io.File(b).listFiles()
          .find(_.getName.startsWith("part-")).get
        val dst = new java.io.File(staged, f"b$i%04d.parquet")
        assert(part.renameTo(dst))
        dst.setLastModified(60000L * (i + 1))
      }
    val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) =>
        if (batch.take(1).nonEmpty) {
          graft.ops.Upsert.upsertByKey(spark, tableDir, batch, "k", 4)
          ()
        }
    val q = spark.readStream
      .schema(Seq((1L, "x")).toDF("k", "v").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$root/_ckpt")
      .foreachBatch(ingest)
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = graft.ops.Upsert.readKeyedTable(spark, tableDir)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "second", 2L -> "keep", 3L -> "ins"), got.toString)
  }

  test("streaming hll ingest equals the one-shot register sketch") {
    val fixture = java.nio.file.Files.createTempDirectory("graft-hlling").toString
    val docs = (0L until 40L).map(i =>
      (i, s"tok${i % 17} tok${(i * 3) % 29} shared")).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$fixture/documents.parquet")
    val streamed = Streaming.hllIngest(spark, fixture, s"$fixture/work",
        nBatches = 4, p = 8)
      .as[(Int, Int)].collect().toSet
    val oneShot = graft.ops.Hll.hllRegisters(
        docs.select(explode(
          graft.text.TextFunctions.tokens($"text")).as("t")),
        col("t"), p = 8)
      .as[(Int, Int)].collect().toSet
    assert(streamed == oneShot && streamed.nonEmpty)
  }

  test("streaming data-card ingest equals the one-shot card") {
    val fixture = java.nio.file.Files.createTempDirectory("graft-carding").toString
    val docs = (0L until 30L).map(i =>
      (i, s"s${i % 2}", s"the doc number $i with words ${i % 5}"))
      .toDF("doc_id", "source", "text")
    docs.write.mode("overwrite").parquet(s"$fixture/documents.parquet")
    val streamed = Streaming.dataCardIngest(spark, fixture, s"$fixture/work",
        nBatches = 3, p = 10)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val oneDir = s"$fixture/oneshot"
    graft.ops.Report.appendDataCardSegment(
      docs, col("source"), col("text"), 10, oneDir, "all")
    val oneShot = graft.ops.Report.readDataCard(spark, oneDir, 10)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(streamed == oneShot && streamed.keySet == Set("s0", "s1"))
  }

  test("streaming search ingest grows the index to one-shot parity") {
    val fixture = java.nio.file.Files.createTempDirectory("graft-searching").toString
    val docs = Seq(
      0L -> "spark window functions", 1L -> "spark alone",
      2L -> "window alone", 3L -> "nothing at all",
      4L -> "spark and window again", 5L -> "window spark inverted",
      6L -> "last plain row", 7L -> "spark window trailer"
    ).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$fixture/documents.parquet")
    val streamed = Streaming.searchIngest(spark, fixture, s"$fixture/work",
        terms = Seq("spark", "window"), nBatches = 4, chunkSize = 2)
      .as[Long].collect().sorted.toSeq
    // parity with the raw-text path AND the expected hit set
    val scratch = graft.text.TextFunctions.searchAll(
      docs, $"doc_id", $"text", Seq("spark", "window"))
      .as[Long].collect().sorted.toSeq
    assert(streamed == scratch && streamed == Seq(0L, 4L, 5L, 7L))
    // BM25 over the streamed index equals the from-scratch run too
    val bIdx = graft.text.SearchIndex.bm25Index(spark,
        s"$fixture/work/search_index", Seq("spark", "window"), chunkSize = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bRaw = graft.text.Tfidf.bm25(docs, $"doc_id", $"text",
        Seq("spark", "window"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bIdx == bRaw)
  }

  test("streaming vector ingest grows the IVFADC index to one-shot parity") {
    val fixture = java.nio.file.Files.createTempDirectory("graft-vecing").toString
    val vecs = (0 until 12).map { i =>
      (i.toLong, (0 until 8).map(j => ((i * 31 + j * 7) % 13 - 6) / 3.0f))
    }.toDF("vec_id", "embedding")
    vecs.write.mode("overwrite").parquet(s"$fixture/embeddings.parquet")
    val q = vecs.filter($"vec_id" === 0).head.getSeq[Float](1).map(_.toDouble)
    val streamed = Streaming.vectorIngest(spark, fixture, s"$fixture/work",
        q, k = 5, excludeId = Some(0L), nBatches = 3,
        dim = 8, cells = 4, nprobe = 4, m = 2, codebookK = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // parity with a one-shot build over the same vectors
    val oneShot = java.nio.file.Files.createTempDirectory("graft-vec1").toString
    graft.ann.Ann.buildIvfPqIndex(vecs, col("vec_id"), col("embedding"),
      oneShot, dim = 8, cells = 4, m = 2, codebookK = 4)
    val direct = graft.ann.Ann.queryIvfPqIndex(spark, oneShot, q, k = 5,
        cells = 4, nprobe = 4, m = 2, codebookK = 4, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(streamed == direct && streamed.nonEmpty)
  }

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }
}

package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the events table.
  *
  * The reference is batch-only (SURVEY.md §1.1: "no streams"), but a
  * complete training-data engine needs the streaming shapes: windowed
  * aggregation with watermarks, and gap-based sessionization. Both are
  * expressed so the streaming and batch plans share semantics — the
  * streaming run (file source → memory sink, processAllAvailable) must
  * reproduce the batch/DuckDB answer exactly on a static input.
  */
object Streaming {

  private val counter = new AtomicInteger(0)

  /** Wall-clock spent INSIDE foreachBatch bodies since the last reset —
    * the per-batch WORK of a streaming query, separated from the
    * micro-batch harness's fixed overhead (source listing, checkpoint
    * commits, trigger scheduling). The bench resets this around each
    * `q_stream_*` run and reports it as `stream_work` so a real
    * per-batch regression is visible above the 4-micro-batch cascade
    * noise. foreachBatch bodies run on the streaming query thread, so
    * the clock is an AtomicLong, not a ThreadLocal. */
  object BatchWork {
    private val nanos = new java.util.concurrent.atomic.AtomicLong(0)
    private[streaming] def add(n: Long): Unit = { nanos.addAndGet(n); () }
    def reset(): Unit = nanos.set(0)
    def seconds: Double = nanos.get / 1e9
  }

  /** Wrap a foreachBatch body so its wall-clock lands on [[BatchWork]]. */
  private def timedBatch(
      f: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit)
      : (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (b, id) => {
      val t0 = System.nanoTime()
      try f(b, id) finally BatchWork.add(System.nanoTime() - t0)
    }

  /** Session for a streaming query with bounded state-shuffle parallelism:
    * the hourly aggregations key on windows × event types, far below the
    * batch shuffle default, so fewer state-store partitions mean far
    * fewer checkpoint files per microbatch. `statePartitions` is the
    * caller-visible knob — raise it for high-cardinality keys. Isolated
    * via newSession so the batch session's shuffle setting is untouched. */
  private def streamingSession(spark: SparkSession, statePartitions: Int): SparkSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", statePartitions.toString)
    ss
  }

  /** events.parquet with `ts` normalized to a session-tz TIMESTAMP —
    * streaming twin of SparkEntry.eventsTbl (schema-adaptive: raw-nanos
    * long or TIMESTAMP_NTZ, depending on testdata generation). */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    graft.SparkEntry.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .parquet(s"$dir/events.parque[t]")) // glob: file source accepts globs, not bare files
  }

  /** Hourly tumbling-window aggregation as a real streaming query:
    * watermarked event time, complete-mode memory sink, drained with
    * processAllAvailable so a static parquet input yields the exact batch
    * answer. Returns the materialized result. */
  def hourlyEventCounts(
      parent: SparkSession, dir: String, statePartitions: Int = 8): DataFrame = {
    val spark = streamingSession(parent, statePartitions)
    val name = s"graft_stream_${counter.incrementAndGet()}"
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy(col("win_start"), col("event_type"))
  }

  /** The at-scale variant of [[hourlyEventCounts]]: update output mode +
    * foreachBatch upsert into a parquet directory. Complete mode re-emits
    * the whole result every trigger and the memory sink holds it on the
    * driver — fine for a test, fatal at 100 TB. Update mode emits only
    * changed windows; the watermark lets Spark evict window state older
    * than (max event time - 1 hour); the upsert keeps the file sink
    * consistent under re-emission. Returns the materialized sink table. */
  def hourlyEventCountsUpsert(
      parent: SparkSession, dir: String, outDir: String,
      statePartitions: Int = 8): DataFrame = {
    val spark = streamingSession(parent, statePartitions)
    val dataDir = s"$outDir/data"
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total_value"))
    val upsert: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, batchId) => upsertParquet(batch, dataDir, Seq("win_start", "event_type"), batchId)
    val q = agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch(timedBatch(upsert))
      .start()
    try q.processAllAvailable() finally q.stop()
    // an all-empty source never creates the sink dir (every micro-batch
    // hits upsertParquet's no-data early return) — return a typed empty
    // result instead of letting the parquet read throw
    val dataPath = new org.apache.hadoop.fs.Path(dataDir)
    if (dataPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(dataPath))
      spark.read.parquet(dataDir)
    else
      spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), agg.schema)
  }

  /** Last-write-wins upsert of `batch` into a parquet dir keyed by `keys`:
    * surviving old rows (anti-join on the batch's keys) + the new batch are
    * written to a temp dir, the old dir is renamed aside, the new one
    * renamed in, and only then is the old data deleted — a crash between
    * steps leaves either the old or the new complete sink on disk, never
    * neither. Structured Streaming reruns the crashed batch (same batchId),
    * and this method self-heals on that retry: a rename-aside copy with no
    * data dir means the crash hit between the two renames, so the copy is
    * restored before merging; a rename-aside copy NEXT TO a data dir means
    * the swap completed and only the cleanup was lost, so the stale copy is
    * dropped (the merge itself is idempotent — re-applying the same batch
    * over already-upserted data anti-joins its own keys out first). The
    * plain-parquet stand-in for a MERGE-capable table format. */
  private[streaming] def upsertParquet(
      batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      path: String,
      keys: Seq[String],
      batchId: Long): Unit = {
    // watermark finalization triggers a no-data microbatch — nothing to
    // upsert, skip the rewrite
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val dataPath = new org.apache.hadoop.fs.Path(path)
    val fs = dataPath.getFileSystem(hconf)
    val old = new org.apache.hadoop.fs.Path(s"${path}_old_$batchId")
    if (!fs.exists(dataPath) && fs.exists(old)) {
      // retry after a crash between the two renames: the rename-aside copy
      // is the only complete sink — restore it before merging
      fs.rename(old, dataPath)
    }
    val merged =
      if (!fs.exists(dataPath)) batch
      else {
        val existing = spark.read.parquet(path)
        existing.join(batch.select(keys.map(col): _*), keys, "left_anti")
          .unionByName(batch)
      }
    val tmp = new org.apache.hadoop.fs.Path(s"${path}_tmp_$batchId")
    // The sink's cardinality is windows × event types — orders of
    // magnitude below the input — so a handful of files suffices and
    // avoids per-trigger small-file buildup.
    merged.coalesce(4).write.mode("overwrite").parquet(tmp.toString)
    // stale copy from a retry whose swap completed but whose cleanup
    // didn't: dataPath is the newer state, drop the leftover so the
    // rename-aside below can't collide
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(dataPath)) fs.rename(dataPath, old)
    fs.rename(tmp, dataPath)
    if (fs.exists(old)) fs.delete(old, true)
    ()
  }

  /** Streaming exact deduplication: emit each distinct key combination
    * once, as it first arrives — Structured Streaming's stateful
    * `dropDuplicates` over the key columns only. Projecting to the keys
    * BEFORE deduplicating keeps the state store entries key-sized and
    * makes the emitted rows deterministic (a full-row variant would keep
    * whichever row arrived first). Append output mode: each key crosses
    * the sink exactly once. State is unbounded by design for global
    * dedup; when keys age out of relevance, bound it with
    * `dropDuplicatesWithinWatermark` instead. */
  def streamingDistinct(
      parent: SparkSession, dir: String, keys: Seq[String],
      statePartitions: Int = 2): DataFrame = {
    require(keys.nonEmpty, "at least one key column required")
    val spark = streamingSession(parent, statePartitions)
    val name = s"graft_stream_${counter.incrementAndGet()}"
    val q = eventsStream(spark, dir)
      .select(keys.map(col): _*)
      .dropDuplicates(keys)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy(keys.map(col): _*)
  }

  /** Watermarked STREAM-STREAM inner join: clicks joined to the purchases
    * that follow them within `withinMinutes`, per user. The canonical
    * funnel/attribution shape, and the streaming operator whose state
    * design actually matters at scale: both sides are watermarked and the
    * join condition bounds purchase_ts to [click_ts, click_ts + window],
    * so Spark derives a state-retention horizon per side and EVICTS
    * buffered rows as the watermark passes — state is O(events in the
    * watermark+window horizon), not O(stream history). Inner-join matches
    * emit eagerly (append mode); the shuffle keys both sides on user_id.
    * On a static input, drained with processAllAvailable, the result is
    * exactly the batch join — the parity the oracle checks.
    *
    * @return (click_id, purchase_id, user_id, lag_seconds)
    */
  def clickPurchaseJoin(
      parent: SparkSession, dir: String, withinMinutes: Int = 240,
      statePartitions: Int = 8): DataFrame = {
    require(withinMinutes > 0, "withinMinutes must be positive")
    val spark = streamingSession(parent, statePartitions)
    val name = s"graft_stream_${counter.incrementAndGet()}"
    val clicks = eventsStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val purchases = eventsStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    val joined = clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        // integer div: exact at any magnitude (see eventsStream's nanos note)
        expr("(unix_micros(purchase_ts) - unix_micros(click_ts)) div 1000000")
          .as("lag_seconds"))
    val q = joined.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy(col("click_id"), col("purchase_id"))
  }

  /** STREAM-STATIC enrichment join: the events stream joined to the
    * (small) customer dimension, broadcast to every task — the stateless
    * workhorse of streaming ingest. No watermark and no state store: each
    * micro-batch joins against the static side independently, so this
    * scales with batch size, not stream history; the dimension refreshes
    * per batch read. Append mode, row-level output. */
  def enrichWithCustomers(
      parent: SparkSession, dir: String, statePartitions: Int = 2): DataFrame = {
    val spark = streamingSession(parent, statePartitions)
    val name = s"graft_stream_${counter.incrementAndGet()}"
    val customers = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"))
    val q = eventsStream(spark, dir)
      .join(broadcast(customers), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_mktsegment"),
        col("event_type"), col("value"))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy(col("event_id"))
  }

  /** STREAMING INGEST WITH INDEX MAINTENANCE: the integration a graft
    * deployment actually runs — events stream appended to a parquet table
    * via foreachBatch, with the data-skipping index CREATED on the first
    * batch and INCREMENTALLY REFRESHED on every subsequent one (delta
    * footer + sketch jobs only, never a rebuild). The result is a table
    * that is queryable through `spark.index.parquet` with file pruning
    * the moment the stream commits. The source is staged as multiple
    * files and drained with maxFilesPerTrigger=1 so the refresh path is
    * genuinely exercised per batch.
    *
    * @return the INDEXED DataFrame over the ingested table */
  def ingestIndexed(
      parent: SparkSession, dir: String, tableDir: String,
      indexCols: Seq[String], sourceFiles: Int = 4,
      statePartitions: Int = 2): DataFrame = {
    require(indexCols.nonEmpty, "at least one index column required")
    import graft.index.implicits._
    val spark = streamingSession(parent, statePartitions)
    // the child session must resolve the SAME metastore as the caller
    parent.conf.getOption(graft.index.IndexConf.MetastoreLocation)
      .foreach(loc => spark.conf.set(graft.index.IndexConf.MetastoreLocation, loc))
    val work = s"${tableDir}_ingest_work"
    val srcDir = s"$work/source"
    // idempotent restart: a crashed build leaves a partial table and a
    // checkpoint that would treat re-staged source files as unseen —
    // re-appending the full dataset next to the partial one. Start clean.
    val hconf = spark.sparkContext.hadoopConfiguration
    Seq(tableDir, work).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(hconf)
      if (fs.exists(hp)) fs.delete(hp, true)
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // keyed staging (the kafka-partition-by-key shape): each source file
    // holds a hash slice of the first index column, so the ingested
    // files carry selective per-file value sets for the index to prune on
    graft.SparkEntry.normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
      .repartition(sourceFiles, col(indexCols.head))
      .write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    // batch 0 CREATEs with overwrite (replacing any stale metastore
    // entry left by a prior build — possibly an older metadata version
    // that refresh() would reject); later batches take the incremental
    // refresh. The start-clean above always deletes the checkpoint, so
    // batch ids are fresh from 0 — an `exists` probe here would instead
    // see the stale entry and mis-route the first batch to refresh()
    val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, batchId) => {
        batch.write.mode("append").parquet(tableDir)
        if (batchId == 0L) {
          spark.index.create.mode("overwrite")
            .indexBy(indexCols: _*).parquet(tableDir)
        } else {
          spark.index.refresh.parquet(tableDir)
          ()
        }
      }
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$work/_checkpoint")
      .foreachBatch(timedBatch(ingest))
      .start()
    try q.processAllAvailable() finally q.stop()
    parent.index.parquet(tableDir)
  }

  /** Read back the union of committed per-batch output dirs (`b<id>`,
    * each written with mode=overwrite, so a redelivered batch replaces
    * its own output — exactly-once). Listed explicitly: a `b*` glob
    * read trips Spark's FileStreamSink metadata probe, and a run whose
    * batches all filtered to nothing has no dirs at all. */
  private def readCommittedBatches(
      spark: SparkSession, outDir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(outDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = Option(fs.globStatus(new org.apache.hadoop.fs.Path(s"$outDir/b*")))
      .getOrElse(Array.empty).map(_.getPath.toString)
    if (dirs.isEmpty) spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
    else spark.read.schema(schema).parquet(dirs.toIndexedSeq: _*)
  }

  /** Stage `docs` as `nBatches` ranged `idCol` slices under
    * `workDir/staged`, one file per slice with strictly increasing
    * mtimes so the file stream source replays arrival order. `format`
    * "parquet" keeps all columns; "text" writes the single non-id
    * column as raw lines. Ids must be non-negative — the range/modulo
    * bucketing maps a negative id outside [0, nBatches) and the row
    * would silently vanish from every slice. Returns None on an empty
    * corpus. Shared by the ingest shapes. */
  private def stageRangedSlices(
      spark: SparkSession, docs: DataFrame, workDir: String,
      nBatches: Int, idCol: String = "doc_id",
      modulo: Boolean = false, format: String = "parquet"): Option[String] = {
    require(format == "parquet" || format == "text", s"unsupported: $format")
    val hconf = spark.sparkContext.hadoopConfiguration
    val workPath = new org.apache.hadoop.fs.Path(workDir)
    val fs = workPath.getFileSystem(hconf)
    if (fs.exists(workPath)) fs.delete(workPath, true)
    val bounds = docs.agg(min(col(idCol)), max(col(idCol))).head
    if (bounds.isNullAt(1)) return None // empty corpus: nothing to ingest
    require(bounds.getLong(0) >= 0L,
      s"slice ids must be non-negative (got min ${bounds.getLong(0)}) — " +
        "a negative id falls outside every slice and would be dropped")
    val maxId = bounds.getLong(1)
    val slice = maxId / nBatches + 1 // ids 0..maxId → buckets 0..nBatches-1
    val staged = s"$workDir/staged"
    fs.mkdirs(new org.apache.hadoop.fs.Path(staged))
    val ext = if (format == "text") "txt" else "parquet"
    // ONE write job for all slices (was nBatches sequential filter+write
    // jobs — pure driver/staging overhead inside every timed streaming
    // query): bucket becomes a partition column, repartition(__b) lands
    // each bucket in exactly one task ⇒ exactly one file per slice, then
    // the part files are renamed into the flat mtime-ordered layout the
    // file source replays. Data per slice is byte-identical to the old
    // per-slice writes (same rows, same columns — __b never reaches the
    // file contents).
    val bucket =
      if (modulo) col(idCol) % nBatches else expr(s"$idCol div $slice")
    val tmpDir = s"$workDir/stage_tmp"
    val out0 = docs.withColumn("__b", bucket.cast("int"))
      .repartition(col("__b"))
    val out = if (format == "text") out0.drop(idCol) else out0
    // maxRecordsPerFile=0 pins the one-file-per-bucket invariant the
    // renames below rely on, even when the caller's session sets a
    // global spark.sql.files.maxRecordsPerFile (which would legally
    // split a bucket into several part files)
    out.write.mode("overwrite").option("maxRecordsPerFile", 0)
      .partitionBy("__b").format(format).save(tmpDir)
    (0 until nBatches).foreach { b =>
      val parts = Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$tmpDir/__b=$b/part-*")))
        .getOrElse(Array.empty)
      require(parts.length <= 1,
        s"staging expected at most one file for slice $b, got ${parts.length}")
      val dst = new org.apache.hadoop.fs.Path(f"$staged/b$b%04d.$ext")
      if (parts.length == 1) fs.rename(parts(0).getPath, dst)
      else {
        // an EMPTY slice (sparse ids) still stages a zero-row file so the
        // batch cascade sees every slice — exactly the old per-slice
        // behavior (the only extra job of the single-pass staging, paid
        // per empty slice only)
        val emptyDir = s"$workDir/bempty$b"
        out.filter(lit(false)).drop("__b").coalesce(1)
          .write.mode("overwrite").format(format).save(emptyDir)
        val p = fs.globStatus(
          new org.apache.hadoop.fs.Path(s"$emptyDir/part-*"))(0).getPath
        fs.rename(p, dst)
        // the scratch dir (committer metadata, _SUCCESS) must not
        // accumulate next to the staged slices
        fs.delete(new org.apache.hadoop.fs.Path(emptyDir), true)
      }
      // strictly increasing mtimes: the file source replays arrival order
      fs.setTimes(dst, 60000L * (b + 1), -1)
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmpDir), true)
    Some(staged)
  }

  /** STREAMING NEAR-DUPLICATE-FILTERED INGEST — the dedup-at-the-door
    * shape a training-data pipeline runs on arriving crawl shards:
    * documents stream in as files (one micro-batch per file, arrival
    * order = file mtime), and each batch is (1) deduped against the
    * MATERIALIZED MinHash index of everything kept so far
    * ([[graft.dedup.Dedup.dedupAgainstIndex]] — the corpus text is never
    * re-read), (2) deduped within itself ([[graft.dedup.Dedup.dedupMinhash]]
    * — drop a doc that pairs with a smaller surviving id), then the kept
    * docs append to the output table AND their signatures/band keys
    * append to the index, so every later batch dedups against them.
    *
    * At 100 TB this is the shape that keeps ingest incremental: per batch
    * the work is batch-sized signature computation + an equi-join against
    * stored band keys (ids-only shuffle), never a corpus re-scan.
    * Deterministic given the staged file order, which this harness pins
    * by writing ranged slices (bucket = doc_id div slice) with strictly
    * increasing mtimes.
    *
    * @return the kept documents (read back from the output table) */
  def nearDedupIngest(
      parent: SparkSession, dir: String, workDir: String,
      nBatches: Int = 4,
      numHashes: Int = 64, bands: Int = 16, shingleK: Int = 3,
      threshold: Double = 0.5,
      statePartitions: Int = 8): DataFrame = {
    require(nBatches >= 1, s"nBatches must be >= 1: $nBatches")
    val spark = streamingSession(parent, statePartitions)
    // eager checkpoint: the max-id probe plus the nBatches bucket writes
    // otherwise re-scan the source once each
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    val staged = stageRangedSlices(spark, docs, workDir, nBatches) match {
      case None => return docs.limit(0)
      case Some(s) => s
    }
    val outDir = s"$workDir/kept"
    val idxDir = s"$workDir/minhash_index"
    // foreachBatch runs sequentially on the driver: plain var is safe.
    // Initialized from COMMITTED segments, not false: a crash-restart
    // replays batches against the index state earlier batches already
    // committed — starting blind would skip the cross-batch dedup the
    // ingest exists for
    var indexNonEmpty = graft.ops.Segments.live(spark, idxDir).nonEmpty
    val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, batchId) => {
        // sign ONCE per batch — (doc_id, sig) only, ~512 B/doc: the
        // probe, the in-batch dedup and the segment append all share
        // this frame (the tokenize→shingle→minhash kernel used to run
        // three times per batch); text is recovered by ONE semi-join at
        // the end instead of riding the checkpoints
        val signed = graft.dedup.Dedup.minhashSigned(
          batch, col("doc_id"), col("text"), numHashes, shingleK)
        val vsIndex =
          if (indexNonEmpty)
            graft.dedup.Dedup.dedupAgainstIndexSigned(spark, signed, idxDir,
              numHashes, bands, shingleK, threshold)
          else signed
        // kept-count observed ON the checkpoint job: the emptiness
        // probe used to be a separate take(1) action per batch
        val obsKept = org.apache.spark.sql.Observation()
        val kept = graft.dedup.Dedup.dedupMinhashSigned(vsIndex,
            numHashes, bands, threshold)
          .observe(obsKept, count(lit(1)).as("n"))
          .localCheckpoint() // one computation feeds the table AND the index
        // an all-duplicates batch writes nothing: the output dir never
        // holds schema-less empty batch dirs and the index never holds
        // empty segments. Kept docs land in a PER-BATCH dir written with
        // overwrite (b<batchId>, like jsonlFileIngest) and fingerprints
        // as a committed SEGMENT (segmentId = batchId): a batch that
        // dies mid-write is invisible, and a re-delivered batch
        // OVERWRITES its own output instead of appending the same kept
        // rows twice — exactly-once for the table AND the index
        if (obsKept.get("n").asInstanceOf[Long] > 0L) {
          // the kept-docs write and the segment's data writes are
          // independent (segment visibility is gated by its commit
          // marker, written after both of ITS writes land) — overlap
          // them so one batch pays max() instead of sum() of the two
          // tails (guide §2.6); kept ids broadcast into the text
          // recovery semi-join (batch-bounded build side)
          graft.ops.Parallel.inParallel(
            batch.join(broadcast(kept.select(col("doc_id"))),
                Seq("doc_id"), "left_semi")
              .write.mode("overwrite").parquet(s"$outDir/b$batchId"),
            graft.dedup.Dedup.appendMinhashSegmentSigned(kept,
              idxDir, s"b$batchId", numHashes, bands, shingleK))
          indexNonEmpty = true
        }
      }
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch(timedBatch(ingest))
      .start()
    try q.processAllAvailable() finally q.stop()
    readCommittedBatches(spark, outDir, docs.schema)
  }

  /** STREAMING VERBATIM-OVERLAP-GATED INGEST — [[nearDedupIngest]]'s
    * winnowing twin, for the EXACT-substring duplication MinHash can't
    * see (a long copied passage inside an otherwise fresh doc): each
    * arriving batch is (1) checked against the MATERIALIZED winnow index
    * of everything kept so far
    * ([[graft.text.TextFunctions.dedupAgainstWinnowIndex]] — corpus text
    * never re-read), (2) deduped within itself (keep-smallest id per
    * match pair), then kept docs append to the output table AND their
    * fingerprints land as a committed index SEGMENT (redelivery
    * overwrites its own segment — exactly-once). Per batch the work is
    * batch-sized map-side selection + one hash equi-join against stored
    * fingerprints.
    *
    * @return the kept documents (read back from the output table) */
  def winnowIngest(
      parent: SparkSession, dir: String, workDir: String,
      nBatches: Int = 4,
      k: Int = 12, w: Int = 8, minShared: Long = 5L,
      statePartitions: Int = 8): DataFrame = {
    require(nBatches >= 1, s"nBatches must be >= 1: $nBatches")
    val spark = streamingSession(parent, statePartitions)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    val staged = stageRangedSlices(spark, docs, workDir, nBatches) match {
      case None => return docs.limit(0)
      case Some(s) => s
    }
    val outDir = s"$workDir/kept"
    val idxDir = s"$workDir/winnow_index"
    // committed-segment init, same crash-restart rationale as
    // nearDedupIngest
    var indexNonEmpty = graft.ops.Segments.live(spark, idxDir).nonEmpty
    val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, batchId) => {
        // fingerprint ONCE per batch — a distinct (doc_id, hash) frame
        // shared by the index probe, the in-batch dedup and the segment
        // append (the rolling-hash selection kernel used to run three
        // times per batch). Dup sets are ID frames anti-joined against
        // the FULL batch: a too-short doc has zero fingerprint rows but
        // must still be kept (it can't match anything)
        val fp = graft.text.TextFunctions.winnowFingerprintSet(
          batch, col("doc_id"), col("text"), k, w)
        // dup-id frames are batch-bounded — they BROADCAST into every
        // anti-join below, so no per-batch exchange of the batch/
        // fingerprint frames remains
        val idxDups =
          if (indexNonEmpty)
            Some(graft.text.TextFunctions.winnowIndexDupIdsFp(spark, fp,
              idxDir, k, w, minShared).localCheckpoint(eager = false))
          else None
        val fpAfterIdx = idxDups.map(d =>
          fp.join(broadcast(d), fp("doc_id") === d("__dup_id"), "left_anti"))
          .getOrElse(fp)
        val batchDups = graft.text.TextFunctions
          .winnowDupIdsFp(fpAfterIdx, minShared)
          .localCheckpoint(eager = false)
        val allDups = idxDups.map(_.union(batchDups)).getOrElse(batchDups)
        // kept-count observed ON the checkpoint job: the emptiness
        // probe used to be a separate take(1) action per batch
        val obsKept = org.apache.spark.sql.Observation()
        val kept = batch.join(broadcast(allDups),
            batch("doc_id") === allDups("__dup_id"), "left_anti")
          .observe(obsKept, count(lit(1)).as("n"))
          .localCheckpoint() // one computation feeds the table AND the index
        // per-batch overwrite dir + committed segment, both keyed by
        // batchId: a re-delivered batch overwrites its own output
        // instead of re-appending kept rows — exactly-once, matching
        // the docstring (all-duplicates batches write nothing at all)
        if (obsKept.get("n").asInstanceOf[Long] > 0L) {
          // independent writes overlap (guide §2.6): segment visibility
          // is still gated by its commit marker, written after its data
          val keptFp = fpAfterIdx.join(broadcast(batchDups),
            fpAfterIdx("doc_id") === batchDups("__dup_id"), "left_anti")
          graft.ops.Parallel.inParallel(
            kept.write.mode("overwrite").parquet(s"$outDir/b$batchId"),
            graft.text.TextFunctions.appendWinnowSegmentFp(
              keptFp, idxDir, s"b$batchId", k, w))
          indexNonEmpty = true
        }
      }
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch(timedBatch(ingest))
      .start()
    try q.processAllAvailable() finally q.stop()
    readCommittedBatches(spark, outDir, docs.schema)
  }

  /** STREAMING JSON-LINES FILE INGEST — the crawl front door, streamed:
    * raw `.jsonl` shards arrive as files (one micro-batch per file),
    * each batch routes through the one-pass PERMISSIVE parse
    * ([[graft.ops.Ingest.parseJsonTagged]] — good rows parsed under
    * `schemaDdl`, malformed rows keep their raw line as replay
    * evidence), and lands as a COMMITTED batch directory
    * (`b<batchId>`, overwritten on redelivery = exactly-once output).
    * The union of batch parses is the batch parse of the union, so the
    * served table shares the one-shot routing oracle.
    *
    * @return the routed table read back (parsed fields + `quarantined`
    *         + `raw`), typed empty on an empty source */
  def jsonlFileIngest(
      parent: SparkSession, lines: DataFrame,
      id: org.apache.spark.sql.Column, line: org.apache.spark.sql.Column,
      workDir: String, schemaDdl: String, nBatches: Int = 4,
      statePartitions: Int = 8): DataFrame = {
    require(nBatches >= 1, s"nBatches must be >= 1: $nBatches")
    val spark = streamingSession(parent, statePartitions)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)
    val src = lines.select(id.as("__id"), line.as("value")).localCheckpoint()
    val parseOf = (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row]) =>
      graft.ops.Ingest.parseJsonTagged(df.toDF(), col("value"), schema)
        .drop("value")
    val staged = stageRangedSlices(
      spark, src, workDir, nBatches, idCol = "__id", format = "text") match {
      case None => return parseOf(spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("value",
            org.apache.spark.sql.types.StringType)))))
      case Some(s) => s
    }
    val outDir = s"$workDir/routed"
    val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, batchId) =>
        if (batch.take(1).nonEmpty) {
          parseOf(batch).write.mode("overwrite").parquet(s"$outDir/b$batchId")
        }
    val q = spark.readStream
      .option("maxFilesPerTrigger", 1)
      .text(staged)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch(timedBatch(ingest))
      .start()
    try q.processAllAvailable() finally q.stop()
    // shared committed-batch readback; the routed schema is the parse of
    // an empty value frame (same shape every batch dir carries)
    val routedSchema = parseOf(spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.StringType))))).schema
    readCommittedBatches(spark, outDir, routedSchema)
  }

  /** STREAMING MINI-BATCH K-MEANS — live centroid maintenance for the
    * vector-serving indexes: embedding batches arrive as files (one
    * micro-batch per file) and fold into the running per-cluster
    * integer-sum state ([[graft.ann.Ann.kmeansStateInit]] /
    * [[graft.ann.Ann.kmeansStateUpdate]] — one batch-sized assignment
    * job per trigger, never a corpus re-scan, k-row state). The state
    * lands per BATCH ID (`s<batchId>` computed from `s<batchId-1>`), so
    * a re-delivered batch recomputes from its predecessor instead of
    * double-folding itself — the committed-unit discipline the other
    * ingests use. Batches are modulo slices of the embeddings table so
    * the one-shot oracle replays the identical sequence.
    *
    * @return (cluster, n, i, c_milli) — the live centroids after the run
    */
  def kmeansIngest(
      parent: SparkSession, dir: String, workDir: String,
      k: Int = 8, nBatches: Int = 4,
      statePartitions: Int = 8): DataFrame = {
    require(nBatches >= 1, s"nBatches must be >= 1: $nBatches")
    val spark = streamingSession(parent, statePartitions)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    val staged =
      stageRangedSlices(spark, emb, workDir, nBatches, idCol = "vec_id",
        modulo = true) match {
        case None =>
          return spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("cluster",
                org.apache.spark.sql.types.IntegerType),
              org.apache.spark.sql.types.StructField("n",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("i",
                org.apache.spark.sql.types.IntegerType),
              org.apache.spark.sql.types.StructField("c_milli",
                org.apache.spark.sql.types.DoubleType))))
        case Some(s) => s
      }
    val stateRoot = new org.apache.hadoop.fs.Path(s"$workDir/state")
    val fs = stateRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // latest committed state STRICTLY BEFORE batchId — an empty batch
    // writes no state, so the predecessor may be further back than
    // batchId-1; a retry of batch b must likewise fold from b's prior
    // state even if a crashed attempt already wrote s<b>
    def priorState(batchId: Long): Option[Long] =
      if (!fs.exists(stateRoot)) None
      else fs.listStatus(stateRoot).map(_.getPath.getName)
        .filter(_.startsWith("s")).map(_.drop(1).toLong)
        .filter(_ < batchId).maxOption
    val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, batchId) =>
        if (batch.take(1).nonEmpty) {
          val st = priorState(batchId) match {
            case None =>
              // first non-empty batch seeds the state (batch 0 itself
              // may have been empty — init is not pinned to batchId 0)
              graft.ann.Ann.kmeansStateInit(
                batch, col("vec_id"), col("embedding"), k)
            case Some(t) =>
              graft.ann.Ann.kmeansStateUpdate(
                spark.read.parquet(s"$stateRoot/s$t"),
                batch, col("vec_id"), col("embedding"))
          }
          st.coalesce(1).write.mode("overwrite").parquet(s"$stateRoot/s$batchId")
        }
    val q = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch(timedBatch(ingest))
      .start()
    try q.processAllAvailable() finally q.stop()
    val last = fs.listStatus(stateRoot).map(_.getPath.getName)
      .filter(_.startsWith("s")).map(_.drop(1).toLong).max
    graft.ann.Ann.kmeansStateReport(
      spark.read.parquet(s"$stateRoot/s$last"))
  }

  /** STREAMING CDC → SCD-2 HISTORY: the event change log arrives as
    * ranged micro-batches (event_id order = time order here, the normal
    * in-order CDC shape) and each batch MERGES into the bucketed
    * history table via [[graft.ops.Scd2.mergeChanges]] — per-batch cost
    * ∝ touched buckets, the stored corpus is never re-folded. Batch 0
    * bootstraps with an idempotent overwrite build (a retried or
    * crashed bootstrap converges; a later batch retry converges because
    * re-merging the same points re-folds to the same history —
    * Scd2Spec's rerun test). In-order batches make the final table
    * equal the one-shot fold of the whole log, so the query shares the
    * from-scratch SCD-2 oracle. */
  def scd2Ingest(
      parent: SparkSession, dir: String, workDir: String,
      nBatches: Int = 4, numBuckets: Int = 16,
      statePartitions: Int = 8): DataFrame = {
    require(nBatches >= 1, s"nBatches must be >= 1: $nBatches")
    val spark = streamingSession(parent, statePartitions)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = graft.SparkEntry.normalizeEventTs(
        spark.read.parquet(s"$dir/events.parquet"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .localCheckpoint()
    val staged =
      stageRangedSlices(spark, ev, workDir, nBatches, idCol = "event_id")
    val histDir = s"$workDir/scd2_history"
    staged match {
      case None => ev.limit(0)
      case Some(s) =>
        val fs = new org.apache.hadoop.fs.Path(histDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
          (batch, batchId) =>
            if (batch.take(1).nonEmpty) {
              // bootstrap (or re-bootstrap after a crashed bootstrap):
              // overwrite is the idempotent first write; later batches
              // take the delta-proportional merge
              if (batchId == 0L ||
                  !fs.exists(new org.apache.hadoop.fs.Path(histDir))) {
                graft.ops.Scd2.writeHistory(spark, batch, "user_id", "ts",
                  Seq("event_type"), histDir, numBuckets,
                  tieBreaks = Seq("event_id"), mode = "overwrite")
              } else {
                graft.ops.Scd2.mergeChanges(spark, histDir, batch,
                  "user_id", "ts", Seq("event_type"), numBuckets,
                  tieBreaks = Seq("event_id"))
                ()
              }
            }
        val q = spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s)
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", s"$workDir/_checkpoint")
          .foreachBatch(timedBatch(ingest))
          .start()
        try q.processAllAvailable() finally q.stop()
        graft.ops.Scd2.readHistory(spark, histDir)
    }
  }

  /** Streaming TRIGRAM-INDEX ingest: ranged document slices arrive as
    * micro-batches and each batch appends its character-trigram posting
    * chunks as a COMMITTED SEGMENT of the substring index
    * ([[graft.text.Trigram.appendSegment]], segmentId = batchId) — only
    * the batch is trigrammed, re-delivered batches overwrite their own
    * segment (exactly-once). The grown index then serves the substring
    * query exactly like a one-shot build (the contains-verify makes
    * results exact regardless of segmentation), so the returned search
    * shares the brute-scan oracle. */
  def trigramIngest(
      parent: SparkSession, dir: String, workDir: String,
      pattern: String,
      nBatches: Int = 4,
      chunkSize: Int = 1 << 16,
      statePartitions: Int = 8): DataFrame = {
    require(nBatches >= 1, s"nBatches must be >= 1: $nBatches")
    val spark = streamingSession(parent, statePartitions)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    val staged = stageRangedSlices(spark, docs, workDir, nBatches) match {
      case None => return docs.select(col("doc_id")).limit(0)
      case Some(s) => s
    }
    val idxDir = s"$workDir/trgm_index"
    val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, batchId) =>
        graft.text.Trigram.appendSegment(
          batch, col("doc_id"), col("text"), idxDir, s"b$batchId", chunkSize)
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch(timedBatch(ingest))
      .start()
    try q.processAllAvailable() finally q.stop()
    graft.text.Trigram.searchSubstring(spark, idxDir, docs,
      col("doc_id"), col("text"), pattern, chunkSize)
  }

  /** Streaming SKETCH ingest: ranged document slices arrive as separate
    * micro-batches and each batch appends its own count-min cell grid
    * as a COMMITTED SEGMENT of the materialized sketch table
    * ([[graft.ops.Cms.appendCellsSegment]], segmentId = batchId) — only
    * the batch is tokenized, the stored corpus is never re-read, and a
    * re-delivered batch OVERWRITES its own segment (exactly-once under
    * foreachBatch's at-least-once retries). Because the sketch is
    * MERGEABLE, the read-time cell-wise sum over segments equals a
    * one-shot build over the whole corpus, so the returned point
    * estimates for `queryTerms` share the from-scratch oracle. */
  def cmsIngest(
      parent: SparkSession, dir: String, workDir: String,
      queryTerms: Seq[String],
      nBatches: Int = 4,
      depth: Int = 4,
      width: Int = 512,
      statePartitions: Int = 8): DataFrame = {
    require(nBatches >= 1, s"nBatches must be >= 1: $nBatches")
    val spark = streamingSession(parent, statePartitions)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    val sketchDir = s"$workDir/cms_sketch"
    val staged = stageRangedSlices(spark, docs, workDir, nBatches) match {
      case None =>
        import spark.implicits._
        return Seq.empty[(String, Long)].toDF("term", "est")
      case Some(s) => s
    }
    val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, batchId) =>
        graft.ops.Cms.appendCellsSegment(
          batch.select(explode(
            graft.text.TextFunctions.tokens(col("text"))).as("term")),
          col("term"), depth, width, sketchDir, s"b$batchId")
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch(timedBatch(ingest))
      .start()
    try q.processAllAvailable() finally q.stop()
    import spark.implicits._
    graft.ops.Cms.estimateCounts(
        graft.ops.Cms.readCells(spark, sketchDir, depth, width),
        queryTerms.toDF("term"), col("term"), depth, width)
      .withColumnRenamed("item", "term")
  }

  /** Streaming HLL ingest: ranged document slices arrive as separate
    * micro-batches and each batch appends its own register table as a
    * COMMITTED SEGMENT of the materialized HLL sketch
    * ([[graft.ops.Hll.appendRegistersSegment]], segmentId = batchId) —
    * only the batch is tokenized, the stored corpus is never re-read,
    * and a re-delivered batch OVERWRITES its own segment (exactly-once
    * under foreachBatch's at-least-once retries). Register-wise MAX is
    * idempotent as well as associative, so even a partially-visible
    * duplicate fold could never overcount — the strongest of the sketch
    * merge semantics. The returned register table equals a one-shot
    * [[graft.ops.Hll.hllRegisters]] over the whole corpus and shares its
    * from-scratch oracle. */
  def hllIngest(
      parent: SparkSession, dir: String, workDir: String,
      nBatches: Int = 4,
      p: Int = 10,
      statePartitions: Int = 8): DataFrame = {
    require(nBatches >= 1, s"nBatches must be >= 1: $nBatches")
    val spark = streamingSession(parent, statePartitions)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    val sketchDir = s"$workDir/hll_sketch"
    val staged = stageRangedSlices(spark, docs, workDir, nBatches) match {
      case None =>
        import spark.implicits._
        return Seq.empty[(Int, Int)].toDF("register", "rank")
      case Some(s) => s
    }
    val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, batchId) =>
        graft.ops.Hll.appendRegistersSegment(
          batch.select(explode(
            graft.text.TextFunctions.tokens(col("text"))).as("term")),
          col("term"), p, sketchDir, s"b$batchId")
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch(timedBatch(ingest))
      .start()
    try q.processAllAvailable() finally q.stop()
    graft.ops.Hll.readRegisters(spark, sketchDir, p)
  }

  /** Streaming DATA-CARD ingest — the live corpus dashboard: document
    * batches arrive as files and each appends its card partials (per-
    * source integer count sums + HLL registers over the doc text) as a
    * COMMITTED SEGMENT ([[graft.ops.Report.appendDataCardSegment]],
    * segmentId = batchId); the read-time merge (sums + register max +
    * estimator) equals a one-shot build over everything ingested, so
    * the served card shares a from-scratch oracle. Per batch the work
    * is one batch-sized signal pass — the stored corpus is never
    * re-read. */
  def dataCardIngest(
      parent: SparkSession, dir: String, workDir: String,
      nBatches: Int = 4,
      p: Int = 10,
      statePartitions: Int = 8): DataFrame = {
    require(nBatches >= 1, s"nBatches must be >= 1: $nBatches")
    val spark = streamingSession(parent, statePartitions)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .localCheckpoint()
    val cardDir = s"$workDir/datacard"
    val staged = stageRangedSlices(spark, docs, workDir, nBatches) match {
      case None =>
        // typed empty with the SAME schema the served card carries
        import spark.implicits._
        return Seq.empty[(String, Long, Long, Double, Long, Long, Long,
            Double, Long, Long, Double)]
          .toDF("source", "n_docs", "n_tokens", "avg_tokens", "n_chars",
            "n_en", "n_und", "avg_quality", "v_zero", "t_scaled", "est")
      case Some(s) => s
    }
    val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, batchId) =>
        graft.ops.Report.appendDataCardSegment(
          batch.toDF(), col("source"), col("text"), p, cardDir, s"b$batchId")
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch(timedBatch(ingest))
      .start()
    try q.processAllAvailable() finally q.stop()
    graft.ops.Report.readDataCard(spark, cardDir, p)
  }

  /** Streaming SEARCH-INDEX ingest: ranged document slices arrive as
    * separate micro-batches (file source, mtime-pinned order) and each
    * batch writes its posting-list chunks and doc lengths as a COMMITTED
    * SEGMENT of the materialized [[graft.text.SearchIndex]]
    * ([[graft.text.SearchIndex.appendSegment]], segmentId = batchId) —
    * only the batch is tokenized, the stored corpus is never re-read,
    * and because a re-delivered batch OVERWRITES its own segment, the
    * ingest is exactly-once under foreachBatch's at-least-once retries
    * (a batch that dies mid-write leaves an uncommitted, invisible
    * segment). After all batches the index serves queries identically to
    * a one-shot build over the whole corpus, so the returned
    * index-served conjunctive search shares the from-scratch oracle. */
  def searchIngest(
      parent: SparkSession, dir: String, workDir: String,
      terms: Seq[String],
      nBatches: Int = 4,
      chunkSize: Int = 1 << 16,
      statePartitions: Int = 8): DataFrame = {
    require(nBatches >= 1, s"nBatches must be >= 1: $nBatches")
    val spark = streamingSession(parent, statePartitions)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .localCheckpoint()
    val staged = stageRangedSlices(spark, docs, workDir, nBatches) match {
      case None => return docs.select(col("doc_id")).limit(0)
      case Some(s) => s
    }
    val idxDir = s"$workDir/search_index"
    val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, batchId) =>
        graft.text.SearchIndex.appendSegment(
          batch, col("doc_id"), col("text"), idxDir, s"b$batchId", chunkSize)
    val q = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch(timedBatch(ingest))
      .start()
    try q.processAllAvailable() finally q.stop()
    graft.text.SearchIndex.searchIndexAll(spark, idxDir, terms, chunkSize)
  }

  /** Streaming VECTOR-INDEX ingest — the embedding twin of
    * [[searchIngest]]: ranged vec_id slices arrive as micro-batches and
    * each batch APPENDS its IVFADC cells+codes to the materialized codes
    * table ([[graft.ann.Ann.appendToIvfPqIndex]] — only the batch is
    * encoded; deterministic codebooks make batch codes identical to
    * one-shot codes, so the grown index serves queries exactly like a
    * one-shot build). Returns the served top-k for `query` (excluding
    * `excludeId`), which therefore shares the one-shot IVFADC oracle. */
  def vectorIngest(
      parent: SparkSession, dir: String, workDir: String,
      query: Seq[Double],
      k: Int,
      excludeId: Option[Long] = None,
      nBatches: Int = 4,
      dim: Int = 64, cells: Int = 16, nprobe: Int = 4,
      m: Int = 8, codebookK: Int = 16,
      statePartitions: Int = 8): DataFrame = {
    require(nBatches >= 1, s"nBatches must be >= 1: $nBatches")
    val spark = streamingSession(parent, statePartitions)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    val staged = stageRangedSlices(spark, vecs, workDir, nBatches,
        idCol = "vec_id") match {
      case None => return vecs.select(col("vec_id")).limit(0)
      case Some(s) => s
    }
    val idxDir = s"$workDir/ivfpq_index"
    val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) =>
        graft.ann.Ann.appendToIvfPqIndex(
          batch, col("vec_id"), col("embedding"), idxDir,
          dim, cells, m, codebookK)
    val q = spark.readStream.schema(vecs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$workDir/_checkpoint")
      .foreachBatch(timedBatch(ingest))
      .start()
    try q.processAllAvailable() finally q.stop()
    graft.ann.Ann.queryIvfPqIndex(spark, idxDir, query, k, cells, nprobe,
      m, codebookK, excludeId = excludeId)
  }

  /** STREAMING CDC UPSERT INGEST — keyed update batches merging into the
    * hash-bucket-partitioned keyed table ([[graft.ops.Upsert]]) via
    * foreachBatch: the base table is built once (documents at
    * score = n_chars), then the update stream (doc_id % 3 == 0 at
    * score × 10) arrives as ranged micro-batches and each batch MERGES
    * with [[graft.ops.Upsert.upsertByKey]] — only the buckets holding
    * that batch's keys are read or rewritten, so per-batch cost is
    * delta-proportional no matter how large the table grows. Correct
    * under foreachBatch's at-least-once retries because re-merging the
    * same batch CONVERGES (anti-join + union idempotence — the
    * UpsertSpec rerun test); a crash mid-merge is a rerun, not a
    * double-apply. Returns the final table, which equals the one-shot
    * merge of all updates (batches partition the key space), so the
    * query shares an upsert-shaped oracle. */
  def upsertIngest(
      parent: SparkSession, dir: String, workDir: String,
      nBatches: Int = 4, numBuckets: Int = 16,
      statePartitions: Int = 8): DataFrame = {
    require(nBatches >= 1, s"nBatches must be >= 1: $nBatches")
    val spark = streamingSession(parent, statePartitions)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .localCheckpoint()
    val updates = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("source"), (col("n_chars") * 10).as("score"))
      .localCheckpoint()
    // stage FIRST: stageRangedSlices clears workDir
    val staged = stageRangedSlices(spark, updates, workDir, nBatches)
    val tableDir = s"$workDir/keyed"
    graft.ops.Upsert.writeKeyedTable(
      docs.select(col("doc_id"), col("source"), col("n_chars").as("score")),
      "doc_id", tableDir, numBuckets, mode = "overwrite")
    staged match {
      case None => graft.ops.Upsert.readKeyedTable(spark, tableDir)
      case Some(s) =>
        val ingest: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
          (batch, _) =>
            // an empty re-trigger merges nothing (and must not write an
            // empty dynamic-overwrite job against the table)
            if (batch.take(1).nonEmpty) {
              graft.ops.Upsert.upsertByKey(
                spark, tableDir, batch, "doc_id", numBuckets)
              ()
            }
        val q = spark.readStream.schema(updates.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s)
          .writeStream
          .outputMode("append")
          .option("checkpointLocation", s"$workDir/_checkpoint")
          .foreachBatch(timedBatch(ingest))
          .start()
        try q.processAllAvailable() finally q.stop()
        graft.ops.Upsert.readKeyedTable(spark, tableDir)
    }
  }

  /** Gap-based sessionization, batch formulation: a new session starts
    * after `gapMinutes` of inactivity per user. Declarative window
    * functions (lag → gap flag → running sum) so Catalyst plans one
    * shuffle on user_id; the same semantics stream via
    * flatMapGroupsWithState in [[graft.streaming.StatefulSessionize]]. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull, 1)
          // microsecond precision (unix_timestamp truncates to seconds and
          // could disagree with StatefulSessionize's millis near the gap)
          .when(unix_micros(col("ts")) - unix_micros(col("__prev_ts")) >
            gapMinutes * 60L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("__new_session")).over(byUser))
      .drop("__prev_ts", "__new_session")
  }

  /** Per-user session stats from [[sessionize]]. */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("session_value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        round(sum(col("session_value")), 4).as("total_value"))
}

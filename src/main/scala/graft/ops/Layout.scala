package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout helpers for pruning-friendly ingest.
  *
  * Footer min/max statistics (and the index built from them) are only as
  * selective as the physical layout lets them be: under a hash layout
  * every file spans the whole domain of every column, so a range
  * predicate prunes nothing — the index answers equality via sketches
  * but must scan all files for ranges. Range-clustering at write time
  * gives each file a narrow slice of the cluster-key domain, turning
  * footer min/max into a file-skipping index for range and equality
  * predicates alike. This is the ingest-side half of the index engine.
  */
object Layout {

  /** Range-cluster for pruning: range-repartition on the cluster keys
    * (one narrow key slice per output file) and sort within each
    * partition (narrow per-row-group slices inside the file, for
    * row-group-level skipping by any parquet reader). Write the result
    * with `.write.parquet(...)` and index it; range predicates on the
    * cluster keys then prune to the few files whose slice intersects.
    *
    * Scale notes: repartitionByRange samples the key distribution, so
    * skewed keys still yield balanced files (same mechanism at any data
    * size); `numFiles` should target file sizes of 128 MB–1 GB. Cluster
    * on the columns your range predicates actually use — first key
    * dominates, later keys only break ties inside a slice.
    */
  def clusterBy(df: DataFrame, numFiles: Int, cols: Column*): DataFrame = {
    require(cols.nonEmpty, "at least one cluster column required")
    require(numFiles > 0, "numFiles must be positive")
    df.repartitionByRange(numFiles, cols: _*).sortWithinPartitions(cols: _*)
  }

  /** Z-order (Morton-curve) clustering for MULTI-dimensional pruning.
    * [[clusterBy]] makes the first key selective and later keys
    * near-useless (they only order inside a slice); interleaving the
    * quantized bits of every key instead gives each file a small
    * hyper-rectangle of the joint domain, so a range predicate on ANY
    * single clustered column prunes to ~N^((d-1)/d) of the files.
    *
    * Mechanics: each column is quantized to `bitsPerCol` uniform buckets
    * between its observed min/max (one cheap agg job — no per-row
    * driver work), the bucket bits are interleaved into a single long
    * z-value with codegen'd shift/mask expressions, and the rows are
    * range-repartitioned + sorted by it. NULL z-values (null keys)
    * collect in the first range partition.
    *
    * Caveat: uniform buckets lose selectivity under heavy value skew —
    * pre-map skewed columns to a more uniform domain (e.g. a rank or log
    * transform) before z-ordering. Columns must be numerically castable.
    */
  def zorderBy(
      df: DataFrame, numFiles: Int, cols: Seq[String],
      bitsPerCol: Int = 12): DataFrame = {
    require(cols.size >= 2, "z-order needs at least two columns (use clusterBy for one)")
    require(numFiles > 0, "numFiles must be positive")
    require(bitsPerCol >= 1 && cols.size * bitsPerCol <= 63,
      s"cols*bitsPerCol must fit a long: ${cols.size}*$bitsPerCol")
    val nBuckets = 1 << bitsPerCol
    val mmExprs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val mm = df.agg(mmExprs.head, mmExprs.tail: _*).head
    val buckets = cols.zipWithIndex.map { case (c, i) =>
      // constant or all-null column: no information, all rows in bucket 0
      if (mm.isNullAt(2 * i) || mm.getDouble(2 * i) == mm.getDouble(2 * i + 1)) lit(0L)
      else (least(width_bucket(col(c).cast("double"),
        lit(mm.getDouble(2 * i)), lit(mm.getDouble(2 * i + 1)), lit(nBuckets)),
        lit(nBuckets)) - 1).cast("long")
    }
    val z = (0 until bitsPerCol).flatMap { b =>
      buckets.zipWithIndex.map { case (bk, ci) =>
        // bit b of column ci lands at interleaved position b*nCols + ci
        shiftleft(shiftright(bk, b).bitwiseAND(1L), b * cols.size + ci)
      }
    }.reduce((a, b) => a.bitwiseOR(b))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Write `df` as a BUCKETED parquet table (hash-bucketed and sorted on
    * `key`, explicit storage path, registered under `tableName`).
    *
    * Bucketing is the pre-shuffle join layout: two tables bucketed on
    * their join key with the same bucket count join with NO Exchange at
    * all — the shuffle was paid once at ingest and is amortized over
    * every subsequent join/aggregation on that key. At 100 TB this turns
    * the recurring dominant cost of fact-to-fact joins into a one-time
    * write cost; `sortBy` additionally lets sort-merge join skip its
    * sort. Requires reading through the catalog (`spark.table`) — path
    * reads don't see bucket metadata.
    */
  def writeBucketed(
      df: DataFrame, tableName: String, path: String,
      buckets: Int, key: String, sortCols: Seq[String] = Nil): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val sorted = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
    spark.table(tableName)
  }

  /** Outcome of [[compact]]: input files rewritten, files produced,
    * bytes rewritten. (0,0,0) = nothing worth compacting. */
  case class CompactionStats(
      compactedFiles: Long, producedFiles: Long, bytesRewritten: Long)

  /** Small-file compaction for a parquet table dir (flat or
    * Hive-partitioned — partition leaf dirs are compacted independently,
    * so every rewritten file stays inside its partition): files under
    * `smallFileBytes` are rewritten into ~`targetFileBytes`
    * outputs; files already big enough are NOT touched. The small-files
    * problem is the dominant operational tax at 100 TB — per-file open
    * cost, footer reads, scheduler pressure and index-entry count all
    * scale with file COUNT, not bytes — and the fix must not degenerate
    * into "rewrite the table": only the small tail is read and written,
    * so compaction cost is proportional to the garbage, not the data.
    *
    * Mechanics: list data files, select the small tail, read just those
    * files, `coalesce` (narrow — no shuffle) to ceil(bytes/target)
    * outputs, staged under a per-run id with a crash-recovery protocol
    * (plain parquet dirs have no manifest to swap atomically, so the
    * protocol makes every crash window recoverable instead):
    *
    *   1. write outputs to `_compact_tmp_<runId>/`
    *   2. rename them in as `part-compact-<runId>-*.parquet`
    *   3. write `_compact_manifest_<runId>` listing the originals
    *   4. delete the originals, then the tmp dir, then the manifest
    *
    * Recovery (runs automatically at the start of every compact): a
    * manifest present means every rename-in completed → roll FORWARD
    * (finish deleting the listed originals); a tmp dir without a
    * manifest means the run died mid-flight → roll BACK (drop that
    * run's moved-in files; the originals are all still present). Either
    * way the table converges to exactly one copy of every row.
    * Skips compaction when fewer than `minFiles` small files exist (one
    * small file gains nothing from a rewrite).
    *
    * Single-writer enforcement: the run holds the table's
    * [[MaintenanceLock]] (exclusive `_graft_maintenance.lock` + mtime
    * lease) — a concurrent compact/vacuum of the same table fails fast
    * with ConcurrentMaintenanceException instead of corrupting; a
    * crashed holder's lock heals itself after the lease.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession, tableDir: String,
      smallFileBytes: Long = 32L << 20, targetFileBytes: Long = 128L << 20,
      minFiles: Int = 2,
      lockLeaseMs: Long = MaintenanceLock.DefaultLeaseMs,
      source: String = "parquet"): CompactionStats = {
    require(smallFileBytes > 0 && targetFileBytes >= smallFileBytes,
      s"need 0 < smallFileBytes <= targetFileBytes: $smallFileBytes, $targetFileBytes")
    val src = graft.index.Sources.normalize(source)
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    MaintenanceLock.withLock(fs, dir, lockLeaseMs) {
      val stats =
        compactDir(spark, fs, dir, smallFileBytes, targetFileBytes, minFiles, src)
      IndexFreshness.afterMaintenance(spark, tableDir)
      stats
    }
  }

  /** Recursive body of [[compact]] — the lock is held once at the table
    * root, partition leaves recurse lock-free. Hive-partitioned table:
    * partition leaf dirs are compacted independently (a compacted file
    * must stay inside its partition), sequentially — each is one small
    * Spark job; the intra-job parallelism is what matters, and
    * sequential leaves keep peak task pressure bounded. */
  private def compactDir(
      spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      smallFileBytes: Long, targetFileBytes: Long, minFiles: Int,
      source: String): CompactionStats = {
    val subDirs = fs.listStatus(dir).toSeq.filter(st =>
      st.isDirectory && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
    if (subDirs.nonEmpty) {
      val stats = subDirs.map(d =>
        compactDir(spark, fs, d.getPath, smallFileBytes, targetFileBytes, minFiles, source)) :+
        compactLeaf(spark, fs, dir, smallFileBytes, targetFileBytes, minFiles, source)
      return CompactionStats(
        stats.map(_.compactedFiles).sum,
        stats.map(_.producedFiles).sum,
        stats.map(_.bytesRewritten).sum)
    }
    compactLeaf(spark, fs, dir, smallFileBytes, targetFileBytes, minFiles, source)
  }

  private val TmpPrefix = "_compact_tmp_"
  private val ManifestPrefix = "_compact_manifest_"

  /** Finish or undo interrupted compaction runs in `dir` (leaf level).
    * Manifest present → all rename-ins completed → roll forward by
    * deleting the listed originals; tmp dir without manifest → roll back
    * by deleting that run's moved-in `part-compact-<runId>-*` files (the
    * originals are untouched until the manifest exists). Returns the
    * number of interrupted runs healed. */
  private[graft] def recoverLeaf(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Int = {
    val entries = fs.listStatus(dir).toSeq
    var healed = 0
    entries.filter(_.getPath.getName.startsWith(ManifestPrefix)).foreach { m =>
      val runId = m.getPath.getName.stripPrefix(ManifestPrefix)
      val in = new java.io.BufferedReader(
        new java.io.InputStreamReader(fs.open(m.getPath), "UTF-8"))
      try {
        Iterator.continually(in.readLine()).takeWhile(_ != null)
          .filter(_.nonEmpty)
          .foreach { name =>
            val p = new org.apache.hadoop.fs.Path(dir, name)
            if (fs.exists(p)) fs.delete(p, false)
          }
      } finally in.close()
      val tmp = new org.apache.hadoop.fs.Path(dir, TmpPrefix + runId)
      if (fs.exists(tmp)) fs.delete(tmp, true)
      fs.delete(m.getPath, false)
      healed += 1
    }
    entries.filter { st =>
      st.isDirectory && st.getPath.getName.startsWith(TmpPrefix) &&
        !fs.exists(new org.apache.hadoop.fs.Path(dir,
          ManifestPrefix + st.getPath.getName.stripPrefix(TmpPrefix)))
    }.foreach { tmp =>
      val runId = tmp.getPath.getName.stripPrefix(TmpPrefix)
      fs.listStatus(dir).toSeq
        .filter(_.getPath.getName.startsWith(s"part-compact-$runId-"))
        .foreach(st => fs.delete(st.getPath, false))
      fs.delete(tmp.getPath, true)
      healed += 1
    }
    healed
  }

  private def compactLeaf(
      spark: org.apache.spark.sql.SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      smallFileBytes: Long, targetFileBytes: Long, minFiles: Int,
      source: String): CompactionStats = {
    recoverLeaf(fs, dir)
    val ext = "." + source
    val dataFiles = fs.listStatus(dir).toSeq.filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(ext) && !n.startsWith("_") && !n.startsWith(".")
    }
    val smalls = dataFiles.filter(_.getLen < smallFileBytes)
    if (smalls.size < minFiles) return CompactionStats(0L, 0L, 0L)
    val bytes = smalls.map(_.getLen).sum
    val nOut = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(dir, TmpPrefix + runId)
    // mergeSchema: the small tail may span schema-evolved appends; a
    // single-file schema donor would silently DROP late columns and the
    // originals are deleted in step 4 — merge unions them instead
    spark.read.option("mergeSchema", "true").format(source)
      .load(smalls.map(_.getPath.toString): _*)
      .coalesce(nOut)
      .write.mode("overwrite").format(source).save(tmp.toString)
    val produced = fs.listStatus(tmp).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(ext))
    // 2. rename in under run-id names (crash here → rollback, no manifest)
    produced.zipWithIndex.foreach { case (st, i) =>
      val target = new org.apache.hadoop.fs.Path(dir,
        s"part-compact-$runId-$i$ext")
      if (!fs.rename(st.getPath, target)) {
        throw new java.io.IOException(s"rename ${st.getPath} -> $target failed")
      }
    }
    // 3. manifest = commit point. Written INSIDE the staging dir first,
    // then renamed into place: the rename is the atomic commit — a crash
    // mid-write can never expose a partial manifest to recovery.
    val manifest = new org.apache.hadoop.fs.Path(dir, ManifestPrefix + runId)
    val manifestTmp = new org.apache.hadoop.fs.Path(tmp, "manifest")
    val out = fs.create(manifestTmp, true)
    try out.write(smalls.map(_.getPath.getName).mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(manifestTmp, manifest)) {
      throw new java.io.IOException(s"manifest commit $manifestTmp -> $manifest failed")
    }
    // 4. delete originals, tmp dir, then the manifest itself
    smalls.foreach(st => fs.delete(st.getPath, false))
    fs.delete(tmp, true)
    fs.delete(manifest, false)
    CompactionStats(smalls.size.toLong, produced.size.toLong, bytes)
  }

  /** Heal interrupted [[compact]] runs (roll forward / roll back, see
    * `recoverLeaf`) across a flat or arbitrarily-nested partitioned
    * table dir, and recover crashed foreachBatch-upsert staging SIBLINGS
    * of `tableDir` (`<dir>_tmp_<batchId>` / `<dir>_old_<batchId>` — the
    * upsert stages next to its sink, so only exact sink-path-prefixed
    * names are touched). If the sink dir itself is MISSING (a crash
    * landed between the upsert's two renames), the newest complete
    * staging copy is PROMOTED to the sink rather than deleted — staging
    * may be the only copy of the data at that point. Returns the number
    * of items healed/removed.
    *
    * Single-writer enforcement (same lock as [[compact]]): when the sink
    * dir exists, the run holds its [[MaintenanceLock]], so vacuuming
    * under a LIVE compaction fails fast instead of rolling back a run
    * that isn't dead. When the sink dir is missing (mid-swap crash —
    * there is nowhere to lock), recovery proceeds unlocked, as before. */
  def vacuum(
      spark: org.apache.spark.sql.SparkSession, tableDir: String,
      lockLeaseMs: Long = MaintenanceLock.DefaultLeaseMs): Int = {
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) {
      MaintenanceLock.withLock(fs, dir, lockLeaseMs) {
        val n = vacuumBody(fs, dir)
        // rolling a crashed compaction forward/back changes the live
        // file set — same freshness exposure as compact itself
        if (n > 0) IndexFreshness.afterMaintenance(spark, tableDir)
        n
      }
    } else vacuumBody(fs, dir)
  }

  private def vacuumBody(
      fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Int = {
    var n = 0
    if (fs.exists(dir)) {
      // recover every directory level — compact() recurses arbitrarily deep
      val queue = scala.collection.mutable.Queue(dir)
      while (queue.nonEmpty) {
        val d = queue.dequeue()
        n += recoverLeaf(fs, d)
        fs.listStatus(d).toSeq
          .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .foreach(st => queue.enqueue(st.getPath))
      }
    }
    val parent = dir.getParent
    if (parent != null && fs.exists(parent)) {
      val pattern = java.util.regex.Pattern.quote(dir.getName) + "_(tmp|old)_(\\d+)"
      val staging = fs.listStatus(parent).toSeq.filter(st =>
        st.isDirectory && st.getPath.getName.matches(pattern))
      if (!fs.exists(dir) && staging.nonEmpty) {
        // mid-swap crash: promote the newest complete copy (a _tmp_ holds
        // the NEW sink, written fully before any rename; _old_ the
        // previous one) instead of deleting the only surviving data
        val promote = staging
          .sortBy { st =>
            val m = st.getPath.getName
            (if (m.contains("_tmp_")) 1 else 0, m.substring(m.lastIndexOf('_') + 1).toLong)
          }
          .last
        if (!fs.rename(promote.getPath, dir)) {
          throw new java.io.IOException(s"promote ${promote.getPath} -> $dir failed")
        }
        n += 1
      }
      val stale = fs.listStatus(parent).toSeq.filter(st =>
        st.isDirectory && st.getPath.getName.matches(pattern))
      stale.foreach(st => fs.delete(st.getPath, true))
      n += stale.size
    }
    n
  }

  /** Re-register an existing bucketed-table path in a (fresh) catalog
    * WITHOUT rewriting the data — e.g. after a session restart with an
    * in-memory catalog. The bucket spec must match what the files were
    * written with ([[writeBucketed]]); Spark trusts the declaration, so a
    * wrong `buckets`/`key` here silently breaks join correctness. Schema
    * is lifted from the parquet footers. */
  def registerBucketed(
      spark: org.apache.spark.sql.SparkSession, tableName: String, path: String,
      buckets: Int, key: String, sortCols: Seq[String] = Nil): DataFrame = {
    if (!spark.catalog.tableExists(tableName)) {
      val ddl = spark.read.parquet(path).schema.toDDL
      val sorted = if (sortCols.isEmpty) Seq(key) else sortCols
      spark.sql(
        s"""CREATE TABLE `$tableName` ($ddl) USING parquet
           |CLUSTERED BY (`$key`)
           |SORTED BY (${sorted.map(c => s"`$c`").mkString(", ")})
           |INTO $buckets BUCKETS
           |LOCATION '$path'""".stripMargin)
    }
    spark.table(tableName)
  }
}

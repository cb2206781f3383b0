package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed-table MERGE (upsert) with partition-level rewrite — the
  * incremental-update story for a mutable corpus table: crawl re-fetches,
  * quality-score refreshes, GDPR deletions-by-replacement all arrive as a
  * small keyed delta against a 100 TB base, and the merge cost must be
  * proportional to the DELTA, not the table.
  *
  * Layout: the base table is Hive-partitioned by `graft_bucket =
  * pmod(xxhash64(key), numBuckets)`. An upsert then:
  *
  *   1. buckets the updates and collects the ≤ numBuckets TOUCHED bucket
  *      ids (the only data-proportional driver traffic is one int per
  *      touched bucket);
  *   2. reads ONLY the touched partitions of the base — Spark partition
  *      pruning, no file of an untouched bucket is opened;
  *   3. anti-joins out the base rows whose key is updated, unions the
  *      updates in;
  *   4. rewrites JUST the touched partitions via dynamic partition
  *      overwrite (untouched bucket dirs are never listed, read, or
  *      written).
  *
  * Cost at 100 TB: with numBuckets sized so a bucket ≈ a few GB, a
  * k-key delta touches ≤ k buckets → the rewrite is O(k · bucketBytes)
  * regardless of table size. Size numBuckets at table-creation time for
  * the target table bytes (buckets of 1–4 GB); the count is pinned in
  * the table's `_index_spec` so a mis-parameterized upsert FAILS instead
  * of silently landing keys in the wrong buckets (the serving-index
  * guard, applied to mutable tables).
  *
  * Crash story: the merged partitions are materialized (localCheckpoint)
  * before the overwrite — the write never reads the dir it replaces —
  * and the overwrite commits per-partition. A crash mid-commit can leave
  * a mix of old and new buckets; RERUNNING the same upsert converges
  * (anti-join + union is idempotent: already-updated buckets merge to
  * themselves). Concurrent upserts of one table are excluded by the
  * table's [[MaintenanceLock]].
  */
object Upsert {

  /** Outcome of [[upsertByKey]]: partitions rewritten vs total, update
    * rows applied, untouched-key rows carried through the rewrite. */
  case class UpsertStats(
      touchedBuckets: Int, totalBuckets: Int, upserted: Long, carried: Long)

  private def spec(key: String, numBuckets: Int): String =
    s"keyed-table:v1 key=$key buckets=$numBuckets"

  /** Bucket id of a key under this table layout. */
  def bucketOf(key: Column, numBuckets: Int): Column =
    pmod(xxhash64(key), lit(numBuckets)).cast("int")

  /** Broadcast a delta-derived key frame when the merge's own probe job
    * measured it at or below `spark.graft.merge.broadcastDeltaMaxRows`
    * rows (default 4M ≈ tens of MB of hashed longs/strings): the base-
    * table legs of the merge then join MAP-SIDE and the touched buckets
    * are scanned once, never shuffled — at 100 TB the buckets dwarf the
    * delta, so the shuffle this removes is the merge's dominant exchange.
    * Above the threshold (an unusually large delta) the plan falls back
    * to the shuffle joins unchanged. Decision input is a RUNTIME count
    * from the probe, not an optimizer estimate (checkpointed deltas carry
    * no stats, which is why Catalyst planned sort-merge here). */
  private[graft] def broadcastIfBounded(df: DataFrame, nRows: Long): DataFrame = {
    val cap = df.sparkSession.conf
      .getOption("spark.graft.merge.broadcastDeltaMaxRows")
      .map(_.toLong).getOrElse(4000000L)
    if (cap > 0 && nRows >= 0 && nRows <= cap) broadcast(df) else df
  }

  /** Create the keyed base table: Hive-partitioned by `graft_bucket` so
    * later upserts prune to touched partitions. `numBuckets` is pinned
    * in `_index_spec` (see class doc); pick it for ~1–4 GB per bucket at
    * the table's target size. */
  def writeKeyedTable(
      df: DataFrame, key: String, dir: String, numBuckets: Int,
      mode: String = "error"): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1: $numBuckets")
    require(df.columns.contains(key), s"key column '$key' not in ${df.columns.toSeq}")
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val existed = fs.exists(dirPath)
    // spec write-ordering discipline: no spec may cover partial data —
    // but only an overwrite may invalidate an EXISTING table's spec; a
    // mode="error" write that throws on an existing dir must leave the
    // old table's layout guard intact
    if (mode == "overwrite") IndexSpec.delete(df, dir)
    // an append onto an existing table must MATCH the pinned layout —
    // fail fast before any data write; silently re-pinning a different
    // numBuckets would mix two bucket layouts, after which upsertByKey
    // misses the old rows of a key (duplicate keys). A keyed table has
    // carried a spec since creation, so existing data WITHOUT one is a
    // crashed create (the spec-after-data write ordering's failure
    // window) — appending onto unpinned data is equally unsafe
    val appendSpecPresent = mode == "append" && existed &&
      IndexSpec.checkReturningPresence(df, dir, spec(key, numBuckets))
    require(!(mode == "append" && existed) || appendSpecPresent,
      s"keyed table at $dir exists but carries no _index_spec — a crashed " +
        "create left unpinned data; rebuild with mode=\"overwrite\"")
    // repartition by bucket: one file per bucket instead of one per
    // (input partition × bucket) — the REBALANCE-before-write layout
    // (guide §6) that keeps bucket reads one-file cheap as the table grows
    df.withColumn("graft_bucket", bucketOf(col(key), numBuckets))
      .repartition(col("graft_bucket"))
      .write.mode(mode).partitionBy("graft_bucket").parquet(dir)
    // mode="ignore" over an existing table is a no-op write — the old
    // spec (whatever layout it pins) stays authoritative; a validated
    // append keeps the existing pin (re-writing it is harmless but the
    // heal-if-missing ordering below stays uniform with upsertByKey)
    if (!(mode == "ignore" && existed) && !appendSpecPresent)
      IndexSpec.write(df, dir, spec(key, numBuckets))
  }

  /** Read the keyed table back as a plain DataFrame (layout column
    * dropped). */
  def readKeyedTable(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("graft_bucket")

  /** RE-BUCKET the keyed table to `newBuckets` — the migration path for
    * a table that outgrew (or over-provisioned) its pinned layout, which
    * the `_index_spec` guard otherwise correctly refuses to mutate under
    * a different count. One full-table rewrite under the table's
    * [[MaintenanceLock]]; the old layout is validated first, the new
    * layout is written to a sibling scratch dir (the op's scale cost —
    * deliberate, paid once; day-to-day mutation stays
    * delta-proportional) while the source table stays intact, then
    * spec-delete -> swap (rename) -> re-pin, so a crash anywhere leaves
    * either the untouched old table or complete new data in the guarded
    * no-spec state every other path refuses to build on — never a
    * half-written table. Writing fresh dirs also drops stale bucket
    * dirs when shrinking. */
  def rebucketKeyedTable(
      spark: SparkSession, dir: String, key: String,
      oldBuckets: Int, newBuckets: Int,
      lockLeaseMs: Long = MaintenanceLock.DefaultLeaseMs): Unit =
    rebucketBucketed(spark, dir, key, newBuckets,
      oldSpec = spec(key, oldBuckets), newSpec = spec(key, newBuckets),
      what = "keyed table", rebuild = "writeKeyedTable", lockLeaseMs)

  /** The shared layout-migration rewrite behind [[rebucketKeyedTable]]
    * and [[Scd2.rebucketHistory]] — see rebucketKeyedTable's scaladoc
    * for the crash-ordering contract. */
  private[ops] def rebucketBucketed(
      spark: SparkSession, dir: String, key: String, newBuckets: Int,
      oldSpec: String, newSpec: String, what: String, rebuild: String,
      lockLeaseMs: Long): Unit = {
    require(newBuckets >= 1, s"newBuckets must be >= 1: $newBuckets")
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(dirPath),
      s"$what missing at $dir — $rebuild first (if a rebucket crashed " +
        s"mid-swap, a complete copy survives at ${dir}_rebucket_old and/or " +
        s"${dir}_rebucket_tmp: rename one back to $dir and re-pin its spec)")
    require(IndexSpec.checkReturningPresence(spark, dir, oldSpec),
      s"$what at $dir carries no _index_spec — a crashed create left " +
        s"unpinned data; rebuild with $rebuild(mode = \"overwrite\")")
    MaintenanceLock.withLock(fs, dirPath, lockLeaseMs) {
      // build the new layout in a SIBLING dir first: the source table
      // stays intact (and readable under its old spec) until the new
      // data is fully durable, so an executor/block loss mid-rewrite
      // loses only scratch — never the table. Only then delete-spec →
      // swap → re-pin; a crash inside that tail window leaves either
      // the intact old table (pre-swap) or complete new data missing
      // only its spec — exactly the guarded no-spec state every other
      // path refuses to build on.
      val tmpPath = new org.apache.hadoop.fs.Path(dir + "_rebucket_tmp")
      val oldPath = new org.apache.hadoop.fs.Path(dir + "_rebucket_old")
      if (fs.exists(tmpPath)) fs.delete(tmpPath, true) // stale scratch from a prior crash
      if (fs.exists(oldPath)) fs.delete(oldPath, true) // retired copy from a prior run
      spark.read.parquet(dir).drop("graft_bucket")
        .withColumn("graft_bucket", bucketOf(col(key), newBuckets))
        .repartition(col("graft_bucket")) // one file per bucket (guide §6)
        .write.mode("overwrite").partitionBy("graft_bucket")
        .parquet(tmpPath.toString)
      IndexSpec.delete(spark, dir)
      // retire the old dir by RENAME (cheap even where rename copies —
      // it's the only copy of the table until the new data is in
      // place): a crash between here and the swap leaves BOTH complete
      // copies on disk, never a window where the sole copy lives in a
      // scratch dir an operator might discard
      require(fs.rename(dirPath, oldPath),
        s"rename $dirPath -> $oldPath failed; table unchanged (old spec " +
          "deleted — re-run rebucket, or re-pin the old spec to keep the layout)")
      if (!fs.rename(tmpPath, dirPath)) {
        // roll the old copy back into place before failing — and tell
        // the operator the TRUTH about where the data is if even that
        // fails (a message claiming "restored" after a failed rollback
        // could lead them to re-run rebucket, whose preamble deletes
        // the scratch dirs that hold the only surviving copies)
        val rolledBack = fs.rename(oldPath, dirPath)
        throw new IllegalStateException(
          if (rolledBack) {
            s"rename $tmpPath -> $dirPath failed; original table restored at " +
              s"$dir (unpinned — re-pin the spec or re-run rebucket); " +
              s"rebucketed data is intact at $tmpPath"
          } else {
            s"rename $tmpPath -> $dirPath failed AND the rollback rename " +
              s"$oldPath -> $dirPath failed: $dir is ABSENT. Both complete " +
              s"copies survive — old layout at $oldPath, new layout at " +
              s"$tmpPath. Manually rename ONE back to $dir and re-pin its " +
              s"spec; do NOT re-run rebucket first (its preamble deletes " +
              s"those scratch dirs)"
          })
      }
      // the swap carried OUR lock file away inside the retired dir —
      // re-plant it in the new dir at once, so the single-writer guard
      // covers the re-pin + freshness refresh below and the outer
      // release deletes a lock we actually own (not one a racer slipped
      // in during the rename gap — that residual window is part of the
      // lock's documented best-effort contract)
      val lo = fs.create(
        new org.apache.hadoop.fs.Path(dirPath, MaintenanceLock.LockName), true)
      lo.close()
      IndexSpec.write(spark, dir, newSpec)
      fs.delete(oldPath, true) // swap complete — retire the old copy
      IndexFreshness.afterMaintenance(spark, dir)
    }
  }

  /** MERGE `updates` into the keyed table at `dir`: rows whose key
    * matches an update are replaced, new keys are inserted, everything
    * else is untouched — only the buckets containing updated keys are
    * read or rewritten. `updates` must be key-unique (two updates for
    * one key have no defined winner — fail fast rather than keep both);
    * its schema must match the table's data columns. */
  def upsertByKey(
      spark: SparkSession, dir: String, updates: DataFrame, key: String,
      numBuckets: Int,
      lockLeaseMs: Long = MaintenanceLock.DefaultLeaseMs): UpsertStats = {
    require(updates.columns.contains(key),
      s"key column '$key' not in updates: ${updates.columns.toSeq}")
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(dirPath), s"keyed table missing at $dir — writeKeyedTable first")
    // a keyed table has carried a spec since creation: existing data
    // without one is a crashed create — merging under an assumed layout
    // would land keys in wrong buckets (same refusal as append)
    val specPresent =
      IndexSpec.checkReturningPresence(spark, dir, spec(key, numBuckets))
    require(specPresent,
      s"keyed table at $dir carries no _index_spec — a crashed create left " +
        "unpinned data; rebuild with writeKeyedTable(mode = \"overwrite\")")
    MaintenanceLock.withLock(fs, dirPath, lockLeaseMs) {
      // checkpoint FIRST so the delta is computed once — the probe and
      // the merge read the materialized blocks instead of re-running the
      // caller's plan per consumer
      val bucketed = updates
        .withColumn("graft_bucket", bucketOf(col(key), numBuckets))
        .localCheckpoint(false)
      // ONE probe job for what used to be three (dup-guard count,
      // touched-bucket collect, delta count): per-key counts fold into
      // (bucket set, total rows, max per-key multiplicity) — the driver
      // sees ≤ numBuckets ints + two longs, never data rows
      val probe = bucketed.groupBy(col(key))
        .agg(first(col("graft_bucket")).as("__b"), count(lit(1)).as("__c"))
        .agg(sort_array(collect_set(col("__b"))).as("buckets"),
          sum(col("__c")).as("n"), max(col("__c")).as("maxc"))
        .head()
      require(probe.isNullAt(2) || probe.getLong(2) <= 1L,
        s"updates contain duplicate '$key' values — " +
          "an upsert needs exactly one row per key")
      val touched = probe.getSeq[Int](0)
      val upserted = if (probe.isNullAt(1)) 0L else probe.getLong(1)
      if (touched.isEmpty) UpsertStats(0, numBuckets, 0L, 0L)
      else {
        // partition pruning: only touched bucket dirs are listed/read;
        // the delta's keys broadcast (probe-measured bound) so the
        // touched buckets are scanned map-side, not shuffled
        val base = spark.read.parquet(dir)
          .filter(col("graft_bucket").isin(touched.map(Int.box): _*))
        val carried = base.join(
          broadcastIfBounded(bucketed.select(col(key)), upserted),
          Seq(key), "left_anti")
        // eager checkpoint severs the plan's lineage to `dir` so the
        // dynamic overwrite below is not a read-write conflict, and the
        // merged delta is safe before any base partition is replaced.
        // repartition by bucket first: each rewritten bucket lands as ONE
        // file (a REBALANCE before the write — guide §6), instead of one
        // file per (upstream partition × bucket)
        val merged = carried.unionByName(bucketed.select(carried.columns.map(col): _*))
          .repartition(col("graft_bucket"))
          .localCheckpoint(true)
        // carried count observed ON the write job (guide §1.2: the
        // trailing count() was a whole extra driver action per upsert)
        val obs = org.apache.spark.sql.Observation()
        merged.observe(obs, count(lit(1)).as("n"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("graft_bucket").parquet(dir)
        IndexFreshness.afterMaintenance(spark, dir)
        UpsertStats(touched.length, numBuckets, upserted,
          obs.get("n").asInstanceOf[Long] - upserted)
      }
    }
  }

  /** Outcome of [[deleteByKey]]: partitions touched vs total, rows
    * deleted, untouched-key rows carried through the rewrite. */
  case class DeleteStats(
      touchedBuckets: Int, totalBuckets: Int, deleted: Long, carried: Long)

  /** DELETE the rows of `keys` (one column, the key values) from the
    * keyed table — the deletion-request path (GDPR/takedown) with the
    * same delta-proportional cost as [[upsertByKey]]: only the buckets
    * holding requested keys are read or rewritten.
    *
    * Dynamic partition overwrite only replaces partitions PRESENT in the
    * written data, so a bucket whose every row is deleted would silently
    * keep its old files — those buckets are removed explicitly after the
    * write commits (a crash between the two converges on rerun, like the
    * upsert). Keys absent from the table are a no-op, not an error. */
  def deleteByKey(
      spark: SparkSession, dir: String, keys: DataFrame, key: String,
      numBuckets: Int,
      lockLeaseMs: Long = MaintenanceLock.DefaultLeaseMs): DeleteStats = {
    require(keys.columns.length == 1,
      s"keys must be a single-column DataFrame of key values: ${keys.columns.toSeq}")
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(dirPath), s"keyed table missing at $dir — writeKeyedTable first")
    require(IndexSpec.checkReturningPresence(spark, dir, spec(key, numBuckets)),
      s"keyed table at $dir carries no _index_spec — a crashed create left " +
        "unpinned data; rebuild with writeKeyedTable(mode = \"overwrite\")")
    MaintenanceLock.withLock(fs, dirPath, lockLeaseMs) {
      val keyed = keys.toDF(key).distinct()
        .withColumn("graft_bucket", bucketOf(col(key), numBuckets))
        .localCheckpoint(false)
      // per-bucket counts: the touched set AND the requested-key total in
      // one probe job (≤ numBuckets driver rows) — the total feeds the
      // broadcast bound below
      val perBucketKeys = keyed.groupBy(col("graft_bucket")).count().collect()
      val touched = perBucketKeys.map(_.getInt(0)).sorted
      val nKeys = perBucketKeys.map(_.getLong(1)).sum
      if (touched.isEmpty) DeleteStats(0, numBuckets, 0L, 0L)
      else {
        // touched-bucket row count observed on the survivors checkpoint
        // job (every base row streams through the anti-join's probe
        // side), replacing a dedicated count() — one fewer action AND
        // one fewer full scan of the touched buckets per delete
        val obsBase = org.apache.spark.sql.Observation()
        val base = spark.read.parquet(dir)
          .filter(col("graft_bucket").isin(touched.map(Int.box): _*))
          .observe(obsBase, count(lit(1)).as("n"))
        // repartition by bucket: one file per surviving bucket (see
        // upsertByKey) — and ONE probe job for what used to be two
        // (carried count + surviving-bucket distinct): per-bucket counts
        // are ≤ numBuckets driver rows. Requested keys broadcast
        // (probe-measured bound): touched buckets scan map-side
        val survivors = base.join(
            broadcastIfBounded(keyed.select(col(key)), nKeys),
            Seq(key), "left_anti")
          .repartition(col("graft_bucket"))
          .localCheckpoint(true)
        val perBucket = survivors.groupBy(col("graft_bucket")).count().collect()
        val carried = perBucket.map(_.getLong(1)).sum
        if (carried > 0) {
          survivors.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("graft_bucket").parquet(dir)
        }
        // buckets with zero survivors: dynamic overwrite never wrote them
        // — drop their dirs so the deleted rows actually disappear
        val surviving = perBucket.map(_.getInt(0)).toSet
        touched.filterNot(surviving).foreach { b =>
          val p = new org.apache.hadoop.fs.Path(dir, s"graft_bucket=$b")
          if (fs.exists(p)) fs.delete(p, true)
        }
        // a delete that empties the WHOLE table must leave a readable
        // (zero-row) table, not a dir with no parquet footers — plant one
        // empty file carrying the data schema under an empty bucket dir
        val anyBucketLeft = fs.listStatus(dirPath).exists(st =>
          st.isDirectory && st.getPath.getName.startsWith("graft_bucket="))
        if (!anyBucketLeft) {
          survivors.drop("graft_bucket").limit(0).coalesce(1)
            .write.mode("overwrite").parquet(s"$dir/graft_bucket=0")
        }
        IndexFreshness.afterMaintenance(spark, dir)
        DeleteStats(touched.length, numBuckets,
          obsBase.get("n").asInstanceOf[Long] - carried, carried)
      }
    }
  }
}

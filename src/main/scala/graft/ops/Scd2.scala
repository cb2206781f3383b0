package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type-2 history — the versioned-attribute
  * story for entity metadata that drifts over time (a crawl source's
  * license, a user's consent state, a domain's quality tier): every
  * attribute change opens a new row with a validity interval, so any
  * training snapshot can be reproduced "as of" a past date.
  *
  * [[fromChangeLog]] is the batch shape: one window partitioning by key
  * turns a raw change log into collapsed history rows. The change log
  * shuffles ONCE on the key; both window passes (change detection, then
  * interval close) reuse that partitioning and sort, so Catalyst plans a
  * single Exchange. No driver collects, no joins — at 100 TB the cost is
  * one key-shuffle of the log.
  *
  * [[mergeChanges]] is the incremental shape, sharing [[Upsert]]'s
  * keyed-table layout (Hive-partitioned by `graft_bucket = pmod(
  * xxhash64(key), buckets)`): a new change batch touches only the
  * buckets holding its keys. Because every history row IS a change point
  * (`valid_from`, attributes), the merge re-derives the touched keys'
  * history from (stored change points ∪ new batch) with the SAME
  * [[fromChangeLog]] fold and rewrites just those partitions — so
  * batch-by-batch merging is definitionally equivalent to one
  * from-scratch build, and re-delivered batches converge (the union
  * collapses attribute-identical consecutive points). Cost per batch is
  * O(touched buckets), not table size.
  */
object Scd2 {

  /** Collapse a change log into SCD-2 history rows.
    *
    * @param changes  the log: one row per observation of the entity
    * @param key      entity id column name
    * @param ts       observation-time column name (becomes `valid_from`)
    * @param attrs    tracked attribute columns; a row opens a new version
    *                 iff any of them differs from the key's previous
    *                 observation (first observation always opens)
    * @param tieBreaks extra columns making (ts, tieBreaks…) a TOTAL order
    *                 per key — required when observation times can
    *                 collide; the LAST observation in that order wins the
    *                 instant (earlier same-instant rows are dropped, not
    *                 zero-length versions)
    * @return one row per version: key, attrs…, `valid_from`, `valid_to`
    *         (null while current), `version` (1-based per key),
    *         `is_current`
    */
  def fromChangeLog(
      changes: DataFrame, key: String, ts: String, attrs: Seq[String],
      tieBreaks: Seq[String] = Nil): DataFrame = {
    require(attrs.nonEmpty, "at least one tracked attribute required")
    val cols = (key +: ts +: attrs) ++ tieBreaks
    cols.foreach(c => require(changes.columns.contains(c),
      s"column '$c' not in change log: ${changes.columns.toSeq}"))
    // ONE window partitioning (key) and ONE sort (ts asc, tieBreaks
    // desc) shared by every pass below — Catalyst plans a single
    // Exchange + Sort for the whole fold. Tie-break DESC makes the
    // winning (= last-in-tie-break-order) observation of an instant the
    // FIRST row of its (key, ts) run, so the instant collapse is a lag
    // comparison instead of a second, differently-partitioned window.
    val order = col(ts).asc +: tieBreaks.map(col(_).desc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    val visible =
      if (tieBreaks.isEmpty) changes.select(cols.map(col): _*)
      else changes.select(cols.map(col): _*)
        .withColumn("__prevTs", lag(col(ts), 1).over(w))
        .filter(!(col("__prevTs") <=> col(ts))).drop("__prevTs")
    // change detection: any tracked attribute differs from the previous
    // observation (null-safe — a null→value or value→null flip is a
    // change; first observation has no predecessor and always opens)
    val changed = attrs
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _) || lag(col(ts), 1).over(w).isNull
    val opens = visible.withColumn("__open", changed)
      .filter(col("__open")).drop("__open")
    // interval close over the SAME (key, ts-order) window — Catalyst
    // reuses the one Exchange+Sort from the pass above
    opens
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(ts, "valid_from")
      .select((col(key) +: attrs.map(col)) ++
        Seq(col("valid_from"), col("valid_to"), col("version"),
          col("is_current")): _*)
  }

  private def spec(key: String, numBuckets: Int): String =
    s"scd2-history:v1 key=$key buckets=$numBuckets"

  /** Create the bucketed history table from an initial change log. Pick
    * `numBuckets` for ~1–4 GB per bucket at the table's target size (the
    * count is pinned in `_index_spec` — a mis-parameterized later merge
    * fails instead of landing keys in wrong buckets). */
  def writeHistory(
      spark: SparkSession, changes: DataFrame, key: String, ts: String,
      attrs: Seq[String], dir: String, numBuckets: Int,
      tieBreaks: Seq[String] = Nil, mode: String = "error"): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1: $numBuckets")
    val hist = fromChangeLog(changes, key, ts, attrs, tieBreaks)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existed = fs.exists(dirPath)
    // same spec-lifecycle discipline as Upsert.writeKeyedTable: only an
    // overwrite may drop an existing table's spec — a mode="error" write
    // that throws must leave the old layout guard intact, and a
    // mode="ignore" no-op write must not re-pin a different layout
    if (mode == "overwrite") IndexSpec.delete(hist, dir)
    // append onto an existing history must match the pinned layout —
    // same fail-fast as Upsert.writeKeyedTable (a re-pinned different
    // numBuckets would leave keys spread across two bucket layouts);
    // existing data without a spec = crashed create, equally refused
    val appendSpecPresent = mode == "append" && existed &&
      IndexSpec.checkReturningPresence(hist, dir, spec(key, numBuckets))
    require(!(mode == "append" && existed) || appendSpecPresent,
      s"history table at $dir exists but carries no _index_spec — a crashed " +
        "create left unpinned data; rebuild with mode=\"overwrite\"")
    // repartition by bucket: one file per bucket, not one per (history
    // shuffle partition × bucket) — the REBALANCE-before-write layout
    hist.withColumn("graft_bucket", Upsert.bucketOf(col(key), numBuckets))
      .repartition(col("graft_bucket"))
      .write.mode(mode).partitionBy("graft_bucket").parquet(dir)
    if (!(mode == "ignore" && existed) && !appendSpecPresent)
      IndexSpec.write(hist, dir, spec(key, numBuckets))
  }

  /** Read the history table back (layout column dropped). */
  def readHistory(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir).drop("graft_bucket")

  /** Migrate the history table to a new bucket count — the SCD-2 twin of
    * [[Upsert.rebucketKeyedTable]] (same paid-once rewrite, same
    * crash-safe spec ordering, same stale-dir guarantee on shrink). */
  def rebucketHistory(
      spark: SparkSession, dir: String, key: String,
      oldBuckets: Int, newBuckets: Int,
      lockLeaseMs: Long = MaintenanceLock.DefaultLeaseMs): Unit =
    Upsert.rebucketBucketed(spark, dir, key, newBuckets,
      oldSpec = spec(key, oldBuckets), newSpec = spec(key, newBuckets),
      what = "history table", rebuild = "writeHistory", lockLeaseMs)

  /** Outcome of [[mergeChanges]]: partitions rewritten vs total, change
    * rows applied, history rows for the touched keys after the merge. */
  case class Scd2MergeStats(
      touchedBuckets: Int, totalBuckets: Int, applied: Long, rewritten: Long)

  /** MERGE a change batch into the history table: touched keys' history
    * is re-derived from (their stored change points ∪ the batch) and
    * only their buckets are rewritten — for per-key in-order batches,
    * batch-by-batch merges equal the one-shot [[fromChangeLog]] build,
    * and reruns converge.
    *
    * The batch may carry several observations per key (they fold like
    * any change log); same-instant collisions within the batch need
    * `tieBreaks`. An observation at an instant the table already has a
    * version for REPLACES that change point (last write wins) — the
    * correction path.
    *
    * Late-data contract: the stored table keeps CHANGE POINTS only —
    * observations the SCD-2 collapse dropped (same attrs as their
    * predecessor) are gone by definition. A late observation landing
    * BEFORE a key's latest `valid_from` therefore folds against the
    * collapsed history: intervals re-derive correctly around it, but a
    * collapsed observation that the insertion would have re-opened
    * (a→[a dropped]→late b between them) cannot be resurrected. CDC
    * feeds that deliver per-key in order (the normal streaming shape)
    * are exact; out-of-order backfills should rebuild from the raw log
    * via [[writeHistory]]. */
  def mergeChanges(
      spark: SparkSession, dir: String, batch: DataFrame, key: String,
      ts: String, attrs: Seq[String], numBuckets: Int,
      tieBreaks: Seq[String] = Nil,
      lockLeaseMs: Long = MaintenanceLock.DefaultLeaseMs): Scd2MergeStats = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(dirPath), s"history table missing at $dir — writeHistory first")
    // existing data without a spec = crashed create; merging under an
    // assumed layout would land keys in wrong buckets (same refusal as
    // writeHistory append and the keyed-table paths)
    require(IndexSpec.checkReturningPresence(spark, dir, spec(key, numBuckets)),
      s"history table at $dir carries no _index_spec — a crashed create left " +
        "unpinned data; rebuild with writeHistory(mode = \"overwrite\")")
    MaintenanceLock.withLock(fs, dirPath, lockLeaseMs) {
      val bucketed = batch
        .select(((key +: ts +: attrs) ++ tieBreaks).map(col): _*)
        .withColumn("graft_bucket", Upsert.bucketOf(col(key), numBuckets))
        .localCheckpoint(false)
      // ONE probe job for what used to be three (instant-collision
      // guard, touched-bucket collect, batch count): per-(key, ts)
      // counts fold to (bucket set, total rows, max multiplicity) —
      // ≤ numBuckets ints + two longs on the driver
      val probe = bucketed.groupBy(col(key), col(ts))
        .agg(first(col("graft_bucket")).as("__b"), count(lit(1)).as("__c"))
        .agg(sort_array(collect_set(col("__b"))).as("buckets"),
          sum(col("__c")).as("n"), max(col("__c")).as("maxc"))
        .head()
      if (tieBreaks.isEmpty) {
        // without tie-breaks a (key, instant) collision has no defined
        // winner — fail fast, same guard shape as Upsert's
        require(probe.isNullAt(2) || probe.getLong(2) <= 1L,
          s"batch has several observations at one " +
            s"('$key', '$ts') instant and no tieBreaks — pass tieBreaks " +
            "to define which observation wins")
      }
      val touched = probe.getSeq[Int](0)
      if (touched.isEmpty)
        Scd2MergeStats(0, numBuckets, 0L, 0L)
      else {
        val applied = if (probe.isNullAt(1)) 0L else probe.getLong(1)
        // partition pruning: only touched bucket dirs are listed/read;
        // within them only the batch's keys re-fold (other keys carry).
        // Batch-derived key frames BROADCAST (probe-measured bound, see
        // Upsert.broadcastIfBounded): the touched buckets are scanned
        // map-side by the carry/re-fold split instead of shuffled twice
        // per merge. No distinct on the key frame — semi/anti build
        // sides dedup by construction, the distinct cost an Exchange
        val base = spark.read.parquet(dir)
          .filter(col("graft_bucket").isin(touched.map(Int.box): _*))
        val batchKeys = Upsert.broadcastIfBounded(
          bucketed.select(col(key)), applied)
        val carried = base.join(batchKeys, Seq(key), "left_anti")
        // stored history rows ARE change points: (key, valid_from, attrs).
        // Batch points at an instant the table already versioned replace
        // the stored point (anti-join on (key, instant) — last write
        // wins); tie-broken batch-internal collisions fold in
        // fromChangeLog below. Stored points carry no tie-break columns
        // (they were resolved at their own merge) and never share an
        // instant with a batch row (replaced above), so their null
        // backfills never compete in an instant collapse.
        val storedPoints = base.join(batchKeys, Seq(key), "left_semi")
          .withColumnRenamed("valid_from", ts)
          .select(((key +: ts +: attrs).map(col) ++
            tieBreaks.map(t => lit(null).cast(bucketed.schema(t).dataType).as(t))): _*)
          .join(Upsert.broadcastIfBounded(
              bucketed.select(col(key).as(key), col(ts).as(ts)), applied),
            Seq(key, ts), "left_anti")
        val refolded = fromChangeLog(
            storedPoints.unionByName(bucketed.drop("graft_bucket")),
            key, ts, attrs, tieBreaks)
          .withColumn("graft_bucket", Upsert.bucketOf(col(key), numBuckets))
        val merged = carried
          .unionByName(refolded.select(carried.columns.map(col): _*))
          .repartition(col("graft_bucket")) // one file per touched bucket
          .localCheckpoint(true)
        // rewritten count observed ON the write job (guide §1.2: the
        // trailing count() was a whole extra driver action per merge)
        val obs = org.apache.spark.sql.Observation()
        merged.observe(obs, count(lit(1)).as("n"))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("graft_bucket").parquet(dir)
        Scd2MergeStats(touched.length, numBuckets, applied,
          obs.get("n").asInstanceOf[Long])
      }
    }
  }

  /** The dimension "as of" `at`: the version whose interval covers the
    * instant (point-in-time training-snapshot reproduction). */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || at < col("valid_to")))

  /** Point-in-time ENRICHMENT — the classic SCD-2 consumer: each fact
    * row joined to the dimension version valid AT ITS OWN instant
    * (`valid_from <= factTime`, latest wins; `valid_to` needs no check —
    * it IS the next version's `valid_from`). Delegates to
    * [[Temporal.asofJoin]], so the plan is ONE shuffle on the key with
    * no join node; facts before a key's first version (or with no key
    * in the dimension) carry null attributes. Output columns:
    * `prefix + attr`. */
  def lookupAsOf(
      facts: DataFrame, factKey: String, factTime: String,
      history: DataFrame, key: String, attrs: Seq[String],
      prefix: String = "state_"): DataFrame = {
    require(attrs.nonEmpty, "at least one attribute to look up")
    Temporal.asofJoin(facts, factKey, factTime,
      history, key, "valid_from", payload = attrs,
      tieBreak = "version", prefix = prefix)
  }
}

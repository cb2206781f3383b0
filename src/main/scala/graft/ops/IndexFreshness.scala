package graft.ops

import org.apache.spark.sql.SparkSession

import graft.index.{IndexConf, IndexedDataSource, Metastore}

/** Composition hook between the MUTABLE-table ops (keyed merge/delete,
  * compaction, rebucket) and any index built over the same path.
  *
  * The index's documented contract is appends-invisible staleness: a
  * direct `spark.index.parquet(path)` read serves the snapshot the index
  * was built on until an explicit `refresh` (auto-substitution has its
  * own listing-drift guard). Maintenance ops make that contract easy to
  * trip — they rewrite files wholesale — so this opt-in
  * ([[IndexConf.RefreshAfterMaintenance]], off by default) refreshes the
  * SOURCE-dataspace index as the final step of every maintenance op,
  * while the op still holds the table's [[MaintenanceLock]]: the
  * mutate→refresh pair is atomic w.r.t. other maintenance, and the
  * refresh cost is delta-proportional (the op rewrote only touched
  * buckets/leaves, and refresh diffs by (path, size, mtime)).
  *
  * A refresh failure propagates — the caller opted into freshness, and a
  * silently stale index after a "successful" merge is exactly the trap
  * the opt-in exists to close. No index on the path = no-op. */
object IndexFreshness {

  /** Run at the tail of a maintenance op on `dir` (inside the table
    * lock). Default-off; see class doc. */
  private[ops] def afterMaintenance(spark: SparkSession, dir: String): Unit = {
    if (!IndexConf(spark).refreshAfterMaintenance) return
    if (IndexedDataSource.existsIndex(spark, dir, Metastore.Dataspace)) {
      IndexedDataSource.refreshIndex(spark, dir, Metastore.Dataspace)
      ()
    }
  }
}

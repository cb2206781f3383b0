package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

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
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared crash-safe SEGMENT protocol for the materialized serving
  * indexes (search postings, MinHash bands — any index whose append is
  * more than one parquet job and therefore not atomic as a whole):
  *
  *   - a batch writes its sub-tables under `dir/segments/<segmentId>/`
  *     and creates a `_commit` marker there only after every write
  *     lands — probes read base dirs + COMMITTED segments, so a batch
  *     that dies mid-write is invisible;
  *   - re-running a batch OVERWRITES its own segment directory —
  *     per-segment-id idempotence, which is exactly-once ingest under
  *     Structured Streaming's at-least-once foreachBatch retries
  *     (segmentId = batchId);
  *   - a compaction writes the merged segment's `_replaces` name list
  *     BEFORE its `_commit`: pre-commit crashes leave the inputs live,
  *     and a landed commit retires them even before their lazy
  *     deletion. Retired names are PERMANENT — appenders must refuse to
  *     reuse one (a resurrected directory would be silently invisible).
  */
private[graft] object Segments {

  def fsOf(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committedPaths(
      spark: SparkSession, dir: String): Seq[org.apache.hadoop.fs.Path] = {
    val fs = fsOf(spark, dir)
    val segsPath = new org.apache.hadoop.fs.Path(s"$dir/segments")
    if (!fs.exists(segsPath)) Nil
    else fs.listStatus(segsPath).filter(_.isDirectory).map(_.getPath)
      .filter(p => fs.exists(new org.apache.hadoop.fs.Path(p, "_commit")))
      .toSeq
  }

  /** Names superseded by some committed segment's `_replaces` list. */
  def replacedNames(spark: SparkSession, dir: String): Set[String] = {
    val fs = fsOf(spark, dir)
    committedPaths(spark, dir).flatMap { p =>
      val r = new org.apache.hadoop.fs.Path(p, "_replaces")
      if (!fs.exists(r)) Nil
      else {
        val in = fs.open(r)
        try {
          val len = fs.getFileStatus(r).getLen.toInt
          val buf = new Array[Byte](len)
          in.readFully(0, buf)
          new String(buf, "UTF-8").split("\n").filter(_.nonEmpty).toSeq
        } finally in.close()
      }
    }.toSet
  }

  /** Live committed segment dirs, sorted for deterministic plans. */
  def live(spark: SparkSession, dir: String): Seq[String] = {
    val replaced = replacedNames(spark, dir)
    committedPaths(spark, dir).filterNot(p => replaced.contains(p.getName))
      .map(_.toString).sorted
  }

  /** Base dir (if present) + live segments for one sub-table.
    *
    * One multi-root read when it resolves (ONE listing + footer
    * schema-inference job for ALL roots — a per-root read costs one tiny
    * driver job each, and streaming probes call this every micro-batch
    * over a growing segment list, guide §1.2); per-root reads unioned by
    * name as the fallback for root sets a multi-root scan rejects
    * (legacy partitionBy'd sub-tables mixed with plain ones). */
  def readPart(spark: SparkSession, dir: String, sub: String): DataFrame = {
    val fs = fsOf(spark, dir)
    val base = s"$dir/$sub"
    val roots =
      (if (fs.exists(new org.apache.hadoop.fs.Path(base))) Seq(base) else Nil) ++
        live(spark, dir).map(s => s"$s/$sub")
    require(roots.nonEmpty, s"no index data at $dir (missing $sub)")
    if (roots.length == 1) spark.read.parquet(roots.head)
    else {
      // multi-root resolution fails EAGERLY (schema merge + partition
      // discovery both run inside load): AnalysisException for schema
      // conflicts, SparkRuntimeException CONFLICTING_DIRECTORY_STRUCTURES
      // for partitionBy'd sub-tables at unrelated roots — any of them
      // means "this root set needs per-root reads"
      try spark.read.parquet(roots: _*)
      catch {
        case scala.util.control.NonFatal(_) =>
          roots.map(spark.read.parquet(_)).reduce(_ unionByName _)
      }
    }
  }

  /** Validate + reset a segment dir for (re)writing; returns its path. */
  def prepare(spark: SparkSession, dir: String, segmentId: String): String = {
    require(segmentId.nonEmpty && segmentId.forall(c =>
        c.isLetterOrDigit || c == '_' || c == '-'),
      s"segmentId must be [A-Za-z0-9_-]+: '$segmentId'")
    require(!replacedNames(spark, dir).contains(segmentId),
      s"segment id '$segmentId' was replaced by a compaction and is " +
        "permanently retired — pick a fresh id (probes skip retired names " +
        "so a resurrected directory would be silently invisible)")
    val segDir = s"$dir/segments/$segmentId"
    val fs = fsOf(spark, dir)
    val segPath = new org.apache.hadoop.fs.Path(segDir)
    if (fs.exists(segPath)) fs.delete(segPath, true) // retry replaces
    segDir
  }

  /** Commit a prepared segment; with `replaces` non-empty this is the
    * compaction commit (the list lands before the marker). */
  def commit(
      spark: SparkSession, segDir: String,
      replaces: Seq[String] = Nil): Unit = {
    val fs = fsOf(spark, segDir)
    if (replaces.nonEmpty) {
      val rep = fs.create(new org.apache.hadoop.fs.Path(segDir, "_replaces"), true)
      try rep.write(replaces.mkString("\n").getBytes("UTF-8")) finally rep.close()
    }
    fs.create(new org.apache.hadoop.fs.Path(segDir, "_commit"), true).close()
  }

  /** Lazy cleanup of replaced inputs after a compaction commit. */
  def delete(spark: SparkSession, dirs: Seq[String]): Unit = {
    val fs = if (dirs.nonEmpty) fsOf(spark, dirs.head) else return
    dirs.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }
}

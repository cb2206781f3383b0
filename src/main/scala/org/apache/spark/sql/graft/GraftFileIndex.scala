package org.apache.spark.sql.graft

import java.util.concurrent.atomic.LongAdder

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.sources.{And => SAnd, Filter}
import org.apache.spark.sql.types.StructType

import graft.index.{FileEntry, FilterFold, IndexMetadata, SketchStore}

/** The product: a Spark [[FileIndex]] that serves the file listing from the
  * persisted index metadata and prunes partitions AND files inside
  * `listFiles(partitionFilters, dataFilters)`.
  *
  * Design delta vs the reference (SURVEY.md §7.1 #1): since Spark 3.0 the
  * data filters arrive here directly, so no custom planner Strategy and no
  * mutable setIndexFilters side channel (the reference's
  * MetastoreIndex.scala:80-84 hack) are needed — stock FileSourceStrategy
  * drives the index, and the full predicate is still applied after the scan,
  * keeping pruning purely an optimization.
  */
class GraftFileIndex(
    spark: SparkSession,
    indexDir: Path,
    meta: IndexMetadata)
  extends FileIndex with Logging {

  private val hadoopConf = spark.sparkContext.hadoopConfiguration

  // (partition values row, files) reconstructed once per instance
  private lazy val partitionEntries: Seq[(InternalRow, Seq[FileEntry])] =
    meta.partitions.map { p =>
      val values = InternalRow.fromSeq(
        p.values.zip(meta.partitionSchema.fields).map { case (s, f) =>
          IndexMetadata.castFromString(f.dataType, s)
        })
      (values, p.files)
    }

  private def sketchStore: SketchStore =
    SketchStore.forDir(new Path(indexDir, graft.index.Metastore.SketchDir), hadoopConf)

  /** files-scanned telemetry for the last listFiles call (read by tests
    * and the bench harness). */
  @volatile var lastListedFiles: Long = -1L
  @volatile var lastTotalFiles: Long = meta.allFiles.size.toLong

  override def rootPaths: Seq[Path] = Seq(new Path(meta.tablePath))

  override def partitionSchema: StructType = meta.partitionSchema

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {

    // 1. partition pruning — interpreted predicate over partition values
    //    (reference ParquetIndex.prunePartitions, ParquetIndex.scala:112-145)
    val afterPartitions =
      if (partitionFilters.isEmpty || meta.partitionSchema.isEmpty) partitionEntries
      else {
        val pred = SparkInternals.compilePredicate(partitionFilters, meta.partitionSchema)
        partitionEntries.filter { case (values, _) => pred(values) }
      }

    // 2. index pruning — translate data filters, keep those fully covered
    //    by indexed columns (reference IndexSourceStrategy.scala:63-66),
    //    And-reduce, fold per file.
    val indexed = meta.indexedColumns.map(_.toLowerCase)
    val indexFilters: Seq[Filter] = dataFilters
      .flatMap(SparkInternals.translateFilter)
      .filter(_.references.forall(r => indexed.contains(r.toLowerCase)))

    val counted = new LongAdder
    val result = afterPartitions.map { case (values, files) =>
      val kept =
        if (indexFilters.isEmpty) files
        else {
          val combined = indexFilters.reduce(SAnd)
          // Fold verdicts are independent per file — evaluate them on the
          // driver's common pool (the reference used per-file Futures,
          // ParquetIndex.scala:166-178). Sequential fallback for few files.
          def prune(fs: Seq[FileEntry])(mayContain: FileEntry => Boolean): Seq[FileEntry] =
            if (fs.size < 64) fs.filter(mayContain)
            else {
              import scala.jdk.CollectionConverters._
              fs.asJava.parallelStream().filter(f => mayContain(f))
                .collect(java.util.stream.Collectors.toList[FileEntry]).asScala.toSeq
            }
          // Pass 1: min/max-only fold — no sketch IO.
          val survivors = prune(files)(f =>
            FilterFold.fileMayContain(combined, f.blocks, _ => None, meta.indexSchema))
          // Pass 2: sketches refine equality/IN verdicts, loaded in ONE
          // pruned parquet read restricted to the survivor set (the 100 TB
          // path: driver sketch residency is bounded by query selectivity,
          // not table size). Range-only queries skip sketch IO entirely.
          if (meta.sketchKind.isDefined && survivors.nonEmpty &&
              FilterFold.usesMembership(combined)) {
            val store = sketchStore
            store.ensureLoaded(survivors.map(_.path))
            prune(survivors)(f =>
              FilterFold.fileMayContain(
                combined, f.blocks, col => store.sketchFor(f.path, col),
                meta.indexSchema))
          } else survivors
        }
      counted.add(kept.size.toLong)
      SparkInternals.partitionDirectory(values, kept.map(toFileStatus).toArray)
    }
    lastListedFiles = counted.sum()
    lastTotalFiles = meta.allFiles.size.toLong
    if (indexFilters.nonEmpty) {
      logInfo(s"graft index pruning: kept $lastListedFiles/$lastTotalFiles files " +
        s"for filters ${indexFilters.mkString(", ")}")
    }
    result.filter(_.files.nonEmpty) match {
      // keep at least the empty listing shape Spark expects
      case Nil if meta.partitionSchema.isEmpty =>
        Seq(SparkInternals.partitionDirectory(InternalRow.empty, Array.empty[FileStatus]))
      case dirs => dirs
    }
  }

  private def toFileStatus(f: FileEntry): FileStatus =
    new FileStatus(f.size, false, 1, 128L * 1024 * 1024, f.modificationTime, new Path(f.path))

  override def inputFiles: Array[String] = meta.allFiles.map(_.path).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = meta.allFiles.map(_.size).sum
}

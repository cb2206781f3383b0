package graft.index

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport

/** Driver-side access to the `files` parquet table (one [[FileStatsRow]]
  * per data file, written by [[StatisticsBuilder.writeFileStats]]).
  *
  * Small tables (below the distributed-pruning threshold) are read once
  * per index directory into a process-wide cache and folded on the
  * driver; large tables never go through this path — their pruning runs
  * as a Spark job over the same parquet (see GraftFileIndex), so driver
  * residency stays O(survivors).
  */
object IndexFilesTable {

  /** Bounded dir→rows cache (same cap as the metastore catalog cache);
    * only small-table reads go through it. */
  private val MaxCached = 16
  private val cache = new TrieMap[String, Seq[FileStatsRow]]()

  private def scan[A](dir: Path, conf: Configuration)(row: FileStatsRow => A): Seq[A] = {
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Nil
    else {
      val out = Seq.newBuilder[A]
      val reader = ParquetReader.builder(new GroupReadSupport(), dir).withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) {
          out += row(FileStatsRow(
            partitionIdx = g.getInteger("partitionIdx", 0),
            path = g.getString("path", 0),
            size = g.getLong("size", 0),
            modificationTime = g.getLong("modificationTime", 0),
            blockSize = g.getLong("blockSize", 0),
            locationsJson = g.getString("locationsJson", 0),
            schemaJson = g.getString("schemaJson", 0),
            blocksJson = g.getString("blocksJson", 0),
            rowCount = g.getLong("rowCount", 0)))
          g = reader.read()
        }
      } finally reader.close()
      out.result()
    }
  }

  def readAll(dir: Path, conf: Configuration): Seq[FileStatsRow] =
    cache.getOrElseUpdate(dir.toString, {
      if (cache.size >= MaxCached) cache.headOption.foreach(e => cache.remove(e._1))
      scan(dir, conf)(identity)
    })

  /** Streaming path-only read — never cached (safe for huge tables, e.g.
    * FileIndex.inputFiles above the distributed-pruning threshold). */
  def readPaths(dir: Path, conf: Configuration): Seq[String] =
    cache.get(dir.toString) match {
      case Some(rows) => rows.map(_.path)
      case None => scan(dir, conf)(_.path)
    }

  def invalidate(dir: Path): Unit = { cache.remove(dir.toString); () }
}

package graft.index

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport

/** Driver-side access to the per-(file × column) sketch table written by
  * [[StatisticsBuilder.buildSketches]]. Bytes are loaded once per index
  * directory (process-wide cache) via a direct parquet-hadoop read — no
  * Spark job inside query planning; sketches deserialize lazily per
  * (file, column) on first probe, mirroring the reference's lazy readData
  * (ColumnFilterStatistics.scala:122-135).
  *
  * Scale note (100 TB): the whole sketch table is pulled to the driver
  * here. The metadata path for millions of files is to range-prune the
  * sketch parquet by `file` (it is written after min/max pruning already
  * shrank the candidate set) — tracked as a post-parity step, same as the
  * reference's per-block sketch files.
  */
class SketchStore(dir: Path, conf: Configuration) {

  private lazy val bytesByKey: Map[(String, String), (String, Array[Byte])] = {
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Map.empty
    else {
      val out = Map.newBuilder[(String, String), (String, Array[Byte])]
      val reader = ParquetReader.builder(new GroupReadSupport(), dir).withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) {
          val file = SketchStore.normalizePath(g.getString("file", 0))
          val column = g.getString("column", 0)
          val kind = g.getString("kind", 0)
          val data = g.getBinary("data", 0).getBytes
          out += ((file, column) -> (kind, data))
          g = reader.read()
        }
      } finally reader.close()
      out.result()
    }
  }

  private val deserialized = new TrieMap[(String, String), Option[Sketch]]()

  def sketchFor(file: String, column: String): Option[Sketch] = {
    val key = (SketchStore.normalizePath(file), column)
    deserialized.getOrElseUpdate(key,
      bytesByKey.get(key).map { case (kind, bytes) =>
        Sketch.deserialize(kind, bytes)
      })
  }

  def preload(): Unit =
    bytesByKey.keys.foreach { case (f, c) => sketchFor(f, c) }
}

object SketchStore {
  private val cache = new TrieMap[String, SketchStore]()

  /** input_file_name() yields `file:///x` while FileStatus paths render as
    * `file:/x`; key sketches by the bare URI path so both agree. */
  def normalizePath(s: String): String = new Path(s).toUri.getPath

  def forDir(dir: Path, conf: Configuration): SketchStore =
    cache.getOrElseUpdate(dir.toString, new SketchStore(dir, conf))

  def invalidate(dir: Path): Unit = { cache.remove(dir.toString); () }
}

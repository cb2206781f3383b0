package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostics main: stage-level timing of a 1-file-delta refresh over
  * the 1m fixture (listing vs scratch-write vs diff vs end-to-end).
  * Not part of the driver contract; used to attribute the refresh_1m
  * floor (r11: RawLocalFileSystem.listStatus = 12 s of the 19 s). */
object RefreshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.index.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }

    SparkEntry.indexed1mFiles(spark, sfDir).count() // warm + ensure fixture
    val dir1m = SparkEntry.scratchTableDir(sfDir, "files1m")
    val pre = new java.io.File(dir1m).listFiles().map(_.getName).toSet

    // raw walk cost: one listStatus of the flat dir, executor-side
    t("listStatus-flat") {
      val p = new org.apache.hadoop.fs.Path(dir1m)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).listStatus(p).length
    }
    // scratch write cost
    t("walk+write-scratch") {
      val hconf = spark.sparkContext.hadoopConfiguration
      val confBc = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(hconf))
      import spark.implicits._
      val level = spark.sparkContext.parallelize(Seq(dir1m), 1).flatMap { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(confBc.value.value).listStatus(p).iterator
          .filter(st => !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .map(st => (st.isDirectory, st.getPath.toString, st.getLen,
            st.getModificationTime, st.getBlockSize))
      }.toDF("isDir", "path", "size", "modificationTime", "blockSize")
      level.filter(!col("isDir")).drop("isDir")
        .write.mode("overwrite").parquet("/tmp/probe_listing")
    }
    // oldKeys read cost
    val ms = new graft.index.Metastore(spark, graft.index.IndexConf(spark))
    val (indexDir, _) = ms.load(graft.index.Metastore.Dataspace,
      graft.index.IndexedDataSource.resolveTablePath(spark, dir1m))
    val filesDir = new org.apache.hadoop.fs.Path(indexDir, "files")
    t("read-oldKeys-count") {
      spark.read.parquet(filesDir.toString)
        .select("path", "size", "modificationTime").count()
    }
    t("fullouter-diff") {
      val listing = spark.read.parquet("/tmp/probe_listing")
      val oldKeys = spark.read.parquet(filesDir.toString)
        .select("path", "size", "modificationTime")
      listing.withColumn("__live", lit(1))
        .join(oldKeys.withColumn("__known", lit(1)),
          Seq("path", "size", "modificationTime"), "full_outer")
        .filter(col("__known").isNull).collect().length
    }

    // the real thing, end to end
    spark.range(100).select(lit(99999L).as("k"), lit("s99999").as("ks"),
        col("id").as("v"))
      .coalesce(1).write.mode("append").parquet(dir1m)
    t("refresh-end-to-end") {
      spark.index
        .option(graft.index.IndexConf.DistributedPruningThreshold, "10000")
        .refresh.parquet(dir1m)
    }
    // restore
    new java.io.File(dir1m).listFiles()
      .filter(f => !pre.contains(f.getName))
      .filter(f => f.getName.endsWith(".parquet") || f.getName.endsWith(".crc"))
      .foreach(_.delete())
    t("refresh-restore") {
      spark.index.refresh.parquet(dir1m)
    }
    spark.stop()
  }
}

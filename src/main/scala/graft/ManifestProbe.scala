package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostics main: quantifies the dir-mtime manifest tier on a
  * PARTITIONED many-file layout (the case the flat 1M fixture cannot
  * show): 256 `k=v` dirs × 100 files, 1-file delta, refresh timed with
  * the manifest ON (probe + re-list one dir) vs OFF (full walk). Output
  * is one JSON line for bench_notes. Not part of the driver contract. */
object ManifestProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.index.implicits._
    import spark.implicits._

    val scratch = "/root/repo/target/graft_scratch/manifestprobe"
    spark.conf.set(graft.index.IndexConf.MetastoreLocation, s"$scratch/metastore")
    val tableDir = s"$scratch/part_25k"
    val marker = new java.io.File(s"$scratch/part_25k_ready")
    val dirs = 256
    val filesPerDir = 100
    if (!marker.exists()) {
      marker.delete()
      // one seed file per partition value, then copy it 99 more times
      // inside its dir (copies run as a Spark job)
      val rows = for (k <- 0 until dirs; r <- 0 until 50)
        yield (k.toLong, (k * 50 + r).toLong)
      spark.sparkContext.parallelize(rows, dirs).toDF("k", "v")
        .write.mode("overwrite").partitionBy("k").parquet(tableDir)
      val base = new java.io.File(tableDir)
      val seeds = base.listFiles().filter(_.getName.startsWith("k="))
        .flatMap { d =>
          d.listFiles().filter(f => f.getName.endsWith(".parquet"))
            .map(f => (d.getAbsolutePath, f.getAbsolutePath))
        }.toSeq
      require(seeds.size == dirs, s"expected $dirs seed files, got ${seeds.size}")
      val copyJobs = seeds.flatMap { case (d, src) =>
        (1 until filesPerDir).map(j => (src, s"$d/part-copy-$j.parquet"))
      }
      spark.sparkContext.parallelize(copyJobs, 64).foreach { case (src, dst) =>
        java.nio.file.Files.copy(java.nio.file.Paths.get(src),
          java.nio.file.Paths.get(dst),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      spark.index.create.mode("overwrite")
        .option(graft.index.IndexConf.FilterEnabled, "false")
        .option(graft.index.IndexConf.DistributedPruningThreshold, "1000")
        .option(graft.index.IndexConf.RefreshDirManifest, "true")
        .indexBy("v").parquet(tableDir)
      java.nio.file.Files.write(marker.toPath, "1".getBytes)
    }

    def addOne(): java.io.File = {
      val dst = new java.io.File(s"$tableDir/k=7/part-extra-${System.nanoTime()}.parquet")
      val src = new java.io.File(s"$tableDir/k=7").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath, dst.toPath)
      dst
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def refresh(manifestOn: Boolean): Unit = {
      spark.index
        .option(graft.index.IndexConf.DistributedPruningThreshold, "1000")
        .option(graft.index.IndexConf.RefreshDirManifest, manifestOn.toString)
        .option(graft.index.IndexConf.RefreshDirMtimeSlack, "0")
        .refresh.parquet(tableDir)
    }

    refresh(manifestOn = true) // settle: seed/refresh the manifest past create
    // manifest ON: probe all dirs, re-list exactly the touched one
    val f1 = addOne()
    val tOn = time(refresh(manifestOn = true))
    val statsOn = graft.index.IndexedDataSource.lastManifestStats
    f1.delete()
    val tOnDel = time(refresh(manifestOn = true))
    // manifest OFF: full walk of all 256 dirs × 100 files
    val f2 = addOne()
    val tOff = time(refresh(manifestOn = false))
    f2.delete()
    val tOffDel = time(refresh(manifestOn = false))
    // restore the manifest for subsequent runs
    refresh(manifestOn = true)

    val (probed, changed, deleted, unchanged) =
      statsOn.getOrElse((-1L, -1L, -1L, -1L))
    println(s"""{"metric":"manifest_probe","dirs":$dirs,"files":${dirs * filesPerDir},""" +
      s""""refresh_manifest_on_sec":$tOn,"refresh_manifest_on_del_sec":$tOnDel,""" +
      s""""refresh_manifest_off_sec":$tOff,"refresh_manifest_off_del_sec":$tOffDel,""" +
      s""""probed":$probed,"changed":$changed,"deleted":$deleted,"unchanged":$unchanged}""")
    spark.stop()
  }
}

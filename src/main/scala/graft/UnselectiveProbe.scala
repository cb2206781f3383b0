package graft

import org.apache.spark.sql.SparkSession

/** Driver-residency probe for the UNSELECTIVE v1 listing floor at 10⁶
  * files — the measurement loop behind BENCH's `unselective_1m_*` rows,
  * runnable standalone while tuning the materialization
  * (GraftFileIndex.survivorsUnfiltered). Prints ONE JSON line with
  * best-of-N list time, the heap delta over the HELD result (same
  * convention as Bench: no GC before the after-sample, so transient
  * allocation pressure counts too), and a second GC'd sample isolating
  * the LIVE footprint of the retained PartitionDirectory shape.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain
  * graft.UnselectiveProbe (first build of the 1M fixture ~5-10 min,
  * then cached in target/graft_scratch).
  */
object UnselectiveProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df = SparkEntry.indexed1mFiles(spark, sfDir)
    val g = df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation].location
    }.get.asInstanceOf[org.apache.spark.sql.graft.GraftFileIndex]

    val rt = Runtime.getRuntime
    def used(): Long = rt.totalMemory() - rt.freeMemory()
    def gc(): Unit = { System.gc(); Thread.sleep(200); System.gc() }

    // warm once (parquet footer/codegen paths), then measure best-of-3
    val warm = g.listFiles(Nil, Nil)
    println(s"[probe] status class: " +
      warm.head.files.head.fileStatus.getClass.getName +
      s" sample path: ${warm.head.files.head.getPath}")
    warm.iterator.map(_.files.length).sum

    var bestSec = Double.MaxValue
    var heapDeltaMb = Double.MaxValue
    var liveMb = Double.MaxValue
    var nf = 0L
    for (_ <- 1 to 3) {
      gc()
      val h0 = used()
      val t0 = System.nanoTime()
      val pds = g.listFiles(Nil, Nil)
      nf = pds.iterator.map(_.files.length.toLong).sum
      val sec = (System.nanoTime() - t0) / 1e9
      val delta = math.max(0L, used() - h0) / (1024.0 * 1024.0)
      gc() // pds still referenced: this isolates the LIVE result bytes
      val live = math.max(0L, used() - h0) / (1024.0 * 1024.0)
      bestSec = math.min(bestSec, sec)
      heapDeltaMb = math.min(heapDeltaMb, delta)
      liveMb = math.min(liveMb, live)
    }
    println(f"""{"metric":"unselective_probe","files":$nf,""" +
      f""""list_sec":$bestSec%.3f,"heap_delta_mb":$heapDeltaMb%.1f,""" +
      f""""live_mb":$liveMb%.1f,"live_bytes_per_file":${liveMb * 1048576 / math.max(1L, nf)}%.0f}""")
    spark.stop()
  }
}

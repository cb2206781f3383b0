package graft

import org.apache.spark.sql.SparkSession

/** WHOLE-SUITE one-decade-up bench (r12 verdict #2): every
  * [[SparkEntry.queries]] entry timed once at sf0.1 and once over the
  * synthesized FK-consistent 10× corpus ([[Sf1Corpus]]), same session,
  * sorted-name order — the run where a broadcast-threshold flip, a
  * spill cliff, or an accidental O(n²) first shows as a per-query
  * sf1/sf0.1 ratio far above 10×. Writes one JSON line (per-query
  * sf01_sec/sf1_sec/ratio) to stdout and
  * `bench_notes/r13_sf1_full.json` via SPARK_GRAFT_BENCH_OUT.
  *
  * Both dirs are WARMED untimed first ([[Bench.warmup]] builds every
  * create-once scratch fixture), so timed runs measure query work, not
  * one-time index/ingest builds. Ratios of sub-0.3 s queries are noise
  * (harness floor dominates); the analysis notes treat only >1 s rows
  * as signal.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain
  * graft.Sf1FullProbe (first corpus+fixture build ~20-40 min, cached).
  */
object Sf1FullProbe {
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

    val bigDir = Sf1Corpus.ensure(spark, sfDir)
    System.err.println(s"PROBE corpus ready at $bigDir; warming fixtures…")
    Bench.warmup(spark, sfDir)
    Bench.warmup(spark, bigDir)
    System.err.println("PROBE fixtures warm; timing…")

    def timeOnce(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val rows = names.map { q =>
      try {
        val small = timeOnce(q, sfDir)
        val big = timeOnce(q, bigDir)
        val ratio = big / math.max(1e-9, small)
        System.err.println(
          f"PROBE $q%-32s sf0.1=$small%8.2fs sf1=$big%8.2fs ratio=$ratio%6.2f")
        q -> (small, big, ratio, true)
      } catch {
        case e: Throwable =>
          System.err.println(s"PROBE FAILURE in $q: $e")
          q -> (-1.0, -1.0, -1.0, false)
      }
    }
    val ok = rows.filter(_._2._4)
    val failed = rows.filterNot(_._2._4).map(_._1)
    val qJson = ok.map { case (q, (s, b, r, _)) =>
      f""""$q":{"sf01_sec":$s%.3f,"sf1_sec":$b%.3f,"ratio":$r%.3f}"""
    }.mkString("{", ",", "}")
    val hot = ok.filter { case (_, (_, b, r, _)) => b >= 1.0 && r > 10.0 }
      .map(_._1)
    val json = s"""{"metric":"sf1_full","n_queries":${ok.size},""" +
      s""""failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""total_sf01_sec":${ok.map(_._2._1).sum},""" +
      s""""total_sf1_sec":${ok.map(_._2._2).sum},""" +
      s""""over10x_over1s":${hot.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""queries":$qJson,"sf":"$sfDir","big":"$bigDir"}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_notes/r13_sf1_full.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"PROBE WARN: could not write $outPath: $e")
    }
    println(json)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-decade-up spot probe: replays the headline indexed-query shapes
  * over an sf≈1 table (10× the sf0.1 lineitem, orderkeys shifted per
  * copy so key selectivity is preserved) and prints ONE JSON line with
  * indexed-vs-plain ratios. The driver testdata stops at sf0.1; this
  * synthesizes the next decade in scratch to validate that the 2×-bar
  * headroom measured at sf0.1 is not a small-data artifact.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.Sf1Probe
  * (output consumed into bench_notes/r11_sf1_probe.json).
  */
object Sf1Probe {
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
    import spark.implicits._
    import graft.index.implicits._

    val scratch = s"/root/repo/target/graft_scratch/sf1probe"
    spark.conf.set(graft.index.IndexConf.MetastoreLocation, s"$scratch/metastore")
    val tableDir = s"$scratch/lineitem_x10"
    val marker = new java.io.File(s"$scratch/lineitem_x10_ready")
    if (!marker.exists()) {
      marker.delete()
      val base = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val keySpan = base.agg(max($"l_orderkey")).head.getLong(0) + 1L
      // 10 shifted copies -> ~6M rows at sf0.1 input (real TPC-H sf1
      // size), 160 files so file pruning has the same granularity story
      val x10 = (0 until 10).map { i =>
        base.withColumn("l_orderkey", $"l_orderkey" + lit(i * keySpan))
      }.reduce(_.unionAll(_))
      x10.repartition(160, $"l_orderkey")
        .write.mode("overwrite").parquet(tableDir)
      spark.index.create.mode("overwrite")
        .indexBy("l_orderkey", "l_returnflag", "l_shipdate", "l_extendedprice")
        .parquet(tableDir)
      java.nio.file.Files.write(marker.toPath, "1".getBytes)
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def best2(f: => Unit): Double = math.min(time(f), time(f))

    val plain = () => spark.read.parquet(tableDir)
    val indexed = () => spark.index.parquet(tableDir)
    val key = plain().agg(min($"l_orderkey")).head.getLong(0) + 7L

    // warm both paths once (footer/index caches, codegen)
    plain().filter($"l_orderkey" === key).count()
    indexed().filter($"l_orderkey" === key).count()

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    results("point_plain") = best2 {
      plain().filter($"l_orderkey" === key)
        .select($"l_orderkey", $"l_quantity").collect()
    }
    results("point_indexed") = best2 {
      indexed().filter($"l_orderkey" === key)
        .select($"l_orderkey", $"l_quantity").collect()
    }
    results("range_plain") = best2 {
      plain()
        .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1995-02-01").cast("timestamp_ntz") &&
          $"l_orderkey" < lit(keySpanOf(spark, tableDir) / 20))
        .groupBy($"l_returnflag").agg(count(lit(1)), round(sum($"l_quantity"), 2))
        .collect()
    }
    results("range_indexed") = best2 {
      indexed()
        .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1995-02-01").cast("timestamp_ntz") &&
          $"l_orderkey" < lit(keySpanOf(spark, tableDir) / 20))
        .groupBy($"l_returnflag").agg(count(lit(1)), round(sum($"l_quantity"), 2))
        .collect()
    }
    results("topk_plain") = best2 {
      plain().orderBy($"l_extendedprice".desc).limit(100)
        .select($"l_orderkey", $"l_extendedprice").collect()
    }
    results("topk_indexed") = best2 {
      indexed().orderBy($"l_extendedprice".desc).limit(100)
        .select($"l_orderkey", $"l_extendedprice").collect()
    }
    results("meta_agg_plain") = best2 {
      plain().agg(count(lit(1)), min($"l_orderkey"), max($"l_orderkey")).collect()
    }
    results("meta_agg_indexed") = best2 {
      indexed().agg(count(lit(1)), min($"l_orderkey"), max($"l_orderkey")).collect()
    }
    // join prune: a 20-key dim against the 6M-row fact
    val dim = (0 until 20).map(i => key + i * 64).toDF("k")
    results("join_plain") = best2 {
      plain().join(dim, $"l_orderkey" === $"k")
        .agg(count(lit(1)), round(sum($"l_quantity"), 2)).collect()
    }
    results("join_indexed") = best2 {
      indexed().join(dim, $"l_orderkey" === $"k")
        .agg(count(lit(1)), round(sum($"l_quantity"), 2)).collect()
    }

    val ratios = Seq("point", "range", "topk", "meta_agg", "join").map { q =>
      q -> results(s"${q}_indexed") / math.max(1e-9, results(s"${q}_plain"))
    }
    val fields = results.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    val ratioFields = ratios.map { case (k, v) => s""""ratio_$k":$v""" }.mkString(",")
    println(s"""{"metric":"sf1_probe","rows":${plain().count()},$fields,$ratioFields,"sf_input":"$sfDir"}""")
    spark.stop()
  }

  private var keySpanCache = -1L
  private def keySpanOf(spark: SparkSession, tableDir: String): Long = {
    if (keySpanCache < 0) {
      import spark.implicits._
      keySpanCache = spark.read.parquet(tableDir)
        .agg(max($"l_orderkey")).head.getLong(0)
    }
    keySpanCache
  }
}

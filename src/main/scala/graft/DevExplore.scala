package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Throwaway dev harness (deleted before round end):
  *   - default: dump named queries + oracles for a quick DuckDB compare;
  *   - "plans": audit every query's physical plan for scale red flags.
  */
object DevExplore {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.streamingQueryListeners", "graft.DevStreamListener")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (args.headOption.contains("dpp")) {
      import graft.index.implicits._
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val work = "/root/repo/target/dpp_probe"
      val pPath = s"$work/orders_part"
      spark.conf.set(graft.index.IndexConf.MetastoreLocation, s"$work/metastore")
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .withColumn("o_year", year(col("o_orderdate")))
        .write.partitionBy("o_year").mode("overwrite").parquet(pPath)
      spark.index.create.mode("overwrite").indexBy("o_custkey").parquet(pPath)
      val years = spark.read.parquet(pPath).select("o_year").distinct()
        .as[Int].collect().sorted
      val target = years.head
      years.map(y => (y, if (y == target) "keep" else "drop"))
        .toSeq.toDF("y", "tag")
        .write.mode("overwrite").parquet(s"$work/dim")
      val dim = spark.read.parquet(s"$work/dim")
      for ((label, fact) <- Seq(
          "plain" -> spark.read.parquet(pPath),
          "indexed" -> spark.index.parquet(pPath))) {
        val joined = fact.join(dim.filter($"tag" === "keep"),
          fact("o_year") === dim("y"))
        joined.count()
        val planStr = joined.queryExecution.executedPlan.toString
        println(s"=== $label: contains dynamicpruning = " +
          planStr.toLowerCase.contains("dynamicpruning"))
        println(planStr.take(4000))
      }
      spark.stop(); return
    }

    if (args.headOption.contains("meta50k")) {
      // decompose the 50k-file metadata-aggregate latency: optimizer
      // rewrite vs fold vs execution, cold vs memoized
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val sfDir = "/root/testdata/sf0.001"
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
      }
      val df = t("load")(SparkEntry.indexed50kFiles(spark, sfDir))
      def agg(d: org.apache.spark.sql.DataFrame) =
        d.agg(count(lit(1)).as("n"), min($"k").as("mn"), max($"k").as("mx"))
      val gfi = df.queryExecution.analyzed.collectLeaves().head
        .asInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]
        .relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
        .location.asInstanceOf[org.apache.spark.sql.graft.GraftFileIndex]
      (1 to 3).foreach(i => t(s"metadataStats #$i")(gfi.metadataStats(Seq("k"))))
      (1 to 3).foreach(i => t(s"optimize only #$i") {
        val p = agg(df).queryExecution.optimizedPlan
        if (i == 1) println("  rewritten = " + p.collectFirst {
          case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
        }.isDefined)
      })
      (1 to 3).foreach(i => t(s"agg collect #$i")(agg(df).collect()))
      (1 to 3).foreach(i => t(s"agg count #$i")(agg(df).count()))
      val qe = agg(df).count() match { case _ => agg(df).queryExecution }
      println("=== optimized ===\n" + qe.optimizedPlan.toString.take(1500))
      println("=== executed ===\n" + qe.executedPlan.toString.take(1500))
      val qc = {
        val d = agg(df).groupBy().count()
        d.collect(); d.queryExecution
      }
      println("=== count executed ===\n" + qc.executedPlan.toString.take(2500))
      spark.stop(); return
    }

    if (args.headOption.contains("stress")) {
      // 256-file table at sf0.1: driver-fold vs distributed-fold latency
      import graft.index.implicits._
      import org.apache.spark.sql.functions._
      val work = "/root/repo/target/stress"
      val table = s"$work/lineitem256"
      spark.conf.set(graft.index.IndexConf.MetastoreLocation, s"$work/metastore")
      if (!new java.io.File(s"$work/ready").exists()) {
        spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
          .repartitionByRange(256, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey")
          .write.mode("overwrite").parquet(table)
        val t0 = System.nanoTime()
        spark.index.create.mode("overwrite")
          .indexBy("l_orderkey", "l_returnflag").parquet(table)
        println(f"[stress] index build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        java.nio.file.Files.createFile(Paths.get(s"$work/ready"))
      }
      val key = spark.read.parquet(table).agg(min(col("l_orderkey"))).head.getLong(0)
      def timeQuery(label: String): Unit = {
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          val n = spark.index.parquet(table).filter(col("l_orderkey") === key).count()
          println(f"[stress] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
        }
      }
      timeQuery("driver-fold")
      spark.conf.set(graft.index.IndexConf.DistributedPruningThreshold, "1")
      timeQuery("distributed-fold")
      spark.conf.unset(graft.index.IndexConf.DistributedPruningThreshold)
      spark.stop(); return
    }

    if (args.headOption.contains("stream")) {
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
      def time[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[stream] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        r
      }
      // warm the parquet read + codegen paths so stream timings isolate
      // streaming machinery
      time("batch-warmup")(SparkEntry.queries("q_events_window")(spark, sfDir).count())
      // two measured iterations at the production state-partition count
      val sp = 4
      for (i <- 1 to 2) {
        time(s"complete-sp$sp-$i")(
          graft.streaming.Streaming.hourlyEventCounts(spark, sfDir, sp).count())
        val out = Files.createTempDirectory("graft_stream_prof").toString
        time(s"upsert-sp$sp-$i")(
          graft.streaming.Streaming.hourlyEventCountsUpsert(spark, sfDir, out, sp).count())
      }
      spark.stop(); return
    }

    if (args.headOption.contains("cc")) {
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
      import org.apache.spark.sql.functions._
      def time[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[cc] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        r
      }
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      (1 to 2).foreach { i =>
        val pairs = graft.dedup.Dedup.ngramJaccardPairs(
          docs, col("doc_id"), col("text"), 3, 0.5)
        time(s"pairs-$i")(pairs.count())
        val pairs2 = graft.dedup.Dedup.ngramJaccardPairs(
          docs, col("doc_id"), col("text"), 3, 0.5)
        time(s"cc-$i")(graft.dedup.Dedup.connectedComponents(pairs2).count())
        time(s"clusters-full-$i")(graft.dedup.Dedup.duplicateClusters(
          docs, col("doc_id"), col("text"), 3, 0.5).count())
        time(s"ann-dedup-$i")(SparkEntry.queries("q_ann_dedup")(spark, sfDir).count())
      }
      spark.stop(); return
    }

    if (args.headOption.contains("plans")) {
      val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
      val skip = Set("q_stream_hourly", "q_stream_hourly_update", "q_sessionize")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (!skip.contains(name)) {
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.executedPlan.toString
            val flags = Seq(
              "CartesianProduct" -> plan.contains("CartesianProduct"),
              "NestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
              "noWSCG" -> !plan.contains("WholeStageCodegen")
            ).collect { case (f, true) => f }
            val exchanges = "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
              .findAllIn(plan).length
            println(s"PLAN $name: exchanges=$exchanges flags=${flags.mkString(",")}")
          } catch { case e: Throwable => println(s"PLAN $name: ERROR $e") }
        }
      }
      spark.stop(); return
    }

    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = if (args.length > 1) args(1) else "target/verify_delta"
    val names = args.drop(2).toSeq match {
      case Nil => Seq("q_dedup_simhash", "q_ann_cosine_pairs", "q_ann_lsh")
      case xs => xs
    }
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.filter(SparkEntry.oracleSql.contains)
      .map(k => s"${q(k)}: ${q(SparkEntry.oracleSql(k))}").mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

/** Dev-only: per-microbatch duration dump for the stream profiler. */
class DevStreamListener extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  def onQueryStarted(e: QueryStartedEvent): Unit = ()
  def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  def onQueryProgress(e: QueryProgressEvent): Unit =
    println(s"[stream]   batch=${e.progress.batchId} rows=${e.progress.numInputRows} " +
      s"durationMs=${e.progress.durationMs}")
}

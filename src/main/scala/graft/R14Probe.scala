package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only round-14 optimization probe (not part of the driver
  * contract): [[R13Probe]] with plan dumps routed to plans/r14/. Runs the
  * named SparkEntry queries under bench-identical config, reporting
  * wall-clock, Spark job count and summed task time per query, and
  * optionally dumping `.explain("formatted")` of the returned frame.
  *
  * Usage: runMain graft.R14Probe <q1,q2,...> [reps] [planTag]
  *   - reps: times each query runs (default 2; min is reported)
  *   - planTag: if set, writes plans/r14/<query>_<planTag>.txt
  */
object R14Probe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q_stream_cms"))
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val planTag = args.drop(2).headOption
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ad-hoc A/B knobs: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" applied to the
    // probe session (ops read runtime conf, so this flips their behavior)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })

    // job/task accounting across everything the query triggers (incl.
    // child sessions: the listener is SparkContext-wide)
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskNanos = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    // SPARK_GRAFT_JOB_LOG=1: print each job's description + callsite so
    // per-batch job inventories are attributable to operator code lines
    val jobLog = sys.env.get("SPARK_GRAFT_JOB_LOG").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (jobLog) {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
          val stg = j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | ")
          println(s"[job] ${j.jobId} stages=${j.stageInfos.size} site='$site' " +
            s"desc='${desc.replace('\n', ' ').take(60)}' stg='${stg.take(160)}'")
        }
        ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        taskNanos.addAndGet(s.stageInfo.taskMetrics.executorRunTime * 1000000L)
        tasks.addAndGet(s.stageInfo.numTasks.toLong)
        ()
      }
    })

    val needsWarmup = names.exists(n => n.startsWith("q_idx_") ||
      n.startsWith("q_meta_") || n == "q_stream_ingest" ||
      n.contains("serving") || n.startsWith("q_topk"))
    if (needsWarmup) Bench.warmup(spark, sfDir)
    // one throwaway run of the first query warms codegen/JIT paths
    SparkEntry.queries(names.head)(spark, sfDir).count()

    println(f"${"query"}%-26s ${"best_s"}%8s ${"jobs"}%6s ${"tasks"}%7s ${"task_s"}%8s ${"work_s"}%7s")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val runs = (0 until reps).map { _ =>
        graft.streaming.Streaming.BatchWork.reset()
        jobs.set(0); taskNanos.set(0); tasks.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        Thread.sleep(150) // let the listener bus drain
        ((System.nanoTime() - t0) / 1e9, jobs.get, tasks.get, taskNanos.get / 1e9,
          graft.streaming.Streaming.BatchWork.seconds)
      }
      val best = runs.minBy(_._1)
      println(f"$name%-26s ${best._1}%8.3f ${best._2}%6d ${best._3}%7d ${best._4}%8.2f ${best._5}%7.2f")
      planTag.foreach { tag =>
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(s"plans/r14/${name}_$tag.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: job-level timing of ONE streaming-shaped in-batch dedup
  * (the q_stream_neardedup work kernel) — where do 1.6 s per micro-batch
  * go? */
object DevBatch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val parts = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    val t0s = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        t0s.put(j.jobId, System.nanoTime()); ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val d = (System.nanoTime() - t0s.getOrDefault(j.jobId, System.nanoTime())) / 1e9
        println(f"[job] ${j.jobId}%4d ${d}%7.3f s")
      }
    })
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").localCheckpoint()
    val maxId = docs.agg(max($"doc_id")).head.getLong(0)
    val slice = maxId / 4 + 1
    val batch = docs.filter($"doc_id" < slice)
    def once(tag: String): Unit = {
      val t0 = System.nanoTime()
      val signed = graft.dedup.Dedup.minhashSigned(batch, $"doc_id", $"text", 64, 3)
      val t1 = System.nanoTime()
      println(f"[stage] $tag sign-build ${(t1 - t0) / 1e9}%7.3f")
      val k = graft.dedup.Dedup.dedupMinhashSigned(signed, 64, 16, 0.5)
      val n = k.count()
      val t2 = System.nanoTime()
      println(f"[stage] $tag dedup+count ${(t2 - t1) / 1e9}%7.3f  kept=$n")
    }
    once("cold")
    once("warm")
    once("warm2")

    // LogReg.fit / Dsir cost split (q_pipeline_curate5's trained models)
    val t0 = System.nanoTime()
    val en = docs.filter(col("doc_id") % 3 === 0)
    val model1 = graft.text.LogReg.fit(en, docs.filter(col("doc_id") % 3 =!= 0),
      col("doc_id"), col("text"), buckets = 1024, iters = 1, etaMilli = 500)
    val t1 = System.nanoTime()
    val model3 = graft.text.LogReg.fit(en, docs.filter(col("doc_id") % 3 =!= 0),
      col("doc_id"), col("text"), buckets = 1024, iters = 3, etaMilli = 500)
    val t2 = System.nanoTime()
    graft.text.LogReg.score(docs, col("doc_id"), col("text"), model3)
      .agg(sum(col("margin_micro"))).head
    val t3 = System.nanoTime()
    graft.text.Dsir.importanceWeights(docs, en, col("doc_id"), col("text"), 1024)
      .agg(sum(col("logw_micro"))).head
    val t4 = System.nanoTime()
    println(f"[logreg] fit-1iter ${(t1 - t0) / 1e9}%6.2f  fit-3iter ${(t2 - t1) / 1e9}%6.2f  " +
      f"score ${(t3 - t2) / 1e9}%6.2f  dsir ${(t4 - t3) / 1e9}%6.2f  (model1 b=${model1.interceptMicro})")
    spark.stop()
  }
}

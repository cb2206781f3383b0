package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for pipeline hotspots (not part of the driver
  * contract). Usage: runMain graft.DevProfile <sfDir>. */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    if (args.drop(1).headOption.contains("stream")) {
      profileNearDedupBatches(spark, dir)
      spark.stop()
      return
    }

    val docs = spark.read.parquet(s"$dir/documents.parquet").cache()
    println(s"[profile] docs = ${docs.count()}")

    val toks = docs.select($"doc_id", graft.text.TextFunctions.tokens($"text").as("t"))
    time("tokens")(toks.agg(sum(size($"t"))).head)

    val sh = docs.select($"doc_id", graft.dedup.Dedup.shingles($"text", 3).as("s"))
    time("shingles")(sh.agg(sum(size($"s"))).head)

    val sig = sh.select($"doc_id",
      graft.dedup.Dedup.minhashSignature($"s", 64).as("sig"))
    time("signatures")(sig.agg(sum(size($"sig"))).head)

    val banded = sig.select($"doc_id",
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(concat_ws(",",
          slice($"sig", b * lit(4) + lit(1), lit(4)).cast("array<string>")))))
        .as(Seq("band", "key")))
    time("banding")(banded.count())

    val cand = banded.select($"band", $"key", $"doc_id".as("id_a"))
      .join(banded.select($"band", $"key", $"doc_id".as("id_b")), Seq("band", "key"))
      .filter($"id_a" < $"id_b")
    println(s"[profile] candidate rows (with band dups) = ${time("cand-join")(cand.count())}")
    println(s"[profile] distinct candidate pairs = " +
      time("cand-distinct")(cand.select($"id_a", $"id_b").distinct().count()))

    val pairs = graft.dedup.Dedup.minhashPairs(docs, $"doc_id", $"text")
    println(s"[profile] minhash pairs = ${time("minhashPairs-full")(pairs.count())}")

    val ngram = graft.dedup.Dedup.ngramJaccardPairs(docs, $"doc_id", $"text", threshold = 0.5)
    println(s"[profile] ngram pairs = ${time("ngramPairs-full")(ngram.count())}")

    spark.stop()
  }

  /** Per-stage breakdown of ONE nearDedupIngest micro-batch at each batch
    * position (the q_stream_neardedup work profile): sign → index probe →
    * in-batch dedup → kept write → segment append, replayed over the same
    * 4 ranged slices the streaming harness stages. */
  private def profileNearDedupBatches(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def time[T](name: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $name%-28s $s%8.2f s")
      (r, s)
    }
    val work = java.nio.file.Files.createTempDirectory("graft-profstream").toString
    val idxDir = s"$work/minhash_index"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text").localCheckpoint()
    val maxId = docs.agg(max($"doc_id")).head.getLong(0)
    val slice = maxId / 4 + 1
    (0 until 4).foreach { b =>
      println(s"[profile] ===== batch $b =====")
      val batch = docs.filter($"doc_id" >= b * slice && $"doc_id" < (b + 1) * slice)
      val (signed, _) = time(s"b$b sign+checkpoint") {
        val s0 = graft.dedup.Dedup.minhashSigned(batch, $"doc_id", $"text", 64, 3)
        s0.count(); s0
      }
      val (vsIndex, _) = time(s"b$b index-probe") {
        val v = if (b == 0) signed
          else graft.dedup.Dedup.dedupAgainstIndexSigned(spark, signed, idxDir, 64, 16, 3, 0.5)
        v.count(); v
      }
      val (kept, _) = time(s"b$b in-batch dedup") {
        val k = graft.dedup.Dedup.dedupMinhashSigned(vsIndex, 64, 16, 0.5).localCheckpoint()
        k.count(); k
      }
      time(s"b$b kept-write") {
        batch.join(kept.select($"doc_id"), Seq("doc_id"), "left_semi")
          .write.mode("overwrite").parquet(s"$work/kept/b$b")
      }
      time(s"b$b segment-append") {
        graft.dedup.Dedup.appendMinhashSegmentSigned(kept, idxDir, s"b$b", 64, 16, 3)
      }
    }
  }
}

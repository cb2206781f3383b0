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
}

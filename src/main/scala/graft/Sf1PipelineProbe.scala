package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-decade-up scaling probe for the PIPELINE operators (the index
  * shapes have [[Sf1Probe]]): replays ~9 representative dedup / ANN /
  * text / curation / streaming queries — the exact [[SparkEntry.queries]]
  * closures — over a synthesized 10× sf0.1 data dir and prints ONE JSON
  * line with time(sf1)/time(sf0.1) per query. Anything ≫10× flags a
  * superlinear surprise (accidental O(n²), skew cliff) that sf0.1 can't
  * see.
  *
  * Scaling construction (structure-preserving, not row duplication):
  *   - documents ×10: ids shifted per replica; every WORD of replicas
  *     1-9 gets a replica suffix, so intra-replica shingle/dup structure
  *     is preserved exactly while cross-replica Jaccard is 0 — near-dup
  *     pair counts scale linearly like a real 10× corpus, instead of
  *     every doc gaining 9 exact twins (quadratic pair blowup that no
  *     real corpus has).
  *   - embeddings ×10: ids shifted; each replica's vectors circularly
  *     rotated by its replica index — intra-replica cosines are
  *     preserved exactly (same rotation both sides of every dot
  *     product), cross-replica geometry scrambles.
  *   - customer ×10: ids shifted; names get a 4-char replica suffix
  *     ("_iii") whose pairwise distance is 3, so edit-distance-1 pairs
  *     stay within replicas.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain
  * graft.Sf1PipelineProbe (output → bench_notes/r12_sf1_pipeline.json).
  */
object Sf1PipelineProbe {

  private val ProbeQueries = Seq(
    "q_dedup_minhash", "q_dedup_editdist", "q_text_winnow",
    "q_ann_knn_join", "q_text_segdedup_first", "q_decontaminate_fuzzy",
    "q_pipeline_curate3", "q_stream_neardedup", "q_stream_searchingest")

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

    val scratch = "/root/repo/target/graft_scratch/sf1pipe"
    spark.conf.set(graft.index.IndexConf.MetastoreLocation, s"$scratch/metastore")
    // unique basename: SparkEntry.scratchTableDir keys streaming work
    // dirs on the data dir's basename, which must not collide with the
    // real sf0.1 runs
    val bigDir = s"$scratch/sf1pipe_data"
    val marker = new java.io.File(s"$scratch/sf1pipe_data_ready")
    // versioned marker (same protocol as SparkEntryFixtures.scratchTable):
    // bump when the synthesis construction changes, or a stale fixture
    // would silently vouch for ratios the current code never produced
    val fixtureVersion = "sf1pipe.v1"
    val fixtureFresh = marker.exists() &&
      new String(java.nio.file.Files.readAllBytes(marker.toPath), "UTF-8") == fixtureVersion

    if (!fixtureFresh) {
      marker.delete() // a torn build must not leave a vouching marker
      new java.io.File(bigDir).mkdirs()

      def replicas(df: DataFrame)(mk: (DataFrame, Int) => DataFrame): DataFrame =
        (0 until 10).map(i => mk(df, i)).reduce(_.unionAll(_))

      // max over an empty table is NULL — fail with a clear message
      // instead of the opaque NPE a bare getLong(0) would throw
      def spanOf(df: DataFrame, idCol: String, what: String): Long = {
        val r = df.agg(max(col(idCol))).head
        require(!r.isNullAt(0),
          s"empty input: $what under $sfDir has no rows — the probe " +
            "needs non-empty sf0.1 tables to synthesize the 10x corpus")
        r.getLong(0) + 1L
      }

      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val docSpan = spanOf(docs, "doc_id", "documents.parquet")
      replicas(docs) { (d, i) =>
        val txt =
          if (i == 0) $"text"
          else array_join(
            transform(split($"text", " "), w => concat(w, lit(s"_$i"))), " ")
        d.select(($"doc_id" + lit(i * docSpan)).as("doc_id"), txt.as("text"),
          $"lang", $"source", length(txt).cast("long").as("n_chars"))
      }.repartition(40).write.mode("overwrite").parquet(s"$bigDir/documents.parquet")

      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val vecSpan = spanOf(emb, "vec_id", "embeddings.parquet")
      replicas(emb) { (e, i) =>
        val rot =
          if (i == 0) $"embedding"
          else concat(
            slice($"embedding", lit(i + 1), size($"embedding") - lit(i)),
            slice($"embedding", lit(1), lit(i)))
        e.select(($"vec_id" + lit(i * vecSpan)).as("vec_id"),
          rot.as("embedding"), $"label")
      }.repartition(40).write.mode("overwrite").parquet(s"$bigDir/embeddings.parquet")

      val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      val custSpan = spanOf(cust, "c_custkey", "customer.parquet")
      val custCols = cust.columns.toSeq
      replicas(cust) { (c, i) =>
        val nm = if (i == 0) $"c_name" else concat($"c_name", lit(s"_$i$i$i"))
        c.select(custCols.map {
          case "c_custkey" => ($"c_custkey" + lit(i * custSpan)).as("c_custkey")
          case "c_name" => nm.as("c_name")
          case other => col(other)
        }: _*)
      }.repartition(40).write.mode("overwrite").parquet(s"$bigDir/customer.parquet")

      java.nio.file.Files.write(marker.toPath, fixtureVersion.getBytes("UTF-8"))
    }

    def timeOnce(name: String, dir: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def best2(name: String, dir: String): Double =
      math.min(timeOnce(name, dir), timeOnce(name, dir))

    // warm the session (codegen, shuffle machinery) off the books
    timeOnce(ProbeQueries.head, sfDir)

    val rows = ProbeQueries.map { q =>
      val small = best2(q, sfDir)
      val big = best2(q, bigDir)
      val ratio = big / math.max(1e-9, small)
      System.err.println(f"PROBE $q%-24s sf0.1=$small%8.2fs sf1=$big%8.2fs ratio=$ratio%6.2f")
      q -> (small, big, ratio)
    }
    val qJson = rows.map { case (q, (s, b, r)) =>
      f""""$q":{"sf01_sec":$s,"sf1_sec":$b,"ratio":$r%.3f}"""
    }.mkString("{", ",", "}")

    // LENGTH CONTROL for the editdist row: the scaled names carry a
    // 4-char replica suffix, and SymSpell's deletion neighborhood is
    // linear in name length — so the expected sf1/sf0.1 work factor is
    // 10 x (len+4+1)/(len+1), not 10. This control isolates the length
    // term at 1x scale: the SAME 15k customers with every name +4 chars.
    // ratio_expected = 10 x editdist_len_control.ratio.
    val custSmall = spark.read.parquet(s"$sfDir/customer.parquet")
    def edTime(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      graft.dedup.Dedup.editDistancePairs(
        df, $"c_custkey", $"c_name", maxDist = 1).count()
      (System.nanoTime() - t0) / 1e9
    }
    def edBest2(df: DataFrame): Double = math.min(edTime(df), edTime(df))
    val edPlain = edBest2(custSmall)
    val edSuffixed = edBest2(
      custSmall.withColumn("c_name", concat($"c_name", lit("_000"))))
    val edCtl = edSuffixed / math.max(1e-9, edPlain)
    System.err.println(
      f"PROBE editdist_len_control plain=$edPlain%.2fs suffixed=$edSuffixed%.2fs ratio=$edCtl%.2f")
    val nDocs = spark.read.parquet(s"$bigDir/documents.parquet").count()
    val nEmb = spark.read.parquet(s"$bigDir/embeddings.parquet").count()
    println(s"""{"metric":"sf1_pipeline_probe","docs_sf1":$nDocs,""" +
      s""""embeddings_sf1":$nEmb,"queries":$qJson,""" +
      f""""editdist_len_control":{"plain_sec":$edPlain,"suffixed_sec":$edSuffixed,"ratio":$edCtl%.3f},""" +
      s""""sf_input":"$sfDir"}""")
    spark.stop()
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-lines shard EXPORT — the last mile between the curated corpus
  * and a tokenizer/dataloader that consumes `.jsonl.gz` shards: every
  * row serializes to one JSON line (field order = column order, so the
  * lines are deterministic), and rows land in fixed-size chunks of
  * `docsPerShard` consecutive docs per shard key.
  *
  * Scale shape: chunk assignment is [[Packing.packByBudget]] with
  * one-token docs — a per-shard-key window prefix sum (floor(rank/N)),
  * NEVER a global sort; the write is one `partitionBy(shard, chunk)`
  * text write, so a 1000-executor job writes all shards of all sources
  * concurrently. Pick the shard key (source, date, …) so one key's rows
  * fit a task's sort, exactly like packing.
  */
object Export {

  /** Write `df` as gzipped JSON-lines shards under
    * `outDir/shard=<key>/chunk=<n>/…`; chunks hold `docsPerShard`
    * consecutive docs ordered by `order` within each `shard` key (the
    * last chunk of a key is partial). Returns the row count written.
    *
    * `shard`/`chunk` are DIRECTORY columns — they must not collide with
    * a data column name (the data columns all live inside the JSON). */
  def writeJsonlShards(
      df: DataFrame, shard: Column, order: Column, outDir: String,
      docsPerShard: Int): Long = {
    require(docsPerShard >= 1, s"docsPerShard must be >= 1: $docsPerShard")
    // 'shard'/'chunk' are the directory columns; 'pack_id'/'__cum' are
    // claimed by the packing prefix-sum — a data column with any of
    // these names would be silently replaced before serialization
    val reserved = Seq("shard", "chunk", "pack_id", "__cum", "value")
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"column names ${reserved.mkString("'", "', '", "'")} are reserved " +
        s"by the export layout; rename ${clash.mkString("'", "', '", "'")}")
    val dataCols = df.columns.map(col)
    val assigned = Packing.packByBudget(
      df, shard, order, tokens = lit(1L), budget = docsPerShard.toLong)
    // observe counts on the WRITTEN plan — no second scan of the (often
    // expensive) upstream pipeline, and the count is of what landed
    val obs = org.apache.spark.sql.Observation()
    // repartition by (shard, chunk) BEFORE the to_json projection:
    // to_json + gzip are CPU-bound and the per-shard window leaves each
    // shard's whole row set in ONE partition — the rebalance spreads
    // serialization across the cluster and still lands exactly one file
    // per chunk (guide §6). The exchange must sit BELOW the projection
    // (Catalyst won't hoist a Project above a RepartitionByExpression):
    // repartitioning after the select would serialize pre-shuffle in the
    // window layout and ship the bigger JSON strings through the shuffle
    assigned
      .repartition(shard, col("pack_id"))
      .select(to_json(struct(dataCols: _*)).as("value"),
        shard.as("shard"), col("pack_id").as("chunk"))
      .observe(obs, count(lit(1)).as("n"))
      .write.mode("overwrite")
      .partitionBy("shard", "chunk")
      .option("compression", "gzip")
      .text(outDir)
    obs.get("n").asInstanceOf[Long]
  }

  /** Read an exported shard tree back: JSON fields under `ddl` plus the
    * `shard`/`chunk` directory columns (partition discovery appends
    * them). The ROUND TRIP is the correctness contract: read-back rows
    * equal the written rows with their chunk arithmetic. */
  def readJsonlShards(
      spark: SparkSession, dir: String, ddl: String): DataFrame =
    spark.read.schema(StructType.fromDDL(ddl)).json(dir)
}

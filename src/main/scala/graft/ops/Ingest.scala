package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Robust semi-structured ingest — parse a JSON payload column under a
  * target schema with QUARANTINE routing instead of job failure: the
  * crawl/API/log firehose always carries some malformed rows, and at
  * 100 TB a pipeline that dies on row 40-billion (or silently drops the
  * evidence) is operationally broken. Good rows surface parsed; bad
  * rows keep their raw payload for replay after the producer is fixed.
  *
  * Everything is a map-side projection over one `from_json` pass — no
  * shuffle, no second scan: [[parseJsonTagged]] returns ONE DataFrame
  * carrying parsed fields + the routing flag + the raw payload of
  * quarantined rows, so a single write (e.g. partitioned by the flag)
  * lands both streams. The [[parseJson]] pair view is a convenience
  * over it; materialize both sides from one scan via the tagged shape
  * (or checkpoint) rather than running the parse twice. */
object Ingest {

  /** Reserved corrupt-capture field name inside the parse. */
  private val CorruptField = "_graft_corrupt"

  /** Names the tagged shape itself emits (routing flag, replay payload,
    * parse scratch) — a schema field OR input column with one of these
    * would produce duplicate/ambiguous output columns, so fail fast. */
  private val Reserved = Seq("quarantined", "raw", "__graft_p", CorruptField)

  private def requireNamesFree(
      df: DataFrame, schema: StructType, fn: String): Unit = {
    val clash =
      (schema.fieldNames.toSeq ++ df.columns.toSeq).filter(Reserved.contains).distinct
    require(clash.isEmpty,
      s"$fn reserves column names ${Reserved.mkString("'", "', '", "'")}; " +
        s"rename conflicting column(s) ${clash.mkString("'", "', '", "'")} first")
  }

  /** One-pass parse: original columns + one column per `schema` field
    * (null where absent or unparseable) + `quarantined` (true for
    * malformed-JSON or null payloads) + `raw` (the offending payload
    * for quarantined rows, null otherwise — the replay evidence).
    *
    * Field-level semantics are Spark PERMISSIVE `from_json`: a payload
    * that is not valid JSON quarantines the ROW; a valid payload
    * missing a field just nulls that field. */
  def parseJsonTagged(
      df: DataFrame, json: Column, schema: StructType): DataFrame = {
    requireNamesFree(df, schema, "parseJsonTagged")
    require(schema.nonEmpty, "target schema must have at least one field")
    val augmented = schema.add(CorruptField, StringType)
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptField)
    val parsed = df.withColumn("__graft_p", from_json(json, augmented, opts))
    val bad = col(s"__graft_p.$CorruptField").isNotNull || json.isNull
    parsed
      .select((df.columns.map(col) ++
        schema.fieldNames.map(f => col(s"__graft_p.$f").as(f)) ++ Seq(
          bad.as("quarantined"),
          when(bad, json).as("raw"))): _*)
  }

  /** CSV twin of [[parseJsonTagged]] — same one-pass tagged routing via
    * PERMISSIVE `from_csv`. Note the CSV corruption model differs from
    * JSON's: a row quarantines when a field fails its declared TYPE
    * or the row has fewer fields than the schema (PERMISSIVE captures
    * the raw line in both cases) — CSV rows are positional, so a short
    * row is structural damage, unlike JSON's legitimately absent
    * keys. */
  def parseCsvTagged(
      df: DataFrame, csv: Column, schema: StructType): DataFrame = {
    requireNamesFree(df, schema, "parseCsvTagged")
    require(schema.nonEmpty, "target schema must have at least one field")
    val augmented = schema.add(CorruptField, StringType)
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> CorruptField)
    val parsed = df.withColumn("__graft_p", from_csv(csv, augmented, opts))
    val bad = col(s"__graft_p.$CorruptField").isNotNull || csv.isNull
    parsed
      .select((df.columns.map(col) ++
        schema.fieldNames.map(f => col(s"__graft_p.$f").as(f)) ++ Seq(
          bad.as("quarantined"),
          when(bad, csv).as("raw"))): _*)
  }

  /** The routed pair view over [[parseJsonTagged]]: `good` = original
    * columns + parsed fields; `quarantine` = original columns + the raw
    * payload. Both filter the SAME tagged plan — if you collect or
    * write both, checkpoint the tagged frame first (or write the tagged
    * shape partitioned by the flag) to avoid parsing twice. */
  case class Routed(good: DataFrame, quarantine: DataFrame)

  def parseJson(df: DataFrame, json: Column, schema: StructType): Routed = {
    val tagged = parseJsonTagged(df, json, schema)
    Routed(
      good = tagged.filter(!col("quarantined"))
        .drop("quarantined", "raw"),
      quarantine = tagged.filter(col("quarantined"))
        .select(df.columns.map(col) :+ col("raw"): _*))
  }

  /** Outcome of [[ingestJsonFiles]]. */
  case class IngestStats(good: Long, quarantined: Long)

  /** Read an [[ingestJsonFiles]] table with the routing flag typed back
    * to boolean (partition values are stored as path strings). */
  def readIngested(
      spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .withColumn("quarantined", col("quarantined").cast("boolean"))

  /** The raw-file FRONT DOOR: JSON-lines files → one routed parquet
    * table in a single pass. Lines parse under `schema`; the table
    * lands at `outDir` Hive-partitioned by `quarantined` (good rows
    * carry parsed columns, quarantined rows carry the raw line), so ONE
    * write serves both consumers — the trainer reads
    * `quarantined=false`, the replay queue reads `quarantined=true`,
    * and Spark partition pruning keeps either read from touching the
    * other's files. Blank lines are skipped (file padding, not data);
    * the input glob streams through Spark's text source, so nothing is
    * driver-resident. Rerunning overwrites (idempotent batch). */
  def ingestJsonFiles(
      spark: org.apache.spark.sql.SparkSession, inputGlob: String,
      schema: StructType, outDir: String): IngestStats = {
    val lines = spark.read.textFile(inputGlob).toDF("raw_line")
      .filter(length(trim(col("raw_line"))) > 0)
    val tagged = parseJsonTagged(lines, col("raw_line"), schema)
      .drop("raw_line")
    tagged.write.mode("overwrite")
      .partitionBy("quarantined").parquet(outDir)
    val written = spark.read.parquet(outDir)
    // partition values come back as strings (no boolean inference)
    val counts = written
      .groupBy(col("quarantined").cast("boolean").as("__q")).count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    IngestStats(counts.getOrElse(false, 0L), counts.getOrElse(true, 0L))
  }
}

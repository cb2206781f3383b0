/*
 * Shim exposing the handful of Spark-internal APIs the graft index engine
 * needs. Lives under org.apache.spark.sql so that `private[sql]` members are
 * reachable — the same approach the reference takes for its whole codebase
 * (see /root/reference src layout under org.apache.spark.sql.execution);
 * unlike the reference we confine it to this single file.
 */
package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.datasources.{DataSourceStrategy, FileIndex, HadoopFsRelation, InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType

object SparkInternals {

  /** Catalyst predicate expression → data-source filter (None if not
    * translatable). Mirrors what FileSourceStrategy pushes to scans.
    * Nested pushdown ON: a predicate on `payload.user_id` arrives as a
    * dotted attribute — exactly the key the index schema stores for a
    * nested leaf, so the filter fold binds on it directly. Filters whose
    * dotted attribute is NOT indexed are discarded by the caller's
    * indexed-columns check, same as any other unindexed column. */
  def translateFilter(e: Expression): Option[sources.Filter] =
    DataSourceStrategy.translateFilter(e, supportNestedPredicatePushdown = true)

  /** Compile a predicate over the given schema, binding attribute
    * references by (case-insensitive) name. */
  def compilePredicate(exprs: Seq[Expression], schema: StructType): InternalRow => Boolean = {
    if (exprs.isEmpty) return _ => true
    val bound = exprs.reduce(org.apache.spark.sql.catalyst.expressions.And).transform {
      case a: AttributeReference =>
        val idx = schema.fieldNames.indexWhere(_.equalsIgnoreCase(a.name))
        require(idx >= 0, s"partition column ${a.name} not in ${schema.fieldNames.mkString(",")}")
        BoundReference(idx, schema(idx).dataType, schema(idx).nullable)
    }
    val pred = Predicate.create(bound)
    pred.initialize(0)
    row => pred.eval(row)
  }

  def toAttributes(schema: StructType): Seq[Attribute] = DataTypeUtils.toAttributes(schema)

  def wrap(e: Expression): Column = ExpressionUtils.column(e)
  def unwrap(c: Column): Expression = ExpressionUtils.expression(c)

  /** Execute a logical plan as a DataFrame (Dataset.ofRows is
    * private[sql]) — used to run graft SQL command plans from sessions
    * whose parser extension is not installed. */
  def runPlan(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  def partitionDirectory(values: InternalRow, files: Array[FileStatus]): PartitionDirectory =
    PartitionDirectory(values, files)

  /** Pre-wrapped (possibly lazy) files seq — no per-file copy. */
  def partitionDirectory(
      values: InternalRow,
      files: Seq[org.apache.spark.sql.execution.datasources.FileStatusWithMetadata])
      : PartitionDirectory =
    PartitionDirectory(values, files)

  /** Build a DataFrame over a custom FileIndex backed by the given file
    * format ("parquet" | "orc") — the relation assembly the reference does
    * at IndexedDataSource.scala:80-86, generalized across sources. */
  def fsRelation(
      spark: SparkSession,
      location: FileIndex,
      partitionSchema: StructType,
      dataSchema: StructType,
      options: Map[String, String],
      source: String): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val fileFormat = source match {
      case "orc" => new org.apache.spark.sql.execution.datasources.orc.OrcFileFormat()
      case _ => new ParquetFileFormat()
    }
    val relation = HadoopFsRelation(
      location = location,
      partitionSchema = partitionSchema,
      dataSchema = dataSchema.asNullable,
      bucketSpec = None,
      fileFormat = fileFormat,
      options = options)(classic)
    classic.baseRelationToDataFrame(relation)
  }

  def parquetRelation(
      spark: SparkSession,
      location: FileIndex,
      partitionSchema: StructType,
      dataSchema: StructType,
      options: Map[String, String]): DataFrame =
    fsRelation(spark, location, partitionSchema, dataSchema, options, "parquet")

  /** Spark StructType of an ORC file schema (executor-safe pure
    * conversion). */
  def orcSparkSchema(td: org.apache.orc.TypeDescription): StructType =
    org.apache.spark.sql.execution.datasources.orc.OrcUtils.toCatalystSchema(td)

  /** Driver-side file listing + Hive-style partition discovery for a table
    * root, via Spark's own InMemoryFileIndex. Returns (partitionSchema,
    * Seq[(partitionValues, partitionValueStrings, files)]). */
  def discoverTable(spark: SparkSession, root: Path)
      : (StructType, Seq[(InternalRow, Seq[FileStatus])]) =
    discoverTable(spark, Seq(root))

  /** Multi-root listing + partition discovery: InMemoryFileIndex treats
    * every root as a partition-discovery base path, so `k=v` layouts
    * under each root merge into one partition spec (files of equal
    * tuples across roots share a PartitionDirectory). */
  def discoverTable(spark: SparkSession, roots: Seq[Path])
      : (StructType, Seq[(InternalRow, Seq[FileStatus])]) = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val idx = new InMemoryFileIndex(classic, roots, Map.empty, None)
    val partitionSchema = idx.partitionSpec().partitionColumns
    val dirs = idx.listFiles(Nil, Nil).map { pd =>
      (pd.values, pd.files.map(_.fileStatus))
    }
    (partitionSchema, dirs)
  }

  /** Hive path-segment unescape (`%xx` decoding) — executor-safe public
    * bridge to Spark's own implementation, so distributed listings parse
    * `k=v` dirs exactly as InMemoryFileIndex would. */
  def unescapePathName(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(s)

  /** Block locations of a listed file (present when the listing produced
    * LocatedFileStatus — e.g. HDFS; empty on plain FileStatus). */
  def blockLocations(f: FileStatus): Seq[graft.index.BlockLoc] = f match {
    case l: org.apache.hadoop.fs.LocatedFileStatus =>
      l.getBlockLocations.toSeq.map(b =>
        graft.index.BlockLoc(b.getOffset, b.getLength, b.getHosts.toSeq.filterNot(_ == "localhost")))
    case _ => Nil
  }

  /** Merge two file schemas (type widening + new-field append), preserving
    * per-field metadata from the left/first occurrence — the reference's
    * ParquetSchemaUtils.merge (:98-124) via Spark's own StructType.merge. */
  def mergeSchemas(a: StructType, b: StructType): StructType = a.merge(b)

  /** Spark StructType of one parquet footer: prefer the Spark schema JSON
    * the writer persisted in key-value metadata (field metadata
    * round-trips), else convert the parquet MessageType. Executor-safe. */
  def footerSparkSchema(
      kvMeta: java.util.Map[String, String],
      msg: org.apache.parquet.schema.MessageType): StructType = {
    Option(kvMeta.get("org.apache.spark.sql.parquet.row.metadata"))
      .flatMap { j =>
        scala.util.Try(
          org.apache.spark.sql.types.DataType.fromJson(j).asInstanceOf[StructType]).toOption
      }
      .getOrElse(
        new org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter()
          .convert(msg))
  }

  /** Resolve a catalog table to (provider, location path). */
  def catalogTableInfo(spark: SparkSession, tableName: String): (String, Path) = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ident = classic.sessionState.sqlParser.parseTableIdentifier(tableName)
    val meta = classic.sessionState.catalog.getTableMetadata(ident)
    val provider = meta.provider.getOrElse("")
    (provider, new Path(meta.location))
  }
}

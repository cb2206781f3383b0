package graft.index

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.graft.SparkInternals

/** User-facing fluent API, drop-in shaped like the reference
  * (package.scala:25-43 + DataFrameIndexManager.scala):
  *
  * {{{
  * import graft.index.implicits._
  * spark.index.create.mode("overwrite").indexBy("id", "code").parquet(path)
  * spark.index.exists.parquet(path)
  * val df = spark.index.parquet(path)          // pruned scans
  * spark.index.delete.parquet(path)
  * spark.index.table("catalogTable")           // catalog tables
  * }}}
  */
object implicits {
  implicit class GraftIndexSession(val spark: SparkSession) {
    def index: IndexManager = new IndexManager(spark)
  }
}

/** Java-friendly entry point (reference com.github.lightcopy.QueryContext,
  * package.scala:25-35): `new QueryContext(spark).index()` — no implicits,
  * no Scala default arguments on the call path. */
class QueryContext(spark: SparkSession) {
  def index(): IndexManager = new IndexManager(spark)
}

class IndexManager(spark: SparkSession) {

  // lazy rule registration on first `spark.index` touch, mirroring the
  // reference's strategy registration (package.scala:28-31): sessions
  // without GraftExtensions still get metadata-only aggregates and (if
  // enabled) auto index substitution
  org.apache.spark.sql.graft.GraftRules.ensure(spark)

  private var extraOptions: Map[String, String] = Map.empty
  private var sourceFormat: String = Sources.Parquet

  /** Source format selector (reference DataFrameIndexManager.format):
    * parquet or orc. The reference ships parquet only behind its
    * extensible MetastoreSupport trait; orc exercises the same axis. */
  def format(source: String): IndexManager = {
    sourceFormat = Sources.normalize(source)
    this
  }

  /** format(...).load(path) — reference DataFrameIndexManager.load. */
  def load(path: String): DataFrame =
    IndexedDataSource.load(spark, path, Metastore.Dataspace, extraOptions,
      expectedSource = Some(sourceFormat))

  /** Multi-root/glob load (extension; the reference resolves one
    * non-glob dir): the same resolved root set as at create time. */
  def load(paths: String*): DataFrame =
    IndexedDataSource.load(spark, paths.toSeq, Metastore.Dataspace, extraOptions,
      expectedSource = Some(sourceFormat))

  /** Per-call options (reference DataFrameIndexManager.option/options,
    * DataFrameIndexManager.scala:29-128): `spark.sql.index.*` keys
    * override the session conf for this manager's loads/creates; other
    * keys flow to the underlying parquet relation. */
  def option(key: String, value: String): IndexManager = { extraOptions += key -> value; this }
  def option(key: String, value: Boolean): IndexManager = option(key, value.toString)
  def option(key: String, value: Long): IndexManager = option(key, value.toString)
  def option(key: String, value: Double): IndexManager = option(key, value.toString)
  def options(opts: Map[String, String]): IndexManager = { extraOptions ++= opts; this }
  /** Java-friendly overload. */
  def options(opts: java.util.Map[String, String]): IndexManager = {
    import scala.jdk.CollectionConverters._
    options(opts.asScala.toMap)
  }

  def create: CreateIndexCommand =
    new CreateIndexCommand(spark, extraOptions, sourceFormat)
  def exists: ExistsIndexCommand = new ExistsIndexCommand(spark)
  def delete: DeleteIndexCommand = new DeleteIndexCommand(spark)
  def refresh: RefreshIndexCommand = new RefreshIndexCommand(spark, extraOptions)

  /** Load an indexed Parquet table as a DataFrame with index-driven
    * pruning. */
  def parquet(path: String): DataFrame =
    IndexedDataSource.load(spark, path, Metastore.Dataspace, extraOptions,
      expectedSource = Some(Sources.Parquet))

  /** Multi-root/glob variant: load the index created over this exact
    * resolved root set. */
  def parquet(paths: String*): DataFrame =
    IndexedDataSource.load(spark, paths.toSeq, Metastore.Dataspace, extraOptions,
      expectedSource = Some(Sources.Parquet))

  /** Java/py4j-friendly multi-root overload. */
  def parquet(paths: Array[String]): DataFrame = parquet(paths.toSeq: _*)

  /** Load an indexed ORC table as a DataFrame with index-driven pruning. */
  def orc(path: String): DataFrame =
    IndexedDataSource.load(spark, path, Metastore.Dataspace, extraOptions,
      expectedSource = Some(Sources.Orc))

  /** Multi-root/glob ORC variant. */
  def orc(paths: String*): DataFrame =
    IndexedDataSource.load(spark, paths.toSeq, Metastore.Dataspace, extraOptions,
      expectedSource = Some(Sources.Orc))

  /** Java/py4j-friendly multi-root overload. */
  def orc(paths: Array[String]): DataFrame = orc(paths.toSeq: _*)

  /** Load an indexed catalog table (format from the table's provider). */
  def table(tableName: String): DataFrame = {
    val (provider, location) = requireSupportedTable(spark, tableName)
    IndexedDataSource.load(spark, location.toString, Metastore.CatalogDataspace,
      extraOptions, expectedSource = Some(provider))
  }

  private[index] def requireSupportedTable(
      spark: SparkSession, tableName: String): (String, org.apache.hadoop.fs.Path) = {
    val (provider, location) = SparkInternals.catalogTableInfo(spark, tableName)
    if (!Sources.All.exists(provider.equalsIgnoreCase)) {
      throw new UnsupportedOperationException(
        s"table $tableName has provider $provider; only " +
          s"${Sources.All.mkString("/")} tables can be indexed " +
          "(reference CatalogTableSource.scala:60-62 restricts to parquet)")
    }
    (provider.toLowerCase, location)
  }
}

class CreateIndexCommand(
    spark: SparkSession,
    initialOptions: Map[String, String] = Map.empty,
    sourceFormat: String = Sources.Parquet) {
  private var saveMode: SaveMode = SaveMode.ErrorIfExists
  private var columns: Seq[String] = Nil
  private var all: Boolean = false
  private var extraOptions: Map[String, String] = initialOptions

  def option(key: String, value: String): CreateIndexCommand = { extraOptions += key -> value; this }
  def options(opts: Map[String, String]): CreateIndexCommand = { extraOptions ++= opts; this }

  def mode(m: SaveMode): CreateIndexCommand = { saveMode = m; this }
  def mode(m: String): CreateIndexCommand = {
    saveMode = m.toLowerCase match {
      case "overwrite" => SaveMode.Overwrite
      case "append" => SaveMode.Append
      case "ignore" => SaveMode.Ignore
      case "error" | "errorifexists" | "default" => SaveMode.ErrorIfExists
      case other => throw new IllegalArgumentException(s"unknown save mode: $other")
    }
    this
  }

  def indexBy(cols: String*): CreateIndexCommand = { columns = cols; all = false; this }
  /** Java-friendly overload (reference DataFrameIndexManager.scala:184-209). */
  def indexBy(cols: Array[String]): CreateIndexCommand = indexBy(cols.toSeq: _*)
  def indexByColumns(cols: Column*): CreateIndexCommand =
    indexBy(cols.map(c => SparkInternals.unwrap(c).asInstanceOf[
      org.apache.spark.sql.catalyst.expressions.NamedExpression].name): _*)
  def indexByAll(): CreateIndexCommand = { columns = Nil; all = true; this }

  def parquet(path: String): Unit =
    IndexedDataSource.createIndex(
      spark, path, Metastore.Dataspace, saveMode, columns, all, extraOptions,
      Sources.Parquet)

  /** Multi-root/glob create: ONE index over the union of the resolved
    * roots (extension; the reference resolves one non-glob dir). */
  def parquet(paths: String*): Unit =
    IndexedDataSource.createIndex(
      spark, paths.toSeq, Metastore.Dataspace, saveMode, columns, all, extraOptions,
      Sources.Parquet)

  /** Java/py4j-friendly multi-root overload. */
  def parquet(paths: Array[String]): Unit = parquet(paths.toSeq: _*)

  def orc(path: String): Unit =
    IndexedDataSource.createIndex(
      spark, path, Metastore.Dataspace, saveMode, columns, all, extraOptions,
      Sources.Orc)

  /** Multi-root/glob ORC create. */
  def orc(paths: String*): Unit =
    IndexedDataSource.createIndex(
      spark, paths.toSeq, Metastore.Dataspace, saveMode, columns, all, extraOptions,
      Sources.Orc)

  /** format(...)-selected build over a path (reference
    * DataFrameIndexManager's createIndex path). */
  def save(path: String): Unit =
    IndexedDataSource.createIndex(
      spark, path, Metastore.Dataspace, saveMode, columns, all, extraOptions,
      sourceFormat)

  def table(tableName: String): Unit = {
    val (provider, location) =
      new IndexManager(spark).requireSupportedTable(spark, tableName)
    IndexedDataSource.createIndex(
      spark, location.toString, Metastore.CatalogDataspace, saveMode, columns, all,
      extraOptions, provider)
  }
}

/** Incremental refresh of an existing index after table files changed —
  * stats/sketches are (re)built for the delta only (no reference
  * counterpart: the reference rejects Append and requires a full
  * rebuild). Returns counts of (re-)indexed and dropped files. */
class RefreshIndexCommand(spark: SparkSession, initialOptions: Map[String, String] = Map.empty) {
  private var extraOptions: Map[String, String] = initialOptions

  def option(key: String, value: String): RefreshIndexCommand = { extraOptions += key -> value; this }
  def options(opts: Map[String, String]): RefreshIndexCommand = { extraOptions ++= opts; this }

  def parquet(path: String): IndexedDataSource.RefreshStats =
    IndexedDataSource.refreshIndex(spark, path, Metastore.Dataspace, extraOptions)

  /** Multi-root/glob refresh: new FILES under the frozen root set. */
  def parquet(paths: String*): IndexedDataSource.RefreshStats =
    IndexedDataSource.refreshIndex(spark, paths.toSeq, Metastore.Dataspace, extraOptions)

  /** Java/py4j-friendly multi-root overload. */
  def parquet(paths: Array[String]): IndexedDataSource.RefreshStats =
    parquet(paths.toSeq: _*)

  /** Refresh an ORC-table index (the format is read from the index
    * metadata, so this is the parquet terminal's path-addressed twin). */
  def orc(path: String): IndexedDataSource.RefreshStats = parquet(path)

  def table(tableName: String): IndexedDataSource.RefreshStats = {
    val (_, location) = new IndexManager(spark).requireSupportedTable(spark, tableName)
    IndexedDataSource.refreshIndex(
      spark, location.toString, Metastore.CatalogDataspace, extraOptions)
  }
}

class ExistsIndexCommand(spark: SparkSession) {
  def parquet(path: String): Boolean =
    IndexedDataSource.existsIndex(spark, path, Metastore.Dataspace)
  /** Multi-root/glob exists. */
  def parquet(paths: String*): Boolean =
    IndexedDataSource.existsIndex(spark, paths.toSeq, Metastore.Dataspace)

  /** Java/py4j-friendly multi-root overload. */
  def parquet(paths: Array[String]): Boolean = parquet(paths.toSeq: _*)
  def orc(path: String): Boolean = parquet(path)
  def table(tableName: String): Boolean = {
    val (_, location) = new IndexManager(spark).requireSupportedTable(spark, tableName)
    IndexedDataSource.existsIndex(spark, location.toString, Metastore.CatalogDataspace)
  }
}

class DeleteIndexCommand(spark: SparkSession) {
  def parquet(path: String): Unit =
    IndexedDataSource.deleteIndex(spark, path, Metastore.Dataspace)
  /** Multi-root/glob delete. */
  def parquet(paths: String*): Unit =
    IndexedDataSource.deleteIndex(spark, paths.toSeq, Metastore.Dataspace)

  /** Java/py4j-friendly multi-root overload. */
  def parquet(paths: Array[String]): Unit = parquet(paths.toSeq: _*)
  def orc(path: String): Unit = parquet(path)
  def table(tableName: String): Unit = {
    val (_, location) = new IndexManager(spark).requireSupportedTable(spark, tableName)
    IndexedDataSource.deleteIndex(spark, location.toString, Metastore.CatalogDataspace)
  }
}

package graft.index

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.trees.Origin
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructType}

/** SQL DDL surface for the index — pure-SQL pipelines (spark.sql,
  * JDBC/Thrift, notebooks) get the same four verbs the Scala/Java/Python
  * builders expose, with no Scala imports:
  *
  * {{{
  *   CREATE INDEX ON PARQUET '/data/events' (user_id, kind)
  *   CREATE INDEX ON ORC '/data/legacy_events' (user_id)
  *   CREATE OR REPLACE INDEX ON TABLE sales (s_store_id)
  *       OPTIONS ('spark.sql.index.parquet.filter.type'='dict')
  *   CREATE INDEX IF NOT EXISTS ON PARQUET '/data/events' (user_id)
  *   SHOW INDEX ON PARQUET '/data/events'
  *   REFRESH INDEX ON PARQUET '/data/events'
  *   DROP INDEX [IF EXISTS] ON PARQUET '/data/events'
  * }}}
  *
  * Injected by [[graft.GraftExtensions]] as a delegating
  * `ParserInterface`: statements matching the graft `... INDEX ... ON
  * (PARQUET|TABLE) ...` shape parse here into `LeafRunnableCommand`s
  * (driver-side metadata actions, the idiomatic Spark home for DDL —
  * same execution path as Spark's own `CREATE TABLE`); everything else
  * delegates to Spark's parser untouched, including Spark's DSv2
  * `CREATE INDEX ON <table>` form, which never mentions PARQUET paths or
  * our TABLE spelling with no index name.
  *
  * The reference exposes Scala/Java/Python builders only
  * (DataFrameIndexManager.scala:34-226); the SQL surface is this repo's
  * extension, mapping 1:1 onto the same `IndexedDataSource` entry points
  * so semantics (SaveMode matrix, catalog dataspace, option overrides)
  * cannot drift from the programmatic API.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    parseGraftPlan(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  /** An index target: a filesystem path in a named format (parquet/orc)
    * or a catalog table (format from its provider). */
  sealed trait Target
  final case class PathTarget(source: String, path: String) extends Target
  final case class TableTarget(name: String) extends Target

  // Statement shapes. A trailing semicolon is tolerated everywhere; the
  // path is a single-quoted string ('' escapes a quote, SQL-style);
  // columns are plain or backquoted identifiers.
  private val TargetRe = """(?:(parquet|orc)\s*'((?:[^']|'')*)'|table\s+([\w.`]+))"""
  private val OptionsRe =
    """(?:\s+options\s*\(\s*((?:'(?:[^']|'')*'\s*=\s*'(?:[^']|'')*'\s*,?\s*)+)\))?"""

  private val CreateRe =
    ("""(?is)^\s*create\s+(or\s+replace\s+)?index\s+(if\s+not\s+exists\s+)?on\s+""" +
      TargetRe + """\s*\(\s*([^)]+?)\s*\)""" + OptionsRe + """\s*;?\s*$""").r
  private val DropRe =
    ("""(?is)^\s*drop\s+index\s+(if\s+exists\s+)?on\s+""" + TargetRe + """\s*;?\s*$""").r
  private val RefreshRe =
    ("""(?is)^\s*refresh\s+index\s+on\s+""" + TargetRe + OptionsRe + """\s*;?\s*$""").r
  private val ShowRe =
    ("""(?is)^\s*show\s+index\s+on\s+""" + TargetRe + """\s*;?\s*$""").r
  // MERGE over a KEYED parquet table (graft.ops.Upsert layout — paths
  // only; Spark's own `MERGE INTO <table>` never mentions PARQUET and
  // always delegates). The source is a parenthesized query or a
  // table/view name; key column must match the table's pinned
  // _index_spec, from which the bucket count is derived.
  private val MergeRe =
    ("""(?is)^\s*merge\s+into\s+parquet\s*'((?:[^']|'')*)'\s+using\s+""" +
      """(?:\(\s*(.+)\s*\)|([\w.`]+))\s+on\s+key\s+`?([\w.]+)`?\s*;?\s*$""").r
  // small-file compaction / crash recovery over a path-addressed table
  // (neither verb exists in stock Spark SQL; VACUUM requires our
  // PARQUET/ORC '<path>' spelling so Delta-style `VACUUM tbl` delegates)
  private val CompactRe =
    ("""(?is)^\s*compact\s+(parquet|orc)\s*'((?:[^']|'')*)'""" + OptionsRe +
      """\s*;?\s*$""").r
  private val VacuumRe =
    """(?is)^\s*vacuum\s+(?:parquet|orc)\s*'((?:[^']|'')*)'\s*;?\s*$""".r

  /** Does the text LOOK like a graft index statement? Used so that a
    * malformed graft statement raises a graft parse error instead of
    * delegating into a baffling Spark one. Spark's own DSv2
    * `CREATE INDEX idx ON tbl` carries an index NAME before ON and never
    * matches, because this requires `index on (parquet|table)`. */
  private val ShapeRe =
    """(?is)^\s*(?:create\s+(?:or\s+replace\s+)?index|drop\s+index|refresh\s+index|show\s+index)\s+(?:if\s+(?:not\s+)?exists\s+)?on\s+(?:parquet|orc|table)\b.*""".r
  private val MergeShapeRe = """(?is)^\s*merge\s+into\s+parquet\b.*""".r

  private def unquote(s: String): String = s.replace("''", "'")

  private def target(src: String, path: String, table: String): Target =
    if (path != null) PathTarget(src.toLowerCase, unquote(path))
    else TableTarget(table.replace("`", ""))

  private def columns(s: String): Seq[String] =
    s.split(",").toSeq.map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty)

  private val OptionPairRe = """'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'""".r

  private def options(s: String): Map[String, String] =
    if (s == null) Map.empty
    else OptionPairRe.findAllMatchIn(s).map(m =>
      unquote(m.group(1)) -> unquote(m.group(2))).toMap

  private def fail(sqlText: String, msg: String): Nothing =
    throw new ParseException(Some(sqlText), Origin(),
      "PARSE_SYNTAX_ERROR", Map("error" -> msg, "hint" -> ""))

  /** Some(plan) when `sqlText` is a graft index statement; None → delegate. */
  def parseGraftPlan(sqlText: String): Option[LogicalPlan] = sqlText match {
    case CreateRe(orReplace, ifNotExists, src, path, table, cols, opts) =>
      if (orReplace != null && ifNotExists != null) {
        fail(sqlText, "CREATE INDEX cannot combine OR REPLACE with IF NOT EXISTS")
      }
      val mode =
        if (orReplace != null) "overwrite"
        else if (ifNotExists != null) "ignore"
        else "errorifexists"
      Some(SqlCreateIndex(target(src, path, table), columns(cols), mode, options(opts)))
    case DropRe(ifExists, src, path, table) =>
      Some(SqlDropIndex(target(src, path, table), ifExists != null))
    case RefreshRe(src, path, table, opts) =>
      Some(SqlRefreshIndex(target(src, path, table), options(opts)))
    case ShowRe(src, path, table) =>
      Some(SqlShowIndex(target(src, path, table)))
    case MergeRe(path, query, table, key) =>
      Some(SqlMergeInto(unquote(path), Option(query),
        Option(table).map(_.replace("`", "")), key))
    case CompactRe(src, path, opts) =>
      Some(SqlCompactTable(src.toLowerCase, unquote(path), options(opts)))
    case VacuumRe(path) =>
      Some(SqlVacuumTable(unquote(path)))
    case MergeShapeRe() =>
      fail(sqlText, "malformed graft MERGE statement; expected " +
        "MERGE INTO PARQUET '<keyed-table-path>' USING ((<query>)|<table>) " +
        "ON KEY <column>")
    case ShapeRe() =>
      fail(sqlText, "malformed graft index statement; expected " +
        "CREATE [OR REPLACE] INDEX [IF NOT EXISTS] ON (PARQUET|ORC '<path>'|TABLE <name>) " +
        "(col, ...) [OPTIONS ('k'='v', ...)] | " +
        "DROP INDEX [IF EXISTS] ON <target> | REFRESH INDEX ON <target> " +
        "[OPTIONS (...)] | SHOW INDEX ON <target>")
    case _ => None
  }
}

import GraftSqlParser.{PathTarget, TableTarget, Target}

/** `CREATE [OR REPLACE] INDEX [IF NOT EXISTS] ON <target> (cols) [OPTIONS]`.
  * OR REPLACE → SaveMode.Overwrite, IF NOT EXISTS → Ignore, plain →
  * ErrorIfExists — the builder's own mode matrix. */
case class SqlCreateIndex(
    target: Target, cols: Seq[String], mode: String,
    options: Map[String, String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    target match {
      case PathTarget(src, p) =>
        new IndexManager(spark).format(src).options(options)
          .create.mode(mode).indexBy(cols: _*).save(p)
      case TableTarget(t) =>
        new IndexManager(spark).options(options)
          .create.mode(mode).indexBy(cols: _*).table(t)
    }
    Nil
  }
}

/** `DROP INDEX [IF EXISTS] ON <target>` — delete is already a no-op on a
  * missing index; IF EXISTS additionally suppresses resolution errors on
  * a missing TABLE target. */
case class SqlDropIndex(target: Target, ifExists: Boolean)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    try target match {
      case PathTarget(_, p) => new IndexManager(spark).delete.parquet(p)
      case TableTarget(t) => new IndexManager(spark).delete.table(t)
    } catch { case e: Exception if ifExists => }
    Nil
  }
}

/** `REFRESH INDEX ON <target> [OPTIONS]` — incremental delta refresh;
  * returns one (added_files, removed_files) row. */
case class SqlRefreshIndex(target: Target, options: Map[String, String])
  extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("added_files", LongType, nullable = false)(),
    AttributeReference("removed_files", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val cmd = new IndexManager(spark).options(options).refresh
    val stats = target match {
      case PathTarget(_, p) => cmd.parquet(p)
      case TableTarget(t) => cmd.table(t)
    }
    Seq(Row(stats.addedFiles, stats.removedFiles))
  }
}

/** `MERGE INTO PARQUET '<path>' USING ((<query>)|<table>) ON KEY <col>` —
  * the SQL spelling of [[graft.ops.Upsert.upsertByKey]]: rows whose key
  * matches an update are replaced, new keys insert, only the buckets
  * holding updated keys are rewritten. The bucket count comes from the
  * table's pinned `_index_spec` (the single source of layout truth — a
  * statement cannot drift from the build), the given key must match the
  * pinned one, and the call inherits the API's whole contract: the
  * table lock, the key-uniqueness guard, and the
  * `refreshAfterMaintenance` index-freshness hook. Returns the merge
  * stats row. */
case class SqlMergeInto(
    path: String, usingQuery: Option[String], usingTable: Option[String],
    key: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("touched_buckets", LongType, nullable = false)(),
    AttributeReference("total_buckets", LongType, nullable = false)(),
    AttributeReference("upserted", LongType, nullable = false)(),
    AttributeReference("carried", LongType, nullable = false)())

  private val SpecRe = """keyed-table:v1 key=(.+) buckets=(\d+)""".r

  override def run(spark: SparkSession): Seq[Row] = {
    val stored = graft.ops.IndexSpec.read(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"keyed table at $path carries no _index_spec — MERGE INTO targets " +
          "tables built by writeKeyedTable; a crashed create left unpinned " +
          "data, rebuild with writeKeyedTable(mode = \"overwrite\")"))
    val (storedKey, buckets) = stored match {
      case SpecRe(k, b) => (k, b.toInt)
      case other => throw new IllegalArgumentException(
        s"table at $path is pinned as '$other', not a keyed table — " +
          "MERGE INTO only targets writeKeyedTable layouts")
    }
    require(key.equalsIgnoreCase(storedKey),
      s"MERGE key '$key' does not match the table's pinned key '$storedKey'")
    val updates = usingQuery.map(spark.sql)
      .getOrElse(spark.table(usingTable.get))
    val stats = graft.ops.Upsert.upsertByKey(spark, path, updates, storedKey, buckets)
    Seq(Row(stats.touchedBuckets.toLong, stats.totalBuckets.toLong,
      stats.upserted, stats.carried))
  }
}

/** `COMPACT (PARQUET|ORC) '<path>' [OPTIONS ('smallFileBytes'='...',
  * 'targetFileBytes'='...', 'minFiles'='...')]` — the SQL spelling of
  * [[graft.ops.Layout.compact]]: rewrite runs of small files into
  * target-sized ones per partition leaf, under the table lock, with the
  * crash-safe manifest protocol and the refreshAfterMaintenance hook.
  * Returns the compaction stats row. */
case class SqlCompactTable(source: String, path: String,
    options: Map[String, String]) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("compacted_files", LongType, nullable = false)(),
    AttributeReference("produced_files", LongType, nullable = false)(),
    AttributeReference("bytes_rewritten", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    def long(k: String, dflt: Long): Long =
      options.get(k).map(_.toLong).getOrElse(dflt)
    val stats = graft.ops.Layout.compact(spark, path,
      smallFileBytes = long("smallFileBytes", 32L << 20),
      targetFileBytes = long("targetFileBytes", 128L << 20),
      minFiles = long("minFiles", 2L).toInt,
      source = source)
    Seq(Row(stats.compactedFiles.toLong, stats.producedFiles.toLong,
      stats.bytesRewritten))
  }
}

/** `VACUUM (PARQUET|ORC) '<path>'` — the SQL spelling of
  * [[graft.ops.Layout.vacuum]]: heal interrupted compactions (roll
  * forward/back) and crashed upsert staging dirs; returns the number of
  * items healed. */
case class SqlVacuumTable(path: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("healed", LongType, nullable = false)())
  override def run(spark: SparkSession): Seq[Row] =
    Seq(Row(graft.ops.Layout.vacuum(spark, path).toLong))
}

/** `SHOW INDEX ON <target>` — one row of index metadata (exists=false
  * with NULL details when no index is present). */
case class SqlShowIndex(target: Target) extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("exists", BooleanType, nullable = false)(),
    AttributeReference("table_path", StringType, nullable = false)(),
    AttributeReference("source", StringType)(),
    AttributeReference("indexed_columns", StringType)(),
    AttributeReference("sketch", StringType)(),
    AttributeReference("file_count", LongType)(),
    AttributeReference("total_bytes", LongType)())
  override def run(spark: SparkSession): Seq[Row] = {
    // resolveTableRoots so glob/multi-root targets SHOW the same entry
    // they CREATE (a glob is one path string through the whole surface)
    val (roots, dataspace) = target match {
      case PathTarget(_, p) =>
        (IndexedDataSource.resolveTableRoots(spark, Seq(p)), Metastore.Dataspace)
      case TableTarget(t) =>
        val (_, location) = new IndexManager(spark).requireSupportedTable(spark, t)
        (IndexedDataSource.resolveTableRoots(spark, Seq(location.toString)),
          Metastore.CatalogDataspace)
    }
    val tablePath = roots.mkString(", ")
    val metastore = Metastore(spark)
    if (!metastore.exists(dataspace, roots)) {
      Seq(Row(false, tablePath, null, null, null, null, null))
    } else {
      val (_, meta) = metastore.load(dataspace, roots)
      Seq(Row(true, tablePath, meta.source,
        meta.indexSchema.fieldNames.mkString(","),
        meta.sketchKind.orNull, meta.fileCount, meta.totalBytes))
    }
  }
}

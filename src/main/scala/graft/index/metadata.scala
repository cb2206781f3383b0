package graft.index

import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Driver-side index metadata tree, persisted as versioned JSON at
  * `<indexDir>/metadata.json` (design delta vs the reference's Kryo blob —
  * SURVEY.md §7.1 #4). Shape mirrors the reference's ParquetIndexMetadata
  * (metadata.scala:76-81): table path, schemas, partition spec, per-file
  * per-row-group column statistics. Sketches live in a sibling parquet
  * table (see SketchStore), not inline.
  */
case class IndexMetadata(
    version: Int,
    tablePath: String,
    dataSchema: StructType,
    indexSchema: StructType,
    partitionSchema: StructType,
    sketchKind: Option[String],
    partitions: Seq[PartitionEntry]) {

  def allFiles: Seq[FileEntry] = partitions.flatMap(_.files)
  def indexedColumns: Set[String] = indexSchema.fieldNames.toSet
}

/** One Hive-style partition (or the whole table when unpartitioned —
  * a single entry with no values). Values are stored as SQL-cast strings,
  * None for the null partition. */
case class PartitionEntry(values: Seq[Option[String]], files: Seq[FileEntry])

case class FileEntry(
    path: String,
    size: Long,
    modificationTime: Long,
    blocks: Seq[BlockStats])

object IndexMetadata {
  // v2: sketch table keyed by normalized file path + sorted by (file,
  // column) for pruned query-time reads; v1 indexes must be rebuilt.
  val CurrentVersion = 2

  /** Render a Catalyst-internal partition value as a string (via Cast to
    * string), parse back with [[castFromString]]. */
  def castToString(dt: DataType, v: Any): Option[String] =
    Option(v).map { x =>
      String.valueOf(Cast(Literal(x, dt), StringType, Some("UTC")).eval(null))
    }

  def castFromString(dt: DataType, s: Option[String]): Any =
    s.map { str =>
      Cast(Literal(UTF8String.fromString(str), StringType), dt, Some("UTC")).eval(null)
    }.orNull

  // ---- JSON codec ------------------------------------------------------

  private def canonToJson(v: Any): JValue = v match {
    case l: Long => JObject("l" -> JLong(l))
    case s: String => JObject("s" -> JString(s))
  }

  private def canonFromJson(j: JValue): Any = j match {
    case JObject(fields) =>
      fields.head match {
        case ("l", JLong(l)) => l
        case ("l", JInt(i)) => i.toLong
        case ("s", JString(s)) => s
        case other => throw new IllegalArgumentException(s"bad canon json $other")
      }
    case other => throw new IllegalArgumentException(s"bad canon json $other")
  }

  private def statsToJson(st: ColumnStats): JValue = JObject(
    "min" -> st.min.map(canonToJson).getOrElse(JNothing),
    "max" -> st.max.map(canonToJson).getOrElse(JNothing),
    "nullCount" -> st.nullCount.map(JLong(_): JValue).getOrElse(JNothing))

  private def statsFromJson(j: JValue): ColumnStats = ColumnStats(
    min = (j \ "min").toOption.map(canonFromJson),
    max = (j \ "max").toOption.map(canonFromJson),
    nullCount = (j \ "nullCount").toOption.map {
      case JLong(l) => l
      case JInt(i) => i.toLong
      case other => throw new IllegalArgumentException(s"bad nullCount $other")
    })

  private def blockToJson(b: BlockStats): JValue = JObject(
    "rowCount" -> JLong(b.rowCount),
    "columns" -> JObject(b.columns.toList.map { case (k, v) => k -> statsToJson(v) }))

  private def blockFromJson(j: JValue): BlockStats = BlockStats(
    rowCount = (j \ "rowCount") match {
      case JLong(l) => l
      case JInt(i) => i.toLong
      case other => throw new IllegalArgumentException(s"bad rowCount $other")
    },
    columns = (j \ "columns") match {
      case JObject(fields) => fields.map { case (k, v) => k -> statsFromJson(v) }.toMap
      case _ => Map.empty
    })

  private def fileToJson(f: FileEntry): JValue = JObject(
    "path" -> JString(f.path),
    "size" -> JLong(f.size),
    "modificationTime" -> JLong(f.modificationTime),
    "blocks" -> JArray(f.blocks.toList.map(blockToJson)))

  private def fileFromJson(j: JValue): FileEntry = FileEntry(
    path = (j \ "path").asInstanceOf[JString].s,
    size = jlong(j \ "size"),
    modificationTime = jlong(j \ "modificationTime"),
    blocks = (j \ "blocks").asInstanceOf[JArray].arr.map(blockFromJson))

  private def jlong(j: JValue): Long = j match {
    case JLong(l) => l
    case JInt(i) => i.toLong
    case other => throw new IllegalArgumentException(s"expected long, got $other")
  }

  def toJsonString(m: IndexMetadata): String = {
    val j = JObject(
      "version" -> JInt(m.version),
      "tablePath" -> JString(m.tablePath),
      "dataSchema" -> JString(m.dataSchema.json),
      "indexSchema" -> JString(m.indexSchema.json),
      "partitionSchema" -> JString(m.partitionSchema.json),
      "sketchKind" -> m.sketchKind.map(JString(_): JValue).getOrElse(JNothing),
      "partitions" -> JArray(m.partitions.toList.map { p =>
        JObject(
          "values" -> JArray(p.values.toList.map(_.map(JString(_): JValue).getOrElse(JNull))),
          "files" -> JArray(p.files.toList.map(fileToJson)))
      }))
    JsonMethods.compact(JsonMethods.render(j))
  }

  def fromJsonString(s: String): IndexMetadata = {
    val j = JsonMethods.parse(s)
    val version = (j \ "version") match {
      case JInt(i) => i.toInt
      case JLong(l) => l.toInt
      case other => throw new IllegalArgumentException(s"bad version $other")
    }
    require(version == CurrentVersion, s"unsupported index metadata version $version")
    IndexMetadata(
      version = version,
      tablePath = (j \ "tablePath").asInstanceOf[JString].s,
      dataSchema = DataType.fromJson((j \ "dataSchema").asInstanceOf[JString].s).asInstanceOf[StructType],
      indexSchema = DataType.fromJson((j \ "indexSchema").asInstanceOf[JString].s).asInstanceOf[StructType],
      partitionSchema = DataType.fromJson((j \ "partitionSchema").asInstanceOf[JString].s).asInstanceOf[StructType],
      sketchKind = (j \ "sketchKind").toOption.collect { case JString(k) => k },
      partitions = (j \ "partitions").asInstanceOf[JArray].arr.map { p =>
        PartitionEntry(
          values = (p \ "values").asInstanceOf[JArray].arr.map {
            case JNull => None
            case JString(v) => Some(v)
            case other => throw new IllegalArgumentException(s"bad partition value $other")
          },
          files = (p \ "files").asInstanceOf[JArray].arr.map(fileFromJson))
      })
  }
}

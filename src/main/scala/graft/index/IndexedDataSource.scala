package graft.index

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.graft.{GraftFileIndex, SparkInternals}
import org.apache.spark.sql.types.{StructField, StructType}

/** Index lifecycle: create / exists / delete / load for a Parquet table
  * path or catalog table. The reference's IndexedDataSource.scala +
  * ParquetMetastoreSupport.scala re-expressed Spark-first:
  *   - file listing + partition discovery via InMemoryFileIndex;
  *   - min/max/null statistics from footers (metadata-only job);
  *   - sketches via one DataFrame aggregation;
  *   - pruning lives in [[GraftFileIndex.listFiles]] (no planner strategy).
  */
object IndexedDataSource {

  /** Driver residency of the LAST distributed listing+diff run: (max
    * directory rows collected at any level, partition tuples collected,
    * added file refs collected). The O(dirs + partitions + delta) claim
    * made measurable — Bench and the scale e2e assert these stay orders
    * of magnitude under the file count. */
  @volatile private[graft] var lastListingResidency: Option[(Long, Long, Long)] = None

  /** Telemetry of the LAST manifest-guided refresh listing:
    * (manifest dirs probed, dirs re-listed [changed+new], dirs deleted,
    * dirs skipped as unchanged). None when the manifest tier didn't run
    * (first refresh, conf off, or unreadable manifest). */
  @volatile private[graft] var lastManifestStats: Option[(Long, Long, Long, Long)] = None



  def resolveTablePath(spark: SparkSession, path: String): Path = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"table path does not exist: $path")
    fs.makeQualified(p)
  }

  /** Manifest-tier engagement for a root set: "auto" engages only when
    * EVERY root lives on a scheme with real directory mtimes
    * (IndexConf.refreshDirManifestSchemes — HDFS-family by default).
    * Object stores (s3a/gs/...) have synthetic directories whose mtime
    * never moves when files land, so an auto-engaged probe there would
    * report "unchanged" forever and refresh would silently stop
    * indexing new data; they must opt in with "true". Local file:// is
    * excluded too — the parallel-statx walk already beats the tier's
    * read/probe/rewrite there. */
  private def manifestEnabled(conf: IndexConf, rootStrs: Seq[String]): Boolean =
    conf.refreshDirManifest match {
      case "true" => true
      case "false" => false
      case _ =>
        val allowed = conf.refreshDirManifestSchemes
        rootStrs.nonEmpty && rootStrs.forall { r =>
          val i = r.indexOf(':')
          i > 0 && allowed.contains(r.substring(0, i).toLowerCase)
        }
    }

  /** Hadoop glob metacharacters (GlobFilter's alphabet). */
  private def isGlob(s: String): Boolean =
    s.exists(c => "{}[]*?\\".indexOf(c) >= 0)

  /** Resolve path specs — concrete dirs/files, globs, or several of
    * either — to the SORTED, deduplicated set of qualified non-glob
    * roots (the reference resolves exactly one non-glob dir,
    * IndexedDataSource.scala:173-177; multi-root and glob tables are a
    * deliberate extension — same index machinery, several listing
    * roots). The sort makes the set canonical, so the same spec always
    * lands on the same metastore entry. Nested roots are rejected: the
    * outer root's listing already contains the inner's files, so the
    * index would double-count them. */
  def resolveTableRoots(spark: SparkSession, paths: Seq[String]): Seq[Path] = {
    require(paths.nonEmpty, "at least one table path required")
    val hconf = spark.sparkContext.hadoopConfiguration
    val roots = paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(hconf)
      if (isGlob(p)) {
        val hits = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Nil)
        require(hits.nonEmpty, s"glob matched nothing: $p")
        hits.map(st => fs.makeQualified(st.getPath))
      } else {
        require(fs.exists(hp), s"table path does not exist: $p")
        Seq(fs.makeQualified(hp))
      }
    }.distinct.sortBy(_.toString)
    val set = roots.map(_.toString).toSet
    roots.foreach { r =>
      var p = r.getParent
      while (p != null) {
        require(!set.contains(p.toString),
          s"table roots must not nest: $p contains $r")
        p = p.getParent
      }
    }
    roots
  }

  /** Build and persist the index (reference flow §3.1). `options` are
    * per-call `spark.sql.index.*` overrides from the fluent API. */
  def createIndex(
      spark: SparkSession,
      path: String,
      dataspace: String,
      mode: SaveMode,
      columns: Seq[String],
      indexAll: Boolean,
      options: Map[String, String] = Map.empty,
      source: String = Sources.Parquet): Unit =
    createIndex(spark, Seq(path), dataspace, mode, columns, indexAll, options, source)

  /** Multi-root/glob create: the resolved root SET gets one metastore
    * entry; listing, stats and pruning treat the union of roots as one
    * table. */
  def createIndex(
      spark: SparkSession,
      paths: Seq[String],
      dataspace: String,
      mode: SaveMode,
      columns: Seq[String],
      indexAll: Boolean,
      options: Map[String, String],
      source: String): Unit = {
    val src = Sources.normalize(source)
    val conf = IndexConf(spark, options)
    val metastore = new Metastore(spark, conf)
    val roots = resolveTableRoots(spark, paths)

    // Discovery + validation BEFORE the SaveMode transaction, so a bad
    // indexBy() cannot destroy an existing index under Overwrite (the
    // reference validates inside the create body and loses the old index
    // on validation failure — deliberate delta).
    // The manifest seed's capture time is taken BEFORE the listing: the
    // stats build below can run for minutes at manifest scale, and a
    // file committed to an already-listed dir during that window bakes
    // its bump into the recorded dir mtime while being absent from the
    // index. capturedAt <= the listing start keeps such dirs failing the
    // `capturedAt > mtime + slack` skip proof, so the first refresh
    // re-lists them and picks the file up.
    val seedCaptureMs = System.currentTimeMillis()
    val (partitionSchema, partDirs) = SparkInternals.discoverTable(spark, roots)
    val allFiles = partDirs.flatMap(_._2).filter(_.getLen > 0)
    require(allFiles.nonEmpty || partDirs.nonEmpty,
      s"no $src files under ${roots.mkString(", ")}")

    // First-file schema is enough to validate the indexBy() columns (the
    // reference also infers the index schema from the first footer); the
    // persisted data schema is merged across ALL files after the footer
    // job below, so heterogeneous tables keep every column.
    val firstSchema: StructType =
      if (allFiles.isEmpty) StructType(Nil)
      else Sources.read(spark, src, Seq(allFiles.head.getPath.toString)).schema

    val indexSchema = resolveIndexSchema(firstSchema, partitionSchema, columns, indexAll)

    // Same sibling lock refresh holds: a create (overwrite deletes the
    // index dir) cannot interleave with a live refresh of the same index.
    graft.ops.MaintenanceLock.withSiblingLock(
        metastore.fs, metastore.location(dataspace, roots)) {
    metastore.create(dataspace, roots, mode) { indexDir =>
      SketchStore.invalidate(new Path(indexDir, Metastore.SketchDir))
      IndexFilesTable.invalidate(new Path(indexDir, Metastore.FilesDir))
      val numParts =
        if (conf.numPartitions > 0) conf.numPartitions
        else math.min(spark.sparkContext.defaultParallelism * 3,
          spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)

      // (partitionIdx, ref) pairs; block hosts preserved for task
      // locality and for locality-aware scans at query time
      val refs: Seq[(Int, StatisticsBuilder.FileRef)] =
        partDirs.zipWithIndex.flatMap { case ((_, files), idx) =>
          files.filter(_.getLen > 0).map { f =>
            val locs = SparkInternals.blockLocations(f)
            idx -> StatisticsBuilder.FileRef(
              f.getPath.toString, f.getLen, f.getModificationTime,
              blockSize = if (f.getBlockSize > 0) f.getBlockSize else FileEntry.DefaultBlockSize,
              locationsJson = IndexMetadata.locationsToJsonString(locs),
              hosts = locs.flatMap(_.hosts).distinct)
          }
        }

      // footer job writes the per-file stats table executor-side and
      // returns only the merged schema + counts (driver never holds
      // per-file stats — scales to millions of files)
      val summary = StatisticsBuilder.writeFileStats(
        spark, refs, indexSchema, numParts, new Path(indexDir, Metastore.FilesDir),
        source = src)
      val dataSchema = summary.dataSchema.getOrElse(firstSchema)

      // Columns whose footers carried no usable min/max (INT96 timestamps,
      // non-round-tripping truncated binary bounds, ORC NTZ timestamps)
      // get RANGE stats from a full scan of only the affected files —
      // restoring the reference's legacy-table coverage
      // (ParquetIndexReadSupport.scala:64-73).
      if (conf.minMaxFallback && indexSchema.nonEmpty && refs.nonEmpty) {
        StatisticsBuilder.fullScanMinMaxFallback(
          spark, new Path(indexDir, Metastore.FilesDir), indexSchema, source = src)
      }

      // Seed the dir-mtime manifest for incremental refresh listing
      // (only worth maintaining at distributed-listing scale): every
      // ancestor dir of every file, with its CURRENT mtime. The capture
      // time is `seedCaptureMs`, taken BEFORE the listing started (see
      // above), so any dir written during the whole listing-to-probe
      // window fails the refresh skip proof and re-lists.
      val rootStrsM = roots.map(_.toString)
      val manifestDirSet: Option[Seq[String]] =
        if (!manifestEnabled(conf, rootStrsM) ||
            refs.size < conf.distributedPruningThreshold) None
        else {
          val dirSet = scala.collection.mutable.HashSet.empty[String]
          rootStrsM.foreach(dirSet += _)
          refs.foreach { case (_, r) =>
            var p = new Path(r.path).getParent
            while (p != null && !dirSet.contains(p.toString) &&
                rootStrsM.exists(rt =>
                  p.toString == rt || p.toString.startsWith(rt + "/"))) {
              dirSet += p.toString
              p = p.getParent
            }
          }
          // a roots-only manifest (flat layout) can never skip a dir
          if (dirSet.size <= rootStrsM.size) None else Some(dirSet.toSeq)
        }
      manifestDirSet.foreach { dirsFound =>
        val nowMs = seedCaptureMs
        val dl = dirsFound.sorted
        val slices = math.max(1,
          math.min(spark.sparkContext.defaultParallelism * 2, dl.size))
        val confBcM = spark.sparkContext.broadcast(
          new org.apache.spark.util.SerializableConfiguration(
            spark.sparkContext.hadoopConfiguration))
        val probed = spark.sparkContext.parallelize(dl, slices).flatMap { d =>
          try {
            val st = new Path(d).getFileSystem(confBcM.value.value)
              .getFileStatus(new Path(d))
            Iterator.single((d, st.getModificationTime, nowMs))
          } catch { case _: java.io.IOException => Iterator.empty }
        }.collect() // O(dirs) — same class as the refresh walk's frontier
        import spark.implicits._
        probed.toSeq.toDF("dir", "mtime", "capturedAt")
          .coalesce(1).write.mode("overwrite")
          .parquet(new Path(indexDir, Metastore.DirsDir).toString)
      }

      val sketchKind = if (conf.filterEnabled && indexSchema.nonEmpty) Some(conf.filterType) else None
      sketchKind.foreach { kind =>
        // Sketches cover a whole file, so size blooms by the largest
        // per-file row SUM, not the largest single row group — a
        // multi-row-group file would otherwise get an undersized bloom
        // (sound, but higher FPP → weaker pruning).
        StatisticsBuilder.buildSketches(
          spark, allFiles.map(_.getPath.toString), indexSchema, kind,
          expectedItems = math.max(4096L, summary.maxFileRows),
          new Path(indexDir, Metastore.SketchDir), source = src)
      }

      metastore.writeMetadata(indexDir, IndexMetadata(
        // the LOWEST version describing this schema, so indexes without
        // new-domain fields stay readable by older binaries
        version = IndexMetadata.versionFor(indexSchema, roots.size > 1),
        tablePath = roots.head.toString,
        tablePaths = if (roots.size > 1) roots.map(_.toString) else Nil,
        dataSchema = dataSchema,
        indexSchema = indexSchema,
        partitionSchema = partitionSchema,
        sketchKind = sketchKind,
        source = src,
        partitionValues = partDirs.map { case (values, _) =>
          partitionSchema.fields.zipWithIndex.toSeq.map { case (f, i) =>
            IndexMetadata.castToString(f.dataType, values.get(i, f.dataType))
          }
        },
        fileCount = summary.fileCount,
        totalBytes = summary.totalBytes))
    }
    } // withSiblingLock
  }

  /** Validate/choose indexed columns (reference ParquetSchemaUtils.scala:
    * 40-87 + ParquetMetastoreSupport.scala:111-117, EXTENDED to dotted
    * nested leaves — modern footers carry per-leaf stats, so the
    * reference's top-level-only limit no longer applies): supported leaf
    * type, unique, not a partition column, path through NON-REPEATED
    * structs only (a leaf under an array/map counts values, not rows —
    * its stats can't answer row predicates); indexByAll prunes to
    * supported TOP-LEVEL columns. The index-schema field NAME is the
    * dotted path in the table's own casing — the key the footer
    * dot-strings, sketches and filter fold all join on. */
  private def resolveIndexSchema(
      dataSchema: StructType,
      partitionSchema: StructType,
      columns: Seq[String],
      indexAll: Boolean): StructType = {
    val partitionCols = partitionSchema.fieldNames.map(_.toLowerCase).toSet
    if (indexAll) {
      StructType(dataSchema.fields.filter(f =>
        Canon.isSupported(f.dataType) && !partitionCols.contains(f.name.toLowerCase)))
    } else {
      require(columns.nonEmpty, "no columns given to indexBy")
      val dups = columns.groupBy(_.toLowerCase).filter(_._2.size > 1).keys
      require(dups.isEmpty, s"duplicate index columns: ${dups.mkString(", ")}")
      val fields = columns.flatMap { c =>
        require(!partitionCols.contains(c.toLowerCase),
          s"cannot index partition column $c (reference ParquetMetastoreSupport.scala:111-117)")
        require(!c.endsWith(IndexMetadata.MapValueSuffix),
          s"column name $c collides with the reserved map value-domain " +
            s"suffix '${IndexMetadata.MapValueSuffix}'")
        val (f, arrayPrefix) = resolveLeaf(dataSchema, c).getOrElse(
          throw new IllegalArgumentException(
            s"column $c not found in table schema ${dataSchema.simpleString} " +
              "(nested paths resolve through structs, plus at most ONE " +
              "array-of-struct level; never through maps)"))
        (f.dataType, arrayPrefix) match {
          // leaf under ONE array-of-struct level (events.type over
          // events: array<struct<type,...>>): an ELEMENT domain over the
          // leaf values of every element — exists(col, x -> x.f = v) and
          // array_contains(col.f, v) prune by element membership; the
          // prefix records where the repeated level splits the physical
          // leaf path
          case (dt, Some(prefix)) =>
            require(Canon.isSupported(dt),
              s"column $c is an array-of-struct leaf of unsupported type " +
                s"${dt.simpleString}; supported leaves: int, bigint, string, " +
                "date, timestamp, timestamp_ntz, double, float, decimal(p<=18)")
            Seq(StructField(f.name, dt, f.nullable,
              new org.apache.spark.sql.types.MetadataBuilder()
                .withMetadata(f.metadata)
                .putBoolean(IndexMetadata.ArrayElementKey, true)
                .putString(IndexMetadata.ArrayPrefixKey, prefix).build()))
          // array<primitive>: the index field carries the ELEMENT type +
          // a marker — element min/max + dict/bloom answer
          // array_contains(col, v) membership soundly (a file with no
          // element == v has no containing row); row-domain consumers
          // (metadata aggregates, top-k, null reasoning) skip the field
          case (org.apache.spark.sql.types.ArrayType(et, _), None) =>
            require(Canon.isSupported(et),
              s"column $c is an array of unsupported element type " +
                s"${et.simpleString}; supported elements: int, bigint, string, " +
                "date, timestamp, timestamp_ntz, double, float, decimal(p<=18)")
            Seq(StructField(f.name, et, f.nullable,
              new org.apache.spark.sql.types.MetadataBuilder()
                .withMetadata(f.metadata)
                .putBoolean(IndexMetadata.ArrayElementKey, true).build()))
          // map<primitive, _>: the index field carries the KEY type + a
          // marker — key min/max + dict/bloom answer map_contains_key
          // (col, k) / col[k] = lit membership soundly (a file with no
          // entry keyed k has no matching row); same row-domain
          // exclusions as array elements. A supported VALUE type adds a
          // second, `#value`-suffixed field over the entry values, so
          // m[k] = v also prunes by value membership of v.
          case (org.apache.spark.sql.types.MapType(kt, vt, _), None) =>
            require(Canon.isSupported(kt),
              s"column $c is a map with unsupported key type " +
                s"${kt.simpleString}; supported keys: int, bigint, string, " +
                "date, timestamp, timestamp_ntz, double, float, decimal(p<=18)")
            val keyField = StructField(f.name, kt, f.nullable,
              new org.apache.spark.sql.types.MetadataBuilder()
                .withMetadata(f.metadata)
                .putBoolean(IndexMetadata.MapKeyKey, true).build())
            val valueField =
              if (!Canon.isSupported(vt)) Nil
              else {
                val vName = IndexMetadata.mapValueFieldName(f.name)
                require(resolveLeaf(dataSchema, vName).isEmpty,
                  s"table column $vName collides with the generated map " +
                    s"value-domain field for $c")
                Seq(StructField(vName, vt, nullable = true,
                  new org.apache.spark.sql.types.MetadataBuilder()
                    .putBoolean(IndexMetadata.MapValueKey, true).build()))
              }
            keyField +: valueField
          case (dt, None) =>
            require(Canon.isSupported(dt),
              s"column $c has unsupported type ${dt.simpleString}; " +
                "supported: int, bigint, string, date, timestamp, timestamp_ntz, " +
                "double, float, decimal(p<=18), array<primitive>, map<primitive, _>, " +
                "and struct leaves under at most one array level")
            Seq(f)
        }
      }
      StructType(fields)
    }
  }

  /** Resolve a (possibly dotted) column path to its leaf field — struct
    * hops plus at most ONE hop through an array-of-structs (the repeated
    * level `array<struct<...>>`, the most common real nested shape),
    * case-insensitive per segment; the returned field carries the FULL
    * dotted path in the table's own casing as its name, and the second
    * element is the dotted path of the crossed ARRAY column when the
    * leaf sits inside one (its stats then describe array ELEMENTS, not
    * rows). Paths through maps or a second array level return None. */
  private def resolveLeaf(
      schema: StructType, path: String): Option[(StructField, Option[String])] = {
    val segs = path.split('.')
    var cur: org.apache.spark.sql.types.DataType = schema
    val actual = scala.collection.mutable.ArrayBuffer.empty[String]
    var leaf: Option[StructField] = None
    var arrayPrefix: Option[String] = None
    for ((seg, i) <- segs.zipWithIndex) {
      cur match {
        case st: StructType =>
          st.fields.find(_.name.equalsIgnoreCase(seg)) match {
            case Some(f) =>
              actual += f.name
              cur = f.dataType
              // descend INTO an array-of-structs exactly once: the path
              // continues into the element struct; remember where the
              // repeated level sits
              cur match {
                case org.apache.spark.sql.types.ArrayType(et: StructType, _)
                    if i < segs.length - 1 && arrayPrefix.isEmpty =>
                  arrayPrefix = Some(actual.mkString("."))
                  cur = et
                case _ =>
              }
              if (i == segs.length - 1) leaf = Some(f)
            case None => return None
          }
        case _ => return None // path hops through a non-struct
      }
    }
    leaf.map(f =>
      (StructField(actual.mkString("."), f.dataType, f.nullable, f.metadata), arrayPrefix))
  }

  /** Outcome of [[refreshIndex]]: how many data files were (re-)indexed
    * and how many stale entries were dropped. (0, 0) = index was current. */
  case class RefreshStats(addedFiles: Long, removedFiles: Long)

  /** Incrementally refresh an existing index after the table gained or
    * lost files. The reference rejects SaveMode.Append outright
    * (ParquetMetastoreSupport.scala:104-107) — but at 100 TB a full
    * rebuild because one day of files landed is not an option, so
    * refresh re-indexes ONLY the delta:
    *
    *   - the current listing is diffed against the `files` table on
    *     (path, size, modificationTime) — a distributed anti-join; only
    *     the changed-file handles ever sit on the driver;
    *   - new/rewritten files get footer stats + sketches through the
    *     same jobs as create, APPENDED to the two parquet tables;
    *   - removed/rewritten files' stale rows are dropped by a
    *     semi-join rewrite of the files table (metadata-sized) and, only
    *     when removals exist, of the sketch table;
    *   - partition dirs keep their original indexes (metadata partition
    *     list is append-only), so existing rows stay valid.
    *
    * The `_SUCCESS` marker is removed for the duration of the update and
    * restored after the new metadata is written: a crash mid-refresh
    * fails subsequent loads ("create it first") instead of serving a
    * torn index — the same guarantee create() gives.
    *
    * Limitation (shared with Spark's own file-listing caches): a file
    * rewritten IN PLACE with both size and mtime preserved (`cp -p` over
    * same-length content) is indistinguishable from unchanged and keeps
    * its old stats; use create.mode("overwrite") after such a rewrite.
    */
  def refreshIndex(
      spark: SparkSession,
      path: String,
      dataspace: String,
      options: Map[String, String] = Map.empty): RefreshStats =
    refreshIndex(spark, Seq(path), dataspace, options)

  /** Multi-root refresh. The ROOT SET is frozen at create (it keys the
    * metastore entry): a glob that matches new directories resolves to
    * a DIFFERENT set — create a new index for it; refresh picks up new
    * FILES under the existing roots. */
  def refreshIndex(
      spark: SparkSession,
      paths: Seq[String],
      dataspace: String,
      options: Map[String, String]): RefreshStats = {
    import org.apache.spark.sql.functions.col

    val conf = IndexConf(spark, options)
    val metastore = new Metastore(spark, conf)
    val roots = resolveTableRoots(spark, paths)
    val (indexDir, meta) = metastore.load(dataspace, roots)
    val metaRoots = meta.rootPathStrings.map(new Path(_))
    val fs = metastore.fs
    val filesDir = new Path(indexDir, Metastore.FilesDir)
    val sketchDir = new Path(indexDir, Metastore.SketchDir)

    // Stable partition indexing: existing entries keep their position,
    // newly appeared partition dirs append. Entries whose partition
    // vanished stay (no file row references them — harmless).
    val partValues = scala.collection.mutable.ArrayBuffer(meta.partitionValues: _*)
    val idxByValues = scala.collection.mutable.HashMap(
      meta.partitionValues.zipWithIndex: _*)

    import spark.implicits._
    val keyCols = Seq("path", "size", "modificationTime")
    val oldKeys = spark.read.parquet(filesDir.toString)
      .select(col("path"), col("size"), col("modificationTime"))
    val listingTmp = new Path(indexDir, Metastore.FilesDir + "_listing_tmp")

    // Diff on (path, size, modificationTime): a rewritten file (same
    // path, new size/mtime) counts as removed + added. TWO listing tiers,
    // same threshold as pruning:
    //   - below it, Spark's InMemoryFileIndex (driver residency O(total
    //     files), block locations kept);
    //   - at/above it, a DISTRIBUTED level-walk — executors list their
    //     directory slices and write file rows straight to a scratch
    //     parquet table, the driver holds only the directory frontier
    //     (O(dirs)) and the diff collects only ADDED refs, so driver
    //     residency is O(delta) however many files the table holds.
    val distributedListing = meta.fileCount >= conf.distributedPruningThreshold
    val (currentKeys, addedRefs, removedCount, removedBytes, commitManifest):
        (org.apache.spark.sql.DataFrame, Seq[(Int, StatisticsBuilder.FileRef)],
         Long, Long, () => Unit) =
      if (!distributedListing) {
        val (partitionSchema, partDirs) = SparkInternals.discoverTable(spark, metaRoots)
        require(org.apache.spark.sql.types.DataType.equalsIgnoreNullability(
            partitionSchema, meta.partitionSchema),
          s"partition schema changed (${meta.partitionSchema.simpleString} -> " +
            s"${partitionSchema.simpleString}); rebuild the index with create.mode(\"overwrite\")")
        val current: Seq[(Int, StatisticsBuilder.FileRef)] = partDirs.flatMap { case (values, files) =>
          val vStr: Seq[Option[String]] = partitionSchema.fields.zipWithIndex.toSeq.map {
            case (f, i) => IndexMetadata.castToString(f.dataType, values.get(i, f.dataType))
          }
          val idx = idxByValues.getOrElseUpdate(vStr, { partValues += vStr; partValues.size - 1 })
          files.filter(_.getLen > 0).map { f =>
            val locs = SparkInternals.blockLocations(f)
            idx -> StatisticsBuilder.FileRef(
              f.getPath.toString, f.getLen, f.getModificationTime,
              blockSize = if (f.getBlockSize > 0) f.getBlockSize else FileEntry.DefaultBlockSize,
              locationsJson = IndexMetadata.locationsToJsonString(locs),
              hosts = locs.flatMap(_.hosts).distinct)
          }
        }
        val ck = current.map { case (_, r) => (r.path, r.size, r.modificationTime) }
          .toDF("path", "size", "modificationTime")
        val added = ck.join(oldKeys, keyCols, "left_anti")
          .select("path").as[String].collect().toSet
        val rem = oldKeys.join(ck, keyCols, "left_anti")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.sum(col("size"))).head
        val removed = rem.getLong(0)
        val removedB = if (rem.isNullAt(1)) 0L else rem.getLong(1)
        // the driver tier does not maintain the dir manifest — drop any
        // stale one so a later distributed refresh can't trust it
        val dropManifest: () => Unit = () => {
          try {
            val dp = new Path(indexDir, Metastore.DirsDir)
            if (fs.exists(dp)) { fs.delete(dp, true); () }
          } catch { case _: Exception => () }
        }
        (ck, current.filter { case (_, r) => added.contains(r.path) },
          removed, removedB, dropManifest)
      } else {
        distributedListingDiff(
          spark, metaRoots, meta, oldKeys, keyCols, listingTmp, partValues,
          idxByValues, indexDir, conf)
      }
    val addedPaths = addedRefs.map(_._2.path).toSet

    if (addedRefs.isEmpty && removedCount == 0) {
      // nothing to mutate: still persist the refreshed manifest so dirs
      // captured inside the mtime-slack window stop re-listing forever
      commitManifest()
      if (fs.exists(listingTmp)) fs.delete(listingTmp, true)
      return RefreshStats(0L, 0L)
    }

    // Single-writer enforcement: the whole mutation (files-table rewrite,
    // sketch append, metadata + _SUCCESS) runs under the index's SIBLING
    // maintenance lock (shared with create/delete, which remove the index
    // dir itself) — a concurrent run fails fast instead of interleaving
    // table rewrites; a crashed run's lock lease-expires.
    graft.ops.MaintenanceLock.withSiblingLock(fs, indexDir) {

    Metastore.cacheInvalidate(indexDir.toString)
    SketchStore.invalidate(sketchDir)
    IndexFilesTable.invalidate(filesDir)
    fs.delete(new Path(indexDir, Metastore.SuccessFile), false)

    // 1. Drop stale file rows (semi-join against the live listing keys,
    //    rewritten via tmp dir + rename — the table is metadata-sized).
    if (removedCount > 0) {
      val keep = spark.read.parquet(filesDir.toString)
        .join(currentKeys, keyCols, "left_semi")
      val tmp = new Path(indexDir, Metastore.FilesDir + "_tmp")
      keep.sort(col("partitionIdx"), col("path"))
        .write.mode("overwrite").parquet(tmp.toString)
      fs.delete(filesDir, true)
      fs.rename(tmp, filesDir)
    }

    // 2. Footer job over the added files only, appended to the files
    //    table. The summary is DELTA-scoped and composed with the
    //    previous metadata incrementally (count/bytes arithmetic, schema
    //    widened by the delta) — a 1-file append must never re-aggregate
    //    the whole 10^6-row files table (the schemaJson blob column made
    //    that the refresh floor). Exact by induction from create, which
    //    summarizes the full table.
    val numParts =
      if (conf.numPartitions > 0) conf.numPartitions
      else math.min(spark.sparkContext.defaultParallelism * 3,
        spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    val delta =
      if (addedRefs.nonEmpty) {
        val s = StatisticsBuilder.writeFileStats(
          spark, addedRefs, meta.indexSchema, numParts, filesDir, mode = "append",
          source = meta.source, summarizeDelta = true)
        // Detection only fires on statless rows, which after an append can
        // only be the delta — scope the blocksJson parse to it too.
        if (conf.minMaxFallback && meta.indexSchema.nonEmpty) {
          StatisticsBuilder.fullScanMinMaxFallback(
            spark, filesDir, meta.indexSchema, source = meta.source,
            onlyPaths = Some(addedRefs.map(_._2.path)))
        }
        s
      } else StatisticsBuilder.FileStatsSummary(None, 0L, 0L, 0L)
    // Append-only refreshes compose the metadata incrementally (schema
    // only ever widens — exact, since nothing was removed). When
    // removals exist, the delta composition would DRIFT monotonically
    // (a removed file's last-of-a-kind columns would linger in
    // dataSchema forever), so re-aggregate the settled files table —
    // removals already forced its full rewrite above, so the
    // re-aggregation is not the refresh floor.
    val (newFileCount, newTotalBytes, newDataSchema) =
      if (removedCount > 0) {
        // the table already holds (kept + appended delta) rows here, so
        // the summary IS the final metadata — no arithmetic composition
        val full = StatisticsBuilder.summarizeFilesTable(spark, filesDir)
        (full.fileCount, full.totalBytes, full.dataSchema.getOrElse(meta.dataSchema))
      } else {
        (meta.fileCount + delta.fileCount,
          meta.totalBytes + delta.totalBytes,
          delta.dataSchema
            .map(d => org.apache.spark.sql.graft.SparkInternals.mergeSchemas(meta.dataSchema, d))
            .getOrElse(meta.dataSchema))
      }

    // 3. Sketches: drop stale rows first (only when removals exist —
    //    semi-join against the settled files table, fully distributed),
    //    then append sketches for the added files. Rows of RE-SKETCHED
    //    paths are anti-joined out too: a file rewritten at the same
    //    path (removed + added by the diff) is live again by now, so the
    //    semi-join alone would keep its stale row next to the fresh
    //    append — a duplicate (file, column) key whose stale sketch
    //    could win a probe and mis-prune the rewritten content.
    meta.sketchKind.foreach { kind =>
      if (removedCount > 0 && fs.exists(sketchDir)) {
        val normPath = (c: org.apache.spark.sql.Column) => graft.functions.exprs.normalize_path(c)
        val liveKeys = spark.read.parquet(filesDir.toString)
          .select(normPath(col("path")).as("file"))
        val addedKeys = addedPaths.toSeq.map(SketchStore.normalizePath)
          .toDF("file")
        val keep = spark.read.parquet(sketchDir.toString)
          .join(liveKeys, Seq("file"), "left_semi")
          .join(addedKeys, Seq("file"), "left_anti")
        val tmp = new Path(indexDir, Metastore.SketchDir + "_tmp")
        keep.sort(col("file"), col("column"))
          .write.mode("overwrite").parquet(tmp.toString)
        fs.delete(sketchDir, true)
        fs.rename(tmp, sketchDir)
      }
      if (addedRefs.nonEmpty) {
        // sketch sizing needs to cover the files being sketched — the
        // ADDED ones — so the delta max is the right bound
        StatisticsBuilder.buildSketches(
          spark, addedRefs.map(_._2.path), meta.indexSchema, kind,
          expectedItems = math.max(4096L, delta.maxFileRows),
          sketchDir, mode = "append", source = meta.source)
      }
    }

    metastore.writeMetadata(indexDir, meta.copy(
      dataSchema = newDataSchema,
      partitionValues = partValues.toSeq,
      fileCount = newFileCount,
      totalBytes = newTotalBytes))
    commitManifest()
    fs.create(new Path(indexDir, Metastore.SuccessFile), true).close()
    val stats = RefreshStats(addedPaths.size.toLong, removedCount)

    // the distributed listing's scratch table (read lazily by the stale-
    // row semi-join above) is only droppable once the mutation settled
    if (fs.exists(listingTmp)) fs.delete(listingTmp, true)
    stats
    } // MaintenanceLock.withLock
  }

  /** The distributed listing + diff tier of [[refreshIndex]]: a level-walk
    * over the table's directory tree — each level is one Spark job whose
    * tasks `listStatus` their directory slice, append file rows straight
    * to a scratch parquet table, and hand only the CHILD DIRECTORIES back
    * to the driver. Hive `k=v` segments are parsed and value-normalized
    * (cast round-trip through the partition type, so `k=01` and the
    * metadata's "1" can't fork a duplicate partition) on executors, and
    * the diff collects ONLY added refs — driver residency is O(dirs +
    * partitions + delta), never O(files). Tradeoff vs the driver tier:
    * block-location hints are not fetched for added files (one extra RPC
    * per file — the footer job re-derives locality from the read itself).
    * Returns (currentKeys frame backed by the scratch table, added refs,
    * removed count); the caller drops the scratch table after the
    * mutation settles. */
  private def distributedListingDiff(
      spark: SparkSession,
      roots: Seq[Path],
      meta: IndexMetadata,
      oldKeys: org.apache.spark.sql.DataFrame,
      keyCols: Seq[String],
      listingTmp: Path,
      partValues: scala.collection.mutable.ArrayBuffer[Seq[Option[String]]],
      idxByValues: scala.collection.mutable.HashMap[Seq[Option[String]], Int],
      indexDir: Path,
      conf: IndexConf)
      : (org.apache.spark.sql.DataFrame, Seq[(Int, StatisticsBuilder.FileRef)],
         Long, Long, () => Unit) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val hconf = spark.sparkContext.hadoopConfiguration
    // TWO filesystems: the TABLE's (probed dirs, walked roots) and the
    // INDEX dir's (scratch listing table, dir manifest — both live in
    // the metastore). They differ whenever the indexed table sits on a
    // remote scheme and the metastore is local (or vice versa) — using
    // one for the other throws "Wrong FS" (caught by MockFsRefreshSpec).
    val tfs = roots.head.getFileSystem(hconf)
    val ifs = indexDir.getFileSystem(hconf)
    val rootStrs = roots.map(r => r.getFileSystem(hconf).makeQualified(r).toString)
    if (ifs.exists(listingTmp)) ifs.delete(listingTmp, true) // crashed-run debris
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hconf))

    // ---- dir-mtime manifest (see Metastore.DirsDir): probe every KNOWN
    // dir's current mtime in one distributed job and re-list only the
    // changed ones — rename-based writers (every Spark/Hadoop committer)
    // always bump the parent dir's mtime on add/remove, so an unchanged
    // (and slack-safe) mtime proves the stored rows for that dir are
    // current. First refresh / conf off / unreadable manifest -> full
    // walk (and the manifest gets (re)written after the mutation
    // commits, so an aborted refresh can never mark unindexed files as
    // captured).
    val dirsPath = new Path(indexDir, Metastore.DirsDir)
    val nowMs = System.currentTimeMillis()
    val slackMs = conf.refreshDirMtimeSlackMs
    val useManifest = manifestEnabled(conf, rootStrs)
    // fullWalk: the per-call reconciliation hatch — ignore the stored
    // manifest (walk everything, diff everything) but still REBUILD it
    // from the walk, so one forced pass heals the in-place-rewrite blind
    // spot and the tier resumes skipping afterwards.
    val manifest: Map[String, (Long, Long)] =
      if (!useManifest || conf.refreshFullWalk) Map.empty
      else try {
        if (!ifs.exists(dirsPath)) Map.empty
        else spark.read.parquet(dirsPath.toString)
          .select(col("dir"), col("mtime"), col("capturedAt")).collect()
          .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      } catch { case _: Exception => Map.empty }
    // a manifest that tracks nothing beyond the roots (flat layouts)
    // cannot skip anything — the probed root always changes — so the
    // tier disengages entirely rather than paying its read/probe/rewrite
    val manifestActive = manifest.nonEmpty && rootStrs.forall(manifest.contains) &&
      manifest.size > rootStrs.size
    lastManifestStats = None

    var changedSeeds: Seq[String] = rootStrs
    var deletedDirs: Set[String] = Set.empty
    var unchangedDirs: Seq[String] = Nil
    // (dir -> (mtime, capturedAt)) rows for the NEW manifest; changed/new
    // dirs are stamped with this refresh's capture time
    val newManifest = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    if (manifestActive) {
      val keys = manifest.keys.toSeq.sorted
      val probeSlices = math.max(1,
        math.min(spark.sparkContext.defaultParallelism * 2, keys.size))
      val probed: Array[(String, Long, Boolean)] =
        spark.sparkContext.parallelize(keys, probeSlices).map { d =>
          try {
            val st = new Path(d).getFileSystem(confBc.value.value)
              .getFileStatus(new Path(d))
            (d, st.getModificationTime, true)
          } catch {
            case _: java.io.FileNotFoundException => (d, -1L, false)
          }
        }.collect()
      val changed = scala.collection.mutable.ArrayBuffer.empty[String]
      val unchanged = scala.collection.mutable.ArrayBuffer.empty[String]
      val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
      probed.foreach { case (d, mt, exists) =>
        if (!exists) deleted += d
        else {
          val (oldMt, capAt) = manifest(d)
          // unchanged AND captured safely past the mtime tick -> skip;
          // anything else (moved mtime, capture inside the slack window,
          // a dir replaced by a file) re-lists. An mtime of 0 is never
          // trusted: synthetic directories (object stores) report 0 (or
          // a constant), which would read as "unchanged" forever — such
          // dirs always re-list, even under a forced-on manifest.
          if (mt > 0L && mt == oldMt && capAt > oldMt + slackMs) {
            unchanged += d
            newManifest(d) = (oldMt, capAt) // entry still vouched-for
          } else {
            changed += d
            newManifest(d) = (mt, nowMs)
          }
        }
      }
      changedSeeds = changed.toSeq
      deletedDirs = deleted.toSet
      unchangedDirs = unchanged.toSeq
      lastManifestStats = Some((probed.length.toLong, changed.size.toLong,
        deleted.size.toLong, unchanged.size.toLong))
    } else {
      // full walk: seed with the roots, stamped into the new manifest
      // with their current mtimes
      rootStrs.foreach { r =>
        try {
          val st = tfs.getFileStatus(new Path(r))
          newManifest(r) = (st.getModificationTime, nowMs)
        } catch { case _: Exception => }
      }
    }
    val manifestKnown = manifest.keySet

    // level-walk seeded with the dirs to (re-)list: files stream to the
    // scratch table, dirs come back (roots never nest, so each listed
    // path belongs to exactly one root). Under an active manifest the
    // walk descends ONLY into dirs the manifest does not know (new
    // subtrees) — known children were probed above.
    var dirs: Seq[String] = changedSeeds
    var depth = 0
    var maxDirRows = math.max(1L, changedSeeds.size.toLong)
    while (dirs.nonEmpty) {
      require(depth < 64, s"directory nesting beyond 64 levels under ${rootStrs.mkString(", ")}")
      val slices = math.max(1, math.min(spark.sparkContext.defaultParallelism * 2, dirs.size))
      val statSlices = math.max(slices, spark.sparkContext.defaultParallelism * 2)
      val allLocal = dirs.forall(_.startsWith("file:"))
      val level = (if (!allLocal) {
        // cluster filesystems: one listStatus per dir — HDFS/S3A return
        // size+mtime in bulk listing pages, so this IS the cheap path
        spark.sparkContext.parallelize(dirs, slices).flatMap { d =>
          val p = new Path(d)
          p.getFileSystem(confBc.value.value).listStatus(p).iterator
            .filter { st =>
              val n = st.getPath.getName
              !n.startsWith("_") && !n.startsWith(".") // Spark's hidden-file rule
            }
            .map(st => (st.isDirectory, st.getPath.toString, st.getLen,
              st.getModificationTime,
              if (st.getBlockSize > 0) st.getBlockSize else FileEntry.DefaultBlockSize))
        }
      } else {
        // file:// — RawLocalFileSystem.listStatus costs SEVERAL stat
        // syscalls per child inside ONE task, so a flat million-file dir
        // pays ~12 s serially. Split it the way a cluster FS does
        // natively: a names-only readdir per dir (no stat), shuffled
        // across executors, then ONE statx per file in parallel.
        // qualified local paths are exactly "file:" + POSIX path (empty
        // authority), so stripPrefix round-trips spaces/special chars
        // that java.net.URI parsing would reject. The name shuffle runs
        // as a DATASET exchange (Tungsten rows), not an RDD repartition,
        // so no generic serializer ever touches the records.
        spark.sparkContext.parallelize(dirs, slices).flatMap { d =>
          val dirFile = new java.io.File(d.stripPrefix("file:"))
          // a root that is itself a data FILE (globs match files) emits
          // itself — File.list() is null there, but the old listStatus
          // path returned the file, and dropping it would mis-diff it
          // as removed
          if (dirFile.isFile) Iterator.single(d)
          else Option(dirFile.list()).iterator.flatten
            .filter(n => !n.startsWith("_") && !n.startsWith("."))
            .map(n => d + "/" + n)
        }.toDF("p").repartition(statSlices).as[String].mapPartitions { it =>
          it.flatMap { full =>
            val f = java.nio.file.Paths.get(full.stripPrefix("file:"))
            try {
              val a = java.nio.file.Files.readAttributes(
                f, classOf[java.nio.file.attribute.BasicFileAttributes])
              Iterator.single((a.isDirectory, full, a.size(),
                a.lastModifiedTime().toMillis, FileEntry.DefaultBlockSize))
            } catch {
              // deleted between readdir and stat — same as listStatus
              // racing a concurrent writer: skip
              case _: java.io.IOException => Iterator.empty
            }
          }
        }.rdd
      }).toDF("isDir", "path", "size", "modificationTime", "blockSize")
        .persist()
      level.filter(!col("isDir") && col("size") > 0).drop("isDir")
        .write.mode("append").parquet(listingTmp.toString)
      val childDirs = level.filter(col("isDir"))
        .select(col("path"), col("modificationTime"))
        .as[(String, Long)].collect().toSeq
      childDirs.foreach { case (d, mt) =>
        if (!newManifest.contains(d)) newManifest(d) = (mt, nowMs)
      }
      dirs =
        if (manifestActive) childDirs.collect {
          case (d, _) if !manifestKnown.contains(d) => d
        }
        else childDirs.map(_._1)
      maxDirRows = math.max(maxDirRows, childDirs.size.toLong)
      level.unpersist()
      depth += 1
    }
    // an all-empty walk still needs a readable (empty) scratch table
    if (!ifs.exists(listingTmp)) {
      Seq.empty[(String, Long, Long, Long)]
        .toDF("path", "size", "modificationTime", "blockSize")
        .write.parquet(listingTmp.toString)
    }

    // executor-side partition parse: k=v segments of the path relative to
    // the root, normalized through the partition type's cast round-trip;
    // a name/depth mismatch = the partition layout changed -> fail fast
    val fieldNames = meta.partitionSchema.fieldNames.toSeq
    val fieldTypeJson = meta.partitionSchema.fields.map(_.dataType.json).toSeq
    val rawListing = spark.read.parquet(listingTmp.toString)
    // each file parses relative to ITS root (prefix match is unambiguous:
    // resolveTableRoots rejects nested roots); a root that is itself a
    // data FILE matches by equality and parses as depth-0 (unpartitioned)
    val listing = rootStrs.map { rootB =>
      val parseVals = (c: org.apache.spark.sql.Column) =>
        graft.functions.exprs.parse_partition_values(c, rootB, fieldNames, fieldTypeJson)
      rawListing
        .filter(col("path") === rootB || col("path").startsWith(rootB + "/"))
        .withColumn("partVals", parseVals(col("path")))
    }.reduce(_.unionAll(_))

    // Under an active manifest the diff runs over the RE-LISTED SCOPE
    // only: stored rows under changed/deleted dirs (plus changed
    // file-roots) participate; rows under unchanged dirs are current by
    // the mtime proof and flow straight into currentKeys. Without a
    // manifest the scope is everything (oldScoped == oldKeys).
    import org.apache.spark.sql.functions.{broadcast, lit, regexp_replace, when}
    val (oldScoped, unchangedKeys) =
      if (!manifestActive || unchangedDirs.isEmpty) (oldKeys, None)
      // ^ nothing skippable (e.g. a flat single-dir layout whose root
      //   always changes): the scope-split joins would partition the
      //   stored rows into (everything, nothing) — pure overhead
      else {
        val scope = (changedSeeds ++ deletedDirs).distinct
        val scopeDf = broadcast(scope.toDF("__d"))
        // a root that is itself a FILE scopes by its own path (it has no
        // tracked parent dir); everything else by its parent dir
        val dCol = when(col("path").isin(rootStrs: _*), col("path"))
          .otherwise(regexp_replace(col("path"), "/[^/]+$", ""))
        val oldWith = oldKeys.withColumn("__d", dCol)
        (oldWith.join(scopeDf, Seq("__d"), "left_semi").drop("__d"),
          Some(oldWith.join(scopeDf, Seq("__d"), "left_anti").drop("__d")
            .select(keyCols.map(col): _*)))
      }

    // ONE full-outer pass computes both sides of the diff: added rows
    // are collected (O(delta)), the removed side is reduced to
    // (count, bytes) INSIDE the same action via Observation — no second
    // O(all files) anti-join, no second read of the scratch table.
    val obs = org.apache.spark.sql.Observation(
      "graft-refresh-diff-" + java.util.UUID.randomUUID())
    val joined = listing.withColumn("__live", lit(1))
      .join(oldScoped.withColumn("__known", lit(1)), keyCols, "full_outer")
    val addedRows = joined
      .observe(obs,
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
          .when(col("__live").isNull, lit(1L)).otherwise(lit(0L))).as("rc"),
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions
          .when(col("__live").isNull, col("size")).otherwise(lit(0L))).as("rb"))
      .filter(col("__known").isNull)
      .collect()
    val metrics = obs.get
    val removedCount = Option(metrics.getOrElse("rc", null))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val removedBytes = Option(metrics.getOrElse("rb", null))
      .map(_.asInstanceOf[Long]).getOrElse(0L)

    // new partition dirs append (sorted for determinism) — derived from
    // the ADDED rows only: existing partitions are already in the
    // metadata, and a new partition dir implies at least one added file,
    // so the full-listing distinct the old shape ran is pure overhead
    val tuples: Seq[Seq[Option[String]]] = addedRows.toSeq
      .map(_.getAs[scala.collection.Seq[String]]("partVals").toSeq.map(Option(_)))
      .distinct
      .sortBy(_.map(_.getOrElse("")).mkString("\u0000"))
    tuples.foreach { t =>
      idxByValues.getOrElseUpdate(t, { partValues += t; partValues.size - 1 })
    }

    val addedRefs = addedRows.toSeq.map { r =>
      val vals: Seq[Option[String]] =
        r.getAs[scala.collection.Seq[String]]("partVals").toSeq.map(Option(_))
      idxByValues(vals) -> StatisticsBuilder.FileRef(
        r.getAs[String]("path"), r.getAs[Long]("size"),
        r.getAs[Long]("modificationTime"), r.getAs[Long]("blockSize"))
    }
    lastListingResidency = Some((maxDirRows, tuples.size.toLong, addedRefs.size.toLong))
    // persist the refreshed (dir, mtime, capturedAt) manifest for the
    // NEXT refresh. The caller invokes this only once the mutation has
    // committed (or when there was nothing to mutate) — writing earlier
    // would let an aborted refresh mark unindexed files as captured.
    val manifestWriter: () => Unit = () => {
      // nothing beyond the roots -> persisting buys nothing (see
      // manifestActive); drop any stale manifest instead
      if (useManifest && newManifest.size <= rootStrs.size) {
        try { if (ifs.exists(dirsPath)) { ifs.delete(dirsPath, true); () } }
        catch { case _: Exception => () }
      } else if (useManifest) {
        try {
          val rows = newManifest.toSeq.sortBy(_._1)
            .map { case (d, (m, c)) => (d, m, c) }
          val tmp = new Path(indexDir, Metastore.DirsDir + "_tmp")
          val out = if (rows.isEmpty) Seq(("", 0L, 0L)).take(0) else rows
          spark.createDataFrame(out).toDF("dir", "mtime", "capturedAt")
            .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
          if (ifs.exists(dirsPath)) ifs.delete(dirsPath, true)
          ifs.rename(tmp, dirsPath)
          ()
        } catch { case _: Exception => () } // best-effort cache
      }
    }
    val currentKeys = unchangedKeys match {
      case Some(uk) => uk.unionAll(listing.select(keyCols.map(col): _*))
      case None => listing.select(keyCols.map(col): _*)
    }
    (currentKeys, addedRefs, removedCount, removedBytes, manifestWriter)
  }

  def existsIndex(spark: SparkSession, path: String, dataspace: String): Boolean =
    existsIndex(spark, Seq(path), dataspace)

  def existsIndex(spark: SparkSession, paths: Seq[String], dataspace: String): Boolean = {
    val metastore = Metastore(spark)
    try metastore.exists(dataspace, resolveTableRoots(spark, paths))
    catch { case _: Exception => false }
  }

  def deleteIndex(spark: SparkSession, path: String, dataspace: String): Unit =
    deleteIndex(spark, Seq(path), dataspace)

  def deleteIndex(spark: SparkSession, paths: Seq[String], dataspace: String): Unit = {
    val metastore = Metastore(spark)
    val roots = resolveTableRoots(spark, paths)
    val indexDir = metastore.location(dataspace, roots)
    // Sibling lock (shared with create/refresh): deleting an index out
    // from under a live refresh would leave a torn, _SUCCESS-less dir.
    graft.ops.MaintenanceLock.withSiblingLock(metastore.fs, indexDir) {
      SketchStore.invalidate(new Path(indexDir, Metastore.SketchDir))
      IndexFilesTable.invalidate(new Path(indexDir, Metastore.FilesDir))
      metastore.delete(dataspace, roots)
    }
  }

  /** Load the indexed relation as a DataFrame (reference flow §3.2 step 1).
    * `options`: `spark.sql.index.*` keys override the session conf for
    * this load; the rest are handed to the underlying relation. The data
    * format comes from the index metadata; when `expectedSource` is given
    * (the fluent API's terminal method), a mismatch fails with a clear
    * error instead of mis-decoding files. */
  def load(
      spark: SparkSession,
      path: String,
      dataspace: String,
      options: Map[String, String] = Map.empty,
      expectedSource: Option[String] = None): DataFrame =
    load(spark, Seq(path), dataspace, options, expectedSource)

  /** Multi-root/glob load: the resolved root set keys the metastore
    * entry exactly as at create time. */
  def load(
      spark: SparkSession,
      paths: Seq[String],
      dataspace: String,
      options: Map[String, String],
      expectedSource: Option[String]): DataFrame = {
    val conf = IndexConf(spark, options)
    val metastore = new Metastore(spark, conf)
    val roots = resolveTableRoots(spark, paths)
    if (conf.createIfNotExists && !metastore.exists(dataspace, roots)) {
      createIndex(spark, paths, dataspace, SaveMode.Overwrite, Nil, indexAll = true,
        options, expectedSource.getOrElse(Sources.Parquet))
    }
    val (indexDir, meta) = metastore.load(dataspace, roots)
    expectedSource.map(Sources.normalize).foreach { s =>
      require(s == meta.source,
        s"index at ${roots.mkString(", ")} was built over ${meta.source} data, not $s; " +
          s"load it with format(\"${meta.source}\") / .${meta.source}(path)")
    }
    val fileIndex = new GraftFileIndex(spark, indexDir, meta, conf)
    if (conf.eagerLoading && meta.sketchKind.isDefined) {
      SketchStore.forDir(new Path(indexDir, Metastore.SketchDir),
        spark.sparkContext.hadoopConfiguration).preload()
    }
    val relationOptions = options.filterNot(_._1.startsWith("spark.sql.index."))
    SparkInternals.fsRelation(
      spark, fileIndex, meta.partitionSchema, meta.dataSchema, relationOptions,
      meta.source)
  }
}

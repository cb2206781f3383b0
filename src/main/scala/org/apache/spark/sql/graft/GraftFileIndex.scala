package org.apache.spark.sql.graft

import java.util.concurrent.atomic.LongAdder

import org.apache.hadoop.fs.{BlockLocation, FileStatus, LocatedFileStatus, Path}

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.sources.{And => SAnd, Filter}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.util.SerializableConfiguration

import graft.index.{BlockStats, FileEntry, FileStatsRow, FilterFold, IndexConf, IndexFilesTable, IndexMetadata, SketchStore}

/** The product: a Spark [[FileIndex]] that serves the file listing from the
  * persisted index metadata and prunes partitions AND files inside
  * `listFiles(partitionFilters, dataFilters)`.
  *
  * Design delta vs the reference (SURVEY.md §7.1 #1): since Spark 3.0 the
  * data filters arrive here directly, so no custom planner Strategy and no
  * mutable setIndexFilters side channel (the reference's
  * MetastoreIndex.scala:80-84 hack) are needed — stock FileSourceStrategy
  * drives the index, and the full predicate is still applied after the scan,
  * keeping pruning purely an optimization.
  *
  * Scale design: metadata.json is an O(partitions) summary; per-file stats
  * live in the `files` parquet table. Tables below
  * `spark.sql.index.pruning.distributedThreshold` files fold on the driver
  * from a cached read of that table; larger tables run the SAME fold as a
  * Spark job over it (executors probe sketches for their own survivor
  * slices), and only surviving entries ever reach the driver.
  */
class GraftFileIndex(
    spark: SparkSession,
    val indexDir: Path,
    val meta: IndexMetadata,
    val conf: IndexConf)
  extends FileIndex with Logging {

  def this(spark: SparkSession, indexDir: Path, meta: IndexMetadata) =
    this(spark, indexDir, meta, IndexConf(spark))

  private val hadoopConf = spark.sparkContext.hadoopConfiguration
  private val filesDir = new Path(indexDir, graft.index.Metastore.FilesDir)

  /** Partition value rows in files-table partitionIdx order. */
  private lazy val partitionValueRows: Seq[InternalRow] =
    meta.partitionValues.map { vals =>
      InternalRow.fromSeq(vals.zip(meta.partitionSchema.fields).map { case (s, f) =>
        IndexMetadata.castFromString(f.dataType, s)
      })
    }

  /** Driver-path file entries grouped by partitionIdx (cached per
    * instance, dropped by [[refresh]]; only used below the
    * distributed-pruning threshold). */
  @volatile private var entriesByPartitionCache: (Long, Map[Int, Seq[FileEntry]]) = _

  /** Snapshot epoch for every memo derived from the files table, bumped
    * by [[refresh]]. Guards the check-then-act race between a memo
    * computation and a concurrent refresh: a load that BEGAN before the
    * refresh may legitimately serve its pre-refresh snapshot to the
    * in-flight caller (the documented stale-serve contract), but must
    * never be INSTALLED after the refresh cleared the memos — an
    * unguarded install would resurrect exactly the stale file list /
    * kth bound that refresh() exists to kill, and a stale kth bound
    * makes the injected top-k range cut unsound. */
  private val snapshotEpoch = new java.util.concurrent.atomic.AtomicLong()

  /** Epoch-guarded get-or-compute: every memo entry is TAGGED with the
    * epoch it was computed under, and a reader serves an entry only if
    * its tag equals the CURRENT epoch. This closes the install/clear
    * race completely: an install that sneaks past refresh()'s clear
    * (computed pre-refresh, landed post-clear) carries a stale tag and
    * is therefore invisible to every subsequent reader — it just sits
    * until the next compute replaces it. The in-flight caller that
    * began before the refresh still gets its own pre-refresh snapshot
    * back (the documented stale-serve contract), but no OTHER caller
    * can ever be served it. */
  private def memoized[K, V](cache: scala.collection.concurrent.Map[K, (Long, V)],
      key: K)(compute: => V): V = {
    val e = snapshotEpoch.get()
    cache.get(key) match {
      case Some((ep, v)) if ep == e => v
      case stale =>
        val v = compute
        if (snapshotEpoch.get() == e) stale match {
          case Some(old) => cache.replace(key, old, (e, v))
          case None => cache.putIfAbsent(key, (e, v))
        }
        v
    }
  }

  private def entriesByPartition: Map[Int, Seq[FileEntry]] = {
    val e = snapshotEpoch.get()
    entriesByPartitionCache match {
      case (ep, c) if ep == e && c != null => c
      case _ =>
        val c = IndexFilesTable.readAll(filesDir, hadoopConf)
          .groupBy(_.partitionIdx).view.mapValues(_.map(_.toEntry)).toMap
        // epoch-tagged install, same contract as memoized(): a stale
        // assignment that lands after refresh()'s clear carries an old
        // tag and is never served to later callers
        if (snapshotEpoch.get() == e) entriesByPartitionCache = (e, c)
        c
    }
  }

  private def sketchStore: SketchStore =
    SketchStore.forDir(new Path(indexDir, graft.index.Metastore.SketchDir), hadoopConf)

  /** files-scanned telemetry for the last listFiles call (read by tests
    * and the bench harness). */
  @volatile var lastListedFiles: Long = -1L
  @volatile var lastTotalFiles: Long = meta.fileCount
  /** True iff the last listFiles pruning ran as a Spark job. */
  @volatile var lastPrunedDistributed: Boolean = false

  override def rootPaths: Seq[Path] = meta.rootPathStrings.map(new Path(_))

  override def partitionSchema: StructType = meta.partitionSchema

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {

    // 1. partition pruning — interpreted predicate over partition values
    //    (reference ParquetIndex.prunePartitions, ParquetIndex.scala:112-145)
    val keptPartitions: Seq[(Int, InternalRow)] = {
      val all = partitionValueRows.zipWithIndex.map(_.swap)
      if (partitionFilters.isEmpty || meta.partitionSchema.isEmpty) all
      else {
        val pred = SparkInternals.compilePredicate(partitionFilters, meta.partitionSchema)
        all.filter { case (_, values) => pred(values) }
      }
    }
    val allPartitionsKept = keptPartitions.size == meta.partitionValues.size

    // 2. index pruning — translate data filters, keep those fully covered
    //    by indexed columns (reference IndexSourceStrategy.scala:63-66),
    //    And-reduce, fold per file.
    val indexed = meta.indexedColumns.map(_.toLowerCase)
    // Membership predicates over an element-domain (array) or key-domain
    // (map) index field pre-translate to ordinary source filters the
    // fold answers from member min/max + dict/bloom membership (Spark's
    // own translateFilter has no collection predicates — without this,
    // array/map fields would never prune):
    //   - array_contains(col, v)        → EqualTo(col, v): a file with
    //     no element == v cannot hold a containing row;
    //   - arrays_overlap(col, literal)  → In(col, nonNullElems):
    //     overlap is true only on a shared NON-NULL element (null
    //     elements yield null, which the filter drops), so a file
    //     holding none of the literal's non-null elements cannot match
    //     — an all-null/empty literal gives In(col, []) = never true;
    //   - map_contains_key(m, k) — which ReplaceExpressions lowers to
    //     array_contains(map_keys(m), k) — and m[k] = v both cut by
    //     KEY membership of k.
    // Generic translated filters that happen to reference an
    // element/key-domain field (whole-collection comparisons) stay
    // fold-safe: Canon.fromExternal type-gates every value and degrades
    // mismatches to may-contain.
    import org.apache.spark.sql.catalyst.expressions.{ArrayContains, ArrayExists, ArraysOverlap, EqualTo => CEq, GetArrayStructFields, GetMapValue, GetStructField, LambdaFunction, MapKeys, NamedLambdaVariable, Literal => CLit}
    import org.apache.spark.sql.catalyst.CatalystTypeConverters.convertToScala
    def domainField(
        c: Expression,
        wanted: org.apache.spark.sql.types.StructField => Boolean): Option[String] =
      MetadataAggregates.dottedPath(c).flatMap { case (_, path) =>
        meta.indexSchema.fields.find(f =>
          f.name.equalsIgnoreCase(path) && wanted(f)).map(_.name)
      }
    def fieldNamed(
        path: String,
        wanted: org.apache.spark.sql.types.StructField => Boolean): Option[String] =
      meta.indexSchema.fields.find(f =>
        f.name.equalsIgnoreCase(path) && wanted(f)).map(_.name)
    // `col.f` over `col: array<struct<...>>` extracts the per-element
    // leaf — decompose GetArrayStructFields chains (one array level, any
    // struct depth either side) back to the relation-level dotted path
    // the element-domain index field is named by.
    def arrayStructPath(e: Expression): Option[String] = e match {
      case g: GetArrayStructFields =>
        val inner = g.child match {
          case c: GetArrayStructFields => arrayStructPath(c)
          case other => MetadataAggregates.dottedPath(other).map(_._2)
        }
        inner.map(_ + "." + g.field.name)
      case _ => None
    }
    // The collection whose MEMBERS the probe tests: an array column
    // indexed on its element domain, a struct-leaf extraction over an
    // array of structs, or map_keys(m) over a map column indexed on its
    // key domain (map_contains_key(m, k) optimizes to
    // array_contains(map_keys(m), k), so both spellings land here).
    def memberField(c: Expression): Option[String] = c match {
      case MapKeys(m) => domainField(m, graft.index.IndexMetadata.isMapKey)
      case org.apache.spark.sql.catalyst.expressions.MapValues(m) =>
        MetadataAggregates.dottedPath(m).flatMap { case (_, path) =>
          fieldNamed(graft.index.IndexMetadata.mapValueFieldName(path),
            graft.index.IndexMetadata.isMapValue)
        }
      case g: GetArrayStructFields =>
        arrayStructPath(g).flatMap(
          fieldNamed(_, graft.index.IndexMetadata.isArrayElement))
      case _ => domainField(c, graft.index.IndexMetadata.isArrayElement)
    }
    // Leaf path of `e` INSIDE the lambda element `v` ("" = the element
    // itself), via GetStructField hops only.
    def lambdaLeaf(e: Expression, v: NamedLambdaVariable): Option[String] = e match {
      case x: NamedLambdaVariable if x.exprId == v.exprId => Some("")
      case g: GetStructField =>
        lambdaLeaf(g.child, v).map { p =>
          if (p.isEmpty) g.extractFieldName else p + "." + g.extractFieldName
        }
      case _ => None
    }
    // Translate one conjunct of an exists() lambda into an element-domain
    // source filter: the element witnessing exists=TRUE satisfies every
    // conjunct, so each comparison against a literal is individually a
    // sound membership/range cut over the leaf's element domain. The
    // bare element (`rel == ""`) resolves through memberField, so
    // exists() over map_keys/map_values cuts by the key/value domain
    // too. Untranslatable conjuncts drop out (And keeps what it can).
    def existsConjunct(arr: Expression, v: NamedLambdaVariable,
        pred: Expression): Seq[Filter] = {
      lazy val arrPath: Option[String] =
        MetadataAggregates.dottedPath(arr).map(_._2).orElse(arrayStructPath(arr))
      def field(leafE: Expression): Option[String] =
        lambdaLeaf(leafE, v).flatMap { rel =>
          if (rel.isEmpty) memberField(arr)
          else arrPath.flatMap(p =>
            fieldNamed(p + "." + rel, graft.index.IndexMetadata.isArrayElement))
        }
      import org.apache.spark.sql.catalyst.expressions.{And => CAnd, GreaterThan => CGt, GreaterThanOrEqual => CGe, In => CIn, InSet, LessThan => CLt, LessThanOrEqual => CLe}
      pred match {
        case CAnd(l, r) => existsConjunct(arr, v, l) ++ existsConjunct(arr, v, r)
        case CEq(le, CLit(x, xt)) if x != null =>
          field(le).map(n => org.apache.spark.sql.sources.EqualTo(
            n, convertToScala(x, xt)): Filter).toSeq
        case CEq(CLit(x, xt), le) if x != null =>
          field(le).map(n => org.apache.spark.sql.sources.EqualTo(
            n, convertToScala(x, xt)): Filter).toSeq
        case CIn(le, vs) if vs.nonEmpty && vs.forall {
            case CLit(x, _) => x != null; case _ => false } =>
          field(le).map(n => org.apache.spark.sql.sources.In(n,
            vs.map { case CLit(x, xt) => convertToScala(x, xt) }.toArray): Filter).toSeq
        case InSet(le, hset) if hset != null && !hset.contains(null) =>
          field(le).map(n => org.apache.spark.sql.sources.In(n,
            hset.toArray.map(convertToScala(_, le.dataType))): Filter).toSeq
        case CGt(le, CLit(x, xt)) if x != null =>
          field(le).map(n => org.apache.spark.sql.sources.GreaterThan(
            n, convertToScala(x, xt)): Filter).toSeq
        case CGe(le, CLit(x, xt)) if x != null =>
          field(le).map(n => org.apache.spark.sql.sources.GreaterThanOrEqual(
            n, convertToScala(x, xt)): Filter).toSeq
        case CLt(le, CLit(x, xt)) if x != null =>
          field(le).map(n => org.apache.spark.sql.sources.LessThan(
            n, convertToScala(x, xt)): Filter).toSeq
        case CLe(le, CLit(x, xt)) if x != null =>
          field(le).map(n => org.apache.spark.sql.sources.LessThanOrEqual(
            n, convertToScala(x, xt)): Filter).toSeq
        // string predicates on a string leaf: the witnessing element's
        // leaf value must satisfy them, so the element domain's byte-range
        // (StartsWith) / exact-dict (Contains/EndsWith) verdicts apply
        case org.apache.spark.sql.catalyst.expressions.StartsWith(
            le, CLit(x, _)) if x != null =>
          field(le).map(n => org.apache.spark.sql.sources.StringStartsWith(
            n, x.toString): Filter).toSeq
        case org.apache.spark.sql.catalyst.expressions.Contains(
            le, CLit(x, _)) if x != null =>
          field(le).map(n => org.apache.spark.sql.sources.StringContains(
            n, x.toString): Filter).toSeq
        case org.apache.spark.sql.catalyst.expressions.EndsWith(
            le, CLit(x, _)) if x != null =>
          field(le).map(n => org.apache.spark.sql.sources.StringEndsWith(
            n, x.toString): Filter).toSeq
        // literal-on-the-left range forms flip the operator
        case CGt(CLit(x, xt), le) if x != null =>
          field(le).map(n => org.apache.spark.sql.sources.LessThan(
            n, convertToScala(x, xt)): Filter).toSeq
        case CGe(CLit(x, xt), le) if x != null =>
          field(le).map(n => org.apache.spark.sql.sources.LessThanOrEqual(
            n, convertToScala(x, xt)): Filter).toSeq
        case CLt(CLit(x, xt), le) if x != null =>
          field(le).map(n => org.apache.spark.sql.sources.GreaterThan(
            n, convertToScala(x, xt)): Filter).toSeq
        case CLe(CLit(x, xt), le) if x != null =>
          field(le).map(n => org.apache.spark.sql.sources.GreaterThanOrEqual(
            n, convertToScala(x, xt)): Filter).toSeq
        case _ => Nil
      }
    }
    // Any comparison on m[k] (against a literal) implies the row's map
    // HAS key k — a missing key makes GetMapValue null and every
    // comparison with null evaluates null, which the filter drops — so
    // key-domain membership of k always cuts; when the map's VALUE
    // domain is indexed too, the comparison additionally cuts by the
    // value domain (the witnessing entry (k, v) contributes v to the
    // file's value domain, so v must satisfy the pushed value filter).
    // The verdicts intersect through the And-reduce below.
    def mapCuts(c: Expression, k: Any, kt: org.apache.spark.sql.types.DataType,
        valueCut: Option[String => Filter]): Seq[Filter] = {
      val keyCut = domainField(c, graft.index.IndexMetadata.isMapKey).map(n =>
        org.apache.spark.sql.sources.EqualTo(n, convertToScala(k, kt)): Filter)
      val vCut = valueCut.flatMap { mk =>
        MetadataAggregates.dottedPath(c).flatMap { case (_, path) =>
          fieldNamed(graft.index.IndexMetadata.mapValueFieldName(path),
            graft.index.IndexMetadata.isMapValue).map(mk)
        }
      }
      keyCut.toSeq ++ vCut.toSeq
    }
    // value-side filter builder for one comparison op, literal-nullsafe:
    // a null literal yields no value cut (the key cut alone stays sound —
    // the comparison can never be TRUE, so pruning only by key presence
    // can never drop a passing row)
    def vf(v: Any, vt: org.apache.spark.sql.types.DataType)(
        mk: (String, Any) => Filter): Option[String => Filter] =
      Option(v).map(x => (n: String) => mk(n, convertToScala(x, vt)))
    // A map lookup by literal key: `m[k]` (GetMapValue) or
    // `element_at(m, k)` — the latter ONLY in its null-on-missing form
    // (ANSI element_at ERRORS on a missing key; pruning a file would
    // turn that error into silence)
    object MapLookup {
      def unapply(e: Expression)
          : Option[(Expression, Any, org.apache.spark.sql.types.DataType)] = e match {
        case GetMapValue(c, CLit(k, kt)) if k != null => Some((c, k, kt))
        case ea: org.apache.spark.sql.catalyst.expressions.ElementAt
            if ea.left.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] &&
              !ea.failOnError =>
          ea.right match {
            case CLit(k, kt) if k != null => Some((ea.left, k, kt))
            case _ => None
          }
        case _ => None
      }
    }
    // An array lookup by literal position: `arr[i]` (GetArrayItem) or
    // `element_at(arr, i)`, null-on-out-of-bounds forms only. A
    // comparison on the looked-up element being TRUE means SOME element
    // satisfies it — an element-domain membership/range cut.
    object ArrayLookup {
      def unapply(e: Expression): Option[Expression] = e match {
        case g: org.apache.spark.sql.catalyst.expressions.GetArrayItem
            if !g.failOnError && g.right.isInstanceOf[CLit] => Some(g.left)
        // element_at(arr, 0) throws INVALID_ARRAY_INDEX unconditionally
        // (even with failOnError=false, 1-based ordinals exclude 0) —
        // pruning files on it would turn that mandatory runtime error
        // into silent empty results, so only a non-null ordinal != 0
        // qualifies. GetArrayItem's 0-based ordinal has no such hole.
        case ea: org.apache.spark.sql.catalyst.expressions.ElementAt
            if ea.left.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
              !ea.failOnError =>
          ea.right match {
            case CLit(ord, _) if ord != null && ord != 0 => Some(ea.left)
            case _ => None
          }
        case _ => None
      }
    }
    // element-domain cut for a comparison on an array lookup
    def arrayCut(c: Expression, v: Any, vt: org.apache.spark.sql.types.DataType,
        mk: (String, Any) => Filter): Seq[Filter] =
      if (v == null) Nil
      else memberField(c).map(n => mk(n, convertToScala(v, vt))).toSeq
    val arrayElemFilters: Seq[Filter] = dataFilters.flatMap {
      case ArrayContains(c, CLit(v, vt)) if v != null =>
        memberField(c).map(n => org.apache.spark.sql.sources.EqualTo(n,
          convertToScala(v, vt)))
      case ArraysOverlap(l, r) =>
        val probed = (l, r) match {
          case (c, CLit(v, t: org.apache.spark.sql.types.ArrayType)) if v != null =>
            Some((c, v, t))
          case (CLit(v, t: org.apache.spark.sql.types.ArrayType), c) if v != null =>
            Some((c, v, t))
          case _ => None
        }
        probed.flatMap { case (c, v, t) =>
          memberField(c).map { n =>
            val elems = convertToScala(v, t).asInstanceOf[scala.collection.Seq[Any]]
              .filter(_ != null).toArray
            org.apache.spark.sql.sources.In(n, elems)
          }
        }
      // exists(col, x -> pred): a TRUE row has a witnessing element, so
      // every lambda conjunct comparing a struct leaf (or the element
      // itself) to a literal cuts by that leaf's element domain
      case ArrayExists(arr, LambdaFunction(pred, Seq(v: NamedLambdaVariable), _), _) =>
        existsConjunct(arr, v, pred)
      // m[k] ⊙ literal (either side, ⊙ ∈ {=, >, >=, <, <=}): key-domain
      // membership of k always cuts (see mapCuts), and the value domain
      // folds the comparison itself (equality via min/max + sketches,
      // ranges via min/max)
      case CEq(MapLookup(c, k, kt), CLit(v, vt)) if k != null =>
        mapCuts(c, k, kt, vf(v, vt)(org.apache.spark.sql.sources.EqualTo))
      case CEq(CLit(v, vt), MapLookup(c, k, kt)) if k != null =>
        mapCuts(c, k, kt, vf(v, vt)(org.apache.spark.sql.sources.EqualTo))
      // null-safe equality: m[k] <=> null is TRUE for rows WITHOUT key k,
      // so only the non-null-literal form may cut at all
      case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
          MapLookup(c, k, kt), CLit(v, vt)) if k != null && v != null =>
        mapCuts(c, k, kt, vf(v, vt)(org.apache.spark.sql.sources.EqualTo))
      case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(
          CLit(v, vt), MapLookup(c, k, kt)) if k != null && v != null =>
        mapCuts(c, k, kt, vf(v, vt)(org.apache.spark.sql.sources.EqualTo))
      case org.apache.spark.sql.catalyst.expressions.GreaterThan(
          MapLookup(c, k, kt), CLit(v, vt)) if k != null =>
        mapCuts(c, k, kt, vf(v, vt)(org.apache.spark.sql.sources.GreaterThan))
      case org.apache.spark.sql.catalyst.expressions.GreaterThan(
          CLit(v, vt), MapLookup(c, k, kt)) if k != null =>
        mapCuts(c, k, kt, vf(v, vt)(org.apache.spark.sql.sources.LessThan))
      case org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
          MapLookup(c, k, kt), CLit(v, vt)) if k != null =>
        mapCuts(c, k, kt, vf(v, vt)(org.apache.spark.sql.sources.GreaterThanOrEqual))
      case org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
          CLit(v, vt), MapLookup(c, k, kt)) if k != null =>
        mapCuts(c, k, kt, vf(v, vt)(org.apache.spark.sql.sources.LessThanOrEqual))
      case org.apache.spark.sql.catalyst.expressions.LessThan(
          MapLookup(c, k, kt), CLit(v, vt)) if k != null =>
        mapCuts(c, k, kt, vf(v, vt)(org.apache.spark.sql.sources.LessThan))
      case org.apache.spark.sql.catalyst.expressions.LessThan(
          CLit(v, vt), MapLookup(c, k, kt)) if k != null =>
        mapCuts(c, k, kt, vf(v, vt)(org.apache.spark.sql.sources.GreaterThan))
      case org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
          MapLookup(c, k, kt), CLit(v, vt)) if k != null =>
        mapCuts(c, k, kt, vf(v, vt)(org.apache.spark.sql.sources.LessThanOrEqual))
      case org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
          CLit(v, vt), MapLookup(c, k, kt)) if k != null =>
        mapCuts(c, k, kt, vf(v, vt)(org.apache.spark.sql.sources.GreaterThanOrEqual))
      // m[k] IN (v1, ...): key presence + value-domain membership of any
      // non-null probe value (null probes never match — an all-null list
      // leaves the never-true In(field, []) cut, sound like the empty-IN
      // join probe)
      case org.apache.spark.sql.catalyst.expressions.In(
          MapLookup(c, k, kt), vs) if k != null && vs.nonEmpty &&
          vs.forall(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal]) =>
        val values = vs.collect {
          case CLit(x, xt) if x != null => convertToScala(x, xt)
        }
        mapCuts(c, k, kt, Some(n => org.apache.spark.sql.sources.In(n, values.toArray)))
      case org.apache.spark.sql.catalyst.expressions.InSet(
          MapLookup(c, k, kt), hset)
          if k != null && hset != null =>
        val vt = c.dataType.asInstanceOf[org.apache.spark.sql.types.MapType].valueType
        val values = hset.toArray.filter(_ != null).map(convertToScala(_, vt))
        mapCuts(c, k, kt, Some(n => org.apache.spark.sql.sources.In(n, values)))
      // m[k] IS NOT NULL: a missing key yields null, so only rows whose
      // map has key k (with a non-null value) can pass — key membership
      // of k is again a sound file cut (value unknown: no value cut)
      case org.apache.spark.sql.catalyst.expressions.IsNotNull(
          MapLookup(c, k, kt)) if k != null =>
        mapCuts(c, k, kt, None)
      // arr[i] ⊙ lit / element_at(arr, i) ⊙ lit (null-on-out-of-bounds
      // forms): TRUE requires the looked-up ELEMENT to satisfy ⊙, so the
      // element domain folds the comparison directly
      case CEq(ArrayLookup(c), CLit(v, vt)) =>
        arrayCut(c, v, vt, org.apache.spark.sql.sources.EqualTo)
      case CEq(CLit(v, vt), ArrayLookup(c)) =>
        arrayCut(c, v, vt, org.apache.spark.sql.sources.EqualTo)
      case org.apache.spark.sql.catalyst.expressions.GreaterThan(
          ArrayLookup(c), CLit(v, vt)) =>
        arrayCut(c, v, vt, org.apache.spark.sql.sources.GreaterThan)
      case org.apache.spark.sql.catalyst.expressions.GreaterThan(
          CLit(v, vt), ArrayLookup(c)) =>
        arrayCut(c, v, vt, org.apache.spark.sql.sources.LessThan)
      case org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
          ArrayLookup(c), CLit(v, vt)) =>
        arrayCut(c, v, vt, org.apache.spark.sql.sources.GreaterThanOrEqual)
      case org.apache.spark.sql.catalyst.expressions.GreaterThanOrEqual(
          CLit(v, vt), ArrayLookup(c)) =>
        arrayCut(c, v, vt, org.apache.spark.sql.sources.LessThanOrEqual)
      case org.apache.spark.sql.catalyst.expressions.LessThan(
          ArrayLookup(c), CLit(v, vt)) =>
        arrayCut(c, v, vt, org.apache.spark.sql.sources.LessThan)
      case org.apache.spark.sql.catalyst.expressions.LessThan(
          CLit(v, vt), ArrayLookup(c)) =>
        arrayCut(c, v, vt, org.apache.spark.sql.sources.GreaterThan)
      case org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
          ArrayLookup(c), CLit(v, vt)) =>
        arrayCut(c, v, vt, org.apache.spark.sql.sources.LessThanOrEqual)
      case org.apache.spark.sql.catalyst.expressions.LessThanOrEqual(
          CLit(v, vt), ArrayLookup(c)) =>
        arrayCut(c, v, vt, org.apache.spark.sql.sources.GreaterThanOrEqual)
      case _ => Nil
    }
    val indexFilters: Seq[Filter] = (dataFilters
      .flatMap(SparkInternals.translateFilter) ++ arrayElemFilters)
      .filter(_.references.forall(r => indexed.contains(r.toLowerCase)))

    val distributed = meta.fileCount >= conf.distributedPruningThreshold
    lastPrunedDistributed = false
    val statusByPartition: Map[Int, Seq[FileStatusWithMetadata]] = indexFilters match {
      case Nil =>
        survivorsUnfiltered(keptPartitions.map(_._1), allPartitionsKept, distributed)
      case fs =>
        val combined = fs.reduce(SAnd)
        val pruned =
          if (distributed) {
            lastPrunedDistributed = true
            distributedPrune(combined, keptPartitions.map(_._1).toSet, allPartitionsKept)
          } else {
            driverPrune(combined, keptPartitions.map(_._1))
          }
        pruned.map { case (idx, es) =>
          idx -> GraftFileIndex.wrapEager(es.map(toFileStatus).toArray)
        }
    }

    val counted = new LongAdder
    val emptyStatuses: Seq[FileStatusWithMetadata] = Nil
    val result = keptPartitions.map { case (idx, values) =>
      val kept = statusByPartition.getOrElse(idx, emptyStatuses)
      counted.add(kept.length.toLong)
      SparkInternals.partitionDirectory(values, kept)
    }
    lastListedFiles = counted.sum()
    lastTotalFiles = meta.fileCount
    if (indexFilters.nonEmpty) {
      logInfo(s"graft index pruning: kept $lastListedFiles/$lastTotalFiles files " +
        s"(distributed=$lastPrunedDistributed) for filters ${indexFilters.mkString(", ")}")
    }
    result.filter(_.files.nonEmpty) match {
      // keep at least the empty listing shape Spark expects
      case Nil if meta.partitionSchema.isEmpty =>
        Seq(SparkInternals.partitionDirectory(InternalRow.empty, Array.empty[FileStatus]))
      case dirs => dirs
    }
  }

  /** No index filters: the listing is every file of the kept partitions,
    * materialized straight to per-partition [[FileStatus]] arrays — the
    * exact shape the v1 contract retains — with no per-file
    * intermediates (no case-class rows, no FileEntry, no boxed Row
    * fields; compact UnsafeRows dropped as each status is built, and an
    * empty-locations fast path skipping JSON parsing). This is the one
    * intrinsically O(files) driver cost left; every unselective
    * InMemoryFileIndex scan pays the same.
    *
    * MEASURED finding (UnselectiveProbe at 999,680 files, four
    * materialization variants): the LIVE footprint is invariant at
    * ~630 B/file (~600 MB) — Spark's own
    * FileStatus+Path+URI+PartitionDirectory shape owns those bytes, so
    * only the v1 contract itself (a streamed/v2 listing) could shrink
    * them. What the intermediates DID control is the transient
    * allocation under the build (1.29 GB → 1.01 GB at equal
    * wall-clock); toLocalIterator streaming would cut that to ~0.86 GB
    * but costs +60% wall-clock (serialized per-partition fetches).
    * Driver sizing guidance lives in the README conf section. */
  private def survivorsUnfiltered(
      keptIdx: Seq[Int],
      allPartitionsKept: Boolean,
      distributed: Boolean): Map[Int, Seq[FileStatusWithMetadata]] = {
    if (!distributed) {
      keptIdx.map(i =>
        i -> GraftFileIndex.wrapEager(
          entriesByPartition.getOrElse(i, Nil).map(toFileStatus).toArray)).toMap
    } else {
      // big table, no cacheable driver copy — stream only the slim
      // listing columns of the kept partitions (partitionIdx pushdown +
      // column pruning into the files table; no stats/schema blobs).
      //
      // The EXECUTORS pack each scan partition of the files table into
      // ONE columnar [[PackedListing]] (primitive arrays + a single
      // UTF-8 basename blob, paths split into interned parent + name,
      // block locations parsed THERE into flattened primitive arrays
      // with interned host sets — the driver never holds per-file JSON
      // strings or BlockLocation objects). The packing itself is
      // garbage-light: no boxing (ArrayBuilder.ofLong/ofInt), no json4s
      // on the hot path (a byte-level parser for the writer's own
      // compact location shape; json4s only as a fallback for foreign
      // JSON), no per-file Strings (parent/host interning compares raw
      // bytes against the previous row's — directory runs make that hit
      // nearly always).
      //
      // The driver HOLDS only the packed arrays: each partition's
      // `files` is a lazy [[LazyFileSeq]] over contiguous ranges of the
      // packed data that materializes a [[SlimFileStatus]] /
      // [[SlimLocatedFileStatus]] (and its Path / BlockLocations) per
      // access — scan planning touches each file once — so the v1
      // listing's HELD footprint drops from ~630 B/file (eager
      // FileStatus+Path+URI+BlockLocation) to the ~110 B/file of the
      // packed columns, and the listing allocates no per-file objects
      // at all.
      val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      import classic.implicits._
      var ds = classic.read.parquet(filesDir.toString)
      if (!allPartitionsKept) ds = ds.where($"partitionIdx".isin(keptIdx: _*))
      val proj = ds.select($"partitionIdx", $"path", $"size",
        $"modificationTime", $"blockSize", $"locationsJson")
      val packed = proj.queryExecution.toRdd.mapPartitions { it =>
        val b = new PackedListingBuilder
        while (it.hasNext) b.add(it.next())
        if (b.isEmpty) Iterator.empty else Iterator.single(b.result())
      }.collect()
      val ranges = new java.util.HashMap[Int,
        scala.collection.mutable.ArrayBuffer[(PackedListing, Int, Int)]]()
      packed.foreach { p =>
        var r = 0
        while (r < p.runIdx.length) {
          val from = p.runStart(r)
          val to = if (r + 1 < p.runStart.length) p.runStart(r + 1) else p.numFiles
          var buf = ranges.get(p.runIdx(r))
          if (buf == null) {
            buf = new scala.collection.mutable.ArrayBuffer[(PackedListing, Int, Int)]()
            ranges.put(p.runIdx(r), buf)
          }
          buf += ((p, from, to))
          r += 1
        }
      }
      val out = Map.newBuilder[Int, Seq[FileStatusWithMetadata]]
      ranges.forEach { (k, v) =>
        out += (k.intValue -> new LazyFileSeq(v.toArray))
      }
      out.result()
    }
  }

  /** Can this index's sketches sharpen any verdict in the filter tree?
    * Equality/IN: any sketch kind. Substring (Contains/EndsWith): ONLY
    * the exact dictionary — loading bloom/bitmap bytes for a
    * substring-only tree would be pure IO with zero pruning power. */
  private def sketchCanRefine(combined: Filter): Boolean =
    FilterFold.usesMembership(combined) ||
      (meta.sketchKind.contains(graft.index.Sketch.Dict) &&
        FilterFold.usesSubstring(combined))

  /** Driver-side two-pass fold (min/max, then pruned sketch refinement);
    * the reference's per-file Futures (ParquetIndex.scala:166-178) become
    * a parallel stream. */
  private def driverPrune(
      combined: Filter,
      keptIdx: Seq[Int]): Map[Int, Seq[FileEntry]] = {
    def prune(fs: Seq[FileEntry])(mayContain: FileEntry => Boolean): Seq[FileEntry] =
      if (fs.size < 64) fs.filter(mayContain)
      else {
        import scala.jdk.CollectionConverters._
        fs.asJava.parallelStream().filter(f => mayContain(f))
          .collect(java.util.stream.Collectors.toList[FileEntry]).asScala.toSeq
      }
    keptIdx.map { idx =>
      val files = entriesByPartition.getOrElse(idx, Nil)
      // Pass 1: min/max-only fold — no sketch IO.
      val survivors = prune(files)(f =>
        FilterFold.fileMayContain(combined, f.blocks, _ => None, meta.indexSchema))
      // Pass 2: sketches refine equality/IN verdicts, loaded in ONE pruned
      // parquet read restricted to the survivor set. Range-only queries
      // skip sketch IO entirely.
      val kept =
        if (meta.sketchKind.isDefined && survivors.nonEmpty &&
            sketchCanRefine(combined)) {
          val store = sketchStore
          store.ensureLoaded(survivors.map(_.path))
          prune(survivors)(f =>
            FilterFold.fileMayContain(
              combined, f.blocks, col => store.sketchFor(f.path, col),
              meta.indexSchema))
        } else survivors
      idx -> kept
    }.toMap
  }

  /** The same fold as a Spark job over the files table: executors parse
    * their slice's stats, apply min/max, then probe sketches for their own
    * survivors (pruned `file IN` reads). Only surviving entries are
    * collected — driver residency is O(survivors) regardless of table
    * size. */
  private def distributedPrune(
      combined: Filter,
      keptIdx: Set[Int],
      allPartitionsKept: Boolean): Map[Int, Seq[FileEntry]] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val schemaJson = meta.indexSchema.json
    val useMembership = meta.sketchKind.isDefined && sketchCanRefine(combined)
    val sketchDirStr = new Path(indexDir, graft.index.Metastore.SketchDir).toString
    val confBc = spark.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    val filterBc = spark.sparkContext.broadcast(combined)
    var ds = classic.read.parquet(filesDir.toString).as[FileStatsRow]
    if (!allPartitionsKept) ds = ds.where($"partitionIdx".isin(keptIdx.toSeq: _*))
    val survivors = ds.mapPartitions { it =>
      val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
      val filter = filterBc.value
      val minMax = it.filter(r => FilterFold.fileMayContain(
        filter, IndexMetadata.blocksFromJsonString(r.blocksJson), _ => None, schema))
      val kept =
        if (!useMembership) minMax
        else {
          val surv = minMax.toVector
          if (surv.isEmpty) Iterator.empty
          else {
            val store = new SketchStore(new Path(sketchDirStr), confBc.value.value)
            store.ensureLoaded(surv.map(_.path))
            surv.iterator.filter(r => FilterFold.fileMayContain(
              filter, IndexMetadata.blocksFromJsonString(r.blocksJson),
              col => store.sketchFor(r.path, col), schema))
          }
        }
      // ship only the slim listing columns back to the driver
      kept.map(_.toListRow)
    }.collect()
    survivors.toSeq.groupBy(_.partitionIdx).view.mapValues(_.map(_.toEntry)).toMap
  }

  // ---- metadata-only aggregates (MetadataAggregateRule) ----------------
  // Memoized per FileIndex instance (= per query) so optimizer fixed-point
  // iterations never recompute; same two-tier driver/Spark-job design as
  // listFiles pruning.

  private val metaAggCache =
    new scala.collection.concurrent.TrieMap[Seq[String], (Long, MetaTableAgg)]()
  private val metaAggByPartCache =
    new scala.collection.concurrent.TrieMap[Seq[String], (Long, Map[Int, MetaTableAgg])]()
  private val metaDistinctCache =
    new scala.collection.concurrent.TrieMap[String, (Long, Option[Seq[Any]])]()

  /** Partition indices whose value rows satisfy every filter — the same
    * interpreted-predicate pruning listFiles step 1 applies, exposed so
    * [[MetadataAggregateRule]] consumes a partition-only Filter exactly. */
  def matchingPartitions(filters: Seq[Expression]): Seq[Int] = {
    if (filters.isEmpty || meta.partitionSchema.isEmpty) partitionValueRows.indices
    else {
      val pred = SparkInternals.compilePredicate(filters, meta.partitionSchema)
      partitionValueRows.zipWithIndex.collect { case (row, i) if pred(row) => i }
    }
  }

  /** Catalyst value of partition column `fieldIdx` for partition `idx`. */
  def partitionValue(idx: Int, fieldIdx: Int): Any = {
    val f = meta.partitionSchema.fields(fieldIdx)
    partitionValueRows(idx).get(fieldIdx, f.dataType)
  }

  def partitionCount: Int = meta.partitionValues.size

  /** [[metadataStats]] keyed by partitionIdx: the per-partition folds the
    * filtered/grouped metadata-aggregate paths merge driver-side. Driver
    * residency is O(partitions × cols) small structs — the same order as
    * `meta.partitionValues` itself, which already lives on the driver.
    * Partitions with no files are absent (callers treat missing as the
    * zero fold). Distributed tier: one files-table job emitting per-task
    * partial maps, merged pairwise — no shuffle, partials are
    * metadata-sized. */
  def metadataStatsByPartition(colsIn: Seq[String]): Map[Int, MetaTableAgg] = {
    val cols = colsIn.sorted
    memoized(metaAggByPartCache, cols) {
      if (meta.fileCount < conf.distributedPruningThreshold) {
        entriesByPartition.map { case (idx, fs) =>
          idx -> fs.foldLeft(MetadataAggregates.zero(cols)) { (acc, f) =>
            MetadataAggregates.foldFile(acc, f.blocks, cols)
          }
        }
      } else {
        val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        import classic.implicits._
        val colsB = cols
        def mergeMaps(a: Map[Int, MetaTableAgg], b: Map[Int, MetaTableAgg]) =
          (a.keySet ++ b.keySet).iterator.map { k =>
            k -> ((a.get(k), b.get(k)) match {
              case (Some(x), Some(y)) => x merge y
              case (x, y) => x.orElse(y).get
            })
          }.toMap
        // only the two needed columns reach the deserializer — the
        // files table also carries per-file schema/location blobs that
        // would otherwise dominate a 50k-row fold
        classic.read.parquet(filesDir.toString)
          .select($"partitionIdx", $"blocksJson").as[(Int, String)].rdd
          .mapPartitions { it =>
            val m = scala.collection.mutable.HashMap.empty[Int, MetaTableAgg]
            it.foreach { case (idx, blocksJson) =>
              val acc = m.getOrElse(idx, MetadataAggregates.zero(colsB))
              m(idx) = MetadataAggregates.foldFile(
                acc, IndexMetadata.blocksFromJsonString(blocksJson), colsB)
            }
            Iterator.single(m.toMap)
          }
          .fold(Map.empty[Int, MetaTableAgg])(mergeMaps)
      }
    }
  }

  /** Fold row counts / null counts / bounds for `cols` (index-schema
    * names) over every file of the index. */
  def metadataStats(colsIn: Seq[String]): MetaTableAgg = {
    val cols = colsIn.sorted
    memoized(metaAggCache, cols) {
      if (meta.fileCount < conf.distributedPruningThreshold) {
        entriesByPartition.valuesIterator.flatten
          .foldLeft(MetadataAggregates.zero(cols)) { (acc, f) =>
            MetadataAggregates.foldFile(acc, f.blocks, cols)
          }
      } else {
        val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        import classic.implicits._
        val colsB = cols
        // column-pruned like metadataStatsByPartition: blocksJson only
        classic.read.parquet(filesDir.toString)
          .select($"blocksJson").as[String].rdd
          .mapPartitions { it =>
            var acc = MetadataAggregates.zero(colsB)
            it.foreach { blocksJson =>
              acc = MetadataAggregates.foldFile(
                acc, IndexMetadata.blocksFromJsonString(blocksJson), colsB)
            }
            Iterator.single(acc)
          }
          .fold(MetadataAggregates.zero(colsB))(_ merge _)
      }
    }
  }

  /** Exact distinct (non-null, canonical) values of an indexed column, if
    * the index carries an EXACT membership sketch for it (dict/bitmap —
    * bloom cannot enumerate) and the set stays within `cap`. The union is
    * computed by a Spark job over the sketch table (executors
    * deserialize their slice; only value sets cross to the driver). */
  def metadataDistinct(colName: String, dt: org.apache.spark.sql.types.DataType,
      cap: Int): Option[Seq[Any]] = {
    memoized(metaDistinctCache, colName) {
      val sketchPath = new Path(indexDir, graft.index.Metastore.SketchDir)
      val exact = meta.sketchKind.exists(k =>
        graft.index.Sketch.resolveKind(k, dt) != graft.index.Sketch.Bloom)
      if (!exact) None
      else if (!sketchPath.getFileSystem(hadoopConf).exists(sketchPath)) {
        // sketch table absent (e.g. zero-file table): no values at all
        if (meta.fileCount == 0) Some(Nil) else None
      } else {
        val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        import classic.implicits._
        val partials = classic.read.parquet(sketchPath.toString)
          .where($"column" === colName)
          .select($"kind", $"data").as[(String, Array[Byte])]
          .rdd.mapPartitions { it =>
            val set = new java.util.HashSet[Any]()
            var exactUnion = true
            it.foreach { case (kind, bytes) =>
              if (exactUnion && set.size <= cap) {
                graft.index.Sketch.deserialize(kind, bytes) match {
                  case d: graft.index.DictSketch => set.addAll(d.set)
                  case b: graft.index.BitmapSketch =>
                    b.bm.forEach(new org.roaringbitmap.IntConsumer {
                      override def accept(i: Int): Unit = { set.add(i.toLong); () }
                    })
                  case _ => exactUnion = false // bloom row: cannot enumerate
                }
              }
            }
            Iterator.single(if (exactUnion && set.size <= cap) Some(set) else None)
          }.collect()
        if (partials.exists(_.isEmpty)) None
        else {
          val union = new java.util.HashSet[Any]()
          partials.foreach(p => union.addAll(p.get))
          if (union.size > cap) None
          else {
            import scala.jdk.CollectionConverters._
            Some(union.asScala.toSeq)
          }
        }
      }
    }
  }

  /** Canonical threshold for index-backed TOP-K pruning
    * ([[graft.index.TopK.topKPruned]]). With `largest = true`, finds T =
    * the kth best LOWER bound over the per-block multiset
    * {min_b × nonNull_b}: at least k non-null values of `colName` are
    * >= T, so `colName >= T` provably preserves any
    * `ORDER BY colName DESC (nulls last) LIMIT k` result — and that
    * range predicate is exactly what [[listFiles]] prunes whole files
    * with. Mirrored via block maxes for `largest = false`. Blocks with
    * unknown null counts or missing bounds contribute no guarantee
    * (weaker T, never unsound); truncated string bounds stay sound here
    * because T is used as a bound, not an answer. None = not computable
    * (fewer than k guaranteed non-null values, or a string column above
    * the distributed threshold) — callers skip pruning.
    *
    * Scale: driver fold below the distributed-pruning threshold; above
    * it, a metadata-sized sort over the files table plus the classic
    * two-pass kth-element walk (per-partition totals collected — one
    * Long per task — then ONE partition scanned), so the driver never
    * holds per-file state. */
  def topKBound(colName: String, dt: org.apache.spark.sql.types.DataType,
      k: Long, largest: Boolean): Option[Any] = {
    require(k >= 1, s"k must be >= 1: $k")

    // (guaranteed bound, guaranteed non-null count) per row-group
    def blockPairs(blocks: Seq[BlockStats]): Iterator[(Any, Long)] =
      blocks.iterator.flatMap { b =>
        b.columns.get(colName) match {
          case Some(cs) =>
            val bound = if (largest) cs.min else cs.max
            (bound, cs.nullCount) match {
              case (Some(bd), Some(nc)) if b.rowCount - nc > 0 =>
                Iterator.single((bd, b.rowCount - nc))
              case _ => Iterator.empty
            }
          case None => Iterator.empty
        }
      }

    if (meta.fileCount < conf.distributedPruningThreshold) {
      val pairs = entriesByPartition.valuesIterator.flatten
        .flatMap(f => blockPairs(f.blocks)).toArray
      val best = new Ordering[(Any, Long)] {
        override def compare(a: (Any, Long), b: (Any, Long)): Int = {
          val c = graft.index.Canon.compare(a._1, b._1)
          if (largest) -c else c
        }
      }
      val sorted = pairs.sorted(best)
      var rem = k
      var i = 0
      var ans: Option[Any] = None
      while (i < sorted.length && rem > 0) {
        ans = Some(sorted(i)._1); rem -= sorted(i)._2; i += 1
      }
      if (rem > 0) None else ans
    } else if (dt == org.apache.spark.sql.types.StringType) {
      // string keys fold distributed too: the canonical String domain
      // sorts in UTF-8 binary order (Canon.compare). Footer-TRUNCATED
      // bounds stay sound here — a truncated lower bound still lower-
      // bounds every value of its block (and upper bounds upper-bound),
      // which is all the kth-walk guarantee needs.
      distributedKthWalk[String](colName, k, largest,
        { case s: String => s })(GraftFileIndex.Utf8Ordering, implicitly)
    } else {
      distributedKthWalk[Long](colName, k, largest, { case l: Long => l })(
        Ordering.Long, implicitly)
    }
  }

  /** The distributed kth-element walk shared by [[topKBound]]'s Long and
    * String canonical domains: one files-table job emits (bound,
    * nonNullCount) pairs, a distributed sort orders them, per-partition
    * totals (one Long per task) locate the kth element's partition, and
    * ONE partition is scanned — the driver never holds per-file state. */
  private def distributedKthWalk[K](
      colName: String, k: Long, largest: Boolean,
      extract: PartialFunction[Any, K])(
      implicit ord: Ordering[K], ct: scala.reflect.ClassTag[K]): Option[K] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    val (colB, largestB) = (colName, largest)
    val extractB = extract
    val sorted = classic.read.parquet(filesDir.toString).as[FileStatsRow].rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          IndexMetadata.blocksFromJsonString(r.blocksJson).iterator.flatMap { b =>
            b.columns.get(colB) match {
              case Some(cs) =>
                val bound = (if (largestB) cs.min else cs.max).collect(extractB)
                (bound, cs.nullCount) match {
                  case (Some(bd), Some(nc)) if b.rowCount - nc > 0 =>
                    Iterator.single((bd, b.rowCount - nc))
                  case _ => Iterator.empty
                }
              case None => Iterator.empty
            }
          }
        }
      }
      .sortBy(_._1, ascending = !largestB)
    val partTotals = sorted
      .mapPartitionsWithIndex((i, it) => Iterator.single((i, it.map(_._2).sum)))
      .collect().sortBy(_._1)
    var rem = k
    var target = -1
    partTotals.foreach { case (i, s) =>
      if (target < 0) { if (rem <= s) target = i else rem -= s }
    }
    if (target < 0) None
    else {
      val (remB, targetB) = (rem, target)
      sorted.mapPartitionsWithIndex { (i, it) =>
        if (i != targetB) Iterator.empty
        else {
          var need = remB
          var ans: Option[K] = None
          while (it.hasNext && need > 0) {
            val (bd, c) = it.next(); ans = Some(bd); need -= c
          }
          Iterator.single(ans)
        }
      }.collect().headOption.flatten
    }
  }

  /** Per-index memo of [[topKBound]] results: the optimizer's
    * fixed-point iterations (TopKRewriteRule) and repeated queries over
    * one live index must not redo the fold — metadata is an immutable
    * snapshot, and [[refresh]] drops the memos when that snapshot is
    * replaced (a stale kth bound would inject a `key >= T` cut proven
    * on files the refresh removed, silently dropping new top-k rows). */
  private val topKBoundCache =
    new scala.collection.concurrent.TrieMap[(String, Long, Boolean), (Long, Option[Any])]()

  def topKBoundCached(colName: String, dt: org.apache.spark.sql.types.DataType,
      k: Long, largest: Boolean): Option[Any] =
    memoized(topKBoundCache, (colName, k, largest)) {
      topKBound(colName, dt, k, largest)
    }

  private val topKGroupBoundCache =
    new scala.collection.concurrent.TrieMap[(String, Long, Boolean), (Long, Option[Any])]()

  def topKBoundByPartitionsCached(colName: String,
      dt: org.apache.spark.sql.types.DataType,
      k: Long, largest: Boolean): Option[Any] =
    memoized(topKGroupBoundCache, (colName, k, largest)) {
      topKBoundByPartitions(colName, dt, k, largest)
    }

  /** The GROUPED sibling of [[topKBound]]: the WEAKEST per-partition
    * TOP-K bound — T = the least favorable (min for `largest = true`)
    * over partitions of that partition's own kth-best per-block lower
    * bound. `col >= T` then provably preserves EVERY partition group's
    * `ORDER BY col DESC (nulls last) LIMIT k` result at once, as one
    * plain range predicate [[listFiles]] prunes files with. None unless
    * EVERY partition that has files proves a bound (a group with fewer
    * than k guaranteed non-null values admits rows below any cutoff, so
    * no global cut is sound).
    *
    * Scale: driver fold below the distributed threshold; above it one
    * files-table job folds each partition's block multiset inside
    * `groupByKey(partitionIdx).mapGroups` (a partition's BLOCK STATS
    * must fit a task — metadata-sized, orders of magnitude under the
    * data itself) and only #partitions bounds reach the driver. */
  def topKBoundByPartitions(colName: String,
      dt: org.apache.spark.sql.types.DataType,
      k: Long, largest: Boolean): Option[Any] = {
    require(k >= 1, s"k must be >= 1: $k")

    def blockPairs(blocks: Seq[BlockStats]): Iterator[(Any, Long)] =
      blocks.iterator.flatMap { b =>
        b.columns.get(colName) match {
          case Some(cs) =>
            val bound = if (largest) cs.min else cs.max
            (bound, cs.nullCount) match {
              case (Some(bd), Some(nc)) if b.rowCount - nc > 0 =>
                Iterator.single((bd, b.rowCount - nc))
              case _ => Iterator.empty
            }
          case None => Iterator.empty
        }
      }
    def kthWalk(pairs: Array[(Any, Long)]): Option[Any] = {
      val best = new Ordering[(Any, Long)] {
        override def compare(a: (Any, Long), b: (Any, Long)): Int = {
          val c = graft.index.Canon.compare(a._1, b._1)
          if (largest) -c else c
        }
      }
      val sorted = pairs.sorted(best)
      var rem = k
      var i = 0
      var ans: Option[Any] = None
      while (i < sorted.length && rem > 0) {
        ans = Some(sorted(i)._1); rem -= sorted(i)._2; i += 1
      }
      if (rem > 0) None else ans
    }
    def weakest(bounds: Seq[Option[Any]]): Option[Any] =
      if (bounds.isEmpty || bounds.exists(_.isEmpty)) None
      else Some(bounds.flatten.reduce { (a, b) =>
        val c = graft.index.Canon.compare(a, b)
        if (largest) { if (c <= 0) a else b } else { if (c >= 0) a else b }
      })

    if (meta.fileCount < conf.distributedPruningThreshold) {
      weakest(entriesByPartition.valuesIterator.map { fs =>
        kthWalk(fs.iterator.flatMap(f => blockPairs(f.blocks)).toArray)
      }.toSeq)
    } else if (dt == org.apache.spark.sql.types.StringType) {
      val perPart = distributedGroupedFold[String](colName, k, largest,
        { case s: String => s }, sentinel = "")(
        GraftFileIndex.Utf8Ordering, org.apache.spark.sql.Encoders.STRING)
      weakest(perPart.toSeq.map(_.map(_.asInstanceOf[Any])))
    } else {
      val perPart = distributedGroupedFold[Long](colName, k, largest,
        { case l: Long => l }, sentinel = 0L)(
        Ordering.Long, org.apache.spark.sql.Encoders.scalaLong)
      weakest(perPart.toSeq.map(_.map(_.asInstanceOf[Any])))
    }
  }

  /** The distributed grouped kth fold shared by [[topKBoundByPartitions]]'
    * Long and String canonical domains: each partition's block multiset
    * folds inside `groupByKey(partitionIdx).mapGroups`, and only
    * #partitions bounds reach the driver. */
  private def distributedGroupedFold[K](
      colName: String, k: Long, largest: Boolean,
      extract: PartialFunction[Any, K], sentinel: K)(
      implicit ord: Ordering[K],
      kEnc: org.apache.spark.sql.Encoder[K]): Array[Option[K]] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import classic.implicits._
    import org.apache.spark.sql.Encoders
    val enc = Encoders.tuple(Encoders.scalaInt, kEnc, Encoders.scalaLong)
    val enc2 = Encoders.tuple(Encoders.scalaBoolean, kEnc)
    val (colB, largestB, kB) = (colName, largest, k)
    val (extractB, sentinelB, ordB) = (extract, sentinel, ord)
    classic.read.parquet(filesDir.toString)
      .select($"partitionIdx", $"blocksJson").as[(Int, String)]
      .flatMap { case (idx, blocksJson) =>
        val pairs = IndexMetadata.blocksFromJsonString(blocksJson).iterator.flatMap { b =>
          b.columns.get(colB) match {
            case Some(cs) =>
              val bound = (if (largestB) cs.min else cs.max).collect(extractB)
              (bound, cs.nullCount) match {
                case (Some(bd), Some(nc)) if b.rowCount - nc > 0 =>
                  Iterator.single((idx, bd, b.rowCount - nc))
                case _ => Iterator.empty
              }
            case None => Iterator.empty
          }
        }.toSeq
        // a file whose blocks yield no usable pairs still admits any
        // value — emit a zero-count sentinel so its partition reaches
        // the grouped fold (and folds to None there) instead of
        // silently dropping out, which would make the cut unsound
        if (pairs.isEmpty) Seq((idx, sentinelB, 0L)) else pairs
      }(enc)
      .groupByKey(_._1)
      .mapGroups { (_: Int, it: Iterator[(Int, K, Long)]) =>
        val pairs = it.filter(_._3 > 0).map(t => (t._2, t._3)).toArray
        // explicit reverse ordering: negating a Long key overflows on
        // Long.MinValue and would break the walked-bounds invariant
        val sorted =
          if (largestB) pairs.sortBy(_._1)(ordB.reverse)
          else pairs.sortBy(_._1)(ordB)
        var rem = kB
        var i = 0
        var ans: Option[K] = None
        while (i < sorted.length && rem > 0) {
          ans = Some(sorted(i)._1); rem -= sorted(i)._2; i += 1
        }
        // Option doesn't encode generically: (found, value) tuple instead
        if (rem > 0) (false, sentinelB) else (true, ans.get)
      }(enc2)
      .collect()
      .map { case (found, v) => if (found) Some(v) else None }
  }

  private def toFileStatus(f: FileEntry): FileStatus = {
    val base = new FileStatus(
      f.size, false, 1, f.blockSize, f.modificationTime, new Path(f.path))
    if (f.locations.isEmpty) base
    else new LocatedFileStatus(base, f.locations.map(l =>
      new BlockLocation(l.hosts.toArray, l.hosts.toArray, l.offset, l.length)).toArray)
  }

  override def inputFiles: Array[String] =
    IndexFilesTable.readPaths(filesDir, hadoopConf).toArray

  /** Drop EVERY snapshot-derived memo along with the shared files-table
    * cache: an instance held across an index refresh must re-prove
    * aggregates, distinct sets, and top-k bounds against the new
    * snapshot — a stale kth bound in particular would turn the injected
    * top-k range cut unsound (files the refresh removed could have
    * proven a tighter T than the new data supports). */
  override def refresh(): Unit = {
    // ordering matters against a RACING memo computation (see
    // snapshotEpoch): invalidate the files-table cache FIRST (a compute
    // that starts after this point reads fresh data), THEN bump the
    // epoch (a compute that started before it can no longer install),
    // THEN drop the memos. A compute that lands in the middle at worst
    // skips installing a fresh value — never installs a stale one.
    IndexFilesTable.invalidate(filesDir)
    snapshotEpoch.incrementAndGet()
    entriesByPartitionCache = null
    metaAggCache.clear()
    metaAggByPartCache.clear()
    metaDistinctCache.clear()
    topKBoundCache.clear()
    topKGroupBoundCache.clear()
  }

  /** Whole-table size — the sound pre-filter estimate the v1 FileIndex
    * contract expects (filters arrive only at listFiles time, AFTER join
    * strategies are chosen, so the pruned size cannot inform the initial
    * plan). A heavily-pruned indexed scan still becomes a broadcast side
    * at runtime via AQE's re-plan (shuffle stage materializes the pruned
    * output, `spark.sql.adaptive.autoBroadcastJoinThreshold` converts
    * the join) — the idiomatic Spark path, not a stats hack here. */
  override def sizeInBytes: Long = meta.totalBytes
}

object GraftFileIndex {
  /** UTF-8 binary order on canonical Strings — a named serializable
    * Ordering (lambda/comparator wrappers don't survive task
    * serialization in the distributed sort). */
  object Utf8Ordering extends Ordering[String] {
    override def compare(a: String, b: String): Int = graft.index.Canon.compare(a, b)
  }

  /** Eager statuses (small-table cache / pruned survivors) → the
    * listing's wrapper type, same shape PartitionDirectory.apply builds. */
  private[graft] def wrapEager(files: Array[FileStatus]): Seq[FileStatusWithMetadata] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(
      files.map(FileStatusWithMetadata(_)))
}

/** A [[FileStatus]] that DEFERS Path construction: at 10^6 files the
  * eager Path (and its internal URI — several string copies of the full
  * path each) owned most of the unselective listing's driver footprint.
  * The slim form keeps the shared parent Path, a slice of the partition's
  * basename blob, and the numeric fields, and materializes a real Path
  * only when a consumer calls getPath() (scan planning touches only the
  * files that survive pruning; the unselective listing itself never
  * does). Value-equal to the eager form: getPath resolves to the same
  * path, and every numeric accessor reads the same stored field. */
private[graft] final class SlimFileStatus(
    size: Long, mtime: Long, blockSize: Long,
    parent: Path, nameBlob: Array[Byte], nameStart: Int, nameEnd: Int)
  extends FileStatus(size, false, 1, blockSize, mtime, null) {
  override def getPath: Path = new Path(parent,
    new String(nameBlob, nameStart, nameEnd - nameStart, "UTF-8"))
}

/** One scan partition's flattened block-location data, shared by all of
  * its [[SlimLocatedFileStatus]]es: parallel (offset, length, hostSetId)
  * arrays plus the interned host sets. One object reference per file
  * instead of per-file BlockLocation[] + hosts arrays. */
private[graft] final class SlimLocPool(
    val offsets: Array[Long], val lengths: Array[Long],
    val hostIds: Array[Int], val hostSets: Array[Array[String]])

/** [[SlimFileStatus]]'s located twin: defers BOTH Path construction and
  * BlockLocation materialization. The eager form held, per file, a
  * BlockLocation[] + BlockLocation + two host-array copies + the
  * Path+URI — together most of the ~630 B/file the unselective listing
  * kept live. The slim form keeps three ints and two shared refs; a
  * consumer that asks (scan planning asks only for files that survive
  * pruning) gets freshly built, value-identical BlockLocations. */
private[graft] final class SlimLocatedFileStatus(
    size: Long, mtime: Long, blockSize: Long,
    parent: Path, nameBlob: Array[Byte], nameStart: Int, nameEnd: Int,
    pool: SlimLocPool, blockStart: Int, blockEnd: Int)
  extends LocatedFileStatus(size, false, 1, blockSize, mtime, 0L,
    null, null, null, null, null, null) {
  override def getPath: Path = new Path(parent,
    new String(nameBlob, nameStart, nameEnd - nameStart, "UTF-8"))
  override def getBlockLocations: Array[BlockLocation] = {
    val out = new Array[BlockLocation](blockEnd - blockStart)
    var i = 0
    while (i < out.length) {
      val b = blockStart + i
      val hosts = pool.hostSets(pool.hostIds(b))
      out(i) = new BlockLocation(hosts, hosts, pool.offsets(b), pool.lengths(b))
      i += 1
    }
    out
  }
}

/** Executor-side builder packing one scan partition of the files table
  * into a [[PackedListing]]. Garbage-light by construction: primitive
  * ArrayBuilders (no boxing), raw-byte parent/host interning against the
  * previous row (directory and host runs make the cache hit ~always), a
  * byte-level parser for the writer's own compact locations shape
  * (json4s only as fallback for foreign JSON), and a single growable
  * basename blob. */
private[graft] final class PackedListingBuilder {
  import scala.collection.mutable.ArrayBuilder
  private val sizes = new ArrayBuilder.ofLong
  private val mtimes = new ArrayBuilder.ofLong
  private val blockSizes = new ArrayBuilder.ofLong
  private val parentOf = new ArrayBuilder.ofInt
  private val parents = new scala.collection.mutable.ArrayBuffer[String]()
  private val parentIdx = new java.util.HashMap[String, Integer]()
  private var blob = new Array[Byte](1 << 16)
  private var blobLen = 0
  private val offsets = new ArrayBuilder.ofInt
  offsets += 0
  private val locAt = new ArrayBuilder.ofInt
  private val locBlockEnd = new ArrayBuilder.ofInt
  private val locOffsets = new ArrayBuilder.ofLong
  private val locLengths = new ArrayBuilder.ofLong
  private val locHostIds = new ArrayBuilder.ofInt
  private val hostSets = new scala.collection.mutable.ArrayBuffer[Array[String]]()
  private val hostIdx = new java.util.HashMap[String, Integer]()
  private val runIdx = new ArrayBuilder.ofInt
  private val runStart = new ArrayBuilder.ofInt
  private var lastRunIdx = -1
  private var n = 0
  private var nBlocks = 0
  private var lastParent: Array[Byte] = null
  private var lastParentId = -1
  private var lastHostSeg: Array[Byte] = null
  private var lastHostSegId = -1
  // per-file scratch reused across rows (grown rarely, no steady garbage)
  private var scratchOff = new Array[Long](4)
  private var scratchLen = new Array[Long](4)
  private var scratchHost = new Array[Int](4)
  // reusable row-bytes buffers: UTF8String.writeToMemory into these
  // instead of getBinary's fresh copy per row (~150 MB of transient
  // byte[]s at 10^6 files otherwise)
  private var pathBuf = new Array[Byte](256)
  private var locBuf = new Array[Byte](256)

  def isEmpty: Boolean = n == 0

  def add(r: InternalRow): Unit = {
    val pIdx = r.getInt(0)
    if (n == 0 || pIdx != lastRunIdx) {
      runIdx += pIdx; runStart += n; lastRunIdx = pIdx
    }
    sizes += r.getLong(2)
    mtimes += r.getLong(3)
    blockSizes += r.getLong(4)
    val pu = r.getUTF8String(1)
    val pbLen = pu.numBytes
    if (pbLen > pathBuf.length) {
      pathBuf = new Array[Byte](Integer.highestOneBit(pbLen) * 2)
    }
    pu.writeToMemory(pathBuf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    val pb = pathBuf
    var cut = pbLen - 1
    while (cut >= 0 && pb(cut) != '/') cut -= 1
    val plen = math.max(cut, 0)
    val pid =
      if (lastParent != null && plen == lastParent.length &&
          java.util.Arrays.equals(pb, 0, plen, lastParent, 0, plen)) {
        lastParentId
      } else {
        val ps =
          if (cut <= 0) "/"
          else new String(pb, 0, cut, java.nio.charset.StandardCharsets.UTF_8)
        var pi = parentIdx.get(ps)
        if (pi == null) {
          parents += ps
          pi = Integer.valueOf(parents.length - 1)
          parentIdx.put(ps, pi)
        }
        lastParent = java.util.Arrays.copyOfRange(pb, 0, plen)
        lastParentId = pi.intValue
        lastParentId
      }
    parentOf += pid
    val nlen = pbLen - cut - 1
    if (blobLen + nlen > blob.length) {
      blob = java.util.Arrays.copyOf(blob, math.max(blob.length * 2, blobLen + nlen))
    }
    System.arraycopy(pb, cut + 1, blob, blobLen, nlen)
    blobLen += nlen
    offsets += blobLen
    n += 1
    if (!r.isNullAt(5)) {
      val lu = r.getUTF8String(5)
      val lbLen = lu.numBytes
      if (lbLen > 2) {
        if (lbLen > locBuf.length) {
          locBuf = new Array[Byte](Integer.highestOneBit(lbLen) * 2)
        }
        lu.writeToMemory(locBuf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
        addLocations(locBuf, lbLen)
      }
    }
  }

  private def addLocations(b: Array[Byte], bLen: Int): Unit = {
    val k = parseInto(b, bLen)
    if (k > 0) {
      locAt += n - 1
      var i = 0
      while (i < k) {
        locOffsets += scratchOff(i)
        locLengths += scratchLen(i)
        locHostIds += scratchHost(i)
        nBlocks += 1
        i += 1
      }
      locBlockEnd += nBlocks
    } else if (k < 0) {
      // any deviation from locationsToJsonString's compact shape
      val locs = IndexMetadata.locationsFromJsonString(
        new String(b, 0, bLen, java.nio.charset.StandardCharsets.UTF_8))
      if (locs.nonEmpty) {
        locAt += n - 1
        locs.foreach { l =>
          locOffsets += l.offset
          locLengths += l.length
          locHostIds += internHosts(l.hosts.toArray)
          nBlocks += 1
        }
        locBlockEnd += nBlocks
      }
    }
  }

  private def internHosts(hosts: Array[String]): Int = {
    val key = hosts.mkString(" ")
    var hi = hostIdx.get(key)
    if (hi == null) {
      hostSets += hosts
      hi = Integer.valueOf(hostSets.length - 1)
      hostIdx.put(key, hi)
    }
    hi.intValue
  }

  /** Raw host-list segment b[hs..he] (inclusive, '['..']') -> interned
    * id, via a byte compare against the previous segment first. */
  private def hostIdFor(b: Array[Byte], hs: Int, he: Int): Int = {
    val segLen = he - hs + 1
    if (lastHostSeg != null && segLen == lastHostSeg.length &&
        java.util.Arrays.equals(b, hs, he + 1, lastHostSeg, 0, segLen)) {
      return lastHostSegId
    }
    val hosts = new scala.collection.mutable.ArrayBuffer[String]()
    var r = hs + 1
    while (b(r) != ']') {
      if (b(r) == '"') {
        val s0 = r + 1
        var e0 = s0
        while (b(e0) != '"') e0 += 1
        hosts += new String(b, s0, e0 - s0, java.nio.charset.StandardCharsets.UTF_8)
        r = e0 + 1
      } else r += 1
    }
    val id = internHosts(hosts.toArray)
    lastHostSeg = java.util.Arrays.copyOfRange(b, hs, he + 1)
    lastHostSegId = id
    id
  }

  /** Parse `[[off,len,["h",...]],...]` into the scratch arrays. Returns
    * the block count, or -1 on ANY deviation (escapes, signs, spaces --
    * the caller falls back to the JSON library). */
  private def parseInto(b: Array[Byte], bLen: Int): Int = {
    var k = 0
    if (bLen < 2 || b(0) != '[') return -1
    var p = 1
    if (b(p) == ']') return if (p == bLen - 1) 0 else -1
    while (p < bLen) {
      if (b(p) != '[') return -1
      p += 1
      var off = 0L
      var any = false
      while (p < bLen && b(p) >= '0' && b(p) <= '9') {
        off = off * 10 + (b(p) - '0'); p += 1; any = true
      }
      if (!any || p >= bLen || b(p) != ',') return -1
      p += 1
      var len = 0L
      any = false
      while (p < bLen && b(p) >= '0' && b(p) <= '9') {
        len = len * 10 + (b(p) - '0'); p += 1; any = true
      }
      if (!any || p + 1 >= bLen || b(p) != ',' || b(p + 1) != '[') return -1
      val hs = p + 1
      var q = hs + 1
      while (q < bLen && b(q) != ']') {
        if (b(q) == '"') {
          q += 1
          while (q < bLen && b(q) != '"') {
            if (b(q) == '\\') return -1
            q += 1
          }
          if (q >= bLen) return -1
          q += 1
        } else if (b(q) == ',') q += 1
        else return -1
      }
      if (q >= bLen) return -1
      val hostId = hostIdFor(b, hs, q)
      p = q + 1
      if (p >= bLen || b(p) != ']') return -1
      p += 1
      if (k == scratchOff.length) {
        scratchOff = java.util.Arrays.copyOf(scratchOff, k * 2)
        scratchLen = java.util.Arrays.copyOf(scratchLen, k * 2)
        scratchHost = java.util.Arrays.copyOf(scratchHost, k * 2)
      }
      scratchOff(k) = off; scratchLen(k) = len; scratchHost(k) = hostId
      k += 1
      if (p >= bLen) return -1
      if (b(p) == ']') return if (p == bLen - 1) k else -1
      if (b(p) != ',') return -1
      p += 1
    }
    -1
  }

  def result(): PackedListing = new PackedListing(
    runIdx.result(), runStart.result(), n,
    sizes.result(), mtimes.result(), blockSizes.result(),
    parentOf.result(), parents.toArray,
    java.util.Arrays.copyOf(blob, blobLen), offsets.result(),
    locAt.result(), locBlockEnd.result(),
    locOffsets.result(), locLengths.result(), locHostIds.result(),
    hostSets.toArray)
}

/** One scan partition of the files table, packed into primitive columns
  * (the only per-file driver state the unselective listing holds).
  * `runIdx`/`runStart` delimit the contiguous partitionIdx runs so the
  * driver can slice per-partition ranges without per-file indices.
  * `status(i)` materializes the i-th file's slim FileStatus on demand. */
private[graft] final class PackedListing(
    val runIdx: Array[Int], val runStart: Array[Int], val numFiles: Int,
    sizes: Array[Long], mtimes: Array[Long], blockSizes: Array[Long],
    parentOf: Array[Int], parentStrs: Array[String],
    blob: Array[Byte], offsets: Array[Int],
    locAt: Array[Int], locBlockEnd: Array[Int],
    locOffsets: Array[Long], locLengths: Array[Long], locHostIds: Array[Int],
    hostSets: Array[Array[String]]) extends Serializable {
  @transient private lazy val parents: Array[Path] = parentStrs.map(new Path(_))
  @transient private lazy val pool: SlimLocPool =
    new SlimLocPool(locOffsets, locLengths, locHostIds, hostSets)
  def status(i: Int): FileStatus = {
    val li = java.util.Arrays.binarySearch(locAt, i)
    if (li >= 0) {
      val bEnd = locBlockEnd(li)
      val bStart = if (li == 0) 0 else locBlockEnd(li - 1)
      new SlimLocatedFileStatus(sizes(i), mtimes(i), blockSizes(i),
        parents(parentOf(i)), blob, offsets(i), offsets(i + 1),
        pool, bStart, bEnd)
    } else {
      new SlimFileStatus(sizes(i), mtimes(i), blockSizes(i),
        parents(parentOf(i)), blob, offsets(i), offsets(i + 1))
    }
  }
}

/** A PartitionDirectory `files` seq backed by [[PackedListing]] ranges:
  * the listing itself holds no per-file objects; each access builds a
  * fresh slim status (consumers -- scan planning, listing counters --
  * touch each file once, so the per-access construction is transient
  * young-gen work instead of a held 10^6-object graph). */
private[graft] final class LazyFileSeq(ranges: Array[(PackedListing, Int, Int)])
  extends scala.collection.immutable.IndexedSeq[FileStatusWithMetadata] {
  private[this] val cumEnd: Array[Int] = {
    val a = new Array[Int](ranges.length)
    var s = 0
    var i = 0
    while (i < ranges.length) { s += ranges(i)._3 - ranges(i)._2; a(i) = s; i += 1 }
    a
  }
  override val length: Int = if (cumEnd.isEmpty) 0 else cumEnd(cumEnd.length - 1)
  override def apply(k: Int): FileStatusWithMetadata = {
    if (k < 0 || k >= length) throw new IndexOutOfBoundsException(k.toString)
    var r = java.util.Arrays.binarySearch(cumEnd, k)
    r = if (r >= 0) r + 1 else -r - 1 // first range whose cumEnd > k
    val base = if (r == 0) 0 else cumEnd(r - 1)
    val (p, from, _) = ranges(r)
    FileStatusWithMetadata(p.status(from + (k - base)))
  }
}

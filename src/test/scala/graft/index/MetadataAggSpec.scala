package graft.index

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftFileIndex
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.implicits._

/** Metadata-only aggregates + transparent index substitution
  * (MetadataAggregateRule / AutoIndexSubstitutionRule): eligible
  * unfiltered aggregates over indexed relations must be answered from
  * index metadata with ZERO data files opened, every bail-out path must
  * leave the scan plan untouched but still correct, and (opt-in) plain
  * reads must be re-pointed at the pruning FileIndex. */
class MetadataAggSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val work = Files.createTempDirectory("graft-metaagg").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-metaagg")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config(IndexConf.MetastoreLocation, s"$work/metastore")
    .config("spark.sql.warehouse.dir", s"$work/warehouse")
    .getOrCreate()

  // 200 rows; code is null every 10th row, low-cardinality otherwise;
  // ship walks a date range. Written as 8 files so bounds/null counts
  // genuinely merge across files.
  private def sourceDf: DataFrame = {
    import spark.implicits._
    (1 to 200).toDF("i")
      .select(
        $"i".cast("long").as("id"),
        when($"i" % 10 === 0, lit(null: String))
          .otherwise(concat(lit("c"), ($"i" % 7).cast("string"))).as("code"),
        date_add(lit("2024-01-01").cast("date"), $"i").as("ship"))
  }

  private lazy val bloomTable = {
    val p = s"$work/bloom_t"
    sourceDf.repartition(8, col("id")).write.parquet(p)
    spark.index.create.mode("overwrite").indexBy("id", "code", "ship").parquet(p)
    p
  }

  private lazy val dictTable = {
    val p = s"$work/dict_t"
    sourceDf.repartition(8, col("id")).write.parquet(p)
    spark.index.create.mode("overwrite")
      .option(IndexConf.FilterType, "dict")
      .indexBy("id", "code", "ship").parquet(p)
    p
  }

  /** Walk through AQE wrappers to the real scans (a plain .collect stops
    * at the AdaptiveSparkPlanExec leaf). */
  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansOf(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scansOf(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scansOf)
  }

  /** Answered from metadata: optimized plan is a LocalRelation and the
    * executed plan opens no files. */
  private def assertMetadataOnly(df: DataFrame): Unit = {
    val opt = df.queryExecution.optimizedPlan
    assert(opt.collectFirst { case l: LocalRelation => l }.isDefined,
      s"expected LocalRelation in:\n$opt")
    df.collect()
    assert(scansOf(df.queryExecution.executedPlan).isEmpty,
      "metadata-only plan must not contain a file scan")
  }

  private def assertScans(df: DataFrame): Unit = {
    df.collect()
    assert(scansOf(df.queryExecution.executedPlan).nonEmpty,
      "expected the plan to keep its file scan")
  }

  test("count/min/max over long and date answered from metadata, values exact") {
    val agg = spark.index.parquet(bloomTable).agg(
      count(lit(1)).as("n"),
      count(col("code")).as("n_code"),
      min(col("id")).as("min_id"),
      max(col("id")).as("max_id"),
      min(col("ship")).as("min_ship"),
      max(col("ship")).as("max_ship"))
    assertMetadataOnly(agg)
    val expected = spark.read.parquet(bloomTable).agg(
      count(lit(1)), count(col("code")), min(col("id")), max(col("id")),
      min(col("ship")), max(col("ship"))).head
    assert(agg.head == expected)
  }

  test("min/max over double and decimal columns answered from metadata") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val p = s"$work/fp_t"
    (1 to 200).toDF("i")
      .select(
        $"i".cast("long").as("id"),
        ($"i".cast("double") * 1.25 - 100.0).as("price"),
        ($"i" % 40).cast(DecimalType(10, 2)).as("amt"))
      .repartition(8, col("id")).write.parquet(p)
    spark.index.create.mode("overwrite").indexBy("price", "amt").parquet(p)
    val agg = spark.index.parquet(p).agg(
      count(lit(1)).as("n"),
      min(col("price")).as("min_p"), max(col("price")).as("max_p"),
      min(col("amt")).as("min_a"), max(col("amt")).as("max_a"))
    assertMetadataOnly(agg)
    val expected = spark.read.parquet(p).agg(
      count(lit(1)), min(col("price")), max(col("price")),
      min(col("amt")), max(col("amt"))).head
    assert(agg.head == expected)
    // a NaN anywhere poisons the footer -> full-scan fallback patches ->
    // max answers NaN exactly as the scan would
    val p2 = s"$work/fp_nan_t"
    Seq(1.0, 2.0, Double.NaN, -0.5).toDF("price")
      .coalesce(2).write.parquet(p2)
    spark.index.create.mode("overwrite").indexBy("price").parquet(p2)
    val agg2 = spark.index.parquet(p2)
      .agg(min(col("price")).as("mn"), max(col("price")).as("mx"))
    assertMetadataOnly(agg2)
    val r = agg2.head
    assert(r.getDouble(0) == -0.5 && r.getDouble(1).isNaN)
  }

  test("min/max/count over NESTED leaves answered from metadata") {
    import spark.implicits._
    val p = s"$work/nested_meta_t"
    spark.range(0, 300).select(
        $"id",
        struct(($"id" % 50).as("user_id"),
          concat(lit("s"), $"id" % 5).as("status")).as("payload"))
      .repartition(4, col("id")).write.parquet(p)
    spark.index.create.mode("overwrite").indexBy("payload.user_id").parquet(p)
    def aggs(df: DataFrame) = df.agg(
      count(lit(1)).as("rows"),
      count(col("payload.user_id")).as("n"),
      min(col("payload.user_id")).as("mn"),
      max(col("payload.user_id")).as("mx"))
    val agg = aggs(spark.index.parquet(p))
    assertMetadataOnly(agg)
    assert(agg.head == aggs(spark.read.parquet(p)).head)
    // an unindexed nested leaf keeps the scan
    assertScans(spark.index.parquet(p).agg(min(col("payload.status"))))
  }

  test("dataset count() is metadata-only on an indexed relation") {
    val ds = spark.index.parquet(bloomTable)
    val opt = ds.groupBy().count().queryExecution.optimizedPlan
    assert(opt.collectFirst { case l: LocalRelation => l }.isDefined)
    assert(ds.count() == 200L)
  }

  test("SELECT DISTINCT over a dict-sketched string column is metadata-only, null included") {
    val d = spark.index.parquet(dictTable).select("code").distinct()
    assertMetadataOnly(d)
    val got = d.collect().map(r => Option(r.getString(0))).toSet
    val want = spark.read.parquet(dictTable).select("code").distinct()
      .collect().map(r => Option(r.getString(0))).toSet
    assert(got == want)
    assert(got.contains(None), "null must appear in the distinct set")
  }

  test("count(distinct)/min/max of a string column via the exact dict sketch") {
    val agg = spark.index.parquet(dictTable).agg(
      countDistinct(col("code")).as("n_codes"),
      min(col("code")).as("min_code"),
      max(col("code")).as("max_code"))
    assertMetadataOnly(agg)
    val expected = spark.read.parquet(dictTable).agg(
      countDistinct(col("code")), min(col("code")), max(col("code"))).head
    assert(agg.head == expected)
  }

  test("DISTINCT over a bitmap-sketched int column is metadata-only") {
    val p = s"$work/bitmap_t"
    sourceDf.select((col("id") % 5).cast("int").as("grp"), col("id"))
      .repartition(4, col("id")).write.parquet(p)
    spark.index.create.mode("overwrite")
      .option(IndexConf.FilterType, "dict") // int column upgrades to bitmap
      .indexBy("grp", "id").parquet(p)
    val d = spark.index.parquet(p).select("grp").distinct()
    assertMetadataOnly(d)
    assert(d.collect().map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2, 3, 4))
  }

  // Hive-partitioned by pyear (2024 + i%3); indexed id/code. 3 partitions
  // × multiple files, so per-partition folds genuinely merge.
  private lazy val partTable = {
    val p = s"$work/part_t"
    sourceDf.withColumn("pyear", (lit(2024) + col("id") % 3).cast("int"))
      .repartition(4, col("id"))
      .write.partitionBy("pyear").parquet(p)
    spark.index.create.mode("overwrite").indexBy("id", "code").parquet(p)
    p
  }

  test("partition-filtered global aggregate is metadata-only and exact") {
    val t = spark.index.parquet(partTable)
    val agg = t.filter(col("pyear") >= 2025).agg(
      count(lit(1)).as("n"),
      count(col("code")).as("n_code"),
      min(col("id")).as("min_id"),
      max(col("id")).as("max_id"))
    assertMetadataOnly(agg)
    val expected = spark.read.parquet(partTable).filter(col("pyear") >= 2025).agg(
      count(lit(1)), count(col("code")), min(col("id")), max(col("id"))).head
    assert(agg.head == expected)
  }

  test("GROUP BY partition column answered from per-partition folds") {
    val t = spark.index.parquet(partTable)
    val agg = t.groupBy(col("pyear")).agg(
      count(lit(1)).as("n"),
      min(col("id")).as("min_id"),
      max(col("id")).as("max_id")).orderBy(col("pyear"))
    assertMetadataOnly(agg)
    val expected = spark.read.parquet(partTable).groupBy(col("pyear")).agg(
      count(lit(1)).as("n"), min(col("id")).as("min_id"),
      max(col("id")).as("max_id")).orderBy(col("pyear"))
    assert(agg.collect().toSeq == expected.collect().toSeq)
  }

  test("partition-filtered GROUP BY with min/max over the partition column itself") {
    val t = spark.index.parquet(partTable)
    val agg = t.filter(col("pyear") =!= 2024).groupBy(col("pyear"))
      .agg(count(lit(1)).as("n"), max(col("pyear")).as("maxy"))
      .orderBy(col("pyear"))
    assertMetadataOnly(agg)
    val expected = spark.read.parquet(partTable).filter(col("pyear") =!= 2024)
      .groupBy(col("pyear")).agg(count(lit(1)).as("n"), max(col("pyear")).as("maxy"))
      .orderBy(col("pyear"))
    assert(agg.collect().toSeq == expected.collect().toSeq)
    // global min/max of the partition column too
    val g = t.agg(min(col("pyear")).as("mn"), max(col("pyear")).as("mx"),
      count(col("pyear")).as("n"))
    assertMetadataOnly(g)
    assert(g.head == spark.read.parquet(partTable)
      .agg(min(col("pyear")), max(col("pyear")), count(col("pyear"))).head)
  }

  test("SELECT DISTINCT partition column is metadata-only") {
    val d = spark.index.parquet(partTable).select("pyear").distinct().orderBy("pyear")
    assertMetadataOnly(d)
    assert(d.collect().map(_.getInt(0)).toSeq == Seq(2024, 2025, 2026))
  }

  test("partitioned bail-outs: data filter or data grouping keeps the scan") {
    val t = spark.index.parquet(partTable)
    // data-column filter blocks the rewrite
    val f = t.filter(col("id") > 100).agg(count(lit(1)).as("n"))
    assertScans(f)
    assert(f.head.getLong(0) == 100L)
    // mixed partition+data filter blocks too
    val m = t.filter(col("pyear") === 2025 && col("id") > 100).agg(count(lit(1)).as("n"))
    assertScans(m)
    assert(m.head.getLong(0) ==
      spark.read.parquet(partTable)
        .filter(col("pyear") === 2025 && col("id") > 100).count())
    // grouping by a data column blocks
    val g = t.groupBy(col("code")).agg(count(lit(1)).as("n"))
    assertScans(g)
    // filtered string min/max cannot use the (table-wide) dict fallback
    val s = t.filter(col("pyear") === 2025).agg(min(col("code")).as("m"))
    assertScans(s)
    assert(s.head.getString(0) ==
      spark.read.parquet(partTable).filter(col("pyear") === 2025)
        .agg(min(col("code"))).head.getString(0))
  }

  test("bail-outs keep the scan and stay correct") {
    val t = spark.index.parquet(bloomTable)
    // a filter blocks the rewrite
    val filtered = t.filter(col("id") > 100).agg(count(lit(1)).as("n"))
    assertScans(filtered)
    assert(filtered.head.getLong(0) == 100L)
    // string min/max without a dict sketch cannot come from (possibly
    // truncated) bounds
    val strMin = t.agg(min(col("code")).as("m"))
    assertScans(strMin)
    assert(strMin.head.getString(0) == "c0")
    // DISTINCT under bloom cannot enumerate
    val dist = t.select("code").distinct()
    assertScans(dist)
    assert(dist.count() == 8) // c0..c6 + null
    // unsupported aggregate (sum) blocks the whole rewrite
    val withSum = t.agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
    assertScans(withSum)
    assert(withSum.head.getLong(0) == 200L)
    // conf off: even eligible aggregates scan
    spark.conf.set(IndexConf.MetadataOnlyAggregates, "false")
    try {
      val off = t.agg(count(lit(1)).as("n"))
      assertScans(off)
      assert(off.head.getLong(0) == 200L)
    } finally spark.conf.set(IndexConf.MetadataOnlyAggregates, "true")
  }

  test("alias shadowing a partition column's name is not a partition filter") {
    // rand().as("pyear") blocks filter pushdown (nondeterministic), so the
    // Filter sits ABOVE the Project when the rule walks the tree — a
    // name-only gate would evaluate `pyear < 0.5` against the REAL
    // partition values (no partition year is < 0.5 → a wrong empty fold).
    // The exprId gate must bail to the scan instead.
    val t = spark.index.parquet(partTable)
    val shadowed = t.select(rand(42).as("pyear"), col("id"))
      .filter(col("pyear") < 0.5)
      .agg(count(lit(1)).as("n"))
    assertScans(shadowed)
    assert(shadowed.head.getLong(0) > 0L,
      "rand(42) < 0.5 keeps some of the 200 rows — a metadata fold over " +
        "partition values would have answered 0")
    // the same shape over a REAL partition column reference still rewrites
    val real = t.filter(col("pyear") >= 2025).agg(count(lit(1)).as("n"))
    assertMetadataOnly(real)
  }

  test("FP footer bounds: parquet-mr NaN-poisoning pinned, foreign writers distrusted") {
    import spark.implicits._
    // the unit gate: only parquet-mr provenance is trusted
    assert(StatisticsBuilder.fpFooterTrusted(Some("parquet-mr version 1.15.1 (build x)")))
    assert(!StatisticsBuilder.fpFooterTrusted(Some("parquet-cpp-arrow version 16.0.0")))
    assert(!StatisticsBuilder.fpFooterTrusted(Some("impala version 4.3")))
    assert(!StatisticsBuilder.fpFooterTrusted(None))
    // the EMPIRICAL pin behind that trust: the bundled writer must
    // NaN-POISON (or omit) double stats when NaN is present — if a future
    // parquet-mr switches to spec NaN-SKIPPING, clean bounds would stop
    // proving NaN absence and this assertion goes red before any index does
    val p = s"$work/fp_poison_pin"
    Seq(1.0, 2.0, Double.NaN, -0.5).toDF("price").coalesce(1).write.parquet(p)
    val file = new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(new org.apache.hadoop.fs.Path(p))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        file, spark.sparkContext.hadoopConfiguration))
    try {
      val meta = reader.getFooter
      assert(StatisticsBuilder.fpFooterTrusted(
        Option(meta.getFileMetaData.getCreatedBy)),
        s"Spark no longer writes via parquet-mr? created_by = " +
          meta.getFileMetaData.getCreatedBy)
      val st = meta.getBlocks.get(0).getColumns.get(0).getStatistics
      val cleanBounds = st != null && st.hasNonNullValue && {
        val mn = st.genericGetMin.asInstanceOf[java.lang.Double].doubleValue
        val mx = st.genericGetMax.asInstanceOf[java.lang.Double].doubleValue
        !mn.isNaN && !mx.isNaN
      }
      assert(!cleanBounds,
        "the bundled parquet-mr wrote clean (non-NaN) double bounds for a " +
          "NaN-bearing chunk — it now NaN-SKIPS, so fpFooterTrusted's " +
          "poisoning assumption is broken and FP footer trust must be revoked")
    } finally reader.close()
  }

  test("auto substitution: plain read served and pruned by the index when enabled") {
    spark.conf.set(IndexConf.AutoIndexSubstitution, "true")
    try {
      val df = spark.read.parquet(bloomTable).filter(col("id") === 7L)
      val rows = df.collect()
      assert(rows.length == 1 && rows.head.getAs[Long]("id") == 7L)
      val scan = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head
      val loc = scan.relation.location
      assert(loc.isInstanceOf[GraftFileIndex], s"expected GraftFileIndex, got $loc")
      val gfi = loc.asInstanceOf[GraftFileIndex]
      assert(gfi.lastListedFiles < gfi.lastTotalFiles,
        s"substituted scan should prune: ${gfi.lastListedFiles}/${gfi.lastTotalFiles}")
      // composes with the metadata-aggregate rewrite: a plain read's
      // count(*) also becomes metadata-only
      assertMetadataOnly(spark.read.parquet(bloomTable).agg(count(lit(1)).as("n")))
      // an unindexed path is untouched
      val plainDir = s"$work/unindexed"
      sourceDf.limit(10).write.parquet(plainDir)
      val un = spark.read.parquet(plainDir).filter(col("id") === 3L)
      un.collect()
      val unLoc = un.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }.head.relation.location
      assert(!unLoc.isInstanceOf[GraftFileIndex])
    } finally spark.conf.set(IndexConf.AutoIndexSubstitution, "false")
  }

  test("auto substitution off by default: plain read keeps its own listing") {
    val df = spark.read.parquet(bloomTable).filter(col("id") === 7L)
    df.collect()
    val loc = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }.head.relation.location
    assert(!loc.isInstanceOf[GraftFileIndex])
  }

  test("count over a metadata aggregate stays metadata-only (empty global agg)") {
    // Dataset.count() over an already-aggregated frame collapses the
    // inner aggregate into an EMPTY global aggregate over the relation
    // (no keys, no functions = always one empty row); without its own
    // rewrite case that shape pays a zero-column scan of EVERY file
    val t = spark.index.parquet(bloomTable)
    val inner = t.agg(count(lit(1)).as("n"), min(col("id")).as("mn"))
    assert(inner.count() == 1L)
    val counted = inner.groupBy().count()
    assertMetadataOnly(counted)
    assert(counted.head.getLong(0) == 1L)
    // the empty shape is sound under partition filters too (a global
    // aggregate yields one row whatever the input)
    val part = spark.index.parquet(partTable)
    assert(part.filter(col("pyear") >= 2025)
      .agg(max(col("id")).as("mx")).count() == 1L)
  }

  test("auto substitution composes with the top-k rewrite: plain read, plain orderBy().limit(), files cut") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical
    val p = s"$work/autosub_topk"
    graft.ops.Layout.clusterBy(
        spark.range(0, 4000).select($"id", ($"id" * 7 % 4001).as("v")), 8, col("id"))
      .write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("id").parquet(p)
    spark.conf.set(IndexConf.AutoIndexSubstitution, "true")
    try {
      // STOCK SPARK both ways: plain read + plain sort/limit — the
      // substitution re-points the scan at the index, then the rewrite
      // proves the bound on it
      val q = spark.read.parquet(p).orderBy($"id".desc).limit(20)
      val opt = q.queryExecution.optimizedPlan
      assert(opt.collectFirst { case f: logical.Filter => f }.isDefined,
        s"expected the injected bound through substitution:\n$opt")
      assert(
        q.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
          (3980L until 4000L).toSeq)
      q.collect()
      val fi = q.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.relation.location
      }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }
      assert(fi.isDefined, "substituted scan must use GraftFileIndex")
      assert(fi.get.lastListedFiles < fi.get.lastTotalFiles,
        s"composed cut: ${fi.get.lastListedFiles}/${fi.get.lastTotalFiles}")
    } finally spark.conf.unset(IndexConf.AutoIndexSubstitution)
  }

  test("auto substitution: appended files back the plan off (listing drift)") {
    import spark.implicits._
    val p = s"$work/drift_t"
    sourceDf.repartition(4, col("id")).write.mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("id").parquet(p)
    spark.conf.set(IndexConf.AutoIndexSubstitution, "true")
    try {
      def loc(df: DataFrame) = {
        df.collect()
        df.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s
        }.head.relation.location
      }
      assert(loc(spark.read.parquet(p)).isInstanceOf[GraftFileIndex],
        "freshly-indexed table must substitute")
      // same-schema append: the index snapshot no longer matches the
      // live listing — substitution must back off, keeping the NEW rows
      // visible (the silent-staleness case the file-count guard closes)
      sourceDf.select(($"id" + 1000L).as("id"), $"code", $"ship")
        .limit(5).coalesce(1).write.mode("append").parquet(p)
      val after = spark.read.parquet(p)
      assert(!loc(after).isInstanceOf[GraftFileIndex],
        "appended table must NOT be served by the stale index")
      assert(after.count() == 205L, "appended rows must stay visible")
      assert(after.filter($"id" === 1001L).count() == 1L)
      // refresh re-snapshots the listing: substitution resumes
      spark.index.refresh.parquet(p)
      val refreshed = spark.read.parquet(p)
      assert(loc(refreshed).isInstanceOf[GraftFileIndex],
        "refreshed index must substitute again")
      assert(refreshed.count() == 205L)
    } finally spark.conf.set(IndexConf.AutoIndexSubstitution, "false")
  }

  test("auto substitution: catalog-table relation served by the catalog index") {
    import spark.implicits._
    sourceDf.write.mode("overwrite").format("parquet")
      .saveAsTable("graft_autosub_tbl")
    try {
      spark.index.create.mode("overwrite").indexBy("id")
        .table("graft_autosub_tbl")
      spark.conf.set(IndexConf.AutoIndexSubstitution, "true")
      try {
        val t = spark.table("graft_autosub_tbl").filter($"id" === 7L)
        val rows = t.collect()
        assert(rows.length == 1 && rows.head.getAs[Long]("id") == 7L)
        val locs = t.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s.relation.location
        }
        assert(locs.head.isInstanceOf[GraftFileIndex],
          s"catalog relation must substitute, got ${locs.head}")
        // parity with the plain read
        spark.conf.set(IndexConf.AutoIndexSubstitution, "false")
        assert(t.collect().map(_.toString).sorted.sameElements(
          spark.table("graft_autosub_tbl").filter($"id" === 7L)
            .collect().map(_.toString).sorted))
      } finally spark.conf.set(IndexConf.AutoIndexSubstitution, "false")
    } finally spark.sql("DROP TABLE IF EXISTS graft_autosub_tbl")
  }

  test("auto substitution composes with DPP/AQE: star join prunes partitions") {
    import spark.implicits._
    val p = s"$work/autosub_dpp"
    sourceDf.withColumn("pt", ($"id" % 4L).cast("int"))
      .write.partitionBy("pt").mode("overwrite").parquet(p)
    spark.index.create.mode("overwrite").indexBy("id").parquet(p)
    // the dim must be FILE-BACKED: a LocalRelation's filter constant-
    // folds away and DPP sees no selective predicate
    (0 until 4).map(v => (v, if (v == 1) "keep" else "drop"))
      .toDF("pv", "tag").write.mode("overwrite").parquet(s"$work/autosub_dim")
    spark.conf.set(IndexConf.AutoIndexSubstitution, "true")
    try {
      val fact = spark.read.parquet(p)
      val dim = spark.read.parquet(s"$work/autosub_dim").filter($"tag" === "keep")
      val joined = fact.join(dim, fact("pt") === dim("pv"))
      // execute THIS QueryExecution so the inspected scan's metrics fill
      val n = joined.queryExecution.toRdd.count()
      assert(n == sourceDf.filter($"id" % 4L === 1L).count())
      def scans(pl: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = pl match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(scans)
      }
      val factScan = scans(joined.queryExecution.executedPlan)
        .find(_.relation.location.isInstanceOf[GraftFileIndex])
      assert(factScan.isDefined, "substituted fact scan must use GraftFileIndex")
      val total = factScan.get.relation.location
        .asInstanceOf[GraftFileIndex].lastTotalFiles
      val read = factScan.get.metrics("numFiles").value
      assert(read > 0, "metric must be populated (plan actually executed)")
      assert(read < total, s"DPP under substitution should cut files: $read/$total")
    } finally spark.conf.set(IndexConf.AutoIndexSubstitution, "false")
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    bloomTable
    dictTable
  }

  override def afterAll(): Unit = {
    try {
      spark.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(work))
    } finally super.afterAll()
  }
}

package graft.index

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.implicits._

/** ORC source support end-to-end: the same index engine (footer-analog
  * stripe statistics, sketches, pruning, refresh, SQL DDL) over ORC data
  * files. The reference ships parquet only behind its extensible
  * MetastoreSupport trait (MetastoreSupport.scala); this suite proves the
  * second implementation of that axis — results must equal plain
  * `spark.read.orc` row-for-row while scanning fewer files. */
class OrcIndexSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val work = Files.createTempDirectory("graft-orc").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-orc-e2e")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config(IndexConf.MetastoreLocation, s"$work/metastore")
    .config("spark.sql.warehouse.dir", s"$work/warehouse")
    .withExtensions(new graft.GraftExtensions)
    .getOrCreate()

  private lazy val tablePath = {
    val p = s"$work/orders_orc"
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_ordertime", col("o_orderdate").cast("timestamp"))
      .repartition(8, col("o_orderkey"))
      .write.orc(p)
    p
  }

  private def checkSame(indexed: DataFrame, plain: DataFrame): Unit = {
    val a = indexed.collect().map(_.toString).sorted
    val b = plain.collect().map(_.toString).sorted
    assert(a.length == b.length, s"row count: indexed=${a.length} plain=${b.length}")
    assert(a.sameElements(b), "row contents differ")
  }

  private def pruning(df: DataFrame): (Long, Long) = {
    val fi = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }
    assert(fi.nonEmpty, "no GraftFileIndex in plan")
    (fi.get.lastListedFiles, fi.get.lastTotalFiles)
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.index.create.mode("overwrite")
      .indexBy("o_orderkey", "o_orderstatus", "o_orderdate", "o_ordertime")
      .orc(tablePath)
  }

  test("point lookup: equality prunes via stripe stats + bloom, rows match") {
    val key = spark.read.orc(tablePath).agg(min(col("o_orderkey"))).head.getLong(0)
    val indexed = spark.index.orc(tablePath).filter(col("o_orderkey") === key)
    val plain = spark.read.orc(tablePath).filter(col("o_orderkey") === key)
    checkSame(indexed, plain)
    val (listed, total) = pruning(indexed)
    assert(total == 8L && listed < total, s"expected pruning: $listed/$total")
  }

  test("string equality and date range prune, rows match plain ORC scan") {
    val iStr = spark.index.orc(tablePath).filter(col("o_orderstatus") === "P")
    checkSame(iStr, spark.read.orc(tablePath).filter(col("o_orderstatus") === "P"))

    val d = spark.read.orc(tablePath)
      .agg(min(col("o_orderdate")).cast("string")).head.getString(0)
    val iDate = spark.index.orc(tablePath)
      .filter(col("o_orderdate") === lit(d).cast("date"))
    checkSame(iDate, spark.read.orc(tablePath)
      .filter(col("o_orderdate") === lit(d).cast("date")))
  }

  test("nested leaves index on ORC: stripe ids walk structs, parity + cut") {
    val p = s"$work/orc_nested"
    spark.range(0, 2000).select(
        col("id"),
        struct((col("id") % 500).as("user_id"),
          concat(lit("s"), col("id") % 5).as("status")).as("payload"))
      .repartitionByRange(8, col("payload.user_id"))
      .write.mode("overwrite").orc(p)
    spark.index.create.mode("overwrite")
      .indexBy("payload.user_id", "payload.status").orc(p)
    val q = spark.index.orc(p).filter(col("payload.user_id") <= 30L)
    checkSame(q, spark.read.orc(p).filter(col("payload.user_id") <= 30L))
    checkSame(
      spark.index.orc(p).filter(col("payload.status") === "s2"),
      spark.read.orc(p).filter(col("payload.status") === "s2"))
    q.collect()
    val (listed, total) = pruning(q)
    assert(listed < total, s"expected nested ORC cut: $listed/$total")
  }

  test("timestamp range prunes on a range-clustered ORC table") {
    val p = s"$work/orders_orc_ts"
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_ordertime", col("o_orderdate").cast("timestamp"))
      .repartitionByRange(8, col("o_ordertime"))
      .write.orc(p)
    spark.index.create.mode("overwrite").indexBy("o_ordertime").orc(p)
    val bounds = spark.read.orc(p)
      .agg(min(col("o_ordertime")).cast("date"), max(col("o_ordertime")).cast("date"))
      .head
    val lo = bounds.getDate(0).toString
    val indexed = spark.index.orc(p)
      .filter(col("o_ordertime") < lit(lo).cast("date").cast("timestamp") + expr("INTERVAL 30 DAYS"))
    checkSame(indexed, spark.read.orc(p)
      .filter(col("o_ordertime") < lit(lo).cast("date").cast("timestamp") + expr("INTERVAL 30 DAYS")))
    val (listed, total) = pruning(indexed)
    assert(total == 8L && listed < total,
      s"range-clustered ts should prune: $listed/$total")
  }

  test("NTZ timestamp range prunes via the full-scan fallback (ORC has no sound NTZ stripe stats)") {
    val p = s"$work/orders_orc_ntz"
    // o_orderdate is TIMESTAMP_NTZ in the source data — stripe stats are
    // degraded to unknown by design; bounds must come from the fallback
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .repartitionByRange(8, col("o_orderdate"))
      .write.orc(p)
    spark.index.create.mode("overwrite").indexBy("o_orderdate").orc(p)
    val lo = spark.read.orc(p)
      .agg(min(col("o_orderdate")).cast("string")).head.getString(0)
    val cut = lit(lo).cast("timestamp_ntz") + expr("INTERVAL 60 DAYS")
    val indexed = spark.index.orc(p).filter(col("o_orderdate") < cut)
    checkSame(indexed, spark.read.orc(p).filter(col("o_orderdate") < cut))
    val (listed, total) = pruning(indexed)
    assert(total == 8L && listed < total,
      s"fallback bounds should range-prune NTZ: $listed/$total")
  }

  test("refresh picks up appended ORC files; combined rows stay correct") {
    val p = s"$work/orders_orc_refresh"
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .limit(500).coalesce(2).write.orc(p)
    spark.index.create.mode("overwrite").indexBy("o_orderkey").orc(p)
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .limit(600).coalesce(1).write.mode("append").orc(p)
    val stats = spark.index.refresh.orc(p)
    assert(stats.addedFiles == 1L && stats.removedFiles == 0L)
    checkSame(spark.index.orc(p), spark.read.orc(p))
  }

  test("format mismatch fails with a clear error") {
    val e = intercept[IllegalArgumentException] {
      spark.index.parquet(tablePath)
    }
    assert(e.getMessage.contains("built over orc"), e.getMessage)
  }

  test("SQL DDL accepts ORC targets; SHOW INDEX reports the source") {
    val p = s"$work/orders_orc_sql"
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .repartition(4, col("o_orderkey")).write.orc(p)
    spark.sql(s"CREATE INDEX ON ORC '$p' (o_orderkey) " +
      s"OPTIONS ('${IndexConf.FilterType}'='dict')")
    val show = spark.sql(s"SHOW INDEX ON ORC '$p'").head()
    assert(show.getAs[Boolean]("exists"))
    assert(show.getAs[String]("source") == "orc")
    assert(show.getAs[String]("sketch") == Sketch.Dict)
    val key = spark.read.orc(p).agg(min(col("o_orderkey"))).head.getLong(0)
    val indexed = spark.index.orc(p).filter(col("o_orderkey") === key)
    checkSame(indexed, spark.read.orc(p).filter(col("o_orderkey") === key))
    val (listed, total) = pruning(indexed)
    assert(total == 4L && listed < total, s"dict prune: $listed/$total")
    spark.sql(s"DROP INDEX ON ORC '$p'")
    assert(!spark.index.exists.orc(p))
  }

  test("ORC catalog table: provider drives the format end-to-end") {
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .repartition(4, col("o_orderkey"))
      .write.mode("overwrite").format("orc").saveAsTable("orc_cat_orders")
    spark.index.create.mode("overwrite").indexBy("o_orderkey").table("orc_cat_orders")
    assert(spark.index.exists.table("orc_cat_orders"))
    assert(spark.sql("SHOW INDEX ON TABLE orc_cat_orders").head()
      .getAs[String]("source") == "orc")
    val key = spark.table("orc_cat_orders").agg(min(col("o_orderkey"))).head.getLong(0)
    val indexed = spark.index.table("orc_cat_orders").filter(col("o_orderkey") === key)
    checkSame(indexed, spark.table("orc_cat_orders").filter(col("o_orderkey") === key))
    val (listed, total) = pruning(indexed)
    assert(total == 4L && listed < total, s"catalog orc prune: $listed/$total")
    spark.index.delete.table("orc_cat_orders")
  }

  test("ORC compaction: small tail rewritten in format, refresh re-indexes") {
    val p = s"$work/orders_orc_compact"
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .repartition(8, col("o_orderkey")).write.orc(p)
    spark.index.create.mode("overwrite").indexBy("o_orderkey").orc(p)
    val before = spark.read.orc(p).collect().map(_.toString).sorted
    val st = graft.ops.Layout.compact(spark, p, source = "orc")
    assert(st.compactedFiles == 8L && st.producedFiles == 1L && st.bytesRewritten > 0L)
    val files = new java.io.File(p).listFiles
      .filter(f => f.getName.endsWith(".orc") && !f.getName.startsWith("_"))
    assert(files.length == 1 && files.head.getName.startsWith("part-compact-"))
    val rs = spark.index.refresh.orc(p)
    assert(rs.addedFiles == 1L && rs.removedFiles == 8L)
    val after = spark.index.orc(p).collect().map(_.toString).sorted
    assert(before.sameElements(after), "rows must survive compaction byte-for-byte")
  }

  test("Hive-partitioned ORC table: partition + index pruning compose") {
    val p = s"$work/orders_orc_part"
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("bucket", (col("o_orderkey") % 3).cast("int"))
      .repartition(2, col("o_orderkey"))
      .write.partitionBy("bucket").orc(p)
    spark.index.create.mode("overwrite").indexBy("o_orderkey").orc(p)
    val key = spark.read.orc(p).agg(min(col("o_orderkey"))).head.getLong(0)
    val q = spark.index.orc(p)
      .filter(col("bucket") === (key % 3).toInt && col("o_orderkey") === key)
    checkSame(q, spark.read.orc(p)
      .filter(col("bucket") === (key % 3).toInt && col("o_orderkey") === key))
    val (listed, total) = pruning(q)
    assert(listed < total, s"partition+index pruning: $listed/$total")
  }

  test("50k-file ORC table takes the distributed prune fold") {
    // format-agnostic twin of the parquet 50k e2e: stripe statistics
    // feed the same files-table Spark job, and the driver holds only
    // the surviving paths (the create-once builder repoints the session
    // metastore conf — restore it after)
    val saved = spark.conf.getOption(IndexConf.MetastoreLocation)
    try {
    val df = graft.SparkEntry.indexed50kFilesOrc(spark, "/root/testdata/sf0.001")
    val q = df.filter(col("k") === 5L)
    val expectedFiles = graft.SparkEntry.Files50kCopies + 1L // seed + copies
    assert(q.count() == expectedFiles * graft.SparkEntry.Files50kRowsPerSeed)
    val fi = q.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }
    assert(fi.isDefined)
    assert(fi.get.lastPrunedDistributed,
      "50k ORC files over a 10k threshold must take the Spark-job fold path")
    assert(fi.get.lastTotalFiles ==
      graft.SparkEntry.Files50kSeeds * expectedFiles,
      s"expected exactly 64*781 files, saw ${fi.get.lastTotalFiles}")
    assert(fi.get.lastListedFiles == expectedFiles,
      s"driver must hold only the $expectedFiles survivors, " +
        s"listed ${fi.get.lastListedFiles}")
    } finally saved.foreach(spark.conf.set(IndexConf.MetastoreLocation, _))
  }

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }
}

package graft.index

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.ParseException
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.index.implicits._

/** SQL DDL surface (GraftSqlParser via GraftExtensions): the four verbs
  * against path and catalog-table targets, the SaveMode matrix spelled
  * in SQL, option pass-through, and clean delegation of everything that
  * is not a graft statement. */
class SqlDdlSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val work = Files.createTempDirectory("graft-sqlddl").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sql-ddl")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config(IndexConf.MetastoreLocation, s"$work/metastore")
    .config("spark.sql.warehouse.dir", s"$work/warehouse")
    .withExtensions(new graft.GraftExtensions)
    .getOrCreate()

  private lazy val tablePath = {
    val p = s"$work/lineitem"
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .repartition(8, col("l_orderkey"))
      .write.parquet(p)
    p
  }

  /** (listed, total) pruning counters of the graft FileIndex behind `df`
    * after an action has planned (and therefore listed) the scan. */
  private def pruning(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val fi = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.relation.location
    }.collectFirst { case g: org.apache.spark.sql.graft.GraftFileIndex => g }
    assert(fi.nonEmpty, "no GraftFileIndex in plan")
    (fi.get.lastListedFiles, fi.get.lastTotalFiles)
  }

  test("CREATE / SHOW / REFRESH / DROP lifecycle on a parquet path") {
    spark.sql(s"CREATE INDEX ON PARQUET '$tablePath' (l_orderkey, l_returnflag)")
    assert(spark.index.exists.parquet(tablePath))

    val show = spark.sql(s"SHOW INDEX ON PARQUET '$tablePath'").head()
    assert(show.getAs[Boolean]("exists"))
    assert(show.getAs[String]("indexed_columns") == "l_orderkey,l_returnflag")
    assert(show.getAs[Long]("file_count") == 8L)
    assert(show.getAs[Long]("total_bytes") > 0L)

    // the SQL-created index prunes like the builder-created one
    val key = spark.read.parquet(tablePath).agg(min(col("l_orderkey"))).head.getLong(0)
    val pruned = spark.index.parquet(tablePath).filter(col("l_orderkey") === key)
    assert(pruned.count() > 0)
    val (listed, total) = pruning(pruned)
    assert(total == 8L && listed < total, s"expected pruning: $listed/$total")

    // duplicate plain CREATE → SaveMode.ErrorIfExists
    val dup = intercept[Exception] {
      spark.sql(s"CREATE INDEX ON PARQUET '$tablePath' (l_orderkey)")
    }
    assert(dup.getMessage.toLowerCase.contains("exists"))
    // IF NOT EXISTS → Ignore (no-op, columns unchanged)
    spark.sql(s"CREATE INDEX IF NOT EXISTS ON PARQUET '$tablePath' (l_suppkey)")
    assert(spark.sql(s"SHOW INDEX ON PARQUET '$tablePath'").head()
      .getAs[String]("indexed_columns") == "l_orderkey,l_returnflag")
    // OR REPLACE → Overwrite (rebuilt with the new column list)
    spark.sql(s"CREATE OR REPLACE INDEX ON PARQUET '$tablePath' (l_suppkey)")
    assert(spark.sql(s"SHOW INDEX ON PARQUET '$tablePath'").head()
      .getAs[String]("indexed_columns") == "l_suppkey")

    // REFRESH INDEX picks up appended files and reports the delta
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .limit(50).coalesce(1).write.mode("append").parquet(tablePath)
    val refreshed = spark.sql(s"REFRESH INDEX ON PARQUET '$tablePath'").head()
    assert(refreshed.getAs[Long]("added_files") == 1L)
    assert(refreshed.getAs[Long]("removed_files") == 0L)

    spark.sql(s"DROP INDEX ON PARQUET '$tablePath'")
    assert(!spark.index.exists.parquet(tablePath))
    assert(!spark.sql(s"SHOW INDEX ON PARQUET '$tablePath'").head()
      .getAs[Boolean]("exists"))
    // missing index: plain DROP is a no-op, IF EXISTS likewise
    spark.sql(s"DROP INDEX ON PARQUET '$tablePath'")
    spark.sql(s"DROP INDEX IF EXISTS ON PARQUET '$tablePath'")
  }

  test("GLOB path through the whole DDL lifecycle addresses the root SET") {
    import spark.implicits._
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val a = s"$work/ddl_mr/even"
    val b = s"$work/ddl_mr/odd"
    li.filter($"l_orderkey" % 2 === 0).repartition(2, $"l_orderkey").write.parquet(a)
    li.filter($"l_orderkey" % 2 === 1).repartition(2, $"l_orderkey").write.parquet(b)
    val glob = s"$work/ddl_mr/*"
    spark.sql(s"CREATE INDEX ON PARQUET '$glob' (l_orderkey)")
    // SHOW resolves the same root set the CREATE keyed
    val show = spark.sql(s"SHOW INDEX ON PARQUET '$glob'").head()
    assert(show.getAs[Boolean]("exists"))
    assert(show.getAs[Long]("file_count") == 4L)
    // the glob load reads the union and prunes across both roots
    assert(spark.index.parquet(glob).count() == li.count())
    // neither single root owns an entry of its own
    assert(!spark.index.exists.parquet(a))
    spark.sql(s"DROP INDEX ON PARQUET '$glob'")
    assert(!spark.sql(s"SHOW INDEX ON PARQUET '$glob'").head().getAs[Boolean]("exists"))
  }

  test("REFRESH INDEX OPTIONS fullWalk heals a preserved-mtime in-place rewrite via SQL") {
    val p = s"$work/orders_fullwalk"
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(p)
    val manifestOpts =
      s"'${IndexConf.RefreshDirManifest}'='true'," +
        s"'${IndexConf.DistributedPruningThreshold}'='1'," +
        s"'${IndexConf.RefreshDirMtimeSlack}'='0'"
    // backdate every dir 60 s so the manifest's capture time safely
    // postdates the mtimes (the unchanged-skip proof holds, no sleeping)
    val backThen = System.currentTimeMillis() - 60000L
    val root = new java.io.File(p)
    (root +: root.listFiles().filter(_.isDirectory).toSeq)
      .foreach(d => assert(d.setLastModified(backThen)))
    spark.sql(s"CREATE INDEX ON PARQUET '$p' (o_custkey) OPTIONS ($manifestOpts)")

    // the tier's documented blind spot: new content lands but the dir
    // mtime is put back — a preserved-mtime in-place rewrite
    val y = root.listFiles().filter(_.getName.startsWith("o_year="))
      .head.getName.stripPrefix("o_year=").toInt
    val dir = new java.io.File(s"$p/o_year=$y")
    val oldMt = dir.lastModified()
    orders.filter(col("o_year") === y).limit(20).drop("o_year")
      .coalesce(1).write.mode("append").parquet(s"$p/o_year=$y")
    assert(dir.setLastModified(oldMt))

    // a plain manifest-guided refresh MISSES it (the blind spot is real)
    val missed = spark.sql(
      s"REFRESH INDEX ON PARQUET '$p' OPTIONS ($manifestOpts)").head()
    assert(missed.getAs[Long]("added_files") == 0L,
      "the preserved-mtime rewrite must evade the mtime probe — " +
        "otherwise this test is not exercising the blind spot")

    // the documented SQL spelling heals it in one pass …
    val healed = spark.sql(s"REFRESH INDEX ON PARQUET '$p' OPTIONS " +
      s"($manifestOpts,'${IndexConf.RefreshFullWalk}'='true')").head()
    assert(healed.getAs[Long]("added_files") == 1L)
    assert(healed.getAs[Long]("removed_files") == 0L)

    // … the index answers over the grown table, and the rebuilt manifest
    // resumes skipping on the next plain refresh
    assert(spark.index.parquet(p).count() == spark.read.parquet(p).count())
    val after = spark.sql(
      s"REFRESH INDEX ON PARQUET '$p' OPTIONS ($manifestOpts)").head()
    assert(after.getAs[Long]("added_files") == 0L)
    spark.sql(s"DROP INDEX ON PARQUET '$p'")
  }

  test("catalog-table target and OPTIONS pass-through") {
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .write.mode("overwrite").format("parquet").saveAsTable("sqlddl_orders")
    spark.sql("CREATE INDEX ON TABLE sqlddl_orders (o_orderkey) " +
      s"OPTIONS ('${IndexConf.FilterType}'='dict')")
    assert(spark.index.exists.table("sqlddl_orders"))
    val show = spark.sql("SHOW INDEX ON TABLE sqlddl_orders").head()
    assert(show.getAs[Boolean]("exists"))
    assert(show.getAs[String]("sketch") == Sketch.Dict)
    spark.sql("DROP INDEX ON TABLE sqlddl_orders")
    assert(!spark.index.exists.table("sqlddl_orders"))
  }

  test("nested and double columns index through the SQL DDL surface") {
    import spark.implicits._
    val p = s"$work/sqlddl_nested"
    spark.range(0, 500).select(
        $"id", ($"id".cast("double") * 1.5).as("price"),
        struct(($"id" % 40).as("user_id")).as("payload"))
      .repartition(4, col("id")).write.mode("overwrite").parquet(p)
    spark.sql(s"CREATE INDEX ON PARQUET '$p' (price, payload.user_id)")
    assert(spark.index.exists.parquet(p))
    val q = spark.index.parquet(p)
      .filter(col("payload.user_id") === 7L && col("price") < 300.0)
    assert(q.collect().toSeq ==
      spark.read.parquet(p)
        .filter(col("payload.user_id") === 7L && col("price") < 300.0)
        .collect().toSeq)
    spark.sql(s"DROP INDEX ON PARQUET '$p'")
  }

  test("malformed graft statements fail with the graft grammar message") {
    val e = intercept[ParseException] {
      spark.sql(s"CREATE INDEX ON PARQUET '$tablePath'") // no column list
    }
    assert(e.getMessage.contains("graft index statement"))
    val e2 = intercept[ParseException] {
      spark.sql(
        s"CREATE OR REPLACE INDEX IF NOT EXISTS ON PARQUET '$tablePath' (a)")
    }
    assert(e2.getMessage.contains("OR REPLACE"))
  }

  test("non-graft SQL delegates untouched") {
    assert(spark.sql("SELECT 1 + 1 AS v").head().getInt(0) == 2)
    // Spark's own DSv2 CREATE INDEX shape (named index) is NOT intercepted
    assert(GraftSqlParser.parseGraftPlan(
      "CREATE INDEX idx ON TABLE t (col)").isEmpty)
    assert(GraftSqlParser.parseGraftPlan("SELECT * FROM t").isEmpty)
    // quoted-path escaping round-trips
    val plan = GraftSqlParser.parseGraftPlan(
      "SHOW INDEX ON PARQUET '/tmp/it''s here'")
    assert(plan.exists {
      case SqlShowIndex(GraftSqlParser.PathTarget("parquet", p)) => p == "/tmp/it's here"
      case _ => false
    })
  }

  test("MERGE INTO a keyed parquet table runs upsertByKey with the pinned layout") {
    import spark.implicits._
    val td = s"$work/merge_keyed"
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "tag", "score")
    graft.ops.Upsert.writeKeyedTable(base, key = "id", dir = td,
      numBuckets = 4, mode = "overwrite")
    Seq((2L, "B", 200L), (9L, "i", 90L)).toDF("id", "tag", "score")
      .createOrReplaceTempView("merge_updates")
    // subquery source; stats row comes back
    val stats = spark.sql(
      s"MERGE INTO PARQUET '$td' USING (SELECT * FROM merge_updates) ON KEY id")
      .head()
    assert(stats.getAs[Long]("upserted") == 2L)
    assert(stats.getAs[Long]("total_buckets") == 4L)
    val after = graft.ops.Upsert.readKeyedTable(spark, td)
      .orderBy($"id").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(after.toSeq == Seq((1L, "a", 10L), (2L, "B", 200L),
      (3L, "c", 30L), (9L, "i", 90L)))
    // bare table-name source spelling
    Seq((3L, "C", 300L)).toDF("id", "tag", "score")
      .createOrReplaceTempView("merge_updates2")
    spark.sql(s"MERGE INTO PARQUET '$td' USING merge_updates2 ON KEY `id`").collect()
    assert(graft.ops.Upsert.readKeyedTable(spark, td)
      .filter($"id" === 3L).head().getString(1) == "C")
    // wrong key name fails against the pinned spec
    val e = intercept[Exception] {
      spark.sql(s"MERGE INTO PARQUET '$td' USING merge_updates2 ON KEY tag").collect()
    }
    assert(e.getMessage.contains("pinned key"))
    // a non-keyed parquet dir is refused (no _index_spec)
    base.write.mode("overwrite").parquet(s"$work/merge_unkeyed")
    val e2 = intercept[Exception] {
      spark.sql(
        s"MERGE INTO PARQUET '$work/merge_unkeyed' USING merge_updates2 ON KEY id")
        .collect()
    }
    assert(e2.getMessage.contains("_index_spec"))
    // malformed graft MERGE raises a graft parse error, not a Spark one
    val e3 = intercept[ParseException] {
      spark.sql(s"MERGE INTO PARQUET '$td' USING ON KEY id")
    }
    assert(e3.getMessage.contains("malformed graft MERGE"))
    // Spark's own MERGE INTO <table> shape still delegates (resolution
    // fails on the missing table, NOT on our parser)
    val e4 = intercept[Exception] {
      spark.sql("MERGE INTO some_tbl USING src ON some_tbl.id = src.id " +
        "WHEN MATCHED THEN UPDATE SET *")
    }
    assert(!e4.getMessage.contains("malformed graft"))
  }

  test("COMPACT and VACUUM SQL verbs run the layout maintenance ops") {
    import spark.implicits._
    val td = s"$work/compact_sql"
    // 8 tiny files — all below the smallFileBytes threshold
    (0 until 800).toDF("v").repartition(8)
      .write.mode("overwrite").parquet(td)
    val before = new java.io.File(td).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(before == 8)
    val stats = spark.sql(
      s"COMPACT PARQUET '$td' OPTIONS ('minFiles'='2')").head()
    assert(stats.getAs[Long]("compacted_files") == 8L)
    assert(stats.getAs[Long]("produced_files") >= 1L)
    val after = new java.io.File(td).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(after < before, s"compaction should shrink the file count: $after")
    assert(spark.read.parquet(td).count() == 800L)
    // vacuum on a healthy table heals nothing and returns 0
    val healed = spark.sql(s"VACUUM PARQUET '$td'").head().getAs[Long]("healed")
    assert(healed == 0L)
    // Delta-style VACUUM <table> still delegates to Spark (resolution
    // error, not our grammar error)
    val e = intercept[Exception] { spark.sql("VACUUM some_missing_table") }
    assert(!e.getMessage.contains("malformed graft"))
  }

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }
}

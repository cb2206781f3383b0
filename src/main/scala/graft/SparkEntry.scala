package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator/capability from SURVEY.md §2
  * (the reference's own surface: indexed scans + the relational operators its
  * tests delegate to Spark) or from the training-data-pipeline extension set
  * (dedup / similarity / text analysis). Each has a DuckDB oracle in
  * [[oracleSql]] where ANSI-SQL-expressible.
  *
  * Determinism rules (driver hash-compares row values after sorting columns
  * by name):
  *   - every query ends in a total ORDER BY (unique tie-break key);
  *   - double aggregates are rounded at the data's intrinsic decimal
  *     precision (2dp for raw money sums, 4dp for price*(1-disc) products)
  *     so Spark's and DuckDB's summation-order float noise (~1e-6 at
  *     sf0.01) cannot flip the rounded digit;
  *   - ORDER BY on nullable group keys pins NULLS FIRST explicitly (Spark
  *     default asc = nulls first; DuckDB default = nulls last).
  */
object SparkEntry {

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize `events.ts` to a session-timezone TIMESTAMP regardless of
    * how the driver generated the column — the physical type has drifted
    * across testdata generations (TIMESTAMP(NANOS) → read as raw-nanos
    * long under `nanosAsLong`; TIMESTAMP(MICROS) without UTC adjustment →
    * TIMESTAMP_NTZ), and the oracle's DuckDB read is naive either way.
    * All correctness sessions run with session timeZone = UTC, so the
    * NTZ→TZ cast is micros-identity and every downstream query
    * (`date_format`, `unix_micros`, windows) sees identical values on
    * both engines. */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer `div`, not `/`: epoch nanos exceed 2^53, so
        // double-precision division can be off by 1µs (ADVICE r1)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  private[graft] def eventsTbl(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_idx_point_lookup")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Index-engine scratch tables: the driver testdata ships single-file
  // tables, so file-level pruning needs a deterministic multi-file copy.
  // Built once per (scale factor, engine version) under target/ and
  // indexed through the public graft.index API.
  // ---------------------------------------------------------------------

  private val scratchRoot = "/root/repo/target/graft_scratch"

  /** Single source of truth for scratch-table locations — Bench reads
    * tables (plain-scan baseline, 50k refresh target) through this
    * instead of re-deriving the path convention by string concat. */
  private[graft] def scratchTableDir(dir: String, name: String): String =
    s"$scratchRoot/${new java.io.File(dir).getName}/$name"

  // second component: scratch-builder revision — bump when a builder's
  // layout changes (e.g. the deterministic 50k seed construction) so
  // stale create-once tables rebuild even though the metadata version
  // didn't move
  private def scratchVersion: String =
    s"${graft.index.IndexMetadata.CurrentVersion}.3"

  /** Create-once protocol shared by every scratch table: version-marked
    * build under target/, then served through the indexed read. The
    * `build` closure receives the table dir and must leave it indexed. */
  private def scratchTable(s: SparkSession, dir: String, name: String,
      source: String = "parquet")(
      build: String => Unit): DataFrame =
    SparkEntry.synchronized {
      import graft.index.implicits._
      val scratch = s"$scratchRoot/${new java.io.File(dir).getName}"
      val tableDir = s"$scratch/$name"
      s.conf.set(graft.index.IndexConf.MetastoreLocation, s"$scratch/metastore")
      val marker = new java.io.File(s"$scratch/${name}_ready")
      val upToDate = marker.exists() &&
        new String(java.nio.file.Files.readAllBytes(marker.toPath)) == scratchVersion
      if (!upToDate) {
        // a version-stale fixture rebuilds from CLEAN: incremental
        // builders (streaming ingests with checkpoints, refresh
        // fixtures) would otherwise resume onto the old-version index
        // left in the dir and fail the metadata version gate
        deleteRecursively(new java.io.File(tableDir))
        build(tableDir)
        java.nio.file.Files.write(marker.toPath, scratchVersion.getBytes)
      }
      if (source == "orc") s.index.orc(tableDir) else s.index.parquet(tableDir)
    }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }

  /** Indexed multi-file copy of lineitem for sfDir; create-once. */
  private[graft] def indexedLineitem(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "lineitem") { tableDir =>
      import graft.index.implicits._
      s.read.parquet(s"$dir/lineitem.parquet")
        .repartition(16, col("l_orderkey"))
        .write.mode("overwrite").parquet(tableDir)
      s.index.create.mode("overwrite")
        .indexBy("l_orderkey", "l_suppkey", "l_returnflag", "l_shipdate")
        .parquet(tableDir)
    }

  /** ORC copy of lineitem, indexed and pruned by the same engine — the
    * second implementation of the reference's MetastoreSupport
    * extensibility axis (stripe statistics instead of parquet footers,
    * same sketches/pruning/refresh); create-once. */
  private[graft] def indexedLineitemOrc(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "lineitem_orc", source = "orc") { tableDir =>
      import graft.index.implicits._
      s.read.parquet(s"$dir/lineitem.parquet")
        .repartition(16, col("l_orderkey"))
        .write.mode("overwrite").orc(tableDir)
      s.index.create.mode("overwrite")
        .indexBy("l_orderkey", "l_returnflag").orc(tableDir)
    }

  /** ~50k-file synthetic table (the million-file story at test scale):
    * 64 single-key seed files, each replicated 780× by raw byte copy —
    * identical stats, distinct paths — because listing, footer indexing
    * and prune cost scale with FILE COUNT, which is exactly what this
    * table exercises. Seeds are built DETERMINISTICALLY: the rows are
    * generated driver-side in key order and `parallelize(_, 64)` slices
    * positionally, so partition i holds exactly key i (repartitionByRange
    * samples boundaries and could merge two keys / leave a partition
    * empty). Sketches are disabled (min/max pruning is the story; a
    * 50k-row sketch table would just slow the build) and the reader
    * carries a distributed-pruning threshold BELOW the file count, so
    * queries take the Spark-job fold path a million-file table would.
    * Create-once. */
  private[graft] val Files50kSeeds = 64
  private[graft] val Files50kCopies = 780 // per seed => 64 × 781 = 49,984 files
  private[graft] val Files50kRowsPerSeed = 100
  // 4x the seeds (so the grouped/kth folds see 4x the key domain too),
  // same copies => 256 × 781 = 199,936 files — the r8 verdict's scale
  // probe above the 50k table every distributed-tier claim was benched at
  private[graft] val Files200kSeeds = 256
  private[graft] val Files200kCopies = 780
  // 5x the 200k probe => 1280 × 781 = 999,680 files — the LAST scale
  // decade reachable on one box (~4 GB of 4 KB files): the r9 verdict's
  // final listing probe, where prune latency and refresh driver
  // residency must still hold their O(survivors)/O(dirs+delta) claims
  private[graft] val Files1mSeeds = 1280
  private[graft] val Files1mCopies = 780

  // Shared parquet/ORC 50k builder — only the format strings differ, so
  // the seed construction, seed assert, copy loop and index options are
  // maintained once (a determinism fix can't land in one format only).
  private def build50k(s: SparkSession, tableDir: String, source: String): Unit =
    buildManyFiles(s, tableDir, source, Files50kSeeds, Files50kCopies)

  /** The many-tiny-files fixture builder: `seeds` one-k-value seed files,
    * each copied `copies` times (copies run as a Spark job — 200k
    * driver-side NIO copies would dominate the build). ks: a string twin
    * of k (zero-padded so UTF-8 binary order == numeric order) — the
    * distributed STRING kth-walk/prune fixture key. */
  private def buildManyFiles(s: SparkSession, tableDir: String, source: String,
      seedCount: Int, copies: Int): Unit = {
    import graft.index.implicits._
    import s.implicits._
    val ext = if (source == "orc") "orc" else "parquet"
    val rows = for {
      k <- 0 until seedCount
      r <- 0 until Files50kRowsPerSeed
    } yield (k.toLong, f"s$k%03d", (k.toLong * Files50kRowsPerSeed) + r)
    val seedWriter = s.sparkContext.parallelize(rows, seedCount)
      .toDF("k", "ks", "v").write.mode("overwrite")
    if (source == "orc") seedWriter.orc(tableDir) else seedWriter.parquet(tableDir)
    val d = new java.io.File(tableDir)
    val seeds = d.listFiles().filter(f => f.getName.endsWith("." + ext) &&
      !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(seeds.length == seedCount,
      s"expected $seedCount seed files, got ${seeds.length}")
    val copyJobs = seeds.zipWithIndex.flatMap { case (f, si) =>
      (0 until copies).map(j => (f.getAbsolutePath, s"part-copy-$si-$j.$ext"))
    }.toSeq
    val dirB = d.getAbsolutePath
    s.sparkContext.parallelize(copyJobs, math.max(1, copyJobs.size / 4096))
      .foreach { case (src, dstName) =>
        java.nio.file.Files.copy(java.nio.file.Paths.get(src),
          java.nio.file.Paths.get(dirB, dstName),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    val create = s.index.create.mode("overwrite")
      .option(graft.index.IndexConf.FilterEnabled, "false")
      .indexBy("k", "ks")
    if (source == "orc") create.orc(tableDir) else create.parquet(tableDir)
  }

  private[graft] def indexed50kFiles(s: SparkSession, dir: String): DataFrame = {
    import graft.index.implicits._
    scratchTable(s, dir, "files50k")(build50k(s, _, "parquet"))
    // re-open with the distributed threshold under the file count: the
    // Spark-job fold path is the one a million-file table would take
    s.index.option(graft.index.IndexConf.DistributedPruningThreshold, "10000")
      .parquet(scratchTableDir(dir, "files50k"))
  }

  /** The 200k-file scale probe over [[indexed50kFiles]]'s design: 4x the
    * files AND 4x the key domain, same per-file shape — the fixture for
    * proving the distributed prune/kth/listing tiers hold their
    * driver-residency and latency claims one scale step up. Create-once
    * (the build itself runs the copies as a Spark job). */
  private[graft] def indexed200kFiles(s: SparkSession, dir: String): DataFrame = {
    import graft.index.implicits._
    scratchTable(s, dir, "files200k")(
      buildManyFiles(s, _, "parquet", Files200kSeeds, Files200kCopies))
    s.index.option(graft.index.IndexConf.DistributedPruningThreshold, "10000")
      .parquet(scratchTableDir(dir, "files200k"))
  }

  /** The ~1M-file scale probe (5× [[indexed200kFiles]], same per-file
    * shape): the final local decade for the distributed prune / kth walk
    * / level-walk refresh claims. Create-once (copies + footers all run
    * as Spark jobs; budget ~5-10 min on first build, then cached). */
  private[graft] def indexed1mFiles(s: SparkSession, dir: String): DataFrame = {
    import graft.index.implicits._
    scratchTable(s, dir, "files1m")(
      buildManyFiles(s, _, "parquet", Files1mSeeds, Files1mCopies))
    s.index.option(graft.index.IndexConf.DistributedPruningThreshold, "10000")
      .parquet(scratchTableDir(dir, "files1m"))
  }

  /** ORC twin of [[indexed50kFiles]]: proves the distributed prune fold
    * is format-agnostic — stripe statistics feed the same files-table
    * Spark job the parquet footers do. Create-once. */
  private[graft] def indexed50kFilesOrc(s: SparkSession, dir: String): DataFrame = {
    import graft.index.implicits._
    scratchTable(s, dir, "files50k_orc", source = "orc")(build50k(s, _, "orc"))
    s.index.option(graft.index.IndexConf.DistributedPruningThreshold, "10000")
      .orc(scratchTableDir(dir, "files50k_orc"))
  }

  /** Indexed lineitem copy with DICT/BITMAP sketches (per-call option):
    * long column → exact dict, int column → roaring bitmap. Separate
    * table dir so the bloom-indexed copy keeps its own index. */
  private[graft] def indexedLineitemDict(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "lineitem_dict") { tableDir =>
      import graft.index.implicits._
      s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("l_linenumber", col("l_linenumber").cast("int"))
        .repartition(16, col("l_suppkey"))
        .write.mode("overwrite").parquet(tableDir)
      s.index.create.mode("overwrite")
        .option(graft.index.IndexConf.FilterType, "dict")
        .indexBy("l_suppkey", "l_linenumber")
        .parquet(tableDir)
    }

  /** Per-order supplier-key ARRAYS (collect_list over lineitem), indexed
    * on the array column's ELEMENT domain — the `array_contains` pruning
    * fixture (element min/max + dict/bloom membership per file);
    * create-once. */
  private[graft] def indexedOrderSupps(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "order_supps") { tableDir =>
      import graft.index.implicits._
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_orderkey"))
        .agg(collect_list(col("l_suppkey")).as("supps"),
          count(lit(1)).as("n_items"))
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").parquet(tableDir)
      s.index.create.mode("overwrite").indexBy("supps", "l_orderkey")
        .parquet(tableDir)
    }

  /** Per-order supplier→count MAPS (map_from_entries over lineitem),
    * indexed on the map column's KEY domain — the `map_contains_key`
    * pruning fixture (key min/max + dict/bloom membership per file);
    * create-once. */
  private[graft] def indexedOrderSuppMap(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "order_suppmap") { tableDir =>
      import graft.index.implicits._
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("l_orderkey"))
        .agg(map_from_entries(collect_list(struct(col("l_suppkey"), col("n"))))
          .as("suppmap"))
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").parquet(tableDir)
      s.index.create.mode("overwrite").indexBy("suppmap", "l_orderkey")
        .parquet(tableDir)
    }

  /** Per-order item ARRAYS OF STRUCTS (collect_list of (supp, qty) over
    * lineitem), indexed on the STRUCT LEAF `items.supp` through the
    * repeated level — the `exists(items, x -> x.supp = v)` pruning
    * fixture (leaf element min/max + dict/bloom per file); create-once. */
  private[graft] def indexedOrderItems(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "order_items") { tableDir =>
      import graft.index.implicits._
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_orderkey"))
        .agg(collect_list(struct(col("l_suppkey").as("supp"),
          col("l_quantity").as("qty"))).as("items"),
          count(lit(1)).as("n_items"))
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").parquet(tableDir)
      s.index.create.mode("overwrite").indexBy("items.supp", "l_orderkey")
        .parquet(tableDir)
    }

  /** Per-order attribute MAPS with file-UNIFORM keys and order-correlated
    * values (okey → l_orderkey), range-laid-out so only the VALUE domain
    * (`m#value` field) can cut files for `m['okey'] = v` — the map
    * value-domain pruning fixture; create-once. */
  private[graft] def indexedOrderValMap(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "order_valmap") { tableDir =>
      import graft.index.implicits._
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_items"))
        .select(col("l_orderkey"), col("n_items"),
          map_from_arrays(array(lit("okey"), lit("cnt")),
            array(col("l_orderkey"), col("n_items"))).as("attrs"))
        .repartitionByRange(8, col("l_orderkey"))
        .write.mode("overwrite").parquet(tableDir)
      s.index.create.mode("overwrite").indexBy("attrs")
        .parquet(tableDir)
    }

  /** Indexed part copy with exact DICT sketches on the low-cardinality
    * string columns, laid out so p_type values cluster per file — the
    * fixture for substring (Contains/EndsWith) pruning, which only an
    * exact dictionary can answer; create-once. */
  private[graft] def indexedPartDict(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "part_dict") { tableDir =>
      import graft.index.implicits._
      s.read.parquet(s"$dir/part.parquet")
        .repartition(16, col("p_type"))
        .write.mode("overwrite").parquet(tableDir)
      s.index.create.mode("overwrite")
        .option(graft.index.IndexConf.FilterType, "dict")
        .indexBy("p_type", "p_brand")
        .parquet(tableDir)
    }

  /** Indexed lineitem copy built through the INCREMENTAL path: index half
    * the files, append the rest, `spark.index.refresh` — so the refresh
    * flow (delta footer job, appended stats + sketches, metadata update)
    * is exercised by the oracle gate on every run; create-once. */
  private[graft] def indexedLineitemRefreshed(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "lineitem_refresh") { tableDir =>
      import graft.index.implicits._
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      li.filter(col("l_orderkey") % 2 === 0)
        .repartition(8, col("l_orderkey"))
        .write.mode("overwrite").parquet(tableDir)
      s.index.create.mode("overwrite")
        .indexBy("l_orderkey", "l_returnflag").parquet(tableDir)
      li.filter(col("l_orderkey") % 2 === 1)
        .repartition(8, col("l_orderkey"))
        .write.mode("append").parquet(tableDir)
      val stats = s.index.refresh.parquet(tableDir)
      require(stats.addedFiles == 8L && stats.removedFiles == 0L,
        s"refresh scratch build expected 8 added files, got $stats")
    }

  /** Indexed lineitem copy that goes through SMALL-FILE COMPACTION after
    * indexing: 32 tiny files → Layout.compact rewrites them into the
    * target size → spark.index.refresh re-indexes the delta. The oracle
    * gate then proves compaction is row-preserving AND the refreshed
    * index still answers; create-once. */
  private[graft] def indexedLineitemCompacted(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "lineitem_compact") { tableDir =>
      import graft.index.implicits._
      s.read.parquet(s"$dir/lineitem.parquet")
        .repartition(32, col("l_orderkey"))
        .write.mode("overwrite").parquet(tableDir)
      s.index.create.mode("overwrite")
        .indexBy("l_orderkey", "l_returnflag").parquet(tableDir)
      // thresholds derived from the actual file sizes so the fixture
      // compacts all 32 files into a few at ANY scale factor
      val sizes = new java.io.File(tableDir).listFiles
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
        .map(_.length)
      val cs = graft.ops.Layout.compact(s, tableDir,
        smallFileBytes = sizes.max + 1, targetFileBytes = sizes.sum / 4 + 1)
      require(cs.compactedFiles == 32L && cs.producedFiles >= 1L &&
        cs.producedFiles < 32L, s"compaction expected to rewrite 32 files: $cs")
      val rs = s.index.refresh.parquet(tableDir)
      require(rs.addedFiles == cs.producedFiles && rs.removedFiles == cs.compactedFiles,
        s"refresh after compaction out of step: $rs vs $cs")
    }

  /** Range-clustered indexed lineitem (graft.ops.Layout.clusterBy on
    * l_shipdate): each file covers a narrow shipdate slice, so footer
    * min/max prunes RANGE predicates — which the hash-layout copy cannot
    * (every hashed file spans the full date domain); create-once. */
  private[graft] def indexedLineitemClustered(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "lineitem_clustered") { tableDir =>
      import graft.index.implicits._
      graft.ops.Layout.clusterBy(
          s.read.parquet(s"$dir/lineitem.parquet"), 16, col("l_shipdate"))
        .write.mode("overwrite").parquet(tableDir)
      s.index.create.mode("overwrite")
        .indexBy("l_shipdate", "l_orderkey").parquet(tableDir)
    }

  /** Price-clustered indexed lineitem with DOUBLE / DECIMAL(12,2) / FLOAT
    * indexed columns — the floating-point Canon domain fixture
    * (IEEE754-sortable-bits Long canonical; the reference stops at five
    * types, ParquetSchemaUtils.scala:32-33, a 2016-era footer-stats limit
    * modern parquet no longer has). Clustered on l_extendedprice so
    * double-range predicates provably cut files; create-once. */
  private[graft] def indexedLineitemPrice(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "lineitem_price") { tableDir =>
      import graft.index.implicits._
      graft.ops.Layout.clusterBy(
          s.read.parquet(s"$dir/lineitem.parquet")
            .withColumn("l_quantity_dec",
              col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
            .withColumn("l_discount_f", col("l_discount").cast("float")),
          16, col("l_extendedprice"))
        .write.mode("overwrite").parquet(tableDir)
      s.index.create.mode("overwrite")
        .indexBy("l_extendedprice", "l_quantity_dec", "l_discount_f")
        .parquet(tableDir)
    }

  /** Orders folded into a STRUCT column and indexed on nested leaves
    * (`payload.user_id`, `payload.status`) — the event-style table shape
    * (crawl/clickstream payloads) the reference's top-level-only limit
    * never served (ParquetSchemaUtils.scala:40-54); modern footers carry
    * per-leaf stats. user_id-clustered so nested range predicates cut
    * files; create-once. */
  private[graft] def indexedOrdersNested(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "orders_nested") { tableDir =>
      import graft.index.implicits._
      s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"),
          struct(col("o_custkey").as("user_id"),
            col("o_orderstatus").as("status"),
            col("o_totalprice").as("price")).as("payload"))
        .repartitionByRange(16, col("payload.user_id"))
        .write.mode("overwrite").parquet(tableDir)
      s.index.create.mode("overwrite")
        .indexBy("payload.user_id", "payload.status").parquet(tableDir)
    }

  /** INT96-timestamp orders copy — the legacy-writer fixture: written
    * with outputTimestampType=INT96, whose footers carry NO usable
    * timestamp statistics, so RANGE pruning on o_ordertime exists only
    * because create's full-scan min/max fallback patched the files table
    * (StatisticsBuilder.fullScanMinMaxFallback; reference covers the same
    * case via its full-scan stats, ParquetIndexReadSupport.scala:64-73).
    * Range-clustered so the pruning is observable; create-once. */
  private[graft] def indexedOrdersInt96(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "orders_int96") { tableDir =>
      import graft.index.implicits._
      val key = "spark.sql.parquet.outputTimestampType"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "INT96")
      try {
        s.read.parquet(s"$dir/orders.parquet")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
            col("o_orderdate").cast("timestamp").as("o_ordertime"))
          .repartitionByRange(16, col("o_ordertime"))
          .write.mode("overwrite").parquet(tableDir)
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
      s.index.create.mode("overwrite")
        .indexBy("o_ordertime", "o_orderkey").parquet(tableDir)
    }

  /** Z-ordered indexed lineitem (graft.ops.Layout.zorderBy on
    * (l_orderkey, l_suppkey)): bit-interleaved layout, so range
    * predicates on EITHER key prune files — single-key clustering can
    * only serve its first key; create-once. */
  private[graft] def indexedLineitemZorder(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "lineitem_zorder") { tableDir =>
      import graft.index.implicits._
      graft.ops.Layout.zorderBy(
          s.read.parquet(s"$dir/lineitem.parquet"), 16,
          Seq("l_orderkey", "l_suppkey"))
        .write.mode("overwrite").parquet(tableDir)
      s.index.create.mode("overwrite")
        .indexBy("l_orderkey", "l_suppkey").parquet(tableDir)
    }

  /** Bucketed lineitem + orders scratch tables (8 buckets on the order
    * key, sorted): data written once, bucket layout re-registered into
    * each fresh in-memory catalog from the files — so the co-located
    * zero-shuffle join is exercised by the oracle gate on every run. */
  private[graft] def bucketedJoinTables(
      s: SparkSession, dir: String): (DataFrame, DataFrame) =
    SparkEntry.synchronized {
      val sfName = new java.io.File(dir).getName
      val scratch = s"$scratchRoot/$sfName"
      val safe = sfName.replace('.', '_')
      val (liName, oName) =
        (s"graft_bucketed_lineitem_$safe", s"graft_bucketed_orders_$safe")
      val (liDir, oDir) = (s"$scratch/bucketed_lineitem", s"$scratch/bucketed_orders")
      val marker = new java.io.File(s"$scratch/bucketed_ready")
      val upToDate = marker.exists() &&
        new String(java.nio.file.Files.readAllBytes(marker.toPath)) == scratchVersion
      if (!upToDate) {
        new java.io.File(scratch).mkdirs()
        graft.ops.Layout.writeBucketed(
          s.read.parquet(s"$dir/lineitem.parquet"), liName, liDir, 8, "l_orderkey")
        graft.ops.Layout.writeBucketed(
          s.read.parquet(s"$dir/orders.parquet"), oName, oDir, 8, "o_orderkey")
        java.nio.file.Files.write(marker.toPath, scratchVersion.getBytes)
      }
      (graft.ops.Layout.registerBucketed(s, liName, liDir, 8, "l_orderkey"),
        graft.ops.Layout.registerBucketed(s, oName, oDir, 8, "o_orderkey"))
    }

  /** Events table built by STREAMING ingest with per-batch index
    * maintenance (create on batch 0, incremental refresh on each later
    * batch) — the q_stream_ingest fixture; create-once. */
  private[graft] def streamIngestedEvents(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "events_ingested") { tableDir =>
      graft.streaming.Streaming.ingestIndexed(
        s, dir, tableDir, indexCols = Seq("user_id", "event_type"))
      ()
    }

  /** Create-once scratch artifact that is NOT an indexed table (plain
    * files); returns the artifact dir. */
  private def scratchPlain(s: SparkSession, dir: String, name: String)(
      build: String => Unit): String =
    SparkEntry.synchronized {
      val scratch = s"$scratchRoot/${new java.io.File(dir).getName}"
      val tableDir = s"$scratch/$name"
      val marker = new java.io.File(s"$scratch/${name}_ready")
      val upToDate = marker.exists() &&
        new String(java.nio.file.Files.readAllBytes(marker.toPath)) == scratchVersion
      if (!upToDate) {
        deleteRecursively(new java.io.File(tableDir)) // clean rebuild, like scratchTable
        build(tableDir)
        java.nio.file.Files.write(marker.toPath, scratchVersion.getBytes)
      }
      tableDir
    }

  /** Materialized IVFADC codes table (partitioned by cell) for the
    * embeddings of `dir`; create-once. */
  private[graft] def ivfPqCodesDir(s: SparkSession, dir: String): String =
    scratchPlain(s, dir, "ivfpq_codes") { td =>
      graft.ann.Ann.buildIvfPqIndex(
        tbl(s, dir, "embeddings"), col("vec_id"), col("embedding"), td,
        dim = 64, cells = 16, m = 8, codebookK = 16)
    }

  /** IVFADC codes table grown INCREMENTALLY: built from the even-id half
    * ("already-ingested corpus"), odd-id half appended as a later batch —
    * must serve queries identically to [[ivfPqCodesDir]]'s one-shot
    * build; create-once. */
  private[graft] def ivfPqCodesIncrDir(s: SparkSession, dir: String): String =
    scratchPlain(s, dir, "ivfpq_codes_incr") { td =>
      val emb = tbl(s, dir, "embeddings")
      graft.ann.Ann.buildIvfPqIndex(
        emb.filter(col("vec_id") % 2 === 0), col("vec_id"), col("embedding"),
        td, dim = 64, cells = 16, m = 8, codebookK = 16)
      graft.ann.Ann.appendToIvfPqIndex(
        emb.filter(col("vec_id") % 2 === 1), col("vec_id"), col("embedding"),
        td, dim = 64, cells = 16, m = 8, codebookK = 16)
    }

  /** Materialized full-text search index grown INCREMENTALLY (built from
    * the even-id half, odd-id half appended) — index-served search/BM25
    * must match from-scratch runs over the whole corpus; create-once. */
  private[graft] def searchIndexDir(s: SparkSession, dir: String): String =
    scratchPlain(s, dir, "search_index") { td =>
      val docs = tbl(s, dir, "documents")
      graft.text.SearchIndex.buildSearchIndex(
        docs.filter(col("doc_id") % 2 === 0), col("doc_id"), col("text"), td)
      graft.text.SearchIndex.appendToSearchIndex(
        docs.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"), td)
    }

  /** Materialized MinHash LSH index over the EVEN-id half of documents
    * (the "already-ingested corpus"); create-once. The odd-id half plays
    * the incoming batch in `q_dedup_incremental`. */
  private[graft] def minhashIndexDir(s: SparkSession, dir: String): String =
    scratchPlain(s, dir, "minhash_index") { td =>
      graft.dedup.Dedup.buildMinhashIndex(
        tbl(s, dir, "documents").filter(col("doc_id") % 2 === 0),
        col("doc_id"), col("text"), td,
        numHashes = 64, bands = 16, shingleK = 3)
    }

  /** Materialized Hamming index over the even-id half's md5-SimHash
    * fingerprints (portable twin of [[minhashIndexDir]]); create-once. */
  private[graft] def editDistIndexDir(s: SparkSession, dir: String): String =
    scratchPlain(s, dir, "editdist_index") { td =>
      graft.dedup.Dedup.buildEditDistanceIndex(
        tbl(s, dir, "customer").filter(col("c_custkey") % 2 === 0),
        col("c_custkey"), col("c_name"), td, maxDist = 1)
    }

  private[graft] def winnowIndexDir(s: SparkSession, dir: String): String =
    scratchPlain(s, dir, "winnow_index") { td =>
      graft.text.TextFunctions.buildWinnowIndex(
        tbl(s, dir, "documents").filter(col("doc_id") % 2 === 0),
        col("doc_id"), col("text"), td, k = 12, w = 8)
    }

  private[graft] def simhashIndexDir(s: SparkSession, dir: String): String =
    scratchPlain(s, dir, "simhash_index") { td =>
      graft.dedup.Dedup.buildFingerprintIndex(
        tbl(s, dir, "documents").filter(col("doc_id") % 2 === 0),
        col("doc_id"),
        graft.dedup.Dedup.simhash64(col("text"), algo = "md5"),
        td, maxDist = 3)
    }

  /** Indexed Hive-partitioned copy of orders (partitioned by o_year,
    * indexed on o_custkey); create-once per (sf, engine version). */
  private[graft] def indexedOrdersPart(s: SparkSession, dir: String): DataFrame =
    scratchTable(s, dir, "orders_part") { tableDir =>
      import graft.index.implicits._
      s.read.parquet(s"$dir/orders.parquet")
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(tableDir)
      s.index.create.mode("overwrite").indexBy("o_custkey").parquet(tableDir)
    }

  // ---------------------------------------------------------------------
  // Relational operator suite (SURVEY.md §2.3 delegated categories —
  // part of the complete-engine surface a reference user relies on).
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Aggregation with filter pushdown (TPC-H Q1 shape).
    "q_agg_pricing" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 4).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // Broadcast hash join (dim table) + aggregation.
    "q_join_broadcast" -> ((s, dir) => {
      import s.implicits._
      val o = tbl(s, dir, "orders")
      val c = tbl(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("total_price"))
        .orderBy($"c_mktsegment")
    }),

    // Multi-way join: fact ⋈ fact ⋈ broadcast dims.
    "q_join_multi" -> ((s, dir) => {
      import s.implicits._
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
      val n = tbl(s, dir, "nation")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy($"n_name")
        .agg(count(lit(1)).as("n_orders"),
          round(sum($"o_totalprice"), 2).as("total_price"))
        .orderBy($"n_name")
    }),

    // Left-semi join (EXISTS).
    "q_join_semi" -> ((s, dir) => {
      import s.implicits._
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders").select($"o_custkey".as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_semi")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_nationkey")
    }),

    // Left-anti join (NOT EXISTS): customers with no high-value orders.
    "q_join_anti" -> ((s, dir) => {
      import s.implicits._
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
        .filter($"o_totalprice" > 400000.0)
        .select($"o_custkey".as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti")
        .groupBy($"c_nationkey").agg(count(lit(1)).as("n_customers"))
        .orderBy($"c_nationkey")
    }),

    // Left outer join: every customer, order count may be zero.
    "q_join_outer" -> ((s, dir) => {
      import s.implicits._
      val c = tbl(s, dir, "customer")
      val o = tbl(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"),
          round(coalesce(sum($"o_totalprice"), lit(0.0)), 2).as("total_price"))
        .orderBy($"c_custkey")
        .limit(1000)
    }),

    // Window: lead/lag/first_value across an ordered partition.
    "q_window_leadlag" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      tbl(s, dir, "orders")
        .filter($"o_custkey" < 200)
        .select($"o_custkey", $"o_orderkey",
          lag($"o_totalprice", 1).over(w).as("prev_price"),
          lead($"o_totalprice", 1).over(w).as("next_price"),
          first($"o_orderkey").over(w).as("first_key"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Window: rank within group, top-k per partition.
    "q_window_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"p_brand")
        .orderBy($"p_retailprice".desc, $"p_partkey")
      tbl(s, dir, "part")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .select($"p_brand", $"p_partkey", $"p_retailprice", $"rn")
        .orderBy($"p_brand", $"rn")
    }),

    // Window: running sum (identical accumulation order both engines →
    // bit-exact prefix sums).
    "q_window_running" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, dir, "orders")
        .filter($"o_custkey" < 100)
        .withColumn("running_total", round(sum($"o_totalprice").over(w), 2))
        .select($"o_custkey", $"o_orderkey", $"running_total")
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Global sort + limit (TakeOrderedAndProject).
    "q_sort_limit" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .limit(100)
    }),

    // Set operations.
    "q_set_intersect" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "customer").select($"c_nationkey".as("nationkey"))
        .intersect(tbl(s, dir, "supplier").select($"s_nationkey".as("nationkey")))
        .orderBy($"nationkey")
    }),
    "q_set_except" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "customer").select($"c_nationkey".as("nationkey"))
        .except(tbl(s, dir, "supplier").filter($"s_acctbal" > 9000.0)
          .select($"s_nationkey".as("nationkey")))
        .orderBy($"nationkey")
    }),
    "q_set_union" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "customer").select($"c_nationkey".as("nationkey"))
        .union(tbl(s, dir, "supplier").select($"s_nationkey".as("nationkey")))
        .distinct()
        .orderBy($"nationkey")
    }),

    // Scalar string functions.
    // Full outer join with non-matching rows on BOTH sides (disjoint
    // key-range slices force left-only and right-only null fills).
    "q_join_full" -> ((s, dir) => {
      import s.implicits._
      val cust = tbl(s, dir, "customer")
        .filter($"c_custkey" <= 100L)
        .select($"c_custkey", $"c_mktsegment")
      val ords = tbl(s, dir, "orders")
        .filter($"o_custkey".between(50L, 150L))
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
      cust.join(ords, $"c_custkey" === $"o_custkey", "full_outer")
        .select(coalesce($"c_custkey", $"o_custkey").as("custkey"),
          $"c_mktsegment", coalesce($"n_orders", lit(0L)).as("n_orders"))
        .orderBy($"custkey")
    }),

    // Schema-evolution union: unionByName null-fills columns missing on
    // one side — the heterogeneous-batch shape of long-lived pipelines.
    "q_union_by_name" -> ((s, dir) => {
      import s.implicits._
      val a = tbl(s, dir, "orders")
        .select($"o_orderpriority".as("priority"), $"o_totalprice".as("amount"))
      val b = tbl(s, dir, "lineitem")
        .select($"l_extendedprice".as("amount"))
      a.unionByName(b, allowMissingColumns = true)
        .groupBy($"priority")
        .agg(count(lit(1)).as("n"), round(sum($"amount"), 2).as("total"))
        .orderBy($"priority".asc_nulls_first)
    }),

    "q_scalar_string" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "part")
        .select(
          $"p_partkey",
          upper(substring($"p_name", 1, 10)).as("name10"),
          length($"p_name").as("name_len"),
          concat($"p_brand", lit("#"), $"p_type").as("brand_type"))
        .orderBy($"p_partkey")
    }),

    // Scalar date/time functions.
    "q_scalar_datetime" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "orders")
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("o_year"),
          month($"o_orderdate").as("o_month"),
          dayofmonth($"o_orderdate").as("o_day"),
          quarter($"o_orderdate").as("o_quarter"))
        .orderBy($"o_orderkey")
        .limit(2000)
    }),

    // CASE WHEN + conditional aggregation.
    "q_case_when" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "orders")
        .select(
          when($"o_totalprice" > 300000.0, "big")
            .when($"o_totalprice" > 100000.0, "mid")
            .otherwise("small").as("bucket"),
          $"o_totalprice")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"bucket")
    }),

    // Grouping sets (ROLLUP) — nullable group keys, NULLS FIRST pinned.
    "q_rollup" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // HAVING (post-aggregation filter).
    "q_having" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "lineitem")
        .groupBy($"l_partkey")
        .agg(round(sum($"l_quantity"), 2).as("sum_qty"))
        .filter($"sum_qty" > 150.0)
        .orderBy($"l_partkey")
    }),

    // DISTINCT aggregation.
    "q_distinct_agg" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "orders")
        .agg(
          countDistinct($"o_custkey").as("n_custs"),
          count(lit(1)).as("n_orders"))
    }),

    // Statistical aggregates: stddev/variance/median (exact interpolated
    // percentile — matches DuckDB quantile_cont).
    "q_agg_stats" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(stddev($"l_quantity"), 4).as("sd_qty"),
          round(var_samp($"l_quantity"), 4).as("var_qty"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(min($"l_extendedprice"), 2).as("min_price"),
          round(max($"l_extendedprice"), 2).as("max_price"))
        .orderBy($"l_returnflag")
    }),

    // PIVOT (conditional aggregation with fixed value list).
    "q_pivot" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum($"o_totalprice"), 2))
        .orderBy($"o_orderpriority")
    }),

    // Correlated scalar subquery through the SQL surface.
    "q_subquery_scalar" -> ((s, dir) => {
      tbl(s, dir, "customer").createOrReplaceTempView("graft_customer")
      tbl(s, dir, "orders").createOrReplaceTempView("graft_orders")
      s.sql(
        """SELECT c_custkey,
          |  (SELECT count(*) FROM graft_orders o
          |   WHERE o.o_custkey = c.c_custkey) AS n_orders
          |FROM graft_customer c ORDER BY c_custkey LIMIT 1000""".stripMargin)
    }),

    // Array functions over split text (size/contains/element_at/sort+join).
    "q_scalar_array" -> ((s, dir) => {
      import s.implicits._
      val words = split($"p_type", " ")
      tbl(s, dir, "part")
        .select(
          $"p_partkey",
          size(words).as("n_words"),
          array_contains(words, "BRUSHED").cast("int").as("has_brushed"),
          element_at(words, 1).as("first_word"),
          array_join(sort_array(words), "_").as("sorted_words"))
        .orderBy($"p_partkey")
    }),

    // ------------------------------------------------------------------
    // Index engine (SURVEY.md §2.1): indexed Parquet scans — point,
    // range, IN, And/Or with unindexed residue, string equality — over a
    // multi-file lineitem copy indexed via spark.index.create. Results
    // must equal a plain scan of the original table; pruning is asserted
    // in IndexEndToEndSpec and measured in Bench.
    // ------------------------------------------------------------------

    "q_idx_point_lookup" -> ((s, dir) => {
      import s.implicits._
      val li = indexedLineitem(s, dir)
      val key = s.read.parquet(s"$dir/lineitem.parquet")
        .agg(min($"l_orderkey")).head.getLong(0)
      li.filter($"l_orderkey" === key)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity",
          $"l_returnflag")
        .orderBy($"l_linenumber")
    }),

    // Same selective point query through the ORC-backed index: stripe
    // stats + bloom prune ORC files exactly as footers prune parquet; the
    // oracle reads the identical rows from the parquet table.
    "q_idx_orc" -> ((s, dir) => {
      import s.implicits._
      val li = indexedLineitemOrc(s, dir)
      val key = s.read.parquet(s"$dir/lineitem.parquet")
        .agg(min($"l_orderkey")).head.getLong(0)
      li.filter($"l_orderkey" === key)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_quantity",
          $"l_returnflag")
        .orderBy($"l_linenumber")
    }),

    "q_idx_range_date" -> ((s, dir) => {
      import s.implicits._
      indexedLineitem(s, dir)
        .filter($"l_shipdate" >= lit("1995-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1995-04-01").cast("timestamp_ntz"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }),

    "q_idx_in_list" -> ((s, dir) => {
      import s.implicits._
      indexedLineitem(s, dir)
        .filter($"l_suppkey".isin(1L, 2L, 3L))
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Semi-join reduction through the index ("dynamic FILE pruning" for a
    // NON-partition join key — the shape DPP can't cover): the small dim's
    // distinct keys become an IN-list the per-file sketches prune with, so
    // the fact side reads only files that can contain a matching supplier.
    // Falls back to the plain join past the key cap; semantics identical.
    "q_idx_join_prune" -> ((s, dir) => {
      import s.implicits._
      val dim = tbl(s, dir, "supplier").filter($"s_suppkey" <= 3)
        .select($"s_suppkey", $"s_name")
      graft.index.JoinPrune.semiJoinPruned(
          indexedLineitem(s, dir), dim, $"l_suppkey", $"s_suppkey")
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"s_name",
          $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Runtime BLOOM join pruning (big-dim sibling of q_idx_join_prune):
    // dim keys never collected — a min/max range cut prunes fact FILES
    // through the index and a broadcast bloom gates rows map-side before
    // the join shuffle. Bloom has no false negatives, so the result is
    // the plain inner join bit-for-bit.
    "q_idx_join_bloom" -> ((s, dir) => {
      import s.implicits._
      val dim = tbl(s, dir, "orders")
        .filter($"o_custkey" === 1L).select($"o_orderkey", $"o_orderpriority")
      graft.index.JoinPrune.bloomJoinPruned(
          indexedLineitem(s, dir), dim, $"l_orderkey", $"o_orderkey")
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey",
          $"o_orderpriority", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // ARRAY-element membership through the index: the orders-to-supplier
    // arrays table is indexed on the array column's ELEMENT domain, so
    // array_contains(supps, 3) prunes files by element min/max + sketch
    // membership — the oracle replays containment as a HAVING over the
    // base lineitem rows (order-independent, so collect_list ordering
    // cannot flake the gate).
    "q_idx_array_contains" -> ((s, dir) => {
      import s.implicits._
      indexedOrderSupps(s, dir)
        .filter(array_contains($"supps", 3L))
        .select($"l_orderkey", $"n_items")
        .orderBy($"l_orderkey")
    }),

    // AUTOMATIC join pruning on a NESTED struct-leaf key: the stock join
    // condition payload.user_id = c_custkey resolves by the chain's root
    // attribute, the probe IN binds to the relation-level dotted path,
    // and the nested fold cuts files — zero API, composing the r8 nested
    // leaves with the r9 join rule.
    "q_idx_join_auto_nested" -> ((s, dir) => {
      import s.implicits._
      val dim = tbl(s, dir, "customer").filter($"c_custkey" <= 3)
        .select($"c_custkey")
      indexedOrdersNested(s, dir)
        .join(dim, $"payload.user_id" === $"c_custkey")
        .select($"o_orderkey", $"payload.user_id".as("user_id"),
          round($"payload.price", 2).as("price"))
        .orderBy($"o_orderkey")
    }),

    // Key-domain pruning of map<primitive,_> columns: map_contains_key
    // pre-translates to key membership the index answers from key
    // min/max + dict/bloom per file; the answered VALUE (element_at)
    // comes from the scan, keyed rows only.
    "q_idx_map_contains" -> ((s, dir) => {
      import s.implicits._
      indexedOrderSuppMap(s, dir)
        .filter(map_contains_key($"suppmap", 3L))
        .select($"l_orderkey", element_at($"suppmap", 3L).as("n_supp3"))
        .orderBy($"l_orderkey")
    }),

    // STRUCT-LEAF element pruning through ONE repeated level (the most
    // common real nested shape: array<struct<...>>): indexing items.supp
    // records element-domain stats over the leaf, and exists(items,
    // x -> x.supp = 3) prunes files by leaf membership; the oracle
    // replays containment as a HAVING over the base lineitem rows.
    "q_idx_array_struct" -> ((s, dir) => {
      import s.implicits._
      indexedOrderItems(s, dir)
        .filter(exists($"items", x => x.getField("supp") === 3L))
        .select($"l_orderkey", $"n_items")
        .orderBy($"l_orderkey")
    }),

    // MAP VALUE-domain pruning: every file's maps carry the SAME keys
    // (key membership can't cut), but values are range-clustered, so
    // m['okey'] = 1 cuts files by VALUE membership intersected with the
    // key verdict; the oracle replays the map lookup on base rows.
    "q_idx_map_value" -> ((s, dir) => {
      import s.implicits._
      indexedOrderValMap(s, dir)
        .filter($"attrs".getItem("okey") === 1L)
        .select($"l_orderkey", $"n_items")
        .orderBy($"l_orderkey")
    }),

    // Element IN-list through the same index: arrays_overlap with a
    // literal array pre-translates to In(element-domain) — file cut on
    // any of the probe values; the oracle replays overlap as a HAVING
    // over base rows.
    "q_idx_arrays_overlap" -> ((s, dir) => {
      import s.implicits._
      indexedOrderSupps(s, dir)
        .filter(arrays_overlap($"supps", array(lit(3L), lit(7L))))
        .select($"l_orderkey", $"n_items")
        .orderBy($"l_orderkey")
    }),

    // ANTI-join probe-side pruning (the NOT-EXISTS decontamination
    // shape): the indexed fact sits on the RIGHT of a left_anti join —
    // probe-only, so the rule injects the dim-key IN over it (a right
    // row whose key misses every left key can never kill a left row)
    // and the fact files cut; the oracle replays NOT EXISTS.
    "q_idx_join_anti" -> ((s, dir) => {
      import s.implicits._
      val dim = tbl(s, dir, "supplier").filter($"s_suppkey" <= 20)
        .select($"s_suppkey")
      dim.join(
          indexedLineitem(s, dir)
            .filter($"l_quantity" === 50 && $"l_linenumber" === 7),
          $"s_suppkey" === $"l_suppkey", "left_anti")
        .orderBy($"s_suppkey")
    }),

    // AUTOMATIC join pruning (zero-API twin of q_idx_join_prune): a stock
    // df.join over the indexed fact — no JoinPrune call anywhere — and the
    // conf-on JoinPruneRule injects the dim-key IN probe at optimize time,
    // so per-file sketches cut fact files on a NON-partition join key.
    "q_idx_join_auto" -> ((s, dir) => {
      import s.implicits._
      val dim = tbl(s, dir, "supplier").filter($"s_suppkey" <= 3)
        .select($"s_suppkey", $"s_name")
      indexedLineitem(s, dir).join(dim, $"l_suppkey" === $"s_suppkey")
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"s_name",
          $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Query through an index built by create-on-half + append + refresh:
    // both file generations must answer, with pruning (the point key is
    // odd, so it lives only in refresh-appended files).
    "q_idx_refresh" -> ((s, dir) => {
      import s.implicits._
      val li = indexedLineitemRefreshed(s, dir)
      val oddKey = s.read.parquet(s"$dir/lineitem.parquet")
        .filter($"l_orderkey" % 2 === 1)
        .agg(min($"l_orderkey")).head.getLong(0)
      li.filter($"l_orderkey" === oddKey || $"l_returnflag" === "R")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }),

    // Aggregation through a compacted-then-refreshed index: the 32-file
    // small-file tail was rewritten by Layout.compact and re-indexed by
    // spark.index.refresh; rows must match the pre-compaction table.
    "q_idx_compact" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemCompacted(s, dir)
        .filter($"l_orderkey" <= 30000L)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }),

    // Range predicate over the range-clustered layout: min/max pruning
    // works BECAUSE the layout correlates with the predicate (the
    // hash-layout q_idx_range_date scans everything; this scans the few
    // files whose shipdate slice intersects — see IndexEndToEndSpec).
    "q_idx_range_cluster" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemClustered(s, dir)
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp_ntz") &&
          $"l_shipdate" < lit("1996-04-01").cast("timestamp_ntz"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }),

    // DOUBLE range over the price-clustered layout: footer DOUBLE stats
    // ride the IEEE754-sortable-bits canonical Long domain — pruning on
    // price/score predicates the reference's 5-type limit never served
    // (file cut asserted in IndexEndToEndSpec).
    "q_idx_range_double" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemPrice(s, dir)
        .filter($"l_extendedprice" >= 50000.0 && $"l_extendedprice" < 55000.0)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }),

    // DOUBLE point lookup through the membership sketch: equality probes
    // hash the canonical sortable-bits Long, so bloom/dict sharpen the
    // verdict exactly as for integer keys.
    "q_idx_point_double" -> ((s, dir) => {
      import s.implicits._
      val key = s.read.parquet(s"$dir/lineitem.parquet")
        .agg(max($"l_extendedprice")).head.getDouble(0)
      indexedLineitemPrice(s, dir)
        .filter($"l_extendedprice" === key)
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // DECIMAL(12,2) range: canonical = unscaled Long; parquet int-backed
    // decimal footer stats serve it directly.
    "q_idx_range_decimal" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemPrice(s, dir)
        .filter($"l_quantity_dec" >= lit(BigDecimal("10.00")) &&
          $"l_quantity_dec" <= lit(BigDecimal("12.00")))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum($"l_quantity_dec").cast("double"), 2).as("sum_q"))
        .orderBy($"l_returnflag")
    }),

    // FLOAT range filter (canonical = sortable float bits widened to
    // Long); the float column only filters — outputs stay exact.
    "q_idx_range_float" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemPrice(s, dir)
        .filter($"l_discount_f" >= lit(0.09f))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"l_returnflag")
    }),

    // Metadata-only min/max/count over the DOUBLE column: answered from
    // the index files table, zero data files opened (MetadataAggregateRule
    // over the extended Canon domain).
    "q_idx_double_meta" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemPrice(s, dir)
        .agg(count(lit(1)).as("n_rows"),
          min($"l_extendedprice").as("min_price"),
          max($"l_extendedprice").as("max_price"))
    }),

    // NESTED-leaf predicates (payload.user_id / payload.status) served by
    // per-leaf footer stats — range + equality pruning on an event-style
    // struct table (file cut asserted in IndexEndToEndSpec).
    "q_idx_nested" -> ((s, dir) => {
      import s.implicits._
      indexedOrdersNested(s, dir)
        .filter($"payload.user_id" <= 50L && $"payload.status" === "O")
        .select($"o_orderkey", $"payload.user_id".as("user_id"),
          $"payload.status".as("status"),
          round($"payload.price", 2).as("price"))
        .orderBy($"o_orderkey")
    }),

    // NESTED top-k: stock orderBy on the struct leaf + limit — the
    // automatic rewrite resolves the dotted path and injects the bound.
    "q_idx_nested_topk" -> ((s, dir) => {
      import s.implicits._
      indexedOrdersNested(s, dir)
        .orderBy($"payload.user_id".desc, $"o_orderkey")
        .limit(100)
        .select($"o_orderkey", $"payload.user_id".as("user_id"))
    }),

    // NESTED metadata-only aggregate: count/min/max of the struct leaf
    // answered from the index files table (plan-asserted in
    // MetadataAggSpec).
    "q_idx_nested_meta" -> ((s, dir) => {
      import s.implicits._
      indexedOrdersNested(s, dir).agg(
        count(lit(1)).as("n_rows"),
        count($"payload.user_id").as("n_users"),
        min($"payload.user_id").as("min_user"),
        max($"payload.user_id").as("max_user"))
    }),

    // Range over an INT96-written (legacy) timestamp column: footer stats
    // are unusable for INT96, so this exercises the full-scan min/max
    // fallback end-to-end — pruning is asserted in IndexEndToEndSpec.
    "q_idx_range_ts_int96" -> ((s, dir) => {
      import s.implicits._
      indexedOrdersInt96(s, dir)
        .filter($"o_ordertime" >= lit("1995-01-01").cast("timestamp") &&
          $"o_ordertime" < lit("1995-07-01").cast("timestamp"))
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"o_orderstatus")
    }),

    // Co-located bucketed join: both tables pre-bucketed on the join key,
    // so the fact-to-fact join runs with ZERO exchange (e2e-asserted) —
    // the shuffle was paid once at ingest.
    "q_bucket_join" -> ((s, dir) => {
      import s.implicits._
      val (li, ord) = bucketedJoinTables(s, dir)
      li.join(ord.hint("merge"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("sum_qty"))
        .orderBy($"o_orderstatus")
    }),

    // Z-order layout: a conjunctive range on BOTH interleaved keys scans
    // only the files whose z-rectangle intersects; the oracle checks the
    // rows, the e2e suite asserts the pruning.
    "q_idx_zorder" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemZorder(s, dir)
        .filter($"l_suppkey".between(10, 25) && $"l_orderkey".between(5000, 20000))
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Metadata-only aggregates (MetadataAggregateRule): unfiltered
    // count/min/max over the indexed relation rewrite to a LocalRelation
    // computed from the index files table — ZERO data files opened (the
    // e2e suite asserts the plan; this row gates the VALUES). The date
    // column rides the same canonical epoch-day stats as range pruning.
    "q_idx_agg_meta" -> ((s, dir) => {
      import s.implicits._
      indexedLineitem(s, dir).agg(
        count(lit(1)).as("n_rows"),
        count($"l_orderkey").as("n_keys"),
        min($"l_orderkey").as("min_key"),
        max($"l_orderkey").as("max_key"),
        min($"l_shipdate").as("min_ship"),
        max($"l_shipdate").as("max_ship"))
    }),

    // Metadata-only DISTINCT: the exact dict sketches enumerate each
    // file's value set, so SELECT DISTINCT is the union of sketches —
    // no data scan (plan asserted in the e2e suite, values here).
    "q_idx_distinct_meta" -> ((s, dir) => {
      import s.implicits._
      indexedPartDict(s, dir).select($"p_brand").distinct().orderBy($"p_brand")
    }),

    // Metadata-only count(distinct) + string min/max through the dict
    // sketch union (plain string BOUNDS may be truncated and are never
    // served as answers; the dict enumerates attained values).
    "q_idx_agg_dict_meta" -> ((s, dir) => {
      import s.implicits._
      indexedPartDict(s, dir).agg(
        countDistinct($"p_type").as("n_types"),
        min($"p_type").as("min_type"),
        max($"p_type").as("max_type"))
    }),

    // Metadata-only GROUP BY partition column: per-partition stat folds
    // merged per group — the generalized spark.sql.optimizer.metadataOnly
    // (counts and bounds, not just keys). Zero data files opened.
    "q_idx_group_meta" -> ((s, dir) => {
      import s.implicits._
      indexedOrdersPart(s, dir)
        .groupBy($"o_year")
        .agg(count(lit(1)).as("n_orders"),
          min($"o_custkey").as("min_cust"),
          max($"o_custkey").as("max_cust"))
        .orderBy($"o_year")
    }),

    // Metadata-only partition-filtered global aggregate: the WHERE prunes
    // via partition values, the answer merges surviving partitions' folds.
    "q_idx_filter_meta" -> ((s, dir) => {
      import s.implicits._
      indexedOrdersPart(s, dir)
        .filter($"o_year" >= 1994 && $"o_year" <= 1996)
        .agg(count(lit(1)).as("n_orders"),
          min($"o_custkey").as("min_cust"),
          max($"o_custkey").as("max_cust"),
          min($"o_year").as("min_year"),
          max($"o_year").as("max_year"))
    }),

    // Index-backed TOP-K pruning: the per-block stats prove a cutoff T
    // with >= 100 non-null l_orderkey values above it, so `key >= T`
    // prunes whole files before the sort runs (e2e asserts the file cut;
    // this row gates the VALUES against the plain ORDER BY ... LIMIT).
    "q_idx_topk" -> ((s, dir) => {
      import s.implicits._
      graft.index.TopK.topKPruned(indexedLineitem(s, dir), $"l_orderkey", 100)
        .orderBy($"l_orderkey".desc, $"l_linenumber".desc)
        .limit(100)
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_extendedprice")
    }),

    // The AUTOMATIC twin of q_idx_topk: stock orderBy().limit() with no
    // TopK API call — TopKRewriteRule injects the index-proven bound
    // (plan-asserted + file-cut e2e in IndexEndToEndSpec).
    "q_idx_topk_auto" -> ((s, dir) => {
      import s.implicits._
      indexedLineitem(s, dir)
        .orderBy($"l_orderkey".desc, $"l_linenumber".desc)
        .limit(100)
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_extendedprice")
    }),

    // GROUPED top-k with index-backed file pruning: the 10 highest
    // custkeys PER YEAR over the Hive-partitioned orders table — one
    // range predicate (the weakest per-partition kth bound) preserves
    // every year's top-10 at once, then the window ranks survivors. The
    // fixture's hash-ish layout proves VALUES; the file cut on a
    // clustered layout is e2e-asserted in IndexEndToEndSpec.
    "q_idx_topk_group" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_year").orderBy($"o_custkey".desc, $"o_orderkey")
      graft.index.TopK.topKPerGroupPruned(
          indexedOrdersPart(s, dir), $"o_year", $"o_custkey", 10)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 10)
        .select($"o_year", $"rn", $"o_orderkey", $"o_custkey")
        .orderBy($"o_year", $"rn")
    }),

    // The AUTOMATIC twin of q_idx_topk_group: stock window rank filter,
    // no API call — TopKRewriteRule bounds Spark's WindowGroupLimit
    // lowering with the weakest per-partition kth bound (plan-asserted +
    // file-cut e2e in IndexEndToEndSpec).
    "q_idx_topk_group_auto" -> ((s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_year").orderBy($"o_custkey".desc, $"o_orderkey")
      indexedOrdersPart(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 10)
        .select($"o_year", $"rn", $"o_orderkey", $"o_custkey")
        .orderBy($"o_year", $"rn")
    }),

    // Salted equi-join (hot-key skew shape): deterministic row-hash salt
    // on the big side, small side replicated xsalts, join on (key, salt);
    // merge hint keeps it a shuffle join so the salt actually matters.
    "q_skew_join" -> ((s, dir) => {
      import s.implicits._
      val joined = graft.ops.Skew.saltedJoin(
        tbl(s, dir, "lineitem").select($"l_orderkey", $"l_extendedprice"),
        "l_orderkey",
        tbl(s, dir, "orders").select($"o_orderkey", $"o_orderpriority").hint("merge"),
        "o_orderkey", salts = 8)
      joined.groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("total"))
        .orderBy($"o_orderpriority")
    }),

    "q_idx_and_or" -> ((s, dir) => {
      import s.implicits._
      val key = s.read.parquet(s"$dir/lineitem.parquet")
        .agg(max($"l_orderkey")).head.getLong(0)
      indexedLineitem(s, dir)
        .filter(($"l_returnflag" === "R" && $"l_suppkey" === 1L) ||
          $"l_orderkey" === key)
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_returnflag")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "q_idx_string_eq" -> ((s, dir) => {
      import s.implicits._
      indexedLineitem(s, dir)
        .filter($"l_returnflag" === "A")
        .groupBy($"l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum($"l_extendedprice"), 2).as("total"))
        .orderBy($"l_linestatus")
    }),

    // Dict/bitmap sketch variants under the oracle gate: exact-set dict
    // on the long key, roaring bitmap on the int line number.
    "q_idx_dict" -> ((s, dir) => {
      import s.implicits._
      indexedLineitemDict(s, dir)
        .filter($"l_suppkey" === 7L && $"l_linenumber" === 2)
        .select($"l_orderkey", $"l_linenumber", $"l_suppkey", $"l_quantity")
        .orderBy($"l_orderkey")
    }),

    // Hive-partitioned table: partition pruning (o_year) composes with
    // index-statistics pruning (o_custkey) inside listFiles.
    // Substring predicates (Contains + EndsWith) answered by the EXACT
    // dict sketches: files whose p_type dictionary lacks a '%CONOM%'
    // match are pruned — min/max can't do this, only a dictionary can.
    "q_idx_contains" -> ((s, dir) => {
      import s.implicits._
      indexedPartDict(s, dir)
        .filter($"p_type".contains("CONOM") && $"p_brand".endsWith("3"))
        .select($"p_partkey", $"p_brand", $"p_type", $"p_retailprice")
        .orderBy($"p_partkey")
    }),

    "q_idx_partition" -> ((s, dir) => {
      import s.implicits._
      val part = indexedOrdersPart(s, dir)
      val key = s.read.parquet(s"$dir/orders.parquet")
        .filter(year($"o_orderdate") === 1995)
        .agg(min($"o_custkey")).head.getLong(0)
      part.filter($"o_year" === 1995 && $"o_custkey" === key)
        .select($"o_orderkey", $"o_custkey", $"o_year", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    // ------------------------------------------------------------------
    // Training-data pipeline operators (graft.text / dedup / ann /
    // multimodal) over the documents + embeddings tables.
    // ------------------------------------------------------------------

    // Token counting + BPE-ish subword estimate.
    "q_text_tokens" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents")
        .select($"doc_id",
          graft.text.TextFunctions.tokenCount($"text").as("n_tokens"),
          graft.text.TextFunctions.subwordCountEstimate($"text").as("n_subwords"),
          length($"text").as("n_chars_raw"))
        .orderBy($"doc_id")
    }),

    // BPE tokenizer TRAINING: distributed word-count pass, driver merge
    // learning over the (distinct-word-sized) table. VALUE-GATED: the
    // trainer's whole iterative loop replays in SQL — a recursive CTE
    // whose working table is the per-round word/symbol state, the
    // global argmax an aggregate over the previous iteration (count
    // desc, pair asc tie-break), the merge sweep a parity-selected
    // non-overlapping replacement (handles a == b runs) — and matches
    // the TreeSet trainer bit-for-bit; BpeSpec additionally diffs it
    // against a naive recount-everything reference.
    "q_text_bpe_merges" -> ((s, dir) => {
      import s.implicits._
      val wc = graft.text.Bpe.wordCounts(
        tbl(s, dir, "documents"), $"text", minCount = 2L)
      s.createDataFrame(graft.text.Bpe.train(wc, numMerges = 24))
        .select($"rank", $"left", $"right", $"pairCount".as("pair_count"))
        .orderBy($"rank")
    }),

    // BPE ENCODING, value-gated: the codegen'd kernel under a FIXED
    // plan-literal merge table (hierarchical, a != b for every pair, so
    // a single round's sweep has no overlapping occurrences and the
    // oracle's recursive-CTE replay over distinct words is exact —
    // lowest-rank adjacent pair per round, all occurrences merged
    // left-to-right). Emits the full subword segmentation per doc.
    // Encoding under TRAINED merges (the q_text_bpe_merges output) is
    // the same kernel + BpeSpec's differential tests.
    "q_text_bpe_encode" -> ((s, dir) => {
      import s.implicits._
      val toks = graft.text.TextFunctions.tokens($"text")
      val enc = graft.text.Bpe.encode(toks, bpeFixedMerges)
      tbl(s, dir, "documents").select($"doc_id",
          size(toks).as("n_words"),
          size(enc).as("n_subwords"),
          concat_ws(" ", enc).as("subwords"))
        .orderBy($"doc_id")
    }),

    // The TRAIN -> ENCODE integration gate: merges learned from the
    // corpus (the q_text_bpe_merges trainer), then the codegen'd encode
    // kernel segments every document under them — and the ORACLE
    // replays BOTH stages in SQL (trainer recursion + encoder recursion
    // composed), so the full tokenizer pipeline is hash-verified, not
    // just its parts.
    "q_text_bpe_encode_trained" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val merges = graft.text.Bpe.mergesOf(graft.text.Bpe.train(
        graft.text.Bpe.wordCounts(docs, $"text", minCount = 2L), numMerges = 24))
      val enc = graft.text.Bpe.encode(
        graft.text.TextFunctions.tokens($"text"), merges)
      docs.select($"doc_id",
          size(enc).as("n_subwords"),
          concat_ws(" ", enc).as("subwords"))
        .orderBy($"doc_id")
    }),

    // Quality scoring: ratios + combined score.
    "q_text_quality" -> ((s, dir) => {
      import s.implicits._
      val t = graft.text.TextFunctions
      tbl(s, dir, "documents")
        .select($"doc_id",
          round(t.punctRatio($"text"), 4).as("punct_ratio"),
          round(t.digitRatio($"text"), 4).as("digit_ratio"),
          round(t.stopwordRatio($"text"), 4).as("stopword_ratio"),
          t.qualityScore($"text").as("quality"))
        .orderBy($"doc_id")
    }),

    // Corpus DATA CARD: the per-source release summary (volume, exact
    // verbatim-dup count, language mix, mean quality) in one grouped
    // pass over the same deterministic signals the curation gates use.
    // Quality means sum in exact integer 1e-4 units (the per-doc score
    // is already 4dp-rounded) so the mean is order-independent; the
    // oracle replays every signal including the langid chain.
    "q_report_datacard" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Report.corpusDataCard(
          tbl(s, dir, "documents"), $"source", $"text")
        .orderBy($"source")
    }),

    // Round-4 composed curation pipeline: Gopher rule gate → URL/domain
    // provenance filter → corpus mix to target composition (with
    // epoch upsampling). The oracle replays all three stages — flags,
    // domain NOT IN, and the full mix derivation with counts taken over
    // the SURVIVOR set.
    "q_pipeline_curate2" -> ((s, dir) => {
      import s.implicits._
      val t = graft.text.TextFunctions
      val gated = tbl(s, dir, "documents").filter(
        t.gopherFlags($"text", minWords = 40, maxWords = 100000,
          minMeanWordLen = 4.0, maxMeanWordLen = 10.0,
          maxDigitRatio = 0.2, minStopwordHits = 2).getField("pass"))
      val withUrl = gated.withColumn("url",
        concat(lit("https://www."), $"source", lit(".example.com/doc/"), $"doc_id"))
      val clean = graft.text.Web.filterBlockedDomains(withUrl, $"url",
        Seq("src1.example.com", "src3.example.com", "src5.example.com"))
      graft.ops.Sampling.mixCorpus(clean, $"doc_id", $"source",
          weights = Map("src0" -> 1.0, "src2" -> 1.0, "src4" -> 2.0),
          totalRows = 60L, allowUpsample = true, salt = "cur2")
        .select($"doc_id", $"source", $"epoch")
        .orderBy($"doc_id", $"epoch")
    }),

    // Round-5 composed curation pipeline: zero-duplicate-segment gate
    // (Gopher dup-line, strict) → bigram-LM middle band (CCNet-style:
    // cut word salad AND boilerplate; model trained on the FULL corpus)
    // → registrable-domain (eTLD+1) provenance gate over subdomain-
    // varying URLs → deterministic 10-per-source cap. The oracle replays
    // every stage from scratch.
    "q_pipeline_curate3" -> ((s, dir) => {
      import s.implicits._
      val t = graft.text.TextFunctions
      val docs = tbl(s, dir, "documents")
      // gate on the exact integer count, not the 4-dp rounded fraction:
      // a >20k-segment doc with one duplicate rounds to 0.0 but the
      // DuckDB oracle's count(*) > count(DISTINCT seg) would exclude it
      val seg = docs.filter(
        t.duplicateSegmentStats($"text", k = 2).getField("dup_segments") === 0L)
      val lm = graft.text.Tfidf.bigramNll(docs, $"doc_id", $"text")
        .filter($"avg_nll_micro".between(3340000L, 3430000L))
        .select($"doc_id", $"avg_nll_micro")
      val banded = seg.join(lm, Seq("doc_id"))
      val sub = when($"doc_id" % 4 === 0, "www.").when($"doc_id" % 4 === 1, "a.b.")
        .when($"doc_id" % 4 === 2, "").otherwise("sub.")
      val tld = when($"doc_id" % 3 === 0, ".com")
        .when($"doc_id" % 3 === 1, ".co.uk").otherwise(".com.au")
      val withUrl = banded.withColumn("url",
        concat(lit("https://"), sub, $"source", tld, lit("/doc/"), $"doc_id"))
      val clean = graft.text.Web.filterBlockedRegistrable(withUrl, $"url",
        Seq("src1.co.uk", "src3.com.au", "src5.com"))
      graft.ops.Sampling.stratifiedSample(
          clean, $"source", $"doc_id", n = 10, salt = "cur3")
        .select($"doc_id", $"source", $"avg_nll_micro")
        .orderBy($"doc_id")
    }),

    // Duplicate-segment fraction (Gopher's dup-line signal at 2-word
    // segment granularity): 181/500 docs at sf0.01 carry at least one
    // repeated segment, so the fraction genuinely splits the corpus.
    "q_text_dupseg" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents")
        .select($"doc_id",
          graft.text.TextFunctions.duplicateSegmentStats($"text", k = 2).as("d"))
        .select($"doc_id", $"d.n_segments", $"d.dup_segments", $"d.dup_fraction")
        .orderBy($"doc_id")
    }),

    // Gopher-style rule gate: per-rule flags + overall pass, thresholds
    // chosen to split the corpus on every rule the synthetic text can
    // exercise. The oracle re-derives each flag from scratch.
    "q_text_gopher" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents")
        .select($"doc_id",
          graft.text.TextFunctions.gopherFlags($"text",
            minWords = 40, maxWords = 100000,
            minMeanWordLen = 4.0, maxMeanWordLen = 10.0,
            maxDigitRatio = 0.2, minStopwordHits = 2).as("g"))
        .select($"doc_id", $"g.words_ok", $"g.mean_word_len_ok",
          $"g.digit_ok", $"g.stopword_ok", $"g.pass")
        .orderBy($"doc_id")
    }),

    // URL/domain provenance filter: deterministic per-doc URLs, blocklist
    // drops three source domains map-side (literal NOT IN — no shuffle).
    // URL blocklist keyed on the REGISTRABLE domain (eTLD+1 via the
    // embedded public-suffix snapshot): fixtures vary subdomain depth
    // (www./a.b./bare/sub.) and TLD shape (.com/.co.uk/.com.au), so
    // 'src1.co.uk' must block 'a.b.src1.co.uk' but not 'src1.com'. The
    // oracle re-derives host, www-stripped domain, and registrable
    // domain from the same suffix snapshot.
    "q_web_domains" -> ((s, dir) => {
      import s.implicits._
      val sub = when($"doc_id" % 4 === 0, "www.")
        .when($"doc_id" % 4 === 1, "a.b.")
        .when($"doc_id" % 4 === 2, "").otherwise("sub.")
      val tld = when($"doc_id" % 3 === 0, ".com")
        .when($"doc_id" % 3 === 1, ".co.uk").otherwise(".com.au")
      val docs = tbl(s, dir, "documents").withColumn("url",
        concat(lit("https://"), sub, $"source", tld, lit("/doc/"), $"doc_id"))
      graft.text.Web.filterBlockedRegistrable(docs, $"url",
          Seq("src1.co.uk", "src3.com.au", "src5.com"))
        .select($"doc_id", graft.text.Web.domainOf($"url").as("domain"),
          graft.text.Web.registrableDomainOf($"url").as("registrable"))
        .orderBy($"doc_id")
    }),

    // Canonical URL normalization (the first, cheapest crawl-dedup tier):
    // planted URLs vary scheme case, www/sub labels, default vs explicit
    // ports, trailing slashes, tracking params, param order and
    // fragments; the oracle replays construction AND every normalization
    // rule with the same engine-portable regexes. Pure map-side.
    "q_web_urlnorm" -> ((s, dir) => {
      import s.implicits._
      val scheme = when($"doc_id" % 2 === 0, "HTTPS://").otherwise("http://")
      val sub = when($"doc_id" % 4 === 0, "WWW.")
        .when($"doc_id" % 4 === 1, "a.B.").otherwise("")
      val port = when($"doc_id" % 3 === 0, ":443")
        .when($"doc_id" % 3 === 1, ":8080").otherwise("")
      val pathTail = when($"doc_id" % 2 === 1, "/").otherwise("")
      val qs = when($"doc_id" % 4 === 0, "?utm_source=news&b=2&a=1")
        .when($"doc_id" % 4 === 1, "?gclid=99")
        .when($"doc_id" % 4 === 2, "?z=1&fbclid=abc&a=2&").otherwise("")
      val frag = when($"doc_id" % 5 === 0, "#Sec2").otherwise("")
      tbl(s, dir, "documents")
        .withColumn("url", concat(scheme, sub, $"source", lit(".com"), port,
          lit("/Doc/"), $"doc_id", pathTail, qs, frag))
        .select($"doc_id", $"url",
          graft.text.Web.normalizeUrl($"url").as("norm_url"))
        .orderBy($"doc_id")
    }),

    // HTML -> visible text (the step between crawl fetch and every
    // content heuristic): planted pages exercise script/style content
    // removal (including '<' inside code), comments, tag separators and
    // the entity decode chain; the oracle replays the same order-pinned
    // regex chain. Pure map-side.
    "q_web_htmltext" -> ((s, dir) => {
      import s.implicits._
      val stylePart = when($"doc_id" % 4 === 0,
        "<style>p { color: #fff; }</style>").otherwise("")
      val scriptPart = when($"doc_id" % 3 === 0,
        "<script type=\"text/javascript\">if (a<b && c>d) { alert('x'); }</script>")
        .otherwise("")
      val commentPart = when($"doc_id" % 5 === 0,
        "<!-- hidden <b>note</b> -->").otherwise("")
      val entities = when($"doc_id" % 2 === 0,
        " Fish &amp; Chips &lt;tm&gt; say &quot;hi&quot; it&#39;s a&nbsp;b")
        .otherwise("")
      tbl(s, dir, "documents")
        .withColumn("html", concat(
          lit("<html><head><title>Doc "), $"doc_id", lit("</title>"),
          stylePart, scriptPart, lit("</head>\n<body>"), commentPart,
          lit("<h1>Doc "), $"doc_id", lit("</h1>\n<p>"),
          substring($"text", 1, 120), lit("</p>"), entities,
          lit("</body></html>")))
        .select($"doc_id", graft.text.Web.htmlToText($"html").as("clean_text"))
        .orderBy($"doc_id")
    }),

    // Link-density boilerplate pruning (the jusText/trafilatura-class
    // heuristic): planted pages carry a nav bar, a "read more" promo row
    // and a footer — all mostly anchor text — around real prose; blocks
    // split at block-tag boundaries, each scored by token count and
    // anchor-token share (integer cross-multiplied gate). The oracle
    // replays the split, both text chains and the token arithmetic.
    "q_web_htmlblocks" -> ((s, dir) => {
      import s.implicits._
      val nav = "<nav><a href='/'>Home</a> <a href='/a'>About us</a> " +
        "<a href='/c'>Contact</a></nav>"
      val promo = "<div>Read more: <a href='/x'>click here now</a> and " +
        "<a href='/y'>subscribe to our newsletter</a></div>"
      val footer = "<footer><a href='/p'>Privacy policy</a> " +
        "<a href='/t'>Terms</a></footer>"
      val withHtml = tbl(s, dir, "documents")
        .withColumn("html", concat(
          lit("<html><body>" + nav), lit("<h1>Doc "), $"doc_id",
          lit("</h1><p>"), substring($"text", 1, 200), lit("</p>"),
          when($"doc_id" % 3 === 0, promo).otherwise(""),
          lit(footer + "</body></html>")))
      graft.text.Web.htmlBlocks(withHtml, $"doc_id", $"html",
          minTokens = 5, maxAnchorPct = 50)
        .orderBy($"doc_id", $"block_idx")
    }),

    // PageRank link centrality (the CommonCrawl-style crawl/keep signal)
    // over a deterministic doc_id-arithmetic link graph, 5 iterations.
    // Integer nano-rank arithmetic end to end (floor divisions, integer
    // sums) — the oracle replays all 5 iterations exactly, no float
    // accumulation anywhere.
    "q_web_pagerank" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val n = docs.count()
      val e = docs.select($"doc_id".as("src"), (($"doc_id" * 7 + 1) % n).as("dst"))
        .union(docs.select($"doc_id".as("src"), (($"doc_id" * 13 + 5) % n).as("dst")))
        .filter($"src" =!= $"dst")
      graft.ops.Graph.pageRank(e, $"src", $"dst", iters = 5)
        .select($"node", $"rank".as("rank_nano"))
        .orderBy($"node")
    }),

    // Language-ID heuristic distribution.
    "q_text_langid" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents")
        .select(graft.text.TextFunctions.langId($"text").as("lang_pred"))
        .groupBy($"lang_pred").agg(count(lit(1)).as("n"))
        .orderBy($"lang_pred")
    }),

    // Corpus-level term frequencies: explode tokens → count → top 50
    // (partial aggregation map-side; only (token, count) pairs shuffle).
    "q_text_topterms" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents")
        .select(explode(graft.text.TextFunctions.tokens($"text")).as("tok"))
        .groupBy($"tok").agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"tok")
        .limit(50)
    }),

    // Document fingerprinting (md5 of normalized text).
    "q_text_fingerprint" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "documents")
        .select($"doc_id", graft.text.TextFunctions.fingerprint($"text").as("fp"))
        .orderBy($"doc_id")
        .limit(200)
    }),

    // Exact dedup groups on a content-prefix hash key.
    "q_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      val key = md5(concat_ws(" ",
        slice(graft.text.TextFunctions.tokens($"text"), 1, 3)))
      tbl(s, dir, "documents")
        .groupBy(key.as("dup_key"))
        .agg(count(lit(1)).as("group_size"), min($"doc_id").as("keeper_id"))
        .filter($"group_size" > 1)
        .orderBy($"dup_key")
    }),

    // Exact n-gram Jaccard near-dup pairs (k=3, τ=0.5).
    "q_dedup_ngram" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.ngramJaccardPairs(
          tbl(s, dir, "documents"), $"doc_id", $"text", shingleK = 3, threshold = 0.5)
        .orderBy($"id_a", $"id_b")
    }),

    // Cross-source LEAKAGE matrix (data governance): per unordered source
    // pair, document pairs sharing verbatim content through the winnow
    // match join — the "does src A copy from src B" release review.
    // Oracle: the full winnow replay + source joins + least/greatest
    // grouping.
    "q_report_leakage" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Report.leakageMatrix(
          tbl(s, dir, "documents"), $"doc_id", $"text", $"source",
          k = 12, w = 8, minShared = 5L, maxDf = 40L)
        .orderBy($"source_a", $"source_b")
    }),

    // Phrase-blocklist audit (safety filtering): which banned phrases
    // each document contains, via ONE Aho-Corasick pass per doc over the
    // plan-literal phrase set — O(len + matches) however long the list,
    // where per-phrase contains() rescans the corpus N times. Substring
    // semantics == contains, so the oracle is a list_filter replay.
    "q_text_blocklist" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.blocklistMatches(
          tbl(s, dir, "documents"), $"doc_id", $"text",
          Seq("fast table", "scan slow", "batch window spark",
            "customer query", "value sort column"))
        // comparator-safe: the driver's pandas sort can't hash raw arrays
        .select($"doc_id", concat_ws("|", $"matched").as("matched"))
        .orderBy($"doc_id")
    }),

    // MOSS winnowing matches (Schleimer et al. 2003): document pairs
    // sharing >= 5 selected k-gram fingerprints after a max-df boilerplate
    // cull — the POSITIONAL substring-match signal (guaranteed for shared
    // runs >= k+w-1 chars) set-based shingles drop. md5-lower-64 gram
    // hashes make the whole selection DuckDB-replayable bit-for-bit.
    "q_text_winnow" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.winnowPairs(
          tbl(s, dir, "documents"), $"doc_id", $"text",
          k = 12, w = 8, minShared = 5L, maxDf = 40L)
        .orderBy($"id_a", $"id_b")
    }),

    // INCREMENTAL winnow dedup against the materialized fingerprint
    // table (the exact-substring twin of q_dedup_simhash_incremental):
    // even-id docs are winnow-indexed once; the odd-id batch selects only
    // its own fingerprints and equi-joins the stored table. Oracle: a
    // batch doc survives iff no corpus-half partner shares >= 5 distinct
    // fingerprints over the bit-exact md5 winnow replay.
    "q_text_winnow_incremental" -> ((s, dir) => {
      import s.implicits._
      val batch = tbl(s, dir, "documents").filter($"doc_id" % 2 === 1)
      graft.text.TextFunctions.dedupAgainstWinnowIndex(s, batch,
          $"doc_id", $"text", winnowIndexDir(s, dir),
          k = 12, w = 8, minShared = 5L)
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    // Edit-distance similarity self-join (record linkage / fuzzy entity
    // matching): all customer-name pairs within levenshtein 1 via
    // symmetric-delete blocking (exact recall, no cross join). Oracle:
    // exact cross-join levenshtein.
    "q_dedup_editdist" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.editDistancePairs(
          tbl(s, dir, "customer"), $"c_custkey", $"c_name", maxDist = 1)
        .orderBy($"id_a", $"id_b")
    }),

    // INCREMENTAL record linkage against the materialized edit-distance
    // index (streaming entity resolution): even-id customers' deletion
    // variants are indexed once; the odd-id batch generates only its own
    // neighborhood and equi-joins the stored variants, then levenshtein
    // verifies. Oracle: exact cross-half levenshtein join.
    "q_dedup_editdist_incremental" -> ((s, dir) => {
      import s.implicits._
      val batch = tbl(s, dir, "customer").filter($"c_custkey" % 2 === 1)
      graft.dedup.Dedup.matchAgainstEditDistanceIndex(s, batch,
          $"c_custkey", $"c_name", editDistIndexDir(s, dir), maxDist = 1)
        .orderBy($"id", $"corpus_id")
    }),

    // Spell correction against a corpus-derived vocabulary: per mutated
    // part-name token the closest dictionary word within levenshtein 1
    // (ties by match asc); the exploded dictionary broadcasts so the
    // query side never shuffles. Oracle: exact cross-join + window rank.
    "q_text_spellcorrect" -> ((s, dir) => {
      import s.implicits._
      val p = tbl(s, dir, "part")
      val dict = p.select(explode(split($"p_name", " ")).as("w"))
      val qs = p.select($"p_partkey".as("qid"),
        expr("substr(element_at(split(p_name, ' '), 1), 1, 1) || " +
          "substr(element_at(split(p_name, ' '), 1), 3)").as("q"))
      graft.dedup.Dedup.spellCorrect(qs, $"qid", $"q", dict, $"w", maxDist = 1)
        .orderBy($"id")
    }),

    // Directed containment pairs (excerpt / quote / truncated-copy
    // detection): C(A→B) = |sh(A)∩sh(B)| / |sh(A)| ≥ 0.7 via the LOSSLESS
    // prefix-filter join (PPJoin family) — the asymmetric signal Jaccard
    // LSH can't see. Oracle: exact cross-join containment.
    "q_dedup_containment" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.containmentPairs(
          tbl(s, dir, "documents"), $"doc_id", $"text", shingleK = 3, threshold = 0.7)
        .orderBy($"id_a", $"id_b")
    }),

    // MinHash+LSH near-dup pairs — same planted duplicates, banded join
    // (no cross join). Oracle: the exact-Jaccard pair SET (id_a, id_b);
    // est_jaccard is signature-estimated so only pair identity is
    // oracle-checkable.
    "q_dedup_minhash" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.minhashPairs(
          tbl(s, dir, "documents"), $"doc_id", $"text",
          numHashes = 64, bands = 16, shingleK = 3, threshold = 0.5)
        .select($"id_a", $"id_b")
        .orderBy($"id_a", $"id_b")
    }),

    // INCREMENTAL dedup against the materialized MinHash index: the
    // even-id half of documents is indexed once (signatures + band keys
    // stored); the odd-id half arrives as a new batch that computes only
    // its own signatures and joins the stored bands. Oracle: a batch doc
    // survives iff it has no exact-Jaccard >= 0.5 partner in the corpus
    // half (the same est==exact pair-set equivalence q_dedup_minhash
    // rests on, restricted to cross-half pairs).
    "q_dedup_incremental" -> ((s, dir) => {
      import s.implicits._
      val batch = tbl(s, dir, "documents").filter($"doc_id" % 2 === 1)
      graft.dedup.Dedup.dedupAgainstIndex(s, batch, $"doc_id", $"text",
          minhashIndexDir(s, dir),
          numHashes = 64, bands = 16, shingleK = 3, threshold = 0.5)
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    // Near-duplicate clusters: LSH pairs → exact-Jaccard verify →
    // connected components (the shape corpus dedup actually ships).
    // `members` is emitted as a comma-joined string (numeric order kept):
    // the driver's comparison hashes scalar cells, not arrays.
    "q_dedup_clusters" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.duplicateClusters(
          tbl(s, dir, "documents"), $"doc_id", $"text", shingleK = 3, threshold = 0.5)
        .withColumn("members",
          array_join(expr("transform(members, x -> cast(x as string))"), ","))
        .orderBy($"cluster_id")
    }),

    // PII redaction: emails / IPv4 / phone numbers masked by an engine-
    // portable regex chain. PII is planted per-doc so the oracle checks
    // every mask actually fires on varying inputs.
    "q_text_redact" -> ((s, dir) => {
      import s.implicits._
      val planted = concat(
        substring($"text", 1, 80),
        lit(" contact user"), $"doc_id", lit("@example.com or 10.0."),
        $"doc_id" % 256, lit(".7 call 555-123-4567"))
      tbl(s, dir, "documents")
        .select($"doc_id", graft.text.TextFunctions.redactPii(planted).as("redacted"))
        .orderBy($"doc_id")
        .limit(300)
    }),

    // Per-document 2-gram repetition ratio (boilerplate signal).
    "q_text_repetition" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.repetitionStats(
          tbl(s, dir, "documents"), $"doc_id", $"text", k = 2)
        .orderBy($"doc_id")
    }),

    // End-to-end curation pipeline — the composition a training-data run
    // actually ships: quality + language gate → exact content dedup
    // (md5 fingerprint, keep smallest id) → deterministic stratified
    // sample per source. Every stage is one of this engine's operators.
    "q_pipeline_curate" -> ((s, dir) => {
      import s.implicits._
      val t = graft.text.TextFunctions
      val scored = tbl(s, dir, "documents")
        .select($"doc_id", $"source",
          t.qualityScore($"text").as("quality"),
          t.langId($"text").as("lang_pred"),
          t.fingerprint($"text").as("fp"))
        .filter($"quality" >= 0.5 && $"lang_pred".isin("en", "und"))
      val deduped = graft.dedup.Dedup.dedupExact(scored, $"fp", $"doc_id")
      graft.ops.Sampling.stratifiedSample(
          deduped, $"source", $"doc_id", n = 10, salt = "cur")
        .select($"doc_id", $"source", $"quality")
        .orderBy($"doc_id")
    }),

    // Inverted index: (term, chunk) → bounded posting chunk, with the
    // per-term doc_freq total re-attached; chunkSize 100 so the sf0.01
    // corpus genuinely splits terms across chunks. Postings emitted as
    // size + first/last ids (driver compare hashes scalar cells only).
    "q_text_invindex" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.invertedIndex(
          tbl(s, dir, "documents"), $"doc_id", $"text", chunkSize = 100)
        .select($"term", $"chunk_idx", $"doc_freq",
          size($"postings").as("chunk_docs"),
          element_at($"postings", 1).as("first_doc"),
          element_at($"postings", -1).as("last_doc"))
        .orderBy($"term", $"chunk_idx")
    }),

    // Conjunctive keyword search by posting intersection.
    "q_text_search" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.searchAll(
          tbl(s, dir, "documents"), $"doc_id", $"text", Seq("spark", "window"))
        .orderBy($"doc_id")
    }),

    // The same conjunctive search served from the MATERIALIZED index
    // (built incrementally: even half built, odd half appended) — the
    // corpus text is never read at query time; term-IN row-group pruning
    // reads only the probed posting lists. Shares q_text_search's oracle.
    "q_text_search_indexed" -> ((s, dir) => {
      import s.implicits._
      graft.text.SearchIndex.searchIndexAll(
          s, searchIndexDir(s, dir), Seq("spark", "window"))
        .orderBy($"doc_id")
    }),

    // Deterministic train/val/test split by salted-hash range.
    "q_sample_split" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sampling.assignSplit(
          tbl(s, dir, "documents"), $"doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)), salt = "s3")
        .select($"doc_id", $"source", $"split")
        .orderBy($"doc_id")
    }),

    // Corpus-level boilerplate segment removal (line-dedup shape): drop
    // 2-token segments occurring in >= 20 distinct docs; the frequent-
    // segment lexicon is aggregated once and the corpus side is cleaned
    // in a pure map-side projection (no shuffle of the documents).
    "q_text_segdedup" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.dedupSegments(
          tbl(s, dir, "documents"), $"doc_id", $"text", k = 2, minDocs = 20)
        .orderBy($"doc_id")
    }),

    // Sliding-window chunking (size 32, stride 16): the context-window
    // prep step before embedding/packing; pure map-side explode.
    "q_text_chunks" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.chunkDocs(
          tbl(s, dir, "documents"), $"doc_id", $"text", k = 32, stride = 16)
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // Okapi BM25 ranking for a two-term query (identical double
    // arithmetic on both engines; 4dp round).
    "q_text_bm25" -> ((s, dir) => {
      import s.implicits._
      graft.text.Tfidf.bm25(
          tbl(s, dir, "documents"), $"doc_id", $"text", Seq("spark", "window"))
        .orderBy($"doc_id")
    }),

    // BM25 served from the materialized search index: stored tf/len
    // tables through the SAME scoring body (Tfidf.bm25From) — bit-
    // identical to the from-scratch run, including after the odd-half
    // append. Shares q_text_bm25's oracle.
    "q_text_bm25_indexed" -> ((s, dir) => {
      import s.implicits._
      graft.text.SearchIndex.bm25Index(
          s, searchIndexDir(s, dir), Seq("spark", "window"))
        .orderBy($"doc_id")
    }),

    // Per-document token-distribution entropy (diversity/boilerplate
    // signal): c·ln(c) quantized to integer micro-nats before the
    // per-doc sum, integer division — exact integer arithmetic in every
    // cross-row reduction, replayed by the oracle.
    "q_text_entropy" -> ((s, dir) => {
      import s.implicits._
      graft.text.Tfidf.tokenEntropy(tbl(s, dir, "documents"), $"doc_id", $"text")
        .orderBy($"doc_id")
    }),

    // Trigram-index substring search (the pg_trgm shape): the corpus's
    // distinct character trigrams land as two chunked posting segments
    // (even/odd halves — the append path), then a cross-word pattern is
    // served index-first: posting reads pruned to the pattern's grams,
    // all-gram intersection candidates, exact contains verify over ONLY
    // candidate corpus rows. Verify makes it exact, so the oracle is
    // the brute substring scan — a blocking false-negative would
    // surface as a missing row.
    "q_text_trgm" -> ((s, dir) => {
      import s.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/trgm_index"
      val fs = new org.apache.hadoop.fs.Path(td)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(td), true)
      val docs = tbl(s, dir, "documents")
      graft.text.Trigram.appendSegment(
        docs.filter($"doc_id" % 2 === 0), $"doc_id", $"text", td, "b0")
      graft.text.Trigram.appendSegment(
        docs.filter($"doc_id" % 2 === 1), $"doc_id", $"text", td, "b1")
      graft.text.Trigram.searchSubstring(s, td, docs, $"doc_id", $"text",
          pattern = "spark wind")
        .orderBy($"doc_id")
    }),

    // ORACLE-PORTABLE approximate profile: per-column rows/nulls plus a
    // distinct estimate whose arithmetic replays in SQL (the portable
    // per-group HLL) — the wide-table profiling path, now value-gated
    // where approx_count_distinct's opaque sketch couldn't be.
    "q_profile_portable" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Profile.profilePortable(tbl(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderpriority", "o_orderdate"), p = 10)
        .orderBy($"col")
    }),

    // Distributed per-group approx-distinct over the SAME portable HLL:
    // per-(source, register) fold, then a per-group harmonic sum in
    // EXACT integer arithmetic (2^-rank scaled to 2^(48-rank) BIGINTs),
    // linear-counting correction — the estimate itself replays in SQL,
    // which approx_count_distinct's opaque sketch cannot.
    "q_text_hll_group" -> ((s, dir) => {
      import s.implicits._
      val toks = tbl(s, dir, "documents")
        .select($"source",
          explode(graft.text.TextFunctions.tokens($"text")).as("term"))
      graft.ops.Hll.approxDistinctByGroup(toks, $"source", $"term", p = 7)
        .select($"group".as("grp"), $"v_zero", $"t_scaled", $"est")
        .orderBy($"grp")
    }),

    // Engine-portable HyperLogLog sketch over the document vocabulary:
    // the register table (top-10-bit register, leading-zero rank via
    // OR-smear + bit_count — pure integer ops) IS the output, replayed
    // bit-for-bit by the oracle; ≤1024 rows from one map-side-combined
    // shuffle however large the corpus. (The estimate arithmetic is
    // unit-tested against exact distincts — HllSpec.)
    "q_text_hll" -> ((s, dir) => {
      import s.implicits._
      val toks = tbl(s, dir, "documents")
        .select(explode(graft.text.TextFunctions.tokens($"text")).as("term"))
      graft.ops.Hll.hllRegisters(toks, $"term", p = 10)
        .orderBy($"register")
    }),

    // Robust JSON ingest with quarantine routing: the event payloads
    // with a deterministic slice corrupted in-flight (truncation —
    // every 7th row), parsed under a target schema in ONE map-side
    // from_json projection. Good rows surface parsed, malformed rows
    // flag quarantined=true — no job failure, no silent drop.
    "q_ingest_quarantine" -> ((s, dir) => {
      import s.implicits._
      val ev = eventsTbl(s, dir).select($"event_id",
        when($"event_id" % 7 === 3,
            expr("substring(props, 1, length(props)-2)"))
          .otherwise($"props").as("payload"))
      graft.ops.Ingest.parseJsonTagged(ev, $"payload",
          new org.apache.spark.sql.types.StructType()
            .add("k", org.apache.spark.sql.types.IntegerType))
        .select($"event_id", $"k", $"quarantined")
        .orderBy($"event_id")
    }),

    // CSV twin of the quarantine ingest: positional lines with a
    // deterministic slice's INT field corrupted; type failure routes
    // the row, the independently-parsed second field survives.
    "q_ingest_csv" -> ((s, dir) => {
      import s.implicits._
      val lines = tbl(s, dir, "orders").select($"o_orderkey",
        when($"o_orderkey" % 11 === 5,
            concat(lit("xx,"), $"o_orderstatus"))
          .otherwise(concat($"o_orderkey".cast("string"), lit(","),
            $"o_orderstatus")).as("line"))
      graft.ops.Ingest.parseCsvTagged(lines, $"line",
          new org.apache.spark.sql.types.StructType()
            .add("k", org.apache.spark.sql.types.IntegerType)
            .add("status", org.apache.spark.sql.types.StringType))
        .select($"o_orderkey", $"k", $"status", $"quarantined")
        .orderBy($"o_orderkey")
    }),

    // Count-min sketch point-frequency probes: all document tokens fold
    // into a 4×512 cell grid (ONE map-side-combined shuffle of ≤2048
    // rows regardless of corpus size or token skew — the mergeable,
    // persistable frequency summary), then fixed query terms probe the
    // broadcast cells. est = min over rows, never under the true count.
    "q_text_cms" -> ((s, dir) => {
      import s.implicits._
      val toks = tbl(s, dir, "documents")
        .select(explode(graft.text.TextFunctions.tokens($"text")).as("term"))
      val cells = graft.ops.Cms.countMinCells(toks, $"term",
        depth = 4, width = 512)
      graft.ops.Cms.estimateCounts(cells,
          Seq("spark", "window", "data", "the", "graftabsent").toDF("term"),
          $"term", depth = 4, width = 512)
        .withColumnRenamed("item", "term")
        .orderBy($"term")
    }),

    // Heavy-hitter sweep through the same sketch: every distinct token
    // whose CMS estimate reaches the threshold — a guaranteed SUPERSET
    // of the true heavy vocabulary (est never underestimates), with
    // width bounding false positives.
    "q_text_cms_heavy" -> ((s, dir) => {
      import s.implicits._
      val toks = tbl(s, dir, "documents")
        .select(explode(graft.text.TextFunctions.tokens($"text")).as("term"))
      graft.ops.Cms.heavyHitters(toks, $"term", depth = 4, width = 512,
          minCount = 200L)
        .withColumnRenamed("item", "term")
        .orderBy($"term")
    }),

    // Hybrid lexical+vector retrieval: BM25 candidates for a two-term
    // query and cosine candidates for a probe vector (each top-20 via
    // distributed TakeOrdered), fused by reciprocal-rank fusion to the
    // final top-10. Ranks assign over the ROUNDED scores with id
    // tie-breaks and the fused order uses the ROUNDED rrf, so the
    // oracle replays ranking and fusion exactly.
    "q_hybrid_retrieve" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val q = emb.orderBy($"vec_id").limit(1).select($"embedding")
        .head.getSeq[Float](0).map(_.toDouble)
      graft.text.Hybrid.hybridRetrieve(
          tbl(s, dir, "documents"), $"doc_id", $"text",
          emb, $"vec_id", $"embedding",
          terms = Seq("spark", "window"), queryVec = q,
          nCandidates = 20, k = 10)
        .withColumnRenamed("id", "doc_id")
        .orderBy($"rrf".desc, $"doc_id")
    }),

    // Per-(doc, term) TF-IDF over a bounded corpus slice; tf/df are
    // integers, the score rounds at the cross-engine double noise floor.
    // Unigram LM quality scoring (the CCNet-style perplexity filter):
    // average negative log-likelihood per document under the corpus's
    // own unigram distribution. Per-term logprobs are quantized to
    // integer micro-nats BEFORE the per-doc sum, so the only cross-row
    // reduction is exact integer arithmetic on both engines.
    // Hash only integer-exact columns: nll_micro and avg_nll_micro are
    // pure integer arithmetic downstream of the micro-nat quantization
    // (the convenience double avg_nll is dropped — Spark and DuckDB
    // round(double, 4) can disagree on shortest-repr vs binary HALF_UP).
    "q_text_perplexity" -> ((s, dir) => {
      import s.implicits._
      graft.text.Tfidf.unigramNll(tbl(s, dir, "documents"), $"doc_id", $"text")
        .select($"doc_id", $"n_tokens", $"nll_micro", $"avg_nll_micro")
        .orderBy($"doc_id")
    }),

    // Percentile-band perplexity filter (CCNet keep-the-middle by RANK,
    // self-calibrating — no per-corpus threshold tuning): keep docs whose
    // exclusive-rank position over avg_nll_micro lies in [20%, 80%).
    // Ties share a position (membership is a function of the score
    // value), the band test is exact integer arithmetic, and the
    // cumulative window runs over DISTINCT quantized scores only.
    "q_text_band" -> ((s, dir) => {
      import s.implicits._
      val nll = graft.text.Tfidf.unigramNll(
          tbl(s, dir, "documents"), $"doc_id", $"text")
        .select($"doc_id", $"avg_nll_micro")
      graft.ops.Sampling.filterByScoreBand(nll, $"avg_nll_micro", 20, 80)
        .orderBy($"doc_id")
    }),

    // DSIR importance weights (Xie et al. 2023): every document scored by
    // ln p_target/p_raw under hashed unigram+bigram models (1024 buckets,
    // add-one smoothing), target = the English slice of the corpus. Each
    // bucket logprob quantizes to integer micro-nats before the integer
    // dot product, and the bucket hash is md5_number_lower % B — both
    // replayable bit-for-bit by the oracle.
    "q_text_dsir" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Dsir.importanceWeights(
          docs, docs.filter($"lang" === "en"), $"doc_id", $"text",
          buckets = 1024)
        .orderBy($"doc_id")
    }),

    // The DSIR selection step: top-100 most-target-like documents by
    // (logw_micro desc, doc_id) — deterministic membership the oracle
    // replays with a window rank.
    "q_text_dsir_select" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Dsir.selectByImportance(
          docs, docs.filter($"lang" === "en"), $"doc_id", $"text",
          k = 100, buckets = 1024)
        .orderBy($"doc_id")
    }),

    // Corpus-distance diagnostic: KL(target ‖ raw) over the smoothed
    // hashed-feature bucket models — one exact-integer numerator row
    // covering the full smoothed bucket space (observed union + the
    // closed-form never-seen term).
    "q_text_kl" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Dsir.klDivergence(
        docs, docs.filter($"lang" === "en"), $"doc_id", $"text",
        buckets = 1024)
    }),

    // The paper's actual sampler: Gumbel-top-k importance RESAMPLING
    // (P ∝ w, without replacement) with deterministic salted-md5 Gumbel
    // noise quantized to micro-units — membership replays on any engine.
    "q_text_dsir_resample" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Dsir.resampleByImportance(
          docs, docs.filter($"lang" === "en"), $"doc_id", $"text",
          k = 100, salt = "dsir1", buckets = 1024)
        .orderBy($"doc_id")
    }),

    // Trained quality classifier (the WebText/GPT-3-style LR filter):
    // 3 full-batch GD steps of logistic regression over hashed
    // unigram+bigram buckets, positives = the English slice, then every
    // document scored by its integer margin. Weights live in integer
    // micro-units, residuals quantize before the gradient sums, updates
    // divide by truncation (Java / = DuckDB //) — the oracle replays all
    // 3 unrolled iterations.
    "q_text_quality_lr" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val model = graft.text.LogReg.fit(
        docs.filter($"lang" === "en"),
        // NULL-safe complement: the oracle labels every non-'en' doc
        // (NULL lang included) as the negative class
        docs.filter(not($"lang" <=> "en")),
        $"doc_id", $"text", buckets = 1024, iters = 3, etaMilli = 500)
      graft.text.LogReg.score(docs, $"doc_id", $"text", model)
        .orderBy($"doc_id")
    }),

    // Bigram conditional LM (contextual perplexity filter): avg
    // -ln P(w2|w1) per doc under the corpus's own bigram distribution,
    // integer micro-nats before the per-doc sum — same portability
    // discipline as q_text_perplexity, one model row per corpus bigram.
    "q_text_bigramlm" -> ((s, dir) => {
      import s.implicits._
      graft.text.Tfidf.bigramNll(tbl(s, dir, "documents"), $"doc_id", $"text")
        .orderBy($"doc_id")
    }),

    "q_text_tfidf" -> ((s, dir) => {
      import s.implicits._
      graft.text.Tfidf.tfidf(
          tbl(s, dir, "documents").filter($"doc_id" < 50), $"doc_id", $"text")
        .orderBy($"doc_id", $"term")
    }),

    // Deterministic stratified sampling: exactly 10 docs per source,
    // ranked by salted md5 of the id — reproducible on any engine, so
    // the oracle checks the SAMPLE MEMBERSHIP value-for-value.
    "q_sample_stratified" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sampling.stratifiedSample(
          tbl(s, dir, "documents"), $"source", $"doc_id", n = 10, salt = "s1")
        .select($"doc_id", $"lang", $"source", $"n_chars")
        .orderBy($"doc_id")
    }),

    // Deterministic hash-fraction sampling (map-side, no shuffle):
    // keep iff md5-prefix < fraction of the 32-bit space.
    "q_sample_hash" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sampling.hashSample(
          tbl(s, dir, "documents"), $"doc_id", fraction = 0.25, salt = "s2")
        .select($"doc_id", $"source")
        .orderBy($"doc_id")
    }),

    // Domain-mixing sampling: per-language keep fractions compiled into
    // one map-side CASE filter (en half, zh quarter, rest 10%).
    "q_sample_weighted" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sampling.weightedHashSample(
          tbl(s, dir, "documents"), $"doc_id", $"lang",
          fractions = Map("en" -> 0.5, "zh" -> 0.25),
          defaultFraction = 0.1, salt = "s3")
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    }),

    // Corpus mixing to target composition: 50/25/25 over three sources at
    // a 150-row budget forces src0 through 3 replication epochs and the
    // others through fractional downsampling — the oracle re-derives
    // counts, targets, epochs, and thresholds from scratch in SQL.
    "q_sample_mix" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sampling.mixCorpus(
          tbl(s, dir, "documents"), $"doc_id", $"source",
          weights = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25),
          totalRows = 150L, allowUpsample = true, salt = "mix")
        .select($"doc_id", $"source", $"epoch")
        .orderBy($"doc_id", $"epoch")
    }),

    // Temperature mixing at tau = 2: per-language weights derived as
    // sqrt(n_i), flattening the en-dominant skew. Every plan quantity is
    // exact integer arithmetic (milli-sqrt, 128-bit products), so the
    // oracle replays membership bit-for-bit in HUGEINT.
    "q_sample_temperature" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Sampling.mixCorpusTemperature(
          tbl(s, dir, "documents"), $"doc_id", $"lang",
          sources = Seq("de", "en", "es", "fr", "zh"), salt = "s5")
        .select($"doc_id", $"lang", $"epoch")
        .orderBy($"doc_id")
    }),

    // Sequence packing: per-source prefix-sum token batching at a 2000-
    // token budget — the pack assignment is a pure window computation the
    // oracle replays exactly.
    // Keyed-table MERGE with partition-level rewrite: base = docs with
    // doc_id % 7 != 3 (score = n_chars), updates = docs with doc_id % 5
    // == 0 at score × 10 — replacements AND inserts in one delta; only
    // the buckets holding updated keys are read or rewritten (the
    // incremental-update story for a 100 TB mutable corpus table). The
    // table is rebuilt fresh each invocation so reruns stay
    // deterministic; the oracle replays the merge as updates ∪
    // (base ∖ updated-keys).
    "q_upsert_keyed" -> ((s, dir) => {
      import s.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/upsert_keyed"
      val docs = tbl(s, dir, "documents")
      graft.ops.Upsert.writeKeyedTable(
        docs.filter($"doc_id" % 7 =!= 3)
          .select($"doc_id", $"source", $"n_chars".as("score")),
        key = "doc_id", dir = td, numBuckets = 16, mode = "overwrite")
      graft.ops.Upsert.upsertByKey(s, td,
        docs.filter($"doc_id" % 5 === 0)
          .select($"doc_id", $"source", ($"n_chars" * 10).as("score")),
        key = "doc_id", numBuckets = 16)
      graft.ops.Upsert.readKeyedTable(s, td).orderBy($"doc_id")
    }),

    // The SQL MERGE surface: the same keyed merge spelled as
    // `MERGE INTO PARQUET '<path>' USING (<query>) ON KEY doc_id` —
    // parsed by GraftSqlParser (dispatch via spark.sql is pinned in
    // SqlDdlSpec; this session has no parser extension, so the parsed
    // command plan executes directly), bucket count derived from the
    // pinned _index_spec, stats row returned, oracle = the merge replay.
    "q_upsert_sql" -> ((s, dir) => {
      import s.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/upsert_sql"
      val docs = tbl(s, dir, "documents")
      graft.ops.Upsert.writeKeyedTable(
        docs.filter($"doc_id" % 7 =!= 3)
          .select($"doc_id", $"source", $"n_chars".as("score")),
        key = "doc_id", dir = td, numBuckets = 16, mode = "overwrite")
      docs.createOrReplaceTempView("graft_merge_docs")
      val mergeSql =
        s"""MERGE INTO PARQUET '$td' USING (
           |  SELECT doc_id, source, n_chars * 10 AS score
           |  FROM graft_merge_docs WHERE doc_id % 5 = 0
           |) ON KEY doc_id""".stripMargin
      val plan = graft.index.GraftSqlParser.parseGraftPlan(mergeSql).getOrElse(
        throw new IllegalStateException(s"graft MERGE failed to parse: $mergeSql"))
      org.apache.spark.sql.graft.SparkInternals.runPlan(s, plan).collect()
      graft.ops.Upsert.readKeyedTable(s, td).orderBy($"doc_id")
    }),

    // The MERGE ∘ INDEX composition, hook-driven: same merge as
    // q_upsert_keyed but the table carries an index and
    // refreshAfterMaintenance=true makes the upsert refresh it inside its
    // own table lock — the result is read back THROUGH the index (stale
    // listing would fail loudly on the rewritten buckets), and the oracle
    // is the plain merge replay, so freshness is value-gated.
    "q_upsert_indexed" -> ((s, dir) => {
      import s.implicits._
      import graft.index.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/upsert_indexed"
      val docs = tbl(s, dir, "documents")
      graft.ops.Upsert.writeKeyedTable(
        docs.filter($"doc_id" % 7 =!= 3)
          .select($"doc_id", $"source", $"n_chars".as("score")),
        key = "doc_id", dir = td, numBuckets = 16, mode = "overwrite")
      // same metastore the scratch tables use (standalone runs would
      // otherwise default to a stray ./index_metastore); stats-only index
      // (no sketch scan) — the gate proves freshness through the hook,
      // and min/max stats alone drive the listing
      s.conf.set(graft.index.IndexConf.MetastoreLocation,
        s"$scratchRoot/${new java.io.File(dir).getName}/metastore")
      s.index.create.mode("overwrite")
        .option(graft.index.IndexConf.FilterEnabled, "false")
        .indexBy("doc_id").parquet(td)
      val prev = s.conf.getOption(graft.index.IndexConf.RefreshAfterMaintenance)
      s.conf.set(graft.index.IndexConf.RefreshAfterMaintenance, "true")
      try {
        graft.ops.Upsert.upsertByKey(s, td,
          docs.filter($"doc_id" % 5 === 0)
            .select($"doc_id", $"source", ($"n_chars" * 10).as("score")),
          key = "doc_id", numBuckets = 16)
      } finally prev match {
        case Some(v) => s.conf.set(graft.index.IndexConf.RefreshAfterMaintenance, v)
        case None => s.conf.unset(graft.index.IndexConf.RefreshAfterMaintenance)
      }
      s.index.parquet(td).select($"doc_id", $"source", $"score")
        .orderBy($"doc_id")
    }),

    // Layout MIGRATION mid-lifecycle: build at 4 buckets, REBUCKET to
    // 16 (the paid-once full rewrite for a table that outgrew its pin —
    // the spec guard refuses every cheaper path), then a normal
    // delta-proportional merge under the NEW layout. Values must be
    // indistinguishable from never having migrated, so the oracle is
    // the plain upsert replay.
    "q_upsert_rebucket" -> ((s, dir) => {
      import s.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/upsert_rebucket"
      val docs = tbl(s, dir, "documents")
      graft.ops.Upsert.writeKeyedTable(
        docs.filter($"doc_id" % 7 =!= 3)
          .select($"doc_id", $"source", $"n_chars".as("score")),
        key = "doc_id", dir = td, numBuckets = 4, mode = "overwrite")
      graft.ops.Upsert.rebucketKeyedTable(s, td, key = "doc_id",
        oldBuckets = 4, newBuckets = 16)
      graft.ops.Upsert.upsertByKey(s, td,
        docs.filter($"doc_id" % 5 === 0)
          .select($"doc_id", $"source", ($"n_chars" * 10).as("score")),
        key = "doc_id", numBuckets = 16)
      graft.ops.Upsert.readKeyedTable(s, td).orderBy($"doc_id")
    }),

    // Keyed-table DELETE (the GDPR/takedown path): same delta-
    // proportional cost as the merge — only buckets holding requested
    // keys are read/rewritten, and a bucket emptied by the delete is
    // dropped explicitly (dynamic overwrite alone would leave its old
    // files). Requested keys absent from the table are a no-op.
    "q_delete_keyed" -> ((s, dir) => {
      import s.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/delete_keyed"
      val docs = tbl(s, dir, "documents")
      graft.ops.Upsert.writeKeyedTable(
        docs.select($"doc_id", $"source", $"n_chars"),
        key = "doc_id", dir = td, numBuckets = 16, mode = "overwrite")
      graft.ops.Upsert.deleteByKey(s, td,
        docs.filter($"doc_id" % 6 === 1).select($"doc_id")
          .union(docs.limit(3).select($"doc_id" + 1000000L)),
        key = "doc_id", numBuckets = 16)
      graft.ops.Upsert.readKeyedTable(s, td).orderBy($"doc_id")
    }),

    // SCD Type-2 history from the event change log: each user's
    // event_type state versioned with validity intervals. One key
    // shuffle folds the whole log (change collapse + interval close +
    // versions share a single Exchange/Sort); same-instant collisions
    // resolved by event_id (last wins). Intervals surface as epoch
    // micros — exact integers on both engines.
    "q_scd2" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Scd2.fromChangeLog(eventsTbl(s, dir), "user_id", "ts",
          Seq("event_type"), tieBreaks = Seq("event_id"))
        .select($"user_id", $"event_type",
          unix_micros($"valid_from").as("valid_from_us"),
          unix_micros($"valid_to").as("valid_to_us"),
          $"version".cast("long").as("version"), $"is_current")
        .orderBy($"user_id", $"version")
    }),

    // Interval-interval OVERLAP join (session-concurrency primitive):
    // per-user daily activity spans, pairs of users concurrently active
    // on the same day. Both sides explode to hour buckets and meet in
    // an equi-join on (day, bucket) — no cross join; the first-shared-
    // bucket gate emits each pair exactly once with no dedup pass.
    "q_interval_join" -> ((s, dir) => {
      import s.implicits._
      val spans = eventsTbl(s, dir)
        .filter($"user_id" < 12)
        .groupBy($"user_id", to_date($"ts").as("day"))
        .agg(unix_micros(min($"ts")).as("lo"), unix_micros(max($"ts")).as("hi"))
      val lft = spans.select($"user_id".as("user_a"), $"day".as("day_a"),
        $"lo".as("lo_a"), $"hi".as("hi_a"))
      val rgt = spans.select($"user_id".as("user_b"), $"day".as("day_b"),
        $"lo".as("lo_b"), $"hi".as("hi_b"))
      graft.ops.Temporal.intervalOverlapJoin(
          lft, "lo_a", "hi_a", rgt, "lo_b", "hi_b",
          bucketWidth = 3600L * 1000000L, keys = Some(("day_a", "day_b")))
        .filter($"user_a" < $"user_b")
        .select(date_format($"day_a", "yyyy-MM-dd").as("day"),
          $"user_a", $"user_b",
          (least($"hi_a", $"hi_b") - greatest($"lo_a", $"lo_b")).as("overlap_us"))
        .orderBy($"day", $"user_a", $"user_b")
    }),

    // Point-in-time SNAPSHOT: the whole dimension "as of" one instant
    // (training-set reproduction) — the interval filter over the fold.
    "q_scd2_asof" -> ((s, dir) => {
      import s.implicits._
      val hist = graft.ops.Scd2.fromChangeLog(eventsTbl(s, dir), "user_id",
        "ts", Seq("event_type"), tieBreaks = Seq("event_id"))
      graft.ops.Scd2.asOf(hist, lit("2024-01-15 00:00:00").cast("timestamp"))
        .select($"user_id", $"event_type",
          unix_micros($"valid_from").as("valid_from_us"))
        .orderBy($"user_id")
    }),

    // Point-in-time SCD-2 lookup — the classic consumer: every event
    // enriched with its user's STATE VERSION valid at that event's
    // instant (as-of join on valid_from: one key shuffle, no join
    // node). The oracle replays the history fold plus a per-event
    // latest-version-at-or-before pick.
    "q_scd2_lookup" -> ((s, dir) => {
      import s.implicits._
      val ev = eventsTbl(s, dir)
      val hist = graft.ops.Scd2.fromChangeLog(ev, "user_id", "ts",
        Seq("event_type"), tieBreaks = Seq("event_id"))
      graft.ops.Scd2.lookupAsOf(
          ev.select($"event_id", $"user_id", $"ts"), "user_id", "ts",
          hist, "user_id", Seq("event_type"))
        .select($"event_id", $"user_id", $"state_event_type")
        .orderBy($"event_id")
    }),

    // Incremental SCD-2: the same history built by three TIME-RANGED
    // keyed MERGE batches into a bucket-partitioned table (per-batch
    // cost ∝ touched buckets — the CDC-to-history path at 100 TB). For
    // in-order batches, batch-by-batch merging is definitionally
    // equivalent to the one-shot fold (see mergeChanges's late-data
    // contract), so the oracle replays the FULL log — a value-level
    // check that the incremental path converges to the batch answer.
    "q_scd2_merge" -> ((s, dir) => {
      import s.implicits._
      val td = s"$scratchRoot/${new java.io.File(dir).getName}/scd2_merge"
      val ev = eventsTbl(s, dir)
      graft.ops.Scd2.writeHistory(spark = s,
        changes = ev.filter($"ts" < "2024-01-11"),
        key = "user_id", ts = "ts", attrs = Seq("event_type"), dir = td,
        numBuckets = 16, tieBreaks = Seq("event_id"), mode = "overwrite")
      graft.ops.Scd2.mergeChanges(s, td,
        ev.filter($"ts" >= "2024-01-11" && $"ts" < "2024-01-21"),
        key = "user_id", ts = "ts", attrs = Seq("event_type"),
        numBuckets = 16, tieBreaks = Seq("event_id"))
      graft.ops.Scd2.mergeChanges(s, td,
        ev.filter($"ts" >= "2024-01-21"),
        key = "user_id", ts = "ts", attrs = Seq("event_type"),
        numBuckets = 16, tieBreaks = Seq("event_id"))
      graft.ops.Scd2.readHistory(s, td)
        .select($"user_id", $"event_type",
          unix_micros($"valid_from").as("valid_from_us"),
          unix_micros($"valid_to").as("valid_to_us"),
          $"version".cast("long").as("version"), $"is_current")
        .orderBy($"user_id", $"version")
    }),

    // Round-6 fifth composed pipeline — entropy-banded packing: the new
    // token-entropy signal gates the corpus by RANK band (keep the
    // middle 10–90%: cut both word-salad and degenerate boilerplate
    // tails, no absolute threshold to tune), survivors pack into
    // 1500-token training shards per source. Every stage integer-exact;
    // the oracle replays entropy, band membership, and the cumulative
    // pack arithmetic.
    "q_pipeline_curate7" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val ent = graft.text.Tfidf.tokenEntropy(docs, $"doc_id", $"text")
      val banded = graft.ops.Sampling.filterByScoreBand(
          ent, $"entropy_micro", 10, 90)
        .select($"doc_id", $"n_tokens")
      graft.ops.Packing.packByBudget(
          banded.join(docs.select($"doc_id", $"source"), Seq("doc_id"))
            .select($"doc_id", $"source", $"n_tokens"),
          shard = $"source", order = $"doc_id", tokens = $"n_tokens",
          budget = 1500L)
        .orderBy($"doc_id")
    }),

    // Round-6 sixth composed pipeline — per-source quality quota: the
    // trained LR margin (exact integer micro-units) ranks every doc and
    // the bounded-heap top-k keeps the 10 best PER SOURCE — the "best-k
    // per domain" selection a curated mixture wants, at aggregation
    // cost (no per-source sort at 100 TB). The oracle replays the
    // training chain and the quota as a window.
    "q_pipeline_curate8" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val model = graft.text.LogReg.fit(
        docs.filter($"lang" === "en"),
        docs.filter(not($"lang" <=> "en")),
        $"doc_id", $"text", buckets = 1024, iters = 3, etaMilli = 500)
      val scored = graft.text.LogReg.score(docs, $"doc_id", $"text", model)
        .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
      graft.ops.TopK.topKByGroup(
          scored, $"source", $"margin_micro", $"doc_id", k = 10)
        .toDF("source", "rank", "margin_micro", "doc_id")
        .orderBy($"source", $"rank")
    }),

    // Adjacent-chunk positive pairs (self-supervised contrastive
    // positives): consecutive 32-token windows of each doc paired
    // (anchor, positive) via one doc-key shuffle + bounded lead window.
    "q_text_pairs" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Contrastive.adjacentChunkPairs(
          tbl(s, dir, "documents"), $"doc_id", $"text")
        .orderBy($"doc_id", $"chunk_idx")
    }),

    // Deterministic negative sampling for contrastive training: k
    // non-positive corpus ids per query via salted-md5 hash probing —
    // k·oversample probe rows per query built MAP-SIDE (no
    // query×corpus blow-up), positives anti-joined out, rerun-stable
    // and engine-replayable.
    "q_sample_negatives" -> ((s, dir) => {
      import s.implicits._
      val pos = tbl(s, dir, "documents").filter($"doc_id" < 50)
        .select($"doc_id".as("q_id"), (($"doc_id" * 7 + 3) % 500).as("pos_id"))
      graft.ops.Contrastive.sampleNegatives(pos, $"q_id", $"pos_id",
          corpusSize = 500, k = 5)
        .orderBy($"q_id", $"rank")
    }),

    // Data-quality expectations (the between-stage assertion gate):
    // five named predicates over orders in ONE aggregation pass, each
    // reporting rows/violations/pass; null predicate results count as
    // violations (conservative).
    "q_quality_checks" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Expect.check(tbl(s, dir, "orders"), Seq(
          "price_positive" -> ($"o_totalprice" > 0),
          "status_known" -> $"o_orderstatus".isin("F", "O", "P"),
          "date_in_range" ->
            $"o_orderdate".between("1992-01-01", "1998-12-31"),
          "custkey_present" -> $"o_custkey".isNotNull,
          "priority_nonempty" -> (length($"o_orderpriority") > 0)))
        .orderBy($"check")
    }),

    // Per-group z-score outliers with ENGINE-EXACT arithmetic: the
    // cross-multiplied test (n·x−S)² > z²(n·Q−S²) in 38-digit decimals
    // — no float mean/variance, no sqrt, bit-reproducible outlier set.
    "q_agg_outliers" -> ((s, dir) => {
      import s.implicits._
      val ev = eventsTbl(s, dir).select($"event_id", $"event_type",
        floor($"value" * 100 + 0.5).cast("long").as("cents"))
      graft.ops.Anomaly.zScoreOutliers(ev, $"event_type", $"cents", z = 3)
        .orderBy($"event_id")
    }),

    // Per-group top-k at AGGREGATION cost (bounded-heap
    // TypedImperativeAggregate, map-side partials of <= k pairs per
    // group per partition) instead of the window shape's
    // shuffle-and-sort-every-row; the oracle IS the window shape, so the
    // two formulations are proved equivalent. (key desc, id asc) total
    // order makes the result input-order-independent.
    "q_agg_topk" -> ((s, dir) => {
      import s.implicits._
      graft.ops.TopK.topKByGroup(tbl(s, dir, "documents"),
          group = $"source", key = length($"text"), id = $"doc_id", k = 5)
        .toDF("source", "rank", "text_len", "doc_id")
        .orderBy($"source", $"rank")
    }),

    // JSONL shard export ROUND TRIP: write gzipped JSON-lines chunks of
    // 32 consecutive docs per source, read the tree back (JSON fields +
    // shard/chunk directory columns) — the oracle replays the chunk
    // prefix-sum arithmetic and the original values, so a row that
    // serialized wrong, landed in the wrong chunk, or failed to read
    // back breaks the hash.
    "q_export_jsonl" -> ((s, dir) => {
      import s.implicits._
      val td = scratchTableDir(dir, "export_jsonl")
      val docs = tbl(s, dir, "documents").select($"doc_id", $"source", $"text")
      graft.ops.Export.writeJsonlShards(
        docs, $"source", $"doc_id", td, docsPerShard = 32)
      graft.ops.Export.readJsonlShards(
          s, td, "doc_id BIGINT, source STRING, text STRING")
        .select($"doc_id", $"source", $"shard", $"chunk".cast("long").as("chunk"),
          $"text")
        .orderBy($"doc_id")
    }),

    "q_pack_budget" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Packing.packByBudget(
          tbl(s, dir, "documents")
            .select($"doc_id", $"source",
              size(graft.text.TextFunctions.tokens($"text")).cast("long").as("n_tokens")),
          shard = $"source", order = $"doc_id", tokens = $"n_tokens", budget = 2000L)
        .orderBy($"doc_id")
    }),

    // Pack MANIFESTS: one row per training pack (ordered member ids +
    // token counts + total) — the unit a trainer consumes. Zero-token
    // docs filtered upstream (they would share one prefix position and
    // grow a single pack row unboundedly).
    "q_pack_manifest" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Packing.packManifest(
          tbl(s, dir, "documents")
            .select($"doc_id", $"source",
              size(graft.text.TextFunctions.tokens($"text")).cast("long").as("n_tokens"))
            .filter($"n_tokens" >= 1),
          shard = $"source", order = $"doc_id", tokens = $"n_tokens",
          budget = 2000L)
        // comparator-safe: join member/count arrays to strings
        .select($"shard", $"pack_id",
          concat_ws(",", $"docs".cast("array<string>")).as("docs"),
          concat_ws(",", $"token_counts".cast("array<string>")).as("token_counts"),
          $"pack_tokens")
        .orderBy($"shard", $"pack_id")
    }),

    // Concat-and-chunk SEQUENCE packing: per source, documents
    // concatenate in doc_id order and cut into fixed 512-token training
    // windows, docs SPLITTING across window boundaries (the GPT-style
    // "make sequences" step packByBudget's whole-doc packs don't do).
    // One prefix-sum window + pure integer interval intersection; every
    // window except a source's last is exactly full. Oracle replays the
    // prefix sum and the slice arithmetic over generate_series.
    "q_pack_sequences" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Packing.packSequences(
          tbl(s, dir, "documents")
            .select($"doc_id", $"source",
              size(graft.text.TextFunctions.tokens($"text")).cast("long").as("n_tokens")),
          shard = $"source", order = $"doc_id", tokens = $"n_tokens",
          seqLen = 512L)
        .orderBy($"shard", $"seq_id", $"seq_off")
    }),

    // Deterministic training-order interleave: stride scheduling over
    // the packed sequences — sequence k of source s runs at virtual
    // time (k+1)/weight(s), globally ordered. Sources outside the
    // weight map are excluded; ties break by (shard, seq). The oracle
    // replays packing, the CASE weight lookup and the row_number.
    "q_pack_schedule" -> ((s, dir) => {
      import s.implicits._
      val seqs = graft.ops.Packing.packSequences(
        tbl(s, dir, "documents")
          .select($"doc_id", $"source",
            size(graft.text.TextFunctions.tokens($"text")).cast("long").as("n_tokens")),
        shard = $"source", order = $"doc_id", tokens = $"n_tokens",
        seqLen = 512L)
      graft.ops.Packing.strideSchedule(seqs, $"shard", $"seq_id",
          weights = Map("src0" -> 1.0, "src1" -> 3.0, "src2" -> 1.5,
            "src3" -> 0.5, "src4" -> 2.0, "src5" -> 1.0))
        .orderBy($"step")
    }),

    // MATERIALIZED training sequences: the concat-and-chunk plan
    // carrying the token arrays through — one row per 512-token
    // sequence with its actual content, slices cut map-side and
    // assembled per sequence. The oracle replays the window, the
    // 1-based list slicing and the ordered flatten.
    "q_pack_materialize" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Packing.materializeSequences(
          tbl(s, dir, "documents")
            .select($"doc_id", $"source",
              graft.text.TextFunctions.tokens($"text").as("toks")),
          shard = $"source", order = $"doc_id", tokensArr = $"toks",
          seqLen = 512L)
        // comparator-safe: tokens never contain spaces (whitespace split)
        .select($"shard", $"seq_id",
          concat_ws(" ", $"tokens").as("tokens"), $"n_tokens")
        .orderBy($"shard", $"seq_id")
    }),

    // Ordered funnel (view -> click -> purchase): per user the earliest
    // completion chain, each step's min-ts STRICTLY AFTER the previous
    // step's completion — k-1 ids-only equi-joins, never a window over
    // the raw stream. Timestamps surface as unix micros (the repo's
    // timestamp-output convention).
    "q_events_funnel" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Funnel.funnel(eventsTbl(s, dir),
          $"user_id", $"ts", $"event_type",
          Seq("view", "click", "purchase"))
        .select($"user".as("user_id"),
          unix_micros($"t_1").as("t1_us"),
          unix_micros($"t_2").as("t2_us"),
          unix_micros($"t_3").as("t3_us"),
          $"steps_completed")
        .orderBy($"user_id")
    }),

    // Funnel conversion table: users completing each step prefix.
    "q_events_funnel_counts" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Funnel.funnelCounts(eventsTbl(s, dir),
          $"user_id", $"ts", $"event_type",
          Seq("view", "click", "purchase"))
        .orderBy($"step")
    }),

    // Gap-filled hourly resample: every hour between each user's first
    // and last event carries its count + value sum, silent hours as
    // ZEROS — the dashboard/anomaly-input shape. Exact integer bucket
    // arithmetic; output is the series itself.
    "q_events_resample" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Funnel.gapFillCounts(eventsTbl(s, dir),
          $"user_id", $"ts", $"value", bucketSeconds = 3600L)
        .withColumnRenamed("key", "user_id")
        .orderBy($"user_id", $"bucket")
    }),

    // Capstone pipeline: quality gate -> concat-and-chunk packing ->
    // TEMPERATURE-DERIVED weights (w = sqrt of each source's gated
    // token mass, the tau=2 mix) -> stride-scheduled global training
    // order, first 100 steps. Weights come from the data via the
    // broadcast-join schedule variant; the oracle replays the entire
    // chain: per-doc 4dp quality, the gate, prefix sums, window split,
    // sqrt weights, vt order and the row_number cut.
    "q_pipeline_curate9" -> ((s, dir) => {
      import s.implicits._
      val t = graft.text.TextFunctions
      val gated = tbl(s, dir, "documents")
        .filter(t.qualityScore($"text") >= 0.5)
        .select($"doc_id", $"source",
          size(t.tokens($"text")).cast("long").as("n_tokens"))
      val seqs = graft.ops.Packing.packSequences(gated,
        shard = $"source", order = $"doc_id", tokens = $"n_tokens",
        seqLen = 256L)
      val w = gated.groupBy($"source".as("shard"))
        .agg(sqrt(sum($"n_tokens").cast("double")).as("weight"))
      graft.ops.Packing.strideScheduleBy(seqs, $"shard", $"seq_id", w)
        .filter($"step" <= 100)
        .orderBy($"step")
    }),

    // Cohort retention triangle: weekly cohorts by first event, count
    // of cohort users active k weeks later. Exact integer period
    // arithmetic (micros div week); two map-side-combined aggregates +
    // one user-key join.
    "q_events_retention" -> ((s, dir) => {
      import s.implicits._
      graft.ops.Funnel.retentionCohorts(eventsTbl(s, dir),
          $"user_id", $"ts", periodDays = 7)
        .orderBy($"cohort_period", $"period_offset")
    }),

    // Benchmark decontamination: corpus docs sharing >= 2 distinct
    // 3-shingles with a held-out benchmark slice (every 20th doc).
    // Benchmark shingles broadcast; the corpus side never shuffles until
    // the (doc,bench) overlap count. Oracle = exact shingle-set
    // intersection sizes in DuckDB.
    "q_decontaminate" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Decontaminate.contaminatedPairs(
          docs.filter($"doc_id" % 20 =!= 0), $"doc_id", $"text",
          docs.filter($"doc_id" % 20 === 0), $"doc_id", $"text",
          shingleK = 3, minOverlap = 2)
        .orderBy($"doc_id", $"bench_id")
    }),

    // CONTAINMENT decontamination: drop corpus docs containing >= 60% of
    // some benchmark doc's distinct shingles — the quoted-verbatim case
    // symmetric Jaccard misses. Benchmark side broadcasts; corpus never
    // shuffles. Oracle: exact per-pair containment over the same shingle
    // sets.
    "q_decontaminate_contain" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Decontaminate.decontaminateContainment(
          docs.filter($"doc_id" % 20 =!= 0), $"doc_id", $"text",
          docs.filter($"doc_id" % 20 === 0), $"doc_id", $"text",
          shingleK = 3, threshold = 0.6)
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    // FUZZY decontamination (near-match benchmark filter): drop corpus
    // docs that are MinHash near-duplicates (est Jaccard >= 0.5) of any
    // benchmark doc — catches paraphrased/truncated copies the exact
    // shingle overlap misses. Band-key blocking, never all-pairs. The
    // oracle replays with exact Jaccard (the est==exact equivalence all
    // minhash oracles rest on for this corpus).
    "q_decontaminate_fuzzy" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Decontaminate.decontaminateFuzzy(
          docs.filter($"doc_id" % 20 =!= 0), $"doc_id", $"text",
          docs.filter($"doc_id" % 20 === 0), $"doc_id", $"text")
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    // Per-document contamination fraction (the report pipelines gate on,
    // vs q_decontaminate's binary pair list): share of each corpus doc's
    // distinct 3-shingles present anywhere in the benchmark slice.
    // Pure map-side probe — benchmark shingles ride a codegen'd
    // count-in-set kernel, the corpus never shuffles and never joins.
    "q_text_contamination" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      graft.text.Decontaminate.contaminationScore(
          docs.filter($"doc_id" % 20 =!= 0), $"doc_id", $"text",
          docs.filter($"doc_id" % 20 === 0), $"text",
          shingleK = 3)
        .orderBy($"doc_id")
    }),

    // C4-style keep-first segment dedup: every repeated 2-token segment
    // keeps only its globally-first (doc_id, pos) occurrence; contrast
    // q_text_segdedup, which drops ALL occurrences of frequent segments.
    // One shuffle keyed on the segment; no windows over the segment
    // partition (hot segments stay skew-safe in the partial-agg min).
    "q_text_segdedup_first" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.dedupSegmentsKeepFirst(
          tbl(s, dir, "documents"), $"doc_id", $"text", k = 2)
        .orderBy($"doc_id")
    }),

    // Duplicated-substring coverage (hash-windowed ExactSubstr shape):
    // fraction of each doc's tokens covered by a 5-token window that
    // occurs verbatim 2+ times anywhere in the corpus.
    "q_text_dupspans" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.duplicateSpans(
          tbl(s, dir, "documents"), $"doc_id", $"text", windowL = 5)
        .orderBy($"doc_id")
    }),

    // The CUTTING step of ExactSubstr dedup: every duplicated 5-token
    // window keeps its globally-first occurrence; positions covered by a
    // non-first duplicated window are removed and documents reassemble.
    "q_text_dupspans_cut" -> ((s, dir) => {
      import s.implicits._
      graft.text.TextFunctions.removeDuplicateSpans(
          tbl(s, dir, "documents"), $"doc_id", $"text", windowL = 5)
        .orderBy($"doc_id")
    }),

    // Round-6 composed pipeline: verbatim-duplication gate (exact
    // integer inequality, 5·covered <= n ⟺ dup_fraction <= 0.2) →
    // contamination gate (<10 % of distinct shingles in the benchmark
    // slice; bench docs themselves drop out) → embedding outlier cut
    // (5 farthest per k-means cluster, doc_id = vec_id) → deterministic
    // 10-per-source cap via the portable salted-md5 rank.
    "q_pipeline_curate4" -> ((s, dir) => {
      import s.implicits._
      val t = graft.text.TextFunctions
      val docs = tbl(s, dir, "documents")
      val spans = t.duplicateSpans(docs, $"doc_id", $"text", windowL = 5)
        .filter($"covered_tokens" * 5 <= $"n_tokens")
        .select($"doc_id")
      val contam = graft.text.Decontaminate.contaminationScore(
          docs.filter($"doc_id" % 20 =!= 0), $"doc_id", $"text",
          docs.filter($"doc_id" % 20 === 0), $"text", shingleK = 3)
        .filter($"n_matched" * 10 < $"n_shingles")
        .select($"doc_id")
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 2)
      val outliers = graft.ann.Ann.clusterOutliers(
          emb, $"vec_id", $"embedding", cents, nPerCluster = 5)
        .select($"vec_id".as("doc_id"))
      val kept = docs.select($"doc_id", $"source")
        .join(spans, Seq("doc_id"))
        .join(contam, Seq("doc_id"))
        .join(outliers, Seq("doc_id"), "left_anti")
      graft.ops.Sampling.stratifiedSample(
          kept, $"source", $"doc_id", n = 10, salt = "cur4")
        .select($"doc_id", $"source")
        .orderBy($"doc_id")
    }),

    // Round-6 fourth composed pipeline — the crawl-hygiene front door
    // built from this block's new operators: (1) canonical-URL dedup
    // (pairs of docs carry two messy variants of one page URL — scheme
    // case, www, :443, tracking param, trailing slash — and collapse
    // after normalizeUrl, keeping the smallest doc_id), (2) containment
    // decontamination against the doc_id % 25 == 0 benchmark slice
    // (drop pages containing >= 60% of a benchmark doc's shingles),
    // (3) deterministic 20-per-source cap. The oracle replays the FULL
    // normalization regex chain, the per-pair containment, and the
    // salted-md5 rank.
    "q_pipeline_curate6" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val page = expr("doc_id div 2")
      val url = when($"doc_id" % 2 === 0,
          concat(lit("https://www.ex"), page % 7, lit(".com/p/"), page,
            lit("?utm_source=x")))
        .otherwise(concat(lit("HTTPS://ex"), page % 7, lit(".com:443/p/"),
          page, lit("/")))
      val urlDeduped = graft.dedup.Dedup.dedupExact(
        docs.withColumn("url", url),
        graft.text.Web.normalizeUrl($"url"), $"doc_id")
      val corpus = urlDeduped.filter($"doc_id" % 25 =!= 0)
      val bench = docs.filter($"doc_id" % 25 === 0)
      val cleaned = graft.text.Decontaminate.decontaminateContainment(
        corpus, $"doc_id", $"text", bench, $"doc_id", $"text",
        shingleK = 3, threshold = 0.6)
      graft.ops.Sampling.stratifiedSample(
          cleaned.select($"doc_id", $"source"),
          $"source", $"doc_id", n = 20, salt = "cur6")
        .orderBy($"doc_id")
    }),

    // Round-6 second composed pipeline — both TRAINED models in one
    // gate: every document's combined score = DSIR importance weight
    // (domain relevance vs the English target) + LR quality margin
    // (3-iteration classifier, same 1024 hashed buckets), top-100 by
    // (combined desc, doc_id), then a 5-per-source cap by the same
    // order. All exact integer arithmetic downstream of the micro-nat
    // quantizations; the oracle replays BOTH model chains off one shared
    // hashed-feature table. (At 100 TB the three featurization passes
    // here would share one persisted (doc, bucket) tf table — the oracle
    // already does.)
    "q_pipeline_curate5" -> ((s, dir) => {
      import s.implicits._
      val docs = tbl(s, dir, "documents")
      val en = docs.filter($"lang" === "en")
      val w = graft.text.Dsir.importanceWeights(
        docs, en, $"doc_id", $"text", buckets = 1024)
      val model = graft.text.LogReg.fit(
        en, docs.filter(not($"lang" <=> "en")), $"doc_id", $"text",
        buckets = 1024, iters = 3, etaMilli = 500)
      val m = graft.text.LogReg.score(docs, $"doc_id", $"text", model)
        .select($"doc_id", $"margin_micro")
      val top = w.join(m, Seq("doc_id"))
        .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
        .select($"doc_id", $"source",
          ($"logw_micro" + $"margin_micro").as("combined_micro"))
        .orderBy($"combined_micro".desc, $"doc_id")
        .limit(100)
      val capped = top.withColumn("__srk",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy($"source")
          .orderBy($"combined_micro".desc, $"doc_id")))
        .filter($"__srk" <= 5)
      capped.select($"doc_id", $"source", $"combined_micro")
        .orderBy($"doc_id")
    }),

    // SimHash Hamming-distance near-dup pairs. Token hash = md5-lower-64
    // so the DuckDB oracle reproduces the fingerprints bit-for-bit
    // (md5_number_lower) — a full value-level check of tokenize → bit
    // votes → chunk blocking → Hamming join.
    "q_dedup_simhash" -> ((s, dir) => {
      import s.implicits._
      graft.dedup.Dedup.simhashPairs(
          tbl(s, dir, "documents"), $"doc_id", $"text", maxDist = 3, algo = "md5")
        .orderBy($"id_a", $"id_b")
    }),

    // INCREMENTAL Hamming dedup against the materialized fingerprint
    // index (the SimHash twin of q_dedup_incremental): even-id docs are
    // fingerprint-indexed once; the odd-id batch computes only its own
    // fingerprints and joins the stored pigeonhole chunks. Oracle: a
    // batch doc survives iff no corpus-half partner at Hamming <= 3 over
    // the bit-exact md5 fingerprint replay.
    "q_dedup_simhash_incremental" -> ((s, dir) => {
      import s.implicits._
      val batch = tbl(s, dir, "documents").filter($"doc_id" % 2 === 1)
      graft.dedup.Dedup.dedupAgainstFingerprintIndex(s, batch, $"doc_id",
          graft.dedup.Dedup.simhash64($"text", algo = "md5"),
          simhashIndexDir(s, dir), maxDist = 3)
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    // Brute-force cosine top-10 for the first embedding vector.
    "q_ann_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.bruteForceTopK(
        emb, $"vec_id", $"embedding", q, k = 10, excludeId = Some(qRow.getLong(0)))
    }),

    // Embedding cosine near-dup pairs, LSH-bucket-blocked (the scale
    // path: candidates meet via equi-join on the bucket, no cross join).
    // Oracle recomputes the seeded hyperplane buckets from literals.
    "q_ann_cosine_pairs" -> ((s, dir) => {
      import s.implicits._
      graft.ann.Ann.cosinePairs(
          tbl(s, dir, "embeddings"), $"vec_id", $"embedding",
          threshold = 0.4, dim = 64, bucketed = true, nBits = 8)
        .orderBy($"id_a", $"id_b")
    }),

    // Embedding dedup: keep one representative per transitive cosine
    // cluster (LSH-blocked pairs → connected components → keep min id).
    "q_ann_dedup" -> ((s, dir) => {
      import s.implicits._
      graft.ann.Ann.dedupEmbeddings(
          tbl(s, dir, "embeddings"), $"vec_id", $"embedding",
          threshold = 0.4, dim = 64, nBits = 8, tables = 4)
        .select($"vec_id")
        .orderBy($"vec_id")
    }),

    // LSH-bucketed ANN over the same query vector (recall<1 ⇒ rows-only).
    "q_ann_lsh" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.lshTopK(
        emb, $"vec_id", $"embedding", q, k = 10, nBits = 8,
        excludeId = Some(qRow.getLong(0)))
    }),

    // IVF-flat ANN: coarse cells from a deterministic codebook, query
    // probes the 4 nearest of 16 cells and exact-re-ranks inside — the
    // inverted-file scale path (cells become partition keys at ingest).
    // Oracle recomputes every cell assignment from centroid literals.
    "q_ann_ivf" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.ivfTopK(
        emb, $"vec_id", $"embedding", q, k = 10, cells = 16, nprobe = 4,
        excludeId = Some(qRow.getLong(0)))
    }),

    // Multi-probe LSH: single table, query bucket + all 1-bit-flip
    // buckets probed (recall via probes instead of table replication).
    "q_ann_multiprobe" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.lshTopKMultiProbe(
        emb, $"vec_id", $"embedding", q, k = 10, nBits = 8,
        excludeId = Some(qRow.getLong(0)))
    }),

    // Int8 scalar quantization (the 4× ANN memory cut): integer-exact
    // per-vector summary + the raw double scale, identical arithmetic on
    // both engines.
    // Product quantization: 64-dim float32 → 8 sub-codes (32× memory
    // cut), top-10 by asymmetric distance — the oracle re-derives every
    // code from the deterministic codebook literals and recomputes the
    // ADC from the query row's own embedding.
    "q_ann_pq" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.pqAdcTopK(emb, $"vec_id", $"embedding", q,
        graft.ann.Ann.pqCodebooks(m = 8, k = 16, subDim = 8),
        k = 10, excludeId = Some(qRow.getLong(0)))
    }),

    // IVF-ADC (FAISS IVFPQ): coarse cells cut the scan to 4/16 probe
    // lists, PQ codes + the ADC table score the survivors — the
    // billion-vector serving layout (cells = partition key, m bytes per
    // row, raw vectors never read).
    "q_ann_ivfpq" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.ivfPqTopK(emb, $"vec_id", $"embedding", q,
        k = 10, cells = 16, nprobe = 4, m = 8, codebookK = 16,
        excludeId = Some(qRow.getLong(0)))
    }),

    // Same IVFADC query served from the MATERIALIZED codes table
    // (partitioned by cell): probe-cell partition pruning + stored-code
    // ADC — identical results to q_ann_ivfpq at codes-table cost.
    "q_ann_ivfpq_indexed" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.queryIvfPqIndex(s, ivfPqCodesDir(s, dir), q,
        k = 10, cells = 16, nprobe = 4, m = 8, codebookK = 16,
        excludeId = Some(qRow.getLong(0)))
    }),

    // The serving index GROWN incrementally (build on the even-id half,
    // append the odd-id batch — appendToIvfPqIndex): deterministic
    // codebooks make batch-encoded codes identical to one-shot codes, so
    // the same query over the incrementally-built table must reproduce
    // q_ann_ivfpq_indexed exactly (one shared oracle).
    "q_ann_ivfpq_incremental" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.queryIvfPqIndex(s, ivfPqCodesIncrDir(s, dir), q,
        k = 10, cells = 16, nprobe = 4, m = 8, codebookK = 16,
        excludeId = Some(qRow.getLong(0)))
    }),

    "q_ann_quantize" -> ((s, dir) => {
      import s.implicits._
      graft.ann.Ann.quantizeInt8Summary(
          tbl(s, dir, "embeddings"), $"vec_id", $"embedding")
        .orderBy($"vec_id")
    }),

    // Johnson–Lindenstrauss random projection 64 → 16 dims: seeded ±1
    // Rademacher matrix (md5-parity signs) × milli-quantized vectors —
    // exact integer outputs the oracle regenerates from (seed, j, i)
    // alone. Map-side codegen'd kernel; nothing shuffles.
    "q_ann_rp" -> ((s, dir) => {
      import s.implicits._
      graft.ann.Ann.randomProjection(
          tbl(s, dir, "embeddings"), $"vec_id", $"embedding",
          outDim = 16, dim = 64, seed = 42L)
        // comparator-safe: exact-integer projection joins to one string
        .select($"vec_id",
          concat_ws(",", $"proj".cast("array<string>")).as("proj"))
        .orderBy($"vec_id")
    }),

    // Top-10 nearest neighbors in the PROJECTED space (squared L2 over
    // exact-integer 16-dim projections, ties by id) — the JL-compressed
    // search baseline. Oracle replays matrix, projections, query
    // projection and the ranking.
    "q_ann_rp_topk" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      graft.ann.Ann.rpTopK(emb, $"vec_id", $"embedding", q,
        k = 10, outDim = 16, seed = 42L, excludeId = Some(qRow.getLong(0)))
    }),

    // Lloyd's k-means over embeddings (k=8, 2 iterations): trained
    // centroids for IVF/diversity sampling. Milli-quantized inputs keep
    // every cross-row sum exact integer arithmetic, so the oracle
    // replays init, both centroid updates, and the final assignment
    // from scratch and matches bit-for-bit.
    "q_ann_kmeans" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 2)
      graft.ann.Ann.kmeansAssign(emb, $"vec_id", $"embedding", cents)
        .orderBy($"vec_id")
    }),

    // Mini-batch (incremental) k-means: 4 modulo-sliced batches fold into
    // the running per-cluster integer-sum state — the centroid-refresh
    // path for a live IVF index (batch-sized cost per update, no corpus
    // re-scan). The oracle replays the ENTIRE batch sequence: seed from
    // batch 0, assign each batch to the then-current sums/n centroids,
    // accumulate. Output = per-dimension live centroids + counts.
    "q_ann_kmeans_minibatch" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val nBatches = 4
      var st = graft.ann.Ann.kmeansStateInit(
        emb.filter($"vec_id" % nBatches === 0), $"vec_id", $"embedding", k = 8)
      (1 until nBatches).foreach { t =>
        st = graft.ann.Ann.kmeansStateUpdate(
          st, emb.filter($"vec_id" % nBatches === t), $"vec_id", $"embedding")
      }
      graft.ann.Ann.kmeansStateReport(st)
    }),

    // Approximate kNN JOIN: each vector's 3 highest-cosine neighbors via
    // k-means cell blocking (data side 1 cell, probe side 2 cells) + exact
    // re-rank — the all-rows graph the single-query topk can't build. The
    // oracle replays the k-means fit, both cell assignments, and the
    // rounded-cosine rank order from scratch.
    "q_ann_knn_join" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 2)
      graft.ann.Ann.knnJoin(emb, $"vec_id", $"embedding", cents,
          k = 3, nprobe = 2)
        .orderBy($"vec_id", $"nn_rank")
    }),

    // Two-table retrieval: the odd-id half as the query set, the even-id
    // half as the embedded corpus — each query's 3 nearest corpus
    // vectors through the same cell blocking as the self-join.
    "q_ann_knn_retrieve" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 2)
      graft.ann.Ann.knnJoinAgainst(
          emb.filter($"vec_id" % 2 === 1), $"vec_id", $"embedding",
          emb.filter($"vec_id" % 2 === 0), $"vec_id", $"embedding",
          cents, k = 3, nprobe = 2)
        .orderBy($"vec_id", $"nn_rank")
    }),

    // ANN HARD-NEGATIVE mining (contrastive training's quality lever):
    // each odd-id query's highest-cosine even-id corpus neighbors that
    // are NOT its positive — the same cell-blocked kNN machinery, a
    // positives anti-join, and a bounded per-query re-rank. k=4
    // candidates absorb the one possible positive hit, then top-3.
    "q_ann_hardneg" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 2)
      val pos = emb.filter($"vec_id" % 2 === 1)
        .select($"vec_id", (($"vec_id" + 1) % 500).as("neighbor_id"))
      graft.ann.Ann.knnJoinAgainst(
          emb.filter($"vec_id" % 2 === 1), $"vec_id", $"embedding",
          emb.filter($"vec_id" % 2 === 0), $"vec_id", $"embedding",
          cents, k = 4, nprobe = 2)
        .join(pos, Seq("vec_id", "neighbor_id"), "left_anti")
        .withColumn("hn_rank", row_number().over(
          Window.partitionBy($"vec_id")
            .orderBy($"cosine".desc, $"neighbor_id")).cast("long"))
        .filter($"hn_rank" <= 3)
        .select($"vec_id", $"neighbor_id", $"cosine", $"hn_rank")
        .orderBy($"vec_id", $"hn_rank")
    }),

    // SemDeDup-companion prototypicality pruning: the 5 farthest vectors
    // per k-means cluster (off-distribution candidates a curation pass
    // cuts). Assignment is the map-side codegen'd kernel; the only
    // shuffle is the k-partition cluster window.
    "q_ann_outliers" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 2)
      graft.ann.Ann.clusterOutliers(emb, $"vec_id", $"embedding", cents,
          nPerCluster = 5)
        .orderBy($"vec_id")
    }),

    // TRAINED-codebook PQ: per-subspace k-means sub-codebooks (pqFit)
    // replace the hash-derived ones — the production recall path. The
    // oracle re-derives all 8 sub-fits from scratch (first-k init, exact
    // integer-mean Lloyd updates, first-min ties) plus every code and
    // ADC entry.
    "q_ann_pq_trained" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      val books = graft.ann.Ann.pqFit(emb, $"vec_id", $"embedding",
        m = 8, subDim = 8, k = 16, iters = 1)
      graft.ann.Ann.pqAdcTopKTrained(emb, $"vec_id", $"embedding", q,
        books, k = 10, excludeId = Some(qRow.getLong(0)))
    }),

    // Nearest-class-centroid (Rocchio) classification: 90 seed vectors
    // labeled c0/c1/c2 by vec_id mod 3 fit one exact-integer-mean
    // centroid per class (the same portable sum/count arithmetic as a
    // Lloyd update); every vector then gets the map-side kernel
    // assignment. The oracle replays the class means and every
    // assignment from scratch.
    "q_ann_classify" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val seeds = emb.filter($"vec_id" < 90)
        .withColumn("label", concat(lit("c"), ($"vec_id" % 3).cast("string")))
      val cents = graft.ann.Ann.fitClassCentroids(seeds, $"embedding", $"label")
      graft.ann.Ann.classifyByCentroids(emb, $"vec_id", $"embedding", cents)
        .orderBy($"vec_id")
    }),

    // TRAINED coarse quantizer IVF: kmeansFit centroids as the coarse
    // cells (L2 assignment, first-min ties), query probes its 4 nearest
    // of 16 data-adapted cells, exact cosine re-rank inside. The oracle
    // replays the fit and every assignment from scratch.
    "q_ann_ivf_trained" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 16, iters = 1)
      graft.ann.Ann.ivfTopKTrained(emb, $"vec_id", $"embedding", q,
        cents, k = 10, nprobe = 4, excludeId = Some(qRow.getLong(0)))
    }),

    // Cluster-balanced diversity sampling: k-means clusters as strata,
    // 20 lowest salted-hash ids kept per cluster — the selection recipe
    // for diverse subsets. The oracle replays the fit, every assignment,
    // and the md5 rank from scratch.
    "q_ann_diversity" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 1)
      graft.ann.Ann.diversitySample(
          emb, $"vec_id", $"embedding", cents, nPerCluster = 20, salt = "d1")
        .orderBy($"vec_id")
    }),

    // SemDeDup-style semantic dedup: k-means clusters (1 Lloyd iteration,
    // the oracle replays fit + assignment + pairs + closure from scratch)
    // block the exact-cosine near-duplicate graph; one survivor per
    // component.
    "q_ann_semdedup" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val cents = graft.ann.Ann.kmeansFit(
        emb, $"vec_id", $"embedding", k = 8, iters = 1)
      graft.ann.Ann.semanticDedup(
          emb, $"vec_id", $"embedding", cents, threshold = 0.4)
        .select($"vec_id")
        .orderBy($"vec_id")
    }),

    // Multimodal decode plumbing (stubbed kernels, real Dataset pipeline).
    "q_multimodal_decode" -> ((s, dir) => {
      import s.implicits._
      graft.multimodal.Multimodal.decodeDocuments(s, tbl(s, dir, "documents"))
        .select($"id", $"modality", $"width", $"height", $"nFrames", $"byteLen")
        .orderBy($"id")
    }),

    // REAL image decode (JDK javax.imageio, zero external deps):
    // document-derived constant-gray PNGs whose dimensions and mean luma
    // have closed forms — the oracle states the closed forms, Spark must
    // recover them through an ACTUAL png-encode → imageio-decode round
    // trip running inside typed mapPartitions kernels.
    "q_multimodal_image" -> ((s, dir) => {
      import s.implicits._
      graft.multimodal.Multimodal
        .decodeDocumentImages(s, tbl(s, dir, "documents"))
        .select($"id".as("doc_id"), $"width", $"height",
          $"meanLuma".as("mean_luma"))
        .orderBy($"doc_id")
    }),

    // Perceptual-hash (aHash) image dedup over REAL PNG decode: the
    // two-band gradient fixture gives every doc's 64-bit hash a closed
    // form the oracle replays from doc_id arithmetic alone, while Spark
    // must recover it through an actual PNG encode -> imageio decode ->
    // integer threshold pipeline; `kept` marks the min-id representative
    // of each exact-hash duplicate group.
    "q_multimodal_imagehash" -> ((s, dir) => {
      import s.implicits._
      val hashed = graft.multimodal.Multimodal.perceptualHashes(
        graft.multimodal.Multimodal.gradientImagesFromDocuments(
          s, tbl(s, dir, "documents")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"phash")
      hashed.select($"id".as("doc_id"), $"phash",
          ($"id" === min($"id").over(w)).as("kept"))
        .orderBy($"doc_id")
    }),

    // Nearest-neighbor image RESIZE over the two-band fixture: 32x32 ->
    // 8x8 samples columns {0,4,..,28} (4 per band), so the re-decoded
    // mean luma of every thumbnail has the closed form
    // (v1 + v2 + 1) div 2 the oracle replays from doc_id arithmetic —
    // while Spark must run the real decode -> integer-floor sample ->
    // PNG re-encode -> re-decode chain to produce it.
    "q_multimodal_resize" -> ((s, dir) => {
      import s.implicits._
      graft.multimodal.Multimodal.resizeImages(
          graft.multimodal.Multimodal.gradientImagesFromDocuments(
            s, tbl(s, dir, "documents")), outW = 8, outH = 8)
        .select($"id".as("doc_id"), $"width", $"height", $"meanLuma".as("mean_luma"))
        .orderBy($"doc_id")
    }),

    // Audio envelope fingerprint dedup over REAL WAV decode — the audio
    // twin of q_multimodal_imagehash: the two-phase fixture gives every
    // doc's 64-bit fingerprint a closed form the oracle replays from
    // doc_id arithmetic, while Spark recovers it through an actual WAV
    // encode -> javax.sound decode -> threshold pipeline.
    "q_multimodal_audiohash" -> ((s, dir) => {
      import s.implicits._
      val hashed = graft.multimodal.Multimodal.audioFingerprints(
        graft.multimodal.Multimodal.twoPhaseAudiosFromDocuments(
          s, tbl(s, dir, "documents")))
      val w = org.apache.spark.sql.expressions.Window.partitionBy($"afp")
      hashed.select($"id".as("doc_id"), $"afp",
          ($"id" === min($"id").over(w)).as("kept"))
        .orderBy($"doc_id")
    }),

    // REAL audio decode (JDK javax.sound.sampled, zero external deps):
    // document-derived WAV square waves whose sample rate, channel count,
    // frame count, duration and RMS all have closed forms — the oracle
    // states the closed forms, Spark must recover them through an ACTUAL
    // wav-encode → javax.sound decode round trip inside typed
    // mapPartitions kernels.
    "q_multimodal_audio" -> ((s, dir) => {
      import s.implicits._
      graft.multimodal.Multimodal
        .decodeDocumentAudios(s, tbl(s, dir, "documents"))
        .select($"id".as("doc_id"), $"sampleRate".as("sample_rate"),
          $"channels", $"nSamples".as("n_samples"),
          $"durationMs".as("duration_ms"), $"rms")
        .orderBy($"doc_id")
    }),

    // REAL video CONTAINER metadata decode (no codec needed): document-
    // derived MP4 (even ids) / AVI (odd ids) payloads whose duration,
    // dimensions, track count and frame count all have closed forms —
    // the oracle states the closed forms, Spark must recover them through
    // an actual encode → MP4 box walk / AVI RIFF walk inside typed
    // mapPartitions kernels.
    "q_multimodal_video" -> ((s, dir) => {
      import s.implicits._
      graft.multimodal.Multimodal
        .decodeDocumentVideos(s, tbl(s, dir, "documents"))
        .select($"id".as("doc_id"), $"container", $"width", $"height",
          $"nTracks".as("n_tracks"), $"frameCount".as("frame_count"),
          $"durationMs".as("duration_ms"))
        .orderBy($"doc_id")
    }),

    // REAL video frame PIXEL decode + frame sampling: every 2nd frame of
    // document-derived MJPEG AVIs goes through an actual RIFF walk →
    // imageio JPEG decode; sampled indices and true codec dimensions
    // have closed-form oracles (pixel stats are lossy-codec territory —
    // unit-tested differentially, not oracle-gated).
    "q_multimodal_videoframes" -> ((s, dir) => {
      import s.implicits._
      graft.multimodal.Multimodal
        .decodeDocumentVideoFrames(s, tbl(s, dir, "documents"))
        .select($"id".as("doc_id"), $"frameIdx".cast("long").as("frame_idx"),
          $"width", $"height")
        .orderBy($"doc_id", $"frame_idx")
    }),

    // JSON extraction from the events props column.
    "q_scalar_json" -> ((s, dir) => {
      import s.implicits._
      eventsTbl(s, dir)
        .select($"event_id",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .groupBy($"k").agg(count(lit(1)).as("n"))
        .orderBy($"k")
    }),

    // CUBE grouping sets.
    "q_cube" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

    // ------------------------------------------------------------------
    // Streaming (graft.streaming): a real Structured Streaming query
    // (file source → watermark → windowed agg → memory sink) and
    // gap-based sessionization; both must reproduce the batch answer.
    // ------------------------------------------------------------------

    // statePartitions=2: state cardinality is windows × event types
    // (~200 keys), so 2 store partitions bound the per-microbatch
    // commit/IO overhead — the manual analogue of the shuffle coalescing
    // AQE would do but can't in stateful streaming. Raise with key
    // cardinality at scale.
    "q_stream_hourly" -> ((s, dir) =>
      graft.streaming.Streaming.hourlyEventCounts(s, dir, statePartitions = 2)),

    // Same aggregation through the at-scale sink: update output mode +
    // foreachBatch parquet upsert (no complete-mode driver materialization).
    // Fixed scratch location, wiped per run — repeated Verify/Bench calls
    // don't accumulate checkpoint/sink garbage.
    "q_stream_hourly_update" -> ((s, dir) => {
      import s.implicits._
      val sfName = new java.io.File(dir).getName
      val out = s"$scratchRoot/$sfName/stream_upsert"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      graft.streaming.Streaming.hourlyEventCountsUpsert(s, dir, out, statePartitions = 2)
        .orderBy($"win_start", $"event_type")
    }),

    // Streaming exact dedup: every distinct (user, event type) pair is
    // emitted exactly once (stateful dropDuplicates, append mode).
    "q_stream_dedup" -> ((s, dir) =>
      graft.streaming.Streaming.streamingDistinct(
        s, dir, Seq("user_id", "event_type"))),

    // Watermarked stream-stream inner join (click → purchase attribution
    // within 4 h, per user): state evicted by watermark + time bound,
    // append sink; static input drained ⇒ exact batch-join parity.
    "q_stream_join" -> ((s, dir) =>
      graft.streaming.Streaming.clickPurchaseJoin(s, dir, withinMinutes = 240)),

    // Stream-static broadcast enrichment (stateless streaming join).
    "q_stream_enrich" -> ((s, dir) =>
      graft.streaming.Streaming.enrichWithCustomers(s, dir)),

    // Query over a table built by streaming ingest with per-batch index
    // maintenance: indexed predicate answers through the incrementally
    // refreshed index (create on batch 0 + refresh × later batches).
    "q_stream_ingest" -> ((s, dir) => {
      import s.implicits._
      streamIngestedEvents(s, dir)
        .filter($"event_type" === "purchase")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("total_value"))
        .orderBy($"user_id")
    }),

    // Streaming near-dedup ingest: 4 ranged document slices arrive as
    // separate micro-batches (file source, one file per trigger, arrival
    // order pinned by mtime); each batch dedups against the materialized
    // MinHash index of everything kept so far, then within itself, and
    // the survivors grow the index for later batches. Oracle: unrolled
    // batch-by-batch replay on exact Jaccard — the same est==exact
    // pair-set equivalence q_dedup_minhash rests on.
    // Streaming winnow-gated ingest (nearDedupIngest's exact-substring
    // twin): per batch, dedup against the materialized winnow index of
    // everything kept so far, in-batch keep-smallest, kept fingerprints
    // land as committed segments. Oracle: sequential replay of the batch
    // fold over the bit-exact winnow pair set.
    "q_stream_winnow" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_winnow")
      graft.streaming.Streaming.winnowIngest(s, dir, work, nBatches = 4,
          k = 12, w = 8, minShared = 5L)
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    "q_stream_neardedup" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_neardedup")
      graft.streaming.Streaming.nearDedupIngest(s, dir, work, nBatches = 4,
          numHashes = 64, bands = 16, shingleK = 3, threshold = 0.5)
        .select($"doc_id")
        .orderBy($"doc_id")
    }),

    // Streaming CDC upsert ingest: keyed update micro-batches merge into
    // the bucket-partitioned keyed table (delta-proportional per-batch
    // IO; re-delivered batches converge). Final table = one-shot merge,
    // so the oracle replays updates ∪ (base ∖ updated-keys).
    "q_stream_upsert" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_upsert")
      graft.streaming.Streaming.upsertIngest(s, dir, work,
          nBatches = 4, numBuckets = 16)
        .orderBy($"doc_id")
    }),

    // Streaming vector-index ingest: 4 ranged micro-batches of
    // embeddings, each appending its IVFADC cells+codes batch-side; the
    // grown codes table then serves the standard top-10 probe —
    // identical to a one-shot build, so it shares q_ann_ivfpq's oracle.
    "q_stream_vectoringest" -> ((s, dir) => {
      import s.implicits._
      val emb = tbl(s, dir, "embeddings")
      val qRow = emb.orderBy($"vec_id").limit(1)
        .select($"vec_id", $"embedding").head
      val q = qRow.getSeq[Float](1).map(_.toDouble)
      val work = scratchTableDir(dir, "stream_vectoringest")
      graft.streaming.Streaming.vectorIngest(s, dir, work, q, k = 10,
        excludeId = Some(qRow.getLong(0)))
    }),

    // Streaming CDC → SCD-2 history: the event log arrives as 4 ranged
    // (= time-ordered) micro-batches, batch 0 bootstraps the bucketed
    // history table, later batches take the delta-proportional keyed
    // merge. In-order batches ≡ the one-shot fold, so the served
    // history shares the from-scratch SCD-2 oracle.
    // Streaming JSONL file front door: raw json-lines shards arrive as
    // files, each batch routes through the one-pass PERMISSIVE parse
    // into committed batch dirs (redelivery overwrites = exactly-once).
    // Lines are constructed verbatim in both engines; the oracle derives
    // routing and parsed fields in closed form from the construction.
    "q_stream_jsonl" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_jsonl")
      val lines = tbl(s, dir, "documents").select($"doc_id",
        when($"doc_id" % 11 === 5,
          concat(lit("{\"k\": "), $"doc_id", lit(", \"s\": ")))
          .otherwise(concat(lit("{\"k\": "), $"doc_id",
            lit(", \"s\": \""), $"source", lit("\"}"))).as("line"))
      graft.streaming.Streaming.jsonlFileIngest(
          s, lines, $"doc_id", $"line", work, "k BIGINT, s STRING",
          nBatches = 4)
        .select($"k", $"s", $"quarantined", $"raw")
        .orderBy($"quarantined", $"k", $"raw")
    }),

    // Streaming mini-batch k-means ingest: the modulo-sliced batches
    // arrive as files and fold into the per-batch-committed centroid
    // state — the SAME deterministic sequence the one-shot
    // q_ann_kmeans_minibatch runs, so the two share an oracle.
    "q_stream_kmeans" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_kmeans")
      graft.streaming.Streaming.kmeansIngest(s, dir, work,
        k = 8, nBatches = 4)
    }),

    "q_stream_scd2" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_scd2")
      graft.streaming.Streaming.scd2Ingest(s, dir, work,
          nBatches = 4, numBuckets = 16)
        .select($"user_id", $"event_type",
          unix_micros($"valid_from").as("valid_from_us"),
          unix_micros($"valid_to").as("valid_to_us"),
          $"version".cast("long").as("version"), $"is_current")
        .orderBy($"user_id", $"version")
    }),

    // Streaming trigram-index ingest: 4 ranged micro-batches, each
    // appending its posting-chunk segment; the grown index serves the
    // cross-word substring exactly like a one-shot build (contains
    // verify), so it shares q_text_trgm's brute-scan oracle.
    "q_stream_trgm" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_trgm")
      graft.streaming.Streaming.trigramIngest(s, dir, work,
          pattern = "spark wind", nBatches = 4)
        .orderBy($"doc_id")
    }),

    // Streaming sketch ingest: 4 ranged micro-batches, each appending
    // its count-min cell grid as a committed segment; mergeability makes
    // the read-time cell-wise sum identical to a one-shot build, so the
    // served point estimates share q_text_cms's oracle.
    "q_stream_cms" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_cms")
      graft.streaming.Streaming.cmsIngest(s, dir, work,
          queryTerms = Seq("spark", "window", "data", "the", "graftabsent"),
          nBatches = 4, depth = 4, width = 512)
        .orderBy($"term")
    }),

    // Streaming HLL ingest: 4 ranged micro-batches each append their
    // own register table as a committed segment; register-wise max over
    // segments (idempotent + associative) recovers EXACTLY the one-shot
    // sketch, so the served registers share q_text_hll's bit-level
    // oracle.
    "q_stream_hll" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_hll")
      graft.streaming.Streaming.hllIngest(s, dir, work,
          nBatches = 4, p = 10)
        .orderBy($"register")
    }),

    // Streaming DATA-CARD ingest: 4 ranged micro-batches each append
    // their per-source count partials + HLL registers as committed
    // segments; the merged read (sums + register max + estimator)
    // equals the one-shot card, so it shares a from-scratch oracle —
    // including the exact-integer distinct-docs estimate.
    "q_stream_datacard" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_datacard")
      graft.streaming.Streaming.dataCardIngest(s, dir, work,
          nBatches = 4, p = 10)
        .orderBy($"source")
    }),

    // Streaming search-index ingest: 4 ranged micro-batches, each
    // appending its posting chunks batch-side; the grown index then
    // serves the standard conjunctive query — identical to a one-shot
    // build, so it shares q_text_search's oracle.
    "q_stream_searchingest" -> ((s, dir) => {
      import s.implicits._
      val work = scratchTableDir(dir, "stream_searchingest")
      graft.streaming.Streaming.searchIngest(s, dir, work,
          terms = Seq("spark", "window"), nBatches = 4)
        .orderBy($"doc_id")
    }),

    // Rolling 1-hour per-user window via a RANGE frame on event time —
    // the numeric-range formulation both engines evaluate identically.
    "q_window_range" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600L * 1000000L, 0L)
      eventsTbl(s, dir)
        .select($"event_id", $"user_id",
          count(lit(1)).over(w).as("n_1h"),
          round(sum($"value").over(w), 4).as("sum_1h"))
        .orderBy($"event_id")
    }),

    // One-pass column profiling over orders (nulls / distincts / bounds).
    "q_profile" -> ((s, dir) =>
      graft.ops.Profile.profile(
          tbl(s, dir, "orders"),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
            "o_orderpriority"))
        .orderBy(col("column_name"))),

    // NOTE: the HLL wide-table profile (Profile.profileApprox) is no
    // longer a scoreboard row — q_profile_portable value-gates the same
    // plan shape with SQL-replayable arithmetic, so the opaque-sketch
    // variant would only add a permanent rows-only row. The API remains
    // (CurationSpec's "profileApprox" test covers it).

    "q_sessionize" -> ((s, dir) => {
      import s.implicits._
      graft.streaming.Streaming.sessionStats(eventsTbl(s, dir), gapMinutes = 30)
        .orderBy($"user_id")
    }),

    // Spark's NATIVE session_window (gap-merged event-time sessions as a
    // grouping expression — one shuffle on (user, session)); oracle
    // replays the gap semantics with lag + cumulative sum.
    "q_session_window" -> ((s, dir) => {
      import s.implicits._
      eventsTbl(s, dir)
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("session_value"))
        .select($"user_id",
          date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("session_start"),
          $"n_events", $"session_value")
        .orderBy($"user_id", $"session_start")
    }),

    // Fixed-bound histogram of order totals via width_bucket.
    "q_agg_histogram" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "orders")
        .groupBy(width_bucket($"o_totalprice", lit(0.0), lit(600000.0), lit(24))
          .as("bucket"))
        .agg(count(lit(1)).as("n"), round(min($"o_totalprice"), 2).as("lo"),
          round(max($"o_totalprice"), 2).as("hi"))
        .orderBy($"bucket")
    }),

    // Time-window aggregation over the events table (streaming-shaped
    // query run in batch; window start rendered as string for a
    // timestamp-precision-agnostic compare).
    "q_events_window" -> ((s, dir) => {
      import s.implicits._
      eventsTbl(s, dir)
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 4).as("total_value"))
        .select(
          date_format($"w.start", "yyyy-MM-dd HH:mm:ss").as("win_start"),
          $"event_type", $"n", $"total_value")
        .orderBy($"win_start", $"event_type")
    }),

    // ------------------------------------------------------------------
    // Temporal joins (graft.ops.Temporal): operators Spark lacks as
    // built-ins, planned as equi-shuffles (no nested-loop / cartesian).
    // Times are carried as epoch-micros longs end to end.
    // ------------------------------------------------------------------

    // As-of join, attribution shape: for each purchase, the most recent
    // click by the same user at or before the purchase (ties: largest
    // event_id). One shuffle on user_id, no join node.
    "q_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = eventsTbl(s, dir)
        .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("t_us"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"t_us")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"t_us")
      graft.ops.Temporal.asofJoin(
          purchases, "user_id", "t_us",
          clicks, "user_id", "t_us",
          payload = Seq("event_id", "t_us"), tieBreak = "event_id")
        .orderBy($"event_id")
    }),

    // As-of join with a 2-hour lookback tolerance (pandas merge_asof
    // shape): a most-recent click older than the bound is no match.
    "q_asof_tolerance" -> ((s, dir) => {
      import s.implicits._
      val ev = eventsTbl(s, dir)
        .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("t_us"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"t_us")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id", $"t_us")
      graft.ops.Temporal.asofJoin(
          purchases, "user_id", "t_us",
          clicks, "user_id", "t_us",
          payload = Seq("event_id", "t_us"), tieBreak = "event_id",
          tolerance = Some(2L * 3600L * 1000000L))
        .orderBy($"event_id")
    }),

    // Interval range join: per purchase, count + value of view/click
    // activity by the same user in the preceding hour. Intervals bucket
    // to ≤ 2 one-hour buckets → equi-join on (user, bucket), exact
    // bounds as a post-join filter; purchases with no activity kept via
    // a final left join.
    "q_range_join" -> ((s, dir) => {
      import s.implicits._
      val hourUs = 3600L * 1000000L
      val ev = eventsTbl(s, dir)
        .select($"event_id", $"user_id", $"event_type", $"value",
          unix_micros($"ts").as("t_us"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"t_us",
          ($"t_us" - hourUs).as("lo_us"), ($"t_us" - 1L).as("hi_us"))
      val activity = ev.filter($"event_type".isin("view", "click"))
        .select($"user_id".as("a_user"), $"t_us".as("a_t_us"), $"value".as("a_value"))
      val joined = graft.ops.Temporal.rangeJoin(
        purchases, "lo_us", "hi_us", activity, "a_t_us",
        bucketWidth = hourUs, keys = Some(("user_id", "a_user")))
      val agg = joined.groupBy($"event_id")
        .agg(count(lit(1)).as("n_prior"), round(sum($"a_value"), 4).as("v_prior"))
      purchases.select($"event_id", $"user_id", $"t_us")
        .join(agg, Seq("event_id"), "left")
        .select($"event_id", $"user_id", $"t_us",
          coalesce($"n_prior", lit(0L)).as("n_prior"),
          round(coalesce($"v_prior", lit(0.0)), 4).as("v_prior"))
        .orderBy($"event_id")
    }),

    // Exact percentiles (sort-based aggregate) per group.
    "q_agg_percentile" -> ((s, dir) => {
      import s.implicits._
      tbl(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
          count(lit(1)).as("n"))
        .orderBy($"l_returnflag")
    })
  )

  // ---------------------------------------------------------------------
  // Oracle-SQL generators for the LSH queries: the hyperplanes are a pure
  // function of (nBits, dim, seed), so the oracle embeds them as literals
  // and recomputes every bucket assignment independently in DuckDB.
  // ---------------------------------------------------------------------

  /** Round-trip double literal DuckDB parses as DOUBLE (not DECIMAL). */
  private def sqlDouble(d: Double): String = {
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "E0"
  }

  /** Sign-bit LSH bucket of `vecCol` over the given planes as a DuckDB
    * expression — mirrors [[graft.ann.Ann.lshBucket]]. */
  private def bucketSql(vecCol: String, dim: Int, planes: Seq[Seq[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = p.map(sqlDouble).mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(range(1,${dim + 1}), " +
        s"j -> CAST($vecCol[j] AS DOUBLE) * $plane[j])) > 0 " +
        s"THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** One bucket column per LSH table, derived from the SAME
    * [[graft.ann.Ann.hyperplaneTables]] the operators use. */
  private def bucketColsSql(vecCol: String, nBits: Int, dim: Int, tables: Int): String =
    graft.ann.Ann.hyperplaneTables(nBits, dim, tables).zipWithIndex.map { case (planes, t) =>
      s"  ${bucketSql(vecCol, dim, planes)} AS b$t"
    }.mkString(",\n")

  /** Cosine of two DuckDB float-list columns in double precision. */
  /** 16-element list of `vecCol`·centroid dots, from the SAME
    * [[graft.ann.Ann.ivfCodebook]] the operator uses. */
  /** Full from-scratch replay of [[graft.ann.Ann.pqEncode]] +
    * [[graft.ann.Ann.pqAdcTopK]]: per-subspace code assignment against
    * the deterministic codebook literals (first-min ties via
    * list_position), then the asymmetric distance recomputed from the
    * query row's own embedding — same dimension fold order and same
    * left-associated subspace sum as the operators. */
  /** Per-subspace (code expression over alias `e`, ADC term over aliases
    * `qe`/`codes`) pairs for the PQ oracles below. */
  private def pqExprs(m: Int, k: Int, subDim: Int): (Seq[String], Seq[String]) = {
    val books = graft.ann.Ann.pqCodebooks(m, k, subDim)
    def bookLit(j: Int): String =
      books(j).map(_.map(sqlDouble).mkString("[", ", ", "]"))
        .mkString("[", ",\n      ", "]")
    val codeExprs = (0 until m).map { j =>
      val dists = s"list_transform(${bookLit(j)}, c -> " +
        s"list_sum(list_transform(range(1, ${subDim + 1}), " +
        s"i -> (e[${j * subDim} + i] - c[i]) * (e[${j * subDim} + i] - c[i]))))"
      s"(list_position($dists, list_min($dists)) - 1)"
    }
    val adcTerms = (0 until m).map { j =>
      s"list_sum(list_transform(range(1, ${subDim + 1}), " +
        s"i -> (qe[${j * subDim} + i] - (${bookLit(j)})[codes[${j + 1}] + 1][i]) * " +
        s"(qe[${j * subDim} + i] - (${bookLit(j)})[codes[${j + 1}] + 1][i])))"
    }
    (codeExprs, adcTerms)
  }

  private def pqAdcSql(m: Int, k: Int, subDim: Int, topK: Int): String = {
    val (codeExprs, adcTerms) = pqExprs(m, k, subDim)
    s"""WITH v AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
       |q AS (SELECT e AS qe FROM v
       |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
       |c AS (SELECT vec_id, [
       |  ${codeExprs.mkString(",\n  ")}
       |  ] AS codes FROM v),
       |d AS (SELECT c.vec_id AS neighbor_id,
       |  round(${adcTerms.mkString("\n  + ")}, 6) AS adc_dist2
       |  FROM c, q)
       |SELECT neighbor_id, adc_dist2 FROM d
       |WHERE neighbor_id <> (SELECT min(vec_id) FROM embeddings)
       |ORDER BY adc_dist2, neighbor_id LIMIT $topK""".stripMargin
  }

  /** [[pqAdcSql]] with the IVF coarse filter in front — the IVFADC
    * replay: cell per vector from the centroid dots (first-max ties),
    * query probes the nprobe best cells, codes/ADC score only the
    * survivors. */
  /** Shared by q_text_search and q_text_search_indexed (index-served
    * search answers the same query, row-for-row). */
  /** Bit-level HLL register replay (p=10 over document tokens) — shared
    * by the one-shot sketch and its streamed-segment twin. */
  private val hllRegistersSql: String =
    """WITH t AS (SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
      |  FROM documents),
      |tt AS (SELECT doc_id,
      |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
      |tok AS (SELECT unnest(toks) AS term FROM tt),
      |hh AS (SELECT md5_number_lower('hll:' || term) AS h FROM tok),
      |b AS (SELECT CAST(h >> 54 AS INT) AS register,
      |  h & ((1::UBIGINT << 54) - 1) AS w FROM hh),
      |s1 AS (SELECT register, w, w | (w >> 1) AS s FROM b),
      |s2 AS (SELECT register, w, s | (s >> 2) AS s FROM s1),
      |s3 AS (SELECT register, w, s | (s >> 4) AS s FROM s2),
      |s4 AS (SELECT register, w, s | (s >> 8) AS s FROM s3),
      |s5 AS (SELECT register, w, s | (s >> 16) AS s FROM s4),
      |s6 AS (SELECT register, w, s | (s >> 32) AS s FROM s5),
      |r AS (SELECT register,
      |  CASE WHEN w = 0 THEN 55 ELSE 55 - CAST(bit_count(s) AS INT) END AS rnk
      |  FROM s6)
      |SELECT register, max(rnk) AS rank FROM r
      |GROUP BY register ORDER BY register""".stripMargin

  private val textSearchSql: String =
    """WITH t AS (SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
      |  FROM documents),
      |tt AS (SELECT doc_id,
      |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t)
      |SELECT doc_id FROM tt
      |WHERE list_contains(toks, 'spark') AND list_contains(toks, 'window')
      |ORDER BY doc_id""".stripMargin

  /** Shared by q_text_cms / q_text_cms_heavy: the tokenized stream and
    * the 4×512 count-min cell grid (salted md5 buckets, unsigned
    * remainder). */
  private val cmsCellsSql: String =
    """t AS (SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
      |  FROM documents),
      |tt AS (SELECT doc_id,
      |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
      |tok AS (SELECT unnest(toks) AS term FROM tt),
      |h AS (SELECT r.d,
      |    CAST(md5_number_lower('cms' || r.d || ':' || t.term) % 512 AS INT) AS bucket
      |  FROM tok t CROSS JOIN range(0, 4) r(d)),
      |cells AS (SELECT d, bucket, count(*) AS cnt FROM h GROUP BY d, bucket)""".stripMargin

  /** Fixed plan-literal BPE merge table for the value-gated encode query
    * (q_text_bpe_encode). Hierarchical — later ranks consume earlier
    * merge outputs, so the oracle's recursion runs multiple rounds — and
    * strictly `a != b` for every pair, so within one round occurrences
    * of the chosen pair can never overlap and "merge all occurrences
    * left-to-right" equals "merge every matching position", which IS
    * expressible as one list_transform in SQL. */
  private val bpeFixedMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("a", "t"), ("th", "at"), ("i", "n"),
    ("a", "n"), ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"),
    ("o", "r"), ("s", "t"), ("e", "n"), ("o", "u"), ("c", "h"),
    ("q", "u"), ("qu", "er"), ("i", "s"), ("a", "s"), ("l", "e"))

  /** DuckDB list-of-structs literal of [[bpeFixedMerges]], rank = list
    * position - 1 (kept sorted so `M[best + 1]` indexes the winning pair). */
  private val bpeMergesLit: String = bpeFixedMerges.zipWithIndex
    .map { case ((a, b), r) => s"{'r': $r, 'a': '$a', 'b': '$b'}" }
    .mkString("[", ", ", "]")

  /** The lowest applicable merge rank over adjacent symbol pairs —
    * NULL when no merge applies (the encoder's termination test). */
  private def bpeBestSql(syms: String): String =
    s"list_min(flatten(list_transform(range(1, len($syms)), i -> " +
      s"list_transform($bpeMergesLit, mm -> CASE WHEN mm.a = $syms[i] " +
      s"AND mm.b = $syms[i+1] THEN mm.r END))))"

  /** Shared trainer-replay CTE block (q_text_bpe_merges and
    * q_text_bpe_encode_trained): tokenization with per-doc positions,
    * the >= 2-count word table, the recursive per-round trainer state
    * `st`, and the learned merge list `ml` (structs ordered by rank).
    * The sweep's occurrence selection is PARITY-based — within a run of
    * consecutive occurrences (possible only when a == b) the 1st, 3rd,
    * ... merge and the rest skip, exactly the kernels' left-to-right
    * non-overlapping scan. */
  private val bpeTrainerCtes: String =
    """t AS (SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
      |  FROM documents),
      |d AS (SELECT doc_id,
      |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
      |tok AS (SELECT doc_id, unnest(range(1, len(toks)+1)) AS pos,
      |  unnest(toks) AS word FROM d),
      |wc AS (SELECT word, count(*)::BIGINT AS n FROM tok
      |  GROUP BY word HAVING count(*) >= 2),
      |st AS (
      |  SELECT 0 AS round, NULL::VARCHAR AS ma, NULL::VARCHAR AS mb,
      |         NULL::BIGINT AS mc, word, n,
      |         list_transform(range(1, length(word)+1),
      |           i -> substr(word, i::INT, 1)) AS syms
      |  FROM wc
      |  UNION ALL
      |  SELECT z.round + 1, z.a, z.b, z.c, z.word, z.n,
      |    list_filter(list_transform(range(1, len(z.syms)+1), i ->
      |      CASE WHEN z.sel[i] THEN z.a || z.b
      |           WHEN i > 1 AND z.sel[i-1] THEN NULL
      |           ELSE z.syms[i] END), x -> x IS NOT NULL) AS syms
      |  FROM (
      |    SELECT st.round, st.word, st.n, st.syms, b2.a, b2.b, b2.c,
      |      list_transform(range(1, len(st.syms)+1), i ->
      |        (i < len(st.syms) AND st.syms[i] = b2.a AND st.syms[i+1] = b2.b) AND
      |        (i - coalesce(list_max(list_transform(range(1, i+1), j ->
      |           CASE WHEN NOT (j < len(st.syms) AND st.syms[j] = b2.a
      |                AND st.syms[j+1] = b2.b) THEN j END)), 0)) % 2 = 1) AS sel
      |    FROM st CROSS JOIN (
      |      SELECT a, b, c FROM (
      |        SELECT x.syms[x.j] AS a, x.syms[x.j + 1] AS b, sum(x.n)::BIGINT AS c
      |        FROM (SELECT n, syms, unnest(range(1, len(syms)))::INT AS j FROM st) x
      |        GROUP BY 1, 2)
      |      ORDER BY c DESC, a, b LIMIT 1) b2(a, b, c)
      |    WHERE st.round < 24 AND b2.c >= 2) z
      |),
      |mg AS (SELECT DISTINCT (round - 1)::INT AS r, ma AS a, mb AS b
      |  FROM st WHERE round >= 1),
      |ml AS (SELECT coalesce(list(struct_pack(r := r, a := a, b := b)
      |  ORDER BY r), []) AS ms FROM mg)""".stripMargin

  /** Lowest-rank merge applicable to adjacent pairs of `syms`, over the
    * struct-list `ms` — NULL when no merge applies (encode termination). */
  private def bpeBestRankSql(syms: String, ms: String): String =
    s"list_min(flatten(list_transform(range(1, len($syms)), i -> " +
      s"list_transform($ms, mm -> CASE WHEN mm.a = $syms[i] " +
      s"AND mm.b = $syms[i+1] THEN mm.r END))))"

  /** Shared by q_scd2 (one-shot fold) and q_scd2_merge (batch-by-batch
    * keyed merges — definitionally equivalent, so one full-log replay
    * checks both): instant collapse by event_id-desc winner, null-safe
    * change detection, interval close + versions per user. */
  private val scd2Sql: String =
    """WITH vis AS (SELECT user_id, ts, event_type,
      |  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |  FROM events),
      |v AS (SELECT user_id, ts, event_type FROM vis WHERE rn = 1),
      |o AS (SELECT user_id, ts, event_type,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      |  FROM v),
      |op AS (SELECT user_id, ts, event_type FROM o
      |  WHERE pts IS NULL OR prev IS DISTINCT FROM event_type),
      |h AS (SELECT user_id, event_type, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts) AS version
      |  FROM op)
      |SELECT user_id, event_type,
      |  epoch_us(valid_from) AS valid_from_us,
      |  epoch_us(valid_to) AS valid_to_us,
      |  version, (valid_to IS NULL) AS is_current
      |FROM h ORDER BY user_id, version""".stripMargin

  /** Shared by q_text_bm25 and q_text_bm25_indexed (one scoring body —
    * Tfidf.bm25From — on the Spark side, one oracle here). */
  private val textBm25Sql: String =
    """WITH t AS (SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
      |  FROM documents),
      |tt AS (SELECT doc_id,
      |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
      |lens AS (SELECT doc_id, len(toks) AS len FROM tt),
      |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
      |tfall AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
      |dft AS (SELECT term, count(*) AS df FROM tfall
      |  WHERE term IN ('spark', 'window') GROUP BY term),
      |tfq AS (SELECT doc_id, term, count(*) AS tf FROM tok
      |  WHERE term IN ('spark', 'window') GROUP BY doc_id, term),
      |c AS (SELECT (SELECT count(*) FROM tt)::DOUBLE AS n,
      |  (SELECT sum(len) FROM lens)::DOUBLE / (SELECT count(*) FROM tt)::DOUBLE AS avgdl)
      |SELECT q.doc_id,
      |  round(sum(ln((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
      |    * q.tf / (q.tf + 1.2 * (0.25 + 0.75 * l.len / c.avgdl))), 4) AS bm25
      |FROM tfq q JOIN dft d ON q.term = d.term
      |  JOIN lens l ON q.doc_id = l.doc_id CROSS JOIN c
      |GROUP BY q.doc_id ORDER BY q.doc_id""".stripMargin

  /** Replay of [[graft.ann.Ann.knnJoinAgainst]] (and the self-join
    * specialization): shared k-means centroid chain, both cell
    * assignments (data rn=1, probe rn<=nprobe by (dist, cell)), the cell
    * equi-join and the rounded-cosine rank order. `probeWhere` /
    * `dataWhere` restrict the two sides (empty = self-join, which also
    * sets `excludeSame` — the operator's excludeSameId). */
  private def knnJoinSql(
      topK: Int, nprobe: Int, excludeSame: Boolean,
      probeWhere: String = "", dataWhere: String = ""): String =
    "WITH " + kmeansCentsSql(k = 8, dim = 64, iters = 2) +
      s"""dists AS (SELECT v.vec_id, c2.c,
        |  list_sum(list_transform(range(1, 65),
        |    i -> (v.q[i] - c2.cent[i]) * (v.q[i] - c2.cent[i]))) AS d
        |  FROM v, c2),
        |cellr AS (SELECT vec_id, c,
        |  row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM dists),
        |e AS (SELECT vec_id,
        |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ev FROM embeddings),
        |n AS (SELECT vec_id, ev,
        |  sqrt(list_sum(list_transform(ev, x -> x * x))) AS nm FROM e),
        |cand AS (SELECT p.vec_id AS vec_id, d.vec_id AS neighbor_id
        |  FROM (SELECT vec_id, c FROM cellr WHERE rn <= $nprobe $probeWhere) p
        |  JOIN (SELECT vec_id, c FROM cellr WHERE rn = 1 $dataWhere) d
        |  ON p.c = d.c${if (excludeSame) " AND p.vec_id <> d.vec_id" else ""}),
        |cos AS (SELECT cand.vec_id, cand.neighbor_id,
        |  round(list_sum(list_transform(range(1, 65), i -> a.ev[i] * b.ev[i])) /
        |    greatest(a.nm * b.nm, 1e-12), 6) AS cosine
        |  FROM cand JOIN n a ON cand.vec_id = a.vec_id
        |  JOIN n b ON cand.neighbor_id = b.vec_id)
        |SELECT vec_id, neighbor_id, cosine, nn_rank
        |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |    ORDER BY cosine DESC, neighbor_id) AS nn_rank FROM cos)
        |WHERE nn_rank <= $topK ORDER BY vec_id, nn_rank""".stripMargin

  /** Unrolled replay of [[graft.ops.Graph.pageRank]] over the
    * doc_id-arithmetic link fixture: every division is a floor over
    * non-negative integers (DuckDB `//` = Spark `DIV`), every sum an
    * integer sum, so all `iters` iterations replay bit-for-bit. */
  private def pageRankSql(iters: Int, dampPct: Int = 85): String = {
    val sb = new StringBuilder
    sb.append(
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |e AS (SELECT src, dst FROM (
        |    SELECT doc_id AS src, (doc_id * 7 + 1) % (SELECT n FROM nn) AS dst
        |    FROM documents
        |    UNION ALL
        |    SELECT doc_id, (doc_id * 13 + 5) % (SELECT n FROM nn) FROM documents)
        |  WHERE src <> dst),
        |nodes AS (SELECT DISTINCT node FROM
        |  (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        |nc AS (SELECT count(*) AS n FROM nodes),
        |od AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |r0 AS (SELECT node, 1000000000 // (SELECT n FROM nc) AS pr FROM nodes),
        |""".stripMargin)
    for (t <- 1 to iters) {
      val prev = s"r${t - 1}"
      sb.append(
        s"""r$t AS (SELECT nodes.node,
           |  (${100 - dampPct} * CAST(1000000000 AS BIGINT)) // (100 * (SELECT n FROM nc))
           |    + ($dampPct * coalesce(s.s, 0)) // 100 AS pr
           |  FROM nodes LEFT JOIN (
           |    SELECT e.dst, sum($prev.pr // od.deg) AS s
           |    FROM $prev JOIN od ON $prev.node = od.src
           |    JOIN e ON e.src = od.src
           |    GROUP BY e.dst) s ON nodes.node = s.dst),
           |""".stripMargin)
    }
    sb.append(
      s"""fin AS (SELECT node, pr FROM r$iters)
         |SELECT node, CAST(pr AS BIGINT) AS rank_nano FROM fin ORDER BY node""".stripMargin)
    sb.toString
  }

  private def ivfPqSql(
      cells: Int, nprobe: Int, dim: Int,
      m: Int, k: Int, subDim: Int, topK: Int): String = {
    val (codeExprs, adcTerms) = pqExprs(m, k, subDim)
    s"""WITH v AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e,
       |  ${ivfDotsSql("embedding", cells, dim)} AS dots
       |  FROM embeddings),
       |cl AS (SELECT vec_id, e,
       |    list_position(dots, list_max(dots)) - 1 AS cell FROM v),
       |q AS (SELECT vec_id AS qid, e AS qe, dots AS qdots FROM v
       |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
       |qd AS (SELECT unnest(range($cells)) AS cell, unnest(qdots) AS d FROM q),
       |probe AS (SELECT cell FROM qd ORDER BY d DESC, cell LIMIT $nprobe),
       |c AS (SELECT vec_id, [
       |  ${codeExprs.mkString(",\n  ")}
       |  ] AS codes FROM cl
       |  WHERE cell IN (SELECT cell FROM probe)),
       |d AS (SELECT c.vec_id AS neighbor_id,
       |  round(${adcTerms.mkString("\n  + ")}, 6) AS adc_dist2
       |  FROM c, q WHERE c.vec_id <> q.qid)
       |SELECT neighbor_id, adc_dist2 FROM d
       |ORDER BY adc_dist2, neighbor_id LIMIT $topK""".stripMargin
  }

  private def ivfDotsSql(vecCol: String, cells: Int, dim: Int): String = {
    val cents = graft.ann.Ann.ivfCodebook(cells, dim)
    cents.map { c =>
      val lit = c.map(sqlDouble).mkString("[", ", ", "]")
      s"list_sum(list_transform(range(1,${dim + 1}), " +
        s"i -> CAST($vecCol[i] AS DOUBLE) * $lit[i]))"
    }.mkString("[\n    ", ",\n    ", "]")
  }

  /** Full from-scratch replay of [[graft.ann.Ann.kmeansFit]] +
    * [[graft.ann.Ann.kmeansAssign]] in DuckDB: milli-quantize, init from
    * the k smallest ids, then per iteration one assignment (row_number
    * over (dist, cluster) = the operators' first-min tie rule) and one
    * exact integer-mean centroid update (empty clusters keep their
    * previous centroid), ending with the final assignment. */
  /** WITH-body prefix deriving the k-means centroid chain `v, c0 .. c{iters}`
    * from scratch (quantized vectors, first-k init, Lloyd updates) —
    * shared by the kmeans and semantic-dedup oracles. Ends with a comma. */
  private def kmeansCentsSql(k: Int, dim: Int, iters: Int): String = {
    val r = s"range(1, ${dim + 1})"
    val sb = new StringBuilder
    sb.append(
      s"""v AS (SELECT vec_id,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)) AS q
         |  FROM embeddings),
         |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, q AS cent
         |  FROM (SELECT vec_id, q FROM v ORDER BY vec_id LIMIT $k)),
         |""".stripMargin)
    for (t <- 1 to iters) {
      val prev = s"c${t - 1}"
      sb.append(
        s"""d$t AS (SELECT v.vec_id, v.q, $prev.c,
           |  list_sum(list_transform($r,
           |    i -> (v.q[i] - $prev.cent[i]) * (v.q[i] - $prev.cent[i]))) AS d
           |  FROM v, $prev),
           |a$t AS (SELECT vec_id, q, c FROM (SELECT *, row_number()
           |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM d$t) WHERE rn = 1),
           |m$t AS (SELECT a$t.c, t.i, sum(q[t.i]) / count(*) AS val
           |  FROM a$t, (SELECT unnest($r) AS i) t GROUP BY a$t.c, t.i),
           |c$t AS (SELECT $prev.c, coalesce(l.cent, $prev.cent) AS cent FROM $prev
           |  LEFT JOIN (SELECT c, list(val ORDER BY i) AS cent FROM m$t GROUP BY c) l
           |  ON $prev.c = l.c),
           |""".stripMargin)
    }
    sb.toString
  }

  /** Full from-scratch replay of [[graft.ann.Ann.pqFit]] +
    * [[graft.ann.Ann.pqAdcTopKTrained]]: per-subspace k-means over the
    * sliced milli-quantized sub-vectors (same first-k init / first-min
    * ties / exact integer-mean updates as [[kmeansCentsSql]], slicing
    * commutes with quantization), then code assignment against the
    * FITTED sub-centroids and the left-associated milli-unit ADC sum
    * reported in original units². */
  private def pqTrainedSql(
      m: Int, k: Int, subDim: Int, iters: Int, topK: Int): String = {
    val r = s"range(1, ${subDim + 1})"
    val sb = new StringBuilder
    sb.append(
      s"""WITH v AS (SELECT vec_id,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)) AS q
         |  FROM embeddings),
         |""".stripMargin)
    for (j <- 0 until m) {
      val p = s"s$j"
      sb.append(
        s"""${p}v AS (SELECT vec_id,
           |  list_transform($r, i -> q[${j * subDim} + i]) AS sq FROM v),
           |${p}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, sq AS cent
           |  FROM (SELECT vec_id, sq FROM ${p}v ORDER BY vec_id LIMIT $k)),
           |""".stripMargin)
      for (t <- 1 to iters) {
        val prev = s"${p}c${t - 1}"
        sb.append(
          s"""${p}d$t AS (SELECT w.vec_id, w.sq, $prev.c,
             |  list_sum(list_transform($r,
             |    i -> (w.sq[i] - $prev.cent[i]) * (w.sq[i] - $prev.cent[i]))) AS d
             |  FROM ${p}v w, $prev),
             |${p}a$t AS (SELECT vec_id, sq, c FROM (SELECT *, row_number()
             |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM ${p}d$t) WHERE rn = 1),
             |${p}m$t AS (SELECT a.c, t.i, sum(a.sq[t.i]) / count(*) AS val
             |  FROM ${p}a$t a, (SELECT unnest($r) AS i) t GROUP BY a.c, t.i),
             |${p}c$t AS (SELECT $prev.c, coalesce(l.cent, $prev.cent) AS cent FROM $prev
             |  LEFT JOIN (SELECT c, list(val ORDER BY i) AS cent FROM ${p}m$t GROUP BY c) l
             |  ON $prev.c = l.c),
             |""".stripMargin)
      }
      val fin = s"${p}c$iters"
      sb.append(
        s"""${p}cd AS (SELECT w.vec_id, f.c,
           |  list_sum(list_transform($r,
           |    i -> (w.sq[i] - f.cent[i]) * (w.sq[i] - f.cent[i]))) AS d
           |  FROM ${p}v w, $fin f),
           |${p}code AS (SELECT vec_id, c FROM (SELECT *, row_number()
           |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM ${p}cd) WHERE rn = 1),
           |${p}adc AS (SELECT co.vec_id,
           |  list_sum(list_transform($r,
           |    i -> (qs.sq[i] - f.cent[i]) * (qs.sq[i] - f.cent[i]))) AS term
           |  FROM ${p}code co JOIN $fin f ON f.c = co.c,
           |  (SELECT sq FROM ${p}v
           |   WHERE vec_id = (SELECT min(vec_id) FROM embeddings)) qs),
           |""".stripMargin)
    }
    val joins = (0 until m)
      .map(j => s"JOIN s${j}adc t$j ON t$j.vec_id = v.vec_id").mkString("\n  ")
    val sum = (0 until m).map(j => s"t$j.term").mkString(" + ")
    sb.append(
      s"""f AS (SELECT v.vec_id AS neighbor_id,
         |  round(($sum) / 1000000.0, 6) AS adc_dist2
         |  FROM v
         |  $joins
         |  WHERE v.vec_id <> (SELECT min(vec_id) FROM embeddings))
         |SELECT neighbor_id, adc_dist2 FROM f
         |ORDER BY adc_dist2, neighbor_id LIMIT $topK""".stripMargin)
    sb.toString
  }

  /** Shared hashed-feature prelude (unigram+bigram md5 buckets over
    * `documents`) for the DSIR / LR oracle replays: CTEs t, tt, feats,
    * fb, rtf — ends with a trailing comma. */
  private def hashedFeatsSql(buckets: Int): String =
    s"""t AS (SELECT doc_id,
       |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
       |  FROM documents),
       |tt AS (SELECT doc_id,
       |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
       |feats AS (SELECT doc_id, unnest(toks || CASE WHEN len(toks) >= 2
       |  THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
       |  ELSE [] END) AS f FROM tt),
       |fb AS (SELECT doc_id, CAST(md5_number_lower(f) % $buckets AS BIGINT) AS bucket FROM feats),
       |rtf AS (SELECT doc_id, bucket, count(*) AS tf FROM fb GROUP BY 1, 2),
       |""".stripMargin

  /** Smoothed bucket models over the prelude's rtf/fb — the ONE copy of
    * the raw/target logprob CTEs every DSIR-family oracle builds on:
    * rc/rt/lpr (raw side), ttf/tct/lpt (target side, lpt carries cnt) —
    * ends with a trailing comma. */
  private def bucketModelsSql(buckets: Int): String =
    s"""rc AS (SELECT bucket, sum(tf) AS cnt FROM rtf GROUP BY 1),
       |rt AS (SELECT sum(cnt) AS t FROM rc),
       |lpr AS (SELECT bucket, CAST(floor(ln((cnt + 1)::DOUBLE / (rt.t + $buckets)::DOUBLE)
       |  * 1000000 + 0.5) AS BIGINT) AS lp FROM rc, rt),
       |ttf AS (SELECT fb.bucket, count(*) AS cnt FROM fb
       |  JOIN documents d ON fb.doc_id = d.doc_id WHERE d.lang = 'en' GROUP BY 1),
       |tct AS (SELECT coalesce(sum(cnt), 0) AS t FROM ttf),
       |lpt AS (SELECT bucket, cnt, CAST(floor(ln((cnt + 1)::DOUBLE / (tct.t + $buckets)::DOUBLE)
       |  * 1000000 + 0.5) AS BIGINT) AS lp FROM ttf, tct),
       |""".stripMargin

  /** DSIR model chain: the shared bucket models, then per-bucket
    * log-ratio and the per-doc weight CTE `pd` (doc_id, nf, lw) — ends
    * with a trailing comma. */
  private def dsirChainSql(buckets: Int): String =
    bucketModelsSql(buckets) +
    s"""ratio AS (SELECT r.bucket, coalesce(l.lp,
       |    (SELECT CAST(floor(ln(1.0 / (tct.t + $buckets)::DOUBLE) * 1000000 + 0.5) AS BIGINT)
       |     FROM tct)) - r.lp AS lr
       |  FROM lpr r LEFT JOIN lpt l ON r.bucket = l.bucket),
       |pd AS (SELECT rtf.doc_id, sum(rtf.tf) AS nf, sum(rtf.tf * ratio.lr) AS lw
       |  FROM rtf JOIN ratio ON rtf.bucket = ratio.bucket GROUP BY 1),
       |""".stripMargin

  /** Replay of [[graft.text.Dsir.klDivergence]]: both smoothed bucket
    * models, the full-outer union of observed buckets, the exact integer
    * contribution sum, and the closed-form never-seen-bucket term. */
  private def klSql(buckets: Int): String =
    "WITH " + hashedFeatsSql(buckets) + bucketModelsSql(buckets) +
      s"""consts AS (SELECT
         |  CAST(floor(ln(1.0 / (tct.t + $buckets)::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS st,
         |  CAST(floor(ln(1.0 / (rt.t + $buckets)::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS sr
         |  FROM tct, rt),
         |u AS (SELECT t.cnt AS tcnt, t.lp AS lpt2, r.lp AS lpr2
         |  FROM lpt t FULL JOIN lpr r ON t.bucket = r.bucket),
         |obs AS (SELECT count(*) AS nb,
         |    sum((coalesce(u.tcnt, 0) + 1) * (coalesce(u.lpt2, consts.st)
         |      - coalesce(u.lpr2, consts.sr))) AS s2
         |  FROM u, consts)
         |SELECT obs.nb::BIGINT AS n_buckets_observed, tct.t::BIGINT AS target_total,
         |  rt.t::BIGINT AS raw_total,
         |  (coalesce(obs.s2, 0) + ($buckets - obs.nb) * (consts.st - consts.sr))::BIGINT
         |    AS kl_num_micro
         |FROM obs, consts, tct, rt""".stripMargin

  /** Replay of [[graft.text.Dsir]]: hashed unigram+bigram feature buckets
    * (md5_number_lower % 1024 — bit-identical to [[graft.functions.Md5Bucket]]),
    * add-one-smoothed target/raw bucket logprobs quantized to integer
    * micro-nats, exact integer per-doc dot product; target = lang 'en'.
    * With `selectK` set, the deterministic top-k selection by
    * (logw_micro desc, doc_id); with `resample` = (k, salt), the
    * Gumbel-top-k without-replacement sample (key = logw + salted-md5
    * Gumbel noise quantized to micro-units). */
  private def dsirSql(
      selectK: Option[Int],
      resample: Option[(Int, String)] = None): String = {
    val body = "WITH " + hashedFeatsSql(1024) + dsirChainSql(1024) +
      """w AS (SELECT d.doc_id, coalesce(pd.nf, 0)::BIGINT AS n_features,
        |    coalesce(pd.lw, 0)::BIGINT AS logw_micro
        |  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id)""".stripMargin
    (selectK, resample) match {
      case (None, None) => body + "\nSELECT * FROM w ORDER BY doc_id"
      case (Some(k), None) => body +
        s""",
           |sel AS (SELECT doc_id, n_features, logw_micro, row_number()
           |    OVER (ORDER BY logw_micro DESC, doc_id) AS rk FROM w)
           |SELECT doc_id, n_features, logw_micro FROM sel WHERE rk <= $k
           |ORDER BY doc_id""".stripMargin
      case (None, Some((k, salt))) => body +
        s""",
           |keys AS (SELECT doc_id, n_features, logw_micro, logw_micro +
           |    CAST(floor(-ln(-ln(((md5_number_lower('$salt' || '|' || doc_id::VARCHAR)
           |      >> 11)::DOUBLE + 0.5) / 9007199254740992.0)) * 1000000 + 0.5) AS BIGINT)
           |    AS key_micro FROM w),
           |sel AS (SELECT *, row_number() OVER (ORDER BY key_micro DESC, doc_id)
           |    AS rk FROM keys)
           |SELECT doc_id, n_features, logw_micro, key_micro FROM sel
           |WHERE rk <= $k ORDER BY doc_id""".stripMargin
      case _ => throw new IllegalArgumentException(
        "selectK and resample are mutually exclusive")
    }
  }

  /** Logistic-regression chain over the prelude's rtf: labels, iteration
    * CTEs w0..wN/b0..bN, and the per-doc score CTE `sc` (doc_id, nf,
    * dot) — ends with a trailing comma. Final margin = dot + bN. */
  private def logRegChainSql(iters: Int, etaMilli: Long): String = {
    val sb = new StringBuilder
    sb.append(
      s"""labels AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents),
         |nn AS (SELECT count(*) AS n FROM documents),
         |w0 AS (SELECT DISTINCT bucket, 0::BIGINT AS w FROM rtf),
         |b0 AS (SELECT 0::BIGINT AS b),
         |""".stripMargin)
    for (i <- 1 to iters) {
      val (pw, pb) = (s"w${i - 1}", s"b${i - 1}")
      sb.append(
        s"""dots$i AS (SELECT rtf.doc_id, sum(rtf.tf * $pw.w) AS dot
           |  FROM rtf JOIN $pw USING (bucket) GROUP BY 1),
           |resid$i AS (SELECT l.doc_id, CAST(floor((l.y::DOUBLE -
           |    1.0 / (1.0 + exp(-((coalesce(d.dot, 0) + $pb.b)::DOUBLE / 1000000))))
           |    * 1000000 + 0.5) AS BIGINT) AS r
           |  FROM labels l LEFT JOIN dots$i d USING (doc_id), $pb),
           |g$i AS (SELECT rtf.bucket, sum(rtf.tf * resid$i.r) AS g
           |  FROM rtf JOIN resid$i USING (doc_id) GROUP BY 1),
           |w$i AS (SELECT $pw.bucket,
           |    ($pw.w + ($etaMilli * coalesce(g$i.g, 0)) // (1000 * nn.n))::BIGINT AS w
           |  FROM $pw LEFT JOIN g$i USING (bucket), nn),
           |b$i AS (SELECT ($pb.b + ($etaMilli * (SELECT sum(r) FROM resid$i))
           |    // (1000 * nn.n))::BIGINT AS b FROM $pb, nn),
           |""".stripMargin)
    }
    sb.append(
      s"""sc AS (SELECT rtf.doc_id, sum(rtf.tf) AS nf,
         |    sum(rtf.tf * coalesce(w$iters.w, 0)) AS dot
         |  FROM rtf LEFT JOIN w$iters USING (bucket) GROUP BY 1),
         |""".stripMargin)
    sb.toString
  }

  /** Replay of [[graft.text.LogReg]]: the shared hashed-feature prelude,
    * then `iters` UNROLLED gradient-descent iterations (the kmeansCentsSql
    * recipe) — margins by integer dot product, residuals quantized to
    * micro-units right after the sigmoid, integer gradient sums, weight
    * updates by DuckDB `//` = Java's truncating `/` — and the final margin
    * scores. Positives = lang 'en'. */
  private def logRegSql(iters: Int, buckets: Int, etaMilli: Long): String =
    "WITH " + hashedFeatsSql(buckets) + logRegChainSql(iters, etaMilli).stripSuffix(",\n") +
      s"""
         |SELECT d.doc_id, coalesce(sc.nf, 0)::BIGINT AS n_features,
         |  (coalesce(sc.dot, 0) + (SELECT b FROM b$iters))::BIGINT AS margin_micro
         |FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
         |ORDER BY d.doc_id""".stripMargin

  /** Replay of [[q_pipeline_curate8]]: the LR training chain, then the
    * per-source quality quota as the window formulation of the heap
    * top-k (margin desc, doc_id asc). */
  private def curate8Sql(
      iters: Int, buckets: Int, etaMilli: Long, perSource: Int): String =
    "WITH " + hashedFeatsSql(buckets) + logRegChainSql(iters, etaMilli) +
      s"""sco AS (SELECT d.doc_id, d.source,
         |    (coalesce(sc.dot, 0) + (SELECT b FROM b$iters))::BIGINT AS margin_micro
         |  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY margin_micro DESC, doc_id) AS rank FROM sco)
         |SELECT source, rank, margin_micro, doc_id FROM rk
         |WHERE rank <= $perSource ORDER BY source, rank""".stripMargin

  /** Replay of [[q_pipeline_curate5]]: BOTH trained-model chains off one
    * shared hashed-feature table — per-doc combined score = DSIR weight +
    * LR margin, global top-`topK` by (combined desc, doc_id), then a
    * `perSource` cap in the same order. */
  private def curate5Sql(
      iters: Int, buckets: Int, etaMilli: Long, topK: Int,
      perSource: Int): String =
    "WITH " + hashedFeatsSql(buckets) + dsirChainSql(buckets) +
      logRegChainSql(iters, etaMilli) +
      s"""comb AS (SELECT d.doc_id, d.source,
         |    (coalesce(pd.lw, 0) + coalesce(sc.dot, 0) +
         |     (SELECT b FROM b$iters))::BIGINT AS combined_micro
         |  FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
         |    LEFT JOIN sc ON d.doc_id = sc.doc_id),
         |ranked AS (SELECT *, row_number() OVER (ORDER BY combined_micro DESC, doc_id)
         |    AS rk FROM comb),
         |topd AS (SELECT doc_id, source, combined_micro FROM ranked WHERE rk <= $topK),
         |capped AS (SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY combined_micro DESC, doc_id) AS srk FROM topd)
         |SELECT doc_id, source, combined_micro FROM capped WHERE srk <= $perSource
         |ORDER BY doc_id""".stripMargin

  /** Replay of [[graft.ann.Ann.kmeansFit]] + [[graft.ann.Ann.ivfTopKTrained]]:
    * the trained-centroid chain, every vector's L2 cell assignment
    * (first-min ties), the query's nprobe nearest cells (d asc, ties by
    * cell), exact cosine re-rank of the probed survivors. */
  private def ivfTrainedSql(
      k: Int, dim: Int, iters: Int, nprobe: Int, topK: Int): String = {
    val r = s"range(1, ${dim + 1})"
    "WITH " + kmeansCentsSql(k, dim, iters) +
      s"""df AS (SELECT v.vec_id, c$iters.c,
         |  list_sum(list_transform($r,
         |    i -> (v.q[i] - c$iters.cent[i]) * (v.q[i] - c$iters.cent[i]))) AS d
         |  FROM v, c$iters),
         |asg AS (SELECT vec_id, c FROM (SELECT *, row_number()
         |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df) WHERE rn = 1),
         |qv AS (SELECT vec_id AS qid, q AS qq FROM v
         |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
         |qd AS (SELECT c$iters.c,
         |  list_sum(list_transform($r,
         |    i -> (qv.qq[i] - c$iters.cent[i]) * (qv.qq[i] - c$iters.cent[i]))) AS d
         |  FROM c$iters, qv),
         |probe AS (SELECT c FROM qd ORDER BY d, c LIMIT $nprobe),
         |s AS (SELECT a.vec_id AS neighbor_id,
         |  ${cosineSql("ea.embedding", "eq.embedding", dim)} AS cs
         |  FROM asg a
         |  JOIN embeddings ea ON ea.vec_id = a.vec_id
         |  JOIN qv ON a.vec_id <> qv.qid
         |  JOIN embeddings eq ON eq.vec_id = qv.qid
         |  WHERE a.c IN (SELECT c FROM probe))
         |SELECT neighbor_id, round(cs, 6) AS cosine FROM s
         |ORDER BY cs DESC, neighbor_id LIMIT $topK""".stripMargin
  }

  /** Full replay of the [[graft.ann.Ann.kmeansStateInit]] →
    * [[graft.ann.Ann.kmeansStateUpdate]] mini-batch sequence: seed
    * centroids = first k vectors of batch 0, then each modulo-sliced
    * batch assigns against the then-current `sums/n` centroids
    * (first-min ties) and folds per-dimension exact integer sums +
    * counts. Emits (cluster, n, i, c_milli). */
  private def minibatchKmeansSql(k: Int, dim: Int, batches: Int): String = {
    val r = s"range(1, ${dim + 1})"
    val zeros = s"list_transform($r, i -> CAST(0 AS DOUBLE))"
    val sb = new StringBuilder
    sb.append(
      s"""WITH v AS (SELECT vec_id,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)) AS q
         |  FROM embeddings),
         |sd AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, q AS seed
         |  FROM (SELECT vec_id, q FROM v WHERE vec_id % $batches = 0
         |        ORDER BY vec_id LIMIT $k)),
         |c0 AS (SELECT c, seed AS cent FROM sd),
         |""".stripMargin)
    for (t <- 0 until batches) {
      val prevState = if (t == 0) "sd" else s"s${t - 1}"
      // live centroids for this batch's assignment
      if (t > 0) sb.append(
        s"""c$t AS (SELECT c, CASE WHEN n > 0
           |    THEN list_transform(sums, x -> x / n) ELSE seed END AS cent
           |  FROM $prevState),
           |""".stripMargin)
      sb.append(
        s"""d$t AS (SELECT v.vec_id, v.q, c$t.c,
           |  list_sum(list_transform($r,
           |    i -> (v.q[i] - c$t.cent[i]) * (v.q[i] - c$t.cent[i]))) AS d
           |  FROM v, c$t WHERE v.vec_id % $batches = $t),
           |a$t AS (SELECT vec_id, q, c FROM (SELECT *, row_number()
           |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM d$t) WHERE rn = 1),
           |m$t AS (SELECT a$t.c, t.i, sum(q[t.i]) AS sv, count(*) AS cnt
           |  FROM a$t, (SELECT unnest($r) AS i) t GROUP BY a$t.c, t.i),
           |g$t AS (SELECT c, list(sv ORDER BY i) AS sums, max(cnt) AS n
           |  FROM m$t GROUP BY c),
           |""".stripMargin)
      val (pn, psums) =
        if (t == 0) ("CAST(0 AS BIGINT)", zeros)
        else (s"s${t - 1}.n", s"s${t - 1}.sums")
      sb.append(
        s"""s$t AS (SELECT $prevState.c, $pn + coalesce(g$t.n, 0) AS n,
           |  CASE WHEN g$t.c IS NULL THEN $psums
           |    ELSE list_transform($r, i -> $psums[i] + g$t.sums[i]) END AS sums,
           |  $prevState.seed
           |  FROM $prevState LEFT JOIN g$t ON $prevState.c = g$t.c),
           |""".stripMargin)
    }
    sb.append(
      s"""fin AS (SELECT * FROM s${batches - 1})
         |SELECT CAST(c AS INT) AS cluster, n, CAST(t.i AS INT) AS i,
         |  round(CASE WHEN n > 0 THEN sums[t.i] / n ELSE seed[t.i] END, 6) AS c_milli
         |FROM fin, (SELECT unnest($r) AS i) t
         |ORDER BY cluster, i""".stripMargin)
    sb.toString
  }

  /** Replay of [[graft.text.Web.htmlBlocks]] over the q_web_htmlblocks
    * page construction: container strip → block split (ordinality via
    * generate_subscripts) → visible-text + anchor-text chains → token
    * counts → the integer cross-multiplied link-density gate. */
  private def htmlBlocksSql(minTokens: Int, maxAnchorPct: Int): String = {
    // rules 3-5 of the htmlToText chain (tag strip, entities, whitespace)
    def vis(x: String): String =
      "trim(regexp_replace(replace(replace(replace(replace(replace(replace(" +
        s"regexp_replace($x, '<[^>]*>', ' ', 'g')," +
        """'&lt;','<'),'&gt;','>'),'&quot;','"'),'&#39;',''''),""" +
        """'&nbsp;',' '),'&amp;','&'), '\s+',' ','g'))"""
    // the Tokenize kernel's documented regex equivalent
    def norm(x: String): String =
      s"trim(regexp_replace(regexp_replace(lower($x)," +
        "'[^a-z0-9 ]',' ','g'),' +',' ','g'))"
    def ntok(x: String): String =
      s"(CASE WHEN length(${norm(x)}) = 0 THEN 0 " +
        s"ELSE len(string_split(${norm(x)}, ' ')) END)::BIGINT"
    // name boundary: without it `p` would match `<path>`, `li` `<link>`
    val blockTag = "(?i)</?(?:p|div|section|article|main|header|footer|" +
      "nav|aside|h[1-6]|li|ul|ol|table|tr|td|th|blockquote|pre|br|hr)" +
      "(?:[\\s/][^>]*)?>"
    s"""WITH u AS (SELECT doc_id,
       |  '<html><body><nav><a href=''/''>Home</a> <a href=''/a''>About us</a> ' ||
       |  '<a href=''/c''>Contact</a></nav><h1>Doc ' || doc_id::VARCHAR ||
       |  '</h1><p>' || substr(text, 1, 200) || '</p>' ||
       |  (CASE WHEN doc_id % 3 = 0
       |    THEN '<div>Read more: <a href=''/x''>click here now</a> and ' ||
       |         '<a href=''/y''>subscribe to our newsletter</a></div>'
       |    ELSE '' END) ||
       |  '<footer><a href=''/p''>Privacy policy</a> ' ||
       |  '<a href=''/t''>Terms</a></footer></body></html>' AS html
       |  FROM documents),
       |cl AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(html,
       |  '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
       |  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
       |  '(?s)<!--.*?-->', ' ', 'g') AS ch FROM u),
       |sg AS (SELECT doc_id, string_split_regex(ch, '$blockTag') AS l FROM cl),
       |b AS (SELECT doc_id, unnest(l) AS seg,
       |  generate_subscripts(l, 1)::INT AS block_idx FROM sg),
       |t AS (SELECT doc_id, block_idx, ${vis("seg")} AS text,
       |  ${
        // DuckDB array_to_string([]) is NULL where Spark array_join([]) is '';
        // the '<a' must not swallow <abbr>/<area>/<audio>
        vis("coalesce(array_to_string(regexp_extract_all(seg, " +
          "'(?is)<a(?:\\s[^>]*)?>(.*?)</a>', 1), ' '), '')")} AS atext
       |  FROM b),
       |n AS (SELECT doc_id, block_idx, text,
       |  ${ntok("text")} AS n_tokens, ${ntok("atext")} AS anchor_tokens FROM t)
       |SELECT doc_id, block_idx, n_tokens, anchor_tokens,
       |  (n_tokens >= $minTokens
       |    AND anchor_tokens * 100 <= $maxAnchorPct * n_tokens) AS kept, text
       |FROM n WHERE n_tokens > 0 ORDER BY doc_id, block_idx""".stripMargin
  }

  private def kmeansSql(k: Int, dim: Int, iters: Int): String = {
    val r = s"range(1, ${dim + 1})"
    "WITH " + kmeansCentsSql(k, dim, iters) +
      s"""df AS (SELECT v.vec_id, c$iters.c,
         |  list_sum(list_transform($r,
         |    i -> (v.q[i] - c$iters.cent[i]) * (v.q[i] - c$iters.cent[i]))) AS d
         |  FROM v, c$iters)
         |SELECT vec_id, CAST(c AS INT) AS cluster, round(d / 1000000.0, 6) AS dist2
         |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df)
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin
  }

  /** Cluster-outlier oracle: the [[kmeansSql]] assignment, re-ranked per
    * cluster by DESCENDING integer distance (monotone with the emitted
    * 6-dp dist2, so ranking pre-division is exact), vec_id tie-break. */
  private def outliersSql(k: Int, dim: Int, iters: Int, n: Int): String = {
    val r = s"range(1, ${dim + 1})"
    "WITH " + kmeansCentsSql(k, dim, iters) +
      s"""df AS (SELECT v.vec_id, c$iters.c,
         |  list_sum(list_transform($r,
         |    i -> (v.q[i] - c$iters.cent[i]) * (v.q[i] - c$iters.cent[i]))) AS d
         |  FROM v, c$iters),
         |asg AS (SELECT vec_id, CAST(c AS INT) AS cluster, d
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df)
         |  WHERE rn = 1),
         |rk AS (SELECT *, row_number() OVER (PARTITION BY cluster
         |    ORDER BY d DESC, vec_id) AS orank FROM asg)
         |SELECT vec_id, cluster, round(d / 1000000.0, 6) AS dist2,
         |  CAST(orank AS INT) AS outlier_rank
         |FROM rk WHERE orank <= $n ORDER BY vec_id""".stripMargin
  }

  /** Semantic-dedup oracle: re-derives the k-means centroids, assigns
    * every vector to its nearest (first-min ties), forms within-cluster
    * cosine pairs, closes them transitively, keeps min-id per component. */
  private def semanticDedupSql(k: Int, dim: Int, iters: Int, threshold: Double): String = {
    val r = s"range(1, ${dim + 1})"
    "WITH RECURSIVE " + kmeansCentsSql(k, dim, iters) +
      s"""df AS (SELECT v.vec_id, c$iters.c,
         |  list_sum(list_transform($r,
         |    i -> (v.q[i] - c$iters.cent[i]) * (v.q[i] - c$iters.cent[i]))) AS d
         |  FROM v, c$iters),
         |asg AS (SELECT vec_id, c
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df)
         |  WHERE rn = 1),
         |p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
         |  FROM asg x JOIN asg y ON x.c = y.c AND x.vec_id < y.vec_id
         |  JOIN embeddings ea ON ea.vec_id = x.vec_id
         |  JOIN embeddings eb ON eb.vec_id = y.vec_id
         |  WHERE round(${cosineSql("ea.embedding", "eb.embedding", dim)}, 6) >= $threshold),
         |e AS (SELECT id_a AS a, id_b AS b FROM p
         |  UNION ALL SELECT id_b, id_a FROM p),
         |reach(node, lab) AS (
         |  SELECT a, a FROM e
         |  UNION
         |  SELECT e.a, reach.lab FROM e JOIN reach ON e.b = reach.node),
         |dup AS (SELECT node FROM reach GROUP BY node HAVING min(lab) < node)
         |SELECT vec_id FROM embeddings
         |WHERE vec_id NOT IN (SELECT node FROM dup)
         |ORDER BY vec_id""".stripMargin
  }

  private def cosineSql(a: String, b: String, dim: Int): String = {
    val r = s"range(1,${dim + 1})"
    s"""list_sum(list_transform($r, i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))
       |    / greatest(
       |        sqrt(list_sum(list_transform($r, i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE))))
       |      * sqrt(list_sum(list_transform($r, i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))), 1e-12)""".stripMargin
  }

  /** DuckDB-dialect oracle for each query above (same table names as the
    * parquet basenames in the sf directory). */
  def oracleSql: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_join_broadcast" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_join_multi" ->
      """SELECT n_name, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_join_semi" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer WHERE EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_join_anti" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer WHERE NOT EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |   AND o_totalprice > 400000.0)
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_join_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  round(coalesce(sum(o_totalprice), 0.0), 2) AS total_price
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey LIMIT 1000""".stripMargin,
    "q_window_leadlag" ->
      """SELECT o_custkey, o_orderkey,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_orderkey) OVER w AS first_key
        |FROM orders WHERE o_custkey < 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_window_rank" ->
      """SELECT p_brand, p_partkey, p_retailprice, rn FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) WHERE rn <= 3
        |ORDER BY p_brand, rn""".stripMargin,
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_total
        |FROM orders WHERE o_custkey < 100
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin,
    "q_set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q_set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |WHERE s_acctbal > 9000.0
        |ORDER BY nationkey""".stripMargin,
    "q_set_union" ->
      """SELECT DISTINCT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,
    "q_join_full" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey <= 100),
        |o AS (SELECT o_custkey, count(*)::BIGINT AS n_orders FROM orders
        |  WHERE o_custkey BETWEEN 50 AND 150 GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_mktsegment,
        |  coalesce(n_orders, 0)::BIGINT AS n_orders
        |FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "q_union_by_name" ->
      """WITH u AS (
        |  SELECT o_orderpriority AS priority, o_totalprice AS amount FROM orders
        |  UNION ALL
        |  SELECT NULL AS priority, l_extendedprice AS amount FROM lineitem)
        |SELECT priority, count(*)::BIGINT AS n, round(sum(amount), 2) AS total
        |FROM u GROUP BY priority ORDER BY priority NULLS FIRST""".stripMargin,
    "q_scalar_string" ->
      """SELECT p_partkey,
        |  upper(substr(p_name, 1, 10)) AS name10,
        |  length(p_name) AS name_len,
        |  p_brand || '#' || p_type AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_scalar_datetime" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS o_year,
        |  month(o_orderdate) AS o_month,
        |  dayofmonth(o_orderdate) AS o_day,
        |  quarter(o_orderdate) AS o_quarter
        |FROM orders ORDER BY o_orderkey LIMIT 2000""".stripMargin,
    "q_case_when" ->
      """SELECT CASE WHEN o_totalprice > 300000.0 THEN 'big'
        |  WHEN o_totalprice > 100000.0 THEN 'mid'
        |  ELSE 'small' END AS bucket,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_having" ->
      """SELECT l_partkey, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem GROUP BY l_partkey
        |HAVING round(sum(l_quantity), 2) > 150.0
        |ORDER BY l_partkey""".stripMargin,
    "q_distinct_agg" ->
      """SELECT count(DISTINCT o_custkey) AS n_custs, count(*) AS n_orders
        |FROM orders""".stripMargin,
    "q_agg_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
        |  round(min(l_extendedprice), 2) AS min_price,
        |  round(max(l_extendedprice), 2) AS max_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_pivot" ->
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_subquery_scalar" ->
      """SELECT c_custkey,
        |  (SELECT count(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey) AS n_orders
        |FROM customer c ORDER BY c_custkey LIMIT 1000""".stripMargin,
    "q_scalar_array" ->
      """SELECT p_partkey,
        |  CAST(len(string_split(p_type, ' ')) AS INT) AS n_words,
        |  CAST(list_contains(string_split(p_type, ' '), 'BRUSHED') AS INT)
        |    AS has_brushed,
        |  string_split(p_type, ' ')[1] AS first_word,
        |  array_to_string(list_sort(string_split(p_type, ' ')), '_')
        |    AS sorted_words
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_text_tokens" ->
      """WITH t AS (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(coalesce(list_sum(list_transform(toks,
        |    s -> greatest(1, CAST(ceil(length(s)/6.0) AS INT)))), 0) AS INT) AS n_subwords,
        |  CAST(length(text) AS INT) AS n_chars_raw
        |FROM tt ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT doc_id,
        |  length(regexp_replace(text,'[^[:punct:]]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS pr,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s)))::DOUBLE
        |    / greatest(len(toks),1)::DOUBLE AS sr,
        |  len(toks) AS nt
        |  FROM tt)
        |SELECT doc_id, round(pr,4) AS punct_ratio, round(dr,4) AS digit_ratio,
        |  round(sr,4) AS stopword_ratio,
        |  round(0.25*least(nt::DOUBLE/64.0, 1.0) + 0.25*least(sr*4.0, 1.0)
        |    + 0.25*(1.0-least(pr*4.0, 1.0)) + 0.25*(1.0-least(dr*4.0, 1.0)), 4) AS quality
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_pipeline_curate2" ->
      """WITH t AS (SELECT doc_id, source, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, source, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT doc_id, source, len(toks) AS nt,
        |  coalesce(list_sum(list_transform(toks, s -> length(s))), 0)::DOUBLE
        |    / greatest(len(toks), 1)::DOUBLE AS ml,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE
        |    / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s))) AS sh
        |  FROM tt),
        |gated AS (SELECT doc_id, source FROM m
        |  WHERE nt >= 40 AND nt <= 100000 AND nt > 0 AND ml >= 4.0 AND ml <= 10.0
        |    AND dr <= 0.2 AND sh >= 2),
        |clean AS (SELECT doc_id, source FROM gated
        |  WHERE regexp_replace(lower(regexp_extract(
        |      'https://www.' || source || '.example.com/doc/' || doc_id::VARCHAR,
        |      '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)),
        |      '^www\.', '')
        |    NOT IN ('src1.example.com','src3.example.com','src5.example.com')),
        |counts AS (
        |  SELECT source, count(*)::BIGINT AS n FROM clean
        |  WHERE source IN ('src0','src2','src4') GROUP BY source),
        |par AS (
        |  SELECT source, n,
        |    CASE source WHEN 'src0' THEN 0.25 WHEN 'src2' THEN 0.25 ELSE 0.5 END AS w
        |  FROM counts),
        |tgt AS (SELECT source, n, CAST(floor(w * 60 + 0.5) AS BIGINT) AS t FROM par),
        |ep AS (SELECT source, n, t, CAST(ceil(t::DOUBLE / n) AS BIGINT) AS e FROM tgt),
        |thr AS (
        |  SELECT source, e,
        |    lpad(format('{:x}',
        |      CAST(floor(t::DOUBLE / (n * e) * 4294967296.0 + 0.5) AS BIGINT)), 9, '0') AS th
        |  FROM ep),
        |epochs AS (SELECT source, th, unnest(range(e)) AS epoch FROM thr),
        |cand AS (
        |  SELECT d.doc_id, d.source, ei.epoch, ei.th
        |  FROM clean d JOIN epochs ei ON d.source = ei.source)
        |SELECT doc_id, source, epoch
        |FROM cand
        |WHERE '0' || substr(md5('cur2|' || doc_id::VARCHAR || '|' || epoch::VARCHAR), 1, 8) < th
        |ORDER BY doc_id, epoch""".stripMargin,
    "q_text_dupseg" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |words AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS idx FROM tt),
        |segs AS (SELECT doc_id, (idx-1)//2 AS i, string_agg(w, ' ' ORDER BY idx) AS seg
        |  FROM words GROUP BY doc_id, (idx-1)//2),
        |agg AS (SELECT doc_id, count(*)::BIGINT AS n_segments,
        |    (count(*) - count(DISTINCT seg))::BIGINT AS dup_segments
        |  FROM segs GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(a.n_segments, 0)::BIGINT AS n_segments,
        |  coalesce(a.dup_segments, 0)::BIGINT AS dup_segments,
        |  round(coalesce(a.dup_segments, 0)::DOUBLE
        |    / greatest(coalesce(a.n_segments, 0), 1)::DOUBLE, 4) AS dup_fraction
        |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q_text_gopher" ->
      """WITH t AS (SELECT doc_id, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT doc_id, len(toks) AS nt,
        |  coalesce(list_sum(list_transform(toks, s -> length(s))), 0)::DOUBLE
        |    / greatest(len(toks), 1)::DOUBLE AS ml,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE
        |    / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s))) AS sh
        |  FROM tt)
        |SELECT doc_id,
        |  (nt >= 40 AND nt <= 100000) AS words_ok,
        |  (nt > 0 AND ml >= 4.0 AND ml <= 10.0) AS mean_word_len_ok,
        |  (dr <= 0.2) AS digit_ok,
        |  (sh >= 2) AS stopword_ok,
        |  ((nt >= 40 AND nt <= 100000) AND (nt > 0 AND ml >= 4.0 AND ml <= 10.0)
        |    AND (dr <= 0.2) AND (sh >= 2)) AS pass
        |FROM m ORDER BY doc_id""".stripMargin,
    "q_web_pagerank" -> pageRankSql(iters = 5),
    "q_web_urlnorm" ->
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'http://' END) ||
        |  (CASE WHEN doc_id % 4 = 0 THEN 'WWW.'
        |    WHEN doc_id % 4 = 1 THEN 'a.B.' ELSE '' END) ||
        |  source || '.com' ||
        |  (CASE WHEN doc_id % 3 = 0 THEN ':443'
        |    WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END) ||
        |  '/Doc/' || doc_id::VARCHAR ||
        |  (CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END) ||
        |  (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=news&b=2&a=1'
        |    WHEN doc_id % 4 = 1 THEN '?gclid=99'
        |    WHEN doc_id % 4 = 2 THEN '?z=1&fbclid=abc&a=2&' ELSE '' END) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '#Sec2' ELSE '' END) AS url
        |  FROM documents),
        |parts AS (SELECT doc_id, url,
        |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)', 1) AS hostport,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '^[^#]*?\?([^#]*)', 1) AS q
        |  FROM u),
        |comp AS (SELECT doc_id, url, scheme,
        |  regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')), '^www\.', '') AS host,
        |  regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
        |  regexp_replace(path, '/+$', '') AS cpath,
        |  list_sort(list_filter(string_split(q, '&'), p -> p <> '' AND
        |    NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)(=.*)?$'))) AS params
        |  FROM parts)
        |SELECT doc_id, url, scheme || '://' || host ||
        |  (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |    OR (scheme = 'https' AND port = '443') THEN '' ELSE ':' || port END) ||
        |  cpath ||
        |  (CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&')
        |    ELSE '' END) AS norm_url
        |FROM comp ORDER BY doc_id""".stripMargin,
    "q_web_htmltext" ->
      """WITH u AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || doc_id::VARCHAR || '</title>' ||
        |  (CASE WHEN doc_id % 4 = 0 THEN '<style>p { color: #fff; }</style>' ELSE '' END) ||
        |  (CASE WHEN doc_id % 3 = 0
        |    THEN '<script type="text/javascript">if (a<b && c>d) { alert(''x''); }</script>'
        |    ELSE '' END) ||
        |  '</head>' || chr(10) || '<body>' ||
        |  (CASE WHEN doc_id % 5 = 0 THEN '<!-- hidden <b>note</b> -->' ELSE '' END) ||
        |  '<h1>Doc ' || doc_id::VARCHAR || '</h1>' || chr(10) || '<p>' ||
        |  substr(text, 1, 120) || '</p>' ||
        |  (CASE WHEN doc_id % 2 = 0
        |    THEN ' Fish &amp; Chips &lt;tm&gt; say &quot;hi&quot; it&#39;s a&nbsp;b'
        |    ELSE '' END) ||
        |  '</body></html>' AS html FROM documents),
        |c AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
        |    '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |    '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |    '(?s)<!--.*?-->', ' ', 'g'),
        |    '<[^>]*>', ' ', 'g') AS t FROM u)
        |SELECT doc_id, trim(regexp_replace(
        |  replace(replace(replace(replace(replace(replace(t,
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        |    '&nbsp;', ' '), '&amp;', '&'),
        |  '\s+', ' ', 'g')) AS clean_text
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_web_htmlblocks" -> htmlBlocksSql(minTokens = 5, maxAnchorPct = 50),
    "q_web_domains" -> {
      // same public-suffix snapshot as Web.registrableDomainOf — the
      // alternation is generated from it so the two can never drift
      val alt = graft.text.Web.publicSuffixes
        .map(_.replace(".", "\\.")).mkString("|")
      val multi = s"regexp_extract(host, '([^.]+\\.(?:$alt))$$', 1)"
      val two = "regexp_extract(host, '([^.]+\\.[^.]+)$', 1)"
      s"""WITH u AS (SELECT doc_id,
        |  'https://' ||
        |  CASE doc_id % 4 WHEN 0 THEN 'www.' WHEN 1 THEN 'a.b.'
        |    WHEN 2 THEN '' ELSE 'sub.' END ||
        |  source ||
        |  CASE doc_id % 3 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
        |    ELSE '.com.au' END ||
        |  '/doc/' || doc_id::VARCHAR AS url
        |  FROM documents),
        |h AS (SELECT doc_id,
        |  lower(regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)) AS host
        |  FROM u),
        |d AS (SELECT doc_id,
        |  regexp_replace(host, '^www\\.', '') AS domain,
        |  CASE WHEN $multi <> '' THEN $multi
        |       WHEN $two <> '' THEN $two
        |       ELSE host END AS registrable
        |  FROM h)
        |SELECT doc_id, domain, registrable FROM d
        |WHERE registrable NOT IN ('src1.co.uk','src3.com.au','src5.com')
        |ORDER BY doc_id""".stripMargin
    },
    "q_text_langid" ->
      """WITH t AS (SELECT text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |s AS (SELECT
        |  len(list_filter(toks, w -> list_contains(['the','a','and','of','to','is','in','that','it','as'], w))) AS en,
        |  len(list_filter(toks, w -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','auf'], w))) AS de,
        |  len(list_filter(toks, w -> list_contains(['le','la','les','et','est','un','une','dans','que','pour'], w))) AS fr,
        |  len(list_filter(toks, w -> list_contains(['el','los','las','y','es','un','una','en','que','por'], w))) AS es,
        |  length(regexp_replace(text,'[^\x{4e00}-\x{9fff}]','','g'))::DOUBLE
        |    / greatest(length(text),1)::DOUBLE AS cjkr
        |  FROM tt)
        |SELECT CASE WHEN cjkr > 0.05 THEN 'zh'
        |  WHEN en=0 AND de=0 AND fr=0 AND es=0 THEN 'und'
        |  WHEN en>=de AND en>=fr AND en>=es THEN 'en'
        |  WHEN de>=fr AND de>=es THEN 'de'
        |  WHEN fr>=es THEN 'fr' ELSE 'es' END AS lang_pred, count(*) AS n
        |FROM s GROUP BY 1 ORDER BY lang_pred""".stripMargin,
    "q_text_topterms" ->
      """WITH t AS (SELECT
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tok AS (SELECT unnest(
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END) AS tok
        |  FROM t)
        |SELECT tok, count(*) AS n FROM tok GROUP BY tok
        |ORDER BY n DESC, tok LIMIT 50""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g'))) AS fp
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,
    "q_dedup_exact" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |k AS (SELECT doc_id, md5(array_to_string(
        |  (CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END)[1:3], ' ')) AS dup_key
        |  FROM t)
        |SELECT dup_key, count(*) AS group_size, min(doc_id) AS keeper_id
        |FROM k GROUP BY dup_key HAVING count(*) > 1 ORDER BY dup_key""".stripMargin,
    "q_report_leakage" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |h AS (SELECT doc_id, list_transform(range(0, greatest(length(norm) - 11, 0)),
        |    p -> md5_number_lower(substr(norm, p::INT + 1, 12))) AS hs FROM t),
        |sel AS (SELECT doc_id, hs, unnest(list_transform(
        |    range(0, CASE WHEN len(hs) = 0 THEN 0 ELSE greatest(len(hs) - 7, 1) END),
        |    j -> j::INT + least(8, len(hs) - j::INT)
        |       - list_position(list_reverse(hs[j+1 : j+8]), list_min(hs[j+1 : j+8])))) AS pos
        |  FROM h),
        |fp AS (SELECT DISTINCT doc_id, hs[pos+1] AS hash FROM sel),
        |ok AS (SELECT hash FROM fp GROUP BY hash HAVING count(*) <= 40),
        |fc AS (SELECT fp.doc_id, fp.hash FROM fp JOIN ok USING (hash)),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |  FROM fc a JOIN fc b ON a.hash = b.hash AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 5),
        |ps AS (SELECT least(sa.source, sb.source) AS source_a,
        |    greatest(sa.source, sb.source) AS source_b, p.shared
        |  FROM p JOIN documents sa ON p.id_a = sa.doc_id
        |         JOIN documents sb ON p.id_b = sb.doc_id)
        |SELECT source_a, source_b, count(*) AS n_pairs,
        |  sum(shared)::BIGINT AS shared_total
        |FROM ps GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,
    "q_text_blocklist" ->
      """WITH m AS (SELECT doc_id,
        |  list_filter(['fast table', 'scan slow', 'batch window spark',
        |    'customer query', 'value sort column'],
        |    p -> contains(text, p)) AS matched
        |  FROM documents)
        |SELECT doc_id, array_to_string(matched, '|') AS matched
        |FROM m WHERE len(matched) > 0
        |ORDER BY doc_id""".stripMargin,
    // exact replay of the BPE TRAINER: recursive CTE whose working
    // table is the (word, count, symbols) state of one round; the best
    // pair is a global aggregate over the previous iteration (count
    // desc, (left, right) asc — the TreeSet's order), and the sweep
    // merges non-overlapping occurrences left-to-right via the parity
    // of each occurrence's run position (sound for a == b runs, where
    // "aaa" counts the pair twice but merges once). Stops below
    // minPairCount = 2 or at 24 merges. Matches trainLocal bit-for-bit.
    "q_text_bpe_merges" ->
      s"""WITH RECURSIVE $bpeTrainerCtes
        |SELECT DISTINCT (round - 1)::INT AS rank, ma AS "left", mb AS "right",
        |  mc AS pair_count
        |FROM st WHERE round >= 1 ORDER BY rank""".stripMargin,
    // the TRAIN -> ENCODE composition: the recursive trainer CTE learns
    // the merges, a second recursion replays the encoder under them
    // (lowest-rank applicable pair per round, parity-selected sweep)
    // over distinct words, and per-doc subword streams reassemble in
    // token order — the full pipeline hash-verified end to end
    "q_text_bpe_encode_trained" ->
      s"""WITH RECURSIVE $bpeTrainerCtes,
        |w AS (SELECT DISTINCT word FROM tok),
        |enc AS (
        |  SELECT word, list_transform(range(1, length(word)+1),
        |    i -> substr(word, i::INT, 1)) AS syms FROM w
        |  UNION ALL
        |  SELECT z.word, list_filter(list_transform(range(1, len(z.syms)+1), i ->
        |      CASE WHEN z.sel[i] THEN z.pa || z.pb
        |           WHEN i > 1 AND z.sel[i-1] THEN NULL
        |           ELSE z.syms[i] END), x -> x IS NOT NULL) AS syms
        |  FROM (
        |    SELECT y.word, y.syms,
        |      (y.ms[y.best + 1]).a AS pa, (y.ms[y.best + 1]).b AS pb,
        |      list_transform(range(1, len(y.syms)+1), i ->
        |        (i < len(y.syms) AND y.syms[i] = (y.ms[y.best+1]).a
        |           AND y.syms[i+1] = (y.ms[y.best+1]).b) AND
        |        (i - coalesce(list_max(list_transform(range(1, i+1), j ->
        |          CASE WHEN NOT (j < len(y.syms) AND y.syms[j] = (y.ms[y.best+1]).a
        |               AND y.syms[j+1] = (y.ms[y.best+1]).b) THEN j END)), 0)) % 2 = 1)
        |        AS sel
        |    FROM (SELECT e.word, e.syms, ml.ms,
        |            ${bpeBestRankSql("e.syms", "ml.ms")} AS best
        |          FROM enc e CROSS JOIN ml) y
        |    WHERE y.best IS NOT NULL) z
        |),
        |fin AS (SELECT word, syms FROM
        |  (SELECT e.word, e.syms, ${bpeBestRankSql("e.syms", "ml.ms")} AS best
        |   FROM enc e CROSS JOIN ml) y WHERE best IS NULL),
        |ew AS (SELECT word, array_to_string(syms, ' ') AS sub,
        |  len(syms) AS n_sub FROM fin),
        |agg AS (SELECT tok.doc_id, sum(ew.n_sub) AS n_subwords,
        |  array_to_string(list(ew.sub ORDER BY tok.pos), ' ') AS subwords
        |  FROM tok JOIN ew USING (word) GROUP BY tok.doc_id)
        |SELECT dd.doc_id, coalesce(a.n_subwords, 0)::INT AS n_subwords,
        |  coalesce(a.subwords, '') AS subwords
        |FROM documents dd LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // exact replay of the BPE encoder under the plan-literal merge
    // table: recursive CTE over DISTINCT words, one round per step =
    // lowest-rank adjacent pair merged at every matching position
    // (a != b for all pairs makes positions non-overlapping)
    "q_text_bpe_encode" ->
      s"""WITH RECURSIVE t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |d AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT doc_id, unnest(range(1, len(toks)+1)) AS pos,
        |  unnest(toks) AS word FROM d),
        |w AS (SELECT DISTINCT word FROM tok),
        |enc AS (
        |  SELECT word, list_transform(range(1, length(word)+1),
        |    i -> substr(word, i::INT, 1)) AS syms FROM w
        |  UNION ALL
        |  SELECT word, list_filter(list_transform(range(1, len(syms)+1), i ->
        |      CASE WHEN i < len(syms) AND syms[i] = mg.a AND syms[i+1] = mg.b
        |             THEN mg.a || mg.b
        |           WHEN i > 1 AND syms[i-1] = mg.a AND syms[i] = mg.b THEN NULL
        |           ELSE syms[i] END), x -> x IS NOT NULL) AS syms
        |  FROM (SELECT word, syms,
        |        $bpeMergesLit[${bpeBestSql("syms")} + 1] AS mg FROM enc) z
        |  WHERE mg IS NOT NULL),
        |fin AS (SELECT word, syms FROM (SELECT word, syms,
        |    $bpeMergesLit[${bpeBestSql("syms")} + 1] AS mg FROM enc) z
        |  WHERE mg IS NULL),
        |ew AS (SELECT word, array_to_string(syms, ' ') AS sub,
        |  len(syms) AS n_sub FROM fin),
        |agg AS (SELECT tok.doc_id, count(*) AS n_words,
        |  sum(ew.n_sub) AS n_subwords,
        |  array_to_string(list(ew.sub ORDER BY tok.pos), ' ') AS subwords
        |  FROM tok JOIN ew USING (word) GROUP BY tok.doc_id)
        |SELECT dd.doc_id, coalesce(a.n_words, 0)::INT AS n_words,
        |  coalesce(a.n_subwords, 0)::INT AS n_subwords,
        |  coalesce(a.subwords, '') AS subwords
        |FROM documents dd LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_text_winnow_incremental" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |h AS (SELECT doc_id, list_transform(range(0, greatest(length(norm) - 11, 0)),
        |    p -> md5_number_lower(substr(norm, p::INT + 1, 12))) AS hs FROM t),
        |sel AS (SELECT doc_id, hs, unnest(list_transform(
        |    range(0, CASE WHEN len(hs) = 0 THEN 0 ELSE greatest(len(hs) - 7, 1) END),
        |    j -> j::INT + least(8, len(hs) - j::INT)
        |       - list_position(list_reverse(hs[j+1 : j+8]), list_min(hs[j+1 : j+8])))) AS pos
        |  FROM h),
        |fp AS (SELECT DISTINCT doc_id, hs[pos+1] AS hash FROM sel),
        |dup AS (SELECT b.doc_id FROM fp b JOIN fp c ON b.hash = c.hash
        |  AND b.doc_id % 2 = 1 AND c.doc_id % 2 = 0
        |  GROUP BY b.doc_id, c.doc_id HAVING count(*) >= 5)
        |SELECT doc_id FROM documents
        |WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM dup)
        |ORDER BY doc_id""".stripMargin,
    "q_text_winnow" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |h AS (SELECT doc_id, list_transform(range(0, greatest(length(norm) - 11, 0)),
        |    p -> md5_number_lower(substr(norm, p::INT + 1, 12))) AS hs FROM t),
        |sel AS (SELECT doc_id, hs, unnest(list_transform(
        |    range(0, CASE WHEN len(hs) = 0 THEN 0 ELSE greatest(len(hs) - 7, 1) END),
        |    j -> j::INT + least(8, len(hs) - j::INT)
        |       - list_position(list_reverse(hs[j+1 : j+8]), list_min(hs[j+1 : j+8])))) AS pos
        |  FROM h),
        |fp AS (SELECT DISTINCT doc_id, hs[pos+1] AS hash FROM sel),
        |ok AS (SELECT hash FROM fp GROUP BY hash HAVING count(*) <= 40),
        |fc AS (SELECT fp.doc_id, fp.hash FROM fp JOIN ok USING (hash))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
        |FROM fc a JOIN fc b ON a.hash = b.hash AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 5
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_editdist" ->
      """WITH s AS (SELECT c_custkey AS id, c_name AS name FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  levenshtein(a.name, b.name)::INT AS dist
        |FROM s a JOIN s b ON a.id < b.id
        |WHERE abs(length(a.name) - length(b.name)) <= 1
        |  AND levenshtein(a.name, b.name) <= 1
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_editdist_incremental" ->
      """WITH b AS (SELECT c_custkey AS id, c_name AS name FROM customer
        |  WHERE c_custkey % 2 = 1),
        |e AS (SELECT c_custkey AS corpus_id, c_name AS name FROM customer
        |  WHERE c_custkey % 2 = 0)
        |SELECT b.id, e.corpus_id, levenshtein(b.name, e.name)::INT AS dist
        |FROM b JOIN e ON abs(length(b.name) - length(e.name)) <= 1
        |  AND levenshtein(b.name, e.name) <= 1
        |ORDER BY id, corpus_id""".stripMargin,
    "q_text_spellcorrect" ->
      """WITH dict AS (
        |  SELECT DISTINCT unnest(string_split(p_name, ' ')) AS w FROM part),
        |q AS (SELECT p_partkey AS id,
        |    substr(string_split(p_name,' ')[1], 1, 1) ||
        |    substr(string_split(p_name,' ')[1], 3) AS query
        |  FROM part),
        |m AS (SELECT q.id, q.query, d.w AS match, levenshtein(q.query, d.w)::INT AS dist
        |  FROM q CROSS JOIN dict d WHERE levenshtein(q.query, d.w) <= 1),
        |r AS (SELECT *, row_number() OVER (PARTITION BY id ORDER BY dist, match) AS rn
        |  FROM m)
        |SELECT id, query, match, dist FROM r WHERE rn = 1 ORDER BY id""".stripMargin,
    "q_dedup_ngram" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.s, b.s))::DOUBLE /
        |    len(list_distinct(list_concat(a.s, b.s)))::DOUBLE, 4) AS jaccard
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_containment" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s))::DOUBLE / len(a.s)::DOUBLE AS c
        |  FROM sh a, sh b WHERE a.doc_id <> b.doc_id)
        |SELECT id_a, id_b, round(c, 4) AS containment FROM p WHERE c >= 0.7
        |ORDER BY id_a, id_b""".stripMargin,
    "q_text_redact" ->
      """WITH p AS (SELECT doc_id,
        |  substr(text, 1, 80) || ' contact user' || doc_id ||
        |  '@example.com or 10.0.' || (doc_id % 256) || '.7 call 555-123-4567' AS planted
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(planted,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '<IP>', 'g'),
        |    '\+?\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS redacted
        |FROM p ORDER BY doc_id LIMIT 300""".stripMargin,
    "q_text_repetition" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |g AS (SELECT doc_id, unnest(
        |  CASE WHEN len(toks) <= 2 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-1), i -> array_to_string(toks[i+1:i+2],' ')) END) AS g
        |  FROM tt),
        |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g)
        |SELECT doc_id, sum(c)::BIGINT AS n_grams, max(c)::BIGINT AS top_count,
        |  round(max(c)::DOUBLE / sum(c)::DOUBLE, 4) AS rep_ratio
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_pipeline_curate" ->
      """WITH t AS (SELECT doc_id, source, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, source, text, norm,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT doc_id, source, md5(norm) AS fp,
        |  length(regexp_replace(text,'[^[:punct:]]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS pr,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s)))::DOUBLE
        |    / greatest(len(toks),1)::DOUBLE AS sr,
        |  len(toks) AS nt,
        |  len(list_filter(toks, w -> list_contains(['the','a','and','of','to','is','in','that','it','as'], w))) AS en,
        |  len(list_filter(toks, w -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','auf'], w))) AS de,
        |  len(list_filter(toks, w -> list_contains(['le','la','les','et','est','un','une','dans','que','pour'], w))) AS fr,
        |  len(list_filter(toks, w -> list_contains(['el','los','las','y','es','un','una','en','que','por'], w))) AS es,
        |  length(regexp_replace(text,'[^\x{4e00}-\x{9fff}]','','g'))::DOUBLE
        |    / greatest(length(text),1)::DOUBLE AS cjkr
        |  FROM tt),
        |scored AS (SELECT doc_id, source, fp,
        |  round(0.25*least(nt::DOUBLE/64.0, 1.0) + 0.25*least(sr*4.0, 1.0)
        |    + 0.25*(1.0-least(pr*4.0, 1.0)) + 0.25*(1.0-least(dr*4.0, 1.0)), 4) AS quality,
        |  CASE WHEN cjkr > 0.05 THEN 'zh'
        |    WHEN en=0 AND de=0 AND fr=0 AND es=0 THEN 'und'
        |    WHEN en>=de AND en>=fr AND en>=es THEN 'en'
        |    WHEN de>=fr AND de>=es THEN 'de'
        |    WHEN fr>=es THEN 'fr' ELSE 'es' END AS lang_pred
        |  FROM m),
        |f AS (SELECT * FROM scored
        |  WHERE quality >= 0.5 AND lang_pred IN ('en', 'und')),
        |d AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY md5('cur|' || doc_id::VARCHAR), doc_id) AS srn
        |  FROM d WHERE rn = 1)
        |SELECT doc_id, source, quality FROM r WHERE srn <= 10
        |ORDER BY doc_id""".stripMargin,
    "q_text_invindex" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |term AS (SELECT DISTINCT doc_id, unnest(toks) AS term FROM tt),
        |ch AS (SELECT term, doc_id // 100 AS chunk_idx, count(*)::INT AS chunk_docs,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |  FROM term GROUP BY term, doc_id // 100),
        |tot AS (SELECT term, sum(chunk_docs)::BIGINT AS doc_freq FROM ch GROUP BY term)
        |SELECT ch.term, ch.chunk_idx, tot.doc_freq, ch.chunk_docs,
        |  ch.first_doc, ch.last_doc
        |FROM ch JOIN tot ON ch.term = tot.term
        |ORDER BY ch.term, ch.chunk_idx""".stripMargin,
    "q_text_search" -> textSearchSql,
    // the index-served search answers the SAME query: one oracle
    "q_text_search_indexed" -> textSearchSql,
    "q_sample_split" ->
      s"""SELECT doc_id, source,
        |  CASE WHEN '0' || substr(md5('s3|' || doc_id::VARCHAR), 1, 8) <
        |      '${"%09x".format(math.round(0.8 * 4294967296.0))}' THEN 'train'
        |    WHEN '0' || substr(md5('s3|' || doc_id::VARCHAR), 1, 8) <
        |      '${"%09x".format(math.round(0.9 * 4294967296.0))}' THEN 'val'
        |    ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_segdedup" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |words AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS idx FROM tt),
        |segs AS (SELECT doc_id, (idx-1)//2 AS i, string_agg(w, ' ' ORDER BY idx) AS seg
        |  FROM words GROUP BY doc_id, (idx-1)//2),
        |freq AS (SELECT seg FROM segs GROUP BY seg HAVING count(DISTINCT doc_id) >= 20),
        |agg AS (SELECT s.doc_id, count(*)::INT AS segs_total,
        |    sum(CASE WHEN f.seg IS NOT NULL THEN 1 ELSE 0 END)::INT AS segs_removed,
        |    coalesce(string_agg(CASE WHEN f.seg IS NULL THEN s.seg END, ' ' ORDER BY s.i), '') AS clean_text
        |  FROM segs s LEFT JOIN freq f ON s.seg = f.seg
        |  GROUP BY s.doc_id)
        |SELECT t.doc_id, coalesce(a.segs_total, 0) AS segs_total,
        |  coalesce(a.segs_removed, 0) AS segs_removed,
        |  coalesce(a.clean_text, '') AS clean_text
        |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q_text_chunks" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM tt),
        |ints AS (SELECT unnest(range(0, (SELECT
        |  coalesce(max((greatest(n - 32, 0) + 15) // 16 + 1), 0) FROM n))) AS c)
        |SELECT doc_id, c::INT AS chunk_idx,
        |  len(toks[c*16+1 : c*16+32])::INT AS n_tokens,
        |  array_to_string(toks[c*16+1 : c*16+32], ' ') AS chunk_text
        |FROM n JOIN ints
        |  ON n.n > 0 AND c <= (greatest(n.n - 32, 0) + 15) // 16
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_text_bm25" -> textBm25Sql,
    // same micro-nat quantization before the integer per-doc sum
    "q_text_entropy" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
        |tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
        |per AS (SELECT doc_id, c,
        |  CAST(floor(c::DOUBLE * ln(c::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
        |  FROM tf),
        |a AS (SELECT doc_id, sum(c)::BIGINT AS n, sum(m)::BIGINT AS s
        |  FROM per GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n, 0)::BIGINT AS n_tokens,
        |  CASE WHEN a.n > 0 THEN
        |    CAST(floor(ln(a.n::DOUBLE) * 1000000 + 0.5) AS BIGINT) - (a.s // a.n)
        |  END AS entropy_micro
        |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // the index-served search is EXACT (contains verify), so the
    // brute-force normalized substring scan is the complete oracle
    "q_text_trgm" ->
      """SELECT doc_id FROM (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS n
        |  FROM documents)
        |WHERE contains(n, 'spark wind') ORDER BY doc_id""".stripMargin,
    // unpivot the five columns, then the same portable-HLL chain at
    // p=10 (m=1024) with exact rows/nulls alongside
    "q_profile_portable" ->
      """WITH items AS (
        |  SELECT 'o_orderkey' AS col, o_orderkey::VARCHAR AS v FROM orders
        |  UNION ALL SELECT 'o_custkey', o_custkey::VARCHAR FROM orders
        |  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
        |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL SELECT 'o_orderdate', o_orderdate::VARCHAR FROM orders),
        |cnts AS (SELECT col, count(*) AS rows,
        |  sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS nulls
        |  FROM items GROUP BY col),
        |hh AS (SELECT col, md5_number_lower('hll:' || v) AS h FROM items
        |  WHERE v IS NOT NULL),
        |b AS (SELECT col, CAST(h >> 54 AS INT) AS register,
        |  h & ((1::UBIGINT << 54) - 1) AS w FROM hh),
        |s1 AS (SELECT col, register, w, w | (w >> 1) AS s FROM b),
        |s2 AS (SELECT col, register, w, s | (s >> 2) AS s FROM s1),
        |s3 AS (SELECT col, register, w, s | (s >> 4) AS s FROM s2),
        |s4 AS (SELECT col, register, w, s | (s >> 8) AS s FROM s3),
        |s5 AS (SELECT col, register, w, s | (s >> 16) AS s FROM s4),
        |s6 AS (SELECT col, register, w, s | (s >> 32) AS s FROM s5),
        |r AS (SELECT col, register,
        |  CASE WHEN w = 0 THEN 55 ELSE 55 - CAST(bit_count(s) AS INT) END AS rnk
        |  FROM s6),
        |regs AS (SELECT col, register, max(rnk) AS rnk FROM r GROUP BY 1, 2),
        |a AS (SELECT col, count(*) AS filled,
        |  sum(1::BIGINT << (48 - least(rnk, 48))) AS tf FROM regs GROUP BY col),
        |f AS (SELECT col, (1024 - filled)::BIGINT AS v_zero,
        |  (tf + (1024 - filled)::BIGINT * (1::BIGINT << 48))::BIGINT AS t_scaled
        |  FROM a)
        |SELECT c.col, c.rows, c.nulls, f.v_zero, f.t_scaled,
        |  round(CASE WHEN f.v_zero > 0 AND
        |      0.7213 / (1 + 1.079 / 1024.0) * 1024.0 * 1024.0
        |        * 281474976710656.0 / f.t_scaled <= 2560.0
        |    THEN 1024.0 * ln(1024.0 / f.v_zero)
        |    ELSE 0.7213 / (1 + 1.079 / 1024.0) * 1024.0 * 1024.0
        |        * 281474976710656.0 / f.t_scaled END, 4) AS est
        |FROM cnts c LEFT JOIN f ON c.col = f.col
        |ORDER BY c.col""".stripMargin,
    // per-source register fold + exact-integer harmonic sum + the same
    // double correction arithmetic (identical IEEE op order)
    "q_text_hll_group" ->
      """WITH t AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT source,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT source, unnest(toks) AS term FROM tt),
        |hh AS (SELECT source, md5_number_lower('hll:' || term) AS h FROM tok),
        |b AS (SELECT source, CAST(h >> 57 AS INT) AS register,
        |  h & ((1::UBIGINT << 57) - 1) AS w FROM hh),
        |s1 AS (SELECT source, register, w, w | (w >> 1) AS s FROM b),
        |s2 AS (SELECT source, register, w, s | (s >> 2) AS s FROM s1),
        |s3 AS (SELECT source, register, w, s | (s >> 4) AS s FROM s2),
        |s4 AS (SELECT source, register, w, s | (s >> 8) AS s FROM s3),
        |s5 AS (SELECT source, register, w, s | (s >> 16) AS s FROM s4),
        |s6 AS (SELECT source, register, w, s | (s >> 32) AS s FROM s5),
        |r AS (SELECT source, register,
        |  CASE WHEN w = 0 THEN 58 ELSE 58 - CAST(bit_count(s) AS INT) END AS rnk
        |  FROM s6),
        |regs AS (SELECT source, register, max(rnk) AS rnk FROM r GROUP BY 1, 2),
        |a AS (SELECT source, count(*) AS filled,
        |  sum(1::BIGINT << (48 - least(rnk, 48))) AS tf FROM regs GROUP BY source),
        |f AS (SELECT source AS grp, (128 - filled)::BIGINT AS v_zero,
        |  (tf + (128 - filled)::BIGINT * (1::BIGINT << 48))::BIGINT AS t_scaled
        |  FROM a)
        |SELECT grp, v_zero, t_scaled,
        |  round(CASE WHEN v_zero > 0 AND
        |      0.7213 / (1 + 1.079 / 128.0) * 128.0 * 128.0
        |        * 281474976710656.0 / t_scaled <= 320.0
        |    THEN 128.0 * ln(128.0 / v_zero)
        |    ELSE 0.7213 / (1 + 1.079 / 128.0) * 128.0 * 128.0
        |        * 281474976710656.0 / t_scaled END, 4) AS est
        |FROM f ORDER BY grp""".stripMargin,
    // segmented build == one-shot (contains verify): same brute oracle
    "q_stream_trgm" ->
      """SELECT doc_id FROM (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS n
        |  FROM documents)
        |WHERE contains(n, 'spark wind') ORDER BY doc_id""".stripMargin,
    // bit-exact replay of the HLL register table: md5_number_lower is
    // the proven md5-lower-64 twin; register = top 10 bits, rank via
    // the same OR-smear + bit_count ladder (integer ops only)
    "q_report_datacard" ->
      """WITH t AS (SELECT source, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT source, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT source,
        |  len(toks)::BIGINT AS nt,
        |  length(text)::BIGINT AS chars,
        |  length(regexp_replace(text,'[^[:punct:]]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS pr,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s))) AS en,
        |  len(list_filter(toks, s -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','auf'], s))) AS de,
        |  len(list_filter(toks, s -> list_contains(['le','la','les','et','est','un','une','dans','que','pour'], s))) AS fr,
        |  len(list_filter(toks, s -> list_contains(['el','los','las','y','es','un','una','en','que','por'], s))) AS es,
        |  length(regexp_replace(text,'[^\x{4e00}-\x{9fff}]','','g'))::DOUBLE
        |    / greatest(length(text),1)::DOUBLE AS cjkr,
        |  md5(text) AS h
        |  FROM tt),
        |q AS (SELECT source, nt, chars, h,
        |  CASE WHEN cjkr > 0.05 THEN 'zh'
        |    WHEN en=0 AND de=0 AND fr=0 AND es=0 THEN 'und'
        |    WHEN en>=de AND en>=fr AND en>=es THEN 'en'
        |    WHEN de>=fr AND de>=es THEN 'de'
        |    WHEN fr>=es THEN 'fr' ELSE 'es' END AS lang,
        |  CAST(round(10000.0 * round(0.25*least(nt::DOUBLE/64.0, 1.0)
        |    + 0.25*least(en::DOUBLE / greatest(nt,1)::DOUBLE * 4.0, 1.0)
        |    + 0.25*(1.0-least(pr*4.0, 1.0))
        |    + 0.25*(1.0-least(dr*4.0, 1.0)), 4)) AS BIGINT) AS qmicro
        |  FROM m)
        |SELECT source, count(*)::BIGINT AS n_docs, sum(nt)::BIGINT AS n_tokens,
        |  round(sum(nt)::DOUBLE / count(*)::DOUBLE, 4) AS avg_tokens,
        |  sum(chars)::BIGINT AS n_chars,
        |  (count(*) - count(DISTINCT h))::BIGINT AS dup_docs,
        |  (count(*) FILTER (lang = 'en'))::BIGINT AS n_en,
        |  (count(*) FILTER (lang = 'und'))::BIGINT AS n_und,
        |  round(sum(qmicro)::DOUBLE / 10000.0 / count(*)::DOUBLE, 4) AS avg_quality
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "q_stream_datacard" ->
      """WITH t AS (SELECT source, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT source, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT source, text,
        |  len(toks)::BIGINT AS nt,
        |  length(text)::BIGINT AS chars,
        |  length(regexp_replace(text,'[^[:punct:]]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS pr,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s))) AS en,
        |  len(list_filter(toks, s -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','auf'], s))) AS de,
        |  len(list_filter(toks, s -> list_contains(['le','la','les','et','est','un','une','dans','que','pour'], s))) AS fr,
        |  len(list_filter(toks, s -> list_contains(['el','los','las','y','es','un','una','en','que','por'], s))) AS es,
        |  length(regexp_replace(text,'[^\x{4e00}-\x{9fff}]','','g'))::DOUBLE
        |    / greatest(length(text),1)::DOUBLE AS cjkr
        |  FROM tt),
        |q AS (SELECT source, nt, chars,
        |  CASE WHEN cjkr > 0.05 THEN 'zh'
        |    WHEN en=0 AND de=0 AND fr=0 AND es=0 THEN 'und'
        |    WHEN en>=de AND en>=fr AND en>=es THEN 'en'
        |    WHEN de>=fr AND de>=es THEN 'de'
        |    WHEN fr>=es THEN 'fr' ELSE 'es' END AS lang,
        |  CAST(round(10000.0 * round(0.25*least(nt::DOUBLE/64.0, 1.0)
        |    + 0.25*least(en::DOUBLE / greatest(nt,1)::DOUBLE * 4.0, 1.0)
        |    + 0.25*(1.0-least(pr*4.0, 1.0))
        |    + 0.25*(1.0-least(dr*4.0, 1.0)), 4)) AS BIGINT) AS qmicro
        |  FROM m),
        |counts AS (SELECT source, count(*)::BIGINT AS n_docs,
        |  sum(nt)::BIGINT AS n_tokens, sum(chars)::BIGINT AS n_chars,
        |  (count(*) FILTER (lang = 'en'))::BIGINT AS n_en,
        |  (count(*) FILTER (lang = 'und'))::BIGINT AS n_und,
        |  sum(qmicro)::BIGINT AS qsum
        |  FROM q GROUP BY source),
        |hh AS (SELECT source, md5_number_lower('hll:' || text) AS h FROM t),
        |b AS (SELECT source, CAST(h >> 54 AS INT) AS register,
        |  h & ((1::UBIGINT << 54) - 1) AS w FROM hh),
        |s1 AS (SELECT source, register, w, w | (w >> 1) AS s FROM b),
        |s2 AS (SELECT source, register, w, s | (s >> 2) AS s FROM s1),
        |s3 AS (SELECT source, register, w, s | (s >> 4) AS s FROM s2),
        |s4 AS (SELECT source, register, w, s | (s >> 8) AS s FROM s3),
        |s5 AS (SELECT source, register, w, s | (s >> 16) AS s FROM s4),
        |s6 AS (SELECT source, register, w, s | (s >> 32) AS s FROM s5),
        |r AS (SELECT source, register,
        |  CASE WHEN w = 0 THEN 55 ELSE 55 - CAST(bit_count(s) AS INT) END AS rnk
        |  FROM s6),
        |regs AS (SELECT source, register, max(rnk) AS rnk FROM r GROUP BY 1, 2),
        |a AS (SELECT source, count(*) AS filled,
        |  sum(1::BIGINT << (48 - least(rnk, 48))) AS tf FROM regs GROUP BY source),
        |f AS (SELECT source, (1024 - filled)::BIGINT AS v_zero,
        |  (tf + (1024 - filled)::BIGINT * (1::BIGINT << 48))::BIGINT AS t_scaled
        |  FROM a)
        |SELECT source, c.n_docs, c.n_tokens,
        |  round(c.n_tokens::DOUBLE / c.n_docs::DOUBLE, 4) AS avg_tokens,
        |  c.n_chars, c.n_en, c.n_und,
        |  round(c.qsum::DOUBLE / 10000.0 / c.n_docs::DOUBLE, 4) AS avg_quality,
        |  f.v_zero, f.t_scaled,
        |  round(CASE WHEN f.v_zero > 0 AND
        |      0.7213 / (1 + 1.079 / 1024.0) * 1024.0 * 1024.0
        |        * 281474976710656.0 / f.t_scaled <= 2560.0
        |    THEN 1024.0 * ln(1024.0 / f.v_zero)
        |    ELSE 0.7213 / (1 + 1.079 / 1024.0) * 1024.0 * 1024.0
        |        * 281474976710656.0 / f.t_scaled END, 4) AS est
        |FROM counts c JOIN f USING (source)
        |ORDER BY source""".stripMargin,
    "q_text_hll" -> hllRegistersSql,
    // Streamed segment ingest is exactly the one-shot sketch by
    // register-wise-max mergeability — same bit-level oracle.
    "q_stream_hll" -> hllRegistersSql,
    // per-check violation counts; same conservative null handling
    "q_quality_checks" ->
      """WITH n AS (SELECT count(*) AS rows FROM orders),
        |v AS (
        |  SELECT 'price_positive' AS "check",
        |    sum(CASE WHEN coalesce(o_totalprice > 0, false)
        |      THEN 0 ELSE 1 END)::BIGINT AS violations FROM orders
        |  UNION ALL SELECT 'status_known',
        |    sum(CASE WHEN coalesce(o_orderstatus IN ('F','O','P'), false)
        |      THEN 0 ELSE 1 END)::BIGINT FROM orders
        |  UNION ALL SELECT 'date_in_range',
        |    sum(CASE WHEN coalesce(o_orderdate BETWEEN '1992-01-01' AND '1998-12-31', false)
        |      THEN 0 ELSE 1 END)::BIGINT FROM orders
        |  UNION ALL SELECT 'custkey_present',
        |    sum(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END)::BIGINT
        |    FROM orders
        |  UNION ALL SELECT 'priority_nonempty',
        |    sum(CASE WHEN coalesce(length(o_orderpriority) > 0, false)
        |      THEN 0 ELSE 1 END)::BIGINT FROM orders)
        |SELECT v."check", n.rows, v.violations,
        |  (v.violations = 0) AS passed
        |FROM v, n ORDER BY v."check"""".stripMargin,
    // exact cross-multiplied z-test in HUGEINT — no float stats
    "q_agg_outliers" ->
      """WITH o AS (SELECT event_id, event_type,
        |  CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |st AS (SELECT event_type AS g, count(*)::HUGEINT AS n,
        |  sum(cents::HUGEINT) AS s,
        |  sum(cents::HUGEINT * cents::HUGEINT) AS q
        |  FROM o GROUP BY 1)
        |SELECT o.event_id, o.event_type, o.cents
        |FROM o JOIN st ON o.event_type = st.g
        |WHERE (st.n * o.cents::HUGEINT - st.s) * (st.n * o.cents::HUGEINT - st.s)
        |   > 9 * (st.n * st.q - st.s * st.s)
        |ORDER BY event_id""".stripMargin,
    // replay the chunk prefix-sum and the original values
    "q_export_jsonl" ->
      """SELECT doc_id, source, source AS shard,
        |  ((row_number() OVER (PARTITION BY source ORDER BY doc_id)) - 1)
        |    // 32 AS chunk,
        |  text
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the window formulation IS the oracle for the heap aggregate
    "q_agg_topk" ->
      """SELECT source, rank, text_len, doc_id FROM (
        |  SELECT source,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY length(text) DESC, doc_id) AS rank,
        |    length(text)::BIGINT AS text_len, doc_id
        |  FROM documents) t
        |WHERE rank <= 5 ORDER BY source, rank""".stripMargin,
    // the corruption is the only failure mode, so the flag and the
    // nulled INT field are closed-form
    "q_ingest_csv" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 11 <> 5 THEN o_orderkey::INT END AS k,
        |  o_orderstatus AS status,
        |  (o_orderkey % 11 = 5) AS quarantined
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // same deterministic truncation; json_valid mirrors PERMISSIVE
    // from_json's row-level corrupt routing for malformed payloads
    "q_ingest_quarantine" ->
      """WITH p AS (SELECT event_id,
        |  CASE WHEN event_id % 7 = 3
        |    THEN substr(props, 1, length(props) - 2) ELSE props END AS payload
        |  FROM events)
        |SELECT event_id,
        |  CASE WHEN json_valid(payload)
        |    THEN CAST(json_extract(payload, '$.k') AS INTEGER) END AS k,
        |  NOT json_valid(payload) AS quarantined
        |FROM p ORDER BY event_id""".stripMargin,
    // exact replay of the count-min grid: same salted md5 buckets
    // (unsigned remainder — the Dsir-proven md5_number_lower pattern),
    // same min-over-rows estimate
    "q_text_cms" ->
      s"""WITH $cmsCellsSql,
        |q AS (SELECT unnest(['spark','window','data','the','graftabsent']) AS term),
        |qh AS (SELECT q.term, r.d,
        |    CAST(md5_number_lower('cms' || r.d || ':' || q.term) % 512 AS INT) AS bucket
        |  FROM q CROSS JOIN range(0, 4) r(d))
        |SELECT qh.term, min(coalesce(c.cnt, 0)) AS est
        |FROM qh LEFT JOIN cells c ON qh.d = c.d AND qh.bucket = c.bucket
        |GROUP BY qh.term ORDER BY term""".stripMargin,
    // mergeable segments ⇒ the streamed sketch equals the one-shot grid
    "q_stream_cms" ->
      s"""WITH $cmsCellsSql,
        |q AS (SELECT unnest(['spark','window','data','the','graftabsent']) AS term),
        |qh AS (SELECT q.term, r.d,
        |    CAST(md5_number_lower('cms' || r.d || ':' || q.term) % 512 AS INT) AS bucket
        |  FROM q CROSS JOIN range(0, 4) r(d))
        |SELECT qh.term, min(coalesce(c.cnt, 0)) AS est
        |FROM qh LEFT JOIN cells c ON qh.d = c.d AND qh.bucket = c.bucket
        |GROUP BY qh.term ORDER BY term""".stripMargin,
    "q_text_cms_heavy" ->
      s"""WITH $cmsCellsSql,
        |q AS (SELECT DISTINCT term FROM tok),
        |qh AS (SELECT q.term, r.d,
        |    CAST(md5_number_lower('cms' || r.d || ':' || q.term) % 512 AS INT) AS bucket
        |  FROM q CROSS JOIN range(0, 4) r(d)),
        |e AS (SELECT qh.term, min(coalesce(c.cnt, 0)) AS est
        |  FROM qh LEFT JOIN cells c ON qh.d = c.d AND qh.bucket = c.bucket
        |  GROUP BY qh.term)
        |SELECT term, est FROM e WHERE est >= 200 ORDER BY term""".stripMargin,
    // full replay of both retrievers + reciprocal-rank fusion: BM25
    // candidate list (rounded-score ranks), cosine candidate list
    // (membership by raw cosine, ranks over the 6dp round — mirroring
    // bruteForceTopK feeding rrfFuse), rrf = Σ 1/(60+rank) rounded 6dp
    "q_hybrid_retrieve" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |lens AS (SELECT doc_id, len(toks) AS len FROM tt),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
        |dft AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok
        |  WHERE term IN ('spark', 'window') GROUP BY term),
        |tfq AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term IN ('spark', 'window') GROUP BY doc_id, term),
        |c AS (SELECT (SELECT count(*) FROM tt)::DOUBLE AS n,
        |  (SELECT sum(len) FROM lens)::DOUBLE / (SELECT count(*) FROM tt)::DOUBLE AS avgdl),
        |bscore AS (SELECT q.doc_id,
        |  round(sum(ln((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |    * q.tf / (q.tf + 1.2 * (0.25 + 0.75 * l.len / c.avgdl))), 4) AS bm25
        |  FROM tfq q JOIN dft d ON q.term = d.term
        |    JOIN lens l ON q.doc_id = l.doc_id CROSS JOIN c
        |  GROUP BY q.doc_id),
        |btop AS (SELECT doc_id, bm25 FROM bscore
        |  ORDER BY bm25 DESC, doc_id LIMIT 20),
        |brank AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank FROM btop),
        |qv AS (SELECT embedding AS e FROM embeddings
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
        |s AS (SELECT vec_id AS doc_id,
        |  list_sum(list_transform(range(1,65),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(qv.e[i] AS DOUBLE)))
        |  / greatest(
        |      sqrt(list_sum(list_transform(range(1,65),
        |        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
        |    * sqrt(list_sum(list_transform(range(1,65),
        |        i -> CAST(qv.e[i] AS DOUBLE) * CAST(qv.e[i] AS DOUBLE)))), 1e-12) AS craw
        |  FROM embeddings, qv),
        |ctop AS (SELECT doc_id, round(craw, 6) AS cosine FROM s
        |  ORDER BY craw DESC, doc_id LIMIT 20),
        |crank AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY cosine DESC, doc_id) AS vec_rank FROM ctop),
        |f AS (SELECT coalesce(b.doc_id, v.doc_id) AS doc_id,
        |    b.lex_rank, v.vec_rank,
        |    round(coalesce(1.0/(60 + b.lex_rank), 0)
        |      + coalesce(1.0/(60 + v.vec_rank), 0), 6) AS rrf
        |  FROM brank b FULL OUTER JOIN crank v ON b.doc_id = v.doc_id)
        |SELECT doc_id, lex_rank, vec_rank, rrf FROM f
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    // index-served BM25 shares the scoring body (Tfidf.bm25From) with the
    // from-scratch path: one oracle
    "q_text_bm25_indexed" -> textBm25Sql,
    "q_text_tfidf" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents WHERE doc_id < 50),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM t)
        |SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |  round(tf.tf * ln(n.n::DOUBLE / df.df::DOUBLE), 4) AS tfidf
        |FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        |ORDER BY tf.doc_id, tf.term""".stripMargin,
    "q_sample_stratified" ->
      """WITH r AS (SELECT doc_id, lang, source, n_chars,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY md5('s1|' || doc_id::VARCHAR), doc_id) AS rn
        |  FROM documents)
        |SELECT doc_id, lang, source, n_chars FROM r WHERE rn <= 10
        |ORDER BY doc_id""".stripMargin,
    "q_sample_hash" ->
      """SELECT doc_id, source FROM documents
        |WHERE '0' || substr(md5('s2|' || doc_id::VARCHAR), 1, 8) < '040000000'
        |ORDER BY doc_id""".stripMargin,
    "q_sample_weighted" ->
      """SELECT doc_id, lang FROM documents
        |WHERE '0' || substr(md5('s3|' || doc_id::VARCHAR), 1, 8) <
        |  CASE WHEN lang = 'en' THEN '080000000'
        |       WHEN lang = 'zh' THEN '040000000'
        |       ELSE '01999999a' END
        |ORDER BY doc_id""".stripMargin,
    "q_sample_mix" ->
      """WITH counts AS (
        |  SELECT source, count(*)::BIGINT AS n FROM documents
        |  WHERE source IN ('src0','src1','src2') GROUP BY source),
        |par AS (
        |  SELECT source, n,
        |    CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.25 ELSE 0.25 END AS w
        |  FROM counts),
        |tgt AS (SELECT source, n, CAST(floor(w * 150 + 0.5) AS BIGINT) AS t FROM par),
        |ep AS (SELECT source, n, t, CAST(ceil(t::DOUBLE / n) AS BIGINT) AS e FROM tgt),
        |thr AS (
        |  SELECT source, e,
        |    lpad(format('{:x}',
        |      CAST(floor(t::DOUBLE / (n * e) * 4294967296.0 + 0.5) AS BIGINT)), 9, '0') AS th
        |  FROM ep),
        |epochs AS (SELECT source, th, unnest(range(e)) AS epoch FROM thr),
        |cand AS (
        |  SELECT d.doc_id, d.source, ei.epoch, ei.th
        |  FROM documents d JOIN epochs ei ON d.source = ei.source)
        |SELECT doc_id, source, epoch
        |FROM cand
        |WHERE '0' || substr(md5('mix|' || doc_id::VARCHAR || '|' || epoch::VARCHAR), 1, 8) < th
        |ORDER BY doc_id, epoch""".stripMargin,
    "q_sample_temperature" ->
      """WITH n AS (
        |  SELECT lang, count(*)::BIGINT AS n FROM documents
        |  WHERE lang IN ('de','en','es','fr','zh') GROUP BY lang),
        |ms AS (
        |  SELECT lang, n,
        |    CAST(floor(sqrt(n::DOUBLE * 1000000.0)) AS HUGEINT) AS ms FROM n),
        |tot AS (SELECT sum(ms) AS stot FROM ms),
        |tt AS (SELECT min((n::HUGEINT * stot) // ms) AS tt FROM ms, tot),
        |plan AS (
        |  SELECT lang, n,
        |    (2::HUGEINT * ms * (SELECT tt FROM tt) + stot) // (2::HUGEINT * stot)
        |      AS target
        |  FROM ms, tot),
        |thr AS (
        |  SELECT lang,
        |    printf('%09x',
        |      CAST((target * 8589934592::HUGEINT + n) // (2::HUGEINT * n) AS BIGINT))
        |      AS th
        |  FROM plan)
        |SELECT d.doc_id, d.lang, 0::BIGINT AS epoch
        |FROM documents d JOIN thr ON d.lang = thr.lang
        |WHERE '0' || substr(md5('s5|' || d.doc_id::VARCHAR || '|0'), 1, 8) < thr.th
        |ORDER BY doc_id""".stripMargin,
    "q_pack_manifest" ->
      """WITH t AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |n AS (SELECT doc_id, source,
        |  len(CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END)::BIGINT AS n_tokens
        |  FROM t),
        |f AS (SELECT * FROM n WHERE n_tokens >= 1),
        |c AS (SELECT doc_id, source, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM f),
        |p AS (SELECT doc_id, source, n_tokens,
        |  CAST(floor((cum - n_tokens) / 2000.0) AS BIGINT) AS pack_id FROM c)
        |SELECT source AS shard, pack_id,
        |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS docs,
        |  array_to_string(list(n_tokens ORDER BY doc_id), ',') AS token_counts,
        |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
        |FROM p GROUP BY 1, 2 ORDER BY shard, pack_id""".stripMargin,
    "q_delete_keyed" ->
      """SELECT doc_id, source, n_chars FROM documents
        |WHERE doc_id % 6 <> 1 ORDER BY doc_id""".stripMargin,
    "q_stream_upsert" ->
      """WITH base AS (SELECT doc_id, source, n_chars AS score FROM documents),
        |u AS (SELECT doc_id, source, n_chars * 10 AS score
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT doc_id, source, score FROM u
        |UNION ALL
        |SELECT b.doc_id, b.source, b.score FROM base b
        |WHERE b.doc_id NOT IN (SELECT doc_id FROM u)
        |ORDER BY doc_id""".stripMargin,
    "q_upsert_keyed" ->
      """WITH base AS (SELECT doc_id, source, n_chars AS score
        |  FROM documents WHERE doc_id % 7 <> 3),
        |u AS (SELECT doc_id, source, n_chars * 10 AS score
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id, source, score FROM u
        |UNION ALL
        |SELECT b.doc_id, b.source, b.score FROM base b
        |WHERE b.doc_id NOT IN (SELECT doc_id FROM u)
        |ORDER BY doc_id""".stripMargin,
    // SQL MERGE surface: same merge replay as q_upsert_keyed
    "q_upsert_sql" ->
      """WITH base AS (SELECT doc_id, source, n_chars AS score
        |  FROM documents WHERE doc_id % 7 <> 3),
        |u AS (SELECT doc_id, source, n_chars * 10 AS score
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id, source, score FROM u
        |UNION ALL
        |SELECT b.doc_id, b.source, b.score FROM base b
        |WHERE b.doc_id NOT IN (SELECT doc_id FROM u)
        |ORDER BY doc_id""".stripMargin,
    // the hook-refreshed INDEXED read must equal the plain merge replay
    "q_upsert_indexed" ->
      """WITH base AS (SELECT doc_id, source, n_chars AS score
        |  FROM documents WHERE doc_id % 7 <> 3),
        |u AS (SELECT doc_id, source, n_chars * 10 AS score
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id, source, score FROM u
        |UNION ALL
        |SELECT b.doc_id, b.source, b.score FROM base b
        |WHERE b.doc_id NOT IN (SELECT doc_id FROM u)
        |ORDER BY doc_id""".stripMargin,
    // rebucketing must be value-invisible: same replay as q_upsert_keyed
    "q_upsert_rebucket" ->
      """WITH base AS (SELECT doc_id, source, n_chars AS score
        |  FROM documents WHERE doc_id % 7 <> 3),
        |u AS (SELECT doc_id, source, n_chars * 10 AS score
        |  FROM documents WHERE doc_id % 5 = 0)
        |SELECT doc_id, source, score FROM u
        |UNION ALL
        |SELECT b.doc_id, b.source, b.score FROM base b
        |WHERE b.doc_id NOT IN (SELECT doc_id FROM u)
        |ORDER BY doc_id""".stripMargin,
    "q_scd2" -> scd2Sql,
    // incremental merges converge to the one-shot fold — same replay
    "q_scd2_merge" -> scd2Sql,
    // in-order streamed CDC batches converge to the same fold
    "q_stream_scd2" -> scd2Sql,
    // the streamed batch sequence IS the one-shot mini-batch sequence
    "q_stream_kmeans" -> minibatchKmeansSql(k = 8, dim = 64, batches = 4),
    // routing and fields in closed form from the line construction
    "q_stream_jsonl" ->
      """WITH u AS (SELECT doc_id, source,
        |  CASE WHEN doc_id % 11 = 5
        |    THEN '{"k": ' || doc_id::VARCHAR || ', "s": '
        |    ELSE '{"k": ' || doc_id::VARCHAR || ', "s": "' || source || '"}'
        |  END AS line FROM documents)
        |SELECT CASE WHEN doc_id % 11 <> 5 THEN doc_id END AS k,
        |  CASE WHEN doc_id % 11 <> 5 THEN source END AS s,
        |  (doc_id % 11 = 5) AS quarantined,
        |  CASE WHEN doc_id % 11 = 5 THEN line END AS raw
        |FROM u ORDER BY quarantined, k, raw""".stripMargin,
    // entropy replay -> rank-band membership -> cumulative pack ids
    "q_pipeline_curate7" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
        |tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY doc_id, term),
        |per AS (SELECT doc_id, c,
        |  CAST(floor(c::DOUBLE * ln(c::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS m
        |  FROM tf),
        |a AS (SELECT doc_id, sum(c)::BIGINT AS n, sum(m)::BIGINT AS s
        |  FROM per GROUP BY doc_id),
        |scores AS (SELECT doc_id, n AS n_tokens,
        |    CAST(floor(ln(n::DOUBLE) * 1000000 + 0.5) AS BIGINT) - (s // n) AS e
        |  FROM a WHERE n > 0),
        |cnt2 AS (SELECT count(*) AS n FROM scores),
        |vc AS (SELECT e AS sv, count(*) AS c FROM scores GROUP BY 1),
        |cum AS (SELECT sv, coalesce(sum(c) OVER (ORDER BY sv
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos FROM vc),
        |keep AS (SELECT sv FROM cum, cnt2
        |  WHERE 100 * pos >= 10 * cnt2.n AND 100 * pos < 90 * cnt2.n),
        |kept AS (SELECT s.doc_id, s.n_tokens FROM scores s
        |  JOIN keep ON s.e = keep.sv),
        |wsrc AS (SELECT k.doc_id, d.source, k.n_tokens FROM kept k
        |  JOIN documents d ON k.doc_id = d.doc_id),
        |c3 AS (SELECT doc_id, source, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM wsrc)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor((cum - n_tokens) / 1500.0) AS BIGINT) AS pack_id
        |FROM c3 ORDER BY doc_id""".stripMargin,
    // the chunk replay joined to its successor chunk
    "q_text_pairs" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM tt),
        |ints AS (SELECT unnest(range(0, (SELECT
        |  coalesce(max((greatest(n - 32, 0) + 15) // 16 + 1), 0) FROM n))) AS c),
        |chunks AS (SELECT doc_id, c::INT AS chunk_idx,
        |  array_to_string(toks[c*16+1 : c*16+32], ' ') AS chunk_text
        |  FROM n JOIN ints
        |  ON n.n > 0 AND c <= (greatest(n.n - 32, 0) + 15) // 16),
        |p AS (SELECT doc_id, chunk_idx, chunk_text AS anchor,
        |    lead(chunk_text) OVER (PARTITION BY doc_id ORDER BY chunk_idx)
        |      AS positive
        |  FROM chunks)
        |SELECT doc_id, chunk_idx, anchor, positive FROM p
        |WHERE positive IS NOT NULL ORDER BY doc_id, chunk_idx""".stripMargin,
    // replay of the salted-md5 probe sequence, dedup, anti-join, rank
    "q_sample_negatives" ->
      """WITH q AS (SELECT doc_id AS q_id, (doc_id * 7 + 3) % 500 AS pos_id
        |  FROM documents WHERE doc_id < 50),
        |probes AS (SELECT d.q_id, r.slot,
        |    CAST(md5_number_lower('graft:' || d.q_id || ':' || r.slot) % 500
        |      AS BIGINT) AS neg_id
        |  FROM (SELECT DISTINCT q_id FROM q) d CROSS JOIN range(0, 20) r(slot)),
        |ded AS (SELECT q_id, slot, neg_id,
        |    row_number() OVER (PARTITION BY q_id, neg_id ORDER BY slot) AS f
        |  FROM probes),
        |keep AS (SELECT d.q_id, d.slot, d.neg_id FROM ded d
        |  WHERE f = 1 AND NOT EXISTS (
        |    SELECT 1 FROM q WHERE q.q_id = d.q_id AND q.pos_id = d.neg_id)),
        |r AS (SELECT q_id, neg_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY slot) AS rank
        |  FROM keep)
        |SELECT q_id, neg_id, rank FROM r WHERE rank <= 5
        |ORDER BY q_id, rank""".stripMargin,
    // plain overlap predicates — bucketing must not change the answer
    "q_interval_join" ->
      """WITH s AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi
        |  FROM events WHERE user_id < 12
        |  GROUP BY user_id, CAST(ts AS DATE))
        |SELECT strftime(a.day, '%Y-%m-%d') AS day,
        |  a.user_id AS user_a, b.user_id AS user_b,
        |  least(a.hi, b.hi) - greatest(a.lo, b.lo) AS overlap_us
        |FROM s a JOIN s b ON a.day = b.day AND a.user_id < b.user_id
        |  AND a.lo <= b.hi AND b.lo <= a.hi
        |ORDER BY day, user_a, user_b""".stripMargin,
    // fold + the covering-interval filter at the snapshot instant
    "q_scd2_asof" ->
      """WITH vis AS (SELECT user_id, ts, event_type,
        |  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events),
        |v AS (SELECT user_id, ts, event_type FROM vis WHERE rn = 1),
        |o AS (SELECT user_id, ts, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM v),
        |op AS (SELECT user_id, ts, event_type FROM o
        |  WHERE pts IS NULL OR prev IS DISTINCT FROM event_type),
        |h AS (SELECT user_id, event_type, ts AS valid_from,
        |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
        |  FROM op)
        |SELECT user_id, event_type, epoch_us(valid_from) AS valid_from_us
        |FROM h
        |WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
        |  AND (valid_to IS NULL OR TIMESTAMP '2024-01-15 00:00:00' < valid_to)
        |ORDER BY user_id""".stripMargin,
    // history fold + per-event latest-version-at-or-before pick
    "q_scd2_lookup" ->
      """WITH vis AS (SELECT user_id, ts, event_type,
        |  row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |  FROM events),
        |v AS (SELECT user_id, ts, event_type FROM vis WHERE rn = 1),
        |o AS (SELECT user_id, ts, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM v),
        |h AS (SELECT user_id, ts AS valid_from, event_type FROM o
        |  WHERE pts IS NULL OR prev IS DISTINCT FROM event_type)
        |SELECT e.event_id, e.user_id,
        |  (SELECT h.event_type FROM h
        |   WHERE h.user_id = e.user_id AND h.valid_from <= e.ts
        |   ORDER BY h.valid_from DESC LIMIT 1) AS state_event_type
        |FROM events e ORDER BY event_id""".stripMargin,
    "q_pack_budget" ->
      """WITH t AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |n AS (SELECT doc_id, source,
        |  len(CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END)::BIGINT AS n_tokens
        |  FROM t),
        |c AS (SELECT doc_id, source, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum FROM n)
        |SELECT doc_id, source, n_tokens,
        |  CAST(floor((cum - n_tokens) / 2000.0) AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |n AS (SELECT doc_id, source,
        |  len(CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END)::BIGINT AS n
        |  FROM t),
        |c AS (SELECT doc_id, source, n,
        |  (sum(n) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM n WHERE n > 0),
        |s AS (SELECT source AS shard, doc_id AS doc, cum - n AS st, cum AS en,
        |  unnest(generate_series((cum - n) // 512, (cum - 1) // 512)) AS seq_id
        |  FROM c)
        |SELECT shard, seq_id::BIGINT AS seq_id,
        |  (greatest(st, seq_id * 512) - seq_id * 512)::BIGINT AS seq_off,
        |  doc,
        |  (greatest(st, seq_id * 512) - st)::BIGINT AS doc_off,
        |  (least(en, (seq_id + 1) * 512) - greatest(st, seq_id * 512))::BIGINT
        |    AS n_tokens,
        |  least(en, (seq_id + 1) * 512) = en AS eod
        |FROM s ORDER BY shard, seq_id, seq_off""".stripMargin,
    "q_pack_schedule" ->
      """WITH t AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |n AS (SELECT doc_id, source,
        |  len(CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END)::BIGINT AS n
        |  FROM t),
        |c AS (SELECT doc_id, source, n,
        |  (sum(n) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM n WHERE n > 0),
        |sq AS (SELECT source AS shard,
        |  unnest(generate_series((cum - n) // 512, (cum - 1) // 512)) AS seq_id
        |  FROM c),
        |d AS (SELECT DISTINCT shard, seq_id::BIGINT AS seq_id FROM sq),
        |w AS (SELECT shard, seq_id,
        |  CASE shard WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 3.0
        |    WHEN 'src2' THEN 1.5 WHEN 'src3' THEN 0.5 WHEN 'src4' THEN 2.0
        |    WHEN 'src5' THEN 1.0 ELSE NULL END AS wt FROM d),
        |v AS (SELECT shard, seq_id,
        |  (seq_id + 1)::DOUBLE / wt AS vt FROM w WHERE wt IS NOT NULL)
        |SELECT (row_number() OVER (ORDER BY vt, shard, seq_id))::BIGINT AS step,
        |  shard, seq_id, round(vt, 6) AS vt
        |FROM v ORDER BY step""".stripMargin,
    "q_pack_materialize" ->
      """WITH t AS (SELECT doc_id, source,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, source,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |n AS (SELECT doc_id, source, toks, len(toks)::BIGINT AS n FROM tt
        |  WHERE len(toks) > 0),
        |c AS (SELECT doc_id, source, toks, n,
        |  (sum(n) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM n),
        |s AS (SELECT source AS shard, toks, cum - n AS st, cum AS en,
        |  unnest(generate_series((cum - n) // 512, (cum - 1) // 512)) AS seq_id
        |  FROM c),
        |sl AS (SELECT shard, seq_id::BIGINT AS seq_id,
        |  greatest(st, seq_id * 512) - seq_id * 512 AS seq_off,
        |  toks[(greatest(st, seq_id * 512) - st + 1):
        |       (least(en, (seq_id + 1) * 512) - st)] AS sl
        |  FROM s)
        |SELECT shard, seq_id,
        |  array_to_string(flatten(list(sl ORDER BY seq_off)), ' ') AS tokens,
        |  len(flatten(list(sl ORDER BY seq_off)))::BIGINT AS n_tokens
        |FROM sl GROUP BY shard, seq_id ORDER BY shard, seq_id""".stripMargin,
    "q_events_funnel" ->
      """WITH e AS (SELECT user_id, ts, event_type FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT user_id, min(ts) AS t2 FROM e
        |  JOIN s1 USING (user_id) WHERE event_type = 'click' AND ts > t1
        |  GROUP BY 1),
        |s3 AS (SELECT user_id, min(ts) AS t3 FROM e
        |  JOIN s2 USING (user_id) WHERE event_type = 'purchase' AND ts > t2
        |  GROUP BY 1)
        |SELECT s1.user_id, epoch_us(t1) AS t1_us, epoch_us(t2) AS t2_us,
        |  epoch_us(t3) AS t3_us,
        |  (1 + (t2 IS NOT NULL)::INT + (t3 IS NOT NULL)::INT)::INT
        |    AS steps_completed
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "q_events_funnel_counts" ->
      """WITH e AS (SELECT user_id, ts, event_type FROM events),
        |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT user_id, min(ts) AS t2 FROM e
        |  JOIN s1 USING (user_id) WHERE event_type = 'click' AND ts > t1
        |  GROUP BY 1),
        |s3 AS (SELECT user_id, min(ts) AS t3 FROM e
        |  JOIN s2 USING (user_id) WHERE event_type = 'purchase' AND ts > t2
        |  GROUP BY 1)
        |SELECT step, action, n_users::BIGINT AS n_users FROM (
        |  SELECT 1 AS step, 'view' AS action,
        |    (SELECT count(*) FROM s1) AS n_users
        |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
        |ORDER BY step""".stripMargin,
    "q_events_resample" ->
      """WITH b AS (SELECT user_id, epoch_us(ts) // 3600000000 AS bucket,
        |  value FROM events),
        |c AS (SELECT user_id, bucket, count(*)::BIGINT AS n_events,
        |  sum(value) AS sv FROM b GROUP BY 1, 2),
        |r AS (SELECT user_id, min(bucket) AS lo, max(bucket) AS hi
        |  FROM b GROUP BY 1),
        |g AS (SELECT user_id,
        |  unnest(generate_series(lo, hi)) AS bucket FROM r)
        |SELECT g.user_id, g.bucket::BIGINT AS bucket,
        |  coalesce(c.n_events, 0)::BIGINT AS n_events,
        |  round(coalesce(c.sv, 0.0), 4) AS sum_value
        |FROM g LEFT JOIN c ON g.user_id = c.user_id AND g.bucket = c.bucket
        |ORDER BY g.user_id, g.bucket""".stripMargin,
    "q_pipeline_curate9" ->
      """WITH t AS (SELECT doc_id, source, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, source, text,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |m AS (SELECT doc_id, source,
        |  len(toks)::BIGINT AS nt,
        |  length(regexp_replace(text,'[^[:punct:]]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS pr,
        |  length(regexp_replace(text,'[^0-9]','','g'))::DOUBLE / greatest(length(text),1)::DOUBLE AS dr,
        |  len(list_filter(toks, s -> list_contains(['the','a','and','of','to','is','in','that','it','as'], s))) AS en
        |  FROM tt),
        |g AS (SELECT doc_id, source, nt AS n FROM m
        |  WHERE round(0.25*least(nt::DOUBLE/64.0, 1.0)
        |    + 0.25*least(en::DOUBLE / greatest(nt,1)::DOUBLE * 4.0, 1.0)
        |    + 0.25*(1.0-least(pr*4.0, 1.0))
        |    + 0.25*(1.0-least(dr*4.0, 1.0)), 4) >= 0.5),
        |c AS (SELECT doc_id, source, n,
        |  (sum(n) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING))::BIGINT AS cum FROM g WHERE n > 0),
        |sq AS (SELECT source AS shard,
        |  unnest(generate_series((cum - n) // 256, (cum - 1) // 256)) AS seq_id
        |  FROM c),
        |d AS (SELECT DISTINCT shard, seq_id::BIGINT AS seq_id FROM sq),
        |w AS (SELECT source AS shard, sqrt(sum(n)::DOUBLE) AS wt
        |  FROM g GROUP BY 1),
        |v AS (SELECT d.shard, d.seq_id,
        |  (d.seq_id + 1)::DOUBLE / w.wt AS vt
        |  FROM d JOIN w ON d.shard = w.shard WHERE w.wt > 0),
        |s AS (SELECT (row_number() OVER (ORDER BY vt, shard, seq_id))::BIGINT
        |    AS step, shard, seq_id, round(vt, 6) AS vt FROM v)
        |SELECT step, shard, seq_id, vt FROM s
        |WHERE step <= 100 ORDER BY step""".stripMargin,
    "q_events_retention" ->
      """WITH b AS (SELECT user_id,
        |  epoch_us(ts) // 604800000000 AS p FROM events),
        |c AS (SELECT user_id, min(p) AS cohort_period FROM b GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, p FROM b)
        |SELECT cohort_period, p - cohort_period AS period_offset,
        |  count(*)::BIGINT AS n_users
        |FROM a JOIN c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_decontaminate" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |c AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
        |b AS (SELECT doc_id AS bench_id, s FROM sh WHERE doc_id % 20 = 0)
        |SELECT c.doc_id, b.bench_id, len(list_intersect(c.s, b.s)) AS overlap
        |FROM c, b WHERE len(list_intersect(c.s, b.s)) >= 2
        |ORDER BY doc_id, bench_id""".stripMargin,
    "q_text_contamination" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |b AS (SELECT DISTINCT unnest(s) AS shw FROM sh WHERE doc_id % 20 = 0),
        |c AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
        |cx AS (SELECT doc_id, unnest(s) AS shw FROM c),
        |m AS (SELECT cx.doc_id, count(*)::INT AS n_matched
        |  FROM cx JOIN b USING (shw) GROUP BY cx.doc_id)
        |SELECT c.doc_id, len(c.s)::INT AS n_shingles,
        |  coalesce(m.n_matched, 0)::INT AS n_matched,
        |  CASE WHEN len(c.s) = 0 THEN 0.0
        |    ELSE round(coalesce(m.n_matched, 0)::DOUBLE / len(c.s), 4) END
        |    AS contamination
        |FROM c LEFT JOIN m USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "q_decontaminate_contain" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |c AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0),
        |b AS (SELECT doc_id, s FROM sh WHERE doc_id % 20 = 0),
        |f AS (SELECT DISTINCT c.doc_id FROM c, b
        |  WHERE len(list_intersect(c.s, b.s))::DOUBLE / len(b.s)::DOUBLE >= 0.6)
        |SELECT doc_id FROM c WHERE doc_id NOT IN (SELECT doc_id FROM f)
        |ORDER BY doc_id""".stripMargin,
    "q_text_segdedup_first" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |words AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS idx FROM tt),
        |segs AS (SELECT doc_id, (idx-1)//2 AS i, string_agg(w, ' ' ORDER BY idx) AS seg
        |  FROM words GROUP BY doc_id, (idx-1)//2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY seg ORDER BY doc_id, i) AS rn FROM segs),
        |agg AS (SELECT doc_id, count(*)::INT AS segs_total,
        |    sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::INT AS segs_removed,
        |    coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY i), '') AS clean_text
        |  FROM r GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(a.segs_total, 0) AS segs_total,
        |  coalesce(a.segs_removed, 0) AS segs_removed,
        |  coalesce(a.clean_text, '') AS clean_text
        |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q_text_dupspans" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM tt),
        |w AS (SELECT doc_id, unnest(range(0, greatest(n - 4, 0))) AS pos, toks FROM n),
        |ww AS (SELECT doc_id, pos, array_to_string(toks[pos+1 : pos+5], ' ') AS win FROM w),
        |d AS (SELECT win FROM ww GROUP BY win HAVING count(*) >= 2),
        |c AS (SELECT ww.doc_id, ww.pos FROM ww JOIN d USING (win)),
        |dw AS (SELECT doc_id, count(DISTINCT pos)::INT AS dup_windows FROM c GROUP BY doc_id),
        |p AS (SELECT doc_id, unnest(range(pos, pos + 5)) AS tpos FROM c),
        |cov AS (SELECT doc_id, count(DISTINCT tpos)::INT AS covered_tokens FROM p GROUP BY doc_id)
        |SELECT n.doc_id, n.n::INT AS n_tokens,
        |  (CASE WHEN n.n < 5 THEN 0 ELSE n.n - 4 END)::INT AS n_windows,
        |  coalesce(dw.dup_windows, 0) AS dup_windows,
        |  coalesce(cov.covered_tokens, 0) AS covered_tokens,
        |  CASE WHEN n.n = 0 THEN 0.0
        |    ELSE round(coalesce(cov.covered_tokens, 0)::DOUBLE / n.n, 4) END
        |    AS dup_fraction
        |FROM n LEFT JOIN dw USING (doc_id) LEFT JOIN cov USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // Keeper = the globally-first (doc_id, pos) occurrence of each
    // duplicated window (row_number over the same ordering as the
    // operator's min struct); a token position is cut when covered by a
    // NON-first duplicated window.
    "q_text_dupspans_cut" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM tt),
        |w AS (SELECT doc_id, unnest(range(0, greatest(n - 4, 0))) AS pos, toks FROM n),
        |ww AS (SELECT doc_id, pos, array_to_string(toks[pos+1 : pos+5], ' ') AS win FROM w),
        |rk AS (SELECT doc_id, pos,
        |    row_number() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn,
        |    count(*) OVER (PARTITION BY win) AS occ
        |  FROM ww),
        |rem0 AS (SELECT doc_id, unnest(range(pos, pos + 5)) AS tpos
        |  FROM rk WHERE occ >= 2 AND rn > 1),
        |rem AS (SELECT DISTINCT doc_id, tpos FROM rem0),
        |toksx AS (SELECT doc_id, unnest(toks) AS tok,
        |    generate_subscripts(toks, 1) - 1 AS tpos FROM tt),
        |keptx AS (SELECT tx.doc_id, tx.tok, tx.tpos FROM toksx tx
        |  LEFT JOIN rem ON tx.doc_id = rem.doc_id AND tx.tpos = rem.tpos
        |  WHERE rem.doc_id IS NULL),
        |agg AS (SELECT doc_id, count(*)::INT AS kept,
        |    string_agg(tok, ' ' ORDER BY tpos) AS clean_text
        |  FROM keptx GROUP BY doc_id)
        |SELECT n.doc_id, n.n::INT AS n_tokens,
        |  (n.n - coalesce(agg.kept, 0))::INT AS removed_tokens,
        |  coalesce(agg.clean_text, '') AS clean_text
        |FROM n LEFT JOIN agg USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // Stage-by-stage replay of the round-6 composed pipeline: k-means
    // outlier chain + verbatim-duplication gate + contamination gate +
    // salted-rank cap, all on exact integer inequalities.
    "q_pipeline_curate4" ->
      ("WITH " + {
        val r = "range(1, 65)"
        kmeansCentsSql(k = 8, dim = 64, iters = 2) +
        s"""asg AS (SELECT vec_id, c, d FROM (SELECT *, row_number()
           |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn
           |  FROM (SELECT v.vec_id, c2.c,
           |    list_sum(list_transform($r,
           |      i -> (v.q[i] - c2.cent[i]) * (v.q[i] - c2.cent[i]))) AS d
           |    FROM v, c2)) WHERE rn = 1),
           |outl AS (SELECT vec_id FROM (SELECT *, row_number()
           |    OVER (PARTITION BY c ORDER BY d DESC, vec_id) AS orank FROM asg)
           |  WHERE orank <= 5),
           |t AS (SELECT doc_id, source,
           |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
           |  FROM documents),
           |tt AS (SELECT doc_id,
           |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
           |n AS (SELECT doc_id, toks, len(toks) AS n FROM tt),
           |w AS (SELECT doc_id, unnest(range(0, greatest(n - 4, 0))) AS pos, toks FROM n),
           |ww AS (SELECT doc_id, pos, array_to_string(toks[pos+1 : pos+5], ' ') AS win FROM w),
           |dupw AS (SELECT win FROM ww GROUP BY win HAVING count(*) >= 2),
           |cw AS (SELECT ww.doc_id, ww.pos FROM ww JOIN dupw USING (win)),
           |pp AS (SELECT doc_id, unnest(range(pos, pos + 5)) AS tpos FROM cw),
           |cov AS (SELECT doc_id, count(DISTINCT tpos) AS covered FROM pp GROUP BY doc_id),
           |dgate AS (SELECT n.doc_id FROM n LEFT JOIN cov USING (doc_id)
           |  WHERE coalesce(cov.covered, 0) * 5 <= n.n),
           |shh AS (SELECT doc_id, list_distinct(
           |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
           |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
           |  FROM tt),
           |bsh AS (SELECT DISTINCT unnest(s) AS shw FROM shh WHERE doc_id % 20 = 0),
           |csh AS (SELECT doc_id, s FROM shh WHERE doc_id % 20 <> 0),
           |cxx AS (SELECT doc_id, unnest(s) AS shw FROM csh),
           |mm AS (SELECT cxx.doc_id, count(*) AS n_matched
           |  FROM cxx JOIN bsh USING (shw) GROUP BY cxx.doc_id),
           |cgate AS (SELECT csh.doc_id FROM csh LEFT JOIN mm USING (doc_id)
           |  WHERE coalesce(mm.n_matched, 0) * 10 < len(csh.s)),
           |kept AS (SELECT d.doc_id, d.source FROM documents d
           |  JOIN dgate USING (doc_id) JOIN cgate USING (doc_id)
           |  WHERE d.doc_id NOT IN (SELECT vec_id FROM outl)),
           |rr AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
           |    ORDER BY md5('cur4|' || doc_id::VARCHAR), doc_id) AS rn FROM kept)
           |SELECT doc_id, source FROM rr WHERE rn <= 10
           |ORDER BY doc_id""".stripMargin
      }),
    "q_dedup_clusters" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id
        |  AND round(len(list_intersect(a.s, b.s))::DOUBLE /
        |    len(list_distinct(list_concat(a.s, b.s)))::DOUBLE, 4) >= 0.5),
        |e AS (SELECT id_a AS a, id_b AS b FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(node, lab) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.a, reach.lab FROM e JOIN reach ON e.b = reach.node),
        |lbl AS (SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node)
        |SELECT cluster_id, count(*) AS size,
        |  array_to_string(list_sort(list(node)), ',') AS members
        |FROM lbl GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,
    "q_dedup_minhash" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  len(list_intersect(a.s, b.s))::DOUBLE /
        |    len(list_distinct(list_concat(a.s, b.s)))::DOUBLE AS j
        |  FROM sh a, sh b WHERE a.doc_id < b.doc_id)
        |SELECT id_a, id_b FROM p WHERE j >= 0.5 ORDER BY id_a, id_b""".stripMargin,
    "q_decontaminate_fuzzy" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |flagged AS (SELECT c.doc_id
        |  FROM sh c, sh b
        |  WHERE c.doc_id % 20 <> 0 AND b.doc_id % 20 = 0
        |    AND len(list_intersect(c.s, b.s))::DOUBLE /
        |        len(list_distinct(list_concat(c.s, b.s)))::DOUBLE >= 0.5)
        |SELECT doc_id FROM documents
        |WHERE doc_id % 20 <> 0 AND doc_id NOT IN (SELECT doc_id FROM flagged)
        |ORDER BY doc_id""".stripMargin,
    "q_dedup_incremental" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |dup AS (SELECT b.doc_id
        |  FROM sh a, sh b
        |  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |    AND len(list_intersect(a.s, b.s))::DOUBLE /
        |        len(list_distinct(list_concat(a.s, b.s)))::DOUBLE >= 0.5)
        |SELECT doc_id FROM documents
        |WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM dup)
        |ORDER BY doc_id""".stripMargin,
    "q_ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS e FROM embeddings
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
        |s AS (SELECT vec_id AS neighbor_id,
        |  list_sum(list_transform(range(1,65),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(q.e[i] AS DOUBLE)))
        |  / greatest(
        |      sqrt(list_sum(list_transform(range(1,65),
        |        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
        |    * sqrt(list_sum(list_transform(range(1,65),
        |        i -> CAST(q.e[i] AS DOUBLE) * CAST(q.e[i] AS DOUBLE)))), 1e-12) AS c
        |  FROM embeddings, q WHERE vec_id <> q.qid)
        |SELECT neighbor_id, round(c, 6) AS cosine FROM s
        |ORDER BY c DESC, neighbor_id LIMIT 10""".stripMargin,
    "q_ann_cosine_pairs" ->
      s"""WITH v AS (SELECT vec_id, embedding,
        |${bucketColsSql("embedding", 8, 64, 4)}
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(${cosineSql("a.embedding", "b.embedding", 64)}, 6) AS cosine
        |  FROM v a, v b WHERE a.vec_id < b.vec_id AND
        |    (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3))
        |SELECT id_a, id_b, cosine FROM p WHERE cosine >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "q_ann_dedup" ->
      s"""WITH RECURSIVE v AS (SELECT vec_id, embedding,
        |${bucketColsSql("embedding", 8, 64, 4)}
        |  FROM embeddings),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM v a, v b WHERE a.vec_id < b.vec_id AND
        |    (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
        |    AND round(${cosineSql("a.embedding", "b.embedding", 64)}, 6) >= 0.4),
        |e AS (SELECT id_a AS a, id_b AS b FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(node, lab) AS (
        |  SELECT a, a FROM e
        |  UNION
        |  SELECT e.a, reach.lab FROM e JOIN reach ON e.b = reach.node),
        |dup AS (SELECT node FROM reach GROUP BY node HAVING min(lab) < node)
        |SELECT vec_id FROM embeddings
        |WHERE vec_id NOT IN (SELECT node FROM dup)
        |ORDER BY vec_id""".stripMargin,
    "q_ann_lsh" ->
      s"""WITH v AS (SELECT vec_id, embedding,
        |${bucketColsSql("embedding", 8, 64, 4)}
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding AS e,
        |    b0 AS qb0, b1 AS qb1, b2 AS qb2, b3 AS qb3 FROM v
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
        |s AS (SELECT vec_id AS neighbor_id,
        |  ${cosineSql("embedding", "q.e", 64)} AS c
        |  FROM v, q WHERE vec_id <> q.qid AND
        |    (v.b0 = q.qb0 OR v.b1 = q.qb1 OR v.b2 = q.qb2 OR v.b3 = q.qb3))
        |SELECT neighbor_id, round(c, 6) AS cosine FROM s
        |ORDER BY c DESC, neighbor_id LIMIT 10""".stripMargin,
    "q_ann_multiprobe" ->
      s"""WITH v AS (SELECT vec_id, embedding,
        |  ${bucketSql("embedding", 64, graft.ann.Ann.hyperplanes(8, 64))} AS b
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding AS e, b AS qb FROM v
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
        |s AS (SELECT vec_id AS neighbor_id,
        |  ${cosineSql("embedding", "q.e", 64)} AS c
        |  FROM v, q WHERE vec_id <> q.qid AND
        |    bit_count(xor(v.b, q.qb)) <= 1)
        |SELECT neighbor_id, round(c, 6) AS cosine FROM s
        |ORDER BY c DESC, neighbor_id LIMIT 10""".stripMargin,
    "q_ann_pq" -> pqAdcSql(m = 8, k = 16, subDim = 8, topK = 10),
    "q_ann_ivfpq" -> ivfPqSql(cells = 16, nprobe = 4, dim = 64,
      m = 8, k = 16, subDim = 8, topK = 10),
    // the materialized-codes variant serves the SAME query: one oracle
    "q_ann_ivfpq_indexed" -> ivfPqSql(cells = 16, nprobe = 4, dim = 64,
      m = 8, k = 16, subDim = 8, topK = 10),
    // build(even half) + append(odd half) must serve the SAME query as a
    // one-shot build over everything (deterministic codebooks ⇒ identical
    // codes regardless of which batch encoded a vector): one oracle again
    "q_ann_ivfpq_incremental" -> ivfPqSql(cells = 16, nprobe = 4, dim = 64,
      m = 8, k = 16, subDim = 8, topK = 10),
    "q_ann_quantize" ->
      """WITH v AS (SELECT vec_id,
        |  list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
        |s AS (SELECT vec_id, e,
        |  list_max(list_transform(e, x -> abs(x))) / 127.0 AS scale FROM v),
        |q AS (SELECT vec_id, scale,
        |  list_transform(e, x -> least(greatest(
        |    floor(x / (CASE WHEN scale = 0 THEN 1.0 ELSE scale END) + 0.5),
        |    -127.0), 127.0)::BIGINT) AS qs
        |  FROM s)
        |SELECT vec_id, scale, list_sum(qs)::BIGINT AS q_sum,
        |  list_min(qs) AS q_min, list_max(qs) AS q_max,
        |  len(list_filter(qs, x -> abs(x) = 127))::INT AS n_saturated
        |FROM q ORDER BY vec_id""".stripMargin,
    "q_ann_rp" ->
      """WITH q AS (SELECT vec_id,
        |  list_transform(embedding, x -> floor(x::DOUBLE * 1000 + 0.5)) AS qv
        |  FROM embeddings)
        |SELECT vec_id, array_to_string(list_transform(range(0, 16), j ->
        |  CAST(list_sum(list_transform(range(0, 64), i ->
        |    (CASE WHEN md5_number_lower('42:' || j || ':' || i) % 2 = 0
        |     THEN 1 ELSE -1 END) * qv[i + 1])) AS BIGINT)), ',') AS proj
        |FROM q ORDER BY vec_id""".stripMargin,
    "q_ann_rp_topk" ->
      """WITH q0 AS (SELECT vec_id,
        |  list_transform(embedding, x -> floor(x::DOUBLE * 1000 + 0.5)) AS qv
        |  FROM embeddings),
        |p AS (SELECT vec_id, list_transform(range(0, 16), j ->
        |  list_sum(list_transform(range(0, 64), i ->
        |    (CASE WHEN md5_number_lower('42:' || j || ':' || i) % 2 = 0
        |     THEN 1 ELSE -1 END) * qv[i + 1]))) AS proj FROM q0),
        |qq AS (SELECT proj AS qp FROM p
        |  WHERE vec_id = (SELECT min(vec_id) FROM p)),
        |d AS (SELECT vec_id AS neighbor_id,
        |  CAST(list_sum(list_transform(range(0, 16), j ->
        |    (proj[j + 1] - qp[j + 1]) * (proj[j + 1] - qp[j + 1]))) AS BIGINT)
        |    AS proj_dist2
        |  FROM p, qq WHERE vec_id <> (SELECT min(vec_id) FROM p))
        |SELECT neighbor_id, proj_dist2 FROM d
        |ORDER BY proj_dist2, neighbor_id LIMIT 10""".stripMargin,
    "q_ann_ivf" ->
      s"""WITH v AS (SELECT vec_id, embedding,
        |  ${ivfDotsSql("embedding", 16, 64)} AS dots
        |  FROM embeddings),
        |cells AS (SELECT vec_id, embedding,
        |    list_position(dots, list_max(dots)) - 1 AS cell FROM v),
        |q AS (SELECT vec_id AS qid, embedding AS e, dots AS qdots FROM v
        |  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
        |qd AS (SELECT unnest(range(16)) AS cell, unnest(qdots) AS d FROM q),
        |probe AS (SELECT cell FROM qd ORDER BY d DESC, cell LIMIT 4),
        |s AS (SELECT c.vec_id AS neighbor_id,
        |  ${cosineSql("c.embedding", "q.e", 64)} AS c
        |  FROM cells c, q WHERE c.vec_id <> q.qid
        |    AND c.cell IN (SELECT cell FROM probe))
        |SELECT neighbor_id, round(c, 6) AS cosine FROM s
        |ORDER BY c DESC, neighbor_id LIMIT 10""".stripMargin,
    "q_ann_kmeans" -> kmeansSql(k = 8, dim = 64, iters = 2),
    "q_ann_kmeans_minibatch" -> minibatchKmeansSql(k = 8, dim = 64, batches = 4),
    // replay the fit (shared centroid chain), then BOTH cell assignments
    // (data rn=1, probe rn<=2 by (dist, cell)), the cell equi-join, the
    // exact cosine, and the rounded-cosine rank order
    "q_ann_knn_join" -> knnJoinSql(topK = 3, nprobe = 2, excludeSame = true),
    // retrieval = the same replay with the probe side restricted to the
    // odd-id half and the corpus side to the even-id half
    "q_ann_knn_retrieve" -> knnJoinSql(topK = 3, nprobe = 2, excludeSame = false,
      probeWhere = "AND vec_id % 2 = 1", dataWhere = "AND vec_id % 2 = 0"),
    // the retrieval chain at k=4, positives dropped arithmetically,
    // bounded per-query re-rank to the 3 hardest negatives
    "q_ann_hardneg" ->
      s"""WITH hard AS (
        |  SELECT vec_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY vec_id
        |      ORDER BY cosine DESC, neighbor_id) AS hn_rank
        |  FROM (
        |${knnJoinSql(topK = 4, nprobe = 2, excludeSame = false,
          probeWhere = "AND vec_id % 2 = 1", dataWhere = "AND vec_id % 2 = 0")}
        |  ) base
        |  WHERE neighbor_id <> (vec_id + 1) % 500)
        |SELECT vec_id, neighbor_id, cosine, hn_rank FROM hard
        |WHERE hn_rank <= 3 ORDER BY vec_id, hn_rank""".stripMargin,
    "q_ann_outliers" -> outliersSql(k = 8, dim = 64, iters = 2, n = 5),
    "q_ann_classify" ->
      """WITH v AS (SELECT vec_id,
        |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000 + 0.5)) AS q
        |  FROM embeddings),
        |seeds AS (SELECT vec_id, q, 'c' || CAST(vec_id % 3 AS VARCHAR) AS l
        |  FROM v WHERE vec_id < 90),
        |m AS (SELECT l, t.i, sum(q[t.i]) / count(*) AS val
        |  FROM seeds, (SELECT unnest(range(1, 65)) AS i) t GROUP BY l, t.i),
        |cents AS (SELECT l, dense_rank() OVER (ORDER BY l) - 1 AS c,
        |    list(val ORDER BY i) AS cent
        |  FROM m GROUP BY l),
        |df AS (SELECT v.vec_id, cents.l, cents.c,
        |  list_sum(list_transform(range(1, 65),
        |    i -> (v.q[i] - cents.cent[i]) * (v.q[i] - cents.cent[i]))) AS d
        |  FROM v, cents)
        |SELECT vec_id, l AS label, round(d / 1000000.0, 6) AS dist2
        |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df)
        |WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    "q_ann_pq_trained" -> pqTrainedSql(m = 8, k = 16, subDim = 8,
      iters = 1, topK = 10),
    "q_ann_diversity" -> ("WITH " + kmeansCentsSql(k = 8, dim = 64, iters = 1) +
      s"""df AS (SELECT v.vec_id, c1.c,
         |  list_sum(list_transform(range(1, 65),
         |    i -> (v.q[i] - c1.cent[i]) * (v.q[i] - c1.cent[i]))) AS d
         |  FROM v, c1),
         |asg AS (SELECT vec_id, c FROM (SELECT *, row_number()
         |    OVER (PARTITION BY vec_id ORDER BY d, c) AS rn FROM df) WHERE rn = 1),
         |r AS (SELECT vec_id, c, row_number() OVER (PARTITION BY c
         |    ORDER BY md5('d1|' || vec_id::VARCHAR), vec_id) AS rk FROM asg)
         |SELECT vec_id, CAST(c AS INT) AS cluster FROM r WHERE rk <= 20
         |ORDER BY vec_id""".stripMargin),
    "q_ann_ivf_trained" -> ivfTrainedSql(k = 16, dim = 64, iters = 1,
      nprobe = 4, topK = 10),
    "q_ann_semdedup" -> semanticDedupSql(k = 8, dim = 64, iters = 1, threshold = 0.4),
    "q_text_perplexity" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |tc AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
        |n AS (SELECT sum(cnt) AS n FROM tc),
        |model AS (SELECT term,
        |  CAST(floor(ln(cnt::DOUBLE / n.n::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS lp
        |  FROM tc, n),
        |pd AS (SELECT tf.doc_id, sum(tf.tf) AS n_tokens,
        |    -sum(tf.tf * m.lp) AS nll_micro
        |  FROM tf JOIN model m ON tf.term = m.term GROUP BY tf.doc_id)
        |SELECT d.doc_id, coalesce(pd.n_tokens, 0)::BIGINT AS n_tokens,
        |  coalesce(pd.nll_micro, 0)::BIGINT AS nll_micro,
        |  (pd.nll_micro // pd.n_tokens)::BIGINT AS avg_nll_micro
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // perplexity prelude → per-doc avg scores (nulls out) → per-value
    // counts → exclusive-rank positions → integer band test → semi-join
    "q_text_band" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |tok AS (SELECT doc_id, unnest(toks) AS term FROM tt),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |tc AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
        |nn AS (SELECT sum(cnt) AS n FROM tc),
        |model AS (SELECT term,
        |  CAST(floor(ln(cnt::DOUBLE / nn.n::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS lp
        |  FROM tc, nn),
        |pd AS (SELECT tf.doc_id, sum(tf.tf) AS n_tokens,
        |    -sum(tf.tf * m.lp) AS nll_micro
        |  FROM tf JOIN model m ON tf.term = m.term GROUP BY tf.doc_id),
        |scores AS (SELECT doc_id,
        |    (nll_micro // n_tokens)::BIGINT AS avg_nll_micro
        |  FROM pd WHERE n_tokens > 0),
        |cnt2 AS (SELECT count(*) AS n FROM scores),
        |vc AS (SELECT avg_nll_micro AS s, count(*) AS c FROM scores GROUP BY 1),
        |cum AS (SELECT s, coalesce(sum(c) OVER (ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pos FROM vc),
        |keep AS (SELECT s FROM cum, cnt2
        |  WHERE 100 * pos >= 20 * cnt2.n AND 100 * pos < 80 * cnt2.n)
        |SELECT scores.doc_id, scores.avg_nll_micro FROM scores
        |JOIN keep ON scores.avg_nll_micro = keep.s
        |ORDER BY scores.doc_id""".stripMargin,
    "q_pipeline_curate3" -> {
      val alt = graft.text.Web.publicSuffixes
        .map(_.replace(".", "\\.")).mkString("|")
      val multi = s"regexp_extract(host, '([^.]+\\.(?:$alt))$$', 1)"
      val two = "regexp_extract(host, '([^.]+\\.[^.]+)$', 1)"
      s"""WITH t AS (SELECT doc_id, source, text,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id, source,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |words AS (SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS idx FROM tt),
        |segs AS (SELECT doc_id, (idx-1)//2 AS i, string_agg(w, ' ' ORDER BY idx) AS seg
        |  FROM words GROUP BY doc_id, (idx-1)//2),
        |dupdocs AS (SELECT doc_id FROM segs GROUP BY doc_id
        |  HAVING count(*) > count(DISTINCT seg)),
        |bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |  THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |  ELSE [] END) AS bigram FROM tt),
        |tf AS (SELECT doc_id, bigram, count(*) AS tf FROM bg GROUP BY doc_id, bigram),
        |c AS (SELECT bigram, sum(tf) AS cnt FROM tf GROUP BY bigram),
        |p AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(cnt) AS w1cnt
        |  FROM c GROUP BY 1),
        |model AS (SELECT c.bigram,
        |  CAST(floor(ln(c.cnt::DOUBLE / p.w1cnt::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS lp
        |  FROM c JOIN p ON split_part(c.bigram, ' ', 1) = p.w1),
        |pd AS (SELECT tf.doc_id, sum(tf.tf) AS n_bigrams,
        |    -sum(tf.tf * m.lp) AS nll_micro
        |  FROM tf JOIN model m ON tf.bigram = m.bigram GROUP BY tf.doc_id),
        |band AS (SELECT doc_id, (nll_micro // n_bigrams)::BIGINT AS avg_nll_micro
        |  FROM pd WHERE (nll_micro // n_bigrams) BETWEEN 3340000 AND 3430000),
        |joined AS (SELECT d.doc_id, d.source, band.avg_nll_micro
        |  FROM documents d JOIN band ON d.doc_id = band.doc_id
        |  WHERE d.doc_id NOT IN (SELECT doc_id FROM dupdocs)),
        |u AS (SELECT doc_id, source, avg_nll_micro,
        |  'https://' ||
        |  CASE doc_id % 4 WHEN 0 THEN 'www.' WHEN 1 THEN 'a.b.'
        |    WHEN 2 THEN '' ELSE 'sub.' END ||
        |  source ||
        |  CASE doc_id % 3 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
        |    ELSE '.com.au' END ||
        |  '/doc/' || doc_id::VARCHAR AS url
        |  FROM joined),
        |h AS (SELECT doc_id, source, avg_nll_micro,
        |  lower(regexp_extract(url,
        |    '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1)) AS host
        |  FROM u),
        |clean AS (SELECT doc_id, source, avg_nll_micro FROM h
        |  WHERE (CASE WHEN $multi <> '' THEN $multi
        |         WHEN $two <> '' THEN $two ELSE host END)
        |    NOT IN ('src1.co.uk','src3.com.au','src5.com')),
        |r AS (SELECT doc_id, source, avg_nll_micro,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY md5('cur3|' || doc_id::VARCHAR), doc_id) AS rn FROM clean)
        |SELECT doc_id, source, avg_nll_micro FROM r WHERE rn <= 10
        |ORDER BY doc_id""".stripMargin
    },
    "q_text_bigramlm" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
        |  THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |  ELSE [] END) AS bigram FROM tt),
        |tf AS (SELECT doc_id, bigram, count(*) AS tf FROM bg GROUP BY doc_id, bigram),
        |c AS (SELECT bigram, sum(tf) AS cnt FROM tf GROUP BY bigram),
        |p AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(cnt) AS w1cnt
        |  FROM c GROUP BY 1),
        |model AS (SELECT c.bigram,
        |  CAST(floor(ln(c.cnt::DOUBLE / p.w1cnt::DOUBLE) * 1000000 + 0.5) AS BIGINT) AS lp
        |  FROM c JOIN p ON split_part(c.bigram, ' ', 1) = p.w1),
        |pd AS (SELECT tf.doc_id, sum(tf.tf) AS n_bigrams,
        |    -sum(tf.tf * m.lp) AS nll_micro
        |  FROM tf JOIN model m ON tf.bigram = m.bigram GROUP BY tf.doc_id)
        |SELECT d.doc_id, coalesce(pd.n_bigrams, 0)::BIGINT AS n_bigrams,
        |  coalesce(pd.nll_micro, 0)::BIGINT AS nll_micro,
        |  (pd.nll_micro // pd.n_bigrams)::BIGINT AS avg_nll_micro
        |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "q_text_dsir" -> dsirSql(selectK = None),
    "q_text_dsir_select" -> dsirSql(selectK = Some(100)),
    "q_text_dsir_resample" -> dsirSql(selectK = None,
      resample = Some((100, "dsir1"))),
    "q_text_kl" -> klSql(buckets = 1024),
    "q_text_quality_lr" -> logRegSql(iters = 3, buckets = 1024, etaMilli = 500),
    "q_pipeline_curate8" ->
      curate8Sql(iters = 3, buckets = 1024, etaMilli = 500, perSource = 10),
    "q_pipeline_curate6" ->
      """WITH u AS (SELECT doc_id, source,
        |  CASE WHEN doc_id % 2 = 0
        |    THEN 'https://www.ex' || ((doc_id // 2) % 7)::VARCHAR || '.com/p/'
        |      || (doc_id // 2)::VARCHAR || '?utm_source=x'
        |    ELSE 'HTTPS://ex' || ((doc_id // 2) % 7)::VARCHAR || '.com:443/p/'
        |      || (doc_id // 2)::VARCHAR || '/' END AS url
        |  FROM documents),
        |parts AS (SELECT doc_id, source, url,
        |  lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)', 1) AS hostport,
        |  regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?[^/?#]+([^?#]*)', 1) AS path,
        |  regexp_extract(url, '^[^#]*?\?([^#]*)', 1) AS q
        |  FROM u),
        |comp AS (SELECT doc_id, source, scheme,
        |  regexp_replace(lower(regexp_replace(hostport, ':[0-9]+$', '')), '^www\.', '') AS host,
        |  regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
        |  regexp_replace(path, '/+$', '') AS cpath,
        |  list_sort(list_filter(string_split(q, '&'), p -> p <> '' AND
        |    NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)(=.*)?$'))) AS params
        |  FROM parts),
        |nrm AS (SELECT doc_id, source, scheme || '://' || host ||
        |  (CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
        |    OR (scheme = 'https' AND port = '443') THEN '' ELSE ':' || port END) ||
        |  cpath ||
        |  (CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&')
        |    ELSE '' END) AS norm_url
        |  FROM comp),
        |kept AS (SELECT doc_id, source FROM (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY norm_url ORDER BY doc_id) AS rn
        |  FROM nrm) WHERE rn = 1),
        |t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |sh AS (SELECT doc_id, list_distinct(
        |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
        |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
        |  FROM tt),
        |c AS (SELECT k.doc_id, k.source, sh.s FROM kept k
        |  JOIN sh ON k.doc_id = sh.doc_id WHERE k.doc_id % 25 <> 0),
        |b AS (SELECT s FROM sh WHERE doc_id % 25 = 0),
        |f AS (SELECT DISTINCT c.doc_id FROM c, b
        |  WHERE len(list_intersect(c.s, b.s))::DOUBLE / len(b.s)::DOUBLE >= 0.6),
        |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
        |    ORDER BY md5('cur6|' || doc_id::VARCHAR), doc_id) AS rn
        |  FROM c WHERE doc_id NOT IN (SELECT doc_id FROM f))
        |SELECT doc_id, source FROM r WHERE rn <= 20
        |ORDER BY doc_id""".stripMargin,
    "q_pipeline_curate5" -> curate5Sql(iters = 3, buckets = 1024,
      etaMilli = 500, topK = 100, perSource = 5),
    "q_dedup_simhash" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |h AS (SELECT doc_id, list_transform(toks, s -> md5_number_lower(s)) AS hs FROM tt),
        |f AS (SELECT doc_id, list_transform(range(0,64), b ->
        |    CASE WHEN 2 * len(list_filter(hs, x -> ((x >> b) & 1) = 1)) > len(hs)
        |    THEN 1 ELSE 0 END) AS bits
        |  FROM h),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    CAST(list_sum(list_transform(range(1,65),
        |      i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END)) AS INT) AS hamming
        |  FROM f a, f b WHERE a.doc_id < b.doc_id)
        |SELECT id_a, id_b, hamming FROM p WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,
    "q_dedup_simhash_incremental" ->
      """WITH t AS (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
        |  FROM documents),
        |tt AS (SELECT doc_id,
        |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
        |h AS (SELECT doc_id, list_transform(toks, s -> md5_number_lower(s)) AS hs FROM tt),
        |f AS (SELECT doc_id, list_transform(range(0,64), b ->
        |    CASE WHEN 2 * len(list_filter(hs, x -> ((x >> b) & 1) = 1)) > len(hs)
        |    THEN 1 ELSE 0 END) AS bits
        |  FROM h),
        |dropped AS (SELECT b.doc_id FROM f a, f b
        |  WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
        |  AND list_sum(list_transform(range(1,65),
        |    i -> CASE WHEN a.bits[i] <> b.bits[i] THEN 1 ELSE 0 END)) <= 3)
        |SELECT doc_id FROM f
        |WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT doc_id FROM dropped)
        |ORDER BY doc_id""".stripMargin,
    "q_multimodal_decode" ->
      """WITH m AS (SELECT doc_id AS id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    ELSE 'video' END AS modality,
        |  CAST(octet_length(encode(text)) AS INT) AS len FROM documents)
        |SELECT id, modality,
        |  CAST(CASE modality WHEN 'image' THEN 16 + len % 640
        |    WHEN 'audio' THEN 0 ELSE 16 + len % 320 END AS INT) AS width,
        |  CAST(CASE modality WHEN 'image' THEN 16 + (len * 7) % 480
        |    WHEN 'audio' THEN 0 ELSE 16 + (len * 3) % 240 END AS INT) AS height,
        |  CAST(CASE modality WHEN 'image' THEN 1
        |    WHEN 'audio' THEN 1 + len % 16 ELSE 1 + len % 32 END AS INT) AS "nFrames",
        |  len AS "byteLen"
        |FROM m ORDER BY id""".stripMargin,
    "q_multimodal_audiohash" ->
      """WITH h AS (SELECT doc_id,
        |  CASE WHEN (doc_id % 500) > ((3 * doc_id) % 500) THEN 4294967295
        |       WHEN ((3 * doc_id) % 500) > (doc_id % 500) THEN -4294967296
        |       ELSE 0 END AS afp
        |  FROM documents)
        |SELECT doc_id, afp,
        |  (doc_id = min(doc_id) OVER (PARTITION BY afp)) AS kept
        |FROM h ORDER BY doc_id""".stripMargin,
    "q_multimodal_imagehash" ->
      """WITH h AS (SELECT doc_id,
        |  CASE WHEN (doc_id % 200) > ((7 * doc_id) % 200) THEN 1085102592571150095
        |       WHEN ((7 * doc_id) % 200) > (doc_id % 200) THEN -1085102592571150096
        |       ELSE 0 END AS phash
        |  FROM documents)
        |SELECT doc_id, phash,
        |  (doc_id = min(doc_id) OVER (PARTITION BY phash)) AS kept
        |FROM h ORDER BY doc_id""".stripMargin,
    "q_multimodal_resize" ->
      """SELECT doc_id, 8 AS width, 8 AS height,
        |  (((doc_id % 200) + ((7 * doc_id) % 200) + 1) // 2)::BIGINT AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_image" ->
      """SELECT doc_id,
        |  (16 + doc_id % 64)::INT AS width,
        |  (16 + (doc_id * 7) % 48)::INT AS height,
        |  (doc_id % 240)::BIGINT AS mean_luma
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_audio" ->
      """SELECT doc_id,
        |  8000::INT AS sample_rate,
        |  1::INT AS channels,
        |  (800 + 8 * (doc_id % 100))::INT AS n_samples,
        |  ((800 + 8 * (doc_id % 100)) // 8)::BIGINT AS duration_ms,
        |  (1 + doc_id % 1000)::BIGINT AS rms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_video" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' ELSE 'avi' END AS container,
        |  (160 + 16 * (doc_id % 28))::INT AS width,
        |  (120 + 8 * (doc_id % 30))::INT AS height,
        |  (CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END)::INT AS n_tracks,
        |  (50 + doc_id % 200)::BIGINT AS frame_count,
        |  ((50 + doc_id % 200) * 40)::BIGINT AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_multimodal_videoframes" ->
      """SELECT d.doc_id, u.frame_idx,
        |  (16 + 8 * (d.doc_id % 10))::INT AS width,
        |  (16 + 8 * ((3 * d.doc_id) % 8))::INT AS height
        |FROM documents d,
        |  LATERAL (SELECT unnest(range(0, 2 + d.doc_id % 4)) AS frame_idx) u
        |WHERE u.frame_idx % 2 = 0
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q_idx_point_lookup" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)
        |ORDER BY l_linenumber""".stripMargin,
    "q_idx_orc" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_orderkey = (SELECT min(l_orderkey) FROM lineitem)
        |ORDER BY l_linenumber""".stripMargin,
    "q_idx_refresh" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey =
        |    (SELECT min(l_orderkey) FROM lineitem WHERE l_orderkey % 2 = 1)
        |  OR l_returnflag = 'R'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_contains" ->
      """SELECT p_partkey, p_brand, p_type, p_retailprice
        |FROM part
        |WHERE p_type LIKE '%CONOM%' AND p_brand LIKE '%3'
        |ORDER BY p_partkey""".stripMargin,
    "q_idx_compact" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_orderkey <= 30000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_range_date" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_range_cluster" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_range_double" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE l_extendedprice >= 50000.0 AND l_extendedprice < 55000.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_point_double" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE l_extendedprice = (SELECT max(l_extendedprice) FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_range_decimal" ->
      """SELECT l_returnflag, count(*) AS n,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_q
        |FROM lineitem
        |WHERE CAST(l_quantity AS DECIMAL(12,2)) >= 10.00
        |  AND CAST(l_quantity AS DECIMAL(12,2)) <= 12.00
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_range_float" ->
      """SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE CAST(l_discount AS REAL) >= CAST(0.09 AS REAL)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_idx_double_meta" ->
      """SELECT count(*) AS n_rows, min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price
        |FROM lineitem""".stripMargin,
    "q_idx_nested" ->
      """SELECT o_orderkey, o_custkey AS user_id, o_orderstatus AS status,
        |  round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_custkey <= 50 AND o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,
    "q_idx_nested_topk" ->
      """SELECT o_orderkey, o_custkey AS user_id
        |FROM orders
        |ORDER BY o_custkey DESC, o_orderkey LIMIT 100""".stripMargin,
    "q_idx_nested_meta" ->
      """SELECT count(*) AS n_rows, count(o_custkey) AS n_users,
        |  min(o_custkey) AS min_user, max(o_custkey) AS max_user
        |FROM orders""".stripMargin,
    "q_idx_range_ts_int96" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_bucket_join" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_idx_zorder" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice
        |FROM lineitem
        |WHERE l_suppkey BETWEEN 10 AND 25 AND l_orderkey BETWEEN 5000 AND 20000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_skew_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_idx_agg_meta" ->
      """SELECT count(*) AS n_rows, count(l_orderkey) AS n_keys,
        |  min(l_orderkey) AS min_key, max(l_orderkey) AS max_key,
        |  min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship
        |FROM lineitem""".stripMargin,
    "q_idx_distinct_meta" ->
      "SELECT DISTINCT p_brand FROM part ORDER BY p_brand",
    "q_idx_agg_dict_meta" ->
      """SELECT count(DISTINCT p_type) AS n_types, min(p_type) AS min_type,
        |  max(p_type) AS max_type
        |FROM part""".stripMargin,
    "q_idx_group_meta" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, count(*) AS n_orders,
        |  min(o_custkey) AS min_cust, max(o_custkey) AS max_cust
        |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q_idx_filter_meta" ->
      """SELECT count(*) AS n_orders, min(o_custkey) AS min_cust,
        |  max(o_custkey) AS max_cust,
        |  CAST(min(year(o_orderdate)) AS INT) AS min_year,
        |  CAST(max(year(o_orderdate)) AS INT) AS max_year
        |FROM orders WHERE year(o_orderdate) BETWEEN 1994 AND 1996""".stripMargin,
    "q_idx_topk" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey DESC, l_linenumber DESC LIMIT 100""".stripMargin,
    "q_idx_topk_auto" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey DESC, l_linenumber DESC LIMIT 100""".stripMargin,
    "q_idx_topk_group" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |  year(o_orderdate)::INT AS o_year FROM orders),
        |r AS (SELECT o_year, o_orderkey, o_custkey,
        |  (row_number() OVER (PARTITION BY o_year
        |     ORDER BY o_custkey DESC, o_orderkey))::INT AS rn FROM o)
        |SELECT o_year, rn, o_orderkey, o_custkey FROM r WHERE rn <= 10
        |ORDER BY o_year, rn""".stripMargin,
    "q_idx_topk_group_auto" ->
      """WITH o AS (SELECT o_orderkey, o_custkey,
        |  year(o_orderdate)::INT AS o_year FROM orders),
        |r AS (SELECT o_year, o_orderkey, o_custkey,
        |  (row_number() OVER (PARTITION BY o_year
        |     ORDER BY o_custkey DESC, o_orderkey))::INT AS rn FROM o)
        |SELECT o_year, rn, o_orderkey, o_custkey FROM r WHERE rn <= 10
        |ORDER BY o_year, rn""".stripMargin,
    "q_idx_in_list" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_extendedprice
        |FROM lineitem WHERE l_suppkey IN (1, 2, 3)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_join_prune" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, s_name, l_extendedprice
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_suppkey <= 3
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_join_bloom" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, o_orderpriority,
        |  l_extendedprice
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_custkey = 1
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_join_auto" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, s_name, l_extendedprice
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |WHERE s_suppkey <= 3
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_array_contains" ->
      """SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |GROUP BY l_orderkey
        |HAVING sum(CASE WHEN l_suppkey = 3 THEN 1 ELSE 0 END) > 0
        |ORDER BY l_orderkey""".stripMargin,
    "q_idx_arrays_overlap" ->
      """SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |GROUP BY l_orderkey
        |HAVING sum(CASE WHEN l_suppkey IN (3, 7) THEN 1 ELSE 0 END) > 0
        |ORDER BY l_orderkey""".stripMargin,
    "q_idx_array_struct" ->
      """SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |GROUP BY l_orderkey
        |HAVING sum(CASE WHEN l_suppkey = 3 THEN 1 ELSE 0 END) > 0
        |ORDER BY l_orderkey""".stripMargin,
    "q_idx_join_anti" ->
      """SELECT s_suppkey FROM supplier
        |WHERE s_suppkey <= 20
        |AND NOT EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_suppkey = s_suppkey
        |    AND l.l_quantity = 50 AND l.l_linenumber = 7)
        |ORDER BY s_suppkey""".stripMargin,
    "q_idx_map_value" ->
      """SELECT l_orderkey, count(*) AS n_items FROM lineitem
        |GROUP BY l_orderkey
        |HAVING l_orderkey = 1
        |ORDER BY l_orderkey""".stripMargin,
    "q_idx_join_auto_nested" ->
      """SELECT o_orderkey, o_custkey AS user_id,
        |  round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_custkey <= 3)
        |ORDER BY o_orderkey""".stripMargin,
    "q_idx_map_contains" ->
      """SELECT l_orderkey,
        |  CAST(sum(CASE WHEN l_suppkey = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_supp3
        |FROM lineitem GROUP BY l_orderkey
        |HAVING sum(CASE WHEN l_suppkey = 3 THEN 1 ELSE 0 END) > 0
        |ORDER BY l_orderkey""".stripMargin,
    "q_idx_and_or" ->
      """SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag
        |FROM lineitem
        |WHERE (l_returnflag = 'R' AND l_suppkey = 1)
        |   OR l_orderkey = (SELECT max(l_orderkey) FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_idx_string_eq" ->
      """SELECT l_linestatus, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem WHERE l_returnflag = 'A'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q_idx_dict" ->
      """SELECT l_orderkey, CAST(l_linenumber AS INT) AS l_linenumber,
        |  l_suppkey, l_quantity
        |FROM lineitem WHERE l_suppkey = 7 AND l_linenumber = 2
        |ORDER BY l_orderkey""".stripMargin,
    "q_idx_partition" ->
      """SELECT o_orderkey, o_custkey, CAST(year(o_orderdate) AS INT) AS o_year,
        |  o_totalprice
        |FROM orders
        |WHERE year(o_orderdate) = 1995 AND o_custkey =
        |  (SELECT min(o_custkey) FROM orders WHERE year(o_orderdate) = 1995)
        |ORDER BY o_orderkey""".stripMargin,
    "q_events_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type""".stripMargin,
    "q_stream_ingest" ->
      """SELECT user_id, count(*)::BIGINT AS n, round(sum(value), 4) AS total_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Batch-by-batch replay of the streaming near-dedup ingest, unrolled
    // over the 4 arrival buckets (bucket = doc_id div slice, slice =
    // max(doc_id)//4 + 1 — the same integer arithmetic as the stager).
    // Per batch i: s_i = batch minus docs similar to any previously KEPT
    // doc; k_i = s_i minus docs similar to a smaller doc within s_i.
    // Similarity = exact 3-shingle Jaccard >= 0.5 (j has ida < idb, and
    // ranged buckets make every cross-batch pair ida-first).
    // the streamed index serves the same conjunctive query: one oracle
    "q_stream_searchingest" -> textSearchSql,
    // the streamed codes table serves the same IVFADC probe: one oracle
    "q_stream_vectoringest" -> ivfPqSql(cells = 16, nprobe = 4, dim = 64,
      m = 8, k = 16, subDim = 8, topK = 10),
    "q_stream_winnow" -> {
      val prelude =
        """WITH t AS (SELECT doc_id,
          |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
          |  FROM documents),
          |h AS (SELECT doc_id, list_transform(range(0, greatest(length(norm) - 11, 0)),
          |    p -> md5_number_lower(substr(norm, p::INT + 1, 12))) AS hs FROM t),
          |sel AS (SELECT doc_id, hs, unnest(list_transform(
          |    range(0, CASE WHEN len(hs) = 0 THEN 0 ELSE greatest(len(hs) - 7, 1) END),
          |    j -> j::INT + least(8, len(hs) - j::INT)
          |       - list_position(list_reverse(hs[j+1 : j+8]), list_min(hs[j+1 : j+8])))) AS pos
          |  FROM h),
          |fp AS (SELECT DISTINCT doc_id, hs[pos+1] AS hash FROM sel),
          |j AS (SELECT a.doc_id AS ida, b.doc_id AS idb FROM fp a JOIN fp b
          |  ON a.hash = b.hash AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2 HAVING count(*) >= 5),
          |d AS (SELECT doc_id,
          |  doc_id // (SELECT max(doc_id) // 4 + 1 FROM documents) AS b
          |  FROM documents),
          |s0 AS (SELECT doc_id FROM d WHERE b = 0),
          |k0 AS (SELECT doc_id FROM s0 WHERE doc_id NOT IN
          |  (SELECT idb FROM j WHERE ida IN (SELECT doc_id FROM s0)))""".stripMargin
      val batches = (1 until 4).map { i =>
        val prevKept = (0 until i).map(jj => s"SELECT doc_id FROM k$jj")
          .mkString(" UNION ALL ")
        s"""s$i AS (SELECT doc_id FROM d WHERE b = $i AND doc_id NOT IN
           |  (SELECT idb FROM j WHERE ida IN ($prevKept))),
           |k$i AS (SELECT doc_id FROM s$i WHERE doc_id NOT IN
           |  (SELECT idb FROM j WHERE ida IN (SELECT doc_id FROM s$i)))""".stripMargin
      }
      val union = (0 until 4).map(i => s"SELECT doc_id FROM k$i")
        .mkString(" UNION ALL ")
      (Seq(prelude) ++ batches).mkString(",\n") +
        s"\nSELECT doc_id FROM ($union) ORDER BY doc_id"
    },
    "q_stream_neardedup" -> {
      val prelude =
        """WITH t AS (SELECT doc_id,
          |  trim(regexp_replace(regexp_replace(lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')) AS norm
          |  FROM documents),
          |tt AS (SELECT doc_id,
          |  CASE WHEN length(norm)=0 THEN [] ELSE string_split(norm,' ') END AS toks FROM t),
          |sh AS (SELECT doc_id, list_distinct(
          |  CASE WHEN len(toks) <= 3 THEN [array_to_string(toks,' ')]
          |  ELSE list_transform(range(0, len(toks)-2), i -> array_to_string(toks[i+1:i+3],' ')) END) AS s
          |  FROM tt),
          |d AS (SELECT doc_id, s,
          |  doc_id // (SELECT max(doc_id) // 4 + 1 FROM sh) AS b FROM sh),
          |j AS (SELECT a.doc_id AS ida, x.doc_id AS idb FROM d a JOIN d x
          |  ON a.doc_id < x.doc_id
          |  AND round(len(list_intersect(a.s, x.s))::DOUBLE /
          |    len(list_distinct(list_concat(a.s, x.s)))::DOUBLE, 4) >= 0.5),
          |s0 AS (SELECT doc_id FROM d WHERE b = 0),
          |k0 AS (SELECT doc_id FROM s0 WHERE doc_id NOT IN
          |  (SELECT idb FROM j WHERE ida IN (SELECT doc_id FROM s0)))""".stripMargin
      val batches = (1 until 4).map { i =>
        val prevKept = (0 until i).map(jj => s"SELECT doc_id FROM k$jj")
          .mkString(" UNION ALL ")
        s"""s$i AS (SELECT doc_id FROM d WHERE b = $i AND doc_id NOT IN
           |  (SELECT idb FROM j WHERE ida IN ($prevKept))),
           |k$i AS (SELECT doc_id FROM s$i WHERE doc_id NOT IN
           |  (SELECT idb FROM j WHERE ida IN (SELECT doc_id FROM s$i)))""".stripMargin
      }
      val union = (0 until 4).map(i => s"SELECT doc_id FROM k$i")
        .mkString(" UNION ALL ")
      (Seq(prelude) ++ batches).mkString(",\n") +
        s"\nSELECT doc_id FROM ($union) ORDER BY doc_id"
    },
    "q_session_window" ->
      """WITH l AS (SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL THEN 1
        |    WHEN epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM l),
        |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM f)
        |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  count(*)::BIGINT AS n_events, round(sum(value), 4) AS session_value
        |FROM s GROUP BY user_id, session_seq
        |ORDER BY user_id, session_start""".stripMargin,
    "q_agg_histogram" ->
      // DuckDB has no width_bucket; replicate Spark's formula exactly:
      // width = (600000-0)/24 = 25000 (exact double), bucket =
      // floor(v/width)+1 clamped to 0 / n+1 outside the bounds.
      """SELECT (CASE WHEN o_totalprice < 0.0 THEN 0
        |    WHEN o_totalprice >= 600000.0 THEN 25
        |    ELSE floor(o_totalprice / 25000.0)::BIGINT + 1 END)::BIGINT AS bucket,
        |  count(*)::BIGINT AS n, round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q_stream_enrich" ->
      """SELECT e.event_id, e.user_id, c.c_mktsegment, e.event_type, e.value
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,
    "q_window_range" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  round(sum(value) OVER w, 4) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "q_profile" ->
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate", "o_orderpriority")
        .map(c =>
          s"""SELECT '$c' AS column_name, count(*)::BIGINT AS n_rows,
             |  sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_nulls,
             |  count(DISTINCT $c)::BIGINT AS n_distinct,
             |  min($c)::VARCHAR AS min_val, max($c)::VARCHAR AS max_val
             |FROM orders""".stripMargin)
        .mkString("", "\nUNION ALL\n", "\nORDER BY column_name"),
    "q_stream_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
        |  (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS lag_seconds
        |FROM events c JOIN events p
        |  ON c.user_id = p.user_id
        |  AND c.event_type = 'click' AND p.event_type = 'purchase'
        |  AND epoch_us(p.ts) >= epoch_us(c.ts)
        |  AND epoch_us(p.ts) <= epoch_us(c.ts) + 240::BIGINT * 60 * 1000000
        |ORDER BY click_id, purchase_id""".stripMargin,
    "q_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.t_us,
        |  l.event_id AS asof_event_id, l.t_us AS asof_t_us
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.event_id, c.t_us FROM c
        |  WHERE c.user_id = p.user_id AND c.t_us <= p.t_us
        |  ORDER BY c.t_us DESC, c.event_id DESC LIMIT 1) l ON true
        |ORDER BY p.event_id""".stripMargin,
    "q_asof_tolerance" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id, user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.t_us,
        |  l.event_id AS asof_event_id, l.t_us AS asof_t_us
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.event_id, c.t_us FROM c
        |  WHERE c.user_id = p.user_id AND c.t_us <= p.t_us
        |    AND p.t_us - c.t_us <= 7200000000
        |  ORDER BY c.t_us DESC, c.event_id DESC LIMIT 1) l ON true
        |ORDER BY p.event_id""".stripMargin,
    "q_range_join" ->
      """WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t_us
        |  FROM events WHERE event_type = 'purchase'),
        |a AS (SELECT user_id, epoch_us(ts) AS t_us, value
        |  FROM events WHERE event_type IN ('view', 'click'))
        |SELECT p.event_id, p.user_id, p.t_us,
        |  count(a.t_us) AS n_prior,
        |  round(coalesce(sum(a.value), 0), 4) AS v_prior
        |FROM p LEFT JOIN a ON a.user_id = p.user_id
        |  AND a.t_us BETWEEN p.t_us - 3600000000 AND p.t_us - 1
        |GROUP BY 1, 2, 3 ORDER BY p.event_id""".stripMargin,
    "q_agg_percentile" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q_scalar_json" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_stream_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q_stream_hourly_update" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
        |    AS win_start,
        |  event_type, count(*) AS n, round(sum(value), 4) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q_sessionize" ->
      """WITH l AS (SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_ts IS NULL THEN 1
        |    WHEN epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS ns
        |  FROM l),
        |s AS (SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM f),
        |g AS (SELECT user_id, session_seq, count(*) AS n_events,
        |    round(sum(value), 4) AS session_value
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |  max(n_events) AS max_session_events,
        |  round(sum(session_value), 4) AS total_value
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}

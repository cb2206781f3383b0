package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-extensions-spec")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()

  test("SQL surface of the native expressions") {
    val row = spark.sql(
      """SELECT
        |  graft_simhash64(array('a','b','c')) AS sh,
        |  graft_word_shingles(array('a','b','c','d'), 3) AS ws,
        |  graft_minhash_signature(array('a','b'), 4) AS mh,
        |  graft_dot(array(1.0, 2.0), array(3.0, 4.0)) AS d,
        |  graft_norm2(array(3.0, 4.0)) AS n2,
        |  graft_tokenize('Hello, World-42!') AS tk,
        |  graft_subword_count(array('abcdefgh', 'xy'), 6) AS sw,
        |  graft_md5_lower64('fox') AS ml,
        |  graft_md5_bucket('fox', 64) AS mb
        |""".stripMargin).head()
    assert(row.getAs[scala.collection.Seq[String]]("ws").toSeq == Seq("a b c", "b c d"))
    assert(row.getAs[scala.collection.Seq[Long]]("mh").length == 4)
    assert(row.getAs[Double]("d") == 11.0)
    assert(row.getAs[Double]("n2") == 25.0)
    assert(row.getAs[scala.collection.Seq[String]]("tk").toSeq == Seq("hello", "world", "42"))
    assert(row.getAs[Int]("sw") == 3) // ceil(8/6)=2 + max(1, ceil(2/6))=1
    assert(row.getAs[Long]("ml") == graft.functions.Md5Lower64(null)
      .compute(org.apache.spark.unsafe.types.UTF8String.fromString("fox")))
    assert(row.getAs[Int]("mb") == graft.functions.Md5Bucket.of("fox", 64))
    // determinism
    val again = spark.sql("SELECT graft_simhash64(array('a','b','c'))").head().getLong(0)
    assert(row.getAs[Long]("sh") == again)
  }

  test("join-prune + top-k rewrite fire through the EXTENSIONS injection path") {
    // the extension path injects the rules INTO the operator-optimization
    // fixed point (vs extraOptimizations' late batch the other specs
    // exercise) — different rule interactions (PushDownPredicates,
    // OptimizeIn, PruneFilters all run over the injected filter), so the
    // probe + idempotency must be proven here too
    import org.apache.spark.sql.functions._
    import graft.index.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft-ext-join").toString
    spark.conf.set(graft.index.IndexConf.MetastoreLocation, s"$work/metastore")
    val p = s"$work/fact"
    val sq = spark.sqlContext
    import sq.implicits._
    (0 until 8000).map(i => (i / 1000L, i.toLong)).toDF("k", "v")
      .repartitionByRange(8, col("k")).write.parquet(p)
    spark.index.create.mode("overwrite").indexBy("k").parquet(p)
    val fact = spark.index.parquet(p)
    // TWO keys: a one-element injected IN is lowered to EqualTo by
    // OptimizeIn inside this very fixed point, which the probe-form
    // assertion below could not see
    val dim = Seq(2L, 3L).toDF("dk")
    val joined = fact.join(dim, col("k") === col("dk"))
    val probes = joined.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
    }.flatMap(_.collect {
      case i: org.apache.spark.sql.catalyst.expressions.In => i
      case i: org.apache.spark.sql.catalyst.expressions.InSet => i
    })
    assert(probes.nonEmpty, "extension-path join probe must be injected")
    assert(joined.count() == 2000L)
    // single-key dim: the injected IN lowers to EqualTo and later passes
    // stand down (alreadyProbed) — the fixed point must converge with
    // the correct result
    val single = fact.join(Seq(2L).toDF("dk"), col("k") === col("dk"))
    assert(single.count() == 1000L)
    // the empty-dim IN collapses INSIDE the operator batch here
    // (OptimizeIn + PruneFilters) — the fixed point must converge and
    // the result stay empty
    val empty = fact.join(dim.filter(col("dk") < 0), col("k") === col("dk"))
    assert(empty.count() == 0L)
    // top-k rewrite through the same path
    val top = fact.orderBy(col("k").desc, col("v").desc).limit(5)
    assert(top.collect().map(_.getLong(1)).toSeq == (7995L to 7999L).reverse)
  }

  test("non-literal k is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_word_shingles(array('a'), 1 + 1)").head()
    }
    assert(e.getMessage.contains("integer literal") || e.getCause != null)
  }

  override def afterAll(): Unit = { spark.stop(); super.afterAll() }
}

package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Skew

/** Unit coverage for the skew-mitigation operators. */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-skew-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // hot key 1L holds 90% of the big side
  private lazy val big = ((1 to 900).map(i => (1L, i.toDouble)) ++
    (1 to 100).map(i => ((i % 7 + 2).toLong, i.toDouble)))
    .toDF("bkey", "bval")
  private lazy val small = (1L to 9L).map(k => (k, s"name_$k")).toDF("skey", "sname")

  test("saltedJoin is row-identical to the plain inner join") {
    val salted = Skew.saltedJoin(big, "bkey", small, "skey", salts = 8)
      .collect().map(_.toString).sorted
    val plain = big.join(small, $"bkey" === $"skey")
      .select($"bkey", $"bval", $"skey", $"sname")
      .collect().map(_.toString).sorted
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("salt spreads the hot key across multiple values, deterministically") {
    val saltOf = big.withColumn("__salt",
      Skew.saltExpr(big.columns.map(col).toIndexedSeq, 8))
    val hotSalts = saltOf.filter($"bkey" === 1L)
      .select($"__salt").distinct().count()
    assert(hotSalts > 1, s"hot key stayed on $hotSalts salt(s)")
    // deterministic across runs
    val a = saltOf.select($"__salt").as[Int].collect()
    val b = saltOf.select($"__salt").as[Int].collect()
    assert(a.sameElements(b))
  }

  test("salt spreads byte-identical duplicate rows of the hot key") {
    // the dedup-workload shape: one key, all rows identical — a pure row
    // hash collapses these onto a single salt and the join stays skewed
    val dupes = Seq.fill(400)((1L, 42.0)).toDF("bkey", "bval")
    val spread = dupes
      .withColumn("__salt", Skew.saltExpr(dupes.columns.map(col).toIndexedSeq, 8))
      .select($"__salt").distinct().count()
    assert(spread > 1, s"identical duplicates stayed on $spread salt(s)")
    // and the join over them is still row-identical to the plain join
    val salted = Skew.saltedJoin(dupes, "bkey", small, "skey", salts = 8)
      .collect().map(_.toString).sorted
    val plain = dupes.join(small, $"bkey" === $"skey")
      .select($"bkey", $"bval", $"skey", $"sname")
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("explicit ordinal makes the salt invariant under repartitioning") {
    // with a caller-supplied unique ordinal the salt is a pure function
    // of row content: the per-row assignment must not move when the
    // physical layout changes (the monotonically_increasing_id fallback
    // cannot promise this — that's exactly what the ordinal buys)
    val rows = (1 to 500).map(i => (i.toLong, (i % 5).toLong, i * 0.5))
      .toDF("rid", "bkey", "bval")
    def saltMap(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.withColumn("__salt",
          Skew.saltExpr(Seq(col("bkey"), col("bval")), 8, Some(col("rid"))))
        .select($"rid", $"__salt").as[(Long, Int)].collect().toMap
    val a = saltMap(rows.repartition(3))
    val b = saltMap(rows.repartition(11, $"bval"))
    val c = saltMap(rows.coalesce(1))
    assert(a == b && b == c)
    // and the salted join with an ordinal stays row-identical
    val salted = Skew.saltedJoin(rows, "bkey", small, "skey", salts = 8,
        ordinal = Some($"rid"))
      .collect().map(_.toString).sorted
    val plain = rows.join(small, $"bkey" === $"skey")
      .select($"rid", $"bkey", $"bval", $"skey", $"sname")
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("saltedJoin rejects a user column named __salt") {
    val l = Seq((1L, 2L)).toDF("id", "__salt")
    val r = Seq((1L, 2L)).toDF("rid", "y")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(l, "id", r, "rid", 4)
    }
    assert(e.getMessage.contains("reserved"))
  }

  test("saltedJoin joins on (key, salt) without broadcast under merge hint") {
    val out = Skew.saltedJoin(big, "bkey", small.hint("merge"), "skey", salts = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), s"merge hint ignored:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
  }

  test("saltedJoin rejects colliding column names") {
    val l = Seq((1L, 2L)).toDF("id", "x")
    val r = Seq((1L, 2L)).toDF("id", "y")
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(l, "id", r, "id", 4)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

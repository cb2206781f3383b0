package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TopKByKey, TopKHeap}
import graft.ops.TopK

/** Bounded-heap per-group top-k: heap algebra, serialization, window
  * equivalence, and the plan shape the operator exists for. */
class TopKSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-topk-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def bruteTopK(
      pairs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    pairs.sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)).take(k)

  test("heap keeps exactly the top-k under (key desc, id asc), any insert order") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 50) {
      val n = rnd.nextInt(40)
      val k = 1 + rnd.nextInt(8)
      // small key domain forces ties; extremes exercise overflow safety
      val pairs = Seq.tabulate(n)(i =>
        (rnd.nextInt(5).toLong, rnd.nextLong())) ++
        (if (trial == 0) Seq((Long.MinValue, 1L), (Long.MaxValue, 2L)) else Nil)
      val h = new TopKHeap(k)
      pairs.foreach { case (kk, ii) => h.insert(kk, ii) }
      assert(h.sortedPairs.toSeq == bruteTopK(pairs, k),
        s"trial $trial: k=$k pairs=$pairs")
    }
  }

  test("aggregate serialize/deserialize round-trips the heap; merge equals union") {
    val lit0 = org.apache.spark.sql.catalyst.expressions.Literal(0L)
    val agg = TopKByKey(lit0, lit0, k = 4)
    val a = new TopKHeap(4)
    Seq((5L, 1L), (3L, 2L), (5L, 0L)).foreach { case (kk, ii) => a.insert(kk, ii) }
    val b = agg.deserialize(agg.serialize(a))
    assert(b.sortedPairs.toSeq == a.sortedPairs.toSeq)
    val c = new TopKHeap(4)
    Seq((9L, 9L), (5L, 7L), (1L, 1L)).foreach { case (kk, ii) => c.insert(kk, ii) }
    val merged = agg.merge(b, c)
    assert(merged.sortedPairs.toSeq ==
      bruteTopK(Seq((5L, 1L), (3L, 2L), (5L, 0L), (9L, 9L), (5L, 7L), (1L, 1L)), 4))
  }

  test("topKByGroup equals the window formulation; null keys skipped; small groups whole") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(500)(i =>
      (s"g${i % 7}", if (i % 41 == 0) null else Long.box(rnd.nextInt(20).toLong),
        i.toLong)) :+ (("tiny", Long.box(1L), 9999L))
    val df = rows.toDF("g", "key", "id")
    val got = TopK.topKByGroup(df, $"g", $"key", $"id", k = 3)
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val w = Window.partitionBy($"g").orderBy($"key".desc, $"id")
    val expect = df.filter($"key".isNotNull)
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"g", $"rank".cast("long"), $"key", $"id")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == expect)
    // the 1-row group surfaces whole (k larger than the group)
    assert(got.count(_._1 == "tiny") == 1)
  }

  test("sortable double bits: signed-long order == Double.compare; exact involution") {
    import graft.functions.{DoubleFromSortableBits, SortableDoubleBits}
    val lit0 = org.apache.spark.sql.catalyst.expressions.Literal(0.0)
    val fwd = SortableDoubleBits(lit0)
    val inv = DoubleFromSortableBits(org.apache.spark.sql.catalyst.expressions.Literal(0L))
    val rnd = new scala.util.Random(3)
    val specials = Seq(0.0, -0.0, Double.MinPositiveValue, -Double.MinPositiveValue,
      Double.MaxValue, Double.MinValue, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.0, -1.0, 1e-300, -1e-300)
    val samples = specials ++ Seq.fill(500)(
      java.lang.Double.longBitsToDouble(rnd.nextLong())).filterNot(_.isNaN)
    for (a <- samples; b <- samples.take(20)) {
      assert(java.lang.Long.compare(fwd.compute(a), fwd.compute(b)).signum ==
        java.lang.Double.compare(a, b).signum, s"order mismatch: $a vs $b")
    }
    for (a <- samples) {
      val back = inv.compute(fwd.compute(a))
      assert(java.lang.Double.doubleToLongBits(back) ==
        java.lang.Double.doubleToLongBits(a), s"roundtrip: $a")
    }
  }

  test("topKByGroupDouble: desc and asc match window ranking on doubles") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.tabulate(300)(i =>
      (s"g${i % 5}", rnd.nextInt(10) * 0.125 - 0.5, i.toLong))
    val df = rows.toDF("g", "key", "id")
    def windowed(desc: Boolean) = {
      val w = Window.partitionBy($"g")
        .orderBy(if (desc) $"key".desc else $"key".asc, $"id")
      df.withColumn("rank", row_number().over(w)).filter($"rank" <= 4)
        .select($"g", $"rank".cast("long"), $"key", $"id")
        .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    }
    val gotDesc = TopK.topKByGroupDouble(df, $"g", $"key", $"id", k = 4)
      .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(gotDesc == windowed(desc = true))
    val gotAsc = TopK.topKByGroupDouble(df, $"g", $"key", $"id", k = 4, ascending = true)
      .as[(String, Long, Double, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(gotAsc == windowed(desc = false))
  }

  test("topKRowsByGroup: whole rows back via a broadcast of the picked ids") {
    val df = (0 until 200).map(i => (s"g${i % 4}", (i % 13).toLong, i.toLong, s"payload$i"))
      .toDF("g", "key", "id", "extra")
    val got = TopK.topKRowsByGroup(df, $"g", $"key", $"id", k = 2)
    val rows = got.select($"g", $"rank", $"key", $"id", $"extra")
      .as[(String, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    val w = Window.partitionBy($"g").orderBy($"key".desc, $"id")
    val expect = df.withColumn("rank", row_number().over(w)).filter($"rank" <= 2)
      .select($"g", $"rank".cast("long"), $"key", $"id", $"extra")
      .as[(String, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(rows == expect)
    // the recovery join broadcasts the k-sized side
    assert(got.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("plan: hash aggregation with map-side partials, no Window, no full sort") {
    val df = (0 until 100).map(i => (s"g${i % 3}", i.toLong, i.toLong))
      .toDF("g", "key", "id")
    val plan = TopK.topKByGroup(df, $"g", $"key", $"id", k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    // partial + final: the aggregate appears on both sides of the shuffle
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  override def afterAll(): Unit = spark.stop()
}

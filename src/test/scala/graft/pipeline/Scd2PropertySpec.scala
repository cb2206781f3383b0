package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scd2

/** Property coverage for the SCD-2 fold: the Spark window formulation
  * equals a direct reference implementation on random change logs
  * (instant collisions, attribute runs, many keys), and a random
  * in-order split merged incrementally equals the one-shot fold. */
class Scd2PropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-scd2-props")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** (key, time, attr, seq) observation. */
  type Obs = (Long, Long, String, Long)

  /** Reference fold straight from the definition: per key, collapse
    * same-instant rows to the max-seq winner, drop attribute repeats,
    * close intervals, number versions. */
  private def refScd2(log: Seq[Obs]): Set[(Long, String, Long, Option[Long], Int, Boolean)] =
    log.groupBy(_._1).flatMap { case (k, rows) =>
      val visible = rows.groupBy(_._2).toSeq
        .map { case (t, rs) => (t, rs.maxBy(_._4)._3) }
        .sortBy(_._1)
      val opens = visible.foldLeft(Vector.empty[(Long, String)]) {
        case (acc, (t, a)) =>
          if (acc.nonEmpty && acc.last._2 == a) acc else acc :+ ((t, a))
      }
      opens.zipWithIndex.map { case ((t, a), i) =>
        val vt = if (i + 1 < opens.length) Some(opens(i + 1)._1) else None
        (k, a, t, vt, i + 1, vt.isEmpty)
      }
    }.toSet

  private def toDf(log: Seq[Obs]): DataFrame =
    log.map { case (k, t, a, q) => (k, new Timestamp(t * 1000L), a, q) }
      .toDF("k", "t", "attr", "seq")

  private def run(df: DataFrame): Set[(Long, String, Long, Option[Long], Int, Boolean)] =
    Scd2.fromChangeLog(df, "k", "t", Seq("attr"), tieBreaks = Seq("seq"))
      .select($"k", $"attr",
        (org.apache.spark.sql.functions.unix_millis($"valid_from") / 1000L).cast("long"),
        (org.apache.spark.sql.functions.unix_millis($"valid_to") / 1000L).cast("long"),
        $"version", $"is_current")
      .as[(Long, String, Long, Option[Long], Int, Boolean)]
      .collect().toSet

  private val genLog: Gen[List[Obs]] = {
    val obs = for {
      k <- Gen.choose(1L, 4L)
      t <- Gen.choose(1L, 15L)
      a <- Gen.oneOf("a", "b", "c")
    } yield (k, t, a)
    Gen.listOfN(25, obs).map(_.zipWithIndex.map {
      case ((k, t, a), i) => (k, t, a, i.toLong)
    })
  }

  private def check(name: String, prop: Prop, n: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name failed: ${res.status}")
  }

  test("fromChangeLog == reference fold on random logs") {
    check("fold-equivalence", Prop.forAll(genLog) { log =>
      log.isEmpty || run(toDf(log)) == refScd2(log)
    }, n = 15)
  }

  test("random in-order split, merged incrementally == one-shot fold") {
    val gen = for {
      log <- genLog.suchThat(_.nonEmpty)
      cut <- Gen.choose(2L, 14L)
    } yield (log, cut)
    check("split-merge", Prop.forAll(gen) { case (log, cut) =>
      val b0 = log.filter(_._2 < cut)
      val b1 = log.filter(_._2 >= cut)
      b0.isEmpty || b1.isEmpty || {
        val d = java.nio.file.Files.createTempDirectory("graft-scd2p").toFile
        d.deleteOnExit()
        val dir = s"${d.getAbsolutePath}/t"
        Scd2.writeHistory(spark, toDf(b0), "k", "t", Seq("attr"), dir,
          numBuckets = 4, tieBreaks = Seq("seq"))
        Scd2.mergeChanges(spark, dir, toDf(b1), "k", "t", Seq("attr"),
          numBuckets = 4, tieBreaks = Seq("seq"))
        val got = Scd2.readHistory(spark, dir)
          .select($"k", $"attr",
            (org.apache.spark.sql.functions.unix_millis($"valid_from") / 1000L).cast("long"),
            (org.apache.spark.sql.functions.unix_millis($"valid_to") / 1000L).cast("long"),
            $"version", $"is_current")
          .as[(Long, String, Long, Option[Long], Int, Boolean)]
          .collect().toSet
        got == refScd2(log)
      }
    }, n = 6)
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ingest

/** JSON ingest with quarantine routing. */
class IngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ingest-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val schema = new StructType()
    .add("k", IntegerType).add("name", StringType)

  private val rows = Seq(
    (1L, """{"k": 7, "name": "ok"}"""),     // good
    (2L, """{"k": 8}"""),                   // good, missing field -> null
    (3L, """{"k": 9, "name":"""),           // malformed -> quarantine
    (4L, null.asInstanceOf[String]),        // null payload -> quarantine
    (5L, """not json at all""")             // malformed -> quarantine
  ).toDF("id", "payload")

  test("tagged: parse + route flags + raw evidence in one projection") {
    val t = Ingest.parseJsonTagged(rows, $"payload", schema)
      .select($"id", $"k", $"name", $"quarantined", $"raw")
      .as[(Long, Option[Int], Option[String], Boolean, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(t == Seq(
      (1L, Some(7), Some("ok"), false, None),
      (2L, Some(8), None, false, None),
      (3L, None, None, true, Some("""{"k": 9, "name":""")),
      (4L, None, None, true, None),
      (5L, None, None, true, Some("not json at all"))))
  }

  test("routed pair: good parsed, quarantine keeps raw payload") {
    val r = Ingest.parseJson(rows, $"payload", schema)
    assert(r.good.select($"id").as[Long].collect().toSet == Set(1L, 2L))
    assert(r.good.columns.toSeq == Seq("id", "payload", "k", "name"))
    val q = r.quarantine.select($"id", $"raw")
      .as[(Long, Option[String])].collect().toMap
    assert(q.keySet == Set(3L, 4L, 5L))
    assert(q(5L) == Some("not json at all"))
  }

  test("single from_json pass, no shuffle (map-side projection)") {
    val plan = Ingest.parseJsonTagged(rows, $"payload", schema)
      .queryExecution.executedPlan.toString
    assert("from_json".r.findAllIn(plan).length <= schema.size + 2,
      s"plan should carry one parse projection:\n$plan")
    assert(!plan.contains("Exchange"), s"no shuffle expected:\n$plan")
  }

  test("csv twin: type failures and short rows quarantine") {
    val schema2 = new StructType()
      .add("k", IntegerType).add("name", StringType)
    val csvRows = Seq(
      (1L, "7,ok"),       // good
      (2L, "8"),          // short row = structural damage -> quarantined
      (3L, "xx,bad"),     // k fails INT -> quarantined
      (4L, null.asInstanceOf[String])
    ).toDF("id", "line")
    val t = Ingest.parseCsvTagged(csvRows, $"line", schema2)
      .select($"id", $"k", $"name", $"quarantined", $"raw")
      .as[(Long, Option[Int], Option[String], Boolean, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(t == Seq(
      (1L, Some(7), Some("ok"), false, None),
      (2L, Some(8), None, true, Some("8")),
      (3L, None, Some("bad"), true, Some("xx,bad")),
      (4L, None, None, true, None)))
  }

  test("file front door: lines land routed by partition, prunable reads") {
    val in = java.nio.file.Files.createTempDirectory("graft-ingest-in")
    val out = java.nio.file.Files.createTempDirectory("graft-ingest-out")
      .resolve("tbl").toString
    java.nio.file.Files.write(in.resolve("a.jsonl"),
      java.util.Arrays.asList(
        """{"k": 1, "name": "x"}""", "", """{"k": 2}""", "broken {"))
    java.nio.file.Files.write(in.resolve("b.jsonl"),
      java.util.Arrays.asList("""{"k": 3, "name": "z"}""", "also broken"))
    val stats = Ingest.ingestJsonFiles(spark, s"$in/*.jsonl", schema, out)
    assert(stats == Ingest.IngestStats(good = 3, quarantined = 2))
    val good = Ingest.readIngested(spark, out).filter(!col("quarantined"))
    assert(good.select($"k").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    val quarantine = Ingest.readIngested(spark, out).filter(col("quarantined"))
      .select($"raw").as[String].collect().toSet
    assert(quarantine == Set("broken {", "also broken"))
    // the good read prunes to its partition directory
    val scanned = good.queryExecution.executedPlan.toString
    assert(!scanned.contains("quarantined=true"))
    // rerun converges (overwrite batch)
    assert(Ingest.ingestJsonFiles(spark, s"$in/*.jsonl", schema, out) == stats)
  }

  test("reserved field name rejected") {
    val bad = new StructType().add("_graft_corrupt", StringType)
    intercept[IllegalArgumentException] {
      Ingest.parseJsonTagged(rows, $"payload", bad)
    }
  }

  test("output-clashing names rejected: schema 'raw'/'quarantined', input 'quarantined'") {
    // a schema field named like a tag column would duplicate it in the output
    intercept[IllegalArgumentException] {
      Ingest.parseJsonTagged(rows, $"payload",
        new StructType().add("raw", StringType))
    }
    intercept[IllegalArgumentException] {
      Ingest.parseCsvTagged(rows, $"payload",
        new StructType().add("quarantined", StringType))
    }
    // re-ingesting previously tagged data: the INPUT carries the clash
    val tagged = rows.withColumn("quarantined", lit(false))
    intercept[IllegalArgumentException] {
      Ingest.parseJsonTagged(tagged, $"payload",
        new StructType().add("k", StringType))
    }
  }

  override def afterAll(): Unit = {
    spark.stop()
    super.afterAll()
  }
}

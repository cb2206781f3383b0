package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the events table.
  *
  * The reference is batch-only (SURVEY.md §1.1: "no streams"), but a
  * complete training-data engine needs the streaming shapes: windowed
  * aggregation with watermarks, and gap-based sessionization. Both are
  * expressed so the streaming and batch plans share semantics — the
  * streaming run (file source → memory sink, processAllAvailable) must
  * reproduce the batch/DuckDB answer exactly on a static input.
  */
object Streaming {

  private val counter = new AtomicInteger(0)

  /** events.parquet with TIMESTAMP(NANOS) read as micros — streaming twin
    * of SparkEntry.eventsTbl. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream
      .schema(schema)
      .parquet(s"$dir/events.parque[t]") // glob: file source accepts globs, not bare files
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Hourly tumbling-window aggregation as a real streaming query:
    * watermarked event time, complete-mode memory sink, drained with
    * processAllAvailable so a static parquet input yields the exact batch
    * answer. Returns the materialized result. */
  def hourlyEventCounts(spark: SparkSession, dir: String): DataFrame = {
    val name = s"graft_stream_${counter.incrementAndGet()}"
    val agg = eventsStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("event_type"), col("n"), col("total_value"))
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).orderBy(col("win_start"), col("event_type"))
  }

  /** Gap-based sessionization, batch formulation: a new session starts
    * after `gapMinutes` of inactivity per user. Declarative window
    * functions (lag → gap flag → running sum) so Catalyst plans one
    * shuffle on user_id; the same semantics stream via
    * flatMapGroupsWithState in [[graft.streaming.StatefulSessionize]]. */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull, 1)
          // microsecond precision (unix_timestamp truncates to seconds and
          // could disagree with StatefulSessionize's millis near the gap)
          .when(unix_micros(col("ts")) - unix_micros(col("__prev_ts")) >
            gapMinutes * 60L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("__new_session")).over(byUser))
      .drop("__prev_ts", "__new_session")
  }

  /** Per-user session stats from [[sessionize]]. */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("session_value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"),
        round(sum(col("session_value")), 4).as("total_value"))
}

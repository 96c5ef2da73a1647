package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Structured-Streaming wiring for the reference's queue-driven physical
  * layer (SURVEY §2.3): SQS micro-batch windows → processing-time
  * triggers (B6, queue_stack.py:31-38), at-least-once redelivery →
  * watermarked dropDuplicates (A10's idempotence over streams), tumbling
  * windows over event time for time-density rollups, and a dead-letter
  * side output (B7).
  */
object EventStream {

  /** File-based event stream over a directory of parquet event batches —
    * the engine's stand-in for the reference's SQS queue-table exchange
    * (B8): producers drop batches into the directory, the stream drains
    * them per trigger. */
  def readEvents(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 10): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger) // SQS batch_size=10
      .parquet(dir)
  }

  /** Watermarked exactly-once-per-id view of an at-least-once stream
    * (redelivered messages dropped within the watermark horizon). */
  def dedup(events: DataFrame, idCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicates(Seq(idCol, tsCol))

  /** Stream-stream interval join: left rows enriched with right rows of
    * the same key whose event time falls within `within` BEFORE the left
    * event. Both sides carry watermarks and the join condition bounds
    * the event-time skew — the two requirements that let Spark expire
    * buffered join state instead of holding both streams forever. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, within: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r, org.apache.spark.sql.functions.expr(
      s"l.$key = r.$key AND r.$rightTs BETWEEN l.$leftTs - INTERVAL $within AND l.$leftTs"))
  }

  /** Tumbling-window per-type aggregation (the time-density rollup of
    * SURVEY §2.4's streaming row). Pass `watermark = None` when the
    * upstream already set one (Spark disallows redefining it). */
  def tumblingCounts(events: DataFrame, tsCol: String, width: String = "1 hour",
      watermark: Option[String] = Some("10 minutes")): DataFrame =
    watermark.fold(events)(w => events.withWatermark(tsCol, w))
      .groupBy(window(col(tsCol), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Gap-based session aggregation over the stream — Spark's native
    * `session_window` (same semantics as the batch q30 sessionization:
    * a session closes after `gap` of inactivity). */
  def sessionCounts(events: DataFrame, tsCol: String, gap: String = "30 minutes",
      watermark: Option[String] = Some("2 hours")): DataFrame =
    watermark.fold(events)(w => events.withWatermark(tsCol, w))
      .groupBy(session_window(col(tsCol), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Per-key custom state via flatMapGroupsWithState: tracks each user's
    * running event count and total value across micro-batches and emits
    * an updated snapshot per batch — the arbitrary-state form of the
    * reference's bounded-redelivery bookkeeping (B7's receive counts,
    * queue_stack.py:25-29, generalized to any per-key accumulator).
    */
  final case class UserState(n_events: Long, total_value: Double)
  final case class UserSnapshot(user_id: Long, n_events: Long, total_value: Double)

  def statefulUserTotals(events: DataFrame): org.apache.spark.sql.Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[UserState, UserSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { case (_, v) => n += 1; tot += v }
          val next = UserState(n, tot)
          state.update(next)
          Iterator(UserSnapshot(user, next.n_events, next.total_value))
      }
  }

  /** Split a micro-batch into (good, dead-letter) — the per-record
    * partial-batch failure handling of B6/B7
    * (`report_batch_item_failures`, queue_stack.py:37). */
  def dlqSplit(batch: DataFrame, isBad: org.apache.spark.sql.Column): (DataFrame, DataFrame) =
    (batch.filter(!isBad), batch.filter(isBad))

  /** Drive a streaming DataFrame into a memory sink until all available
    * input is consumed; returns the query (caller stops it). Test/smoke
    * harness for local verification. */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    q
  }
}

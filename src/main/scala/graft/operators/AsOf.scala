package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (nearest-previous-event) join — the time-series operator Spark
  * has no built-in for. For every left row: the latest right row with
  * `rightTime <= leftTime` in the same key group.
  *
  * Implemented as ONE key-partitioned window over the UNION of both
  * sides, not as a join: right rows sort before left rows at equal
  * timestamps (inclusive match semantics), and `last(payload,
  * ignoreNulls)` carries the most recent right payload forward onto each
  * left row. The only shuffle is the single partition-by-key exchange —
  * any join formulation would need that same exchange PLUS a per-key
  * sort PLUS a join; this is the formulation that survives 100 TB, and
  * it never materializes the (left × candidate-rights) intermediate a
  * range join would.
  *
  * Contract: the right side must be unique per (key, rightTime) —
  * pre-aggregate duplicates, otherwise which payload wins is
  * nondeterministic. Output = all left columns plus each right payload
  * column prefixed `asof_` (null when no right row precedes).
  */
object AsOf {

  /** @param maxStale optional staleness bound (same units as the
    *   numeric time columns): a right row older than `leftTime -
    *   maxStale` does not match — the "quote too old, treat as missing"
    *   rule of financial as-of joins. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      maxStale: Option[Long] = None): DataFrame = {
    val payloadCols = right.columns.filterNot(_ == key).toSeq
    // carry the right row as one struct; its fields come out asof_-prefixed
    val rPayload = struct(payloadCols.map(c => col(c).as(s"asof_$c")): _*)
    val r = right.select(col(key), col(rightTime).as("__t"),
      lit(0).as("__side"), rPayload.as("__p"))
    val lRow = struct(left.columns.toSeq.map(col): _*)
    val l0 = left.select(col(key), col(leftTime).as("__t"),
      lit(1).as("__side"), lRow.as("__l"))
    // align schemas for the union via typed null struct columns
    val rT = r.schema("__p").dataType
    val lT = l0.schema("__l").dataType
    val unioned = r.withColumn("__l", lit(null).cast(lT))
      .unionByName(l0.withColumn("__p", lit(null).cast(rT)))
    // at equal __t the right row (side 0) precedes the left row → inclusive
    val w = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
    val bounded = maxStale.fold(matched)(ms => matched.withColumn("__match",
      when(col(s"__match.asof_$rightTime") >= col("__t") - ms, col("__match"))))
    bounded
      .filter(col("__side") === 1)
      .select(col("__l.*") +: payloadCols.map(c =>
        col(s"__match.asof_$c").as(s"asof_$c")): _*)
  }

  type Q = (SparkSession, String) => DataFrame

  val defs: Seq[(String, Q, Option[String])] = Seq(

    // for every click, the most recent prior error by the same user —
    // the canonical "state at event time" lookup. Times compare (and
    // output) as epoch micros so both engines hash identically.
    ("q42_asof_join", (s: SparkSession, d: String) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"))
      val errors = ev.filter(col("event_type") === "error")
        .groupBy(col("user_id"), unix_micros(col("ts")).as("t"))
        .agg(max(col("event_id")).as("err_event_id")) // unique per (key, t)
      asofJoin(clicks, errors, "user_id", "t", "t")
        .select(col("event_id"), col("user_id"), col("t").as("click_us"),
          col("asof_t").as("err_us"), col("asof_err_event_id").as("err_event_id"))
        .orderBy(col("event_id"))
    },
    Some("""WITH clicks AS (
        SELECT event_id, user_id, epoch_us(ts) AS t FROM events
        WHERE event_type = 'click'),
      errors AS (
        SELECT user_id, epoch_us(ts) AS t, max(event_id) AS err_event_id
        FROM events WHERE event_type = 'error' GROUP BY user_id, epoch_us(ts))
      SELECT c.event_id, c.user_id, c.t AS click_us,
        e.t AS err_us, e.err_event_id
      FROM clicks c
      LEFT JOIN errors e ON e.user_id = c.user_id AND e.t = (
        SELECT max(t) FROM errors e2
        WHERE e2.user_id = c.user_id AND e2.t <= c.t)
      ORDER BY event_id""")),

    // trailing one-hour sum per user — a RANGE (value-based) window
    // frame over epoch-micros ordering; ties all enter the frame, so the
    // result is order-independent. The sum is exact in DECIMAL (so float
    // addition order can't change the value) and only the FINAL result is
    // cast to DOUBLE — a raw decimal output string-hashes differently
    // between engines (oracle-parity discipline, q04/q33 convention)
    ("q43_range_frame", (s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val hourUs = 3600L * 1000000L
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("t"))
        .rangeBetween(-hourUs, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("t"),
          col("value").cast("decimal(18,2)").as("v"))
        .withColumn("trailing_1h_sum",
          sum(col("v")).over(w).cast("double"))
        .select(col("event_id"), col("user_id"), col("t"), col("trailing_1h_sum"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id, epoch_us(ts) AS t,
        CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
          PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        AS DOUBLE) AS trailing_1h_sum
      FROM events ORDER BY event_id"""))
  )
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-window operators (SURVEY.md §2.10). The window()/session_window()
  * expressions are identical in batch and Structured Streaming; here they
  * run in batch form over the static events table (oracle-checkable), and
  * `graft.streaming.StreamOps` reuses the same builders on streaming
  * DataFrames with watermarks (tested via MemoryStream in StreamingSuite —
  * DuckDB cannot run a micro-batch pipeline, SURVEY §2.10).
  */
object Streaming {

  /** T1: tumbling 1-hour windows per event_type (shared batch/stream shape). */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           Det.dsum(col("value"), 4).as("sum_value"))
      .select(col("window.start").as("wstart"), col("window.end").as("wend"),
              col("event_type"), col("n"), col("sum_value"))

  /** T2: sliding 1-hour windows every 15 minutes. */
  def slidingWindows(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("wstart"), col("user_id"), col("n"))

  /** T3: session windows (30-minute gap) per user. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           Det.dsum(col("value"), 4).as("session_value"))
      .select(col("session_window.start").as("session_start"),
              col("user_id"), col("n_events"), col("session_value"))

  val queries: Map[String, Q] = Map(
    "t1_tumbling_batch" -> ((s, d) => tumblingHourly(Tables.events(s, d))),
    "t2_sliding_batch" -> ((s, d) => slidingWindows(Tables.events(s, d))),
    "t3_session_batch" -> ((s, d) => sessionWindows(Tables.events(s, d)))
  )

  private val evCte =
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)"

  val oracle: Map[String, String] = Map(
    "t1_tumbling_batch" ->
      s"""WITH $evCte
         |SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart,
         |  time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS wend,
         |  event_type, COUNT(*) AS n,
         |  ${Det.Sql.dsum("value", 4)} AS sum_value
         |FROM ev GROUP BY 1, 2, 3""".stripMargin,

    // Every event belongs to exactly 4 sliding windows (60/15): starts at
    // floor15(ts) - i*15min, i ∈ 0..3.
    "t2_sliding_batch" ->
      s"""WITH $evCte
         |SELECT time_bucket(INTERVAL '15 minutes', ts) - i * INTERVAL 15 MINUTE AS wstart,
         |  user_id, COUNT(*) AS n
         |FROM ev, range(0, 4) t(i)
         |GROUP BY 1, 2""".stripMargin,

    // Gaps-and-islands: new session when gap >= 30 min (session_window
    // keeps an event only while ts < prev_end = prev_ts + gap).
    "t3_session_batch" ->
      s"""WITH $evCte,
         |flagged AS (
         |  SELECT user_id, ts, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
         |         THEN 1 ELSE 0 END AS new_s
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, ts, value,
         |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
         |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flagged)
         |SELECT min(ts) AS session_start, user_id,
         |  COUNT(*) AS n_events,
         |  ${Det.Sql.dsum("value", 4)} AS session_value
         |FROM sess GROUP BY user_id, sid""".stripMargin
  )
}

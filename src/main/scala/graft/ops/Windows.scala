package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Window functions (SURVEY.md §2.5): ranking, lag/lead, running frames,
  * range frames, first/last over frames. All windows shuffle once on the
  * partition key and sort within partitions — at 100 TB that is one
  * exchange per distinct (partitionBy, orderBy) pair, and Catalyst
  * collapses windows sharing a spec into a single WindowExec.
  *
  * Determinism rule (SURVEY §7.3): every orderBy carries a unique tie-break
  * (event_id / o_orderkey), so rank/lag/frames agree with the oracle.
  */
object Windows {

  // events with µs timestamps on the Spark side (parquet ns is truncated on
  // read); oracle CTE casts identically — see the `ev` CTE in each SQL.
  private val evSql =
    "SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events"

  val queries: Map[String, Q] = Map(

    // W1: ranking family over one shared window spec.
    "w1_ranking" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"))
    }),

    // W2: lag/lead — inter-event gaps per user (sessionization primitive).
    "w2_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(
        col("event_id"), col("user_id"), col("ts"),
        lag(col("ts"), 1).over(w).as("prev_ts"),
        lead(col("event_id"), 1, -1L).over(w).as("next_event"),
        (col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
          .as("gap_sec"))
    }),

    // W7: BATCH gap-sessionization — the exact batch twin of
    // streaming/StreamOps.sessionize (same 30-min gap, same summary
    // schema; the batch≡streaming law lives in StreamingSuite). Three
    // chained steps over ONE (user_id) exchange: lag() marks session
    // starts (gap > 30 min or first event), a running sum numbers the
    // sessions, and a per-(user, session) hash-agg rolls up the summary
    // — sessionization with no self-join and no state store, the shape
    // that survives 100 TB of events. total_value is a float reduction
    // → Det decimal detour (§7.3).
    "w7_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val gapSec = 30 * 60
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          (col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > gapSec)
            .cast("int"))
        .withColumn("sess_no", sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_no"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"),
          (max(col("ts")).cast("long") - min(col("ts")).cast("long"))
            .as("duration_sec"),
          Det.dsum(col("value")).as("total_value"))
    }),

    // W7b: the NATIVE session-window operator — Spark's built-in
    // `session_window(ts, gap)` groupBy form of w7's hand-rolled
    // lag/cumsum sessionization (and the exact batch twin of the T3
    // streaming session window). Semantics note pinned by the law test:
    // session_window's window END is last_ts + gap (the expiry instant),
    // not last_ts — so duration and bounds derive from first_ts/last_ts
    // aggregates, and the window struct itself is dropped from the
    // output (its end would differ from w7's last_ts by the constant
    // gap). Same scale shape as any hash-agg: partial session merge
    // map-side, one (user) exchange.
    "w7b_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"),
          Det.dsum(col("value")).as("total_value"))
        .drop("session_window")
    }),

    // W8: ordered-stage funnel (view → click-after-view →
    // purchase-after-click) WITHOUT self-joins: each stage's first
    // qualifying timestamp is a conditional MIN over the user partition
    // that references the previous stage's column, so the three Window
    // operators chain over a SINGLE (user_id) exchange — the classic
    // funnel query shape that replaces the 3-way self-join (which at
    // 100 TB of events is three shuffles and a skew bomb). Strict `>`
    // = "strictly after"; value comparisons, not row order, so ties are
    // engine-agnostic.
    "w8_funnel" -> ((s, d) => {
      val wu = Window.partitionBy("user_id")
      Tables.events(s, d)
        .withColumn("fv",
          min(when(col("event_type") === "view", col("ts"))).over(wu))
        .withColumn("fc",
          min(when(col("event_type") === "click" && col("ts") > col("fv"),
            col("ts"))).over(wu))
        .withColumn("fp",
          min(when(col("event_type") === "purchase" && col("ts") > col("fc"),
            col("ts"))).over(wu))
        .groupBy(col("user_id"))
        .agg(max(col("fv")).as("first_view"),
          max(col("fc")).as("first_click"),
          max(col("fp")).as("first_purchase"))
        .withColumn("stage",
          when(col("first_purchase").isNotNull, "purchase")
            .when(col("first_click").isNotNull, "click")
            .when(col("first_view").isNotNull, "view")
            .otherwise("none"))
    }),

    // W9: TIME-WEIGHTED average — the metric-correct mean for irregular
    // samples (a step function: each reading holds until the next one),
    // where the plain AVG over-weights bursts. Per user: weight = µs
    // until the next event (lead over the one (user_id) exchange every
    // other per-user window shares), TWA = Σ value·dur / Σ dur; the
    // last event carries no weight (observation window is closed by the
    // final reading). All duration arithmetic in exact µs integers
    // (unix_micros/epoch_us — the j8b convention; second-truncated
    // casts would alias distinct events); the value·dur float product
    // takes the §7.3 decimal detour so partial-agg order can't wiggle
    // the sum. Single-event users have zero observed span → NULL TWA
    // (NULLIF guard on both engines — Spark nulls a zero divisor,
    // DuckDB says inf; the guard makes the disagreement unreachable).
    "w9_time_weighted" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        .withColumn("dur_us",
          lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            .as("span_us"),
          round(
            sum(round(col("value") * col("dur_us"), 4)
                .cast(org.apache.spark.sql.types.DecimalType(28, 4)))
              .cast("double") /
            nullif(sum(col("dur_us")), lit(0L)), 6).as("twa_value"),
          round(Det.davg(col("value")), 6).as("naive_avg"))
    }),

    // W10: RESAMPLING to a regular grid — w6 fills gaps at the
    // IRREGULAR observation times; downstream consumers (charts,
    // feature windows, joins against other regular series) want a
    // FIXED cadence. Per user: an hourly grid spanning [trunc(first),
    // trunc(last)] (sequence + explode — per-user bounded, never a
    // global calendar cross-join), then the j8 union-tag idiom: grid
    // rows (kind 1, null value) union event rows (kind 0), ONE (user)
    // window ordered (ts, kind) — an event exactly ON a grid instant
    // sorts before it, so the grid point reads it (at-or-before
    // semantics) — and last(value IGNORE NULLS) carries the step
    // function onto the grid; grid points before a user's first event
    // stay NULL on both engines. Same single-exchange shape as every
    // per-user window; grid volume = span-hours × users, independent
    // of event count.
    "w10_resample" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val grid = ev.groupBy("user_id")
        .agg(date_trunc("hour", min(col("ts"))).as("g0"),
          date_trunc("hour", max(col("ts"))).as("g1"))
        .select(col("user_id"),
          explode(sequence(col("g0"), col("g1"),
            expr("INTERVAL 1 HOUR"))).as("ts"))
        .select(col("user_id"), col("ts"), lit(1).as("kind"),
          lit(-1L).as("event_id"), lit(null).cast("double").as("value"))
      // (ts, kind, event_id): kind separates grid from events on an
      // exact-hit instant; event_id pins the order of same-µs events so
      // the carried value is engine-deterministic (§7.3 tie-break rule)
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("kind"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(col("user_id"), col("ts"), lit(0).as("kind"),
          col("event_id"), col("value"))
        .unionByName(grid)
        .withColumn("filled",
          last(col("value"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("user_id"), col("ts").as("grid_ts"), col("filled"))
    }),

    // W6: IGNORE NULLS navigation — last-observation-carried-forward, the
    // gap-filling idiom for sparse sensor/metric streams: zeros are
    // nulled out, then the running last non-null value fills forward.
    "w6_ignore_nulls" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        nullif(col("value"), lit(0.0)).as("v_or_null"),
        last(nullif(col("value"), lit(0.0)), ignoreNulls = true)
          .over(w).as("v_filled"))
    }),

    // W3: running aggregates over row frames (cumulative + trailing-3).
    "w3_running_frames" -> ((s, d) => {
      val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val trail = ord.rowsBetween(-2, Window.currentRow)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        sum(col("value").cast("decimal(28,4)")).over(cum).cast("double").as("run_sum"),
        count(lit(1)).over(cum).as("run_n"),
        max(col("value")).over(trail).as("max3"),
        min(col("value")).over(trail).as("min3"))
    }),

    // W4: RANGE frame over a numeric (epoch-seconds) order key — trailing
    // 1-hour window per user, value-based not row-based.
    "w4_range_frame" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_sec"))
        .rangeBetween(-3600L, 0L)
      Tables.events(s, d)
        .withColumn("ts_sec", col("ts").cast("long"))
        .select(
          col("event_id"), col("user_id"), col("ts_sec"),
          sum(col("value").cast("decimal(28,4)")).over(w).cast("double").as("hour_sum"),
          count(lit(1)).over(w).as("hour_n"))
    }),

    // W4b: RANGE frame with an INTERVAL bound directly on the timestamp
    // key — the time-series dialect of W4 (no epoch-seconds detour). The
    // Scala Window API only takes long offsets, so the frame is declared
    // through the SQL window syntax; same trailing-hour semantics,
    // inclusive on both ends, peers included (RANGE).
    "w4b_range_interval" -> ((s, d) => {
      val over = "OVER (PARTITION BY user_id ORDER BY ts " +
        "RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)"
      Tables.events(s, d).select(
        col("event_id"), col("user_id"), col("ts"),
        expr(s"CAST(SUM(CAST(value AS DECIMAL(28,4))) $over AS DOUBLE)")
          .as("hour_sum"),
        expr(s"COUNT(1) $over").as("hour_n"))
    }),

    // W5: first/last value over frames + nth via ordered aggregation.
    "w5_first_last" -> ((s, d) => {
      val ord = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        first_value(col("event_type")).over(ord).as("first_type"),
        last_value(col("event_type")).over(full).as("last_type"),
        nth_value(col("event_type"), 2).over(ord).as("second_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "w1_ranking" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  CAST(rank() OVER w AS INTEGER) AS rk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drk,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin,

    "w2_lag_lead" ->
      s"""WITH ev AS ($evSql)
         |SELECT event_id, user_id, ts,
         |  lag(ts, 1) OVER w AS prev_ts,
         |  lead(event_id, 1, -1) OVER w AS next_event,
         |  CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts, 1) OVER w)) AS BIGINT) AS gap_sec
         |FROM ev
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "w7_sessionize" ->
      s"""WITH ev AS ($evSql),
         |x AS (
         |  SELECT user_id, event_id, ts, value,
         |    lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS prev_ts
         |  FROM ev),
         |y AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL OR
         |      CAST(floor(epoch(ts)) AS BIGINT)
         |        - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
         |    THEN 1 ELSE 0 END AS new_sess
         |  FROM x),
         |z AS (
         |  SELECT *, CAST(SUM(new_sess) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS sess_no
         |  FROM y)
         |SELECT user_id, sess_no, COUNT(*) AS n_events,
         |  MIN(ts) AS first_ts, MAX(ts) AS last_ts,
         |  CAST(floor(epoch(MAX(ts))) AS BIGINT)
         |    - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS duration_sec,
         |  ${Det.Sql.dsum("value")} AS total_value
         |FROM z GROUP BY 1, 2""".stripMargin,

    "w7b_session_window" ->
      // DuckDB has no session_window: the twin re-derives it with the
      // w7 CTE chain at FULL µs precision and Spark's boundary rule —
      // a new session starts when the gap is STRICTLY greater than
      // 30 min (measured, pinned in OperatorSuite: an event AT exactly
      // last+gap still merges — the window end is inclusive — while
      // +1 µs splits; w7's hand-rolled form truncates to seconds first,
      // so it merges the +1 µs case too).
      s"""WITH ev AS ($evSql),
         |x AS (
         |  SELECT user_id, event_id, ts, value,
         |    lag(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      AS prev_ts
         |  FROM ev),
         |y AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL OR
         |      epoch_us(ts) - epoch_us(prev_ts) > 1800000000
         |    THEN 1 ELSE 0 END AS new_sess
         |  FROM x),
         |z AS (
         |  SELECT *, SUM(new_sess) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_no
         |  FROM y)
         |SELECT user_id, COUNT(*) AS n_events,
         |  MIN(ts) AS first_ts, MAX(ts) AS last_ts,
         |  ${Det.Sql.dsum("value")} AS total_value
         |FROM z GROUP BY user_id, sess_no""".stripMargin,

    "w8_funnel" ->
      s"""WITH ev AS ($evSql),
         |a AS (
         |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
         |    OVER (PARTITION BY user_id) AS fv
         |  FROM ev),
         |b AS (
         |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > fv
         |    THEN ts END) OVER (PARTITION BY user_id) AS fc
         |  FROM a),
         |c AS (
         |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > fc
         |    THEN ts END) OVER (PARTITION BY user_id) AS fp
         |  FROM b)
         |SELECT user_id, MAX(fv) AS first_view, MAX(fc) AS first_click,
         |  MAX(fp) AS first_purchase,
         |  CASE WHEN MAX(fp) IS NOT NULL THEN 'purchase'
         |       WHEN MAX(fc) IS NOT NULL THEN 'click'
         |       WHEN MAX(fv) IS NOT NULL THEN 'view'
         |       ELSE 'none' END AS stage
         |FROM c GROUP BY 1""".stripMargin,

    "w9_time_weighted" ->
      s"""WITH ev AS ($evSql),
         |d AS (
         |  SELECT user_id, value, epoch_us(ts) AS ts_us,
         |    lead(epoch_us(ts)) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id) - epoch_us(ts)
         |      AS dur_us
         |  FROM ev)
         |SELECT user_id, COUNT(*) AS n_events,
         |  MAX(ts_us) - MIN(ts_us) AS span_us,
         |  round(CAST(SUM(CAST(round(value * dur_us, 4) AS DECIMAL(28,4)))
         |      AS DOUBLE) / NULLIF(SUM(dur_us), 0), 6) AS twa_value,
         |  round(${Det.Sql.davg("value")}, 6) AS naive_avg
         |FROM d GROUP BY user_id""".stripMargin,

    "w10_resample" ->
      s"""WITH ev AS ($evSql),
         |grid AS (
         |  SELECT user_id,
         |    unnest(generate_series(date_trunc('hour', MIN(ts)),
         |      date_trunc('hour', MAX(ts)), INTERVAL '1 hour')) AS ts,
         |    1 AS kind, CAST(-1 AS BIGINT) AS event_id,
         |    CAST(NULL AS DOUBLE) AS value
         |  FROM ev GROUP BY user_id),
         |u AS (
         |  SELECT user_id, ts, 0 AS kind, event_id, value FROM ev
         |  UNION ALL SELECT user_id, ts, kind, event_id, value FROM grid),
         |f AS (
         |  SELECT user_id, ts, kind,
         |    last_value(value IGNORE NULLS) OVER (
         |      PARTITION BY user_id ORDER BY ts, kind, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         |  FROM u)
         |SELECT user_id, ts AS grid_ts, filled
         |FROM f WHERE kind = 1""".stripMargin,

    "w6_ignore_nulls" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events)
        |SELECT event_id, user_id,
        |  NULLIF(value, 0.0) AS v_or_null,
        |  last_value(NULLIF(value, 0.0) IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM ev""".stripMargin,

    "w3_running_frames" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events)
        |SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER cum AS DOUBLE) AS run_sum,
        |  COUNT(*) OVER cum AS run_n,
        |  MAX(value) OVER trail AS max3,
        |  MIN(value) OVER trail AS min3
        |FROM ev
        |WINDOW cum AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       trail AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    "w4_range_frame" ->
      """WITH ev AS (SELECT event_id, user_id, value,
        |              CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec
        |            FROM events)
        |SELECT event_id, user_id, ts_sec,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER w AS DOUBLE) AS hour_sum,
        |  COUNT(*) OVER w AS hour_n
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
        |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)""".stripMargin,

    "w4b_range_interval" ->
      """WITH ev AS (SELECT event_id, user_id, value,
        |              CAST(ts AS TIMESTAMP) AS ts
        |            FROM events)
        |SELECT event_id, user_id, ts,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER w AS DOUBLE) AS hour_sum,
        |  COUNT(*) OVER w AS hour_n
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""".stripMargin,

    "w5_first_last" ->
      s"""WITH ev AS ($evSql)
         |SELECT event_id, user_id,
         |  first_value(event_type) OVER ord AS first_type,
         |  last_value(event_type) OVER full_w AS last_type,
         |  nth_value(event_type, 2) OVER ord AS second_type
         |FROM ev
         |WINDOW ord AS (PARTITION BY user_id ORDER BY ts, event_id),
         |       full_w AS (PARTITION BY user_id ORDER BY ts, event_id
         |                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin
  )
}

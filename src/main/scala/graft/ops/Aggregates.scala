package graft.ops

import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.4): hash aggregate, distinct aggs,
  * stats, percentiles, min_by/max_by, collect, rollup/cube, pivot,
  * table fingerprint. Declarative groupBy/agg only — Catalyst plans
  * partial→final hash aggregation with map-side combine, which is the
  * scalable shape for a 100 TB fact table (the shuffle carries one row per
  * group per partition, not the data).
  *
  * Determinism: every double reduction goes through Det.dsum/davg (decimal
  * detour) so results are addition-order-insensitive and hash-match the
  * DuckDB oracle (SURVEY §7.3).
  */
object Aggregates {

  val queries: Map[String, Q] = Map(
    // A1/A3: TPC-H Q1 shape — the flagship. Filter is pushed to the parquet
    // scan; the agg is a two-phase HashAggregate on 6 groups.
    "a1_pricing_summary" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      l.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_base_price"),
          Det.dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")), 6)
            .as("sum_disc_price"),
          Det.dsum(col("l_extendedprice") * (lit(1d) - col("l_discount"))
            * (lit(1d) + col("l_tax")), 6).as("sum_charge"),
          Det.davg(col("l_quantity")).as("avg_qty"),
          Det.davg(col("l_extendedprice")).as("avg_price"),
          Det.davg(col("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // A2/A9: collect_list/collect_set → ObjectHashAggregate; array_sort for
    // cross-engine determinism (collect order is partition-order-dependent).
    // Arrays are serialized to CSV strings at the output boundary — the
    // comparator can't sort array cells (SURVEY §7.3 boundary rule).
    "a2_collect_sorted" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_totalprice") > 250000)
        .groupBy(col("o_orderpriority"))
        .agg(array_join(transform(array_sort(collect_list(col("o_orderkey"))),
               _.cast("string")), ",").as("keys"),
             array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
               .as("statuses"))
        .orderBy("o_orderpriority")),

    // A4: exact distinct aggregates (expand + two-phase plan).
    "a4_distinct_agg" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // A5: approx_count_distinct (HLL++) — the raw estimate differs from
    // DuckDB's HLL, so the SCORED output is engine-portable: the exact
    // distinct counts plus a tolerance verdict on each engine's own
    // estimate (rsd 0.02 ⇒ |est/exact − 1| < 0.06 ≈ 3σ; both engines
    // measured ≲2% off on this data). The HLL++ sketch still executes in
    // this plan; the raw estimate's rsd bound is pinned in OperatorSuite.
    "a5_approx_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
             countDistinct(col("l_partkey")).as("exact_parts"),
             approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
             approx_count_distinct(col("l_partkey"), 0.02).as("ap"))
        .select(col("exact_orders"), col("exact_parts"),
          (abs(col("ao") / col("exact_orders") - 1) < 0.06).as("approx_orders_ok"),
          (abs(col("ap") / col("exact_parts") - 1) < 0.06).as("approx_parts_ok"))),

    // A16: mergeable HLL sketches (Spark 4 DataSketches surface) — the
    // re-aggregation pattern 100 TB rollups live on: sketch once at the
    // fine grain (nation), then hll_union partial sketches upward
    // (region) WITHOUT rescanning the fact table. The sketch bytes have
    // no DuckDB twin, so the SCORED output is portable: the exact
    // per-region distinct (customers partition by nation, so the sum of
    // per-nation distincts IS the per-region distinct — same single agg
    // pass) plus a tolerance verdict on the unioned estimate (lgK=14 ⇒
    // rsd ≈ 0.8%; 5% bound). The oracle verdict uses DuckDB's own HLL
    // the same way. union ≡ direct-sketch law stays pinned in ScalaTest.
    "a16_hll_union" -> ((s, d) => {
      val perNation = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_regionkey", "n_name")
        .agg(expr("hll_sketch_agg(c_custkey, 14)").as("sk"),
             countDistinct(col("c_custkey")).as("nd"))
      perNation
        .groupBy("n_regionkey")
        .agg(expr("hll_union_agg(sk)").as("rsk"), count(lit(1)).as("n_nations"),
             sum(col("nd")).as("exact_customers"))
        .select(col("n_regionkey"), col("n_nations"), col("exact_customers"),
          (abs(expr("hll_sketch_estimate(rsk)") / col("exact_customers") - 1) < 0.05)
            .as("union_est_ok"))
        .orderBy("n_regionkey")
    }),

    // A18: ROLLING distinct (trailing-7-day active users) via mergeable
    // HLL sketches — the dashboard rollup at 100 TB: an exact trailing
    // distinct re-scans the raw (day, user) stream once per window
    // position, while per-day sketches give each day's answer from
    // |window| SKETCH MERGES — the fact table is scanned once, the
    // rolling join touches |days|×7 sketch rows. The exact twin joins
    // distinct (day, user) PAIRS over the range (pairs ≈ active-users ×
    // days — tiny vs events), which is also the oracle's form; the
    // sketch estimate ships as the a5/a16 tolerance verdict (sketch
    // bytes have no DuckDB twin).
    "a18_rolling_distinct" -> ((s, d) => {
      val du = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val perDay = du.groupBy("day")
        .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      val trail = perDay.select(col("day").as("bday"), col("sk"))
        .join(broadcast(perDay.select(col("day"))),
          col("bday").between(date_sub(col("day"), 6), col("day")))
        .groupBy("day")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est7"))
      val exact = du.select(col("day").as("bday"), col("user_id"))
        .join(broadcast(du.select(col("day")).distinct()),
          col("bday").between(date_sub(col("day"), 6), col("day")))
        .groupBy("day").agg(countDistinct(col("user_id")).as("d7_exact"))
      exact.join(trail, Seq("day"))
        // day ships as its ISO string: a DATE column round-trips as
        // datetime64 through the oracle's pandas bridge and mismatches
        .select(col("day").cast("string").as("day"), col("d7_exact"),
          (abs(col("est7") / col("d7_exact") - 1) < 0.05).as("est7_ok"))
        .orderBy("day")
    }),

    // A17: fixed-width histogram — the profiling rollup behind every
    // "distribution of X" dashboard; bucket arithmetic (floor of a
    // double division) is IEEE-identical in both engines, the top bucket
    // clamps the tail. Pure two-phase hash-agg on a computed key.
    "a17_histogram" -> ((s, d) => {
      val bucket = least(floor(col("o_totalprice") / 25000).cast("int"), lit(19))
      Tables.orders(s, d)
        .groupBy(bucket.as("bucket"))
        .agg(count(lit(1)).as("n"),
             Det.dsum(col("o_totalprice")).as("sum_price"),
             min(col("o_totalprice")).as("min_price"),
             max(col("o_totalprice")).as("max_price"))
        .orderBy("bucket")
    }),

    // A6: stats aggs. stddev/var/corr/covar have identical definitions in
    // both engines; computed on identical doubles they differ only in
    // summation order → round(4) collapses that (values are O(1e0..1e5)).
    "a6_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
             round(var_pop(col("l_discount")), 8).as("var_disc"),
             round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
             round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qd"))
        .orderBy("l_returnflag")),

    // A7: exact percentiles/median (interpolating, matches quantile_cont).
    "a7_percentiles" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(round(median(col("o_totalprice")), 4).as("med_price"),
             round(percentile(col("o_totalprice"), lit(0.25)), 4).as("p25"),
             round(percentile(col("o_totalprice"), lit(0.75)), 4).as("p75"))
        .orderBy("o_orderstatus")),

    // A19: the SKETCHED percentile + its contract — a7's exact
    // percentile is a sort-heavy per-group pass you stop affording at
    // 100 TB; the production path is approx_percentile's mergeable
    // GK/KLL sketch (partial+final, one scan, bounded state), and what
    // makes it usable is the CONTRACT: rank error ≤ 1/accuracy. The
    // audit re-derives the returned value's actual rank fraction with a
    // second grouped pass and asserts |rank/n − 0.5| ≤ 1/accuracy +
    // 1/n (discreteness slack) — the a5/l18 audit idiom: the sketch
    // value itself is engine-specific so it stays OUT of the output;
    // the oracle checks the exact median, the group sizes, and the
    // verdict as a constant TRUE.
    "a19_percentile_sketch" -> ((s, d) => {
      val facts = Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_totalprice"))
      val sk = facts.groupBy("o_orderstatus")
        .agg(expr("approx_percentile(o_totalprice, 0.5, 1000)")
          .as("approx_med"),
          round(percentile(col("o_totalprice"), lit(0.5)), 4)
            .as("med_exact"),
          count(lit(1)).as("n"))
      facts.join(sk, Seq("o_orderstatus"))
        .groupBy(col("o_orderstatus"), col("med_exact"), col("n"))
        .agg(sum(when(col("o_totalprice") <= col("approx_med"), 1L)
          .otherwise(0L)).as("rank_le"))
        .select(col("o_orderstatus"), col("n"), col("med_exact"),
          (abs(col("rank_le").cast("double") / col("n") - 0.5) <=
            lit(0.001) + lit(1.0) / col("n")).as("within_bound"))
        .orderBy("o_orderstatus")
    }),

    // A8: min_by/max_by — "latest/argmax-wins", the sync-merge primitive.
    // o_totalprice is a continuous random double → tie-free in practice;
    // ties would still be deterministic per-engine but could diverge, so
    // sync ops proper (Y4/Y5) use row_number with full tie-breaks instead.
    "a8_minby_maxby" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(max_by(col("o_orderkey"), col("o_totalprice")).as("priciest_order"),
             min_by(col("o_orderkey"), col("o_totalprice")).as("cheapest_order"),
             Det.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("o_orderpriority")),

    // A10: rollup with grouping() — subtotal lattice in one pass.
    "a10_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("l_quantity")).as("sum_qty"),
             grouping(col("l_returnflag")).as("g_rf"),
             grouping(col("l_linestatus")).as("g_ls"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first,
                 col("g_rf"), col("g_ls"))),

    // A10: cube — full lattice.
    "a10_cube" -> ((s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
                 col("o_orderpriority").asc_nulls_first)),

    // A11: pivot with a FIXED value list (deterministic schema); the oracle
    // uses the equivalent manual sum(CASE …) — SURVEY §7.3 dialect map.
    "a11_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
        .agg(Det.dsum(col("value")))
        .orderBy("user_id")),

    // A13: salted two-phase aggregation — the skew pattern: 5 hot keys
    // (event_type) would each land on one reducer; salting fans each key
    // over 16 partial groups, then a cheap second phase folds the partials.
    // Decimal partials keep the two-phase sum exactly equal to a direct sum.
    "a13_salted_skew_agg" -> ((s, d) => {
      val partial = Tables.events(s, d)
        .groupBy(col("event_type"), pmod(col("event_id"), lit(16)).as("salt"))
        .agg(sum(col("value").cast("decimal(28,4)")).as("ps"),
             count(lit(1)).as("pn"))
      partial.groupBy(col("event_type"))
        .agg(sum(col("ps")).cast("double").as("sum_value"),
             sum(col("pn")).as("n"))
        .orderBy("event_type")
    }),

    // A11b: unpivot/melt — the inverse of pivot: wide per-status columns
    // back to (key, status, value) rows via stack().
    "a11b_unpivot" -> ((s, d) => {
      val wide = Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(Det.dsum(when(col("o_orderstatus") === "O", col("o_totalprice"))).as("open_amt"),
             Det.dsum(when(col("o_orderstatus") === "F", col("o_totalprice"))).as("filled_amt"),
             Det.dsum(when(col("o_orderstatus") === "P", col("o_totalprice"))).as("pending_amt"))
      wide.select(col("o_custkey"), expr(
        "stack(3, 'O', open_amt, 'F', filled_amt, 'P', pending_amt) AS (status, amt)"))
        .filter(col("amt").isNotNull)
    }),

    // A14: boolean/conditional aggregate family — count_if, bool_and/or,
    // every/any semantics; the data-quality assertion primitives
    // (count violations, "all rows satisfy", "any row satisfies").
    "a14_bool_aggs" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          count_if(col("o_totalprice") > 200000).as("n_big"),
          bool_and(col("o_totalprice") > 0).as("all_positive"),
          bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
          count_if(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
            .as("n_recent"))
        .orderBy("o_orderstatus")),

    // A12: order-insensitive table fingerprint — sync validation digest.
    // Row hash = first 15 hex digits of md5 of a canonical string form,
    // summed as int64. Both engines share md5 + hex→int machinery.
    "a12_fingerprint" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val rowStr = concat_ws("|",
        col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").cast("string"))
      // mod 1e9 per row so the int64 sum cannot overflow (Spark wraps
      // silently; DuckDB widens to int128 — divergence without the mod).
      o.agg(
        sum(pmod(conv(substring(md5(rowStr), 1, 15), 16, 10).cast("long"),
                 lit(1000000000L))).as("digest"),
        count(lit(1)).as("n_rows"))
    })
  )

  val oracle: Map[String, String] = Map(
    "a18_rolling_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    user_id
        |  FROM events),
        |days AS (SELECT DISTINCT day FROM du)
        |SELECT CAST(d.day AS VARCHAR) AS day,
        |  COUNT(DISTINCT u.user_id) AS d7_exact, TRUE AS est7_ok
        |FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
        |GROUP BY d.day""".stripMargin,

    "a17_histogram" ->
      """SELECT LEAST(CAST(floor(o_totalprice / 25000) AS INTEGER), 19) AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price
        |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    // The verdict columns compare DuckDB's own HLL estimate against the
    // exact count with the same tolerance the Spark side applies to its
    // HLL++ estimate — both engines' sketches sit ≲2% off on this data,
    // so both sides deterministically produce true.
    "a5_approx_distinct" ->
      """SELECT count(DISTINCT l_orderkey) AS exact_orders,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  abs(CAST(approx_count_distinct(l_orderkey) AS DOUBLE)
        |      / count(DISTINCT l_orderkey) - 1) < 0.06 AS approx_orders_ok,
        |  abs(CAST(approx_count_distinct(l_partkey) AS DOUBLE)
        |      / count(DISTINCT l_partkey) - 1) < 0.06 AS approx_parts_ok
        |FROM lineitem""".stripMargin,

    "a16_hll_union" ->
      """WITH cn AS (
        |  SELECT c_custkey, n_regionkey, n_name
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
        |pn AS (
        |  SELECT n_regionkey, n_name, count(DISTINCT c_custkey) AS nd
        |  FROM cn GROUP BY n_regionkey, n_name),
        |est AS (
        |  SELECT n_regionkey,
        |    count(DISTINCT c_custkey) AS exact_customers,
        |    approx_count_distinct(c_custkey) AS approx_customers
        |  FROM cn GROUP BY n_regionkey)
        |SELECT p.n_regionkey, p.n_nations,
        |  CAST(e.exact_customers AS BIGINT) AS exact_customers,
        |  abs(CAST(e.approx_customers AS DOUBLE) / e.exact_customers - 1) < 0.05
        |    AS union_est_ok
        |FROM (SELECT n_regionkey, count(*) AS n_nations FROM pn
        |      GROUP BY n_regionkey) p
        |JOIN est e USING (n_regionkey)
        |ORDER BY n_regionkey""".stripMargin,

    "a14_bool_aggs" ->
      """SELECT o_orderstatus,
        |  CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
        |  bool_and(o_totalprice > 0) AS all_positive,
        |  bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        |  CAST(count_if(o_orderdate >= TIMESTAMP '1997-01-01 00:00:00') AS BIGINT) AS n_recent
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${Det.Sql.dsum("l_quantity")} AS sum_qty,
         |  ${Det.Sql.dsum("l_extendedprice")} AS sum_base_price,
         |  ${Det.Sql.dsum("l_extendedprice * (1.0 - l_discount)", 6)} AS sum_disc_price,
         |  ${Det.Sql.dsum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 6)} AS sum_charge,
         |  ${Det.Sql.davg("l_quantity")} AS avg_qty,
         |  ${Det.Sql.davg("l_extendedprice")} AS avg_price,
         |  ${Det.Sql.davg("l_discount", 6)} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a2_collect_sorted" ->
      """SELECT o_orderpriority,
        |  array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS keys,
        |  array_to_string(list(DISTINCT o_orderstatus ORDER BY o_orderstatus), ',') AS statuses
        |FROM orders WHERE o_totalprice > 250000
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "a4_distinct_agg" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a6_stats" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_pop(l_discount), 8) AS var_disc,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_discount), 6) AS covar_qd
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "a7_percentiles" ->
      """SELECT o_orderstatus,
        |  round(median(o_totalprice), 4) AS med_price,
        |  round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
        |  round(quantile_cont(o_totalprice, 0.75), 4) AS p75
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "a19_percentile_sketch" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS med_exact,
        |  TRUE AS within_bound
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""
        .stripMargin,

    "a8_minby_maxby" ->
      s"""SELECT o_orderpriority,
         |  arg_max(o_orderkey, o_totalprice) AS priciest_order,
         |  arg_min(o_orderkey, o_totalprice) AS cheapest_order,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "a10_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  ${Det.Sql.dsum("l_quantity")} AS sum_qty,
         |  CAST(grouping(l_returnflag) AS TINYINT) AS g_rf,
         |  CAST(grouping(l_linestatus) AS TINYINT) AS g_ls
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, g_rf, g_ls""".stripMargin,

    "a10_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "a11_pivot" ->
      s"""SELECT user_id,
         |  ${Det.Sql.dsum("CASE WHEN event_type = 'view' THEN value END")} AS view,
         |  ${Det.Sql.dsum("CASE WHEN event_type = 'click' THEN value END")} AS click,
         |  ${Det.Sql.dsum("CASE WHEN event_type = 'purchase' THEN value END")} AS purchase,
         |  ${Det.Sql.dsum("CASE WHEN event_type = 'signup' THEN value END")} AS signup,
         |  ${Det.Sql.dsum("CASE WHEN event_type = 'error' THEN value END")} AS error
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "a13_salted_skew_agg" ->
      s"""SELECT event_type, ${Det.Sql.dsum("value", 4)} AS sum_value,
         |  COUNT(*) AS n
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "a11b_unpivot" ->
      s"""WITH wide AS (
         |  SELECT o_custkey,
         |    ${Det.Sql.dsum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS open_amt,
         |    ${Det.Sql.dsum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS filled_amt,
         |    ${Det.Sql.dsum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS pending_amt
         |  FROM orders GROUP BY o_custkey)
         |SELECT o_custkey, status, amt FROM (
         |  SELECT o_custkey, 'O' AS status, open_amt AS amt FROM wide
         |  UNION ALL SELECT o_custkey, 'F', filled_amt FROM wide
         |  UNION ALL SELECT o_custkey, 'P', pending_amt FROM wide
         |) t WHERE amt IS NOT NULL""".stripMargin,

    "a12_fingerprint" ->
      """SELECT
        |  CAST(SUM(CAST(concat('0x', substr(md5(concat_ws('|',
        |    o_orderkey, o_custkey, o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR))), 1, 15)) AS BIGINT)
        |    % 1000000000) AS BIGINT) AS digest,
        |  COUNT(*) AS n_rows
        |FROM orders""".stripMargin
  )
}

package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational core (SURVEY.md §2.2 projection/filter, §2.3 joins, §2.6
  * sorts/limits, §2.7 set ops). Reference source unavailable (SURVEY §0);
  * rows are driven by the SURVEY §2 inventory.
  *
  * Scale notes (100 TB design intent):
  *  - Dimension joins (part/supplier/nation/region/customer) are explicit
  *    `broadcast()` — no shuffle of the fact table for star joins.
  *  - Fact-fact joins (lineitem⋈orders) stay shuffle/sort-merge; both sides
  *    hash-partition on the join key, which AQE can re-plan (skew split).
  *  - As-of join is the union-tag + running-window form: O(n log n) with a
  *    single shuffle on user_id, instead of the quadratic per-key
  *    range-join a naive implementation would do.
  *  - Filters are plain column predicates on parquet scans → pushed to
  *    row-group/page level (verified via explain: PushedFilters).
  */
object Relational {

  import org.apache.spark.sql.{DataFrame, SparkSession}

  /** J10 engine; probeMod Some(m) keeps only c_custkey % m == 0 on the
    * probe side (the j10_sampled monitoring slice). */
  private def fuzzyBlockJoin(s: SparkSession, d: String,
                             probeMod: Option[Int]): DataFrame = {
    val c = Tables.customer(s, d).select(
      col("c_custkey"), col("c_nationkey"), col("c_name"),
      substring(col("c_name"), 10, 5).as("blk"))
    val probe = c
      .filter(probeMod.map(m => col("c_custkey") % m === 0).getOrElse(lit(true)))
      .select(col("c_custkey").as("key_a"), col("c_nationkey"),
              col("blk"), col("c_name").as("name_a"))
    val cand = c.select(col("c_custkey").as("key_b"), col("c_nationkey"),
                        col("blk"), col("c_name").as("name_b"))
    // threshold levenshtein (Spark 3.5+): banded O(L·k) with early exit
    // instead of the full O(L²) DP per blocked pair — it returns -1 when
    // the distance exceeds k and the EXACT distance otherwise, so the
    // kept rows (dist ≤ 2) are bit-identical to the oracle's plain
    // levenshtein. Measured at sf0.1: 7.98 s → the dominant cost was
    // exactly this DP.
    probe.join(cand, Seq("c_nationkey", "blk"))
      .filter(col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"),
              levenshtein(col("name_a"), col("name_b"), 2).as("dist"))
      .filter(col("dist").between(0, 2))
  }

  val queries: Map[String, Q] = Map(

    // P1: projection with computed columns; column pruning reaches the scan.
    "p1_project_compute" -> ((s, d) => {
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1d) - col("l_discount")))
          .cast("decimal(18,4)").cast("double").as("disc_price"),
        (col("l_quantity") * col("l_tax")).cast("decimal(18,4)").cast("double")
          .as("qty_tax"))
    }),

    // P2: conjunctive/disjunctive predicates, IN-list, BETWEEN — all pushed.
    "p2_filter_pushdown" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
        .filter(col("l_returnflag").isin("A", "R") && col("l_quantity") > 25)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    }),

    // P3+P5: rename/drop + CASE/coalesce/nullif conditionals.
    "p3_case_conditional" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumnRenamed("o_orderpriority", "priority")
        .withColumn("price_band",
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "medium")
            .otherwise("large"))
        .withColumn("status_desc",
          coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending")))
        .drop("o_orderdate")
        .select("o_orderkey", "priority", "price_band", "status_desc")
    }),

    // P3 (dedicated): pure rename/drop — column-level metadata ops with no
    // compute. The whole query folds to one Project over the scan, and
    // pruning keeps the dropped columns out of ReadSchema (the reader
    // never materializes s_address/s_phone/s_comment).
    "p3b_rename_drop" -> ((s, d) =>
      Tables.supplier(s, d)
        .withColumnRenamed("s_name", "supplier_name")
        .withColumnRenamed("s_acctbal", "balance")
        .drop("s_address", "s_phone", "s_comment")),

    // P4: distinct over a projection.
    "p4_distinct" -> ((s, d) =>
      Tables.orders(s, d).select("o_orderstatus", "o_orderpriority").distinct()),

    // P6: cast matrix — double→decimal→string, ts→date, long→int, int→double.
    "p6_cast" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").cast("string").as("price_str"),
        // date → string at the boundary: a DATE output column round-trips
        // differently through pandas on the two sides (SURVEY §7.3 types).
        col("o_orderdate").cast("date").cast("string").as("order_date"),
        col("o_orderkey").cast("int").as("key_int"),
        col("o_custkey").cast("double").as("cust_dbl"))
    }),

    // J1: star join, dims broadcast — the 100 TB shape: fact never shuffles.
    "j1_broadcast_star" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val p = Tables.part(s, d).filter(col("p_type") === "PROMO")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(Det.dsum(col("l_extendedprice") * (lit(1d) - col("l_discount")), 6)
               .as("promo_revenue"),
             count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    }),

    // J2: large×large equi-join → sort-merge (hinted; both sides shuffle on
    // the key, co-partitioned — the scalable fact-fact join).
    "j2_sortmerge_join" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d).hint("merge")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"),
             Det.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    // J3: left outer keeping match-less rows; count per customer incl. zero.
    "j3_left_outer" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"),
             Det.dsum(coalesce(col("o_totalprice"), lit(0d))).as("total_spent"))
    }),

    // J3: full outer — the sync-diff backbone shape (see Sync.Y3).
    "j3_full_outer" -> ((s, d) => {
      val hi = Tables.orders(s, d).filter(col("o_totalprice") > 150000)
        .select(col("o_custkey").as("k")).distinct()
      val ur = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k")).distinct()
      hi.withColumn("hi", lit(1))
        .join(ur.withColumn("ur", lit(1)), Seq("k"), "full_outer")
        .select(col("k"), coalesce(col("hi"), lit(0)).as("hi"),
                coalesce(col("ur"), lit(0)).as("ur"))
    }),

    // J4: left semi ≡ EXISTS.
    "j4_semi_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(year(col("o_orderdate")) === 1998)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    }),

    // J5: left anti ≡ NOT EXISTS — sync "rows to delete".
    "j5_anti_join" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // J6: cross join (tiny×tiny → broadcast nested loop).
    "j6_cross_join" -> ((s, d) => {
      Tables.nation(s, d).crossJoin(Tables.region(s, d))
        .select(col("n_name"), col("r_name"),
                (col("n_regionkey") === col("r_regionkey")).cast("int").as("home"))
    }),

    // J7: theta/range join against a literal bucket table (broadcast NLJ).
    "j7_range_join" -> ((s, d) => {
      import s.implicits._
      val buckets = Seq(("q_low", 0d, 17d), ("q_mid", 17d, 34d), ("q_high", 34d, 51d))
        .toDF("bucket", "lo", "hi")
      Tables.lineitem(s, d)
        .join(broadcast(buckets),
              col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), Det.dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy("bucket")
    }),

    // J8: as-of join — latest view at-or-before each purchase, per user.
    // Union-tag + running max over one shuffle on user_id: O(n log n),
    // no quadratic candidate join; this is the 100 TB-safe as-of.
    "j8_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), lit(0).as("kind"),
                lit(null).cast("long").as("p_event"), col("ts").as("view_ts"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("kind"),
                col("event_id").as("p_event"), lit(null).cast("timestamp").as("view_ts"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("kind"), col("p_event").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      views.unionByName(purch)
        .withColumn("asof_view_ts", max(col("view_ts")).over(w))
        .filter(col("kind") === 1)
        .select(col("p_event").as("event_id"), col("user_id"),
                col("ts"), col("asof_view_ts"))
    }),

    // J8b: as-of DIRECTION variants — the full merge_asof surface
    // (backward / forward / nearest) from the SAME union-tag pass as
    // j8: one (user) exchange, one sort, TWO frames over one ordering
    // (running max over (-∞, current] = backward at-or-before; running
    // min over [current, +∞) = forward strictly-after — the view-first
    // tie order makes the equal-ts view belong to backward, so the two
    // directions partition the timeline cleanly). nearest picks the
    // smaller µs distance, backward on ties; distances compare at FULL
    // µs (unix_micros / epoch_us — second-truncated casts would
    // misjudge sub-second races, the w7 lesson's neighbor).
    "j8b_asof_directions" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), lit(0).as("kind"),
          lit(null).cast("long").as("p_event"), col("ts").as("view_ts"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("kind"),
          col("event_id").as("p_event"),
          lit(null).cast("timestamp").as("view_ts"))
      val ord = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("kind"), col("p_event").asc_nulls_first)
      val back = max(col("view_ts")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      val fwd = min(col("view_ts")).over(
        ord.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      views.unionByName(purch)
        .withColumn("asof_back", back)
        .withColumn("asof_fwd", fwd)
        .filter(col("kind") === 1)
        .withColumn("asof_nearest",
          when(col("asof_back").isNull, col("asof_fwd"))
            .when(col("asof_fwd").isNull, col("asof_back"))
            .when(unix_micros(col("ts")) - unix_micros(col("asof_back")) <=
              unix_micros(col("asof_fwd")) - unix_micros(col("ts")),
              col("asof_back"))
            .otherwise(col("asof_fwd")))
        .select(col("p_event").as("event_id"), col("user_id"), col("ts"),
          col("asof_back"), col("asof_fwd"), col("asof_nearest"))
    }),

    // J9: interval-overlap self-join — same-customer order pairs whose
    // 30-day windows overlap (s1 < e2 AND s2 < e1). Scale shape: each
    // interval is exploded into EVERY calendar month it touches
    // (sequence(trunc(st)..trunc(en), 1 month) — not just the endpoint
    // months, which would drop pairs whose only common month is a middle
    // month once the width exceeds ~2 months) and the join key is
    // (ck, month) — any overlapping pair shares the month of a common
    // instant, so recall is exact for any interval width, while pair
    // generation is quadratic only per (customer × month), not per
    // customer's full history. Pairs found in several shared months dedup
    // before counting.
    "j9_interval_overlap" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
        col("o_orderdate").as("st"),
        date_add(col("o_orderdate"), 30).cast("timestamp").as("en"))
        .withColumn("mb", explode(sequence(
          date_trunc("month", col("st")), date_trunc("month", col("en")),
          expr("interval 1 month"))))
      val a = o.select(col("ck"), col("mb"), col("ok").as("ok1"),
        col("st").as("st1"), col("en").as("en1"))
      val b = o.select(col("ck"), col("mb"), col("ok").as("ok2"),
        col("st").as("st2"), col("en").as("en2"))
      a.join(b, Seq("ck", "mb"))
        .filter(col("ok1") < col("ok2") && col("st1") < col("en2") && col("st2") < col("en1"))
        .select(col("ck"), col("ok1"), col("ok2")).distinct()
        .groupBy(col("ck")).agg(count(lit(1)).as("n_overlaps"))
    }),

    // J10: blocked fuzzy join — entity resolution by edit distance, the
    // sync-tool answer to "same customer, typo'd key". All-pairs
    // levenshtein is O(n²·L²) and impossible at scale; blocking on
    // (nation, id-prefix) bounds the pair space per block, the standard
    // ER blocking shape. Distance ≤ 2 within a block = candidate match.
    // j10_sampled is the deterministic 1/20-probe monitoring slice, a
    // first-class oracle-checked query (no bench-only sampling flag).
    "j10_fuzzy_block_join" -> ((s, d) => fuzzyBlockJoin(s, d, None)),
    "j10_sampled" -> ((s, d) => fuzzyBlockJoin(s, d, Some(20))),

    // J11: explicit key-salted join — the manual skew weapon when AQE's
    // skew split can't help (e.g. a single hot key inside one partition
    // of a shuffle join). The skewed fact side gets salt = hash(key) % K;
    // the dim side is replicated K ways, so the hot key's rows spread
    // over K tasks. Salt never reaches the result, so the oracle is the
    // plain join — identical output, different (skew-proof) physical
    // distribution. a13 is the aggregation twin of this pattern.
    "j11_salted_skew_join" -> ((s, d) => {
      val k = 8
      val fact = Tables.orders(s, d).withColumn(
        "salt", pmod(xxhash64(col("o_orderkey")), lit(k)).cast("int"))
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          explode(sequence(lit(0), lit(k - 1))).as("salt"))
      fact.join(dim,
          col("o_custkey") === col("c_custkey") && fact("salt") === dim("salt"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("total_price"))
    }),

    // O1+O3+O4: global top-k — TakeOrderedAndProject, no full sort at scale.
    // O1 (dedicated): multi-key GLOBAL sort with explicit NULLS placement
    // — nulls-first asc on a nullable measure, desc timestamp, asc id
    // tiebreak (a total order). Physically: range-partitioning exchange
    // from sampled bounds + per-partition sort — the only shape that
    // scales (a single-task sort is the naive alternative). The oracle
    // gate compares row SETS, so the ordering itself is pinned in
    // OperatorSuite and the plan shape in PlanAuditSuite.
    "o1_global_sort" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          nullif(col("value"), lit(0.0)).as("v_or_null"), col("ts"))
        .orderBy(col("v_or_null").asc_nulls_first, col("ts").desc,
                 col("event_id").asc)),

    "o4_topk_global" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")),

    // X9: typed grouped-map — `groupByKey(...).mapGroups`, the escape
    // hatch for per-group logic the relational surface can't express
    // (imperative scans, per-group state machines). Physically one
    // clustered exchange on the key, then each group streams through the
    // closure executor-side — no driver involvement, the same shape as
    // the custom-exec operators. This query's logic IS expressible
    // relationally (per-user event summary) — deliberately, so the
    // window/agg form can serve as the oracle twin proving the typed
    // path computes identically. Ordering inside the group uses exact
    // MICROsecond epoch (getTime millis + getNanos) — Timestamp.getTime
    // alone truncates to millis and could flip first/last on sub-milli
    // ties where the oracle's full-precision ORDER BY ts would not.
    "x9_grouped_map" -> ((s, d) => {
      val sEnc = s
      import sEnc.implicits._
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .as[(Long, Long, java.sql.Timestamp, String)]
        .groupByKey(_._1)
        .mapGroups { (uid, it) =>
          val evs = it.toArray
          def us(t: java.sql.Timestamp): Long =
            // floorDiv, not /: getTime is negative pre-epoch, and truncating
            // division would round the seconds component toward zero there
            // (off by one second whenever nanos > 0)
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
          val sorted = evs.sortBy(e => (us(e._3), e._2))
          val types = new java.util.HashSet[String]()
          sorted.foreach(e => types.add(e._4))
          (uid, sorted.length.toLong, types.size.toLong,
            sorted.head._2, sorted.last._2)
        }
        .toDF("user_id", "n_events", "n_types",
              "first_event_id", "last_event_id")
    }),

    // O5: top-k per group via ranking window (single shuffle on the group key).
    "o5_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    }),

    // O5b: the same top-3-per-customer through the bounded TopKByPrice
    // aggregator (map-side ≤k buffer per group — the shuffle carries at
    // most k rows per group per partition instead of every row; see
    // functions/TopK.scala). Same oracle semantics as O5.
    "o5b_topk_agg" -> ((s, d) => {
      val topk = udaf(new graft.functions.TopKByPrice(3),
        org.apache.spark.sql.Encoders.product[graft.functions.Ranked])
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
        .select(col("o_custkey"), posexplode(col("top")))
        .select(col("o_custkey"), col("col.key").as("o_orderkey"),
                col("col.price").as("o_totalprice"),
                (col("pos") + 1).cast("int").as("rn"))
    }),

    // O5c: the same top-3-per-customer through the full custom-operator
    // path — BoundedTopKPlan logical node → BoundedTopKStrategy →
    // BoundedTopKExec (one k-slot min-heap per group after the clustered
    // exchange; no partition sort, O(groups×k) memory; see
    // plans/BoundedTopK.scala). Same result set as O5 minus the rank.
    "o5c_topk_exec" -> ((s, d) =>
      graft.plans.BoundedTopK.perGroup(
        Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
        Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)),

    // U1+U2: union all / union distinct via unionByName.
    "u1_union" -> ((s, d) => {
      val a = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val b = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      a.unionByName(b).groupBy(col("o_custkey")).agg(count(lit(1)).as("n_all"))
    }),

    // U2: union distinct — set semantics across branches (union + distinct
    // is exactly Catalyst's plan for UNION; one hash-distinct shuffle).
    "u2_union_distinct" -> ((s, d) => {
      val a = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("k"))
      val b = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("k"))
      a.union(b).distinct()
    }),

    // U3: intersect (distinct set semantics).
    "u3_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nk")))),

    // U4: exceptAll (bag semantics — the pure "table diff" primitive).
    "u4_except_all" -> ((s, d) => {
      val a = Tables.orders(s, d).select(col("o_custkey").as("k"))
      val b = Tables.orders(s, d).filter(col("o_orderstatus") =!= "O")
        .select(col("o_custkey").as("k"))
      a.exceptAll(b).groupBy(col("k")).agg(count(lit(1)).as("n"))
    })
  )

  val oracle: Map[String, String] = Map(
    "j10_fuzzy_block_join" ->
      """WITH c AS (SELECT c_custkey, c_nationkey, c_name,
        |                  substr(c_name, 10, 5) AS blk FROM customer)
        |SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM c a JOIN c b
        |  ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
        | AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2""".stripMargin,

    "j10_sampled" ->
      """WITH c AS (SELECT c_custkey, c_nationkey, c_name,
        |                  substr(c_name, 10, 5) AS blk FROM customer)
        |SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
        |  CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM c a JOIN c b
        |  ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
        | AND a.c_custkey < b.c_custkey AND a.c_custkey % 20 = 0
        |WHERE levenshtein(a.c_name, b.c_name) <= 2""".stripMargin,

    // salt is internal to the physical plan; the logical result is the
    // plain customer⋈orders rollup
    "j11_salted_skew_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "p1_project_compute" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS disc_price,
        |  CAST(CAST(l_quantity * l_tax AS DECIMAL(18,4)) AS DOUBLE) AS qty_tax
        |FROM lineitem""".stripMargin,

    "p2_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
        |  AND l_returnflag IN ('A','R') AND l_quantity > 25""".stripMargin,

    "p3_case_conditional" ->
      """SELECT o_orderkey, o_orderpriority AS priority,
        |  CASE WHEN o_totalprice < 50000 THEN 'small'
        |       WHEN o_totalprice < 200000 THEN 'medium'
        |       ELSE 'large' END AS price_band,
        |  COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_desc
        |FROM orders""".stripMargin,

    "p3b_rename_drop" ->
      """SELECT s_suppkey, s_name AS supplier_name, s_nationkey,
        |  s_acctbal AS balance
        |FROM supplier""".stripMargin,

    "p4_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",

    "p6_cast" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
        |  CAST(o_orderkey AS INTEGER) AS key_int,
        |  CAST(o_custkey AS DOUBLE) AS cust_dbl
        |FROM orders""".stripMargin,

    "j1_broadcast_star" ->
      s"""SELECT p_brand,
         |  ${Det.Sql.dsum("l_extendedprice * (1.0 - l_discount)", 6)} AS promo_revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_type = 'PROMO'
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "j2_sortmerge_join" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n_lines,
         |  ${Det.Sql.dsum("l_quantity")} AS sum_qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "j3_left_outer" ->
      s"""SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
         |  ${Det.Sql.dsum("COALESCE(o_totalprice, 0.0)")} AS total_spent
         |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |GROUP BY c_custkey, c_name""".stripMargin,

    "j3_full_outer" ->
      """WITH h AS (SELECT DISTINCT o_custkey AS k, 1 AS hv FROM orders WHERE o_totalprice > 150000),
        |     u AS (SELECT DISTINCT o_custkey AS k, 1 AS uv FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT COALESCE(h.k, u.k) AS k, COALESCE(h.hv, 0) AS hi, COALESCE(u.uv, 0) AS ur
        |FROM h FULL OUTER JOIN u ON h.k = u.k""".stripMargin,

    "j4_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND year(o_orderdate) = 1998)""".stripMargin,

    "j5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,

    "j6_cross_join" ->
      """SELECT n_name, r_name,
        |  CAST(n_regionkey = r_regionkey AS INTEGER) AS home
        |FROM nation CROSS JOIN region""".stripMargin,

    "j7_range_join" ->
      s"""SELECT bucket, COUNT(*) AS n, ${Det.Sql.dsum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |JOIN (VALUES ('q_low', 0.0, 17.0), ('q_mid', 17.0, 34.0), ('q_high', 34.0, 51.0))
         |  AS b(bucket, lo, hi)
         |  ON l_quantity >= lo AND l_quantity < hi
         |GROUP BY bucket ORDER BY bucket""".stripMargin,

    // Oracle uses the correlated-max form; Spark uses the window form —
    // same semantics (ties: view at same µs as purchase counts).
    "j8_asof_join" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
        |p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts FROM ev WHERE event_type = 'view')
        |SELECT p.event_id, p.user_id, p.ts,
        |  (SELECT max(v.ts) FROM v WHERE v.user_id = p.user_id AND v.ts <= p.ts) AS asof_view_ts
        |FROM p""".stripMargin,

    "j8b_asof_directions" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
        |p AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts FROM ev WHERE event_type = 'view'),
        |x AS (
        |  SELECT p.event_id, p.user_id, p.ts,
        |    (SELECT max(v.ts) FROM v
        |     WHERE v.user_id = p.user_id AND v.ts <= p.ts) AS asof_back,
        |    (SELECT min(v.ts) FROM v
        |     WHERE v.user_id = p.user_id AND v.ts > p.ts) AS asof_fwd
        |  FROM p)
        |SELECT event_id, user_id, ts, asof_back, asof_fwd,
        |  CASE
        |    WHEN asof_back IS NULL THEN asof_fwd
        |    WHEN asof_fwd IS NULL THEN asof_back
        |    WHEN epoch_us(ts) - epoch_us(asof_back)
        |      <= epoch_us(asof_fwd) - epoch_us(ts) THEN asof_back
        |    ELSE asof_fwd
        |  END AS asof_nearest
        |FROM x""".stripMargin,

    "j9_interval_overlap" ->
      """WITH o AS (SELECT o_custkey AS ck, o_orderkey AS ok, o_orderdate AS st,
        |                  o_orderdate + INTERVAL 30 DAY AS en FROM orders)
        |SELECT a.ck AS ck, COUNT(*) AS n_overlaps
        |FROM o a JOIN o b ON a.ck = b.ck
        | AND a.ok < b.ok AND a.st < b.en AND b.st < a.en
        |GROUP BY a.ck""".stripMargin,

    "x9_grouped_map" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
        |o AS (SELECT user_id, event_id, event_type,
        |        row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |        COUNT(*) OVER (PARTITION BY user_id) AS n
        |      FROM ev)
        |SELECT user_id, CAST(MAX(n) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
        |  CAST(MAX(CASE WHEN rn = 1 THEN event_id END) AS BIGINT) AS first_event_id,
        |  CAST(MAX(CASE WHEN rn = n THEN event_id END) AS BIGINT) AS last_event_id
        |FROM o GROUP BY user_id""".stripMargin,

    "o1_global_sort" ->
      """WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events)
        |SELECT event_id, user_id, NULLIF(value, 0.0) AS v_or_null, ts
        |FROM ev
        |ORDER BY v_or_null ASC NULLS FIRST, ts DESC, event_id ASC""".stripMargin,

    "o4_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

    "o5_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |       ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        |FROM orders
        |QUALIFY rn <= 3""".stripMargin,

    "u1_union" ->
      """SELECT o_custkey, COUNT(*) AS n_all FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |) t GROUP BY o_custkey""".stripMargin,

    "o5b_topk_agg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |       ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
        |FROM orders
        |QUALIFY rn <= 3""".stripMargin,

    "o5c_topk_exec" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,

    "u2_union_distinct" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
        |UNION
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'""".stripMargin,

    "u3_intersect" ->
      """SELECT c_nationkey AS nk FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nk FROM supplier""".stripMargin,

    "u4_except_all" ->
      """SELECT k, COUNT(*) AS n FROM (
        |  SELECT o_custkey AS k FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey AS k FROM orders WHERE o_orderstatus <> 'O'
        |) t GROUP BY k""".stripMargin
  )
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry point (SURVEY §3.2 entry point 3): the same engine surface
  * through `spark.sql` — ANTLR parse → analyze → optimize. Includes the
  * subquery forms Catalyst decorrelates into semi/anti/scalar joins
  * (RewritePredicateSubquery / RewriteCorrelatedScalarSubquery), which the
  * DataFrame API cannot express directly.
  */
object SqlQueries {

  private val tables =
    Seq("orders", "customer", "lineitem", "nation", "region", "supplier", "part")

  private def sql(s: SparkSession, d: String, text: String): DataFrame = {
    tables.foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))
    s.sql(text)
  }

  // Q3-shape: revenue of urgent orders by building segment — join, agg,
  // top-k. Identical text runs on DuckDB (dialect-shared subset).
  private val q3 =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  o_orderdate
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |  JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderpriority = '1-URGENT'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey ASC
      |LIMIT 10""".stripMargin

  // Q5-shape: local-supplier revenue per nation within one region and a
  // one-year window — the 6-table star Catalyst has to join-order well
  // (region/nation broadcast, the c_nationkey = s_nationkey theta ties
  // customer to supplier). Shared dialect text.
  private val q5 =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name ASC""".stripMargin

  private val existsQ =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |ORDER BY c_custkey""".stripMargin

  // correlated scalar subquery: orders 1.5x above their customer's exact
  // (decimal) average — the average is order-insensitive so both engines
  // compare against the identical double.
  private val scalarQ =
    """SELECT o_orderkey, o_custkey
      |FROM orders o
      |WHERE o_totalprice > 1.5 * (
      |  SELECT CAST(AVG(CAST(o2.o_totalprice AS DECIMAL(28,4))) AS DOUBLE)
      |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  // NOT IN subquery — Catalyst plans a null-aware anti-join (NAAJ): one
  // NULL in the subquery legally empties the result, a semantics
  // difference from NOT EXISTS that both engines implement identically.
  private val notInQ =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
      |                        WHERE o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  // explicit GROUPING SETS lattice (A10's third form) — shared text.
  private val groupingSetsQ =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(grouping(o_orderstatus) AS INTEGER) AS g_s,
      |  CAST(grouping(o_orderpriority) AS INTEGER) AS g_p
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST, g_s, g_p""".stripMargin

  // Q18-shape: large-quantity orders — IN over an aggregated-HAVING
  // subquery, which Catalyst plans as a left-semi join against the
  // aggregate. The HAVING output is tiny (selective threshold), so the
  // semi side broadcasts (verified in PLANS.md); at scales where it
  // doesn't, both lineitem branches shuffle on l_orderkey and qualify
  // for exchange reuse. Shared dialect text.
  private val q18 =
    """SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
      |  SUM(l_quantity) AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey HAVING SUM(l_quantity) > 350)
      |GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 100""".stripMargin

  // Q10-shape: top returned-item revenue per customer — 4-table star with
  // a selective fact predicate, agg, top-20. Dimension joins broadcast;
  // the returnflag filter pushes to the lineitem scan.
  private val q10 =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey ASC
      |LIMIT 20""".stripMargin

  // Q7-shape: shipping volume between two nations by year — the
  // supplier-nation × customer-nation cross-filter plus a date-derived
  // group key, the classic "both directions" bi-national join.
  private val q7 =
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
      |  CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS volume,
      |  COUNT(*) AS n_lines
      |FROM supplier
      |JOIN lineitem ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |JOIN nation cn ON c_nationkey = cn.n_nationkey
      |WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
      |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      |GROUP BY sn.n_name, cn.n_name, EXTRACT(year FROM o_orderdate)
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // Q4-shape: order-priority checking — a correlated EXISTS whose inner
  // predicate is NON-equi (l_shipdate > o_orderdate): Catalyst must carry
  // the extra condition into the decorrelated left-semi join, a different
  // rewrite path from the pure equality EXISTS above.
  private val q4 =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // Q22-shape: customers with above-average balance and no high-value
  // orders — an uncorrelated scalar subquery (one broadcast scalar)
  // combined with a correlated NOT EXISTS (anti join) in the same WHERE.
  // (Every customer in this corpus has ≥1 order, so the classic "no
  // orders at all" form would be vacuously empty; the totalprice
  // predicate keeps the anti join doing real work.)
  private val q22 =
    """SELECT c_mktsegment, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT CAST(AVG(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
      |                   FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  // Q16-shape (adapted: lineitem stands in for partsupp, which the corpus
  // lacks): distinct-supplier counts per part attribute with a NOT IN
  // exclusion — anti join feeding a COUNT(DISTINCT) aggregate.
  private val q16 =
    """SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_size >= 5
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_type
      |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC""".stripMargin

  // Recursive CTE (Spark 4 UnionLoop): reachability over the implicit
  // binary tree parent(k) = floor(k/2), anchored at customer 1 — per-depth
  // rollup of the subtree. The floor/CAST form sidesteps the int-division
  // dialect gap (Spark `div` vs DuckDB `//`); identical text runs on both.
  private val recursiveQ =
    """WITH RECURSIVE anc(custkey, depth) AS (
      |  SELECT c_custkey, 0 FROM customer WHERE c_custkey = 1
      |  UNION ALL
      |  SELECT c.c_custkey, a.depth + 1
      |  FROM customer c JOIN anc a
      |    ON CAST(floor(c.c_custkey / 2.0) AS BIGINT) = a.custkey
      |  -- c_custkey < 32 is implied by the tree shape (root 1, child
      |  -- keys 2a/2a+1, depth <= 4 => keys < 32) but gives the per-
      |  -- iteration parquet scan a static pushed filter: every UnionLoop
      |  -- step prunes row groups instead of rescanning the full table.
      |  -- Depth 4 (not 8): UnionLoop cost at local scale is pure
      |  -- per-iteration job scheduling (~0.25 s/step regardless of rows);
      |  -- depth 4 exercises the identical machinery (anchor fold, per-step
      |  -- pushed filter, loop termination) at half the scheduled jobs.
      |  WHERE a.depth < 4 AND c.c_custkey < 32)
      |SELECT depth, COUNT(*) AS n_nodes,
      |  min(custkey) AS min_key, max(custkey) AS max_key
      |FROM anc GROUP BY depth ORDER BY depth""".stripMargin

  // SQL-defined scalar function (Spark 4 CREATE FUNCTION ... RETURN):
  // the analyzer inlines the body into the plan — codegen'd expression,
  // zero call overhead — so the oracle is simply the inlined expression.
  private val sqlUdfQ =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(disc_price(l_extendedprice, l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  private val sqlUdfOracle =
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // LATERAL correlated subquery (comma-join dialect shared with DuckDB):
  // top-2 orders per customer by price. Catalyst decorrelates the
  // ORDER BY ... LIMIT inner query (DecorrelateInnerQuery) into a
  // partition-ranked window join — the SQL spelling of O5 top-k per
  // group, exercised through the parser instead of the DataFrame API.
  // Ties are broken by o_orderkey so both engines agree row-for-row.
  private val lateralQ =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (
      |  SELECT o_orderkey, o_totalprice
      |  FROM orders
      |  WHERE o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey ASC
      |  LIMIT 2
      |) t
      |WHERE c.c_custkey <= 200
      |ORDER BY c.c_custkey ASC, t.o_totalprice DESC, t.o_orderkey ASC""".stripMargin

  // Q6-shape: the forecasting-revenue-change scan — pure predicate
  // pushdown + one global agg, no join. The benchmark's "can your scan
  // prune" canary: every predicate reaches the parquet row groups.
  private val q6 =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // Q12-shape (adapted: linestatus stands in for shipmode, shipdate vs
  // orderdate for the receipt/commit chain the corpus lacks): per-group
  // CASE-conditional priority counts over a fact-fact join.
  private val q12 =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  // Q13-shape: customer order-count distribution — a LEFT OUTER join
  // with an extra predicate INSIDE the ON clause (customers without
  // qualifying orders must survive with count 0, so the filter cannot
  // sit in WHERE), then a second aggregation over the first.
  private val q13 =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // Q14-shape: promo revenue share — a CASE-gated sum divided by the
  // total sum in one aggregate (both sums decimal-exact, the final
  // division one double op → identical in both engines).
  private val q14 =
    """SELECT
      |  100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
      |        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))
      |        ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) /
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
      |    AS promo_revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-06-01 00:00:00'""".stripMargin

  // Q17-shape: small-quantity-order revenue — a correlated scalar
  // subquery per part (0.2 × that part's average quantity): Catalyst
  // decorrelates it into an aggregate joined back on the key, the
  // heaviest scalar-subquery rewrite; the avg is decimal-exact so both
  // engines compare against the identical threshold.
  private val q17 =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / 7.0
      |    AS avg_yearly,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_size <= 10
      |  AND l_quantity < (
      |    SELECT 0.2 * CAST(AVG(CAST(l2.l_quantity AS DECIMAL(28,4))) AS DOUBLE)
      |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  // Q21-shape (adapted to the corpus's shipdate-only date column):
  // suppliers whose LATE line (shipped >75 days after the order date)
  // belongs to a multi-supplier order where NO OTHER supplier shipped
  // late — EXISTS + NOT EXISTS, both correlated on a composite
  // condition (same order, different supplier), the double-anti-join
  // decorrelation stress test.
  private val q21 =
    """SELECT s_name, COUNT(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL '75' DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3
      |                    ON o3.o_orderkey = l3.l_orderkey
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL '75' DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name ASC""".stripMargin

  // Q8-shape: national market share — one nation's slice of a region's
  // part-type revenue per year: CASE-gated decimal sum over the full
  // 8-relation star (two nation roles), divided by the total in the
  // same aggregate. The widest join tree in the suite; every dimension
  // broadcasts, the lineitem⋈orders spine is the only shuffle.
  private val q8 =
    """SELECT o_year,
      |  CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN vol
      |            ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE) /
      |    CAST(SUM(vol) AS DOUBLE) AS mkt_share,
      |  COUNT(*) AS n_lines
      |FROM (
      |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
      |    CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6)) AS vol,
      |    sn.n_name AS supp_nation
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN region ON cn.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  WHERE r_name = 'AFRICA' AND p_type = 'ECONOMY') shares
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  // Q15-shape: top supplier by a windowed revenue view — a CTE reused
  // twice (join back + scalar MAX over it), the view-maximum idiom.
  // total_revenue values are decimal-exact doubles, so the equality
  // against MAX is bit-safe cross-engine.
  private val q15 =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
      |      AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // Q19-shape: disjunctive brand/size/quantity predicate groups — the
  // OR-of-conjunctions form the optimizer must CNF-extract the common
  // p_partkey join from (and push the per-branch ranges into both
  // scans) instead of evaluating post-join.
  private val q19 =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
      |    AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 21)
      |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity BETWEEN 10 AND 30)
      |   OR (p_brand = 'Brand#33' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity BETWEEN 20 AND 40)""".stripMargin

  // The corpus ships no partsupp table, so the last four TPC-H shapes
  // (q2/q9/q11/q20) run over a DERIVED surrogate: the TPC-H generator's
  // own supplier-assignment rule — for i in 0..3, suppkey =
  // (partkey + i·(S/4 + (partkey−1)/S)) mod S + 1, S = |supplier| —
  // plus hash-formula availqty/supplycost. Every term is integer-exact
  // arithmetic in the shared dialect (floor-division spelled
  // CAST(floor(x/y) AS BIGINT), the recursiveQ idiom), so the IDENTICAL
  // text builds the identical table in Spark and DuckDB, making all four
  // oracle-checkable. The DISTINCT enforces the (ps_partkey, ps_suppkey)
  // PK the real table has: at small S the generator rule collides (e.g.
  // S=10, increment 5·i or 10·i yields only 1-2 distinct suppkeys per
  // part), and duplicate pairs would double-count through q9's join and
  // violate the y11 keys-UNIQUE contract the sync ops rest on. At scale
  // the CTE is a projection over part (≤4 rows/part; the dedup hash-aggs
  // those ≤4-row groups); S comes from a one-row broadcast scalar.
  private[graft] val partsuppCte =
    """WITH ps0 AS (
      |  SELECT DISTINCT p_partkey AS ps_partkey,
      |    CAST((p_partkey + iv.i * (CAST(floor(sc.ns / 4.0) AS BIGINT)
      |        + CAST(floor((p_partkey - 1) / CAST(sc.ns AS DOUBLE)) AS BIGINT))) % sc.ns + 1
      |      AS BIGINT) AS ps_suppkey
      |  FROM part, (SELECT COUNT(*) AS ns FROM supplier) sc,
      |       (VALUES (0), (1), (2), (3)) iv(i)),
      |partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |    CAST((ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS BIGINT) AS ps_availqty,
      |    CAST((ps_partkey * 31 + ps_suppkey * 17) % 100000 AS DOUBLE) / 100.0 + 1.0
      |      AS ps_supplycost
      |  FROM ps0)""".stripMargin

  // Q2-shape: minimum-cost supplier per part within a region — the
  // correlated scalar-MIN subquery re-reading partsupp through the same
  // region filter; Catalyst decorrelates it into a per-part min aggregate
  // joined back on the key (pinned in PlanAuditSuite).
  private val q2 = partsuppCte +
    """
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_type
      |FROM part
      |JOIN partsupp ON p_partkey = ps_partkey
      |JOIN supplier ON s_suppkey = ps_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE p_size <= 10 AND p_type = 'ECONOMY' AND r_name = 'ASIA'
      |  AND ps_supplycost = (
      |    SELECT MIN(ps2.ps_supplycost)
      |    FROM partsupp ps2
      |    JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'ASIA')
      |ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
      |LIMIT 100""".stripMargin

  // Q9-shape: product-type profit by nation and year — revenue minus
  // supply cost over the 6-relation star; amounts are decimal-cast before
  // the sum so both engines add the identical exact values.
  private val q9 = partsuppCte +
    """
      |SELECT nation, o_year,
      |  CAST(SUM(amount) AS DOUBLE) AS sum_profit, COUNT(*) AS n_lines
      |FROM (
      |  SELECT n_name AS nation,
      |    CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
      |    CAST(l_extendedprice * (1.0 - l_discount) - ps_supplycost * l_quantity
      |         AS DECIMAL(28,6)) AS amount
      |  FROM part
      |  JOIN lineitem ON p_partkey = l_partkey
      |  JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON o_orderkey = l_orderkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE p_name LIKE '%e%') profit
      |GROUP BY nation, o_year
      |ORDER BY nation ASC, o_year DESC""".stripMargin

  // Q11-shape: important-stock share — per-part supply value within one
  // nation HAVING above a fraction of that nation's total (the
  // HAVING-over-uncorrelated-scalar form). Both sides of the comparison
  // are exact decimal sums cast to double, so the threshold is bit-equal.
  private val q11 = partsuppCte +
    """
      |SELECT ps_partkey,
      |  CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(28,4))) AS DOUBLE) AS value
      |FROM partsupp
      |JOIN supplier ON ps_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_3'
      |GROUP BY ps_partkey
      |HAVING CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(28,4))) AS DOUBLE) > (
      |  SELECT CAST(SUM(CAST(ps_supplycost * ps_availqty AS DECIMAL(28,4))) AS DOUBLE) * 0.01
      |  FROM partsupp
      |  JOIN supplier ON ps_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_3')
      |ORDER BY value DESC, ps_partkey ASC""".stripMargin

  // Q20-shape: potential part promotion — the double-nested IN with a
  // correlated scalar inside (suppliers holding more than half a year's
  // shipped quantity of any 'b%' part): the deepest decorrelation chain
  // in the suite — IN → semi join, inner IN → semi join, correlated
  // scalar → per-(part,supp) aggregate joined back (pinned in
  // PlanAuditSuite: no cartesian, two semi joins).
  private val q20 = partsuppCte +
    """
      |SELECT s_name, s_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_7'
      |  AND s_suppkey IN (
      |    SELECT ps_suppkey FROM partsupp
      |    WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'b%')
      |      AND ps_availqty > (
      |        SELECT 0.5 * SUM(l_quantity) FROM lineitem
      |        WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      |          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
      |ORDER BY s_name ASC""".stripMargin

  // Q16 TRUE form over the surrogate (the q16 above predates partsupp and
  // adapts lineitem): brand exclusion + size IN-list + NOT IN supplier
  // exclusion feeding COUNT(DISTINCT ps_suppkey) — the spec's actual
  // shape: anti join into a distinct aggregate over the association
  // table. (s_acctbal < 1000 stands in for the spec's comment-LIKE
  // exclusion — the corpus ships no s_comment; the 1000 threshold
  // excludes ≥1 supplier at EVERY shipped SF, so the NOT IN branch is
  // always live, where < 0 matched nothing at sf0.001.)
  private val q16b = partsuppCte +
    """
      |SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
      |FROM partsupp JOIN part ON p_partkey = ps_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 7, 10, 14, 19, 22, 25)
      |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000.0)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC""".stripMargin

  val queries: Map[String, Q] = Map(
    "sql_q16b_partsupp" -> ((s, d) => sql(s, d, q16b)),
    "sql_q2_min_cost_supplier" -> ((s, d) => sql(s, d, q2)),
    "sql_q9_product_profit" -> ((s, d) => sql(s, d, q9)),
    "sql_q11_important_stock" -> ((s, d) => sql(s, d, q11)),
    "sql_q20_promotion_parts" -> ((s, d) => sql(s, d, q20)),
    "sql_q8_market_share" -> ((s, d) => sql(s, d, q8)),
    "sql_q15_top_supplier" -> ((s, d) => sql(s, d, q15)),
    "sql_q19_disjunctive" -> ((s, d) => sql(s, d, q19)),
    "sql_q6_forecast_revenue" -> ((s, d) => sql(s, d, q6)),
    "sql_q12_priority_lines" -> ((s, d) => sql(s, d, q12)),
    "sql_q13_custdist" -> ((s, d) => sql(s, d, q13)),
    "sql_q14_promo_share" -> ((s, d) => sql(s, d, q14)),
    "sql_q17_small_qty" -> ((s, d) => sql(s, d, q17)),
    "sql_q21_waiting_supplier" -> ((s, d) => sql(s, d, q21)),
    "sql_lateral_topk" -> ((s, d) => sql(s, d, lateralQ)),
    "x8_sql_udf" -> ((s, d) => {
      // register only the one table the query reads: registering all 7
      // views pays a parquet-footer schema read per view, more than the
      // agg itself costs when this runs before the other sql_* queries
      Tables.table(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, disc DOUBLE)
          |RETURNS DOUBLE RETURN p * (1.0 - disc)""".stripMargin)
      s.sql(sqlUdfQ)
    }),
    "sql_recursive_cte" -> ((s, d) => sql(s, d, recursiveQ)),
    "sql_q4_priority_exists" -> ((s, d) => sql(s, d, q4)),
    "sql_q16_supplier_cnt" -> ((s, d) => sql(s, d, q16)),
    "sql_q22_no_orders" -> ((s, d) => sql(s, d, q22)),
    "sql_q3_topk" -> ((s, d) => sql(s, d, q3)),
    "sql_q7_volume_shipping" -> ((s, d) => sql(s, d, q7)),
    "sql_q10_returned_topk" -> ((s, d) => sql(s, d, q10)),
    "sql_q18_large_orders" -> ((s, d) => sql(s, d, q18)),
    "sql_q5_local_supplier" -> ((s, d) => sql(s, d, q5)),
    "sql_exists_subquery" -> ((s, d) => sql(s, d, existsQ)),
    "sql_not_in_subquery" -> ((s, d) => sql(s, d, notInQ)),
    "sql_scalar_subquery" -> ((s, d) => sql(s, d, scalarQ)),
    "sql_grouping_sets" -> ((s, d) => sql(s, d, groupingSetsQ))
  )

  val oracle: Map[String, String] = Map(
    "sql_q16b_partsupp" -> q16b,
    "sql_q2_min_cost_supplier" -> q2,
    "sql_q9_product_profit" -> q9,
    "sql_q11_important_stock" -> q11,
    "sql_q20_promotion_parts" -> q20,
    "sql_q8_market_share" -> q8,
    "sql_q15_top_supplier" -> q15,
    "sql_q19_disjunctive" -> q19,
    "sql_q6_forecast_revenue" -> q6,
    "sql_q12_priority_lines" -> q12,
    "sql_q13_custdist" -> q13,
    "sql_q14_promo_share" -> q14,
    "sql_q17_small_qty" -> q17,
    "sql_q21_waiting_supplier" -> q21,
    "sql_lateral_topk" -> lateralQ,
    "x8_sql_udf" -> sqlUdfOracle,
    "sql_recursive_cte" -> recursiveQ,
    "sql_q4_priority_exists" -> q4,
    "sql_q16_supplier_cnt" -> q16,
    "sql_q22_no_orders" -> q22,
    "sql_q3_topk" -> q3,
    "sql_q7_volume_shipping" -> q7,
    "sql_q10_returned_topk" -> q10,
    "sql_q18_large_orders" -> q18,
    "sql_q5_local_supplier" -> q5,
    "sql_exists_subquery" -> existsQ,
    "sql_not_in_subquery" -> notInQ,
    "sql_scalar_subquery" -> scalarQ,
    "sql_grouping_sets" -> groupingSetsQ
  )
}

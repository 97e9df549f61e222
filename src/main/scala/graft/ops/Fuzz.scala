package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.util.Random

/** Differential query fuzzer — oracle amplification beyond the
  * hand-authored corpus (SURVEY §7.3 determinism rules baked in).
  *
  * A seeded generator over filters / projections / aggregations / joins
  * on the TPC-H tables emits a MATCHED pair per seed: a DataFrame plan
  * and the equivalent shared-dialect SQL (runs unchanged on Spark SQL
  * and DuckDB). FuzzSuite asserts DataFrame ≡ spark.sql over 120 seeds
  * every test run — a differential check that the declarative surface
  * and the SQL surface agree on arbitrary compositions, not just the
  * curated queries. Fourteen fixed seeds ([[promoted]], one per shape) are
  * first-class `SparkEntry.queries` rows, so the driver's DuckDB gate
  * cross-checks the generator's dialect parity per round.
  *
  * Determinism rules applied (§7.3):
  *  - float REDUCTIONS go through [[Det]] (decimal detour — addition
  *    order differs between engines); fixed arithmetic TREES over
  *    doubles (+, −, ×) are IEEE-deterministic and stay raw
  *  - numeric literals are short decimal strings parsed to double by
  *    both engines' IEEE round-to-nearest — identical values
  *  - no row-order dependence: results compare as multisets and every
  *    projection keeps the row's primary key
  *  - value pools match the corpus (FIXTURES.md) so predicates select
  *    real rows; key predicates use modulo, which is SF-independent
  */
object Fuzz {

  /** One generated query: the DataFrame form, the shared-dialect SQL,
    * and the shape tag (for coverage reporting in FuzzSuite). */
  final case class Built(df: Q, sql: String, shape: String)

  // ---- predicate AST: each node carries both renderings ----
  private final case class Pred(sql: String, col: Column)

  private final case class NumLit(name: String, lits: Seq[String])
  private final case class StrCol(name: String, pool: Seq[String])
  private final case class TableMeta(
      name: String,
      load: (SparkSession, String) => DataFrame,
      nums: Seq[NumLit],
      strs: Seq[StrCol],
      keys: Seq[String],
      dateCol: Option[(String, Seq[String])])

  private val lineitemMeta = TableMeta(
    "lineitem", Tables.lineitem,
    Seq(NumLit("l_quantity", Seq("10", "20", "30", "40")),
        NumLit("l_extendedprice", Seq("20000", "40000", "60000", "80000")),
        NumLit("l_discount", Seq("0.02", "0.04", "0.06", "0.08")),
        NumLit("l_tax", Seq("0.01", "0.03", "0.05", "0.07"))),
    Seq(StrCol("l_returnflag", Seq("A", "N", "R")),
        StrCol("l_linestatus", Seq("O", "F"))),
    Seq("l_orderkey", "l_partkey", "l_suppkey"),
    Some("l_shipdate" ->
      Seq("1996-01-01", "1997-06-01", "1999-01-01", "2000-06-01")))

  private val ordersMeta = TableMeta(
    "orders", Tables.orders,
    Seq(NumLit("o_totalprice", Seq("50000", "150000", "250000", "350000"))),
    Seq(StrCol("o_orderstatus", Seq("O", "F", "P")),
        StrCol("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))),
    Seq("o_orderkey", "o_custkey"),
    Some("o_orderdate" ->
      Seq("1996-01-01", "1997-06-01", "1999-01-01", "2000-06-01")))

  private val customerMeta = TableMeta(
    "customer", Tables.customer,
    Seq(NumLit("c_acctbal", Seq("-500", "1000", "5000", "9000"))),
    Seq(StrCol("c_mktsegment",
      Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))),
    Seq("c_custkey", "c_nationkey"),
    None)

  private def pick[A](r: Random, xs: Seq[A]): A = xs(r.nextInt(xs.length))

  /** Leaf predicate: numeric compare / BETWEEN, string =/<>/IN, key
    * modulo, timestamp compare. All nulls-free columns (TPC-H), so NOT
    * is safe to apply anywhere. */
  private def leaf(r: Random, t: TableMeta): Pred = r.nextInt(5) match {
    case 0 =>
      val c = pick(r, t.nums)
      val litText = pick(r, c.lits)
      val d = litText.toDouble
      pick(r, Seq("<", "<=", ">", ">=")) match {
        case "<"  => Pred(s"${c.name} < $litText", col(c.name) < d)
        case "<=" => Pred(s"${c.name} <= $litText", col(c.name) <= d)
        case ">"  => Pred(s"${c.name} > $litText", col(c.name) > d)
        case ">=" => Pred(s"${c.name} >= $litText", col(c.name) >= d)
      }
    case 1 =>
      val c = pick(r, t.nums)
      val both = r.shuffle(c.lits.toList).take(2).map(_.toDouble).sorted
      val (lo, hi) = (both.head, both.last)
      Pred(s"${c.name} BETWEEN $lo AND $hi", col(c.name).between(lo, hi))
    case 2 =>
      val c = pick(r, t.strs)
      r.nextInt(3) match {
        case 0 =>
          val v = pick(r, c.pool)
          Pred(s"${c.name} = '$v'", col(c.name) === v)
        case 1 =>
          val v = pick(r, c.pool)
          Pred(s"${c.name} <> '$v'", col(c.name) =!= v)
        case 2 =>
          val vs = r.shuffle(c.pool.toList).take(2)
          Pred(s"${c.name} IN (${vs.map(v => s"'$v'").mkString(", ")})",
               col(c.name).isin(vs: _*))
      }
    case 3 =>
      val k = pick(r, t.keys)
      val m = 2 + r.nextInt(8) // 2..9
      val rem = r.nextInt(m)
      Pred(s"($k % $m) = $rem", col(k) % m === rem)
    case 4 => t.dateCol match {
      case Some((name, lits)) =>
        val d = pick(r, lits)
        val op = pick(r, Seq(">=", "<"))
        val sqlP = s"$name $op CAST('$d' AS TIMESTAMP)"
        val c = if (op == ">=") col(name) >= lit(d).cast("timestamp")
                else col(name) < lit(d).cast("timestamp")
        Pred(sqlP, c)
      case None => leaf(r, t)
    }
  }

  private def genPred(r: Random, t: TableMeta, depth: Int): Pred =
    if (depth <= 0) leaf(r, t)
    else r.nextInt(4) match {
      case 0 =>
        val (a, b) = (genPred(r, t, depth - 1), genPred(r, t, depth - 1))
        Pred(s"(${a.sql} AND ${b.sql})", a.col && b.col)
      case 1 =>
        val (a, b) = (genPred(r, t, depth - 1), genPred(r, t, depth - 1))
        Pred(s"(${a.sql} OR ${b.sql})", a.col || b.col)
      case 2 =>
        val a = leaf(r, t)
        Pred(s"(NOT ${a.sql})", !a.col)
      case 3 => leaf(r, t)
    }

  /** Fixed arithmetic tree over two numeric columns (+, −, ×): the same
    * two float64 operands give the same float64 result in any engine —
    * only reductions need the Det detour. */
  private def arith(r: Random, t: TableMeta): (String, Column) = {
    val a = pick(r, t.nums).name
    val b = pick(r, t.nums).name
    r.nextInt(3) match {
      case 0 => (s"($a + $b)", col(a) + col(b))
      case 1 => (s"($a - $b)", col(a) - col(b))
      case 2 => (s"($a * $b)", col(a) * col(b))
    }
  }

  /** Aggregate list: count(*) plus a seeded mix of Det.dsum / min /
    * max / Det.davg over numeric columns. */
  private def aggs(r: Random, t: TableMeta): Seq[(String, Column)] = {
    val base = Seq("COUNT(*) AS cnt" -> count(lit(1)).as("cnt"))
    val extra = (0 until 2 + r.nextInt(2)).map { i =>
      val c = pick(r, t.nums).name
      r.nextInt(4) match {
        case 0 => (s"${Det.Sql.dsum(c)} AS s$i", Det.dsum(col(c)).as(s"s$i"))
        case 1 => (s"MIN($c) AS s$i", min(col(c)).as(s"s$i"))
        case 2 => (s"MAX($c) AS s$i", max(col(c)).as(s"s$i"))
        case 3 => (s"${Det.Sql.davg(c)} AS s$i", Det.davg(col(c)).as(s"s$i"))
      }
    }
    base ++ extra
  }

  /** Generator version: bumped whenever the SHAPE COUNT (or any draw
    * order) changes, because shape = seed % n re-buckets every seed — a
    * seed recorded under an older version silently generates a
    * DIFFERENT query under a newer one. v1 = 6 shapes (r6), v2 = 9
    * shapes (r7), v3 = 12 shapes (r8: temporal trunc/extract + string
    * functions), v4 = 13 shapes (r9: events windows), v5 = 14 shapes
    * (r9: decimal fixed-point arithmetic). Persist
    * (version, seed) pairs together and replay via
    * [[build(seed, recordedVersion)]], which fails loudly on mismatch
    * instead of reproducing the wrong query. */
  val generatorVersion: Int = 7

  /** The shape count — the SINGLE definition `build` buckets by and
    * FuzzPick strides by (FuzzSuite keeps an independent literal pin on
    * purpose: an accidental change must fail a test, not re-derive it). */
  val nShapes: Int = 16

  /** Replay guard for externally recorded seeds: refuses to build a
    * seed recorded under a different generator version. */
  def build(seed: Int, recordedVersion: Int): Built = {
    require(recordedVersion == generatorVersion,
      s"Fuzz.build: seed $seed was recorded under generator v$recordedVersion " +
        s"but this build is v$generatorVersion (shape = seed % n re-bucketed); " +
        "re-pick the seed against the current generator")
    build(seed)
  }

  /** Generate the seed's query pair. Seeds are stable forever WITHIN a
    * shape count: the shape is seed % 16 (java.util.Random's FIRST
    * power-of-2 nextInt is heavily correlated across sequential seeds —
    * measured: seeds 1..40 all gave the same first nextInt(4)) and every
    * inner draw comes from `new Random(seed)` warmed up past the
    * correlated initial state. Round 7 widened 6 → 9 shapes (outer-join
    * null propagation, grouping lattices, EXISTS/IN subqueries), round 8
    * widened 9 → 12 (date_trunc/EXTRACT temporal keys and string-function
    * projections — the timestamp/collation corners where engine dialects
    * drift), round 9 widened 12 → 13 (per-user events windows, so the
    * events dialect corner that r8's corpus drift broke is continuously
    * fuzzed) and then 13 → 14 (decimal fixed-point arithmetic — the
    * money-math corner); each widening re-buckets shape = seed % n, bumps
    * [[generatorVersion]], and re-picks the promoted seeds. */
  def build(seed: Int): Built = {
    require(seed >= 0, s"Fuzz.build: seed must be non-negative, got $seed")
    val r = new Random(seed)
    r.nextLong(); r.nextLong()
    (seed % nShapes) match {
      case 0 => // filter + computed projection on lineitem (keeps the PK)
        val p = genPred(r, lineitemMeta, 1 + r.nextInt(2))
        val (e1s, e1c) = arith(r, lineitemMeta)
        val (e2s, e2c) = arith(r, lineitemMeta)
        Built(
          (s, d) => lineitemMeta.load(s, d).filter(p.col)
            .select(col("l_orderkey"), col("l_linenumber"),
                    e1c.as("e1"), e2c.as("e2")),
          s"SELECT l_orderkey, l_linenumber, $e1s AS e1, $e2s AS e2 " +
            s"FROM lineitem WHERE ${p.sql}",
          "filter_project")
      case 1 => // filtered group-by aggregate on lineitem or orders
        val t = pick(r, Seq(lineitemMeta, ordersMeta))
        val p = genPred(r, t, 1 + r.nextInt(2))
        val g = pick(r, t.strs).name
        val as = aggs(r, t)
        Built(
          (s, d) => t.load(s, d).filter(p.col)
            .groupBy(col(g)).agg(as.head._2, as.tail.map(_._2): _*),
          s"SELECT $g, ${as.map(_._1).mkString(", ")} " +
            s"FROM ${t.name} WHERE ${p.sql} GROUP BY $g",
          "agg_groupby")
      case 2 => // lineitem ⋈ orders, per-priority rollup
        val pl = genPred(r, lineitemMeta, 1)
        val po = genPred(r, ordersMeta, 1)
        Built(
          (s, d) => lineitemMeta.load(s, d).filter(pl.col)
            .join(ordersMeta.load(s, d).filter(po.col),
                  col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("cnt"),
                 Det.dsum(col("l_extendedprice")).as("rev"),
                 min(col("l_quantity")).as("min_qty")),
          "SELECT o_orderpriority, COUNT(*) AS cnt, " +
            s"${Det.Sql.dsum("l_extendedprice")} AS rev, " +
            "MIN(l_quantity) AS min_qty " +
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
            s"WHERE ${pl.sql} AND ${po.sql} GROUP BY o_orderpriority",
          "join_agg")
      case 3 => // orders ⋈ customer, filtered key projection
        val po = genPred(r, ordersMeta, 1)
        val pc = genPred(r, customerMeta, 1)
        Built(
          (s, d) => ordersMeta.load(s, d).filter(po.col)
            .join(customerMeta.load(s, d).filter(pc.col),
                  col("o_custkey") === col("c_custkey"))
            .select(col("o_orderkey"), col("c_custkey"),
                    col("o_totalprice"), col("c_mktsegment")),
          "SELECT o_orderkey, c_custkey, o_totalprice, c_mktsegment " +
            "FROM orders JOIN customer ON o_custkey = c_custkey " +
            s"WHERE ${po.sql} AND ${pc.sql}",
          "join_filter")
      case 4 => // set operation between two filtered key projections
        val (p1, p2) = (genPred(r, ordersMeta, 1), genPred(r, ordersMeta, 1))
        val op = pick(r, Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT"))
        def side(s: SparkSession, d: String, p: Pred) =
          ordersMeta.load(s, d).filter(p.col).select(col("o_orderkey"))
        Built(
          (s, d) => {
            val (a, b) = (side(s, d, p1), side(s, d, p2))
            op match { // SQL set-op semantics: UNION/INTERSECT/EXCEPT dedup
              case "UNION"     => a.union(b).distinct()
              case "UNION ALL" => a.union(b)
              case "INTERSECT" => a.intersect(b)
              case "EXCEPT"    => a.except(b)
            }
          },
          s"SELECT o_orderkey FROM orders WHERE ${p1.sql} " +
            s"$op SELECT o_orderkey FROM orders WHERE ${p2.sql}",
          "set_op")
      case 5 => // window top-k per group (rn cast to INT: DuckDB emits
        // BIGINT for row_number, Spark INT — the cast unifies dialects)
        val p = genPred(r, ordersMeta, 1)
        val g = pick(r, Seq("o_custkey", "o_orderstatus", "o_orderpriority"))
        val k = 1 + r.nextInt(3)
        Built(
          (s, d) => {
            val w = Window.partitionBy(col(g))
              .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
            ordersMeta.load(s, d).filter(p.col)
              .select(col(g), col("o_orderkey"), col("o_totalprice"),
                      row_number().over(w).cast("int").as("rn"))
              .filter(col("rn") <= k)
          },
          s"SELECT $g, o_orderkey, o_totalprice, rn FROM (" +
            s"SELECT $g, o_orderkey, o_totalprice, " +
            "CAST(row_number() OVER (PARTITION BY " + g +
            " ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn " +
            s"FROM orders WHERE ${p.sql}) t WHERE rn <= $k",
          "window_topk")
      case 6 => // LEFT OUTER join with an ON-clause right-side predicate,
        // then a WHERE over the NULLABLE side — the null-propagation
        // corner (IS NULL anti-pattern, COALESCE over a null slot) where
        // outer-join semantics actually bite. The DataFrame twin uses the
        // outer-join identity LEFT JOIN t ON k AND p(t) ≡ LEFT JOIN
        // (t WHERE p) ON k.
        val po = genPred(r, ordersMeta, 1)
        val where: Option[(String, Column)] = r.nextInt(3) match {
          case 0 => Some("o_orderkey IS NULL" -> col("o_orderkey").isNull)
          case 1 => Some("COALESCE(o_totalprice, 0.0) <= 250000.0" ->
            (coalesce(col("o_totalprice"), lit(0.0)) <= 250000.0))
          case 2 => None
        }
        Built(
          (s, d) => {
            val j = customerMeta.load(s, d)
              .join(ordersMeta.load(s, d).filter(po.col),
                    col("c_custkey") === col("o_custkey"), "left_outer")
            where.fold(j)(p => j.filter(p._2))
              .select(col("c_custkey"), col("o_orderkey"),
                      coalesce(col("o_totalprice"), lit(-1.0)).as("tp"),
                      col("o_orderstatus").isNull.cast("int").as("missed"))
          },
          "SELECT c_custkey, o_orderkey, COALESCE(o_totalprice, -1.0) AS tp, " +
            "CAST(o_orderstatus IS NULL AS INTEGER) AS missed " +
            s"FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND ${po.sql}" +
            where.map(p => s" WHERE ${p._1}").getOrElse(""),
          "outer_join")
      case 7 => // ROLLUP/CUBE lattice with grouping() markers — NULL group
        // keys plus the marker columns that disambiguate them from real
        // NULLs, the second null-semantics corner (markers CAST to INT:
        // grouping() is tinyint in Spark, boolean-ish in other dialects).
        val t = pick(r, Seq(lineitemMeta, ordersMeta))
        val p = genPred(r, t, 1)
        val Seq(g1, g2) = t.strs.map(_.name)
        val as = aggs(r, t)
        val form = pick(r, Seq("ROLLUP", "CUBE"))
        Built(
          (s, d) => {
            val base = t.load(s, d).filter(p.col)
            val gd = if (form == "ROLLUP") base.rollup(col(g1), col(g2))
                     else base.cube(col(g1), col(g2))
            val aggCols = as.map(_._2) ++ Seq(
              grouping(col(g1)).cast("int").as("gg1"),
              grouping(col(g2)).cast("int").as("gg2"))
            gd.agg(aggCols.head, aggCols.tail: _*)
          },
          s"SELECT $g1, $g2, ${as.map(_._1).mkString(", ")}, " +
            s"CAST(grouping($g1) AS INTEGER) AS gg1, " +
            s"CAST(grouping($g2) AS INTEGER) AS gg2 " +
            s"FROM ${t.name} WHERE ${p.sql} GROUP BY $form($g1, $g2)",
          "grouping")
      case 8 => // correlated EXISTS / NOT EXISTS / IN / NOT IN over orders —
        // the decorrelation corner. The DataFrame twin is the semi/anti
        // join Catalyst rewrites each form into (NOT IN ≡ anti join here
        // because o_custkey is null-free in this corpus; a nullable
        // subquery side would make NOT IN null-aware and inequivalent).
        val pc = genPred(r, customerMeta, 1)
        val po = genPred(r, ordersMeta, 1)
        val (kw, joinType) = pick(r, Seq(
          ("EXISTS", "left_semi"), ("NOT EXISTS", "left_anti"),
          ("IN", "left_semi"), ("NOT IN", "left_anti")))
        val sub = kw match {
          case "EXISTS" | "NOT EXISTS" =>
            s"$kw (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND ${po.sql})"
          case "IN" =>
            s"c_custkey IN (SELECT o_custkey FROM orders WHERE ${po.sql})"
          case "NOT IN" =>
            s"c_custkey NOT IN (SELECT o_custkey FROM orders WHERE ${po.sql})"
        }
        Built(
          (s, d) => customerMeta.load(s, d).filter(pc.col)
            .join(ordersMeta.load(s, d).filter(po.col),
                  col("c_custkey") === col("o_custkey"), joinType)
            .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal")),
          "SELECT c_custkey, c_mktsegment, c_acctbal FROM customer " +
            s"WHERE ${pc.sql} AND $sub",
          "subquery_semi")
      case 9 => // date_trunc-keyed rollup under a date BETWEEN — the
        // calendar-bucket corner (both engines must truncate the same
        // timestamp to the same bucket boundary; 'week' is excluded:
        // week-start conventions differ across dialects).
        val t = pick(r, Seq(lineitemMeta, ordersMeta))
        val (dcol, dlits) = t.dateCol.get
        val two = r.shuffle(dlits.toList).take(2).sorted
        val (lo, hi) = (two.head, two.last)
        val unit = pick(r, Seq("month", "quarter", "year"))
        val as = aggs(r, t)
        Built(
          (s, d) => t.load(s, d)
            .filter(col(dcol).between(
              lit(lo).cast("timestamp"), lit(hi).cast("timestamp")))
            .groupBy(date_trunc(unit, col(dcol)).as("bucket"))
            .agg(as.head._2, as.tail.map(_._2): _*),
          s"SELECT date_trunc('$unit', $dcol) AS bucket, " +
            s"${as.map(_._1).mkString(", ")} FROM ${t.name} " +
            s"WHERE $dcol BETWEEN CAST('$lo' AS TIMESTAMP) " +
            s"AND CAST('$hi' AS TIMESTAMP) " +
            s"GROUP BY date_trunc('$unit', $dcol)",
          "temporal_trunc")
      case 10 => // EXTRACT group keys (year / year+month / month) under a
        // date edge + a regular predicate — EXTRACT returns different
        // widths per dialect (Spark INT, DuckDB BIGINT), so every key is
        // CAST to INTEGER in the shared text, same as the fz6 rn cast.
        val t = pick(r, Seq(lineitemMeta, ordersMeta))
        val (dcol, dlits) = t.dateCol.get
        val dlit = pick(r, dlits)
        val op = pick(r, Seq(">=", "<"))
        val p = genPred(r, t, 1)
        val parts = pick(r, Seq(Seq("YEAR"), Seq("YEAR", "MONTH"), Seq("MONTH")))
        val as = aggs(r, t)
        val sparkKeys = parts.map {
          case "YEAR"  => year(col(dcol)).as("year_key")
          case "MONTH" => month(col(dcol)).as("month_key")
        }
        val sqlKeys = parts.map(u =>
          s"CAST(EXTRACT($u FROM $dcol) AS INTEGER) AS ${u.toLowerCase}_key")
        val sqlGroup = parts.map(u => s"EXTRACT($u FROM $dcol)")
        val dateP =
          if (op == ">=") col(dcol) >= lit(dlit).cast("timestamp")
          else col(dcol) < lit(dlit).cast("timestamp")
        Built(
          (s, d) => t.load(s, d).filter(dateP && p.col)
            .groupBy(sparkKeys: _*).agg(as.head._2, as.tail.map(_._2): _*),
          s"SELECT ${sqlKeys.mkString(", ")}, ${as.map(_._1).mkString(", ")} " +
            s"FROM ${t.name} WHERE $dcol $op CAST('$dlit' AS TIMESTAMP) " +
            s"AND ${p.sql} GROUP BY ${sqlGroup.mkString(", ")}",
          "temporal_extract")
      case 11 => // string-function projection under a LIKE prefix — the
        // collation/slicing corner (substring indexing is 1-based in both
        // dialects; LIKE is case-sensitive in both; pools are corpus-true
        // so prefixes select real rows).
        val t = pick(r, Seq(customerMeta, ordersMeta))
        val sc = pick(r, t.strs)
        val prefix = pick(r, sc.pool).take(1 + r.nextInt(3))
        val p = genPred(r, t, 1)
        val n = 2 + r.nextInt(4)
        val caseFn = pick(r, Seq("upper", "lower"))
        val caseCol = if (caseFn == "upper") upper(col(sc.name)) else lower(col(sc.name))
        val keys = t.keys.take(2)
        Built(
          (s, d) => t.load(s, d)
            .filter(col(sc.name).like(s"$prefix%") && p.col)
            .select(keys.map(col) ++ Seq(
              substring(col(sc.name), 1, n).as("pre"),
              caseCol.as("cased"),
              concat_ws("#", col(sc.name), substring(col(sc.name), 1, n))
                .as("tagged"),
              length(col(sc.name)).as("len")): _*),
          s"SELECT ${keys.mkString(", ")}, " +
            s"substring(${sc.name}, 1, $n) AS pre, " +
            s"$caseFn(${sc.name}) AS cased, " +
            s"concat_ws('#', ${sc.name}, substring(${sc.name}, 1, $n)) AS tagged, " +
            // length is INT in Spark, BIGINT in DuckDB — cast unifies
            s"CAST(length(${sc.name}) AS INTEGER) AS len " +
            s"FROM ${t.name} WHERE ${sc.name} LIKE '$prefix%' AND ${p.sql}",
          "string_funcs")
      case 12 => // per-user windows over the EVENTS stream — the fuzzed
        // form of the w2–w6/y4 dialect corner (timestamp ordering with
        // the event_id tie-break, LAG null slots, rank-k filters) that
        // round 8's corpus drift broke silently. The shared text reads
        // through an `ev` CTE whose CAST(ts AS TIMESTAMP) is a no-op on
        // both engines whatever physical ts type the corpus vintage
        // carries, so any future drift the loader mishandles fails
        // loudly here, in FuzzSuite, not at the driver.
        val types = Seq("view", "click", "purchase", "signup", "error")
        val subset = r.shuffle(types.toList).take(2 + r.nextInt(2)).sorted
        val typePred =
          s"event_type IN (${subset.map(t => s"'$t'").mkString(", ")})"
        val typeCol = col("event_type").isin(subset: _*)
        val evSql = "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, " +
          "user_id, event_type, value FROM events)"
        def evDf(s: SparkSession, d: String) = Tables.events(s, d)
          .select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"))
        r.nextInt(3) match {
          case 0 => // LAG/LEAD gap projection (null first/last slots)
            val off = 1 + r.nextInt(2)
            Built(
              (s, d) => {
                val w = Window.partitionBy("user_id")
                  .orderBy(col("ts"), col("event_id"))
                evDf(s, d).filter(typeCol)
                  .select(col("user_id"), col("event_id"),
                    lag(col("value"), off).over(w).as("prev_value"),
                    lead(col("event_type"), 1).over(w).as("next_type"),
                    (col("value") -
                      coalesce(lag(col("value"), off).over(w), lit(0.0)))
                      .as("delta"))
              },
              s"WITH $evSql SELECT user_id, event_id, " +
                s"LAG(value, $off) OVER w AS prev_value, " +
                "LEAD(event_type, 1) OVER w AS next_type, " +
                s"value - COALESCE(LAG(value, $off) OVER w, 0.0) AS delta " +
                s"FROM ev WHERE $typePred " +
                "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)",
              "event_window")
          case 1 => // running COUNT/MIN/MAX rows-frame (order-insensitive
            // accumulators only: a running double SUM would hinge on
            // addition order, the one thing §7.3 bans)
            Built(
              (s, d) => {
                val w = Window.partitionBy("user_id")
                  .orderBy(col("ts"), col("event_id"))
                  .rowsBetween(Window.unboundedPreceding, Window.currentRow)
                evDf(s, d).filter(typeCol)
                  .select(col("user_id"), col("event_id"),
                    count(lit(1)).over(w).cast("int").as("n_so_far"),
                    min(col("value")).over(w).as("min_so_far"),
                    max(col("value")).over(w).as("max_so_far"))
              },
              s"WITH $evSql SELECT user_id, event_id, " +
                "CAST(COUNT(*) OVER w AS INTEGER) AS n_so_far, " +
                "MIN(value) OVER w AS min_so_far, " +
                "MAX(value) OVER w AS max_so_far " +
                s"FROM ev WHERE $typePred " +
                "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id " +
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
              "event_window")
          case 2 => // latest-k per user (the y4 latest-wins shape with a
            // rank filter; rn cast to INT as in fz6)
            val k = 2 + r.nextInt(4)
            Built(
              (s, d) => {
                val w = Window.partitionBy("user_id")
                  .orderBy(col("ts").desc, col("event_id").desc)
                evDf(s, d).filter(typeCol)
                  .withColumn("rn", row_number().over(w).cast("int"))
                  .filter(col("rn") <= k)
                  .select(col("user_id"), col("event_id"),
                    col("event_type"), col("rn"))
              },
              s"WITH $evSql SELECT user_id, event_id, event_type, rn FROM (" +
                "SELECT user_id, event_id, event_type, " +
                "CAST(row_number() OVER (PARTITION BY user_id " +
                "ORDER BY ts DESC, event_id DESC) AS INTEGER) AS rn " +
                s"FROM ev WHERE $typePred) t WHERE rn <= $k",
              "event_window")
        }
      case 13 => // decimal fixed-point arithmetic — the money-math corner
        // where engines must agree bit-for-bit: CAST(col AS DECIMAL(18,2))
        // chains under +/-/* (division excluded: result-scale rules are
        // engine-specific), aggregated per low-cardinality key. The
        // decimal math is exact and order-insensitive, so sums need no
        // Det.* rounding; results leave as DOUBLE only at the boundary
        // (§7.3 — one shared rounding, after the exact math).
        val t = lineitemMeta
        val p = genPred(r, t, 1)
        val cols = Seq("l_extendedprice", "l_quantity", "l_tax", "l_discount")
        val i = r.nextInt(cols.length)
        val a = cols(i)
        val b = cols((i + 1 + r.nextInt(cols.length - 1)) % cols.length)
        val op = pick(r, Seq("+", "-", "*"))
        val eSql = s"CAST($a AS DECIMAL(18,2)) $op CAST($b AS DECIMAL(18,2))"
        val eCol = {
          val (ca, cb) = (col(a).cast("decimal(18,2)"),
            col(b).cast("decimal(18,2)"))
          op match {
            case "+" => ca + cb
            case "-" => ca - cb
            case "*" => ca * cb
          }
        }
        val g = pick(r, t.strs).name
        Built(
          (s, d) => t.load(s, d).filter(p.col)
            .groupBy(col(g))
            .agg(count(lit(1)).as("cnt"),
              sum(eCol).cast("double").as("dec_sum"),
              min(eCol).cast("double").as("dec_min"),
              max(eCol).cast("double").as("dec_max")),
          s"SELECT $g, COUNT(*) AS cnt, " +
            s"CAST(SUM($eSql) AS DOUBLE) AS dec_sum, " +
            s"CAST(MIN($eSql) AS DOUBLE) AS dec_min, " +
            s"CAST(MAX($eSql) AS DOUBLE) AS dec_max " +
            s"FROM ${t.name} WHERE ${p.sql} GROUP BY $g",
          "decimal_arith")

      case 14 => // null-safe equality join + IS DISTINCT FROM — the
        // null-semantics corner where engines drift worst: a derived
        // NULLABLE key (NULLIF over a modulo) joined with
        // <=> / IS NOT DISTINCT FROM, so null keys MATCH EACH OTHER
        // (unlike `=`, which drops them), then an IS DISTINCT FROM
        // filter over derived nullable strings (null vs value IS
        // distinct, null vs null is NOT). null_pairs in the output pins
        // that the null-key bucket genuinely joined; Spark plans <=>
        // as an ordinary equi-join key (sort-merge/hash, no BNLJ).
        val t = ordersMeta
        val m = pick(r, Seq(199, 499, 997)) // key-bucket count: bounds
        val sentinel = r.nextInt(m)         //   the join fan-out at SF
        val slice = 2 + r.nextInt(3)        // side-B stride: 2..4
        val pa = genPred(r, t, 1)
        val sc = pick(r, t.strs)
        val sv = pick(r, sc.pool)
        val g = pick(r, t.strs).name
        val kSql = s"NULLIF(o_custkey % $m, $sentinel)"
        val nSql = s"NULLIF(${sc.name}, '$sv')"
        def kCol = nullif(col("o_custkey") % m, lit(sentinel))
        def nCol = nullif(col(sc.name), lit(sv))
        Built(
          (s, d) => {
            val a = t.load(s, d).filter(pa.col)
              .select(col("o_totalprice"), col(g),
                kCol.as("ka"), nCol.as("na"))
            val b = t.load(s, d)
              .filter(col("o_orderkey") % slice === 0)
              .select(kCol.as("kb"), nCol.as("nb"))
            a.join(b, col("ka") <=> col("kb"))
              .filter(!(col("na") <=> col("nb")))
              .groupBy(col(g))
              .agg(count(lit(1)).as("cnt"),
                count(when(col("ka").isNull, 1)).as("null_pairs"),
                Det.dsum(col("o_totalprice")).as("tp_sum"))
          },
          s"SELECT $g, COUNT(*) AS cnt, " +
            "COUNT(CASE WHEN a.ka IS NULL THEN 1 END) AS null_pairs, " +
            s"${Det.Sql.dsum("a.o_totalprice")} AS tp_sum " +
            s"FROM (SELECT o_totalprice, $g, $kSql AS ka, $nSql AS na " +
            s"FROM orders WHERE ${pa.sql}) a " +
            s"JOIN (SELECT $kSql AS kb, $nSql AS nb " +
            s"FROM orders WHERE o_orderkey % $slice = 0) b " +
            "ON a.ka IS NOT DISTINCT FROM b.kb " +
            "WHERE a.na IS DISTINCT FROM b.nb " +
            s"GROUP BY $g",
          "null_semantics")

      case 15 => // HAVING over a COMPUTED group key + a DISTINCT
        // aggregate — the post-aggregation filter corner (HAVING sees
        // aggregate values, not rows) combined with COUNT(DISTINCT),
        // whose planning (Expand vs single-distinct rewrite) differs
        // from plain aggregates and deserves continuous coverage.
        // Thresholds are SF-dependent row counts: the two engines must
        // agree on WHICH groups survive, not that any do.
        val t = pick(r, Seq(lineitemMeta, ordersMeta))
        val m = 3 + r.nextInt(6)
        val k = pick(r, t.keys)
        val k2 = pick(r, t.keys)
        val p = genPred(r, t, 1)
        val nc = pick(r, t.nums).name
        val c = 2 + r.nextInt(8)
        Built(
          (s, d) => t.load(s, d).filter(p.col)
            .groupBy((col(k) % m).as("g"))
            .agg(count(lit(1)).as("cnt"),
              count_distinct(col(k2)).as("nd"),
              Det.dsum(col(nc)).as("sm"))
            .filter(col("cnt") > c),
          s"SELECT $k % $m AS g, COUNT(*) AS cnt, " +
            s"COUNT(DISTINCT $k2) AS nd, ${Det.Sql.dsum(nc)} AS sm " +
            s"FROM ${t.name} WHERE ${p.sql} " +
            s"GROUP BY $k % $m HAVING COUNT(*) > $c",
          "agg_having")
    }
  }

  /** The promoted seeds — one per shape, chosen for non-trivial row
    * counts at sf0.001+ (FuzzSuite prints the coverage table). These
    * sixteen run through the driver's DuckDB gate every round,
    * cross-checking the generator's dialect parity against a second
    * engine. (Re-seeded whenever the shape count widens — latest at
    * 15 → 16: shape = seed % 16, so each name needed a seed in its
    * shape's new residue class — recorded under [[generatorVersion]]
    * 7.) */
  val promoted: Map[String, Int] = Map(
    "fz1_filter_project" -> 16,
    "fz2_agg_groupby" -> 17,
    "fz3_join_agg" -> 18,
    "fz4_join_filter" -> 19,
    "fz5_set_op" -> 20,
    "fz6_window_topk" -> 21,
    "fz7_outer_join" -> 22,
    "fz8_grouping" -> 23,
    "fz9_subquery" -> 24,
    "fz10_temporal_trunc" -> 25,
    "fz11_temporal_extract" -> 42,
    "fz12_string_funcs" -> 27,
    "fz13_event_window" -> 28,
    "fz14_decimal_arith" -> 29,
    "fz15_null_semantics" -> 30,
    "fz16_agg_having" -> 31)

  def queries: Map[String, Q] =
    promoted.map { case (n, seed) => n -> build(seed).df }

  def oracleSql: Map[String, String] =
    promoted.map { case (n, seed) => n -> build(seed).sql }
}

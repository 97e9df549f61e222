package graft

import graft.ops.{Fuzz, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Differential query fuzzing (SURVEY §7.3): every seed's DataFrame plan
  * and shared-dialect SQL must produce the identical multiset of rows
  * and the identical schema. This amplifies the hand-authored oracle
  * corpus with generated compositions of filters, projections,
  * aggregates, set-ops, window top-k, outer joins, grouping lattices,
  * semi/anti subqueries, temporal date_trunc/EXTRACT keys, string
  * functions, per-user events windows, decimal fixed-point
  * arithmetic, null-safe-equality semantics and HAVING/DISTINCT
  * aggregates; the sixteen promoted seeds additionally go through the
  * driver's DuckDB gate (fz1-fz16).
  */
class FuzzSuite extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"

  // \u0001-separated cells: separator-less concatenation could alias
  // ("a", "b1") with ("ab", "1") across a cell boundary and mask a
  // divergence — the one thing this suite exists to catch
  private def canon(df: org.apache.spark.sql.DataFrame): Vector[String] =
    df.collect().map(_.mkString("")).sorted.toVector

  test("120 generated DataFrame/SQL pairs agree (multiset + schema)") {
    Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
    Tables.orders(spark, sf).createOrReplaceTempView("orders")
    Tables.customer(spark, sf).createOrReplaceTempView("customer")
    // the loader-normalized events view: the shared SQL's
    // CAST(ts AS TIMESTAMP) is a no-op here and on DuckDB's raw parquet
    Tables.events(spark, sf).createOrReplaceTempView("events")
    var nonEmpty = 0
    val shapes = scala.collection.mutable.Map.empty[String, Int]
    for (seed <- 1 to 120) {
      val b = Fuzz.build(seed)
      val viaDf = b.df(spark, sf)
      val viaSql = spark.sql(b.sql)
      assert(
        viaDf.schema.map(f => (f.name, f.dataType)) ==
          viaSql.schema.map(f => (f.name, f.dataType)),
        s"seed $seed schema diverged:\n${b.sql}\n" +
          s"df:  ${viaDf.schema.simpleString}\nsql: ${viaSql.schema.simpleString}")
      val (dfRows, sqlRows) = (canon(viaDf), canon(viaSql))
      assert(dfRows == sqlRows,
        s"seed $seed rows diverged (${dfRows.length} vs ${sqlRows.length}):\n${b.sql}")
      if (dfRows.nonEmpty) nonEmpty += 1
      shapes(b.shape) = shapes.getOrElse(b.shape, 0) + 1
    }
    // the generator must neither collapse to one shape nor go all-empty
    assert(shapes.size == 16, s"shape coverage collapsed: $shapes")
    assert(nonEmpty >= 60,
      s"only $nonEmpty/120 seeds returned rows — literals too selective")
    info(s"shapes: $shapes, non-empty: $nonEmpty/120")
  }

  test("promoted seeds keep their shape and return rows") {
    // fz1-fz9 are CORRECTNESS rows; pin that each promoted seed still
    // generates the shape its name claims and is non-trivial at sf0.001
    val want = Map(
      "fz1_filter_project" -> "filter_project",
      "fz2_agg_groupby" -> "agg_groupby",
      "fz3_join_agg" -> "join_agg",
      "fz4_join_filter" -> "join_filter",
      "fz5_set_op" -> "set_op",
      "fz6_window_topk" -> "window_topk",
      "fz7_outer_join" -> "outer_join",
      "fz8_grouping" -> "grouping",
      "fz9_subquery" -> "subquery_semi",
      "fz10_temporal_trunc" -> "temporal_trunc",
      "fz11_temporal_extract" -> "temporal_extract",
      "fz12_string_funcs" -> "string_funcs",
      "fz13_event_window" -> "event_window",
      "fz14_decimal_arith" -> "decimal_arith",
      "fz15_null_semantics" -> "null_semantics",
      "fz16_agg_having" -> "agg_having")
    assert(Fuzz.promoted.keySet == want.keySet)
    for ((name, seed) <- Fuzz.promoted) {
      val b = Fuzz.build(seed)
      assert(b.shape == want(name), s"$name (seed $seed) is shape ${b.shape}")
      assert(b.df(spark, sf).count() > 0, s"$name returns no rows")
    }
  }

  test("generator-version replay guard: stale recorded seeds fail loudly") {
    // same seed, same version → identical query text
    assert(Fuzz.build(21, Fuzz.generatorVersion).sql == Fuzz.build(21).sql)
    // a seed recorded under the r7 generator (9 shapes) must NOT
    // silently reproduce a different query under the current one
    val e = intercept[IllegalArgumentException](Fuzz.build(18, 2))
    assert(e.getMessage.contains("generator v2"))
  }
}

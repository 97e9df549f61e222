package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Y30: declarative data-quality constraint audit (SURVEY §2.9) — the
  * Deequ-shaped pre-sync gate: a sync tool that ships rows into a
  * target with NOT NULL / CHECK / FK constraints needs to know BEFORE
  * the write which rows would bounce, and a data pipeline needs the
  * same checks as a standing contract on every ingest.
  *
  * Execution shape, because it decides whether this is affordable at
  * 100 TB: every ROW-LOCAL check (not-null, set membership, range,
  * regex) compiles to ONE `count(CASE WHEN violated)` column inside a
  * single aggregate — the whole suite of N checks costs one scan and a
  * 1-row result regardless of N. Uniqueness rides the same aggregate as
  * a single-distinct count (Spark plans one extra shuffle for it, no
  * Expand). FK checks are the only joins: violation count = rows whose
  * key misses the dimension — a BROADCAST anti-join per FK (dimensions
  * are the small side by definition; a fact-sized right side would
  * belong to y17's digest machinery instead). The long-format output
  * (one row per constraint) unpivots driver-side from those 1-row
  * aggregates — nothing fact-sized ever leaves the executors.
  */
object Quality {

  sealed trait Check { def name: String }
  /** col must never be null. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null($col)"
  }
  /** col values restricted to a fixed set (nulls count as violations). */
  final case class InSet(col: String, values: Seq[String]) extends Check {
    def name = s"in_set($col)"
  }
  /** closed numeric range [lo, hi]; nulls violate. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($col)"
  }
  /** RE2-safe regex the value must match; nulls violate. */
  final case class Matches(col: String, regex: String) extends Check {
    def name = s"matches($col)"
  }
  /** col must be unique across the table (violations = surplus rows). */
  final case class Unique(col: String) extends Check {
    def name = s"unique($col)"
  }
  /** every non-null col must exist in dim(dimCol) — FK integrity. */
  final case class FkExists(col: String, dim: DataFrame, dimCol: String)
      extends Check {
    def name = s"fk_exists($col)"
  }

  private def violation(c: Check): Option[Column] = c match {
    case NotNull(col)       => Some(col_(col).isNull)
    case InSet(col, vs)     => Some(!col_(col).isin(vs: _*) || col_(col).isNull)
    case InRange(col, lo, hi) =>
      Some(!col_(col).between(lo, hi) || col_(col).isNull)
    case Matches(col, re)   =>
      Some(!col_(col).rlike(re) || col_(col).isNull)
    case _                  => None
  }
  private def col_(n: String) = col(n)

  /** OR of all ROW-LOCAL violation predicates — the per-row routing flag
    * the streaming gate uses (FK/unique checks are table-level and audit
    * the batch, but cannot flag an individual row without their join).
    * Throws if the suite contains no row-local check at all. */
  def violationFlag(checks: Seq[Check]): Column = {
    val vs = checks.flatMap(violation)
    require(vs.nonEmpty,
      "violationFlag: no row-local checks in the suite (not_null / " +
        "in_set / in_range / matches) — nothing can route rows")
    vs.reduce(_ || _)
  }

  /** Run the suite: one row per check — (constraint, violations, total,
    * pass). Deterministic row order (suite order) via an explicit idx. */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rowLocal = checks.flatMap(c => violation(c).map(c.name -> _))
    val uniques = checks.collect { case u: Unique => u }
    val aggCols =
      Seq(count(lit(1)).as("__total")) ++
        rowLocal.zipWithIndex.map { case ((_, v), i) =>
          count(when(v, 1)).as(s"__v$i") } ++
        uniques.zipWithIndex.map { case (u, i) =>
          count_distinct(col(u.col)).as(s"__u$i") }
    val row = df.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val total = row.getAs[Long]("__total")
    // Results are consumed POSITIONALLY (per-kind running counters), not
    // through a name-keyed map: Check.name omits parameters, so two
    // InRange checks on the same column share a name and a map would
    // silently collapse them onto one count.
    var li = 0; var ui = 0
    checks.zipWithIndex.map { case (c, i) =>
      val violations = c match {
        case _: Unique =>
          val v = total - row.getAs[Long](s"__u$ui"); ui += 1; v
        case f: FkExists =>
          df.filter(col(f.col).isNotNull)
            .join(broadcast(f.dim.select(col(f.dimCol).as(f.col)).distinct()),
              Seq(f.col), "left_anti")
            .count()
        case _ =>
          val v = row.getAs[Long](s"__v$li"); li += 1; v
      }
      (i, c.name, violations, total, violations == 0L)
    }.toDF("check_idx", "constraint", "violations", "total", "pass")
  }
}

package graft.sync

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Utility-level sync lifecycle (SURVEY.md §3.1): the reference is a table
  * synchronization utility, so beyond the per-operator surface (§2.9 Y1–Y8)
  * a user needs the composed flow as one call:
  *
  *   diff (full-outer on PK + row digest, classify I/D/U/S)
  *     → apply (source-wins upsert, optional delete of target-only rows)
  *     → validate (re-diff result vs source must show no drift)
  *
  * Source/target are plain DataFrames — parquet snapshots, JDBC reads via
  * [[graft.sources.JdbcSync]], or anything else Spark can scan — so the
  * lifecycle is format-agnostic and every step stays a declarative plan:
  * one shuffle per diff (co-partitioned full-outer join on the key), one
  * anti-join for the apply, no driver-side row data. The only driver
  * materialization is the ≤4-row op-count summary in [[SyncReport]].
  */
object SyncJob {

  /** @param keyCols     primary-key columns (non-null, UNIQUE within each
    *                     side, same on both sides)
    * @param compareCols change-relevant non-key columns for the row digest
    * @param deleteMissing full sync semantics: drop target rows absent
    *                      from source (incremental sync leaves them)
    */
  final case class SyncConfig(
      keyCols: Seq[String],
      compareCols: Seq[String],
      deleteMissing: Boolean = false)

  final case class SyncReport(
      nInsert: Long, nUpdate: Long, nDelete: Long, nSame: Long,
      resultRows: Long, validated: Boolean)

  /** Per-row digest over the compare columns. Hashes the row STRUCTURALLY
    * (JSON-serialized struct, null fields kept) rather than via a
    * delimiter-joined string: with concat_ws("|", ...) the rows
    * ("a|b","c") and ("a","b|c") collide across column boundaries, so a
    * changed row silently classifies as Same and validate() (same digest)
    * cannot catch the drift. JSON quoting/escaping makes every cell
    * boundary unambiguous, and keeping null fields keeps (NULL,"x")
    * distinct from ("x",NULL).
    */
  def rowDigest(cols: Seq[String]): Column =
    // positional aliases (c0, c1, …) keep the digest independent of
    // attribute-name casing, which can differ between sides of a sync
    // (e.g. an unquoted-DDL JDBC table surfacing O_CUSTKEY vs parquet's
    // o_custkey); both sides pass the same compareCols order, so equal
    // rows stay equal under any source naming
    md5(to_json(struct(cols.zipWithIndex.map {
      case (c, i) => col(c).as(s"c$i") }: _*),
      Map("ignoreNullFields" -> "false")))

  /** Y3 generalized: classify every key as I(nsert), D(elete), U(pdate) or
    * S(ame) — one full-outer sort-merge join on the PK.
    */
  def diff(source: DataFrame, target: DataFrame, cfg: SyncConfig): DataFrame = {
    val s = source.select(
      cfg.keyCols.map(k => col(k).as(s"s_$k")) :+
        rowDigest(cfg.compareCols).as("s_hash"): _*)
    val t = target.select(
      cfg.keyCols.map(k => col(k).as(s"t_$k")) :+
        rowDigest(cfg.compareCols).as("t_hash"): _*)
    val cond = cfg.keyCols.map(k => col(s"s_$k") === col(s"t_$k")).reduce(_ && _)
    s.join(t, cond, "full_outer").select(
      cfg.keyCols.map(k => coalesce(col(s"s_$k"), col(s"t_$k")).as(k)) :+
        when(col("t_hash").isNull, "I")
          .when(col("s_hash").isNull, "D")
          .when(col("s_hash") =!= col("t_hash"), "U")
          .otherwise("S").as("op"): _*)
  }

  /** Y5 generalized: source-wins upsert; target-only rows survive unless
    * `deleteMissing`. Column sets must match (introspect first).
    */
  def upsert(source: DataFrame, target: DataFrame, cfg: SyncConfig): DataFrame =
    if (cfg.deleteMissing) source
    else source.unionByName(
      target.join(source.select(cfg.keyCols.map(col): _*),
        cfg.keyCols, "left_anti"))

  /** Column-subset apply — the most common real sync config after PK
    * choice: the target carries columns the sync does NOT own (audit
    * stamps, computed/defaulted columns), so "has this row changed" must
    * be judged on `cfg.compareCols` alone and an apply must (a) ship
    * ONLY rows whose compared subset drifted (I/U under [[diff]]) and
    * (b) never overwrite the target-owned columns — churn confined to
    * them classifies S and ships nothing (the law SyncJobSuite pins).
    *
    * Result schema = target's plus a leading `op` column (the diff
    * class, so callers/oracles can audit what shipped): U rows take the
    * source's compare columns but KEEP the target's other columns; I
    * rows carry source compare values and null target-owned columns; S
    * and (unless `deleteMissing`) D rows pass through untouched.
    *
    * One PK shuffle: the classification and the apply ride the same
    * full-outer sort-merge join — no second pass over either side.
    */
  def applySubset(source: DataFrame, target: DataFrame,
                  cfg: SyncConfig): DataFrame = {
    val sCols = (cfg.keyCols ++ cfg.compareCols).distinct
    val s = source.select(
      sCols.map(c => col(c).as(s"s_$c")) :+
        rowDigest(cfg.compareCols).as("s_hash"): _*)
    val tAll = target.columns.toSeq
    val t = target.select(
      tAll.map(c => col(c).as(s"t_$c")) :+
        rowDigest(cfg.compareCols).as("t_hash"): _*)
    val cond = cfg.keyCols.map(k => col(s"s_$k") === col(s"t_$k")).reduce(_ && _)
    val op = when(col("t_hash").isNull, "I")
      .when(col("s_hash").isNull, "D")
      .when(col("s_hash") =!= col("t_hash"), "U")
      .otherwise("S")
    val shipped = op.isin("I", "U")
    s.join(t, cond, "full_outer")
      .select(
        cfg.keyCols.map(k => coalesce(col(s"s_$k"), col(s"t_$k")).as(k)) ++
          Seq(op.as("op")) ++
          tAll.filterNot(cfg.keyCols.contains).map { c =>
            if (cfg.compareCols.contains(c))
              when(shipped, col(s"s_$c")).otherwise(col(s"t_$c")).as(c)
            else col(s"t_$c").as(c) // target-owned: never overwritten
          }: _*)
      .filter(if (cfg.deleteMissing) col("op") =!= "D" else lit(true))
  }

  /** Y6 generalized: the applied result must re-diff clean against the
    * source — no I (missing row), no U (stale row), and no D when the sync
    * deletes; D rows are expected leftovers for incremental syncs.
    */
  def validate(source: DataFrame, result: DataFrame, cfg: SyncConfig): Boolean = {
    val bad = diff(source, result, cfg)
      .filter(col("op") === "I" || col("op") === "U" ||
        (if (cfg.deleteMissing) col("op") === "D" else lit(false)))
    bad.isEmpty
  }

  /** The composed lifecycle; returns the applied result plus a report.
    *
    * Exactly two jobs: the pre-apply op-count summary (≤4-row collect)
    * and ONE validation pass whose `observe()` metrics
    * (CollectMetricsExec) yield drift counts AND the result cardinality
    * from the same scan — the re-diff is a full outer join, so its rows
    * partition into I (source-only ⇒ missing from result) and everything
    * else (= exactly the result's rows); a separate result.count() job
    * would rescan the apply plan to learn a number the validation pass
    * already saw. That identity — and the whole diff classification —
    * requires PKs UNIQUE on both sides (SyncConfig's contract): with
    * duplicate keys the join multiplies rows and the reported
    * `resultRows` diverges from the actual result cardinality. Don't
    * copy the count(op != 'I') substitution into a context without that
    * invariant.
    */
  def run(source: DataFrame, target: DataFrame,
          cfg: SyncConfig): (DataFrame, SyncReport) = {
    val ops = diff(source, target, cfg).groupBy("op").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val result = upsert(source, target, cfg)
    val obs = org.apache.spark.sql.Observation()
    val valDiff = diff(source, result, cfg).observe(obs,
      count(when(col("op") === "I", 1)).as("n_missing"),
      count(when(col("op") === "U", 1)).as("n_stale"),
      count(when(col("op") === "D", 1)).as("n_extra"),
      count(when(col("op") =!= "I", 1)).as("n_result_rows"))
    valDiff.foreach(_ => ()) // one action; metrics land in obs
    val m = obs.get
    val validated = m("n_missing") == 0L && m("n_stale") == 0L &&
      (!cfg.deleteMissing || m("n_extra") == 0L)
    val report = SyncReport(
      nInsert = ops.getOrElse("I", 0L), nUpdate = ops.getOrElse("U", 0L),
      nDelete = ops.getOrElse("D", 0L), nSame = ops.getOrElse("S", 0L),
      resultRows = m("n_result_rows").asInstanceOf[Long],
      validated = validated)
    (result, report)
  }
}

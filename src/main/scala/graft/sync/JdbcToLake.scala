package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.JdbcSync
import graft.sources.JdbcSync.{JdbcConfig, ReadPartitioning}

/** Y53: JDBC → LAKE CAPTURE — the PULL half of the reference's job
  * ([INFERRED] SURVEY §3.1: the reference extracts from a SQL-server
  * source before it loads anywhere). [[LakeToJdbc]] ships the lake's
  * changes OUT; this captures a JDBC source's changes IN, so the two
  * compose into the reference's actual end-to-end (source DB → staging
  * lake → target DB — `y54_roundtrip_sync`).
  *
  * Capture here is SNAPSHOT-DIFF: one range-partitioned parallel scan
  * of the source (S4) full-outer-joined against the lake's live
  * version on the key — the y3 idiom — classifying I/U/D, then applied
  * through the churn-pruned cow path (y38) as a new published version.
  * Three honesty notes, each a real sync-tool trade:
  *
  *  - **The scan is the price of a generic source.** Server-side
  *    change tracking (MS-SQL CHANGE_TRACKING, Debezium, a trigger
  *    journal) would replace the diff with a delta read; the engine
  *    already models that seam (Y4 change-log apply, Y29 bootstrap
  *    handoff, Z3 streaming CDC) — snapshot-diff is the fallback that
  *    works against ANY JDBC endpoint with nothing installed on it.
  *    The diff itself is ONE full-outer sort-merge join (the y3
  *    shape), and everything downstream of it is churn-sized.
  *  - **A quiet tick publishes NOTHING.** An empty diff returns
  *    `noop` without minting a version — version history stays
  *    proportional to real change, not to the schedule's cadence.
  *  - **Validation certifies against the CURRENT source.** The final
  *    digest compare re-reads the source, so a row that moved DURING
  *    capture surfaces as drift (caught next tick, or loudly here) —
  *    the same read-skew any snapshot-based extractor has; the
  *    certificate names it instead of hiding it.
  *
  * Identifier casing mirrors [[LakeToJdbc]] in reverse: `lakeName`
  * maps source column names (unquoted-DDL UPPER on Derby/T-SQL) to
  * the lake's lowercase parquet convention. */
object JdbcToLake {

  /** One capture tick's certificate. `version` is the lake version the
    * tick left live (unchanged for `noop`). */
  final case class CaptureReport(
      mode: String, version: Int,
      nInsert: Long, nUpdate: Long, nDelete: Long, validated: Boolean)

  /** Key bounds for the range-partitioned source scan — one indexed
    * MIN/MAX probe, never a table scan. */
  private def keyBounds(cfg: JdbcConfig, keyCol: String): (Long, Long) = {
    require(keyCol.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"keyBounds: invalid key identifier '$keyCol'")
    Class.forName(cfg.driver)
    val conn =
      if (cfg.user.isEmpty) java.sql.DriverManager.getConnection(cfg.url)
      else java.sql.DriverManager.getConnection(cfg.url, cfg.user,
        cfg.password)
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT MIN($keyCol), MAX($keyCol) FROM ${cfg.table}")
      rs.next()
      val lo = rs.getLong(1); val hi = rs.getLong(2)
      if (rs.wasNull()) (0L, 1L) else (lo, hi)
    } finally conn.close()
  }

  /** The source snapshot under lake naming, scanned with `readers`
    * range partitions so a large source table doesn't funnel through
    * one task. */
  private def sourceSnapshot(s: SparkSession, cfg: JdbcConfig,
      key: String, lakeName: String => String,
      jdbcName: String => String, readers: Int): DataFrame = {
    val (lo, hi) = keyBounds(cfg, jdbcName(key))
    val raw = JdbcSync.readTable(s, cfg,
      Some(ReadPartitioning(jdbcName(key), lo, hi + 1, readers)))
    raw.select(raw.columns.toSeq.map(c => col(c).as(lakeName(c))): _*)
  }

  /** One scheduled capture tick: `bootstrap` (no published lake version
    * yet — the snapshot becomes v1 with its pruning manifest),
    * `incremental` (snapshot-diff → cow publish of v+1; cost downstream
    * of the diff ∝ churn), or `noop` (empty diff, no version minted).
    * Replay-convergent: a crash after the cow publish but before the
    * caller observed it re-runs the diff against the NEW live version
    * and finds nothing left to apply. */
  def capture(s: SparkSession, cfg: JdbcConfig, lakeRoot: String,
      key: String, lakeName: String => String = _.toLowerCase,
      jdbcName: String => String = _.toUpperCase,
      readers: Int = 8): CaptureReport = {
    val snap = sourceSnapshot(s, cfg, key, lakeName, jdbcName, readers)
    if (!graft.ops.Sync.hasPublished(s, lakeRoot)) {
      require(graft.ops.Sync.publish(s,
        snap.repartitionByRange(readers, col(key))
          .sortWithinPartitions(key),
        lakeRoot, 1, _.head(1).nonEmpty),
        s"capture: bootstrap publish refused under $lakeRoot")
      graft.ops.Sync.writeFileStats(s, s"$lakeRoot/v1", key)
      val (_, live) = graft.ops.Sync.readPublishedMor(s, lakeRoot, key)
      val ok = validateAgainstSource(s, live, key, cfg, lakeName,
        jdbcName, readers)
      require(ok, "capture: bootstrap left drift vs the source")
      // bootstrap row count from the just-written manifest (exact by
      // construction: fresh version, no DV) — saves one count job
      CaptureReport("bootstrap", 1,
        graft.ops.Sync.manifestRowCount(s, lakeRoot, 1)
          .getOrElse(live.count()), 0, 0, ok)
    } else {
      val (vname, live) = graft.ops.Sync.readPublishedMor(s, lakeRoot, key)
      val v = vname.stripPrefix("v").toInt
      val dataCols = live.columns.toSeq.filterNot(_ == key)
      val l = live.select(col(key) +: lit(true).as("__l") +:
        dataCols.map(c => col(c).as(s"pre_$c")): _*)
      val r = snap.select(col(key) +: lit(true).as("__r") +:
        dataCols.map(c => col(c).as(s"post_$c")): _*)
      val differs = dataCols.map(c =>
        !(col(s"pre_$c") <=> col(s"post_$c"))).reduce(_ || _)
      // the snapshot-diff is the tick's one O(churn+table) join; it
      // feeds the emptiness decision, the op counts AND the cow apply —
      // pre-r14 each consumer re-ran it (two more source pulls over the
      // wire per tick). Persist the churn-sized result; ONE groupBy
      // action materializes it and answers the noop decision (the old
      // separate isEmpty probe was a fourth evaluation).
      val batch = l.join(r, Seq(key), "full_outer")
        .withColumn("op",
          when(col("__l").isNull, lit("I"))
            .when(col("__r").isNull, lit("D"))
            .when(differs, lit("U")))
        .filter(col("op").isNotNull)
        .select(col("op") +: col(key) +: dataCols.map(c =>
          // post-image for I/U; a D row only contributes its key to
          // the cow prune, its carried values are never read back
          when(col("op") === "D", col(s"pre_$c"))
            .otherwise(col(s"post_$c")).as(c)): _*)
        .withColumn("version", lit(v.toLong))
        .persist()
      try {
        val obs = batch.groupBy("op").count().collect()
          .map(row => row.getString(0) -> row.getLong(1)).toMap
        if (obs.isEmpty)
          CaptureReport("noop", v, 0, 0, 0, validated = true)
        else {
          require(graft.ops.Sync.cowApplyChanges(s, lakeRoot, v, v + 1,
            key, batch).published,
            s"capture: cow publish v$v→v${v + 1} refused")
          val (_, newLive) = graft.ops.Sync.readPublishedMor(s, lakeRoot, key)
          val ok = validateAgainstSource(s, newLive, key, cfg, lakeName,
            jdbcName, readers)
          require(ok, s"capture: v${v + 1} left drift vs the source")
          CaptureReport("incremental", v + 1, obs.getOrElse("I", 0L),
            obs.getOrElse("U", 0L), obs.getOrElse("D", 0L), ok)
        }
      } finally batch.unpersist(blocking = false)
    }
  }

  private def validateAgainstSource(s: SparkSession, live: DataFrame,
      key: String, cfg: JdbcConfig, lakeName: String => String,
      jdbcName: String => String, readers: Int): Boolean = {
    val snap = sourceSnapshot(s, cfg, key, lakeName, jdbcName, readers)
    SyncJob.validate(snap, live,
      SyncJob.SyncConfig(Seq(key),
        live.columns.toSeq.filterNot(_ == key), deleteMissing = true))
  }
}

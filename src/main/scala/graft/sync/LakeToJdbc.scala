package graft.sync

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.JdbcSync
import graft.sources.JdbcSync.JdbcConfig

/** Y48: LAKE → JDBC INCREMENTAL SYNC — the flagship composition that
  * closes the loop between the repo's two halves. The reference's job
  * is incremental table synchronization into an MS-SQL-shaped target
  * ([INFERRED] SURVEY §3.1); here that job runs end-to-end ON THE
  * ENGINE'S OWN TRANSACTIONAL STORAGE: the published lake (y36–y46) is
  * the source of record, the y41 change-data-feed is the delta
  * extractor, and the dialected MERGE/DELETE writers are the apply
  * path.
  *
  *   lake v_from ──(already synced)──► JDBC target
  *   lake v_to   ──[[graft.ops.Sync.lakeChanges]]──► CDF (I/U/D, net)
  *          CDF ──[[JdbcSync.applyChangeFeed]]──► MERGE/DELETE batches
  *       target ──[[SyncJob.validate]] vs lake v_to ──► drift == 0
  *
  * Why this shape survives 100 TB:
  *  - the DELTA, not the table, crosses the wire: y41 diffs only files
  *    that changed between the versions (manifest-pruned — a self-diff
  *    scans ZERO files), so cost ∝ churn. A nightly 0.1 % churn on a
  *    100 TB table ships ~100 GB of MERGEs, not 100 TB of reloads;
  *  - the apply is retry-idempotent (MERGE on key; DELETE of an absent
  *    key is a no-op), so task retries and whole-feed replays land on
  *    the same state — exactly-once without target-side transactions
  *    spanning the job;
  *  - validation is ONE full-outer digest diff ([[SyncJob.validate]]),
  *    the same certificate the reference's validate step emits — and
  *    it reads the lake side from the published version dir, so the
  *    certificate names an immutable snapshot, not a moving table.
  *
  * Identifier casing: unquoted DDL folds identifiers UPPER in
  * Derby/DB2 and is case-preserving-but-insensitive in T-SQL, while
  * the lake keeps lowercase parquet names. `jdbcName` maps lake →
  * target names at the boundary (default: uppercase, the unquoted-DDL
  * convention [[SyncJob.rowDigest]] documents); Spark's default
  * case-insensitive resolution makes the validation diff line the two
  * spellings up without renames.
  */
object LakeToJdbc {

  /** One incremental sync's certificate: the net CDF op counts that
    * were applied, the file-level scan proof (`scannedFiles` out of
    * `totalFiles` — the manifest prune at work), and the post-apply
    * drift validation. */
  final case class LakeSyncReport(
      fromVersion: Int, toVersion: Int,
      nInsert: Long, nUpdate: Long, nDelete: Long,
      scannedFiles: Int, totalFiles: Int,
      validated: Boolean)

  /** Seed the target with a published lake version — the one-time full
    * load before the incremental cadence starts. Goes through the
    * retry-idempotent MERGE (not a plain append) so a died-and-retried
    * seed never duplicates; the table must already exist (create it
    * with a 0-row [[JdbcSync.writeTable]] overwrite, which also fixes
    * the column casing the incremental feed will bind against). */
  def seed(s: SparkSession, lakeRoot: String, version: Int, key: String,
      cfg: JdbcConfig, jdbcName: String => String = _.toUpperCase,
      dialect: MergeSql.Dialect = MergeSql.Derby,
      writers: Int = 1, bulk: Boolean = false): Long = {
    val snap = graft.ops.Sync.readVersionDir(s, s"$lakeRoot/v$version")
    val up = snap.select(snap.columns.toSeq
      .map(c => col(c).as(jdbcName(c))): _*)
    // `bulk` = batched plain INSERTs — the retry-FREE case writeTable's
    // own scaladoc carves out: a seed lands in a fresh, just-created
    // table and is validated before the incremental cadence starts, so
    // a died-and-retried seed is re-run from TRUNCATE/empty, not
    // resumed. n× faster than the per-row MERGE probe and the right
    // default for a first full load; keep bulk=false when resuming a
    // partial seed into a non-empty target.
    if (bulk)
      JdbcSync.writeTable(
        up.repartitionByRange(writers, col(jdbcName(key))),
        cfg, org.apache.spark.sql.SaveMode.Append)
    else
      JdbcSync.idempotentAppend(
        up.repartitionByRange(writers, col(jdbcName(key))),
        cfg, jdbcName(key), dialect)
    snap.count()
  }

  /** One incremental step: extract the net CDF between two published
    * versions, apply it to the target, validate the target against the
    * destination version's content. Replay-idempotent end to end —
    * re-running the same step (crash after apply, before the caller
    * recorded the new watermark) re-MERGEs/re-DELETEs into the same
    * state and re-validates clean. */
  /** `writers` = JDBC apply parallelism (transactions run per
    * partition). Default 1: correct on ANY target, required on
    * embedded Derby, whose row-lock escalation deadlocks concurrent
    * MERGE transactions on one table. A server-grade target (MS-SQL
    * with HOLDLOCK merges) takes 4–8; the feed is range-partitioned by
    * key so concurrent writers touch DISJOINT key ranges — the feed is
    * churn-sized, so even writers=1 moves only the delta. */
  def incrementalSync(s: SparkSession, lakeRoot: String,
      fromVersion: Int, toVersion: Int, key: String, cfg: JdbcConfig,
      jdbcName: String => String = _.toUpperCase,
      dialect: MergeSql.Dialect = MergeSql.Derby,
      writers: Int = 1): LakeSyncReport = {
    val cdf = graft.ops.Sync.lakeChanges(s, lakeRoot, fromVersion,
      toVersion, key)
    // one churn-sized pass: per-op counts via observe on the SAME scan
    // that feeds the JDBC writers (no second extraction job)
    val obs = org.apache.spark.sql.Observation()
    val feed = cdf.changes.select(
        (col("op") +: cdf.changes.columns.filterNot(_ == "op").toSeq
          .map(c => col(c).as(jdbcName(c)))): _*)
      .repartitionByRange(writers, col(jdbcName(key)))
      .observe(obs,
        count(when(col("op") === "I", 1)).as("nI"),
        count(when(col("op") === "U", 1)).as("nU"),
        count(when(col("op") === "D", 1)).as("nD"))
    JdbcSync.applyChangeFeed(feed, cfg, jdbcName(key), "op", dialect)
    val m = obs.get
    // drift certificate: the target must now equal the published v_to
    // snapshot exactly (deleteMissing = true — applied deletes mean
    // target-only leftovers are drift, not expected residue)
    val lake = graft.ops.Sync.readVersionDir(s, s"$lakeRoot/v$toVersion")
    val compareCols = lake.columns.toSeq.filterNot(_ == key)
    val ok = SyncJob.validate(lake,
      JdbcSync.readTable(s, cfg, None),
      SyncJob.SyncConfig(Seq(key), compareCols, deleteMissing = true))
    LakeSyncReport(fromVersion, toVersion,
      m("nI").asInstanceOf[Long], m("nU").asInstanceOf[Long],
      m("nD").asInstanceOf[Long],
      cdf.scannedFrom + cdf.scannedTo, cdf.totalFrom + cdf.totalTo,
      validated = ok)
  }

  /** Y48b: one incremental step into an SCD2 HISTORY target
    * ([[JdbcSync.applyScd2Feed]]) — the warehouse shape where the
    * target keeps every version of the tracked attribute instead of
    * overwriting. The lake's DESTINATION VERSION NUMBER is the SCD2
    * clock (`valid_from`/`valid_to` hold version numbers): one
    * monotone, replay-stable stamp for the whole step, so re-running a
    * step can neither regress the open row nor duplicate history.
    * Validation: the target's `is_current = 1` slice must equal the
    * published v_to projection — the same drift certificate as the
    * flat sync, over the history table's open edge. */
  def incrementalScd2(s: SparkSession, lakeRoot: String,
      fromVersion: Int, toVersion: Int, key: String, valueCol: String,
      cfg: JdbcConfig, jdbcName: String => String = _.toUpperCase,
      dialect: MergeSql.Dialect = MergeSql.Derby,
      writers: Int = 1): LakeSyncReport = {
    val cdf = graft.ops.Sync.lakeChanges(s, lakeRoot, fromVersion,
      toVersion, key)
    val obs = org.apache.spark.sql.Observation()
    val feed = cdf.changes.select(col("op"),
        col(key).as(jdbcName(key)), col(valueCol).as(jdbcName(valueCol)),
        lit(toVersion.toLong).as("ver"))
      .repartitionByRange(writers, col(jdbcName(key)))
      .observe(obs,
        count(when(col("op") === "I", 1)).as("nI"),
        count(when(col("op") === "U", 1)).as("nU"),
        count(when(col("op") === "D", 1)).as("nD"))
    JdbcSync.applyScd2Feed(feed, cfg, jdbcName(key), jdbcName(valueCol),
      "op", "ver", dialect)
    val m = obs.get
    val lake = graft.ops.Sync.readVersionDir(s, s"$lakeRoot/v$toVersion")
      .select(key, valueCol)
    val current = JdbcSync.readTable(s, cfg, None)
      .filter(col("is_current") === 1)
      .select(jdbcName(key), jdbcName(valueCol))
    val ok = SyncJob.validate(lake, current,
      SyncJob.SyncConfig(Seq(key), Seq(valueCol), deleteMissing = true))
    LakeSyncReport(fromVersion, toVersion,
      m("nI").asInstanceOf[Long], m("nU").asInstanceOf[Long],
      m("nD").asInstanceOf[Long],
      cdf.scannedFrom + cdf.scannedTo, cdf.totalFrom + cdf.totalTo,
      validated = ok)
  }
}

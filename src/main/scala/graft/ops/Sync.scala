package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Table-sync composite operators (SURVEY.md §2.9) — the reference's
  * capability core re-expressed Spark-first. The reference is an MS-SQL
  * table-sync utility (BASELINE.md; source unavailable, SURVEY §0), so the
  * operators are: snapshot copy, snapshot diff, change-log apply
  * (latest-wins), upsert/merge, sync validation, SCD2 history.
  *
  * The "source" table is a deterministic mutation of `orders` (deletes:
  * key%10=0, updates: key%7=0, inserts: key%13=0 re-keyed +10M) built with
  * the same expressions in Spark and in the oracle CTE, so every operator
  * is fully hash-checked against DuckDB.
  *
  * Scale design: every operator is a single equi-shuffle on the PK (join or
  * window), no driver-side state; at 100 TB the diff/upsert are plain
  * sort-merge joins that AQE can skew-split, and the change-log apply is a
  * window over one shuffle — the same shapes Spark uses for TB-scale MERGE.
  */
object Sync {

  /** Deterministic mutated view of orders — the sync "source" side. */
  def sourceView(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val kept = o.filter(col("o_orderkey") % 10 =!= 0)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 7 === 0, lit("F")).otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 1000d)
          .otherwise(col("o_totalprice")))
    val inserted = o.filter(col("o_orderkey") % 13 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("O"))
    kept.unionByName(inserted)
  }

  /** Deterministic mutated view of customer — the DIMENSION drift side
    * (y15's ΔB): every 11th customer changes market segment. */
  def custView(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).withColumn("c_mktsegment",
      when(col("c_custkey") % 11 === 0, lit("MOVED"))
        .otherwise(col("c_mktsegment")))

  /** Same customer mutation as a DuckDB CTE (lockstep with custView). */
  val custCte: String =
    """csrc AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 11 = 0 THEN 'MOVED' ELSE c_mktsegment END AS c_mktsegment
      |  FROM customer)""".stripMargin

  /** Same mutation as a DuckDB CTE (keep in lockstep with sourceView). */
  val sourceCte: String =
    """src AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 7 = 0 THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
      |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 10 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 10000000, o_custkey, 'O', o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 13 = 0
      |)""".stripMargin

  /** Cross-engine row hash over the sync-relevant columns.
    *
    * NOTE: concat_ws can collide across column boundaries (("a|b","c") ≡
    * ("a","b|c")); it is kept here ONLY because the scored oracle queries
    * need a digest both engines spell identically over these specific
    * columns (whose values cannot contain '|'). The production form is
    * [[graft.sync.SyncJob.rowDigest]] — a JSON-struct digest with
    * unambiguous cell boundaries — do not copy this one into new code.
    */
  private def rowHash(prefix: String => org.apache.spark.sql.Column) =
    md5(concat_ws("|",
      prefix("o_custkey"), prefix("o_orderstatus"),
      prefix("o_totalprice").cast("decimal(18,2)").cast("string"),
      prefix("o_orderpriority")))

  private val rowHashSql = (a: String) =>
    s"md5(concat_ws('|', $a.o_custkey, $a.o_orderstatus, " +
    s"CAST(CAST($a.o_totalprice AS DECIMAL(18,2)) AS VARCHAR), $a.o_orderpriority))"

  /** y12/y16 shared per-partition rollup: ONE (count, keyed-digest) row
    * per order_year. The digest is the y6 idiom with the PK folded in
    * (see y12's comment for why the PK must be inside it); a single
    * definition so y12's plan and y16's execution can never
    * desynchronize from each other or from their oracle CTEs. */
  private def partitionSide(df: DataFrame, rows: String, dig: String) = {
    val keyedHash = md5(concat_ws("|",
      col("o_orderkey"), rowHash(c => col(c))))
    df.groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(count(lit(1)).as(rows),
        sum(pmod(conv(substring(keyedHash, 1, 15), 16, 10)
          .cast("long"), lit(1000000000L))).as(dig))
  }

  /** Deterministic mutated lineitem — the CHILD side of y17's source,
    * FK-consistent with [[sourceView]] by construction: children of
    * deleted orders (key%10=0) vanish, inserted orders (the +10M rekey
    * of key%13=0) bring re-keyed copies of their children, and every
    * 9th surviving order's lines get a quantity bump — a CHILD-ONLY
    * change whose parent row is untouched, so the child's own digest
    * compare (not the parent's) must flag those partitions. Projected
    * to PK (l_orderkey, l_linenumber) + the digest payload. */
  def lineSourceView(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("l_orderkey", "l_linenumber", "l_partkey",
      "l_quantity", "l_extendedprice", "l_returnflag").map(col)
    val l = Tables.lineitem(s, d)
    val kept = l.filter(col("l_orderkey") % 10 =!= 0)
      .withColumn("l_quantity",
        when(col("l_orderkey") % 9 === 0, col("l_quantity") + 5d)
          .otherwise(col("l_quantity")))
      .select(cols: _*)
    val inserted = l.filter(col("l_orderkey") % 13 === 0)
      .withColumn("l_orderkey", col("l_orderkey") + 10000000L)
      .select(cols: _*)
    kept.unionByName(inserted)
  }

  /** Same child mutation as a DuckDB CTE (lockstep with lineSourceView). */
  val lineSourceCte: String =
    """lsrc AS (
      |  SELECT l_orderkey, l_linenumber, l_partkey,
      |    CASE WHEN l_orderkey % 9 = 0 THEN l_quantity + 5.0 ELSE l_quantity END AS l_quantity,
      |    l_extendedprice, l_returnflag
      |  FROM lineitem WHERE l_orderkey % 10 <> 0
      |  UNION ALL
      |  SELECT l_orderkey + 10000000, l_linenumber, l_partkey, l_quantity,
      |    l_extendedprice, l_returnflag
      |  FROM lineitem WHERE l_orderkey % 13 = 0)""".stripMargin

  /** y17 child rollup: ONE (count, keyed-digest) row per parent
    * order_year. The child's partition key is the PARENT's (that is what
    * FK-consistent partitioning means), so the year is derived through
    * the FK — each side's child joins ITS OWN side's parent, which is
    * the one join a child-table sync cannot avoid (in prod you
    * denormalize the partition column onto the child or bucket both
    * tables on the FK; BucketingSuite pins that shape). Digest is the
    * y12 idiom with the composite PK folded in. */
  /** Materialize a plan-persisting operator's result and release the
    * caches it pinned — the library-caller companion to
    * [[dirtyPartitionSync]] / [[fkConsistentSync]] /
    * [[fkConsistentSyncMulti]] / [[hierarchicalDigestNarrow]], whose
    * ≤|years|-row planning DataFrames persist because they feed several
    * consumers of the SAME returned (lazy) plan and therefore cannot be
    * unpersisted inside the operator. Bench/Verify sweep caches after
    * every query; a direct caller should go through this instead:
    *
    *   val rows = Sync.collectAndSweep(Sync.fkConsistentSync(...))
    *
    * The sweep is session-wide (CacheManager + explicit RDD persists) —
    * callers holding their OWN caches across the call should unpersist
    * the operator's plan selectively instead. */
  /** Y36 staged-publish primitives: write → validate → rename → pointer
    * swap. A reader NEVER lists data directories; it resolves the tiny
    * `_CURRENT` pointer file and reads exactly that versioned dir (the
    * version-hint idiom). Publish order makes every failure mode safe:
    * data lands in `_staging_v{n}` (invisible — no reader resolves it),
    * validation runs on the RE-READ staged files (catches write
    * corruption, not just input bugs), only then the dir renames to
    * `v{n}` and the pointer swaps. A publish that dies or fails
    * validation before the pointer swap leaves the previous version
    * fully live and at worst an unreferenced staging dir (GC-able).
    * The pointer swap itself is write-tmp → delete → rename; on HDFS/
    * object stores with atomic rename-overwrite it is one rename —
    * the delete+rename pair here is the local-FS approximation
    * (documented, not hidden). */
  /** Fresh embedded-Derby/lake roots per y48 invocation: Derby's boot
    * registry keys databases by path for the JVM's lifetime, so a
    * re-run (bench pass 2) must not reuse a deleted DB directory. */
  private val y48Runs = new java.util.concurrent.atomic.AtomicLong()

  private[graft] def publish(s: SparkSession, df: DataFrame, root: String,
      version: Int, validate: DataFrame => Boolean): Boolean = {
    val staging = s"$root/_staging_v$version"
    df.write.mode("overwrite").parquet(staging)
    publishStagedDir(s, root, version, validate)
  }

  /** Validate + rename + pointer-swap an ALREADY-POPULATED
    * `_staging_v{n}` dir — the tail of [[publish]], exposed so callers
    * that assemble a version from mixed sources (y38's rewritten +
    * verbatim-copied files) still go through the one swap protocol. */
  private[graft] def publishStagedDir(s: SparkSession, root: String,
      version: Int, validate: DataFrame => Boolean): Boolean = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    val staging = new Path(s"$root/_staging_v$version")
    // validation sees the version a READER will: manifest-RESOLVED
    // (zero-copy carried files live in older version dirs; rows minted
    // for v{n} still sit in staging until the rename). A manifest-less
    // staging (plain snapshot publish) reads directly, as ever.
    def stagedView: DataFrame =
      if (fs.exists(new Path(s"$staging/_file_stats")))
        readResolved(s, root, staging.getName,
          versionSchema(s, staging.toString))
      else s.read.parquet(staging.toString)
    if (!validate(stagedView)) {
      fs.delete(staging, true) // abort BEFORE any reader-visible change
      return false
    }
    // rename result MUST be checked: on local FS a leftover v{n} dir (a
    // prior partial run) makes rename return false or NEST the staging
    // dir inside it (mv semantics — "success" with the wrong layout) —
    // swapping the pointer anyway would publish a missing/stale version.
    // The existence pre-check makes both failure shapes a deterministic
    // refusal BEFORE any reader-visible change.
    // Y55 hook: a SNAPSHOT publish on a CDF-enabled root emits its own
    // feed here (v1 = the I bootstrap, later = T reseed sentinel + I);
    // incremental paths staged their exact deltas before calling in,
    // so a present `_changes` is never second-guessed.
    // EVERY version commits with a `_schema` sidecar (evolution's own
    // sidecar, carried forward by the cow paths, wins when present):
    // a version's schema then costs one driver-side JSON read forever
    // after, where inference from footers is a 1-task Spark job the
    // mutation lifecycles paid 3-7x per composite (r14; guide §1.2 —
    // the schema was known at write time, don't recompute it at read).
    if (!fs.exists(new Path(s"$staging/_schema")))
      writeSchemaSidecar(s, staging.toString,
        versionSchema(s, staging.toString))
    if (cdfEnabled(fs, root) &&
        !fs.exists(new Path(s"$staging/_changes"))) {
      val logical = versionSchema(s, staging.toString)
      val snap =
        if (fs.exists(new Path(s"$staging/_file_stats"))) stagedView
        else s.read.schema(logical).parquet(staging.toString)
      val iRows = snap.withColumn("op", lit("I"))
      val rows =
        if (version <= 1) iRows
        else s.range(1).select(logical.fields.toIndexedSeq.map(f =>
            lit(null).cast(f.dataType).as(f.name)) :+
            lit("T").as("op"): _*)
          .unionByName(iRows)
      stageChanges(s, staging.toString, logical, rows, version)
    }
    val finalDir = new Path(s"$root/v$version")
    if (fs.exists(finalDir) || !fs.rename(staging, finalDir)) {
      fs.delete(staging, true)
      return false
    }
    swapPointer(fs, root, version)
    true
  }

  private[graft] def pointerGenerations(
      fs: org.apache.hadoop.fs.FileSystem, root: String): Seq[Int] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("_ptr_gen_") &&
        n.stripPrefix("_ptr_gen_").forall(_.isDigit))
      .map(_.stripPrefix("_ptr_gen_").toInt).sorted
  }

  /** RENAME-FREE pointer commit (object-store safe). The previous
    * protocol swapped `_CURRENT` via write-tmp → delete → rename —
    * correct on HDFS (atomic rename) but only an approximation on
    * S3-class stores, which have no rename at all; every layer of the
    * lakehouse (y36–y46) sat on that one assumption. Now the commit is
    * a single CREATE-EXCLUSIVE write of an immutable, numbered
    * `_ptr_gen_NNNNN` file whose body names the version: readers
    * resolve the HIGHEST generation (monotone — rollback commits a NEW
    * generation naming an OLD version, the git-revert shape shared
    * with the group pointer). Create-exclusive is atomic on every
    * Hadoop FileSystem and maps to a conditional PUT on object stores;
    * there is no observable intermediate state — a reader sees the old
    * newest generation or the new one, never a torn or missing
    * pointer. A committer racing to the same generation number loses
    * the create and retries at the next number (bounded); callers that
    * need compare-and-swap semantics still serialize through y36b's
    * `_COMMIT_LOCK`, which spans the pointer re-check + this commit.
    * `_CURRENT` remains as a best-effort human-readable mirror only —
    * readers prefer generations whenever any exist. */
  private def swapPointer(fs: org.apache.hadoop.fs.FileSystem,
      root: String, version: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val body = s"v$version".getBytes("UTF-8")
    var committed = false
    var tries = 0
    while (!committed && tries < 20) {
      val gen = pointerGenerations(fs, root).lastOption.getOrElse(0) + 1
      try {
        val out = fs.create(new Path(f"$root/_ptr_gen_$gen%05d"), false)
        try out.write(body) finally out.close()
        committed = true
      } catch { case _: java.io.IOException => tries += 1 }
    }
    if (!committed) throw new IllegalStateException(
      s"publish: pointer commit for $root -> v$version lost 20 " +
        "generation races — a livelocked committer storm; previous " +
        "versions are intact, retry")
    try { // convenience mirror; never authoritative once a gen exists
      val out = fs.create(new Path(s"$root/_CURRENT"), true)
      try out.write(body) finally out.close()
    } catch { case _: java.io.IOException => () }
  }

  /** Roll the live pointer back to an EXISTING published version by
    * committing a NEW generation naming it — the git-revert shape the
    * pointer protocol documents: zero data movement, pointer history
    * preserved (y37 GC trims it on its own cadence), monotone for
    * readers. Refuses loudly when the target dir was GC'd — a pointer
    * naming a reaped version would be a torn table. */
  private[graft] def rollbackTo(s: SparkSession, root: String,
      version: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$root/v$version")) &&
        !fs.exists(new Path(s"$root/v$version/_REAPED")),
      s"rollbackTo: $root/v$version does not exist (never published " +
        "or reaped by retention GC) — cannot point the table at it")
    swapPointer(fs, root, version)
  }

  /** Y38/r13: per-file manifest for a published version — the ONE
    * authority on the version's CONTENT. Row layout ([[ManifestCols]]):
    *
    *   file    name relative to its dir (part=<v>/<name> on y49)
    *   dir     the VERSION DIR the file physically lives in ("v3")
    *   kmin/kmax  key span (the y38 pruning index)
    *   n_rows  row count (manifest-only COUNT(*), LIMIT planning)
    *   bytes   file size (connector stats + compaction planning with
    *           ZERO listing RPCs)
    *
    * `dir` is what makes the version carry ZERO-COPY: version N+1
    * references an untouched file as (dir=vK, file) instead of
    * physically copying it into its own dir — the Iceberg/Delta
    * manifest idiom re-expressed under this publish protocol. A 1-key
    * DELETE on a 100 TB table thus writes one data file and one
    * manifest, never moves the table. GC correspondingly switches to
    * manifest REACHABILITY ([[gcPublished]]): a version dir is
    * reapable only where no retained version references its files.
    * Legacy two-column-less manifests normalize through [[manifestDf]]
    * (dir = the version's own dir, bytes -1 → listing fallback).
    * Stored INSIDE the version dir as `_file_stats` (underscore
    * prefix = invisible to plain parquet readers); derived here by one
    * grouped scan + ONE listing after the write — a production writer
    * emits the same rows from its own footer stats. */
  private[graft] val ManifestCols =
    Seq("file", "dir", "kmin", "kmax", "n_rows", "bytes")

  /** The version-dir name manifest rows minted inside `dirName` must
    * claim: rows staged in `_staging_v{n}` travel to `v{n}`. */
  private def mintDirName(dirName: String): String =
    if (dirName.startsWith("_staging_")) dirName.stripPrefix("_staging_")
    else dirName

  /** A manifest row's PHYSICAL dir: inside a staging dir, rows minted
    * for the version being staged still live in staging (the rename
    * moves them); every other row names a live version dir. */
  private[graft] def physDir(root: String, containerName: String,
      rowDir: String): String =
    if (containerName.startsWith("_staging_") &&
        rowDir == mintDirName(containerName)) s"$root/$containerName"
    else s"$root/$rowDir"

  /** The manifest schema for a given key type (kmin/kmax carry it). */
  private def manifestSchema(kt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("dir", StringType, nullable = false),
      StructField("kmin", kt, nullable = true),
      StructField("kmax", kt, nullable = true),
      StructField("n_rows", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false)))
  }

  /** Manifest rows for `dir`'s local data files — parquet FOOTER
    * statistics first (zero Spark jobs, no data-page IO; see
    * [[FooterStats]]), falling back to the pre-r13 one-job grouped
    * scan for key types whose footer stats aren't exactness-safe.
    * Returns (kmin/kmax Spark type, rows in [[ManifestCols]] order
    * minted for `vName`). */
  private def statRows(s: SparkSession,
      statuses: Seq[org.apache.hadoop.fs.FileStatus], dir: String,
      key: String, vName: String,
      rel: org.apache.hadoop.fs.FileStatus => String)
      : (org.apache.spark.sql.types.DataType,
         Array[org.apache.spark.sql.Row]) = {
    val conf = s.sparkContext.hadoopConfiguration
    if (statuses.isEmpty)
      return (org.apache.spark.sql.types.NullType, Array.empty)
    FooterStats.sweep(conf, statuses, key, rel) match {
      case Some((kt, stats)) =>
        (kt, stats.map(f => org.apache.spark.sql.Row(
          f.name, vName, f.kmin, f.kmax, f.nRows, f.bytes)).toArray)
      case None => statRowsScan(s, statuses, dir, key, vName, rel)
    }
  }

  /** The pre-r13 one-job grouped scan — the fallback whose min/max
    * types match what a Spark read of the files produces by
    * construction (footer sweep can disagree for logically-annotated
    * ints, e.g. int8/int16). */
  private def statRowsScan(s: SparkSession,
      statuses: Seq[org.apache.hadoop.fs.FileStatus], dir: String,
      key: String, vName: String,
      rel: org.apache.hadoop.fs.FileStatus => String)
      : (org.apache.spark.sql.types.DataType,
         Array[org.apache.spark.sql.Row]) = {
    val lens = statuses.map(st => rel(st) -> st.getLen).toMap
    val agg = s.read.parquet(dir)
      .groupBy(regexp_extract(input_file_name(), "[^/]+$", 0)
        .as("file"))
      .agg(min(col(key)).as("kmin"), max(col(key)).as("kmax"),
        count(lit(1)).as("n_rows"))
    (agg.schema("kmin").dataType, agg.collect().map { r =>
      org.apache.spark.sql.Row(r.getString(0), vName, r.get(1),
        r.get(2), r.getLong(3), lens.getOrElse(r.getString(0), -1L))
    })
  }

  private[graft] def writeFileStats(s: SparkSession, dir: String,
      key: String): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val statuses = fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
    val vName = mintDirName(p.getName)
    val (kt, rows) = statRows(s, statuses, dir, key, vName,
      _.getPath.getName)
    val kt2 = if (rows.isEmpty) org.apache.spark.sql.types.LongType else kt
    s.createDataFrame(java.util.Arrays.asList(rows: _*),
        manifestSchema(kt2))
      .write.mode("overwrite").parquet(s"$dir/_file_stats")
  }

  /** The normalized manifest of `root/$vName` — guaranteed to carry
    * `dir` and `bytes` (legacy manifests read as all-local, unsized).
    * Extra columns (y49's `part`) ride through untouched. Backed by
    * [[manifestLocal]]'s signature-keyed cache: a LocalRelation over
    * the collected rows, so repeat consumers launch no read jobs. */
  private[graft] def manifestDf(s: SparkSession, root: String,
      vName: String): DataFrame =
    manifestLocal(s, root, vName).df(s)

  /** The normalized manifest collected ONCE to the driver — file-count
    * bounded, the same budget the compaction planner and Spark's own
    * FileIndex already spend. Every further use inside one mutation
    * (prune join, untouched diff, carried filter, total-row
    * validation) is then IO-free; pre-r13 each use re-read the parquet
    * sidecar as its own Spark job (2-3 redundant jobs per publish). */
  private[graft] final case class LocalManifest(
      schema: org.apache.spark.sql.types.StructType,
      rows: Seq[org.apache.spark.sql.Row],
      /** Did the RAW sidecar already carry dir+bytes (an r13+ writer),
        * or did normalization add them? The connector keys its
        * zero-listing fast path on the former. */
      rawHasDirBytes: Boolean = true) {
    private def idx(c: String) = schema.fieldIndex(c)
    def files: Seq[String] = rows.map(_.getString(idx("file")))
    /** Σ n_rows, None when any row predates row counts (legacy -1). */
    def nRowsTotal: Option[Long] = {
      val i = idx("n_rows")
      val vs = rows.map(_.getLong(i))
      if (vs.exists(_ < 0L)) None else Some(vs.sum)
    }
    def filterFiles(p: String => Boolean): LocalManifest =
      LocalManifest(schema,
        rows.filter(r => p(r.getString(idx("file")))))
    /** LocalRelation view — joins/broadcasts build from driver memory,
      * no parquet re-read. */
    def df(s: SparkSession): DataFrame =
      s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** Manifest cache: a published version's `_file_stats` is IMMUTABLE
    * once its version dir exists (staging manifests mutate, but only
    * before the rename — the path then changes), so one (path, total
    * length, newest mtime) signature identifies its content exactly.
    * A hit costs one driver-side listing — no schema-inference job, no
    * collect job; pre-r13 every consumer re-read the sidecar (a
    * composite lifecycle paid ~25 redundant jobs per query on repeat
    * manifest reads alone). Bounded: cleared wholesale past 4096
    * entries (a manifest is file-count-sized — the cap bounds memory
    * at a few hundred MB even with million-file manifests; a bench
    * session holds ~10-row fixtures). */
  private val manifestCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Long, LocalManifest)]()

  private[graft] def manifestLocal(s: SparkSession, root: String,
      vName: String): LocalManifest = {
    import org.apache.hadoop.fs.Path
    val dirP = new Path(s"$root/$vName/_file_stats")
    val fs = dirP.getFileSystem(s.sparkContext.hadoopConfiguration)
    // STAGING manifests mutate IN PLACE (published ones never do) — a
    // same-length rewrite within mtime granularity could serve stale
    // rows, so staging paths bypass the cache entirely (r14 hardening;
    // the per-file signature below additionally covers renames/count
    // changes for the published case)
    val cacheable = !vName.startsWith("_staging_")
    val sig =
      try {
        val sts = fs.listStatus(dirP)
        (sts.map(_.getLen).sum,
         sts.map(_.getModificationTime).max ^ (sts.length.toLong << 48) ^
           sts.map(st => (st.getPath.getName, st.getLen,
             st.getModificationTime).hashCode.toLong & 0xffffffffL)
             .foldLeft(0L)(_ ^ _))
      } catch { case _: java.io.IOException => (-1L, -1L) }
    val key = dirP.toString
    val hit = if (cacheable) manifestCache.get(key) else null
    if (hit != null && sig._1 >= 0 &&
        hit._1 == sig._1 && hit._2 == sig._2) hit._3
    else {
      // missing path throws here exactly as the pre-cache read did
      val raw = s.read.parquet(dirP.toString)
      val d0 = if (raw.columns.contains("dir")) raw
        else raw.withColumn("dir", lit(mintDirName(vName)))
      val d = if (d0.columns.contains("bytes")) d0
        else d0.withColumn("bytes", lit(-1L))
      val lm = LocalManifest(d.schema, d.collect().toIndexedSeq,
        raw.columns.contains("dir") && raw.columns.contains("bytes"))
      if (cacheable && sig._1 >= 0) {
        if (manifestCache.size > 4096) manifestCache.clear()
        manifestCache.put(key, (sig._1, sig._2, lm))
      }
      lm
    }
  }

  /** Open a version (or staging) dir by RESOLVING its manifest: each
    * row names the dir its file physically lives in, so a zero-copy
    * carried file reads from the older version dir it has always sat
    * in. Files group per source dir and read with that dir as basePath
    * (partition columns infer per group), then union — one read per
    * DISTINCT source dir, bounded by retention depth, never by file
    * count. */
  private[graft] def readResolved(s: SparkSession, root: String,
      containerName: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val entries = manifestDf(s, root, containerName)
      .select("dir", "file").collect()
      .map(r => (r.getString(0), r.getString(1)))
    if (entries.isEmpty)
      s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else entries.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, fl) =>
      val base = physDir(root, containerName, d)
      s.read.schema(schema).option("basePath", base)
        .parquet(fl.map(e => s"$base/${e._2}").toIndexedSeq: _*)
    }.reduce(_.unionByName(_))
  }

  /** Manifest rows for the NEW data files a staged FLAT version just
    * wrote (spans scanned from the staging dir's local files only —
    * carried files are never there, that is the point; sizes from ONE
    * listing; `dir` = the version the rename will mint), unioned with
    * the CARRIED rows verbatim — each still naming the dir where its
    * file physically lives — and written as the staged `_file_stats`.
    * Returns the new rows (callers key CDF emptiness etc. off them). */
  private def writeStagedManifest(s: SparkSession, root: String,
      toVersion: Int, key: String, carried: DataFrame)
      : Array[org.apache.spark.sql.Row] = {
    import org.apache.hadoop.fs.Path
    val staging = s"$root/_staging_v$toVersion"
    val fs = new Path(staging)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(staging))) fs.mkdirs(new Path(staging))
    val statuses = fs.listStatus(new Path(staging)).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
    // footer-stats first (zero jobs; see FooterStats) with the pre-r13
    // grouped-scan fallback when the key type isn't footer-exact — and
    // the new rows must carry the CARRIED manifest's kmin/kmax type,
    // or the union below would write a mixed-type column
    val carriedN = carried.select(ManifestCols.map(col): _*)
    val carriedKt = carriedN.schema("kmin").dataType
    val (kt0, rows0) = statRows(s, statuses, staging, key,
      s"v$toVersion", _.getPath.getName)
    // a carried manifest written by a SCAN (pre-r13, or a non-footer-
    // exact key) can disagree with the footer sweep's type; retry with
    // the grouped scan — whose types match a Spark read by
    // construction — before refusing (the partitioned path does the
    // same via expectKt)
    val (kt, newRows) =
      if (rows0.isEmpty || kt0 == carriedKt) (kt0, rows0)
      else statRowsScan(s, statuses, staging, key, s"v$toVersion",
        _.getPath.getName)
    require(newRows.isEmpty || kt == carriedKt,
      s"writeStagedManifest: staged key type $kt != carried $carriedKt")
    s.createDataFrame(java.util.Arrays.asList(newRows: _*),
        carriedN.schema)
      .unionByName(carriedN)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$staging/_file_stats")
    newRows
  }

  /** Y55: CDF-ON-WRITE — opt-in per lake root (`enableCdf`). Every
    * mutation path stages a `_changes` sidecar INSIDE the version dir
    * it publishes: the RESOLVED batch the commit applied (op ∈
    * {I,U,D,T} + the logical columns + `_commit_version`), Delta's
    * CDC-file idiom under this publish protocol. y41's `lakeChanges`
    * derives the net diff after the fact by re-scanning churned files;
    * the on-write feed makes the delta a pure METADATA READ — which is
    * what turns the lake into a streaming SOURCE: a change reader
    * (`graftlake-cdf`) lists `_changes` per version, never diffing,
    * never scanning data files. The feed is the applied batch, not the
    * minimal net diff (a U identical to the current row still rides);
    * replay-idempotent MERGE consumers converge on either, and
    * consumers needing minimal diffs keep y41. Layout-only publishes
    * (compaction, evolution, DV folds) stage an EMPTY feed — "this
    * version changed no logical row" stated positively, so a reader
    * can tell "no change" from "feed missing" (= the version predates
    * enablement, or a non-CDF writer published it → reseed). Snapshot
    * publishes emit `I` for v1 (the bootstrap) and a leading `T`
    * (truncate) sentinel + `I` for later reseeds. */
  private[graft] def enableCdf(s: SparkSession, root: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(root))
    val out = fs.create(new Path(s"$root/_cdf_enabled"), true)
    try out.write("1".getBytes("UTF-8")) finally out.close()
  }

  private[graft] def cdfEnabled(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(s"$root/_cdf_enabled"))

  /** Stage a version's change feed: null-fill logical columns the batch
    * doesn't carry (a delete needs only its key), stamp the version. */
  private[graft] def stageChanges(s: SparkSession, stagingDir: String,
      logical: org.apache.spark.sql.types.StructType, rows: DataFrame,
      toVersion: Int): Unit = {
    val present = rows.columns.toSet
    val proj = logical.fields.toIndexedSeq.map { f =>
      if (present.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    } :+ col("op") :+ lit(toVersion.toLong).as("_commit_version")
    rows.select(proj: _*).write.mode("overwrite")
      .parquet(s"$stagingDir/_changes")
  }

  private[graft] def stageEmptyChanges(s: SparkSession,
      stagingDir: String,
      logical: org.apache.spark.sql.types.StructType,
      toVersion: Int): Unit =
    stageChanges(s, stagingDir, logical,
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(logical.fields :+
          org.apache.spark.sql.types.StructField("op",
            org.apache.spark.sql.types.StringType))),
      toVersion)

  private[graft] final case class CowReport(published: Boolean,
      nFilesTotal: Int, nFilesRewritten: Int,
      rewritten: Seq[String], untouched: Seq[String])

  /** Y38: COPY-ON-WRITE row-level DELETE/UPDATE — the one mutation
    * primitive between "append-only" and "full snapshot swap". Given a
    * keyed change set (delete keys + replacement rows), it:
    *
    *  1. PRUNES: joins the change keys against the tiny `_file_stats`
    *     manifest (broadcast — one row per file) on key∈[kmin,kmax];
    *     only files whose span can contain a changed key are touched.
    *     The base table is NEVER scanned to find them.
    *  2. REWRITES only that subset: broadcast left-join applies the
    *     replacement columns (change sets are delta-sized — small by
    *     definition; a table-sized rewrite belongs to y2/y5), broadcast
    *     anti-join drops deleted keys, `sortWithinPartitions(key)`
    *     keeps the range-clustered layout so the NEXT mutation prunes
    *     just as well.
    *  3. CARRIES every untouched file into the new version VERBATIM
    *     (byte copy preserving names — at 100 TB on an object store
    *     this is the manifest trick or a server-side copy, never a
    *     re-encode; the law test pins names+sizes unchanged) and their
    *     manifest rows with them, so manifest maintenance costs one
    *     scan of the REWRITTEN files only.
    *  4. PUBLISHES via the y36 staged swap: readers see the old version
    *     or the new one, never a mix, and the old version stays live
    *     for rollback/time-travel until y37 GC reaps it.
    *
    * GDPR-delete and CDC-into-lake both land exactly here. */
  /** Broadcast a CHANGE-SET frame only while its planner estimate fits
    * `spark.graft.cow.broadcastThreshold` (bytes, default 512 MB —
    * far above any churn-sized batch, far below the 8 GB broadcast
    * cap / driver OOM territory). The cow family's design assumption
    * is delta-sized change sets, so the hint is normally right; the
    * guard is for the unbounded-CDC-batch case at 100 TB, where a
    * table-scale "change set" must fall back to a shuffle join (guide
    * §3.1) instead of OOMing the driver. Production tunes the
    * threshold to its real churn bound. */
  private def maybeBroadcast(df: DataFrame): DataFrame = {
    val thr = df.sparkSession.conf
      .getOption("spark.graft.cow.broadcastThreshold")
      .map(_.toLong).getOrElse(512L * 1024 * 1024)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= thr) broadcast(df) else df
  }

  private[graft] def cowApply(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int, key: String,
      deletes: DataFrame, updates: DataFrame,
      carryDeletes: Boolean = true,
      logicalCdf: Boolean = true): CowReport = {
    import org.apache.hadoop.fs.Path
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new Path(root).getFileSystem(conf)
    val fromDir = s"$root/v$fromVersion"
    // ONE manifest read; every further use is driver-local (the
    // pre-r13 shape re-read the parquet sidecar 3x per mutation)
    val statsL = manifestLocal(s, root, s"v$fromVersion")
    val stats = statsL.df(s)
    // the change frames are consumed 2-3x each (prune keys, rewrite
    // joins, CDF feed); each consumption re-derived them from their
    // source scans pre-r14 — persist the churn-sized frames for the
    // mutation's duration instead (guide §1.2: don't recompute what
    // you already have; unpersisted before return)
    val updP = updates.persist()
    val delKeys = deletes.select(col(key)).persist()
    val changeKeys = delKeys
      .unionByName(updP.select(col(key))).distinct()
    // (file, physical dir) pairs — a carried file may live several
    // versions back; the manifest knows, the dir listing never would
    val affectedFD = changeKeys.join(broadcast(stats),
        col(key) >= col("kmin") && col(key) <= col("kmax"))
      .select("file", "dir").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._1).toSeq // bounded by file count
    val affected = affectedFD.map(_._1)
    val affectedSet = affected.toSet
    val untouched = statsL.files.sorted.diff(affected)
    val staging = new Path(s"$root/_staging_v$toVersion")
    fs.delete(staging, true)
    // CDF U post-images come from the REWRITE OUTPUT (cached), not a
    // re-read of the staged files — one less churn-sized scan per
    // CDF-enabled publish (r13 residual #2)
    val wantCdf = cdfEnabled(fs, root)
    var appliedCached: DataFrame = null
    if (affected.isEmpty) fs.mkdirs(staging)
    else {
      // the version's LOGICAL schema: post-evolution files and
      // pre-evolution carries merge cleanly, added columns read null
      val base = s.read.schema(versionSchema(s, fromDir))
        .parquet(affectedFD.map { case (f, d) => s"$root/$d/$f" }: _*)
      val updCols = updates.columns.filterNot(_ == key).toSeq
      val upd = updP.select(col(key) +:
        updCols.map(c => col(c).as(s"__upd_$c")): _*)
      val applied0 = base.join(maybeBroadcast(upd), Seq(key), "left")
      val applied = updCols.foldLeft(applied0) { (df, c) =>
          df.withColumn(c, coalesce(col(s"__upd_$c"), col(c)))
        }.drop(updCols.map("__upd_" + _): _*)
        .join(maybeBroadcast(delKeys.distinct()), Seq(key), "left_anti")
        .select(base.columns.map(col).toIndexedSeq: _*)
      val toWrite =
        if (wantCdf && logicalCdf) { appliedCached = applied.persist(); appliedCached }
        else applied
      toWrite.sortWithinPartitions(key)
        .write.mode("overwrite").parquet(staging.toString)
    }
    // ZERO-COPY CARRY: untouched files are never copied — their
    // manifest rows (still naming the dirs they live in) ride into the
    // staged manifest; only the rewritten files are new bytes. The
    // carried set filters by the CHURN-sized affected list (an isin
    // over "untouched" would be a million-literal expression at scale)
    val carriedL = statsL.filterFiles(!affectedSet(_))
    val newStatsRows = writeStagedManifest(s, root, toVersion, key,
      carriedL.df(s))
    // Y55 feed (staged while the dir holds ONLY rewritten files):
    // U = post-images of updated keys MINUS the deletion vector — an
    // update of a DV'd ghost is the SQL no-op, the logical row did NOT
    // change and a mirror fed that U would drift; D = the delete keys
    // (a D of an already-DV'd key replays as a no-op downstream).
    // dvFold passes logicalCdf=false: its rewrite changes no logical
    // row, so it states "no change" with an EMPTY feed.
    if (wantCdf) {
      val logical = versionSchema(s, fromDir)
      if (!logicalCdf)
        stageEmptyChanges(s, staging.toString, logical, toVersion)
      else {
        val dvKeys =
          if (fs.exists(new Path(s"$fromDir/_deletes")))
            s.read.parquet(s"$fromDir/_deletes").select(col(key))
          else deletes.select(col(key)).limit(0)
        val uRows =
          if (appliedCached == null)
            s.createDataFrame(
              s.sparkContext.emptyRDD[org.apache.spark.sql.Row], logical)
          else appliedCached
            .select(logical.fieldNames.map(col).toIndexedSeq: _*)
            .join(maybeBroadcast(updP.select(col(key)).distinct()),
              Seq(key), "left_semi")
            .join(maybeBroadcast(dvKeys), Seq(key), "left_anti")
        stageChanges(s, staging.toString, logical,
          uRows.withColumn("op", lit("U")).unionByName(
            delKeys.withColumn("op", lit("D")),
            allowMissingColumns = true),
          toVersion)
      }
    }
    // a MOR deletion vector on the source version still applies to the
    // new one: deletes here remove their rows physically (every present
    // change key lives in a rewritten file), and an UPDATE of a
    // DV-deleted key is the SQL no-op — the ghost row gets modified but
    // stays subtracted at read. dvFold is the one caller that DROPS the
    // vector (carryDeletes=false), because its rewrite just applied it.
    if (carryDeletes &&
        fs.exists(new Path(s"$fromDir/_deletes")))
      carrySidecar(s, fromDir, staging.toString, "_deletes")
    carrySidecar(s, fromDir, staging.toString, "_schema")
    // non-emptiness is already known from the manifest rows the commit
    // just assembled — Σ n_rows over new + carried answers the gate
    // with ZERO reads (the old head(1) resolved and opened data files)
    val ok = publishStagedDir(s, root, toVersion,
      manifestValidate(newStatsRows.map(_.getLong(4)).sum, carriedL))
    if (appliedCached != null) appliedCached.unpersist(blocking = false)
    updP.unpersist(blocking = false)
    delKeys.unpersist(blocking = false)
    CowReport(ok, affected.length + untouched.length, affected.length,
      affected, untouched)
  }

  /** The cow-family publish gate: staged version non-empty, answered
    * from the just-written manifest rows when row counts are complete
    * (zero IO), else the reader-shaped head(1) probe. `stagedRows` =
    * Σ n_rows over the NEW manifest rows (caller-computed — flat and
    * partitioned manifests index n_rows differently). */
  private[graft] def manifestValidate(stagedRows: Long,
      carried: LocalManifest): DataFrame => Boolean =
    carried.nRowsTotal match {
      case Some(c) => _ => stagedRows + c > 0L
      case None => _.head(1).nonEmpty
    }

  /** Y38b: CDC-INTO-LAKE — apply a full I/U/D change log to a
    * published copy-on-write table. This is what [[cowApply]] cannot
    * express: INSERTS. The change log is the y4 shape (full row + `op`
    * ∈ {I,U,D} + `version`); the apply:
    *
    *  1. collapses the log LATEST-WINS per key (window over version —
    *     a key updated then deleted ends deleted, the y4 idiom);
    *  2. prunes affected files with ALL change keys against the
    *     `_file_stats` manifest, exactly as cowApply;
    *  3. routes every surviving upsert by SPAN, not by existence:
    *     an upsert whose key falls inside an affected file's span
    *     joins that file's rewrite (update-in-place or insert-in-span —
    *     either way the row belongs in that key range, so clustering
    *     survives); upserts OUTSIDE every span (the append frontier —
    *     new high keys, typically) land in fresh files of their own.
    *     No existence probe is ever needed, and the base table is
    *     still never scanned;
    *  4. rewrites = affected rows minus ALL change keys, union the
    *     in-span upserts; stats recomputed over the changed subset
    *     only; untouched files carry byte-verbatim; one y36 swap
    *     publishes the new version. */
  private[graft] def cowApplyChanges(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int, key: String,
      changes: DataFrame): CowReport = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val fromDir = s"$root/v$fromVersion"
    // ONE manifest read; further uses are driver-local (see cowApply)
    val statsL = manifestLocal(s, root, s"v$fromVersion")
    val stats = statsL.df(s)
    val wv = Window.partitionBy(key).orderBy(col("version").desc)
    // the resolved (latest-wins) batch is consumed 4-5x in one mutation
    // (prune keys, span routing x2 subtrees, the CDF stage, the DV
    // drop) — pre-r14 each consumption re-derived it from the caller's
    // source scans plus the window shuffle; persist the churn-sized
    // result for the mutation's duration instead (unpersisted below)
    val latest = changes.withColumn("__rn", row_number().over(wv))
      .filter(col("__rn") === 1).drop("__rn").persist()
    val upserts = latest.filter(col("op") =!= "D").drop("op", "version")
    val changeKeys = latest.select(col(key)).distinct()
    val affectedFD = changeKeys.join(broadcast(stats),
        col(key) >= col("kmin") && col(key) <= col("kmax"))
      .select("file", "dir").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._1).toSeq
    val affected = affectedFD.map(_._1)
    val affectedSet = affected.toSet
    val untouched = statsL.files.sorted.diff(affected)
    // span routing: in-span upserts join the rewrite of the file whose
    // range owns their key; the rest are the append frontier
    val spanned = upserts.join(broadcast(stats),
      col(key) >= col("kmin") && col(key) <= col("kmax"), "left")
    val inSpan = spanned.filter(col("file").isNotNull)
      .drop("file", "dir", "kmin", "kmax", "n_rows", "bytes").distinct()
    val frontier = spanned.filter(col("file").isNull)
      .drop("file", "dir", "kmin", "kmax", "n_rows", "bytes")
    val staging = new Path(s"$root/_staging_v$toVersion")
    fs.delete(staging, true)
    require(affected.nonEmpty || untouched.nonEmpty,
      s"cowApplyChanges: $fromDir has no manifest files")
    val evolved = versionSchema(s, fromDir)
    val cols = evolved.fieldNames.toSeq
    val rewritten =
      (if (affected.nonEmpty)
         s.read.schema(evolved)
           .parquet(affectedFD.map { case (f, d) =>
             s"$root/$d/$f" }: _*)
           .join(maybeBroadcast(changeKeys), Seq(key), "left_anti")
           .select(cols.map(col).toIndexedSeq: _*)
           .unionByName(inSpan.select(cols.map(col).toIndexedSeq: _*))
       else inSpan.select(cols.map(col).toIndexedSeq: _*))
        .unionByName(frontier.select(cols.map(col).toIndexedSeq: _*))
    // one range shuffle of the CHANGED SUBSET only (never the table):
    // affected-file rows, in-span upserts, and the append frontier land
    // back in contiguous key ranges, so every file in the new version
    // keeps a narrow span and the next mutation prunes just as well
    rewritten
      .repartitionByRange(math.max(affected.length, 1) + 1, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(staging.toString)
    // zero-copy carry: untouched files ride as manifest references
    // (filtered by the churn-sized affected set, driver-local)
    val carriedL = statsL.filterFiles(!affectedSet(_))
    val newStatsRows = writeStagedManifest(s, root, toVersion, key,
      carriedL.df(s))
    // MOR interplay: an UPSERT re-asserts its key's existence (CDC
    // semantics — I/U means the row exists at the source NOW), so the
    // carried deletion vector drops every upserted key; D keys need no
    // DV entry — their physical rows were just removed (every present
    // change key lives in a rewritten file)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$fromDir/_deletes"))) {
      val oldDv = s.read.parquet(s"$fromDir/_deletes")
      oldDv.join(maybeBroadcast(upserts.select(col(key)).distinct()),
          Seq(key), "left_anti")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$staging/_deletes")
    }
    // Y55: the resolved (latest-wins) batch IS this commit's change
    // feed — stage it with the version it creates
    if (cdfEnabled(fs, root))
      stageChanges(s, staging.toString, evolved,
        latest.drop("version"), toVersion)
    carrySidecar(s, fromDir, staging.toString, "_schema")
    val ok = publishStagedDir(s, root, toVersion,
      manifestValidate(newStatsRows.map(_.getLong(4)).sum, carriedL))
    latest.unpersist(blocking = false)
    CowReport(ok, affected.length + untouched.length, affected.length,
      affected, untouched)
  }

  /** Y39: INCREMENTAL LAKE COMPACTION (the OPTIMIZE verb) — cow
    * mutations (y38/y38b) and streaming micro-batch applies fragment a
    * table into many small files; steady state needs the companion
    * compactor, and at 100 TB it must NOT be s13's full rewrite. This
    * one is incremental: from the `_file_stats` manifest + a file
    * listing (both metadata-scale), files smaller than half the target
    * are bin-packed into ADJACENT-key-range groups (sorted by kmin, so
    * merged files keep narrow spans and S14-style pruning keeps
    * working); only groups of ≥2 small files rewrite — every
    * adequately-sized file carries byte-verbatim, so the IO bill is
    * proportional to the fragmentation, not the table. The assembled
    * version publishes through the one y36 swap; readers never see a
    * half-compacted table and the previous version stays live.
    *
    * Z-ORDER MODE (S15 × y39): for a two-dimension-clustered table,
    * publish with a MATERIALIZED z-value column
    * ([[Sources.zValue]] over the scaled dims) and key the manifest —
    * and this compactor — on it. Grouping by z-kmin keeps merged
    * files z-contiguous and the per-group `repartitionByRange(zval) +
    * sortWithinPartitions(zval)` re-sorts them, so compaction
    * PRESERVES both pruning dimensions (small (a,b) rectangles per
    * file) instead of silently degrading the layout to the last sort
    * key — the failure mode Delta's OPTIMIZE-without-ZORDER is known
    * for. PlanAuditSuite pins both dimensions' numOutputRows on the
    * compacted version. */
  private[graft] def compactPublished(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int, key: String,
      targetBytes: Long): CowReport = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val fromDir = s"$root/v$fromVersion"
    // metadata at million-file scale: names, PHYSICAL dirs, sizes and
    // key order all come from ONE manifest read (`bytes` rides in
    // every r13+ manifest); a legacy unsized manifest falls back to
    // one listing per distinct source dir. The driver holds names and
    // the running group — the same budget as Spark's own FileIndex.
    val statsL = manifestLocal(s, root, s"v$fromVersion")
    val iFile = statsL.schema.fieldIndex("file")
    val iDir = statsL.schema.fieldIndex("dir")
    val iKmin = statsL.schema.fieldIndex("kmin")
    val iBytes = statsL.schema.fieldIndex("bytes")
    val fd: Map[String, (String, Long)] = statsL.rows
      .map(r => r.getString(iFile) ->
        (r.getString(iDir), r.getLong(iBytes))).toMap
    val lens: Map[String, Long] =
      if (fd.values.forall(_._2 >= 0L)) fd.map { case (f, (_, b)) => f -> b }
      else fd.values.map(_._1).toSet.toSeq.flatMap { (d: String) =>
        fs.listStatus(new Path(s"$root/$d")).toSeq
          .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
          .map(st => st.getPath.getName -> st.getLen)
      }.toMap
    val groups = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    var cur = scala.collection.mutable.ArrayBuffer[String]()
    var curBytes = 0L
    var nFiles = 0
    locally { // key order — groups stay span-adjacent
      val ordered = statsL.rows.sortWith { (a, b) =>
        val ka = a.get(iKmin); val kb = b.get(iKmin)
        if (ka == null) kb != null // null kmin (all-null file) first
        else if (kb == null) false
        else ka.asInstanceOf[Comparable[Any]].compareTo(kb) < 0
      }
      ordered.foreach { r =>
        val f = r.getString(iFile)
        val len = lens(f)
        nFiles += 1
        if (len < targetBytes / 2 && curBytes + len <= targetBytes) {
          cur += f; curBytes += len
        } else {
          if (cur.nonEmpty) { groups += cur.toSeq; cur.clear(); curBytes = 0L }
          if (len < targetBytes / 2) { cur += f; curBytes = len }
        }
      }
    }
    if (cur.nonEmpty) groups += cur.toSeq
    val rewriteGroups = groups.filter(_.length >= 2).toSeq
    val rewritten = rewriteGroups.flatten.sorted
    val rewrittenSet = rewritten.toSet
    val untouched = fd.keysIterator.filterNot(rewrittenSet).toSeq.sorted
    val staging = new Path(s"$root/_staging_v$toVersion")
    fs.delete(staging, true)
    if (rewriteGroups.isEmpty) fs.mkdirs(staging)
    rewriteGroups.foreach { g =>
      // logical schema: a bin-packed group can mix pre- and
      // post-evolution files — the overlay merges them cleanly
      s.read.schema(versionSchema(s, fromDir))
        .parquet(g.map(f => s"$root/${fd(f)._1}/$f"): _*)
        .repartitionByRange(1, col(key)).sortWithinPartitions(key)
        .write.mode("append").parquet(staging.toString)
    }
    // zero-copy carry: adequately-sized files ride as manifest refs
    val carriedL = statsL.filterFiles(!rewrittenSet(_))
    val newStatsRows = writeStagedManifest(s, root, toVersion, key,
      carriedL.df(s))
    // compaction is a PURE layout change: a MOR deletion vector on the
    // source version still subtracts the same keys from the new one —
    // dropping it here would resurrect every MOR-deleted row
    carrySidecar(s, fromDir, staging.toString, "_deletes")
    // Y55: layout-only — state "no logical change" with an empty feed
    if (cdfEnabled(fs, root))
      stageEmptyChanges(s, staging.toString,
        versionSchema(s, fromDir), toVersion)
    carrySidecar(s, fromDir, staging.toString, "_schema")
    val ok = publishStagedDir(s, root, toVersion,
      manifestValidate(newStatsRows.map(_.getLong(4)).sum, carriedL))
    CowReport(ok, nFiles, rewritten.length, rewritten, untouched)
  }

  /** Y40: MERGE-ON-READ DELETION VECTORS — the scale complement to
    * [[cowApply]]. Copy-on-write pays a file REWRITE per mutation
    * batch; under high-frequency small deletes (GDPR trickle, CDC
    * tombstone streams) that write-amplifies badly. Merge-on-read
    * inverts the trade: a delete batch writes only a tiny `_deletes`
    * key sidecar inside the new version dir (underscore prefix =
    * invisible to plain parquet readers) and carries EVERY data file
    * and the `_file_stats` manifest verbatim — zero data-file bytes
    * rewritten, publish latency is O(|delete batch|), not O(touched
    * files). The read path ([[readPublishedMor]]) subtracts the
    * sidecar with one BROADCAST anti-join — the DV is delta-sized by
    * construction, so the table never shuffles and the scan stays
    * whole-stage-codegen'd. Sidecars ACCUMULATE across versions
    * (v3's `_deletes` = v2's ∪ the new batch, deduped), so a reader
    * always consults exactly one DV file; when the vector grows past
    * taste, [[dvFold]] folds it into the base exactly once via the
    * cow path and the next version starts with a clean slate. The
    * local-FS verbatim carry stands in for the object-store manifest
    * entry / server-side copy, as in cowApply (step 3 there). */
  private[graft] def dvDelete(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int, key: String,
      deletes: DataFrame): CowReport = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val fromDir = s"$root/v$fromVersion"
    val staging = new Path(s"$root/_staging_v$toVersion")
    fs.delete(staging, true)
    fs.mkdirs(staging)
    // EVERY data file carries as a manifest reference — the new
    // version's only bytes are the folded `_deletes` sidecar (plus the
    // feed): publish cost is truly O(|delete batch|) now, where the
    // pre-r13 stand-in still copied the table through the driver
    val statsL = manifestLocal(s, root, s"v$fromVersion")
    val files = statsL.files.sorted
    val newStatsRows = writeStagedManifest(s, root, toVersion, key,
      statsL.df(s))
    carrySidecar(s, fromDir, staging.toString, "_schema")
    val prior =
      if (fs.exists(new Path(s"$fromDir/_deletes")))
        s.read.parquet(s"$fromDir/_deletes")
      else deletes.select(col(key)).limit(0)
    prior.select(col(key)).unionByName(deletes.select(col(key)))
      .distinct()
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$staging/_deletes")
    // Y55 feed: D for the NEWLY deleted keys only — re-deleting an
    // already-DV'd key changes no logical row
    if (cdfEnabled(fs, root))
      stageChanges(s, staging.toString, versionSchema(s, fromDir),
        deletes.select(col(key)).distinct()
          .join(broadcast(prior.select(col(key))), Seq(key), "left_anti")
          .withColumn("op", lit("D")),
        toVersion)
    val ok = publishStagedDir(s, root, toVersion,
      manifestValidate(newStatsRows.map(_.getLong(4)).sum, statsL))
    CowReport(ok, files.length, 0, Nil, files)
  }

  /** MOR read path: resolve `_CURRENT`, open the version's data files,
    * and subtract its deletion vector (if any) with a broadcast
    * anti-join. Plain [[readPublished]] on a MOR version would return
    * ghost rows — the DV is part of the version's logical content. */
  private[graft] def readPublishedMor(s: SparkSession, root: String,
      key: String): (String, DataFrame) = {
    import org.apache.hadoop.fs.Path
    val (v, base) = readPublished(s, root)
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(s"$root/$v/_deletes"))) (v, base)
    else (v, base.join(
      broadcast(s.read.parquet(s"$root/$v/_deletes")), Seq(key),
      "left_anti"))
  }

  /** A version dir's LOGICAL content: its files MINUS its deletion
    * vector, under the version's logical schema — what y40 defines a
    * MOR version to MEAN. Every consumer that treats a version as "the
    * table" (the lake→JDBC sync layer, validation digests) must read
    * through this, never [[readVersionDir]] raw: a raw read of a
    * DV-carrying version resurrects logically-deleted ghosts. The DV
    * is delete-sized → broadcast anti-join, no shuffle. */
  private[graft] def readVersionLogical(s: SparkSession, dir: String,
      key: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val base = readVersionDir(s, dir)
    val p = new Path(s"$dir/_deletes")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) base
    else base.join(broadcast(s.read.parquet(p.toString)
      .select(col(key))), Seq(key), "left_anti")
  }

  /** Fold the accumulated deletion vector into the base files — one
    * cow rewrite ([[cowApply]] prunes to the files whose key spans
    * contain DV keys; everything else carries verbatim) whose staged
    * output simply omits `_deletes`, so the published version is clean
    * and the next MOR read is sidecar-free. Run it on the compaction
    * cadence (y39), not per delete — that scheduling split is the
    * entire point of merge-on-read. */
  private[graft] def dvFold(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int, key: String): CowReport = {
    val dv = s.read.parquet(s"$root/v$fromVersion/_deletes")
    cowApply(s, root, fromVersion, toVersion, key,
      deletes = dv, updates = dv.limit(0), carryDeletes = false,
      logicalCdf = false) // folding already-deleted ghosts changes no row
  }

  private[graft] final case class MergeReport(published: Boolean,
      cardinalityOk: Boolean, nFilesTotal: Int, nFilesRewritten: Int,
      nMatchedUpdated: Long, nMatchedDeleted: Long,
      nInserted: Long, nNmbsDeleted: Long)

  /** Y45: DECLARATIVE MERGE INTO on the published lake — the full SQL
    * clause matrix over the cow machinery. [[cowApplyChanges]] applies a
    * CDC log whose ops are already decided; MERGE decides them from the
    * MATCH relationship and per-clause conditions:
    *
    *   WHEN MATCHED AND <delCond>      THEN DELETE        (wins first)
    *   WHEN MATCHED [AND <updCond>]    THEN UPDATE SET *  (source wins)
    *   WHEN NOT MATCHED [AND <insCond>] THEN INSERT *
    *   WHEN NOT MATCHED BY SOURCE AND key∈[lo,hi] AND <cond> THEN DELETE
    *
    * Scale shape, clause by clause:
    *  - CARDINALITY: the SQL standard makes two source rows matching one
    *    target row an ERROR, not a nondeterministic pick — checked with
    *    one delta-sized groupBy BEFORE anything is staged; a violation
    *    refuses loudly with no reader-visible change.
    *  - Pruning: affected files = spans hit by SOURCE KEYS ∪ the
    *    not-matched-by-source key range. NMBS without a range predicate
    *    would force a FULL table rewrite (every file could hold an
    *    unmatched row) — so the range is REQUIRED here, the Delta-lake
    *    deployment discipline made structural.
    *  - The match itself: affected files full-outer-join the broadcast
    *    source (delta-sized by definition); matched rows route by the
    *    clause conditions, target-only rows face the NMBS clause,
    *    source-only rows are the IN-SPAN inserts. Source keys outside
    *    every file span never join anything — they are the append
    *    FRONTIER, inserted from the source alone (y38b's routing).
    *  - Rewrite = surviving rows range-repartitioned back into narrow
    *    key spans; untouched files carry byte-verbatim; one y36 swap.
    *  - MOR interplay: source keys re-assert existence (the y38b rule),
    *    so a carried deletion vector drops every source key.
    *
    * Conditions are Columns over the joined namespace: target columns
    * under their own names, source columns as `src_<c>` (the key keeps
    * one coalesced column). `insertCond` may reference only the key and
    * `src_<c>` columns — it also runs against the never-joined frontier. */
  private[graft] def mergeInto(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int, key: String, source: DataFrame,
      matchedDeleteCond: Option[org.apache.spark.sql.Column],
      matchedUpdateCond: Option[org.apache.spark.sql.Column],
      notMatchedInsertCond: Option[org.apache.spark.sql.Column],
      nmbsDelete: Option[(Long, Long, org.apache.spark.sql.Column)])
      : MergeReport = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val fromDir = s"$root/v$fromVersion"
    // ONE manifest read; further uses are driver-local (see cowApply)
    val statsL = manifestLocal(s, root, s"v$fromVersion")
    val stats = statsL.df(s)
    val nTotal = statsL.rows.length
    // SQL-standard cardinality gate: one source row per key, or refuse
    val dup = source.groupBy(key).count().filter(col("count") > 1)
      .head(1).nonEmpty
    if (dup) return MergeReport(published = false, cardinalityOk = false,
      nTotal, 0, 0L, 0L, 0L, 0L)
    val evolved = versionSchema(s, fromDir)
    val cols = evolved.fieldNames.toSeq
    val srcCols = source.columns.filterNot(_ == key).toSeq
    require(notMatchedInsertCond.isEmpty ||
      cols.filterNot(_ == key).forall(srcCols.contains),
      "mergeInto: INSERT * needs the source to carry every target column")
    val srcP = source.select(col(key) +:
      srcCols.map(c => col(c).as(s"src_$c")): _*)
    val srcKeys = source.select(col(key)).distinct()
    // MOR awareness: MATCHED is a relationship with the version's
    // LOGICAL content = files minus the deletion vector (the
    // lakeChangesImages/cowApplyChanges rule). Without the subtraction
    // a DV'd ghost row whose key reappears in the source would route
    // WHEN MATCHED — surviving the rewrite with stale pre-delete values.
    val dvPath = new Path(s"$fromDir/_deletes")
    val fromDv: Option[DataFrame] =
      if (fs.exists(dvPath))
        Some(s.read.parquet(dvPath.toString).select(col(key)))
      else None
    val bySrc = srcKeys.join(broadcast(stats),
        col(key) >= col("kmin") && col(key) <= col("kmax"))
      .select("file", "dir").distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val byNmbs = nmbsDelete.map { case (lo, hi, _) =>
      stats.filter(col("kmax") >= lo && col("kmin") <= hi)
        .select("file", "dir").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
    }.getOrElse(Set.empty[(String, String)])
    val affectedFD = (bySrc ++ byNmbs).toSeq.sortBy(_._1)
    val affected = affectedFD.map(_._1)
    val affectedSet = affected.toSet
    val untouched = statsL.files.sorted.diff(affected)
    // The joined namespace all four clause conditions see. FULL OUTER
    // cannot broadcast (both sides produce unmatched rows), so this is
    // the one shuffle — of the PRUNED file subset + the delta-sized
    // source, never the table.
    val affectedBase =
      (if (affected.isEmpty)
         s.createDataFrame(
             s.sparkContext.emptyRDD[org.apache.spark.sql.Row], evolved)
       else
         s.read.schema(evolved)
           .parquet(affectedFD.map { case (f, d) =>
             s"$root/$d/$f" }: _*))
    // ghost rows (physically present, DV-subtracted) leave the match:
    // their keys are NOT MATCHED, so a re-asserting source row INSERTS
    //
    // ONLY in-span source rows enter the join: frontier keys (outside
    // every file span) route through the dedicated frontier union below
    // — letting them into the full-outer too would surface them a
    // second time as source-only rows and every frontier insert would
    // land TWICE (caught by the y45 oracle at sf0.01)
    val srcInSpan = srcP.join(broadcast(stats),
      col(key) >= col("kmin") && col(key) <= col("kmax"), "left_semi")
    val joined = fromDv.fold(affectedBase)(dv =>
        affectedBase.join(broadcast(dv), Seq(key), "left_anti"))
      .withColumn("__t", lit(1))
      .join(srcInSpan.withColumn("__s", lit(1)), Seq(key), "full_outer")
    val matched = col("__t").isNotNull && col("__s").isNotNull
    val tOnly = col("__t").isNotNull && col("__s").isNull
    val sOnly = col("__t").isNull && col("__s").isNotNull
    // SQL MERGE semantics: a clause condition evaluating to NULL (a
    // null column inside the predicate) means the clause DOES NOT FIRE
    // — coalesce to false at the routing points so the survivor filter
    // and the clause counters below read the same tri-state the same way
    def fires(c: org.apache.spark.sql.Column) = coalesce(c, lit(false))
    val delM = matched && fires(matchedDeleteCond.getOrElse(lit(false)))
    val updM = matched && !delM &&
      fires(matchedUpdateCond.getOrElse(lit(true)))
    val insC = fires(notMatchedInsertCond.getOrElse(lit(true)))
    val nmbsDel = nmbsDelete.map { case (lo, hi, c) =>
      tOnly && col(key).between(lo, hi) && fires(c)
    }.getOrElse(lit(false))
    // clause counters: one aggregate job over the pruned subset only
    def n(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
    val frontier = srcP.join(broadcast(stats),
        col(key) >= col("kmin") && col(key) <= col("kmax"), "left_anti")
      .filter(insC)
    val cnt = joined.agg(n(updM), n(delM), n(sOnly && insC), n(nmbsDel))
      .collect()(0)
    val nIns = cnt.getLong(2) + frontier.count()
    // route: drop matched-deletes, NMBS-deletes, and non-inserting
    // source-only rows; everything else becomes the rewrite
    val outCols = cols.map { c =>
      if (c == key) col(key).as(c)
      else if (srcCols.contains(c))
        when(sOnly || updM, col(s"src_$c")).otherwise(col(c)).as(c)
      else col(c).as(c)
    }
    val rewritten = joined
      .filter(!delM && !nmbsDel && !(sOnly && !insC))
      .select(outCols: _*)
      .unionByName(frontier.select(
        (col(key) +: srcCols.map(c => col(s"src_$c").as(c)))
          .toIndexedSeq: _*)
        .select(cols.map(col).toIndexedSeq: _*))
    val staging = new Path(s"$root/_staging_v$toVersion")
    fs.delete(staging, true)
    rewritten
      .repartitionByRange(math.max(affected.length, 1) + 1, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(staging.toString)
    // zero-copy carry: untouched files ride as manifest references
    // (filtered by the churn-sized affected set, driver-local)
    val carriedL = statsL.filterFiles(!affectedSet(_))
    val newStatsRows = writeStagedManifest(s, root, toVersion, key,
      carriedL.df(s))
    // the carried DV drops ONLY keys this merge physically re-asserted
    // (the inserted rows — a DV'd key can only be NOT MATCHED, so the
    // insert path is the one that can put a physical row back). A
    // source key whose insert condition did NOT fire keeps its DV
    // entry — the merge never re-asserted it, dropping it would
    // resurrect any ghost bytes still sitting in a CARRIED file.
    fromDv.foreach { dv =>
      val asserted = joined.filter(sOnly && insC).select(col(key))
        .unionByName(frontier.select(col(key))).distinct()
      dv.join(broadcast(asserted), Seq(key), "left_anti")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$staging/_deletes")
    }
    // Y55 feed: the clause routing IS the change classification —
    // fired updates as U (post-image), fired matched/NMBS deletes as D
    // (key only), fired inserts (in-span + frontier) as I
    if (cdfEnabled(fs, root)) {
      val uRows = joined.filter(updM).select(outCols: _*)
        .withColumn("op", lit("U"))
      val iRows = joined.filter(sOnly && insC).select(outCols: _*)
        .unionByName(frontier.select(
          (col(key) +: srcCols.map(c => col(s"src_$c").as(c)))
            .toIndexedSeq: _*)
          .select(cols.map(col).toIndexedSeq: _*))
        .withColumn("op", lit("I"))
      val dRows = joined.filter(delM || nmbsDel).select(col(key))
        .withColumn("op", lit("D"))
      stageChanges(s, staging.toString, evolved,
        uRows.unionByName(iRows)
          .unionByName(dRows, allowMissingColumns = true),
        toVersion)
    }
    carrySidecar(s, fromDir, staging.toString, "_schema")
    val ok = publishStagedDir(s, root, toVersion,
      manifestValidate(newStatsRows.map(_.getLong(4)).sum, carriedL))
    MergeReport(ok, cardinalityOk = true,
      nTotal, affected.length,
      cnt.getLong(0), cnt.getLong(1), nIns, cnt.getLong(3))
  }

  /** Y41: CHANGE-DATA-FEED BETWEEN PUBLISHED VERSIONS — "what changed
    * from v{m} to v{n}" as I/U/D rows, derived AFTER the fact from two
    * immutable version dirs (the inverse of y38b, which APPLIES a
    * changelog). The naive derivation is y3's full-outer diff over
    * both complete snapshots — O(table) twice. This one prunes with
    * the publish protocol's own invariant: a file carried VERBATIM
    * (same name — Spark part-files are job-UUID'd, so a name collision
    * across versions cannot be two different rewrites — and same
    * length) is provably unchanged, and since cow writers never touch
    * carried files, no key can have moved between a carried file and a
    * rewritten one. So only the files PRESENT IN EXACTLY ONE version's
    * listing are scanned, and the keyed full-outer join runs over the
    * churned subset alone — diff cost is proportional to the churn,
    * not the table. At 100 TB with 0.1 % churn that is a ~100 GB join
    * versus two full scans. Returns (changes, scannedFrom/To,
    * totalFrom/To) so callers can audit the pruning. */
  private[graft] final case class CdfReport(changes: DataFrame,
      scannedFrom: Int, scannedTo: Int, totalFrom: Int, totalTo: Int)

  /** BOTH-IMAGES form of the change-data-feed: one row per changed key
    * with `op`, the key, and `pre_<c>` / `post_<c>` for every data
    * column (pre null for I, post null for D). This is what downstream
    * INCREMENTAL consumers need — y42's view maintenance subtracts the
    * pre-image and adds the post-image, and a group-key change only
    * moves between groups when both images travel together.
    * [[lakeChanges]] is the single-image projection of this. */
  private[graft] def lakeChangesImages(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int, key: String): CdfReport = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    // a version's file set from its MANIFEST — (file, physical dir)
    // pairs, so a zero-copy carried file is PROVABLY unchanged (same
    // identity row in both manifests = the same physical file, a
    // strictly stronger claim than the old name+length match). A
    // manifest-less version (pre-r13 snapshot) falls back to its
    // listing, all-local by construction.
    def fileSet(v: Int): Map[String, String] =
      if (fs.exists(new Path(s"$root/v$v/_file_stats")))
        manifestDf(s, root, s"v$v").select("file", "dir").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
      else
        fs.listStatus(new Path(s"$root/v$v")).toSeq
          .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
          .map(st => st.getPath.getName -> s"v$v").toMap
    val fromFiles = fileSet(fromVersion)
    val toFiles = fileSet(toVersion)
    val carried = fromFiles.keySet.intersect(toFiles.keySet)
      .filter(f => fromFiles(f) == toFiles(f))
    val fromOnly = (fromFiles.keySet -- carried).toSeq.sorted
    val toOnly = (toFiles.keySet -- carried).toSeq.sorted
    // the TO side's logical schema frames the diff: across an
    // evolution the from-side's old files read null for added columns
    val schema = versionSchema(s, s"$root/v$toVersion")
    def subset(v: Int, files: Seq[String]): DataFrame = {
      val dirs = fileSet(v)
      if (files.isEmpty)
        s.createDataFrame(s.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], schema)
      else s.read.schema(schema)
        .parquet(files.map(f => s"$root/${dirs(f)}/$f"): _*)
    }
    val dataCols = schema.fieldNames.toSeq.filterNot(_ == key)
    // MOR awareness: a version's logical content is its files MINUS its
    // deletion vector, so each side anti-joins its own DV before the
    // compare. A DV'd ghost row thus never reads as present (a key
    // deleted-then-upserted correctly surfaces as I, not U), and a fold
    // or compaction — pure physical moves — diffs to ZERO changes.
    def hasDv(v: Int): Boolean =
      fs.exists(new Path(s"$root/v$v/_deletes"))
    def dvOf(v: Int): DataFrame =
      if (hasDv(v))
        s.read.parquet(s"$root/v$v/_deletes").select(col(key))
      else subset(toVersion, Nil).select(col(key))
    val fromDv = dvOf(fromVersion)
    val toDv = dvOf(toVersion)
    val l = subset(fromVersion, fromOnly)
      .join(broadcast(fromDv), Seq(key), "left_anti")
      .select(col(key) +:
        lit(true).as("__l_present") +:
        dataCols.map(c => col(c).as(s"pre_$c")): _*)
    val r = subset(toVersion, toOnly)
      .join(broadcast(toDv), Seq(key), "left_anti")
      .select(col(key) +:
        lit(true).as("__r_present") +:
        dataCols.map(c => col(c).as(s"post_$c")): _*)
    // churn-sized full-outer join, the y3 idiom on the pruned subset
    val j = l.join(r, Seq(key), "full_outer")
    val differs = dataCols.map(c =>
      !(col(s"pre_$c") <=> col(s"post_$c"))).reduce(_ || _)
    val images = j.withColumn("op",
        when(col("__l_present").isNull, lit("I"))
          .when(col("__r_present").isNull, lit("D"))
          .when(differs, lit("U")))
      .filter(col("op").isNotNull)
      // a physically-rewritten-but-identical row passed the filter as
      // neither I/U/D — for the survivors, null the absent image so a
      // D row shows no post and an I row no pre
      .select(col("op") +: col(key) +:
        (dataCols.map(c => when(col("__l_present").isNotNull,
           col(s"pre_$c")).as(s"pre_$c")) ++
         dataCols.map(c => when(col("__r_present").isNotNull,
           col(s"post_$c")).as(s"post_$c"))): _*)
    // newly-DV'd keys whose physical row sits in a CARRIED file never
    // enter the scan above — they are logical deletes all the same.
    // Their pre-images come from a TARGETED scan: the from-version's
    // manifest prunes the carried files to those whose key span can
    // hold a delta key (the y38 prune, delta-sized broadcast again).
    val deltaDv = toDv.join(broadcast(fromDv), Seq(key), "left_anti")
    val morDeletes =
      // no DV on the to-side ⇒ deltaDv is empty BY CONSTRUCTION — skip
      // the emptiness-probe job the common (DV-less) diff used to pay
      if (!hasDv(toVersion) || deltaDv.isEmpty) images.limit(0)
      else {
        // carried-file manifest rows filtered DRIVER-side from the
        // cached manifest (the old shape re-read the parquet sidecar
        // and built a carried-sized isin expression)
        val stats = manifestLocal(s, root, s"v$fromVersion")
          .filterFiles(carried.contains).df(s)
        val hitFiles = deltaDv.join(broadcast(stats),
            col(key) >= col("kmin") && col(key) <= col("kmax"))
          .select("file").distinct()
          .collect().map(_.getString(0)).toSeq
        subset(fromVersion, hitFiles)
          .join(broadcast(deltaDv), Seq(key), "left_semi")
          .select(lit("D").as("op") +: col(key) +:
            (dataCols.map(c => col(c).as(s"pre_$c")) ++
             dataCols.map(c =>
               lit(null).cast(schema(c).dataType).as(s"post_$c"))): _*)
      }
    CdfReport(images.unionByName(morDeletes),
      fromOnly.length, toOnly.length,
      fromFiles.size, toFiles.size)
  }

  private[graft] def lakeChanges(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int, key: String): CdfReport = {
    val rep = lakeChangesImages(s, root, fromVersion, toVersion, key)
    val dataCols = rep.changes.columns.toSeq
      .collect { case c if c.startsWith("pre_") => c.stripPrefix("pre_") }
    rep.copy(changes = rep.changes.select(
      col("op") +: col(key) +: dataCols.map(c =>
        // presence-keyed by op: post-image for I/U, pre-image for D —
        // an updated-to-NULL column must surface as NULL
        when(col("op") === "D", col(s"pre_$c"))
          .otherwise(col(s"post_$c")).as(c)): _*))
  }

  /** Y36b: an in-flight optimistic publish — the pointer value observed
    * when staging began travels to commit time, where it is re-checked. */
  private[graft] final case class StagedPublish(
      root: String, version: Int, expectedCurrent: Option[String])

  /** Resolve the live version name: newest `_ptr_gen_*` when any
    * exists (the authoritative, rename-free record — see
    * [[swapPointer]]), else the legacy `_CURRENT` mirror. */
  private def readPointer(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Option[String] = {
    import org.apache.hadoop.fs.Path
    // On an object store a pointer generation lands atomically
    // (conditional PUT: existence and body together). The local-FS
    // stand-in is create-exclusive THEN write, so a concurrent reader
    // can list a generation whose body isn't flushed yet — skip any
    // empty/torn generation and resolve the newest COMPLETE one, which
    // is exactly the pre-commit state that reader was entitled to see.
    val gens = pointerGenerations(fs, root)
    gens.reverseIterator
      .map(g => readTextFile(fs, new Path(f"$root/_ptr_gen_$g%05d")).trim)
      .find(v => v.startsWith("v") && v.drop(1).forall(_.isDigit))
      .orElse {
        val cur = new Path(s"$root/_CURRENT")
        if (!fs.exists(cur)) None
        else Some(readTextFile(fs, cur).trim).filter(_.nonEmpty)
      }
  }

  /** Y36b phase 1 — stage + validate under OPTIMISTIC concurrency
    * control. Captures the pointer as it stood when this publisher's
    * work began; [[commitPublish]] refuses if it moved since (another
    * publisher won the race), so the classic lost-update — A reads v1,
    * B reads v1, B publishes v2, A publishes v3 computed FROM v1 and
    * silently discards B's rows — becomes a loud refusal the caller
    * retries from a fresh read. Returns None (staging cleaned) when
    * validation fails or a concurrent publisher already staged this
    * same version number. */
  private[graft] def beginPublish(s: SparkSession, df: DataFrame,
      root: String, version: Int,
      validate: DataFrame => Boolean): Option[StagedPublish] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    val expected = readPointer(fs, root)
    val staging = new Path(s"$root/_staging_v$version")
    if (fs.exists(staging)) return None // concurrent publisher, same version
    df.write.mode("overwrite").parquet(staging.toString)
    if (!validate(s.read.parquet(staging.toString))) {
      fs.delete(staging, true)
      None
    } else Some(StagedPublish(root, version, expected))
  }

  /** Y36b phase 2 — commit iff the pointer still reads what
    * [[beginPublish]] observed. The re-check + swap runs under a
    * `_COMMIT_LOCK` file taken with create-exclusive (atomic on every
    * Hadoop FileSystem including local), so two committers cannot
    * interleave between check and swap; the lock spans only the
    * metadata swap (milliseconds), never the data write. A lock left by
    * a crashed committer is surfaced as a loud IllegalStateException
    * after a bounded wait — breaking it is an operator decision, not
    * something this code guesses at. On refusal (pointer moved) the
    * staging dir is deleted and false returned; the winning publisher's
    * state is never touched. */
  private[graft] def commitPublish(s: SparkSession,
      st: StagedPublish): Boolean = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(st.root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val staging = new Path(s"${st.root}/_staging_v${st.version}")
    val lock = new Path(s"${st.root}/_COMMIT_LOCK")
    var locked = false
    var tries = 0
    while (!locked && tries < 20) {
      try { fs.create(lock, false).close(); locked = true }
      catch { case _: java.io.IOException =>
        tries += 1; Thread.sleep(50) }
    }
    if (!locked) throw new IllegalStateException(
      s"commitPublish: _COMMIT_LOCK in ${st.root} held for >1s — " +
        "crashed committer? Remove the lock manually after confirming " +
        "no publisher is live.")
    try {
      if (readPointer(fs, st.root) != st.expectedCurrent) {
        fs.delete(staging, true) // lost the race; refuse loudly-but-cleanly
        false
      } else {
        val finalDir = new Path(s"${st.root}/v${st.version}")
        if (fs.exists(finalDir) || !fs.rename(staging, finalDir)) {
          fs.delete(staging, true)
          false
        } else {
          swapPointer(fs, st.root, st.version)
          true
        }
      }
    } finally fs.delete(lock, false)
  }

  /** Rollback/forward: repoint `_CURRENT` at an already-published
    * version (no data movement — the versioned dirs are immutable). */
  private[graft] def repoint(s: SparkSession, root: String,
      version: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$root/v$version")),
      s"cannot repoint to unpublished v$version")
    swapPointer(fs, root, version)
  }

  /** Y37: GC for [[publish]]'s immutable version dirs — keep the live
    * version plus the `keepPrevious` most recent published versions
    * BEFORE it (the rollback window), delete everything older plus any
    * orphaned staging dirs. The window is computed by RANK over the
    * versions that actually exist, not by numeric distance — with sparse
    * numbering (v1, v5, v9) "keep 1 previous" keeps v5, exactly the
    * documented contract. Never touches the pointer, so a concurrent
    * reader that already resolved `_CURRENT` keeps reading files GC
    * never deletes; versions AFTER current (a rolled-back v3) also
    * survive — rollback-forward stays possible. Staging-dir reaping
    * assumes the SINGLE-WRITER discipline the publish protocol is built
    * on (README "concurrency model"): a concurrent in-flight publisher's
    * `_staging_v*` dir is indistinguishable from an orphan here, so run
    * GC from the same scheduler slot as the publisher, never beside it.
    * Returns the deleted dir names. */
  /** Y47: READER LEASE — pin a published version against GC. A
    * long-running reader (a time-travel query over `readVersionDir`,
    * a slow downstream export) that resolved an out-of-window version
    * would otherwise have its files reaped mid-query; the lease is the
    * handshake GC honors. The pin is one small `_pin_v{n}_{owner}`
    * file whose body is the expiry epoch-millis: create is a plain
    * overwrite (renewal = re-pin with a later expiry), release is
    * [[unpinVersion]], and a reader that dies without releasing is
    * bounded by the expiry — GC reaps the version once the lease
    * lapses, so a crashed reader cannot leak retention forever. */
  private[graft] def pinVersion(s: SparkSession, root: String,
      version: Int, owner: String, expiresAtMs: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(s"$root/v$version")),
      s"pinVersion: v$version is not published under $root")
    val out = fs.create(new Path(s"$root/_pin_v${version}_$owner"), true)
    try out.write(expiresAtMs.toString.getBytes("UTF-8"))
    finally out.close()
  }

  private[graft] def unpinVersion(s: SparkSession, root: String,
      version: Int, owner: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new Path(s"$root/_pin_v${version}_$owner"), false)
  }

  private[graft] final case class GcReport(deleted: Seq[String],
      pinnedKept: Seq[String], trimmedPtrGens: Seq[String],
      thinned: Seq[String] = Nil)

  private[graft] def gcPublished(s: SparkSession, root: String,
      keepPrevious: Int,
      nowMs: Long = System.currentTimeMillis()): GcReport = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    val (curName, _) = readPublished(s, root)
    val cur = curName.stripPrefix("v").toInt
    val dirs = fs.listStatus(new Path(root)).toSeq.map(_.getPath.getName)
    def versionOf(n: String): Option[Int] =
      if (n.startsWith("v") && n.drop(1).nonEmpty &&
        n.drop(1).forall(_.isDigit)) Some(n.drop(1).toInt) else None
    // leases: parse every _pin_v{N}_{owner}; expired pin files are
    // themselves garbage (deleted + reported), live ones protect their
    // version even outside the rank window
    val pinFiles = dirs.filter(_.startsWith("_pin_v"))
    val pins = pinFiles.flatMap { n =>
      val rest = n.stripPrefix("_pin_v")
      val vTxt = rest.takeWhile(_.isDigit)
      if (vTxt.isEmpty) None
      else {
        val expiry =
          try readTextFile(fs, new Path(s"$root/$n")).trim.toLong
          catch { case _: Exception => 0L } // unreadable pin = expired
        Some((n, vTxt.toInt, expiry))
      }
    }
    val expiredPins = pins.filter(_._3 <= nowMs).map(_._1).sorted
    val pinned = pins.filter(_._3 > nowMs).map(_._2).toSet
    val keep = dirs.flatMap(versionOf).filter(_ < cur)
      .sorted.takeRight(keepPrevious).toSet
    val pinnedKept = dirs.flatMap(versionOf)
      .filter(v => v < cur && !keep(v) && pinned(v))
      .sorted.map(v => s"v$v")
    // _staging_v* = abandoned publish attempts; _rlo_* = DML spool
    // dirs a crashed driver left between spool write and commit —
    // invisible to readers but storage leaks, reaped under the same
    // single-writer discipline as staging (never run GC beside an
    // in-flight DML)
    val doomedDirs = dirs.filter { n =>
      n.startsWith("_staging_v") || n.startsWith("_rlo_") ||
        versionOf(n).exists(v => v < cur && !keep(v) && !pinned(v))
    }.sorted
    // MANIFEST REACHABILITY (the zero-copy-carry flip side): a doomed
    // version dir may still physically hold files that RETAINED
    // versions reference. Referencers = every version dir NOT doomed
    // (current, the rank window, pinned, AND rolled-past versions
    // after current). A doomed dir with live references is THINNED —
    // its sidecars and unreferenced files reclaim, referenced data
    // files stay, and a `_REAPED` marker makes the husk refuse direct
    // reads (it is no longer a readable version, just backing storage
    // for newer manifests). Once the last referencing version is
    // itself reaped, a later GC pass deletes the husk outright.
    val doomedSet = doomedDirs.toSet
    val referenced: Map[String, Set[String]] = dirs
      .filter(n => versionOf(n).isDefined && !doomedSet(n))
      .flatMap { vn =>
        if (fs.exists(new Path(s"$root/$vn/_file_stats")))
          manifestDf(s, root, vn).select("dir", "file").collect()
            .map(r => (r.getString(0), r.getString(1)))
        else Seq.empty[(String, String)]
      }.groupBy(_._1).map { case (d, fl) => d -> fl.map(_._2).toSet }
    val fullyDeleted = scala.collection.mutable.ArrayBuffer[String]()
    val thinned = scala.collection.mutable.ArrayBuffer[String]()
    doomedDirs.foreach { n =>
      val refs =
        if (versionOf(n).isDefined) referenced.getOrElse(n, Set.empty)
        else Set.empty[String]
      if (refs.isEmpty) {
        fs.delete(new Path(s"$root/$n"), true); fullyDeleted += n
      } else {
        fs.listStatus(new Path(s"$root/$n")).foreach { st =>
          val nm = st.getPath.getName
          if (st.isFile) {
            if (!refs(nm) && nm != "_REAPED") fs.delete(st.getPath, false)
          } else if (nm.contains("=")) { // y49 partition subdir
            fs.listStatus(st.getPath).foreach { c =>
              if (!refs(s"$nm/${c.getPath.getName}"))
                fs.delete(c.getPath, true)
            }
            if (fs.listStatus(st.getPath).isEmpty)
              fs.delete(st.getPath, true)
          } else fs.delete(st.getPath, true) // sidecar dirs: never refd
        }
        val mk = fs.create(new Path(s"$root/$n/_REAPED"), true)
        try mk.write("thinned by retention GC".getBytes("UTF-8"))
        finally mk.close()
        thinned += n
      }
    }
    // pointer-generation history is metadata-tiny but unbounded; keep
    // a window of the newest gens (enough to audit recent commits —
    // readers only ever resolve the max) and trim the rest
    val ptrGens = pointerGenerations(fs, root)
    val doomedGens = ptrGens.dropRight(math.max(keepPrevious + 1, 2))
      .map(g => f"_ptr_gen_$g%05d")
    (expiredPins ++ doomedGens).foreach(n =>
      fs.delete(new Path(s"$root/$n"), true))
    GcReport((fullyDeleted.toSeq ++ expiredPins).sorted, pinnedKept,
      doomedGens, thinned.toSeq)
  }

  /** Y43: a version's LOGICAL schema — the `_schema` sidecar when
    * schema evolution has run, else the parquet footers. The sidecar is
    * what makes ADD COLUMN metadata-only: old files simply read null
    * for fields they predate, so no byte of data moves at evolution
    * time (the Delta/Iceberg idiom, re-expressed through the publish
    * protocol's own version dirs). */
  /** Schema cache: a version dir's schema is immutable once the dir
    * exists (staging mutates, but any content change moves the dir's
    * own mtime — the signature). A hit saves the 1-task
    * schema-inference job `spark.read.parquet(dir).schema` launches;
    * mutation lifecycles call this 3-5x per publish. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, org.apache.spark.sql.types.StructType)]()

  private[graft] def versionSchema(s: SparkSession, dir: String)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.hadoop.fs.Path
    val dirP = new Path(dir)
    // staging dirs mutate in place — a `_schema` rewrite under a nested
    // sidecar may not bump the parent dir's mtime, so staging paths
    // bypass the cache (r14 hardening; published dirs are immutable)
    val cacheable = !dirP.getName.startsWith("_staging_")
    val dfs = dirP.getFileSystem(s.sparkContext.hadoopConfiguration)
    val sig =
      if (!cacheable) -1L
      else
        try dfs.getFileStatus(dirP).getModificationTime
        catch { case _: java.io.IOException => -1L }
    val hit = if (cacheable) schemaCache.get(dir) else null
    if (hit != null && sig >= 0 && hit._1 == sig) hit._2
    else {
      val out = versionSchemaUncached(s, dir)
      if (cacheable && sig >= 0) {
        if (schemaCache.size > 8192) schemaCache.clear()
        schemaCache.put(dir, (sig, out))
      }
      out
    }
  }

  private def versionSchemaUncached(s: SparkSession, dir: String)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$dir/_schema")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val json =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    } else {
      // no sidecar → every referenced file shares one schema
      // (evolution always writes the sidecar). Prefer the dir's own
      // footers; a METADATA-ONLY version (zero local data files — the
      // zero-copy carry) resolves one referenced dir group through the
      // manifest instead.
      val container = new Path(dir)
      val hasLocalData = fs.exists(container) &&
        fs.listStatus(container).exists(st =>
          (st.isFile && st.getPath.getName.startsWith("part-")) ||
            (st.isDirectory && st.getPath.getName.contains("=")))
      if (hasLocalData ||
          !fs.exists(new Path(s"$dir/_file_stats")))
        s.read.parquet(dir).schema
      else {
        val root = container.getParent.toString
        val entries = manifestDf(s, root, container.getName)
          .select("dir", "file").collect()
          .map(r => (r.getString(0), r.getString(1)))
        require(entries.nonEmpty,
          s"versionSchema: $dir has no _schema sidecar, no local data " +
            "files, and an empty manifest — schema is undefined")
        val (d, fl) = entries.groupBy(_._1).toSeq.minBy(_._1)
        val base = physDir(root, container.getName, d)
        s.read.option("basePath", base)
          .parquet(fl.map(e => s"$base/${e._2}").toIndexedSeq: _*).schema
      }
    }
  }

  /** Manifest-answered row count of a published version: Σ `n_rows`
    * over the manifest — exact on a CLEAN version (no deletion vector
    * subtracting rows at read, every file's count recorded) and ZERO
    * data IO regardless of table size. None when exactness could
    * slip — callers fall back to a scan. The library-side twin of the
    * DSv2 connector's pushed-down COUNT(*). */
  private[graft] def manifestRowCount(s: SparkSession, root: String,
      version: Int): Option[Long] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(s"$root/v$version/_deletes")) ||
        !fs.exists(new Path(s"$root/v$version/_file_stats"))) None
    else {
      val counts = manifestDf(s, root, s"v$version").select("n_rows")
        .collect().map(_.getLong(0))
      if (counts.exists(_ < 0L)) None else Some(counts.sum)
    }
  }

  /** Open a version dir under its logical schema — resolving through
    * the manifest when one exists (zero-copy carried files live in
    * OLDER version dirs; a raw dir read would miss them). */
  private[graft] def readVersionDir(s: SparkSession, dir: String)
      : DataFrame = {
    import org.apache.hadoop.fs.Path
    val container = new Path(dir)
    val fs = container.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(s"$dir/_REAPED")))
      throw new IllegalStateException(
        s"readVersionDir: $dir was reaped by retention GC — its " +
          "remaining files only back newer versions' manifests; " +
          "pin versions with a reader lease (y47) to time-travel them")
    if (fs.exists(new Path(s"$dir/_file_stats")))
      readResolved(s, container.getParent.toString, container.getName,
        versionSchema(s, dir))
    else if (fs.exists(new Path(s"$dir/_schema")))
      s.read.schema(versionSchema(s, dir)).parquet(dir)
    else s.read.parquet(dir)
  }

  private def writeSchemaSidecar(s: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.hadoop.fs.Path
    val p = new Path(s"$dir/_schema")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
  }

  private def carrySidecar(s: SparkSession, fromDir: String,
      stagingDir: String, name: String): Unit = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = s.sparkContext.hadoopConfiguration
    val src = new Path(s"$fromDir/$name")
    val fs = src.getFileSystem(conf)
    if (fs.exists(src))
      FileUtil.copy(fs, src, fs, new Path(s"$stagingDir/$name"),
        false, conf)
  }

  /** Y43: METADATA-ONLY ADD COLUMN under the publish protocol. The new
    * version carries every data file, the manifest, and any deletion
    * vector VERBATIM; the only new bytes are the `_schema` sidecar with
    * the widened struct. Readers of the new version see the added
    * columns as null over pre-evolution files; readers of old versions
    * see the old schema — both stay correct forever, which is the whole
    * point of schemas traveling WITH immutable versions. New columns
    * must be nullable (there is no data to back anything else), names
    * must not collide, and nothing else (drop/rename/retype) is
    * expressible here — those are y27's migration planner territory,
    * and a rewrite. Backfill happens through the ordinary cow mutation
    * path afterwards, file-pruned as ever. */
  private[graft] def evolveSchema(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int,
      addCols: Seq[org.apache.spark.sql.types.StructField]): Boolean = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new Path(root).getFileSystem(conf)
    val fromDir = s"$root/v$fromVersion"
    val base = versionSchema(s, fromDir)
    require(addCols.forall(_.nullable),
      "evolveSchema: added columns must be nullable — no data backs them")
    require(addCols.forall(f => !base.fieldNames.contains(f.name)),
      s"evolveSchema: name collision with ${base.fieldNames.toSeq}")
    val staging = new Path(s"$root/_staging_v$toVersion")
    fs.delete(staging, true)
    fs.mkdirs(staging)
    if (fs.exists(new Path(s"$fromDir/_file_stats")))
      // zero-copy: every data file carries as a manifest reference —
      // the normalized rewrite (not a sidecar copy) so legacy
      // dir-less rows pin the dir they actually live in
      manifestDf(s, root, s"v$fromVersion")
        .select(ManifestCols.map(col): _*)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$staging/_file_stats")
    else // manifest-less version: the legacy physical carry
      fs.listStatus(new Path(fromDir)).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .foreach { st =>
          FileUtil.copy(fs, st.getPath,
            fs, new Path(s"$staging/${st.getPath.getName}"), false, conf)
        }
    carrySidecar(s, fromDir, staging.toString, "_deletes")
    writeSchemaSidecar(s, staging.toString,
      org.apache.spark.sql.types.StructType(base.fields ++ addCols))
    // Y55: metadata-only — empty feed UNDER THE WIDENED SCHEMA, so a
    // streaming consumer's null-fill picks up the new column from here
    if (cdfEnabled(fs, root))
      stageEmptyChanges(s, staging.toString,
        org.apache.spark.sql.types.StructType(base.fields ++ addCols),
        toVersion)
    publishStagedDir(s, root, toVersion, _.head(1).nonEmpty)
  }

  /** Y47: SQL DML INGEST under the publish protocol — the write half of
    * the DataSourceV2 connector (`INSERT INTO` / `INSERT OVERWRITE`
    * through the lake catalog land here). Append is a pure FRONTIER
    * move: every existing data file, and the manifest rows describing
    * them, carry to the new version VERBATIM (the local-FS copy stands
    * in for an object-store manifest entry, as everywhere in the
    * stack); the increment writes as NEW key-clustered files whose
    * manifest rows are computed from the increment alone — publish
    * cost ∝ |insert batch|, never ∝ table size. Overwrite is a full
    * snapshot publish (y2's shape) under the same staged protocol.
    * Two correctness seams both modes honor:
    *  - SCHEMA CONTRACT: incoming columns must equal the live logical
    *    schema by name (y43 evolution first, then backfill) — a
    *    silent reorder/typo becomes a loud refusal;
    *  - DV RE-ASSERTION: appending a key the carried deletion vector
    *    holds must RESURRECT it (INSERT has no "matched" state — the
    *    new row is asserted content), so carried DV = old DV minus
    *    the increment's keys, mirroring mergeInto's only-reasserted
    *    rule. Without this an insert into a MOR table silently loses
    *    exactly the rows it claims to add. */
  private[graft] def appendPublish(s: SparkSession, root: String,
      key: String, df: DataFrame, overwrite: Boolean,
      writeFiles: Int = 4): Boolean = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new Path(root).getFileSystem(conf)
    val curName = liveVersion(s, root).getOrElse(
      throw new IllegalStateException(
        s"appendPublish: no published version under $root — bootstrap " +
          "through publish() first"))
    val cur = curName.stripPrefix("v").toInt
    val fromDir = s"$root/$curName"
    val logical = versionSchema(s, fromDir)
    require(df.columns.toSet == logical.fieldNames.toSet,
      s"appendPublish: incoming columns ${df.columns.toSeq.sorted} do " +
        s"not match the live logical schema " +
        s"${logical.fieldNames.toSeq.sorted} — evolve first (y43), " +
        "then write")
    val aligned = df.select(logical.fieldNames.toIndexedSeq.map(col): _*)
    val staging = new Path(s"$root/_staging_v${cur + 1}")
    fs.delete(staging, true)
    if (overwrite) {
      // full snapshot: fresh manifest, no DV (all content re-asserted)
      aligned.repartitionByRange(math.max(writeFiles, 1), col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite").parquet(staging.toString)
      writeFileStats(s, staging.toString, key)
      carrySidecar(s, fromDir, staging.toString, "_schema")
    } else {
      // DV COLLISION FOLD: a key the increment asserts while the old
      // deletion vector still masks a physical ghost cannot ride the
      // pure frontier — the DV is KEYED, not positional, so carrying
      // its entry would kill the new row too, and dropping it would
      // resurrect the ghost next to the new row (observed: count 2).
      // The only exact move is to physically fold the ghost out of its
      // files NOW: affected files (manifest-pruned on the colliding
      // keys) rewrite minus those keys, everything else carries
      // verbatim — cost ∝ collisions, the cow bill arriving exactly
      // when MOR's deferred-delete debt comes due.
      val hasDv = fs.exists(new Path(s"$fromDir/_deletes"))
      val oldDv =
        if (hasDv) s.read.parquet(s"$fromDir/_deletes").select(col(key))
        else aligned.select(col(key)).limit(0)
      val colliding = oldDv
        .join(aligned.select(col(key)).distinct(), Seq(key), "left_semi")
        .cache()
      val collide = colliding.head(1).nonEmpty
      val statsPath = new Path(s"$fromDir/_file_stats")
      // ONE manifest read; further uses driver-local (see cowApply)
      val oldStats =
        if (fs.exists(statsPath))
          Some(manifestLocal(s, root, s"v$cur"))
        else None
      // (file, physical dir) — manifest-first; a manifest-less version
      // can only hold local files, so the listing fallback is exact
      val oldFD: Seq[(String, String)] = oldStats match {
        case Some(st) =>
          val (fi, di) = (st.schema.fieldIndex("file"),
            st.schema.fieldIndex("dir"))
          st.rows.map(r => (r.getString(fi), r.getString(di)))
        case None => fs.listStatus(new Path(fromDir)).toSeq
          .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
          .map(st => (st.getPath.getName, s"v$cur"))
      }
      val affectedFD: Seq[(String, String)] =
        if (!collide) Nil
        else oldStats match {
          case Some(st) => st.df(s).join(colliding,
              col(key) >= col("kmin") && col(key) <= col("kmax"))
            .select("file", "dir").distinct().collect()
            .map(r => (r.getString(0), r.getString(1))).toSeq
          case None => oldFD // no manifest — rewrite conservatively
        }
      val affected = affectedFD.map(_._1)
      val rewritten =
        if (affectedFD.isEmpty) aligned.limit(0)
        else s.read.schema(logical)
          .parquet(affectedFD.map { case (f, d) => s"$root/$d/$f" }: _*)
          .join(colliding, Seq(key), "left_anti")
          .select(logical.fieldNames.toIndexedSeq.map(col): _*)
      // one staged write carries the increment + any folded rewrites
      aligned.unionByName(rewritten)
        .repartitionByRange(math.max(writeFiles, 1), col(key))
        .sortWithinPartitions(key)
        .write.mode("overwrite").parquet(staging.toString)
      oldStats match {
        case Some(st) =>
          // zero-copy frontier: every untouched old file rides as a
          // manifest reference — append cost ∝ |increment| in BYTES
          // now, not just in rewrites
          val affSet = affected.toSet
          writeStagedManifest(s, root, cur + 1, key,
            st.filterFiles(!affSet(_)).df(s))
        case None =>
          // manifest-less source: physically carry (legacy), then
          // mint a fresh manifest over the whole staged dir
          oldFD.filterNot(fd => affected.contains(fd._1)).foreach {
            case (f, _) =>
              FileUtil.copy(fs, new Path(s"$fromDir/$f"),
                fs, new Path(s"$staging/$f"), false, conf)
          }
          writeFileStats(s, staging.toString, key)
      }
      if (hasDv) {
        // folded keys leave the DV (their ghosts are physically gone);
        // DV ∩ increment = colliding, so this is the whole adjustment
        val carriedDv = oldDv.join(colliding, Seq(key), "left_anti")
        if (carriedDv.head(1).nonEmpty)
          carriedDv.coalesce(1).write.mode("overwrite")
            .parquet(s"$staging/_deletes")
      }
      colliding.unpersist()
      // Y55: an append's feed is the increment as I — the collision
      // fold's rewrites changed no OTHER logical row, and a re-asserted
      // ghost's logical event is exactly "this row now exists"
      if (cdfEnabled(fs, root))
        stageChanges(s, staging.toString, logical,
          aligned.withColumn("op", lit("I")), cur + 1)
      carrySidecar(s, fromDir, staging.toString, "_schema")
    }
    // (overwrite stages no feed here: the publishStagedDir hook emits
    // the T reseed sentinel + the snapshot as I)
    publishStagedDir(s, root, cur + 1, _.head(1).nonEmpty)
  }

  /** Y44: MULTI-TABLE ATOMIC PUBLISH — the cross-table transaction
    * single-table lakehouses famously lack, and exactly what
    * FK-consistent sync (y17) needs on the publish side: a parent and
    * its children must never be readable in mixed generations. One
    * GROUP POINTER (`_CURRENT_GROUP`: `table=version` lines) pins
    * every member table to a version; readers resolve it ONCE and get
    * a consistent cross-table snapshot. Publishing stages and renames
    * each table's `v{n}` first — invisible until the pointer moves —
    * then swaps the single pointer file: the transaction commits at
    * that one rename, no matter how many tables moved. Tables NOT in
    * the batch carry forward at their pointed versions with zero data
    * movement. A validation failure or crash mid-flight aborts
    * cleanly: this attempt's landed dirs are deleted (readers never
    * resolved them) and the pointer — hence every reader — keeps the
    * previous consistent group. Retries are idempotent per table (an
    * already-landed `v{n}` is accepted as this attempt's own prior
    * work, the y36b same-version idiom). */
  private def parseGroup(txt: String): Map[String, Int] =
    txt.linesIterator.filter(_.contains("=")).map { ln =>
      val Array(t, v) = ln.trim.split("=", 2)
      t -> v.toInt
    }.toMap

  private def readTextFile(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** The AUTHORITATIVE group state is the newest `_group_gen_NNNNN`
    * snapshot — those files are created with create-exclusive (no
    * rename, no delete — object-store safe) and never change, so a
    * reader can never observe a torn or missing state once any commit
    * exists. `_CURRENT_GROUP` is only the legacy/convenience mirror:
    * consulted when no generation exists, never preferred over one —
    * which also closes the mid-swap race where the delete+rename
    * mirror briefly reads as absent and a reader would otherwise see
    * an EMPTY group where a committed one exists. */
  private def readGroupPointer(
      fs: org.apache.hadoop.fs.FileSystem, root: String)
      : Map[String, Int] = {
    import org.apache.hadoop.fs.Path
    groupGenerations(fs, root).lastOption match {
      case Some(gen) =>
        parseGroup(readTextFile(fs, new Path(f"$root/_group_gen_$gen%05d")))
      case None =>
        val p = new Path(s"$root/_CURRENT_GROUP")
        if (!fs.exists(p)) Map.empty else parseGroup(readTextFile(fs, p))
    }
  }

  /** The live group pointer as (table → version) — the resolution half
    * of [[readPublishedGroup]], for consumers that plan their own read
    * (the SQL catalog's group mode). */
  private[graft] def groupPointerVersions(s: SparkSession, root: String)
      : Map[String, Int] = {
    import org.apache.hadoop.fs.Path
    readGroupPointer(
      new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration),
      root)
  }

  /** A PINNED group generation as (table → version). Generation files
    * are immutable, so every resolution against the same `gen` returns
    * the same map forever — the cross-table snapshot-isolation token. */
  private[graft] def groupGenVersions(s: SparkSession, root: String,
      gen: Int): Map[String, Int] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    val p = new Path(f"$root/_group_gen_$gen%05d")
    require(fs.exists(p), s"groupGenVersions: no generation $gen under " +
      s"$root (have ${groupGenerations(fs, root).mkString(",")})")
    parseGroup(readTextFile(fs, p))
  }

  private[graft] def publishGroup(s: SparkSession, root: String,
      tables: Seq[(String, DataFrame)], version: Int,
      validate: DataFrame => Boolean): Boolean = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    val landed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def abort(): Boolean = {
      // NEVER delete a dir the COMMITTED group already references at
      // this version — the idempotent-retry branch "adopts" existing
      // v{n} dirs into `landed`, and on a re-run of an already-committed
      // publish (or a group extended at the same version number) those
      // dirs are live: reaping them would break every reader of the
      // committed generation. Only this attempt's own uncommitted work
      // is cleaned up.
      val committed = readGroupPointer(fs, root)
      import scala.jdk.CollectionConverters._
      landed.asScala.toSeq.sorted
        .filterNot(t => committed.get(t).contains(version))
        .foreach(t => fs.delete(new Path(s"$root/$t/v$version"), true))
      false
    }
    // STAGE IN PARALLEL (r13, guide §2.6): member tables are
    // independent until the pointer commit, and each staging is a
    // small write job + a validation read — run serially, every
    // member's scheduling/IO gaps leave the cluster idle. 2-3 jobs in
    // flight back-fill each other's tails; Spark's scheduler handles
    // concurrent actions natively. Atomicity is untouched: the
    // transaction still commits at the single pointer write below,
    // and a failed member aborts every non-committed dir.
    def stageOne(name: String, df: DataFrame): Boolean = {
      val tRoot = s"$root/$name"
      val staging = new Path(s"$tRoot/_staging_v$version")
      val dst = new Path(s"$tRoot/v$version")
      if (fs.exists(dst)) {
        // idempotent retry: the prior attempt of THIS version landed it
        landed.add(name); true
      } else {
        fs.delete(staging, true)
        df.write.mode("overwrite").parquet(staging.toString)
        if (!validate(s.read.parquet(staging.toString))) {
          fs.delete(staging, true); false
        } else if (!fs.rename(staging, dst)) {
          fs.delete(staging, true); false
        } else { landed.add(name); true }
      }
    }
    val allOk =
      if (tables.size <= 1) tables.forall(t => stageOne(t._1, t._2))
      else {
        val pool = java.util.concurrent.Executors
          .newFixedThreadPool(math.min(tables.size, 3))
        try {
          val futs = tables.map { case (name, df) =>
            pool.submit(new java.util.concurrent.Callable[Boolean] {
              override def call(): Boolean = stageOne(name, df)
            })
          }
          // drain EVERY future before judging — abort() deletes dirs,
          // which must never race a still-staging member
          val results = futs.map(f =>
            try f.get() catch { case _: Exception => false })
          results.forall(identity)
        } finally pool.shutdown()
      }
    if (!allOk) return abort()
    // the transaction commits HERE: one pointer-file rename
    val next = readGroupPointer(fs, root) ++ tables.map(_._1 -> version)
    commitGroupPointer(fs, root, next)
    true
  }

  /** Y46: commit a group state — record it as an immutable, numbered
    * `_group_gen_NNNNN` snapshot, then swap the live pointer. The
    * generation files are the group's HISTORY: they never change and
    * are never deleted by a commit, so any past consistent cross-table
    * state stays addressable ([[readGroupAsOf]]) for as long as y37-style
    * GC leaves its table versions alive. Returns the new generation. */
  private def commitGroupPointer(fs: org.apache.hadoop.fs.FileSystem,
      root: String, state: Map[String, Int]): Int = {
    import org.apache.hadoop.fs.Path
    val gen = groupGenerations(fs, root).lastOption.getOrElse(0) + 1
    val body = state.toSeq.sortBy(_._1)
      .map { case (t, v) => s"$t=$v" }.mkString("\n").getBytes("UTF-8")
    val genP = new Path(f"$root/_group_gen_$gen%05d")
    // THE COMMIT: one create-exclusive write (atomic on every Hadoop
    // FileSystem; a conditional PUT on an object store) — no rename,
    // no delete anywhere on the commit path. A concurrent committer
    // racing to the same generation number loses this create and
    // throws: loud, never torn.
    val genOut = fs.create(genP, false)
    try genOut.write(body) finally genOut.close()
    // best-effort convenience mirror only — readers prefer the newest
    // generation (readGroupPointer), so a crash or failed rename here
    // cannot lose or tear the committed state
    try {
      val tmp = new Path(s"$root/_CURRENT_GROUP.tmp")
      val out = fs.create(tmp, true)
      try out.write(body) finally out.close()
      val cur = new Path(s"$root/_CURRENT_GROUP")
      fs.delete(cur, false)
      fs.rename(tmp, cur)
    } catch { case _: java.io.IOException => () }
    gen
  }

  private def groupGenerations(fs: org.apache.hadoop.fs.FileSystem,
      root: String): Seq[Int] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(root)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_group_gen_"))
      .map(_.stripPrefix("_group_gen_").toInt).sorted
  }

  private[graft] def groupGenerations(s: SparkSession, root: String)
      : Seq[Int] = {
    import org.apache.hadoop.fs.Path
    groupGenerations(
      new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration),
      root)
  }

  /** Y46: TIME TRAVEL over the group history — resolve generation `gen`'s
    * snapshot file instead of the live pointer; same consistent-read
    * contract as [[readPublishedGroup]], pinned to the past. */
  private[graft] def readGroupAsOf(s: SparkSession, root: String,
      gen: Int): Map[String, (Int, DataFrame)] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    val p = new Path(f"$root/_group_gen_$gen%05d")
    require(fs.exists(p), s"readGroupAsOf: no generation $gen under $root" +
      s" (have ${groupGenerations(fs, root).mkString(",")})")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    txt.linesIterator.filter(_.contains("=")).map { ln =>
      val Array(t, v) = ln.trim.split("=", 2)
      t -> (v.toInt, readVersionDir(s, s"$root/$t/v${v.toInt}"))
    }.toMap
  }

  /** Y46: ROLLBACK as ROLL-FORWARD — restoring generation `gen` commits
    * a NEW generation whose content is the old snapshot (the git-revert
    * shape): history stays append-only and auditable, the bad generation
    * remains inspectable, and since every table version dir is immutable
    * and still present, the rollback moves ZERO data bytes — it is one
    * pointer commit no matter how many tables or terabytes it restores. */
  private[graft] def rollbackGroup(s: SparkSession, root: String,
      gen: Int): Int = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    val p = new Path(f"$root/_group_gen_$gen%05d")
    require(fs.exists(p), s"rollbackGroup: no generation $gen under $root")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val state = txt.linesIterator.filter(_.contains("=")).map { ln =>
      val Array(t, v) = ln.trim.split("=", 2)
      t -> v.toInt
    }.toMap
    state.foreach { case (t, v) =>
      require(fs.exists(new Path(s"$root/$t/v$v")),
        s"rollbackGroup: $t/v$v was GC'd — generation $gen unrestorable")
    }
    commitGroupPointer(fs, root, state)
  }

  /** Resolve the group pointer ONCE → every member table at its pinned
    * version (logical schema honored). The map is the consistent
    * snapshot: no later publish can change what these frames read. */
  private[graft] def readPublishedGroup(s: SparkSession, root: String)
      : Map[String, (Int, DataFrame)] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    readGroupPointer(fs, root).map { case (t, v) =>
      t -> (v, readVersionDir(s, s"$root/$t/v$v"))
    }
  }

  /** Resolve the `_CURRENT` pointer and open exactly that version,
    * under its logical schema (see [[versionSchema]]). */
  /** The live version NAME (`"v3"`) without opening it — the pointer
    * resolution half of [[readPublished]], exposed for consumers that
    * plan their own read (the DataSourceV2 connector resolves the
    * version at table-load time, then reads files directly). */
  private[graft] def liveVersion(s: SparkSession, root: String)
      : Option[String] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    readPointer(fs, root)
  }

  /** Has ANY version been committed under `root`? (Pointer-protocol
    * aware: generations first, legacy mirror second.) */
  private[graft] def hasPublished(s: SparkSession, root: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    readPointer(fs, root).isDefined
  }

  private[graft] def readPublished(s: SparkSession, root: String)
      : (String, DataFrame) = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    val v = readPointer(fs, root).getOrElse(throw new IllegalStateException(
      s"readPublished: no published version under $root — neither a " +
        "_ptr_gen_* generation nor a _CURRENT mirror exists"))
    (v, readVersionDir(s, s"$root/$v"))
  }

  def collectAndSweep(df: DataFrame): Array[org.apache.spark.sql.Row] = {
    val spark = df.sparkSession
    try df.collect()
    finally {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
  }

  /** The order-insensitive digest idiom (y6/y12): 15-hex-digit slice of
    * a row hash, mod 1e9, summed per group. */
  private def digestOf(h: org.apache.spark.sql.Column) =
    sum(pmod(conv(substring(h, 1, 15), 16, 10).cast("long"),
      lit(1000000000L)))

  /** [[childSide]] generalized over the child's FK column and keyed row
    * hash, so any FK-child of orders (lineitem, a returns feed, …) can
    * roll up per parent-year with its own digest schema. */
  private def childSideG(child: DataFrame, parent: DataFrame, fk: String,
                         keyedHash: org.apache.spark.sql.Column,
                         rows: String, dig: String) =
    child.join(parent.select(col("o_orderkey"), col("o_orderdate")),
        col(fk) === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(count(lit(1)).as(rows), digestOf(keyedHash).as(dig))

  private val lineHashCols = Seq(
    col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
    col("l_quantity").cast("decimal(18,2)").cast("string"),
    col("l_extendedprice").cast("decimal(18,2)").cast("string"),
    col("l_returnflag"))

  private def childSide(child: DataFrame, parent: DataFrame,
                        rows: String, dig: String) =
    childSideG(child, parent, "l_orderkey",
      md5(concat_ws("|", lineHashCols: _*)), rows, dig)

  private val childHashSql = (a: String) =>
    s"md5(concat_ws('|', $a.l_orderkey, $a.l_linenumber, $a.l_partkey, " +
    s"CAST(CAST($a.l_quantity AS DECIMAL(18,2)) AS VARCHAR), " +
    s"CAST(CAST($a.l_extendedprice AS DECIMAL(18,2)) AS VARCHAR), $a.l_returnflag))"

  private val returnsHashSql = (a: String) =>
    s"md5(concat_ws('|', $a.l_orderkey, $a.l_linenumber, " +
    s"CAST(CAST($a.r_refund AS DECIMAL(18,2)) AS VARCHAR)))"

  /** DuckDB spelling of [[digestOf]]. */
  private def digSql(h: String) =
    s"CAST(SUM(CAST(concat('0x', substr($h, 1, 15)) AS BIGINT) % 1000000000) AS BIGINT)"

  /** Per-child oracle CTE block for y17b — the SQL twin of one
    * [[FkChild]] pass through [[fkConsistentSyncMulti]] (suffix `n`
    * disambiguates the CTEs; shares ppl/pa/paf from the parent block). */
  private def multiChildCteSql(n: String, srcRel: String, tgtRel: String,
      fk: String, cols: Seq[String], hashSql: String => String): String = {
    def colList(a: String) = cols.map(c => s"$a.$c AS $c").mkString(", ")
    s"""ccs_$n AS (
       |  SELECT CAST(EXTRACT(year FROM src.o_orderdate) AS INTEGER) AS order_year,
       |    COUNT(*) AS c_src_rows, ${digSql(hashSql(srcRel))} AS c_src_digest
       |  FROM $srcRel JOIN src ON $srcRel.$fk = src.o_orderkey GROUP BY 1),
       |cct_$n AS (
       |  SELECT CAST(EXTRACT(year FROM orders.o_orderdate) AS INTEGER) AS order_year,
       |    COUNT(*) AS c_tgt_rows, ${digSql(hashSql(tgtRel))} AS c_tgt_digest
       |  FROM $tgtRel JOIN orders ON $tgtRel.$fk = orders.o_orderkey GROUP BY 1),
       |ccl_$n AS (
       |  SELECT COALESCE(ccs_$n.order_year, cct_$n.order_year) AS order_year,
       |    COALESCE(c_src_rows, 0) AS c_src_rows,
       |    NOT (COALESCE(c_src_rows, 0) = COALESCE(c_tgt_rows, 0) AND
       |         COALESCE(c_src_digest, -1) = COALESCE(c_tgt_digest, -1)) AS child_own_dirty,
       |    COALESCE(c_src_digest, -1) AS c_src_digest
       |  FROM ccs_$n FULL OUTER JOIN cct_$n ON ccs_$n.order_year = cct_$n.order_year),
       |pl_$n AS (
       |  SELECT COALESCE(ppl.order_year, ccl_$n.order_year) AS order_year,
       |    COALESCE(p_src_rows, 0) AS p_src_rows,
       |    COALESCE(parent_dirty, FALSE) AS parent_dirty,
       |    COALESCE(p_src_digest, -1) AS p_src_digest,
       |    COALESCE(c_src_rows, 0) AS c_src_rows,
       |    (COALESCE(parent_dirty, FALSE) OR COALESCE(child_own_dirty, FALSE)) AS child_dirty,
       |    COALESCE(c_src_digest, -1) AS c_src_digest
       |  FROM ppl FULL OUTER JOIN ccl_$n ON ppl.order_year = ccl_$n.order_year),
       |ca_$n AS (
       |  SELECT ${colList("c")},
       |    CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS c_year
       |  FROM $tgtRel c JOIN orders o ON c.$fk = o.o_orderkey
       |  WHERE CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) NOT IN
       |        (SELECT order_year FROM pl_$n WHERE child_dirty)
       |  UNION ALL
       |  SELECT ${colList("c")},
       |    CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS c_year
       |  FROM $srcRel c JOIN src o ON c.$fk = o.o_orderkey
       |  WHERE CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) IN
       |        (SELECT order_year FROM pl_$n WHERE child_dirty)),
       |caf_$n AS (
       |  SELECT c_year AS order_year, ${digSql(hashSql(s"ca_$n"))} AS ca_digest
       |  FROM ca_$n GROUP BY 1),
       |orph_$n AS (
       |  SELECT c_year AS order_year, COUNT(*) AS n_orph FROM ca_$n
       |  WHERE NOT EXISTS (SELECT 1 FROM pa WHERE pa.o_orderkey = ca_$n.$fk)
       |  GROUP BY 1)""".stripMargin
  }

  private def multiChildSelectSql(n: String, label: String): String =
    s"""SELECT '$label' AS child, pl_$n.order_year, parent_dirty, child_dirty,
       |  CASE WHEN parent_dirty THEN p_src_rows ELSE 0 END AS n_parent_copied,
       |  CASE WHEN child_dirty THEN c_src_rows ELSE 0 END AS n_child_copied,
       |  COALESCE(pa_digest, -1) = p_src_digest AS parent_clean_after,
       |  COALESCE(caf_$n.ca_digest, -1) = c_src_digest AS child_clean_after,
       |  COALESCE(n_orph, 0) AS n_orphans_after
       |FROM pl_$n
       |LEFT JOIN paf ON pl_$n.order_year = paf.order_year
       |LEFT JOIN caf_$n ON pl_$n.order_year = caf_$n.order_year
       |LEFT JOIN orph_$n ON pl_$n.order_year = orph_$n.order_year""".stripMargin

  /** Y17 engine: FK-consistent parent+child dirty-partition sync,
    * parameterized over all four sides so the law test can drive it with
    * narrow mutations (one child-only-dirty year, one parent-dirty year,
    * an orphan-corrupted target) that sourceView's all-years mutation
    * cannot exercise.
    *
    * The rule that makes it FK-consistent: a child partition is dirty
    * when ITS OWN digest differs OR its parent partition is dirty —
    * parent and child partitions for a dirty year always ship together,
    * so the target never holds a child row whose parent vanished
    * mid-sync. The output validates exactly that: per year, both sides'
    * clean_after digests plus an orphan count over the post-sync pair
    * (child anti-joined to parent on the FK), which must be uniformly 0.
    *
    * Scale: the plan is two y12-style single-scan rollups per table
    * (the child's includes the one unavoidable FK join); the copy is
    * partition-pruned on the broadcast ≤|years| dirty sets; the orphan
    * audit is one FK shuffle join over the post-state — the same
    * validation a production sync runs, and AQE skew-splits it. */
  def fkConsistentSync(srcO: DataFrame, tgtO: DataFrame,
                       srcL: DataFrame, tgtL: DataFrame): DataFrame = {
    val pPlan = partitionSide(srcO, "p_src_rows", "p_src_digest")
      .join(partitionSide(tgtO, "p_tgt_rows", "p_tgt_digest"),
        Seq("order_year"), "full_outer")
      .select(col("order_year"),
        coalesce(col("p_src_rows"), lit(0L)).as("p_src_rows"),
        (!(coalesce(col("p_src_rows"), lit(0L)) === coalesce(col("p_tgt_rows"), lit(0L)) &&
           coalesce(col("p_src_digest"), lit(-1L)) === coalesce(col("p_tgt_digest"), lit(-1L))))
          .as("parent_dirty"),
        coalesce(col("p_src_digest"), lit(-1L)).as("p_src_digest"))
    val cPlan = childSide(srcL, srcO, "c_src_rows", "c_src_digest")
      .join(childSide(tgtL, tgtO, "c_tgt_rows", "c_tgt_digest"),
        Seq("order_year"), "full_outer")
      .select(col("order_year"),
        coalesce(col("c_src_rows"), lit(0L)).as("c_src_rows"),
        (!(coalesce(col("c_src_rows"), lit(0L)) === coalesce(col("c_tgt_rows"), lit(0L)) &&
           coalesce(col("c_src_digest"), lit(-1L)) === coalesce(col("c_tgt_digest"), lit(-1L))))
          .as("child_own_dirty"),
        coalesce(col("c_src_digest"), lit(-1L)).as("c_src_digest"))
    // ≤|years| rows; persisted because it feeds the two dirty-set
    // broadcasts, the copy pruning, and the final report (callers:
    // Bench/Verify sweep caches per query; direct library callers should
    // clearCache() after materializing the result — see ADVICE r7).
    val plan = pPlan.join(cPlan, Seq("order_year"), "full_outer")
      .select(col("order_year"),
        coalesce(col("p_src_rows"), lit(0L)).as("p_src_rows"),
        coalesce(col("parent_dirty"), lit(false)).as("parent_dirty"),
        coalesce(col("p_src_digest"), lit(-1L)).as("p_src_digest"),
        coalesce(col("c_src_rows"), lit(0L)).as("c_src_rows"),
        (coalesce(col("parent_dirty"), lit(false)) ||
         coalesce(col("child_own_dirty"), lit(false))).as("child_dirty"),
        coalesce(col("c_src_digest"), lit(-1L)).as("c_src_digest"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dirtyP = plan.filter(col("parent_dirty")).select(col("order_year"))
    val dirtyC = plan.filter(col("child_dirty")).select(col("order_year"))
    // parent copy: y16's shape
    val parentAfter = tgtO.join(broadcast(dirtyP),
        year(col("o_orderdate")) === col("order_year"), "left_anti")
      .unionByName(srcO.join(broadcast(dirtyP),
        year(col("o_orderdate")) === col("order_year"), "left_semi"))
    // child copy: each side year-tagged through its own parent, pruned
    // on the child dirty set
    def tagged(child: DataFrame, parent: DataFrame) =
      child.join(parent.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("l_year", year(col("o_orderdate")))
        .drop("o_orderkey", "o_orderdate")
    val childAfter = tagged(tgtL, tgtO).join(broadcast(dirtyC),
        col("l_year") === col("order_year"), "left_anti")
      .unionByName(tagged(srcL, srcO).join(broadcast(dirtyC),
        col("l_year") === col("order_year"), "left_semi"))
    val pAfter = partitionSide(parentAfter, "pa_rows", "pa_digest")
    val keyedHash = md5(concat_ws("|",
      col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
      col("l_quantity").cast("decimal(18,2)").cast("string"),
      col("l_extendedprice").cast("decimal(18,2)").cast("string"),
      col("l_returnflag")))
    val cAfter = childAfter
      .groupBy(col("l_year").as("order_year"))
      .agg(sum(pmod(conv(substring(keyedHash, 1, 15), 16, 10)
        .cast("long"), lit(1000000000L))).as("ca_digest"))
    // the FK law, audited over the POST-sync pair: a child row with no
    // parent is exactly the inconsistency this operator exists to prevent
    val orphans = childAfter
      .join(parentAfter.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .groupBy(col("l_year").as("order_year"))
      .agg(count(lit(1)).as("n_orph"))
    plan
      .join(pAfter.select(col("order_year"), col("pa_digest")),
        Seq("order_year"), "left")
      .join(cAfter, Seq("order_year"), "left")
      .join(orphans, Seq("order_year"), "left")
      .select(col("order_year"), col("parent_dirty"), col("child_dirty"),
        when(col("parent_dirty"), col("p_src_rows")).otherwise(lit(0L))
          .as("n_parent_copied"),
        when(col("child_dirty"), col("c_src_rows")).otherwise(lit(0L))
          .as("n_child_copied"),
        (coalesce(col("pa_digest"), lit(-1L)) === col("p_src_digest"))
          .as("parent_clean_after"),
        (coalesce(col("ca_digest"), lit(-1L)) === col("c_src_digest"))
          .as("child_clean_after"),
        coalesce(col("n_orph"), lit(0L)).as("n_orphans_after"))
      .orderBy("order_year")
  }

  /** One FK-child of the parent table for [[fkConsistentSyncMulti]]:
    * both sides share a schema; `fk` names the child column referencing
    * the parent PK; `hashCols` are the composite-PK + payload columns
    * (numerics pre-cast to decimal strings) feeding the keyed digest. */
  final case class FkChild(name: String, src: DataFrame, tgt: DataFrame,
                           fk: String,
                           hashCols: Seq[org.apache.spark.sql.Column])

  /** [[fkConsistentSync]] generalized to a CHILD LIST — the real-schema
    * shape: one parent, many referencing children (orders → lineitem +
    * a returns feed + …). The FK rule applies per child independently:
    * child i's partition is dirty when its OWN digest differs or the
    * parent partition is dirty, so every child ships with its parent
    * but children never force each other (child A's churn does not ship
    * child B — the independence law OperatorSuite pins). The parent
    * plan, copy, and post-digest are computed ONCE and shared across
    * all children; per child the cost is the y17 child path (two
    * single-scan rollups through the FK join, a pruned copy, one
    * orphan-audit join vs the shared post-sync parent). Output is long
    * format: one report row per (child, order_year).
    *
    * The |years|-row plans persist (they feed broadcasts + the report);
    * Bench/Verify sweep caches per query — direct library callers
    * should clearCache() after materializing, as the suite tests do. */
  def fkConsistentSyncMulti(srcO: DataFrame, tgtO: DataFrame,
                            children: Seq[FkChild]): DataFrame = {
    require(children.nonEmpty, "fkConsistentSyncMulti needs >= 1 child")
    val pPlan = partitionSide(srcO, "p_src_rows", "p_src_digest")
      .join(partitionSide(tgtO, "p_tgt_rows", "p_tgt_digest"),
        Seq("order_year"), "full_outer")
      .select(col("order_year"),
        coalesce(col("p_src_rows"), lit(0L)).as("p_src_rows"),
        (!(coalesce(col("p_src_rows"), lit(0L)) === coalesce(col("p_tgt_rows"), lit(0L)) &&
           coalesce(col("p_src_digest"), lit(-1L)) === coalesce(col("p_tgt_digest"), lit(-1L))))
          .as("parent_dirty"),
        coalesce(col("p_src_digest"), lit(-1L)).as("p_src_digest"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dirtyP = pPlan.filter(col("parent_dirty")).select(col("order_year"))
    val parentAfter = tgtO.join(broadcast(dirtyP),
        year(col("o_orderdate")) === col("order_year"), "left_anti")
      .unionByName(srcO.join(broadcast(dirtyP),
        year(col("o_orderdate")) === col("order_year"), "left_semi"))
    val pAfter = partitionSide(parentAfter, "pa_rows", "pa_digest")
      .select(col("order_year"), col("pa_digest"))
    val reports = children.map { ch =>
      val keyedHash = md5(concat_ws("|", ch.hashCols: _*))
      val cPlan = childSideG(ch.src, srcO, ch.fk, keyedHash,
          "c_src_rows", "c_src_digest")
        .join(childSideG(ch.tgt, tgtO, ch.fk, keyedHash,
          "c_tgt_rows", "c_tgt_digest"), Seq("order_year"), "full_outer")
        .select(col("order_year"),
          coalesce(col("c_src_rows"), lit(0L)).as("c_src_rows"),
          (!(coalesce(col("c_src_rows"), lit(0L)) === coalesce(col("c_tgt_rows"), lit(0L)) &&
             coalesce(col("c_src_digest"), lit(-1L)) === coalesce(col("c_tgt_digest"), lit(-1L))))
            .as("child_own_dirty"),
          coalesce(col("c_src_digest"), lit(-1L)).as("c_src_digest"))
      val plan = pPlan.join(cPlan, Seq("order_year"), "full_outer")
        .select(col("order_year"),
          coalesce(col("p_src_rows"), lit(0L)).as("p_src_rows"),
          coalesce(col("parent_dirty"), lit(false)).as("parent_dirty"),
          coalesce(col("p_src_digest"), lit(-1L)).as("p_src_digest"),
          coalesce(col("c_src_rows"), lit(0L)).as("c_src_rows"),
          (coalesce(col("parent_dirty"), lit(false)) ||
           coalesce(col("child_own_dirty"), lit(false))).as("child_dirty"),
          coalesce(col("c_src_digest"), lit(-1L)).as("c_src_digest"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dirtyC = plan.filter(col("child_dirty")).select(col("order_year"))
      def tagged(child: DataFrame, parent: DataFrame) =
        child.join(parent.select(col("o_orderkey"), col("o_orderdate")),
            col(ch.fk) === col("o_orderkey"))
          .withColumn("c_year", year(col("o_orderdate")))
          .drop("o_orderkey", "o_orderdate")
      val childAfter = tagged(ch.tgt, tgtO).join(broadcast(dirtyC),
          col("c_year") === col("order_year"), "left_anti")
        .unionByName(tagged(ch.src, srcO).join(broadcast(dirtyC),
          col("c_year") === col("order_year"), "left_semi"))
      val cAfter = childAfter.groupBy(col("c_year").as("order_year"))
        .agg(digestOf(keyedHash).as("ca_digest"))
      val orphans = childAfter
        .join(parentAfter.select(col("o_orderkey")),
          col(ch.fk) === col("o_orderkey"), "left_anti")
        .groupBy(col("c_year").as("order_year"))
        .agg(count(lit(1)).as("n_orph"))
      plan
        .join(pAfter, Seq("order_year"), "left")
        .join(cAfter, Seq("order_year"), "left")
        .join(orphans, Seq("order_year"), "left")
        .select(lit(ch.name).as("child"), col("order_year"),
          col("parent_dirty"), col("child_dirty"),
          when(col("parent_dirty"), col("p_src_rows")).otherwise(lit(0L))
            .as("n_parent_copied"),
          when(col("child_dirty"), col("c_src_rows")).otherwise(lit(0L))
            .as("n_child_copied"),
          (coalesce(col("pa_digest"), lit(-1L)) === col("p_src_digest"))
            .as("parent_clean_after"),
          (coalesce(col("ca_digest"), lit(-1L)) === col("c_src_digest"))
            .as("child_clean_after"),
          coalesce(col("n_orph"), lit(0L)).as("n_orphans_after"))
    }
    reports.reduce(_.unionByName(_)).orderBy("child", "order_year")
  }

  /** Deterministic returns-feed child of orders — a SECOND child table
    * for y17b, derived from lineitem's 'R' rows and mutated
    * FK-consistently with [[sourceView]] (children of deleted orders
    * vanish, inserted orders bring re-keyed children) plus a
    * returns-ONLY payload churn (refund bump on every 17th order) that
    * is invisible to the lineitem child — so the two children go dirty
    * independently. */
  def returnsSourceView(s: SparkSession, d: String): DataFrame = {
    val r = returnsTargetView(s, d)
    r.filter(col("l_orderkey") % 10 =!= 0)
      .withColumn("r_refund",
        when(col("l_orderkey") % 17 === 0, col("r_refund") + 50d)
          .otherwise(col("r_refund")))
      .unionByName(r.filter(col("l_orderkey") % 13 === 0)
        .withColumn("l_orderkey", col("l_orderkey") + 10000000L))
  }

  def returnsTargetView(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").as("r_refund"))

  /** Returns-feed mutation as DuckDB CTEs (lockstep with the two views). */
  val returnsCte: String =
    """rtgt AS (
      |  SELECT l_orderkey, l_linenumber, l_extendedprice AS r_refund
      |  FROM lineitem WHERE l_returnflag = 'R'),
      |rsrc AS (
      |  SELECT l_orderkey, l_linenumber,
      |    CASE WHEN l_orderkey % 17 = 0 THEN l_extendedprice + 50.0
      |         ELSE l_extendedprice END AS r_refund
      |  FROM lineitem WHERE l_returnflag = 'R' AND l_orderkey % 10 <> 0
      |  UNION ALL
      |  SELECT l_orderkey + 10000000, l_linenumber, l_extendedprice
      |  FROM lineitem WHERE l_returnflag = 'R' AND l_orderkey % 13 = 0)""".stripMargin

  /** The y16 engine, parameterized over the two sides so the law test
    * can drive it with a narrower mutation than sourceView's (one dirty
    * year, one vanished year, the rest clean — exercising the
    * selectivity and the −1 sentinel branches sourceView's all-years
    * mutation cannot). The |years|-row plan is persisted: it feeds the
    * dirty-set semi/anti joins AND the final join, and without the pin
    * the two fact rollups would replan per consumer. The pin cannot be
    * released inside this function (the returned DataFrame is lazy and
    * still reads it) — Bench/Verify sweep caches after every query;
    * direct library callers should `spark.catalog.clearCache()` (or
    * unpersist the plan) after materializing the result, as the
    * OperatorSuite tests do. */
  def dirtyPartitionSync(src: DataFrame, tgt: DataFrame): DataFrame = {
    val plan = partitionSide(src, "src_rows", "src_digest")
      .join(partitionSide(tgt, "tgt_rows", "tgt_digest"),
        Seq("order_year"), "full_outer")
      .select(col("order_year"),
        coalesce(col("src_rows"), lit(0L)).as("src_rows"),
        (!(coalesce(col("src_rows"), lit(0L)) === coalesce(col("tgt_rows"), lit(0L)) &&
           coalesce(col("src_digest"), lit(-1L)) === coalesce(col("tgt_digest"), lit(-1L))))
          .as("dirty"),
        coalesce(col("src_digest"), lit(-1L)).as("src_digest"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dirtyYears = plan.filter(col("dirty")).select(col("order_year"))
    val tgtKeep = tgt.join(broadcast(dirtyYears),
      year(col("o_orderdate")) === col("order_year"), "left_anti")
    val srcCopy = src.join(broadcast(dirtyYears),
      year(col("o_orderdate")) === col("order_year"), "left_semi")
    val after = partitionSide(tgtKeep.unionByName(srcCopy),
      "after_rows", "after_digest")
    plan.join(after, Seq("order_year"), "left")
      .select(col("order_year"), col("dirty"),
        when(col("dirty"), col("src_rows")).otherwise(lit(0L)).as("n_copied"),
        (coalesce(col("after_digest"), lit(-1L)) === col("src_digest"))
          .as("clean_after"))
      .orderBy("order_year")
  }

  /** Deterministic LOCALIZED-churn view of orders — y20's source side.
    * Mutations are confined to two calendar months (March: every 7th
    * order's price/status drifts; November: every 10th order vanishes)
    * so hierarchical narrowing has something to narrow TO — sourceView's
    * all-partition churn would mark every month dirty and hide the
    * point of the drill-down. */
  def monthDriftView(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(!(month(col("o_orderdate")) === 11 && col("o_orderkey") % 10 === 0))
      .withColumn("o_totalprice",
        when(month(col("o_orderdate")) === 3 && col("o_orderkey") % 7 === 0,
          col("o_totalprice") + 1000d).otherwise(col("o_totalprice")))
      .withColumn("o_orderstatus",
        when(month(col("o_orderdate")) === 3 && col("o_orderkey") % 7 === 0,
          lit("F")).otherwise(col("o_orderstatus")))

  /** Same localized mutation as a DuckDB CTE (lockstep with
    * [[monthDriftView]]). */
  val monthDriftCte: String =
    """mdr AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN EXTRACT(month FROM o_orderdate) = 3 AND o_orderkey % 7 = 0
      |         THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
      |    CASE WHEN EXTRACT(month FROM o_orderdate) = 3 AND o_orderkey % 7 = 0
      |         THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders
      |  WHERE NOT (EXTRACT(month FROM o_orderdate) = 11 AND o_orderkey % 10 = 0))""".stripMargin

  /** y20 engine: HIERARCHICAL digest narrowing — the rsync/Merkle
    * algorithm on tables. Level 1 is y12's per-year (count, digest)
    * rollup on both sides; only the years whose level-1 cells disagree
    * are re-scanned at (year, month) grain, so the shipped unit shrinks
    * from a year-partition to a month-partition wherever churn is
    * localized. At 100 TB with a date-partitioned layout the level-2
    * scan touches ONLY dirty-year partitions (the ≤|years| dirty set
    * broadcasts into a semi-join the scan can prune on) and the copy
    * plan that comes out is 12× finer than y16's for point churn —
    * recursing the same split (month → day) is the standard next step
    * and needs no new machinery. The |years|-row level-1 plan is
    * persisted (it feeds both level-2 sides); as with
    * [[dirtyPartitionSync]], callers outside Bench/Verify should
    * `spark.catalog.clearCache()` after materializing the result. */
  def hierarchicalDigestNarrow(src: DataFrame, tgt: DataFrame): DataFrame = {
    val plan = partitionSide(src, "src_rows", "src_digest")
      .join(partitionSide(tgt, "tgt_rows", "tgt_digest"),
        Seq("order_year"), "full_outer")
      .select(col("order_year"),
        (!(coalesce(col("src_rows"), lit(0L)) === coalesce(col("tgt_rows"), lit(0L)) &&
           coalesce(col("src_digest"), lit(-1L)) === coalesce(col("tgt_digest"), lit(-1L))))
          .as("year_dirty"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dirtyYears = plan.filter(col("year_dirty")).select(col("order_year"))
    def monthSide(df: DataFrame, rows: String, dig: String) = {
      val keyedHash = md5(concat_ws("|",
        col("o_orderkey"), rowHash(c => col(c))))
      df.join(broadcast(dirtyYears),
          year(col("o_orderdate")) === col("order_year"), "left_semi")
        .groupBy(year(col("o_orderdate")).as("order_year"),
          month(col("o_orderdate")).as("order_month"))
        .agg(count(lit(1)).as(rows),
          sum(pmod(conv(substring(keyedHash, 1, 15), 16, 10)
            .cast("long"), lit(1000000000L))).as(dig))
    }
    monthSide(src, "src_rows", "src_digest")
      .join(monthSide(tgt, "tgt_rows", "tgt_digest"),
        Seq("order_year", "order_month"), "full_outer")
      .select(col("order_year"), col("order_month"),
        (!(coalesce(col("src_rows"), lit(0L)) === coalesce(col("tgt_rows"), lit(0L)) &&
           coalesce(col("src_digest"), lit(-1L)) === coalesce(col("tgt_digest"), lit(-1L))))
          .as("month_dirty"),
        coalesce(col("src_rows"), lit(0L)).as("src_rows"))
      .select(col("order_year"), col("order_month"), col("month_dirty"),
        when(col("month_dirty"), col("src_rows")).otherwise(lit(0L))
          .as("n_ship_rows"))
      .orderBy("order_year", "order_month")
  }

  /** y21 engine: retention-aware sync planning — change tracking's
    * min-valid-version contract (MS-SQL's
    * CHANGE_TRACKING_MIN_VALID_VERSION, Debezium/ Kafka topic retention:
    * the same shape everywhere). A changelog feed is only usable when it
    * still reaches back to the target's last-synced version: entries
    * older than the retention horizon are PURGED, so an incremental
    * apply from a stale target silently misses the purged changes —
    * worst case it resurrects a deleted row whose tombstone aged out.
    * The only correct move then is a full snapshot re-diff. This is that
    * decision operator: compare (targetVersion, minValidVersion), then
    * execute the chosen arm:
    *  - INCREMENTAL (target still inside the horizon): latest-wins tail
    *    (version > targetVersion) of the available log merged over
    *    targetState — y5's merge shape plus tombstone deletes; one PK
    *    shuffle over |tail| + |target|, never a source rescan.
    *  - FULL_RESYNC (target older than the horizon): recompute from the
    *    source of truth; targetState and the (gappy) log are not
    *    trusted at all. At 100 TB this is the expensive arm — which is
    *    exactly why the decision must be explicit, not implicit.
    * Both arms return the same (pk, last_type, last_value) schema so the
    * downstream MERGE is arm-agnostic. LAW (OperatorSuite): a target
    * older than the horizon never applies a partial log — the chosen
    * arm's output equals the full recompute even when the incremental
    * arm, forced, would diverge. */
  def retentionSync(sourceState: DataFrame, targetState: DataFrame,
                    availableLog: DataFrame,
                    targetVersion: Long, minValidVersion: Long): DataFrame =
    if (targetVersion >= minValidVersion) {
      val w = Window.partitionBy("pk").orderBy(col("version").desc)
      val tail = availableLog.filter(col("version") > targetVersion)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      targetState.join(tail.select("pk"), Seq("pk"), "left_anti")
        .unionByName(tail.filter(col("op") =!= "D")
          .select(col("pk"), col("payload_type").as("last_type"),
            col("payload_value").as("last_value")))
    } else sourceState

  /** y25 engine: POINT-IN-TIME read (time travel) over a changelog —
    * reconstruct the table state at any historical version without a
    * stored snapshot per version. The trick that keeps it one pass: a
    * single `lead(version)` window per PK turns every change row into a
    * validity interval [version, next_version), so the live row at cut
    * c is simply the row whose interval contains c — ONE windowed scan
    * of the log (equi-shuffle on pk), then a ≤`nCuts`-row BROADCAST
    * range join fans each row out to exactly the cuts it is live at,
    * and a hash-agg rolls each cut's state up to (count, digest,
    * tombstones). Recomputing per cut would cost nCuts log scans; this
    * costs one + a broadcast — the difference between feasible and not
    * at 100 TB of changelog. Cuts derive from the log's own version
    * bounds (vmin + span·k/nCuts, integer arithmetic — identical both
    * engines); the bounds aggregate is a min/max-only scan parquet
    * answers from footer stats. Deletes at a cut are counted, not
    * returned — time travel semantics, not history semantics (that is
    * y7's SCD2 surface). */
  def timeTravel(log: DataFrame, nCuts: Int): DataFrame = {
    val cuts = log
      .agg(min(col("version")).as("vmin"), max(col("version")).as("vmax"))
      .select(explode(sequence(lit(1), lit(nCuts))).as("k"),
        col("vmin"), col("vmax"))
      .select(concat(lit("q"), col("k")).as("cut_label"),
        (col("vmin") + expr(s"(vmax - vmin) * k div $nCuts"))
          .as("cut_version"))
    val w = Window.partitionBy("pk").orderBy("version")
    val live = col("op") =!= "D"
    log.withColumn("next_version", lead(col("version"), 1).over(w))
      .join(broadcast(cuts),
        col("version") <= col("cut_version") &&
          (col("next_version").isNull ||
            col("next_version") > col("cut_version")))
      .groupBy("cut_label", "cut_version")
      .agg(count(when(live, 1)).as("n_rows"),
        sum(when(live, pmod(conv(substring(md5(concat_ws("|",
            col("pk"), col("payload_type"),
            col("payload_value").cast("decimal(18,2)").cast("string"))),
          1, 15), 16, 10).cast("long"), lit(1000000000L))))
          .as("state_digest"),
        count(when(!live, 1)).as("n_tombstones"))
      .orderBy("cut_label")
  }

  /** y26 engine: WATERMARK-consistent multi-table cut. Each replicated
    * table's log has its own high-water version (replicas lag
    * independently); snapshotting every table at its OWN max gives each
    * table internally-latest state but NO cross-table consistency — a
    * child row can reference a parent the parent replica hasn't shipped
    * yet, and every FK join over the "snapshot" silently drops or
    * orphans rows. The consistent cut is the watermark W = min(per-log
    * high water): every table filtered to version ≤ W is a state that
    * REALLY EXISTED at version W, so cross-table invariants that held
    * in the source hold in the snapshot. Cost: the cut is a pushed-down
    * range predicate per table (parquet stats prune above-watermark
    * files) + one FK audit join — no new shuffle shape beyond y17's.
    * Returns one audit row per strategy so the naive cut's orphan
    * count is OBSERVED, not asserted. */
  def consistentCut(parents: DataFrame, children: DataFrame,
                    strategies: DataFrame, fk: Seq[String]): DataFrame = {
    val pCounts = parents.crossJoin(broadcast(strategies))
      .groupBy("strategy", "parent_cut", "child_cut")
      .agg(count(when(col("reg_version") <= col("parent_cut"), 1))
        .as("n_parents"))
    val cCounts = children
      .join(parents, fk)
      .crossJoin(broadcast(strategies))
      .groupBy("strategy", "parent_cut", "child_cut")
      .agg(count(when(col("cversion") <= col("child_cut"), 1))
          .as("n_children"),
        count(when(col("cversion") <= col("child_cut") &&
          col("reg_version") > col("parent_cut"), 1)).as("n_orphans"))
    pCounts.join(cCounts, Seq("strategy", "parent_cut", "child_cut"))
      .orderBy("strategy")
  }

  /** y23 engine: THREE-way diff — the bidirectional-sync primitive.
    * Given a common ancestor (base) and two divergent replicas A and B,
    * classify every key by which side(s) actually changed relative to
    * the ancestor — the git-merge semantics on rows:
    *  - unchanged:  A ≡ base ≡ B (null-safe on the row hash)
    *  - a_only / b_only: one side drifted, the other is still at base —
    *    ship the drifted version across (insert/update/delete uniformly:
    *    an absent hash IS the delete case, no special-casing)
    *  - convergent: both drifted to the SAME row (or both deleted) —
    *    nothing to ship, nothing to resolve
    *  - conflict:   both drifted, differently — the one class no sync
    *    tool may auto-apply; surfaced with a 'manual' action
    * A two-sided diff (y3) cannot distinguish conflict from convergent
    * from b_only — without the ancestor every difference looks like
    * drift to ship, and bidirectional replication corrupts data exactly
    * there.
    *
    * Scale: NO joins — each side projects (pk, hash) and the three
    * streams union into ONE hash-aggregate keyed on the PK (conditional
    * max per side), so the cost is three scans + a single equi-shuffle,
    * the same shape as any two-phase agg; AQE skew-splits it. The row
    * hash rides as TWO 60-bit longs (120 of md5's 128 bits — collision
    * odds 2^-120 per key, same class as the digest idiom) rather than
    * the hex string: string-valued aggregate buffers force Spark's
    * SortAggregate fallback, and the all-long buffer keeps the
    * two-phase HashAggregate (pinned in PlanAuditSuite). */
  def threeWayDiff(base: DataFrame, a: DataFrame, b: DataFrame): DataFrame = {
    def tag(df: DataFrame, side: String) = {
      val h = rowHash(c => col(c))
      df.select(col("o_orderkey"), lit(side).as("side"),
        conv(substring(h, 1, 15), 16, 10).cast("long").as("h1"),
        conv(substring(h, 16, 15), 16, 10).cast("long").as("h2"))
    }
    def side(s: String, part: String) =
      max(when(col("side") === s, col(part))).as(s"${s}_$part")
    def same(x: String, y: String) =
      (col(s"${x}_h1") <=> col(s"${y}_h1")) &&
        (col(s"${x}_h2") <=> col(s"${y}_h2"))
    val aCh = !same("a", "base")
    val bCh = !same("b", "base")
    tag(base, "base").unionByName(tag(a, "a")).unionByName(tag(b, "b"))
      .groupBy("o_orderkey")
      .agg(side("base", "h1"), side("base", "h2"),
        side("a", "h1"), side("a", "h2"), side("b", "h1"), side("b", "h2"))
      .select(col("o_orderkey"),
        when(!aCh && !bCh, "unchanged")
          .when(aCh && !bCh, "a_only")
          .when(bCh && !aCh, "b_only")
          .when(same("a", "b"), "convergent")
          .otherwise("conflict").as("verdict"),
        when(!aCh && !bCh, "none")
          .when(aCh && !bCh,
            when(col("a_h1").isNull, "delete_in_b").otherwise("upsert_to_b"))
          .when(bCh && !aCh,
            when(col("b_h1").isNull, "delete_in_a").otherwise("upsert_to_a"))
          .when(same("a", "b"), "none")
          .otherwise("manual").as("action"))
  }

  /** y23b engine: three-way MERGE under an explicit conflict policy —
    * what a bidirectional sync actually executes on top of
    * [[threeWayDiff]]'s classification. Non-conflicting classes have
    * exactly one correct outcome (the drifted side's row, or absence
    * for a one-sided/convergent delete); conflicts have NO correct
    * outcome, only a policy: 'prefer_a' / 'prefer_b' pick a side,
    * anything else refuses loudly (the default a real tool should ship
    * with — silently picking a side IS the data-corruption mode
    * bidirectional replication is infamous for).
    *
    * One extra equi-shuffle beyond the diff: the verdict table joins
    * each replica on the PK (left joins — absent rows stay absent) and
    * a CASE projects the surviving row. LAW (OperatorSuite): the merge
    * contains no conflict leftovers, reproduces A exactly under
    * prefer_a when B never drifted alone, and equals the
    * non-conflicting union otherwise. */
  def resolveThreeWay(base: DataFrame, a: DataFrame, b: DataFrame,
                      policy: String): DataFrame = {
    require(policy == "prefer_a" || policy == "prefer_b",
      s"resolveThreeWay: unresolvable conflicts under policy '$policy' — " +
        "choose 'prefer_a' or 'prefer_b', or resolve manually first")
    val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
    def prefixed(df: DataFrame, p: String) = df.select(
      col("o_orderkey").as(s"${p}_key") +: cols.map(c => col(c).as(s"${p}_$c")): _*)
    // every key's outcome is ONE side's row (or absence): unchanged →
    // base; one-sided drift → the drifted side; convergent → A (≡ B);
    // conflict → the policy side. A key whose chosen side lacks the row
    // (one-sided / convergent / policy-side delete) drops via the
    // presence filter — deletes need no special casing anywhere.
    val side = when(col("verdict") === "unchanged", "base")
      .when(col("verdict") === "a_only", "a")
      .when(col("verdict") === "b_only", "b")
      .when(col("verdict") === "convergent", "a")
      .otherwise(lit(if (policy == "prefer_a") "a" else "b"))
    threeWayDiff(base, a, b)
      .join(prefixed(a, "a"), col("o_orderkey") === col("a_key"), "left")
      .join(prefixed(b, "b"), col("o_orderkey") === col("b_key"), "left")
      .join(prefixed(base, "base"), col("o_orderkey") === col("base_key"), "left")
      .withColumn("side", side)
      .filter((col("side") === "base") ||
        (col("side") === "a" && col("a_key").isNotNull) ||
        (col("side") === "b" && col("b_key").isNotNull))
      .select(col("o_orderkey") +: cols.map(c =>
        when(col("side") === "base", col(s"base_$c"))
          .when(col("side") === "a", col(s"a_$c"))
          .otherwise(col(s"b_$c")).as(c)): _*)
  }

  /** Replica-B mutation of orders for y23 — key classes chosen so every
    * verdict is populated and OVERLAPS with [[sourceView]]'s A-side
    * churn are deterministic: %7∩%11 keys update on both sides with
    * different payloads (conflict), %10∩%19 delete on both
    * (convergent), the rest drift one-sided. Lockstep with
    * [[bSourceCte]]. */
  def bSourceView(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    o.filter(col("o_orderkey") % 19 =!= 0)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 11 === 0, lit("P"))
          .otherwise(col("o_orderstatus")))
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 11 === 0, col("o_totalprice") + 500d)
          .otherwise(col("o_totalprice")))
      .unionByName(o.filter(col("o_orderkey") % 23 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
        .withColumn("o_orderstatus", lit("O")))
  }

  val bSourceCte: String =
    """bsrc AS (
      |  SELECT o_orderkey, o_custkey,
      |    CASE WHEN o_orderkey % 11 = 0 THEN 'P' ELSE o_orderstatus END AS o_orderstatus,
      |    CASE WHEN o_orderkey % 11 = 0 THEN o_totalprice + 500.0 ELSE o_totalprice END AS o_totalprice,
      |    o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 19 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 20000000, o_custkey, 'O', o_totalprice, o_orderdate, o_orderpriority
      |  FROM orders WHERE o_orderkey % 23 = 0
      |)""".stripMargin

  val queries: Map[String, Q] = Map(

    // Y23: three-way diff / conflict detection — [[threeWayDiff]] over
    // base = orders, A = sourceView, B = bSourceView. The key-class
    // arithmetic guarantees every verdict appears: %7∩%11 → conflict
    // (different updates), %10∩%19 → convergent (both deleted),
    // %13 vs %23 inserts at different rekey offsets → a_only/b_only
    // inserts, and the disjoint churn remainder → one-sided drift.
    "y23_three_way_diff" -> ((s, d) =>
      threeWayDiff(Tables.orders(s, d), sourceView(s, d), bSourceView(s, d))),

    // Y23b: the merge EXECUTED under prefer_a — [[resolveThreeWay]]'s
    // one-side-per-key CASE over the same three tables; the full merged
    // table is hash-checked, so every per-key side choice (including
    // delete-wins-under-policy and convergent-delete absence) is pinned.
    "y23b_three_way_merge" -> ((s, d) =>
      resolveThreeWay(Tables.orders(s, d), sourceView(s, d),
        bSourceView(s, d), "prefer_a")),

    // Y21: retention-loss fallback — [[retentionSync]]'s decision
    // surface as a scored query. The horizon and two scenario cursors
    // (A: inside the horizon, B: staler than it) derive from the log's
    // own version bounds by integer arithmetic (identical both
    // engines), so the CASE genuinely evaluates both ways in one run.
    // Per scenario: the decision, what the chosen arm SHIPS (tail keys
    // for incremental — what a y18-compacted MERGE would carry — vs
    // every live key for the full resync), and the final-state rollup
    // (count + order-insensitive digest), which the invariant makes
    // identical across scenarios: a valid incremental lands on exactly
    // the full-recompute state. Scan cost: two passes over the log
    // (state window + 2-row-broadcast tail count) + a 1-row agg —
    // the decision itself is metadata-only at scale.
    "y21_retention_fallback" -> ((s, d) => {
      val log = changeLog(s, d)
      // ONE windowed scan yields BOTH the version bounds (plain min/max
      // over all rows) and the final-state rollup (conditional aggs over
      // the rn=1, non-tombstone subset) — at a 100 TB changelog the
      // second full scan this fuses away is the expensive part; only the
      // per-scenario tail count needs a second pass (its predicate
      // depends on the bounds-derived cursors).
      val w = Window.partitionBy("pk").orderBy(col("version").desc)
      val isFinal = col("rn") === 1 && col("op") =!= "D"
      val stateAgg = log
        .withColumn("rn", row_number().over(w))
        .agg(min(col("version")).as("vmin"), max(col("version")).as("vmax"),
          count(when(isFinal, 1)).as("n_final_keys"),
          sum(when(isFinal, pmod(conv(substring(md5(concat_ws("|",
              col("pk"), col("payload_type"),
              col("payload_value").cast("decimal(18,2)").cast("string"))),
            1, 15), 16, 10).cast("long"), lit(1000000000L))))
            .as("final_digest"))
      val scenarios = stateAgg
        .select(explode(array(
            struct(lit("A_recent").as("scenario"),
              expr("vmin + (vmax - vmin) * 6 div 10").as("target_version")),
            struct(lit("B_stale").as("scenario"),
              expr("vmin + (vmax - vmin) * 1 div 10").as("target_version"))))
            .as("sc"),
          expr("vmin + (vmax - vmin) * 3 div 10").as("min_valid_version"),
          col("n_final_keys"), col("final_digest"))
        .select(col("sc.scenario").as("scenario"),
          col("sc.target_version").as("target_version"),
          col("min_valid_version"), col("n_final_keys"), col("final_digest"))
      log.crossJoin(broadcast(scenarios))
        .groupBy("scenario", "target_version", "min_valid_version",
          "n_final_keys", "final_digest")
        .agg(countDistinct(when(col("version") > col("target_version"),
          col("pk"))).as("n_tail_keys"))
        .select(col("scenario"), col("target_version"),
          col("min_valid_version"),
          when(col("target_version") >= col("min_valid_version"),
            "INCREMENTAL").otherwise("FULL_RESYNC").as("decision"),
          when(col("target_version") >= col("min_valid_version"),
            col("n_tail_keys")).otherwise(col("n_final_keys"))
            .as("n_shipped"),
          col("n_final_keys"), col("final_digest"))
        .orderBy("scenario")
    }),

    // Y25: point-in-time read (time travel) — [[timeTravel]] over the
    // events changelog at four quartile cuts of its own version range.
    // The four (count, digest, tombstones) rollups pin the WHOLE
    // reconstruction: a row mis-assigned to any cut (an off-by-one on
    // either interval edge) moves a digest. q4 sits at vmax, so its row
    // doubles as the y4 latest-wins state — the law OperatorSuite pins.
    "y25_time_travel" -> ((s, d) => timeTravel(changeLog(s, d), 4)),

    // Y26: watermark-consistent multi-table cut — [[consistentCut]]
    // with the parent registry lagging at the 60th percentile of the
    // version range while the child feed is current. The naive
    // per-table-max strategy snapshots each table at its own high water
    // and is OBSERVED shipping orphaned children (purchases whose user
    // registration hasn't replicated yet); the watermark strategy cuts
    // both tables at min(high waters) and audits clean. Parent registry
    // = first event per user (registration version), child feed = the
    // purchase stream — both derived from the same log so the oracle
    // shares the CTEs verbatim. The parent is keyed at SESSION grain
    // (user_id, day): a session "registers" at its first event, so
    // registrations spread across the whole version range and the
    // naive strategy's orphans are a real population (~40% of sessions
    // open after the 60th-percentile cut), not a vacuous zero.
    "y26_consistent_cut" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val parents = ev
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(min(col("event_id")).as("reg_version"))
      val children = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("cversion"), col("user_id"),
          to_date(col("ts")).as("day"))
      val strategies = ev
        .agg(min(col("event_id")).as("vmin"),
          max(col("event_id")).as("vmax"))
        .select(explode(array(
          struct(lit("naive_per_table_max").as("strategy"),
            expr("vmin + (vmax - vmin) * 6 div 10").as("parent_cut"),
            col("vmax").as("child_cut")),
          struct(lit("watermark").as("strategy"),
            expr("vmin + (vmax - vmin) * 6 div 10").as("parent_cut"),
            expr("vmin + (vmax - vmin) * 6 div 10").as("child_cut"))))
          .as("st"))
        .select(col("st.*"))
      consistentCut(parents, children, strategies, Seq("user_id", "day"))
    }),

    // Y29: snapshot + CDC BOOTSTRAP SEAM — the initial-load/cutover
    // pattern every CDC sync ships: bootstrap the target from a
    // snapshot AT version V, then stream the log from a cursor. The
    // classic production bug is the seam: a cursor later than the
    // snapshot (gap) silently loses every change in between; a cursor
    // earlier (overlap) is harmless under latest-wins apply. Both
    // outcomes are OBSERVED here, not asserted: three bootstrap
    // variants (cursor = V / cursor < V / cursor > V) reconstruct
    // final states from ONE y25-style interval window (per key: live
    // row at V, live row at head, max version — the cursor rule is a
    // per-key CASE), roll up to (count, digest, stale-row count), and
    // compare against the full-replay rollup. cursor_at_snapshot and
    // cursor_overlaps match the replay; cursor_gapped diverges with
    // its stale/missed keys counted. Cost: one windowed log scan + a
    // 1-row broadcast of cuts — the seam check is nearly free, which
    // is the argument for running it at every cutover.
    "y29_bootstrap_seam" -> ((s, d) => {
      // finer entity grain than the user-keyed changelog: at 15 users
      // EVERY key changes after any mid-range cursor and the gap's data
      // loss would be invisible — blocks of 8 consecutive versions make
      // ~|log|/8 entities whose life ends at different points, so the
      // gapped cursor is OBSERVED stranding the entities that died
      // inside (V, T_gap]
      val log = changeLog(s, d).withColumn("pk", expr("version div 8"))
      val w = Window.partitionBy("pk").orderBy("version")
      val marked = log.withColumn("next_version",
        lead(col("version"), 1).over(w))
      val cuts = log
        .agg(min(col("version")).as("vmin"), max(col("version")).as("vmax"))
        .select(expr("vmin + (vmax - vmin) * 5 div 10").as("v_cut"),
          expr("vmin + (vmax - vmin) * 3 div 10").as("t_overlap"),
          expr("vmin + (vmax - vmin) * 7 div 10").as("t_gap"))
      val liveAtV = col("version") <= col("v_cut") &&
        (col("next_version").isNull || col("next_version") > col("v_cut"))
      val payload = struct(col("op"), col("payload_type"),
        col("payload_value"))
      val perKey = marked.crossJoin(broadcast(cuts))
        .groupBy("pk", "v_cut", "t_overlap", "t_gap")
        .agg(max(when(liveAtV, payload)).as("sv"),
          max(when(col("next_version").isNull, payload)).as("fv"),
          max(col("version")).as("maxv"))
      def dig(t: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
        pmod(conv(substring(md5(concat_ws("|", col("pk"), t,
          v.cast("decimal(18,2)").cast("string"))), 1, 15), 16, 10)
          .cast("long"), lit(1000000000L))
      val full = perKey.agg(
        count(when(col("fv.op") =!= "D", 1)).as("n_full"),
        sum(when(col("fv.op") =!= "D",
          dig(col("fv.payload_type"), col("fv.payload_value"))))
          .as("full_digest"))
      perKey
        .select(col("pk"), col("sv"), col("fv"), col("maxv"),
          explode(array(
            struct(lit("cursor_at_snapshot").as("variant"),
              col("v_cut").as("cursor")),
            struct(lit("cursor_overlaps").as("variant"),
              col("t_overlap").as("cursor")),
            struct(lit("cursor_gapped").as("variant"),
              col("t_gap").as("cursor")))).as("vr"))
        .select(col("pk"), col("sv"), col("fv"), col("maxv"),
          col("vr.variant").as("variant"), col("vr.cursor").as("cursor"))
        .withColumn("ch",
          when(col("maxv") > col("cursor"), col("fv")).otherwise(col("sv")))
        .groupBy("variant", "cursor")
        .agg(
          count(when(col("ch.op").isNotNull && col("ch.op") =!= "D", 1))
            .as("n_state"),
          sum(when(col("ch.op").isNotNull && col("ch.op") =!= "D",
            dig(col("ch.payload_type"), col("ch.payload_value"))))
            .as("state_digest"),
          count(when(!(col("ch") <=> col("fv")), 1)).as("n_stale"))
        .crossJoin(broadcast(full))
        .select(col("variant"), col("cursor"), col("n_state"),
          col("state_digest"), col("n_stale"), col("n_full"),
          col("full_digest"),
          (col("state_digest") <=> col("full_digest") &&
            col("n_state") === col("n_full")).as("matches_full"))
        .orderBy("variant")
    }),

    // Y33: sync DRY-RUN cost plan — the "what will this sync do and how
    // much will it move" report every tool shows before an apply: the
    // y3 classification joined with a per-row SHIP-SIZE estimate
    // (fixed-width numerics + actual string lengths for I/U payloads,
    // key-only for D tombstones, zero for SAME), rolled up per class.
    // The estimate drives real operator decisions — batch sizing,
    // window choice, whether to fall back to a full snapshot (y21's
    // arithmetic needs exactly this number). Same single full-outer PK
    // join as y3; the size column is per-row codegen.
    "y33_sync_plan" -> ((s, d) => {
      val a = sourceView(s, d).select(col("o_orderkey"),
        lit(1).as("sp"), rowHash(col).as("sh"),
        (lit(24L) + length(col("o_orderstatus")) +
          length(col("o_orderpriority"))).as("sbytes"))
      val b = Tables.orders(s, d).select(col("o_orderkey"),
        lit(1).as("tp"), rowHash(col).as("th"))
      a.join(b, Seq("o_orderkey"), "full_outer")
        .select(
          when(col("tp").isNull, "I").when(col("sp").isNull, "D")
            .when(col("sh") =!= col("th"), "U").otherwise("S").as("op"),
          col("sbytes"))
        .withColumn("ship_bytes",
          when(col("op").isin("I", "U"), col("sbytes"))
            .when(col("op") === "D", 8L).otherwise(0L))
        .groupBy("op")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("ship_bytes")).as("est_bytes"))
        .orderBy("op")
    }),

    // Y32: COLUMN-drift localization — y3 answers WHICH rows drifted;
    // this answers WHICH COLUMNS, the report a sync operator reads
    // before deciding whether drift is payload (ship it), audit noise
    // (exclude the column — y22), or schema rot (migrate — y27). Same
    // one full-outer PK join; per-column null-safe difference flags are
    // conditional counts inside ONE aggregate, so adding columns grows
    // the expression list, never the scan count. Wide 1-row output.
    "y32_column_drift" -> ((s, d) => {
      val cols = Seq("o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
      val src = sourceView(s, d).select(col("o_orderkey") +:
        lit(1).as("sp") +: cols.map(c => col(c).as(s"s_$c")): _*)
      val tgt = Tables.orders(s, d).select(col("o_orderkey") +:
        lit(1).as("tp") +: cols.map(c => col(c).as(s"t_$c")): _*)
      val both = col("sp").isNotNull && col("tp").isNotNull
      val aggs =
        count(when(col("tp").isNull, 1)).as("rows_added") +:
          count(when(col("sp").isNull, 1)).as("rows_removed") +:
          count(when(both, 1)).as("rows_common") +:
          cols.map(c => count(when(both &&
            !(col(s"s_$c") <=> col(s"t_$c")), 1)).as(s"chg_$c"))
      src.join(tgt, Seq("o_orderkey"), "full_outer")
        .agg(aggs.head, aggs.tail: _*)
    }),

    // Y31: COLLATION-aware diff — the MS-SQL-specific drift class every
    // CI↔CS sync hits: the default SQL Server collations compare
    // case-INSENSITIVELY, so a row pair that differs only by letter
    // case is "equal" to one store and "drifted" to the other, and a
    // binary-hash diff (y3) would ship an endless churn of case-only
    // updates against a CI target that considers them no-ops. The diff
    // therefore carries TWO hashes per side — binary and casefolded —
    // and splits the U class: binary-equal → S, casefold-equal-only →
    // CASE_ONLY (shippable under CS policy, suppressed under CI),
    // binary-and-casefold-different → U (ships always). Same one
    // full-outer PK join as y3; the second hash is a per-row expression,
    // not a second scan. The view plants case-only churn (every 3rd
    // surviving key's priority lowercased) on top of the usual real
    // drift, so all five classes and both policy ship-counts are
    // observed with exact populations.
    "y31_collation_drift" -> ((s, d) => {
      val tgt = Tables.orders(s, d)
      val src = sourceView(s, d).withColumn("o_orderpriority",
        when(col("o_orderkey") % 3 === 0, lower(col("o_orderpriority")))
          .otherwise(col("o_orderpriority")))
      def binHash(p: String => org.apache.spark.sql.Column) = rowHash(p)
      def ciHash(p: String => org.apache.spark.sql.Column) =
        md5(concat_ws("|", p("o_custkey"), lower(p("o_orderstatus")),
          p("o_totalprice").cast("decimal(18,2)").cast("string"),
          lower(p("o_orderpriority"))))
      val a = src.select(col("o_orderkey"),
        binHash(col).as("s_bin"), ciHash(col).as("s_ci"))
      val b = tgt.select(col("o_orderkey"),
        binHash(col).as("t_bin"), ciHash(col).as("t_ci"))
      a.join(b, Seq("o_orderkey"), "full_outer")
        .select(col("o_orderkey"),
          when(col("t_bin").isNull, "I")
            .when(col("s_bin").isNull, "D")
            .when(col("s_bin") === col("t_bin"), "S")
            .when(col("s_ci") === col("t_ci"), "CASE_ONLY")
            .otherwise("U").as("op_class"))
        .groupBy("op_class")
        .agg(count(lit(1)).as("n"),
          sum(pmod(conv(substring(md5(col("o_orderkey").cast("string")),
            1, 15), 16, 10).cast("long"), lit(1000000000L)))
            .as("key_digest"))
        .withColumn("ships_under_ci",
          col("op_class").isin("I", "D", "U"))
        .withColumn("ships_under_cs",
          col("op_class").isin("I", "D", "U", "CASE_ONLY"))
        .orderBy("op_class")
    }),

    // Y30: declarative data-quality constraint audit — [[Quality.audit]]
    // over the mutated source view with a suite that exercises BOTH
    // verdicts on real data: o_orderkey not-null/unique pass; the P
    // statuses, heavy orders, 4-/5- priorities and the repeated
    // custkeys fail with exact violation counts; the FK check runs
    // against a thinned dimension (every 5th customer withheld — the
    // missing-dimension-member scenario) so referential violations are
    // OBSERVED. One scan for all row-local checks + one broadcast
    // anti-join per FK (see Quality's scaladoc for the 100 TB shape).
    "y30_dq_constraints" -> ((s, d) =>
      Quality.audit(sourceView(s, d), Seq(
        Quality.NotNull("o_orderkey"),
        Quality.Unique("o_orderkey"),
        Quality.InSet("o_orderstatus", Seq("O", "F")),
        Quality.InRange("o_totalprice", 0, 300000),
        Quality.Matches("o_orderpriority", "^[1-3]-"),
        Quality.Unique("o_custkey"),
        Quality.FkExists("o_custkey",
          Tables.customer(s, d).filter(col("c_custkey") % 5 =!= 0),
          "c_custkey")))),

    // Y27: schema-migration plan — [[graft.sync.Migration.plan]] scored
    // against a desired schema exercising every verdict: an add
    // (o_channel), a safe widen (o_custkey BIGINT→DECIMAL(28,0)), a
    // lossy narrow (o_totalprice FLOAT→DECIMAL(12,2)), an incompatible
    // encoding change (o_orderdate DATETIME2→BIGINT → a 'manual' step
    // with NO ddl), a drop (o_orderpriority), and an unchanged column
    // (o_orderstatus → no step). The CURRENT schema comes from the
    // parquet footer in BOTH engines (Spark: StructType; DuckDB:
    // DESCRIBE), so the plan is derived, not transcribed; the oracle
    // re-implements the safety matrix for the type pairs in play.
    // Expand → migrate → contract ordering is visible in step_order.
    "y27_migration_plan" -> ((s, d) => {
      import org.apache.spark.sql.types._
      val desired = StructType(Seq(
        StructField("o_orderkey", LongType),
        StructField("o_custkey", DecimalType(28, 0)),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DecimalType(12, 2)),
        StructField("o_orderdate", LongType),
        StructField("o_channel", StringType)))
      val steps = graft.sync.Migration.plan(
        Tables.orders(s, d).schema, desired, "dbo.orders", Seq("o_orderkey"))
      import s.implicits._
      steps.toDF().orderBy("step_order", "column")
    }),

    // Y22: column-subset sync — [[graft.sync.SyncJob.applySubset]] as a
    // scored query. The target carries a target-OWNED audit column
    // (sync_note = 't-<key>'); the source carries its own audit values
    // ('s-<key>', i.e. EVERY surviving row churns in the excluded
    // column) on top of the usual payload drift. The hash-checked
    // output therefore pins the law end-to-end: sync_note reads 't-…'
    // on every S/U/D row (target value preserved — the all-rows audit
    // churn shipped nothing by itself), NULL on inserts, and only the
    // genuinely payload-drifted rows classify U.
    "y22_column_subset_sync" -> ((s, d) => {
      val cmp = Seq("o_orderstatus", "o_totalprice", "o_orderpriority")
      val tgt = Tables.orders(s, d).select(
        (Seq(col("o_orderkey")) ++ cmp.map(col)) :+
          concat(lit("t-"), col("o_orderkey")).as("sync_note"): _*)
      val src = sourceView(s, d).select(
        (Seq(col("o_orderkey")) ++ cmp.map(col)) :+
          concat(lit("s-"), col("o_orderkey")).as("sync_note"): _*)
      graft.sync.SyncJob.applySubset(src, tgt,
        graft.sync.SyncJob.SyncConfig(Seq("o_orderkey"), cmp))
    }),

    // Y24: SAMPLED sync validation — y6 at 100 TB. A full two-sided
    // validation scan per sync cycle is unaffordable at scale; the
    // monitoring form diffs a DETERMINISTIC hash-bucket sample of keys
    // (md5(pk) mod 100 < pct — identical membership in both engines and
    // across runs, unlike rand()-sampling) and extrapolates: drift rate
    // over the sample, absolute drift estimate against the full target
    // count (a count-only scan — parquet answers it from footers), and
    // a 95% normal-approximation half-width so the consumer knows how
    // much to trust the estimate. The expensive part — the full-outer
    // PK shuffle — carries ONLY the sample: validation cost scales with
    // pct, not the table. Float policy: drift_rate/ci are fixed
    // IEEE arithmetic TREES over exact counts (no float reductions), so
    // both engines produce bit-identical doubles (§7.3).
    "y24_sampled_validation" -> ((s, d) => {
      val pct = 10L
      def inSample(k: org.apache.spark.sql.Column) =
        pmod(conv(substring(md5(k.cast("string")), 1, 15), 16, 10)
          .cast("long"), lit(100L)) < pct
      val t = Tables.orders(s, d).filter(inSample(col("o_orderkey")))
        .select(col("o_orderkey").as("t_key"), rowHash(c => col(c)).as("t_hash"))
      val sv = sourceView(s, d).filter(inSample(col("o_orderkey")))
        .select(col("o_orderkey").as("s_key"), rowHash(c => col(c)).as("s_hash"))
      val drifted = !(col("s_hash") <=> col("t_hash"))
      val sampleAgg = sv.join(t, col("s_key") === col("t_key"), "full_outer")
        .agg(count(lit(1)).as("n_sampled"),
          count(when(drifted, 1)).as("n_drifted"))
      val total = Tables.orders(s, d).agg(count(lit(1)).as("n_target_total"))
      sampleAgg.crossJoin(total)
        .select(col("n_target_total"), col("n_sampled"), col("n_drifted"),
          (col("n_drifted").cast("double") / col("n_sampled").cast("double"))
            .as("drift_rate"),
          (col("n_drifted").cast("double") / col("n_sampled").cast("double") *
            col("n_target_total").cast("double")).as("est_drift_total"),
          (lit(1.96) * sqrt(
            col("n_drifted").cast("double") / col("n_sampled").cast("double") *
              (lit(1.0) - col("n_drifted").cast("double") /
                col("n_sampled").cast("double")) /
              col("n_sampled").cast("double"))).as("ci_half"))
    }),

    // Y1: schema introspection — StructType surfaced as rows (JDBC-side
    // introspection is exercised in SyncJdbcSuite; no DB in this env).
    "y1_schema_introspect" -> ((s, d) => {
      import s.implicits._
      Tables.orders(s, d).schema.fields
        .map(f => (f.name, f.dataType.simpleString, f.nullable)).toSeq
        .toDF("col_name", "data_type", "nullable")
    }),

    // Y2: full snapshot copy (scan → sink pass-through).
    "y2_snapshot_copy" -> ((s, d) => Tables.nation(s, d)),

    // Y3: snapshot diff — full-outer join on PK, classify I/D/U/S by
    // presence + row-hash. THE sync primitive when change tracking is off.
    "y3_snapshot_diff" -> ((s, d) => {
      val tgt = Tables.orders(s, d).select(
        col("o_orderkey").as("t_key"), rowHash(c => col(c)).as("t_hash"))
      val src = sourceView(s, d).select(
        col("o_orderkey").as("s_key"), rowHash(c => col(c)).as("s_hash"))
      src.join(tgt, col("s_key") === col("t_key"), "full_outer")
        .select(
          coalesce(col("s_key"), col("t_key")).as("o_orderkey"),
          when(col("t_key").isNull, "I")
            .when(col("s_key").isNull, "D")
            .when(col("s_hash") =!= col("t_hash"), "U")
            .otherwise("S").as("op"))
    }),

    // Y4: change-log apply, latest-wins — events as the change stream:
    // final state per user_id = the row with max (ts, event_id).
    "y4_changelog_apply" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("last_type"),
                col("value").as("last_value"), col("ts").as("last_ts"))
    }),

    // Y5: batch upsert/merge — source overrides target on PK, target rows
    // without a source match survive (no implicit delete).
    "y5_upsert_merge" -> ((s, d) => {
      val cols = Seq("o_orderkey", "o_orderstatus", "o_totalprice")
      val src = sourceView(s, d)
      val tgtOnly = Tables.orders(s, d)
        .join(src.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
      src.select(cols.map(col): _*)
        .unionByName(tgtOnly.select(cols.map(col): _*))
        .withColumn("o_totalprice",
          col("o_totalprice").cast("decimal(18,2)").cast("double"))
    }),

    // Y6: sync validation — row count, exact column sums, order-insensitive
    // digest for each side; equal rows ⇒ in sync (here they differ: drift).
    "y6_sync_validate" -> ((s, d) => {
      def summarize(df: DataFrame, side: String) = df.agg(
        lit(side).as("side"),
        count(lit(1)).as("n_rows"),
        Det.dsum(col("o_totalprice")).as("sum_price"),
        sum(pmod(conv(substring(rowHash(c => col(c)), 1, 15), 16, 10).cast("long"),
                 lit(1000000000L))).as("digest"))
      summarize(Tables.orders(s, d), "target")
        .unionByName(summarize(sourceView(s, d), "source"))
    }),

    // Y8: incremental change-tracking apply — the reference's
    // CHANGETABLE(CHANGES t, @version) shape: state as of a version
    // cutoff + only-newer changes applied on top. LAW: the result equals
    // the full recompute (y4), which is exactly what the oracle checks.
    // Y9: incremental AGGREGATE maintenance — keep a per-customer summary
    // (sum of order prices, order count) in sync with a mutating source
    // WITHOUT recomputing it: per-key deltas are derived from the changed
    // rows only (full-outer on the PK, emit -old for vanished/changed
    // target rows and +new for appeared/changed source rows), then merged
    // into the old aggregate with one more outer join. At 100 TB this is
    // the difference between touching the ~% of rows the change-log names
    // and rescanning the fact table; decimal arithmetic keeps the
    // incremental path bit-identical to the full recompute (float addition
    // would drift), which the oracle — a plain GROUP BY over the mutated
    // source — verifies.
    "y9_incremental_agg" -> ((s, d) =>
      incrementalAgg(
        sourceView(s, d), Tables.orders(s, d),
        pk = "o_orderkey", key = "o_custkey", value = "o_totalprice")
        .withColumnRenamed("sum_value", "sum_price")
        .withColumnRenamed("n_rows", "n_orders")),

    // Y36: STAGED ATOMIC PUBLISH — the blue/green snapshot swap every
    // warehouse table wants under concurrent readers: queries must see
    // EITHER the old snapshot or the new one, never a half-written mix
    // (a plain overwrite-in-place shows readers a deleted/partial dir
    // for the whole rewrite). See [[publish]]/[[readPublished]] for the
    // write→validate→rename→pointer protocol. The query runs the full
    // lifecycle: v1 = the target snapshot, v2 = the drifted source
    // (the real refresh), then a POISONED v3 (empty frame) whose
    // validation fails → publish aborts before the pointer swap; the
    // reader must resolve v2, bit-identical to the source CTE — so the
    // oracle hash certifies both the swap and the abort. Rollback =
    // pointing `_CURRENT` back at v1, which the v2 publish left intact
    // (the law test exercises it).
    "y36_staged_publish" -> ((s, d) => {
      val root = Sources.stage("y36_pub")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      publish(s, Tables.orders(s, d), root, 1, _.head(1).nonEmpty)
      publish(s, sourceView(s, d), root, 2, _.head(1).nonEmpty)
      val ok3 = publish(s, Tables.orders(s, d).filter(lit(false)),
        root, 3, _.head(1).nonEmpty)
      val (v, cur) = readPublished(s, root)
      cur.agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .withColumn("current_version", lit(v))
        .withColumn("abort_left_v2_live", lit(!ok3 && v == "v2"))
    }),

    // Y36b: OPTIMISTIC CONCURRENCY on the publish pointer — y36 is
    // single-writer by construction; two publishers interleaving there
    // produce the classic lost update (both read v1, both publish, the
    // second silently discards the first's rows). The CAS protocol
    // ([[beginPublish]]/[[commitPublish]]) carries the begin-time
    // pointer to commit, re-checks it under a create-exclusive
    // `_COMMIT_LOCK`, and turns the losing publisher into a loud
    // refusal that cleans its own staging — the table only ever shows a
    // fully-published version. Lifecycle here: v1 live; A stages v2
    // from its read of v1; B stages AND commits v3 while A is in
    // flight; A's commit refuses. The reader must resolve B's v3
    // bit-identically (the oracle hash certifies it) and the refusal /
    // no-torn-state flags ride along as audited booleans.
    "y36b_optimistic_publish" -> ((s, d) => {
      val root = Sources.stage("y36b_pub")
      val fsp = new org.apache.hadoop.fs.Path(root)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val st1 = beginPublish(s, Tables.orders(s, d), root, 1,
        _.head(1).nonEmpty)
      commitPublish(s, st1.get)
      // A begins from its read of v1 ...
      val stA = beginPublish(s, sourceView(s, d), root, 2,
        _.head(1).nonEmpty)
      // ... B begins AND commits v3 while A is still in flight
      val stB = beginPublish(s,
        Tables.orders(s, d).filter(col("o_orderkey") % 2 === 0), root, 3,
        _.head(1).nonEmpty)
      val bWon = commitPublish(s, stB.get)
      val aRefused = !commitPublish(s, stA.get)
      val (v, cur) = readPublished(s, root)
      def gone(p: String) =
        !fs.exists(new org.apache.hadoop.fs.Path(s"$root/$p"))
      val noTorn = gone("v2") && gone("_staging_v2") && gone("_COMMIT_LOCK")
      cur.agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("o_totalprice")).as("sum_price"))
        .withColumn("current_version", lit(v))
        .withColumn("winner_committed", lit(bWon))
        .withColumn("loser_refused", lit(aRefused))
        .withColumn("no_torn_state", lit(noTorn))
    }),

    // Y38: COPY-ON-WRITE ROW-LEVEL DELETE/UPDATE — see [[cowApply]].
    // Lifecycle: v1 = orders range-clustered by key (8 files, narrow
    // key spans) + its `_file_stats` manifest; the change set deletes
    // the first tenth of the keyspace and bumps o_totalprice by 100 in
    // the 40–50% band (integer band arithmetic, lockstep with the
    // oracle CTE); cowApply prunes to the files whose spans intersect
    // the bands, rewrites ONLY those, carries the rest verbatim, and
    // publishes v2 via the pointer swap. The reader resolves v2 and the
    // oracle hash certifies the post-state — a missed file, an
    // unapplied update, or a leaked deleted row cannot match. The
    // pruning/immutability claims ride as audited booleans (genuinely
    // computed here, constants in the oracle — the a5/a19 idiom);
    // byte-level identity of untouched files is the OperatorSuite law.
    "y38_row_level_delete" -> ((s, d) => {
      val root = Sources.stage("y38_cow")
      val fsp = new org.apache.hadoop.fs.Path(root)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val o = Tables.orders(s, d)
      publish(s, o.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty)
      writeFileStats(s, s"$root/v1", "o_orderkey")
      val b = o.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val span = b.getLong(1) - lo
      val delHi = lo + span / 10
      val updLo = lo + 4 * (span / 10); val updHi = lo + 5 * (span / 10)
      val deletes = o.filter(col("o_orderkey").between(lo, delHi))
        .select("o_orderkey")
      val updates = o.filter(col("o_orderkey").between(updLo, updHi))
        .select(col("o_orderkey"),
          (col("o_totalprice") + 100.0).as("o_totalprice"))
      val rep = cowApply(s, root, 1, 2, "o_orderkey", deletes, updates)
      val (v, cur) = readPublished(s, root)
      // r13 zero-copy law: every untouched file is REFERENCED by v2's
      // manifest still living in v1 (dir="v1", physical file intact),
      // and v2's own dir holds ONLY the rewritten files — no carried
      // byte was copied
      val refs = manifestDf(s, root, "v2").select("file", "dir")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val untouchedIntact = rep.untouched.nonEmpty && rep.untouched
        .forall { f =>
          refs.get(f).contains("v1") &&
            fs.exists(new org.apache.hadoop.fs.Path(s"$root/v1/$f")) &&
            !fs.exists(new org.apache.hadoop.fs.Path(s"$root/v2/$f"))
        }
      val priorLive = s.read.parquet(s"$root/v1").count() == o.count()
      cur.agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .withColumn("current_version", lit(v))
        .withColumn("pruned_rewrite", lit(rep.published &&
          rep.nFilesRewritten > 0 &&
          rep.nFilesRewritten < rep.nFilesTotal))
        .withColumn("untouched_intact", lit(untouchedIntact))
        .withColumn("prior_version_live", lit(priorLive))
    }),

    // Y38b: CDC-INTO-LAKE — the full I/U/D change log applied to the
    // published copy-on-write table via [[cowApplyChanges]]: latest-wins
    // collapse (an updated-then-deleted key ends deleted), file pruning
    // from the stats manifest, span-routed upserts (in-span rows join
    // the owning file's rewrite, the append frontier gets fresh files),
    // one pointer swap. Change set: partial delete of the first key
    // band, a two-version update ladder in the 40–50% band (version
    // 200 must beat version 100), and inserts beyond the key domain.
    // The oracle replays the same semantics as a filtered/CASE/UNION
    // CTE; a lost insert, a stale update version, or an undead deleted
    // row cannot hash-match.
    "y38b_cdc_into_lake" -> ((s, d) => {
      val root = Sources.stage("y38b_cdc")
      val fsp = new org.apache.hadoop.fs.Path(root)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val proj = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      publish(s, proj.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty)
      writeFileStats(s, s"$root/v1", "o_orderkey")
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val hi = b.getLong(1); val span = hi - lo
      val delHi = lo + span / 10
      val updLo = lo + 4 * (span / 10); val updHi = lo + 5 * (span / 10)
      val off = hi + 1000
      val band2 = col("o_orderkey").between(updLo, updHi)
      val u1 = proj.filter(band2)
        .withColumn("o_totalprice", col("o_totalprice") + 100.0)
        .withColumn("op", lit("U")).withColumn("version", lit(100L))
      val u2 = proj.filter(band2 && col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 200.0)
        .withColumn("op", lit("U")).withColumn("version", lit(200L))
      val dl = proj.filter(col("o_orderkey").between(lo, delHi) &&
          col("o_orderkey") % 3 === 0)
        .withColumn("op", lit("D")).withColumn("version", lit(300L))
      val ins = proj.filter(col("o_orderkey") % 97 === 0)
        .select((col("o_orderkey") + lit(off)).as("o_orderkey"),
          lit(999L).cast(proj.schema("o_custkey").dataType)
            .as("o_custkey"),
          lit(1.0).as("o_totalprice"))
        .withColumn("op", lit("I")).withColumn("version", lit(100L))
      val changes = u1.unionByName(u2).unionByName(dl).unionByName(ins)
      val rep = cowApplyChanges(s, root, 1, 2, "o_orderkey", changes)
      val (v, cur) = readPublished(s, root)
      val frontier = s.read.parquet(s"$root/v2/_file_stats")
        .agg(max(col("kmax"))).collect()(0).getLong(0) > hi
      cur.agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("o_totalprice")).as("sum_price"),
          sum(col("o_custkey")).cast("long").as("sum_cust"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .withColumn("current_version", lit(v))
        .withColumn("pruned_rewrite", lit(rep.published &&
          rep.nFilesRewritten > 0 &&
          rep.nFilesRewritten < rep.nFilesTotal))
        .withColumn("frontier_appended", lit(frontier))
    }),

    // Y39: INCREMENTAL LAKE COMPACTION — see [[compactPublished]].
    // Lifecycle: v1 is published deliberately fragmented (12 small
    // range-clustered files over the lower ¾ of the keyspace + one
    // adequately-sized file on top — the shape a few dozen cow
    // micro-batches leave behind); the compactor bin-packs the smalls
    // into adjacent-range groups, rewrites ONLY those, carries the big
    // file byte-verbatim, and publishes v2 through the pointer swap.
    // The oracle certifies the data is untouched (plain full-table
    // aggregate); the compaction/carry claims ride as audited booleans
    // and the file-count/byte-identity laws live in OperatorSuite.
    "y39_lake_optimize" -> ((s, d) => {
      val root = Sources.stage("y39_opt")
      val fsp = new org.apache.hadoop.fs.Path(root)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val proj = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val cut = b.getLong(0) + 3 * ((b.getLong(1) - b.getLong(0)) / 4)
      val staging = s"$root/_staging_v1"
      proj.filter(col("o_orderkey") <= cut)
        .repartitionByRange(12, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("overwrite").parquet(staging)
      proj.filter(col("o_orderkey") > cut)
        .repartitionByRange(1, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey")
        .write.mode("append").parquet(staging)
      publishStagedDir(s, root, 1, _.head(1).nonEmpty)
      writeFileStats(s, s"$root/v1", "o_orderkey")
      def partFiles(v: String) = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$root/$v")).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      val totalBytes = partFiles("v1").map(_.getLen).sum
      val rep = compactPublished(s, root, 1, 2, "o_orderkey",
        targetBytes = math.max(totalBytes / 4, 1L))
      val (v, cur) = readPublished(s, root)
      // r13 zero-copy: the big file carries as a manifest REFERENCE
      // into v1 — v2's dir holds only the merged rewrites
      val refs = manifestDf(s, root, "v2").select("file", "dir")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val bigCarried = rep.untouched.nonEmpty && rep.untouched.forall { f =>
        refs.get(f).contains("v1") &&
          fs.exists(new org.apache.hadoop.fs.Path(s"$root/v1/$f")) &&
          !fs.exists(new org.apache.hadoop.fs.Path(s"$root/v2/$f"))
      }
      val nv1 = partFiles("v1").length
      val nv2 = refs.size // v2's LOGICAL file count = its manifest
      cur.agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("o_totalprice")).as("sum_price"),
          sum(col("o_custkey")).cast("long").as("sum_cust"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .withColumn("current_version", lit(v))
        .withColumn("compacted", lit(rep.published && nv2 * 2 <= nv1))
        .withColumn("big_file_carried", lit(bigCarried))
    }),

    // Y40: MERGE-ON-READ DELETION VECTORS — see [[dvDelete]] /
    // [[readPublishedMor]] / [[dvFold]]. Lifecycle: v1 published
    // range-clustered; two delete batches land as v2 and v3 writing
    // ONLY a key sidecar each (zero_copy audited: every v3 data file
    // byte-identical to v1's, rewrite count 0); the MOR read subtracts
    // the accumulated vector with one broadcast anti-join; dvFold then
    // publishes v4 through the cow path — pruned rewrite, no sidecar —
    // and the clean read must equal the MOR read it replaced. The
    // oracle replays both delete bands as a NOT-filter; the audit
    // booleans carry the zero-copy/accumulation/fold claims.
    "y40_deletion_vectors" -> ((s, d) => {
      val root = Sources.stage("y40_mor")
      val fsp = new org.apache.hadoop.fs.Path(root)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val proj = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      publish(s, proj.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty)
      writeFileStats(s, s"$root/v1", "o_orderkey")
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val span = b.getLong(1) - lo
      val d1 = proj.filter(col("o_orderkey").between(lo, lo + span / 10) &&
        col("o_orderkey") % 3 === 0).select("o_orderkey")
      val d2 = proj.filter(col("o_orderkey")
          .between(lo + 2 * (span / 10), lo + 3 * (span / 10)) &&
        col("o_orderkey") % 4 === 0).select("o_orderkey")
      val rep1 = dvDelete(s, root, 1, 2, "o_orderkey", d1)
      val rep2 = dvDelete(s, root, 2, 3, "o_orderkey", d2)
      // r13: TRUE zero-copy — v3's dir holds NO data files at all
      // (one listing proves it), every file rides as a manifest
      // reference into v1, still physically intact there
      def localDataFiles(dir: String): Int =
        fs.listStatus(new org.apache.hadoop.fs.Path(dir)).toSeq
          .count(st => st.isFile &&
            st.getPath.getName.startsWith("part-"))
      val refs3 = manifestDf(s, root, "v3").select("file", "dir")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val zeroCopy = rep1.published && rep2.published &&
        rep1.nFilesRewritten == 0 && rep2.nFilesRewritten == 0 &&
        localDataFiles(s"$root/v3") == 0 &&
        rep2.untouched.nonEmpty && rep2.untouched.forall(f =>
          refs3.get(f).contains("v1") &&
            fs.exists(new org.apache.hadoop.fs.Path(s"$root/v1/$f")))
      val dvAccumulated = s.read.parquet(s"$root/v3/_deletes").count() ==
        d1.count() + d2.count()
      val (_, morV3) = readPublishedMor(s, root, "o_orderkey")
      val morCount = morV3.count()
      val rep3 = dvFold(s, root, 3, 4, "o_orderkey")
      val (v, cur) = readPublishedMor(s, root, "o_orderkey")
      val foldedClean = rep3.published &&
        !fs.exists(new org.apache.hadoop.fs.Path(s"$root/v4/_deletes")) &&
        readVersionDir(s, s"$root/v4").count() == morCount
      val prunedFold = rep3.nFilesRewritten > 0 &&
        rep3.nFilesRewritten < rep3.nFilesTotal
      cur.agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("o_totalprice")).as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .withColumn("current_version", lit(v))
        .withColumn("zero_copy_delete", lit(zeroCopy))
        .withColumn("dv_accumulated", lit(dvAccumulated))
        .withColumn("folded_clean", lit(foldedClean))
        .withColumn("pruned_fold", lit(prunedFold))
    }),

    // Y41: CHANGE-DATA-FEED between published versions — see
    // [[lakeChanges]]. Lifecycle: v1 published range-clustered, one
    // y38b CDC batch (delete band1 %3, update band2 +100, insert a %101
    // comb shifted past the key domain) produces v2; lakeChanges(v1,v2)
    // must recover exactly that changelog from the two immutable dirs
    // while scanning ONLY the churned files (pruned_diff audits
    // scanned < total on both sides). The oracle recomputes the I/U/D
    // counts and the updated-rows price sum from the same band
    // arithmetic; a ghost U (carried file misread as changed), a missed
    // D, or a double-counted frontier insert cannot hash-match.
    "y41_change_data_feed" -> ((s, d) => {
      val root = Sources.stage("y41_cdf")
      val fsp = new org.apache.hadoop.fs.Path(root)
      fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(fsp, true)
      val proj = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      publish(s, proj.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty)
      writeFileStats(s, s"$root/v1", "o_orderkey")
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val hi = b.getLong(1); val span = hi - lo
      val band2 = col("o_orderkey")
        .between(lo + 4 * (span / 10), lo + 5 * (span / 10))
      val upd = proj.filter(band2)
        .withColumn("o_totalprice", col("o_totalprice") + 100.0)
        .withColumn("op", lit("U")).withColumn("version", lit(100L))
      val dl = proj.filter(col("o_orderkey")
          .between(lo, lo + span / 10) && col("o_orderkey") % 3 === 0)
        .withColumn("op", lit("D")).withColumn("version", lit(100L))
      val ins = proj.filter(col("o_orderkey") % 101 === 0)
        .select((col("o_orderkey") + lit(hi) + 1000).as("o_orderkey"),
          lit(999L).cast(proj.schema("o_custkey").dataType)
            .as("o_custkey"),
          lit(1.0).as("o_totalprice"))
        .withColumn("op", lit("I")).withColumn("version", lit(100L))
      cowApplyChanges(s, root, 1, 2, "o_orderkey",
        upd.unionByName(dl).unionByName(ins))
      val cdf = lakeChanges(s, root, 1, 2, "o_orderkey")
      val prunedDiff = cdf.scannedFrom < cdf.totalFrom &&
        cdf.scannedTo < cdf.totalTo
      cdf.changes.agg(
          sum(when(col("op") === "I", 1).otherwise(0)).as("n_ins"),
          sum(when(col("op") === "U", 1).otherwise(0)).as("n_upd"),
          sum(when(col("op") === "D", 1).otherwise(0)).as("n_del"),
          Det.dsum(when(col("op") === "U", col("o_totalprice"))
            .otherwise(lit(0.0))).as("upd_price_sum"))
        .withColumn("pruned_diff", lit(prunedDiff))
    }),

    // Y42: INCREMENTAL VIEW MAINTENANCE FROM THE CHANGE-DATA-FEED —
    // the flagship lakehouse consumer of y41: a grouped rollup over a
    // 100 TB table is maintained from the churn-sized CDF instead of a
    // rescan. The both-images form ([[lakeChangesImages]]) is what
    // makes it correct under GROUP-KEY CHANGES: the update here moves
    // rows between groups (custkey+1), so the pre-image subtracts from
    // the old group and the post-image adds to the new one. Sums stay
    // in DECIMAL space end-to-end (base view, minus-delta, plus-delta)
    // and cast to double only at the edge, so the maintained value is
    // bit-identical to a from-scratch recompute — `maintained_ok`
    // audits exactly that equality, and the oracle recomputes the
    // post-state rollup from the same band arithmetic.
    "y42_incremental_view" -> ((s, d) => {
      val root = Sources.stage("y42_ivm")
      val fsp = new org.apache.hadoop.fs.Path(root)
      fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(fsp, true)
      val proj = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      publish(s, proj.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty)
      writeFileStats(s, s"$root/v1", "o_orderkey")
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val hi = b.getLong(1); val span = hi - lo
      val band2 = col("o_orderkey")
        .between(lo + 4 * (span / 10), lo + 5 * (span / 10))
      val upd = proj.filter(band2)
        .withColumn("o_totalprice", col("o_totalprice") + 100.0)
        .withColumn("o_custkey", col("o_custkey") + 1)
        .withColumn("op", lit("U")).withColumn("version", lit(100L))
      val dl = proj.filter(col("o_orderkey")
          .between(lo, lo + span / 10) && col("o_orderkey") % 3 === 0)
        .withColumn("op", lit("D")).withColumn("version", lit(100L))
      val ins = proj.filter(col("o_orderkey") % 101 === 0)
        .select((col("o_orderkey") + lit(hi) + 1000).as("o_orderkey"),
          lit(999L).cast(proj.schema("o_custkey").dataType)
            .as("o_custkey"),
          lit(1.0).as("o_totalprice"))
        .withColumn("op", lit("I")).withColumn("version", lit(100L))
      cowApplyChanges(s, root, 1, 2, "o_orderkey",
        upd.unionByName(dl).unionByName(ins))
      val dec = org.apache.spark.sql.types.DecimalType(28, 2)
      val sumT = org.apache.spark.sql.types.DecimalType(38, 2)
      val dzero = lit(0).cast(sumT)
      def rollup(df: DataFrame): DataFrame = df
        .groupBy((col("o_custkey") % 10).as("grp"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(dec)).as("s"))
      val mv1 = rollup(s.read.parquet(s"$root/v1"))
      val imgs = lakeChangesImages(s, root, 1, 2, "o_orderkey").changes
      // delta-sized aggregates: one pass over the CDF, never the table
      val minus = imgs.filter(col("op").isin("D", "U"))
        .groupBy((col("pre_o_custkey") % 10).as("grp"))
        .agg(count(lit(1)).as("dc_m"),
          sum(col("pre_o_totalprice").cast(dec)).as("ds_m"))
      val plus = imgs.filter(col("op").isin("I", "U"))
        .groupBy((col("post_o_custkey") % 10).as("grp"))
        .agg(count(lit(1)).as("dc_p"),
          sum(col("post_o_totalprice").cast(dec)).as("ds_p"))
      val maintained = mv1
        .join(minus, Seq("grp"), "full_outer")
        .join(plus, Seq("grp"), "full_outer")
        .select(col("grp"),
          (coalesce(col("cnt"), lit(0L)) - coalesce(col("dc_m"), lit(0L))
            + coalesce(col("dc_p"), lit(0L))).as("n_rows"),
          (coalesce(col("s").cast(sumT), dzero)
            - coalesce(col("ds_m").cast(sumT), dzero)
            + coalesce(col("ds_p").cast(sumT), dzero))
            .cast("double").as("sum_price"))
        .filter(col("n_rows") > 0)
      val direct = rollup(readVersionDir(s, s"$root/v2"))
        .select(col("grp"), col("cnt").as("n_rows"),
          col("s").cast("double").as("sum_price"))
      // equality audit as ONE aggregate per side (count + order-free
      // row-hash sum) instead of the two full exceptAll joins this
      // query used to pay — same bit-identity claim (sum_price renders
      // identically iff the doubles are identical), a quarter of the
      // jobs; the law-grade multiset proof lives in OperatorSuite's y42
      // law, not in every timed run
      def dig(df: DataFrame): (Long, Long) = {
        val r = df.agg(count(lit(1)),
          coalesce(sum(crc32(concat_ws("|", col("grp"), col("n_rows"),
            col("sum_price").cast("string")))), lit(0L))).collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val ok = dig(maintained) == dig(direct)
      maintained.withColumn("maintained_ok", lit(ok))
    }),

    // Y43: METADATA-ONLY SCHEMA EVOLUTION — see [[evolveSchema]].
    // Lifecycle: v1 published; ADD COLUMN o_score publishes v2 whose
    // only new bytes are the `_schema` sidecar (zero-copy audited:
    // every v2 data file byte-length-identical to v1's); the column
    // reads null everywhere; a cow mutation then BACKFILLS the 40–50%
    // band (o_score = 2×price) into v3 — rewritten files materialize
    // the column physically, carried files keep reading null through
    // the overlay, and v1 read back still shows the OLD schema
    // (old_version_intact). The oracle recomputes the backfilled
    // population and its score sum from the same band arithmetic.
    "y43_schema_evolution" -> ((s, d) => {
      val root = Sources.stage("y43_evo")
      val fsp = new org.apache.hadoop.fs.Path(root)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val proj = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      publish(s, proj.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty)
      writeFileStats(s, s"$root/v1", "o_orderkey")
      assert(evolveSchema(s, root, 1, 2, Seq(
        org.apache.spark.sql.types.StructField("o_score",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
      // r13: v2's dir holds NO data files — every file is a manifest
      // reference into v1, and the only new bytes are the sidecars
      val v2Local = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$root/v2")).toSeq
        .count(st => st.isFile && st.getPath.getName.startsWith("part-"))
      val refs2 = manifestDf(s, root, "v2").select("dir").distinct()
        .collect().map(_.getString(0)).toSeq
      val zeroCopy = v2Local == 0 && refs2 == Seq("v1") &&
        readVersionDir(s, s"$root/v2").filter(col("o_score").isNotNull)
          .isEmpty
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val span = b.getLong(1) - lo
      val band2 = col("o_orderkey")
        .between(lo + 4 * (span / 10), lo + 5 * (span / 10))
      val backfill = proj.filter(band2)
        .select(col("o_orderkey"),
          (col("o_totalprice") * 2).as("o_score"))
      val rep = cowApply(s, root, 2, 3, "o_orderkey",
        deletes = backfill.select("o_orderkey").limit(0),
        updates = backfill)
      val (v, cur) = readPublished(s, root)
      val oldIntact = !readVersionDir(s, s"$root/v1")
        .columns.contains("o_score")
      cur.agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("o_totalprice")).as("sum_price"),
          count(col("o_score")).as("n_backfilled"),
          Det.dsum(coalesce(col("o_score"), lit(0.0))).as("score_sum"))
        .withColumn("current_version", lit(v))
        .withColumn("evolution_zero_copy", lit(zeroCopy))
        .withColumn("pruned_backfill", lit(rep.published &&
          rep.nFilesRewritten > 0 &&
          rep.nFilesRewritten < rep.nFilesTotal))
        .withColumn("old_version_intact", lit(oldIntact))
    }),

    // Y44: MULTI-TABLE ATOMIC PUBLISH — see [[publishGroup]].
    // Lifecycle: orders+lineitem published as group v1; a parent-band
    // delete WITH its children publishes as group v2 (one pointer
    // swap — no reader can see the parent delete without the child
    // delete); an injected validation failure on the child aborts a
    // v3 attempt with the pointer untouched and the parent's landed
    // v3 dir cleaned. The FK audit (orphan children) runs over the
    // resolved group and must read zero; the oracle recomputes both
    // tables' post-state aggregates from the same band arithmetic.
    "y44_atomic_group" -> ((s, d) => {
      val root = Sources.stage("y44_grp")
      val fsp = new org.apache.hadoop.fs.Path(root)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val o = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_extendedprice")
      require(publishGroup(s, root,
        Seq("orders" -> o, "lineitem" -> li), 1, _.head(1).nonEmpty))
      val b = o.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val span = b.getLong(1) - lo
      val o2 = o.filter(!(col("o_orderkey")
        .between(lo, lo + span / 10) && col("o_orderkey") % 3 === 0))
      val l2 = li.join(o2.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_semi")
      require(publishGroup(s, root,
        Seq("orders" -> o2, "lineitem" -> l2), 2, _.head(1).nonEmpty))
      // injected failure: the child validates empty → whole group aborts
      val aborted = !publishGroup(s, root,
        Seq("orders" -> o2.limit(5), "lineitem" -> l2.limit(0)), 3,
        _.head(1).nonEmpty)
      val grp = readPublishedGroup(s, root)
      val (vo, go) = grp("orders"); val (vl, gl) = grp("lineitem")
      val noResidue = !fs.exists(
        new org.apache.hadoop.fs.Path(s"$root/orders/v3")) &&
        !fs.exists(new org.apache.hadoop.fs.Path(s"$root/lineitem/v3"))
      val orphans = gl.join(
        go.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_anti").count()
      go.agg(count(lit(1)).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("sum_o_price"))
        .crossJoin(gl.agg(count(lit(1)).as("n_lineitem"),
          Det.dsum(col("l_extendedprice")).as("sum_l_price")))
        .withColumn("n_orphans", lit(orphans))
        .withColumn("orders_version", lit(vo))
        .withColumn("lineitem_version", lit(vl))
        .withColumn("abort_kept_group", lit(aborted && vo == 2 && vl == 2))
        .withColumn("no_v3_residue", lit(noResidue))
    }),

    // Y45: DECLARATIVE MERGE INTO on the published lake — the full SQL
    // clause matrix ([[mergeInto]]) exercised end-to-end: source =
    // every 5th key updated (+500, status M, but HIGH-price matches
    // DELETE instead — the matched-delete clause) ∪ the %13 rekey
    // (+10M — the append FRONTIER, inserted only for even custkeys:
    // the insert condition) ; NMBS DELETE reaps 'F' targets in the
    // first key decile the source never mentions. The oracle replays
    // the same routing as three joins over the same CTEs. Scale: the
    // merge prunes affected files by source-span ∪ NMBS-range against
    // the manifest; only that subset full-outer-joins the delta-sized
    // source — the table is never scanned.
    "y45_merge_into" -> ((s, d) => {
      val root = Sources.stage("y45_mrg")
      val fsp = new org.apache.hadoop.fs.Path(root)
      fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(fsp, true)
      val proj = Tables.orders(s, d).select("o_orderkey", "o_custkey",
        "o_totalprice", "o_orderstatus")
      publish(s, proj.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty)
      writeFileStats(s, s"$root/v1", "o_orderkey")
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val span = b.getLong(1) - lo
      // updates live in ONE key band (deciles 2–4) so the manifest
      // prune is demonstrable: only band+NMBS files rewrite
      val src = proj.filter(col("o_orderkey")
          .between(lo + 2 * (span / 10), lo + 4 * (span / 10)) &&
          col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 500.0)
        .withColumn("o_orderstatus", lit("M"))
        .unionByName(proj.filter(col("o_orderkey") % 13 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
          .withColumn("o_orderstatus", lit("N")))
      val rep = mergeInto(s, root, 1, 2, "o_orderkey", src,
        matchedDeleteCond = Some(col("src_o_totalprice") > 200000.0),
        matchedUpdateCond = None,
        notMatchedInsertCond = Some(col("src_o_custkey") % 2 === 0),
        nmbsDelete = Some((lo, lo + span / 10,
          col("o_orderstatus") === "F")))
      require(rep.published && rep.cardinalityOk,
        s"y45: merge refused: $rep")
      val (_, cur) = readPublished(s, root)
      cur.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("o_totalprice")).as("sum_price"))
        .withColumn("pruned_merge",
          lit(rep.nFilesRewritten < rep.nFilesTotal))
    }),

    // Y46: GROUP TIME TRAVEL + ROLLBACK-AS-ROLL-FORWARD — the group
    // pointer's append-only `_group_gen_*` history makes every past
    // consistent cross-table snapshot addressable ([[readGroupAsOf]])
    // and rollback a one-file commit that moves ZERO data bytes
    // ([[rollbackGroup]] — gen3 = gen1's content, the git-revert
    // shape; gen2 stays inspectable). Output: the restored group's
    // rollups (== the original publish, which the oracle recomputes
    // from the base tables) + the audited history laws.
    "y46_group_time_travel" -> ((s, d) => {
      val root = Sources.stage("y46_grp")
      val fsp = new org.apache.hadoop.fs.Path(root)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      val o = Tables.orders(s, d).select("o_orderkey", "o_totalprice")
      val li = Tables.lineitem(s, d)
        .select("l_orderkey", "l_extendedprice")
      require(publishGroup(s, root,
        Seq("orders" -> o, "lineitem" -> li), 1, _.head(1).nonEmpty))
      val o2 = o.filter(col("o_orderkey") % 3 =!= 0)
      require(publishGroup(s, root, Seq("orders" -> o2), 2,
        _.head(1).nonEmpty))
      val gensBefore = groupGenerations(s, root)
      val gen3 = rollbackGroup(s, root, 1)
      val grp = readPublishedGroup(s, root)
      val (vo, go) = grp("orders"); val (vl, gl) = grp("lineitem")
      // zero data movement: the bad generation's dir is still there,
      // the restored one was never rewritten
      val zeroCopy = fs.exists(
        new org.apache.hadoop.fs.Path(s"$root/orders/v2")) && vo == 1
      val asof = readGroupAsOf(s, root, 1)("orders")._2
      val asofMatches = asof.exceptAll(go).isEmpty &&
        go.exceptAll(asof).isEmpty
      go.agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("o_totalprice")).as("sum_price"))
        .crossJoin(gl.agg(count(lit(1)).as("lineitem_rows")))
        .withColumn("gen_count", lit(gen3.toLong))
        .withColumn("history_intact",
          lit(gensBefore == Seq(1, 2) && gen3 == 3 && vl == 1))
        .withColumn("rollback_zero_copy", lit(zeroCopy))
        .withColumn("asof_matches", lit(asofMatches))
    }),

    // Y48: LAKE → JDBC INCREMENTAL SYNC — the flagship composition: the
    // published lake is the source of record, the y41 change-data-feed
    // is the delta extractor, and the dialected MERGE/DELETE writers
    // (embedded Derby standing in for the MS-SQL-shaped target) are the
    // apply path. v1 = "yesterday": a banded price perturbation (+500
    // on %5 keys in deciles 2–4), the same band's %11 keys missing, and
    // %17 ghost rows parked above the live keyspace. One CDC batch
    // corrects all three (U / I / D) → v2 ≡ the plain projection; the
    // target is seeded from v1 and ONE incremental step ships only the
    // net CDF. Scale story measured in-query: the CDF scan is
    // manifest-pruned (band+ghost files only — `cdf_pruned`), the JDBC
    // traffic is churn-sized, and the drift certificate
    // (`sync_validated`, SyncJob.validate's full-outer digest diff)
    // names the immutable v2 snapshot. Output = the TARGET's content
    // read back over JDBC, so the oracle match proves the wire path.
    "y48_lake_jdbc_sync" -> ((s, d) => {
      val n = y48Runs.incrementAndGet()
      val root = Sources.stage(s"y48_lake_$n")
      val fsp = new org.apache.hadoop.fs.Path(root)
      fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(fsp, true)
      // %3 key slice (the y53/y54 idiom): the embedded-Derby wire is a
      // semantics stand-in, not a throughput target — the slice bounds
      // the timed row volume while the banded construction keeps the
      // full I/U/D mix; JdbcSyncSuite keeps the full-volume laws
      val proj = Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
        .select("o_orderkey", "o_custkey",
        "o_totalprice", "o_orderstatus")
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val span = b.getLong(1) - lo
      val band = col("o_orderkey")
        .between(lo + 2 * (span / 10), lo + 4 * (span / 10))
      val ghosts = proj.filter(col("o_orderkey") % 17 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
        .withColumn("o_orderstatus", lit("X"))
      val v1 = proj.filter(!(band && col("o_orderkey") % 11 === 0))
        .withColumn("o_totalprice",
          when(band && col("o_orderkey") % 5 === 0,
            col("o_totalprice") + 500.0).otherwise(col("o_totalprice")))
        .unionByName(ghosts)
      publish(s, v1.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty)
      writeFileStats(s, s"$root/v1", "o_orderkey")
      val batch = proj.filter(band && col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("I"))
        .unionByName(proj.filter(band && col("o_orderkey") % 5 === 0 &&
          col("o_orderkey") % 11 =!= 0).withColumn("op", lit("U")))
        .unionByName(ghosts.withColumn("op", lit("D")))
        .withColumn("version", lit(1L))
      require(cowApplyChanges(s, root, 1, 2, "o_orderkey", batch)
        .published, "y48: cow publish refused")
      val cfg = graft.sources.JdbcSync.JdbcConfig(
        url = Sources.sharedDerbyUrl, table = s"Y48_TGT_$n",
        driver = "org.apache.derby.jdbc.EmbeddedDriver")
      graft.sources.JdbcSync.writeTable(
        proj.limit(0).select(proj.columns.toSeq
          .map(c => col(c).as(c.toUpperCase)): _*),
        cfg, org.apache.spark.sql.SaveMode.Overwrite)
      // bulk seed = batched INSERTs into the fresh table (the
      // retry-free staging case) — run UNINDEXED (no per-row index
      // maintenance), then build the key index ONCE before the
      // incremental step, whose MERGE probes structurally require it
      // (unindexed probes full-scan — O(n²), see ensureKeyIndex)
      graft.sync.LakeToJdbc.seed(s, root, 1, "o_orderkey", cfg,
        bulk = true)
      graft.sources.JdbcSync.ensureKeyIndex(cfg, Seq("O_ORDERKEY"))
      val rep = graft.sync.LakeToJdbc.incrementalSync(
        s, root, 1, 2, "o_orderkey", cfg)
      require(rep.validated, s"y48: post-sync drift: $rep")
      graft.sources.JdbcSync.readTable(s, cfg, None)
        .groupBy(col("O_ORDERSTATUS").as("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("O_TOTALPRICE")).as("sum_price"))
        .withColumn("cdf_pruned",
          lit(rep.scannedFiles < rep.totalFiles))
        .withColumn("sync_validated", lit(rep.validated))
        .withColumn("ops_mix_real",
          lit(rep.nInsert > 0 && rep.nUpdate > 0 && rep.nDelete > 0))
    }),

    // Y48b: LAKE → SCD2 HISTORY SYNC — the same CDF extraction as y48
    // but the target is a WAREHOUSE HISTORY table: every op CLOSES the
    // key's current version (valid_to = lake version, is_current = 0)
    // and I/U additionally OPEN the new one, so the target accretes
    // every version the lake ever published instead of overwriting —
    // the reference's SCD2 load shape driven from the lake's own
    // change feed. The lake's DESTINATION VERSION NUMBER is the SCD2
    // clock: one monotone, replay-stable stamp, so the whole step is
    // replay-idempotent (`valid_from < ver` close guard + a MERGE
    // keyed on (key, valid_from) for the open — re-delivery re-lands
    // on the same history). Scenario: the y48 banded perturbation on a
    // (key, price) projection; seed v1 as history generation 1, one
    // incremental step to v2, then REPLAY the step and audit the
    // history row counts are unchanged. Output = the target's
    // `is_current = 1` slice read back over JDBC (≡ the plain
    // projection the CDC batch restored), so the oracle match proves
    // the wire path; the history/replay/prune laws ride as audited
    // booleans. At 100 TB: identical scale story to y48 — churn-sized
    // CDF, index-probed closes/opens, history growth ∝ total churn.
    "y48b_lake_scd2_sync" -> ((s, d) => {
      val n = y48Runs.incrementAndGet()
      val root = Sources.stage(s"y48b_lake_$n")
      val fsp = new org.apache.hadoop.fs.Path(root)
      fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(fsp, true)
      // %3 slice — same timed-cost bound as y48 (scaladoc there)
      val proj = Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
        .select("o_orderkey", "o_totalprice")
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val span = b.getLong(1) - lo
      val band = col("o_orderkey")
        .between(lo + 2 * (span / 10), lo + 4 * (span / 10))
      val ghosts = proj.filter(col("o_orderkey") % 17 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
      val v1 = proj.filter(!(band && col("o_orderkey") % 11 === 0))
        .withColumn("o_totalprice",
          when(band && col("o_orderkey") % 5 === 0,
            col("o_totalprice") + 500.0).otherwise(col("o_totalprice")))
        .unionByName(ghosts)
      publish(s, v1.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty)
      writeFileStats(s, s"$root/v1", "o_orderkey")
      val batch = proj.filter(band && col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("I"))
        .unionByName(proj.filter(band && col("o_orderkey") % 5 === 0 &&
          col("o_orderkey") % 11 =!= 0).withColumn("op", lit("U")))
        .unionByName(ghosts.withColumn("op", lit("D")))
        .withColumn("version", lit(1L))
      require(cowApplyChanges(s, root, 1, 2, "o_orderkey", batch)
        .published, "y48b: cow publish refused")
      val cfg = graft.sources.JdbcSync.JdbcConfig(
        url = Sources.sharedDerbyUrl, table = s"Y48B_HIST_$n",
        driver = "org.apache.derby.jdbc.EmbeddedDriver")
      // the history table needs its composite PK up front (the close
      // UPDATE probes (key, is_current), the open MERGE probes
      // (key, valid_from)) — Spark's JDBC writer can't declare one, so
      // plain DDL here, then bulk-append the v1 snapshot as history
      // generation 1 (open rows: valid_from = 1, valid_to = NULL)
      Class.forName(cfg.driver)
      val conn = java.sql.DriverManager.getConnection(cfg.url)
      // bare table for the bulk history seed — the composite PK the
      // close/open probes need lands ONCE afterwards (load-then-index:
      // no per-row index maintenance during the 1-generation append)
      try conn.createStatement().execute(
        s"CREATE TABLE ${cfg.table} (O_ORDERKEY BIGINT NOT NULL, " +
          "O_TOTALPRICE DOUBLE, VALID_FROM BIGINT NOT NULL, " +
          "VALID_TO BIGINT, IS_CURRENT SMALLINT)")
      finally conn.close()
      val seedRows = v1.count()
      graft.sources.JdbcSync.writeTable(
        v1.select(col("o_orderkey").as("O_ORDERKEY"),
          col("o_totalprice").as("O_TOTALPRICE"),
          lit(1L).as("VALID_FROM"),
          lit(null).cast("bigint").as("VALID_TO"),
          lit(1).cast("smallint").as("IS_CURRENT"))
          .repartitionByRange(1, col("O_ORDERKEY")),
        cfg, org.apache.spark.sql.SaveMode.Append)
      val c2 = java.sql.DriverManager.getConnection(cfg.url)
      try c2.createStatement().execute(
        s"ALTER TABLE ${cfg.table} ADD CONSTRAINT " +
          s"PK_${cfg.table} PRIMARY KEY (O_ORDERKEY, VALID_FROM)")
      finally c2.close()
      def histCounts(): (Long, Long) = {
        val r = graft.sources.JdbcSync.readTable(s, cfg, None)
          .agg(count(lit(1)), count(when(col("IS_CURRENT") === 0, 1)))
          .collect()(0)
        (r.getLong(0), r.getLong(1))
      }
      val rep = graft.sync.LakeToJdbc.incrementalScd2(
        s, root, 1, 2, "o_orderkey", "o_totalprice", cfg)
      require(rep.validated, s"y48b: post-sync drift: $rep")
      val (histRows, closedRows) = histCounts()
      // REPLAY the whole step — the worst-case re-delivery; history
      // must not move (close guard + keyed open MERGE)
      val rep2 = graft.sync.LakeToJdbc.incrementalScd2(
        s, root, 1, 2, "o_orderkey", "o_totalprice", cfg)
      val replayNoop = rep2.validated && histCounts() == ((histRows,
        closedRows))
      graft.sources.JdbcSync.readTable(s, cfg, None)
        .filter(col("IS_CURRENT") === 1)
        .agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("O_TOTALPRICE")).as("sum_price"))
        .withColumn("cdf_pruned",
          lit(rep.scannedFiles < rep.totalFiles))
        .withColumn("sync_validated", lit(rep.validated))
        .withColumn("ops_mix_real",
          lit(rep.nInsert > 0 && rep.nUpdate > 0 && rep.nDelete > 0))
        // closes = U (superseded) + D (ended); every I and U OPENS one
        // new history row and nothing is ever deleted, so total rows =
        // seed + nI + nU; a delete closes WITHOUT opening — the key's
        // history survives, which is the point of SCD2
        .withColumn("history_accreted",
          lit(closedRows == rep.nUpdate + rep.nDelete &&
            histRows == seedRows + rep.nInsert + rep.nUpdate))
        .withColumn("replay_noop", lit(replayNoop))
    }),

    // Y53: JDBC → LAKE CAPTURE — the pull half (see [[graft.sync
    // .JdbcToLake]]): tick 1 bootstraps the lake from a perturbed
    // Derby source, the source then converges to the clean projection
    // (full overwrite — the diff classifies states, not statements),
    // tick 2 captures ONE snapshot-diff into a churn-pruned cow
    // publish, tick 3 finds an empty diff and mints NO version (the
    // version-history-∝-change audit). The projection is the %3 key
    // slice: the embedded-Derby wire is a semantics stand-in, not a
    // throughput target, so the timed surface bounds it while the
    // banded construction keeps the full I/U/D mix. Output = the LAKE
    // live version's rollup; oracle = the same slice of orders.
    "y53_jdbc_capture" -> ((s, d) => {
      val n = y48Runs.incrementAndGet()
      val root = Sources.stage(s"y53_lake_$n")
      val fsp = new org.apache.hadoop.fs.Path(root)
      fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(fsp, true)
      val proj = Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice",
          "o_orderstatus")
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val span = b.getLong(1) - lo
      val band = col("o_orderkey")
        .between(lo + 2 * (span / 10), lo + 4 * (span / 10))
      val ghosts = proj.filter(col("o_orderkey") % 17 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
        .withColumn("o_orderstatus", lit("X"))
      val src1 = proj.filter(!(band && col("o_orderkey") % 11 === 0))
        .withColumn("o_totalprice",
          when(band && col("o_orderkey") % 5 === 0,
            col("o_totalprice") + 500.0).otherwise(col("o_totalprice")))
        .unionByName(ghosts)
      val cfg = graft.sources.JdbcSync.JdbcConfig(
        url = Sources.sharedDerbyUrl, table = s"Y53_SRC_$n",
        driver = "org.apache.derby.jdbc.EmbeddedDriver")
      def loadSource(df: DataFrame): Unit = {
        graft.sources.JdbcSync.writeTable(
          df.select(df.columns.toSeq
            .map(c => col(c).as(c.toUpperCase)): _*),
          cfg, org.apache.spark.sql.SaveMode.Overwrite)
        graft.sources.JdbcSync.ensureKeyIndex(cfg, Seq("O_ORDERKEY"))
      }
      loadSource(src1)
      val t1 = graft.sync.JdbcToLake.capture(s, cfg, root, "o_orderkey")
      loadSource(proj) // the source converges; the diff must restore
      val t2 = graft.sync.JdbcToLake.capture(s, cfg, root, "o_orderkey")
      val t3 = graft.sync.JdbcToLake.capture(s, cfg, root, "o_orderkey")
      readPublished(s, root)._2
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("o_totalprice")).as("sum_price"))
        .withColumn("modes_observed",
          lit(t1.mode == "bootstrap" && t2.mode == "incremental" &&
            t3.mode == "noop"))
        .withColumn("noop_mints_no_version",
          lit(t2.version == 2 && t3.version == 2))
        .withColumn("ops_mix_real",
          lit(t2.nInsert > 0 && t2.nUpdate > 0 && t2.nDelete > 0))
        .withColumn("sync_validated",
          lit(t1.validated && t2.validated && t3.validated))
    }),

    // Y54: ROUND-TRIP SYNC — the reference's ACTUAL end-to-end in one
    // query: source DB → (y53 capture) → staging lake → (y50 catch-up)
    // → target DB, every layer the engine's own machinery. The source
    // starts perturbed, both pipelines bootstrap, the source then
    // converges and ONE capture tick + ONE catch-up tick carry the
    // churn through the lake to the target; the closing audit
    // validates TARGET ≡ SOURCE (digest full-outer, end to end across
    // both wire hops). Output = the TARGET's rollup read back over
    // JDBC; oracle = the same %3 slice of orders — a match proves the
    // whole chain. Same %3 cost bound as y53.
    "y54_roundtrip_sync" -> ((s, d) => {
      val n = y48Runs.incrementAndGet()
      val root = Sources.stage(s"y54_lake_$n")
      val fsp = new org.apache.hadoop.fs.Path(root)
      fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(fsp, true)
      val proj = Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
        .select("o_orderkey", "o_custkey", "o_totalprice",
          "o_orderstatus")
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val span = b.getLong(1) - lo
      val band = col("o_orderkey")
        .between(lo + 2 * (span / 10), lo + 4 * (span / 10))
      val ghosts = proj.filter(col("o_orderkey") % 17 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
        .withColumn("o_orderstatus", lit("X"))
      val src1 = proj.filter(!(band && col("o_orderkey") % 11 === 0))
        .withColumn("o_totalprice",
          when(band && col("o_orderkey") % 5 === 0,
            col("o_totalprice") + 500.0).otherwise(col("o_totalprice")))
        .unionByName(ghosts)
      val srcCfg = graft.sources.JdbcSync.JdbcConfig(
        url = Sources.sharedDerbyUrl, table = s"Y54_SRC_$n",
        driver = "org.apache.derby.jdbc.EmbeddedDriver")
      val tgtCfg = graft.sources.JdbcSync.JdbcConfig(
        url = Sources.sharedDerbyUrl, table = s"Y54_TGT_$n",
        driver = "org.apache.derby.jdbc.EmbeddedDriver")
      def loadSource(df: DataFrame): Unit = {
        graft.sources.JdbcSync.writeTable(
          df.select(df.columns.toSeq
            .map(c => col(c).as(c.toUpperCase)): _*),
          srcCfg, org.apache.spark.sql.SaveMode.Overwrite)
        graft.sources.JdbcSync.ensureKeyIndex(srcCfg, Seq("O_ORDERKEY"))
      }
      loadSource(src1)
      graft.sources.JdbcSync.writeTable(
        proj.limit(0).select(proj.columns.toSeq
          .map(c => col(c).as(c.toUpperCase)): _*),
        tgtCfg, org.apache.spark.sql.SaveMode.Overwrite)
      val c1 = graft.sync.JdbcToLake.capture(s, srcCfg, root, "o_orderkey")
      // u1 is a bulk reseed: index the target AFTER it (y48's idiom)
      val u1 = graft.sync.LakeToJdbc.catchUp(s, root, "o_orderkey", tgtCfg)
      graft.sources.JdbcSync.ensureKeyIndex(tgtCfg, Seq("O_ORDERKEY"))
      loadSource(proj) // the source converges
      val c2 = graft.sync.JdbcToLake.capture(s, srcCfg, root, "o_orderkey")
      val u2 = graft.sync.LakeToJdbc.catchUp(s, root, "o_orderkey", tgtCfg)
      val u3 = graft.sync.LakeToJdbc.catchUp(s, root, "o_orderkey", tgtCfg)
      // the end-to-end certificate: TARGET ≡ SOURCE, across both hops
      val srcBack = graft.sources.JdbcSync.readTable(s, srcCfg, None)
      val tgtBack = graft.sources.JdbcSync.readTable(s, tgtCfg, None)
      val e2e = graft.sync.SyncJob.validate(srcBack, tgtBack,
        graft.sync.SyncJob.SyncConfig(Seq("O_ORDERKEY"),
          Seq("O_CUSTKEY", "O_TOTALPRICE", "O_ORDERSTATUS"),
          deleteMissing = true))
      tgtBack
        .groupBy(col("O_ORDERSTATUS").as("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("O_TOTALPRICE")).as("sum_price"))
        .withColumn("modes_observed",
          lit(c1.mode == "bootstrap" && u1.mode == "reseed" &&
            c2.mode == "incremental" && u2.mode == "incremental" &&
            u3.mode == "noop"))
        .withColumn("churn_sized_hops",
          lit(c2.nUpdate > 0 && u2.nUpdate > 0 &&
            u2.scannedFiles < u2.totalFiles))
        .withColumn("e2e_validated",
          lit(e2e && c1.validated && c2.validated &&
            u1.validated && u2.validated))
    }),

    // Y52: GROUP CATCH-UP — the multi-table form of the reference's
    // job: a y44-consistent (nation, customer) group catches up into a
    // Derby database whose CHILD TABLE CARRIES A REAL FOREIGN KEY to
    // the parent, so the apply ORDER is load-bearing — v1 plants a
    // ghost nation with customers moved/ghosted onto it, v2 removes
    // it; the tick must update/delete those customers BEFORE the
    // nation delete or Derby itself refuses. Tick 1 group-reseeds
    // (parent loads first for the same reason), tick 2 runs one
    // churn-sized CDF step per table (customer: I/U/D mix; nation: the
    // ghost D), tick 3 noops. Output = the two TARGETS joined over
    // JDBC and rolled up per nation — matching the oracle proves both
    // tables converged AND every FK held on the way. Wrong-order
    // refusal and the all-or-nothing group reseed are law-tested in
    // JdbcSyncSuite.
    "y52_group_catchup" -> ((s, d) => {
      val n = y48Runs.incrementAndGet()
      val root = Sources.stage(s"y52_lake_$n")
      val fsp = new org.apache.hadoop.fs.Path(root)
      fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(fsp, true)
      val nat = Tables.nation(s, d).select("n_nationkey", "n_name")
      // %3 slice on the child table — y48's timed-cost bound; the
      // parent is 25 rows and stays whole
      val cust = Tables.customer(s, d)
        .filter(col("c_custkey") % 3 === 0).select("c_custkey",
        "c_nationkey", "c_acctbal", "c_mktsegment")
      val ghostNat = nat.limit(1).select(
        lit(99).as("n_nationkey"), lit("GHOSTLAND").as("n_name"))
      val ghostCust = cust.filter(col("c_custkey") % 17 === 0)
        .withColumn("c_custkey", col("c_custkey") + 1000000L)
        .withColumn("c_nationkey", lit(99))
      val cust1 = cust.filter(col("c_custkey") % 11 =!= 0)
        .withColumn("c_nationkey",
          when(col("c_custkey") % 13 === 0, lit(99))
            .otherwise(col("c_nationkey")))
        .withColumn("c_acctbal",
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal")))
        .unionByName(ghostCust)
      require(publishGroup(s, root,
        Seq("nation" -> nat.unionByName(ghostNat), "customer" -> cust1),
        1, _.head(1).nonEmpty), "y52: v1 group publish refused")
      val url = Sources.sharedDerbyUrl
      val natTbl = s"Y52_NATION_$n"; val custTbl = s"Y52_CUSTOMER_$n"
      val drv = "org.apache.derby.jdbc.EmbeddedDriver"
      Class.forName(drv)
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        val st = conn.createStatement()
        st.execute(s"CREATE TABLE $natTbl (N_NATIONKEY INTEGER " +
          "NOT NULL PRIMARY KEY, N_NAME VARCHAR(64))")
        st.execute(s"CREATE TABLE $custTbl (C_CUSTKEY BIGINT " +
          "NOT NULL PRIMARY KEY, C_NATIONKEY INTEGER NOT NULL " +
          s"REFERENCES $natTbl (N_NATIONKEY), C_ACCTBAL DOUBLE, " +
          "C_MKTSEGMENT VARCHAR(32))")
      } finally conn.close()
      val members = Seq(
        graft.sync.LakeToJdbc.GroupMember("nation", "n_nationkey",
          graft.sources.JdbcSync.JdbcConfig(url = url,
            table = natTbl, driver = drv)),
        graft.sync.LakeToJdbc.GroupMember("customer", "c_custkey",
          graft.sources.JdbcSync.JdbcConfig(url = url,
            table = custTbl, driver = drv)))
      val t1 = graft.sync.LakeToJdbc.catchUpGroup(s, root, members)
      require(publishGroup(s, root,
        Seq("nation" -> nat, "customer" -> cust), 2,
        _.head(1).nonEmpty), "y52: v2 group publish refused")
      val t2 = graft.sync.LakeToJdbc.catchUpGroup(s, root, members)
      val t3 = graft.sync.LakeToJdbc.catchUpGroup(s, root, members)
      val t2m = t2.toMap
      val cT = graft.sources.JdbcSync.readTable(s, members(1).cfg, None)
      val nT = graft.sources.JdbcSync.readTable(s, members(0).cfg, None)
      cT.join(nT, col("C_NATIONKEY") === col("N_NATIONKEY"))
        .groupBy(col("N_NAME").as("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          Det.dsum(col("C_ACCTBAL")).as("sum_bal"))
        .withColumn("modes_observed",
          lit(t1.forall(_._2.mode == "reseed") &&
            t2.forall(_._2.mode == "incremental") &&
            t3.forall(_._2.mode == "noop")))
        .withColumn("fk_ops_real",
          lit(t2m("customer").nInsert > 0 && t2m("customer").nUpdate > 0 &&
            t2m("customer").nDelete > 0 && t2m("nation").nDelete > 0))
        .withColumn("sync_validated",
          lit((t1 ++ t2 ++ t3).forall(_._2.validated)))
    }),

    // Y51: SCHEMA-EVOLVING CATCH-UP — the y50 tick surviving the drift
    // every long-lived sync eventually hits: the lake gains a column
    // (y43 metadata-only evolution) and the next tick must carry the
    // WIDER world to the target before any row flows. Tick 1 reseeds
    // v1 (old schema); the lake then evolves (+o_note) and a cow batch
    // backfills notes on the %7 keys while restoring the banded
    // perturbation; tick 2 runs ONE CDF jump spanning the evolution —
    // reconcile ALTERs the target (audited: exactly one ADD), the
    // from-side's pre-evolution files read NULL for the new column, so
    // only genuinely-noted rows surface as U. Tick 3 noops. Output =
    // the target over JDBC, n_noted computed FROM THE TARGET's new
    // column — the oracle's %7 count only matches if the ALTER landed
    // and the backfill flowed through the MERGEs. Type-change refusal
    // and the drop path are law-tested in JdbcSyncSuite.
    "y51_evolving_catchup" -> ((s, d) => {
      val n = y48Runs.incrementAndGet()
      val root = Sources.stage(s"y51_lake_$n")
      val fsp = new org.apache.hadoop.fs.Path(root)
      fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(fsp, true)
      // %3 slice — y48's timed-cost bound
      val proj = Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
        .select("o_orderkey", "o_custkey",
        "o_totalprice", "o_orderstatus")
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val span = b.getLong(1) - lo
      val band = col("o_orderkey")
        .between(lo + 2 * (span / 10), lo + 4 * (span / 10))
      val ghosts = proj.filter(col("o_orderkey") % 17 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
        .withColumn("o_orderstatus", lit("X"))
      val v1 = proj.filter(!(band && col("o_orderkey") % 11 === 0))
        .withColumn("o_totalprice",
          when(band && col("o_orderkey") % 5 === 0,
            col("o_totalprice") + 500.0).otherwise(col("o_totalprice")))
        .unionByName(ghosts)
      publish(s, v1.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty)
      writeFileStats(s, s"$root/v1", "o_orderkey")
      val cfg = graft.sources.JdbcSync.JdbcConfig(
        url = Sources.sharedDerbyUrl, table = s"Y51_EVOLVE_$n",
        driver = "org.apache.derby.jdbc.EmbeddedDriver")
      graft.sources.JdbcSync.writeTable(
        proj.limit(0).select(proj.columns.toSeq
          .map(c => col(c).as(c.toUpperCase)): _*),
        cfg, org.apache.spark.sql.SaveMode.Overwrite)
      // index after the bulk reseed tick (y48's idiom)
      val t1 = graft.sync.LakeToJdbc.catchUp(s, root, "o_orderkey", cfg)
      graft.sources.JdbcSync.ensureKeyIndex(cfg, Seq("O_ORDERKEY"))
      require(evolveSchema(s, root, 1, 2, Seq(
        org.apache.spark.sql.types.StructField("o_note",
          org.apache.spark.sql.types.StringType, nullable = true))),
        "y51: evolution publish refused")
      // every batch row carries the evolved width; note = 'touched'
      // exactly on %7 keys so the target's final note population is
      // expressible in the oracle without replaying the band bounds
      val noteFor = when(col("o_orderkey") % 7 === 0, lit("touched"))
        .otherwise(lit(null).cast("string"))
      val batch = proj.filter(band && col("o_orderkey") % 11 === 0)
        .withColumn("o_note", noteFor).withColumn("op", lit("I"))
        .unionByName(proj.filter(band && col("o_orderkey") % 5 === 0 &&
            col("o_orderkey") % 11 =!= 0)
          .withColumn("o_note", noteFor).withColumn("op", lit("U")))
        .unionByName(proj.filter(col("o_orderkey") % 7 === 0 &&
            !(band && (col("o_orderkey") % 5 === 0 ||
              col("o_orderkey") % 11 === 0)))
          .withColumn("o_note", lit("touched")).withColumn("op", lit("U")))
        .unionByName(ghosts
          .withColumn("o_note", lit(null).cast("string"))
          .withColumn("op", lit("D")))
        .withColumn("version", lit(2L))
      require(cowApplyChanges(s, root, 2, 3, "o_orderkey", batch)
        .published, "y51: cow publish refused")
      val t2 = graft.sync.LakeToJdbc.catchUp(s, root, "o_orderkey", cfg)
      val t3 = graft.sync.LakeToJdbc.catchUp(s, root, "o_orderkey", cfg)
      graft.sources.JdbcSync.readTable(s, cfg, None)
        .groupBy(col("O_ORDERSTATUS").as("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("O_TOTALPRICE")).as("sum_price"),
          count(col("O_NOTE")).as("n_noted"))
        .withColumn("modes_observed",
          lit(t1.mode == "reseed" && t2.mode == "incremental" &&
            t3.mode == "noop"))
        .withColumn("schema_migrated",
          lit(t1.nAddCols == 0 && t2.nAddCols == 1 && t3.nAddCols == 0 &&
            t1.nDropCols + t2.nDropCols + t3.nDropCols == 0))
        // the %7 backfill touches every file's span — a whole-table
        // backfill has nothing to prune (y50 pins the pruned case) —
        // so the file audit here pins the SINGLE jump across both the
        // evolution and the cow, not a prune
        .withColumn("cdf_spans_evolution",
          lit(t2.fromVersion == 1 && t2.toVersion == 3))
        .withColumn("sync_validated",
          lit(t1.validated && t2.validated && t3.validated))
    }),

    // Y50: SCHEDULED CATCH-UP SYNC — the reference's operating mode:
    // "sync whatever is new since the last run", with the watermark
    // row living IN THE TARGET database (no driver-side state; any
    // scheduler slot runs the next tick). Three ticks exercise every
    // mode: tick 1 finds no watermark → reseed (bulk load of the live
    // version); after a CDC cow publish, tick 2 → ONE incremental CDF
    // jump (intermediate versions would net out — a job that slept
    // through ten publishes pays one churn-sized step); tick 3 → noop.
    // Output = the target read back over JDBC (≡ the plain projection
    // the CDC batch restored); the mode sequence, prune, validation
    // and op-mix laws ride as audited booleans. Crash-window and
    // retention-loss convergence are law-tested in JdbcSyncSuite.
    "y50_catchup_sync" -> ((s, d) => {
      val n = y48Runs.incrementAndGet()
      val root = Sources.stage(s"y50_lake_$n")
      val fsp = new org.apache.hadoop.fs.Path(root)
      fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(fsp, true)
      // %3 slice — y48's timed-cost bound
      val proj = Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
        .select("o_orderkey", "o_custkey",
        "o_totalprice", "o_orderstatus")
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val span = b.getLong(1) - lo
      val band = col("o_orderkey")
        .between(lo + 2 * (span / 10), lo + 4 * (span / 10))
      val ghosts = proj.filter(col("o_orderkey") % 17 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
        .withColumn("o_orderstatus", lit("X"))
      val v1 = proj.filter(!(band && col("o_orderkey") % 11 === 0))
        .withColumn("o_totalprice",
          when(band && col("o_orderkey") % 5 === 0,
            col("o_totalprice") + 500.0).otherwise(col("o_totalprice")))
        .unionByName(ghosts)
      publish(s, v1.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty)
      writeFileStats(s, s"$root/v1", "o_orderkey")
      val cfg = graft.sources.JdbcSync.JdbcConfig(
        url = Sources.sharedDerbyUrl, table = s"Y50_CATCH_$n",
        driver = "org.apache.derby.jdbc.EmbeddedDriver")
      graft.sources.JdbcSync.writeTable(
        proj.limit(0).select(proj.columns.toSeq
          .map(c => col(c).as(c.toUpperCase)): _*),
        cfg, org.apache.spark.sql.SaveMode.Overwrite)
      // tick 1 is a bulk reseed (no MERGE probes): index AFTER it,
      // once, before the MERGE-driven incremental tick — y48's idiom
      val t1 = graft.sync.LakeToJdbc.catchUp(s, root, "o_orderkey", cfg)
      graft.sources.JdbcSync.ensureKeyIndex(cfg, Seq("O_ORDERKEY"))
      val batch = proj.filter(band && col("o_orderkey") % 11 === 0)
        .withColumn("op", lit("I"))
        .unionByName(proj.filter(band && col("o_orderkey") % 5 === 0 &&
          col("o_orderkey") % 11 =!= 0).withColumn("op", lit("U")))
        .unionByName(ghosts.withColumn("op", lit("D")))
        .withColumn("version", lit(1L))
      require(cowApplyChanges(s, root, 1, 2, "o_orderkey", batch)
        .published, "y50: cow publish refused")
      val t2 = graft.sync.LakeToJdbc.catchUp(s, root, "o_orderkey", cfg)
      val t3 = graft.sync.LakeToJdbc.catchUp(s, root, "o_orderkey", cfg)
      graft.sources.JdbcSync.readTable(s, cfg, None)
        .groupBy(col("O_ORDERSTATUS").as("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("O_TOTALPRICE")).as("sum_price"))
        .withColumn("modes_observed",
          lit(t1.mode == "reseed" && t2.mode == "incremental" &&
            t3.mode == "noop"))
        .withColumn("cdf_pruned",
          lit(t2.scannedFiles < t2.totalFiles))
        .withColumn("sync_validated",
          lit(t1.validated && t2.validated && t3.validated))
        .withColumn("ops_mix_real",
          lit(t2.nInsert > 0 && t2.nUpdate > 0 && t2.nDelete > 0))
    }),

    // Y49: PARTITIONED PUBLISHED TABLE — see [[PartLake]]. v1 is
    // status-partitioned ('O'/'F'/'P' + a ghost partition 'X') with a
    // banded perturbation confined to TWO partitions; one CDC batch
    // (U: restore 'F'-band prices; I: the missing 'O'-band %11 rows;
    // D: the entire 'X' partition) copy-on-writes to v2 ≡ the plain
    // projection. Audited in-query: the rewrite pruned by PARTITION
    // first (partition 'P' carries byte-verbatim even though its key
    // span overlaps every change — `partition_pruned`), by span second
    // (`file_pruned`), and the partitioned CDF scans only churned
    // files (`cdf_pruned`). The oracle recomputes the post-state
    // rollup from the base table.
    "y49_partitioned_lake" -> ((s, d) => {
      val root = Sources.stage("y49_plake")
      val fsp = new org.apache.hadoop.fs.Path(root)
      val fs = fsp.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(fsp, true)
      // %3 slice — y48's timed-cost bound; the partition/file/CDF
      // prune laws are structural, not volume-dependent
      val proj = Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
        .select("o_orderkey", "o_custkey",
        "o_totalprice", "o_orderstatus")
      val b = proj.agg(min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi")).collect()(0)
      val lo = b.getLong(0); val span = b.getLong(1) - lo
      val band = col("o_orderkey")
        .between(lo + 2 * (span / 10), lo + 4 * (span / 10))
      val ghosts = proj.filter(col("o_orderkey") % 17 === 0)
        .withColumn("o_orderstatus", lit("X"))
      val v1 = proj.filter(!(band && col("o_orderstatus") === "O" &&
          col("o_orderkey") % 11 === 0))
        .withColumn("o_totalprice",
          when(band && col("o_orderstatus") === "F" &&
            col("o_orderkey") % 5 === 0,
            col("o_totalprice") + 500.0).otherwise(col("o_totalprice")))
        .unionByName(ghosts)
      require(PartLake.publishPartitioned(s,
        v1.repartitionByRange(8, col("o_orderstatus"), col("o_orderkey"))
          .sortWithinPartitions("o_orderstatus", "o_orderkey"),
        root, 1, "o_orderstatus", _.head(1).nonEmpty),
        "y49: partitioned publish refused")
      PartLake.writeFileStats(s, s"$root/v1", "o_orderkey",
        "o_orderstatus")
      val batch = proj.filter(band && col("o_orderstatus") === "O" &&
          col("o_orderkey") % 11 === 0).withColumn("op", lit("I"))
        .unionByName(proj.filter(band && col("o_orderstatus") === "F" &&
          col("o_orderkey") % 5 === 0).withColumn("op", lit("U")))
        .unionByName(ghosts.withColumn("op", lit("D")))
        .withColumn("version", lit(1L))
      val rep = PartLake.cowApplyChanges(s, root, 1, 2, "o_orderkey",
        "o_orderstatus", batch)
      require(rep.published, s"y49: cow publish refused: $rep")
      val (cdf, scanned, total) = PartLake.lakeChanges(s, root, 1, 2,
        "o_orderkey", "o_orderstatus")
      val opMix = cdf.groupBy("op").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val (_, cur) = readPublished(s, root)
      cur.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("o_totalprice")).as("sum_price"))
        .withColumn("partition_pruned",
          lit(rep.nPartsTouched < rep.nPartsTotal))
        .withColumn("file_pruned",
          lit(rep.nFilesRewritten < rep.nFilesTotal))
        .withColumn("cdf_pruned", lit(scanned < total))
        .withColumn("cdf_mix_real", lit(
          opMix.getOrElse("I", 0L) > 0 && opMix.getOrElse("U", 0L) > 0 &&
            opMix.getOrElse("D", 0L) > 0))
    }),

    // Y37: PUBLISH RETENTION GC — y36's swap leaves every version dir
    // behind by design (immutability is what makes rollback free), so a
    // steady-state publisher needs the companion collector: keep the
    // live version + a bounded rollback window, reap older dirs and
    // orphaned stagings ([[gcPublished]]). Safety comes from what GC
    // NEVER touches: the pointer, the current dir, the window — a
    // reader mid-query keeps its files; rollback within the window
    // stays possible and outside it fails loudly (repoint's require).
    // Lifecycle here: v1 → v2 → v3 published, GC(keepPrevious=1) reaps
    // exactly v1; the output aggregates the live v3 and carries the
    // reaped list + the rollback target's row count, all oracle-derivable.
    "y37_publish_gc" -> ((s, d) => {
      val root = Sources.stage("y37_pub")
      val fsp = new org.apache.hadoop.fs.Path(root)
      fsp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(fsp, true)
      publish(s, Tables.orders(s, d), root, 1, _.head(1).nonEmpty)
      publish(s, sourceView(s, d), root, 2, _.head(1).nonEmpty)
      publish(s, Tables.orders(s, d).filter(col("o_orderkey") % 2 === 0),
        root, 3, _.head(1).nonEmpty)
      val deleted = gcPublished(s, root, keepPrevious = 1).deleted
      val (v, cur) = readPublished(s, root)
      val rollbackRows = s.read.parquet(s"$root/v2").count()
      cur.agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("o_totalprice")).as("sum_price"))
        .withColumn("current_version", lit(v))
        .withColumn("n_deleted", lit(deleted.size.toLong))
        .withColumn("deleted_dirs", lit(deleted.mkString(",")))
        .withColumn("rollback_rows", lit(rollbackRows))
    }),

    // Y35: INCREMENTAL TOP-K maintenance — y9 maintains SUM/COUNT from
    // deltas because those are self-maintainable; ORDER BY state is
    // NOT: a delete of a top-k member needs the k+1th row, which pure
    // k-row state discarded (the classic incremental-view-maintenance
    // gap). The production fix is a BUFFER: state keeps top-2k per
    // group, a refresh replays only (state survivors ∪ delta upserts) —
    // never the fact table — and the result is PROVABLY the true top-k
    // whenever removals from state ≤ k (survivors then still contain
    // the true top-k among untouched rows); a group that burns more
    // than its k-row surplus raises needs_rescan instead of silently
    // serving wrong ranks. Survivorship is judged by generic value
    // compare (key present AND sort value unchanged), not by knowledge
    // of the mutation; upserts are the standard I/U delta (new key or
    // changed value). The maintained result is deterministic either
    // way, so the oracle replays the identical CTE chain; the
    // maintained ≡ full-recompute law (for unflagged groups) lives in
    // OperatorSuite.
    "y35_incremental_topk" -> ((s, d) => {
      val k = 3
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val state = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2 * k).drop("rn")
      val src = sourceView(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          col("o_totalprice"))
      val survivors = state.join(
        src.select(col("o_orderkey"), col("o_totalprice").as("src_price")),
        Seq("o_orderkey"))
        .filter(col("o_totalprice") === col("src_price")).drop("src_price")
      val upserts = src.join(
        Tables.orders(s, d).select(col("o_orderkey"),
          col("o_totalprice").as("old_price")),
        Seq("o_orderkey"), "left")
        .filter(col("old_price").isNull ||
          col("old_price") =!= col("o_totalprice")).drop("old_price")
      val removed = state.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_state"))
        .join(survivors.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_surv")), Seq("o_orderpriority"), "left")
        .select(col("o_orderpriority"),
          (col("n_state") - coalesce(col("n_surv"), lit(0L)))
            .as("n_removed"))
      survivors.unionByName(upserts)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .join(removed, Seq("o_orderpriority"))
        .select(col("o_orderpriority"), col("rank"), col("o_orderkey"),
          col("o_totalprice"), col("n_removed"),
          (col("n_removed") > k).as("needs_rescan"))
    }),

    "y8_incremental_apply" -> ((s, d) => {
      val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
      // One full-data shuffle: latest row per (user, side) where side
      // says baseline (ts ≤ cutoff) vs change (ts > cutoff); then change
      // overrides baseline via a second, ≤2-rows-per-user window — instead
      // of two full window passes plus an anti-join over the same scan.
      val w1 = Window.partitionBy("user_id", "is_new")
        .orderBy(col("ts").desc, col("event_id").desc)
      val w2 = Window.partitionBy("user_id").orderBy(col("is_new").desc)
      Tables.events(s, d)
        .withColumn("is_new", col("ts") > cutoff)
        .withColumn("rn", row_number().over(w1)).filter(col("rn") === 1)
        .withColumn("pick", row_number().over(w2)).filter(col("pick") === 1)
        .select(col("user_id"), col("event_type").as("last_type"),
                col("value").as("last_value"), col("ts").as("last_ts"))
    }),

    // Y7: SCD2 — change rows become effective-dated versions per key:
    // valid_from = ts, valid_to = next change's ts, open row = current.
    "y7_scd2" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .filter(col("event_type").isin("signup", "purchase", "error"))
        .select(col("user_id"), col("event_id"), col("event_type"),
                col("ts").as("valid_from"),
                lead(col("ts"), 1).over(w).as("valid_to"),
                lead(col("ts"), 1).over(w).isNull.as("is_current"))
    }),

    // Y34: SCD2 history RETENTION VACUUM — the GC every deployed SCD2
    // table eventually needs (history grows without bound; y7 only ever
    // opens/closes versions). The correctness subtlety the naive
    // "delete rows older than the horizon" misses: a version whose
    // validity interval CROSSES the horizon must survive even though it
    // STARTED before it, or as-of queries at the horizon itself lose
    // their answer — so the keep predicate is interval-intersects-
    // [horizon, ∞): valid_to IS NULL OR valid_to >= horizon. The output
    // is self-evidencing: per user it carries the as-of-horizon state
    // computed from BOTH the full and the vacuumed history plus their
    // null-safe equality, so the oracle hash itself certifies the law
    // (asof_stable must read true on every row); purge arithmetic and
    // the unchanged current version ride along. One (user) window
    // exchange builds the history; the vacuum is a filter; summaries
    // are hash-aggs — at 100 TB the vacuum is a partition-pruned
    // rewrite of only the files whose max(valid_to) predates the
    // horizon, never a full-history shuffle.
    "y34_scd2_vacuum" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val horizon = lit("2024-01-20 00:00:00").cast("timestamp")
      val hist = Tables.events(s, d)
        .filter(col("event_type").isin("signup", "purchase", "error"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("ts").as("valid_from"),
          lead(col("ts"), 1).over(w).as("valid_to"))
      val kept = hist.filter(col("valid_to").isNull ||
        col("valid_to") >= horizon)
      // as-of semantics: half-open [valid_from, valid_to)
      def asof(h: DataFrame, out: String) = h
        .filter(col("valid_from") <= horizon &&
          (col("valid_to").isNull || col("valid_to") > horizon))
        .select(col("user_id"), col("event_type").as(out))
      hist.groupBy("user_id")
        .agg(count(lit(1)).as("n_before"),
          max(when(col("valid_to").isNull, col("event_type")))
            .as("current_type"))
        .join(kept.groupBy("user_id")
          .agg(count(lit(1)).as("n_after"),
            min(col("valid_from")).as("oldest_retained_from")),
          Seq("user_id"))
        .join(asof(hist, "asof_before"), Seq("user_id"), "left")
        .join(asof(kept, "asof_after"), Seq("user_id"), "left")
        .select(col("user_id"), col("n_before"), col("n_after"),
          (col("n_before") - col("n_after")).as("n_purged"),
          col("current_type"), col("oldest_retained_from"),
          col("asof_before"), col("asof_after"),
          col("asof_before") <=> col("asof_after") as "asof_stable")
    }),

    // Y12: per-partition digest compare — the incremental-sync planner
    // at 100 TB: instead of a full-table diff, each side rolls up ONE
    // (count, order-insensitive digest) row per partition (order_year
    // here; date partitions in prod), the ≤|partitions| summaries join
    // full-outer, and only DIRTY partitions are re-synced with the Y3
    // lifecycle. Per-row work is a hash + a two-phase agg keyed on the
    // partition — the fact table is scanned once per side and the
    // exchange carries |partitions| rows. The digest is the y6 idiom:
    // sum of a 15-hex-digit slice of the row md5 mod 1e9 — insensitive
    // to row order, sensitive to any row change, identical both engines.
    // UNLIKE y3/y6 (which join ON the PK and may hash only the compared
    // columns), this digest stands ALONE, so the PK must be inside it:
    // a row re-keyed within its partition (delete k, insert the same
    // payload as k') keeps count and payload-hash unchanged and would
    // otherwise report the partition clean.
    "y12_partition_digest" -> ((s, d) => {
      partitionSide(sourceView(s, d), "src_rows", "src_digest")
        .join(partitionSide(Tables.orders(s, d), "tgt_rows", "tgt_digest"),
          Seq("order_year"), "full_outer")
        .select(col("order_year"),
          coalesce(col("src_rows"), lit(0L)).as("src_rows"),
          coalesce(col("tgt_rows"), lit(0L)).as("tgt_rows"),
          (coalesce(col("src_rows"), lit(0L)) === coalesce(col("tgt_rows"), lit(0L)) &&
            coalesce(col("src_digest"), lit(-1L)) === coalesce(col("tgt_digest"), lit(-1L)))
            .as("clean"))
        .orderBy("order_year")
    }),

    // Y12b: the FULL-WIDTH digest — y12's production form. The mod-1e9
    // sum y12/y16/y20 share is the oracle idiom both engines spell
    // identically inside BIGINT range, with a documented weakness
    // (ADVICE r8): a compensating insert+delete pair whose 60-bit
    // hashes collide mod 1e9 reads clean. Here the SAME keyed hash
    // sums at full width as DECIMAL(38,0) — a false-clean now needs
    // the full 60-bit contributions to cancel (~2^-60, not ~2^-30) —
    // and the digest leaves as STRING at the boundary, because decimal
    // RENDERING is the one thing the engines' hashed surfaces could
    // disagree on, while scale-0 digit strings are identical. Month
    // grain (the y20 drill-down level, where a collision at either
    // level suppresses a rescan). Same one-scan two-phase hash-agg
    // plan as y12: full width costs nothing at any scale.
    "y12b_full_width_digest" -> ((s, d) => {
      val keyedHash = md5(concat_ws("|",
        col("o_orderkey"), rowHash(c => col(c))))
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("order_year"),
                 month(col("o_orderdate")).as("order_month"))
        .agg(count(lit(1)).as("n_rows"),
          sum(conv(substring(keyedHash, 1, 15), 16, 10)
            .cast("decimal(38,0)")).cast("string").as("digest_full"))
        .orderBy("order_year", "order_month")
    }),

    // Y13: table profile — the per-column stats a sync planner collects
    // before a first sync (null fractions drive NOT NULL decisions, NDV
    // picks the partition column, numeric ranges seed the JDBC
    // range-partitioning bounds). ONE scan: a single wide aggregate
    // (Catalyst plans the multi-distinct via Expand) unpivoted to one
    // row per column with stack(). Numeric min/max only (int64 < 2^53
    // is double-exact); timestamp/string rendering differs between
    // engines and stays out of the hashed surface.
    "y13_table_profile" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def nn(c: String) = sum(col(c).isNull.cast("long")).as(s"nn_$c")
      def nd(c: String) = count_distinct(col(c)).as(s"nd_$c")
      val wide = o.agg(
        count(lit(1)).as("n_rows"),
        nn("o_orderkey"), nd("o_orderkey"),
        min(col("o_orderkey")).cast("double").as("mn_o_orderkey"),
        max(col("o_orderkey")).cast("double").as("mx_o_orderkey"),
        nn("o_custkey"), nd("o_custkey"),
        min(col("o_custkey")).cast("double").as("mn_o_custkey"),
        max(col("o_custkey")).cast("double").as("mx_o_custkey"),
        nn("o_orderstatus"), nd("o_orderstatus"),
        nn("o_totalprice"), nd("o_totalprice"),
        min(col("o_totalprice")).as("mn_o_totalprice"),
        max(col("o_totalprice")).as("mx_o_totalprice"),
        nn("o_orderdate"), nd("o_orderdate"),
        nn("o_orderpriority"), nd("o_orderpriority"))
      wide.selectExpr("n_rows", """stack(6,
        |'o_orderkey', nn_o_orderkey, nd_o_orderkey, mn_o_orderkey, mx_o_orderkey,
        |'o_custkey', nn_o_custkey, nd_o_custkey, mn_o_custkey, mx_o_custkey,
        |'o_orderstatus', nn_o_orderstatus, nd_o_orderstatus, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |'o_totalprice', nn_o_totalprice, nd_o_totalprice, mn_o_totalprice, mx_o_totalprice,
        |'o_orderdate', nn_o_orderdate, nd_o_orderdate, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
        |'o_orderpriority', nn_o_orderpriority, nd_o_orderpriority, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))
        |AS (col_name, n_nulls, ndv, min_num, max_num)""".stripMargin)
        .orderBy("col_name")
    }),

    // Y13b: APPROX table profile — the form a 100 TB sync planner
    // actually runs. y13's exact NDV stays as the small-table path; its
    // five count_distincts make Catalyst plan an Expand that multiplies
    // every row ~6× into the exchange and shuffles each column's full
    // distinct domain. Here the profile itself is ONE scan of mergeable
    // HLL++ sketches (approx_count_distinct, rsd 0.02): no Expand, no
    // distinct-domain shuffle, bounded sketch bytes per partition —
    // pinned Expand-free in PlanAuditSuite. Raw HLL estimates differ per
    // engine, so the scored surface is the a5 idiom: exact NDV plus a
    // tolerance verdict on this engine's own estimate (rsd 0.02 ⇒
    // |est/exact − 1| < 0.06 ≈ 3σ). The exacts are oracle scaffolding —
    // each one a SEPARATE single-distinct agg precisely so no Expand
    // appears anywhere in the pinned plan; at 100 TB you ship `prof`
    // alone and skip them.
    "y13b_table_profile_approx" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      // (no persist across the scaffolding aggs: measured 1.6→2.1 s at
      // sf0.1 — cache materialization costs more than the re-scans of a
      // footer-cached parquet table, and at 100 TB only `prof` ships)
      val profAggs = cols.flatMap(c => Seq(
        sum(col(c).isNull.cast("long")).as(s"nn_$c"),
        approx_count_distinct(col(c), 0.02).as(s"andv_$c")))
      val prof = o.agg(count(lit(1)).as("n_rows"), profAggs: _*)
      val exacts = cols
        .map(c => o.agg(count_distinct(col(c)).as(s"nd_$c")))
        .reduce(_.crossJoin(_))
      val stackRows = cols.map(c =>
        s"'$c', nn_$c, nd_$c, abs(CAST(andv_$c AS DOUBLE) / nd_$c - 1) < 0.06")
      prof.crossJoin(exacts)
        .selectExpr("n_rows",
          s"stack(${cols.size}, ${stackRows.mkString(", ")}) " +
            "AS (col_name, n_nulls, ndv, approx_ok)")
        .orderBy("col_name")
    }),

    // Y15: incremental JOIN-view maintenance (r7) — keep a materialized
    // join view V = orders ⋈ customer in sync while BOTH base tables
    // mutate, without recomputing the join: the classic Δ(A⋈B) delta rule
    // with updates as delete+insert.
    //   K_o = fact keys touched (y3-style full-outer hash diff: I/U/D),
    //   K_c = dimension keys touched;
    //   V' = (V − V[o_orderkey∈K_o] − V[o_custkey∈K_c, not already removed])
    //        ∪ O'[K_o] ⋈ C'
    //        ∪ O'[o_custkey∈K_c, o_orderkey∉K_o] ⋈ C'.
    // Scale: the standing view is only anti-joined against the two
    // change-key sets, and the re-derivation joins touch delta rows
    // only. No broadcast hints: change sets are fact-proportional at a
    // high change rate (this corpus's mutation touches ~28% of keys), so
    // forcing them to the driver is the same non-scalable shape l5i
    // dropped — Spark auto-broadcasts them when small, and otherwise the
    // anti-join shuffles on the key, which is the correct fallback. The
    // oracle is the full recompute over the mutated tables — y9's
    // incremental ≡ recompute law, for joins.
    "y15_incremental_join_view" -> ((s, d) => {
      val oldO = Tables.orders(s, d)
      val newO = sourceView(s, d)
      val oldC = Tables.customer(s, d)
      val newC = custView(s, d)
      def proj(df: DataFrame) = df.select(
        col("o_orderkey"), col("o_custkey"), col("c_mktsegment"),
        col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").cast("double")
          .as("o_totalprice"))
      val vOld = proj(oldO.join(oldC, col("o_custkey") === col("c_custkey")))
      val ko = newO.select(col("o_orderkey").as("k"), rowHash(c => col(c)).as("sh"))
        .join(oldO.select(col("o_orderkey").as("k"), rowHash(c => col(c)).as("th")),
              Seq("k"), "full_outer")
        .filter(col("sh").isNull || col("th").isNull || col("sh") =!= col("th"))
        .select(col("k"))
      val kc = newC.select(col("c_custkey").as("ck"), col("c_mktsegment").as("sm"))
        .join(oldC.select(col("c_custkey").as("ck"), col("c_mktsegment").as("tm")),
              Seq("ck"), "full_outer")
        .filter(col("sm").isNull || col("tm").isNull || col("sm") =!= col("tm"))
        .select(col("ck"))
      val addsO = proj(newO.join(ko, col("o_orderkey") === col("k"))
        .join(newC, col("o_custkey") === col("c_custkey")))
      val addsC = proj(newO
        .join(kc, col("o_custkey") === col("ck"))
        .join(ko, col("o_orderkey") === col("k"), "left_anti")
        .join(newC, col("o_custkey") === col("c_custkey")))
      vOld
        .join(ko, col("o_orderkey") === col("k"), "left_anti")
        .join(kc, col("o_custkey") === col("ck"), "left_anti")
        .unionByName(addsO)
        .unionByName(addsC)
    }),

    // Y14: partition-bounds planning — the query a JDBC range-partitioned
    // sync (S4's ReadPartitioning) runs FIRST: approximate quartiles of
    // the partition column pick split points that balance per-partition
    // row counts even when the key is skewed (min/max alone would split
    // a sparse key range into empty + overloaded partitions). The OP is
    // one scan of a mergeable quantile sketch (percentile_approx,
    // rank-error ≤ 1/10000) + min/max/count — bounded state per
    // partition, no sort, no Expand. Raw sketch outputs differ per
    // engine, so the scored surface is the a5/y13b idiom: exact
    // interpolated percentiles (oracle scaffolding, a SEPARATE agg —
    // exact percentile buffers every value, the thing the sketch
    // exists to avoid at 100 TB) plus a tolerance verdict of the
    // engine's own sketch against them (bound: 2% of the key range).
    "y14_partition_bounds" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val prof = o.agg(
        count(lit(1)).as("n_rows"),
        min(col("o_orderkey")).as("lo"),
        max(col("o_orderkey")).as("hi"),
        percentile_approx(col("o_orderkey"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("ab"))
      val exact = o.agg(
        expr("percentile(o_orderkey, array(0.25D, 0.5D, 0.75D))").as("eb"))
      def ok(i: Int, as: String) =
        ((abs(col("ab").getItem(i).cast("double") - col("eb").getItem(i)) /
          (col("hi") - col("lo")).cast("double")) < 0.02).as(as)
      prof.crossJoin(exact).select(
        col("n_rows"), col("lo"), col("hi"),
        col("eb").getItem(0).as("q25"),
        col("eb").getItem(1).as("q50"),
        col("eb").getItem(2).as("q75"),
        ok(0, "b25_ok"), ok(1, "b50_ok"), ok(2, "b75_ok"))
    }),

    // Y16: dirty-partition selective sync (r7) — the y12 planner
    // EXECUTED: plan dirty partitions from the per-partition
    // (count, keyed-digest) compare, copy ONLY those partitions from the
    // source (clean target partitions untouched), then re-validate per
    // partition. Output: (order_year, dirty, n_copied, clean_after) with
    // clean_after uniformly true — which the oracle recomputes
    // value-by-value from the mutated CTEs. Scale: one fact scan per
    // side for the plan, a partition-pruned copy of only the dirty
    // slices (the dirty-year set broadcasts), and the post-state digest
    // from the same single-pass rollup — never a full-table diff. A
    // partition that vanished from the source (src_rows 0) validates
    // clean-after-deletion via the −1 digest sentinel on both sides.
    "y16_dirty_partition_sync" -> ((s, d) =>
      dirtyPartitionSync(sourceView(s, d), Tables.orders(s, d))),

    // Y17: multi-table FK-CONSISTENT sync (r8) — y16 generalized to a
    // parent+child pair (orders + lineitem). A real table-sync utility
    // never ships a parent partition without its children: the child's
    // dirty set is the union of its own digest-dirty years and the
    // parent's dirty years, both sides copy together, and the post-sync
    // audit proves (a) both tables digest-clean per year and (b) zero
    // orphaned child rows. The oracle recomputes every cell from the
    // mutated CTEs — the y16 idiom across two tables.
    "y17_fk_consistent_sync" -> ((s, d) =>
      fkConsistentSync(sourceView(s, d), Tables.orders(s, d),
        lineSourceView(s, d),
        // both child sides must share the digest schema (PK + payload)
        Tables.lineitem(s, d).select("l_orderkey", "l_linenumber",
          "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag"))),

    // Y17b: the multi-child FK graph — orders → {lineitem, returns
    // feed} via [[fkConsistentSyncMulti]]. The returns child churns on
    // its own key set (%17 refund bumps) invisible to lineitem, so the
    // long-format report shows the children going dirty independently
    // while both follow the parent's dirt through the FK rule.
    "y17b_fk_multi_child" -> ((s, d) =>
      fkConsistentSyncMulti(sourceView(s, d), Tables.orders(s, d), Seq(
        FkChild("lineitem", lineSourceView(s, d),
          Tables.lineitem(s, d).select("l_orderkey", "l_linenumber",
            "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag"),
          "l_orderkey", lineHashCols),
        FkChild("returns", returnsSourceView(s, d), returnsTargetView(s, d),
          "l_orderkey", Seq(col("l_orderkey"), col("l_linenumber"),
            col("r_refund").cast("decimal(18,2)").cast("string")))))),

    // Y11: PK-uniqueness audit — the precondition every diff/upsert in
    // this library rests on (SyncConfig's contract: keys UNIQUE per
    // side; violated keys multiply rows through the full-outer diff and
    // silently corrupt counts). Run BEFORE a first sync on a candidate
    // key: here l_orderkey on lineitem, a deliberate NON-key, so the
    // audit is observed reporting real violations. One two-phase
    // hash-agg over the keys — no join, scales like any rollup.
    "y11_pk_audit" -> ((s, d) => {
      val mult = Tables.lineitem(s, d)
        .groupBy("l_orderkey").agg(count(lit(1)).as("mult"))
      mult.agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("mult") > 1, 1).otherwise(0)).cast("long").as("n_dup_keys"),
        max(col("mult")).as("max_mult"),
        min(when(col("mult") > 1, col("l_orderkey"))).as("min_dup_key"),
        sum(when(col("mult") > 1, col("mult")).otherwise(0)).cast("long")
          .as("n_rows_in_dups"),
        sum(when(col("l_orderkey").isNull, lit(1)).otherwise(0)).cast("long")
          .as("n_null_keys"),
        (sum(when(col("mult") > 1, 1).otherwise(0)) === 0 &&
          sum(when(col("l_orderkey").isNull, lit(1)).otherwise(0)) === 0)
          .as("pk_valid"))
    }),

    // Y18: CDC changelog COMPACTION (r8) — replaying a long change feed
    // row-by-row is the slow path; a sync utility first collapses each
    // key's op-sequence to its net effect and applies ONE change per
    // key. Classification needs only the FIRST and LAST op per key:
    // I···D annihilates (the key was born and died inside the window —
    // a consistent base never saw it, so there is nothing to apply);
    // first=I → net I with the latest payload; last=D → net D;
    // anything else → net U. That is one two-phase min_by/max_by
    // hash-agg — no window, no sort, no join — and the output is
    // bounded by |keys|, not |changes|: at 100 TB of changelog this is
    // the same partial/final rollup shape as any aggregate, and the
    // compacted set is what the (expensive) MERGE actually ships. LAW
    // in OperatorSuite: applying the compacted log to a consistent base
    // ≡ applying the full log.
    "y18_changelog_compact" -> ((s, d) =>
      changeLog(s, d).groupBy("pk").agg(
          min_by(col("op"), col("version")).as("first_op"),
          max_by(col("op"), col("version")).as("last_op"),
          max_by(col("payload_type"), col("version")).as("last_type"),
          max_by(col("payload_value"), col("version")).as("last_value"),
          max(col("version")).as("last_version"),
          count(lit(1)).as("n_ops"))
        .filter(!(col("first_op") === "I" && col("last_op") === "D"))
        .select(col("pk"),
          when(col("first_op") === "I", "I")
            .when(col("last_op") === "D", "D")
            .otherwise("U").as("net_op"),
          col("last_type"), col("last_value"), col("last_version"),
          col("n_ops"))),

    // Y19: changelog hygiene AUDIT (r8) — the checks a CDC consumer
    // runs BEFORE trusting a feed: (a) updates arriving after a delete
    // with no re-insert (applying them would resurrect a tombstone),
    // (b) event time running backwards against the version order
    // (clock skew / replay — ordering by version and by time disagree),
    // and (c) keys with multiple changes inside one batch-date slot —
    // when a feed's effective version is a batch date (a daily extract),
    // latest-wins inside the slot is ambiguous and y4/y18 need the
    // fine-grained tie-break. One lag-window pass ordered by version +
    // one (pk, day) rollup, both equi-shuffles on pk; global rollups of
    // each are single rows, so the final crossJoin is trivial.
    "y19_changelog_audit" -> ((s, d) => {
      val log = changeLog(s, d)
      val w = Window.partitionBy("pk").orderBy("version")
      val seqAgg = log
        .withColumn("prev_op", lag(col("op"), 1).over(w))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .agg(
          countDistinct(col("pk")).as("n_keys"),
          sum(when(col("prev_op") === "D" && col("op") === "U", 1)
            .otherwise(0)).cast("long").as("n_upd_after_del"),
          sum(when(col("prev_ts") > col("ts"), 1).otherwise(0)).cast("long")
            .as("n_ts_inversions"))
      val dupAgg = log
        .groupBy(col("pk"), date_trunc("DAY", col("ts")).as("day"))
        .agg(count(lit(1)).as("mult"))
        .agg(
          sum(when(col("mult") > 1, 1).otherwise(0)).cast("long")
            .as("n_dup_day_slots"),
          countDistinct(when(col("mult") > 1, col("pk")))
            .as("n_dup_day_keys"))
      seqAgg.crossJoin(dupAgg)
    }),

    // Y20: hierarchical digest NARROWING (r8) — year-level Merkle compare
    // drills into month grain for dirty years only; see
    // [[hierarchicalDigestNarrow]]. Driven by the localized
    // monthDriftView churn (March updates, November deletes) so the
    // output demonstrates real narrowing: every year is level-1 dirty,
    // but only 2 of its 12 months ship.
    "y20_hierarchical_narrow" -> ((s, d) =>
      hierarchicalDigestNarrow(monthDriftView(s, d), Tables.orders(s, d)))
  )

  /** Events recast as a CDC changelog (pk, op, version, payload):
    * signup → I, error → D (tombstone), everything else → U; version =
    * event_id (unique and arrival-ordered, so latest-wins is
    * deterministic). Kept in lockstep with [[logCte]]. */
  def changeLog(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("user_id").as("pk"),
      when(col("event_type") === "signup", "I")
        .when(col("event_type") === "error", "D")
        .otherwise("U").as("op"),
      col("event_id").as("version"),
      col("event_type").as("payload_type"),
      col("value").as("payload_value"),
      col("ts"))

  /** Same changelog recast as a DuckDB CTE (lockstep with [[changeLog]]). */
  private val logCte =
    """lg AS (
      |  SELECT user_id AS pk,
      |    CASE WHEN event_type = 'signup' THEN 'I'
      |         WHEN event_type = 'error' THEN 'D'
      |         ELSE 'U' END AS op,
      |    event_id AS version, event_type AS payload_type,
      |    value AS payload_value, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events)""".stripMargin

  private val evCte =
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)"

  /** Shared y23/y23b classification CTEs: tagged union → per-key side
    * hashes → changed-vs-base flags (lockstep with [[threeWayDiff]]). */
  private lazy val threeWayClassifyCte: String =
    s"""u AS (
       |  SELECT o_orderkey, 'base' AS side, ${rowHashSql("orders")} AS h FROM orders
       |  UNION ALL
       |  SELECT o_orderkey, 'a', ${rowHashSql("src")} FROM src
       |  UNION ALL
       |  SELECT o_orderkey, 'b', ${rowHashSql("bsrc")} FROM bsrc),
       |g AS (
       |  SELECT o_orderkey,
       |    MAX(CASE WHEN side = 'base' THEN h END) AS base_h,
       |    MAX(CASE WHEN side = 'a' THEN h END) AS a_h,
       |    MAX(CASE WHEN side = 'b' THEN h END) AS b_h
       |  FROM u GROUP BY 1),
       |c AS (
       |  SELECT o_orderkey, base_h, a_h, b_h,
       |    (a_h IS DISTINCT FROM base_h) AS ach,
       |    (b_h IS DISTINCT FROM base_h) AS bch
       |  FROM g)""".stripMargin

  val oracle: Map[String, String] = Map(
    // Y1's oracle is the EXPECTED schema as literals — introspection is
    // checked against the pinned contract, not against itself.
    "y1_schema_introspect" ->
      """SELECT * FROM (VALUES
        |  ('o_orderkey', 'bigint', true), ('o_custkey', 'bigint', true),
        |  ('o_orderstatus', 'string', true), ('o_totalprice', 'double', true),
        |  ('o_orderdate', 'timestamp', true), ('o_orderpriority', 'string', true)
        |) t(col_name, data_type, nullable)""".stripMargin,

    "y2_snapshot_copy" -> "SELECT * FROM nation",

    "y11_pk_audit" ->
      """WITH m AS (
        |  SELECT l_orderkey, COUNT(*) AS mult FROM lineitem GROUP BY l_orderkey)
        |SELECT COUNT(*) AS n_keys,
        |  CAST(SUM(CASE WHEN mult > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
        |  MAX(mult) AS max_mult,
        |  MIN(CASE WHEN mult > 1 THEN l_orderkey END) AS min_dup_key,
        |  CAST(SUM(CASE WHEN mult > 1 THEN mult ELSE 0 END) AS BIGINT)
        |    AS n_rows_in_dups,
        |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_null_keys,
        |  (SUM(CASE WHEN mult > 1 THEN 1 ELSE 0 END) = 0 AND
        |   SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) = 0) AS pk_valid
        |FROM m""".stripMargin,

    // full recompute over the mutated source — the incremental path must
    // land on exactly this
    "y9_incremental_agg" ->
      s"""WITH $sourceCte
         |SELECT o_custkey,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_price,
         |  COUNT(*) AS n_orders
         |FROM src GROUP BY o_custkey""".stripMargin,

    "y3_snapshot_diff" ->
      s"""WITH $sourceCte,
         |t AS (SELECT o_orderkey AS t_key, ${rowHashSql("orders")} AS t_hash FROM orders),
         |s AS (SELECT o_orderkey AS s_key, ${rowHashSql("src")} AS s_hash FROM src)
         |SELECT COALESCE(s_key, t_key) AS o_orderkey,
         |  CASE WHEN t_key IS NULL THEN 'I'
         |       WHEN s_key IS NULL THEN 'D'
         |       WHEN s_hash <> t_hash THEN 'U'
         |       ELSE 'S' END AS op
         |FROM s FULL OUTER JOIN t ON s_key = t_key""".stripMargin,

    "y4_changelog_apply" ->
      s"""WITH $evCte
         |SELECT user_id, event_type AS last_type, value AS last_value, ts AS last_ts
         |FROM ev
         |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    "y5_upsert_merge" ->
      s"""WITH $sourceCte
         |SELECT o_orderkey, o_orderstatus,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
         |FROM (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM src
         |  UNION ALL
         |  SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice FROM orders o
         |  WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.o_orderkey = o.o_orderkey)
         |) t""".stripMargin,

    "y6_sync_validate" ->
      s"""WITH $sourceCte
         |SELECT 'target' AS side, COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  CAST(SUM(CAST(concat('0x', substr(${rowHashSql("orders")}, 1, 15)) AS BIGINT)
         |    % 1000000000) AS BIGINT) AS digest
         |FROM orders
         |UNION ALL
         |SELECT 'source' AS side, COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  CAST(SUM(CAST(concat('0x', substr(${rowHashSql("src")}, 1, 15)) AS BIGINT)
         |    % 1000000000) AS BIGINT) AS digest
         |FROM src""".stripMargin,

    "y13_table_profile" ->
      """WITH w AS (
        |  SELECT COUNT(*) AS n_rows,
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_k,
        |    COUNT(DISTINCT o_orderkey) AS nd_k,
        |    CAST(MIN(o_orderkey) AS DOUBLE) AS mn_k, CAST(MAX(o_orderkey) AS DOUBLE) AS mx_k,
        |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_c,
        |    COUNT(DISTINCT o_custkey) AS nd_c,
        |    CAST(MIN(o_custkey) AS DOUBLE) AS mn_c, CAST(MAX(o_custkey) AS DOUBLE) AS mx_c,
        |    CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_s,
        |    COUNT(DISTINCT o_orderstatus) AS nd_s,
        |    CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_p,
        |    COUNT(DISTINCT o_totalprice) AS nd_p,
        |    MIN(o_totalprice) AS mn_p, MAX(o_totalprice) AS mx_p,
        |    CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_d,
        |    COUNT(DISTINCT o_orderdate) AS nd_d,
        |    CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_o,
        |    COUNT(DISTINCT o_orderpriority) AS nd_o
        |  FROM orders)
        |SELECT n_rows, 'o_orderkey' AS col_name, nn_k AS n_nulls, nd_k AS ndv,
        |       mn_k AS min_num, mx_k AS max_num FROM w
        |UNION ALL SELECT n_rows, 'o_custkey', nn_c, nd_c, mn_c, mx_c FROM w
        |UNION ALL SELECT n_rows, 'o_orderstatus', nn_s, nd_s, NULL, NULL FROM w
        |UNION ALL SELECT n_rows, 'o_totalprice', nn_p, nd_p, mn_p, mx_p FROM w
        |UNION ALL SELECT n_rows, 'o_orderdate', nn_d, nd_d, NULL, NULL FROM w
        |UNION ALL SELECT n_rows, 'o_orderpriority', nn_o, nd_o, NULL, NULL FROM w
        |ORDER BY col_name""".stripMargin,

    "y13b_table_profile_approx" ->
      """WITH w AS (
        |  SELECT COUNT(*) AS n_rows,
        |    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_k,
        |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd_k,
        |    approx_count_distinct(o_orderkey) AS andv_k,
        |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_c,
        |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd_c,
        |    approx_count_distinct(o_custkey) AS andv_c,
        |    CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_s,
        |    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd_s,
        |    approx_count_distinct(o_orderstatus) AS andv_s,
        |    CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_p,
        |    CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS nd_p,
        |    approx_count_distinct(o_totalprice) AS andv_p,
        |    CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_d,
        |    CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS nd_d,
        |    approx_count_distinct(o_orderdate) AS andv_d,
        |    CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_o,
        |    CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nd_o,
        |    approx_count_distinct(o_orderpriority) AS andv_o
        |  FROM orders)
        |SELECT n_rows, 'o_orderkey' AS col_name, nn_k AS n_nulls, nd_k AS ndv,
        |       abs(CAST(andv_k AS DOUBLE) / nd_k - 1) < 0.06 AS approx_ok FROM w
        |UNION ALL SELECT n_rows, 'o_custkey', nn_c, nd_c,
        |       abs(CAST(andv_c AS DOUBLE) / nd_c - 1) < 0.06 FROM w
        |UNION ALL SELECT n_rows, 'o_orderstatus', nn_s, nd_s,
        |       abs(CAST(andv_s AS DOUBLE) / nd_s - 1) < 0.06 FROM w
        |UNION ALL SELECT n_rows, 'o_totalprice', nn_p, nd_p,
        |       abs(CAST(andv_p AS DOUBLE) / nd_p - 1) < 0.06 FROM w
        |UNION ALL SELECT n_rows, 'o_orderdate', nn_d, nd_d,
        |       abs(CAST(andv_d AS DOUBLE) / nd_d - 1) < 0.06 FROM w
        |UNION ALL SELECT n_rows, 'o_orderpriority', nn_o, nd_o,
        |       abs(CAST(andv_o AS DOUBLE) / nd_o - 1) < 0.06 FROM w
        |ORDER BY col_name""".stripMargin,

    "y16_dirty_partition_sync" ->
      s"""WITH $sourceCte,
         |ss AS (
         |  SELECT CAST(EXTRACT(year FROM src.o_orderdate) AS INTEGER) AS order_year,
         |    COUNT(*) AS src_rows,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      md5(concat_ws('|', src.o_orderkey, ${rowHashSql("src")})), 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS src_digest
         |  FROM src GROUP BY 1),
         |tt AS (
         |  SELECT CAST(EXTRACT(year FROM orders.o_orderdate) AS INTEGER) AS order_year,
         |    COUNT(*) AS tgt_rows,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      md5(concat_ws('|', orders.o_orderkey, ${rowHashSql("orders")})), 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS tgt_digest
         |  FROM orders GROUP BY 1),
         |pl AS (
         |  SELECT COALESCE(ss.order_year, tt.order_year) AS order_year,
         |    COALESCE(src_rows, 0) AS src_rows,
         |    NOT (COALESCE(src_rows, 0) = COALESCE(tgt_rows, 0) AND
         |         COALESCE(src_digest, -1) = COALESCE(tgt_digest, -1)) AS dirty,
         |    COALESCE(src_digest, -1) AS src_digest
         |  FROM ss FULL OUTER JOIN tt ON ss.order_year = tt.order_year),
         |u AS (
         |  SELECT * FROM orders
         |  WHERE CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) NOT IN
         |        (SELECT order_year FROM pl WHERE dirty)
         |  UNION ALL
         |  SELECT * FROM src
         |  WHERE CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) IN
         |        (SELECT order_year FROM pl WHERE dirty)),
         |af AS (
         |  SELECT CAST(EXTRACT(year FROM u.o_orderdate) AS INTEGER) AS order_year,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      md5(concat_ws('|', u.o_orderkey, ${rowHashSql("u")})), 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS after_digest
         |  FROM u GROUP BY 1)
         |SELECT pl.order_year, dirty,
         |  CASE WHEN dirty THEN src_rows ELSE 0 END AS n_copied,
         |  COALESCE(after_digest, -1) = src_digest AS clean_after
         |FROM pl LEFT JOIN af ON pl.order_year = af.order_year
         |ORDER BY pl.order_year""".stripMargin,

    "y17_fk_consistent_sync" ->
      s"""WITH $sourceCte, $lineSourceCte,
         |pps AS (
         |  SELECT CAST(EXTRACT(year FROM src.o_orderdate) AS INTEGER) AS order_year,
         |    COUNT(*) AS p_src_rows,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      md5(concat_ws('|', src.o_orderkey, ${rowHashSql("src")})), 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS p_src_digest
         |  FROM src GROUP BY 1),
         |ppt AS (
         |  SELECT CAST(EXTRACT(year FROM orders.o_orderdate) AS INTEGER) AS order_year,
         |    COUNT(*) AS p_tgt_rows,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      md5(concat_ws('|', orders.o_orderkey, ${rowHashSql("orders")})), 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS p_tgt_digest
         |  FROM orders GROUP BY 1),
         |ppl AS (
         |  SELECT COALESCE(pps.order_year, ppt.order_year) AS order_year,
         |    COALESCE(p_src_rows, 0) AS p_src_rows,
         |    NOT (COALESCE(p_src_rows, 0) = COALESCE(p_tgt_rows, 0) AND
         |         COALESCE(p_src_digest, -1) = COALESCE(p_tgt_digest, -1)) AS parent_dirty,
         |    COALESCE(p_src_digest, -1) AS p_src_digest
         |  FROM pps FULL OUTER JOIN ppt ON pps.order_year = ppt.order_year),
         |ccs AS (
         |  SELECT CAST(EXTRACT(year FROM src.o_orderdate) AS INTEGER) AS order_year,
         |    COUNT(*) AS c_src_rows,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      ${childHashSql("lsrc")}, 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS c_src_digest
         |  FROM lsrc JOIN src ON lsrc.l_orderkey = src.o_orderkey GROUP BY 1),
         |cct AS (
         |  SELECT CAST(EXTRACT(year FROM orders.o_orderdate) AS INTEGER) AS order_year,
         |    COUNT(*) AS c_tgt_rows,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      ${childHashSql("lineitem")}, 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS c_tgt_digest
         |  FROM lineitem JOIN orders ON lineitem.l_orderkey = orders.o_orderkey GROUP BY 1),
         |ccl AS (
         |  SELECT COALESCE(ccs.order_year, cct.order_year) AS order_year,
         |    COALESCE(c_src_rows, 0) AS c_src_rows,
         |    NOT (COALESCE(c_src_rows, 0) = COALESCE(c_tgt_rows, 0) AND
         |         COALESCE(c_src_digest, -1) = COALESCE(c_tgt_digest, -1)) AS child_own_dirty,
         |    COALESCE(c_src_digest, -1) AS c_src_digest
         |  FROM ccs FULL OUTER JOIN cct ON ccs.order_year = cct.order_year),
         |pl AS (
         |  SELECT COALESCE(ppl.order_year, ccl.order_year) AS order_year,
         |    COALESCE(p_src_rows, 0) AS p_src_rows,
         |    COALESCE(parent_dirty, FALSE) AS parent_dirty,
         |    COALESCE(p_src_digest, -1) AS p_src_digest,
         |    COALESCE(c_src_rows, 0) AS c_src_rows,
         |    (COALESCE(parent_dirty, FALSE) OR COALESCE(child_own_dirty, FALSE)) AS child_dirty,
         |    COALESCE(c_src_digest, -1) AS c_src_digest
         |  FROM ppl FULL OUTER JOIN ccl ON ppl.order_year = ccl.order_year),
         |pa AS (
         |  SELECT * FROM orders
         |  WHERE CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) NOT IN
         |        (SELECT order_year FROM pl WHERE parent_dirty)
         |  UNION ALL
         |  SELECT * FROM src
         |  WHERE CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) IN
         |        (SELECT order_year FROM pl WHERE parent_dirty)),
         |ca AS (
         |  SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_quantity,
         |    l.l_extendedprice, l.l_returnflag,
         |    CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS l_year
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  WHERE CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) NOT IN
         |        (SELECT order_year FROM pl WHERE child_dirty)
         |  UNION ALL
         |  SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, l.l_quantity,
         |    l.l_extendedprice, l.l_returnflag,
         |    CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS l_year
         |  FROM lsrc l JOIN src o ON l.l_orderkey = o.o_orderkey
         |  WHERE CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) IN
         |        (SELECT order_year FROM pl WHERE child_dirty)),
         |paf AS (
         |  SELECT CAST(EXTRACT(year FROM pa.o_orderdate) AS INTEGER) AS order_year,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      md5(concat_ws('|', pa.o_orderkey, ${rowHashSql("pa")})), 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS pa_digest
         |  FROM pa GROUP BY 1),
         |caf AS (
         |  SELECT l_year AS order_year,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      ${childHashSql("ca")}, 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS ca_digest
         |  FROM ca GROUP BY 1),
         |orph AS (
         |  SELECT l_year AS order_year, COUNT(*) AS n_orph
         |  FROM ca
         |  WHERE NOT EXISTS (SELECT 1 FROM pa WHERE pa.o_orderkey = ca.l_orderkey)
         |  GROUP BY 1)
         |SELECT pl.order_year, parent_dirty, child_dirty,
         |  CASE WHEN parent_dirty THEN p_src_rows ELSE 0 END AS n_parent_copied,
         |  CASE WHEN child_dirty THEN c_src_rows ELSE 0 END AS n_child_copied,
         |  COALESCE(pa_digest, -1) = p_src_digest AS parent_clean_after,
         |  COALESCE(ca_digest, -1) = c_src_digest AS child_clean_after,
         |  COALESCE(n_orph, 0) AS n_orphans_after
         |FROM pl
         |LEFT JOIN paf ON pl.order_year = paf.order_year
         |LEFT JOIN caf ON pl.order_year = caf.order_year
         |LEFT JOIN orph ON pl.order_year = orph.order_year
         |ORDER BY pl.order_year""".stripMargin,

    "y17b_fk_multi_child" ->
      s"""WITH $sourceCte, $lineSourceCte, $returnsCte,
         |pps AS (
         |  SELECT CAST(EXTRACT(year FROM src.o_orderdate) AS INTEGER) AS order_year,
         |    COUNT(*) AS p_src_rows,
         |    ${digSql(s"md5(concat_ws('|', src.o_orderkey, ${rowHashSql("src")}))")} AS p_src_digest
         |  FROM src GROUP BY 1),
         |ppt AS (
         |  SELECT CAST(EXTRACT(year FROM orders.o_orderdate) AS INTEGER) AS order_year,
         |    COUNT(*) AS p_tgt_rows,
         |    ${digSql(s"md5(concat_ws('|', orders.o_orderkey, ${rowHashSql("orders")}))")} AS p_tgt_digest
         |  FROM orders GROUP BY 1),
         |ppl AS (
         |  SELECT COALESCE(pps.order_year, ppt.order_year) AS order_year,
         |    COALESCE(p_src_rows, 0) AS p_src_rows,
         |    NOT (COALESCE(p_src_rows, 0) = COALESCE(p_tgt_rows, 0) AND
         |         COALESCE(p_src_digest, -1) = COALESCE(p_tgt_digest, -1)) AS parent_dirty,
         |    COALESCE(p_src_digest, -1) AS p_src_digest
         |  FROM pps FULL OUTER JOIN ppt ON pps.order_year = ppt.order_year),
         |pa AS (
         |  SELECT * FROM orders
         |  WHERE CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) NOT IN
         |        (SELECT order_year FROM ppl WHERE parent_dirty)
         |  UNION ALL
         |  SELECT * FROM src
         |  WHERE CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) IN
         |        (SELECT order_year FROM ppl WHERE parent_dirty)),
         |paf AS (
         |  SELECT CAST(EXTRACT(year FROM pa.o_orderdate) AS INTEGER) AS order_year,
         |    ${digSql(s"md5(concat_ws('|', pa.o_orderkey, ${rowHashSql("pa")}))")} AS pa_digest
         |  FROM pa GROUP BY 1),
         |${multiChildCteSql("ln", "lsrc", "lineitem", "l_orderkey",
             Seq("l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
               "l_extendedprice", "l_returnflag"), childHashSql)},
         |${multiChildCteSql("rt", "rsrc", "rtgt", "l_orderkey",
             Seq("l_orderkey", "l_linenumber", "r_refund"), returnsHashSql)}
         |${multiChildSelectSql("ln", "lineitem")}
         |UNION ALL
         |${multiChildSelectSql("rt", "returns")}
         |ORDER BY child, order_year""".stripMargin,

    "y15_incremental_join_view" ->
      s"""WITH $sourceCte, $custCte
         |SELECT o_orderkey, o_custkey, c_mktsegment, o_orderstatus,
         |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice
         |FROM src JOIN csrc ON o_custkey = c_custkey""".stripMargin,

    "y14_partition_bounds" ->
      """WITH a AS (
        |  SELECT COUNT(*) AS n_rows, MIN(o_orderkey) AS lo, MAX(o_orderkey) AS hi,
        |    approx_quantile(o_orderkey, 0.25) AS a25,
        |    approx_quantile(o_orderkey, 0.5) AS a50,
        |    approx_quantile(o_orderkey, 0.75) AS a75
        |  FROM orders),
        |e AS (
        |  SELECT quantile_cont(o_orderkey, 0.25) AS q25,
        |    quantile_cont(o_orderkey, 0.5) AS q50,
        |    quantile_cont(o_orderkey, 0.75) AS q75
        |  FROM orders)
        |SELECT n_rows, lo, hi, q25, q50, q75,
        |  abs(CAST(a25 AS DOUBLE) - q25) / CAST(hi - lo AS DOUBLE) < 0.02 AS b25_ok,
        |  abs(CAST(a50 AS DOUBLE) - q50) / CAST(hi - lo AS DOUBLE) < 0.02 AS b50_ok,
        |  abs(CAST(a75 AS DOUBLE) - q75) / CAST(hi - lo AS DOUBLE) < 0.02 AS b75_ok
        |FROM a, e""".stripMargin,

    // Full-width digit-string digest: scale-0 DECIMAL(38,0) sums render
    // identically in both engines, unlike general decimal formatting.
    "y12b_full_width_digest" ->
      s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
         |  CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS order_month,
         |  COUNT(*) AS n_rows,
         |  CAST(SUM(CAST(CAST(concat('0x', substr(
         |    md5(concat_ws('|', orders.o_orderkey, ${rowHashSql("orders")})), 1, 15))
         |    AS BIGINT) AS DECIMAL(38,0))) AS VARCHAR) AS digest_full
         |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "y12_partition_digest" ->
      s"""WITH $sourceCte,
         |ss AS (
         |  SELECT CAST(EXTRACT(year FROM src.o_orderdate) AS INTEGER) AS order_year,
         |    COUNT(*) AS src_rows,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      md5(concat_ws('|', src.o_orderkey, ${rowHashSql("src")})), 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS src_digest
         |  FROM src GROUP BY 1),
         |tt AS (
         |  SELECT CAST(EXTRACT(year FROM orders.o_orderdate) AS INTEGER) AS order_year,
         |    COUNT(*) AS tgt_rows,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      md5(concat_ws('|', orders.o_orderkey, ${rowHashSql("orders")})), 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS tgt_digest
         |  FROM orders GROUP BY 1)
         |SELECT COALESCE(ss.order_year, tt.order_year) AS order_year,
         |  COALESCE(src_rows, 0) AS src_rows,
         |  COALESCE(tgt_rows, 0) AS tgt_rows,
         |  (COALESCE(src_rows, 0) = COALESCE(tgt_rows, 0) AND
         |   COALESCE(src_digest, -1) = COALESCE(tgt_digest, -1)) AS clean
         |FROM ss FULL OUTER JOIN tt ON ss.order_year = tt.order_year
         |ORDER BY order_year""".stripMargin,

    // the incremental apply must equal the full latest-per-key recompute
    "y8_incremental_apply" ->
      s"""WITH $evCte
         |SELECT user_id, event_type AS last_type, value AS last_value, ts AS last_ts
         |FROM ev
         |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1""".stripMargin,

    "y7_scd2" ->
      s"""WITH $evCte
         |SELECT user_id, event_id, event_type,
         |  ts AS valid_from,
         |  lead(ts, 1) OVER w AS valid_to,
         |  lead(ts, 1) OVER w IS NULL AS is_current
         |FROM ev
         |WHERE event_type IN ('signup', 'purchase', 'error')
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "y37_publish_gc" ->
      s"""WITH $sourceCte
         |SELECT COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  'v3' AS current_version, CAST(1 AS BIGINT) AS n_deleted,
         |  'v1' AS deleted_dirs,
         |  (SELECT COUNT(*) FROM src) AS rollback_rows
         |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin,

    "y36_staged_publish" ->
      s"""WITH $sourceCte
         |SELECT COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
         |  'v2' AS current_version, TRUE AS abort_left_v2_live
         |FROM src""".stripMargin,

    // post-mutation state replayed as a filtered/CASE CTE: delete the
    // first tenth of the keyspace, bump price in the 40-50% band —
    // integer band arithmetic (// = floor division) in lockstep with
    // the Spark side's Long arithmetic
    "y38_row_level_delete" ->
      s"""WITH b AS (SELECT MIN(o_orderkey) AS lo,
         |    MAX(o_orderkey) - MIN(o_orderkey) AS span FROM orders),
         |post AS (
         |  SELECT o_orderkey,
         |    CASE WHEN o_orderkey BETWEEN lo + 4*(span//10)
         |           AND lo + 5*(span//10)
         |      THEN o_totalprice + 100.0 ELSE o_totalprice END AS price2
         |  FROM orders, b
         |  WHERE o_orderkey NOT BETWEEN lo AND lo + span//10)
         |SELECT COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("price2")} AS sum_price,
         |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
         |  'v2' AS current_version, TRUE AS pruned_rewrite,
         |  TRUE AS untouched_intact, TRUE AS prior_version_live
         |FROM post""".stripMargin,

    // compaction must be a pure layout change — the full-table
    // aggregate is the oracle, the layout claims are audited booleans
    "y39_lake_optimize" ->
      s"""SELECT COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
         |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
         |  'v2' AS current_version, TRUE AS compacted,
         |  TRUE AS big_file_carried
         |FROM orders""".stripMargin,

    // latest-wins CDC apply replayed as a filtered/CASE/UNION CTE:
    // delete band1 keys %3, update band2 (+100, or +200 where the
    // version-200 row wins at %5), insert shifted keys beyond the
    // domain — integer band arithmetic in lockstep with the Spark side
    "y38b_cdc_into_lake" ->
      s"""WITH b AS (SELECT MIN(o_orderkey) AS lo,
         |    MAX(o_orderkey) - MIN(o_orderkey) AS span,
         |    MAX(o_orderkey) AS maxk FROM orders),
         |post AS (
         |  SELECT o_orderkey, o_custkey,
         |    CASE WHEN o_orderkey BETWEEN lo + 4*(span//10)
         |             AND lo + 5*(span//10) AND o_orderkey % 5 = 0
         |           THEN o_totalprice + 200.0
         |         WHEN o_orderkey BETWEEN lo + 4*(span//10)
         |             AND lo + 5*(span//10)
         |           THEN o_totalprice + 100.0
         |         ELSE o_totalprice END AS price2
         |  FROM orders, b
         |  WHERE NOT (o_orderkey BETWEEN lo AND lo + span//10
         |             AND o_orderkey % 3 = 0)
         |  UNION ALL
         |  SELECT o_orderkey + maxk + 1000 AS o_orderkey,
         |    CAST(999 AS BIGINT) AS o_custkey, 1.0 AS price2
         |  FROM orders, b WHERE o_orderkey % 97 = 0)
         |SELECT COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("price2")} AS sum_price,
         |  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
         |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
         |  'v2' AS current_version, TRUE AS pruned_rewrite,
         |  TRUE AS frontier_appended
         |FROM post""".stripMargin,

    // MOR end state = base minus both accumulated delete bands; the
    // zero-copy / accumulation / fold claims ride as audited booleans
    // (constants here, genuinely computed on the Spark side)
    "y40_deletion_vectors" ->
      s"""WITH b AS (SELECT MIN(o_orderkey) AS lo,
         |    MAX(o_orderkey) - MIN(o_orderkey) AS span FROM orders),
         |post AS (
         |  SELECT o_orderkey, o_totalprice FROM orders, b
         |  WHERE NOT (o_orderkey BETWEEN lo AND lo + span//10
         |             AND o_orderkey % 3 = 0)
         |    AND NOT (o_orderkey BETWEEN lo + 2*(span//10)
         |               AND lo + 3*(span//10)
         |             AND o_orderkey % 4 = 0))
         |SELECT COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
         |  'v4' AS current_version, TRUE AS zero_copy_delete,
         |  TRUE AS dv_accumulated, TRUE AS folded_clean,
         |  TRUE AS pruned_fold
         |FROM post""".stripMargin,

    // the recovered changelog's I/U/D counts + the updated rows' new
    // price sum, recomputed from the same band arithmetic
    "y41_change_data_feed" ->
      s"""WITH b AS (SELECT MIN(o_orderkey) AS lo,
         |    MAX(o_orderkey) - MIN(o_orderkey) AS span FROM orders)
         |SELECT
         |  (SELECT COUNT(*) FROM orders WHERE o_orderkey % 101 = 0)
         |    AS n_ins,
         |  (SELECT COUNT(*) FROM orders, b
         |   WHERE o_orderkey BETWEEN lo + 4*(span//10)
         |     AND lo + 5*(span//10)) AS n_upd,
         |  (SELECT COUNT(*) FROM orders, b
         |   WHERE o_orderkey BETWEEN lo AND lo + span//10
         |     AND o_orderkey % 3 = 0) AS n_del,
         |  (SELECT ${Det.Sql.dsum("o_totalprice + 100.0")}
         |   FROM orders, b
         |   WHERE o_orderkey BETWEEN lo + 4*(span//10)
         |     AND lo + 5*(span//10)) AS upd_price_sum,
         |  TRUE AS pruned_diff""".stripMargin,

    // the maintained rollup must equal the from-scratch recompute of
    // the post state — delete band %3, update band2 (+100, custkey+1 —
    // the group MOVES), insert the %101 comb at custkey 999
    "y42_incremental_view" ->
      s"""WITH b AS (SELECT MIN(o_orderkey) AS lo,
         |    MAX(o_orderkey) - MIN(o_orderkey) AS span FROM orders),
         |post AS (
         |  SELECT CASE WHEN o_orderkey BETWEEN lo + 4*(span//10)
         |             AND lo + 5*(span//10)
         |           THEN o_custkey + 1 ELSE o_custkey END AS ck,
         |    CASE WHEN o_orderkey BETWEEN lo + 4*(span//10)
         |             AND lo + 5*(span//10)
         |           THEN o_totalprice + 100.0
         |         ELSE o_totalprice END AS price2
         |  FROM orders, b
         |  WHERE NOT (o_orderkey BETWEEN lo AND lo + span//10
         |             AND o_orderkey % 3 = 0)
         |  UNION ALL
         |  SELECT CAST(999 AS BIGINT) AS ck, 1.0 AS price2
         |  FROM orders WHERE o_orderkey % 101 = 0)
         |SELECT ck % 10 AS grp, COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("price2")} AS sum_price,
         |  TRUE AS maintained_ok
         |FROM post GROUP BY ck % 10""".stripMargin,

    // the evolved column's backfilled population + score sum from the
    // same band arithmetic; the zero-copy/pruning/old-schema claims
    // ride as audited booleans
    "y43_schema_evolution" ->
      s"""WITH b AS (SELECT MIN(o_orderkey) AS lo,
         |    MAX(o_orderkey) - MIN(o_orderkey) AS span FROM orders)
         |SELECT COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  (SELECT COUNT(*) FROM orders, b
         |   WHERE o_orderkey BETWEEN lo + 4*(span//10)
         |     AND lo + 5*(span//10)) AS n_backfilled,
         |  (SELECT ${Det.Sql.dsum("o_totalprice * 2")}
         |   FROM orders, b
         |   WHERE o_orderkey BETWEEN lo + 4*(span//10)
         |     AND lo + 5*(span//10)) AS score_sum,
         |  'v3' AS current_version, TRUE AS evolution_zero_copy,
         |  TRUE AS pruned_backfill, TRUE AS old_version_intact
         |FROM orders""".stripMargin,

    // both tables' post-state aggregates after the parent-band delete
    // cascaded to the children; the transactional claims ride as
    // audited booleans, the FK audit as a genuinely-computed zero
    "y44_atomic_group" ->
      s"""WITH b AS (SELECT MIN(o_orderkey) AS lo,
         |    MAX(o_orderkey) - MIN(o_orderkey) AS span FROM orders),
         |keep AS (
         |  SELECT o_orderkey, o_totalprice FROM orders, b
         |  WHERE NOT (o_orderkey BETWEEN lo AND lo + span//10
         |             AND o_orderkey % 3 = 0))
         |SELECT
         |  (SELECT COUNT(*) FROM keep) AS n_orders,
         |  (SELECT ${Det.Sql.dsum("o_totalprice")} FROM keep)
         |    AS sum_o_price,
         |  (SELECT COUNT(*) FROM lineitem
         |   WHERE l_orderkey IN (SELECT o_orderkey FROM keep))
         |    AS n_lineitem,
         |  (SELECT ${Det.Sql.dsum("l_extendedprice")} FROM lineitem
         |   WHERE l_orderkey IN (SELECT o_orderkey FROM keep))
         |    AS sum_l_price,
         |  CAST(0 AS BIGINT) AS n_orphans,
         |  CAST(2 AS INTEGER) AS orders_version,
         |  CAST(2 AS INTEGER) AS lineitem_version,
         |  TRUE AS abort_kept_group, TRUE AS no_v3_residue""".stripMargin,

    // MERGE routing replayed as three joins: kept targets (minus the
    // NMBS range-delete), matched rows (source wins unless the
    // matched-delete condition fires), conditional frontier inserts
    "y45_merge_into" ->
      s"""WITH b AS (SELECT MIN(o_orderkey) AS lo,
         |    MAX(o_orderkey) - MIN(o_orderkey) AS span FROM orders),
         |src AS (
         |  SELECT o_orderkey, o_custkey,
         |    o_totalprice + 500.0 AS o_totalprice,
         |    'M' AS o_orderstatus
         |  FROM orders, b
         |  WHERE o_orderkey BETWEEN b.lo + 2*(b.span//10)
         |          AND b.lo + 4*(b.span//10)
         |    AND o_orderkey % 5 = 0
         |  UNION ALL
         |  SELECT o_orderkey + 10000000, o_custkey, o_totalprice, 'N'
         |  FROM orders WHERE o_orderkey % 13 = 0),
         |tgt_keep AS (
         |  SELECT t.o_orderkey, t.o_custkey, t.o_totalprice,
         |    t.o_orderstatus
         |  FROM orders t, b
         |  WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM src)
         |    AND NOT (t.o_orderkey BETWEEN b.lo AND b.lo + b.span//10
         |             AND t.o_orderstatus = 'F')),
         |upd AS (
         |  SELECT s.o_orderkey, s.o_custkey, s.o_totalprice,
         |    s.o_orderstatus
         |  FROM orders t JOIN src s ON t.o_orderkey = s.o_orderkey
         |  WHERE NOT (s.o_totalprice > 200000.0)),
         |ins AS (
         |  SELECT s.o_orderkey, s.o_custkey, s.o_totalprice,
         |    s.o_orderstatus
         |  FROM src s
         |  WHERE s.o_orderkey NOT IN (SELECT o_orderkey FROM orders)
         |    AND s.o_custkey % 2 = 0),
         |post AS (SELECT * FROM tgt_keep UNION ALL
         |  SELECT * FROM upd UNION ALL SELECT * FROM ins)
         |SELECT o_orderstatus, COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  TRUE AS pruned_merge
         |FROM post GROUP BY 1""".stripMargin,

    // the restored generation IS the original publish: plain base-table
    // rollups; history/zero-copy/as-of laws ride as audited booleans
    "y46_group_time_travel" ->
      s"""SELECT COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  (SELECT COUNT(*) FROM lineitem) AS lineitem_rows,
         |  CAST(3 AS BIGINT) AS gen_count, TRUE AS history_intact,
         |  TRUE AS rollback_zero_copy, TRUE AS asof_matches
         |FROM orders""".stripMargin,

    // the synced target converged on v2 ≡ the plain projection, so the
    // oracle is the base-table rollup; the CDF-prune / validation /
    // op-mix laws ride as audited booleans (genuinely computed on the
    // Spark side, constants here — the a5/a19 idiom)
    "y48_lake_jdbc_sync" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  TRUE AS cdf_pruned, TRUE AS sync_validated,
         |  TRUE AS ops_mix_real
         |FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 1""".stripMargin,

    // the history target's is_current=1 slice converged on v2 ≡ the
    // plain projection; the accretion/replay/prune laws ride as
    // audited booleans (genuinely computed Spark-side over the JDBC
    // read-back, constants here — the a5/a19 idiom)
    "y48b_lake_scd2_sync" ->
      s"""SELECT COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  TRUE AS cdf_pruned, TRUE AS sync_validated,
         |  TRUE AS ops_mix_real, TRUE AS history_accreted,
         |  TRUE AS replay_noop
         |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin,

    // the capture converged the LAKE on the clean %3 slice; audited
    // booleans as in y50
    "y53_jdbc_capture" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  TRUE AS modes_observed, TRUE AS noop_mints_no_version,
         |  TRUE AS ops_mix_real, TRUE AS sync_validated
         |FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 1""".stripMargin,

    // the full chain (source DB → lake → target DB) converged the
    // TARGET on the clean %3 slice; the e2e digest and per-hop modes
    // ride as audited booleans
    "y54_roundtrip_sync" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  TRUE AS modes_observed, TRUE AS churn_sized_hops,
         |  TRUE AS e2e_validated
         |FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 1""".stripMargin,

    // the group catch-up converged BOTH targets on v2 ≡ the clean
    // tables; the per-nation rollup joins the two JDBC targets, so a
    // match proves both wires and every FK-ordered step; audited
    // booleans as in y50
    "y52_group_catchup" ->
      s"""SELECT n_name, COUNT(*) AS n_cust,
         |  ${Det.Sql.dsum("c_acctbal")} AS sum_bal,
         |  TRUE AS modes_observed, TRUE AS fk_ops_real,
         |  TRUE AS sync_validated
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |WHERE c_custkey % 3 = 0
         |GROUP BY 1""".stripMargin,

    // the evolving catch-up converged the target on v3 ≡ the plain
    // projection + notes on exactly the %7 keys (n_noted reads the
    // TARGET's post-ALTER column, so the count only matches if the
    // schema migration and the CDF backfill both landed); audited
    // booleans as in y50
    "y51_evolving_catchup" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  COUNT(CASE WHEN o_orderkey % 7 = 0 THEN 1 END) AS n_noted,
         |  TRUE AS modes_observed, TRUE AS schema_migrated,
         |  TRUE AS cdf_spans_evolution, TRUE AS sync_validated
         |FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 1""".stripMargin,

    // three catch-up ticks converged the target on v2 ≡ the plain
    // projection; the mode-sequence/prune/validation laws ride as
    // audited booleans (genuinely computed Spark-side, constants here)
    "y50_catchup_sync" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  TRUE AS modes_observed, TRUE AS cdf_pruned,
         |  TRUE AS sync_validated, TRUE AS ops_mix_real
         |FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 1""".stripMargin,

    // the partitioned cow converged on v2 ≡ the plain projection; the
    // partition/file/CDF-prune laws ride as audited booleans
    "y49_partitioned_lake" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  TRUE AS partition_pruned, TRUE AS file_pruned,
         |  TRUE AS cdf_pruned, TRUE AS cdf_mix_real
         |FROM orders WHERE o_orderkey % 3 = 0 GROUP BY 1""".stripMargin,

    // the winner's v3 content + the audited refusal flags (constants on
    // the oracle side, genuinely computed on the Spark side — the
    // a5/a19 audit idiom)
    "y36b_optimistic_publish" ->
      s"""SELECT COUNT(*) AS n_rows,
         |  ${Det.Sql.dsum("o_totalprice")} AS sum_price,
         |  'v3' AS current_version, TRUE AS winner_committed,
         |  TRUE AS loser_refused, TRUE AS no_torn_state
         |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin,

    "y35_incremental_topk" ->
      s"""WITH $sourceCte,
         |state AS (
         |  SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
         |    SELECT o_orderpriority, o_orderkey, o_totalprice,
         |      row_number() OVER (PARTITION BY o_orderpriority
         |        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
         |    FROM orders) WHERE rn <= 6),
         |surv AS (
         |  SELECT st.o_orderpriority, st.o_orderkey, st.o_totalprice
         |  FROM state st JOIN src ON st.o_orderkey = src.o_orderkey
         |    AND st.o_totalprice = src.o_totalprice),
         |ups AS (
         |  SELECT src.o_orderpriority, src.o_orderkey, src.o_totalprice
         |  FROM src LEFT JOIN orders o ON src.o_orderkey = o.o_orderkey
         |  WHERE o.o_orderkey IS NULL
         |     OR o.o_totalprice <> src.o_totalprice),
         |rem AS (
         |  SELECT st.o_orderpriority,
         |    COUNT(*) - COUNT(sv.o_orderkey) AS n_removed
         |  FROM state st LEFT JOIN surv sv
         |    ON st.o_orderkey = sv.o_orderkey
         |  GROUP BY 1),
         |u AS (SELECT * FROM surv UNION ALL SELECT * FROM ups),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
         |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
         |  FROM u)
         |SELECT r.o_orderpriority, CAST(rank AS INTEGER) AS rank,
         |  o_orderkey, o_totalprice, n_removed,
         |  n_removed > 3 AS needs_rescan
         |FROM r JOIN rem USING (o_orderpriority)
         |WHERE rank <= 3""".stripMargin,

    "y34_scd2_vacuum" ->
      s"""WITH $evCte,
         |hist AS (
         |  SELECT user_id, event_id, event_type,
         |    ts AS valid_from, lead(ts, 1) OVER w AS valid_to
         |  FROM ev
         |  WHERE event_type IN ('signup', 'purchase', 'error')
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |kept AS (
         |  SELECT * FROM hist
         |  WHERE valid_to IS NULL
         |     OR valid_to >= TIMESTAMP '2024-01-20 00:00:00'),
         |b AS (
         |  SELECT user_id, COUNT(*) AS n_before,
         |    MAX(CASE WHEN valid_to IS NULL THEN event_type END)
         |      AS current_type
         |  FROM hist GROUP BY user_id),
         |a AS (
         |  SELECT user_id, COUNT(*) AS n_after,
         |    MIN(valid_from) AS oldest_retained_from
         |  FROM kept GROUP BY user_id),
         |ab AS (
         |  SELECT user_id, event_type AS asof_before FROM hist
         |  WHERE valid_from <= TIMESTAMP '2024-01-20 00:00:00'
         |    AND (valid_to IS NULL
         |         OR valid_to > TIMESTAMP '2024-01-20 00:00:00')),
         |aa AS (
         |  SELECT user_id, event_type AS asof_after FROM kept
         |  WHERE valid_from <= TIMESTAMP '2024-01-20 00:00:00'
         |    AND (valid_to IS NULL
         |         OR valid_to > TIMESTAMP '2024-01-20 00:00:00'))
         |SELECT b.user_id, n_before, n_after,
         |  n_before - n_after AS n_purged,
         |  current_type, oldest_retained_from, asof_before, asof_after,
         |  asof_before IS NOT DISTINCT FROM asof_after AS asof_stable
         |FROM b JOIN a USING (user_id)
         |LEFT JOIN ab ON b.user_id = ab.user_id
         |LEFT JOIN aa ON b.user_id = aa.user_id""".stripMargin,

    "y18_changelog_compact" ->
      s"""WITH $logCte,
         |c AS (
         |  SELECT pk,
         |    arg_min(op, version) AS first_op,
         |    arg_max(op, version) AS last_op,
         |    arg_max(payload_type, version) AS last_type,
         |    arg_max(payload_value, version) AS last_value,
         |    MAX(version) AS last_version,
         |    COUNT(*) AS n_ops
         |  FROM lg GROUP BY pk)
         |SELECT pk,
         |  CASE WHEN first_op = 'I' THEN 'I'
         |       WHEN last_op = 'D' THEN 'D'
         |       ELSE 'U' END AS net_op,
         |  last_type, last_value, last_version, n_ops
         |FROM c
         |WHERE NOT (first_op = 'I' AND last_op = 'D')""".stripMargin,

    "y24_sampled_validation" ->
      s"""WITH $sourceCte,
         |t AS (
         |  SELECT o_orderkey AS t_key, ${rowHashSql("orders")} AS t_hash FROM orders
         |  WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 10),
         |s AS (
         |  SELECT o_orderkey AS s_key, ${rowHashSql("src")} AS s_hash FROM src
         |  WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 10),
         |sa AS (
         |  SELECT COUNT(*) AS n_sampled,
         |    COUNT(CASE WHEN s_hash IS DISTINCT FROM t_hash THEN 1 END) AS n_drifted
         |  FROM s FULL OUTER JOIN t ON s_key = t_key),
         |tot AS (SELECT COUNT(*) AS n_target_total FROM orders)
         |SELECT n_target_total, n_sampled, n_drifted,
         |  CAST(n_drifted AS DOUBLE) / CAST(n_sampled AS DOUBLE) AS drift_rate,
         |  CAST(n_drifted AS DOUBLE) / CAST(n_sampled AS DOUBLE)
         |    * CAST(n_target_total AS DOUBLE) AS est_drift_total,
         |  1.96 * sqrt(CAST(n_drifted AS DOUBLE) / CAST(n_sampled AS DOUBLE)
         |    * (1.0 - CAST(n_drifted AS DOUBLE) / CAST(n_sampled AS DOUBLE))
         |    / CAST(n_sampled AS DOUBLE)) AS ci_half
         |FROM sa CROSS JOIN tot""".stripMargin,

    "y23b_three_way_merge" ->
      s"""WITH $sourceCte, $bSourceCte, $threeWayClassifyCte,
         |sd AS (
         |  SELECT o_orderkey,
         |    CASE WHEN NOT ach AND NOT bch THEN 'base'
         |         WHEN ach AND NOT bch THEN 'a'
         |         WHEN bch AND NOT ach THEN 'b'
         |         ELSE 'a' END AS side
         |  FROM c)
         |SELECT sd.o_orderkey,
         |  CASE sd.side WHEN 'base' THEN o.o_custkey WHEN 'a' THEN sa.o_custkey ELSE sb.o_custkey END AS o_custkey,
         |  CASE sd.side WHEN 'base' THEN o.o_orderstatus WHEN 'a' THEN sa.o_orderstatus ELSE sb.o_orderstatus END AS o_orderstatus,
         |  CASE sd.side WHEN 'base' THEN o.o_totalprice WHEN 'a' THEN sa.o_totalprice ELSE sb.o_totalprice END AS o_totalprice,
         |  CASE sd.side WHEN 'base' THEN o.o_orderdate WHEN 'a' THEN sa.o_orderdate ELSE sb.o_orderdate END AS o_orderdate,
         |  CASE sd.side WHEN 'base' THEN o.o_orderpriority WHEN 'a' THEN sa.o_orderpriority ELSE sb.o_orderpriority END AS o_orderpriority
         |FROM sd
         |LEFT JOIN orders o ON sd.o_orderkey = o.o_orderkey
         |LEFT JOIN src sa ON sd.o_orderkey = sa.o_orderkey
         |LEFT JOIN bsrc sb ON sd.o_orderkey = sb.o_orderkey
         |WHERE sd.side = 'base'
         |   OR (sd.side = 'a' AND sa.o_orderkey IS NOT NULL)
         |   OR (sd.side = 'b' AND sb.o_orderkey IS NOT NULL)""".stripMargin,

    "y23_three_way_diff" ->
      s"""WITH $sourceCte, $bSourceCte, $threeWayClassifyCte
         |SELECT o_orderkey,
         |  CASE WHEN NOT ach AND NOT bch THEN 'unchanged'
         |       WHEN ach AND NOT bch THEN 'a_only'
         |       WHEN bch AND NOT ach THEN 'b_only'
         |       WHEN a_h IS NOT DISTINCT FROM b_h THEN 'convergent'
         |       ELSE 'conflict' END AS verdict,
         |  CASE WHEN NOT ach AND NOT bch THEN 'none'
         |       WHEN ach AND NOT bch THEN
         |         CASE WHEN a_h IS NULL THEN 'delete_in_b' ELSE 'upsert_to_b' END
         |       WHEN bch AND NOT ach THEN
         |         CASE WHEN b_h IS NULL THEN 'delete_in_a' ELSE 'upsert_to_a' END
         |       WHEN a_h IS NOT DISTINCT FROM b_h THEN 'none'
         |       ELSE 'manual' END AS action
         |FROM c""".stripMargin,

    "y22_column_subset_sync" ->
      s"""WITH $sourceCte,
         |tgt AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority,
         |    concat('t-', o_orderkey) AS sync_note FROM orders),
         |s2 AS (
         |  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority,
         |    concat('s-', o_orderkey) AS sync_note FROM src),
         |j AS (
         |  SELECT s2.o_orderkey AS s_key, tgt.o_orderkey AS t_key,
         |    s2.o_orderstatus AS s_status, s2.o_totalprice AS s_price,
         |    s2.o_orderpriority AS s_prio,
         |    tgt.o_orderstatus AS t_status, tgt.o_totalprice AS t_price,
         |    tgt.o_orderpriority AS t_prio, tgt.sync_note AS t_note
         |  FROM s2 FULL OUTER JOIN tgt ON s2.o_orderkey = tgt.o_orderkey),
         |c AS (
         |  SELECT *,
         |    CASE WHEN t_key IS NULL THEN 'I'
         |         WHEN s_key IS NULL THEN 'D'
         |         WHEN s_status IS DISTINCT FROM t_status
         |           OR s_price IS DISTINCT FROM t_price
         |           OR s_prio IS DISTINCT FROM t_prio THEN 'U'
         |         ELSE 'S' END AS op
         |  FROM j)
         |SELECT COALESCE(s_key, t_key) AS o_orderkey, op,
         |  CASE WHEN op IN ('I','U') THEN s_status ELSE t_status END AS o_orderstatus,
         |  CASE WHEN op IN ('I','U') THEN s_price ELSE t_price END AS o_totalprice,
         |  CASE WHEN op IN ('I','U') THEN s_prio ELSE t_prio END AS o_orderpriority,
         |  t_note AS sync_note
         |FROM c""".stripMargin,

    "y21_retention_fallback" ->
      s"""WITH $logCte,
         |b AS (SELECT MIN(version) AS vmin, MAX(version) AS vmax FROM lg),
         |sc AS (
         |  SELECT 'A_recent' AS scenario,
         |    vmin + (vmax - vmin) * 6 // 10 AS target_version,
         |    vmin + (vmax - vmin) * 3 // 10 AS min_valid_version FROM b
         |  UNION ALL
         |  SELECT 'B_stale',
         |    vmin + (vmax - vmin) * 1 // 10,
         |    vmin + (vmax - vmin) * 3 // 10 FROM b),
         |st AS (
         |  SELECT pk, op, payload_type, payload_value
         |  FROM lg
         |  QUALIFY row_number() OVER (PARTITION BY pk ORDER BY version DESC) = 1),
         |sa AS (
         |  SELECT COUNT(*) AS n_final_keys,
         |    CAST(SUM(CAST(concat('0x', substr(md5(concat_ws('|', pk,
         |      payload_type,
         |      CAST(CAST(payload_value AS DECIMAL(18,2)) AS VARCHAR))), 1, 15))
         |      AS BIGINT) % 1000000000) AS BIGINT) AS final_digest
         |  FROM st WHERE op <> 'D'),
         |tc AS (
         |  SELECT sc.scenario, sc.target_version, sc.min_valid_version,
         |    COUNT(DISTINCT CASE WHEN lg.version > sc.target_version
         |      THEN lg.pk END) AS n_tail_keys
         |  FROM lg CROSS JOIN sc GROUP BY 1, 2, 3)
         |SELECT tc.scenario, tc.target_version, tc.min_valid_version,
         |  CASE WHEN tc.target_version >= tc.min_valid_version
         |       THEN 'INCREMENTAL' ELSE 'FULL_RESYNC' END AS decision,
         |  CASE WHEN tc.target_version >= tc.min_valid_version
         |       THEN tc.n_tail_keys ELSE sa.n_final_keys END AS n_shipped,
         |  sa.n_final_keys, sa.final_digest
         |FROM tc CROSS JOIN sa
         |ORDER BY scenario""".stripMargin,

    "y25_time_travel" ->
      s"""WITH $logCte,
         |b AS (SELECT MIN(version) AS vmin, MAX(version) AS vmax FROM lg),
         |cuts AS (
         |  SELECT 'q' || CAST(k AS VARCHAR) AS cut_label,
         |    vmin + (vmax - vmin) * k // 4 AS cut_version
         |  FROM b, (SELECT unnest([1, 2, 3, 4]) AS k)),
         |v AS (
         |  SELECT pk, op, payload_type, payload_value, version,
         |    lead(version) OVER (PARTITION BY pk ORDER BY version)
         |      AS next_version
         |  FROM lg),
         |j AS (
         |  SELECT c.cut_label, c.cut_version, v.*
         |  FROM v JOIN cuts c ON v.version <= c.cut_version
         |    AND (v.next_version IS NULL OR v.next_version > c.cut_version))
         |SELECT cut_label, cut_version,
         |  COUNT(CASE WHEN op <> 'D' THEN 1 END) AS n_rows,
         |  CAST(SUM(CASE WHEN op <> 'D' THEN
         |    CAST(concat('0x', substr(md5(concat_ws('|', pk, payload_type,
         |      CAST(CAST(payload_value AS DECIMAL(18,2)) AS VARCHAR))),
         |      1, 15)) AS BIGINT) % 1000000000 END) AS BIGINT)
         |    AS state_digest,
         |  COUNT(CASE WHEN op = 'D' THEN 1 END) AS n_tombstones
         |FROM j GROUP BY 1, 2 ORDER BY cut_label""".stripMargin,

    "y26_consistent_cut" ->
      """WITH p AS (
        |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    MIN(event_id) AS reg_version
        |  FROM events GROUP BY 1, 2),
        |c AS (
        |  SELECT event_id AS cversion, user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        |  FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT MIN(event_id) AS vmin, MAX(event_id) AS vmax
        |      FROM events),
        |st AS (
        |  SELECT 'naive_per_table_max' AS strategy,
        |    vmin + (vmax - vmin) * 6 // 10 AS parent_cut,
        |    vmax AS child_cut FROM b
        |  UNION ALL
        |  SELECT 'watermark',
        |    vmin + (vmax - vmin) * 6 // 10,
        |    vmin + (vmax - vmin) * 6 // 10 FROM b),
        |pc AS (
        |  SELECT st.strategy, st.parent_cut, st.child_cut,
        |    COUNT(CASE WHEN p.reg_version <= st.parent_cut THEN 1 END)
        |      AS n_parents
        |  FROM p CROSS JOIN st GROUP BY 1, 2, 3),
        |cc AS (
        |  SELECT st.strategy, st.parent_cut, st.child_cut,
        |    COUNT(CASE WHEN c.cversion <= st.child_cut THEN 1 END)
        |      AS n_children,
        |    COUNT(CASE WHEN c.cversion <= st.child_cut
        |      AND p.reg_version > st.parent_cut THEN 1 END) AS n_orphans
        |  FROM c JOIN p USING (user_id, day) CROSS JOIN st
        |  GROUP BY 1, 2, 3)
        |SELECT strategy, parent_cut, child_cut, n_parents, n_children,
        |  n_orphans
        |FROM pc JOIN cc USING (strategy, parent_cut, child_cut)
        |ORDER BY strategy""".stripMargin,

    "y29_bootstrap_seam" ->
      s"""WITH $logCte,
         |b AS (SELECT MIN(version) AS vmin, MAX(version) AS vmax FROM lg),
         |cuts AS (
         |  SELECT vmin + (vmax - vmin) * 5 // 10 AS v_cut,
         |    vmin + (vmax - vmin) * 3 // 10 AS t_overlap,
         |    vmin + (vmax - vmin) * 7 // 10 AS t_gap
         |  FROM b),
         |m AS (
         |  SELECT version // 8 AS pk, op, payload_type, payload_value,
         |    version,
         |    lead(version) OVER (PARTITION BY version // 8
         |      ORDER BY version) AS nv
         |  FROM lg),
         |pk_rows AS (
         |  SELECT m.pk, c.v_cut, c.t_overlap, c.t_gap,
         |    MAX(CASE WHEN version <= v_cut AND (nv IS NULL OR nv > v_cut)
         |      THEN op END) AS sv_op,
         |    MAX(CASE WHEN version <= v_cut AND (nv IS NULL OR nv > v_cut)
         |      THEN payload_type END) AS sv_type,
         |    MAX(CASE WHEN version <= v_cut AND (nv IS NULL OR nv > v_cut)
         |      THEN payload_value END) AS sv_val,
         |    MAX(CASE WHEN nv IS NULL THEN op END) AS fv_op,
         |    MAX(CASE WHEN nv IS NULL THEN payload_type END) AS fv_type,
         |    MAX(CASE WHEN nv IS NULL THEN payload_value END) AS fv_val,
         |    MAX(version) AS maxv
         |  FROM m CROSS JOIN cuts c GROUP BY 1, 2, 3, 4),
         |v AS (
         |  SELECT *, 'cursor_at_snapshot' AS variant, v_cut AS cursor
         |  FROM pk_rows
         |  UNION ALL
         |  SELECT *, 'cursor_overlaps', t_overlap FROM pk_rows
         |  UNION ALL
         |  SELECT *, 'cursor_gapped', t_gap FROM pk_rows),
         |ch AS (
         |  SELECT pk, variant, cursor,
         |    CASE WHEN maxv > cursor THEN fv_op ELSE sv_op END AS ch_op,
         |    CASE WHEN maxv > cursor THEN fv_type ELSE sv_type END AS ch_type,
         |    CASE WHEN maxv > cursor THEN fv_val ELSE sv_val END AS ch_val,
         |    fv_op, fv_type, fv_val
         |  FROM v),
         |agg AS (
         |  SELECT variant, cursor,
         |    COUNT(CASE WHEN ch_op IS NOT NULL AND ch_op <> 'D' THEN 1 END)
         |      AS n_state,
         |    CAST(SUM(CASE WHEN ch_op IS NOT NULL AND ch_op <> 'D' THEN
         |      CAST(concat('0x', substr(md5(concat_ws('|', pk, ch_type,
         |        CAST(CAST(ch_val AS DECIMAL(18,2)) AS VARCHAR))), 1, 15))
         |        AS BIGINT) % 1000000000 END) AS BIGINT) AS state_digest,
         |    COUNT(CASE WHEN ch_op IS DISTINCT FROM fv_op
         |      OR ch_type IS DISTINCT FROM fv_type
         |      OR ch_val IS DISTINCT FROM fv_val THEN 1 END) AS n_stale
         |  FROM ch GROUP BY 1, 2),
         |fl AS (
         |  SELECT COUNT(CASE WHEN fv_op <> 'D' THEN 1 END) AS n_full,
         |    CAST(SUM(CASE WHEN fv_op <> 'D' THEN
         |      CAST(concat('0x', substr(md5(concat_ws('|', pk, fv_type,
         |        CAST(CAST(fv_val AS DECIMAL(18,2)) AS VARCHAR))), 1, 15))
         |        AS BIGINT) % 1000000000 END) AS BIGINT) AS full_digest
         |  FROM pk_rows)
         |SELECT variant, cursor, n_state, state_digest, n_stale, n_full,
         |  full_digest,
         |  (state_digest IS NOT DISTINCT FROM full_digest
         |    AND n_state = n_full) AS matches_full
         |FROM agg CROSS JOIN fl ORDER BY variant""".stripMargin,

    "y33_sync_plan" ->
      s"""WITH $sourceCte,
         |a AS (
         |  SELECT o_orderkey, ${rowHashSql("src")} AS sh,
         |    24 + length(o_orderstatus) + length(o_orderpriority)
         |      AS sbytes
         |  FROM src),
         |b AS (SELECT o_orderkey, ${rowHashSql("orders")} AS th
         |      FROM orders),
         |j AS (
         |  SELECT
         |    CASE WHEN b.th IS NULL THEN 'I'
         |         WHEN a.sh IS NULL THEN 'D'
         |         WHEN a.sh <> b.th THEN 'U'
         |         ELSE 'S' END AS op,
         |    CASE WHEN b.th IS NULL OR (a.sh IS NOT NULL AND a.sh <> b.th)
         |         THEN a.sbytes
         |         WHEN a.sh IS NULL THEN 8
         |         ELSE 0 END AS ship_bytes
         |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
         |SELECT op, COUNT(*) AS n_rows,
         |  CAST(SUM(ship_bytes) AS BIGINT) AS est_bytes
         |FROM j GROUP BY op ORDER BY op""".stripMargin,

    "y32_column_drift" ->
      s"""WITH $sourceCte,
         |j AS (
         |  SELECT s.o_orderkey AS sk, o.o_orderkey AS tk,
         |    s.o_custkey AS s_o_custkey, o.o_custkey AS t_o_custkey,
         |    s.o_orderstatus AS s_o_orderstatus,
         |    o.o_orderstatus AS t_o_orderstatus,
         |    s.o_totalprice AS s_o_totalprice,
         |    o.o_totalprice AS t_o_totalprice,
         |    s.o_orderpriority AS s_o_orderpriority,
         |    o.o_orderpriority AS t_o_orderpriority
         |  FROM src s FULL OUTER JOIN orders o
         |    ON s.o_orderkey = o.o_orderkey)
         |SELECT
         |  COUNT(CASE WHEN tk IS NULL THEN 1 END) AS rows_added,
         |  COUNT(CASE WHEN sk IS NULL THEN 1 END) AS rows_removed,
         |  COUNT(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL THEN 1 END)
         |    AS rows_common,
         |  COUNT(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL
         |    AND s_o_custkey IS DISTINCT FROM t_o_custkey THEN 1 END)
         |    AS chg_o_custkey,
         |  COUNT(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL
         |    AND s_o_orderstatus IS DISTINCT FROM t_o_orderstatus
         |    THEN 1 END) AS chg_o_orderstatus,
         |  COUNT(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL
         |    AND s_o_totalprice IS DISTINCT FROM t_o_totalprice
         |    THEN 1 END) AS chg_o_totalprice,
         |  COUNT(CASE WHEN sk IS NOT NULL AND tk IS NOT NULL
         |    AND s_o_orderpriority IS DISTINCT FROM t_o_orderpriority
         |    THEN 1 END) AS chg_o_orderpriority
         |FROM j""".stripMargin,

    "y31_collation_drift" ->
      s"""WITH $sourceCte,
         |s2 AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         |    CASE WHEN o_orderkey % 3 = 0 THEN lower(o_orderpriority)
         |         ELSE o_orderpriority END AS o_orderpriority
         |  FROM src),
         |a AS (
         |  SELECT o_orderkey, ${rowHashSql("s2")} AS s_bin,
         |    md5(concat_ws('|', s2.o_custkey, lower(s2.o_orderstatus),
         |      CAST(CAST(s2.o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
         |      lower(s2.o_orderpriority))) AS s_ci
         |  FROM s2),
         |b AS (
         |  SELECT o_orderkey, ${rowHashSql("orders")} AS t_bin,
         |    md5(concat_ws('|', orders.o_custkey,
         |      lower(orders.o_orderstatus),
         |      CAST(CAST(orders.o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
         |      lower(orders.o_orderpriority))) AS t_ci
         |  FROM orders),
         |j AS (
         |  SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
         |    CASE WHEN b.t_bin IS NULL THEN 'I'
         |         WHEN a.s_bin IS NULL THEN 'D'
         |         WHEN a.s_bin = b.t_bin THEN 'S'
         |         WHEN a.s_ci = b.t_ci THEN 'CASE_ONLY'
         |         ELSE 'U' END AS op_class
         |  FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
         |SELECT op_class, COUNT(*) AS n,
         |  CAST(SUM(CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)),
         |    1, 15)) AS BIGINT) % 1000000000) AS BIGINT) AS key_digest,
         |  op_class IN ('I', 'D', 'U') AS ships_under_ci,
         |  op_class IN ('I', 'D', 'U', 'CASE_ONLY') AS ships_under_cs
         |FROM j GROUP BY op_class ORDER BY op_class""".stripMargin,

    "y30_dq_constraints" ->
      s"""WITH $sourceCte,
         |agg AS (
         |  SELECT COUNT(*) AS total,
         |    COUNT(CASE WHEN o_orderkey IS NULL THEN 1 END) AS v0,
         |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS v1,
         |    COUNT(CASE WHEN o_orderstatus IS NULL
         |      OR o_orderstatus NOT IN ('O', 'F') THEN 1 END) AS v2,
         |    COUNT(CASE WHEN o_totalprice IS NULL
         |      OR NOT (o_totalprice BETWEEN 0 AND 300000) THEN 1 END) AS v3,
         |    COUNT(CASE WHEN o_orderpriority IS NULL
         |      OR NOT regexp_matches(o_orderpriority, '^[1-3]-')
         |      THEN 1 END) AS v4,
         |    COUNT(*) - COUNT(DISTINCT o_custkey) AS v5
         |  FROM src),
         |fk AS (
         |  SELECT COUNT(*) AS v6 FROM src s
         |  WHERE s.o_custkey IS NOT NULL AND NOT EXISTS (
         |    SELECT 1 FROM customer c
         |    WHERE c.c_custkey = s.o_custkey AND c.c_custkey % 5 <> 0)),
         |sel AS (SELECT * FROM agg CROSS JOIN fk)
         |SELECT 0 AS check_idx, 'not_null(o_orderkey)' AS "constraint",
         |  v0 AS violations, total, v0 = 0 AS pass FROM sel
         |UNION ALL SELECT 1, 'unique(o_orderkey)', v1, total, v1 = 0 FROM sel
         |UNION ALL SELECT 2, 'in_set(o_orderstatus)', v2, total, v2 = 0
         |  FROM sel
         |UNION ALL SELECT 3, 'in_range(o_totalprice)', v3, total, v3 = 0
         |  FROM sel
         |UNION ALL SELECT 4, 'matches(o_orderpriority)', v4, total, v4 = 0
         |  FROM sel
         |UNION ALL SELECT 5, 'unique(o_custkey)', v5, total, v5 = 0 FROM sel
         |UNION ALL SELECT 6, 'fk_exists(o_custkey)', v6, total, v6 = 0
         |  FROM sel""".stripMargin,

    "y27_migration_plan" ->
      """WITH cur AS (
        |  SELECT lower(column_name) AS col,
        |    CASE column_type
        |      WHEN 'BIGINT' THEN 'BIGINT'
        |      WHEN 'INTEGER' THEN 'INT'
        |      WHEN 'SMALLINT' THEN 'SMALLINT'
        |      WHEN 'VARCHAR' THEN 'NVARCHAR(MAX)'
        |      WHEN 'DOUBLE' THEN 'FLOAT'
        |      WHEN 'FLOAT' THEN 'REAL'
        |      WHEN 'DATE' THEN 'DATE'
        |      WHEN 'TIMESTAMP' THEN 'DATETIME2(6)'
        |    END AS ft
        |  FROM (DESCRIBE orders)),
        |des(col, tt) AS (
        |  SELECT * FROM (VALUES
        |    ('o_orderkey', 'BIGINT'),
        |    ('o_custkey', 'DECIMAL(28,0)'),
        |    ('o_orderstatus', 'NVARCHAR(MAX)'),
        |    ('o_totalprice', 'DECIMAL(12,2)'),
        |    ('o_orderdate', 'BIGINT'),
        |    ('o_channel', 'NVARCHAR(MAX)'))),
        |j AS (
        |  SELECT coalesce(c.col, d.col) AS col, c.ft, d.tt
        |  FROM cur c FULL OUTER JOIN des d ON c.col = d.col),
        |cls AS (
        |  SELECT col, ft, tt,
        |    CASE
        |      WHEN ft IS NULL THEN 'add'
        |      WHEN tt IS NULL THEN 'drop'
        |      WHEN ft = tt THEN 'same'
        |      WHEN ft = 'BIGINT' AND tt LIKE 'DECIMAL(%' AND
        |        CAST(regexp_extract(tt, 'DECIMAL\((\d+),(\d+)\)', 1) AS INT)
        |          - CAST(regexp_extract(tt, 'DECIMAL\((\d+),(\d+)\)', 2)
        |              AS INT) >= 19 THEN 'alter_safe'
        |      WHEN ft = 'BIGINT' AND tt LIKE 'DECIMAL(%' THEN 'alter_lossy'
        |      WHEN ft = 'INT' AND tt = 'BIGINT' THEN 'alter_safe'
        |      WHEN ft = 'SMALLINT' AND tt IN ('INT', 'BIGINT')
        |        THEN 'alter_safe'
        |      WHEN ft = 'REAL' AND tt = 'FLOAT' THEN 'alter_safe'
        |      WHEN ft = 'DATE' AND tt = 'DATETIME2(6)' THEN 'alter_safe'
        |      WHEN tt = 'NVARCHAR(MAX)' THEN 'alter_safe'
        |      WHEN ft = 'FLOAT' AND tt LIKE 'DECIMAL(%' THEN 'alter_lossy'
        |      WHEN ft = 'DATETIME2(6)' AND tt = 'DATE' THEN 'alter_lossy'
        |      WHEN ft = 'BIGINT' AND tt IN ('INT', 'SMALLINT')
        |        THEN 'alter_lossy'
        |      WHEN ft = 'FLOAT' AND tt = 'REAL' THEN 'alter_lossy'
        |      ELSE 'manual'
        |    END AS k
        |  FROM j)
        |SELECT
        |  CASE k WHEN 'add' THEN 1 WHEN 'alter_safe' THEN 2
        |         WHEN 'alter_lossy' THEN 2 WHEN 'manual' THEN 3
        |         ELSE 4 END AS step_order,
        |  CASE k WHEN 'add' THEN 'add' WHEN 'manual' THEN 'manual'
        |         WHEN 'drop' THEN 'drop' ELSE 'alter' END AS action,
        |  col AS "column", ft AS from_type, tt AS to_type,
        |  CASE k WHEN 'add' THEN 'safe' WHEN 'alter_safe' THEN 'safe'
        |         WHEN 'alter_lossy' THEN 'lossy' WHEN 'drop' THEN 'lossy'
        |         ELSE 'incompatible' END AS safety,
        |  CASE k
        |    WHEN 'add' THEN 'ALTER TABLE [dbo].[orders] ADD [' || col
        |      || '] ' || tt || ' NULL'
        |    WHEN 'manual' THEN NULL
        |    WHEN 'drop' THEN 'ALTER TABLE [dbo].[orders] DROP COLUMN ['
        |      || col || ']'
        |    ELSE 'ALTER TABLE [dbo].[orders] ALTER COLUMN [' || col
        |      || '] ' || tt
        |  END AS ddl
        |FROM cls WHERE k <> 'same'
        |ORDER BY step_order, col""".stripMargin,

    "y19_changelog_audit" ->
      s"""WITH $logCte,
         |sq AS (
         |  SELECT pk, op, ts,
         |    LAG(op) OVER (PARTITION BY pk ORDER BY version) AS prev_op,
         |    LAG(ts) OVER (PARTITION BY pk ORDER BY version) AS prev_ts
         |  FROM lg),
         |sa AS (
         |  SELECT COUNT(DISTINCT pk) AS n_keys,
         |    CAST(SUM(CASE WHEN prev_op = 'D' AND op = 'U' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_upd_after_del,
         |    CAST(SUM(CASE WHEN prev_ts > ts THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_ts_inversions
         |  FROM sq),
         |dm AS (
         |  SELECT pk, date_trunc('day', ts) AS day, COUNT(*) AS mult
         |  FROM lg GROUP BY 1, 2),
         |da AS (
         |  SELECT CAST(SUM(CASE WHEN mult > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_dup_day_slots,
         |    COUNT(DISTINCT CASE WHEN mult > 1 THEN pk END) AS n_dup_day_keys
         |  FROM dm)
         |SELECT * FROM sa CROSS JOIN da""".stripMargin,

    "y20_hierarchical_narrow" ->
      s"""WITH $monthDriftCte,
         |ys AS (
         |  SELECT CAST(EXTRACT(year FROM mdr.o_orderdate) AS INTEGER) AS order_year,
         |    COUNT(*) AS src_rows,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      md5(concat_ws('|', mdr.o_orderkey, ${rowHashSql("mdr")})), 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS src_digest
         |  FROM mdr GROUP BY 1),
         |yt AS (
         |  SELECT CAST(EXTRACT(year FROM orders.o_orderdate) AS INTEGER) AS order_year,
         |    COUNT(*) AS tgt_rows,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      md5(concat_ws('|', orders.o_orderkey, ${rowHashSql("orders")})), 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS tgt_digest
         |  FROM orders GROUP BY 1),
         |yd AS (
         |  SELECT COALESCE(ys.order_year, yt.order_year) AS order_year,
         |    NOT (COALESCE(src_rows, 0) = COALESCE(tgt_rows, 0) AND
         |         COALESCE(src_digest, -1) = COALESCE(tgt_digest, -1)) AS year_dirty
         |  FROM ys FULL OUTER JOIN yt ON ys.order_year = yt.order_year),
         |ms AS (
         |  SELECT CAST(EXTRACT(year FROM mdr.o_orderdate) AS INTEGER) AS order_year,
         |    CAST(EXTRACT(month FROM mdr.o_orderdate) AS INTEGER) AS order_month,
         |    COUNT(*) AS src_rows,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      md5(concat_ws('|', mdr.o_orderkey, ${rowHashSql("mdr")})), 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS src_digest
         |  FROM mdr
         |  WHERE CAST(EXTRACT(year FROM mdr.o_orderdate) AS INTEGER) IN
         |        (SELECT order_year FROM yd WHERE year_dirty)
         |  GROUP BY 1, 2),
         |mt AS (
         |  SELECT CAST(EXTRACT(year FROM orders.o_orderdate) AS INTEGER) AS order_year,
         |    CAST(EXTRACT(month FROM orders.o_orderdate) AS INTEGER) AS order_month,
         |    COUNT(*) AS tgt_rows,
         |    CAST(SUM(CAST(concat('0x', substr(
         |      md5(concat_ws('|', orders.o_orderkey, ${rowHashSql("orders")})), 1, 15)) AS BIGINT)
         |      % 1000000000) AS BIGINT) AS tgt_digest
         |  FROM orders
         |  WHERE CAST(EXTRACT(year FROM orders.o_orderdate) AS INTEGER) IN
         |        (SELECT order_year FROM yd WHERE year_dirty)
         |  GROUP BY 1, 2),
         |ml AS (
         |  SELECT COALESCE(ms.order_year, mt.order_year) AS order_year,
         |    COALESCE(ms.order_month, mt.order_month) AS order_month,
         |    NOT (COALESCE(ms.src_rows, 0) = COALESCE(mt.tgt_rows, 0) AND
         |         COALESCE(ms.src_digest, -1) = COALESCE(mt.tgt_digest, -1)) AS month_dirty,
         |    COALESCE(ms.src_rows, 0) AS src_rows
         |  FROM ms FULL OUTER JOIN mt
         |    ON ms.order_year = mt.order_year AND ms.order_month = mt.order_month)
         |SELECT order_year, order_month, month_dirty,
         |  CASE WHEN month_dirty THEN src_rows ELSE 0 END AS n_ship_rows
         |FROM ml ORDER BY order_year, order_month""".stripMargin
  )

  /** Y9 kernel, public: maintain a per-`key` summary (sum of `value`,
    * row count) across a source/target snapshot pair WITHOUT recomputing
    * it — per-key deltas come from the changed rows only (full-outer on
    * `pk`, −old for vanished/changed target rows, +new for appeared/
    * changed source rows) and merge into the old aggregate with one more
    * outer join. Decimal(28,2) arithmetic makes the incremental result
    * bit-identical to a direct `source.groupBy(key).agg(...)` (float
    * addition would drift) — the law PropertySuite pins on random
    * mutations. At 100 TB: touches only the rows a change-log names;
    * both joins are PK-shuffles AQE can skew-split.
    * Output: (key, sum_value: double, n_rows: long), keys with no
    * surviving rows dropped. Assumes non-null `pk` and `value` (a NULL
    * value would be indistinguishable from an absent row in the
    * full-outer change detection — pre-filter or sentinel such columns)
    * and `pk` UNIQUE within each snapshot: a duplicated pk multiplies
    * rows through the full-outer change join, double-subtracting the old
    * aggregate and silently corrupting the maintained summary (dedupe
    * upstream — there is no cheap in-join guard);
    * NULL group keys are supported (null-safe comparisons throughout,
    * matching groupBy's null-as-a-group semantics).
    */
  def incrementalAgg(source: DataFrame, target: DataFrame,
                     pk: String, key: String, value: String): DataFrame = {
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(28,2)")
    val tgt = target.select(col(pk), col(key), col(value))
    val src = source.select(col(pk), col(key), col(value))
    // the maintained state: aggregate of the OLD snapshot (in decimal)
    val oldAgg = tgt.groupBy(key)
      .agg(sum(dec(col(value))).as("sum_value"), count(lit(1)).as("n_rows"))
    // changed rows only: inserts, deletes, value updates, key moves.
    // Key comparison is NULL-SAFE: groupBy treats NULL as a key, so a
    // move between NULL and a real key must register as a change (plain
    // =!= evaluates to NULL there and the filter would drop the row).
    val j = src.select(col(pk), col(key).as("s_k"), col(value).as("s_v"))
      .join(tgt.select(col(pk), col(key).as("t_k"), col(value).as("t_v")),
            Seq(pk), "full_outer")
      .filter(col("s_v").isNull || col("t_v").isNull ||
              col("s_v") =!= col("t_v") || !(col("s_k") <=> col("t_k")))
    val minus = j.filter(col("t_v").isNotNull)
      .select(col("t_k").as(key), (-dec(col("t_v"))).as("dv"),
              lit(-1L).as("dn"))
    val plus = j.filter(col("s_v").isNotNull)
      .select(col("s_k").as(key), dec(col("s_v")).as("dv"), lit(1L).as("dn"))
    val delta = minus.unionByName(plus).groupBy(key)
      .agg(sum(col("dv")).as("d_value"), sum(col("dn")).as("d_n"))
    // null-safe merge join for the same reason (a NULL-key aggregate row
    // must meet its NULL-key delta row, not cross-produce two rows)
    val oa = oldAgg.withColumnRenamed(key, "o_k")
    val dl = delta.withColumnRenamed(key, "d_k")
    oa.join(dl, oa("o_k") <=> dl("d_k"), "full_outer")
      .select(coalesce(col("o_k"), col("d_k")).as(key),
        (coalesce(col("sum_value"), lit(0).cast("decimal(28,2)")) +
         coalesce(col("d_value"), lit(0).cast("decimal(28,2)")))
          .cast("double").as("sum_value"),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_rows"))
      .filter(col("n_rows") > 0)
  }
}

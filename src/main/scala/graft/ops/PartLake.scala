package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Y49: PARTITIONED PUBLISHED TABLES — the y36–y46 lake with a Hive
  * partition dimension inside every version dir. At 100 TB a published
  * fact table is almost never flat: it is date- or status-partitioned,
  * and both the readers and the mutation path must exploit that before
  * any finer pruning.
  *
  *   v{n}/
  *     part=<a>/part-*.parquet     ← S12's layout, per version
  *     part=<b>/part-*.parquet
  *     _file_stats                 ← manifest rows carry (file, part,
  *                                    kmin, kmax, n_rows, dir, bytes)
  *                                    with `file` RELATIVE
  *                                    (part=<v>/<name>) and `dir` the
  *                                    VERSION DIR the file physically
  *                                    lives in (r13 zero-copy carry)
  *
  * What each side gains:
  *  - READERS: a partition-filtered scan of a published version prunes
  *    to matching subdirs via the manifest's partition values — zero
  *    data files listed or opened outside the partition
  *    (PlanAuditSuite pins `PartitionFilters` + the scanned-file
  *    count). The version pointer, rollback, GC, leases — all of
  *    y36/y37/y47 — work unchanged: they never look inside a version.
  *  - MUTATIONS: [[cowApplyChanges]] prunes affected files by
  *    PARTITION EQUALITY FIRST, key span second. This ordering is not
  *    cosmetic: every partition typically spans the SAME key range
  *    (each day holds the full order-key domain), so span-only pruning
  *    (flat y38) would touch one file per partition for every changed
  *    key — ~|partitions|× write amplification. With the partition in
  *    the manifest the rewrite set is exactly (touched partitions) ×
  *    (touched spans); the law test plants overlapping spans across
  *    partitions and pins the untouched partition's files carry as
  *    manifest REFERENCES — zero bytes moved (r13; pre-r13 this was a
  *    physical per-file copy, O(table) per publish at scale).
  *
  * Row identity here is (partition value, key): a row "moving" between
  * partitions is a D in the old partition + an I in the new one, the
  * same contract Hive/Delta dynamic-partition overwrites force, and
  * the reason the cardinality of the manifest join stays churn-sized.
  * Schema evolution sidecars (y43) are not plumbed through this
  * variant — evolve, then re-publish partitioned.
  */
object PartLake {

  final case class PartCowReport(published: Boolean,
      nFilesTotal: Int, nFilesRewritten: Int,
      nPartsTotal: Int, nPartsTouched: Int,
      rewritten: Seq[String], untouched: Seq[String])

  private def relFile = regexp_extract(input_file_name(),
    "([^/]+=[^/]+/[^/]+)$", 1)

  private def mintName(dirName: String): String =
    if (dirName.startsWith("_staging_")) dirName.stripPrefix("_staging_")
    else dirName

  /** Canonical partitioned-manifest column order. */
  private val Cols =
    Seq("file", "part", "dir", "kmin", "kmax", "n_rows", "bytes")

  /** Two-level listing of a partitioned dir: relative file → size. */
  private def partLens(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Map[String, Long] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    if (!fs.exists(p)) Map.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .flatMap(pd => fs.listStatus(pd.getPath).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .map(st =>
          s"${pd.getPath.getName}/${st.getPath.getName}" -> st.getLen))
      .toMap
  }

  /** Two-level listing keeping the statuses (footer-stats sweep
    * input): (status, relative name `part=<v>/<file>`). */
  private def partStatuses(fs: org.apache.hadoop.fs.FileSystem,
      dir: String): Seq[(org.apache.hadoop.fs.FileStatus, String)] = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .flatMap { pd =>
        val pn = pd.getPath.getName
        fs.listStatus(pd.getPath).toSeq
          .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
          .map(st => (st, s"$pn/${st.getPath.getName}"))
      }
  }

  /** The partition VALUE a relative manifest name encodes — unescaped
    * exactly as the staged `partitionBy` write escaped it, so it
    * matches the `col(part).cast("string")` the scan fallback emits. */
  private def partOfRel(name: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .unescapePathName(name.split("/", 2)(0).split("=", 2)(1))

  /** Manifest rows for a partitioned dir's local files — parquet
    * FOOTER stats first (zero Spark jobs; see [[FooterStats]]), None →
    * caller falls back to the pre-r13 grouped scan. Rows in [[Cols]]
    * order minted for `vName`. */
  private def footerRows(s: SparkSession, dir: String, key: String,
      vName: String,
      expectKt: Option[org.apache.spark.sql.types.DataType])
      : Option[(org.apache.spark.sql.types.DataType,
                Array[org.apache.spark.sql.Row])] = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val sts = partStatuses(fs, dir)
    if (sts.isEmpty)
      return Some((expectKt.getOrElse(
        org.apache.spark.sql.types.LongType), Array.empty))
    val relOf = sts.map(t => t._1.getPath.toString -> t._2).toMap
    FooterStats.sweep(s.sparkContext.hadoopConfiguration, sts.map(_._1),
      key, st => relOf(st.getPath.toString)) match {
      case Some((kt, stats)) if expectKt.forall(_ == kt) =>
        Some((kt, stats.map { f =>
          org.apache.spark.sql.Row(f.name, partOfRel(f.name), vName,
            f.kmin, f.kmax, f.nRows, f.bytes)
        }.toArray))
      case _ => None
    }
  }

  /** Publish one partitioned version: stage with `partitionBy`, then
    * the shared y36 validate→rename→pointer-commit tail (same staging
    * invisibility, same rename-free `_ptr_gen_*` commit, same rollback
    * and GC story as every flat publish). */
  def publishPartitioned(s: SparkSession, df: DataFrame, root: String,
      version: Int, part: String,
      validate: DataFrame => Boolean): Boolean = {
    df.write.partitionBy(part).mode("overwrite")
      .parquet(s"$root/_staging_v$version")
    Sync.publishStagedDir(s, root, version, validate)
  }

  /** Per-file manifest for a partitioned version dir: one pass over
    * the data grouped by (relative file, partition value) + ONE
    * two-level listing for sizes. The partition value rides as a
    * STRING (its path rendering) so the manifest join never depends on
    * the column's data type; `dir` names the version dir each file
    * physically lives in (all-local here — this writer only ever sees
    * a freshly-staged dir). */
  private def partManifestSchema(
      kt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("part", StringType, nullable = false),
      StructField("dir", StringType, nullable = false),
      StructField("kmin", kt, nullable = true),
      StructField("kmax", kt, nullable = true),
      StructField("n_rows", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false)))
  }

  /** The pre-r13 one-job grouped scan (fallback when footer stats
    * aren't exactness-safe for the key type). */
  private def scanRows(s: SparkSession, dir: String, key: String,
      part: String, vName: String,
      lens: Map[String, Long])
      : (org.apache.spark.sql.types.DataType,
         Array[org.apache.spark.sql.Row]) = {
    val agg = s.read.parquet(dir)
      .groupBy(relFile.as("file"), col(part).cast("string").as("part"))
      .agg(min(col(key)).as("kmin"), max(col(key)).as("kmax"),
        count(lit(1)).as("n_rows"))
    (agg.schema("kmin").dataType, agg.collect().map { r =>
      org.apache.spark.sql.Row(r.getString(0), r.getString(1), vName,
        r.get(2), r.get(3), r.getLong(4),
        lens.getOrElse(r.getString(0), -1L))
    })
  }

  def writeFileStats(s: SparkSession, dir: String, key: String,
      part: String): Unit = {
    require(!Seq("file", "part", "dir", "kmin", "kmax", "n_rows",
      "bytes").contains(part),
      s"writeFileStats: partition column '$part' collides with a manifest column")
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val vName = mintName(p.getName)
    // footer stats first (zero Spark jobs; see FooterStats), scan
    // fallback second
    val (kt, rows) = footerRows(s, dir, key, vName, None)
      .getOrElse(scanRows(s, dir, key, part, vName, partLens(fs, dir)))
    s.createDataFrame(java.util.Arrays.asList(rows: _*),
        partManifestSchema(kt))
      .write.mode("overwrite").parquet(s"$dir/_file_stats")
  }

  /** Scan + size the NEW files a staged partitioned version just
    * wrote, union the CARRIED rows verbatim (still naming the dirs
    * their files live in), write the staged `_file_stats`. Returns the
    * new rows. */
  private def writeStagedManifest(s: SparkSession, root: String,
      toVersion: Int, key: String, part: String, carried: DataFrame)
      : Array[org.apache.spark.sql.Row] = {
    import org.apache.hadoop.fs.Path
    val staging = s"$root/_staging_v$toVersion"
    val fs = new Path(staging)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new Path(staging))) fs.mkdirs(new Path(staging))
    val carriedN = carried.select(Cols.map(col): _*)
    val carriedKt = carriedN.schema("kmin").dataType
    // footer stats first (zero Spark jobs; the new rows must carry the
    // carried manifest's kmin/kmax type), scan fallback second
    val newRows: Array[org.apache.spark.sql.Row] =
      footerRows(s, staging, key, s"v$toVersion", Some(carriedKt))
        .map(_._2)
        .getOrElse(scanRows(s, staging, key, part, s"v$toVersion",
          partLens(fs, staging))._2)
    s.createDataFrame(java.util.Arrays.asList(newRows: _*),
        carriedN.schema)
      .unionByName(carriedN)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$staging/_file_stats")
    newRows
  }

  /** Read a set of (relative file, physical dir) pairs under their
    * partition layout — one read per DISTINCT source dir (basePath =
    * that dir so the partition column infers), unioned. */
  private def readFiles(s: SparkSession, root: String,
      fd: Seq[(String, String)]): DataFrame =
    fd.groupBy(_._2).toSeq.sortBy(_._1).map { case (d, fl) =>
      s.read.option("basePath", s"$root/$d")
        .parquet(fl.map { case (f, _) => s"$root/$d/$f" }: _*)
    }.reduceLeft(_.unionByName(_))

  /** Copy-on-write apply of a CDC batch (op ∈ I/U/D + `version`
    * ordering column, y38b's shape, rows carrying the partition
    * column) onto a partitioned published version. Pruning is
    * partition-equality THEN key-span against the manifest; rewrites
    * are per-partition `partitionBy` writes; untouched files carry as
    * ZERO-COPY manifest references under their own `part=` identity;
    * one pointer commit publishes. Upserts landing in a partition+span
    * no file owns are the append frontier — including entirely NEW
    * partition values, which materialize as new `part=` subdirs with
    * no rewrite at all. */
  def cowApplyChanges(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int, key: String, part: String,
      changes: DataFrame): PartCowReport = {
    import org.apache.hadoop.fs.Path
    require(!Seq("file", "part", "dir", "kmin", "kmax", "n_rows",
      "bytes", "op", "version").contains(part),
      s"cowApplyChanges: partition column '$part' collides with a " +
        "manifest/changelog column")
    val fs = new Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // ONE manifest read; further uses are driver-local (see
    // Sync.cowApply — pre-r13 each use re-read the parquet sidecar)
    val statsL = Sync.manifestLocal(s, root, s"v$fromVersion")
    val stats = statsL.df(s)
    val wv = Window.partitionBy(part, key).orderBy(col("version").desc)
    // persist the resolved batch for the mutation's duration — it is
    // consumed 4x (prune ids, span routing x2 subtrees, the CDF stage)
    // and each consumption re-derived it pre-r14 (see Sync.cowApplyChanges)
    val latest = changes.withColumn("__rn", row_number().over(wv))
      .filter(col("__rn") === 1).drop("__rn").persist()
    val upserts = latest.filter(col("op") =!= "D").drop("op", "version")
    val changeIds = latest.select(col(part), col(key)).distinct()
    // the prune: partition equality FIRST (kills every same-span file
    // in other partitions), span second — both against the broadcast,
    // metadata-sized manifest; the table itself is never scanned
    val affectedFD = changeIds
      .join(broadcast(stats),
        col(part).cast("string") === col("part") &&
          col(key) >= col("kmin") && col(key) <= col("kmax"))
      .select("file", "dir").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._1).toSeq
    val affected = affectedFD.map(_._1)
    val affectedSet = affected.toSet
    val allFiles = {
      val (fi, pi) = (statsL.schema.fieldIndex("file"),
        statsL.schema.fieldIndex("part"))
      statsL.rows.map(r => r.getString(fi) -> r.getString(pi))
        .sortBy(_._1)
    }
    val untouched = allFiles.map(_._1).diff(affected)
    val staging = new Path(s"$root/_staging_v$toVersion")
    fs.delete(staging, true)
    require(allFiles.nonEmpty,
      s"cowApplyChanges: $root/v$fromVersion has no manifest files")
    val survivors =
      if (affectedFD.isEmpty) upserts.limit(0)
      else readFiles(s, root, affectedFD)
        .join(broadcast(changeIds), Seq(part, key), "left_anti")
    val cols = survivors.columns.toSeq
    // span routing within the partition: an upsert joins the rewrite
    // of the file whose (partition, range) owns it; everything else —
    // new spans AND new partitions — is the frontier
    val spanned = upserts.join(broadcast(stats),
      col(part).cast("string") === col("part") &&
        col(key) >= col("kmin") && col(key) <= col("kmax"), "left")
    val manifestCols =
      Seq("file", "part", "dir", "kmin", "kmax", "n_rows", "bytes")
    val inSpan = spanned.filter(col("file").isNotNull)
      .drop(manifestCols: _*).distinct()
    val frontier = spanned.filter(col("file").isNull)
      .drop(manifestCols: _*)
    survivors.select(cols.map(col): _*)
      .unionByName(inSpan.select(cols.map(col): _*))
      .unionByName(frontier.select(cols.map(col): _*))
      .repartitionByRange(math.max(affected.length, 1) + 1,
        col(part), col(key))
      .sortWithinPartitions(part, key)
      .write.partitionBy(part).mode("overwrite").parquet(staging.toString)
    // zero-copy carry: untouched files ride as manifest references
    // (filtered by the churn-sized affected set, driver-local)
    val carriedL = statsL.filterFiles(!affectedSet(_))
    val newStatsRows = writeStagedManifest(s, root, toVersion, key,
      part, carriedL.df(s))
    // Y55 feed on the partitioned path: the resolved batch, partition
    // column included (a cross-partition move is its D+I pair here, so
    // downstream consumers see exactly the two events row identity
    // (partition, key) implies)
    if (Sync.cdfEnabled(fs, root)) {
      val logical = org.apache.spark.sql.types.StructType(
        latest.drop("op", "version").schema.fields)
      Sync.stageChanges(s, staging.toString, logical,
        latest.drop("version"), toVersion)
    }
    // non-emptiness answered from the manifest rows just assembled —
    // Σ n_rows, zero reads (see Sync.manifestValidate)
    val ok = Sync.publishStagedDir(s, root, toVersion,
      Sync.manifestValidate(newStatsRows.map(_.getLong(5)).sum, carriedL))
    latest.unpersist(blocking = false)
    val partOf = allFiles.toMap
    val touchedParts = affected.flatMap(partOf.get).distinct
    PartCowReport(ok, allFiles.length, affected.length,
      allFiles.map(_._2).distinct.length, touchedParts.length,
      affected, untouched)
  }

  /** Y39 × Y49: PARTITIONED INCREMENTAL COMPACTION — the maintenance
    * verb a partitioned 100 TB table needs on the same cadence as the
    * flat compactor. Bin-packing runs PER PARTITION (files never merge
    * across partition values — that would break the layout contract);
    * within each partition, files smaller than half the target group
    * into ADJACENT-key-range bins (sorted by kmin, so merged files
    * keep narrow spans and partition+span pruning keeps working); only
    * groups of ≥2 small files rewrite. Everything else — adequately
    * sized files AND every file of untouched partitions — carries as
    * zero-copy manifest references. Planning is metadata-only: names,
    * partitions, dirs, and sizes all come from the manifest (zero
    * listing RPCs). The rewrite reads each group under its partition
    * layout and lands through one `partitionBy` staged write; one
    * pointer commit publishes; content is invariant (the law test pins
    * the digest). `CALL <cat>.system.compact` routes here for
    * partitioned tables. */
  def compact(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int, key: String, part: String,
      targetBytes: Long): PartCowReport = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // ONE manifest read; planning is driver-local — manifest-scale
    val statsL = Sync.manifestLocal(s, root, s"v$fromVersion")
    val entries = {
      val (fi, pi, di, ki, bi) = (statsL.schema.fieldIndex("file"),
        statsL.schema.fieldIndex("part"), statsL.schema.fieldIndex("dir"),
        statsL.schema.fieldIndex("kmin"), statsL.schema.fieldIndex("bytes"))
      statsL.rows
        .map(r => (r.getString(fi), r.getString(pi), r.getString(di),
          r.getLong(bi), r.get(ki)))
        .sortWith { (a, b) => // (part, kmin) — null kmin first
          if (a._2 != b._2) a._2 < b._2
          else if (a._5 == null) b._5 != null
          else if (b._5 == null) false
          else a._5.asInstanceOf[Comparable[Any]].compareTo(b._5) < 0
        }
        .map(t => (t._1, t._2, t._3, t._4))
    }
    require(entries.nonEmpty,
      s"compact: $root/v$fromVersion has no manifest files")
    val lens: Map[String, Long] =
      if (entries.forall(_._4 >= 0L))
        entries.map(e => e._1 -> e._4).toMap
      else entries.map(_._3).distinct.toSeq
        .flatMap(d => partLens(fs, s"$root/$d")).toMap
    val dirOf = entries.map(e => e._1 -> e._3).toMap
    // per-partition span-adjacent bin-pack (entries arrive sorted by
    // (part, kmin) from the engine)
    val groups = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    var curPart: String = null
    var cur = scala.collection.mutable.ArrayBuffer[String]()
    var curBytes = 0L
    def flush(): Unit = {
      if (cur.nonEmpty) { groups += cur.toSeq; cur.clear(); curBytes = 0L }
    }
    entries.foreach { case (f, pv, _, _) =>
      if (pv != curPart) { flush(); curPart = pv }
      val len = lens(f)
      if (len < targetBytes / 2 && curBytes + len <= targetBytes) {
        cur += f; curBytes += len
      } else {
        flush()
        if (len < targetBytes / 2) { cur += f; curBytes = len }
      }
    }
    flush()
    val rewriteGroups = groups.filter(_.length >= 2).toSeq
    val rewritten = rewriteGroups.flatten.sorted
    val rewrittenSet = rewritten.toSet
    val untouched =
      entries.map(_._1).filterNot(rewrittenSet).toSeq.sorted
    val staging = new Path(s"$root/_staging_v$toVersion")
    fs.delete(staging, true)
    if (rewriteGroups.isEmpty) fs.mkdirs(staging)
    rewriteGroups.foreach { g =>
      readFiles(s, root, g.map(f => (f, dirOf(f))))
        .repartitionByRange(1, col(key)).sortWithinPartitions(key)
        .write.partitionBy(part).mode("append").parquet(staging.toString)
    }
    val carriedL = statsL.filterFiles(!rewrittenSet(_))
    val newStatsRows = writeStagedManifest(s, root, toVersion, key,
      part, carriedL.df(s))
    // layout-only publish: an empty feed states "no logical change"
    if (Sync.cdfEnabled(fs, root)) {
      val logical = readFiles(s, root,
        Seq((entries.head._1, entries.head._3))).schema
      Sync.stageChanges(s, staging.toString, logical,
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(logical.fields :+
            org.apache.spark.sql.types.StructField("op",
              org.apache.spark.sql.types.StringType))),
        toVersion)
    }
    val ok = Sync.publishStagedDir(s, root, toVersion,
      Sync.manifestValidate(newStatsRows.map(_.getLong(5)).sum, carriedL))
    val partsAll = entries.map(_._2).distinct
    val partOf = entries.map(e => e._1 -> e._2).toMap
    PartCowReport(ok, entries.length, rewritten.length,
      partsAll.length, rewritten.flatMap(partOf.get).distinct.length,
      rewritten, untouched)
  }

  /** Net change-data-feed between two partitioned versions — y41's
    * contract with the partition dimension in the diff unit: a file's
    * identity is its (relative path, physical dir) manifest row, so a
    * zero-copy carried `part=x/f` never scans, and the scan set is
    * automatically partition-local (a version step that touched one
    * partition diffs one partition's files). Emits one net row per
    * (partition, key): I/U with the post-image, D with the pre-image. */
  def lakeChanges(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int, key: String, part: String)
      : (DataFrame, Int, Int) = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    def files(v: Int): Map[String, String] = // rel file -> physical dir
      if (fs.exists(new Path(s"$root/v$v/_file_stats")))
        Sync.manifestDf(s, root, s"v$v").select("file", "dir").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
      else
        partLens(fs, s"$root/v$v").keysIterator
          .map(_ -> s"v$v").toMap
    val (fromF, toF) = (files(fromVersion), files(toVersion))
    val carried = fromF.keySet.intersect(toF.keySet)
      .filter(f => fromF(f) == toF(f))
    val fromOnly = (fromF.keySet -- carried).toSeq.sorted
    val toOnly = (toF.keySet -- carried).toSeq.sorted
    def side(fl: Seq[String], own: Map[String, String]): DataFrame = {
      if (fl.isEmpty) { // schema-only read from one of the version's files
        val (f, d) = own.head
        readFiles(s, root, Seq((f, d))).limit(0)
      } else readFiles(s, root, fl.map(f => (f, own(f))))
    }
    val pre = side(fromOnly, fromF)
    val post = side(toOnly, toF)
    val dataCols = pre.columns.toSeq.filterNot(c => c == key || c == part)
    val preP = pre.select(col(part) +: col(key) +:
      dataCols.map(c => col(c).as(s"pre_$c")): _*).withColumn("__f", lit(1))
    val postP = post.select(col(part) +: col(key) +:
      dataCols.map(c => col(c).as(s"post_$c")): _*).withColumn("__t", lit(1))
    val j = preP.join(postP, Seq(part, key), "full_outer")
    val op = when(col("__f").isNull, "I")
      .when(col("__t").isNull, "D").otherwise("U")
    val changed = dataCols.map(c =>
      !(col(s"pre_$c") <=> col(s"post_$c"))).reduceOption(_ || _)
      .getOrElse(lit(false))
    (j.filter(col("__f").isNull || col("__t").isNull || changed)
      .select(op.as("op") +: col(part) +: col(key) +:
        dataCols.map(c => when(op === "D", col(s"pre_$c"))
          .otherwise(col(s"post_$c")).as(c)): _*),
      fromOnly.size + toOnly.size, fromF.size + toF.size)
  }
}

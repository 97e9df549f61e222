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
  *     _file_stats                 ← manifest rows now carry (file,
  *                                    part, kmin, kmax, n_rows) with
  *                                    `file` RELATIVE (part=<v>/<name>)
  *
  * What each side gains:
  *  - READERS: a partition-filtered scan of a published version prunes
  *    to matching subdirs via Spark's own partition discovery — zero
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
  *    partitions and pins the untouched partition's byte-identity.
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
    * the data grouped by (relative file, partition value). The
    * partition value rides as a STRING (its path rendering) so the
    * manifest join never depends on the column's data type. */
  def writeFileStats(s: SparkSession, dir: String, key: String,
      part: String): Unit = {
    require(!Seq("file", "part", "kmin", "kmax", "n_rows").contains(part),
      s"writeFileStats: partition column '$part' collides with a manifest column")
    s.read.parquet(dir)
      .groupBy(relFile.as("file"), col(part).cast("string").as("part"))
      .agg(min(col(key)).as("kmin"), max(col(key)).as("kmax"),
        count(lit(1)).as("n_rows"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_file_stats")
  }

  /** Copy-on-write apply of a CDC batch (op ∈ I/U/D + `version`
    * ordering column, y38b's shape, rows carrying the partition
    * column) onto a partitioned published version. Pruning is
    * partition-equality THEN key-span against the manifest; rewrites
    * are per-partition `partitionBy` writes; untouched files carry
    * byte-verbatim under their own `part=` subdir; one pointer commit
    * publishes. Upserts landing in a partition+span no file owns are
    * the append frontier — including entirely NEW partition values,
    * which materialize as new `part=` subdirs with no rewrite at all. */
  def cowApplyChanges(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int, key: String, part: String,
      changes: DataFrame): PartCowReport = {
    import org.apache.hadoop.fs.{FileUtil, Path}
    require(!Seq("file", "part", "kmin", "kmax", "n_rows", "op",
      "version").contains(part),
      s"cowApplyChanges: partition column '$part' collides with a " +
        "manifest/changelog column")
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new Path(root).getFileSystem(conf)
    val fromDir = s"$root/v$fromVersion"
    val stats = s.read.parquet(s"$fromDir/_file_stats")
    val wv = Window.partitionBy(part, key).orderBy(col("version").desc)
    val latest = changes.withColumn("__rn", row_number().over(wv))
      .filter(col("__rn") === 1).drop("__rn")
    val upserts = latest.filter(col("op") =!= "D").drop("op", "version")
    val changeIds = latest.select(col(part), col(key)).distinct()
    // the prune: partition equality FIRST (kills every same-span file
    // in other partitions), span second — both against the broadcast,
    // metadata-sized manifest; the table itself is never scanned
    val affected = changeIds
      .join(broadcast(stats),
        col(part).cast("string") === col("part") &&
          col(key) >= col("kmin") && col(key) <= col("kmax"))
      .select("file").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val allFiles = stats.select("file", "part").collect()
      .map(r => r.getString(0) -> r.getString(1)).sortBy(_._1)
    val untouched = allFiles.map(_._1).diff(affected)
    val staging = new Path(s"$root/_staging_v$toVersion")
    fs.delete(staging, true)
    require(allFiles.nonEmpty,
      s"cowApplyChanges: $fromDir has no manifest files")
    val survivors =
      if (affected.isEmpty) upserts.limit(0)
      else s.read.option("basePath", fromDir)
        .parquet(affected.map(f => s"$fromDir/$f"): _*)
        .join(broadcast(changeIds), Seq(part, key), "left_anti")
    val cols = survivors.columns.toSeq
    // span routing within the partition: an upsert joins the rewrite
    // of the file whose (partition, range) owns it; everything else —
    // new spans AND new partitions — is the frontier
    val spanned = upserts.join(broadcast(stats),
      col(part).cast("string") === col("part") &&
        col(key) >= col("kmin") && col(key) <= col("kmax"), "left")
    val inSpan = spanned.filter(col("file").isNotNull)
      .drop("file", "part", "kmin", "kmax", "n_rows").distinct()
    val frontier = spanned.filter(col("file").isNull)
      .drop("file", "part", "kmin", "kmax", "n_rows")
    survivors.select(cols.map(col): _*)
      .unionByName(inSpan.select(cols.map(col): _*))
      .unionByName(frontier.select(cols.map(col): _*))
      .repartitionByRange(math.max(affected.length, 1) + 1,
        col(part), col(key))
      .sortWithinPartitions(part, key)
      .write.partitionBy(part).mode("overwrite").parquet(staging.toString)
    // stats of the STAGED (new) files only — computed before the
    // verbatim carries land so the scan covers just the rewrite
    val newStatsRows = s.read.parquet(staging.toString)
      .groupBy(relFile.as("file"), col(part).cast("string").as("part"))
      .agg(min(col(key)).as("kmin"), max(col(key)).as("kmax"),
        count(lit(1)).as("n_rows"))
      .collect()
    untouched.foreach { f =>
      val dst = new Path(s"$staging/$f")
      fs.mkdirs(dst.getParent)
      FileUtil.copy(fs, new Path(s"$fromDir/$f"), fs, dst, false, conf)
    }
    val carried = stats.filter(col("file").isin(untouched: _*))
    s.createDataFrame(
        s.sparkContext.parallelize(newStatsRows.toIndexedSeq, 1),
        carried.schema).unionByName(carried)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$staging/_file_stats")
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
    val ok = Sync.publishStagedDir(s, root, toVersion, _.head(1).nonEmpty)
    val partOf = allFiles.toMap
    val touchedParts = affected.flatMap(partOf.get).distinct
    PartCowReport(ok, allFiles.length, affected.length,
      allFiles.map(_._2).distinct.length, touchedParts.length,
      affected, untouched)
  }

  /** Net change-data-feed between two partitioned versions — y41's
    * contract with the partition dimension in the diff unit: a file's
    * identity is its RELATIVE path, so a carried `part=x/f` never
    * scans, and the scan set is automatically partition-local (a
    * version step that touched one partition diffs one partition's
    * files). Emits one net row per (partition, key): I/U with the
    * post-image, D with the pre-image. */
  def lakeChanges(s: SparkSession, root: String,
      fromVersion: Int, toVersion: Int, key: String, part: String)
      : (DataFrame, Int, Int) = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)
    def files(v: Int): Set[String] = {
      val dir = new Path(s"$root/v$v")
      fs.listStatus(dir).toSeq.filter(_.isDirectory)
        .filter(_.getPath.getName.contains("="))
        .flatMap(p => fs.listStatus(p.getPath).toSeq.filter(_.isFile)
          .map(st => s"${p.getPath.getName}/${st.getPath.getName}"))
        .toSet
    }
    val (fromF, toF) = (files(fromVersion), files(toVersion))
    val fromOnly = (fromF -- toF).toSeq.sorted
    val toOnly = (toF -- fromF).toSeq.sorted
    def side(v: Int, fl: Seq[String], own: Set[String]): DataFrame = {
      val dir = s"$root/v$v"
      if (fl.isEmpty) // schema-only read from one of THIS version's files
        s.read.option("basePath", dir).parquet(s"$dir/${own.head}").limit(0)
      else s.read.option("basePath", dir)
        .parquet(fl.map(f => s"$dir/$f"): _*)
    }
    val pre = side(fromVersion, fromOnly, fromF)
    val post = side(toVersion, toOnly, toF)
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

package graft.sources.lake

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** S19b: a read-only `TableCatalog` over a directory of published lake
  * tables — the layer that gives the lakehouse a SQL surface, including
  * native time travel:
  *
  *   spark.conf.set("spark.sql.catalog.graft",
  *     "graft.sources.lake.LakeCatalog")
  *   spark.conf.set("spark.sql.catalog.graft.root", "/data/lake")
  *   spark.conf.set("spark.sql.catalog.graft.key.orders_t", "o_orderkey")
  *
  *   spark.sql("SELECT * FROM graft.orders_t")                -- live
  *   spark.sql("SELECT * FROM graft.orders_t VERSION AS OF 1") -- y25
  *
  * `VERSION AS OF n` is Spark's own time-travel syntax resolving
  * through `loadTable(ident, version)`; it lands on the same immutable
  * `v{n}` dirs the pointer protocol publishes, so SQL time travel and
  * the library's `readVersionLogical` can never disagree. Each table is
  * a subdirectory of `root` (one pointer protocol per table); the key
  * column for deletion-vector reads and manifest-maintaining writes
  * comes from `key.<table>` (or a catalog-wide `key`) in the catalog
  * options. DML is transactional: `INSERT INTO` / `INSERT OVERWRITE`
  * route through `LakeWriteBuilder` → the staged publish protocol
  * (frontier append / snapshot swap). DDL is intentionally REFUSED:
  * create/drop/rename/alter outside the protocol could only weaken its
  * guarantees — evolution is `evolveSchema` (versioned, metadata-only),
  * retention is `gcPublished` (lease-aware).
  *
  * Scale note: `loadTable` re-resolves the pointer and manifest on
  * every call (no caching), so a catalog instance held for hours always
  * plans against the live version; the resolved `LakeTable` itself pins
  * one version for its whole query — the snapshot-isolation split Spark
  * expects (resolution per query, immutability within one).
  */
class LakeCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog {
  private var catName: String = _
  private var options: CaseInsensitiveStringMap = _

  private def root: String = Option(options.get("root")).getOrElse(
    throw new IllegalStateException(
      s"LakeCatalog $catName: set spark.sql.catalog.$catName.root"))

  override def initialize(name: String,
      opts: CaseInsensitiveStringMap): Unit = {
    catName = name
    options = opts
  }

  override def name(): String = catName

  private def keyFor(table: String): Option[String] =
    Option(options.get(s"key.$table")).orElse(Option(options.get("key")))

  /** Y44 GROUP MODE (`group=true`): table versions resolve from the
    * ONE group pointer instead of per-table pointers, so SQL sees the
    * same cross-table generation a `readPublishedGroup` caller would.
    * Pinning `groupGen=<n>` makes that resolution IMMUTABLE: every
    * `loadTable` of every member — across however many queries — lands
    * on generation n's snapshot, which is the only way a multi-table
    * SQL query (or a whole session) gets true cross-table snapshot
    * isolation when publishers keep committing; the live group mode
    * re-resolves per table-load, which is per-table-torn-free but can
    * straddle a group commit between two loads. */
  private def groupMode: Boolean =
    Option(options.get("group")).exists(_.toBoolean)

  private def groupVersions(spark: SparkSession): Map[String, Int] =
    Option(options.get("groupGen")) match {
      case Some(g) =>
        graft.ops.Sync.groupGenVersions(spark, root, g.toInt)
      case None => graft.ops.Sync.groupPointerVersions(spark, root)
    }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val spark = SparkSession.active
    if (groupMode)
      return groupVersions(spark).keys.toArray.sorted
        .map(Identifier.of(namespace, _))
    val p = new Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).filter(_.isDirectory)
      .map(st => Identifier.of(namespace, st.getPath.getName))
  }

  private def load(ident: Identifier, version: Option[String]): Table = {
    val spark = SparkSession.active
    val tableRoot = s"$root/${ident.name}"
    val resolved = version.orElse {
      if (!groupMode) None
      else groupVersions(spark).get(ident.name) match {
        case Some(v) => Some(s"v$v")
        case None => throw new NoSuchTableException(ident)
      }
    }
    try new LakeTable(LakeRef.resolve(
      spark, tableRoot, resolved, keyFor(ident.name)))
    catch {
      case e: IllegalStateException if version.isEmpty =>
        // unpublished dir → the SQL-standard "no such table", so
        // IF EXISTS / error reporting behave like any other catalog.
        // AnalysisException already initializes its cause slot (to
        // null) in the constructor, so initCause would itself throw
        // "Can't overwrite cause" and mask this path with an
        // IllegalStateException; the original error rides along as a
        // suppressed exception instead.
        val nste = new NoSuchTableException(ident)
        nste.addSuppressed(e)
        throw nste
    }
  }

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <n>` — the SQL face of y25 time travel. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Some(version))

  /** `TIMESTAMP AS OF` (epoch micros): resolve the newest pointer
    * generation COMMITTED at or before the timestamp and open the
    * version it names — the commit clock is the generation file's
    * mtime (the local-FS stand-in; an object-store pointer records the
    * commit time in its body, same resolution logic). A timestamp
    * predating the first commit refuses with the table's earliest
    * commit time, mirroring Delta's contract. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val spark = SparkSession.active
    val tableRoot = s"$root/${ident.name}"
    val fs = new Path(tableRoot)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tsMillis = timestamp / 1000L
    val gens = graft.ops.Sync.pointerGenerations(fs, tableRoot)
      .map { g =>
        val p = new Path(f"$tableRoot/_ptr_gen_$g%05d")
        (fs.getFileStatus(p).getModificationTime, p)
      }
    val committed = gens.filter(_._1 <= tsMillis)
    if (committed.isEmpty) throw new IllegalStateException(
      s"graftlake: no commit on ${ident.name} at or before " +
        s"${java.time.Instant.ofEpochMilli(tsMillis)}" +
        gens.headOption.fold(" — the table has no pointer generations")(
          g => s" — the earliest commit is " +
            s"${java.time.Instant.ofEpochMilli(g._1)}"))
    val p = committed.maxBy(_._1)._2
    val in = fs.open(p)
    val v =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    load(ident, Some(v))
  }

  override def tableExists(ident: Identifier): Boolean = {
    val spark = SparkSession.active
    graft.ops.Sync.hasPublished(spark, s"$root/${ident.name}")
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: JMap[String, String])
      : Table = throw new UnsupportedOperationException(
    "graftlake catalog is read-only: publish through the staged " +
      "pointer-commit protocol (graft.ops.Sync.publish)")

  override def alterTable(ident: Identifier, changes: TableChange*)
      : Table = throw new UnsupportedOperationException(
    "graftlake catalog is read-only: evolve through " +
      "graft.ops.Sync.evolveSchema (metadata-only, versioned)")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "graftlake catalog is read-only: retention is gcPublished's job")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier)
      : Unit = throw new UnsupportedOperationException(
    "graftlake catalog is read-only")

  /** S22: `CALL <cat>.system.<proc>(...)` — the maintenance verbs
    * (compact / gc / dv_fold / rollback) as SQL procedures; see
    * [[LakeProcedures]]. The only mutations besides DML, and every one
    * routes through the staged publish / pointer protocol. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    LakeProcedures.load(root, keyFor, ident)

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    LakeProcedures.names
      .map(Identifier.of(Array("system"), _)).toArray
}

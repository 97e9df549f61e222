package graft.sources.lake

import java.util.{Map => JMap}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.Sync

/** Y55 read side: the lake's CHANGE FEED as a Spark source — batch and
  * Structured Streaming — over the `_changes` sidecars that CDF-on-write
  * stages into every version dir (see `Sync.enableCdf`):
  *
  *   spark.read.format("graftlake-cdf").option("path", root)
  *     .option("startingVersion", 2)           // inclusive; default 1
  *     .option("endingVersion", 5)             // inclusive; default live
  *     .load()                                  // rows: data + op + _commit_version
  *
  *   spark.readStream.format("graftlake-cdf").option("path", root)
  *     .option("startingVersion", 0)            // offset, EXCLUSIVE;
  *     .option("maxVersionsPerBatch", 3)        // admission control
  *     .load()                                  // default = live at start
  *
  * VERSIONS ARE THE OFFSETS. Each micro-batch covers a contiguous
  * version range, planned as a pure METADATA step: list the range's
  * `_changes` files — no diffing, no data-file scan, no state. That is
  * what makes the lake a 100 TB-honest streaming source: a publish of
  * any size costs the consumer only its own churn, and restart
  * semantics are exactly the checkpoint's last version (replaying a
  * version re-delivers its batch; downstream appliers are the
  * replay-idempotent MERGE/DELETE writers this engine already uses
  * everywhere). Feed rows carry op ∈ {I,U,D,T}: a T (truncate)
  * sentinel marks a snapshot reseed — consumers must clear before
  * applying that batch's I rows. A version dir MISSING its `_changes`
  * is a loud refusal, never a silent skip: it predates enablement or
  * was published by a non-CDF writer, and a mirror streaming past it
  * would silently diverge — the reseed decision belongs to the
  * operator (y50's condition, surfacing here as an error). Layout-only
  * versions carry an EMPTY feed and stream through as zero rows.
  * The stream's schema is fixed at start; restart the stream to pick
  * up y43-evolved columns (old feed files null-fill under the widened
  * schema, the same rule as the batch reader).
  */
class LakeCdfSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftlake-cdf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LakeCdf.feedSchema(LakeCdf.rootOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new LakeCdfTable(new CaseInsensitiveStringMap(properties))
}

private[lake] object LakeCdf {
  def rootOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graftlake-cdf: option 'path' (lake root) is required"))

  def liveVersion(spark: SparkSession, root: String): Long =
    Sync.liveVersion(spark, root) match {
      case Some(v) => v.stripPrefix("v").toLong
      case None => throw new IllegalStateException(
        s"graftlake-cdf: no published version under $root")
    }

  /** Feed schema = the LIVE version's logical schema + op + version. */
  def feedSchema(root: String): StructType = {
    val spark = SparkSession.active
    val v = liveVersion(spark, root)
    StructType(Sync.versionSchema(spark, s"$root/v$v").fields ++ Seq(
      StructField("op", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))
  }

  /** Plan the feed files of versions [from, to] — metadata only. A
    * version without `_changes` refuses loudly (see class doc). */
  def changeFiles(spark: SparkSession, root: String, from: Long,
      to: Long): Array[InputPartition] = {
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (from to to).flatMap { v =>
      val dir = new Path(s"$root/v$v")
      if (!fs.exists(dir)) throw new IllegalStateException(
        s"graftlake-cdf: version dir $dir is gone (retention GC) — " +
          "the consumer slept past the rollback window; reseed from a " +
          "snapshot (y50's retention-loss condition)")
      val ch = new Path(s"$root/v$v/_changes")
      if (!fs.exists(ch)) throw new IllegalStateException(
        s"graftlake-cdf: v$v has no _changes feed — it predates " +
          "enableCdf or was published by a non-CDF writer; a mirror " +
          "streaming past it would silently diverge. Reseed, or start " +
          "after it with startingVersion")
      fs.listStatus(ch).toSeq
        .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
        .map(st => LakeFilePartition(st.getPath.toString, -1L))
    }.toArray
  }
}

final class LakeCdfTable(options: CaseInsensitiveStringMap) extends Table
    with SupportsRead {
  private val root = LakeCdf.rootOf(options)

  override def name(): String = s"graftlake-cdf $root"
  override def schema(): StructType = LakeCdf.feedSchema(root)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(scanOptions: CaseInsensitiveStringMap)
      : ScanBuilder = new LakeCdfScanBuilder(root, schema(),
    // readStream options arrive here, .read options via properties
    if (scanOptions.isEmpty) options else scanOptions)
}

final class LakeCdfScanBuilder(root: String, full: StructType,
    options: CaseInsensitiveStringMap) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new LakeCdfScan(root, required, options)
}

final class LakeCdfScan(root: String, required: StructType,
    options: CaseInsensitiveStringMap) extends Scan with Batch {

  override def readSchema(): StructType = required

  override def description(): String = s"graftlake-cdf $root"

  // ---- batch: versions [startingVersion, endingVersion], inclusive ----
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val from = Option(options.get("startingVersion")).map(_.toLong)
      .getOrElse(1L)
    val to = Option(options.get("endingVersion")).map(_.toLong)
      .getOrElse(LakeCdf.liveVersion(spark, root))
    LakeCdf.changeFiles(spark, root, from, to)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeReaderFactory(required, None, None, None, 4096, None,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration))

  // ---- streaming: the version number IS the offset (exclusive) ----
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new LakeCdfMicroBatchStream(root, required,
      Option(options.get("startingVersion")).map(_.toLong),
      Option(options.get("maxVersionsPerBatch")).map(_.toLong))
}

final case class LakeVersionOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** Admission control (`maxVersionsPerBatch`): without it, a mirror
  * restarting N versions behind plans ONE micro-batch spanning all N —
  * unbounded batch size and unbounded latest-wins collapse state in the
  * applier. With it, catch-up proceeds in bounded version windows: each
  * `latestOffset(start, _)` admits at most `maxVersionsPerBatch`
  * versions past the checkpoint, the engine commits each window's
  * offset before planning the next, and progress survives a crash
  * mid-catch-up at window granularity. Planning stays metadata-only
  * either way. Default (option absent): all available — correct for
  * the steady state where a trigger sees one or two new versions. */
final class LakeCdfMicroBatchStream(root: String, required: StructType,
    startingVersion: Option[Long], maxVersionsPerBatch: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {
  private val spark = SparkSession.active
  require(maxVersionsPerBatch.forall(_ > 0),
    s"graftlake-cdf: maxVersionsPerBatch must be positive, got " +
      s"${maxVersionsPerBatch.get}")

  override def initialOffset(): Offset =
    LakeVersionOffset(startingVersion.getOrElse(
      LakeCdf.liveVersion(spark, root)))

  // With SupportsAdmissionControl the engine calls the two-arg form;
  // this one existing silently would mask a wiring bug upstream.
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** The admitted end offset: live, clamped to `start +
    * maxVersionsPerBatch`. The engine's own ReadLimit vocabulary is
    * rows/files; versions are this source's natural unit (a version =
    * one atomic publish = one replay-idempotent apply), so the bound
    * rides the source option, mirroring how rate-limited sources map
    * their own units. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val live = LakeCdf.liveVersion(spark, root)
    val s0 = start.asInstanceOf[LakeVersionOffset].v
    LakeVersionOffset(
      maxVersionsPerBatch.fold(live)(m => math.min(live, s0 + m)))
  }

  /** The true frontier, for progress reporting (lag = report - end). */
  override def reportLatestOffset(): Offset =
    LakeVersionOffset(LakeCdf.liveVersion(spark, root))

  override def deserializeOffset(json: String): Offset =
    LakeVersionOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s0 = start.asInstanceOf[LakeVersionOffset].v
    val e0 = end.asInstanceOf[LakeVersionOffset].v
    if (e0 <= s0) Array.empty
    else LakeCdf.changeFiles(spark, root, s0 + 1, e0)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeReaderFactory(required, None, None, None, 4096, None,
      new org.apache.spark.util.SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util.{Map => JMap, Set => JSet}

/** DataSourceV2 connector (the SURVEY §2.12 escalation path one level past
  * custom Expressions): a deterministic synthetic documents source with
  * real partition planning and column pruning — the shape any custom
  * bulk-extract endpoint (change feed, REST export, proprietary dump)
  * plugs into Spark with.
  *
  *   spark.read.format("graft.sources.SyntheticDocs")
  *     .option("numDocs", 10000).option("numPartitions", 8).load()
  *
  * Scale design: the driver plans `numPartitions` row-range splits, each
  * executor generates its split independently from the (seed, doc_id)
  * alone (no shared state, no driver data path), and pruned columns are
  * never materialized — the same three properties a 100 TB JDBC/extract
  * scan needs (range partitioning, stateless readers, pushdown).
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new SyntheticDocsTable(
      opts.getLong("numDocs", 1000L),
      opts.getInt("numPartitions", 4))
  }
}

object SyntheticDocs {
  val schema: StructType = new StructType()
    .add("doc_id", LongType, nullable = false)
    .add("lang", StringType, nullable = false)
    .add("text", StringType, nullable = false)

  private val langs = Array("en", "de", "es", "fr")
  private val words = Array("the", "fast", "scan", "join", "merge", "key",
    "row", "table", "sync", "data", "of", "and")

  /** Deterministic doc for a doc_id — same LCG everywhere it's read. */
  def docFor(id: Long): (String, String) = {
    var x = id * 6364136223846793005L + 1442695040888963407L
    def next(n: Int): Int = { x = x * 6364136223846793005L + 1442695040888963407L
      (((x >>> 33) % n + n) % n).toInt }
    val lang = langs(next(langs.length))
    val n = 5 + next(20)
    val text = Seq.fill(n)(words(next(words.length))).mkString(" ")
    (lang, text)
  }
}

final class SyntheticDocsTable(numDocs: Long, numPartitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($numDocs)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): JSet[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticDocsScanBuilder(numDocs, numPartitions)
}

final class SyntheticDocsScanBuilder(numDocs: Long, numPartitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = SyntheticDocs.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SyntheticDocsScan(numDocs, numPartitions, required)
}

final class SyntheticDocsScan(numDocs: Long, numPartitions: Int,
                              required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (numDocs + numPartitions - 1) / numPartitions)
    (0L until numDocs by per)
      .map(lo => DocRange(lo, math.min(lo + per, numDocs)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticDocsReaderFactory(required)
}

final case class DocRange(lo: Long, hi: Long) extends InputPartition

final class SyntheticDocsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[DocRange]
    // resolve pruned column positions once per partition, not per row
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var id = r.lo - 1
      override def next(): Boolean = { id += 1; id < r.hi }
      override def get(): InternalRow = {
        lazy val doc = SyntheticDocs.docFor(id)
        InternalRow.fromSeq(fields.toSeq.map {
          case "doc_id" => id
          case "lang" => UTF8String.fromString(doc._1)
          case "text" => UTF8String.fromString(doc._2)
        })
      }
      override def close(): Unit = ()
    }
  }
}

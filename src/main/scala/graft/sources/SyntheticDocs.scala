package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util.{Map => JMap, Set => JSet}

/** DataSourceV2 connector (the SURVEY §2.12 escalation path one level past
  * custom Expressions): a deterministic synthetic documents source with
  * real partition planning, column pruning AND filter pushdown — the
  * shape any custom bulk-extract endpoint (change feed, REST export,
  * proprietary dump) plugs into Spark with.
  *
  *   spark.read.format("graft.sources.SyntheticDocs")
  *     .option("numDocs", 10000).option("numPartitions", 8).load()
  *
  * Scale design: the driver plans `numPartitions` row-range splits, each
  * executor generates its split independently from the (seed, doc_id)
  * alone (no shared state, no driver data path), and pruned columns are
  * never materialized. Pushed `doc_id` range/equality filters clamp the
  * planned ranges — split-level pruning, the DSv2 analogue of JDBC
  * partition predicates: a selective key filter plans ONLY the
  * overlapping splits, so a 100 TB extract reads the slice it needs.
  * A pushed `lang` equality is enforced row-level in the reader before
  * the text column is materialized. Contract note: filters NOT returned
  * from `pushFilters` are trusted as fully enforced by the source —
  * Spark adds no post-scan re-check — so the clamp math and the reader
  * predicate are exact, and everything else is handed back.
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

  /** Just the lang of a doc_id — the FIRST draw of [[docFor]]'s LCG, so a
    * pushed lang filter can skip rows without building the text. Must
    * stay in lockstep with docFor's draw order. */
  def langFor(id: Long): String = {
    var x = id * 6364136223846793005L + 1442695040888963407L
    x = x * 6364136223846793005L + 1442695040888963407L
    langs((((x >>> 33) % langs.length + langs.length) % langs.length).toInt)
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
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = SyntheticDocs.schema
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def longVal(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int  => Some(i.toLong)
    case _       => None
  }

  /** Accept doc_id range/equality (→ split clamp) and lang equality
    * (→ reader predicate); everything else goes back to Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case EqualTo("doc_id", v)            => longVal(v).isDefined
      case GreaterThan("doc_id", v)        => longVal(v).isDefined
      case GreaterThanOrEqual("doc_id", v) => longVal(v).isDefined
      case LessThan("doc_id", v)           => longVal(v).isDefined
      case LessThanOrEqual("doc_id", v)    => longVal(v).isDefined
      case EqualTo("lang", _: String)      => true
      case _                               => false
    }
    accepted = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = {
    // fold the accepted doc_id conjuncts into one [lo, hi) clamp.
    // incExact: the +1 for inclusive bounds must saturate, not wrap — a
    // pushed `doc_id <= Long.MaxValue` tautology would otherwise
    // overflow hi to Long.MinValue and silently plan an EMPTY scan
    // while claiming full enforcement.
    def incSat(l: Long): Long = if (l == Long.MaxValue) l else l + 1
    var lo = 0L
    var hi = numDocs
    var langEq: Option[String] = None
    var langContradiction = false
    accepted.foreach {
      case EqualTo("doc_id", v) =>
        val l = longVal(v).get; lo = math.max(lo, l); hi = math.min(hi, incSat(l))
      case GreaterThan("doc_id", v)        => lo = math.max(lo, incSat(longVal(v).get))
      case GreaterThanOrEqual("doc_id", v) => lo = math.max(lo, longVal(v).get)
      case LessThan("doc_id", v)           => hi = math.min(hi, longVal(v).get)
      case LessThanOrEqual("doc_id", v)    => hi = math.min(hi, incSat(longVal(v).get))
      case EqualTo("lang", v: String)      =>
        // accepted filters are TRUSTED as fully enforced, so two
        // different lang equalities must INTERSECT (= empty scan), not
        // last-one-wins — the doc_id clamp gets this for free via
        // min/max; do the same here explicitly
        if (langEq.exists(_ != v)) langContradiction = true
        langEq = Some(v)
      case _ => ()
    }
    if (langContradiction) hi = lo // contradictory conjunction: no rows
    new SyntheticDocsScan(numDocs, numPartitions, required, lo, hi, langEq)
  }
}

final class SyntheticDocsScan(numDocs: Long, numPartitions: Int,
                              required: StructType, lo: Long, hi: Long,
                              langEq: Option[String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"synthetic_docs range=[$lo,$hi) langEq=$langEq cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (numDocs + numPartitions - 1) / numPartitions)
    // plan the natural splits, keep only those overlapping the clamp,
    // and trim the boundary splits to it — split-level pruning
    (0L until numDocs by per)
      .map(l => (math.max(l, lo), math.min(l + per, hi)))
      .filter { case (l, h) => l < h }
      .map { case (l, h) => DocRange(l, h): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticDocsReaderFactory(required, langEq)
}

final case class DocRange(lo: Long, hi: Long) extends InputPartition

final class SyntheticDocsReaderFactory(required: StructType,
                                       langEq: Option[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[DocRange]
    // resolve pruned column positions once per partition, not per row
    val fields = required.fieldNames
    new PartitionReader[InternalRow] {
      private var id = r.lo - 1
      override def next(): Boolean = {
        id += 1
        // enforce the pushed lang equality BEFORE materializing text
        // (Spark trusts accepted filters — no post-scan re-check)
        while (id < r.hi && langEq.exists(_ != SyntheticDocs.langFor(id)))
          id += 1
        id < r.hi
      }
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

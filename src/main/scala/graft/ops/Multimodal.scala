package graft.ops

import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (task §2 "multimodal columns"): media carried
  * as opaque `binary` payloads with typed metadata, decoded/featurized in a
  * per-partition batch pass.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake (STUB) — but the Spark-side plumbing
  * is real: binary column construction, case-class Encoders, one
  * `mapPartitions` batch per partition (where a real decoder would
  * amortize model/codec init per partition, exactly like an Arrow-batched
  * UDF), and the features rejoin the relational flow as columns.
  */
object Multimodal {

  /** A "media" row: opaque payload + metadata. */
  final case class MediaDoc(doc_id: Long, payload: Array[Byte],
                            lang: String, n_chars: Long)
  /** Extracted features (deterministic stub of a decode+featurize pass). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
                                 first_byte: Int, head_sum: Long)

  /** STUB decoder: a real implementation would decode the payload
    * (image/audio) per partition; this fake derives features from the raw
    * bytes so the pipeline stays deterministic and oracle-checkable.
    */
  def decodeStub(rows: Iterator[MediaDoc]): Iterator[MediaFeatures] =
    rows.map { m =>
      val head = m.payload.take(16)
      MediaFeatures(m.doc_id, m.payload.length,
        m.payload.headOption.map(_ & 0xff).getOrElse(0),
        head.map(b => (b & 0xff).toLong).sum % 251L)
    }

  val queries: Map[String, Q] = Map(
    // M1: text → binary payload → per-partition batch "decode" →
    // features as columns. Payload is utf-8 text bytes (ASCII corpus).
    "m1_multimodal_features" -> ((s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"),
                col("lang"), col("n_chars"))
        .as[MediaDoc]
        .mapPartitions(decodeStub)
        .toDF()
    })
  )

  val oracle: Map[String, String] = Map(
    // ASCII text ⇒ byte i == ascii(char i); n_chars ≥ 47 so head has 16.
    "m1_multimodal_features" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |  CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte,
        |  CAST(list_sum(list_transform(range(1, 17),
        |    i -> ascii(substr(text, CAST(i AS INTEGER), 1)))) % 251 AS BIGINT) AS head_sum
        |FROM documents""".stripMargin
  )
}

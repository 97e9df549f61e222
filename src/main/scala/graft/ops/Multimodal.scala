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

  /** M3: media-lake ingestion — the path media actually ENTERS a
    * pipeline: opaque files on distributed storage read by the built-in
    * `binaryFile` source into (path, modificationTime, length, content),
    * keyed by an id parsed from the path, ready to join relational
    * metadata. No scored oracle is possible (paths/mtimes are
    * environmental); the OperatorSuite law pins the part that matters —
    * bytes written as files come back bit-identical and feed the same
    * decodeStub features as the in-table m1 path.
    * Scale: binaryFile assigns whole files to tasks (bounded by
    * `spark.sql.files.maxPartitionBytes` bin-packing) and
    * `pathGlobFilter` prunes at LISTING time — a non-matching file is
    * never opened. */
  def binaryFileIngest(s: org.apache.spark.sql.SparkSession,
                       dir: String): org.apache.spark.sql.DataFrame =
    s.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        col("length"), col("content"))
      // a *.bin whose name doesn't parse would otherwise flow on with a
      // null key and silently join nothing — drop it here; callers that
      // need to ALARM on malformed names diff listing count vs row count
      .where(col("doc_id").isNotNull)

  /** STUB media metadata: a real pipeline would read container headers;
    * here duration/dims derive deterministically from n_chars so the
    * partitioning/explode plumbing is real and oracle-checkable.
    */
  val queries2: Map[String, Q] = Map(
    // M2: frame sampling — one row per sampled frame (every 5th of
    // n_frames = n_chars/10), the explode shape a video pipeline uses;
    // then a resize stub computing target dims with aspect preserved.
    "m2_frame_sample" -> ((s, d) => {
      val nFrames = (col("n_chars") / lit(10)).cast("int")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), nFrames.as("n_frames"),
          (col("n_chars") % 1280).cast("int").as("src_w"),
          (col("n_chars") % 720 + 1).cast("int").as("src_h"))
        .select(col("doc_id"), col("lang"), col("src_w"), col("src_h"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(5))).as("frame_idx"),
          // resize stub: fit into 224x224 preserving aspect (integer math)
          least(lit(224), col("src_w")).as("out_w"),
          greatest(lit(1), (least(lit(224), col("src_w")) * col("src_h") /
            greatest(col("src_w"), lit(1))).cast("int")).as("out_h"))
        .groupBy(col("doc_id"), col("out_w"), col("out_h"))
        .agg(count(lit(1)).as("n_sampled"), max(col("frame_idx")).as("last_frame"))
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
        |FROM documents""".stripMargin,

    "m2_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    CAST(n_chars // 10 AS INTEGER) AS n_frames,
        |    CAST(n_chars % 1280 AS INTEGER) AS src_w,
        |    CAST(n_chars % 720 + 1 AS INTEGER) AS src_h
        |  FROM documents),
        |sampled AS (
        |  SELECT doc_id, src_w, src_h,
        |    CAST(unnest(generate_series(0, n_frames - 1, 5)) AS INTEGER) AS frame_idx
        |  FROM f)
        |SELECT doc_id,
        |  least(224, src_w) AS out_w,
        |  greatest(1, CAST(least(224, src_w) * src_h // greatest(src_w, 1) AS INTEGER)) AS out_h,
        |  COUNT(*) AS n_sampled, MAX(frame_idx) AS last_frame
        |FROM sampled
        |GROUP BY doc_id, out_w, out_h""".stripMargin
  )
}

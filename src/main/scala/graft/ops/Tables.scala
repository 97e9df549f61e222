package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver corpus (TESTDATA.md / FIXTURES.md): one parquet
  * file per table under the scale-factor dir. Schemas are fixed by the
  * driver; we rely on parquet footers (deterministic), never inference.
  */
object Tables {
  /** Per-session plan cache — the catalog's role, done once per session:
    * `spark.read.parquet` pays a driver-side file listing + footer schema
    * read per CALL, and this suite references the same ten immutable
    * input tables from ~130 queries (the sql_* family re-registers seven
    * views each), so uncached that's thousands of redundant footer reads
    * per Bench/Verify run. The cached value is an immutable logical plan
    * — reusing it across queries is exactly what a session catalog does.
    * ONLY the driver's read-only input tables belong here (TESTDATA.md);
    * staged/overwritten paths (s12/s13 sinks) must keep calling
    * `spark.read` directly or they'd serve a stale file listing.
    *
    * Eviction: the inner map is held through a SoftReference because its
    * DataFrames strongly reference their SparkSession — held directly as
    * the WeakHashMap VALUE they would pin their own weak KEY forever (the
    * value-references-key trap in the WeakHashMap javadoc). Via the soft
    * indirection a stopped session is only softly reachable, so the JVM
    * reclaims session + plans under memory pressure rather than never.
    */
  private val cache =
    new java.util.WeakHashMap[SparkSession, java.lang.ref.SoftReference[
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      val ref = cache.get(spark)
      val live = if (ref == null) null else ref.get()
      if (live == null) {
        val m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        cache.put(spark, new java.lang.ref.SoftReference(m))
        m
      } else live
    }
    perSession.computeIfAbsent(s"$dir/$name.parquet",
      p => spark.read.parquet(p))
  }

  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  /** events.ts has drifted across corpus regenerations — parquet
    * TIMESTAMP(NANOS) in one vintage, TIMESTAMP(MICROS) in another — so
    * the loader adapts to the footer's ACTUAL type rather than
    * hard-coding either vintage (r8's 23-dead-query lesson):
    *   - LongType: the file is TIMESTAMP(NANOS), readable only through
    *     the nanosAsLong legacy conf ([[prepare]] sets it; without it the
    *     scan itself throws PARQUET_TYPE_ILLEGAL before we get here).
    *     Floor-divide to µs — bit-identical to DuckDB's
    *     CAST(ts_ns AS TIMESTAMP) truncation in every oracle query.
    *   - TimestampNTZType: TIMESTAMP(MICROS, isAdjustedToUTC=false).
    *     Cast to TimestampType — value-preserving under the UTC session
    *     timezone every entry point sets — so downstream queries see the
    *     same type regardless of corpus vintage.
    *   - TimestampType: already what every query expects; pass through.
    * All arms are oracle-identical: DuckDB's CAST(ts AS TIMESTAMP) on its
    * side is equally type-agnostic.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _: org.apache.spark.sql.types.TimestampType => raw
      case other => sys.error(
        s"events.ts: unsupported parquet physical type $other — extend " +
          "Tables.events for this corpus vintage")
    }
  }

  /** One-time session setup every entry point (Verify, Bench, test
    * fixture, plan dumps) runs before building queries: the legacy
    * nanos-as-long parquet read the TIMESTAMP(NANOS) vintage of `events`
    * needs (harmless for the MICROS vintage — the conf only affects NANOS
    * columns). Kept OUT of the query builders — a conf mutation inside a
    * plan-building function is a surprise to callers and runs once per
    * query instead of once per session.
    */
  def prepare(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The corpus's timestamps are parquet TIMESTAMP(MICROS,
    // isAdjustedToUTC=false); with NTZ inference on (the default) Spark
    // types them TimestampNTZ, and ParquetFilters does NOT convert NTZ
    // predicates into parquet row-group filters — measured: a range-
    // clustered 8-file write skipped ZERO row groups under an NTZ
    // range predicate (no FilterCompat predicate was even created) and
    // 6 of 8 with this conf off (PlanAuditSuite S14 pins the working
    // path). Reading them as TimestampType (session-UTC wall clock —
    // value-identical here, and exactly how DuckDB's naive timestamps
    // render on the oracle side) makes every temporal range predicate
    // in the suite stats-prunable: at 100 TB, the difference between
    // scanning a month and scanning a decade.
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    s
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

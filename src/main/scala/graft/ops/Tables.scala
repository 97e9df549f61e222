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
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    * as a timestamp (PARQUET_TYPE_ILLEGAL). Read it as raw nanos (legacy
    * conf, set once per session by the entry points via [[prepare]] —
    * query builders are conf-pure) and floor-divide to µs — bit-identical
    * to DuckDB's CAST(ts_ns AS TIMESTAMP) truncation in every oracle query.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // fail with a pointer at the fix, not the raw PARQUET_TYPE_ILLEGAL a
    // prepare-less session would hit deep inside the scan
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "events.parquet is TIMESTAMP(NANOS): call Tables.prepare(spark) " +
        "once per session before building queries over events")
    table(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** One-time session setup every entry point (Verify, Bench, test
    * fixture, plan dumps) runs before building queries: the legacy
    * nanos-as-long parquet read the `events` table needs. Kept OUT of the
    * query builders — a conf mutation inside a plan-building function is
    * a surprise to callers and runs once per query instead of once per
    * session.
    */
  def prepare(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

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
    * `spark.read` directly or they'd serve a stale file listing. Keyed
    * weakly by session so stopped test sessions unpin their plans.
    */
  private val cache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, DataFrame]]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()
        cache.put(spark, m)
      }
      m
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
    * conf) and floor-divide to µs — bit-identical to DuckDB's
    * CAST(ts_ns AS TIMESTAMP) truncation used in every oracle query.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

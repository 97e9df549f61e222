package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    EntryTuning.tuneEmbeddedDerby()
    val Array(sfDir, outDir, rest @ _*) = args
    val only = rest.toSet // optional query-name filter for local iteration
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // static conf; default 100 thrashes across ~120 queries (see Bench)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.ops.Tables.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Run queries on a small thread pool: concurrent actions overlap each
    // other's scheduling/IO gaps (and this host's episodic stalls), cutting
    // wall time several-fold. Outputs are per-query directories, fully
    // independent; Spark sessions are thread-safe for concurrent actions.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val failed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val tasks = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.isEmpty || only(name) }
      .map { case (name, fn) =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            catch { case e: Throwable =>
              failed.add(name)
              System.err.println(s"[verify] $name failed: ${e.getMessage}")
            }
        })
      }
    tasks.foreach(_.get())
    pool.shutdown()
    // sweep caches once all tasks are done — not per-task: tasks run
    // concurrently and an unpersist mid-flight would force another
    // task's recompute. Two levels (see Bench for why): Dataset-level
    // CacheManager entries, then explicit RDD-level persists.
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    // summary so a thrown query can't silently vanish from the gate
    // (selfcheck also reports oracle keys with no dump as MISSING)
    if (!failed.isEmpty)
      System.err.println(
        s"[verify] SUMMARY: ${failed.size} failed: " +
        String.join(",", failed))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // No bench-only flags: every timed query is exactly the plan Verify
    // and the DuckDB gate check. The block-quadratic dedup/fuzzy queries
    // are timed in BOTH forms - full (l2a/l2d/j10) and the 1/10-1/20
    // probe-slice monitoring variants (*_sampled), each its own
    // oracle-checked query.
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // STATIC conf, must be set before the session exists. Default 100
      // entries thrash across this suite (~120 queries × several generated
      // classes each), so pass 2 recompiles every WholeStageCodegen body
      // and the per-query minimum measures Janino, not the plan. A warm
      // long-running cluster keeps its codegen cache; size it to fit.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.ops.Tables.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session costs (Hadoop FS init, codegen, parquet
    // footer machinery) so they don't land on whichever query runs first
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Two passes, per-query minimum: this host stalls episodically (an
    // identical query swings 0.5↔30 s between runs), so a single-shot
    // total measures stall luck, not plans. Pass 2 re-times every query
    // after the whole suite warmed page cache/JIT; min is the honest
    // plan cost. A throwing query records -1 and does not abort.
    def pass(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case _: Throwable => false }
      val t = (System.nanoTime() - t0) / 1e9
      // sweep caches after the action completes: queries run sequentially
      // and never share cached data, so without this each pass
      // accumulates cache blocks until the ContextCleaner happens to GC —
      // unbounded memory/local-disk growth across ~270 timed runs. TWO
      // levels, both required: clearCache() drops Dataset-level persists
      // from the CacheManager (an RDD-level unpersist alone leaves the
      // CacheManager entry behind, and the NEXT query persisting the
      // identical plan would hit "already cached", no-op, and recompute
      // through the dead InMemoryRelation every consumer); the RDD sweep
      // catches the dedup family's explicit RDD-level persists, which the
      // CacheManager never sees. Both sit outside the timed window;
      // building the cached blocks (the real cost) is inside it.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      name -> (if (ok) t else -1.0)
    }
    // Stall sentinel: a fixed-cost no-op (sum over 10M longs, one codegen'd
    // stage, no IO) timed before/between/after the passes. On a healthy
    // host it is ~10-30 ms; this host stalls episodically (identical
    // queries swing 0.5↔30 s), so a sentinel reading in the hundreds of
    // ms marks the surrounding pass as stall-contaminated — a reader can
    // tell a real plan regression from stall luck without a re-run.
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(10000000L).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val s0 = sentinel()
    val p1 = pass()
    val s1 = sentinel()
    val p2 = pass()
    val s2 = sentinel()
    // min over SUCCEEDED passes only: a query that ran clean in one pass
    // keeps its valid timing even if the other pass threw; a query that
    // failed both passes stays a visible -1 sentinel but is EXCLUDED from
    // the summed total (a failure must not lower the reported seconds).
    val results = p1.map { case (k, v1) =>
      val ok = Seq(v1, p2.getOrElse(k, -1.0)).filter(_ >= 0.0)
      k -> (if (ok.nonEmpty) ok.min else -1.0)
    }
    val failed = results.count(_._2 < 0.0)
    // Per-query timings go to a file + a non-final stdout line; the driver's
    // tail-capture window only reliably holds the LAST line, so the scored
    // summary is a compact (<200 char) total-only JSON line printed last.
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    // Per-query spread (max/min over the two passes): ~1 means both passes
    // agreed; a large ratio means the slower pass hit a stall window and
    // the min is the trustworthy number. Only emitted where both passed.
    val spread = p1.flatMap { case (k, v1) =>
      val v2 = p2.getOrElse(k, -1.0)
      if (v1 > 0.0 && v2 > 0.0)
        Some("\"" + k + "\":" + f"${math.max(v1, v2) / math.min(v1, v2)}%.1f")
      else None
    }.mkString("{", ",", "}")
    val sentinels = f"[$s0%.3f,$s1%.3f,$s2%.3f]"
    val total = results.values.filter(_ >= 0.0).sum
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_queries.json"),
      s"""{"queries":$qs,"spread":$spread,"sentinel_sec":$sentinels,"sf":"$sfDir"}""")
    catch { case _: Throwable => () }
    println(s"""{"perquery":$qs}""")
    println(s"""{"spread":$spread}""")
    spark.stop()
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"n_failed":$failed,"sentinel_sec":$sentinels,"sf":"$sfDir"}""")
  }
}

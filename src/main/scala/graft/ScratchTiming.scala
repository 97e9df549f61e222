package graft
import org.apache.spark.sql.SparkSession

/** Dev-only micro-timing harness (not part of the driver contract): times
  * the named queries (args, default = the self-join pipeline queries)
  * best-of-3 at sf0.1 and prints plan-shape stats (exchange/scan/agg
  * counts) — the evidence loop behind the round-2 recompute fixes.
  */
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    EntryTuning.tuneEmbeddedDerby()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.ops.Tables.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"T $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    t("warmup") { spark.read.parquet(s"$d/documents.parquet").count() }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("l2a_shingle_jaccard", "l2c_simhash", "l2d_ngram_jaccard",
               "l7_embedding_dedup")
    for (name <- names; i <- 1 to 3) {
      // builder invocation INSIDE the timer: some builders do eager work
      // (localCheckpoint materialization, the CC iteration loop), which a
      // build-then-time split would silently exclude — Bench times both.
      var q: org.apache.spark.sql.DataFrame = null
      t(s"$name$i") { q = SparkEntry.queries(name)(spark, d); q.count() }
      // sweep like Bench does per query: otherwise a plan-persisting
      // operator serves iterations 2+ from the CacheManager and the
      // timings measure nothing
      spark.catalog.clearCache()
      if (i == 1) {
        val p = q.queryExecution.executedPlan.toString
        println(s"PLANSTATS $name" +
          " exch=" + (p.split("Exchange hashpartitioning").length - 1) +
          " scans=" + (p.split("FileScan parquet").length - 1) +
          " agg=" + (p.split("HashAggregate").length - 1))
      }
    }
    spark.stop()
  }
}

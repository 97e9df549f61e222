package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: time a NAMED SUBSET of SparkEntry.queries with the exact
  * Bench methodology (count action, cache sweep, stall sentinel, min
  * over reps) for tight before/after loops — the full Bench run costs
  * ~10 min of wall per data point. Not part of the driver contract.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.QuickBench <reps> <q> [q ...]"
  */
object QuickBench {
  def main(args: Array[String]): Unit = {
    EntryTuning.tuneEmbeddedDerby()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.head.toInt
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.ops.Tables.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(10000000L).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // settle like Bench
    locally {
      var t = sentinel(); var waited = 0
      while (t > 0.15 && waited < 20) { Thread.sleep(3000); t = sentinel(); waited += 1 }
    }
    val mins = scala.collection.mutable.Map[String, Double]()
    for (r <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 println(s"[quickbench] $name failed: $e"); false }
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      if (ok) mins(name) = math.min(mins.getOrElse(name, Double.MaxValue), t)
      println(f"[quickbench] rep$r $name ${if (ok) t else -1.0}%.3f")
    }
    val post = sentinel()
    println("== QUICKBENCH MIN ==")
    names.foreach(n =>
      println(f"  ${mins.getOrElse(n, -1.0)}%7.3f  $n"))
    println(f"  total=${mins.values.sum}%.3f post_sentinel=$post%.3f")
    spark.stop()
  }
}

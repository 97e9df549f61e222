package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only micro-timing harness (not part of the driver contract). */
object ScratchTiming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"T $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($r)")
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    t("warmup") { docs.count() }

    // l2a stage profile: where do the ~4s go?
    val sh = array_distinct(transform(
      sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
      i => col("text").substr(i, lit(5))))
    val exploded = docs.select(
      col("doc_id"), col("lang"), col("source"),
      (col("n_chars") / 50).cast("int").as("lenb"), explode(sh).as("sh"))
    for (i <- 1 to 3) {
      t(s"explode-only$i") { exploded.count() }
      t(s"sizes$i") { exploded.groupBy("doc_id").agg(count(lit(1))).count() }
      t(s"full-l2a$i") {
        graft.ops.LlmPipeline.queries("l2a_shingle_jaccard")(spark, d).count()
      }
    }
    for (name <- Seq("l2a_shingle_jaccard", "l2c_simhash", "l2d_ngram_jaccard",
                     "l7_embedding_dedup");
         i <- 1 to 3) {
      val q = graft.ops.LlmPipeline.queries(name)(spark, d)
      t(s"$name$i") { q.count() }
      val p = q.queryExecution.executedPlan.toString
      println(s"PLANSTATS $name reused=" + (p.split("ReusedExchange").length - 1) +
        " exch=" + (p.split("Exchange hashpartitioning").length - 1) +
        " scans=" + (p.split("FileScan parquet").length - 1) +
        " agg=" + (p.split("HashAggregate").length - 1))
    }
    spark.stop()
  }
}

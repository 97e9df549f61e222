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
      println(f"T $name: ${(System.nanoTime()-t0)/1e9}%.2f s ($r)")
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    t("warmup") { docs.count() }
    val sh = array_distinct(transform(
      sequence(lit(1), greatest(length(col("text")) - 4, lit(1))),
      i => col("text").substr(i, lit(5))))
    def oldForm() = {
      val ds = docs.select(col("doc_id"), col("lang"), col("source"),
        (col("n_chars") / 50).cast("int").as("lenb"), sh.as("sh"))
      val a = ds.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id").as("id_a"), col("lang"), col("source"),
                col("lenb"), col("sh").as("sh_a"))
      val b = ds.select(col("doc_id").as("id_b"), col("lang"), col("source"),
                        col("lenb"), col("sh").as("sh_b"))
      a.join(b, Seq("lang", "source", "lenb"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(size(array_intersect(col("sh_a"), col("sh_b"))) /
                size(array_union(col("sh_a"), col("sh_b"))), 6).as("jaccard"))
        .filter(col("jaccard") > 0.12)
    }
    def newForm() = graft.ops.LlmPipeline.queries("l2a_shingle_jaccard")(spark, d)
    for (i <- 1 to 3) {
      t(s"l2a-array$i") { oldForm().count() }
      t(s"l2a-relational$i") { newForm().count() }
    }
    spark.stop()
  }
}

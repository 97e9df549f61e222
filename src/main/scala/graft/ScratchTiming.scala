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
    graft.functions.CosineSim.register(spark)
    val d = "/root/testdata/sf0.1"
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"T $name: ${(System.nanoTime()-t0)/1e9}%.2f s ($r)")
    }
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    t("warmup") { e.count() }
    val q = e.filter(col("vec_id") < 64)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val c = e.select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val joined = c.join(broadcast(q), col("cid") =!= col("qid"))
    def dot(a: String, b: String) = {
      val ad = transform(col(a), _.cast("double"))
      val bd = transform(col(b), _.cast("double"))
      aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0d), (acc, x) => acc + x)
    }
    val composed = dot("qv", "cv") / (sqrt(dot("qv", "qv")) * sqrt(dot("cv", "cv")))
    for (i <- 1 to 2) {
      t(s"cos-composed$i") {
        joined.select(sum(composed)).collect()(0).getDouble(0).round
      }
      t(s"cos-native$i") {
        joined.select(sum(expr("cosine_sim(qv, cv)"))).collect()(0).getDouble(0).round
      }
    }
    spark.stop()
  }
}

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
    // current form: lambda filter inside explode
    val toks = filter(split(lower(col("text")), " +"), t => t =!= "")
    t("l5a-lambda") {
      docs.select(explode(filter(toks, t => !t.isin("the","a","of","and","to"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term").asc).limit(20).count()
    }
    // relational form: explode plain split, then WHERE
    t("l5a-relational") {
      docs.select(explode(split(lower(col("text")), " +")).as("term"))
        .where(col("term") =!= "" && !col("term").isin("the","a","of","and","to"))
        .groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term").asc).limit(20).count()
    }
    t("l5a-explode-only") {
      docs.select(explode(split(lower(col("text")), " +")).as("term")).count()
    }
    t("l5a-lambda2") {
      docs.select(explode(filter(toks, t => !t.isin("the","a","of","and","to"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term").asc).limit(20).count()
    }
    spark.stop()
  }
}

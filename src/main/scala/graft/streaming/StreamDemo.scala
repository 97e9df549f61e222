package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end streaming smoke (S8 file source → T1/T3/T5 → memory sink):
  * streams the driver's events parquet through the same builders the
  * micro-batch tests use. Run:
  *   sbt "runMain graft.streaming.StreamDemo /root/testdata/sf0.001"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // file-stream source over the events parquet (ns ts read as long)
    val sch = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // the file source wants a directory: stage the single file into one
    val stage = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      stage.resolve("events.parquet"))
    val ev = spark.readStream.schema(sch).parquet(stage.toString)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

    def run(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val q = df.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
      val n = spark.table(name).count()
      println(s"STREAM $name rows=$n")
      spark.table(name).show(3, truncate = false)
    }
    run("demo_tumbling", StreamOps.tumblingCounts(ev))
    run("demo_session", StreamOps.sessionCounts(ev))
    run("demo_dedup", StreamOps.dedupWithinWatermark(ev))
    spark.stop()
  }
}

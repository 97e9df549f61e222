package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: dump `explain("formatted")` for named queries into one
  * file per query — the before/after plan evidence the optimization
  * rounds commit under `plans/r<n>/`.
  *
  *   sbt "runMain graft.PlanSnap <sfDir> <outDir> [suffix] [query ...]"
  *
  * With no query names, dumps every declared query. `suffix` (e.g.
  * "_before") is appended to each file name. Queries whose PLANNING
  * already executes side effects (the lake/sync lifecycle composites)
  * still plan fine here: building the DataFrame runs the lifecycle and
  * the dumped plan is the final read — which is exactly the plan the
  * bench times last.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    EntryTuning.tuneEmbeddedDerby()
    val Array(sfDir, outDir, rest @ _*) = args
    val (suffix, names) = rest.headOption match {
      case Some(s) if s.startsWith("_") => (s, rest.drop(1).toSet)
      case _ => ("", rest.toSet)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.ops.Tables.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name$suffix.txt"), plan)
          println(s"[plansnap] wrote $name$suffix.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plansnap] $name failed: ${e.getMessage}")
        }
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only: run one query and print every Spark job with its
  * call site and wall duration — the attribution loop behind the
  * publish-overhead fixes (which call site pays how many jobs).
  *
  *   sbt "runMain graft.JobProfile <sfDir> <query> [reps]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    EntryTuning.tuneEmbeddedDerby()
    val sfDir = args(0); val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.ops.Tables.prepare(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
    // SQL executions carry the user-level call site in their
    // description; jobs launched from the SQL execution thread pool
    // lose theirs (the stage name reads "withThreadLocalCaptured"), so
    // map execution id -> description and attribute through it.
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execDesc.put(s.executionId, s.description)
        case _ => ()
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val fromStage = j.stageInfos.lastOption
          .map(_.name.takeWhile(_ != '+')).getOrElse("?").trim
        val site =
          if (!fromStage.contains("withThreadLocal")) fromStage
          else Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
            .flatMap(id => Option(execDesc.get(id.toLong)))
            .getOrElse(fromStage)
        starts.put(j.jobId, (site, System.nanoTime()))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val st = starts.remove(j.jobId)
        if (st != null)
          done.add((st._1, (System.nanoTime() - st._2) / 1e9))
      }
    })
    for (i <- 1 to reps) {
      done.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      Thread.sleep(300) // let listener events drain
      import scala.jdk.CollectionConverters._
      val jobs = done.asScala.toSeq
      val bySite = jobs.groupBy(_._1).map { case (s, l) =>
        (s, l.size, l.map(_._2).sum) }.toSeq.sortBy(-_._3)
      println(f"== $name rep$i wall=$wall%.2f s jobs=${jobs.size} " +
        f"jobTime=${jobs.map(_._2).sum}%.2f s ==")
      bySite.take(30).foreach { case (s, n, t) =>
        println(f"  $t%7.3f s  n=$n%-3d $s") }
    }
    spark.stop()
  }
}

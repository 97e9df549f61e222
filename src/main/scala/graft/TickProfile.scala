package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Sync, Sources, Tables}

/** Dev-only: segment the wall cost of one lake→JDBC catch-up tick into
  * its phases (readPublishedMor, schema reconcile, watermark IO, CDF
  * build, apply, validate) — the attribution loop behind the r14
  * per-tick overhead work. Not part of the driver contract.
  *
  *   sbt "runMain graft.TickProfile [sfDir]"
  */
object TickProfile {
  def main(args: Array[String]): Unit = {
    EntryTuning.tuneEmbeddedDerby()
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    Tables.prepare(s)
    s.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"T $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    s.range(1000).selectExpr("sum(id)").collect()
    s.read.parquet(s"$d/region.parquet").count()

    // y50-shaped fixture
    val root = Sources.stage("tickprof_lake")
    val fsp = new org.apache.hadoop.fs.Path(root)
    fsp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(fsp, true)
    val proj = Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val b = proj.agg(min(col("o_orderkey")).as("lo"),
      max(col("o_orderkey")).as("hi")).collect()(0)
    val lo = b.getLong(0); val span = b.getLong(1) - lo
    val band = col("o_orderkey")
      .between(lo + 2 * (span / 10), lo + 4 * (span / 10))
    val ghosts = proj.filter(col("o_orderkey") % 17 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
      .withColumn("o_orderstatus", lit("X"))
    val v1 = proj.filter(!(band && col("o_orderkey") % 11 === 0))
      .withColumn("o_totalprice",
        when(band && col("o_orderkey") % 5 === 0,
          col("o_totalprice") + 500.0).otherwise(col("o_totalprice")))
      .unionByName(ghosts)
    t("publish_v1") {
      Sync.publish(s, v1.repartitionByRange(8, col("o_orderkey"))
        .sortWithinPartitions("o_orderkey"), root, 1, _.head(1).nonEmpty)
    }
    t("writeFileStats_v1") { Sync.writeFileStats(s, s"$root/v1", "o_orderkey") }
    val cfg = graft.sources.JdbcSync.JdbcConfig(
      url = Sources.sharedDerbyUrl, table = "TICKPROF_TGT",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
    t("target_create") {
      graft.sources.JdbcSync.writeTable(
        proj.limit(0).select(proj.columns.toSeq
          .map(c => col(c).as(c.toUpperCase)): _*),
        cfg, org.apache.spark.sql.SaveMode.Overwrite)
    }
    t("tick1_reseed") {
      graft.sync.LakeToJdbc.catchUp(s, root, "o_orderkey", cfg)
    }
    t("ensureKeyIndex") {
      graft.sources.JdbcSync.ensureKeyIndex(cfg, Seq("O_ORDERKEY"))
    }
    val batch = proj.filter(band && col("o_orderkey") % 11 === 0)
      .withColumn("op", lit("I"))
      .unionByName(proj.filter(band && col("o_orderkey") % 5 === 0 &&
        col("o_orderkey") % 11 =!= 0).withColumn("op", lit("U")))
      .unionByName(ghosts.withColumn("op", lit("D")))
      .withColumn("version", lit(1L))
    t("cowApplyChanges") {
      Sync.cowApplyChanges(s, root, 1, 2, "o_orderkey", batch)
    }
    t("tick2_incremental") {
      graft.sync.LakeToJdbc.catchUp(s, root, "o_orderkey", cfg)
    }
    for (i <- 1 to 3) t(s"tick3_noop_$i") {
      graft.sync.LakeToJdbc.catchUp(s, root, "o_orderkey", cfg)
    }
    // noop tick internals
    for (i <- 1 to 3) {
      t(s"readPublishedMor_$i") { Sync.readPublishedMor(s, root, "o_orderkey") }
      val live = Sync.readPublishedMor(s, root, "o_orderkey")._2
      t(s"reconcileTargetSchema_$i") {
        graft.sync.LakeToJdbc.reconcileTargetSchema(s, live.schema,
          "o_orderkey", cfg)
      }
    }
    // incremental tick internals, re-runnable pieces
    for (i <- 1 to 2) {
      t(s"lakeChanges_$i") {
        Sync.lakeChanges(s, root, 1, 2, "o_orderkey").changes.count()
      }
      val live = t(s"readVersionLogical_$i") {
        Sync.readVersionLogical(s, s"$root/v2", "o_orderkey") }
      t(s"validateTarget_sampled_$i") {
        graft.sync.LakeToJdbc.validateTarget(s, live, "o_orderkey", cfg,
          2, graft.sync.LakeToJdbc.Validation.Sampled(),
          lakeCount = Sync.manifestRowCount(s, root, 2))
      }
      t(s"validateTarget_full_$i") {
        graft.sync.LakeToJdbc.validateTarget(s, live, "o_orderkey", cfg,
          2, graft.sync.LakeToJdbc.Validation.Full())
      }
    }
    s.stop()
  }
}

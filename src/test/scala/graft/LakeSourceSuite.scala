package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Sync, Tables}
import graft.sources.lake.{LakeRef, LakeScan, LakeScanBuilder}

/** S19/S19b: the DataSourceV2 lake connector + read-only catalog.
  * Laws: connector content ≡ the library read path (readVersionLogical)
  * on clean, MOR, and schema-evolved versions; pushed key filters prune
  * INPUT PARTITIONS (not just rows); column pruning reaches the scan;
  * SQL `VERSION AS OF` lands on the same immutable dirs. */
class LakeSourceSuite extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"
  private val key = "o_orderkey"

  /** One shared three-version lake: v1 clean (4 key-clustered files),
    * v2 = v1 minus a DV ghost band (merge-on-read), v3 = v2 plus a
    * metadata-only `note` column. */
  private lazy val root: String = {
    val r = ops.Sources.stage("lakesrc_suite/orders_t")
    val fs = new org.apache.hadoop.fs.Path(r)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(r), true)
    val proj = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    assert(Sync.publish(spark,
      proj.repartitionByRange(4, col(key)).sortWithinPartitions(key),
      r, 1, _.head(1).nonEmpty))
    Sync.writeFileStats(spark, s"$r/v1", key)
    val ghosts = proj.filter(col(key) % 13 === 0).select(col(key))
    assert(Sync.dvDelete(spark, r, 1, 2, key, ghosts).published)
    assert(Sync.evolveSchema(spark, r, 2, 3, Seq(
      org.apache.spark.sql.types.StructField("note",
        org.apache.spark.sql.types.StringType))))
    r
  }

  private def connector(version: Int): DataFrame =
    spark.read.format("graftlake")
      .option("path", root).option("key", key)
      .option("version", version).load()

  private def sameContent(a: DataFrame, b: DataFrame): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      s"content drift between connector and library reads")
  }

  test("clean version: connector ≡ library read, vectorized") {
    val df = connector(1)
    sameContent(df, Sync.readVersionLogical(spark, s"$root/v1", key))
    // no DV → the scan reports columnar batches
    val leaves = df.queryExecution.executedPlan.collectLeaves()
    assert(leaves.exists(_.isInstanceOf[BatchScanExec]))
    assert(leaves.head.supportsColumnar,
      "clean version must scan through the vectorized columnar path")
  }

  test("MOR version: DV subtracted; ≡ readVersionLogical") {
    val df = connector(2)
    sameContent(df, Sync.readVersionLogical(spark, s"$root/v2", key))
    assert(df.filter(col(key) % 13 === 0).count() === 0)
    // count(*) over a DV version must subtract ghosts too
    assert(connector(2).count() ===
      Sync.readVersionLogical(spark, s"$root/v2", key).count())
  }

  test("MOR with the key projected OUT still subtracts the DV") {
    val libSum = Sync.readVersionLogical(spark, s"$root/v2", key)
      .agg(sum(col("o_custkey"))).collect()(0).getLong(0)
    val conSum = connector(2).select("o_custkey")
      .agg(sum(col("o_custkey"))).collect()(0).getLong(0)
    assert(conSum === libSum)
  }

  test("pushed key filter prunes input partitions via the manifest") {
    val probe = Tables.orders(spark, sf)
      .agg(min(col(key))).collect()(0).getLong(0)
    val df = connector(1).filter(col(key) === probe)
    val scans = df.queryExecution.executedPlan.collectLeaves()
      .collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    val planned = scans.head.partitions.flatten.size
    assert(planned === 1,
      s"a point lookup on a 4-file key-clustered version must plan 1 " +
        s"input partition, planned $planned")
    assert(df.count() === 1)
    // and the pruned read is still row-exact
    assert(df.collect()(0).getLong(0) === probe)
  }

  test("column pruning reaches the scan schema") {
    val df = connector(1).select("o_orderstatus")
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collect { case b: BatchScanExec => b }.head
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("o_orderstatus"))
  }

  test("count(*) on a clean version is metadata-bound (no column IO)") {
    assert(connector(1).count() ===
      Tables.orders(spark, sf).count())
  }

  test("schema evolution: pre-evolution files read null for the new column") {
    val df = connector(3)
    assert(df.schema.fieldNames.contains("note"))
    assert(df.filter(col("note").isNotNull).count() === 0)
    // projecting ONLY the evolved column still yields the right row count
    // (constant-null batches over the footer/row path)
    assert(df.select("note").count() === connector(2).count())
    sameContent(df.drop("note"),
      Sync.readVersionLogical(spark, s"$root/v2", key))
  }

  test("omitting version resolves the live pointer") {
    val live = spark.read.format("graftlake")
      .option("path", root).option("key", key).load()
    assert(live.schema.fieldNames.contains("note")) // v3 is live
    sameContent(live.drop("note"), connector(3).drop("note"))
  }

  test("a DV-carrying version without a key option refuses loudly") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graftlake")
        .option("path", root).option("version", 2).load()
    }
    assert(e.getMessage.contains("deletion vector"))
  }

  test("statistics report the PRUNED file set") {
    val ref = LakeRef.resolve(spark, root, Some("v1"), Some(key))
    val all = {
      val b = new LakeScanBuilder(ref)
      b.build().asInstanceOf[LakeScan].estimateStatistics()
    }
    val probe = Tables.orders(spark, sf)
      .agg(min(col(key))).collect()(0).getLong(0)
    val prunedStats = {
      val b = new LakeScanBuilder(ref)
      b.pushFilters(Array(EqualTo(key, probe)))
      b.build().asInstanceOf[LakeScan].estimateStatistics()
    }
    assert(prunedStats.sizeInBytes.getAsLong < all.sizeInBytes.getAsLong)
    assert(prunedStats.numRows.getAsLong < all.numRows.getAsLong)
  }

  test("catalog: SQL reads, VERSION AS OF, read-only refusals") {
    val parent = new java.io.File(root).getParent
    spark.conf.set("spark.sql.catalog.glake",
      "graft.sources.lake.LakeCatalog")
    spark.conf.set("spark.sql.catalog.glake.root", parent)
    spark.conf.set("spark.sql.catalog.glake.key.orders_t", key)
    val live = spark.sql("SELECT * FROM glake.orders_t")
    assert(live.schema.fieldNames.contains("note"))
    sameContent(live.drop("note"),
      Sync.readVersionLogical(spark, s"$root/v2", key))
    val v1 = spark.sql(
      "SELECT count(*) AS n FROM glake.orders_t VERSION AS OF 1")
      .collect()(0).getLong(0)
    assert(v1 === Tables.orders(spark, sf).count())
    // time travel sees pre-DV ghosts that the live read must not
    val liveN = spark.sql("SELECT count(*) AS n FROM glake.orders_t")
      .collect()(0).getLong(0)
    assert(v1 > liveN)
    val e = intercept[Exception] {
      spark.sql("DROP TABLE glake.orders_t")
    }
    assert(e.getMessage.toLowerCase.contains("read-only"))
    intercept[Exception] {
      spark.sql("SELECT * FROM glake.orders_t TIMESTAMP AS OF '2026-01-01'")
    }
  }
}

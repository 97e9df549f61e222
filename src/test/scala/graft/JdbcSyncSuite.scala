package graft

import graft.ops.Tables
import graft.sources.JdbcSync._
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S4/S5 integration against embedded Derby (ships in /opt/spark/jars) —
  * the closest available stand-in for the reference's MS-SQL endpoints
  * (same Spark JDBC code path, different dialect). Proves: batched write,
  * range-partitioned parallel read, and the partition count actually
  * landing in the scan.
  */
class JdbcSyncSuite extends AnyFunSuite with SparkFixture {

  private val sf = "/root/testdata/sf0.001"
  private lazy val dbPath =
    java.nio.file.Files.createTempDirectory("graft_derby").resolve("db")
  private lazy val cfg = JdbcConfig(
    url = s"jdbc:derby:$dbPath;create=true",
    table = "ORDERS_SYNC",
    driver = "org.apache.derby.jdbc.EmbeddedDriver")

  test("S5 write + S4 range-partitioned read round-trip (embedded Derby)") {
    val o = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    writeTable(o, cfg, SaveMode.Overwrite)

    val maxKey = o.agg(max("o_orderkey")).collect()(0).getLong(0)
    val back = readTable(spark, cfg,
      Some(ReadPartitioning("o_orderkey", 0, maxKey + 1, 4)))

    assert(back.rdd.getNumPartitions == 4, "range partitioning must fan out")
    assert(back.count() == o.count())
    // content equality via order-insensitive comparison
    assert(back.exceptAll(o).count() == 0 && o.exceptAll(back).count() == 0)
  }

  test("S5 append mode accumulates batches") {
    val n0 = readTable(spark, cfg, None).count()
    val extra = Tables.orders(spark, sf).limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    writeTable(extra, cfg, SaveMode.Append)
    assert(readTable(spark, cfg, None).count() == n0 + 10)
  }
}

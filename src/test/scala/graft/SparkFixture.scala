package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** Shared local SparkSession for all suites (SURVEY §5.2). */
trait SparkFixture extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = SparkFixture.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkFixture {
  lazy val session: SparkSession = {
    EntryTuning.tuneEmbeddedDerby()
    graft.ops.Tables.prepare(
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // the SparkSessionExtensions path: cosine_sim/dot_product resolve in
      // every suite without manual registration (ExtensionsSuite asserts it)
      .withExtensions(new graft.functions.GraftExtensions().apply(_))
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=${java.nio.file.Files.createTempDirectory("graft_ms")}/metastore_db;create=true")
      .getOrCreate())
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink for table synchronization (SURVEY.md §2.1 S4/S5 — the
  * reference's named approach: "JDBC read/write for table synchronization",
  * BASELINE.md). No database exists in this environment (zero egress), so
  * these builders are exercised only for option-plumbing in JdbcSyncSuite;
  * on a cluster they produce Spark's standard parallel JDBC scans/writes.
  *
  * Scale notes: reads MUST be range-partitioned (partitionColumn/bounds/
  * numPartitions) or the whole table funnels through one task; writes batch
  * inserts per partition (`batchsize`), and MS-SQL type mapping is Spark's
  * built-in MsSqlServerDialect (SURVEY §7.4 — no custom dialect needed).
  */
object JdbcSync {

  final case class JdbcConfig(
      url: String,
      table: String,
      user: String = "",
      password: String = "",
      driver: String = "com.microsoft.sqlserver.jdbc.SQLServerDriver")

  final case class ReadPartitioning(
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int)

  def readOptions(cfg: JdbcConfig, part: Option[ReadPartitioning],
                  fetchSize: Int = 10000): Map[String, String] = {
    val base = Map(
      "url" -> cfg.url, "dbtable" -> cfg.table,
      "user" -> cfg.user, "password" -> cfg.password,
      "driver" -> cfg.driver, "fetchsize" -> fetchSize.toString)
    base ++ part.map(p => Map(
      "partitionColumn" -> p.partitionColumn,
      "lowerBound" -> p.lowerBound.toString,
      "upperBound" -> p.upperBound.toString,
      "numPartitions" -> p.numPartitions.toString)).getOrElse(Map.empty)
  }

  def writeOptions(cfg: JdbcConfig, batchSize: Int = 10000,
                   isolation: String = "READ_COMMITTED"): Map[String, String] =
    Map("url" -> cfg.url, "dbtable" -> cfg.table,
        "user" -> cfg.user, "password" -> cfg.password,
        "driver" -> cfg.driver, "batchsize" -> batchSize.toString,
        "isolationLevel" -> isolation)

  /** S4: parallel range-partitioned JDBC scan. */
  def readTable(spark: SparkSession, cfg: JdbcConfig,
                part: Option[ReadPartitioning]): DataFrame =
    spark.read.format("jdbc").options(readOptions(cfg, part)).load()

  /** S5: batched JDBC write. */
  def writeTable(df: DataFrame, cfg: JdbcConfig, mode: SaveMode): Unit =
    df.write.format("jdbc").options(writeOptions(cfg)).mode(mode).save()
}

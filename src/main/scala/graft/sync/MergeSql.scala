package graft.sync

/** Dialect-parameterized MERGE/DELETE statement builder for the JDBC
  * upsert sinks (SURVEY §2.9 Y5 / §2.10 Z3). The sync target is
  * "MS-SQL-shaped" but the embedded test database is Derby, and the two
  * dialects spell the single-row MERGE differently:
  *
  *  - Derby/DB2: `USING SYSIBM.SYSDUMMY1` (the one-row system table) with
  *    a bare `?` per slot — placeholders repeat across the UPDATE and
  *    INSERT branches, so each column binds twice.
  *  - T-SQL: `USING (VALUES (?, ...)) AS s (cols...)` — the row binds once
  *    into the source constructor and both branches reference `s.col`;
  *    T-SQL additionally requires the terminating semicolon.
  *
  * Each rendering returns its own bind order, so callers drive a single
  * generic binding loop regardless of dialect — the same pattern
  * TypeMapping uses for DDL (both renderings pinned in SyncJobSuite, no
  * server needed for the T-SQL side).
  */
object MergeSql {

  sealed trait Dialect
  /** Embedded Derby (DB2 family) — the e2e test target. */
  case object Derby extends Dialect
  /** Microsoft SQL Server. */
  case object TSql extends Dialect

  /** A rendered statement plus the column name bound at each `?`
    * placeholder, in order (1-based JDBC index = position + 1). */
  final case class Stmt(sql: String, bindOrder: Seq[String])

  private val ident = "[A-Za-z_][A-Za-z0-9_]*"

  private def validate(table: String, cols: Seq[String]): Unit = {
    // identifiers cannot be bound as JDBC parameters, so they are
    // interpolated — restrict to plain [schema.]name to reject injection
    // and anything that would need dialect quoting
    require(table.matches(s"$ident(\\.$ident)?"),
      s"MergeSql: invalid table identifier '$table'")
    cols.foreach(c =>
      require(c.matches(ident), s"MergeSql: invalid column identifier '$c'"))
  }

  /** Single-row keyed upsert: UPDATE the value columns when the key
    * matches, INSERT the full row when it doesn't. */
  def upsert(dialect: Dialect, table: String, key: String,
             valueCols: Seq[String]): Stmt = {
    require(valueCols.nonEmpty, "MergeSql.upsert: at least one value column")
    validate(table, key +: valueCols)
    val all = key +: valueCols
    dialect match {
      case Derby => Stmt(
        s"MERGE INTO $table t USING SYSIBM.SYSDUMMY1 ON t.$key = ? " +
          s"WHEN MATCHED THEN UPDATE SET ${valueCols.map(c => s"$c = ?").mkString(", ")} " +
          s"WHEN NOT MATCHED THEN INSERT (${all.mkString(", ")}) " +
          s"VALUES (${all.map(_ => "?").mkString(", ")})",
        (key +: valueCols) ++ all)
      // WITH (HOLDLOCK): MERGE under SQL Server's default isolation is a
      // documented upsert race — two concurrent statements for the same
      // absent key both see NOT MATCHED, both INSERT, one dies on the PK.
      // Task retries/speculative execution make that a real path; HOLDLOCK
      // serializes the key-range scan so the second waits and MATCHES.
      case TSql => Stmt(
        s"MERGE INTO $table WITH (HOLDLOCK) AS t " +
          s"USING (VALUES (${all.map(_ => "?").mkString(", ")})) AS s (${all.mkString(", ")}) " +
          s"ON t.$key = s.$key " +
          s"WHEN MATCHED THEN UPDATE SET ${valueCols.map(c => s"$c = s.$c").mkString(", ")} " +
          s"WHEN NOT MATCHED THEN INSERT (${all.mkString(", ")}) " +
          s"VALUES (${all.map(c => s"s.$c").mkString(", ")});",
        all)
    }
  }

  /** Keyed delete — same text in both dialects. */
  def delete(dialect: Dialect, table: String, key: String): Stmt = {
    validate(table, Seq(key))
    Stmt(s"DELETE FROM $table WHERE $key = ?", Seq(key))
  }
}
